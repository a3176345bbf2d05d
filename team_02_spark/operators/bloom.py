"""Bloom-filter contamination prefilter — the 100 TB decontamination
shape (public pattern; used by e.g. the Dolma/CCNet-style pipelines):

1. build one compact Bloom filter over the benchmark's distinct word
   n-grams (eval suites are small — the filter is a few MB even for
   millions of grams, vs broadcasting the raw gram strings);
2. broadcast the filter BYTES and run a map-only Arrow pass over the
   training corpus counting per-doc bloom hits — no explode shuffle,
   no join, for the overwhelmingly-clean majority of the corpus;
3. run the EXACT gram-join verify (operators/contamination.py) only on
   the bloom candidates.

Because a Bloom filter has no false negatives, any document sharing
>= min_shared distinct grams with the benchmark scores >= min_shared
bloom hits, so the candidate set is a superset of the truth and the
final result is EXACT — false positives only cost verify work
(bounded by fpp * grams-per-doc).

The reference has no decontamination (SURVEY.md §2 — extension lane);
this complements the broadcast gram-join in contamination.py: that
join is fine when the benchmark gram set is tiny, the bloom path wins
when eval suites grow to ~10^7 grams (filter stays ~20 MB at 1e-4
fpp) or when the corpus-side explode dominates.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from team_02_spark.operators.contamination import find_contaminated
from team_02_spark.util import ensure_parallelism

# Driver-side build cap: 2e7 gram hash-pairs collect as ~320 MB of
# int64 — beyond that, build the filter distributed (per-partition
# bitmap OR via treeAggregate) instead of growing this constant.
MAX_BENCH_GRAMS = 20_000_000


def bloom_params(n_items: int, fpp: float = 1e-4) -> tuple[int, int]:
    """Textbook sizing: m = ceil(-n ln p / ln^2 2) bits (rounded up to
    a whole byte), k = round(m/n ln 2) probes."""
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _shingle_hash_pairs(text_col: str, n: int):
    """Per-row arrays of two independent 64-bit hashes over the
    DISTINCT word n-gram shingles, computed JVM-side so corpus and
    benchmark agree bit-for-bit: h1 = xxhash64(slice),
    h2 = xxhash64(slice, 1). Double hashing (Kirsch–Mitzenmacher)
    derives all k probe indices from the pair.

    r15 (guide §2.3/§4): the gram STRING is never materialized — the
    hashes are taken directly over the token SLICE arrays (tokens are
    \\W+-split, so slice equality ≡ the old concat-string equality;
    the <n whole-text case mirrors operators.dedup.shingles exactly).
    One slice evaluation feeds both hash transforms."""
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\W+"), "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    slices = F.array_distinct(
        F.when(F.size(toks) < n, F.array(toks)).otherwise(
            F.transform(idx, lambda i: F.slice(toks, i + 1, n))
        )
    )
    return (
        F.transform(slices, lambda s: F.xxhash64(s)),
        F.transform(slices, lambda s: F.xxhash64(s, F.lit(1))),
    )


def _probe_indices(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) uint64 bit indices via double hashing; h2 forced odd so
    probe strides never collapse to a single index."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (u1[:, None] + i[None, :] * u2[:, None]) % np.uint64(m)


def build_ngram_bloom(benchmark: DataFrame, *, text_col: str = "text",
                      shingle_n: int = 3, fpp: float = 1e-4,
                      ) -> tuple[bytes, int, int]:
    """Build (bits, m, k) over the benchmark's DISTINCT word n-grams.

    The gram *hash pairs* (16 bytes each), never the gram strings, are
    collected; eval suites are small by definition, and the cap above
    keeps an accidentally-huge 'benchmark' from melting the driver.
    """
    bh1, bh2 = _shingle_hash_pairs(text_col, shingle_n)
    pairs = (
        benchmark.select(
            F.explode(F.arrays_zip(bh1.alias("h1"), bh2.alias("h2"))).alias("p")
        )
        .select(F.col("p.h1").alias("h1"), F.col("p.h2").alias("h2"))
        .distinct()
    )
    # Bounded collect: LIMIT cap+1 caps driver memory in the SAME job
    # (no second pass), and one extra row is enough to detect overflow.
    pdf = pairs.limit(MAX_BENCH_GRAMS + 1).toPandas()
    if len(pdf) > MAX_BENCH_GRAMS:
        raise ValueError(
            f"benchmark has > {MAX_BENCH_GRAMS} distinct grams; "
            "build the filter distributed (per-partition bitmap OR) "
            "instead of driver-side"
        )
    n = len(pdf)
    m, k = bloom_params(n, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if n:
        idx = _probe_indices(
            pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), m, k
        ).ravel()
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes(), m, k


def bloom_hit_count(spark, bits: bytes, m: int, k: int):
    """Arrow UDF: given two array<long> columns (per-gram h1/h2), the
    number of grams whose k probe bits are all set. The filter bytes
    ride a SparkContext broadcast — one copy per executor, not per
    task."""
    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf("int")
    def _hits(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        barr = None
        for h1s, h2s in it:
            if barr is None:
                barr = np.frombuffer(bc.value, dtype=np.uint8)
            # One batch-wide kernel, not a per-row loop: flatten every
            # row's gram hashes, probe all bits in one (G, k) matrix
            # op, then segment-sum the all-probes-set flags back to
            # rows via bincount.
            n = len(h1s)
            arrs1 = [np.asarray(a, dtype=np.int64) if a is not None
                     else np.empty(0, np.int64) for a in h1s]
            arrs2 = [np.asarray(b, dtype=np.int64) if b is not None
                     else np.empty(0, np.int64) for b in h2s]
            lens = np.fromiter((a.size for a in arrs1), dtype=np.int64, count=n)
            if lens.sum() == 0:
                yield pd.Series(np.zeros(n, dtype=np.int32))
                continue
            flat1 = np.concatenate(arrs1)
            flat2 = np.concatenate(arrs2)
            # r15: probe in fixed 64Ki-gram BLOCKS instead of one
            # (G, k) matrix over the whole batch. Identical arithmetic
            # and candidate set, but peak temporaries drop from
            # ~100 MB+ per batch (k G-sized uint64 columns at once —
            # the allocation profile the r14 first-touch-stall
            # analysis flagged as the stall amplifier on this box) to
            # ~7 MB regardless of batch size, while every op stays a
            # whole-block vectorized kernel (a per-probe survivor
            # cascade was measured ~25% more CPU than the matrix
            # form — fancy-indexing copies beat the saved probes).
            G = flat1.size
            ok = np.empty(G, dtype=np.float64)
            B = 65536
            for s in range(0, G, B):
                e = min(s + B, G)
                idx = _probe_indices(flat1[s:e], flat2[s:e], m, k)
                ok[s:e] = (
                    (barr[(idx >> np.uint64(3)).astype(np.int64)]
                     >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
                ).all(axis=1)
            row_of = np.repeat(np.arange(n), lens)
            counts = np.bincount(row_of, weights=ok, minlength=n)
            yield pd.Series(counts.astype(np.int32))

    # The UDF IS deterministic; the flag only stops the optimizer
    # from collapsing the projection into a downstream filter, which
    # would evaluate the UDF (and its whole JVM gram-hash input tree)
    # TWICE — measured 5x wall on the prefilter. Pinned by
    # test_bloom_prefilter_single_python_eval.
    return _hits.asNondeterministic()


def bloom_candidates(docs: DataFrame, bits: bytes, m: int, k: int, *,
                     min_shared: int = 2, shingle_n: int = 3,
                     text_col: str = "text") -> DataFrame:
    """Map-only prefilter: docs + `__bloom_hits`, filtered to rows with
    >= min_shared gram hits (a superset of truly-contaminated docs).
    Gram hashing stays JVM-side (xxhash64 over the shingle array);
    only the bit probing crosses to Python, Arrow-batched."""
    spark = docs.sparkSession
    # The probe hashes MUST be bit-identical to build_ngram_bloom's
    # filter bits — both sides go through _shingle_hash_pairs, one
    # definition (r15: hashes over token slices, no gram strings).
    h1, h2 = _shingle_hash_pairs(text_col, shingle_n)
    hits = bloom_hit_count(spark, bits, m, k)
    return (
        ensure_parallelism(docs)
        .withColumn("__bloom_hits", hits(h1, h2))
        .filter(F.col("__bloom_hits") >= min_shared)
    )


def decontaminate_bloom(docs: DataFrame, benchmark: DataFrame, *,
                        min_shared: int = 2, shingle_n: int = 3,
                        fpp: float = 1e-4, id_col: str = "doc_id",
                        text_col: str = "text",
                        bench_id_col: str = "bench_id") -> DataFrame:
    """EXACT decontamination via bloom prefilter + gram-join verify.

    Identical result to operators.contamination.decontaminate (no
    false negatives in the prefilter), but the corpus-wide work is one
    map-only scan; the explode+join only sees bloom candidates.
    """
    bits, m, k = build_ngram_bloom(
        benchmark, text_col=text_col, shingle_n=shingle_n, fpp=fpp
    )
    cand = bloom_candidates(
        docs, bits, m, k, min_shared=min_shared, shingle_n=shingle_n,
        text_col=text_col,
    ).drop("__bloom_hits")
    flagged = find_contaminated(
        cand, benchmark, min_shared=min_shared, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col, bench_id_col=bench_id_col,
    ).select(id_col).distinct()
    return docs.join(flagged, id_col, "left_anti")
