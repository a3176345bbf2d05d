"""Distributed BPE (byte-pair encoding) tokenizer TRAINING — the
scale-side counterpart of the reference's pretrained WordPiece encode
(SURVEY §2.8 U1): at 100 TB you don't just apply a tokenizer, you
train one on the corpus.

Design (the classic Sennrich et al. 2016 algorithm, Spark-shaped):

1. corpus pass (the only corpus-scale job): whitespace word counts —
   one explode + one groupBy. 100 TB of text reduces to a vocab-sized
   (word, count) table.
2. merge loop (vocab-scale, NOT corpus-scale): each iteration counts
   adjacent symbol pairs weighted by word count (explode + agg on the
   word table), picks the argmax pair (deterministic tie-break:
   count desc, pair asc), and rewrites the symbol sequences via an
   Arrow-batched pandas_udf. The word table is cached; iterations
   never touch the corpus again.

``apply_bpe`` then encodes text with the learned merge ranks (greedy
lowest-rank-first merging — standard BPE inference) as a pandas_udf.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-scale pass: (word, count)."""
    return (
        docs.select(
            F.explode(
                F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_pair_udf(a: str, b: str):
    merged = a + b

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply(seqs: pd.Series) -> pd.Series:
        def merge_one(seq):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return seqs.map(merge_one)

    return apply


def _train_bpe_local(word_rows: list[tuple[int, list[str]]],
                     n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over the collected vocab-sized word
    table — Sennrich et al. 2016's incremental algorithm (pair-count
    deltas + a pair→words index, so each merge touches only the words
    that contain the pair, not the whole vocabulary). Semantics are
    IDENTICAL to the distributed loop: counts weighted by word count,
    argmax with (count desc, pair asc) tie-break, stop when the best
    pair's count drops below 2 — a parity test pins the equivalence.
    """
    from collections import Counter, defaultdict

    cnts = [c for c, _ in word_rows]
    seqs = [list(s) for _, s in word_rows]
    stats: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wid, (seq, c) in enumerate(zip(seqs, cnts)):
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] += c
            index[p].add(wid)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(p, n) for p, n in stats.items() if n >= 2]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        for wid in sorted(index.get(best, ())):
            seq, c = seqs[wid], cnts[wid]
            # the index is allowed to be stale (words rewritten since
            # they were indexed): remove-then-re-add is a no-op then
            for i in range(len(seq) - 1):
                stats[(seq[i], seq[i + 1])] -= c
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[wid] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                stats[p] += c
                index[p].add(wid)
    return merges


def train_bpe(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              local_finish_threshold: int = 200_000
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Deterministic: ties broken
    by lexicographic pair order.

    Job-count bound: the distributed merge loop below runs ONE Spark
    job per merge (the argmax collect; the rewrite is lazy but
    materializes through the next iteration's persist). That is fine
    at the default 50 merges and pathological at a real 32k-merge
    vocabulary — so when the corpus pass has reduced the data to a
    word table of <= ``local_finish_threshold`` rows (it reduces
    100 TB of text to |vocab| rows by construction), the loop
    LOCAL-FINISHES: collect the vocab-sized table once and run
    Sennrich's incremental merge loop driver-side — zero jobs per
    merge, each merge touching only the words containing the merged
    pair. 200k rows of short symbol arrays is a few tens of MB on the
    driver. The distributed path remains for corpora whose vocabulary
    genuinely exceeds the threshold (set ``local_finish_threshold=0``
    to force it; the parity test does)."""
    words = word_counts(docs, text_col)
    char_seq = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END))
    ).alias("seq")
    # ONE materialization decides the path: collect threshold+1 rows —
    # if the probe comes back <= threshold it IS the whole word table
    # and feeds the local finish directly (no separate count() pass
    # re-running the corpus-scale aggregation).
    if local_finish_threshold > 0:
        probe = (
            words.select("cnt", char_seq)
            .limit(local_finish_threshold + 1).collect()
        )
        if len(probe) <= local_finish_threshold:
            return _train_bpe_local(
                [(r["cnt"], r["seq"]) for r in probe], n_merges
            )
    # char-split with end-of-word marker; cache — every iteration reads it
    seqs = words.select("cnt", char_seq).persist()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            seqs.select(
                "cnt",
                F.explode(
                    F.when(F.size("seq") < 2, F.array()).otherwise(
                        F.transform(
                            F.sequence(F.lit(0), F.size("seq") - 2),
                            lambda i: F.struct(
                                F.element_at(F.col("seq"), i + 1).alias("a"),
                                F.element_at(F.col("seq"), i + 2).alias("b"),
                            ),
                        )
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < 2:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        new_seqs = seqs.select("cnt", _merge_pair_udf(a, b)(F.col("seq")).alias("seq")).persist()
        seqs.unpersist()
        seqs = new_seqs
    seqs.unpersist()
    return merges


def apply_bpe(merges: list[tuple[str, str]], text_col):
    """Encode a text column with learned merges (greedy rank order).
    Returns an array<string> Column of subword tokens."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        seq = list(word) + [END]
        while len(seq) > 1:
            best, best_rank = None, None
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            seq = seq[:best] + [seq[best] + seq[best + 1]] + seq[best + 2:]
        return seq

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            out = []
            for w in text.lower().split():
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w)
                    cache[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc)

    return encode(text_col)
