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


def train_bpe(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Deterministic: ties broken
    by lexicographic pair order."""
    words = word_counts(docs, text_col)
    # char-split with end-of-word marker; cache — every iteration reads it
    seqs = words.select(
        "cnt",
        (F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        )).alias("seq"),
    ).persist()
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
