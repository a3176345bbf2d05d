"""Subword tokenization (SURVEY.md §2.8 U1).

The reference encodes with the DistilBERT WordPiece tokenizer to
max_length=30 then post-pads and builds a 0/1 attention mask
(reference src/main.py:79-81). The `transformers` package is not in
this container, so the engine ships:

- ``hash_subword_encode``: a REAL, deterministic stand-in with the
  same contract (array<int> ids, fixed length, post-padding, mask) —
  greedy ≤4-char word pieces, id = stable md5-based hash into a fixed
  vocab size. Used by tests and the declared query.
- ``hf_encode`` (gated behind an import-try): the genuine HF tokenizer
  via the same pandas_udf shape, for clusters that have transformers.

Both are Arrow-batched pandas_udfs — the Spark-side plumbing (schema,
batch shape, padding semantics) is identical either way.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_LEN = 30  # reference: max_length=30, pad 'post' (src/main.py:79-80)
VOCAB_SIZE = 30522  # BERT vocab size, for id-range parity
PAD_ID = 0


def _piece_id(piece: str) -> int:
    h = hashlib.md5(piece.encode("utf-8")).digest()
    return 1 + int.from_bytes(h[:4], "big") % (VOCAB_SIZE - 1)


# Word boundary = the EXPLICIT ASCII class [ \t\n\r\f\v], not
# str.split() (r9 advisor low): Python splits on all Unicode
# whitespace (\x1c-\x1f, \x85, NBSP, ...), Java regex \s is ASCII
# incl. \v, RE2 (DuckDB) \s EXCLUDES \v — three engines, three
# classes. Pinning one explicit class keeps the q_tokenize DuckDB
# oracle ('[ \t\n\r\f\v]+') exactly equivalent on any input, not just
# the ASCII-whitespace fixtures.
_WS = re.compile(r"[ \t\n\r\f\v]+")


def _encode_one(text: str | None, max_len: int) -> list[int]:
    if text is None:
        return [PAD_ID] * max_len
    ids: list[int] = []
    for word in _WS.split(text):
        if not word:
            continue
        for i in range(0, len(word), 4):  # greedy fixed-width pieces
            ids.append(_piece_id(word[i : i + 4]))
            if len(ids) >= max_len:
                return ids[:max_len]
    return ids + [PAD_ID] * (max_len - len(ids))


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def hash_subword_encode(texts: pd.Series) -> pd.Series:
    """U1 stand-in: deterministic subword ids, truncated/post-padded to
    MAX_LEN — same output contract as the reference's
    tokenizer.encode + pad_sequences."""
    return texts.map(lambda s: _encode_one(s, MAX_LEN))


def attention_mask(ids: Column) -> Column:
    """F8: 0/1 mask over padded ids (reference np.where(x != 0, 1, 0),
    src/main.py:81) — a JVM transform, not a UDF."""
    return F.transform(ids, lambda x: F.when(x != PAD_ID, 1).otherwise(0))


def hf_encode(model_name: str = "distilbert-base-uncased", max_len: int = MAX_LEN):
    """Genuine HF WordPiece encode as a pandas_udf factory. Raises
    ImportError where transformers isn't installed (this container)."""
    from transformers import AutoTokenizer  # noqa: F401 — gated import

    def make():
        tok = AutoTokenizer.from_pretrained(model_name)

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def encode(texts: pd.Series) -> pd.Series:
            out = tok(
                texts.fillna("").tolist(),
                max_length=max_len,
                truncation=True,
                padding="max_length",
            )
            return pd.Series(out["input_ids"])

        return encode

    return make()
