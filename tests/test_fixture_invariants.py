"""Fixture-invariant guards (ADVICE r3): q_dedup_near,
q_dedup_embedding and q_curation_full bind probabilistic-LSH output to
EXACT-threshold oracles. That equality is only guaranteed while the
fixture corpus keeps every duplicate pair far from the decision
thresholds (LSH recall is ~1.0 well above threshold, and nothing sits
where banding probability ramps). Fixture encodings are known to
drift between harness generations — these tests make an oracle
failure diagnosable: if THEY go red, the fixture changed (regenerate
expectations / widen thresholds); if they stay green and the dedup
oracle goes red, the engine regressed.

Measured invariant (sf0.001 and sf0.01, 2026-08-14): 3-word-shingle
Jaccard over all candidate pairs is bimodal — non-dups <= 0.07, dups
>= 0.89 — and pairwise embedding cosine has NO pair in (0.85, 0.9999).
The guards assert generous dead bands around the 0.6 (Jaccard) and
0.95 (cosine) thresholds.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_ORACLE


def test_no_jaccard_pairs_in_minhash_threshold_band(duck):
    q = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    sets AS (
      SELECT doc_id,
             list_distinct(list_transform(
                 range(1, GREATEST(len(tk) - 2, 0) + 1),
                 i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]
                      || ' ' || tk[CAST(i AS INT) + 2])) AS sh
      FROM toks
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    cand AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT COUNT(*) FROM (
      SELECT CAST(c.inter AS DOUBLE) / (x.sz + y.sz - c.inter) AS j
      FROM cand c JOIN sizes x ON c.a = x.doc_id
                  JOIN sizes y ON c.b = y.doc_id
    ) WHERE j > 0.45 AND j < 0.85
    """
    n_band = duck.execute(q).fetchone()[0]
    assert n_band == 0, (
        f"{n_band} candidate pairs with Jaccard in (0.45, 0.85): the "
        "fixture now has near-threshold pairs, so the q_dedup_near / "
        "q_curation_full exact-oracle binding is no longer sound — "
        "this is a FIXTURE change, not an engine regression."
    )


def test_no_cosine_pairs_in_embedding_threshold_band():
    emb = pq.read_table(f"{SF_ORACLE}/embeddings.parquet").to_pandas()
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    unit = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    gram = unit @ unit.T
    upper = gram[np.triu_indices(len(m), 1)]
    n_band = int(((upper > 0.90) & (upper < 0.9999)).sum())
    assert n_band == 0, (
        f"{n_band} embedding pairs with cosine in (0.90, 0.9999): the "
        "fixture now has near-threshold pairs, so q_dedup_embedding's "
        "exact-oracle binding is no longer sound — FIXTURE change, not "
        "an engine regression."
    )


def test_dsir_scores_keep_clearance_from_the_selection_gate(duck):
    """q_dsir_select's `selected` flag binds an UNROUNDED score>0 gate
    to the oracle: sound while every per-doc score keeps clearance
    from 0 that dwarfs cross-engine LN/summation drift (~1e-13).
    Measured margins: 7.7e-5 at sf0.01, 2.6e-7 at sf0.1. If this
    trips, the FIXTURE drifted a doc onto the gate — not an engine
    regression."""
    from team_02_spark.queries.llm_pipeline import DSIR_CTES_SQL

    # Shares the oracle's own CTEs so the guard can't measure a stale
    # formula if the query's smoothing/tokenization/target changes.
    q = f"""
    WITH {DSIR_CTES_SQL}
    SELECT MIN(ABS(s)) FROM (
        SELECT SUM(l.w) / COUNT(*) AS s
        FROM tok t JOIN llr l ON t.tok = l.tok GROUP BY t.doc_id
    )
    """
    margin = duck.execute(q).fetchone()[0]
    assert margin > 1e-8, (
        f"min |dsir_score| = {margin}: a document's score now sits on "
        "the selected gate; the exact-oracle binding for q_dsir_select "
        "is no longer sound on this fixture."
    )
