"""Multimodal-lane tests: binary column plumbing, mapInPandas feature
extraction (fake codec), the NotImplementedError seam, resize metadata
propagation, frame sampling, volume-based repartition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_02_spark.operators.multimodal import (
    extract_features,
    media_repartition,
    resize_stub,
    sample_frames,
    synthesize_media,
)
from team_02_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _media(spark, n=50):
    docs = load_table(spark, SF_SMOKE, "documents").limit(n)
    return synthesize_media(docs)


def test_media_schema(spark):
    media = _media(spark)
    fields = dict(media.dtypes)
    assert fields["content"] == "binary"
    assert fields["media"].startswith("struct<kind:string")
    row = media.first()
    assert row["media"]["n_bytes"] == len(row["content"])


def test_extract_features_fake_codec(spark):
    feats = extract_features(_media(spark), decode_stub="fake").collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["content_sha"]) == 64
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # normalized histogram
        assert 0.0 <= r["byte_mean"] <= 255.0


def test_extract_features_deterministic(spark):
    a = extract_features(_media(spark), decode_stub="fake")
    b = extract_features(_media(spark).repartition(7), decode_stub="fake")
    j = a.alias("a").join(b.alias("b"), "doc_id")
    assert j.filter(F.col("a.content_sha") != F.col("b.content_sha")).count() == 0


def test_decode_error_seam(spark):
    """The real-codec seam raises NotImplementedError, clearly named."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        extract_features(_media(spark, 5), decode_stub="error").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )


def test_resize_metadata(spark):
    resized = resize_stub(_media(spark, 10), 32, 24)
    rows = resized.collect()
    for r in rows:
        assert r["media"]["width"] == 32
        assert r["media"]["height"] == 24
        assert len(r["content"]) == 32 * 24


def test_frame_sampling(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = synthesize_media(docs, kind="video")
    frames = sample_frames(media, every_n=2)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 2 == 0).all()
    # per doc: ceil(n_frames / 2) sampled frames
    n_frames = {r["doc_id"]: r["media"]["n_frames"] for r in media.collect()}
    got = pdf.groupby("doc_id").size().to_dict()
    for doc_id, nf in n_frames.items():
        assert got.get(doc_id, 0) == (nf + 1) // 2


def test_media_repartition_by_volume(spark):
    media = _media(spark)
    out = media_repartition(media, target_bytes_per_partition=1024)
    assert out.rdd.getNumPartitions() >= 2  # sized by bytes, not rows
    assert out.count() == media.count()


def test_perceptual_hash_identical_payloads_collide(spark):
    from team_02_spark.operators.multimodal import perceptual_hash, synthesize_media

    docs = spark.createDataFrame(
        [(1, "the same payload text"), (2, "the same payload text"),
         (3, "a completely different and much longer payload with other bytes")],
        "doc_id long, text string",
    )
    media = synthesize_media(docs)
    fps = {r["doc_id"]: r["simhash"] for r in perceptual_hash(media).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_near_dedup_media_removes_duplicate_payloads(spark):
    from team_02_spark.operators.multimodal import near_dedup_media, synthesize_media

    import hashlib as _h

    # pseudo-random distinct payloads (hex noise) — far apart in hash
    # space, unlike near-identical English template strings which a
    # perceptual hash SHOULD place within a few bits of each other
    docs = spark.createDataFrame(
        [(i, _h.md5(str(i).encode()).hexdigest() * 4) for i in range(20)]
        + [(100, "duplicated frame bytes"), (101, "duplicated frame bytes")],
        "doc_id long, text string",
    )
    media = synthesize_media(docs)
    kept = {r["doc_id"] for r in near_dedup_media(media).select("doc_id").collect()}
    assert 100 in kept and 101 not in kept   # keep-smallest-id
    assert all(i in kept for i in range(20))


def test_read_media_dir_binary_file_source(spark, tmp_path):
    """binaryFile ingestion seam: real files on disk arrive as the
    standard (doc_id, content, media) pair — bytes intact, format
    from the extension, glob pruning non-media files at the listing —
    and the result composes with the feature stage unchanged."""
    from team_02_spark.operators.multimodal import (
        extract_features,
        read_media_dir,
    )

    payloads = {
        "a.png": b"\x89PNG-fake-bytes-aaaa",
        "b.png": b"\x89PNG-fake-bytes-bbbb",
        "notes.txt": b"not media",
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    media = read_media_dir(spark, str(tmp_path), pattern="*.png")
    rows = {r["source_path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.png"}  # txt pruned by the glob
    assert bytes(rows["a.png"]["content"]) == payloads["a.png"]
    meta = rows["a.png"]["media"]
    assert meta["format"] == "png" and meta["n_bytes"] == len(payloads["a.png"])
    assert meta["width"] is None  # unknown until decode
    assert len({r["doc_id"] for r in rows.values()}) == 2  # stable distinct ids

    feats = extract_features(media).collect()
    assert {f["n_bytes"] for f in feats} == {len(payloads["a.png"])}


def test_crossmodal_self_retrieval(spark):
    """The shared feature space must make a text query retrieve its
    own media item with cosine exactly 1.0 at rank 1 (payload = the
    same bytes => identical byte histogram; rank ties break on id, and
    duplicate-text corpus items may legitimately share the 1.0)."""
    from team_02_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["q_crossmodal_knn"].fn(spark, SF_SMOKE).collect()
    assert rows, "no query docs at smoke SF"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, hits in by_q.items():
        top = min(hits, key=lambda r: r["rank"])
        assert top["score"] == 1.0, f"query {q_id} rank-1 score {top['score']}"

    # the self pair itself scores exactly 1.0 (identical bytes →
    # identical histogram), even when same-histogram ties with lower
    # ids crowd it out of the top-k
    from pyspark.sql import functions as F

    from team_02_spark.functions.vectors import cosine
    from team_02_spark.operators.multimodal import (
        extract_features, synthesize_media,
    )
    from team_02_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    media = extract_features(
        synthesize_media(docs, kind="image"), decode_stub="fake"
    ).select("doc_id", F.col("feature").alias("m_vec"))
    qf = extract_features(
        synthesize_media(docs.filter(F.col("doc_id") % 499 == 0),
                         kind="text"),
        decode_stub="fake",
    ).select("doc_id", F.col("feature").alias("q_vec"))
    self_scores = (
        qf.join(media, "doc_id")
        .select(cosine(F.col("q_vec"), F.col("m_vec")).alias("s"))
        .collect()
    )
    assert self_scores and all(abs(r["s"] - 1.0) < 1e-9 for r in self_scores)
