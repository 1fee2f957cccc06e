"""Operator tests over the driver-provided documents/embeddings tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icedb_spark.operators import (
    cosine_topk,
    cosine_topk_lsh,
    doc_fingerprint,
    embedding_dup_pairs,
    exact_duplicates,
    language_id,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    text_quality,
    token_stats,
)
from icedb_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def docs(spark, request):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_token_stats(docs):
    out = token_stats(docs).collect()
    assert len(out) == docs.count()
    r = {x["doc_id"]: x for x in out}
    # doc 0 is known text: whitespace tokens == n_chars-based sanity
    assert all(x["n_tokens"] >= 1 for x in out)
    assert all(x["n_unique_tokens"] <= x["n_tokens"] for x in out)
    assert all(x["n_chars"] > 0 for x in out)


def test_text_quality_bounds(docs):
    out = text_quality(docs).collect()
    for r in out:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["unique_ratio"] <= 1.0


def test_language_id_deterministic(docs):
    a = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    b = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert a == b
    assert set(a.values()) <= {"en", "es", "fr", "de", "zh", "und"}


def test_fingerprint_matches_exact_dups(docs):
    fp = doc_fingerprint(docs)
    # identical text ⇒ identical fingerprints
    joined = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.text") == F.col("b.text"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
    )
    fpd = {r["doc_id"]: (r["fingerprint_md5"], r["fingerprint_rolling"]) for r in fp.collect()}
    for r in joined.collect():
        assert fpd[r["x"]] == fpd[r["y"]]


def test_exact_duplicates(spark):
    rows = [
        {"doc_id": 1, "text": "hello world"},
        {"doc_id": 2, "text": "hello world"},
        {"doc_id": 3, "text": "unique"},
    ]
    out = exact_duplicates(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["group_size"] == 2
    assert out[0]["keeper_id"] == 1
    assert out[0]["member_ids"] == [1, 2]


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra"},        # near-dup
        {"doc_id": 3, "text": "completely different words about spark engines"},
    ]
    df = spark.createDataFrame(rows)
    pairs = minhash_lsh_pairs(df, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert all(p == (1, 2) for p in found)


def test_minhash_signature_shape(docs):
    sig = minhash_signature(docs, num_perm=16)
    assert len(sig.columns) == 17
    assert sig.count() == docs.count()


def test_ngram_jaccard_symmetric_subset_of_truth(spark):
    rows = [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g h i"},
        {"doc_id": 3, "text": "z y x w v u t s"},
    ]
    out = ngram_jaccard_pairs(spark.createDataFrame(rows), threshold=0.3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs
    # jaccard of 3-gram shingle sets: doc1 has 6, doc2 has 7, ∩=6, ∪=7
    assert abs(pairs[(1, 2)] - round(6 / 7, 6)) < 1e-9


def test_simhash_near_dup(spark):
    base = " ".join(f"tok{i}" for i in range(50))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " onemore"},
        {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(50))},
    ]
    df = spark.createDataFrame(rows)
    sk = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    near = bin(sk[1] ^ sk[2]).count("1")
    far = bin(sk[1] ^ sk[3]).count("1")
    # one extra token can flip a handful of near-zero bits; unrelated docs
    # should land near the expected hamming of 16 for 32-bit sketches
    assert near <= 8 < far
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_pairs(df, max_hamming=8).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_embedding_dup_pairs(spark):
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.999, 0.01, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
    ]
    df = spark.createDataFrame(rows)
    out = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, threshold=0.99).collect()}
    assert out == {(1, 2)}


def test_cosine_topk_exact(emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = cosine_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 3 * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_cosine_topk_lsh_bucketing(spark, emb):
    """Deterministic LSH correctness: a scaled copy of a vector has the exact
    same direction, so it MUST share every hyperplane bucket and be found as
    the top neighbor (cosine 1.0)."""
    clones = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(clones)
    queries = emb.where(F.col("vec_id") < 10).select("vec_id", "embedding")
    out = cosine_topk_lsh(corpus, queries, dim=64, k=1, n_planes=6)
    top = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in out.collect()}
    for q in range(10):
        assert top[q][0] == q + 100_000
        assert abs(top[q][1] - 1.0) < 1e-6


def test_multimodal_features(spark):
    media = synthetic_media(spark, 32)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # deterministic across runs
    again = {r["media_id"]: r["content_md5"] for r in extract_features(media, dim=8).collect()}
    assert again == {r["media_id"]: r["content_md5"] for r in rows}


def test_multimodal_frame_sampling(spark):
    media = synthetic_media(spark, 9)
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # 3 videos × 5 frames (5000ms / 1000ms)
    assert len(rows) == 3 * 5
    assert {r["frame_ts_ms"] for r in rows} == {0, 1000, 2000, 3000, 4000}
