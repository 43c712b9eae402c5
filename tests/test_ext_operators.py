"""Property tests for the [EXT] layer beyond the oracle gate:
LSH recall vs exact, dedup detection of planted near-dups, simhash
locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, similarity
from streaming_data_spark.schemas import load_table


def test_minhash_lsh_finds_planted_neardups(spark, sf_oracle):
    """The documents table contains planted near-dups with Jaccard
    ≥ 0.96 (measured); MinHash-LSH at threshold 0.7 must surface every
    pair that exact n-gram Jaccard flags at ≥ 0.9."""
    docs = load_table(spark, sf_oracle, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    assert exact, "testdata should contain planted near-dups"
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_signlsh_recall_vs_exact(spark, sf_oracle):
    """Sign-LSH top-5 must recall a reasonable fraction of the exact
    top-5 (same-bucket probing only; 4 planes on 500 vectors)."""
    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.signlsh_topk(emb, queries, k=5, n_planes=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"sign-LSH recall collapsed: {recall:.2f}"


def test_exact_dedup_idempotent_and_total(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = dedup.exact_dedup(docs, "doc_id", "text")
    total_docs = docs.count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == total_docs
    assert out.select("digest").distinct().count() == out.count()


def test_simhash_close_for_neardups(spark, sf_oracle):
    """Planted near-dups should have small simhash Hamming distance."""
    docs = load_table(spark, sf_oracle, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.9)
    sh = dedup.simhash(docs, "doc_id", "text")
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("simhash", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("simhash", "sh_b"), "id_b")
        .select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .collect()
    )
    assert joined, "expected near-dup pairs"
    assert all(r.hamming <= 8 for r in joined), [r.hamming for r in joined]
