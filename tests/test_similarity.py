"""ANN correctness: both approximate paths (hyperplane LSH, IVF) must
(a) never fabricate scores — every reported cosine equals the exact
cosine — and (b) reach a sane recall of the true top-1 on testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.ivf import ivf_topk
from alternating_least_squares_spark.functions.similarity import (
    cosine,
    lsh_topk,
)
from alternating_least_squares_spark.sources import load_table
from tests.conftest import SF_SMALL


def _exact_top1(spark, emb, queries):
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine(F.col("qe"), F.col("ne")), 6).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return {
        r["qid"]: r["cos"]
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }


def test_lsh_and_ivf_scores_are_exact_and_recall_is_sane(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact1 = _exact_top1(spark, emb, queries)

    # recall floors measured empirically on this fixture (lsh 7/10,
    # ivf 10/10); asserted with slack for hash-family drift
    for name, floor, res in [
        ("lsh", 0.5, lsh_topk(emb, queries, k=3)),
        ("ivf", 0.8, ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=3)),
    ]:
        rows = res.collect()
        assert rows, name
        # reported score == exact cosine (approximation may miss
        # neighbors but must never misscore one)
        pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in rows}
        sample = list(pairs.items())[:20]
        for (qid, nid), score in sample:
            qe = emb.filter(F.col("vec_id") == qid).first()["embedding"]
            ne = emb.filter(F.col("vec_id") == nid).first()["embedding"]
            import math

            dot = sum(a * b for a, b in zip(qe, ne))
            na = math.sqrt(sum(a * a for a in qe))
            nb = math.sqrt(sum(b * b for b in ne))
            assert abs(score - round(dot / (na * nb), 6)) < 1e-4, (name, qid, nid)
        # recall@top: the best score found per query reaches the true
        # top-1 cosine for a majority of queries
        best = {}
        for r in rows:
            q = r["query_id"]
            best[q] = max(best.get(q, -2.0), r["cosine"])
        hits = sum(
            1 for q, s in best.items() if abs(s - exact1[q]) < 1e-6
        )
        assert hits >= len(exact1) * floor, (name, hits, len(exact1))


def test_ivf_probe_fanout_bounded(spark):
    """The candidate set must be a strict subset of the corpus — the
    probed fraction, not an all-pairs blowup."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    res = ivf_topk(emb, queries, k=n, n_centroids=8, n_probe=2)
    per_q = res.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] < n * 0.8 for r in per_q)
