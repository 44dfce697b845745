"""Diversity-aware retrieval: Maximal Marginal Relevance (MMR).

Plain top-k returns near-duplicates of each other when the corpus has
them (and an LLM-data corpus always does); retrieval-augmented
pipelines re-rank the candidate pool with MMR (Carbonell & Goldstein
1998): greedily pick the item maximizing
``λ·rel(q, c) − (1−λ)·max_{s∈selected} sim(c, s)``.

Scale shape — the canonical two-stage retrieval plan:
1. CANDIDATE GENERATION is distributed: one narrow cosine pass over
   the corpus + ``TakeOrderedAndProject`` keeps the top
   ``MMR_CANDIDATES`` (per-partition heaps, no global sort).
2. GREEDY RE-RANK runs on the collected candidate set — bounded at
   MMR_CANDIDATES rows by construction (an index-build-sized collect,
   like the PQ codebook), because the greedy argmax is inherently
   sequential in k and k·C is driver-trivial. No engine distributes
   this stage; the win is keeping stage 1 distributed.

Determinism contract: every cosine — Spark candidate relevance
(``F.aggregate`` fold), the oracle's ``list_reduce``, and the Python
re-rank kernel — is the SAME left-to-right sequential float fold, so
scores agree bit-for-bit and the greedy argmax (ties broken by
vec_id) picks identical items in all three places. The oracle
restates the greedy loop as K chained CTEs (one per pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from almost_any_file_to_pandas_spark.operators.similarity import (
    _cosine_sql,
    cosine_expr,
)
from almost_any_file_to_pandas_spark.plans import register, table_wide
from almost_any_file_to_pandas_spark.session import apply_engine_conf

MMR_QUERY_VEC_ID = 0
MMR_CANDIDATES = 50
MMR_K = 10
MMR_LAMBDA = 0.5


def _seq_cos(a, b) -> float:
    """Left-to-right sequential-fold cosine — bit-identical to the
    Spark ``F.aggregate`` fold and DuckDB ``list_reduce``."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def mmr_rerank(cands, k: int, lam: float):
    """Greedy MMR over collected candidates [(vec_id, vec, rel), …];
    returns [(vec_id, rank, rel), …]. Candidates are scanned in
    ascending vec_id with a strict ``>`` improvement test, so ties
    break toward the smaller vec_id — matching the oracle's
    ORDER BY score DESC, vec_id."""
    vecs = {c[0]: c[1] for c in cands}
    rels = {c[0]: c[2] for c in cands}
    remaining = sorted(vecs)
    sim_cache: dict = {}

    def sim(a: int, b: int) -> float:
        key = (min(a, b), max(a, b))
        if key not in sim_cache:
            sim_cache[key] = _seq_cos(vecs[a], vecs[b])
        return sim_cache[key]

    picks = []
    while remaining and len(picks) < k:
        best = None
        for vid in remaining:
            if not picks:
                score = rels[vid]
            else:
                score = lam * rels[vid] - (1.0 - lam) * max(
                    sim(vid, p) for p, _, _ in picks
                )
            if best is None or score > best[0]:
                best = (score, vid)
        vid = best[1]
        picks.append((vid, len(picks) + 1, rels[vid]))
        remaining.remove(vid)
    return picks


def _mmr_oracle() -> str:
    cos_vv = _cosine_sql("a.v", "b.v")
    steps = [
        """sel1 AS MATERIALIZED (
      SELECT vec_id, relevance, 1 AS mmr_rank FROM cand
      ORDER BY relevance DESC, vec_id LIMIT 1
    )"""
    ]
    for i in range(2, MMR_K + 1):
        steps.append(f"""sel{i} AS MATERIALIZED (
      SELECT * FROM sel{i - 1}
      UNION ALL
      SELECT t.vec_id, t.relevance, {i} AS mmr_rank FROM (
        SELECT c.vec_id, c.relevance,
               {MMR_LAMBDA} * c.relevance
               - {1.0 - MMR_LAMBDA} * MAX(p.s) AS score
        FROM cand c
        JOIN pairsim p ON p.va = c.vec_id
          AND p.vb IN (SELECT vec_id FROM sel{i - 1})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        GROUP BY c.vec_id, c.relevance
        ORDER BY score DESC, c.vec_id LIMIT 1
      ) t
    )""")
    chained = ",\n    ".join(steps)
    return f"""
    WITH cand AS MATERIALIZED (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
             {_cosine_sql('e.embedding', 'q.qvec')} AS relevance
      FROM embeddings e CROSS JOIN (
        SELECT embedding AS qvec FROM embeddings
        WHERE vec_id = {MMR_QUERY_VEC_ID}
      ) q
      WHERE e.vec_id <> {MMR_QUERY_VEC_ID}
      ORDER BY relevance DESC, e.vec_id LIMIT {MMR_CANDIDATES}
    ), pairsim AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb, {cos_vv} AS s
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    {chained}
    SELECT vec_id, mmr_rank, ROUND(relevance, 6) AS relevance
    FROM sel{MMR_K}
    """


@register("sim_mmr_diverse_topk", oracle=_mmr_oracle())
def sim_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diverse top-``MMR_K`` for one query vector (module
    docstring): distributed candidate generation, bounded greedy
    re-rank, oracle restated as K chained greedy CTEs."""
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == MMR_QUERY_VEC_ID).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    cand = (
        emb.filter(F.col("vec_id") != MMR_QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            cosine_expr(F.col("embedding"), F.col("qvec")).alias(
                "relevance"
            ),
        )
        .orderBy(F.desc("relevance"), F.asc("vec_id"))
        .limit(MMR_CANDIDATES)
    )
    rows = [
        (r["vec_id"], list(r["v"]), r["relevance"]) for r in cand.collect()
    ]
    picks = mmr_rerank(rows, MMR_K, MMR_LAMBDA)
    return spark.createDataFrame(
        [(vid, rank, rel) for vid, rank, rel in picks],
        schema="vec_id bigint, mmr_rank int, relevance double",
    ).select(
        "vec_id", "mmr_rank", F.round("relevance", 6).alias("relevance")
    )
