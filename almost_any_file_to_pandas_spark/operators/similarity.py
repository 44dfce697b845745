"""Similarity search over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

Two paths, same contract:

- **Brute-force cosine top-k** — the correctness baseline: cast to
  double, dot product via ``zip_with`` + sequential ``aggregate``
  (bit-identical to the DuckDB oracle's ``list_reduce``), global
  top-k via sort-limit (Spark's TakeOrderedAndProject — heap per
  partition, no full sort).
- **LSH-bucketed near-neighbour pairs** — the 100 TB path: random
  hyperplane signatures (Arrow-batched Pandas UDF, one numpy matmul
  per batch), banded bucket join for candidates, exact cosine
  verification. Verified output = all pairs with cosine ≥ threshold,
  hash-independent, so the oracle is again brute force.

Float discipline: embeddings are float32; *both* engines cast to
double before multiplying and accumulate sequentially, and comparisons
happen on values rounded to 6 decimals — float32 inputs are exact in
double, so both sides see identical numbers.
"""

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from almost_any_file_to_pandas_spark.plans import register, table, table_wide
from almost_any_file_to_pandas_spark.session import apply_engine_conf

TOP_K = 20
QUERY_VEC_ID = 0
COSINE_THRESHOLD = 0.90

# Hyperplane LSH: 32 bands × 6 bits. At cos=0.90 (θ≈25.8°) a bit
# agrees with p≈0.857 → per-band collision 0.857^6≈0.396 → miss prob
# (1-0.396)^32 ≈ 1e-7: recall ~1 at the verification threshold.
LSH_BANDS = 32
LSH_BITS_PER_BAND = 6
LSH_SEED = 42


def _dot(a, b):
    """Sequential double dot product — order-stable across engines.

    The ``aggregate``/``zip_with`` HOF form measures ~2× faster than a
    64-term unrolled ``element_at`` expression chain (the unroll blows
    past the JIT's method-size sweet spot and falls out of codegen) —
    keep the HOF; its per-element lambdas are the cheapest exact form
    Spark offers for order-stable accumulation.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
    " p -> p[1] * p[2]), (x, y) -> x + y)"
)


def _cosine_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = f"sqrt({_DOT_SQL.format(a=a, b=a)})"
    nb = f"sqrt({_DOT_SQL.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_cosine_sql('e.embedding', 'q.qvec')} DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against a query vector (vec_id=0).

    Broadcast the single query row; narrow map over the corpus; global
    top-k via orderBy+limit (per-partition heaps, one tiny reduce —
    the only all-to-one step is k rows). At 100 TB this is the exact-
    search baseline the ANN path is measured against.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            cosine_expr(F.col("embedding"), F.col("qvec")).alias("_cos"),
        )
    )
    return (
        scored.orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("_cos", 6).alias("cosine"))
    )


def hyperplane_band_keys(
    emb: DataFrame,
    dim: int | None = None,
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS_PER_BAND,
    seed: int = LSH_SEED,
) -> DataFrame:
    """(vec_id, band, key) from random-hyperplane sign bits.

    Pandas UDF: one numpy (batch × dim) @ (dim × bits) matmul per
    Arrow batch — the vectorized slow-path pattern. The hyperplanes
    are generated INSIDE the UDF from the seed on each worker's first
    batch (the array schema doesn't carry the length, and probing it
    with a driver-side ``first()`` compiled an extra job per call —
    r02 nit): ``default_rng(seed)`` is platform-deterministic, so
    every task draws the identical matrix. Band/bit counts are the
    recall dial: more+narrower bands push recall toward 1 at a lower
    similarity threshold, at linear signature cost.
    """
    from pyspark.sql import types as T

    weights = (2 ** np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vectors: pd.Series) -> pd.Series:
        state = {}

        def planes_for(d: int):
            if d not in state:
                rng = np.random.default_rng(seed)
                state[d] = rng.standard_normal((d, bands * bits))
            return state[d]

        mat = np.stack(vectors.to_numpy()).astype(np.float64)
        sign_bits = (mat @ planes_for(mat.shape[1])) > 0
        sign_bits = sign_bits.reshape(len(vectors), bands, bits)
        keys = (sign_bits * weights).sum(axis=2)  # (batch, bands)
        return pd.Series(list(keys))

    keyed = emb.select("vec_id", band_keys(F.col("embedding")).alias("keys"))
    return keyed.select(
        "vec_id", F.posexplode("keys").alias("band", "key")
    )


N_QUERIES = 10
KNN_K = 5
IVF_BITS = 4  # 16 coarse buckets


@register(
    "sim_knn_batch",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) DESC,
                        e.vec_id) AS knn_rank
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, knn_rank
    FROM scored WHERE knn_rank <= {KNN_K}
    """,
)
def sim_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN for a batch of query vectors (vec_id < 10, k=5).

    Plan: broadcast the query batch → one narrow pass over the corpus
    scoring every (query, vector) pair → per-query top-k via window
    over the scored set. At scale the corpus side stays partitioned;
    only k rows per query survive the rank filter. Ranking happens on
    the rounded cosine so ordering is identical across engines.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qnrm"),
    )
    corpus = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= KNN_K)
    )


IVF_TARGET_BUCKET_ROWS = 4096  # per-bucket size the quantizer aims for


def ivf_bits_for_corpus(n_vectors: int, target: int = IVF_TARGET_BUCKET_ROWS) -> int:
    """Scale the coarse-quantizer width with the corpus: enough sign
    bits that the EXPECTED bucket holds ~``target`` vectors, floored
    at IVF_BITS so small corpora keep the oracle-checked default.
    2^bits buckets bound the in-bucket quadratic unit AND set the
    parallelism ceiling — a fixed bucket count (r02's weak point)
    caps both; this keeps per-bucket work constant as n grows
    (n=500 → 4 bits; n=4M → 10; n=4B → 20).
    """
    import math

    if n_vectors <= target:
        return IVF_BITS
    return max(IVF_BITS, math.ceil(math.log2(n_vectors / target)))


def _ivf_bucket_expr(col, bits: int = IVF_BITS):
    """Deterministic coarse quantizer: sign bits of the first ``bits``
    dimensions → bucket id (portable to SQL). ``bits`` is the scale
    dial — production derives it from corpus size via
    :func:`ivf_bits_for_corpus` so per-bucket volume (the quadratic
    unit) stays bounded; the registered gate query pins ``bits`` =
    IVF_BITS because its DuckDB oracle is a static restatement of the
    same bucket arithmetic."""
    bucket = F.lit(0)
    for j in range(bits):
        bucket = bucket + F.when(
            F.get(col, j).cast("double") > 0.0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return bucket


def _ivf_bucket_sql(expr: str, bits: int = IVF_BITS) -> str:
    terms = [
        f"CASE WHEN {expr}[{j + 1}]::DOUBLE > 0.0 THEN {1 << j} ELSE 0 END"
        for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


IVF_SCORE_TILE = 1024  # rows per in-bucket scoring tile


def ivf_score_bucket(pdf: pd.DataFrame, tile: int = IVF_SCORE_TILE) -> pd.DataFrame:
    """Exact top-1-per-vector within one IVF bucket, TILED: scores
    ``tile`` rows at a time against the whole bucket, so peak memory
    is tile×n doubles instead of n×n (an n×n alloc on a 50k-vector
    bucket would be 20 GB in one task). The per-dim sequential
    accumulation keeps every pair's double adds in the identical
    order as the SQL ``list_reduce`` fold — tiling changes memory
    shape, not arithmetic order, so results stay bit-identical.

    Tie-break matches the oracle's ``ORDER BY rounded DESC, vec_id
    ASC``: ids ascend within the bucket, argmax returns the first
    maximum of the 6-decimal-rounded row.
    """
    import numpy as np

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    n = len(ids)
    empty = pd.DataFrame(
        columns=["vec_id", "bucket", "neighbor_id", "_cos"]
    ).astype(
        {
            "vec_id": "int64",
            "bucket": "int64",
            "neighbor_id": "int64",
            "_cos": "float64",
        }
    )
    if n < 2:
        return empty
    mat = np.array(list(pdf["v"]), dtype=np.float64)
    dim = mat.shape[1]
    # norms via the same sequential-over-dims fold as the full-matrix
    # diagonal would accumulate
    sq = np.zeros(n)
    for i in range(dim):
        sq += mat[:, i] * mat[:, i]
    nrm = np.sqrt(sq)
    out_neighbor = np.empty(n, dtype=np.int64)
    out_cos = np.empty(n, dtype=np.float64)
    for s in range(0, n, tile):
        e = min(s + tile, n)
        acc = np.zeros((e - s, n))
        for i in range(dim):
            acc += mat[s:e, i][:, None] * mat[None, :, i]
        cos = acc / (nrm[s:e][:, None] * nrm[None, :])
        ranked = cos.round(6)
        ranked[np.arange(e - s), np.arange(s, e)] = -np.inf  # mask self
        best = ranked.argmax(axis=1)
        out_neighbor[s:e] = ids[best]
        out_cos[s:e] = cos[np.arange(e - s), best]
    return pd.DataFrame(
        {
            "vec_id": ids,
            "bucket": pdf["bucket"].to_numpy(dtype=np.int64),
            "neighbor_id": out_neighbor,
            "_cos": out_cos,
        }
    )


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_ivf_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id, a.bucket, x.vec_id AS neighbor_id,
             ROUND({_cosine_sql('a.embedding', 'x.embedding')}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({_cosine_sql('a.embedding', 'x.embedding')}, 6) DESC,
                        x.vec_id) AS rn
      FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id
    )
    SELECT vec_id, bucket, neighbor_id, cosine
    FROM scored WHERE rn = 1
    """,
)
def sim_ivf_topk(
    spark: SparkSession, sf_dir: str, bits: int | None = None
) -> DataFrame:
    """IVF-style approximate nearest neighbour: deterministic coarse
    quantizer (sign bits of the leading dimensions → 2^bits buckets),
    exact top-1 *within* the bucket.

    This is the scale path for all-pairs similarity: the self-join is
    on the bucket key, so comparisons drop from n² to Σ per-bucket n².
    ``bits`` defaults to IVF_BITS (16 buckets — what the static
    DuckDB oracle restates); production passes
    ``ivf_bits_for_corpus(n)`` so bucket count grows with the corpus
    and per-bucket volume (the quadratic unit AND the parallelism
    grain) stays constant — the r02-flagged 16-task ceiling is a
    parameter choice, not a structural limit (pinned by test:
    plan bucket-key cardinality follows ``bits``). The shuffle moves
    each partition once, keyed by bucket; AQE handles bucket skew.
    Deterministic quantization keeps the operator fully
    oracle-checkable — the probabilistic variant (random hyperplanes)
    is :func:`sim_lsh_candidate_pairs`.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _ivf_bucket_expr(
            F.col("embedding"), bits if bits is not None else IVF_BITS
        ).alias("bucket"),
    )

    # In-bucket exact scoring as ONE tiled numpy kernel per bucket
    # (applyInPandas — see :func:`ivf_score_bucket`): the earlier
    # join + per-pair HOF dot product evaluated ~n²/16 interpreted
    # 64-element folds and then paid a second shuffle + sort for the
    # top-1 window — 3-6× slower and JIT-variance-prone at bench
    # scale. Each bucket arrives once (one shuffle on the bucket key,
    # same as the join's); only n rows per bucket leave the stage;
    # the unrounded cosine is re-rounded Spark-side so the emitted
    # value keeps F.round's HALF_UP semantics.
    out = b.groupBy("bucket").applyInPandas(
        # single-arg wrapper: a 2-param function would be called as
        # (key, pdf) by applyInPandas's signature inspection
        lambda pdf: ivf_score_bucket(pdf),
        schema="vec_id bigint, bucket bigint, neighbor_id bigint, _cos double",
    )
    return out.select(
        "vec_id", "bucket", "neighbor_id", F.round("_cos", 6).alias("cosine")
    )


def lsh_candidate_pairs(emb: DataFrame) -> DataFrame:
    """(vec_a < vec_b) hyperplane-LSH candidates via the shared
    capped one-shuffle bucket expansion (:func:`dedup._pairs_within_
    buckets`): groupBy (band, key) → sorted id list → in-row pair
    expansion. The earlier self-join on the bucket key shuffled (and
    recomputed the Pandas-UDF signature stage for) the bucket lineage
    twice, and a degenerate bucket — all-same sign bits — expanded
    quadratically with no guard; the shared path caps bucket width at
    MAX_BUCKET_SIZE and shuffles once."""
    from almost_any_file_to_pandas_spark.operators.dedup import (
        _pairs_within_buckets,
    )

    buckets = hyperplane_band_keys(emb)
    return _pairs_within_buckets(buckets, "vec_id", ["band", "key"]).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    )


@register("sim_lsh_candidate_pairs")  # rows-only: probabilistic candidates
def sim_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidate pairs with exact cosine
    attached — the probabilistic ANN path (Pandas-UDF signatures,
    capped bucket expansion). Not SQL-expressible deterministically
    (the hyperplanes are engine-side), so the driver records a
    rows-only check; :func:`sim_lsh_verified_pairs` states the
    hash-checkable recall contract.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    cand = lsh_candidate_pairs(emb)
    vecs = emb.select("vec_id", "embedding")
    cand = (
        cand.join(
            vecs.select(F.col("vec_id").alias("aid"), F.col("embedding").alias("va")),
            F.col("vec_a") == F.col("aid"),
        )
        .join(
            vecs.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("vb")),
            F.col("vec_b") == F.col("bid"),
        )
        .select("vec_a", "vec_b", cosine_expr(F.col("va"), F.col("vb")).alias("_cos"))
    )
    return cand.select("vec_a", "vec_b", F.round("_cos", 6).alias("cosine"))


# Verified-LSH band config, tuned to the *verification* threshold
# (0.45): p_bit = 1 − acos(0.45)/π ≈ 0.649 → per-band 0.649³ ≈ 0.273
# → miss prob (1 − 0.273)^64 ≈ 1.5e-9. Recall is therefore ~1 at the
# threshold, making the LSH pipeline's OUTPUT hash-independent: it
# equals the brute-force pair set, which is exactly what the oracle
# states. This is the driver-checkable restatement of the otherwise
# rows-only probabilistic path.
VERIFY_LSH_BANDS = 64
VERIFY_LSH_BITS = 3


def _emb_pairs_oracle() -> str:
    from almost_any_file_to_pandas_spark.operators.dedup import (
        EMB_COSINE_PAIRS_ORACLE,
    )

    return EMB_COSINE_PAIRS_ORACLE


@register("sim_lsh_verified_pairs", oracle=_emb_pairs_oracle())
def sim_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-neighbour pairs, exact-verified at the
    embedding-dedup threshold — same verified-output contract as
    :func:`dedup.dedup_minhash_lsh`: candidates are probabilistic, but
    with the band config above every true pair is caught (miss prob
    ~1e-9), so the verified output equals brute force and the driver
    hash-checks it against the same oracle as ``dedup_embedding_
    cosine``. Plan: linear signature stage → one capped bucket
    shuffle → pair expansion → exact-cosine verify on the pair set.
    """
    from almost_any_file_to_pandas_spark.operators.dedup import (
        EMBEDDING_DUP_THRESHOLD,
        _pairs_within_buckets,
    )

    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    buckets = hyperplane_band_keys(
        emb, bands=VERIFY_LSH_BANDS, bits=VERIFY_LSH_BITS
    )
    cand = _pairs_within_buckets(buckets, "vec_id", ["band", "key"]).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    )
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    scored = (
        cand.join(
            vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")),
            "vec_a",
        )
        .join(
            vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")),
            "vec_b",
        )
        .select(
            "vec_a", "vec_b", cosine_expr(F.col("va"), F.col("vb")).alias("_cos")
        )
        .filter(F.col("_cos") >= EMBEDDING_DUP_THRESHOLD)
    )
    return scored.select(
        "vec_a", "vec_b", F.round("_cos", 6).alias("cosine")
    )


@register(
    "sim_centroid_by_label",
    oracle="""
    WITH e AS (
      SELECT label, embedding::DOUBLE[] AS v FROM embeddings
    ), expanded AS (
      SELECT label, u.i AS dim_idx,
             CAST(FLOOR(u.x * 1e12 + 0.5) AS BIGINT) AS vq12
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS i, unnest(v) AS x
      ) u
    )
    SELECT label, dim_idx,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(CAST(SUM(vq12) AS HUGEINT) // COUNT(*) AS BIGINT)
             AS centroid_q12
    FROM expanded
    GROUP BY label, dim_idx
    HAVING dim_idx <= 4
    """,
)
def sim_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first 4 dims) — the IVF
    coarse-quantizer build step (centroids via groupBy, assignment =
    nearest centroid broadcast back).

    ROUND-7 conversion to the house all-integer recipe (the last
    ROUND-over-aggregate exemption retired, executed together with
    this row's rotation OUT of the gate window): each component is
    quantized per row (``FLOOR(val·1e12 + 0.5)`` — identical IEEE
    double product + FLOOR on both engines), summed as exact integers
    (DECIMAL(38,0)/HUGEINT-widened — order-independent), and the mean
    is an integer ``div`` by the count (both engines truncate toward
    zero). Emitting ``n_vectors`` alongside keeps the exact sum
    recoverable (``sum_q12 = centroid_q12·n + remainder``)."""
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim_idx"),
        F.floor(F.col("val") * F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("vq12"),
    )
    return (
        exploded.filter(F.col("dim_idx") <= 4)
        .groupBy("label", "dim_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.expr(
                "CAST(CAST(SUM(vq12) AS DECIMAL(38,0)) div COUNT(*)"
                " AS BIGINT)"
            ).alias("centroid_q12"),
        )
    )


@register(
    "sim_quantize_int8",
    oracle="""
    SELECT vec_id,
           ROUND(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 6)
             AS scale,
           array_to_string(list_transform(
             embedding::DOUBLE[],
             x -> CAST(CAST(round(x * 127.0
                  / list_max(list_transform(embedding::DOUBLE[], y -> abs(y))))
                  AS BIGINT) AS VARCHAR)
           ), ',') AS q_csv
    FROM embeddings
    WHERE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x|, code =
    round(x·127/scale) — the storage-side half of IVF/PQ pipelines
    (4× smaller than float32, 8× smaller than the double working set;
    at 100 TB of vectors the scan cost drops proportionally and the
    codes stay a plain array column Spark can shuffle/filter
    natively). Pure column expressions; dequantize = q·scale/127.

    The codes are *emitted* CSV-serialized (``q_csv``): the driver's
    hash-compare gate canonicalizes cells with pandas, which cannot
    hash array cells (CORRECTNESS_r01 recorded the TypeError) —
    production keeps the array column; the string form is the
    gate-facing contract.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    vd = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    q = F.transform(vd, lambda x: F.round(x * 127.0 / amax).cast("bigint"))
    return (
        emb.select(
            "vec_id", amax.alias("_scale"), q.alias("q")
        )
        .filter(F.col("_scale") > 0)
        .select(
            "vec_id",
            F.round("_scale", 6).alias("scale"),
            F.concat_ws(",", F.col("q").cast("array<string>")).alias("q_csv"),
        )
    )


IVF_K = 16
IVF_NPROBE = 4
IVF_QUERIES = 10


def ivf_k_for_corpus(n_vectors: int, target: int = IVF_TARGET_BUCKET_ROWS) -> int:
    """Learned-quantizer counterpart of :func:`ivf_bits_for_corpus`:
    inverted-list count ~ n/target (floored at IVF_K), keeping each
    list — the unit a probe scans exactly — near-constant as the
    corpus grows. The FAISS-style rule of thumb (k ≈ √n) optimizes
    probe cost when nprobe also scales; here target-sized lists keep
    the *per-task* memory bound, which is the Spark-side constraint.
    """
    return max(IVF_K, -(-n_vectors // target))


@register("sim_ivf_kmeans_topk")  # no oracle: k-means is not SQL-expressible
def sim_ivf_kmeans_topk(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """IVF ANN with *learned* coarse centroids: KMeans (pyspark.ml)
    partitions the corpus into IVF_K inverted lists; each query probes
    its IVF_NPROBE nearest lists and scores exact cosine only there.

    This is the production ANN shape at 100 TB: train the quantizer on
    a sample (here: the corpus — testdata-sized), persist the model,
    assign every vector ONE bucket id (a plain int column → hash-
    partitioned storage by bucket co-locates each list), and at query
    time touch nprobe/K of the data. Search cost drops ~K/nprobe-fold
    vs brute force at the recall the probe count buys. Rows-only
    correctness check (no SQL oracle can restate Lloyd's iterations);
    the exact baselines (sim_bruteforce_topk / sim_knn_batch) are the
    recall reference.
    """
    apply_engine_conf(spark)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = table_wide(spark, sf_dir, "embeddings")
    feats = emb.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )
    # Cache the training frame: Lloyd's re-executes the lineage once
    # per iteration otherwise (see dedup_semantic_clusters). The fit
    # input is the quantizer training set — bounded by sampling at
    # production scale.
    train = feats.select("features").cache()
    # degenerate guards (no-ops at any real SF): the count also
    # materializes the cache; k can never exceed the point count
    n_train = train.count()
    if n_train <= 1:
        # 0 vectors: nothing to index; 1 vector: top-k excludes self,
        # so the answer is empty either way (KMeans rejects k < 2)
        return spark.createDataFrame(
            [],
            "query_id bigint, vec_id bigint, bucket int,"
            " cosine double, ivf_rank int",
        )
    model = KMeans(
        k=max(2, min(k if k is not None else IVF_K, n_train)),
        seed=42,
        maxIter=5,
    ).fit(train)
    train.unpersist(blocking=False)
    assigned = model.transform(feats).select(
        "vec_id", "embedding", F.col("prediction").alias("bucket")
    )

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "bucket int, center array<double>",
    )
    queries = assigned.filter(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    # nprobe nearest centroids per query (16 centers → broadcast)
    qc = queries.crossJoin(F.broadcast(centers)).select(
        "query_id",
        "qvec",
        "bucket",
        _dot(F.col("qvec"), F.col("center")).alias("_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("bucket"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= IVF_NPROBE)
        .select("query_id", "qvec", "bucket")
    )
    # search only the probed inverted lists
    cands = assigned.join(F.broadcast(probes), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        "bucket",
        F.round(cosine_expr(F.col("embedding"), F.col("qvec")), 6).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("ivf_rank", F.row_number().over(w)).filter(
        F.col("ivf_rank") <= KNN_K
    )


@register("sim_ivf_recall")  # rows-only: depends on k-means assignments
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the k-means IVF search against the exact kNN
    baseline — the measurement loop every ANN deployment needs (tune
    nprobe/K against it). Output: one row per query with hit count
    and recall, plus ordering info to spot rank inversions."""
    apply_engine_conf(spark)
    exact = sim_knn_batch(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    approx = sim_ivf_kmeans_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("approx_id")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.exact_id == approx.approx_id),
    ).groupBy(exact.query_id.alias("qid")).agg(F.count("*").alias("n_hits"))
    per_query = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("k"))
        .join(hits, F.col("query_id") == F.col("qid"), "left")
        .select(
            "query_id",
            "k",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k")).alias(
                "recall_at_k"
            ),
        )
    )
    return per_query


IVF_RECALL_FLOOR = 0.3  # macro recall@5 observed 0.52 at sf0.01


@register(
    "sim_ivf_recall_floor",
    oracle=f"""
    -- n_queries counts EVALUABLE queries: a query vector with no
    -- possible neighbor (corpus of one) has no recall to measure
    SELECT CASE WHEN (SELECT COUNT(*) FROM embeddings) > 1
                THEN COUNT(*) ELSE 0 END AS n_queries,
           CAST({KNN_K} AS BIGINT) AS k,
           TRUE AS recall_floor_met
    FROM embeddings WHERE vec_id < {N_QUERIES}
    """,
)
def sim_ivf_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked acceptance gate over :func:`sim_ivf_recall` (the
    ``events_approx_distinct`` tolerance pattern): one row claiming
    macro recall@k of the k-means IVF search ≥ IVF_RECALL_FLOOR,
    anchored to the query-batch count the oracle derives
    independently. Converts the rows-only recall loop into a row the
    driver's hash gate can pin."""
    per_query = sim_ivf_recall(spark, sf_dir)
    return per_query.agg(
        F.count("*").alias("n_queries"),
        # engine-side empty alignment (frozen oracle states constants):
        # zero evaluable queries -> nominal k, vacuously-met floor
        F.coalesce(F.max("k").cast("bigint"), F.lit(KNN_K)).alias(
            "k"
        ),
        F.coalesce(
            F.avg("recall_at_k") >= F.lit(IVF_RECALL_FLOOR), F.lit(True)
        ).alias("recall_floor_met"),
    )


RANGE_SEARCH_THRESHOLD = 0.3  # max query↔corpus cosine is 0.493 at sf0.01


@register(
    "sim_range_search",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    )
    SELECT q.query_id, e.vec_id,
           ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
      AND ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6)
          >= {RANGE_SEARCH_THRESHOLD}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: ALL corpus vectors within cosine ≥ threshold of
    each query — the radius-based sibling of top-k (recommendation
    "more like this", contamination sweeps, near-dup probes use a
    radius, not a k).

    Plan mirrors :func:`sim_knn_batch`'s scoring pass — broadcast the
    query batch, one narrow corpus pass — but the survivor set is the
    threshold filter itself: no window, no rank, so the whole query is
    scan → broadcast-nested-loop → filter, one stage over the corpus
    with nothing shuffled. At 100 TB the corpus side stays partitioned
    and each task emits only its in-radius rows; the threshold cut
    happens on the ROUNDED cosine so both engines keep the identical
    boundary rows (the zscore-pattern rounding contract).
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qnrm"),
    )
    corpus = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    return (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= RANGE_SEARCH_THRESHOLD)
    )


HARD_NEG_K = 5


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             embedding AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.anchor_id, q.anchor_label, e.vec_id AS negative_id,
             e.label AS negative_label,
             ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.anchor_id
               ORDER BY ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) DESC,
                        e.vec_id) AS neg_rank
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.anchor_id AND e.label <> q.anchor_label
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label,
           cosine, neg_rank
    FROM scored WHERE neg_rank <= {HARD_NEG_K}
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (vec_id < {N}), the ``HARD_NEG_K`` most-similar vectors with a
    DIFFERENT label — the negatives that actually move a contrastive
    loss (random negatives are trivially separable; hardest-negative
    batches are the standard curriculum). Same plan as the k-NN
    batch — broadcast anchors, one narrow scoring pass, per-anchor
    rank window — plus the label-mismatch predicate applied BEFORE
    ranking, so the window ranks only eligible negatives.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qnrm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_label") != F.col("anchor_label"))
        )
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return scored.withColumn("neg_rank", F.row_number().over(w)).filter(
        F.col("neg_rank") <= HARD_NEG_K
    )


KNN_EVAL_N = 50  # anchors in the leave-one-out label-accuracy eval


@register(
    "sim_knn_label_accuracy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS anchor_id, label AS true_label,
             embedding AS qvec
      FROM embeddings WHERE vec_id < {KNN_EVAL_N}
    ), ranked AS (
      SELECT q.anchor_id, q.true_label, e.label AS pred_label,
             ROW_NUMBER() OVER (
               PARTITION BY q.anchor_id
               ORDER BY ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) DESC,
                        e.vec_id) AS rnk
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.anchor_id
    )
    SELECT COUNT(*) AS n_anchors,
           SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
             AS n_correct,
           -- all-integer share (the house _q6 recipe), never a
           -- ROUND-ed float division
           (SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            * 1000000) // COUNT(*) AS accuracy_q6
    FROM ranked WHERE rnk = 1
    """,
)
def sim_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label accuracy over the first
    ``KNN_EVAL_N`` vectors — the standard intrinsic eval of an
    embedding space ("do nearest neighbours share a label?") that
    gates an embedding upgrade before it reaches dedup/ANN. Same
    broadcast-anchor one-pass scoring shape as the k-NN batch; one
    row out.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < KNN_EVAL_N).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qnrm"),
    )
    corpus = emb.select(
        "vec_id",
        F.col("label").alias("pred_label"),
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    top1 = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "true_label",
            "pred_label",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return top1.agg(
        F.count("*").alias("n_anchors"),
        F.sum(hit).alias("n_correct"),
        F.expr(
            "sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        ).alias("accuracy_q6"),
    )


MRL_PREFIX_DIMS = 16  # Matryoshka prefix (of 64) used for cheap search
MRL_SHORTLIST = 100  # prefix-ranked candidates kept for full re-rank
MRL_RECALL_FLOOR = 0.3  # macro recall@KNN_K of rerank-of-shortlist


@register(
    "sim_matryoshka_prefix_floor",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cf,
             ROUND({_cosine_sql(
                 f'list_slice(e.embedding, 1, {MRL_PREFIX_DIMS})',
                 f'list_slice(q.qvec, 1, {MRL_PREFIX_DIMS})')}, 6) AS cp
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, cf,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cf DESC, vec_id) AS r_full,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cp DESC, vec_id) AS r_prefix
      FROM scored
    ), rerank AS (
      SELECT query_id, vec_id, r_full,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cf DESC, vec_id) AS r_rr
      FROM ranked WHERE r_prefix <= {MRL_SHORTLIST}
    ), hits AS (
      SELECT CAST(COUNT(*) FILTER (WHERE r_full <= {KNN_K}
                                     AND r_rr <= {KNN_K}) AS BIGINT)
               AS n_hits
      FROM rerank
    )
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST({KNN_K} AS BIGINT) AS k,
           CAST({MRL_PREFIX_DIMS} AS BIGINT) AS prefix_dims,
           n_hits,
           (n_hits * 1000000) // {N_QUERIES * KNN_K} AS recall_q6,
           (n_hits * 1000000) // {N_QUERIES * KNN_K}
             >= {int(MRL_RECALL_FLOOR * 1_000_000)} AS recall_floor_met
    FROM hits
    """,
)
def sim_matryoshka_prefix_floor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-representation search audit — the MRL deployment
    pattern end to end: rank the corpus by the FIRST
    ``MRL_PREFIX_DIMS`` dimensions only (the cheap first-stage
    index), keep a ``MRL_SHORTLIST``-deep shortlist, re-rank the
    shortlist with full vectors, and report macro recall@k of the
    re-ranked top-k against the exact full-dimension top-k. That
    recall is the go/no-go number for shipping a prefix index at
    100 TB, where a 4× dimension cut is a 4× scan-bandwidth and
    memory cut on the first stage and full vectors are fetched for
    only ``shortlist`` candidates per query.

    Fully oracle-paired (no TRUE-literal floor): both engines compute
    both rankings on identical doubles (float32 inputs are exact in
    double; slice-then-fold accumulates in the same order), rank on
    the quantized key with vec_id tie-break, and report the recall as
    an all-integer ``(hits·1e6) div (n_queries·k)``.

    Plan: ONE broadcast of the query batch, one narrow corpus pass
    scoring BOTH cosines (the prefix slice reuses the same array — no
    second scan), one shuffle on query_id where the full/prefix
    row_number windows AND the shortlist re-rank window all share the
    partitioning (Catalyst exchanges once, sorts per window), then a
    one-row fold.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pre = lambda c: F.slice(c, 1, MRL_PREFIX_DIMS)  # noqa: E731
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_expr(F.col("embedding"), F.col("qvec")), 6
            ).alias("cf"),
            F.round(
                cosine_expr(pre(F.col("embedding")), pre(F.col("qvec"))), 6
            ).alias("cp"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("cf"), F.asc("vec_id"))
    wp = W.partitionBy("query_id").orderBy(F.desc("cp"), F.asc("vec_id"))
    ranked = scored.withColumn("r_full", F.row_number().over(wf)).withColumn(
        "r_prefix", F.row_number().over(wp)
    )
    rerank = ranked.filter(F.col("r_prefix") <= MRL_SHORTLIST).withColumn(
        "r_rr", F.row_number().over(wf)
    )
    denom = N_QUERIES * KNN_K
    # COALESCE: zero hits on an empty shortlist (SUM over no rows is
    # NULL; the oracle's COUNT FILTER says 0 and the floor fails)
    hit_sum = (
        f"COALESCE(sum(CASE WHEN r_full <= {KNN_K} AND r_rr <= {KNN_K} "
        "THEN 1 ELSE 0 END), 0)"
    )
    return rerank.agg(
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        F.lit(KNN_K).cast("long").alias("k"),
        F.lit(MRL_PREFIX_DIMS).cast("long").alias("prefix_dims"),
        F.expr(f"CAST({hit_sum} AS BIGINT)").alias("n_hits"),
        F.expr(
            f"CAST({hit_sum} * 1000000 div {denom} AS BIGINT)"
        ).alias("recall_q6"),
        (
            F.expr(f"{hit_sum} * 1000000 div {denom}")
            >= int(MRL_RECALL_FLOOR * 1_000_000)
        ).alias("recall_floor_met"),
    )


FILTERED_LABEL = 3  # attribute predicate for the filtered search


@register(
    "sim_filtered_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID} AND e.label = {FILTERED_LABEL}
    ORDER BY ROUND({_cosine_sql('e.embedding', 'q.qvec')}, 6) DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-FILTERED vector search: exact cosine top-k restricted
    to vectors with ``label = 3`` — the pre-filtered search mode every
    production vector store is judged on (post-filtering a plain
    top-k under-fills k whenever the predicate is selective; the
    filter must constrain the SEARCH, not the results).

    Plan: the predicate is a plain column comparison, so it reaches
    the parquet scan as a pushed filter (plan-asserted) — at 100 TB
    with the corpus laid out by the partition attribute (the
    `write_range_layout` / IVF-persistence machinery in sinks.py),
    the same predicate prunes FILES, and the scoring pass touches
    only the selected slice. Scoring/tie-break/quantization are the
    `sim_bruteforce_topk` contract unchanged.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        emb.filter(
            (F.col("vec_id") != QUERY_VEC_ID)
            & (F.col("label") == FILTERED_LABEL)
        )
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(
                cosine_expr(F.col("embedding"), F.col("qvec")), 6
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(TOP_K)


ARRIVAL_MOD = 10  # vec_id % 10 == 7 plays the newly-arrived batch


@register(
    "sim_ivf_incremental_assign",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, {_ivf_bucket_sql('embedding')} AS bucket
      FROM embeddings WHERE vec_id % {ARRIVAL_MOD} <> 7
    ), arrivals AS (
      SELECT vec_id, {_ivf_bucket_sql('embedding')} AS bucket
      FROM embeddings WHERE vec_id % {ARRIVAL_MOD} = 7
    ), b AS (
      SELECT bucket, COUNT(*) AS n_base FROM base GROUP BY bucket
    ), a AS (
      SELECT bucket, COUNT(*) AS n_new FROM arrivals GROUP BY bucket
    )
    SELECT COALESCE(b.bucket, a.bucket) AS bucket,
           COALESCE(b.n_base, 0) AS n_base,
           COALESCE(a.n_new, 0) AS n_new,
           -- integer growth per mille of the bucket (house recipe);
           -- empty base buckets pin to 1e6 (pure growth)
           CASE WHEN COALESCE(b.n_base, 0) = 0 THEN 1000000
                ELSE (COALESCE(a.n_new, 0) * 1000000)
                     // b.n_base END AS growth_q6
    FROM b FULL OUTER JOIN a ON b.bucket = a.bucket
    """,
)
def sim_ivf_incremental_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ANN index maintenance: a batch of newly-arrived
    vectors is assigned to the EXISTING coarse buckets without any
    refit (the quantizer is frozen between rebuilds — the standard
    serving pattern), and the census reports per-bucket growth so an
    operator can see when drift warrants a re-train (a bucket growing
    much faster than the corpus means the quantizer no longer fits
    the data distribution).

    Plan: the arrival split is a pushed-down predicate; both sides
    take the same narrow bucket projection + one small aggregate
    each; the census join is over ≤ 2^IVF_BITS rows. At 100 TB the
    arrivals batch is the only data scanned if base censuses are
    cached from the prior build — the full-scan form here is the
    cold-start statement of the same plan.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    bucket = _ivf_bucket_expr(F.col("embedding"))
    base = (
        emb.filter(F.col("vec_id") % ARRIVAL_MOD != 7)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_base"))
    )
    arrivals = (
        emb.filter(F.col("vec_id") % ARRIVAL_MOD == 7)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_new"))
    )
    j = base.join(arrivals, "bucket", "full")
    return j.select(
        "bucket",
        F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        F.expr(
            "CASE WHEN COALESCE(n_base, 0) = 0 THEN 1000000"
            " ELSE COALESCE(n_new, 0) * 1000000 div n_base END"
        ).alias("growth_q6"),
    )


@register(
    "sim_label_affinity_matrix",
    oracle="""
    WITH e AS (
      SELECT label, embedding::DOUBLE[] AS v FROM embeddings
    ), expanded AS (
      SELECT label, u.i AS dim_idx, u.x AS val
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS i, unnest(v) AS x
      ) u
    ), cent AS (
      SELECT label, dim_idx,
             CAST(FLOOR(CAST(SUM(CAST(val AS DECIMAL(30,15))) AS DOUBLE)
                        / COUNT(*) * 1000000 + 0.5) AS BIGINT) AS c_q6
      FROM expanded GROUP BY label, dim_idx
    ), norms AS (
      SELECT label, SUM(c_q6 * c_q6) AS n2 FROM cent GROUP BY label
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.c_q6 * b.c_q6) AS dot
      FROM cent a JOIN cent b
        ON a.dim_idx = b.dim_idx AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT d.label_a, d.label_b,
           CAST(FLOOR(CAST(d.dot AS DOUBLE)
                      / (SQRT(CAST(na.n2 AS DOUBLE))
                         * SQRT(CAST(nb.n2 AS DOUBLE)))
                      * 1000000 + 0.5) AS BIGINT) AS cosine_q6
    FROM dots d
    JOIN norms na ON na.label = d.label_a
    JOIN norms nb ON nb.label = d.label_b
    """,
)
def sim_label_affinity_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise cosine between per-label centroids — the
    label-confusability audit run before using labels as retrieval
    filters or training targets (two labels with near-1 centroid
    cosine will leak into each other's neighborhoods).

    Exactness protocol: centroid components quantize to integer
    micros BEFORE any pairwise arithmetic, so the dot products and
    squared norms are exact integer sums (order-free in both
    engines); the final cosine divides identical integers through
    IEEE sqrt (correctly rounded everywhere) and quantizes once more.

    Plan: one corpus pass (posexplode feeding a map-side partial
    (label, dim) aggregate — the shuffle carries |labels|·dims rows,
    not the corpus); everything pairwise happens on that k×d frame:
    a broadcast self-join on dim and two tiny norm joins.  At 100 TB
    the |labels|² work is independent of corpus size.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    cent = (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .select("label", (F.col("pos") + 1).alias("dim_idx"), "val")
        .groupBy("label", "dim_idx")
        .agg(
            F.floor(
                F.sum(F.col("val").cast("decimal(30,15)")).cast("double")
                / F.count("*")
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("c_q6")
        )
    )
    norms = cent.groupBy(F.col("label").alias("n_label")).agg(
        F.sum(F.col("c_q6") * F.col("c_q6")).alias("n2")
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim_idx",
        F.col("c_q6").alias("ca"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("dim_idx").alias("dim_b"),
        F.col("c_q6").alias("cb"),
    )
    dots = (
        a.join(
            F.broadcast(b),
            (F.col("dim_idx") == F.col("dim_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(
        F.col("n_label").alias("label_a"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("n_label").alias("label_b"), F.col("n2").alias("nb2")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.floor(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cosine_q6"),
        )
    )


BQ_DIMS = 64  # corpus embedding width; generalizes to ceil(d/32) words
BQ_SHORTLIST = 50


def _bq_q6(cell: str) -> str:
    """Exact q6 quantization of one float cell, engine-portable: the
    float→double widening is value-exact and FLOOR(double·1e6+0.5)
    computes bit-identically in Spark and DuckDB."""
    return f"CAST(FLOOR(CAST({cell} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"


def _bq_word_sql(col: str, lo: int, spark_side: bool) -> str:
    """32 sign bits of dims [lo, lo+32) packed into one BIGINT word.
    32-bit words on purpose: DuckDB RAISES on 1<<63 where Spark
    wraps, so no shift ever reaches bit 63 (the bitmap-rollup rule).
    Generated as a flat +-chain — identical integer arithmetic text
    on both engines (Spark indexes via 1-based element_at, DuckDB
    via 1-based [])."""
    terms = []
    for i in range(32):
        cell = (
            f"element_at({col}, {lo + i + 1})"
            if spark_side
            else f"{col}[{lo + i + 1}]"
        )
        terms.append(
            f"(CASE WHEN CAST({cell} AS DOUBLE) > 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _bq_dot_sql(a: str, b: str, spark_side: bool) -> str:
    """Exact integer q12 dot product over the 64 dims, generated as
    one flat sum of q6×q6 products (≤ 6.4e13 — BIGINT-safe)."""
    terms = []
    for i in range(BQ_DIMS):
        ca = (
            f"element_at({a}, {i + 1})" if spark_side else f"{a}[{i + 1}]"
        )
        cb = (
            f"element_at({b}, {i + 1})" if spark_side else f"{b}[{i + 1}]"
        )
        terms.append(f"{_bq_q6(ca)} * {_bq_q6(cb)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _bq_oracle() -> str:
    w0 = _bq_word_sql("embedding", 0, spark_side=False)
    w1 = _bq_word_sql("embedding", 32, spark_side=False)
    dot = _bq_dot_sql("e.embedding", "q.qvec", spark_side=False)
    return f"""
    WITH p AS (
      SELECT vec_id, embedding, {w0} AS w0, {w1} AS w1 FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qvec, w0 AS q0, w1 AS q1
      FROM p WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, p.vec_id,
             CAST(bit_count(xor(p.w0, q.q0))
                  + bit_count(xor(p.w1, q.q1)) AS BIGINT) AS hamming
      FROM p, q WHERE p.vec_id <> q.query_id
    ), short AS (
      SELECT query_id, vec_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY hamming, vec_id) AS srank
      FROM scored
    ), reranked AS (
      SELECT s.query_id, s.vec_id, s.hamming, {dot} AS dot_q12
      FROM short s
      JOIN p e ON e.vec_id = s.vec_id
      JOIN q ON q.query_id = s.query_id
      WHERE s.srank <= {BQ_SHORTLIST}
    ), final AS (
      SELECT query_id, vec_id, hamming, dot_q12,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_q12 DESC, vec_id)
               AS knn_rank
      FROM reranked
    )
    SELECT query_id, CAST(knn_rank AS BIGINT) AS knn_rank, vec_id,
           hamming, dot_q12
    FROM final WHERE knn_rank <= {KNN_K}
    """


@register("sim_binary_sign_topk", oracle=_bq_oracle())
def sim_binary_sign_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (the vector-DB "BQ" path): each vector
    compresses 256× into two 32-bit SIGN WORDS; candidate generation
    ranks by Hamming distance on the packed words (bit_count(xor) —
    2 machine words per comparison instead of 64 float mults), and
    only the per-query shortlist (BQ_SHORTLIST=50) is re-ranked by
    the exact integer-q6 dot product.

    Scale: the packed corpus is 16 bytes/vector — RAM-resident at
    billions of vectors where floats are not; Hamming scoring is one
    narrow codegen pass against the broadcast query words; the
    shortlist window keeps k·queries rows; the float arrays are only
    touched again for shortlist×queries rows (a broadcast join).
    Every arithmetic step (sign test, xor popcount, q6 products) is
    engine-exact, so the oracle is a full value twin, not a recall
    floor — complements the IVF/PQ/JL members whose compression is
    lossy-scored.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bq_word_sql("embedding", 0, spark_side=True)).alias("w0"),
        F.expr(_bq_word_sql("embedding", 32, spark_side=True)).alias(
            "w1"
        ),
    )
    queries = packed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = (
        packed.drop("embedding")
        .crossJoin(F.broadcast(queries.drop("qvec")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(
                "CAST(bit_count(w0 ^ q0) + bit_count(w1 ^ q1)"
                " AS BIGINT)"
            ).alias("hamming"),
        )
    )
    w_short = W.partitionBy("query_id").orderBy("hamming", "vec_id")
    shortlist = (
        scored.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= BQ_SHORTLIST)
        .drop("srank")
    )
    # shortlist (k·queries rows) + query vectors broadcast AGAINST
    # the corpus — the big side never shuffles for the rerank
    short_q = shortlist.join(
        F.broadcast(queries.select("query_id", "qvec")), "query_id"
    )
    reranked = (
        packed.select("vec_id", "embedding")
        .join(F.broadcast(short_q), "vec_id")
        .select(
            "query_id",
            "vec_id",
            "hamming",
            F.expr(
                _bq_dot_sql("embedding", "qvec", spark_side=True)
            ).alias("dot_q12"),
        )
    )
    w_final = W.partitionBy("query_id").orderBy(
        F.desc("dot_q12"), F.asc("vec_id")
    )
    return (
        reranked.withColumn("knn_rank", F.row_number().over(w_final))
        .filter(F.col("knn_rank") <= KNN_K)
        .select(
            "query_id",
            F.col("knn_rank").cast("long").alias("knn_rank"),
            "vec_id",
            "hamming",
            "dot_q12",
        )
    )


MUTUAL_K = 3  # in-bucket kNN width for the mutual filter


@register(
    "sim_mutual_knn_pairs",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, embedding,
             {_ivf_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS src, c.vec_id AS dst,
             ROUND({_cosine_sql('a.embedding', 'c.embedding')}, 6)
               AS cosine
      FROM b a JOIN b c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ), ranked AS (
      SELECT src, dst, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY src ORDER BY cosine DESC, dst) AS rk
      FROM scored
    ), edges AS MATERIALIZED (
      SELECT src, dst, cosine, rk FROM ranked WHERE rk <= {MUTUAL_K}
    )
    SELECT e1.src AS vec_a, e1.dst AS vec_b, e1.cosine,
           e1.rk AS rank_ab, e2.rk AS rank_ba
    FROM edges e1 JOIN edges e2
      ON e1.src = e2.dst AND e1.dst = e2.src
    WHERE e1.src < e1.dst
    """,
)
def sim_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual (reciprocal) kNN pairs over the IVF-bucketed corpus:
    (a, b) survives only if b is in a's in-bucket top-{MUTUAL_K} AND
    a is in b's — the asymmetry filter that separates true near-
    duplicate / alignment candidates from hub vectors (a hub sits in
    everyone's top-k; almost nobody sits in the hub's). Standard
    candidate miner for bitext alignment and duplicate verification
    (Artetxe & Schwenk 2019's margin-scoring precursor).

    Exactness rides the family's proven recipes: the deterministic
    sign-bit coarse quantizer bounds the quadratic unit per bucket,
    ranks compare the ROUNDED cosine (IEEE-exact shared expression
    text) with vec_id tiebreak, and the mutual check is an equi-join
    of the edge list against its own reversal — (src,dst)-keyed, so
    it shuffles k·n edge rows, never vectors.

    Scale: one bucket-keyed shuffle scores Σ per-bucket n² pairs
    (production widens ``bits`` via :func:`ivf_bits_for_corpus` to
    keep the unit constant); the reciprocal join moves only the
    k-bounded edge list. The in-bucket scorer is the join+HOF
    restatement the oracle mirrors — the tiled numpy kernel
    (:func:`ivf_score_bucket`) is the drop-in production scorer.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _ivf_bucket_expr(F.col("embedding")).alias("bucket"),
    )
    left = b.select(
        F.col("vec_id").alias("src"),
        F.col("v").alias("va"),
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("dst"),
        F.col("v").alias("vb"),
        F.col("bucket").alias("bucket_r"),
    )
    scored = (
        left.join(
            right,
            (F.col("bucket") == F.col("bucket_r"))
            & (F.col("src") != F.col("dst")),
        )
        .select(
            "src",
            "dst",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MUTUAL_K)
        .localCheckpoint(eager=True)
    )
    rev = edges.select(
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
        F.col("rk").alias("rank_ba"),
    )
    return (
        edges.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("vec_a"),
            F.col("dst").alias("vec_b"),
            "cosine",
            F.col("rk").alias("rank_ab"),
            "rank_ba",
        )
    )


NPROBE_CURVE = (1, 2, 4, 8)


@register(
    "sim_ivf_nprobe_recall_curve",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_ivf_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ), nq AS (
      SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket
      FROM b WHERE vec_id < {N_QUERIES}
    ), buckets AS (
      SELECT DISTINCT bucket FROM b
    ), probes AS (
      SELECT query_id, qvec, bucket,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY bit_count(xor(CAST(qbucket AS BIGINT),
                                      CAST(bucket AS BIGINT))),
                        bucket) AS probe_rank
      FROM nq, buckets
    ), cand AS (
      SELECT p.query_id, p.probe_rank, x.vec_id,
             ROUND({_cosine_sql('x.embedding', 'p.qvec')}, 6) AS cosine
      FROM probes p JOIN b x ON x.bucket = p.bucket
      WHERE p.probe_rank <= {max(NPROBE_CURVE)}
        AND x.vec_id <> p.query_id
    ), exact AS (
      SELECT q.query_id, x.vec_id
      FROM nq q JOIN b x ON x.vec_id <> q.query_id
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.query_id
        ORDER BY ROUND({_cosine_sql('x.embedding', 'q.qvec')}, 6) DESC,
                 x.vec_id) <= {KNN_K}
    ), picks AS (
      SELECT np.nprobe, c.query_id, c.vec_id
      FROM (VALUES {', '.join(f'({v})' for v in NPROBE_CURVE)})
           np(nprobe), cand c
      WHERE c.probe_rank <= np.nprobe
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY np.nprobe, c.query_id
        ORDER BY c.cosine DESC, c.vec_id) <= {KNN_K}
    ), hits AS (
      SELECT p.nprobe, COUNT(*) AS n_hits
      FROM picks p JOIN exact e
        ON p.query_id = e.query_id AND p.vec_id = e.vec_id
      GROUP BY p.nprobe
    ), denom AS (
      SELECT COUNT(*) AS n_exact FROM exact
    )
    SELECT CAST(v.nprobe AS INTEGER) AS nprobe,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(d.n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN d.n_exact = 0 THEN 0
                ELSE COALESCE(h.n_hits, 0) * 1000000 // d.n_exact
                END AS BIGINT) AS recall_q6
    FROM (VALUES {', '.join(f'({v})' for v in NPROBE_CURVE)}) v(nprobe)
    LEFT JOIN hits h ON v.nprobe = h.nprobe, denom d
    """,
)
def sim_ivf_nprobe_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@k as a function of nprobe for the DETERMINISTIC
    (sign-bit) IVF quantizer — the tuning curve every ANN deployment
    reads before picking its probe count, here fully oracle-checkable
    because both the buckets and the probe ORDER (Hamming distance
    between sign-bit codes, tie-break bucket id) are static integer
    arithmetic. For each nprobe ∈ {1, 2, 4, 8}: probe the nprobe
    Hamming-nearest non-empty lists, take the in-probe top-k, and
    score hits against the exact brute-force top-k
    (:func:`sim_knn_batch` — the same query batch and rounding).
    Output: one row per nprobe with hit/evaluable counts and the
    integer q6 macro recall.

    Plan (100 TB shape): candidates are generated ONCE at the widest
    probe depth (one bucket-keyed join of the ≤|queries|·nprobe_max
    broadcast probe table against the corpus), then every curve point
    reuses that scored frame through a (nprobe, query) window — the
    curve costs one corpus pass plus rank windows over candidate
    rows, not one search per point. The exact baseline is the already
    audited broadcast-scoring pass; the final fixed 4-row frame
    assembles driver-side-free via broadcast joins.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "embedding",
        _ivf_bucket_expr(F.col("embedding")).alias("bucket"),
    )
    nq = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    buckets = b.select("bucket").distinct()
    wp = W.partitionBy("query_id").orderBy(
        F.bit_count(
            F.expr("CAST(qbucket AS BIGINT) ^ CAST(bucket AS BIGINT)")
        ),
        F.asc("bucket"),
    )
    probes = (
        nq.crossJoin(F.broadcast(buckets))
        .withColumn("probe_rank", F.row_number().over(wp))
        .filter(F.col("probe_rank") <= max(NPROBE_CURVE))
        .select("query_id", "qvec", "bucket", "probe_rank")
    )
    cand = (
        b.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "probe_rank",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                6,
            ).alias("cosine"),
        )
    )
    nprobes = spark.createDataFrame(
        [(v,) for v in NPROBE_CURVE], "nprobe int"
    )
    wk = W.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    picks = (
        cand.join(
            F.broadcast(nprobes),
            F.col("probe_rank") <= F.col("nprobe"),
        )
        .withColumn("_r", F.row_number().over(wk))
        .filter(F.col("_r") <= KNN_K)
        .select("nprobe", "query_id", "vec_id")
    )
    exact = sim_knn_batch(spark, sf_dir).select("query_id", "vec_id")
    hits = picks.join(exact, ["query_id", "vec_id"]).groupBy(
        "nprobe"
    ).agg(F.count("*").alias("n_hits"))
    denom = exact.agg(F.count("*").alias("n_exact"))
    return (
        nprobes.join(F.broadcast(hits), "nprobe", "left")
        .crossJoin(F.broadcast(denom))
        .selectExpr(
            "nprobe",
            "CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits",
            "CAST(n_exact AS BIGINT) AS n_exact",
            "CAST(CASE WHEN n_exact = 0 THEN 0"
            " ELSE COALESCE(n_hits, 0) * 1000000 div n_exact"
            " END AS BIGINT) AS recall_q6",
        )
        .orderBy("nprobe")
    )


@register(
    "sim_ivf_bucket_balance",
    oracle=f"""
    WITH b AS (
      SELECT {_ivf_bucket_sql('embedding')} AS bucket FROM embeddings
    ), sz AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b
    )
    SELECT s.bucket, s.n_vecs,
           CAST(s.n_vecs * 1000000 // t.n AS BIGINT) AS share_q6,
           -- load factor as share_q6 * nb: the n_vecs*nb*1e6 product
           -- form overflows int64 past ~2e8 skewed vectors; this
           -- factored form is bounded by 1e6 * nb
           CAST(s.n_vecs * 1000000 // t.n
                * (SELECT COUNT(*) FROM sz) AS BIGINT) AS load_factor_q6
    FROM sz s, tot t
    """,
)
def sim_ivf_bucket_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inverted-list balance diagnostics for the sign-bit IVF
    quantizer — the index-health report behind every probe-cost
    estimate: per bucket, its size, corpus share (q6), and LOAD
    FACTOR = size / mean-size (q6; 1e6 ⇔ perfectly balanced lists —
    probe latency and the skew-join risk both track its max).

    Plan: one narrow pass computes the bucket id (sign bits — no
    shuffle wider than the ≤2^bits-row count frame), then two tiny
    broadcast scalars (total, bucket count). The operator's cost IS
    the scan; it exists so the quantizer's balance is measured, not
    assumed, before committing a 100 TB corpus to those lists.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    sz = (
        emb.select(_ivf_bucket_expr(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_vecs"))
    )
    tot = emb.agg(F.count("*").cast("long").alias("n"))
    nb = sz.agg(F.count("*").cast("long").alias("nb"))
    return (
        sz.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "bucket",
            "n_vecs",
            "CAST(n_vecs * 1000000 div n AS BIGINT) AS share_q6",
            "CAST(n_vecs * 1000000 div n * nb AS BIGINT)"
            " AS load_factor_q6",
        )
    )


def _margin_audit_sql() -> str:
    cos = _cosine_sql("e.v", "c.cv")
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_DOT_SQL.format(a='embedding::DOUBLE[]',
                             b='embedding::DOUBLE[]')} > 0
    ), expanded AS (
      SELECT label, u.i AS dim_idx, u.x AS val
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS i,
               unnest(v) AS x
      ) u
    ), cent0 AS (
      SELECT label, dim_idx,
             ROUND(CAST(SUM(CAST(val AS DECIMAL(30,15))) AS DOUBLE)
                   / COUNT(*), 12) AS cval
      FROM expanded GROUP BY label, dim_idx
    ), c AS (
      SELECT label, list(cval ORDER BY dim_idx) AS cv
      FROM cent0 GROUP BY label
    ), cn AS (
      SELECT label, cv FROM c
      WHERE {_DOT_SQL.format(a='cv', b='cv')} > 0
    ), scored AS (
      SELECT e.vec_id, e.label,
             MAX(CASE WHEN c.label = e.label
                 THEN ROUND({cos}, 6) END) AS own,
             MAX(CASE WHEN c.label <> e.label
                 THEN ROUND({cos}, 6) END) AS other
      FROM e, cn c GROUP BY e.vec_id, e.label
    ), margins AS (
      SELECT label,
             CAST(ROUND(own * 1000000, 0) AS BIGINT)
               - CAST(ROUND(other * 1000000, 0) AS BIGINT) AS m_q6
      FROM scored WHERE own IS NOT NULL AND other IS NOT NULL
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(m_q6) // COUNT(*) AS BIGINT) AS mean_margin_q6,
           CAST(SUM(CASE WHEN m_q6 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misassigned
    FROM margins GROUP BY label
    """


@register("emb_label_margin_audit", oracle=_margin_audit_sql())
def emb_label_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit for the embedding table: each vector's
    IN-SAMPLE margin = cosine to its OWN label centroid minus the
    best cosine to any OTHER label centroid; per label, the mean q6
    margin and the count of misassigned vectors (negative margin —
    the vector sits closer to a foreign centroid, the standard
    mislabeled-example screen before training on labeled pairs).

    Portability chain: centroids are DECIMAL(30,15)-accumulated
    means (order-independent — the deterministic-Lloyd's means
    recipe, ivf_kmeans.py; `sim_centroid_by_label` itself moved to
    all-integer q12 in round 7)
    rounded to 12 places; cosines are the shared sequential fold
    rounded to 6; each margin is quantized to an exact q6 INTEGER
    via the double-round idiom (``ROUND(cos·1e6, 0)`` is within
    1e-9 of an integer, never at a tie) BEFORE any sum, so per-label
    means are integer divisions, not order-dependent double sums.

    Plan: one explode pass builds |labels|·d centroid cells (decimal
    hash agg); the assembled |labels|-row centroid table broadcasts
    into one narrow scoring pass over the corpus (conditional MAX
    folds own/other in the same aggregate); output is |labels| rows.
    At 100 TB: one shuffle (the centroid agg), one broadcast scan.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
    expl = e.select(
        "label",
        F.posexplode(F.col("v")).alias("pos", "val"),
    )
    cent0 = (
        expl.groupBy("label", (F.col("pos") + 1).alias("dim_idx"))
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(30,15)")).cast(
                    "double"
                )
                / F.count("*"),
                12,
            ).alias("cval")
        )
    )
    cent = (
        cent0.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim_idx", "cval"))
            ).alias("pairs")
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform(F.col("pairs"), lambda p: p.cval).alias("cv"),
        )
        .filter(_dot(F.col("cv"), F.col("cv")) > 0)
    )
    cos = F.round(
        _dot(F.col("v"), F.col("cv"))
        / (_norm(F.col("v")) * _norm(F.col("cv"))),
        6,
    )
    scored = (
        e.crossJoin(F.broadcast(cent))
        .groupBy("vec_id", "label")
        .agg(
            F.max(
                F.when(F.col("clabel") == F.col("label"), cos)
            ).alias("own"),
            F.max(
                F.when(F.col("clabel") != F.col("label"), cos)
            ).alias("other"),
        )
    )
    margins = scored.filter(
        F.col("own").isNotNull() & F.col("other").isNotNull()
    ).selectExpr(
        "label",
        "CAST(ROUND(own * 1000000, 0) AS BIGINT)"
        " - CAST(ROUND(other * 1000000, 0) AS BIGINT) AS m_q6",
    )
    return margins.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.expr("CAST(SUM(m_q6) div COUNT(*) AS BIGINT)").alias(
            "mean_margin_q6"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN m_q6 < 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_misassigned"),
    )


DELETE_MOD_SLOT = 3  # vec_id % ARRIVAL_MOD == 3 plays the deleted set


@register(
    "sim_ivf_delete_compact",
    oracle=f"""
    WITH scanned AS (
      SELECT {_ivf_bucket_sql('embedding')} AS bucket,
             CASE WHEN vec_id % {ARRIVAL_MOD} = {DELETE_MOD_SLOT}
                  THEN 1 ELSE 0 END AS tomb
      FROM embeddings
    )
    SELECT bucket,
           COUNT(*) AS n_total,
           CAST(SUM(tomb) AS BIGINT) AS n_tombstones,
           CAST(COUNT(*) - SUM(tomb) AS BIGINT) AS n_live,
           CAST(CAST(SUM(tomb) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS tombstone_q6
    FROM scanned GROUP BY bucket
    """,
)
def sim_ivf_delete_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The third leg of the ANN index lifecycle (build →
    ``sim_ivf_incremental_assign`` arrivals → DELETIONS): serving
    indexes soft-delete with tombstones and compact a posting list
    only when its tombstone share crosses a threshold — scanning
    tombstoned codes wastes probe time, but rewriting a list costs a
    pass over it. This census is the compaction SCHEDULER's input:
    per coarse bucket, live vs tombstoned counts and the integer
    tombstone share, so the operator compacts exactly the lists where
    tombstone_q6 exceeds policy instead of rewriting the index.

    Plan: ONE narrow scan (bucket expression + pushed-down tombstone
    flag — here a deterministic vec_id slot standing in for the
    delete log), one ≤2^IVF_BITS-group aggregate with map-side
    combine; no join at all (the incremental twin needs one only
    because its two sides census separately). At 100 TB a real
    deployment joins the delete log instead of the modular flag —
    same single-aggregate shape with a broadcast of the log's
    bucket-level counts.
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings")
    bucket = _ivf_bucket_expr(F.col("embedding"))
    tomb = F.when(
        F.col("vec_id") % ARRIVAL_MOD == DELETE_MOD_SLOT, 1
    ).otherwise(0)
    return (
        emb.select(bucket.alias("bucket"), tomb.alias("tomb"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("tomb").cast("long").alias("n_tombstones"),
            (F.count("*") - F.sum("tomb")).cast("long").alias("n_live"),
            F.expr(
                "CAST(CAST(SUM(tomb) AS DECIMAL(38,0)) * 1000000"
                " div COUNT(*) AS BIGINT)"
            ).alias("tombstone_q6"),
        )
    )


KCENTER_K = 8  # coreset size (greedy 2-approximation of k-center)


def _kcenter_oracle() -> str:
    from almost_any_file_to_pandas_spark.operators.ivf_kmeans import (
        _sqdist_q12_sql,
    )

    d = _sqdist_q12_sql("e.v", "s.v")
    parts = [
        """
    e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), sel1 AS MATERIALIZED (
      SELECT vec_id, v, 1 AS rank, CAST(NULL AS BIGINT) AS radius
      FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e)
    )"""
    ]
    for i in range(2, KCENTER_K + 1):
        parts.append(f""", cand{i} AS MATERIALIZED (
      SELECT e.vec_id, e.v, MIN({d}) AS mind
      FROM e CROSS JOIN sel{i - 1} s
      WHERE e.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      GROUP BY e.vec_id, e.v
    ), sel{i} AS MATERIALIZED (
      SELECT * FROM sel{i - 1}
      UNION ALL
      SELECT * FROM (
        SELECT vec_id, v, {i} AS rank, mind AS radius
        FROM cand{i} ORDER BY mind DESC, vec_id LIMIT 1
      )
    )""")
    return (
        "WITH"
        + "".join(parts)
        + f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, radius AS radius_q12
    FROM sel{KCENTER_K}
    """
    )


@register("sim_kcenter_greedy_coreset", oracle=_kcenter_oracle())
def sim_kcenter_greedy_coreset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the 2-approximation behind coreset/active-learning
    selection, k-means++ without its RNG): start from the smallest
    vec_id, then {KCENTER_K - 1} times pick the point FARTHEST from
    the selected set (max-min distance, ties to the smaller id). Each
    pick's ``radius_q12`` — its min integer-q12 distance to the prior
    picks — is the coverage-radius curve a coreset-size decision
    reads (the radius at k bounds every point's distance to the
    coreset by 2-approximation). All distances are the exact
    integer-q12 kernel, so the trajectory is hash-pinned.

    100 TB shape: the greedy loop is inherently sequential in k —
    {KCENTER_K - 1} corpus passes, each a NARROW broadcast-argmax
    (the ≤k selected vectors ship as literals; per-row work is k
    distance folds; TakeOrderedAndProject keeps one row). Production
    runs the identical loop on a bounded sample (the quantizer-
    trainer discipline); the oracle restates the traversal as
    {KCENTER_K - 1} chained CTEs (the MMR pattern).
    """
    apply_engine_conf(spark)
    from almost_any_file_to_pandas_spark.operators.ivf_kmeans import (
        KMEANS_DRIVER_ROW_CAP,
        _sqdist_q12,
    )

    emb = table_wide(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # r10 small-corpus regime (KMEANS_DRIVER_ROW_CAP pattern): the
    # greedy traversal is K−1 SEQUENTIAL corpus passes — at bench
    # scale each pass was a Catalyst compile + TakeOrdered job over
    # 2,000 vectors. Under the cap the whole traversal runs on the
    # driver with the identical integer-q12 arithmetic (floor of
    # IEEE-double products — bit-identical in numpy) and identical
    # (max mind, min vec_id) tie-breaks; above it the distributed
    # loop below runs unchanged.
    if emb.count() < KMEANS_DRIVER_ROW_CAP:
        collected = sorted(
            (r["vec_id"], list(r["v"]))
            for r in emb.collect()
            if r["v"] is not None
        )
        if not collected:
            return spark.createDataFrame(
                [], schema="rank bigint, vec_id bigint, radius_q12 bigint"
            )
        import numpy as np

        ids = np.array([i for i, _ in collected], dtype=np.int64)
        mat = np.array([v for _, v in collected], dtype=np.float64)
        sel_idx = 0  # smallest vec_id
        out = [(1, int(ids[0]), None)]
        mind = None
        for i in range(2, KCENTER_K + 1):
            d = mat - mat[sel_idx]
            dist = np.floor(d * d * 1e12 + 0.5).astype(np.int64).sum(
                axis=1
            )
            mind = dist if mind is None else np.minimum(mind, dist)
            # exclude already-selected points, then argmax with
            # smallest-id tie-break (ids ascend, argmax takes first)
            cand = mind.copy()
            for r, vid, _ in out:
                cand[np.searchsorted(ids, vid)] = -1
            sel_idx = int(np.argmax(cand))
            if cand[sel_idx] < 0:
                break
            out.append((i, int(ids[sel_idx]), int(cand[sel_idx])))
        return spark.createDataFrame(
            out, schema="rank bigint, vec_id bigint, radius_q12 bigint"
        )
    first = (
        emb.orderBy("vec_id").limit(1).collect()
    )  # bounded: one row
    if not first:
        return spark.createDataFrame(
            [], schema="rank bigint, vec_id bigint, radius_q12 bigint"
        )
    selected = [(1, int(first[0]["vec_id"]), None, list(first[0]["v"]))]
    for i in range(2, KCENTER_K + 1):
        sel_ids = [s[1] for s in selected]
        dists = [
            _sqdist_q12(
                F.col("v"), F.array(*[F.lit(float(x)) for x in vec])
            )
            for _, _, _, vec in selected
        ]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        pick = (
            emb.filter(~F.col("vec_id").isin(sel_ids))
            .select("vec_id", "v", mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not pick:
            break
        row = pick[0]
        selected.append(
            (i, int(row["vec_id"]), int(row["mind"]), list(row["v"]))
        )
    return spark.createDataFrame(
        [(r, vid, rad) for r, vid, rad, _ in selected],
        schema="rank bigint, vec_id bigint, radius_q12 bigint",
    )


LOO_N_PROBES = 40  # leave-one-out probe panel (bounded by design)
LOO_K = 5


@register(
    "sim_knn_loo_label_accuracy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
      FROM embeddings
      WHERE vec_id < {LOO_N_PROBES} AND embedding IS NOT NULL
    ), scored AS (
      SELECT q.query_id, q.qlabel, e.vec_id, e.label,
             {_cosine_sql('e.embedding', 'q.qvec')} AS c
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id AND e.embedding IS NOT NULL
    ), nn AS (
      SELECT query_id, qlabel, label,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c DESC, vec_id ASC) AS rn
      FROM scored
    ), votes AS (
      SELECT query_id, qlabel, label, COUNT(*) AS v
      FROM nn WHERE rn <= {LOO_K} GROUP BY 1, 2, 3
    ), pick AS (
      SELECT query_id, qlabel, label AS pred,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY v DESC, label ASC) AS pr
      FROM votes
    )
    SELECT CAST(qlabel AS BIGINT) AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS accuracy_q6
    FROM pick WHERE pr = 1 GROUP BY 1
    """,
)
def sim_knn_loo_label_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leave-one-out kNN label-prediction accuracy — the
    embedding-quality EVALUATION row (the model-eval family's
    similarity leg): for each probe in a bounded {LOO_N_PROBES}-vector
    panel, predict its label by majority vote of its {LOO_K} exact
    cosine nearest neighbors (self excluded; cosine desc / vec_id
    tie-break; vote ties break label-asc) and report per-true-label
    accuracy. A collapsing embedding space (hubness, norm pathology,
    training leakage) shows up here before any downstream model does.

    Determinism: the cosine is the module's order-stable sequential
    fold (bit-identical across engines), both rank windows carry
    total tie-breaks, and accuracy is an integer division.

    100 TB shape: the probe panel broadcasts (bounded by design —
    the brute-force arm is the evaluation harness, like every *_floor
    anchor); one narrow corpus pass scores probes × corpus, the kNN
    rank shuffles only by query_id ({LOO_N_PROBES} partitions of
    corpus-sized lists pruned by the rank filter — at production
    scale the shortlist would come from the IVF path instead, same
    contract as sim_ivf_recall_floor).
    """
    apply_engine_conf(spark)
    emb = table_wide(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < LOO_N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "vec_id",
            "label",
            cosine_expr(F.col("embedding"), F.col("qvec")).alias("c"),
        )
    )
    w_nn = W.partitionBy("query_id").orderBy(
        F.desc("c"), F.asc("vec_id")
    )
    votes = (
        scored.withColumn("rn", F.row_number().over(w_nn))
        .filter(F.col("rn") <= LOO_K)
        .groupBy("query_id", "qlabel", "label")
        .agg(F.count("*").alias("v"))
    )
    w_pick = W.partitionBy("query_id").orderBy(
        F.desc("v"), F.asc("label")
    )
    pick = (
        votes.withColumn("pr", F.row_number().over(w_pick))
        .filter(F.col("pr") == 1)
        .select("qlabel", F.col("label").alias("pred"))
    )
    return pick.groupBy(
        F.col("qlabel").cast("long").alias("true_label")
    ).agg(
        F.count("*").alias("n_probes"),
        F.sum(
            F.when(F.col("pred") == F.col("qlabel"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
        F.expr(
            "CAST(SUM(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("accuracy_q6"),
    )
