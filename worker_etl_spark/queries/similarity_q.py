"""Similarity search over the ``embeddings`` table (array<float> column).

Driver-mandated extension (SURVEY.md §2 "Driver-mandated extensions").  Two
paths:

- s01 brute-force top-k: exact cosine against every candidate — the
  correctness baseline.  The query set is tiny and **broadcast**, so the
  candidate side is never shuffled; per-partition the work is a scan ×
  codegen'd dot product, and the top-k window only shuffles (queries × k)
  rows after partial ranking.
- s02 LSH-bucketed ANN: sign-of-dot-product against 8 fixed random
  hyperplanes → 8-bit bucket; candidates are only compared within the
  query's bucket.  This is the 100 TB path: bucket count grows 2^planes, the
  per-bucket join is key-equi (shuffle-partitionable, AQE-skew-splittable),
  and recall/cost is tuned by the plane count — no O(n²) anywhere.

Both run JVM-side via zip_with/aggregate higher-order functions (no Python
UDF).  The hyperplane constants are literal-embedded identically in the Spark
plan and the DuckDB oracle, so the whole ANN pipeline is value-hash-checked.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from worker_etl_spark.functions.vectors import dot, norm, sql_dot, sql_norm
from worker_etl_spark.queries import register
from worker_etl_spark.sources.tables import read_table

_DIM = 64
_N_PLANES = 8
_TOP_K = 5
_QUERY_STRIDE = 50  # vec_id % stride == 0 → query vector

_rng = random.Random(20260814)
_PLANES: list[list[float]] = [
    [round(_rng.uniform(-1.0, 1.0), 4) for _ in range(_DIM)] for _ in range(_N_PLANES)
]


def _sql_plane(p: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in p) + "]"


def _spark_plane_dot(col: str, p: list[float]) -> F.Column:
    arr = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + ")"
    return F.expr(
        f"aggregate(zip_with({col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y),"
        " 0D, (acc, v) -> acc + v)"
    )


def _bucket_spark(col: str) -> F.Column:
    bits = [
        F.when(_spark_plane_dot(col, p) > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in _PLANES
    ]
    return F.concat(*bits)


def _bucket_sql(col: str) -> str:
    bits = ", ".join(
        f"CASE WHEN {sql_dot(col, _sql_plane(p))} > 0 THEN '1' ELSE '0' END"
        for p in _PLANES
    )
    return f"concat({bits})"


# --- s01: brute-force exact top-k cosine -------------------------------------
@register(
    "s01_topk_bruteforce",
    headline=True,
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id % {_QUERY_STRIDE} = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, round(cosine, 6) AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s01_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k via broadcast query matrix + per-batch BLAS matmul.

    The query set (1/stride of the table) is collected, L2-normalized and
    broadcast; every Arrow batch of candidates computes ``Q @ C.T`` in one
    numpy call and emits only its LOCAL top-k per query, already resolved in
    the global total order ``(cosine DESC, cand_id ASC)`` — a locally-cut
    candidate sits below k batch-mates in that total order, so it can never
    enter the global top-k: the final window re-rank over
    O(batches · queries · k) rows is exact, and nothing O(n·q) ever
    materializes as rows.  (The previous pure-SQL formulation paid an
    interpreted zip_with/aggregate fold per pair — higher-order functions
    don't participate in whole-stage codegen — ~64 s at sf0.1 vs <2 s here.)
    At 100 TB the candidate side streams batch-wise (scan-shaped, no
    shuffle); only the query set must fit in a broadcast, which is the same
    contract the reference-free s02 LSH path relaxes.
    """
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qpdf = e.filter(F.col("vec_id") % _QUERY_STRIDE == 0).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    q_mat = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def batches(it):
        qi, qm = bc.value
        for batch in it:
            if not len(batch):
                continue
            c_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(batch["embedding"].tolist(), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = qm @ c.T  # (n_queries, n_batch)
            sims[qi[:, None] == c_ids[None, :]] = -np.inf  # self-pairs out
            k = min(_TOP_K, sims.shape[1])
            out_q, out_c, out_s = [], [], []
            for row in range(sims.shape[0]):
                # lexsort: last key is primary → (-cosine, cand_id) total order
                top = np.lexsort((c_ids, -sims[row]))[:k]
                keep = np.isfinite(sims[row][top])
                top = top[keep]
                out_q.append(np.full(top.size, qi[row], dtype=np.int64))
                out_c.append(c_ids[top])
                out_s.append(sims[row][top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    scored = e.mapInPandas(batches, schema="query_id long, cand_id long, cosine double")
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


# --- s02: LSH-bucketed approximate top-k -------------------------------------
@register(
    "s02_topk_lsh",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id % {_QUERY_STRIDE} = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, round(cosine, 6) AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s02_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        _bucket_spark("embedding").alias("bucket"),
    )
    q = v.filter(F.col("vec_id") % _QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    # Key-equi join on bucket: shuffle-partitionable at scale (queries here
    # are broadcast anyway since the query set is small).
    scored = (
        v.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            (dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
        )
    )
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )
