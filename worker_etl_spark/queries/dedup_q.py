"""Deduplication operators over ``documents`` / ``embeddings``.

Driver-mandated extension (SURVEY.md §2 "Driver-mandated extensions"; the
reference has no dedup — its only row-drop is the all-null filter,
``etl.py:681``).  Five families, each registered with a DuckDB oracle so the
whole pipeline (shingling → hashing → signatures → banding → pair join) is
value-hash-verified cross-engine:

- d01 exact dedup: hash-groupBy on normalized text.
- d02 MinHash signatures: char-5-gram shingles → 16 permutations.
- d03 LSH banding: 4 bands × 4 rows → bucket histogram + candidate-pair mass.
- d04 SimHash: 32-bit sign-aggregated token hashes.
- d05 n-gram Jaccard: rare-shingle blocking → exact Jaccard on blocked pairs.
- d06 embedding cosine near-dup: top pairs by cosine.

Scale posture (100 TB):
- All hashing/shingling is projection + re-aggregation per doc — explodes
  never cross the shuffle (map-side combine reduces to one row per doc).
- d05 blocks on rare shingles (document-frequency cap): a shingle seen in
  more than DF_CAP docs generates no candidate pairs, so the self-join's
  per-key fan-out is bounded by C(DF_CAP, 2) — this is what keeps a
  shingle-join alive at 10^9 docs (the unblocked join is quadratic in the
  hottest key).  Same pattern as MinHashLSH's band join.
- d06 is the brute-force O(n²) baseline kept for correctness; the scale path
  is the LSH bucketing in s02 (similarity_q.py).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.functions.text import (
    hex_int,
    norm_text,
    sql_hex_int,
    sql_norm_text,
    sql_tokens,
    tokens,
)
from worker_etl_spark.functions.vectors import dot, norm, sql_dot, sql_norm
from worker_etl_spark.queries import local_frame, register
from worker_etl_spark.queries.similarity_q import _S08_R
from worker_etl_spark.sources.tables import read_table, spread

# --- deterministic MinHash permutation constants ----------------------------
# (a*h + b) mod P over the 32-bit shingle hash; generated once from a fixed
# seed and embedded identically in the Spark plan and the SQL oracle.
_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_rng = random.Random(20260813)
_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1_000_000), _rng.randrange(0, _P)) for _ in range(16)
]
_N_BANDS, _ROWS_PER_BAND = 4, 4
# Char-gram width / document-frequency blocking cap — single source of truth
# lives with the maintained index (operators/dedup_index.py) so the stateless
# oracles and the incremental index can never drift.
from worker_etl_spark.operators.dedup_index import (  # noqa: E402
    DF_CAP as _DF_CAP,
    SHINGLE_W as _SHINGLE_W,
)


# --- d01: exact dedup --------------------------------------------------------
@register(
    "d01_exact_dedup",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source, {sql_hex_int(sql_norm_text('text'), 15)} AS fp
      FROM documents
    )
    SELECT source,
           count(*)                  AS n_docs,
           count(DISTINCT fp)        AS n_unique,
           count(*) - count(DISTINCT fp) AS n_dups,
           min(doc_id)               AS first_doc
    FROM norm GROUP BY source ORDER BY source
    """,
)
def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    n = d.select(
        "doc_id", "source", hex_int(norm_text(F.col("text")), 15).alias("fp")
    )
    return (
        n.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dups"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


# --- shared shingle CTE (Spark + SQL) ---------------------------------------
_SHINGLE_CACHE: dict[tuple[int, str], DataFrame] = {}


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, 32-bit char-gram hash) pairs.

    Persisted: this frame is the shared root of the whole dedup family
    (signatures d02, banding d03, blocking d05/d07/d08/d09 — and the
    blocking path alone consumes it twice, once for document-frequency
    counts and once for the pair join).  Spark's cache manager matches by
    analyzed plan, so every consumer in the session reuses ONE
    materialization of the explode+distinct instead of re-shuffling it —
    at scale this is the "materialize the common intermediate" call a real
    pipeline makes explicitly.  Memoized per (session, sf_dir) so repeat
    callers share one persisted handle instead of re-marking the same plan
    (CacheManager warns on double-persist)."""
    key = (id(spark), sf_dir)
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached
    # Cached-plan materialization bypasses AQE partition coalescing unless
    # this (runtime, default-false) conf is on — on a vanilla session the
    # family's persisted frames otherwise materialize at the raw 200-part
    # default, costing 200 near-empty tasks per stage (measured 1.6× on the
    # d07 end-to-end at sf0.01).  Semantics are unaffected; only the cached
    # output partitioning may change.
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    d = read_table(spark, sf_dir, "documents")
    # spread(): the corpus may arrive as one small object (one input split);
    # shingle hashing is the family's dominant compute, so buy scan-stage
    # parallelism with one cheap shuffle of the raw text (no-op at scale).
    n = spread(
        d.select("doc_id", norm_text(F.col("text")).alias("norm")).filter(
            F.length("norm") >= _SHINGLE_W
        )
    )
    df = (
        n.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("norm") - (_SHINGLE_W - 1))
            ).alias("i"),
            "norm",
        )
        .select("doc_id", hex_int(F.expr(f"substring(norm, i, {_SHINGLE_W})")).alias("h"))
        .distinct()
        .persist()
    )
    _SHINGLE_CACHE[key] = df
    return df


_SQL_SHINGLES = f"""
    norm AS (
      SELECT doc_id, {sql_norm_text('text')} AS norm FROM documents
      WHERE length({sql_norm_text('text')}) >= {_SHINGLE_W}
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             {sql_hex_int(f'substring(norm, i, {_SHINGLE_W})')} AS h
      FROM norm, unnest(range(1, length(norm) - {_SHINGLE_W - 2})) AS t(i)
    )
"""

_SQL_SIG_COLS = ",\n             ".join(
    f"min((h * {a} + {b}) % {_P}) AS m{j:02d}" for j, (a, b) in enumerate(_PERMS)
)

_SQL_SIGNATURES = f"""
    WITH {_SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {_SQL_SIG_COLS}
      FROM shingles GROUP BY doc_id
    )
"""


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    return sh.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * a + b) % _P).alias(f"m{j:02d}")
            for j, (a, b) in enumerate(_PERMS)
        ]
    )


# --- d02: MinHash signatures -------------------------------------------------
@register(
    "d02_minhash_signatures",
    oracle=_SQL_SIGNATURES + "SELECT * FROM sigs ORDER BY doc_id",
    headline=True,
)
def d02_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir).orderBy("doc_id")


# --- d03: LSH banding → bucket histogram ------------------------------------
def _band_sig_sql(band: int) -> str:
    cols = " || ',' || ".join(
        f"m{band * _ROWS_PER_BAND + r:02d}" for r in range(_ROWS_PER_BAND)
    )
    return f"md5({cols})"


@register(
    "d03_lsh_buckets",
    headline=True,
    oracle=_SQL_SIGNATURES
    + f"""
    , bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {band} AS band_id, {_band_sig_sql(band)} AS sig FROM sigs"
          for band in range(_N_BANDS)
      )}
    ),
    buckets AS (
      SELECT band_id, sig, count(*) AS bucket_size FROM bands GROUP BY band_id, sig
    )
    SELECT band_id,
           count(*)                                        AS n_buckets,
           max(bucket_size)                                AS max_bucket,
           sum(bucket_size * (bucket_size - 1) / 2)::BIGINT AS candidate_pairs
    FROM buckets GROUP BY band_id ORDER BY band_id
    """,
)
def d03_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _signatures(spark, sf_dir)
    bands = None
    for band in range(_N_BANDS):
        cols = [f"m{band * _ROWS_PER_BAND + r:02d}" for r in range(_ROWS_PER_BAND)]
        expr = F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols]))
        b = sigs.select("doc_id", F.lit(band).alias("band_id"), expr.alias("sig"))
        bands = b if bands is None else bands.unionAll(b)
    buckets = bands.groupBy("band_id", "sig").agg(F.count(F.lit(1)).alias("bucket_size"))
    return (
        buckets.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.sum(
                (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast("long")
            ).alias("candidate_pairs"),
        )
        .orderBy("band_id")
    )


# --- d04: SimHash ------------------------------------------------------------
# 60 bits (15 hex digits of md5): sign-safe in a BIGINT on both engines, and
# wide enough that d10's band blocking can widen its key to 30 bits
# (B=6 × 10-bit bands, 3-band keys) before the fingerprint itself becomes
# the bucket-count ceiling — see _ham_band_plan's corpus-adaptive split
# (measured in tools/scale_smoke.py's dedup growth ladder).
_SIM_BITS = 60

_SQL_SIM_SUMS = ",\n             ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b:02d}"
    for b in range(_SIM_BITS)
)
_SQL_SIM_VALUE = " + ".join(
    f"(CASE WHEN s{b:02d} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIM_BITS)
)

# CTE chain producing sim(doc_id, simhash) — shared by d04 (signatures) and
# d10 (hamming-blocked near-dup pairs).
_SQL_SIMHASH_CTES = f"""tok AS (
      SELECT DISTINCT doc_id, unnest({sql_tokens(sql_norm_text('text'))}) AS t
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, {sql_hex_int('t', 15)} AS h FROM tok
    ),
    sums AS (
      SELECT doc_id,
             {_SQL_SIM_SUMS}
      FROM hashed GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id, ({_SQL_SIM_VALUE})::BIGINT AS simhash FROM sums
    )"""


_SIMHASH_CACHE: dict[tuple[int, str], DataFrame] = {}


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — 60-bit sign-aggregated token-hash fingerprint.

    Memoized + persisted like ``_shingles``: d10's band self-join consumes
    this frame on BOTH join sides, and without a persist Spark re-runs the
    token explode + 60 sign-sums once per side — the fingerprint table is
    |docs| rows, the cheapest thing in the family to keep materialized."""
    key = (id(spark), sf_dir)
    cached = _SIMHASH_CACHE.get(key)
    if cached is not None:
        return cached
    d = read_table(spark, sf_dir, "documents")
    # spread(): tokenize+hash is scan-fused; widen a single-split source
    # before the heavy projection (no-op when splits are plentiful).
    tok = (
        spread(d.select("doc_id", norm_text(F.col("text")).alias("nt")))
        .select("doc_id", F.explode(tokens(F.col("nt"))).alias("t"))
        .distinct()
        .select("doc_id", hex_int(F.col("t"), 15).alias("h"))
    )
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"s{b:02d}")
            for b in range(_SIM_BITS)
        ]
    )
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN s{b:02d} >= 0 THEN {1 << b}L ELSE 0L END)"
            for b in range(_SIM_BITS)
        )
    )
    out = sums.select("doc_id", sim.cast("long").alias("simhash")).persist()
    _SIMHASH_CACHE[key] = out
    return out


@register(
    "d04_simhash",
    oracle=f"""
    WITH {_SQL_SIMHASH_CTES}
    SELECT doc_id, simhash FROM sim ORDER BY doc_id
    """,
)
def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_df(spark, sf_dir).orderBy("doc_id")


# --- d05: n-gram Jaccard with rare-shingle blocking --------------------------
_PAIRS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) for every rare-shingle-blocked candidate pair
    (d05's pair program, shared with d07's cluster resolution).  Memoized per
    (session, sf_dir) like ``_shingles`` — five consumers (d05/d07/d08/d09/
    d11) share one persisted blocked-pair frame."""
    key = (id(spark), sf_dir)
    cached = _PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    sh = _shingles(spark, sf_dir)
    rare = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _DF_CAP
    ).select("h")
    # The blocked set feeds four downstream consumers (cardinalities + both
    # sides of the pair join); without persist Spark recomputes the full
    # shingle explode+distinct for each.  Post-blocking it is also the small
    # side of the data — at scale this is the set you materialize.
    rs = sh.join(rare, "h").select("doc_id", "h").persist()
    card = rs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = rs.alias("a")
    b = rs.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")).cast("double"), 6
            ).alias("jaccard"),
            # exact integer intermediates alongside the rounded score, so a
            # consumer thresholding at exactly j can use the cross-multiplied
            # test (c >= j·(na+nb-c) in integers) instead of the 6-dp rounded
            # double — round-8 ADVICE: d17's >= 0.5 cut on the rounded value
            # could disagree with an exact-arithmetic oracle for pairs inside
            # [0.4999995, 0.5)
            F.col("c").alias("c"),
            F.col("na").alias("na"),
            F.col("nb").alias("nb"),
        )
        # Persisted, not just memoized: d07 alone consumes the pair frame
        # twice (edge list + its reverse), and d05/d08/d09/d11 re-read it —
        # without persist each consumer re-runs the rare-shingle self-join.
        # Post-verification pairs are the SMALL end of the pipeline; this is
        # the "materialize the verified-pair set" call a 100 TB dedup makes.
        .persist()
    )
    _PAIRS_CACHE[key] = out
    return out


@register(
    "d05_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(i.c / CAST(ca.n + cb.n - i.c AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN card ca ON ca.doc_id = i.doc_a
    JOIN card cb ON cb.doc_id = i.doc_b
    ORDER BY jaccard DESC, i.doc_a, i.doc_b
    LIMIT 10
    """,
)
def d05_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _jaccard_pairs(spark, sf_dir)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(10)
    )


# --- d06: embedding cosine near-dup (brute-force baseline) -------------------
#: Ceiling for d06's driver-side catalog materialization: 250k rows × 64-dim
#: float64 ≈ 128 MB — comfortably broadcastable, loudly NOT 100 TB.
MAX_BROADCAST_CATALOG_ROWS = 250_000


def _check_catalog_size(n_rows: int, limit: int = MAX_BROADCAST_CATALOG_ROWS) -> None:
    """Enforce d06's small-catalog contract before ``toPandas``.

    Without this, a larger scale factor turns the documented 'catalog-sized
    candidate set' assumption into a silent driver OOM.  Large catalogs
    belong on the LSH-bucketed path (s02_topk_lsh / d03_lsh_buckets), which
    never materializes the table."""
    if n_rows > limit:
        raise ValueError(
            f"embedding catalog has {n_rows} rows, above the {limit}-row "
            "broadcast contract for the exact brute-force path; use the "
            "LSH-bucketed near-dup path (s02_topk_lsh) for large catalogs"
        )


@register(
    "d06_embedding_neardup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    ORDER BY cosine DESC, vec_a, vec_b
    LIMIT 10
    """,
)
def d06_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-matrix brute force: the candidate matrix is L2-normalized once
    and broadcast (n×dim doubles — MBs for catalog-sized candidate sets);
    each Arrow batch of rows computes ``A @ M.T`` with numpy (one BLAS call
    per batch, ~100× the throughput of a per-pair interpreted fold) and emits
    only its local top candidates, so the global re-rank sees
    O(batches · margin) rows, not O(n²).  Genuinely all-pairs inputs at
    100 TB use the LSH bucketing path (s02) instead."""
    import numpy as np
    import pandas as pd

    from worker_etl_spark.queries.similarity_q import _corpus_count

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the catalog IS the embeddings corpus, so the memoized metadata-cheap
    # corpus count guards it with zero extra jobs on repeat invocations
    # (round-6 verdict #2: every job d06 doesn't run is variance it can't
    # exhibit — the previous per-invocation e.count() was a full scan)
    _check_catalog_size(_corpus_count(spark, sf_dir))
    pdf = e.toPandas()  # candidate catalog: small by contract (enforced above)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    # broadcast the RAW float32 matrix (halves the pickled payload to the 32
    # python workers — round-6 verdict #2); the parquet column is
    # list<float>, so float32 carries the source values exactly and the
    # float64 upcast + normalization below is bit-identical to normalizing
    # on the driver
    raw32 = np.array(pdf["embedding"].tolist(), dtype=np.float32)
    bc = spark.sparkContext.broadcast((ids, raw32))
    margin = 50  # per-batch emission overshoot; protects exact-tie boundaries

    def batches(it):
        all_ids, r32 = bc.value
        m = r32.astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        for batch in it:
            a_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(batch["embedding"].tolist(), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ m.T
            # keep only pairs (a < b): mask columns with id <= row id
            mask = all_ids[None, :] <= a_ids[:, None]
            sims[mask] = -np.inf
            flat = sims.ravel()
            k = min(margin, flat.size)
            top = np.argpartition(-flat, k - 1)[:k]
            rows, cols = np.unravel_index(top, sims.shape)
            keep = flat[top] > -np.inf
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[rows[keep]],
                    "vec_b": all_ids[cols[keep]],
                    "cosine": np.round(flat[top][keep], 6),
                }
            )

    out = e.mapInPandas(
        batches, schema="vec_a long, vec_b long, cosine double"
    )
    return out.orderBy(F.desc("cosine"), "vec_a", "vec_b").limit(10)


def clear_caches() -> None:
    """Unpersist + drop every memoized dedup-family frame (shingles, blocked
    pairs, CC labels).  Tools that iterate over many synthetic corpora in one
    session (tools/scale_smoke.py) call this between corpora so executor
    memory doesn't accumulate dead persisted frames."""
    for cache in (_SHINGLE_CACHE, _PAIRS_CACHE, _CC_LABELS_CACHE, _SIMHASH_CACHE):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
        cache.clear()


# --- d07: duplicate-cluster resolution (connected components) ----------------
_CLUSTER_JACCARD = 0.9
_CC_LABELS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, lbl) component labels over the Jaccard >= 0.9 edge set.

    Memoized per (session, sf_dir): the CC fixpoint runs real per-round jobs
    (a count per iteration), and both d07 (cluster stats) and d11 (survivor
    selection) consume the same labels — re-running the fixpoint would also
    double-persist plan-identical per-round frames, churning the cache
    manager."""
    key = (id(spark), sf_dir)
    cached = _CC_LABELS_CACHE.get(key)
    if cached is not None:
        return cached
    from worker_etl_spark.operators.graph import connected_components

    edges = (
        _jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= _CLUSTER_JACCARD)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labels = connected_components(edges)
    _CC_LABELS_CACHE[key] = labels
    return labels


@register(
    "d07_dup_clusters",
    headline=True,
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a AS a, i.doc_b AS b
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= {_CLUSTER_JACCARD}
    ),
    und AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ),
    reach(src, dst) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
    ),
    lbl AS (
      SELECT src AS node, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           max(node)                AS max_doc
    FROM lbl GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: d05's verified pairs (Jaccard >= 0.9) resolved into
    connected components by iterative min-label propagation
    (``operators/graph.py``) — the closing step of a dedup pipeline (keep
    ``cluster_id``, drop the rest).  The oracle re-derives the components
    with a recursive transitive-closure CTE, so the distributed fixpoint is
    value-hash-checked against an independent sequential formulation."""
    labels = _cluster_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("node").alias("max_doc"),
        )
        .orderBy("cluster_id")
    )


# --- d08: edit-distance verification of blocked candidate pairs --------------
_EDIT_JACCARD_FLOOR = 0.3  # only verify pairs the blocking already ranks close


@register(
    "d08_edit_distance_neardup",
    headline=True,
    oracle=f"""
    WITH {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b,
             round(i.c / CAST(ca.n + cb.n - i.c AS DOUBLE), 6) AS jaccard
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= {_EDIT_JACCARD_FLOOR}
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           CAST(levenshtein(na.norm, nb.norm) AS BIGINT) AS edit_dist,
           round(1.0 - levenshtein(na.norm, nb.norm)
                 / CAST(greatest(length(na.norm), length(nb.norm)) AS DOUBLE), 6)
             AS edit_sim
    FROM pairs p
    JOIN norm na ON na.doc_id = p.doc_a
    JOIN norm nb ON nb.doc_id = p.doc_b
    ORDER BY edit_sim DESC, p.doc_a, p.doc_b
    LIMIT 10
    """,
)
def d08_edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance verification on TOP of the rare-shingle blocking:
    candidate pairs the cheap Jaccard stage ranks close get the expensive
    O(len²) ``levenshtein`` check, top-10 by normalized edit similarity.

    This is the canonical verify-stage shape at 100 TB: the quadratic-cost
    comparator only ever runs on the blocked candidate set (bounded by
    C(DF_CAP, 2) per rare shingle), never on the corpus cross-product; the
    two text-side joins are doc-keyed equi joins against the (small)
    surviving pair list."""
    pairs = _jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= _EDIT_JACCARD_FLOOR
    )
    # NOT pruned via a pair-member semi-join (opt r12, measured): persisting
    # the ≤2·|pairs| normalized texts and joining both sides against that
    # re-measured ~1 s SLOWER (1.81 → 2.87 s, control-normalized) — the
    # extra broadcast build + cache barrier outweigh the saved second
    # norm_text scan at this corpus size.  At real scale the same move is
    # the guide §3.2 shape; re-evaluate on a corpus where the normalize
    # pass dominates.
    norm = read_table(spark, sf_dir, "documents").select(
        "doc_id", norm_text(F.col("text")).alias("norm")
    ).filter(F.length("norm") >= _SHINGLE_W)
    na = norm.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norm.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    lev = F.levenshtein("norm_a", "norm_b")
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            lev.cast("long").alias("edit_dist"),
            F.round(
                1.0
                - lev
                / F.greatest(F.length("norm_a"), F.length("norm_b")).cast("double"),
                6,
            ).alias("edit_sim"),
        )
        .orderBy(F.desc("edit_sim"), "doc_a", "doc_b")
        .limit(10)
    )


# --- d09: MinHash Jaccard estimate vs exact ----------------------------------
_D09_SIG_EQ = " + ".join(
    f"(CASE WHEN a.m{j:02d} = b.m{j:02d} THEN 1 ELSE 0 END)"
    for j in range(len(_PERMS))
)


@register(
    "d09_minhash_estimate",
    oracle=_SQL_SIGNATURES
    + f"""
    , rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b,
             round(i.c / CAST(ca.n + cb.n - i.c AS DOUBLE), 6) AS jaccard_exact
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= 0.3
    )
    SELECT p.doc_a, p.doc_b, p.jaccard_exact,
           round(({_D09_SIG_EQ}) / {len(_PERMS)}.0, 6) AS jaccard_est,
           round(abs(p.jaccard_exact
                     - ({_D09_SIG_EQ}) / {len(_PERMS)}.0), 6) AS abs_err
    FROM pairs p
    JOIN sigs a ON a.doc_id = p.doc_a
    JOIN sigs b ON b.doc_id = p.doc_b
    ORDER BY p.doc_a, p.doc_b
    """,
)
def d09_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-quality audit: the Jaccard ESTIMATE the banding stage
    implicitly relies on (fraction of agreeing MinHash positions) next to
    the exact blocked Jaccard, with per-pair absolute error.  Joins are all
    key-equi against the (small) surviving pair list; the 16-term position
    comparison is a flat JVM expression over the signature columns."""
    pairs = _jaccard_pairs(spark, sf_dir).filter(F.col("jaccard") >= 0.3).select(
        "doc_a", "doc_b", F.col("jaccard").alias("jaccard_exact")
    )
    sigs = _signatures(spark, sf_dir)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{j:02d}").alias(f"a{j:02d}") for j in range(len(_PERMS))],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{j:02d}").alias(f"b{j:02d}") for j in range(len(_PERMS))],
    )
    agree = sum(
        F.when(F.col(f"a{j:02d}") == F.col(f"b{j:02d}"), 1).otherwise(0)
        for j in range(len(_PERMS))
    )
    est = F.round(agree / float(len(_PERMS)), 6)
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard_exact",
            est.alias("jaccard_est"),
            F.round(F.abs(F.col("jaccard_exact") - agree / float(len(_PERMS))), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- d10: SimHash hamming-distance near-dup pairs ----------------------------
_HAM_BANDS = 4       # oracle/spec split: 60-bit simhash, 4 disjoint 15-bit bands
_HAM_BAND_BITS = 15
_HAM_MASK = (1 << _HAM_BAND_BITS) - 1
_HAM_MAX = 3         # pigeonhole: hamming <= bands-1 guarantees a shared band

# Corpus-adaptive blocking (round-5 verdict #2: the fixed 4×15 split's 32k
# buckets/band saturate at ~10^5.5 docs — random collisions grow n²/2^15).
# Generalization (Manku et al. WWW'07 §3, public): split the 60-bit
# fingerprint into B equal bands; a pair within hamming <= 3 touches at most
# 3 bands, so at least B-3 bands agree — enumerate every (B-3)-subset of
# bands as a block key and the blocked join is still EXACT for the
# threshold, with key width (B-3)·(60/B) bits:
#   B=4 → 4 keys × 15 bits (2^15 buckets)   — the original split
#   B=5 → 10 keys × 24 bits (2^24 buckets)  — 512× more buckets, 2.5× rows
#   B=6 → 20 keys × 30 bits (2^30 buckets)
# The OUTPUT is invariant to B (any exact banding emits the same pair set),
# so the DuckDB oracle keeps the simple B=4 formulation as the semantic
# spec while the Spark side picks B from the corpus size: smallest B with
# buckets ≥ n/τ (τ = target bucket load).  Ceiling documented: past
# τ·2^30 ≈ 4×10^9 docs the fingerprint itself must widen (d04's 60-bit
# contract), which changes semantics — out of scope for this operator.
_HAM_TARGET_LOAD = 4


def _ham_band_plan(n_docs: int) -> tuple[int, int, list[tuple[int, ...]]]:
    """(bands, band_bits, key_subsets) for the smallest exact split whose
    bucket count keeps random collisions ~linear: buckets ≥ n/τ."""
    import itertools

    for bands in (4, 5, 6):
        band_bits = _SIM_BITS // bands
        key_bits = (bands - _HAM_MAX) * band_bits
        if (1 << key_bits) * _HAM_TARGET_LOAD >= n_docs or bands == 6:
            subsets = list(itertools.combinations(range(bands), bands - _HAM_MAX))
            return bands, band_bits, subsets
    raise AssertionError("unreachable: bands == 6 always returns")


@register(
    "d10_simhash_hamming",
    headline=True,
    oracle=f"""
    WITH {_SQL_SIMHASH_CTES},
    bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * {_HAM_BAND_BITS})) & {_HAM_MASK} AS val
      FROM sim CROSS JOIN (SELECT unnest(range({_HAM_BANDS})) AS band)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sim_a, sim_b)) <= {_HAM_MAX}
    ORDER BY hamming, doc_a, doc_b
    """,
)
def d10_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance ``_HAM_MAX``, found by
    band-blocking rather than an all-pairs scan: the 60-bit fingerprint is
    split into B disjoint equal bands and only pairs agreeing on at least
    B-3 of them are compared — realized as an equi-join on every
    (B-3)-subset key.  By pigeonhole, any pair within hamming <= 3 differs
    in at most 3 bands, so some enumerated subset is entirely untouched and
    the blocked join is EXACT for the threshold — the guarantee Manku et
    al.'s simhash dedup (WWW'07, public) builds web-scale dedup on.

    Scale shape: the band join is key-equi on (key_id, val) — C(B,3)-fold
    row amplification into a shuffle-partitionable join, per-key fan-out
    bounded by bucket occupancy, never O(n^2).  The hamming check itself is
    one codegen'd xor+bit_count per surviving candidate.

    Execution composes three scale moves (round-6 rework, each measured by
    the growth ladder):

    1. **Identical-fingerprint collapse.**  Real corpora are dup-heavy —
       on the ladder's 500k-doc rung ~95% of docs share their exact
       fingerprint with others — so the band join runs over DISTINCT
       fingerprints only (what Manku et al.'s fingerprint→doc-list store
       does).  Within-group pairs are emitted directly as hamming-0 rows
       by an equi-self-join on simhash (output-sized by definition);
       cross-group pairs expand from surviving fingerprint pairs at the
       very end, also output-sized.
    2. **One emission per pair, no distinct.**  A pair within hamming ≤ 3
       agrees on up to all C(B,3) keys; instead of emitting every
       agreement into a |keys|×-amplified distinct shuffle, each joined
       row keeps only the FIRST agreeing key — a codegen'd CASE over
       (fp_a XOR fp_b) & key_mask, decided map-side — so the dedup
       shuffle disappears entirely.
    3. **Corpus-adaptive band split** (``_ham_band_plan`` over the
       distinct-fingerprint count): random key collisions cost
       ~C(D,2)·n_keys·2^(-key_bits), quadratic in D until key_bits
       outruns log2(D); the plan widens keys 15→24→30 bits as D grows
       so the random floor stays linear.  The OUTPUT is invariant to the
       split, so the oracle keeps the B=4 formulation as the spec.

    Both expansion joins pin their probe-side parallelism (the q79
    lesson: AQE sizes partitions by input bytes and cannot see join
    fan-out, so an output-sized explosion would otherwise run in one
    task).  No reference counterpart (dedup is a driver-mandated
    extension, SURVEY.md §2)."""
    from worker_etl_spark.queries import bounded_persist
    from worker_etl_spark.session import shuffle_width

    sim = _simhash_df(spark, sf_dir)
    fps = bounded_persist(
        sim.select("simhash").distinct(), "distinct fingerprints (≤ |docs|)"
    )
    n_fp = fps.count()
    n_bands, band_bits, subsets = _ham_band_plan(n_fp)
    band_mask = (1 << band_bits) - 1
    key_masks = [
        sum(band_mask << (b * band_bits) for b in sub) for sub in subsets
    ]
    keys = F.array(
        *[
            F.struct(
                F.lit(kid).alias("kid"),
                F.expr(
                    " + ".join(
                        f"(((simhash >> {b * band_bits}) & {band_mask})"
                        f" << {pos * band_bits})"
                        for pos, b in enumerate(sub)
                    )
                ).cast("long").alias("val"),
            )
            for kid, sub in enumerate(subsets)
        ]
    )
    bands = fps.select("simhash", F.explode(keys).alias("k")).select(
        "simhash", F.col("k.kid").alias("kid"), F.col("k.val").alias("val")
    )
    a = bands.select(F.col("simhash").alias("fp_a"), "kid", "val")
    b = bands.select(F.col("simhash").alias("fp_b"), "kid", "val")
    first_kid = "CASE " + " ".join(
        f"WHEN ((fp_a ^ fp_b) & {m}) = 0 THEN {k}"
        for k, m in enumerate(key_masks)
    ) + " END"
    fp_pairs = (
        a.join(b, ["kid", "val"])
        .filter(F.col("fp_a") < F.col("fp_b"))
        .filter(F.expr(f"bit_count(fp_a ^ fp_b) <= {_HAM_MAX}"))
        .filter(F.expr(f"kid = ({first_kid})"))
        .select("fp_a", "fp_b")
    )
    n_part = shuffle_width(spark)
    docs_a = sim.select(F.col("simhash").alias("fp_a"), F.col("doc_id").alias("da"))
    docs_b = sim.select(F.col("simhash").alias("fp_b"), F.col("doc_id").alias("db"))
    cross = (
        fp_pairs.repartition(n_part, "fp_a")  # pin pre-expansion width
        .join(docs_a, "fp_a")
        .join(docs_b, "fp_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            F.expr("bit_count(fp_a ^ fp_b)").cast("long").alias("hamming"),
        )
    )
    s_a = sim.select("simhash", F.col("doc_id").alias("doc_a"))
    s_b = sim.select("simhash", F.col("doc_id").alias("doc_b"))
    within = (
        s_a.repartition(n_part, "simhash")  # pin: groupwise-quadratic fan-out
        .join(s_b, "simhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("long").alias("hamming"))
    )
    return (
        within.unionByName(cross)
        .orderBy("hamming", "doc_a", "doc_b")
    )


# --- d11: cluster-canonical dedup survivors ----------------------------------
@register(
    "d11_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a AS a, i.doc_b AS b
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= {_CLUSTER_JACCARD}
    ),
    und AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ),
    reach(src, dst) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
    ),
    lbl AS (
      SELECT src AS node, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    sized AS (
      SELECT l.cluster_id, l.node, length(n.norm) AS len
      FROM lbl l JOIN norm n ON n.doc_id = l.node
    ),
    ranked AS (
      SELECT cluster_id, node, len,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY len DESC, node) AS rn
      FROM sized
    ),
    agg AS (
      SELECT cluster_id, CAST(count(*) - 1 AS BIGINT) AS n_dropped
      FROM sized GROUP BY cluster_id
    )
    SELECT r.cluster_id, r.node AS keep_doc, CAST(r.len AS BIGINT) AS keep_len,
           a.n_dropped
    FROM ranked r JOIN agg a USING (cluster_id)
    WHERE r.rn = 1
    ORDER BY r.cluster_id
    """,
)
def d11_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The closing act of the dedup pipeline: per near-dup cluster (d07's
    connected components over Jaccard >= 0.9 edges), keep ONE canonical
    document — the longest normalized text, doc_id ascending on ties — and
    account for what was dropped.  This is the "keep-best" policy every
    production training-data dedup ends with (vs d07 which only labels).

    Scale shape: component labels come from the iterative min-label
    propagation in ``operators/graph.py`` (edge-linear per round); the
    canonical pick is one window over |cluster members| rows, partitioned by
    cluster — no driver-side anything.  The oracle re-derives the whole
    thing (closure via recursive CTE + the same keep policy) independently."""
    from pyspark.sql.window import Window as W

    labels = _cluster_labels(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents")
    sized = labels.join(
        d.select(
            F.col("doc_id").alias("node"),
            F.length(norm_text(F.col("text"))).alias("len"),
        ),
        "node",
    )
    win = W.partitionBy("lbl").orderBy(F.desc("len"), F.asc("node"))
    keepers = (
        sized.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            F.col("lbl").alias("cluster_id"),
            F.col("node").alias("keep_doc"),
            F.col("len").cast("long").alias("keep_len"),
        )
    )
    counts = sized.groupBy(F.col("lbl").alias("cluster_id")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped")
    )
    return keepers.join(counts, "cluster_id").orderBy("cluster_id")


# --- d12: containment pairs (asymmetric excerpt/quote detection) --------------
@register(
    "d12_containment_pairs",
    headline=True,
    oracle=f"""
    WITH {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(greatest(i.c / CAST(ca.n AS DOUBLE),
                          i.c / CAST(cb.n AS DOUBLE)), 6) AS containment,
           round(i.c / CAST(ca.n + cb.n - i.c AS DOUBLE), 6) AS jaccard,
           (CASE WHEN ca.n <= cb.n THEN i.doc_a ELSE i.doc_b END) AS contained_doc
    FROM inter i
    JOIN card ca ON ca.doc_id = i.doc_a
    JOIN card cb ON cb.doc_id = i.doc_b
    WHERE greatest(i.c / CAST(ca.n AS DOUBLE), i.c / CAST(cb.n AS DOUBLE)) >= 0.8
    ORDER BY containment DESC, i.doc_a, i.doc_b
    LIMIT 15
    """,
)
def d12_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT — max(|A∩B|/|A|, |A∩B|/|B|) — the asymmetric
    companion to d05's Jaccard: a short excerpt quoted inside a long doc
    scores near 1.0 on containment but near 0 on Jaccard (the union is
    dominated by the long side), so Jaccard-thresholded dedup systematically
    MISSES quote/excerpt duplication; containment is the standard fix
    (Broder's resemblance-vs-containment distinction, public).  Pairs come
    from the same rare-shingle blocking as d05 (per-key fan-out bounded by
    the DF cap), the smaller side is reported as the contained doc, and
    Jaccard rides along for contrast.

    Scale shape: identical to d05 — one blocked self-join on the shingle
    hash, per-doc cardinalities broadcast-joined onto the (small) pair set;
    containment adds only projections."""
    sh = _shingles(spark, sf_dir)
    rare = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _DF_CAP
    ).select("h")
    rs = sh.join(rare, "h").select("doc_id", "h")
    card = rs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = rs.alias("a"), rs.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.greatest(
        F.col("c") / F.col("na").cast("double"),
        F.col("c") / F.col("nb").cast("double"),
    )
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(cont >= 0.8)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont, 6).alias("containment"),
            F.round(
                F.col("c")
                / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
                6,
            ).alias("jaccard"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
        )
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
        .limit(15)
    )


# --- d13: banding precision/recall audit ---------------------------------------
_D13_THRESHOLDS = (0.5, 0.7, 0.9)

_SQL_D13_CAND = f"""
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {band} AS band_id, {_band_sig_sql(band)} AS sig FROM sigs"
          for band in range(_N_BANDS)
      )}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
"""


@register(
    "d13_banding_pr_audit",
    oracle=_SQL_SIGNATURES
    + f"""
    , {_SQL_D13_CAND},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)),
    card AS (SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
      -- round like the Spark side's shared pair frame so a threshold can't
      -- fall between the rounded and unrounded value of one pair
      SELECT i.doc_a, i.doc_b,
             round(i.c / CAST(ca.n + cb.n - i.c AS DOUBLE), 6) AS j
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
    ),
    n_cand AS (SELECT count(*) AS nc FROM cand)
    SELECT t.threshold,
           CAST((SELECT count(*) FROM truth WHERE j >= t.threshold) AS BIGINT)
             AS n_relevant,
           CAST((SELECT nc FROM n_cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth tr JOIN cand c
                  ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b
                 WHERE tr.j >= t.threshold) AS BIGINT) AS n_hit,
           round((SELECT count(*) FROM truth tr JOIN cand c
                   ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b
                  WHERE tr.j >= t.threshold)
                 / greatest(CAST((SELECT count(*) FROM truth
                                  WHERE j >= t.threshold) AS DOUBLE), 1),
                 6) AS recall
    FROM (SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in _D13_THRESHOLDS)}]) AS threshold) t
    ORDER BY t.threshold
    """,
)
def d13_banding_pr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding RECALL audit against exact ground truth: for each
    similarity threshold, how many of the truly-similar pairs (exact
    Jaccard over the rare-blocked shingle universe) does the 4×4 banding
    actually surface as candidates?  This is the measurement that
    justifies banding parameters — theory says P(candidate) = 1-(1-s⁴)⁴
    (≈0.99 at s=0.9, ≈0.66 at s=0.7, ≈0.22 at s=0.5), and the audit
    checks the REAL corpus against that curve; a recall collapse at the
    operating threshold means re-tune bands before trusting d07's
    clusters.

    Scale shape: candidates come from the band self-join (bounded per
    bucket); truth from the d05 blocked-pair program (bounded per rare
    shingle); the audit joins two pair tables (both ≪ corpus²) and the
    thresholds explode from a 3-row literal.  Ground truth is restricted
    to the SAME blocked universe the pipeline verifies in — the audit
    measures the banding stage, not the (separately capped) blocking."""
    sigs = _signatures(spark, sf_dir)
    bands = None
    for band in range(_N_BANDS):
        cols = [f"m{band * _ROWS_PER_BAND + r:02d}" for r in range(_ROWS_PER_BAND)]
        expr = F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols]))
        b = sigs.select("doc_id", F.lit(band).alias("band_id"), expr.alias("sig"))
        bands = b if bands is None else bands.unionAll(b)
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    truth = _jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j")
    )
    n_cand = cand.count()
    # ONE pass over truth and ONE over truth⋈cand instead of a per-threshold
    # driver loop (opt r13, guide §1.2/§2.4: 7 jobs → 2 — the old loop
    # re-filtered and re-joined the SAME pair frames once per threshold).
    # Conditional sums over every threshold ride a single aggregate each;
    # the recall arithmetic is unchanged driver-side math.
    rel_cols = [
        F.coalesce(
            F.sum((F.col("j") >= t).cast("long")), F.lit(0)
        ).alias(f"r{i}")
        for i, t in enumerate(_D13_THRESHOLDS)
    ]
    hit_cols = [
        F.coalesce(
            F.sum((F.col("j") >= t).cast("long")), F.lit(0)
        ).alias(f"h{i}")
        for i, t in enumerate(_D13_THRESHOLDS)
    ]
    stats = (
        truth.agg(*rel_cols)
        .crossJoin(truth.join(cand, ["doc_a", "doc_b"]).agg(*hit_cols))
        .collect()[0]
    )
    rows = []
    for i, t in enumerate(_D13_THRESHOLDS):
        n_rel, n_hit = stats[f"r{i}"], stats[f"h{i}"]
        rows.append(
            (t, n_rel, n_cand, n_hit, round(n_hit / max(n_rel, 1), 6))
        )
    cand.unpersist()
    return local_frame(
        spark,
        rows,
        "threshold double, n_relevant long, n_candidates long, n_hit long,"
        " recall double",
    ).orderBy("threshold")


# --- d14: sorted-neighborhood blocking (record-linkage SNM) --------------------
_D14_KEY_LEN = 12  # SNM sort key: normalized-text prefix
_D14_WINDOW = 5    # candidate window: ranks within w-1 of each other


@register(
    "d14_sorted_neighborhood",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {sql_norm_text('text')} AS n FROM documents
    ),
    keyed AS (
      SELECT doc_id, substring(n, 1, {_D14_KEY_LEN}) AS k,
             {sql_hex_int('n', 15)} AS fp,
             row_number() OVER (ORDER BY substring(n, 1, {_D14_KEY_LEN}), doc_id)
               AS r
      FROM norm
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (a.fp = b.fp) AS is_dup
      FROM keyed a
      JOIN keyed b ON b.r - a.r BETWEEN 1 AND {_D14_WINDOW - 1}
    ),
    truth AS (
      SELECT CAST(sum(cnt * (cnt - 1) / 2) AS BIGINT) AS n_dup_pairs
      FROM (SELECT fp, count(*) AS cnt FROM keyed GROUP BY fp)
    )
    SELECT CAST((SELECT count(*) FROM keyed) AS BIGINT)          AS n_docs,
           CAST((SELECT count(*) FROM cand) AS BIGINT)           AS n_candidates,
           CAST((SELECT count(*) FROM cand WHERE is_dup) AS BIGINT) AS n_dup_hits,
           (SELECT n_dup_pairs FROM truth)                       AS n_dup_pairs,
           round((SELECT count(*) FROM cand WHERE is_dup)
                 / greatest(CAST((SELECT n_dup_pairs FROM truth) AS DOUBLE), 1),
                 6)                                              AS recall
    """,
)
def d14_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo's record-linkage
    SNM, public) — the THIRD blocking family beside shingle-frequency
    (d05) and LSH bands (d03): sort the corpus by a cheap key (normalized
    prefix), compare only records within a fixed rank window.  Candidate
    volume is exactly |docs|·(w−1) — fan-out is a CONSTANT, not a bucket-
    occupancy distribution, which is SNM's operational appeal (and its
    weakness: dups whose keys sort far apart are invisible — the audit
    reports recall against exact-duplicate ground truth).

    Scale shape: the global rank comes from `operators/ranks.py`'s
    range-partitioned row_number (deterministic code-point boundaries →
    parallel per-range windows + broadcast offsets — i21's pattern,
    shared), NOT a single-partition `row_number() OVER (ORDER BY ...)`;
    then a band self-join on rank difference with bounded fan-out;
    ground truth is a fingerprint aggregate.  Window semantics, not pair
    storage: candidates stream."""
    from worker_etl_spark.operators.ranks import (
        codepoint_surrogate,
        global_row_number,
    )

    d = read_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.substring(norm_text(F.col("text")), 1, _D14_KEY_LEN).alias("k"),
        hex_int(norm_text(F.col("text")), 15).alias("fp"),
    )
    keyed, _ = global_row_number(
        keyed,
        ["k", "doc_id"],
        surrogate=codepoint_surrogate(F.col("k")),
        rn_name="r",
    )
    a = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"), F.col("r").alias("ra")
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"), F.col("r").alias("rb")
    )
    # bounded fan-out: explode the offset, join rank-equi (never a range scan)
    cand = (
        a.select(
            "doc_a",
            "fp_a",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, _D14_WINDOW)])
            ).alias("off"),
            "ra",
        )
        .withColumn("rb", F.col("ra") + F.col("off"))
        .join(b, "rb")
        .select("doc_a", "doc_b", (F.col("fp_a") == F.col("fp_b")).alias("is_dup"))
    )
    truth = (
        keyed.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(
                (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long")
            ).alias("n_dup_pairs")
        )
    )
    stats = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(F.when(F.col("is_dup"), 1)).alias("n_dup_hits"),
    )
    n_docs = keyed.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(stats)
        .crossJoin(truth)
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_dup_hits").cast("long").alias("n_dup_hits"),
            F.col("n_dup_pairs").cast("long").alias("n_dup_pairs"),
            F.round(
                F.col("n_dup_hits")
                / F.greatest(F.col("n_dup_pairs").cast("double"), F.lit(1.0)),
                6,
            ).alias("recall"),
        )
    )


# --- d15: blocked fuzzy entity join --------------------------------------------
_D15_MAX_EDITS = 1   # verification: edit distance bound


@register(
    "d15_fuzzy_entity_join",
    oracle=f"""
    WITH dirty AS (
      -- the incoming feed: every 3rd name has one character corrupted,
      -- keys are NOT shared (entity matching, not key join)
      SELECT c_custkey AS feed_id,
             CASE WHEN c_custkey % 3 = 0
                  THEN substring(c_name, 1, 5) || 'x' || substring(c_name, 7)
                  ELSE c_name END AS feed_name
      FROM customer
    ),
    fv AS (
      SELECT feed_id, feed_name,
             unnest(range(0, length(feed_name) + 1)) AS i
      FROM dirty
    ),
    fvv AS (
      SELECT feed_id, feed_name,
             CASE WHEN i = 0 THEN feed_name
                  ELSE substring(feed_name, 1, CAST(i - 1 AS INT))
                       || substring(feed_name, CAST(i + 1 AS INT)) END AS v
      FROM fv
    ),
    mv AS (
      SELECT c_custkey AS master_id, c_name,
             unnest(range(0, length(c_name) + 1)) AS i
      FROM customer
    ),
    mvv AS (
      SELECT master_id, c_name,
             CASE WHEN i = 0 THEN c_name
                  ELSE substring(c_name, 1, CAST(i - 1 AS INT))
                       || substring(c_name, CAST(i + 1 AS INT)) END AS v
      FROM mv
    ),
    cand AS (
      SELECT DISTINCT f.feed_id, f.feed_name, m.master_id, m.c_name
      FROM fvv f JOIN mvv m ON f.v = m.v
    ),
    blocked AS (
      SELECT feed_id, master_id,
             levenshtein(feed_name, c_name) AS dist
      FROM cand
      WHERE levenshtein(feed_name, c_name) <= {_D15_MAX_EDITS}
    ),
    best AS (
      SELECT feed_id, master_id, dist,
             row_number() OVER (PARTITION BY feed_id
                                ORDER BY dist, master_id) AS rn
      FROM blocked
    )
    SELECT CAST((SELECT count(*) FROM dirty) AS BIGINT)  AS n_feed,
           CAST(count(*) AS BIGINT)                      AS n_matched,
           CAST(count(*) FILTER (WHERE dist = 0) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (WHERE dist > 0) AS BIGINT) AS n_fuzzy,
           CAST(count(*) FILTER (WHERE feed_id = master_id) AS BIGINT)
                                                         AS n_correct
    FROM best WHERE rn = 1
    """,
)
def d15_fuzzy_entity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked FUZZY entity join — the record-linkage workhorse when the
    incoming feed shares NO key with the master table (CRM imports,
    supplier onboarding): deletion-neighborhood blocking (the public
    FastSS / symmetric-delete recipe) generates each name's ≤len+1
    one-deletion variants on both sides; any pair within edit distance
    {_D15_MAX_EDITS} MUST share a variant (substitution: delete the
    edited position on both; indel: the shorter string IS a variant of
    the longer), so the variant equi-join is a COMPLETE candidate set
    and levenshtein verifies exactly.  Ties resolve to the best
    (distance, id) candidate per feed row.  The corruption is
    deterministic so the oracle replays the whole linkage AND the audit
    can score accuracy (n_correct = matches landing on the true entity).

    Scale: the round-4 full-registry bench caught the previous prefix-4
    block degenerating to ALL-PAIRS on this data (every TPC-H customer
    name starts 'Cust…' — 15k×15k levenshtein, 683 s at sf0.1);
    blocking keys must be DISCRIMINATIVE, and delete-variants are by
    construction (a variant collides only within edit distance 2).
    Cost: ~len+1 row amplification into a shuffle-partitionable
    equi-join, levenshtein only on distinct variant-sharing survivors
    (d08's rule), one rank window at feed grain.  Now 683 s → ~2 s."""
    c = read_table(spark, sf_dir, "customer")
    dirty = c.select(
        F.col("c_custkey").alias("feed_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring(F.col("c_name"), 1, 5),
                F.lit("x"),
                F.expr("substring(c_name, 7)"),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("feed_name"),
    )
    master = c.select(F.col("c_custkey").alias("master_id"), "c_name")

    def delete_variants(df, name_col: str) -> DataFrame:
        return df.withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.length(name_col)))
        ).withColumn(
            "v",
            F.expr(
                f"CASE WHEN i = 0 THEN {name_col} "
                f"ELSE substring({name_col}, 1, i - 1) "
                f"  || substring({name_col}, i + 1) END"
            ),
        )

    # dropDuplicates per side BEFORE the join: deleting any char of an
    # identical run yields the same variant (TPC-H's zero-padded names have
    # 6+ zero runs), so undeduped sides would square that multiplicity
    # through the join (measured: ~4x on this corpus).
    #
    # IDs-only through the blocking join (opt r13, guide §2.3/§8 "decide
    # with small rows, attach payloads once"): the variant equi-join and the
    # pair distinct shuffle (feed_id, master_id) longs, never the ~18-char
    # name strings; names re-attach AFTER via broadcast joins against the
    # |customer|-row sides.  Pair set is identical (names are functionally
    # dependent on their ids), so blocked/best/aggregate are unchanged.
    cand_ids = (
        delete_variants(dirty, "feed_name")
        .select("feed_id", "v")
        .dropDuplicates(["feed_id", "v"])
        .join(
            delete_variants(master, "c_name")
            .select("master_id", "v")
            .dropDuplicates(["master_id", "v"]),
            "v",
        )
        .select("feed_id", "master_id")
        .distinct()
    )
    cand = cand_ids.join(F.broadcast(dirty), "feed_id").join(
        F.broadcast(master), "master_id"
    )
    blocked = cand.withColumn(
        "dist", F.levenshtein(F.col("feed_name"), F.col("c_name"))
    ).filter(F.col("dist") <= _D15_MAX_EDITS)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("feed_id").orderBy("dist", "master_id")
    best = blocked.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    n_feed = dirty.count()
    return best.agg(
        F.lit(n_feed).cast("long").alias("n_feed"),
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.count(F.when(F.col("dist") == 0, 1)).cast("long").alias("n_exact"),
        F.count(F.when(F.col("dist") > 0, 1)).cast("long").alias("n_fuzzy"),
        F.count(F.when(F.col("feed_id") == F.col("master_id"), 1))
        .cast("long")
        .alias("n_correct"),
    )


# --- d16: incremental batch-vs-corpus dedup ---------------------------------------
@register(
    "d16_incremental_dedup",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    split AS (
      SELECT doc_id, n_chars, {sql_norm_text('text')} AS norm,
             (doc_id % 10 = 7) AS is_new
      FROM documents
    ),
    exact_hits AS (
      SELECT DISTINCT nw.doc_id
      FROM split nw JOIN split corp
        ON corp.is_new = FALSE AND md5(nw.norm) = md5(corp.norm)
      WHERE nw.is_new
    ),
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h, (s.doc_id % 10 = 7) AS is_new
      FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS new_id, b.doc_id AS corp_id, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.is_new AND NOT b.is_new
      GROUP BY a.doc_id, b.doc_id
    ),
    near_hits AS (
      SELECT DISTINCT i.new_id AS doc_id
      FROM inter i
      JOIN card ca ON ca.doc_id = i.new_id
      JOIN card cb ON cb.doc_id = i.corp_id
      WHERE i.c * 2 >= ca.n + cb.n - i.c
    ),
    classified AS (
      SELECT s.doc_id, s.n_chars,
             CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                  WHEN nh.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'unique' END AS status
      FROM split s
      LEFT JOIN exact_hits e ON e.doc_id = s.doc_id
      LEFT JOIN near_hits nh ON nh.doc_id = s.doc_id
      WHERE s.is_new
    )
    SELECT status,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS total_chars
    FROM classified GROUP BY status ORDER BY status
    """,
)
def d16_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup against a MAINTAINED corpus index: classify
    a NEW batch (docs with doc_id % 10 == 7, the deterministic stand-in for
    today's crawl) — exact duplicates by normalized-content hash probe,
    near-duplicates by rare-shingle blocked Jaccard ≥ 0.5 against corpus
    docs, the rest unique.

    Round-9's pinned-batch ladder (``D16_PINNED_LADDER.json``) measured the
    previous stateless formulation at 12.92× time per 10× corpus: the cost
    was re-deriving the corpus's hash set and shingle index (norm_text +
    md5 + explode over EVERY corpus row) on every run.  This version is the
    production shape: the corpus index is a persisted, append-only table
    maintained per ingest batch (``operators/dedup_index.py`` — exact-hash
    set, additive shingle-df segments, rare postings, card deltas), and the
    daily job only probes it.  Classification work is O(batch) shingling +
    batch-keyed joins; index reads are two-column parquet scans.  The
    batch's own df contribution (which can push a corpus-rare shingle over
    the cap — the oracle counts batch rows in df) is applied as an on-the-
    fly correction without mutating the index, since a classified batch has
    not been ingested.

    The first call per corpus builds the index via the same incremental
    ``update_index`` path (fingerprint-cached on corpus files); the ladder
    builds it in chunks untimed and times classification alone —
    equivalence of incremental vs full build is pinned by
    ``tests/test_dedup_index.py``.  No reference counterpart (the reference
    reloads blindly; SURVEY.md §2 S6)."""
    from worker_etl_spark.operators.dedup_index import classify_batch, ensure_index

    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    index_dir = ensure_index(spark, sf_dir, corpus)
    batch = d.filter(F.col("doc_id") % 10 == 7).select("doc_id", "n_chars", "text")
    classified = classify_batch(spark, batch, index_dir)
    return (
        classified.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("status")
    )


# --- d17: semantic-only near-dup candidates (embedding ∧ ¬text) --------------------
@register(
    "d17_semantic_neardup",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    pts AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS y
      FROM embeddings
    ),
    cells AS (
      SELECT vec_id, x, y,
             (x + 100000) // {_S08_R} AS cx, (y + 100000) // {_S08_R} AS cy
      FROM pts
    ),
    probe AS (
      SELECT vec_id, x, y, cx + dx.d AS cx, cy + dy.d AS cy
      FROM cells
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
    ),
    emb_pairs AS (
      SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM probe a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
      WHERE a.vec_id < b.vec_id
        AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_S08_R * _S08_R}
    ),
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    text_pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c * 2 >= ca.n + cb.n - i.c
    )
    SELECT e.doc_a, e.doc_b, CAST(e.d2 AS BIGINT) AS d2
    FROM emb_pairs e
    LEFT JOIN text_pairs t ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b
    WHERE t.doc_a IS NULL
    ORDER BY d2, e.doc_a, e.doc_b
    LIMIT 20
    """,
)
def d17_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC-only near-dup candidates: pairs whose embeddings are close
    (grid-blocked fixed-radius search over the projected coordinates, the
    s08 kernel over ALL points) but whose TEXTS are not near-duplicates
    (rare-shingle blocked Jaccard < 0.5, the d05 program) — the paraphrase/
    translation/re-write detector every text-grain dedup pass (d01–d16)
    structurally misses, and the pair set a semantic-dedup reviewer or a
    cross-encoder verifier consumes at 100 TB.  vec_id keys the same corpus
    as doc_id (the d06 catalog convention).

    Scale: both legs are blocked — grid-cell equi-join (cell edge = radius,
    exact by the 3×3 pigeonhole) and DF-capped shingle equi-join — and the
    subtraction is a pair-keyed LEFT ANTI join, so nothing all-pairs
    anywhere.  Exact integer distances; the anti-join makes the composition
    one extra key-equi shuffle over the two candidate sets.  No reference
    counterpart (SURVEY.md §2)."""
    e = read_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.floor(F.col("embedding")[0].cast("double") * 1000).cast("long").alias("x"),
        F.floor(F.col("embedding")[1].cast("double") * 1000).cast("long").alias("y"),
    )
    cells = pts.select(
        "vec_id", "x", "y",
        F.expr(f"(x + 100000) DIV {_S08_R}").alias("cx"),
        F.expr(f"(y + 100000) DIV {_S08_R}").alias("cy"),
    )
    probe = (
        cells.select(
            "vec_id", "x", "y", "cx", "cy",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "vec_id", "x", "y", "dx", "cy",
            (F.col("cx") + F.col("dx")).alias("cx"),
        )
        .select(
            F.col("vec_id").alias("va"), F.col("x").alias("xa"),
            F.col("y").alias("ya"), "cx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
            "cy",
        )
        .select("va", "xa", "ya", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    emb_pairs = (
        probe.join(cells, ["cx", "cy"])
        .filter(F.col("va") < F.col("vec_id"))
        .select(
            F.col("va").alias("doc_a"),
            F.col("vec_id").alias("doc_b"),
            d2.alias("d2"),
        )
        .filter(F.col("d2") <= _S08_R * _S08_R)
        .distinct()
    )
    # exact integer near-dup test (2c >= na+nb-c), same arithmetic as the
    # oracle — no dependence on the memoized frame's 6-dp rounded double
    text_pairs = _jaccard_pairs(spark, sf_dir).filter(
        F.col("c") * 2 >= F.col("na") + F.col("nb") - F.col("c")
    ).select("doc_a", "doc_b")
    return (
        emb_pairs.join(text_pairs, ["doc_a", "doc_b"], "left_anti")
        .select("doc_a", "doc_b", F.col("d2").cast("long").alias("d2"))
        .orderBy("d2", "doc_a", "doc_b")
        .limit(20)
    )


# --- d18: incremental SimHash near-dup (pinned batch vs maintained index) ----
@register(
    "d18_incremental_simhash",
    oracle=f"""
    WITH {_SQL_SIMHASH_CTES},
    split AS (
      SELECT doc_id, simhash, (doc_id % 10 = 7) AS is_new FROM sim
    ),
    bands AS (
      SELECT doc_id, simhash, is_new, band,
             (simhash >> (band * {_HAM_BAND_BITS})) & {_HAM_MASK} AS val
      FROM split CROSS JOIN (SELECT unnest(range({_HAM_BANDS})) AS band)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corp_id,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.val = b.val
      WHERE a.is_new AND NOT b.is_new
    ),
    hits AS (
      SELECT new_id, corp_id, bit_count(xor(sim_a, sim_b)) AS hamming
      FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= {_HAM_MAX}
    )
    SELECT new_id AS doc_id,
           CAST(count(*) AS BIGINT)        AS n_near,
           CAST(min(hamming) AS BIGINT)    AS min_hamming
    FROM hits GROUP BY new_id ORDER BY doc_id
    """,
)
def d18_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dup: the daily batch (doc_id % 10 == 7)
    probed against the MAINTAINED corpus fingerprint index — each batch doc
    reports how many corpus docs sit within hamming ≤ 3 of its 60-bit
    fingerprint, and the closest distance.  This is the d10 band-blocked
    program with one side pinned to the batch, re-expressed in the
    production posture the d16 pinned-batch finding mandates: a doc's
    fingerprint is corpus-independent, so the index is PURE APPEND
    (``dedup_index.update_index``), and the daily job computes fingerprints
    for the BATCH only — never re-tokenizing the corpus.

    Scale shape (``operators/dedup_index.simhash_near_batch``): both sides
    collapse to distinct fingerprints before the band join (Manku et al.'s
    fingerprint store, WWW'07 public); the join is key-equi on the
    corpus-adaptive (B-3)-subset band keys (d10's exact-by-pigeonhole
    blocking, output invariant to B so the oracle keeps the B=4 spec);
    matches aggregate at the fingerprint grain and only then expand to
    batch doc_ids.  The oracle's batch side covers the same docs, so the
    maintained index is value-hash-verified against the stateless
    formulation every round.  No reference counterpart (SURVEY.md §2)."""
    from worker_etl_spark.operators.dedup_index import (
        ensure_index,
        simhash_near_batch,
    )

    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    index_dir = ensure_index(spark, sf_dir, corpus)
    batch = d.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text")
    return (
        simhash_near_batch(spark, batch, index_dir, max_hamming=_HAM_MAX)
        .select(
            "doc_id",
            F.col("n_near").cast("long").alias("n_near"),
            F.col("min_hamming").cast("long").alias("min_hamming"),
        )
        .orderBy("doc_id")
    )
