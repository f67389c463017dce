"""Maintained IVF ANN index — the similarity half of the maintained-index
posture (round-10 verdict #5: dedup got d16/d18's persisted index; ANN still
rebuilt its assignments per run).

Production shape: the coarse quantizer (centroids) is TRAINED ONCE on the
standing corpus and persisted; every ingest batch is assigned to its nearest
existing centroid — O(batch × centroids) work, no retrain, no corpus
re-scan — and appended to a CELL-PARTITIONED postings table.  A search
probes its nearest cells and re-ranks EXACTLY inside them, so the parquet
layout itself is the index: ``postings/cell=N/`` directories mean a probe
reads only the probed cells' files (partition pruning), never the corpus.

Layout under ``index_dir``:

- ``centroids/``  (cid long, embedding array<float>)  the frozen quantizer.
- ``postings/``   parquet partitioned by ``cell`` (vec_id long,
                  embedding array<float>) — one append per ingest batch;
                  appends create new files inside the cell dirs, so the
                  partition pruning contract survives any number of batches.

Exactness contract: assignment, probe selection, and re-ranking use the
same rounded-cosine (6 dp) + smallest-id tiebreak recipe as s03's oracle,
so the whole maintained path stays value-hash-checkable against a stateless
SQL formulation (``queries/similarity_q.py:s09``).  Re-ranking reads the
EXACT stored vectors (float32 parquet round-trips bit-exactly), so
incremental maintenance never degrades result quality — the IVF
approximation is only in WHICH cells are probed, identical to s03.

Scale: centroids are catalog-sized by construction (collected under the
same broadcast guard as s03's matrices); batch assignment is one Arrow-batch
BLAS kernel over the batch; search cost is |probed cells| × cell occupancy,
measured per rung in ``ANN_INDEX_LADDER.json``.  No reference counterpart
(similarity is a driver-mandated extension, SURVEY.md §2).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: probed cells per query and result depth — s03's constants, shared so the
#: maintained path and the in-session IVF stay comparable.
PROBES = 2
TOP_K = 5


def _centroid_mats(spark: SparkSession, index_dir: str):
    """Driver-side (cid, matrix, norms) for the frozen quantizer, sorted by
    cid so first-argmax == smallest-cid tiebreak."""
    pdf = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("cid")
        .toPandas()
    )
    ids = pdf["cid"].to_numpy(dtype=np.int64)
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return ids, mat, np.linalg.norm(mat, axis=1)


def create_ann_index(
    spark: SparkSession, centroids: DataFrame, index_dir: str
) -> None:
    """Freeze the quantizer: *centroids* needs (vec_id, embedding); rows are
    persisted as the index's centroid table.  Called once — appends never
    touch it (the no-retrain contract)."""
    from worker_etl_spark.queries.similarity_q import _guard_query_set

    _guard_query_set(centroids, "ANN index centroid set")
    os.makedirs(index_dir, exist_ok=True)
    centroids.select(
        F.col("vec_id").cast("long").alias("cid"), "embedding"
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))


def append_ann_batch(
    spark: SparkSession, batch: DataFrame, index_dir: str
) -> None:
    """Assign one ingest batch to its nearest FROZEN centroids (rounded
    cosine, smallest-cid ties — s03's assignment recipe) and append to the
    cell-partitioned postings.  O(batch) scan × one BLAS kernel; the index's
    existing rows are never read or rewritten."""
    bc = spark.sparkContext.broadcast(_centroid_mats(spark, index_dir))

    def assign(it):
        cids, cm, cn = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            sims = np.round((cm @ x.T) / np.outer(cn, xn), 6)
            cells = cids[np.argmax(sims, axis=0)]  # first max = smallest cid
            yield pd.DataFrame(
                {
                    "cell": cells,
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "embedding": pdf["embedding"],
                }
            )

    assigned = batch.select("vec_id", "embedding").mapInPandas(
        assign, schema="cell long, vec_id long, embedding array<float>"
    )
    assigned.write.partitionBy("cell").mode("append").parquet(
        os.path.join(index_dir, "postings")
    )


def search_ann(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    probes: int = PROBES,
    k: int = TOP_K,
) -> DataFrame:
    """Exact re-rank inside each query's *probes* nearest cells:
    (query_id, cand_id, cosine, rank).  The postings read carries a
    ``cell IN (probed)`` filter, so partition pruning limits the scan to the
    probed cells' files — the maintained-index counterpart of s03's
    in-flight probe mask."""
    from worker_etl_spark.queries.similarity_q import _guard_query_set

    _guard_query_set(queries, "ANN search query set")
    from pyspark.sql.window import Window as W

    qpdf = queries.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    q_mat = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    q_nrm = np.linalg.norm(q_mat, axis=1)
    c_ids, c_mat, c_nrm = _centroid_mats(spark, index_dir)

    # Probe selection is queries × centroids — both catalog-sized.
    sims = np.round((q_mat @ c_mat.T) / np.outer(q_nrm, c_nrm), 6)
    order = np.lexsort(
        (np.arange(len(c_ids))[None, :].repeat(len(q_ids), 0), -sims)
    )
    probed = order[:, :probes]  # (n_q, probes) centroid INDEXES
    probe_cells = {}  # cell id -> query indexes probing it
    for qi in range(len(q_ids)):
        for ci in probed[qi]:
            probe_cells.setdefault(int(c_ids[ci]), []).append(qi)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, probe_cells, k))

    def score(it):
        qi_ids, qm, qn, pc, kk = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            s = np.round((qm @ x.T) / np.outer(qn, xn), 6)  # (n_q, n_batch)
            mask = np.zeros_like(s, dtype=bool)
            for col, cell in enumerate(cells):
                for qi in pc.get(int(cell), ()):  # only probing queries see it
                    mask[qi, col] = True
            s = np.where(mask & (qi_ids[:, None] != x_ids[None, :]), s, -np.inf)
            out_q, out_c, out_s = [], [], []
            for row in range(s.shape[0]):
                top = np.lexsort((x_ids, -s[row]))[: min(kk, s.shape[1])]
                keep = np.isfinite(s[row][top])
                top = top[keep]
                out_q.append(np.full(top.size, qi_ids[row], dtype=np.int64))
                out_c.append(x_ids[top])
                out_s.append(s[row][top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    postings = spark.read.parquet(os.path.join(index_dir, "postings")).filter(
        F.col("cell").isin([int(c) for c in probe_cells])  # partition pruning
    )
    scored = postings.mapInPandas(
        score, schema="query_id long, cand_id long, cosine double"
    )
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def probed_candidate_count(
    spark: SparkSession, queries: DataFrame, index_dir: str, probes: int = PROBES
) -> int:
    """Ladder instrumentation: total postings rows inside the cells the
    query set probes — the measured candidate volume behind search cost."""
    qpdf = queries.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    q_mat = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    q_nrm = np.linalg.norm(q_mat, axis=1)
    c_ids, c_mat, c_nrm = _centroid_mats(spark, index_dir)
    sims = np.round((q_mat @ c_mat.T) / np.outer(q_nrm, c_nrm), 6)
    order = np.lexsort(
        (np.arange(len(c_ids))[None, :].repeat(len(q_mat), 0), -sims)
    )
    cells = {int(c_ids[ci]) for row in order[:, :probes] for ci in row}
    return (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .filter(F.col("cell").isin(sorted(cells)))
        .count()
    )


# --- fingerprint-cached index for the registered query -----------------------
_INDEX_ROOT: str | None = None
_INDEX_CACHE: dict[str, str] = {}


def _corpus_fingerprint(sf_dir: str) -> str:
    # dedup_index's cheap (name, size, mtime_ns) staleness key, pointed at
    # the embeddings table instead of documents.
    from worker_etl_spark.operators.dedup_index import _corpus_fingerprint as fp

    return fp(sf_dir, table="embeddings")


def _index_root() -> str:
    global _INDEX_ROOT
    if _INDEX_ROOT is None:
        _INDEX_ROOT = tempfile.mkdtemp(prefix="ann_index_")
        atexit.register(shutil.rmtree, _INDEX_ROOT, ignore_errors=True)
    return _INDEX_ROOT


def register_ann_index(sf_dir: str, index_dir: str) -> None:
    """Seed the cache with a prebuilt index (the ladder builds incrementally,
    untimed, then times search alone)."""
    _INDEX_CACHE[_corpus_fingerprint(sf_dir)] = index_dir


def ensure_ann_index(
    spark: SparkSession,
    sf_dir: str,
    centroids: DataFrame,
    ingest_batches: list[DataFrame],
) -> str:
    """Return the maintained ANN index for sf_dir, building it on first
    sight: freeze *centroids*, then append each frame in *ingest_batches*
    in order (each an incremental no-retrain ingest)."""
    key = _corpus_fingerprint(sf_dir)
    cached = _INDEX_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    index_dir = os.path.join(_index_root(), key)
    shutil.rmtree(index_dir, ignore_errors=True)
    create_ann_index(spark, centroids, index_dir)
    for b in ingest_batches:
        append_ann_batch(spark, b, index_dir)
    _INDEX_CACHE[key] = index_dir
    return index_dir
