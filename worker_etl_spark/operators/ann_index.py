"""Maintained IVF ANN index — the similarity half of the maintained-index
posture (round-10 verdict #5: dedup got d16/d18's persisted index; ANN still
rebuilt its assignments per run).

Production shape: the coarse quantizer (centroids) is TRAINED ONCE on the
standing corpus and persisted; every ingest batch is assigned to its nearest
live centroid — O(batch × centroids) work, no retrain, no corpus re-scan —
and appended to a CELL-PARTITIONED postings table.  A search probes its
nearest cells and re-ranks EXACTLY inside them, so the parquet layout itself
is the index: the search scan's file index is built from the probed
``cell=N/`` dirs alone — pruned by construction — and never touches the
corpus.

Round-12 storage + scale posture (round-11 verdict #1/#3):

- **segstore-backed**: ``index_dir`` is one ``operators/segstore.py`` store
  with two tables — ``centroids/`` (cid long, embedding array<float>) and
  ``postings/`` (vec_id long, embedding array<float>; each segment
  partitioned by ``cell``).  Appends stage a new segment and commit with one
  manifest swap (crash-safe, concurrent-reader-safe, idempotent under a
  batch id); compaction folds the accumulated per-append small files back
  to one segment per table and retires dead cells — the same
  manifest/vacuum lifecycle the dedup index got in round 11.
- **Bounded occupancy**: with centroids frozen forever, probed candidate
  volume grows linearly with the corpus (measured 9.8× at 10× in the
  round-11 ladder) and the probe asymptotically degenerates toward a scan.
  ``maintain_ann_index`` SPLITS any cell whose occupancy exceeds a cap:
  a deterministic 2-means runs INSIDE each over-cap cell (executor-side
  ``applyInPandas``, one bounded pandas group per cell — no global retrain,
  no re-assignment of any other cell), the parent centroid is retired and
  two children take its place, and the children's postings land in a new
  segment.  One manifest swap publishes the new centroid set and the child
  postings together, so readers see the split atomically; the parent cell's
  old rows become dead weight no probe can select (its centroid is gone —
  child cids are allocated above every cid ever used, so they can never
  collide with a retired cell's dirs) until compaction drops them.
  Splitting changes only WHICH cells exist — search stays an exact re-rank
  inside the probed cells — so the approximation contract is unchanged in
  kind: probe selection over live centroids, exactness inside probed cells.

Exactness contract: assignment, probe selection, and re-ranking use the
same rounded-cosine (6 dp) + smallest-id tiebreak recipe as s03's oracle,
so the no-split maintained path stays value-hash-checkable against a
stateless SQL formulation (``queries/similarity_q.py:s09`` — splitting is
opt-in maintenance and never runs under the registered query).  Re-ranking
reads the EXACT stored vectors (float32 parquet round-trips bit-exactly),
so incremental maintenance never degrades result quality — the IVF
approximation is only in WHICH cells are probed, identical to s03.

Scale: centroids are catalog-sized by construction (collected under the
same broadcast guard as s03's matrices); batch assignment is one Arrow-batch
BLAS kernel over the batch; search cost is |probed cells| × cell occupancy,
which the occupancy cap bounds ~cap per probed cell; scoring groups each
Arrow chunk by cell and runs ONE matmul per (cell × its probing queries)
with ``np.argpartition`` top-k (round-11 ADVICE: no interpreted per-row
work beyond boundary-tie fixup).  Measured per rung in
``ANN_INDEX_LADDER.json``.  No reference counterpart (similarity is a
driver-mandated extension, SURVEY.md §2).
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

from worker_etl_spark.operators import segstore

#: probed cells per query and result depth — s03's constants, shared so the
#: maintained path and the in-session IVF stay comparable.
PROBES = 2
TOP_K = 5

_CENTROID_SCHEMA = "cid long, embedding array<float>"
#: Lloyd iterations for the in-cell deterministic 2-means — fixed so a split
#: is a pure function of the cell's contents (reproducible across runs).
_SPLIT_ITERS = 5


def _centroid_mats(spark: SparkSession, index_dir: str):
    """Driver-side (cid, matrix, norms) for the live quantizer, sorted by
    cid so first-argmax == smallest-cid tiebreak."""
    pdf = (
        segstore.read(spark, index_dir, "centroids", _CENTROID_SCHEMA)
        .orderBy("cid")
        .toPandas()
    )
    ids = pdf["cid"].to_numpy(dtype=np.int64)
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return ids, mat, np.linalg.norm(mat, axis=1)


def _cell_dirs(
    index_dir: str, cells: list[int] | None = None
) -> list[str]:
    """The ``cell=N`` leaf directories backing the live postings segments,
    optionally restricted to *cells* — pure filesystem metadata."""
    want = None if cells is None else {int(c) for c in cells}
    out = []
    for p in segstore.segment_paths(index_dir, "postings"):
        for entry in os.listdir(p):
            if not entry.startswith("cell="):
                continue
            try:
                c = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if want is None or c in want:
                out.append(os.path.join(p, entry))
    return sorted(out)


def read_postings(
    spark: SparkSession, index_dir: str, cells: list[int] | None = None
) -> DataFrame:
    """Read the live postings segments as (cell long, vec_id long,
    embedding array<float>).  The scan's file index is built from the
    ``cell=N`` LEAF DIRECTORIES themselves — restricted to *cells* when
    given — so pruning holds BY CONSTRUCTION (the unprobed cells' files are
    never in the scan at all; assert via ``df.inputFiles()``), the probed
    files bin-pack into one scan regardless of how many append segments
    accumulated (Spark refuses one multi-root partitioned read, and a
    per-segment union fragments tiny files into per-branch partitions —
    measured ~3× the single-scan wall at the 10-copy rung shape), and the
    explicit schema skips per-segment footer inference.  ``cell`` is
    recovered from the file path — exactly the partition-directory value."""
    dirs = _cell_dirs(index_dir, cells)
    if not dirs:
        return spark.createDataFrame(
            [], "cell long, vec_id long, embedding array<float>"
        )
    return (
        spark.read.schema("vec_id long, embedding array<float>")
        .parquet(*dirs)
        .select(
            F.regexp_extract(F.input_file_name(), "cell=([0-9]+)", 1)
            .cast("long")
            .alias("cell"),
            "vec_id",
            "embedding",
        )
    )


def create_ann_index(
    spark: SparkSession, centroids: DataFrame, index_dir: str
) -> None:
    """Freeze the quantizer: *centroids* needs (vec_id, embedding); rows are
    persisted as the index's centroid table.  Called once — appends never
    touch it; only ``maintain_ann_index`` (occupancy-cap splitting) may
    later replace retired parents with children."""
    from worker_etl_spark.queries.similarity_q import _guard_query_set

    _guard_query_set(centroids, "ANN index centroid set")
    with segstore.writer_lock(index_dir):
        seg = segstore.stage(
            centroids.select(
                F.col("vec_id").cast("long").alias("cid"), "embedding"
            ),
            index_dir,
            "centroids",
        )
        segstore.commit(index_dir, replaces={"centroids": [seg]})


def append_ann_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
) -> bool:
    """Assign one ingest batch to its nearest LIVE centroids (rounded
    cosine, smallest-cid ties — s03's assignment recipe) and append to the
    cell-partitioned postings as one staged segment + one manifest swap.
    O(batch) scan × one BLAS kernel; the index's existing rows are never
    read or rewritten.  A *batch_id* already committed is skipped (returns
    False) — idempotent crash-retry ingest, same as the dedup index."""
    with segstore.writer_lock(index_dir):
        if batch_id is not None and segstore.committed(index_dir, batch_id):
            return False
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
        seg = segstore.stage(assigned, index_dir, "postings", partition_by="cell")
        segstore.commit(index_dir, appends={"postings": [seg]}, batch_id=batch_id)
        return True


def _cell_occupancy(spark: SparkSession, index_dir: str) -> dict[int, int]:
    """Occupancy of each LIVE cell (cells whose centroid exists; retired
    parents' dead rows are excluded by the semi filter on live cids)."""
    live = [
        int(r.cid)
        for r in segstore.read(
            spark, index_dir, "centroids", _CENTROID_SCHEMA
        ).collect()
    ]
    rows = (
        read_postings(spark, index_dir, cells=live)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r.cell): int(r.n) for r in rows}


def _max_cid_ever(index_dir: str, live_cids) -> int:
    """Highest cid ever used — live centroids plus every ``cell=N`` partition
    dir across ALL postings segments (retired parents included), from pure
    filesystem metadata.  Child cids allocate above this, so a child can
    never collide with a retired cell's dead partition dirs."""
    cells = [
        int(os.path.basename(d).split("=", 1)[1]) for d in _cell_dirs(index_dir)
    ]
    return max([int(c) for c in live_cids] + cells, default=-1)


def _split_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic in-cell 2-means over ONE over-cap cell (a bounded
    pandas group: occupancy ≤ cap + most recent appends).  Emits each
    member's child assignment (bit 0/1) plus two centroid rows
    (vec_id = -1, embedding = child mean).  Pure function of the cell's
    contents: seeds are the smallest-vec_id vector and the vector least
    cosine-similar to it (ties → smallest vec_id), ``_SPLIT_ITERS`` Lloyd
    rounds with rounded-cosine assignment (ties → child 0), means computed
    in float64 over vec_id-sorted members; a degenerate split (either side
    empty) falls back to sorted-by-vec_id halves."""
    pdf = pdf.sort_values("vec_id", kind="stable").reset_index(drop=True)
    cell = int(pdf["cell"].iloc[0])
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    xn = np.maximum(np.linalg.norm(x, axis=1), 1e-12)
    n = len(ids)

    def _cos(c, cn):
        return np.round((x @ c) / (xn * max(cn, 1e-12)), 6)

    c0 = x[0]
    # least similar to c0; np.argmin takes the FIRST minimum = smallest id.
    c1 = x[int(np.argmin(_cos(c0, np.linalg.norm(c0))))]
    bits = None
    for _ in range(_SPLIT_ITERS):
        s0 = _cos(c0, np.linalg.norm(c0))
        s1 = _cos(c1, np.linalg.norm(c1))
        bits = (s1 > s0).astype(np.int8)  # tie → child 0
        if bits.min() == bits.max():
            break
        c0 = x[bits == 0].mean(axis=0)
        c1 = x[bits == 1].mean(axis=0)
    if bits is None or bits.min() == bits.max():
        bits = (np.arange(n) >= (n + 1) // 2).astype(np.int8)  # sorted halves
    m0 = x[bits == 0].mean(axis=0).astype(np.float32)
    m1 = x[bits == 1].mean(axis=0).astype(np.float32)
    return pd.DataFrame(
        {
            "cell": np.concatenate([np.full(n, cell, dtype=np.int64), [cell, cell]]),
            "bit": np.concatenate([bits.astype(np.int32), [0, 1]]),
            "vec_id": np.concatenate([ids, [-1, -1]]),
            "embedding": list(pdf["embedding"]) + [list(m0), list(m1)],
            "is_centroid": [False] * n + [True, True],
        }
    )


def maintain_ann_index(
    spark: SparkSession, index_dir: str, occupancy_cap: int, max_rounds: int = 20
) -> dict:
    """Bounded-occupancy maintenance (round-11 verdict #1): split every live
    cell whose occupancy exceeds *occupancy_cap* by an in-cell deterministic
    2-means, repeating until no cell is over the cap (a split halves a cell,
    so rounds ≈ log2(max_occupancy / cap)).  Per round, ONE manifest swap
    atomically retires the parents from the centroid table and appends the
    children's postings segment — readers see the old or the new cell
    structure, never a mix; the parents' old rows are dead (their centroids
    are gone, so no probe selects them) until ``compact_ann_index`` drops
    them.  Work per round is O(over-cap rows) — a pruned scan of the
    offending cells plus one bounded pandas group per cell — never a corpus
    re-assignment.  Returns {rounds, cells_split, centroids_before/after,
    max_occupancy_before/after}."""
    stats = {"rounds": 0, "cells_split": 0}
    with segstore.writer_lock(index_dir):
        occ = _cell_occupancy(spark, index_dir)
        stats["centroids_before"] = len(occ)
        stats["max_occupancy_before"] = max(occ.values(), default=0)
        for _ in range(max_rounds):
            over = sorted(c for c, n in occ.items() if n > occupancy_cap)
            if not over:
                break
            stats["rounds"] += 1
            stats["cells_split"] += len(over)
            cents = segstore.read(spark, index_dir, "centroids", _CENTROID_SCHEMA)
            base = _max_cid_ever(index_dir, [r.cid for r in cents.collect()]) + 1
            # Deterministic child allocation: parents in sorted order get
            # consecutive (base + 2i + bit) ids.
            mapping = spark.createDataFrame(
                [
                    (int(p), bit, int(base + 2 * i + bit))
                    for i, p in enumerate(over)
                    for bit in (0, 1)
                ],
                "cell long, bit int, child long",
            )
            split = (
                read_postings(spark, index_dir, cells=over)
                .groupBy("cell")
                .applyInPandas(
                    _split_kernel,
                    schema=(
                        "cell long, bit int, vec_id long, "
                        "embedding array<float>, is_centroid boolean"
                    ),
                )
                .join(F.broadcast(mapping), ["cell", "bit"])
                .persist()
            )
            try:
                child_posts = split.filter(~F.col("is_centroid")).select(
                    F.col("child").alias("cell"), "vec_id", "embedding"
                )
                child_cents = split.filter(F.col("is_centroid")).select(
                    F.col("child").alias("cid"), "embedding"
                )
                new_cents = cents.filter(
                    ~F.col("cid").isin([int(p) for p in over])
                ).unionByName(child_cents)
                post_seg = segstore.stage(
                    child_posts, index_dir, "postings", partition_by="cell"
                )
                cent_seg = segstore.stage(new_cents, index_dir, "centroids")
                segstore.commit(
                    index_dir,
                    replaces={"centroids": [cent_seg]},
                    appends={"postings": [post_seg]},
                )
            finally:
                split.unpersist()
            occ = _cell_occupancy(spark, index_dir)
        stats["centroids_after"] = len(occ)
        stats["max_occupancy_after"] = max(occ.values(), default=0)
    return stats


def postings_file_count(index_dir: str) -> int:
    """Parquet data files across the live postings segments — the small-file
    metric compaction exists to fold (round-11 verdict #3)."""
    n = 0
    for p in segstore.segment_paths(index_dir, "postings"):
        for _dir, _sub, files in os.walk(p):
            n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """Offline maintenance (round-11 verdict #3: the per-append small-file
    accumulation needed the segstore lifecycle): fold the live postings into
    ONE segment — dropping retired cells' dead rows, clustering by cell so
    each cell's rows land in few files — and fold the centroid table to one
    segment; one manifest swap publishes both, superseded segments stay on
    disk for in-flight readers until ``vacuum_ann_index``.  Returns
    {postings_files_before/after, postings_rows_before/after}."""
    with segstore.writer_lock(index_dir):
        live = [
            int(r.cid)
            for r in segstore.read(
                spark, index_dir, "centroids", _CENTROID_SCHEMA
            ).collect()
        ]
        stats = {
            "postings_files_before": postings_file_count(index_dir),
            "postings_rows_before": read_postings(spark, index_dir).count(),
        }
        folded = read_postings(spark, index_dir, cells=live).repartition("cell")
        post_seg = segstore.stage(folded, index_dir, "postings", partition_by="cell")
        cent_seg = segstore.stage(
            segstore.read(spark, index_dir, "centroids", _CENTROID_SCHEMA),
            index_dir,
            "centroids",
        )
        segstore.commit(
            index_dir,
            replaces={"postings": [post_seg], "centroids": [cent_seg]},
        )
        stats["postings_files_after"] = postings_file_count(index_dir)
        stats["postings_rows_after"] = read_postings(spark, index_dir).count()
        return stats


def vacuum_ann_index(
    index_dir: str, grace_sec: float, no_active_readers: bool = False
) -> int:
    """Reclaim segments superseded by compaction/splits (and crashed
    writers' debris) older than *grace_sec* — segstore's guarded vacuum."""
    with segstore.writer_lock(index_dir):
        return segstore.vacuum(index_dir, grace_sec, no_active_readers)


def search_ann(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    probes: int = PROBES,
    k: int = TOP_K,
) -> DataFrame:
    """Exact re-rank inside each query's *probes* nearest LIVE cells:
    (query_id, cand_id, cosine, rank).  The postings scan is built from the
    probed cells' ``cell=N`` leaf dirs only (``read_postings``), so the read
    is pruned to the probed cells BY CONSTRUCTION — the maintained-index
    counterpart of s03's in-flight probe mask.  Scoring (round-11 ADVICE):
    each Arrow chunk is
    grouped by cell (a chunk is usually one cell's file, so ~one group) and
    scored with ONE matmul against only that cell's probing queries;
    per-query top-k uses ``np.argpartition`` with boundary ties re-ranked
    exactly by (cosine desc, vec_id asc), so executor CPU is vectorized in
    |probing queries| × |cell rows|, never interpreted per row."""
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
    probe_cells: dict[int, list[int]] = {}  # cell id -> query indexes probing it
    for qi in range(len(q_ids)):
        for ci in probed[qi]:
            probe_cells.setdefault(int(c_ids[ci]), []).append(qi)
    pc = {c: np.array(v, dtype=np.int64) for c, v in probe_cells.items()}
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, pc, k))

    def score(it):
        qi_ids, qm, qn, cells_map, kk = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            out_q, out_c, out_s = [], [], []
            grp_order = np.argsort(cells, kind="stable")
            splits = np.flatnonzero(np.diff(cells[grp_order])) + 1
            for grp in np.split(grp_order, splits):
                qi = cells_map.get(int(cells[grp[0]]))
                if qi is None or not len(grp):
                    continue
                sub_ids = x_ids[grp]
                # one matmul per (cell × its probing queries)
                s = np.round(
                    (qm[qi] @ x[grp].T) / np.outer(qn[qi], xn[grp]), 6
                )
                s[qi_ids[qi][:, None] == sub_ids[None, :]] = -np.inf  # self
                n_cols = s.shape[1]
                take = min(kk, n_cols)
                part = (
                    np.argpartition(-s, take - 1, axis=1)[:, :take]
                    if n_cols > take
                    else None
                )
                for r in range(s.shape[0]):
                    if part is not None:
                        thr = s[r, part[r]].min()
                        cand = np.flatnonzero(s[r] >= thr)  # boundary ties in
                    else:
                        cand = np.arange(n_cols)
                    sel = cand[np.lexsort((sub_ids[cand], -s[r, cand]))][:take]
                    sel = sel[np.isfinite(s[r, sel])]
                    if not sel.size:
                        continue
                    out_q.append(np.full(sel.size, qi_ids[qi[r]], dtype=np.int64))
                    out_c.append(sub_ids[sel])
                    out_s.append(s[r, sel])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    postings = read_postings(spark, index_dir, cells=sorted(probe_cells))
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
    return read_postings(spark, index_dir, cells=sorted(cells)).count()


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
