"""Maintained dedup index — the production shape of incremental dedup.

Round-9's pinned-batch ladder (``D16_PINNED_LADDER.json``) measured the
stateless batch-vs-corpus formulation at **12.92× time per 10× corpus**: the
cost was re-deriving the standing corpus's exact-dup hash set and shingle
index (norm_text + md5 + explode over EVERY corpus row) on every daily run.
At 100 TB that is re-hashing the lake per batch.  The fix is the same one
every production dedup service makes: the corpus index is a MAINTAINED
table, appended per ingest batch, and the daily job only (a) appends the
new batch's contribution and (b) probes the index — O(batch) joins plus
cheap columnar scans of the index, never O(corpus) recompute.

Layout (parquet dirs under ``index_dir``) — **append-only** (LSM-style:
every maintenance write is an append; ``compact_index`` folds segments):

- ``exact/``    (hh string)            md5(norm_text) of every corpus doc.
                Consumers only LEFT-SEMI join it, so duplicate rows are
                harmless and appends need no read-modify-write.
- ``df/``       (h long, n long)       ADDITIVE document-frequency segments
                for every corpus shingle; true df = sum(n) per h.
- ``postings/`` (h long, doc_id long)  corpus shingle postings, appended
                only while h is corpus-rare (df ≤ DF_CAP) at append time.
                Once h flips common its rows become dead weight (≤ DF_CAP
                rows per flipped h — bounded) that no consumer touches:
                a rare-probe join can never select a common h.
- ``card/``     (doc_id long, delta long)  ADDITIVE deltas of each corpus
                doc's rare-shingle cardinality: +k when k of its shingles
                are appended rare, −1 per posting when a shingle flips
                common.  True cardinality = sum(delta) per doc.
- ``simhash/``  (doc_id long, simhash long)  60-bit fingerprints (the d04
                formula).  A doc's fingerprint is corpus-independent, so
                this table is PURE append — the trivially incremental case.

Why append-only: per-batch maintenance touches O(batch) rows plus
broadcast-filtered scans of ``df``/``postings`` (columnar, two narrow
columns); there is no staging rewrite of corpus-sized state on the ingest
path.  ``compact_index`` is the offline maintenance write (the w03
compaction story) that folds df/card segments and drops dead postings.

Semantics contract (pinned by ``tests/test_dedup_index.py``): classifying a
batch against the maintained index is row-for-row identical to the
stateless d16 formulation — including the subtle coupling where the BATCH's
own shingle counts can push a corpus-rare shingle over DF_CAP (the
classification applies that correction on the fly without mutating the
index, since a classified batch has not been ingested).

No reference counterpart (dedup is a driver-mandated extension,
SURVEY.md §2); the exact/near semantics match d16's oracle in
``queries/dedup_q.py``.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.functions.text import hex_int, norm_text, tokens
from worker_etl_spark.sources.tables import spread

#: char-gram width for shingles and the d05/d16 document-frequency cap —
#: shared with queries/dedup_q.py (single source of truth lives here so the
#: index and the stateless oracles can never drift).
SHINGLE_W = 5
DF_CAP = 10

#: 60-bit simhash (15 hex digits of md5) — see dedup_q.py's d04 notes.
SIM_BITS = 60

_TABLES = ("exact", "df", "postings", "card", "simhash")


def _path(index_dir: str, table: str) -> str:
    return os.path.join(index_dir, table)


def _read(spark: SparkSession, index_dir: str, table: str, schema: str) -> DataFrame:
    """Read an index table; absent → empty frame with the right schema."""
    p = _path(index_dir, table)
    if os.path.isdir(p):
        return spark.read.parquet(p)
    return spark.createDataFrame([], schema)


def _append(df: DataFrame, index_dir: str, table: str) -> None:
    df.write.mode("append").parquet(_path(index_dir, table))


def _doc_norm(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", norm_text(F.col("text")).alias("norm"))


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, 32-bit char-gram hash) — the d05/_shingles formula
    over an arbitrary doc frame (index maintenance and batch classification
    both shingle only THEIR rows, never the corpus)."""
    n = spread(
        _doc_norm(docs).filter(F.length("norm") >= SHINGLE_W)
    )
    return (
        n.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("norm") - (SHINGLE_W - 1))
            ).alias("i"),
            "norm",
        )
        .select(
            "doc_id", hex_int(F.expr(f"substring(norm, i, {SHINGLE_W})")).alias("h")
        )
        .distinct()
    )


def _doc_simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — the d04 60-bit sign-aggregated token-hash
    fingerprint over an arbitrary doc frame."""
    tok = (
        spread(_doc_norm(docs))
        .select("doc_id", F.explode(tokens(F.col("norm"))).alias("t"))
        .distinct()
        .select("doc_id", hex_int(F.col("t"), 15).alias("h"))
    )
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.expr(f"(h >> {b}) & 1 = 1"), 1).otherwise(-1)).alias(
                f"s{b:02d}"
            )
            for b in range(SIM_BITS)
        ]
    )
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN s{b:02d} >= 0 THEN {1 << b}L ELSE 0L END)"
            for b in range(SIM_BITS)
        )
    )
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


def update_index(spark: SparkSession, docs: DataFrame, index_dir: str) -> None:
    """Ingest one corpus batch into the maintained index (append-only).

    ``docs`` needs columns (doc_id, text); doc_ids must be new to the
    corpus (the ingest contract — a doc is ingested once).  Work is
    O(batch) shingling + appends, plus two broadcast-key-filtered columnar
    scans (df lookup for the batch's shingles; postings lookup for shingles
    this batch flips common).  Nothing corpus-sized is rewritten.
    """
    os.makedirs(index_dir, exist_ok=True)
    batch = docs.select("doc_id", "text").persist()
    try:
        # 1. exact-hash set: append md5(norm) for every batch doc.
        _append(
            _doc_norm(batch).select(F.md5("norm").alias("hh")), index_dir, "exact"
        )
        # 2. simhash fingerprints: pure append.
        _append(_doc_simhash(batch), index_dir, "simhash")

        # 3. shingle df / postings / card maintenance.
        sb = _doc_shingles(batch).persist()
        dfb = sb.groupBy("h").agg(F.count(F.lit(1)).alias("n_new")).persist()
        df_idx = _read(spark, index_dir, "df", "h long, n long")
        before = (
            df_idx.join(dfb.select("h"), "h", "left_semi")
            .groupBy("h")
            .agg(F.sum("n").alias("n_before"))
        )
        tot = (
            dfb.join(before, "h", "left")
            .select(
                "h",
                "n_new",
                F.coalesce("n_before", F.lit(0)).alias("n_before"),
                (F.coalesce("n_before", F.lit(0)) + F.col("n_new")).alias("n_after"),
            )
            .persist()
        )
        flipped = tot.filter(
            (F.col("n_before") > 0)
            & (F.col("n_before") <= DF_CAP)
            & (F.col("n_after") > DF_CAP)
        ).select("h")
        # 3a. card decrements for docs holding postings of now-common
        #     shingles — MUST read postings before this batch's appends.
        postings = _read(spark, index_dir, "postings", "h long, doc_id long")
        dec = (
            postings.join(flipped, "h", "left_semi")
            .groupBy("doc_id")
            .agg((-F.count(F.lit(1))).alias("delta"))
        )
        _append(dec, index_dir, "card")
        # 3b. postings + card increments for shingles rare AFTER this batch.
        rare_after = tot.filter(F.col("n_after") <= DF_CAP).select("h")
        new_postings = sb.join(rare_after, "h").select("h", "doc_id")
        _append(new_postings, index_dir, "postings")
        _append(
            new_postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("delta")),
            index_dir,
            "card",
        )
        # 3c. df segment: the batch's additive contribution.
        _append(dfb.select("h", F.col("n_new").alias("n")), index_dir, "df")
        tot.unpersist()
        dfb.unpersist()
        sb.unpersist()
    finally:
        batch.unpersist()


def compact_index(spark: SparkSession, index_dir: str) -> None:
    """Offline maintenance: fold df/card segments, drop dead postings and
    duplicate exact hashes.  Staging-rename per table (the upsert_table
    crash-safety pattern, sinks/writer.py:120) so a failed compaction never
    leaves a half-written index."""
    folded = {
        "exact": _read(spark, index_dir, "exact", "hh string").distinct(),
        "df": _read(spark, index_dir, "df", "h long, n long")
        .groupBy("h")
        .agg(F.sum("n").alias("n")),
        "card": _read(spark, index_dir, "card", "doc_id long, delta long")
        .groupBy("doc_id")
        .agg(F.sum("delta").alias("delta"))
        .filter(F.col("delta") != 0),
        "simhash": _read(spark, index_dir, "simhash", "doc_id long, simhash long"),
    }
    df_now = folded["df"]
    rare_now = df_now.filter(F.col("n") <= DF_CAP).select("h")
    folded["postings"] = _read(
        spark, index_dir, "postings", "h long, doc_id long"
    ).join(rare_now, "h", "left_semi")
    # Two phases: write EVERY staging dir while the live tables are intact
    # (the folded plans read across tables — postings' liveness filter scans
    # df — so no live dir may be swapped until all reads are done), then
    # swap.  Each swap is still the crash-safe rename pair.
    staged: list[str] = []
    for table, frame in folded.items():
        live = _path(index_dir, table)
        if not os.path.isdir(live):
            continue
        frame.write.mode("overwrite").parquet(live + ".__staging__")
        staged.append(live)
    for live in staged:
        old = live + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        os.rename(live + ".__staging__", live)
        shutil.rmtree(old, ignore_errors=True)


def classify_batch(
    spark: SparkSession, batch: DataFrame, index_dir: str
) -> DataFrame:
    """Classify a NEW batch against the maintained corpus index without
    touching corpus text: (doc_id, n_chars, status) with status in
    exact_dup / near_dup / unique — row-identical to the stateless d16
    semantics (near = rare-shingle blocked Jaccard ≥ 0.5 vs corpus docs,
    rarity judged on corpus+batch df exactly as d16's oracle does).

    Scale shape: every join keys on the BATCH side (md5 probe, shingle-df
    lookup, rare-posting probe, per-candidate card lookup); index reads are
    two-column parquet scans filtered by batch-key semi-joins.  The batch's
    own df contribution is applied as an on-the-fly correction (rsb filter +
    per-candidate card adjustment) because classification must not mutate
    the index."""
    from worker_etl_spark.queries import bounded_persist

    b = bounded_persist(
        batch.select("doc_id", "n_chars", "text"), "one ingest batch"
    )
    try:
        bnorm = b.select("doc_id", "n_chars", norm_text(F.col("text")).alias("norm"))
        exact_hits = (
            bnorm.select("doc_id", F.md5("norm").alias("hh"))
            .join(_read(spark, index_dir, "exact", "hh string"), "hh", "left_semi")
            .select("doc_id")
        )

        sb = bounded_persist(_doc_shingles(b), "batch shingles (O(batch))")
        dfb = sb.groupBy("h").agg(F.count(F.lit(1)).alias("n_new"))
        df_idx = _read(spark, index_dir, "df", "h long, n long")
        before = (
            df_idx.join(dfb.select("h"), "h", "left_semi")
            .groupBy("h")
            .agg(F.sum("n").alias("n_before"))
        )
        tot = bounded_persist(
            dfb.join(before, "h", "left").select(
                "h",
                F.coalesce("n_before", F.lit(0)).alias("n_before"),
                (F.coalesce("n_before", F.lit(0)) + F.col("n_new")).alias("n_after"),
            ),
            "batch-distinct shingle df totals (O(batch))",
        )
        # Rare under corpus+batch df: the batch's rare-shingle rows + card.
        rsb = sb.join(tot.filter(F.col("n_after") <= DF_CAP).select("h"), "h")
        na = rsb.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))
        # Shingles this batch WOULD flip common (corpus-rare, total-common):
        # corpus postings/card still count them, so candidates' cardinality
        # gets a per-doc decrement below.
        flipped = tot.filter(
            (F.col("n_before") > 0)
            & (F.col("n_before") <= DF_CAP)
            & (F.col("n_after") > DF_CAP)
        ).select("h")
        postings = _read(spark, index_dir, "postings", "h long, doc_id long")
        inter = (
            rsb.alias("a")
            .join(postings.alias("p"), "h")
            .groupBy(
                F.col("a.doc_id").alias("new_id"), F.col("p.doc_id").alias("corp_id")
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )
        card = (
            _read(spark, index_dir, "card", "doc_id long, delta long")
            .groupBy("doc_id")
            .agg(F.sum("delta").alias("card"))
        )
        corr = (
            postings.join(flipped, "h", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("flip_cnt"))
        )
        nb = (
            card.join(corr, "doc_id", "left")
            .select(
                F.col("doc_id").alias("corp_id"),
                (F.col("card") - F.coalesce("flip_cnt", F.lit(0))).alias("nb"),
            )
        )
        near_hits = (
            inter.join(na.select(F.col("doc_id").alias("new_id"), "na"), "new_id")
            .join(nb, "corp_id")
            .filter(F.col("c") * 2 >= F.col("na") + F.col("nb") - F.col("c"))
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        return (
            b.select("doc_id", "n_chars")
            .join(exact_hits.withColumn("is_exact", F.lit(True)), "doc_id", "left")
            .join(near_hits.withColumn("is_near", F.lit(True)), "doc_id", "left")
            .select(
                "doc_id",
                "n_chars",
                F.when(F.col("is_exact"), "exact_dup")
                .when(F.col("is_near"), "near_dup")
                .otherwise("unique")
                .alias("status"),
            )
        )
    finally:
        # b/sb/tot are tracked by bounded_persist — the harness releases
        # them after the returned frame materializes.
        pass


def simhash_near_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Batch docs' near-duplicate matches against the maintained simhash
    index: (doc_id, n_near, min_hamming) for batch docs with ≥1 corpus
    fingerprint within ``max_hamming`` — the d10 band-blocked program with
    one side pinned to the batch.

    Scale shape: both sides collapse to DISTINCT fingerprints before the
    band join (the Manku fingerprint-store move); the join is key-equi on
    (kid, val) with the batch side small; matches aggregate at the
    FINGERPRINT grain (n_near sums per-fingerprint corpus doc counts) and
    only then expand to batch doc_ids — output-sized, never doc-pair-sized.
    """
    from worker_etl_spark.queries import bounded_persist
    from worker_etl_spark.queries.dedup_q import _ham_band_plan

    idx = _read(spark, index_dir, "simhash", "doc_id long, simhash long")
    idx_fp = bounded_persist(
        idx.groupBy("simhash").agg(F.count(F.lit(1)).alias("n_docs")),
        "distinct corpus fingerprints (≤ |docs|)",
    )
    n_fp = idx_fp.count()
    bsim = bounded_persist(_doc_simhash(batch), "batch fingerprints (O(batch))")
    bfp = bsim.select("simhash").distinct()

    n_bands, band_bits, subsets = _ham_band_plan(max(n_fp, 1))
    band_mask = (1 << band_bits) - 1
    key_masks = [sum(band_mask << (b * band_bits) for b in sub) for sub in subsets]
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
                )
                .cast("long")
                .alias("val"),
            )
            for kid, sub in enumerate(subsets)
        ]
    )
    a = (
        bfp.select("simhash", F.explode(keys).alias("k"))
        .select(F.col("simhash").alias("fp_b"), "k.kid", "k.val")
    )
    bnd = (
        idx_fp.select("simhash", F.explode(keys).alias("k"))
        .select(F.col("simhash").alias("fp_c"), "k.kid", "k.val")
    )
    first_kid = (
        "CASE "
        + " ".join(
            f"WHEN ((fp_b ^ fp_c) & {m}) = 0 THEN {k}"
            for k, m in enumerate(key_masks)
        )
        + " END"
    )
    fp_hits = (
        a.join(bnd, ["kid", "val"])
        .filter(F.expr(f"bit_count(fp_b ^ fp_c) <= {max_hamming}"))
        .filter(F.expr(f"kid = ({first_kid})"))
        .join(idx_fp.select(F.col("simhash").alias("fp_c"), "n_docs"), "fp_c")
        .groupBy("fp_b")
        .agg(
            F.sum("n_docs").alias("n_near"),
            F.min(F.expr("bit_count(fp_b ^ fp_c)")).cast("long").alias("min_hamming"),
        )
    )
    return (
        bsim.join(fp_hits, bsim["simhash"] == fp_hits["fp_b"])
        .select("doc_id", "n_near", "min_hamming")
    )


# --- fingerprint-cached index for the registered queries ---------------------
_INDEX_ROOT: str | None = None
_INDEX_CACHE: dict[str, str] = {}


def _corpus_fingerprint(sf_dir: str) -> str:
    """Cheap staleness key for sf_dir's documents table: sorted
    (name, size, mtime_ns) of its parquet files — O(|files|), no data read."""
    root = os.path.join(os.path.realpath(sf_dir), "documents.parquet")
    entries = []
    if os.path.isdir(root):
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                st = os.stat(os.path.join(dirpath, f))
                rel = os.path.relpath(os.path.join(dirpath, f), root)
                entries.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(root):
        st = os.stat(root)
        entries.append(f".:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(("|".join([root] + entries)).encode()).hexdigest()


def _index_root() -> str:
    global _INDEX_ROOT
    if _INDEX_ROOT is None:
        _INDEX_ROOT = tempfile.mkdtemp(prefix="dedup_index_")
        atexit.register(shutil.rmtree, _INDEX_ROOT, ignore_errors=True)
    return _INDEX_ROOT


def register_index(sf_dir: str, index_dir: str) -> None:
    """Seed the cache with a prebuilt index for sf_dir's corpus (the ladder
    builds incrementally, untimed, then times classification alone)."""
    _INDEX_CACHE[_corpus_fingerprint(sf_dir)] = index_dir


def ensure_index(spark: SparkSession, sf_dir: str, corpus: DataFrame) -> str:
    """Return the maintained-index dir for sf_dir's corpus, building it via
    ``update_index`` on first sight (or when the table's files changed)."""
    fp = _corpus_fingerprint(sf_dir)
    cached = _INDEX_CACHE.get(fp)
    if cached is not None and os.path.isdir(cached):
        return cached
    index_dir = os.path.join(_index_root(), fp)
    shutil.rmtree(index_dir, ignore_errors=True)
    update_index(spark, corpus, index_dir)
    _INDEX_CACHE[fp] = index_dir
    return index_dir
