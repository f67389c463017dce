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

Storage (``index_dir`` is one ``segstore`` store — append-only LSM segments
per table, all named by ONE atomically-swapped store-level MANIFEST, so a
multi-table ingest batch commits as a unit and redelivered batch ids are
skipped; crash-safe, idempotent under retry, and concurrent-reader-safe by
construction; see ``operators/segstore.py``):

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
                formula) at the DOC grain.  Corpus-independent, pure append.
- ``fp/``       (simhash long, n long)  ADDITIVE per-fingerprint doc counts
                (the Manku WWW'07 fingerprint store's occupancy); true
                count = sum(n) per simhash.
- ``band/``     (key long, simhash long)  the PRECOMPUTED band keys of
                every DISTINCT corpus fingerprint under the fixed
                ``_BAND_SUBSETS`` plan, fused into one long per row
                (``key = kid·2^30 + 30-bit subset value``) — appended only
                for fingerprints new to the index, so rows are unique per
                (key's kid, simhash).  This is what lets
                ``simhash_near_batch`` probe without re-aggregating or
                re-exploding the corpus per run (round-10's measured
                2.66×-per-10× d18 slope was exactly that per-classify
                ``groupBy(simhash)`` + ×-keys explode); the fused key keeps
                the scan two narrow long columns and the hash probe
                single-key.

Why append-only: per-batch maintenance touches O(batch) rows plus
broadcast-filtered scans of the narrow index tables; there is no staging
rewrite of corpus-sized state on the ingest path.  ``compact_index`` is the
offline maintenance write (the w03 compaction story) that folds additive
segments and drops dead postings; superseded segments stay on disk for
in-flight readers until ``vacuum_index``.  Writers (ingest, compaction)
serialize through ``segstore.writer_lock``; readers never lock.

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
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.functions.text import hex_int, norm_text, tokens
from worker_etl_spark.operators import segstore
from worker_etl_spark.sources.tables import spread

#: char-gram width for shingles and the d05/d16 document-frequency cap —
#: shared with queries/dedup_q.py (single source of truth lives here so the
#: index and the stateless oracles can never drift).
SHINGLE_W = 5
DF_CAP = 10

#: 60-bit simhash (15 hex digits of md5) — see dedup_q.py's d04 notes.
SIM_BITS = 60

#: Fixed band plan for the MAINTAINED fingerprint index: 6 bands of 10 bits,
#: one key per 3-band subset (C(6,3) = 20 keys of 30 bits).  By pigeonhole a
#: pair within hamming ≤ 3 differs in at most 3 bands, so at least one
#: 3-band subset is untouched and the blocked join is EXACT for the
#: threshold.  The plan is fixed at the widest split (unlike d10's
#: in-session corpus-adaptive ``_ham_band_plan``) because the band table is
#: PERSISTED — a plan that widened with corpus growth would force an index
#: migration — and 30-bit keys keep random bucket collisions ~linear out to
#: ~4×10^9 distinct fingerprints, the 60-bit fingerprint's own documented
#: ceiling.  Storage trade: 20 narrow rows per distinct fingerprint.
HAM_MAX = 3
_N_BANDS = 6
_BAND_BITS = SIM_BITS // _N_BANDS
_BAND_MASK = (1 << _BAND_BITS) - 1
_BAND_SUBSETS: list[tuple[int, ...]] = list(
    itertools.combinations(range(_N_BANDS), _N_BANDS - HAM_MAX)
)
#: per-key mask over the ORIGINAL fingerprint bits a key covers — two
#: fingerprints agree on key kid iff (a ^ b) & _KEY_MASKS[kid] == 0.
_KEY_MASKS: list[int] = [
    sum(_BAND_MASK << (b * _BAND_BITS) for b in sub) for sub in _BAND_SUBSETS
]

_TABLES = ("exact", "df", "postings", "card", "simhash", "fp", "band")
_SCHEMAS = {
    "exact": "hh string",
    "df": "h long, n long",
    "postings": "h long, doc_id long",
    "card": "doc_id long, delta long",
    "simhash": "doc_id long, simhash long",
    "fp": "simhash long, n long",
    "band": "key long, simhash long",
}


def _read(spark: SparkSession, index_dir: str, table: str, schema: str) -> DataFrame:
    """Read an index table's live segments; never-created → empty frame."""
    return segstore.read(spark, index_dir, table, schema)


def _band_keys(fp_col: str = "simhash") -> F.Column:
    """Array of fused band keys (``kid·2^30 + 30-bit subset value``) for a
    fingerprint column under the fixed maintained-index band plan — one
    long per key so the stored table stays two narrow columns and the
    band join probes a single-long hash key."""
    kid_shift = (_N_BANDS - HAM_MAX) * _BAND_BITS  # 30: subset values < 2^30
    return F.array(
        *[
            F.expr(
                f"{kid << kid_shift}L + "
                + " + ".join(
                    f"((({fp_col} >> {b * _BAND_BITS}) & {_BAND_MASK})"
                    f" << {pos * _BAND_BITS})"
                    for pos, b in enumerate(sub)
                )
            ).cast("long")
            for kid, sub in enumerate(_BAND_SUBSETS)
        ]
    )


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


def update_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
) -> bool:
    """Ingest one corpus batch into the maintained index (append-only).

    ``docs`` needs columns (doc_id, text); doc_ids must be new to the
    corpus (the ingest contract — a doc is ingested once).  Work is
    O(batch) shingling + appends, plus broadcast-key-filtered columnar
    scans of the narrow index tables (df lookup for the batch's shingles;
    postings lookup for shingles this batch flips common; fp lookup for
    which batch fingerprints are new).  Nothing corpus-sized is rewritten.

    The whole multi-table write is ONE atomic commit (round-12, ADVICE
    medium): every table's segment is STAGED first — unreferenced, invisible
    to readers — and a single store-manifest swap publishes all of them (and
    the optional *batch_id*) together.  A crash mid-batch therefore leaves
    NO partial cross-table state, only unreferenced debris for ``vacuum``;
    and a redelivered batch carrying an already-committed *batch_id* is
    skipped (returns False), so crash-retry ingest is idempotent — the
    "each hit pair appears once" assumption behind ``simhash_near_batch``'s
    n_near sum survives redelivery.  Every staged frame reads the SAME
    pre-batch manifest (nothing commits until the end), so the ordering
    constraint "card decrements read postings before this batch's appends"
    holds by construction.

    Holds the store's writer lock for the whole stage+commit so concurrent
    ingests/compactions serialize; lock-free readers see the whole batch or
    none of it.  Returns True when the batch committed, False when skipped.
    """
    with segstore.writer_lock(index_dir):
        if batch_id is not None and segstore.committed(index_dir, batch_id):
            return False
        staged: dict[str, list[str]] = {}

        def _stage(df: DataFrame, table: str) -> None:
            staged.setdefault(table, []).append(
                segstore.stage(df, index_dir, table)
            )

        batch = docs.select("doc_id", "text").persist()
        try:
            # 1. exact-hash set: md5(norm) for every batch doc.
            _stage(
                _doc_norm(batch).select(F.md5("norm").alias("hh")), "exact"
            )
            # 2. simhash fingerprints: doc-grain pure append, plus the
            #    fingerprint-grain additive counts and band keys for
            #    fingerprints NEW to the index (what simhash_near_batch
            #    probes instead of re-aggregating the corpus per run).
            bsim = _doc_simhash(batch).persist()
            _stage(bsim, "simhash")
            fpb = bsim.groupBy("simhash").agg(F.count(F.lit(1)).alias("n")).persist()
            known = (
                _read(spark, index_dir, "fp", _SCHEMAS["fp"])
                .join(F.broadcast(fpb.select("simhash")), "simhash", "left_semi")
                .select("simhash")
                .distinct()
            )
            new_fps = fpb.select("simhash").join(known, "simhash", "left_anti")
            _stage(
                new_fps.select(F.explode(_band_keys()).alias("key"), "simhash"),
                "band",
            )
            _stage(fpb, "fp")
            fpb.unpersist()
            bsim.unpersist()

            # 3. shingle df / postings / card maintenance.
            sb = _doc_shingles(batch).persist()
            dfb = sb.groupBy("h").agg(F.count(F.lit(1)).alias("n_new")).persist()
            df_idx = _read(spark, index_dir, "df", _SCHEMAS["df"])
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
                    (F.coalesce("n_before", F.lit(0)) + F.col("n_new")).alias(
                        "n_after"
                    ),
                )
                .persist()
            )
            flipped = tot.filter(
                (F.col("n_before") > 0)
                & (F.col("n_before") <= DF_CAP)
                & (F.col("n_after") > DF_CAP)
            ).select("h")
            # 3a. card decrements for docs holding postings of now-common
            #     shingles — reads the PRE-BATCH postings (nothing committed
            #     yet, so the staged postings below are invisible here).
            postings = _read(spark, index_dir, "postings", _SCHEMAS["postings"])
            dec = (
                postings.join(flipped, "h", "left_semi")
                .groupBy("doc_id")
                .agg((-F.count(F.lit(1))).alias("delta"))
            )
            _stage(dec, "card")
            # 3b. postings + card increments for shingles rare AFTER this batch.
            rare_after = tot.filter(F.col("n_after") <= DF_CAP).select("h")
            new_postings = sb.join(rare_after, "h").select("h", "doc_id")
            _stage(new_postings, "postings")
            _stage(
                new_postings.groupBy("doc_id").agg(
                    F.count(F.lit(1)).alias("delta")
                ),
                "card",
            )
            # 3c. df segment: the batch's additive contribution.
            _stage(dfb.select("h", F.col("n_new").alias("n")), "df")
            tot.unpersist()
            dfb.unpersist()
            sb.unpersist()
            # One manifest swap publishes every staged segment + batch_id.
            segstore.commit(index_dir, appends=staged, batch_id=batch_id)
            return True
        finally:
            batch.unpersist()


def compact_index(spark: SparkSession, index_dir: str) -> None:
    """Offline maintenance: fold additive segments (df/card/fp), drop dead
    postings and duplicate exact hashes, re-derive the band table from the
    folded fingerprint set.  Every table's fold is STAGED first and ONE
    store-manifest swap publishes all of them (round-12: the whole
    compaction is atomic across tables, not just per table), so a crash
    leaves only unreferenced segment dirs and a concurrent reader holding
    the old manifest keeps reading the superseded — logically identical —
    segments until ``vacuum_index`` reclaims them.  Serializes with ingests
    via the writer lock."""
    with segstore.writer_lock(index_dir):
        fp_now = (
            _read(spark, index_dir, "fp", _SCHEMAS["fp"])
            .groupBy("simhash")
            .agg(F.sum("n").alias("n"))
        )
        folded = {
            "exact": _read(spark, index_dir, "exact", _SCHEMAS["exact"]).distinct(),
            "df": _read(spark, index_dir, "df", _SCHEMAS["df"])
            .groupBy("h")
            .agg(F.sum("n").alias("n")),
            "card": _read(spark, index_dir, "card", _SCHEMAS["card"])
            .groupBy("doc_id")
            .agg(F.sum("delta").alias("delta"))
            .filter(F.col("delta") != 0),
            "simhash": _read(spark, index_dir, "simhash", _SCHEMAS["simhash"]),
            "fp": fp_now,
            # re-derived from the folded fingerprint set: guarantees the
            # one-row-per-(kid, fingerprint) invariant by construction.
            "band": fp_now.select(
                F.explode(_band_keys()).alias("key"), "simhash"
            ),
        }
        df_now = folded["df"]
        rare_now = df_now.filter(F.col("n") <= DF_CAP).select("h")
        folded["postings"] = _read(
            spark, index_dir, "postings", _SCHEMAS["postings"]
        ).join(rare_now, "h", "left_semi")
        replaces = {
            table: [segstore.stage(frame, index_dir, table)]
            for table, frame in folded.items()
            if segstore.segments(index_dir, table)
        }
        if replaces:
            segstore.commit(index_dir, replaces=replaces)


def vacuum_index(
    index_dir: str, grace_sec: float, no_active_readers: bool = False
) -> int:
    """Reclaim segments superseded by compaction (and crashed writers'
    debris) older than *grace_sec* — run after the longest reader plan
    lifetime has elapsed.  A non-positive grace requires asserting reader
    quiescence via ``no_active_readers`` (segstore.vacuum's guard).
    Returns reclaimed dir count."""
    with segstore.writer_lock(index_dir):
        return segstore.vacuum(index_dir, grace_sec, no_active_readers)


def index_row_counts(spark: SparkSession, index_dir: str) -> dict[str, int]:
    """Physical row count per table (live segments) — the ladder artifact
    uses before/after-compaction counts to report dead rows reclaimed."""
    return {
        t: _read(spark, index_dir, t, _SCHEMAS[t]).count()
        for t in _TABLES
        if segstore.segments(index_dir, t)
    }


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
            .join(_read(spark, index_dir, "exact", _SCHEMAS["exact"]), "hh", "left_semi")
            .select("doc_id")
        )

        sb = bounded_persist(_doc_shingles(b), "batch shingles (O(batch))")
        dfb = sb.groupBy("h").agg(F.count(F.lit(1)).alias("n_new"))
        df_idx = _read(spark, index_dir, "df", _SCHEMAS["df"])
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
        postings = _read(spark, index_dir, "postings", _SCHEMAS["postings"])
        inter = (
            rsb.alias("a")
            .join(postings.alias("p"), "h")
            .groupBy(
                F.col("a.doc_id").alias("new_id"), F.col("p.doc_id").alias("corp_id")
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )
        card = (
            _read(spark, index_dir, "card", _SCHEMAS["card"])
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


def _band_candidates(
    spark: SparkSession, batch: DataFrame, index_dir: str, max_hamming: int
):
    """Shared candidate pipeline for ``simhash_near_batch`` and the ladder's
    instrumentation: returns (bsim, fp_pairs) where fp_pairs is one row per
    DISTINCT (batch fingerprint, corpus fingerprint) band-agreeing pair with
    its hamming distance — the pre-threshold candidate stream.

    ``max_hamming`` must equal HAM_MAX: the persisted (B−3)-subset band plan
    is exact-by-pigeonhole for hamming ≤ 3 only; a larger radius would
    silently under-recall, so it fails loudly instead (a wider radius needs
    a C(B, B−h)-subset plan — a different, bigger index)."""
    from worker_etl_spark.queries import bounded_persist

    if max_hamming != HAM_MAX:
        raise ValueError(
            f"maintained band plan is exact for hamming <= {HAM_MAX} only "
            f"(got max_hamming={max_hamming}); widening the radius requires "
            "rebuilding the band table under a C(B, B-h)-subset plan"
        )
    bsim = bounded_persist(_doc_simhash(batch), "batch fingerprints (O(batch))")
    bkeys = (
        bsim.select("simhash")
        .distinct()
        .select(F.col("simhash").alias("fp_b"), F.explode(_band_keys()).alias("key"))
    )
    band = _read(spark, index_dir, "band", _SCHEMAS["band"]).select(
        "key", F.col("simhash").alias("fp_c")
    )
    kid_shift = (_N_BANDS - HAM_MAX) * _BAND_BITS
    first_kid = (
        "CASE "
        + " ".join(
            f"WHEN ((fp_b ^ fp_c) & {m}) = 0 THEN {k}"
            for k, m in enumerate(_KEY_MASKS)
        )
        + " END"
    )
    fp_pairs = (
        band.join(F.broadcast(bkeys), "key")
        .filter(F.expr(f"(key >> {kid_shift}) = ({first_kid})"))
        .select(
            "fp_b", "fp_c", F.expr("bit_count(fp_b ^ fp_c)").alias("hamming")
        )
    )
    return bsim, fp_pairs


def simhash_near_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    max_hamming: int = HAM_MAX,
) -> DataFrame:
    """Batch docs' near-duplicate matches against the maintained simhash
    index: (doc_id, n_near, min_hamming) for batch docs with ≥1 corpus
    fingerprint within ``max_hamming`` (= HAM_MAX, enforced — the persisted
    band plan's pigeonhole guarantee).

    Scale shape (the round-11 flattening of d18's measured 2.66×-per-10×
    slope): the index side is ENTIRELY precomputed at ingest — the ``band``
    table already holds one (kid, val) row per band key per distinct corpus
    fingerprint and the ``fp`` table its doc counts — so a classification
    run aggregates and explodes NOTHING corpus-sized.  The batch's ~20
    band-key rows per distinct fingerprint broadcast into a map-side hash
    join against one narrow 3-column scan of ``band`` (no corpus shuffle,
    no corpus count() action); matches aggregate at the FINGERPRINT grain
    (n_near sums per-fingerprint corpus doc counts from ``fp``, again
    broadcast-semi-filtered) and only then expand to batch doc_ids —
    output-sized, never doc-pair-sized.
    """
    bsim, fp_pairs = _band_candidates(spark, batch, index_dir, max_hamming)
    hits = fp_pairs.filter(F.col("hamming") <= max_hamming)
    # n_near needs the matched corpus fingerprints' doc counts.  The hit set
    # is output-sized (measured flat on the ladder), so BROADCAST it against
    # the additive fp table — a map-side probe of a 2-long-column scan —
    # instead of folding the whole corpus-sized fp table through a shuffle
    # per classification (each hit pair appears once, so summing a
    # fingerprint's additive segments across the joined rows is its true
    # doc count).
    fp_tbl = _read(spark, index_dir, "fp", _SCHEMAS["fp"]).select(
        F.col("simhash").alias("fp_c"), "n"
    )
    fp_hits = (
        fp_tbl.join(F.broadcast(hits), "fp_c")
        .groupBy("fp_b")
        .agg(
            F.sum("n").alias("n_near"),
            F.min("hamming").cast("long").alias("min_hamming"),
        )
    )
    return (
        bsim.join(fp_hits, bsim["simhash"] == fp_hits["fp_b"])
        .select("doc_id", "n_near", "min_hamming")
    )


def simhash_probe_stats(
    spark: SparkSession, batch: DataFrame, index_dir: str
) -> dict[str, int]:
    """Measured candidate-volume instrumentation for the ladder artifact
    (round-10 verdict #1: "volume-bound" must be a recorded number, not an
    argument): distinct fingerprints on each side, band-agreeing candidate
    pairs entering the hamming check, and pairs surviving it."""
    from worker_etl_spark.queries import release_persists

    _bsim, fp_pairs = _band_candidates(spark, batch, index_dir, HAM_MAX)
    agg = fp_pairs.agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum((F.col("hamming") <= HAM_MAX).cast("long")).alias("surv"),
    ).collect()[0]
    n_corpus_fp = (
        _read(spark, index_dir, "fp", _SCHEMAS["fp"])
        .select("simhash")
        .distinct()
        .count()
    )
    n_batch_fp = _bsim.select("simhash").distinct().count()
    release_persists()
    return {
        "corpus_distinct_fps": n_corpus_fp,
        "batch_distinct_fps": n_batch_fp,
        "band_candidate_fp_pairs": int(agg["cand"] or 0),
        "hamming_survivor_fp_pairs": int(agg["surv"] or 0),
    }


# --- fingerprint-cached index for the registered queries ---------------------
_INDEX_ROOT: str | None = None
_INDEX_CACHE: dict[str, str] = {}


def _corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap staleness key for an sf_dir table: sorted
    (name, size, mtime_ns) of its parquet files — O(|files|), no data read."""
    root = os.path.join(os.path.realpath(sf_dir), f"{table}.parquet")
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
