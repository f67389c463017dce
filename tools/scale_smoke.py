"""Scale smoke: run representative queries at ~10x the bench scale factor.

Synthesizes an sf~1 dataset by unioning the sf0.1 tables 10 times with
key offsets (so keys stay unique and join fan-outs stay realistic), writes
it to a temp dir, then wall-clocks a representative query slice. The point
is not a benchmark number — it is evidence that every plan shape survives a
10x scale-up with sub-linear-or-linear cost (no hidden quadratic, no
driver-side materialization, no state blow-up).

Usage: python tools/scale_smoke.py [copies] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from worker_etl_spark.queries import load_all  # noqa: E402
from worker_etl_spark.session import get_spark  # noqa: E402
from worker_etl_spark.sources.tables import read_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# (table, [key columns to offset]) — offsets keep keys globally unique so
# joins keep their real selectivity instead of becoming 10x-fan-out storms.
TABLES = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimension tables stay 1x — scaling facts against fixed dims is the
    # realistic shape (and keeps broadcast joins broadcast-able).
    "region": [],
    "nation": [],
    "supplier": [],
    "part": ["p_partkey"],
}

OFFSET = 100_000_000


def _replicate(src, keys: list[str], copies: int, mutate_text: bool):
    """Union *copies* key-offset replicas.  ``mutate_text`` pushes each copy
    of ``documents.text`` through its own seeded letter-permutation
    (``F.translate``, JVM-side): every shingle maps bijectively, so each
    copy's INTERNAL near-dup structure — and every shingle's per-copy
    document frequency — is preserved exactly, while copies share no
    shingles at all.  That makes both the near-dup rate AND the
    DF-distribution scale the way a real corpus does.  (Verbatim
    replication instead multiplies every shingle's DF by the copy count:
    the rare-shingle blocking cap then drops every genuinely shared
    shingle — zero candidate pairs — while simhash sees ``copies-1`` exact
    twins per doc, hamming-0 pairs growing quadratically.  Both artifacts
    of the synthetic build, not the plans.)"""
    import random
    import string

    parts = []
    for i in range(copies):
        part = src
        for k in keys:
            part = part.withColumn(k, F.col(k) + F.lit(i * OFFSET))
        if mutate_text and i > 0:  # copy 0 stays the base corpus
            perm = list(string.ascii_lowercase)
            random.Random(20260813 + i).shuffle(perm)
            dst = "".join(perm)
            part = part.withColumn(
                "text",
                F.translate(
                    F.col("text"),
                    string.ascii_lowercase + string.ascii_uppercase,
                    dst + dst.upper(),
                ),
            )
        parts.append(part)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


SMOKE_QUERIES = [
    "q01_pricing_summary",   # full-fact scan + agg
    "q02_forecast_revenue",  # pushdown + scalar agg
    "q05_region_revenue",    # star broadcast join
    "q28_hash_sample",       # hash-predicate sampling
    "i01_infer_types",       # Arrow counter kernel
    "d02_minhash_signatures",  # shingle explode + map-side combine
    "d03_lsh_buckets",       # banding + bucket join
    "s01_topk_bruteforce",   # broadcast BLAS kernel
    "s03_topk_ivf",          # IVF probe path
    "t04_fingerprint",       # rolling-hash fingerprint
    "t07_bigram_stats",      # array transform + explode
    "t09_cdc_chunking",      # content-defined chunk boundaries
    "p01_curation_pipeline", # one-scan funnel
    "p03_leakage_safe_split",  # CC labels + hash split
    "q34_full_outer_reconcile",  # pre-aggregated full-outer
    "m05_magic_byte_quarantine",  # binary-prefix projection
    "evt02_session_windows", # native session windows
    "evt03_interval_join",   # time-bounded self-join
    "d07_dup_clusters",      # blocked pairs → CC fixpoint (mutated corpus)
    "d10_simhash_hamming",   # band-blocked hamming pairs (mutated corpus)
    "t10_contamination",     # broadcast eval grams, no pre-join shuffle
    "t11_repetition_filters",  # explode → per-doc collapse → lang rollup
    "p04_sequence_packing",  # shard-parallel running-token windows
    "i08_column_profile",    # unpivot melt + single aggregate
    # round 4
    "q41_correlated_scalar_subquery",  # decorrelated subquery: agg + equi-join
    "q42_lateral_posexplode",  # ordinal explode + word-grain partials
    "q45_map_functions",     # from_json map explode
    "s05_quantized_topk",    # int8 codes, broadcast query matrix, int matmul
    "p06_dataset_card",      # one-scan per-source card
    "evt05_stream_dedup",    # keyed dedup of a redelivered union
    "m07_audio_energy",      # Arrow binary → numpy windowed energy
    # round 5
    "q50_scd2_dimension",    # two stacked windows, one shuffle on the key
    "q51_last_touch_attribution",  # IGNORE-NULLS carry-forward window
    "q52_rollup_merge",      # algebraic partials → merge (two-level agg)
    "q53_cogroup_asof",      # cogrouped applyInPandas merge_asof kernel
    "t13_word_entropy",      # explode → two shrinking hash aggregates
    "w06_zorder_layout",     # Morton clustering write + 2-D pruned read
    # round 6
    "q54_pagerank_transitions",  # event-scale edge extraction + tiny-graph iters
    "q56_mad_anomalies",     # two-pass broadcast-back integer stats
    "q57_market_share",      # 8-table star join, one fact shuffle
    "t14_substring_dup_share",  # gram-frequency semi-join, no all-pairs
    "p07_per_source_cap",    # per-source rank window
    "i10_drift_psi",         # |bins|-key counting aggregate
    # round 7
    "q94_rebate_allocation",  # join + two window passes on one exchange
    "t29_bm25_retrieval",    # filtered explode + broadcast df/totals
    "d16_incremental_dedup",  # batch-vs-corpus blocked pairs (mutated corpus)
    "s08_grid_nearest_neighbor",  # grid-cell equi-join, 9x bounded probe
    "p17_stratified_split",  # two-level bucketed grouped rank
    "i24_linear_interpolation",  # daily agg + shared 4-window context sort
    # round 8
    "q99_conversion_latency",  # funnel latency: two pruned aggs + one key join
    "evt18_ohlc_conflation",  # min_by/max_by single-pass candlesticks
    "w19_cow_delete",        # footer-stats file skipping + borrow commit
]

#: dedup growth ladder: the candidate-generating queries re-run on
#: documents-only corpora at these copy counts; sub-linear growth = time
#: ratio below the data ratio.  Round 4 extends the ladder from d07/d10 to
#: every blocked-pair family (d05 rare-shingle blocking, d12 containment
#: blocking, d14 sorted-neighborhood post-ranks.py) so each candidate
#: generator's fan-out claim is MEASURED, not argued.
DEDUP_LADDER = (10, 100)
DEDUP_QUERIES = (
    "d07_dup_clusters",
    "d10_simhash_hamming",
    "d05_ngram_jaccard",
    "d12_containment_pairs",
    "d14_sorted_neighborhood",
    # round 7: batch-vs-corpus blocking — the %10 new-batch stride applies
    # to every key-offset replica, so the batch grows WITH the corpus (the
    # harsher-than-production contract: real daily batches are ~constant);
    # expected linear, never quadratic
    "d16_incremental_dedup",
)

#: deep dedup ladder (round-8 verdict #6): one more measured decade for the
#: two HIGHEST 10x-decade ratios (d10 3.76, d16 3.43 in round 8) — the band
#: join and the incremental classifier.  Only these two run at 1000 copies
#: (the full six-query set at 1000x would spend most of its wall on the
#: already-low-ratio generators); same per-rung-subprocess protocol, same
#: pass-dispersion rule.  Sub-linear here means the blocking claims hold
#: across THREE measured decades, not two.
DEDUP_DEEP_LADDER = (100, 1000)
DEDUP_DEEP_QUERIES = (
    "d10_simhash_hamming",
    "d16_incremental_dedup",
    # round 10: the only ladder family without a third decade (10->100 was
    # 2.27 in round 9) — SNM's |docs|·(w−1) constant fan-out claim should
    # hold a decade further; it is self-contained (range-partitioned rank,
    # no shared family frames), so the existing warm suffices
    "d14_sorted_neighborhood",
)

#: similarity growth ladder (round-4 verdict #6): the broadcast-matrix ANN
#: paths on embeddings-only corpora at these copy counts, WITH THE QUERY SET
#: HELD CONSTANT — the production contract the docstrings state (a fixed
#: query workload / trained quantizer against a growing candidate corpus).
#: Replica copies i>0 are filtered off the query/centroid strides
#: (vec_id % 50 / % 31 / % 97 ≠ 0 post-offset), so only the base corpus
#: contributes queries, IVF centroids, and ADC distance-table queries;
#: candidate volume still grows ~(copies × 94%).  Expected shape: time
#: ratio ≈ data ratio (the kernels are linear in the candidate side at
#: fixed query count), NEVER the quadratic both-sides-grow blow-up the
#: round-4 verdict flagged as unmeasured.
SIM_LADDER = (10, 100)
SIM_QUERIES = (
    "s01_topk_bruteforce",
    "s02_topk_lsh",  # the designated scale path: bucket join, no broadcast matrix
    "s03_topk_ivf",
    "s05_quantized_topk",
    "s06_pq_adc_topk",
    # s08_grid_nearest_neighbor is deliberately NOT here: verbatim embedding
    # replication stacks identical coordinates into the same grid cells, so
    # candidate pairs grow ~copies² BY CONSTRUCTION of the synthetic build
    # (the same artifact the mutated-text build exists to avoid for simhash).
    # s08's fan-out claim is covered measured by tools/audit_fanout.py at
    # sf0.1 and the 10x-copies smoke rung instead.
)


def build(spark, out_dir: str, copies: int, tables: dict | None = None) -> None:
    for name, keys in (tables or TABLES).items():
        src = read_table(spark, BASE_SF, name)
        if keys and copies > 1:
            df = _replicate(src, keys, copies, mutate_text=(name == "documents"))
        else:
            df = src
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("scale_smoke")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        t0 = time.time()
        build(spark, tmp, copies)
        build_s = round(time.time() - t0, 1)
        registry = load_all()
        timings: dict[str, float] = {}
        for name in SMOKE_QUERIES:
            t0 = time.time()
            try:
                registry[name].fn(spark, tmp).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                print(f"smoke error in {name}: {exc}", file=sys.stderr)
                timings[name] = -1.0
        # stop the main-suite session (and its JVM's claim on memory)
        # before the ladders: each rung runs in its own subprocess/JVM.
        spark.stop()
        result = {
            "metric": "scale_smoke_total_wall",
            "value": round(sum(v for v in timings.values() if v >= 0), 2),
            "unit": "sec",
            "copies": copies,
            "build_sec": build_s,
            "queries": timings,
            "dedup_growth": dedup_growth(),
            "dedup_deep_growth": dedup_deep_growth(),
            # pinned-batch maintained-index ladder runs standalone
            # (`--pinned DEDUP_INDEX_LADDER.json`) — it is a separate ~50 min
            # protocol with its own artifact; not duplicated here.
            "dedup_pinned_artifact": "DEDUP_INDEX_LADDER.json",
            "similarity_growth": similarity_growth(),
        }
        result["ladder_note"] = (
            "each growth-ladder rung runs in its OWN python subprocess "
            "(fresh JVM): spark.stop()+new-session is NOT enough — the py4j "
            "gateway JVM persists, and its debris taxes whichever rung runs "
            "later (measured round 6: the identical 100-copy d10 plan ran "
            "~13 s in a fresh process vs ~80-109 s after the main suite in "
            "the same process, with per-rung sessions); a shared process "
            "always runs small-to-large, so it systematically inflates "
            "growth ratios"
        )
        print(json.dumps(result))
        if out_json:
            with open(out_json, "w") as fh:
                json.dump(result, fh, indent=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _warm_session(spark, parquet_path: str) -> None:
    """bench.py's warm-up discipline for a fresh rung JVM: prime parquet
    footers, whole-stage codegen, and BOTH python-worker pools (mapInPandas
    and grouped-map spin up independently) so the first timed query measures
    the plan, not session bootstrap."""
    spark.read.parquet(parquet_path).count()
    warm = spark.range(256).selectExpr("id", "CAST(id AS double) AS v")
    warm.mapInPandas(lambda it: it, schema="id long, v double").count()
    warm.groupBy("id").applyInPandas(lambda p: p, schema="id long, v double").count()


#: Pass-dispersion ceiling: a rung whose repeated passes disagree by more
#: than this factor is reported as UNMEASURED instead of contributing a
#: ratio — round-6's min-of-two protocol recorded 40x pass disagreements
#: (d14: 7.88 s vs 98.39 s), and a headline ratio computed from the min of
#: two samples that dispersed is one bad draw from flipping a verdict.
MAX_PASS_DISAGREEMENT = 3.0
N_PASSES = 3


def _time_queries(spark, names, sf_dir: str) -> dict:
    """MEDIAN of ≥3 passes per query, with per-query min/max spread recorded
    and any query whose passes disagree by more than MAX_PASS_DISAGREEMENT
    marked unmeasured (round-6 verdict: this VM's wall-clocks swing 2-5x
    under host contention; a min-of-two estimator silently launders that
    noise into growth ratios)."""
    import statistics

    from worker_etl_spark.queries import release_persists

    registry = load_all()
    # One untimed per-query warm pass first (round-7 verdict #2: d14's 100x
    # rung went unmeasured on 3.27x pass dispersion — the dispersion was the
    # FIRST timed execution paying one-off plan costs the family warm does
    # not cover: codegen for this exact plan, shuffle-file creation, python
    # worker growth).  bench.py reports warm numbers for the same reason;
    # the timed passes below measure the plan, not first-run bootstrap.
    #
    # CRITICAL: no release_persists() inside this function.  The rung warms
    # the memoized family frames UNTIMED on purpose (dedup_rung docstring);
    # releasing between queries forces every timed pass to rebuild them, so
    # (a) the build is mis-billed to whichever query runs it and (b) the
    # repeated heavy rebuilds pile JVM debris that grows pass-over-pass
    # (measured: d16's 100x passes ran 18 -> 40 -> 76 s with per-query
    # release; flat without).  Attribution stays honest because EVERY
    # memoized dependency is already built before the first timed pass.
    # The caller releases once, after the whole rung.
    for name in names:
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — the timed pass will report it
            pass
    passes: list[dict[str, float]] = []
    for _ in range(N_PASSES):
        t: dict[str, float] = {}
        for name in names:
            t0 = time.time()
            try:
                registry[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t[name] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                print(f"growth error in {name}: {exc}", file=sys.stderr)
                t[name] = -1.0
        passes.append(t)
    release_persists()
    out: dict = {"_passes": passes, "_spread": {}, "_unmeasured": []}
    for n in names:
        ok = [p[n] for p in passes if p[n] >= 0]
        if not ok:
            out[n] = -1.0
            continue
        disagree = round(max(ok) / max(min(ok), 1e-9), 2)
        out["_spread"][n] = {"min": min(ok), "max": max(ok), "disagree_x": disagree}
        out[n] = round(statistics.median(ok), 2)
        # ratio dispersion only means something above an absolute floor:
        # when the FASTEST pass is sub-second the query's intrinsic cost is
        # sub-second, and 1-2 s GC/scheduler pauses dominate any ratio —
        # a 0.26 s CC fixpoint with one 2 s pass is floor noise, not an
        # unmeasured operator (and a sub-second query at BOTH rungs is
        # nowhere near its scaling regime anyway)
        if disagree > MAX_PASS_DISAGREEMENT and min(ok) >= 1.0:
            out["_unmeasured"].append(n)
    return out


def dedup_rung(spark, copies: int) -> dict:
    """One dedup-ladder rung in the CURRENT session: build the documents-only
    corpus at *copies*, warm the shared family frames untimed, time each
    candidate generator."""
    from worker_etl_spark.queries import dedup_q, release_persists

    tmp = tempfile.mkdtemp(prefix=f"smoke_dedup_{copies}_")
    try:
        t0 = time.time()
        build(spark, tmp, copies, tables={"documents": ["doc_id"]})
        build_s = round(time.time() - t0, 1)
        # Materialize the shared family frames untimed (bench.py's
        # attribution discipline): otherwise whichever query runs first
        # in the rung — d07 — bills the one-time shingle/simhash build
        # and its growth ratio measures the warm, not the plan.
        t0 = time.time()
        _warm_session(spark, os.path.join(tmp, "documents.parquet"))
        dedup_q._shingles(spark, tmp).count()
        dedup_q._simhash_df(spark, tmp).count()
        # the memoized blocked-pair frame too: without this, whichever
        # consumer runs FIRST (d07) bills the one-time pair build in pass 1
        # and reuses the persisted frame in passes 2-3 — a 75x pass
        # "disagreement" that is cache attribution, not host noise
        # (observed exactly that before this line existed)
        dedup_q._jaccard_pairs(spark, tmp).count()
        warm_s = round(time.time() - t0, 1)
        return {
            "build_sec": build_s,
            "untimed_family_warm_sec": warm_s,
            **_time_queries(spark, DEDUP_QUERIES, tmp),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_deep_rung(spark, copies: int) -> dict:
    """One deep-ladder rung: documents-only corpus at *copies*, warming ONLY
    the family frames d10/d16 consume (``_simhash_df`` and ``_shingles`` —
    not ``_jaccard_pairs``, whose consumers aren't timed here)."""
    from worker_etl_spark.queries import dedup_q

    tmp = tempfile.mkdtemp(prefix=f"smoke_dedup_deep_{copies}_")
    try:
        t0 = time.time()
        build(spark, tmp, copies, tables={"documents": ["doc_id"]})
        build_s = round(time.time() - t0, 1)
        t0 = time.time()
        _warm_session(spark, os.path.join(tmp, "documents.parquet"))
        dedup_q._shingles(spark, tmp).count()
        dedup_q._simhash_df(spark, tmp).count()
        warm_s = round(time.time() - t0, 1)
        return {
            "build_sec": build_s,
            "untimed_family_warm_sec": warm_s,
            **_time_queries(spark, DEDUP_DEEP_QUERIES, tmp),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sim_rung(spark, copies: int) -> dict:
    """One similarity-ladder rung in the CURRENT session (query set pinned
    to the base corpus — see SIM_LADDER note)."""
    from worker_etl_spark.queries import release_persists

    tmp = tempfile.mkdtemp(prefix=f"smoke_sim_{copies}_")
    try:
        t0 = time.time()
        emb = _replicate(
            read_table(spark, BASE_SF, "embeddings"),
            ["vec_id"],
            copies,
            mutate_text=False,
        )
        # Pin the query workload: replica copies contribute CANDIDATES
        # only — rows landing on the query (%50), IVF-centroid (%31),
        # or ADC-query (%97) strides are dropped from copies i>0, so
        # every collected/broadcast matrix stays base-corpus-sized no
        # matter how far the corpus scales (the production contract the
        # query-set guard enforces).
        emb = emb.filter(
            (F.col("vec_id") < OFFSET)
            | (
                (F.col("vec_id") % 50 != 0)
                & (F.col("vec_id") % 31 != 0)
                & (F.col("vec_id") % 97 != 0)
            )
        )
        emb.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
        build_s = round(time.time() - t0, 1)
        _warm_session(spark, os.path.join(tmp, "embeddings.parquet"))
        return {"build_sec": build_s, **_time_queries(spark, SIM_QUERIES, tmp)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


#: Ladder isolation (round-6 protocol fix): ``spark.stop()`` + a new session
#: does NOT give a clean measurement — the py4j gateway JVM persists, and its
#: debris (heap fragmentation, GC pressure, code cache, accumulated listener
#: state) taxes whichever rung runs later.  Measured on the identical d10
#: plan at the 100-copy rung: ~13 s in a fresh python process, ~80-109 s
#: after the 44-query main suite in the same process, regardless of
#: per-rung session restarts.  A shared process always runs small→large, so
#: it systematically inflates growth ratios.  Each rung therefore runs in
#: its OWN python subprocess (fresh JVM); the parent only assembles ratios.
#: Per-rung idle gate (round-11 verdict #2: a kept 1000-copy rung ran at
#: load 9.53 — mostly the PREVIOUS rung's own decaying load, since rungs ran
#: back-to-back).  Before spawning each rung subprocess the parent waits,
#: bounded, for the 1-min load to fall under the threshold — the same
#: discipline bench.py applies to itself.
IDLE_LOAD = float(os.environ.get("SPARK_GRAFT_LADDER_IDLE_LOAD", "1.0"))
IDLE_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_LADDER_IDLE_WAIT_SEC", "900"))


def _wait_for_idle() -> tuple[float, int]:
    """Block until 1-min load < IDLE_LOAD or IDLE_WAIT_SEC elapses; returns
    (load at release, seconds waited)."""
    waited = 0
    load = os.getloadavg()[0]
    while load >= IDLE_LOAD and waited < IDLE_WAIT_SEC:
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return load, waited


def _growth_subproc(kind: str, ladder, queries, extra: dict | None = None) -> dict:
    import subprocess

    out: dict[str, dict] = {"copies": {}}
    if extra:
        out.update(extra)
    def _run_rung(copies: int):
        fd, rung_json = tempfile.mkstemp(
            prefix=f"rung_{kind}_{copies}_", suffix=".json"
        )
        os.close(fd)
        load_before, idle_waited = _wait_for_idle()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rung", kind,
                 str(copies), rung_json],
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # record the rung as errored instead of aborting the whole smoke
            # run and discarding every previously collected result
            print(f"{kind} rung {copies} timed out (3600 s)", file=sys.stderr)
            os.unlink(rung_json)
            return {"error": "timeout_3600s"}
        if proc.returncode != 0:
            print(f"{kind} rung {copies} failed:\n{proc.stderr[-2000:]}", file=sys.stderr)
            os.unlink(rung_json)
            return {"error": proc.returncode}
        with open(rung_json) as fh:
            rung = json.load(fh)
        os.unlink(rung_json)
        rung["load_avg_1m_before"] = round(load_before, 2)
        rung["idle_wait_sec"] = idle_waited
        return rung

    for copies in ladder:
        rung = _run_rung(copies)
        # One mechanical retry when passes disagreed: a single host-
        # contention event poisons one pass and flags the whole rung
        # (observed: pass 3 of a rung slowing 4-5x ACROSS every query at
        # once — external load, not the plans).  Keep whichever attempt has
        # fewer unmeasured queries and record the discarded one verbatim,
        # so the artifact shows both the rule and the evidence.
        if rung.get("_unmeasured"):
            print(
                f"{kind} rung {copies}: pass disagreement on "
                f"{rung['_unmeasured']} — one retry", file=sys.stderr,
            )
            retry = _run_rung(copies)
            if len(retry.get("_unmeasured", [])) < len(rung["_unmeasured"]):
                retry["_retry_discarded_attempt"] = rung
                rung = retry
            else:
                rung["_retry_discarded_attempt"] = retry
        out["copies"][str(copies)] = rung
    lo, hi = (str(c) for c in (ladder[0], ladder[-1]))
    unmeasured = set(out["copies"].get(lo, {}).get("_unmeasured", [])) | set(
        out["copies"].get(hi, {}).get("_unmeasured", [])
    )
    for name in queries:
        if name in unmeasured:
            # a ratio of medians whose passes disagreed >MAX_PASS_DISAGREEMENT
            # would be noise wearing a verdict's clothes — report it as such
            out[f"{name}_time_ratio"] = "unmeasured_pass_disagreement"
            continue
        a, b = out["copies"].get(lo, {}).get(name), out["copies"].get(hi, {}).get(name)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > 0 and b > 0:
            out[f"{name}_time_ratio"] = round(b / a, 2)
    out["data_ratio"] = ladder[-1] / ladder[0]
    out["protocol"] = (
        f"median of {N_PASSES} passes per rung, per-query min/max recorded in "
        f"_spread; any query with pass disagreement > {MAX_PASS_DISAGREEMENT}x "
        "on either endpoint rung is reported unmeasured instead of ratio'd; a "
        "rung with unmeasured queries is retried ONCE (fresh subprocess) and "
        "the attempt with fewer unmeasured kept, the other recorded verbatim "
        "under _retry_discarded_attempt"
    )
    return out


def dedup_growth(spark=None) -> dict:
    """Blocked-pair candidate generators at each DEDUP_LADDER copy count,
    one fresh python subprocess (fresh JVM) per rung.  The mutated-copy
    build keeps the near-dup rate constant, so the evidence the band-join/
    blocking claims need is ``t[100]/t[10]`` staying under the 10x data
    ratio."""
    return _growth_subproc("dedup", DEDUP_LADDER, DEDUP_QUERIES)


#: the pinned-batch ladder's timed set: both maintained-index classifiers.
DEDUP_PINNED_QUERIES = ("d16_incremental_dedup", "d18_incremental_simhash")
DEDUP_PINNED_LADDER = (100, 1000)
#: chunks the untimed incremental index build ingests the corpus in — the
#: production shape is one update per day; 10 chunks is enough to exercise
#: the append/flip paths at ladder scale without 1000 Spark-job rounds of
#: fixed overhead (incremental==full equivalence is pinned by
#: tests/test_dedup_index.py, so chunk count cannot change results).
DEDUP_PINNED_CHUNKS = 10


def dedup_pinned_rung(spark, copies: int) -> dict:
    """d16/d18 with the BATCH PINNED to the base corpus (the sim-ladder
    query-set discipline applied to incremental dedup): replica copies i>0
    contribute CORPUS rows only — their batch-stride rows (doc_id % 10 == 7)
    are filtered at build time, so the daily batch stays base-sized while
    the standing corpus scales.  This is the PRODUCTION shape (real daily
    batches are ~constant).

    Round-10 protocol change (the round-9 finding's fix): the corpus index
    is built INCREMENTALLY and UNTIMED — ``update_index`` over
    DEDUP_PINNED_CHUNKS doc_id-range chunks, exactly the maintenance write a
    production ingest runs per batch — then registered so the timed queries
    classify against it.  The timed number is therefore CLASSIFICATION
    ALONE, which is what runs daily; index maintenance cost is recorded
    separately (it is O(new batch), paid once per ingest, not per query).
    Round-9's measured 12.92x per 10x corpus (D16_PINNED_LADDER.json) was
    exactly the old formulation's re-derivation of this index per run."""
    from worker_etl_spark.operators.dedup_index import register_index, update_index

    tmp = tempfile.mkdtemp(prefix=f"smoke_dedup_pinned_{copies}_")
    index_dir = tempfile.mkdtemp(prefix=f"smoke_dedup_index_{copies}_")
    try:
        t0 = time.time()
        docs = _replicate(
            read_table(spark, BASE_SF, "documents"), ["doc_id"], copies,
            mutate_text=True,
        )
        docs = docs.filter(
            (F.col("doc_id") < OFFSET) | (F.col("doc_id") % 10 != 7)
        )
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        build_s = round(time.time() - t0, 1)
        t0 = time.time()
        _warm_session(spark, os.path.join(tmp, "documents.parquet"))
        warm_s = round(time.time() - t0, 1)
        # Untimed incremental index maintenance: chunked by replica range
        # (chunk 0 = the base corpus, later chunks = "days" of ingest).
        t0 = time.time()
        corpus = spark.read.parquet(os.path.join(tmp, "documents.parquet")).filter(
            F.col("doc_id") % 10 != 7
        )
        span = max(1, (copies + DEDUP_PINNED_CHUNKS - 1) // DEDUP_PINNED_CHUNKS)
        for chunk in range(DEDUP_PINNED_CHUNKS):
            lo, hi = chunk * span, (chunk + 1) * span
            part = corpus.filter(
                (F.col("doc_id") >= lo * OFFSET) & (F.col("doc_id") < hi * OFFSET)
            )
            update_index(spark, part.select("doc_id", "text"), index_dir)
            if hi >= copies:
                break
        register_index(tmp, index_dir)
        index_build_s = round(time.time() - t0, 1)
        rung = {
            "build_sec": build_s,
            "untimed_family_warm_sec": warm_s,
            "untimed_incremental_index_build_sec": index_build_s,
            "index_chunks": DEDUP_PINNED_CHUNKS,
            **_time_queries(spark, DEDUP_PINNED_QUERIES, tmp),
        }
        # Measured candidate volume for d18 (round-10 verdict #1: "volume-
        # bound" must be a recorded number, not an argument): distinct
        # fingerprints per side, band-agreeing candidate pairs, hamming
        # survivors — all against the same index the timed passes probed.
        from worker_etl_spark.operators.dedup_index import (
            compact_index,
            index_row_counts,
            simhash_probe_stats,
            vacuum_index,
        )

        batch = spark.read.parquet(os.path.join(tmp, "documents.parquet")).filter(
            F.col("doc_id") % 10 == 7
        ).select("doc_id", "text")
        rung["d18_probe_stats"] = simhash_probe_stats(spark, batch, index_dir)
        # Compaction half of the maintain→compact→classify cycle (round-10
        # verdict #2): LSM-fold wall time, dead rows reclaimed per table,
        # and post-compaction classification time (one timed pass per query
        # — enough to show compaction didn't regress the probe plans).
        rows_before = index_row_counts(spark, index_dir)
        t0 = time.time()
        compact_index(spark, index_dir)
        compact_s = round(time.time() - t0, 1)
        vacuumed = vacuum_index(index_dir, grace_sec=0.0, no_active_readers=True)
        rows_after = index_row_counts(spark, index_dir)
        registry = load_all()
        post = {}
        for name in DEDUP_PINNED_QUERIES:
            # one untimed pass first: the folded segments are cold files the
            # pre-compact passes never read, and the timed number should
            # measure the probe plan, not first-touch page-cache misses
            # (the same warm discipline _time_queries applies).
            registry[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
            t0 = time.time()
            registry[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
            post[name] = round(time.time() - t0, 2)
        rung["compaction"] = {
            "compact_sec": compact_s,
            "vacuumed_segment_dirs": vacuumed,
            "index_rows_before": rows_before,
            "index_rows_after": rows_after,
            "dead_rows_reclaimed": {
                t: rows_before[t] - rows_after.get(t, 0) for t in rows_before
            },
            "post_compact_classify_sec": post,
        }
        return rung
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)


#: ANN pinned-batch ladder (round-10 verdict #5: extend the maintained-index
#: posture to similarity): embeddings-only corpora with the query set,
#: centroid set, AND daily batch all pinned to the base corpus (replica
#: copies contribute candidate rows only); the IVF index is built
#: incrementally (untimed, ANN_CHUNKS no-retrain appends), the pinned batch
#: append is recorded as the daily ingest cost, and the timed number is
#: SEARCH alone.  Candidate volume (postings in probed cells) is recorded
#: per rung so search growth is attributable to measured numbers.
ANN_PINNED_LADDER = (10, 100, 1000)
ANN_PINNED_QUERIES = ("s09_incremental_ann",)
ANN_CHUNKS = 10
#: Occupancy cap for the post-measurement split maintenance: ~14x the base
#: corpus's mean cell occupancy (sf0.1: ~1,740 postings over ~60 cells ≈ 29
#: rows/cell at 1 copy), so the 10-copy rung splits barely at all while the
#: 100/1000 rungs split hot cells repeatedly — the regime the round-11
#: verdict flagged (candidate volume ∝ corpus under frozen centroids).
ANN_OCCUPANCY_CAP = 4000
#: Steady-state cadence measurement (round-12): the single-pass ladder
#: maintains ONCE at end-of-history; production runs maintain+compact per
#: ingest cycle.  The cadence rung ingests the same 1000-copy corpus in
#: ANN_CADENCE_CYCLES cycles with the full maintenance cycle after each,
#: recording per-cycle cost and post-maintenance search — the evidence that
#: repeated maintenance keeps occupancy under the cap (no split debt
#: accumulates), that per-cycle maintain cost tracks the cycle's over-cap
#: volume rather than the cumulative corpus, and that post-maintenance
#: search stays cap-bound as the corpus grows cycle over cycle.
ANN_CADENCE_COPIES = 1000
ANN_CADENCE_CYCLES = 6


def _timed_searches(spark, queries, index_dir, n_passes: int = 3) -> list[float]:
    """Median-style evidence for the maintained search against the CURRENT
    index state: one untimed warm pass, then *n_passes* timed s09-equivalent
    searches (probe-2, k=5), each fully materialized via a noop write."""
    from worker_etl_spark.operators.ann_index import search_ann

    search_ann(spark, queries, index_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = []
    for _ in range(n_passes):
        t0 = time.time()
        search_ann(spark, queries, index_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out.append(round(time.time() - t0, 2))
    return out


def ann_pinned_rung(spark, copies: int) -> dict:
    from worker_etl_spark.operators.ann_index import (
        append_ann_batch,
        compact_ann_index,
        create_ann_index,
        maintain_ann_index,
        postings_file_count,
        probed_candidate_count,
        read_postings,
        register_ann_index,
        vacuum_ann_index,
    )

    tmp = tempfile.mkdtemp(prefix=f"smoke_ann_pinned_{copies}_")
    index_dir = tempfile.mkdtemp(prefix=f"smoke_ann_index_{copies}_")
    try:
        t0 = time.time()
        emb = _replicate(
            read_table(spark, BASE_SF, "embeddings"), ["vec_id"], copies,
            mutate_text=False,
        )
        # Pin every collected/broadcast set AND the daily batch: replica
        # rows landing on the query (%50) or centroid (%31) strides, or on
        # the batch stride (%10 == 7), are dropped from copies i>0 — only
        # candidates grow with the corpus.
        emb = emb.filter(
            (F.col("vec_id") < OFFSET)
            | (
                (F.col("vec_id") % 50 != 0)
                & (F.col("vec_id") % 31 != 0)
                & (F.col("vec_id") % 10 != 7)
            )
        )
        emb.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
        build_s = round(time.time() - t0, 1)
        _warm_session(spark, os.path.join(tmp, "embeddings.parquet"))
        e = spark.read.parquet(os.path.join(tmp, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        base = e.filter(F.col("vec_id") % 10 != 7)
        batch = e.filter(F.col("vec_id") % 10 == 7)
        queries = base.filter(F.col("vec_id") % 50 == 0)
        # Untimed incremental index build: freeze base-trained centroids,
        # then ANN_CHUNKS no-retrain appends by replica range.
        t0 = time.time()
        create_ann_index(
            spark, base.filter(F.col("vec_id") % 31 == 0), index_dir
        )
        span = max(1, (copies + ANN_CHUNKS - 1) // ANN_CHUNKS)
        for chunk in range(ANN_CHUNKS):
            lo, hi = chunk * span, (chunk + 1) * span
            append_ann_batch(
                spark,
                base.filter(
                    (F.col("vec_id") >= lo * OFFSET)
                    & (F.col("vec_id") < hi * OFFSET)
                ),
                index_dir,
            )
            if hi >= copies:
                break
        index_build_s = round(time.time() - t0, 1)
        # The daily ingest op itself, recorded (O(batch × centroids)).
        t0 = time.time()
        append_ann_batch(spark, batch, index_dir)
        append_batch_s = round(time.time() - t0, 2)
        register_ann_index(tmp, index_dir)
        rung = {
            "build_sec": build_s,
            "untimed_incremental_index_build_sec": index_build_s,
            "index_chunks": ANN_CHUNKS,
            "append_pinned_batch_sec": append_batch_s,
            **_time_queries(spark, ANN_PINNED_QUERIES, tmp),
        }
        rung["probed_candidate_rows"] = probed_candidate_count(
            spark, queries, index_dir
        )
        rung["total_postings_rows"] = read_postings(spark, index_dir).count()
        # --- bounded-occupancy maintenance (round-11 verdict #1) ---------
        # Split over-cap cells (deterministic in-cell 2-means, no retrain),
        # then re-measure candidate volume and search: the evidence that the
        # maintained index's search cost is CAP-bound, not corpus-linear.
        t0 = time.time()
        split_stats = maintain_ann_index(
            spark, index_dir, occupancy_cap=ANN_OCCUPANCY_CAP
        )
        split_stats["maintain_sec"] = round(time.time() - t0, 1)
        split_stats["occupancy_cap"] = ANN_OCCUPANCY_CAP
        split_stats["probed_candidate_rows_after_split"] = probed_candidate_count(
            spark, queries, index_dir
        )
        post_split = _timed_searches(spark, queries, index_dir)
        split_stats["search_after_split_sec"] = post_split
        rung["split"] = split_stats
        # --- postings compaction (round-11 verdict #3) -------------------
        # Fold per-append small files + drop retired cells' dead rows, then
        # time search against the folded layout.
        files_before = postings_file_count(index_dir)
        t0 = time.time()
        compact_stats = compact_ann_index(spark, index_dir)
        compact_stats["compact_sec"] = round(time.time() - t0, 1)
        compact_stats["postings_files_before"] = files_before
        compact_stats["vacuumed_segment_dirs"] = vacuum_ann_index(
            index_dir, grace_sec=0.0, no_active_readers=True
        )
        compact_stats["search_after_compact_sec"] = _timed_searches(
            spark, queries, index_dir
        )
        rung["compaction"] = compact_stats
        return rung
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)


def ann_cadence_rung(spark, copies: int) -> dict:
    """Repeated ingest→maintain→compact cycles over a growing corpus (the
    production cadence), vs the ladder's one end-of-history maintenance.
    Same pinned query/centroid strides as ``ann_pinned_rung``; the corpus
    is ingested in ``ANN_CADENCE_CYCLES`` replica-range slices and the FULL
    maintenance cycle (occupancy-cap split, compaction, vacuum) runs after
    every slice, with per-cycle cost, occupancy, candidate volume, file
    counts, and 3-pass search timings recorded."""
    from worker_etl_spark.operators.ann_index import (
        append_ann_batch,
        compact_ann_index,
        create_ann_index,
        maintain_ann_index,
        postings_file_count,
        probed_candidate_count,
        vacuum_ann_index,
    )

    tmp = tempfile.mkdtemp(prefix=f"smoke_ann_cadence_{copies}_")
    index_dir = tempfile.mkdtemp(prefix=f"smoke_ann_cad_index_{copies}_")
    try:
        t0 = time.time()
        emb = _replicate(
            read_table(spark, BASE_SF, "embeddings"), ["vec_id"], copies,
            mutate_text=False,
        )
        emb = emb.filter(
            (F.col("vec_id") < OFFSET)
            | ((F.col("vec_id") % 50 != 0) & (F.col("vec_id") % 31 != 0))
        )
        emb.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
        build_s = round(time.time() - t0, 1)
        _warm_session(spark, os.path.join(tmp, "embeddings.parquet"))
        e = spark.read.parquet(os.path.join(tmp, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        queries = e.filter(F.col("vec_id") % 50 == 0)
        create_ann_index(spark, e.filter(F.col("vec_id") % 31 == 0), index_dir)
        span = max(1, (copies + ANN_CADENCE_CYCLES - 1) // ANN_CADENCE_CYCLES)
        cyc_out = []
        for cyc in range(ANN_CADENCE_CYCLES):
            lo, hi = cyc * span, (cyc + 1) * span
            rec: dict = {"cycle": cyc, "replica_range": [lo, min(hi, copies)]}
            t0 = time.time()
            append_ann_batch(
                spark,
                e.filter(
                    (F.col("vec_id") >= lo * OFFSET)
                    & (F.col("vec_id") < hi * OFFSET)
                ),
                index_dir,
            )
            rec["append_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            rec["maintain"] = maintain_ann_index(
                spark, index_dir, occupancy_cap=ANN_OCCUPANCY_CAP
            )
            rec["maintain"]["maintain_sec"] = round(time.time() - t0, 1)
            rec["probed_candidate_rows"] = probed_candidate_count(
                spark, queries, index_dir
            )
            t0 = time.time()
            rec["compaction"] = compact_ann_index(spark, index_dir)
            rec["compaction"]["compact_sec"] = round(time.time() - t0, 1)
            rec["compaction"]["vacuumed_segment_dirs"] = vacuum_ann_index(
                index_dir, grace_sec=0.0, no_active_readers=True
            )
            rec["postings_files_after_cycle"] = postings_file_count(index_dir)
            rec["search_sec"] = _timed_searches(spark, queries, index_dir)
            cyc_out.append(rec)
            if hi >= copies:
                break
        return {
            "build_sec": build_s,
            "occupancy_cap": ANN_OCCUPANCY_CAP,
            "cycles": cyc_out,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)


def ann_pinned_growth() -> dict:
    """Pinned-batch ladder over the maintained ANN search, one fresh
    subprocess per rung."""
    return _growth_subproc(
        "ann_pinned",
        ANN_PINNED_LADDER,
        ANN_PINNED_QUERIES,
        extra={
            "batch": "pinned to base corpus (replicas contribute candidates only)",
            "index": "centroids frozen once; postings appended incrementally "
            "(untimed); timed = search alone",
        },
    )


def dedup_pinned_growth() -> dict:
    """Pinned-batch ladder over the maintained-index classifiers, one fresh
    subprocess per rung — the round-10 answer to the round-9 d16 finding."""
    return _growth_subproc(
        "dedup_pinned",
        DEDUP_PINNED_LADDER,
        DEDUP_PINNED_QUERIES,
        extra={
            "batch": "pinned to base corpus (replicas contribute corpus rows only)",
            "index": "maintained incrementally (untimed); timed = classification alone",
        },
    )


def dedup_deep_growth() -> dict:
    """Third measured decade (100 -> 1000 copies) for the two highest
    previous-decade ratios, one fresh subprocess per rung (round-8 #6)."""
    return _growth_subproc("dedup_deep", DEDUP_DEEP_LADDER, DEDUP_DEEP_QUERIES)


def similarity_growth() -> dict:
    """ANN paths at each SIM_LADDER copy count, query set pinned to the
    base corpus, one fresh subprocess per rung."""
    return _growth_subproc(
        "sim", SIM_LADDER, SIM_QUERIES, extra={"query_set": "pinned to base corpus"}
    )


def _rung_main(kind: str, copies: int, out_json: str) -> None:
    spark = get_spark(f"scale_smoke_{kind}_rung_{copies}")
    if kind == "dedup":
        rung = dedup_rung(spark, copies)
    elif kind == "dedup_deep":
        rung = dedup_deep_rung(spark, copies)
    elif kind == "dedup_pinned":
        rung = dedup_pinned_rung(spark, copies)
    elif kind == "ann_pinned":
        rung = ann_pinned_rung(spark, copies)
    elif kind == "ann_cadence":
        rung = ann_cadence_rung(spark, copies)
    else:
        rung = sim_rung(spark, copies)
    with open(out_json, "w") as fh:
        json.dump(rung, fh)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--rung":
        _rung_main(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "--pinned":
        # Standalone pinned-batch maintained-index ladder (the round-10
        # answer to D16_PINNED_LADDER.json's 12.92x finding).
        res = {
            "metric": "dedup_maintained_index_pinned_batch_ladder",
            "what": (
                "d16/d18 with the daily batch PINNED to the base corpus; the "
                "corpus index is maintained incrementally (untimed, "
                f"{DEDUP_PINNED_CHUNKS} ingest chunks via "
                "dedup_index.update_index) and the timed number is "
                "classification alone — the job that runs daily"
            ),
            **dedup_pinned_growth(),
        }
        print(json.dumps(res))
        if len(sys.argv) > 2:
            with open(sys.argv[2], "w") as fh:
                json.dump(res, fh, indent=2)
    elif len(sys.argv) > 1 and sys.argv[1] == "--ann":
        # Standalone ANN maintained-index ladder (round-11: verdict #5).
        res = {
            "metric": "ann_maintained_index_pinned_batch_ladder",
            "what": (
                "s09 with query set, centroids, and the daily batch pinned "
                "to the base corpus; the IVF index is built incrementally "
                f"(untimed, {ANN_CHUNKS} no-retrain appends via "
                "ann_index.append_ann_batch) and the timed number is search "
                "alone; the pinned batch's own append is recorded as the "
                "daily ingest cost.  Each rung then runs the round-12 "
                "maintenance cycle: occupancy-cap cell splitting "
                f"(cap {ANN_OCCUPANCY_CAP}, deterministic in-cell 2-means, "
                "no retrain) with candidate volume + search re-measured "
                "post-split, then postings compaction (small-file fold + "
                "dead-cell drop) with search re-measured post-compact — the "
                "evidence that maintained-search cost is cap-bound, not "
                "corpus-linear"
            ),
            **ann_pinned_growth(),
        }
        print(json.dumps(res))
        if len(sys.argv) > 2:
            with open(sys.argv[2], "w") as fh:
                json.dump(res, fh, indent=2)
    elif len(sys.argv) > 1 and sys.argv[1] == "--ann-cadence":
        # Steady-state maintenance cadence (round-12): one idle-gated fresh
        # subprocess; cycles and corpus size fixed by ANN_CADENCE_*.
        import subprocess

        fd, rung_json = tempfile.mkstemp(prefix="rung_ann_cadence_", suffix=".json")
        os.close(fd)
        load_before, idle_waited = _wait_for_idle()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rung", "ann_cadence",
             str(ANN_CADENCE_COPIES), rung_json],
            capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            print(f"ann_cadence failed:\n{proc.stderr[-3000:]}", file=sys.stderr)
            os.unlink(rung_json)
            raise SystemExit(1)
        with open(rung_json) as fh:
            rung = json.load(fh)
        os.unlink(rung_json)
        res = {
            "metric": "ann_maintained_index_cadence",
            "what": (
                "repeated ingest->maintain->compact cycles over a growing "
                f"corpus ({ANN_CADENCE_COPIES} copies in "
                f"{ANN_CADENCE_CYCLES} replica-range slices, cap "
                f"{ANN_OCCUPANCY_CAP}): the steady-state complement to the "
                "ladder's one end-of-history maintenance — per-cycle "
                "maintain cost should track the cycle's over-cap volume "
                "(not the cumulative corpus), occupancy must return under "
                "the cap every cycle, and post-maintenance search should "
                "stay cap-bound as the corpus grows"
            ),
            "copies": ANN_CADENCE_COPIES,
            "n_cycles": ANN_CADENCE_CYCLES,
            "load_avg_1m_before": round(load_before, 2),
            "idle_wait_sec": idle_waited,
            **rung,
        }
        print(json.dumps(res))
        if len(sys.argv) > 2:
            with open(sys.argv[2], "w") as fh:
                json.dump(res, fh, indent=2)
    else:
        main()
