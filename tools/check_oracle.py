"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf=0.01, compares row count, column names/types, and an order-insensitive
value hash (columns sorted by name, rows sorted by all columns, values
canonicalized to strings).  Use while iterating so driver-side
CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _kind(s: pd.Series) -> str:
    """Normalized dtype kind — the driver's compare is type-aware, so an
    int64-vs-float64 divergence (e.g. DuckDB HUGEINT/DOUBLE vs Spark BIGINT)
    must fail locally too, even when the stringified values agree."""
    k = s.dtype.kind
    if k == "u":
        return "i"
    if k == "O":  # object column: sniff the first non-null value
        for v in s:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            if isinstance(v, bool):
                return "b"
            if isinstance(v, int):
                return "i"
            if isinstance(v, float):
                return "f"
            break
        return "O"
    return k


def canon(df: pd.DataFrame) -> tuple[int, list[str], str, pd.DataFrame]:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    kinds = [_kind(df[c]) for c in df.columns]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else f"{v:.9g}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else v.isoformat())
        else:
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = "\n".join("\x1f".join(row) for row in df.itertuples(index=False))
    cols = [f"{c}:{k}" for c, k in zip(df.columns, kinds)]
    return len(df), cols, hashlib.md5(payload.encode()).hexdigest(), df


def main() -> int:
    from worker_etl_spark.queries import load_all
    from worker_etl_spark.session import get_spark

    only = set(sys.argv[1:])
    registry = load_all()
    if os.environ.get("SPARK_GRAFT_ORACLE_VANILLA") == "1":
        # Replicate the DRIVER's environment: a plain SparkSession with
        # default confs (200 shuffle partitions, system tz, no tuned knobs) —
        # the gate the driver actually runs; the tuned session can mask
        # conf-sensitive divergence.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rowsonly = 0
    for name, spec in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        finally:
            # bounded intra-query persists release between queries so the
            # full-registry replica session doesn't accumulate them
            from worker_etl_spark.queries import release_persists

            release_persists()
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        sn, scols, shash, sdfc = canon(sdf)
        on, ocols, ohash, odfc = canon(odf)
        ok = sn == on and scols == ocols and shash == ohash
        if ok:
            print(f"PASS  {name}: {sn} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows {sn} vs {on}; cols {scols} vs {ocols}")
            if scols == ocols and sn == on:
                diff = sdfc.compare(odfc) if sdfc.shape == odfc.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(10).to_string())
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
