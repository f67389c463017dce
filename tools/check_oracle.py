"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf=0.01, compares row count, column names/types, and an order-insensitive
value hash (columns sorted by name, rows sorted by all columns, values
canonicalized to strings).  Use while iterating so driver-side
CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/check_oracle.py [--out PATH] [query_name ...]

With ``--out PATH`` (or env ``SPARK_GRAFT_REPLICA_OUT``) the tool writes the
replica artifact ITSELF — one result line per checked query plus the summary
line — via an atomic tempfile+rename, then self-checks that the written line
count equals the number of checked queries (round-7 verdict #1: an artifact
assembled from captured stdout lost 21 lines on write; the gate artifact must
be self-consistent by construction, not by capture).
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


def _q29_bounds(sdf: pd.DataFrame) -> str | None:
    """Machine-checked error bounds for the one rows-only-by-design query
    (round-10 verdict #4: the bound lived only in tests/test_approx.py; the
    replica line must carry it).  q29's result holds each sketch NEXT TO its
    exact sibling computed in the same run, so the check needs no oracle:
    HLL++ at rsd=0.01 within 5x the configured error (floor 2 absolute),
    GK percentile at accuracy=10000 within 1% of the exact median.
    Returns None when bounds hold, else a failure description."""
    if len(sdf) != 3:  # A / N / R return flags
        return f"expected 3 return-flag rows, got {len(sdf)}"
    for r in sdf.itertuples(index=False):
        if abs(r.approx_parts - r.exact_parts) > max(0.05 * r.exact_parts, 2):
            return (
                f"HLL bound: flag {r.l_returnflag} approx_parts "
                f"{r.approx_parts} vs exact {r.exact_parts}"
            )
        if abs(r.approx_median_price - r.exact_median_price) > (
            0.01 * r.exact_median_price
        ):
            return (
                f"percentile bound: flag {r.l_returnflag} approx "
                f"{r.approx_median_price} vs exact {r.exact_median_price}"
            )
    return None


#: rows-only queries whose replica line must also assert a machine-checked
#: property of the returned frame (name → checker returning None | reason).
BOUNDS_CHECKS = {"q29_approx_stats": _q29_bounds}


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


def _write_artifact(out_path: str, lines: list[str], summary: str, n_checked: int) -> None:
    """Atomic write of the full replica artifact + self-consistency check.

    All result lines and the summary go down in ONE os.replace — a reader
    never sees a partial artifact — and the function raises if the result
    line count disagrees with how many queries were actually checked."""
    if len(lines) != n_checked:
        raise RuntimeError(
            f"replica artifact self-check failed: {len(lines)} result lines "
            f"for {n_checked} checked queries"
        )
    tmp = f"{out_path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines))
        fh.write(f"\n\n{summary}\n")
        fh.write(f"# artifact self-check: {len(lines)} result lines == {n_checked} checked queries\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, out_path)
    with open(out_path) as fh:
        written = [
            l for l in fh.read().splitlines()
            if l.startswith(("PASS ", "FAIL ", "rows-only ", "rows-only+bounds-ok "))
        ]
    if len(written) != n_checked:
        raise RuntimeError(
            f"replica artifact re-read check failed: {len(written)} lines in "
            f"{out_path} vs {n_checked} checked"
        )


def main() -> int:
    from worker_etl_spark.queries import load_all
    from worker_etl_spark.session import get_spark

    argv = sys.argv[1:]
    out_path = os.environ.get("SPARK_GRAFT_REPLICA_OUT")
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [query ...] [--out FILE]", file=sys.stderr)
            return 2
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
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
    lines: list[str] = []

    def emit(line: str) -> None:
        print(line)
        lines.append(line)

    for name, spec in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            emit(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        finally:
            # bounded intra-query persists release between queries so the
            # full-registry replica session doesn't accumulate them
            from worker_etl_spark.queries import release_persists

            release_persists()
        if spec.oracle is None:
            checker = BOUNDS_CHECKS.get(name)
            if checker is not None:
                reason = checker(sdf)
                if reason is None:
                    emit(
                        f"rows-only+bounds-ok  {name}: {len(sdf)} rows  "
                        f"({time.time()-t0:.1f}s)"
                    )
                    n_rowsonly += 1
                else:
                    emit(f"FAIL  {name}: bounds violated — {reason}")
                    n_fail += 1
                continue
            emit(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            emit(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        sn, scols, shash, sdfc = canon(sdf)
        on, ocols, ohash, odfc = canon(odf)
        ok = sn == on and scols == ocols and shash == ohash
        if ok:
            emit(f"PASS  {name}: {sn} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            emit(f"FAIL  {name}: rows {sn} vs {on}; cols {scols} vs {ocols}")
            if scols == ocols and sn == on:
                diff = sdfc.compare(odfc) if sdfc.shape == odfc.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(10).to_string())
    summary = f"{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only"
    print(f"\n{summary}")
    if out_path:
        _write_artifact(out_path, lines, summary, n_pass + n_fail + n_rowsonly)
        print(f"wrote {out_path} ({len(lines)} result lines + summary, atomic)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
