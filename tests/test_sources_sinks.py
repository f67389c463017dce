"""CSV/Excel sources, sink naming, and writer tests."""

from __future__ import annotations

import os

import pytest

from worker_etl_spark.sinks.writer import sink_table_name, write_table
from worker_etl_spark.sources.excel import read_excel_grids
from worker_etl_spark.sources.files import (
    read_csv_grid,
    require_exists,
    sniff_delimiter,
    widen_grid,
)


# --- delimiter sniffing ------------------------------------------------------
def test_sniff_comma():
    assert sniff_delimiter("a,b,c\n1,2,3\n4,5,6\n") == ","


def test_sniff_semicolon_with_commas_in_values():
    sample = "a;b;c\nx,y;2;3\nz;4,5;6\n"
    assert sniff_delimiter(sample) == ";"


def test_sniff_tab():
    assert sniff_delimiter("a\tb\n1\t2\n") == "\t"


def test_sniff_empty_falls_back():
    assert sniff_delimiter("") == ","


# --- CSV grid source ---------------------------------------------------------
def test_read_csv_grid(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("name;qty\nwidget;3\ngadget;5\n")
    g = read_csv_grid(spark, str(p))
    assert set(g.columns) == {"file", "sheet", "row_idx", "0", "1"}
    rows = [tuple(r) for r in g.orderBy("row_idx").select("0", "1").collect()]
    assert rows == [("name", "qty"), ("widget", "3"), ("gadget", "5")]
    assert g.first().sheet == "_default_"
    # all cells are strings (untyped scan)
    assert dict(g.dtypes)["1"] == "string"


def test_read_csv_grid_multipartition_row_idx(spark, tmp_path):
    """row_idx must be the contiguous 0-based file position even when Spark
    splits the file into many partitions (regression: monotonically
    increasing id left gaps across partitions, so positional bbox slicing
    in extract_table cut the wrong rows)."""
    p = tmp_path / "big.csv"
    n = 5000
    p.write_text("\n".join(f"r{i:05d},{i}" for i in range(n)) + "\n")
    # Force many small splits so the file spans multiple partitions.
    tiny = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        # the scenario under test: the raw scan really is split
        assert spark.read.csv(str(p)).rdd.getNumPartitions() > 1
        g = read_csv_grid(spark, str(p))
        rows = g.select("row_idx", "0").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", tiny)
    assert sorted(r.row_idx for r in rows) == list(range(n))
    by_idx = {r.row_idx: r["0"] for r in rows}
    # spot-check positions line up with file order
    for i in (0, 1, 2499, 4998, 4999):
        assert by_idx[i] == f"r{i:05d}"


def test_read_csv_grid_glob_per_file_index(spark, tmp_path):
    """A glob matching several files gives each file its own name and its own
    contiguous 0-based row_idx space."""
    (tmp_path / "a.csv").write_text("a0,x\na1,y\n")
    (tmp_path / "b.csv").write_text("b0,x\nb1,y\nb2,z\n")
    g = read_csv_grid(spark, str(tmp_path / "*.csv"), delimiter=",")
    rows = g.select("file", "row_idx", "0").collect()
    per_file = {}
    for r in rows:
        per_file.setdefault(r.file, []).append((r.row_idx, r["0"]))
    assert set(per_file) == {"a.csv", "b.csv"}
    assert sorted(per_file["a.csv"]) == [(0, "a0"), (1, "a1")]
    assert sorted(per_file["b.csv"]) == [(0, "b0"), (1, "b1"), (2, "b2")]


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        require_exists("/nonexistent/nope.csv")


# --- Excel bridge with injected parser ---------------------------------------
def _make_fake_parser():
    # Nested so cloudpickle ships it by value (test modules aren't importable
    # on executors).
    def fake_parser(content: bytes) -> dict:
        """Parses 'sheetname:r1c1|r1c2;r2c1|r2c2' test format."""
        out = {}
        for sheet_blob in content.decode().strip().split("\n"):
            name, rows = sheet_blob.split(":", 1)
            out[name] = [
                [c if c != "" else None for c in r.split("|")] for r in rows.split(";")
            ]
        return out

    return fake_parser


def test_read_excel_grids_plumbing(spark, tmp_path):
    fake_parser = _make_fake_parser()
    wb = tmp_path / "book.xlsx"
    wb.write_bytes(b"S1:h1|h2;a|1;b|2\nS2:x|y|z;1|2|3")
    g = read_excel_grids(spark, str(wb), parser=fake_parser)
    rows = g.collect()
    assert {r.sheet for r in rows} == {"S1", "S2"}
    assert all(r.file == "book.xlsx" for r in rows)

    wide = widen_grid(g)  # max width = 3 (S2)
    assert set(wide.columns) == {"file", "sheet", "row_idx", "0", "1", "2"}
    s1 = wide.filter("sheet = 'S1'").orderBy("row_idx").collect()
    assert [r["2"] for r in s1] == [None, None, None]  # ragged rows padded


def test_default_excel_parser_is_gated(spark, tmp_path):
    wb = tmp_path / "book.xlsx"
    wb.write_bytes(b"not a real workbook")
    g = read_excel_grids(spark, str(wb))
    with pytest.raises(Exception):  # NotImplementedError (no codec) via Py4J
        g.collect()


# --- sink naming -------------------------------------------------------------
def test_sink_name_single_table():
    assert sink_table_name("Sales Report.csv".replace(".csv", "")) == "Sales_Report"


def test_sink_name_multi():
    n = sink_table_name("q1 data", "Sheet 1", "table_2", multi_sheet=True, multi_table=True)
    assert n == "q1_data_Sheet_1_table_2"


def test_sink_name_truncates():
    n = sink_table_name("x" * 3000)
    assert len(n) <= 1024


# --- writer ------------------------------------------------------------------
def test_write_table_append_and_truncate(spark, tmp_path):
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    loc = write_table(df, str(tmp_path), "ds", "t", "WRITE_APPEND")
    assert spark.read.parquet(loc).count() == 3
    write_table(df, str(tmp_path), "ds", "t", "WRITE_APPEND")
    assert spark.read.parquet(loc).count() == 6
    write_table(df, str(tmp_path), "ds", "t", "WRITE_TRUNCATE")
    assert spark.read.parquet(loc).count() == 3
    assert loc == os.path.join(str(tmp_path), "ds", "t")


def test_write_table_bad_disposition(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path), "ds", "t", "WRITE_NONSENSE")


def test_write_catalog_table_registers_and_schema_lookup_wins(spark, tmp_path):
    from worker_etl_spark.operators import inference
    from worker_etl_spark.sinks.writer import write_catalog_table

    typed = spark.createDataFrame([(1, 1.5)], "k long, v double")
    ident = write_catalog_table(typed, "ingest_ws", "t_catalog_ut", "WRITE_TRUNCATE")
    assert spark.catalog.tableExists(ident)
    # I2 lookup returns logical types from the catalog
    schema = inference.get_existing_schema(spark, ident)
    assert {f["name"]: f["type"] for f in schema} == {"k": "INTEGER", "v": "FLOAT"}
    # I1 chain: catalog wins over what inference would say for string input
    src = spark.createDataFrame([("1", "2")], "k string, v string")
    chain = inference.determine_schema(spark, src, ident, "existing_or_pandas")
    assert {f["name"]: f["type"] for f in chain} == {"k": "INTEGER", "v": "FLOAT"}
    # overwrite twice is idempotent (drop + recreate)
    write_catalog_table(typed, "ingest_ws", "t_catalog_ut", "WRITE_TRUNCATE")
    assert spark.table(ident).count() == 1
    spark.sql(f"DROP TABLE IF EXISTS {ident}")


def test_stdlib_xlsx_roundtrip(tmp_path):
    from worker_etl_spark.sources.excel import (
        default_xlsx_parser,
        stdlib_xlsx_parser,
        write_minimal_xlsx,
    )

    p = str(tmp_path / "t.xlsx")
    write_minimal_xlsx(
        p,
        {
            "S1": [["h1", "h2", "h3"], [1, 2.5, None], [None, True, "x & <y>"]],
            "Sheet Two": [[], ["only", None, "row2"]],
        },
    )
    parsed = stdlib_xlsx_parser(open(p, "rb").read())
    assert parsed["S1"][0] == ["h1", "h2", "h3"]
    assert parsed["S1"][1] == ["1", "2.5"]          # numeric cells keep raw text
    assert parsed["S1"][2] == [None, "True", "x & <y>"]  # gap, bool, escaping
    assert parsed["Sheet Two"] == [[], ["only", None, "row2"]]
    # default chain falls back to the stdlib reader when no codec exists
    assert default_xlsx_parser(open(p, "rb").read()) == parsed


def test_stdlib_xlsx_rejects_non_ooxml():
    import pytest

    from worker_etl_spark.sources.excel import stdlib_xlsx_parser

    with pytest.raises(NotImplementedError, match="xls"):
        stdlib_xlsx_parser(b"\xd0\xcf\x11\xe0 legacy xls magic")


# --- partitioned write → pruned read-back ------------------------------------
def test_partitioned_write_prunes_on_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["hi", "lo"][i % 2], float(i)) for i in range(20)],
        "id long, prio string, amount double",
    )
    loc = write_table(
        df, str(tmp_path), "ds", "t",
        disposition="WRITE_TRUNCATE", partition_by=["prio"],
    )
    # One subdirectory per partition value on disk.
    assert sorted(
        d for d in os.listdir(loc) if d.startswith("prio=")
    ) == ["prio=hi", "prio=lo"]
    back = spark.read.parquet(loc).filter("prio = 'hi'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # The partition-column predicate must land in PartitionFilters (directory
    # pruning), not in the row-level data filters.
    assert "PartitionFilters" in plan
    assert "prio" in plan.split("PartitionFilters")[1].split("]")[0]
    assert back.count() == 10


# --- upsert sink -------------------------------------------------------------
def test_upsert_last_writer_wins_and_tie_prefers_incoming(spark, tmp_path):
    from worker_etl_spark.sinks.writer import upsert_table

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5), (3, "c", 1)], "id long, v string, ver long"
    )
    upsert_table(base, str(tmp_path), "ds", "t", key_cols=["id"], version_col="ver")
    updates = spark.createDataFrame(
        [
            (1, "a2", 2),   # higher version wins
            (2, "b-old", 3),  # lower version loses to existing 5
            (3, "c-tie", 1),  # equal version: incoming wins
            (4, "d", 1),    # new key inserts
        ],
        "id long, v string, ver long",
    )
    loc = upsert_table(
        updates, str(tmp_path), "ds", "t", key_cols=["id"], version_col="ver"
    )
    got = {r.id: (r.v, r.ver) for r in spark.read.parquet(loc).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 5), 3: ("c-tie", 1), 4: ("d", 1)}
    # No staging/backup dirs left behind.
    import glob
    assert not glob.glob(str(tmp_path / "ds" / "*__*"))


# --- small-file compaction ---------------------------------------------------
def test_compact_files_reduces_count_losslessly(spark, tmp_path):
    from worker_etl_spark.sinks.writer import compact_files

    df = spark.range(0, 20_000).selectExpr("id", "id * 2 AS v")
    loc = str(tmp_path / "frag")
    df.repartition(40).write.parquet(loc)
    n_small = len([f for f in os.listdir(loc) if f.endswith(".parquet")])
    assert n_small == 40

    _, before, after = compact_files(spark, loc, target_file_bytes=64 * 1024 * 1024)
    assert before == 40
    assert after < before
    back = spark.read.parquet(loc)
    assert back.count() == 20_000
    assert back.selectExpr("sum(v)").first()[0] == df.selectExpr("sum(v)").first()[0]
    # no staging/old leftovers from the swap
    assert not os.path.exists(loc + ".__staging__")
    assert not os.path.exists(loc + ".__old__")


def test_compact_files_respects_target_size(spark, tmp_path):
    from worker_etl_spark.sinks.writer import compact_files

    df = spark.range(0, 50_000).selectExpr("id", "md5(cast(id as string)) AS pad")
    loc = str(tmp_path / "frag2")
    df.repartition(32).write.parquet(loc)
    # tiny target forces multiple output files: ceil(total/target) > 1
    _, before, after = compact_files(spark, loc, target_file_bytes=64 * 1024)
    assert before == 32
    assert 1 < after < 32
    assert spark.read.parquet(loc).count() == 50_000


def test_w05_sorted_layout_row_group_skipping(spark, tmp_path):
    """Sort clustering must make parquet row-group min/max footers selective:
    after repartitionByRange + sortWithinPartitions on ts, a narrow range
    predicate intersects only a small fraction of row groups (data skipping),
    while the same write unsorted leaves most row groups overlapping."""
    import datetime as dt

    import pyarrow.parquet as pq

    n = 200_000
    df = spark.range(n).selectExpr(
        "id",
        # pseudo-random order arrival of one year of seconds-grain timestamps
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0, (id * 48271) % 31536000)"
        " AS ts",
    )

    def rg_hit_fraction(loc: str) -> float:
        lo = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
        hi = dt.datetime(2024, 6, 8, tzinfo=dt.timezone.utc)
        total = hits = 0
        for root, _dirs, files in os.walk(loc):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                ts_idx = md.schema.names.index("ts")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ts_idx).statistics
                    total += 1
                    if st.min <= hi and st.max >= lo:
                        hits += 1
        assert total > 0
        return hits / total

    sorted_loc = str(tmp_path / "sorted")
    (
        df.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(sorted_loc)
    )
    unsorted_loc = str(tmp_path / "unsorted")
    df.repartition(16).write.mode("overwrite").parquet(unsorted_loc)

    # a 1-week predicate over 1 year: sorted layout touches few row groups,
    # the shuffled layout's row groups all straddle the whole year
    assert rg_hit_fraction(sorted_loc) <= 0.25
    assert rg_hit_fraction(unsorted_loc) >= 0.9


def test_xlsgrid_datasource_partitions_per_sheet(spark, tmp_path):
    """The Python DataSource must (a) plan one input partition per
    (file, sheet) so sheet decode parallelizes, (b) list sheet names from
    record headers without parsing cells, and (c) round-trip cell values
    identically to the direct BIFF parser chain."""
    from worker_etl_spark.sources.biff import write_minimal_xls
    from worker_etl_spark.sources.pyds import (
        XlsGridReader,
        _sheet_names,
        register_xlsgrid,
    )

    path = str(tmp_path / "three.xls")
    sheets = {
        "A": [["h"], ["a1"], ["a2"]],
        "B": [["h"], [1.5]],
        "C": [["h"], [True]],
    }
    write_minimal_xls(path, sheets)

    with open(path, "rb") as fh:
        content = fh.read()
    assert _sheet_names(content) == ["A", "B", "C"]

    reader = XlsGridReader({"path": path})
    parts = reader.partitions()
    assert [p.value[1] for p in parts] == ["A", "B", "C"]

    register_xlsgrid(spark)
    df = spark.read.format("xlsgrid").option("path", path).load()
    assert df.rdd.getNumPartitions() == 3
    rows = {
        (r.sheet, r.row_idx, tuple(r.cells)) for r in df.collect()
    }
    assert ("A", 1, ("a1",)) in rows
    assert ("B", 1, ("1.5",)) in rows
    assert ("C", 1, ("True",)) in rows
    # missing-path and non-xls inputs fail loudly, not silently empty
    import pytest as _pytest

    with _pytest.raises(Exception):
        XlsGridReader({}).partitions()


def test_w06_zorder_skips_on_both_dimensions(spark, tmp_path):
    """Z-order layout must give row-group skipping on BOTH clustered
    columns, while a 1-D sort on x gives skipping on x and none on y.
    With 16 z-range partitions (= 2 Morton bits per axis → a 4×4 block
    grid), a range inside one block-column touches ~4/16 row groups."""
    import pyarrow.parquet as pq

    from worker_etl_spark.queries.sources_q import _morton_z
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).selectExpr(
        "id",
        "CAST((id * 48271) % 4096 AS BIGINT) AS x",
        "CAST((id * 69621) % 4096 AS BIGINT) AS y",
    )

    def rg_hit_fraction(loc: str, col: str, lo: int, hi: int) -> float:
        total = hits = 0
        for root, _dirs, files in os.walk(loc):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                idx = md.schema.names.index(col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    total += 1
                    if st.min <= hi and st.max >= lo:
                        hits += 1
        assert total > 0
        return hits / total

    z_loc = str(tmp_path / "zorder")
    (
        df.withColumn("z", _morton_z(F.col("x"), F.col("y"), bits=12))
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(z_loc)
    )
    x_loc = str(tmp_path / "xsorted")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(x_loc)
    )

    # range [1024, 1151] sits inside one 1024-wide Morton block column/row.
    # repartitionByRange draws its boundaries from a SAMPLE, so the z-cuts
    # shift run to run and the ideal 4/16 hit fraction wobbles (measured
    # 0.375-0.5625 across runs — one boundary row group in or out); bound
    # at 0.75 with the strict 2-D-beats-unsorted-axis assert below, which
    # is the property the layout exists for.
    zx = rg_hit_fraction(z_loc, "x", 1024, 1151)
    zy = rg_hit_fraction(z_loc, "y", 1024, 1151)
    xx = rg_hit_fraction(x_loc, "x", 1024, 1151)
    xy = rg_hit_fraction(x_loc, "y", 1024, 1151)
    layout = f"z:(x={zx:.3f}, y={zy:.3f}) 1d:(x={xx:.3f}, y={xy:.3f})"
    assert zx <= 0.75, layout
    assert zy <= 0.75, layout
    # the 1-D layout skips on its sort key but not the other axis
    assert xx <= 0.25, layout
    assert xy >= 0.9, layout
    # z-order must skip on BOTH axes strictly better than the 1-D layout's
    # unsorted axis (which reads everything)
    assert zx < xy and zy < xy, layout


def test_w07_dynamic_overwrite_leaves_other_partitions_untouched(spark, tmp_path):
    """partitionOverwriteMode=dynamic must replace ONLY the partitions
    present in the incoming frame: other partition directories keep their
    exact files; the target partition's content is the corrected batch."""
    loc = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "p%d" % (i % 3), float(i)) for i in range(300)],
        "id long, part string, v double",
    )
    base.write.partitionBy("part").mode("overwrite").parquet(loc)

    def files_in(part: str) -> set[str]:
        d = os.path.join(loc, f"part={part}")
        return {f for f in os.listdir(d) if f.endswith(".parquet")}

    before_p1 = files_in("p1")
    before_p2 = files_in("p2")

    corrected = spark.createDataFrame(
        [(1000, "p0", -1.0), (1001, "p0", -2.0)], "id long, part string, v double"
    )
    (
        corrected.write.partitionBy("part")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(loc)
    )

    assert files_in("p1") == before_p1
    assert files_in("p2") == before_p2
    back = spark.read.parquet(loc)
    assert back.filter("part = 'p0'").count() == 2
    assert back.filter("part != 'p0'").count() == 200
    assert back.filter("part = 'p0'").agg({"v": "sum"}).first()[0] == -3.0


def test_w08_merge_on_read_equals_compacted_rewrite(spark, tmp_path):
    """The merge-on-read served view (base ⟕̸ delete-log anti join) must be
    row-identical to the copy-on-write rewrite (filtered base), and the
    anti join must broadcast the delete log (the base side never shuffles)."""
    from pyspark.sql import functions as F

    base_loc = str(tmp_path / "base")
    del_loc = str(tmp_path / "dels")
    df = spark.range(10_000).selectExpr("id", "id % 97 AS g", "CAST(id AS DOUBLE) AS v")
    df.write.parquet(base_loc)
    df.filter("id % 7 = 0").select("id").write.parquet(del_loc)

    base = spark.read.parquet(base_loc)
    dels = spark.read.parquet(del_loc)
    served = base.join(F.broadcast(dels), on="id", how="left_anti")
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    cow_loc = str(tmp_path / "rewritten")
    served.write.parquet(cow_loc)  # compaction folds the log in
    back = spark.read.parquet(cow_loc)
    assert back.count() == served.count() == 10_000 - len(range(0, 10_000, 7))
    assert back.exceptAll(served).count() == 0
    assert served.exceptAll(back).count() == 0


def test_w09_snapshot_versions_and_latest(spark, tmp_path):
    """snapshot_write must assign increasing versions, keep every version
    readable, and resolve _LATEST to the newest commit."""
    from worker_etl_spark.sinks.writer import read_snapshot, snapshot_write

    wh = str(tmp_path)
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    assert snapshot_write(df, wh, "ds", "t") == 1
    assert snapshot_write(df.filter("id < 40"), wh, "ds", "t") == 2
    assert read_snapshot(spark, wh, "ds", "t", version=1).count() == 100
    assert read_snapshot(spark, wh, "ds", "t", version=2).count() == 40
    assert read_snapshot(spark, wh, "ds", "t").count() == 40  # _LATEST → v2


def test_w09_snapshot_concurrent_writers_race(spark, tmp_path):
    """Round-6 verdict #4: two committers racing the version claim and the
    ``_LATEST`` atomic rename must (a) never share or tear a version dir,
    (b) leave every committed version fully readable, and (c) leave
    ``_LATEST`` pointing at a version some committer actually committed —
    last-committer-wins, no torn reads.  Spark schedules jobs from multiple
    driver threads concurrently, so this is a REAL interleaving of the
    staging write + rename-claim + manifest replace, not a simulation."""
    import os as _os
    import threading

    from worker_etl_spark.sinks.writer import read_snapshot, snapshot_write

    wh = str(tmp_path)
    committed: list[int] = []
    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def committer(tag: int) -> None:
        try:
            df = spark.range(200).selectExpr("id", f"id * {tag + 2} AS v")
            for _ in range(4):
                barrier.wait(timeout=120)  # maximize claim collisions
                committed.append(snapshot_write(df, wh, "ds", "t"))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    # every claim unique and the version sequence dense from 1..8
    assert sorted(committed) == list(range(1, 9))
    loc = _os.path.join(wh, "ds", "t")
    # no staging debris or torn dirs left behind
    assert not [d for d in _os.listdir(loc) if d.startswith("_staging_")]
    assert not [d for d in _os.listdir(loc) if d.startswith("_LATEST.tmp")]
    # every committed version is a complete parquet snapshot
    for v in range(1, 9):
        assert read_snapshot(spark, wh, "ds", "t", version=v).count() == 200
    # _LATEST resolves to a committed version (last committer won)
    with open(_os.path.join(loc, "_LATEST"), encoding="utf-8") as fh:
        latest = int(fh.read().strip())
    assert latest in committed
    assert read_snapshot(spark, wh, "ds", "t").count() == 200


def test_w10_manifest_prunes_files(spark):
    """The manifest must hand the serving query a strict subset of the
    clustered files for a narrow time range, and the selected spans must
    cover the predicate range."""
    import datetime as dt

    from worker_etl_spark.queries.sources_q import (
        _W10_HI,
        _W10_LO,
        _w10_layout,
    )

    loc, manifest = _w10_layout(spark, "/root/testdata/sf0.001")
    rows = manifest.collect()
    assert len(rows) > 1  # layout actually produced multiple files
    lo = dt.datetime.fromisoformat(_W10_LO)
    hi = dt.datetime.fromisoformat(_W10_HI)
    picked = [r for r in rows if r.min_ts < hi and r.max_ts >= lo]
    # pruning is real: the 5-day window of a 30-day corpus skips files
    assert 0 < len(picked) < len(rows)
    # survivor spans jointly cover the predicate window (no false negative:
    # every event in range lives in a picked file because files partition ts)
    assert min(r.min_ts for r in picked) <= lo
    assert max(r.max_ts for r in picked) >= hi - dt.timedelta(microseconds=1)


def test_w14_vacuum_keeps_recent_and_latest(spark, tmp_path):
    """vacuum_snapshots must delete only versions older than the retention
    window, never the committed latest, and leave survivors readable."""
    import pytest as _pytest

    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        snapshot_write,
        vacuum_snapshots,
    )

    wh = str(tmp_path)
    df = spark.range(10).selectExpr("id", "id * 3 AS v")
    for _ in range(4):
        snapshot_write(df, wh, "ds", "t")  # versions 1..4

    removed = vacuum_snapshots(wh, "ds", "t", keep=2)
    assert removed == [1, 2]
    # survivors still readable; latest resolves
    assert read_snapshot(spark, wh, "ds", "t", version=3).count() == 10
    assert read_snapshot(spark, wh, "ds", "t").count() == 10
    # vacuumed version fails loudly
    with _pytest.raises(Exception):
        read_snapshot(spark, wh, "ds", "t", version=1).count()
    # keep=1 retains only latest
    assert vacuum_snapshots(wh, "ds", "t", keep=1) == [3]
    with _pytest.raises(ValueError):
        vacuum_snapshots(wh, "ds", "t", keep=0)


def test_vacuum_protects_versions_borrowed_by_live_clones(spark, tmp_path):
    """Round-8 ADVICE: a shallow clone registers its borrow in the SOURCE
    location, so vacuuming the source refuses to delete the borrowed
    version while the clone lives, garbage-collects the registration once
    the clone is gone, and read_snapshot names the hazard clearly if the
    borrowed files vanish anyway."""
    import shutil

    import pytest as _pytest

    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        shallow_clone,
        snapshot_write,
        vacuum_snapshots,
    )

    wh = str(tmp_path)
    df = spark.range(10).selectExpr("id", "id * 3 AS v")
    snapshot_write(df, wh, "ds", "src")  # v1
    assert shallow_clone(wh, "ds", "src", "dev") == 1
    for _ in range(3):
        snapshot_write(df, wh, "ds", "src")  # v2..v4

    # v1 is borrowed by the live clone: keep=1 must NOT delete it
    removed = vacuum_snapshots(wh, "ds", "src", keep=1)
    assert 1 not in removed and removed == [2, 3]
    assert read_snapshot(spark, wh, "ds", "dev").count() == 10  # clone intact

    # clone deleted → registration is stale → next vacuum reclaims v1
    shutil.rmtree(str(tmp_path / "ds" / "dev"))
    assert vacuum_snapshots(wh, "ds", "src", keep=1) == [1]
    assert not [
        f for f in (tmp_path / "ds" / "src").iterdir() if f.name.startswith("_clone.")
    ]

    # a manifest whose borrowed files are gone fails with the named hazard
    snapshot_write(df, wh, "ds", "src2")
    shallow_clone(wh, "ds", "src2", "dev2")
    shutil.rmtree(str(tmp_path / "ds" / "src2" / "_v1"))
    with _pytest.raises(FileNotFoundError, match="vacuumed out from under"):
        read_snapshot(spark, wh, "ds", "dev2")


def test_xlsgrid_datasource_reads_xlsx_and_mixed_dirs(spark, tmp_path):
    """Round-4 verdict #8 (prepared during the freeze): the xlsgrid Python
    DataSource handles OOXML .xlsx through the SAME per-(file, sheet)
    partition contract as legacy .xls — planner-side sheet listing reads
    only workbook.xml, each partition decodes only its own worksheet
    member, and a mixed-generation directory plans one partition per sheet
    across both formats."""
    from worker_etl_spark.sources.biff import write_minimal_xls
    from worker_etl_spark.sources.excel import write_minimal_xlsx
    from worker_etl_spark.sources.pyds import (
        XlsGridReader,
        _sheet_names,
        register_xlsgrid,
    )

    xlsx = str(tmp_path / "modern.xlsx")
    write_minimal_xlsx(
        xlsx,
        {
            "First": [["h1", "h2"], ["água", 1.5], [None, "x"]],
            "Second": [["only"], [True]],
        },
    )
    with open(xlsx, "rb") as fh:
        assert _sheet_names(fh.read()) == ["First", "Second"]

    register_xlsgrid(spark)
    df = spark.read.format("xlsgrid").option("path", xlsx).load()
    assert df.rdd.getNumPartitions() == 2
    rows = {(r.sheet, r.row_idx, tuple(r.cells)) for r in df.collect()}
    assert ("First", 1, ("água", "1.5")) in rows
    assert ("Second", 1, ("True",)) in rows

    # mixed-generation directory: partitions fan out across both formats
    write_minimal_xls(str(tmp_path / "legacy.xls"), {"L": [["v"], ["7"]]})
    reader = XlsGridReader({"path": str(tmp_path)})
    parts = [(p.value[0].rsplit("/", 1)[-1], p.value[1]) for p in reader.partitions()]
    assert parts == [
        ("legacy.xls", "L"),
        ("modern.xlsx", "First"),
        ("modern.xlsx", "Second"),
    ]
    dfd = spark.read.format("xlsgrid").option("path", str(tmp_path)).load()
    assert dfd.rdd.getNumPartitions() == 3
    got = {(r.file, r.sheet, r.row_idx, tuple(r.cells)) for r in dfd.collect()}
    assert ("legacy.xls", "L", 1, ("7",)) in got
    assert ("modern.xlsx", "Second", 1, ("True",)) in got

    # non-Excel bytes fail loudly at planning time
    bad = tmp_path / "junk.xls"
    bad.write_bytes(b"not excel at all")
    import pytest as _pytest

    with _pytest.raises(Exception, match="neither"):
        XlsGridReader({"path": str(bad)}).partitions()


def test_xlsgrid_option_pruning_prunes_partitions(spark, tmp_path):
    """Partition pruning via IMMUTABLE per-load read options: ``sheets`` /
    ``files`` drop non-matching (file, sheet) InputPartitions at plan time
    — a single-sheet read decodes ONE sheet — and, because the options are
    fixed at load(), every query over the same frame sees the same
    partitions (the property Spark 4.1's pushFilters API cannot give a
    stateful reader; see the regression test below)."""
    from worker_etl_spark.sources.biff import write_minimal_xls
    from worker_etl_spark.sources.excel import write_minimal_xlsx
    from worker_etl_spark.sources.pyds import register_xlsgrid

    write_minimal_xls(
        str(tmp_path / "a.xls"), {"S1": [["v"], ["1"]], "S2": [["v"], ["2"]]}
    )
    write_minimal_xlsx(
        str(tmp_path / "b.xlsx"), {"S3": [["v"], ["3"]], "S4": [["v"], ["4"]]}
    )
    register_xlsgrid(spark)

    def read():  # fresh builder per load: DataFrameReader.option mutates
        return spark.read.format("xlsgrid").option("path", str(tmp_path))

    assert read().load().rdd.getNumPartitions() == 4
    one = read().option("sheets", "S3").load()
    assert one.rdd.getNumPartitions() == 1
    assert sorted((r.sheet, r.row_idx) for r in one.collect()) == [("S3", 0), ("S3", 1)]
    two = read().option("sheets", "S1, S2").option("files", "a.xls").load()
    assert two.rdd.getNumPartitions() == 2
    assert sorted({(r.file, r.sheet) for r in two.collect()}) == [
        ("a.xls", "S1"), ("a.xls", "S2"),
    ]
    # JSON form for names containing commas
    js = read().option("sheets", '["S1","S4"]').load()
    assert js.rdd.getNumPartitions() == 2
    # row-grain predicates stay Spark-side and correct on pruned frames
    assert one.filter("row_idx > 0").count() == 1


def test_xlsgrid_pushfilters_unsound_on_this_spark(spark, tmp_path):
    """Regression pin for WHY xlsgrid prunes via read options instead of
    the Spark 4.1 Python-DataSource pushFilters API: the planner keeps
    post-pushFilters reader state per RELATION and skips the call for
    queries with no pushdown-eligible conjuncts, so a stateful pruning
    reader silently corrupts later queries over the same loaded frame
    (measured: after filter(sheet=...).count(), a plain df.count()
    returned the pruned count).  This test asserts the SAFE behavior of
    the shipped reader: a pruned query never changes a sibling query's
    result on the same frame."""
    from worker_etl_spark.sources.biff import write_minimal_xls
    from worker_etl_spark.sources.pyds import register_xlsgrid

    write_minimal_xls(
        str(tmp_path / "a.xls"), {"S1": [["v"], ["1"]], "S2": [["v"], ["2"]]}
    )
    register_xlsgrid(spark)
    df = spark.read.format("xlsgrid").option("path", str(tmp_path)).load()
    assert df.filter("sheet = 'S1'").count() == 2
    assert df.count() == 4  # unchanged by the sibling filtered query
    assert df.filter("sheet = 'S1' or row_idx = 1").count() == 3


# --- cow_delete (w19): file skipping, borrow chain, vacuum protection ------------
def _cow_fixture(spark, tmp_path):
    from pyspark.sql import functions as F

    from worker_etl_spark.sinks.writer import cow_delete, snapshot_write

    df = spark.range(8000).selectExpr("id AS k", "id % 97 AS v")
    snapshot_write(df.repartitionByRange(8, F.col("k")), str(tmp_path), "ds", "t")
    stats = cow_delete(spark, str(tmp_path), "ds", "t", "k", 1000, 2999)
    return df, stats


def test_cow_delete_skips_disjoint_files_and_serves_correctly(spark, tmp_path):
    """A range delete on a range-clustered table must rewrite only the
    files whose footer stats intersect the range (a strict minority of 8)
    and the served snapshot must equal the filtered source exactly."""
    from worker_etl_spark.sinks.writer import read_snapshot

    df, stats = _cow_fixture(spark, tmp_path)
    assert stats["n_files"] == 8
    assert 1 <= stats["n_rewritten"] <= 3, stats  # ~2k of 8k keys span ~2 files
    assert stats["n_borrowed"] == stats["n_files"] - stats["n_rewritten"]
    assert stats["n_deleted_rows"] == 2000
    got = read_snapshot(spark, str(tmp_path), "ds", "t")
    assert got.count() == 6000
    assert got.filter("k BETWEEN 1000 AND 2999").count() == 0
    # borrowed files are the SOURCE version's bytes, by path
    assert got.selectExpr("sum(v)").first()[0] == sum(
        i % 97 for i in range(8000) if not 1000 <= i <= 2999
    )


def test_cow_vacuum_protects_borrowed_version_to_fixpoint(spark, tmp_path):
    """vacuum(keep=1) must NOT delete v1 while the CoW v2 borrows its
    files; once a full v3 supersedes the chain, both go, and a pinned read
    of the vacuumed CoW version fails loudly."""
    import pytest as _pytest

    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        snapshot_write,
        vacuum_snapshots,
    )

    df, _ = _cow_fixture(spark, tmp_path)
    assert vacuum_snapshots(str(tmp_path), "ds", "t", keep=1) == []
    assert read_snapshot(spark, str(tmp_path), "ds", "t", version=2).count() == 6000
    snapshot_write(df.limit(10), str(tmp_path), "ds", "t")  # v3, no borrows
    assert sorted(vacuum_snapshots(str(tmp_path), "ds", "t", keep=1)) == [1, 2]
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path), "ds", "t", version=2)


def test_shallow_clone_of_cow_version_carries_borrowed_files(spark, tmp_path):
    """Cloning a CoW version must reference its borrowed files too — the
    clone reads equal to the CoW snapshot, and vacuuming the SOURCE keeps
    the clone readable (the clone registration + borrow chain compose)."""
    from worker_etl_spark.sinks.writer import read_snapshot, shallow_clone

    _, _ = _cow_fixture(spark, tmp_path)
    shallow_clone(str(tmp_path), "ds", "t", "t_clone")
    got = read_snapshot(spark, str(tmp_path), "ds", "t_clone")
    assert got.count() == 6000
    assert got.filter("k BETWEEN 1000 AND 2999").count() == 0


def test_transitive_clone_survives_intermediate_clone_deletion(spark, tmp_path):
    """src -> clone c1 -> clone c2, then DELETE c1 (normal dev teardown):
    c2's borrow registration lives in SRC (the owner of the bytes), so
    src's vacuum must keep protecting the borrowed version and c2 stays
    readable."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        shallow_clone,
        snapshot_write,
        vacuum_snapshots,
    )

    wh = str(tmp_path)
    base = spark.range(50).selectExpr("id", "id * 3 AS v")
    snapshot_write(base, wh, "ds", "src")                      # src v1
    shallow_clone(wh, "ds", "src", "c1")
    shallow_clone(wh, "ds", "c1", "c2")                        # borrows SRC files
    snapshot_write(base.limit(5), wh, "ds", "src")             # src v2
    _shutil.rmtree(os.path.join(wh, "ds", "c1"))               # c1 torn down
    removed = vacuum_snapshots(wh, "ds", "src", keep=1)
    assert removed == [], f"v1 vacuumed despite c2's live borrow: {removed}"
    got = read_snapshot(spark, wh, "ds", "c2")
    assert got.agg(F.sum("v")).first()[0] == sum(i * 3 for i in range(50))
