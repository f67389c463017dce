"""Untyped file sources: CSV grids (reference S1/S2) and grid helpers.

Reference semantics reproduced (SURVEY.md §2 A.1):
- S1 existence gate: a missing object raises ``FileNotFoundError`` so the
  orchestrator can ACK-and-skip rather than retry (``etl.py:514-523``,
  ack semantics ``etl.py:1346-1348``).
- S2 untyped scan: every cell enters the engine as a string — header
  detection and typing happen downstream (``dtype=str, header=None``,
  ``etl.py:534``); Spark's CSV inference is explicitly disabled.
- Delimiter sniffing: the reference uses pandas' python-engine sniffer
  (``sep=None``, ``etl.py:548-557``); Spark has no native sniffing, so we
  sample the head of the file on the driver and pick the most consistent
  candidate delimiter — one tiny driver-side read, then a fully distributed
  scan with the chosen separator.

Scale posture: the distributed read is a plain ``spark.read.csv`` (splittable,
no UDFs).  ``row_idx`` must be the CONTIGUOUS 0-based file position per
(file, sheet) — detection bboxes are positional and ``extract_table`` slices
by ``row_idx`` range — so it is derived with ``row_number()`` per file,
ordered by ``(_metadata.file_block_start, monotonically_increasing_id)``:
the split's byte offset orders splits within a file even when Spark packs
splits into partitions out of file order (it sorts splits by size), and the
monotonic id orders rows within a split.  The per-file window shuffles each
file into one task — acceptable because every downstream grid consumer
(``detect_tables``'s per-sheet ``applyInPandas``) already requires the whole
sheet in one group; sheet-shaped files are human-scale, and the 100 TB path
is typed parquet, not untyped grids.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_SHEET = "_default_"  # CSV/Parquet become this synthetic sheet (etl.py:1256-1258)
_CANDIDATE_DELIMS = [",", ";", "\t", "|"]
_SNIFF_BYTES = 65536


def require_exists(path: str) -> None:
    """S1 existence gate: raise FileNotFoundError for a missing object."""
    if not _glob.glob(path):
        raise FileNotFoundError(path)


def sniff_delimiter(sample: str, candidates: list[str] | None = None) -> str:
    """Pick the delimiter whose per-line count is high and most consistent
    across the sampled non-empty lines.  Falls back to ','."""
    lines = [ln for ln in sample.splitlines() if ln.strip()][:20]
    if not lines:
        return ","
    best, best_key = ",", (-1.0, -1.0)
    for d in candidates or _CANDIDATE_DELIMS:
        counts = [ln.count(d) for ln in lines]
        if min(counts) == 0:
            continue
        mean = sum(counts) / len(counts)
        consistency = sum(1 for c in counts if c == counts[0]) / len(counts)
        key = (consistency, mean)
        if key > best_key:
            best, best_key = d, key
    return best


def read_csv_grid(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    sheet: str = DEFAULT_SHEET,
    multiline: bool = False,
) -> DataFrame:
    """Untyped CSV → grid DataFrame (file, sheet, row_idx, '0'..'N-1' strings).

    All-string, no header, no inference — the reference's untyped scan.  When
    *delimiter* is None the head of the first matching file is sniffed on the
    driver (single small read; the distributed scan uses the result).
    """
    require_exists(path)
    if delimiter is None:
        import gzip as _gzip

        first = sorted(_glob.glob(path))[0]
        opener = _gzip.open if first.endswith(".gz") else open
        with opener(first, "rt", errors="replace") as fh:
            delimiter = sniff_delimiter(fh.read(_SNIFF_BYTES))
    reader = (
        spark.read.option("header", "false")
        .option("inferSchema", "false")
        .option("sep", delimiter)
    )
    if multiline:
        # RFC-4180 quoted records with embedded newlines/delimiters: the
        # parser must see whole records, so each FILE becomes one split
        # (non-splittable, like gzip — parallelism is across files).  The
        # default line-mode stays splittable-by-block, which is why this is
        # opt-in rather than always-on.
        reader = (
            reader.option("multiLine", "true")
            .option("quote", '"')
            .option("escape", '"')
        )
    df = reader.csv(path)
    cells = [F.col(c).alias(str(i)) for i, c in enumerate(df.columns)]
    # Exact in-file row order: split byte-offset first (partition packing may
    # reorder splits), then the monotonic id (row order within a split).
    order_window = Window.partitionBy("file").orderBy("_blk", "_mid")
    return (
        df.select(
            F.col("_metadata.file_name").alias("file"),
            F.lit(sheet).alias("sheet"),
            F.col("_metadata.file_block_start").alias("_blk"),
            F.monotonically_increasing_id().alias("_mid"),
            *cells,
        )
        .withColumn("row_idx", (F.row_number().over(order_window) - 1).cast("long"))
        .select("file", "sheet", "row_idx", *[str(i) for i in range(len(cells))])
    )


def widen_grid(df: DataFrame, n_cols: int | None = None) -> DataFrame:
    """(file, sheet, row_idx, cells array<string>) → wide '0'..'N-1' grid.

    *n_cols* defaults to the max row width (one cheap aggregate).  Used by
    sources that produce ragged rows (Excel sheets).
    """
    if n_cols is None:
        n_cols = df.agg(F.max(F.size("cells"))).collect()[0][0] or 0
    return df.select(
        "file",
        "sheet",
        "row_idx",
        # try_element_at: ragged rows (short cell arrays) pad with NULL
        # instead of raising under ANSI mode.
        *[F.try_element_at("cells", F.lit(i + 1)).alias(str(i)) for i in range(n_cols)],
    )
