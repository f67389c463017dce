"""Schema inference & coercion operators (reference SURVEY.md §2 A.4: I1-I7).

The reference infers a column's logical type by attempting pandas conversions
over EVERY row, with a precedence chain full of deliberate quirks
(``infer_schema_pandas``, ``etl.py:851-924``):

    int → float → datetime (guarded: skipped when every cell is all-digits,
    so IDs/ZIPs stay numeric, ``etl.py:884``) → boolean-token-set → string

and notably 0/1 columns become INTEGER (int wins before the boolean check,
``etl.py:864-871``) and "1.0"-style strings become INTEGER (pandas safe-casts
integral floats).

Spark-first re-expression: a single column-pruned scan computes, for all
columns at once, the cast-success counters the precedence needs — via an
Arrow-batched numpy kernel (``_counter_scan``) that emits one tiny
partial-counter row per (batch, column), so only counters (never cells)
cross the shuffle.  At 100 TB this is one map-shaped job instead of pandas'
N per-column passes, and parallelism equals input splits.

Coercion (``align_dataframe_to_schema``, ``etl.py:1012-1152``) becomes a
single projection of ``try_cast``-style expressions: bad cell → NULL, never a
row failure.  One documented divergence: for INTEGER targets the reference
coerces per-cell but bails out on the whole column if any value is a
non-integral float (the ``astype('Int64')`` exception path,
``etl.py:1073-1075, 1137-1144``); this engine nulls just the offending cell,
which is the behavior the coercion contract describes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from worker_etl_spark.config import BOOL_FALSE_TOKENS, BOOL_TRUE_TOKENS

#: Accepted logical types (the reference's validation whitelist, etl.py:793-797).
TYPE_WHITELIST = frozenset(
    {
        "STRING", "BYTES", "INTEGER", "INT64", "FLOAT", "FLOAT64", "NUMERIC",
        "BIGNUMERIC", "BOOLEAN", "BOOL", "TIMESTAMP", "DATE", "TIME",
        "DATETIME", "GEOGRAPHY", "JSON", "INTERVAL",
    }
)

#: logical type → Spark type (SURVEY.md §1.3 mapping).
LOGICAL_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 9),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATETIME": T.TimestampNTZType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # Spark has no TimeType; normalized HH:mm:ss strings
    "JSON": T.StringType(),
    "GEOGRAPHY": T.StringType(),  # WKT passthrough
    "INTERVAL": T.DayTimeIntervalType(),
}

_BOOL_TOKENS = tuple(BOOL_TRUE_TOKENS) + tuple(BOOL_FALSE_TOKENS)


def _lower_preimage(tokens: tuple[str, ...]) -> list[str] | None:
    """Every string whose ``str.lower()`` equals one of *tokens* — so the
    counter kernel can run one hash-set ``isin`` instead of materializing a
    lowercased copy of every cell (measured 7-12× cheaper per column).

    Valid only when the enumeration IS the full preimage: LOWERCASE ASCII
    tokens with no 'k'.  Verified by exhaustive scan over all of Unicode
    (opt r13): U+212A KELVIN SIGN is the ONLY non-ASCII codepoint whose
    ``str.lower()`` is a single ASCII character ('k'), so excluding
    'k'-bearing tokens makes the ASCII case-product complete.  (U+017F ſ
    maps to 's' only under ``casefold``, never ``str.lower`` — both kernel
    paths agree on it; U+0130 İ lowercases to TWO codepoints and can't
    match.)  A MIXED-CASE token has an EMPTY preimage under str.lower()
    (lower() never emits an uppercase letter), so emitting its case
    variants would overcount — return None and take the exact fallback
    (round-12 ADVICE).  Returns None whenever the token set is outside the
    safe domain, and the caller falls back to lower().
    """
    from itertools import product

    out: set[str] = set()
    for t in tokens:
        if not t.isascii() or "k" in t or t != t.lower():
            return None
        choices = [
            (ch, ch.upper()) if ch.isalpha() else (ch,) for ch in t
        ]
        if len(choices) > 6:  # bound the expansion; fall back instead
            return None
        for combo in product(*choices):
            out.add("".join(combo))
    return sorted(out)


_BOOL_VARIANTS = _lower_preimage(_BOOL_TOKENS)

# 2^63 expressed as the nearest double below it — integral-double → long guard.
_LONG_RANGE = 9.2e18


def spark_type_to_logical(dt: T.DataType) -> str:
    """Typed-column → logical type (the reference's dtype map, etl.py:226-233)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "INTEGER"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "FLOAT"
    if isinstance(dt, T.DecimalType):
        return "NUMERIC"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.TimestampNTZType):
        return "DATETIME"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.DayTimeIntervalType):
        return "INTERVAL"
    if isinstance(dt, T.BinaryType):
        return "BYTES"
    return "STRING"


@dataclass
class ColumnStats:
    """try_cast success counters for one string column (one scan, all columns)."""

    total: int
    non_null: int
    num_ok: int
    int_ok: int
    digits: int
    ts_ok: int
    bool_ok: int

    def decide(self) -> str:
        """Reference precedence (etl.py:860-913) over the counters."""
        n = self.non_null
        if n == 0:
            return "STRING"  # fully-null stays object → STRING
        if self.num_ok == n and self.int_ok == n:
            return "INTEGER"
        if self.num_ok == n:
            return "FLOAT"
        # datetime guard: skipped when EVERY row (nulls render as 'nan' in the
        # reference and fail the digit regex, so any null disables the guard)
        # is an all-digit string (etl.py:884).
        if self.digits < self.total and self.ts_ok == n:
            return "TIMESTAMP"
        if self.bool_ok == n:
            return "BOOLEAN"
        return "STRING"


# Timestamp detection domain: ISO-date-prefixed strings only.  The regex
# gate costs far less than a full timestamp parse on every cell (numeric
# columns would otherwise pay the parser's failure path 600k× per column),
# and it pins the detector to a format both Spark and DuckDB parse
# identically — engine-specific parser quirks on odd strings ('2019',
# '12:30') can't skew the counter.  The reference's digit-guard already
# excludes bare numbers from datehood (etl.py:884); this is the same idea
# made explicit and cheap.
TS_GATE_RE = r"^\d{4}-\d{2}-\d{2}"


#: counter families a scan can compute; "cheap" ones use only C-vectorized
#: pandas kernels, the rest pay a per-cell regex / parse on SOME cells.
_ALL_FAMILIES = ("nn", "num", "int", "dig", "ts", "bool")


def _counter_scan(
    df: DataFrame, cols: list[str], families: tuple[str, ...]
) -> dict[str, dict[str, int]]:
    """One Arrow-batched scan → requested counters for *cols*.

    Per-cell type probing is scalar computation with no relational structure —
    exactly the shape where interpreted Catalyst expressions lose to numpy
    (the expression-bundle formulation paid ~1 µs/cell/probe; ``pd.to_numeric``
    is ~0.1 µs/cell).  The kernel emits one partial-counter row per
    (batch, column); only those tiny rows cross the shuffle into the final
    sum — the scan itself is map-shaped, so at 100 TB parallelism equals
    input splits and nothing re-partitions raw strings.

    Semantics pinned to the oracle pair (Spark ``try_cast``/DuckDB
    ``TRY_CAST``): 'nan'-literal strings count as numeric-cast successes but
    never as integral; ``inf == floor(inf)`` so infinities count as integral
    (the same quirk the expression formulation had); the digit and
    timestamp-gate regexes are ASCII classes ([0-9]) to match Java/DuckDB
    ``\\d``.
    """
    import numpy as np
    import pandas as pd

    if not cols:
        return {}
    fams = families
    bool_tokens = list(_BOOL_TOKENS)
    bool_variants = _BOOL_VARIANTS

    def _regex_mask(series, pattern):
        """Vectorized anchored regex over a no-null string Series: pyarrow's
        RE2 kernel when available (~5× cheaper than pandas' per-cell
        ``re``), else the pandas path.  Patterns here are pure character
        classes/quantifiers — identical semantics in RE2 and ``re``."""
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            arr = pa.array(series, type=pa.string(), from_pandas=True)
            return pc.match_substring_regex(arr, "^" + pattern).to_numpy(
                zero_copy_only=False
            )
        except Exception:  # noqa: BLE001 — fall back to pandas regex
            # RE2's '$' anchors at end-of-TEXT; Python re's '$' also matches
            # before a trailing newline, so a $-anchored pattern must run as
            # fullmatch here or the two paths disagree on values like
            # '123\n' (round-12 ADVICE; the prefix-gate patterns keep
            # str.match semantics, which are identical in both engines).
            if pattern.endswith("$"):
                return series.str.fullmatch(pattern[:-1]).eq(True).to_numpy()
            return series.str.match(pattern).eq(True).to_numpy()

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"col": [], "total": []}
            for f in fams:
                out[f] = []
            for c in cols:
                s = pdf[c]
                notna = s.notna()
                rec = {"nn": int(notna.sum())}
                v = pd.to_numeric(s, errors="coerce").astype("float64")
                ok = v.notna()
                fail = s[notna & ~ok]
                if "num" in fams:
                    # to_numeric conflates a 'nan' literal (cast success
                    # in both engines) with parse failure — recover it
                    # from the failure subset only.
                    nanlike = (
                        int(fail.str.lower().isin(["nan", "+nan", "-nan"]).sum())
                        if len(fail)
                        else 0
                    )
                    rec["num"] = int(ok.sum()) + nanlike
                if "int" in fams:
                    arr = v.to_numpy()
                    rec["int"] = int((arr == np.floor(arr)).sum())
                if "dig" in fams:
                    rec["dig"] = int(
                        (_regex_mask(s.fillna(""), "[0-9]+$") & notna.to_numpy()).sum()
                    )
                if "ts" in fams:
                    # The gate only ever fires on double-cast FAILURES: a
                    # castable string (sign, digits, '.', exponent) can never
                    # contain '-' after four leading digits, so probing the
                    # failure subset is exactly the full-column counter — and
                    # costs nothing on numeric columns.
                    rec["ts"] = 0
                    if len(fail):
                        gated = fail[
                            _regex_mask(fail, "[0-9]{4}-[0-9]{2}-[0-9]{2}")
                        ]
                        if len(gated):
                            # parse each UNIQUE gated string once and weight
                            # by its count (opt r12, guide §4): format="mixed"
                            # parses per element, so dedup is exact — date
                            # columns have ~thousands of distinct values per
                            # hundreds of thousands of cells.
                            vc = gated.value_counts()
                            ok_mask = (
                                pd.to_datetime(
                                    pd.Series(vc.index),
                                    errors="coerce",
                                    format="mixed",
                                )
                                .notna()
                                .to_numpy()
                            )
                            rec["ts"] = int(vc.to_numpy()[ok_mask].sum())
                if "bool" in fams:
                    # hash-set membership against the precomputed lower()
                    # preimage — skips a lowercased copy of every cell
                    # (7-12× per column); falls back when the token set is
                    # outside the safe enumeration domain.
                    if bool_variants is not None:
                        rec["bool"] = int(s.isin(bool_variants).sum())
                    else:
                        rec["bool"] = int(s.str.lower().isin(bool_tokens).sum())
                out["col"].append(c)
                out["total"].append(len(pdf))
                for f in fams:
                    out[f].append(rec.get(f, 0))
            yield pd.DataFrame(out)

    schema = "col string, total long, " + ", ".join(f"{f} long" for f in fams)
    from worker_etl_spark.sources.tables import spread

    # spread(): a single-row-group/one-object source gives the scan ONE
    # split, serializing the whole Arrow kernel on one worker; at real
    # scale (many splits) this is a no-op and the map-shape claim above
    # holds unchanged.
    partial = spread(df.select(*[F.col(f"`{c}`") for c in cols])).mapInPandas(
        kernel, schema=schema
    )
    agg = partial.groupBy("col").agg(
        F.sum("total").alias("total"), *[F.sum(f).alias(f) for f in fams]
    )
    res: dict[str, dict[str, int]] = {
        c: {"total": 0, **{f: 0 for f in fams}} for c in cols
    }
    for row in agg.collect():
        res[row["col"]] = {
            "total": int(row["total"]),
            **{f: int(row[f] or 0) for f in fams},
        }
    return res


def column_stats(df: DataFrame, columns: list[str] | None = None) -> dict[str, ColumnStats]:
    """One scan → full counters for every string column."""
    str_cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    counts = _counter_scan(df, str_cols, _ALL_FAMILIES)
    return {
        c: ColumnStats(
            total=k["total"],
            non_null=k["nn"],
            num_ok=k["num"],
            int_ok=k["int"],
            digits=k["dig"],
            ts_ok=k["ts"],
            bool_ok=k["bool"],
        )
        for c, k in counts.items()
    }


def _decide_types(df: DataFrame, str_cols: list[str]) -> dict[str, str]:
    """Single counter scan → ``{column: logical type}``.

    One Arrow-batched ``_counter_scan`` pass computes every counter the
    reference precedence (etl.py:860-913) needs.  The expensive probes are
    self-gating inside the kernel: the timestamp parse touches only
    double-cast-failure cells (zero on numeric columns), so a second
    phase-restricted scan would only re-pay the dominant cost — the scan +
    stringify itself — to save work that is already near-free.  (The earlier
    Catalyst-expression formulation, 6 counters × N columns in one aggregate,
    paid interpreted per-cell cast/regex cost — ~65 s at sf0.1 — where the
    vectorized kernel is bounded by the parquet scan.)
    """
    decisions: dict[str, str] = {}
    if not str_cols:
        return decisions
    # The reference's digit guard ("every cell all-digits → not a date",
    # etl.py:884) is a tautology in counter form: a column reaching the
    # timestamp branch has num < nn, i.e. some cell failed the double cast,
    # and every all-digit string casts — so dig <= num < nn <= total and the
    # guard always passes.  No digit counter needed.
    counts = _counter_scan(df, str_cols, ("nn", "num", "int", "ts", "bool"))
    for c in str_cols:
        k = counts[c]
        nn, num = k["nn"], k["num"]
        if nn == 0:
            decisions[c] = "STRING"
        elif num == nn and k["int"] == nn:
            decisions[c] = "INTEGER"
        elif num == nn:
            decisions[c] = "FLOAT"
        elif k["ts"] == nn:
            decisions[c] = "TIMESTAMP"
        elif k["bool"] == nn:
            decisions[c] = "BOOLEAN"
        else:
            decisions[c] = "STRING"
    return decisions


#: logical operators a frame may contain for file-level sampling to be
#: faithful: a re-read reproduces scan + column projection, nothing else.
#: Limits are deliberately NOT whitelisted (ADVICE r5): a caller's
#: ``.limit(n)`` would be silently dropped by the file re-read — the exact
#: failure mode this validation rejects Filter/Sample for — and
#: ``infer_schema`` never introduces a limit itself, so nothing legitimate
#: needs the exemption.
_FILE_SAMPLE_OK_OPS = frozenset({"Project", "Relation", "SubqueryAlias", "View"})


def _sample_input_files(df: DataFrame, fraction: float) -> DataFrame:
    """Keep a deterministic *fraction* of the frame's input files and
    re-read only those — file-granular sampling that actually prunes reads
    (a row predicate still pays for every byte).  File choice is by md5 of
    the file NAME (driver-side, once per file — not per row), so the same
    files are picked on any cluster; ties broken by name.  The stringify/
    projection layers above the scan are re-applied by selecting the same
    columns from the re-read.

    Preconditions are VALIDATED, not just documented (round-4 ADVICE):

    - only self-describing parquet files (the one format the re-read can
      reproduce without the caller's original reader options); ORC/CSV/
      JSON-backed frames raise an actionable error instead of a confusing
      parquet-footer failure;
    - the lineage must be scan + projection only — a filter, sample, join
      or aggregate between the scan and this call would be silently
      DROPPED by the re-read (the sample would include filtered-out
      rows), so any other logical operator raises;
    - every output column name must exist in the re-read's file schema —
      a renamed/computed column cannot be recovered from the files.
    """
    import hashlib
    import math
    import re as _re

    files = sorted(df.inputFiles())
    if not files:
        raise ValueError("sample_level='files' needs a file-backed DataFrame")

    exts = {f.rsplit(".", 1)[-1].lower() for f in files if "." in f.rsplit("/", 1)[-1]}
    if exts - {"parquet"}:
        raise ValueError(
            f"sample_level='files' re-reads the input files as parquet, but the "
            f"frame is backed by {sorted(exts)} files; a CSV/JSON/ORC re-read "
            "cannot reproduce the original reader options — use "
            "sample_level='rows' (row predicate) for non-parquet sources"
        )

    plan = df._jdf.queryExecution().analyzed().toString()
    ops = set()
    for line in plan.splitlines():
        m = _re.match(r"^[\s:+\-]*'?([A-Za-z]+)", line)
        if m:
            ops.add(m.group(1))
    extra = ops - _FILE_SAMPLE_OK_OPS
    if extra:
        raise ValueError(
            f"sample_level='files' requires a pure scan+project lineage, but "
            f"the frame's plan contains {sorted(extra)}; those operators would "
            "be silently dropped by the file re-read (e.g. a filter's rows "
            "would reappear in the sample) — apply them AFTER infer_schema, "
            "or use sample_level='rows'"
        )

    keep_n = max(1, math.ceil(fraction * len(files)))
    ranked = sorted(files, key=lambda p: (hashlib.md5(p.rsplit("/", 1)[-1].encode()).hexdigest(), p))
    keep = ranked[:keep_n]
    spark = df.sparkSession
    reread = spark.read.format("parquet").load(keep)
    missing = [f.name for f in df.schema.fields if f.name not in reread.columns]
    if missing:
        raise ValueError(
            f"sample_level='files' cannot reproduce columns {missing}: they do "
            "not exist in the underlying parquet schema (renamed or computed "
            "upstream) — project/rename AFTER infer_schema, or use "
            "sample_level='rows'"
        )
    # preserve the caller's projection (e.g. i01/i07's stringification)
    return reread.select(
        *[F.col(f.name).cast(f.dataType) for f in df.schema.fields]
    )


def infer_schema(
    df: DataFrame,
    sample=None,
    sample_seed: int = 42,
    sample_level: str = "rows",
) -> list[dict]:
    """I4: ``[{'name', 'type'}]`` for every column, reference precedence.

    String columns go through the two-phase counter scan (same decisions as
    ``ColumnStats.decide`` — see ``_decide_types``); already-typed columns map
    directly (parquet is the reference's only typed read, etl.py:541-543).

    *sample* is the 100 TB posture knob (SURVEY §4.2): the reference scans
    ALL rows (etl.py:860-913) and that stays the default, but at scale a
    counter scan over a sample decides the same types for a fraction of the
    cost.  Three modes:

    - float fraction + ``sample_level="rows"``: seeded Bernoulli row
      sampling (``df.sample`` — no shuffle; prunes CPU, not reads).
    - float fraction + ``sample_level="files"``: deterministically keep
      ``ceil(fraction · #files)`` of the frame's input files (ranked by a
      stable hash of the file name) and re-read only those — the ONLY mode
      that prunes IO: unselected files are never opened, so a 10% sample
      of a 100 TB table reads ~10 TB.  Requires a file-backed frame whose
      lineage is a pure scan (columns/filters re-applied by re-reading).
    - boolean Column: deterministic content sampling, reproducible across
      engines and cluster layouts — what the oracle-checked i07 query
      uses (an integer multiplicative hash of the row key; never a per-row
      hex-string hash, which round-3 measured as costing more than the
      full scan it shortcut).
    """
    if sample is not None:
        if isinstance(sample, float):
            if not 0.0 < sample <= 1.0:
                raise ValueError(f"sample fraction must be in (0, 1], got {sample}")
            if sample_level == "files":
                df = _sample_input_files(df, sample)
            elif sample < 1.0:
                df = df.sample(fraction=sample, seed=sample_seed)
        else:
            df = df.filter(sample)
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    decisions = _decide_types(df, str_cols)
    out = []
    for f in df.schema.fields:
        if f.name in decisions:
            out.append({"name": f.name, "type": decisions[f.name]})
        else:
            out.append({"name": f.name, "type": spark_type_to_logical(f.dataType)})
    return out


# --- batch type-widening lattice ---------------------------------------------------
def widen_logical(a: str, b: str) -> str:
    """Widest common logical type for one column seen with two inferred
    types across ingest batches.

    The lattice: numerics widen upward (INTEGER ⊂ FLOAT, INTEGER ⊂ NUMERIC;
    FLOAT wins the FLOAT/NUMERIC mix for range), everything else conflicts
    to STRING — the only type that loses no information.  No reference
    counterpart (the reference infers per-object and lets the warehouse
    reject drift); this is the union-side answer a long-lived 100 TB table
    needs when two appended batches disagree."""
    a, b = a.upper(), b.upper()
    if a == b:
        return a
    pair = {a, b}
    if pair == {"INTEGER", "FLOAT"}:
        return "FLOAT"
    if pair == {"INTEGER", "NUMERIC"}:
        return "NUMERIC"
    if pair == {"FLOAT", "NUMERIC"}:
        return "FLOAT"
    return "STRING"


def widen_schemas(s1: list[dict], s2: list[dict]) -> list[dict]:
    """Widen two inferred schemas column-wise: shared columns take the
    lattice join, columns unique to either side keep their type (alignment
    NULL-fills them on the frame that lacks them).  Order: *s1*'s columns,
    then *s2*-only columns appended."""
    t2 = {c["name"]: c["type"] for c in s2}
    out, seen = [], set()
    for c in s1:
        name = c["name"]
        seen.add(name)
        widened = widen_logical(c["type"], t2[name]) if name in t2 else c["type"]
        out.append({"name": name, "type": widened})
    for c in s2:
        if c["name"] not in seen:
            out.append({"name": c["name"], "type": c["type"]})
    return out


# --- I6: coercive cast expressions ------------------------------------------------
def coerce_expr(col: Column, logical_type: str) -> Column:
    """Cast *col* to *logical_type* with coerce semantics (bad cell → NULL).

    Mirrors the reference cast table (etl.py:1053-1152): boolean token map
    incl. null-ish tokens, timestamps via permissive parse, TIME as HH:mm:ss
    strings (Spark has no TimeType — documented divergence), BYTES degrades
    to STRING exactly like the reference (etl.py:1115-1117); GEOGRAPHY /
    INTERVAL have no cast path and pass through unchanged (etl.py:1129-1134).
    """
    t = logical_type.upper()
    s = col.cast("string")
    if t in ("INTEGER", "INT64"):
        d = s.try_cast("double")
        return F.when(
            d.isNotNull() & ~F.isnan(d) & (d == F.floor(d)) & (F.abs(d) < _LONG_RANGE),
            d.cast("long"),
        )
    if t in ("FLOAT", "FLOAT64"):
        return s.try_cast("double")
    if t in ("NUMERIC", "BIGNUMERIC"):
        return s.try_cast("decimal(38,9)")
    if t in ("BOOLEAN", "BOOL"):
        low = F.lower(F.regexp_replace(s, r"^\s+|\s+$", ""))
        return (
            F.when(low.isin(*BOOL_TRUE_TOKENS), F.lit(True))
            .when(low.isin(*BOOL_FALSE_TOKENS), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if t == "TIMESTAMP":
        return F.try_to_timestamp(s)
    if t == "DATETIME":
        return F.try_to_timestamp(s).cast("timestamp_ntz")
    if t == "DATE":
        return F.try_to_timestamp(s).cast("date")
    if t == "TIME":
        # normalized HH:mm:ss string (divergence from etl.py:1104-1107 noted
        # in SURVEY §7: Spark has no TimeType)
        return F.date_format(
            F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), s)), "HH:mm:ss"
        )
    if t in ("STRING", "JSON", "BYTES"):
        return s
    return col  # GEOGRAPHY / INTERVAL: no cast path in the reference either


# --- I5 + I6: alignment projection -------------------------------------------------
def align_to_schema(df: DataFrame, schema_list: list[dict]) -> DataFrame:
    """Column-level alignment + cell-level coercion as ONE projection.

    Reference does three pandas passes (drop extras etl.py:1033-1037, add
    NULL columns etl.py:1039-1044, reorder etl.py:1046-1049) plus a per-column
    conversion loop; declaratively it's a single ``select`` that Catalyst
    fuses into the scan.
    """
    if not schema_list:
        raise ValueError("Schema list cannot be empty for alignment.")
    have = set(df.columns)
    proj = []
    for field in schema_list:
        name, t = field["name"], field["type"].upper()
        if name in have:
            proj.append(coerce_expr(F.col(f"`{name}`"), t).alias(name))
        else:
            proj.append(F.lit(None).cast(LOGICAL_TO_SPARK.get(t, T.StringType())).alias(name))
    return df.select(*proj)


def coercion_metrics(df: DataFrame, schema_list: list[dict]) -> list[dict]:
    """I7: per-column new-NULL counts introduced by coercion, in one scan.

    Reference warns when a cast adds >10% (and >5 absolute) new NULLs
    (etl.py:1121-1126).  Returns ``[{'name','original_nulls','new_nulls',
    'rows','warn'}]``.
    """
    have = [f for f in schema_list if f["name"] in set(df.columns)]
    if not have:
        return []
    exprs = [F.count(F.lit(1)).alias("\x00rows")]
    for f in have:
        c = F.col(f"`{f['name']}`")
        coerced = coerce_expr(c, f["type"])
        exprs.append(F.sum(c.isNull().cast("long")).alias(f"{f['name']}\x00orig"))
        exprs.append(
            F.sum((c.isNotNull() & coerced.isNull()).cast("long")).alias(
                f"{f['name']}\x00new"
            )
        )
    row = df.agg(*exprs).first()
    rows = row["\x00rows"]
    out = []
    for f in have:
        orig = int(row[f"{f['name']}\x00orig"] or 0)
        new = int(row[f"{f['name']}\x00new"] or 0)
        warn = new > 0.1 * (rows - orig) and new > 5
        out.append(
            {"name": f["name"], "original_nulls": orig, "new_nulls": new,
             "rows": rows, "warn": warn}
        )
    return out


# --- I1/I2: strategy chain ----------------------------------------------------------
def get_existing_schema(spark, table_ident: str) -> list[dict] | None:
    """I2: catalog lookup → logical schema list, None when absent."""
    try:
        if not spark.catalog.tableExists(table_ident):
            return None
    except Exception:  # noqa: BLE001 — malformed identifier behaves like absent
        return None
    fields = spark.table(table_ident).schema.fields
    return [{"name": f.name, "type": spark_type_to_logical(f.dataType), "mode": "NULLABLE"}
            for f in fields]


def validate_llm_schema(raw: object, df_columns: list[str]) -> list[dict] | None:
    """I3's validation gate (etl.py:786-848): list-shaped; a malformed item
    (non-dict, or missing/empty/non-string name or type) aborts the whole
    schema (etl.py:805-813); hallucinated names are skipped; off-whitelist
    types degrade to STRING.
    """
    if not isinstance(raw, list) or not raw:
        return None
    cols = set(df_columns)
    out = []
    for item in raw:
        if not isinstance(item, dict) or "name" not in item or "type" not in item:
            return None
        name, t = item.get("name"), item.get("type")
        if not isinstance(name, str) or not isinstance(t, str) or not name or not t:
            return None
        if name not in cols:
            continue  # hallucinated column → skipped (etl.py:816-820)
        tu = t.upper()
        out.append({"name": name, "type": tu if tu in TYPE_WHITELIST else "STRING"})
    return out or None


def determine_schema(
    spark,
    df: DataFrame,
    table_ident: str,
    strategy: str = "existing_or_pandas",
    llm_infer=None,
    llm_sample_size: int = 5,
) -> list[dict] | None:
    """I1: the reference's strategy chain (etl.py:934-1009).

    ``existing_or_*`` prefix → catalog first; then LLM if the strategy names
    it (pluggable callable, OFF by default for determinism); then heuristic
    inference if the strategy names ``pandas``.  Under ``existing_or_gemini``
    there is NO heuristic fallback — LLM failure skips the table, matching
    the reference default's behavior.  Final validation: no common columns →
    ValueError; DF-only columns dropped, schema-only columns become NULL
    (handled by align_to_schema); every field mode-defaults to NULLABLE.
    """
    schema: list[dict] | None = None
    if strategy.startswith("existing_or_"):
        schema = get_existing_schema(spark, table_ident)
    effective = strategy.removeprefix("existing_or_")
    if schema is None and ("gemini" in effective or "llm" in effective):
        if llm_infer is not None:
            sample = df.limit(llm_sample_size).toPandas()
            schema = validate_llm_schema(llm_infer(sample), df.columns)
    if schema is None and "pandas" in effective:
        schema = infer_schema(df)
    if schema is None:
        return None
    common = {f["name"] for f in schema} & set(df.columns)
    if not common:
        raise ValueError(
            "Determined schema shares no columns with the DataFrame "
            f"(table {table_ident})."
        )
    for f in schema:
        f.setdefault("mode", "NULLABLE")
    return schema
