"""Cross-engine parity fuzz for the text building blocks.

Forty-odd oracles assume that ``norm_text`` / ``tokens`` / ``hex_int`` /
character ``substring`` behave IDENTICALLY in Spark SQL and DuckDB.  The
oracle-parity suite only exercises them on the synthetic corpus; this fuzz
drives them over a seeded random corpus spanning the alphabets the engine
claims to support (ASCII, accented latin, CJK, whitespace runs incl. tabs/
newlines, empties) and asserts value equality element-by-element — so a
subtle divergence (unicode case folding, \\s classes, char indexing) fails
HERE with the offending string, not as an opaque hash mismatch in a query.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from worker_etl_spark.functions.text import (
    hex_int,
    norm_text,
    sql_hex_int,
    sql_norm_text,
    sql_tokens,
    tokens,
)

# Alphabets the corpus/oracles are documented to support.  Turkish dotted
# İ / ı and ligature ß are deliberately EXCLUDED: locale-sensitive case
# folding is engine lore, and the engine documents plain full-unicode
# simple lowercase only.
_ALPHABETS = [
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    "áéíóúàèìòùâêîôûäëïöüçñÁÉÍÓÚÀÈÌÒÙÄËÏÖÜÇÑ",
    "中文漢字日本語カタカナひらがな한국어",
    ".,;:!?'\"()[]{}@#$%^&*-_=+/\\|<>~`",
    "   \t\t\n\n",  # whitespace runs
]


def _corpus(n: int = 300) -> list[str]:
    rng = random.Random(20260814)
    out = ["", " ", "\t\n ", "  double  spaced  ", "MiXeD Case\tTAB"]
    while len(out) < n:
        alpha = rng.choice(_ALPHABETS) + " "
        out.append(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        )
    return out


@pytest.fixture(scope="module")
def frames(spark):
    corpus = _corpus()
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i long, s string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(corpus)))
    return sdf, con


def test_norm_text_parity(frames):
    sdf, con = frames
    got = {r.i: r.v for r in sdf.select("i", norm_text(F.col("s")).alias("v")).collect()}
    want = dict(con.sql(f"SELECT i, {sql_norm_text('s')} FROM t").fetchall())
    assert got == want


def test_tokens_parity(frames):
    sdf, con = frames
    got = {r.i: list(r.v) for r in sdf.select("i", tokens(norm_text(F.col("s"))).alias("v")).collect()}
    want = {i: list(v) for i, v in con.sql(
        f"SELECT i, {sql_tokens(sql_norm_text('s'))} FROM t"
    ).fetchall()}
    assert got == want


def test_hex_int_parity(frames):
    sdf, con = frames
    for k in (8, 15):
        got = {r.i: r.v for r in sdf.select("i", hex_int(F.col("s"), k).alias("v")).collect()}
        want = dict(con.sql(f"SELECT i, {sql_hex_int('s', k)} FROM t").fetchall())
        assert got == want, f"hex_int k={k} diverged"


def test_char_substring_parity(frames):
    """Character (not byte) indexing must agree — the shingle machinery
    slides substring windows over multibyte text."""
    sdf, con = frames
    got = {
        r.i: r.v
        for r in sdf.select(
            "i", F.expr("substring(s, 2, 5)").alias("v")
        ).collect()
    }
    want = dict(con.sql("SELECT i, substring(s, 2, 5) FROM t").fetchall())
    assert got == want


def test_i07_sample_hash_matches_duckdb_at_overflow_boundary(spark):
    """Round-5 ADVICE closure proof: the i07 sample predicate must agree
    between Spark and DuckDB for orderkeys far past the old int64 overflow
    bound (~3.5e9, where the unreduced k*2654435761 wrapped in Spark and
    raised in DuckDB)."""
    import duckdb

    keys = [1, 7, 2**31 - 2, 2**31 - 1, 2**31, 3_500_000_000,
            2**40, 2**62, 2**63 - 1]
    rows = [(k, ln) for k in keys for ln in (1, 4, 7)]

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "l_orderkey long, l_linenumber long")
    pred = (
        F.shiftright(
            (F.col("l_orderkey") % F.lit(2147483647)) * F.lit(2654435761)
            + F.col("l_linenumber"),
            16,
        ) % 100
    ) < 10
    got = {
        (r.l_orderkey, r.l_linenumber)
        for r in df.filter(pred).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(k BIGINT, l BIGINT); INSERT INTO t VALUES "
        + ",".join(f"({k},{ln})" for k, ln in rows)
    )
    want = {
        (k, ln)
        for k, ln in con.sql(
            "SELECT k, l FROM t WHERE ((((k % 2147483647) * 2654435761 + l)"
            " >> 16) % 100) < 10"
        ).fetchall()
    }
    assert got == want
