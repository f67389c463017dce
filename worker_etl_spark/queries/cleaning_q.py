"""Oracle-checked queries for the cleaning operators (C1-C7, D1).

The driver's tables are already clean, so each query first *constructs* a
deterministically-messy column (whitespace padding, null tokens keyed off
``doc_id % 6``) and then applies the engine operator — the oracle applies the
identical construction + the SQL-equivalent cleaning, so the hash comparison
genuinely exercises the operator semantics rather than an identity map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.operators import cleaning
from worker_etl_spark.queries import register
from worker_etl_spark.sources.tables import read_table


def _messy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    messy = (
        F.when(m == 0, F.concat(F.lit("  "), F.col("source"), F.lit("\t ")))
        .when(m == 1, F.lit("NULL"))
        .when(m == 2, F.lit("none"))
        .when(m == 3, F.lit("<NA>"))
        .when(m == 4, F.lit(""))
        .otherwise(F.col("source"))
    )
    return d.select("doc_id", messy.alias("messy"), "lang")


_MESSY_SQL = """
      SELECT doc_id,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN '  ' || source || CHR(9) || ' '
               WHEN 1 THEN 'NULL'
               WHEN 2 THEN 'none'
               WHEN 3 THEN '<NA>'
               WHEN 4 THEN ''
               ELSE source
             END AS messy,
             lang
      FROM documents
"""


# --- C6 + C7: trim then null-token normalize -------------------------------------
@register(
    "c01_trim_null_normalize",
    oracle=rf"""
    WITH messy AS ({_MESSY_SQL}),
    cleaned AS (
      SELECT doc_id,
             CASE WHEN regexp_replace(messy, '^\s+|\s+$', '', 'g') = '' OR lower(regexp_replace(messy, '^\s+|\s+$', '', 'g')) IN ('none','null','nan','<na>','nat')
                  THEN NULL ELSE regexp_replace(messy, '^\s+|\s+$', '', 'g') END AS source_clean
      FROM messy
    )
    SELECT source_clean, count(*) AS n
    FROM cleaned GROUP BY source_clean
    ORDER BY source_clean NULLS FIRST
    """,
)
def c01_trim_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _messy_docs(spark, sf_dir)
    df = cleaning.trim_strings(df, ["messy"])
    df = cleaning.normalize_null_tokens(df, ["messy"])
    return (
        df.groupBy(F.col("messy").alias("source_clean"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("source_clean").asc_nulls_first())
    )


# --- C5: drop all-null rows -------------------------------------------------------
@register(
    "c02_drop_all_null_rows",
    oracle=rf"""
    WITH messy AS ({_MESSY_SQL}),
    nulled AS (
      SELECT doc_id,
             CASE WHEN regexp_replace(messy, '^\s+|\s+$', '', 'g') = '' OR lower(regexp_replace(messy, '^\s+|\s+$', '', 'g')) IN ('none','null','nan','<na>','nat')
                  THEN NULL ELSE regexp_replace(messy, '^\s+|\s+$', '', 'g') END AS a,
             CASE WHEN CAST(doc_id % 3 AS INTEGER) = 0 THEN NULL ELSE lang END AS b
      FROM messy
    )
    SELECT CAST(count(*) AS BIGINT) AS n_kept,
           CAST(count(a) AS BIGINT) AS n_a,
           CAST(count(b) AS BIGINT) AS n_b
    FROM nulled
    WHERE NOT (a IS NULL AND b IS NULL)
    """,
)
def c02_drop_all_null_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _messy_docs(spark, sf_dir)
    df = cleaning.trim_strings(df, ["messy"])
    df = cleaning.normalize_null_tokens(df, ["messy"])
    df = df.select(
        F.col("messy").alias("a"),
        F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang")).alias("b"),
    )
    kept = cleaning.drop_all_null_rows(df)
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.count("a").alias("n_a"),
        F.count("b").alias("n_b"),
    )


# --- C2/C3: identifier sanitization applied as a projection ----------------------
@register(
    "c03_sanitized_projection",
    oracle="""
    SELECT c_mktsegment AS Market_Segment,
           CAST(count(*) AS BIGINT) AS _1_count,
           round(avg(c_acctbal), 4) AS avg_balance___usd_
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def c03_sanitized_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy downstream names (' Market Segment ', '1 count', 'avg balance ($usd)')
    run through sanitize_identifier — aliases in the oracle are the expected
    sanitized outputs, so parity pins the C2 regex semantics."""
    c = read_table(spark, sf_dir, "customer")
    names = ["  Market Segment ", "1 count", "avg balance ($usd)"]
    s = [cleaning.sanitize_identifier(n) for n in names]
    assert s == ["Market_Segment", "_1_count", "avg_balance___usd_"], s
    return (
        c.groupBy(F.col("c_mktsegment").alias(s[0]))
        .agg(
            F.count(F.lit(1)).alias(s[1]),
            F.round(F.avg("c_acctbal"), 4).alias(s[2]),
        )
        .orderBy(s[0])
    )


# --- c04: markup stripping (web-scrape cleaning) --------------------------------
@register(
    "c04_html_strip",
    oracle=r"""
    WITH wrapped AS (
      SELECT doc_id,
             '<html><body class="m"><h1>T ' || CAST(doc_id AS VARCHAR)
               || '</h1><p>' || text || '</p><br/>&amp; &lt;tail&gt;'
               || '<script>var x = 1 < 2;</script></body></html>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(html,
                 '<script[^>]*>.*?</script>', ' ', 'gs'),   -- script blocks first
                 '<[^>]+>', ' ', 'g'),                      -- any remaining tag
                 '&amp;', '&', 'g'),
                 '&lt;', '<', 'g'),
                 '&gt;', '>', 'g')) AS clean
      FROM wrapped
    )
    SELECT doc_id,
           length(clean) AS clean_len,
           (clean LIKE '%var x%')  AS script_leaked,
           (clean LIKE '%<p>%')    AS tag_leaked,
           (clean LIKE '%& <tail>%') AS entities_decoded
    FROM stripped ORDER BY doc_id LIMIT 30
    """,
)
def c04_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping — the first cleaning pass of every web-scrape
    corpus: script/style blocks drop WITH their content (boilerplate code
    is not prose), remaining tags become whitespace (so adjacent words
    don't fuse), and the common entities decode.  Ordering is load-
    bearing and pinned by the oracle: tags-before-entities means a decoded
    `&lt;tail&gt;` survives as literal text instead of being re-parsed as
    a tag — the classic double-unescape bug.  Verification is by
    PROPERTY (script content gone, no tag survives, entities decoded) on
    top of exact output length, replayed identically by the oracle.

    Scale: a regexp_replace chain fused into the scan — zero shuffles;
    the dotall script pattern is shared Java-regex ∩ RE2 dialect ('s'
    flag inline in Spark, flag arg in DuckDB).  Reference has no markup
    handling at all (strings pass through, `etl.py:534`)."""
    d = read_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body class="m"><h1>T '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><br/>&amp; &lt;tail&gt;"),
        F.lit("<script>var x = 1 < 2;</script></body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            html, r"(?s)<script[^>]*>.*?</script>", " "
                        ),
                        r"<[^>]+>",
                        " ",
                    ),
                    "&amp;",
                    "&",
                ),
                "&lt;",
                "<",
            ),
            "&gt;",
            ">",
        )
    )
    return (
        d.select("doc_id", clean.alias("clean"))
        .select(
            "doc_id",
            F.length("clean").cast("long").alias("clean_len"),
            F.col("clean").contains("var x").alias("script_leaked"),
            F.col("clean").contains("<p>").alias("tag_leaked"),
            F.col("clean").contains("& <tail>").alias("entities_decoded"),
        )
        .orderBy("doc_id")
        .limit(30)
    )
