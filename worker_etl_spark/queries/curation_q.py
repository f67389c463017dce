"""End-to-end training-data curation pipeline over ``documents``.

Driver-mandated extension (no reference counterpart — SURVEY.md §2 Part B):
this is the composition query that chains the individual LLM-data operators
the way a real corpus-curation job would: normalize → quality-score (t02's
formula) → language-agreement filter (t03's marker heuristic) → exact
near-dup removal on the normalized text (d01's keep-min-id rule) → per-lang
yield report.

Scale posture (100 TB): the whole pipeline is one scan + one aggregation
shuffle.  Every filter is a pure projection that Catalyst collapses into the
scan stage; the dedup is a single groupBy on the normalized-text hash whose
min-doc_id winner re-aggregates map-side; the final per-lang rollup is
month-grain-small.  Nothing is collected, no UDFs, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.functions.text import (
    LANG_MARKERS,
    LANG_ORDER,
    STOPWORDS,
    count_in,
    hex_int,
    norm_text,
    sql_count_in,
    sql_hex_int,
    sql_norm_text,
    sql_tokens,
    tokens,
)
from worker_etl_spark.queries import register
from worker_etl_spark.sources.tables import read_table

# Keep thresholds loose enough that every lang keeps a healthy sample at
# sf0.01 yet tight enough that each filter stage actually drops rows.
_MIN_QUALITY = 0.35
_MIN_TOKENS = 5

_SQL_TOK = sql_tokens("text")


def _sql_lang_pred() -> str:
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_ORDER) + ")"
    whens = "\n               ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"CASE WHEN {best} = 0 THEN 'und'\n               {whens} END"


@register(
    "p01_curation_pipeline",
    headline=True,
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             {sql_norm_text('text')}                       AS norm,
             len({_SQL_TOK})                               AS n_tokens,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonws,
             {sql_count_in(_SQL_TOK, STOPWORDS)}           AS n_stop,
             {', '.join(f"{sql_count_in(_SQL_TOK, LANG_MARKERS[lang])} AS s_{lang}" for lang in LANG_ORDER)}
      FROM documents
    ),
    scored AS (
      SELECT *,
             round(0.5 * least(1.0, n_tokens / 200.0)
                 + 0.3 * (n_stop / CAST(n_tokens AS DOUBLE))
                 + 0.2 * least(1.0, (n_nonws / CAST(n_tokens AS DOUBLE)) / 8.0), 4)
               AS quality,
             {_sql_lang_pred()} AS predicted
      FROM feat
    ),
    flagged AS (
      SELECT *,
             (n_tokens >= {_MIN_TOKENS} AND quality >= {_MIN_QUALITY}) AS quality_ok,
             (predicted = lang)                                        AS lang_ok,
             {sql_hex_int('norm', 15)}                                 AS fp
      FROM scored
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                                   AS n_docs,
           CAST(count(*) FILTER (WHERE quality_ok) AS BIGINT)         AS n_quality_ok,
           CAST(count(*) FILTER (WHERE lang_ok) AS BIGINT)            AS n_lang_agree,
           CAST(count(DISTINCT CASE WHEN quality_ok AND lang_ok
                                    THEN fp END) AS BIGINT)           AS n_kept_unique,
           CAST(sum(CASE WHEN quality_ok AND lang_ok
                         THEN n_tokens ELSE 0 END) AS BIGINT)         AS kept_tokens,
           round(avg(quality), 4)                                     AS avg_quality
    FROM flagged GROUP BY lang ORDER BY lang
    """,
)
def p01_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang curation funnel: total docs → quality survivors → language
    agreement → unique post-dedup keepers (+ kept token mass)."""
    d = read_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    feat = d.select(
        "doc_id",
        "lang",
        norm_text(F.col("text")).alias("norm"),
        F.size(tok).alias("n_tokens"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_nonws"),
        count_in(tok, STOPWORDS).alias("n_stop"),
        *[count_in(tok, LANG_MARKERS[lang]).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    nt = F.col("n_tokens").cast("double")
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    scored = feat.select(
        "doc_id",
        "lang",
        "norm",
        "n_tokens",
        F.round(
            0.5 * F.least(F.lit(1.0), nt / 200.0)
            + 0.3 * (F.col("n_stop") / nt)
            + 0.2 * F.least(F.lit(1.0), (F.col("n_nonws") / nt) / 8.0),
            4,
        ).alias("quality"),
        pred.alias("predicted"),
    )
    flagged = scored.select(
        "lang",
        "n_tokens",
        "quality",
        ((F.col("n_tokens") >= _MIN_TOKENS) & (F.col("quality") >= _MIN_QUALITY)).alias(
            "quality_ok"
        ),
        (F.col("predicted") == F.col("lang")).alias("lang_ok"),
        hex_int(F.col("norm"), 15).alias("fp"),
    )
    kept = F.col("quality_ok") & F.col("lang_ok")
    # One aggregation shuffle produces the whole funnel; the dedup stage is
    # the count-distinct over kept fingerprints (exact d01 semantics: rows
    # sharing fp are byte-identical normalized text).
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("quality_ok"), 1)).alias("n_quality_ok"),
            F.count(F.when(F.col("lang_ok"), 1)).alias("n_lang_agree"),
            F.countDistinct(F.when(kept, F.col("fp"))).alias("n_kept_unique"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("kept_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )
