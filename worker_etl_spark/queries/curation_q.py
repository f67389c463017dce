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
from worker_etl_spark.queries.dedup_q import (
    _CLUSTER_JACCARD,
    _DF_CAP,
    _SQL_SHINGLES,
    _cluster_labels,
)
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


# --- p02: deterministic per-source quota sampling ----------------------------
_QUOTA = 18  # max docs kept per source (sources carry ~25 docs at sf0.01, so the cap binds)


@register(
    "p02_source_quota_sample",
    oracle=f"""
    WITH hashed AS (
      SELECT source, doc_id,
             {sql_hex_int("CAST(doc_id AS VARCHAR)")} AS hk
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY hk, doc_id) AS rk
      FROM hashed
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_QUOTA}
    ORDER BY source, rk
    """,
)
def p02_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture curation: cap every source at ``_QUOTA`` documents,
    chosen by content-hash order — the deterministic equivalent of "sample N
    per source" that reproduces bit-identically on any cluster layout, any
    engine, any day (no RNG state, no partition-order dependence).

    Scale shape: one window per source partition; the hash rank is computed
    scan-side, only quota survivors flow on.  Mixture rebalancing at 100 TB
    is exactly this with per-source quotas from a config table."""
    d = read_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    hashed = d.select(
        "source", "doc_id", hex_int(F.col("doc_id").cast("string")).alias("hk")
    )
    win = W.partitionBy("source").orderBy("hk", "doc_id")
    return (
        hashed.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= _QUOTA)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


# --- p03: leakage-safe train/eval split (near-dup clusters stay together) ----
_TRAIN_BUCKETS = 8  # of 10: 80/20 split


@register(
    "p03_leakage_safe_split",
    headline=True,
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a AS a, i.doc_b AS b
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= {_CLUSTER_JACCARD}
    ),
    und AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ),
    reach(src, dst) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
    ),
    lbl AS (
      SELECT src AS node, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    grouped AS (
      SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
    ),
    split AS (
      SELECT doc_id, group_id,
             CASE WHEN {sql_hex_int("CAST(group_id AS VARCHAR)")} % 10
                       < {_TRAIN_BUCKETS}
                  THEN 'train' ELSE 'eval' END AS split
      FROM grouped
    )
    SELECT split,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(count(DISTINCT group_id) AS BIGINT) AS n_groups,
           min(doc_id)                              AS first_doc
    FROM split GROUP BY split ORDER BY split
    """,
)
def p03_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split that cannot leak near-duplicates across the
    boundary: every document is assigned to a GROUP (its d07 connected
    component if it has one, else itself), and the 80/20 split hashes the
    group id, not the doc id — so a whole near-dup cluster lands on one side
    by construction.  Splitting by doc hash is the classic eval-contamination
    bug in LLM training pipelines; this is the fix, stated as an operator.

    Scale shape: one left equi-join of the corpus against the (sparse)
    cluster-label table + a portable-hash projection; the split decision
    never shuffles the corpus.  The oracle re-derives clusters via recursive
    CTE and must agree on every count."""
    labels = _cluster_labels(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    grouped = d.join(
        labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")),
        "doc_id",
        "left",
    ).select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("group_id")
    )
    split = grouped.select(
        "doc_id",
        "group_id",
        F.when(
            hex_int(F.col("group_id").cast("string")) % 10 < _TRAIN_BUCKETS,
            F.lit("train"),
        )
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("group_id").cast("long").alias("n_groups"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


# --- p04: context-window sequence packing ------------------------------------
_PACK_CAP = 512   # tokens per packed training sequence
_PACK_SHARDS = 64  # packing shards — the unit of parallelism


@register(
    "p04_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             len({sql_tokens('text')}) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT shard, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum_tok
      FROM t
    ),
    placed AS (
      SELECT shard, n_tokens,
             (cum_tok - n_tokens) // {_PACK_CAP} AS first_chunk,
             CASE WHEN (cum_tok - 1) // {_PACK_CAP}
                       > (cum_tok - n_tokens) // {_PACK_CAP}
                  THEN 1 ELSE 0 END AS split
      FROM cum
    )
    SELECT shard,
           CAST(count(*) AS BIGINT)                       AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)                  AS total_tokens,
           CAST((sum(n_tokens) + {_PACK_CAP - 1}) // {_PACK_CAP} AS BIGINT)
                                                          AS n_chunks,
           CAST(sum(split) AS BIGINT)                     AS n_split_docs,
           round(sum(split) / CAST(count(*) AS DOUBLE), 6) AS split_frac
    FROM placed GROUP BY shard ORDER BY shard
    """,
)
def p04_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing, GPT-style: concatenate documents in
    deterministic order and chunk the stream into fixed ``_PACK_CAP``-token
    training sequences, accounting per shard for how many documents straddle
    a chunk boundary (the split_frac a data team watches when choosing
    packing vs padding).

    Scale shape: packing is inherently sequential, so the corpus is hash-
    sharded first and each shard packs independently — the window's running
    token sum is per-shard (shard count = the parallelism knob; 64 here,
    thousands at 100 TB).  One projection + one windowed sum + one
    aggregation shuffle; no UDFs, nothing driver-side.  No reference
    counterpart (driver-mandated extension, SURVEY.md §2)."""
    from pyspark.sql.window import Window as W

    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("shard").orderBy("doc_id")
    cum = t.withColumn("cum_tok", F.sum("n_tokens").over(w))
    placed = cum.select(
        "shard",
        "n_tokens",
        F.floor((F.col("cum_tok") - F.col("n_tokens")) / _PACK_CAP).alias("first_chunk"),
        (
            F.floor((F.col("cum_tok") - 1) / _PACK_CAP)
            > F.floor((F.col("cum_tok") - F.col("n_tokens")) / _PACK_CAP)
        ).cast("long").alias("split"),
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / F.lit(_PACK_CAP)).cast("long").alias("n_chunks"),
            F.sum("split").alias("n_split_docs"),
            F.round(
                F.sum("split") / F.count(F.lit(1)).cast("double"), 6
            ).alias("split_frac"),
        )
        .orderBy("shard")
    )


# --- p05: domain-mixture reweighting -----------------------------------------
@register(
    "p05_mixture_reweight",
    oracle="""
    WITH per_source AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n_docs) AS total, count(*) AS n_sources FROM per_source
    )
    SELECT p.source,
           CAST(p.n_docs AS BIGINT)                                AS n_docs,
           round(p.n_docs / CAST(t.total AS DOUBLE), 6)            AS current_share,
           round(1.0 / t.n_sources, 6)                             AS target_share,
           round(least(1.0, (t.total / CAST(t.n_sources AS DOUBLE))
                            / p.n_docs), 6)                        AS sample_rate,
           CAST(floor(least(1.0, (t.total / CAST(t.n_sources AS DOUBLE))
                            / p.n_docs) * p.n_docs) AS BIGINT)     AS expected_docs,
           CAST(ceil((t.total / CAST(t.n_sources AS DOUBLE))
                     / p.n_docs) AS BIGINT)                        AS n_epochs
    FROM per_source p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def p05_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting — the "how much of each source goes into
    the training mix" computation: per source, its current share, the
    uniform target share, the downsampling rate that hits the target within
    a same-size budget, the expected yield, and the epoch count an
    UNDER-represented source needs (rate capped at 1; upsampling becomes
    repeat epochs — the standard practice when a small domain must fill a
    larger quota).

    Scale shape: one groupBy(source).count() over the corpus — the only
    full-data touch — then source-grain arithmetic against a broadcast
    one-row total.  The companion that EXECUTES a chosen rate
    deterministically is p02 (content-hash quota sampling)."""
    d = read_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_source.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    quota = F.col("total") / F.col("n_sources").cast("double")
    rate = F.least(F.lit(1.0), quota / F.col("n_docs"))
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("total").cast("double"), 6).alias(
                "current_share"
            ),
            F.round(F.lit(1.0) / F.col("n_sources"), 6).alias("target_share"),
            F.round(rate, 6).alias("sample_rate"),
            F.floor(rate * F.col("n_docs")).cast("long").alias("expected_docs"),
            F.ceil(quota / F.col("n_docs")).cast("long").alias("n_epochs"),
        )
        .orderBy("source")
    )


# --- p06: dataset card (per-source corpus documentation stats) ---------------
@register(
    "p06_dataset_card",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT)                          AS n_docs,
           CAST(sum(n_chars) AS BIGINT)                      AS sum_chars,
           CAST(count(DISTINCT lang) AS BIGINT)              AS n_langs,
           arg_max(lang, printf('%012d|%s', lang_n, lang))   AS top_lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           round(avg(n_chars), 4)                            AS avg_chars,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (), 6)                 AS doc_share
    FROM (
      SELECT d.*, count(*) OVER (PARTITION BY source, lang) AS lang_n
      FROM documents d
    )
    GROUP BY source ORDER BY source
    """,
)
def p06_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-source documentation block a corpus
    release ships (datasheet/data-statement practice) — volume, token
    count, language spread, dominant language, corpus share.  One scan:
    a (source, lang) window pre-counts language frequency scan-side, the
    source-grain aggregate folds everything else, and the share divides
    two exact integers over the all-rows window (source grain is tiny, so
    the unpartitioned window is a no-op shuffle of a handful of rows).
    the argmax key is a zero-padded '(count)|lang' string on both engines,
    so count ties break lexicographically by lang — deterministic argmax."""
    from pyspark.sql.window import Window as W

    d = read_table(spark, sf_dir, "documents")
    lang_n = F.count(F.lit(1)).over(W.partitionBy("source", "lang"))
    enriched = d.withColumn("lang_n", lang_n)
    agg = enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.expr(
            "max_by(lang, concat(lpad(CAST(lang_n AS STRING), 12, '0'), '|', lang))"
        ).alias("top_lang"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    total = W.partitionBy()
    return (
        agg.withColumn(
            "doc_share",
            F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(total), 6),
        )
        .select(
            "source", "n_docs", "sum_chars", "n_langs", "top_lang",
            "n_tokens", "avg_chars", "doc_share",
        )
        .orderBy("source")
    )


# --- p07: per-source document cap (domain-cap sampling) ------------------------
_CAP_K = 10  # max docs kept per source (the per-domain cap knob)


@register(
    "p07_per_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                          AS n_docs,
           CAST(count(*) FILTER (WHERE rk <= {_CAP_K}) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE rk > {_CAP_K}) AS BIGINT)  AS n_dropped,
           CAST(sum(n_chars) FILTER (WHERE rk <= {_CAP_K}) AS BIGINT)
                                                             AS kept_chars
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def p07_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the per-domain cap every web-scale curation
    recipe applies so one mega-domain can't dominate the training mixture:
    keep at most K docs per source, chosen by a DETERMINISTIC pseudo-random
    order (md5 of source:doc_id) so the sample is reproducible across runs
    and engines, unlike rand()-based sampling.

    Scale shape: one shuffle on source for the ranking window, one source-
    grain aggregate.  A skewed mega-source serializes its own partition —
    the documented mitigation at 100 TB is pre-filtering with an
    approximate per-source count and only ranking sources over the cap
    (the under-cap majority passes through untouched); the rank itself
    never needs global order.  No reference counterpart (SURVEY.md §2)."""
    from pyspark.sql.window import Window as W

    d = read_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("rk") <= _CAP_K, 1)).alias("n_kept"),
            F.count(F.when(F.col("rk") > _CAP_K, 1)).alias("n_dropped"),
            F.sum(F.when(F.col("rk") <= _CAP_K, F.col("n_chars"))).alias(
                "kept_chars"
            ),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
            F.col("kept_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("source")
    )


# --- p08: curriculum difficulty buckets (ntile) --------------------------------
_CURR_BUCKETS = 5


@register(
    "p08_curriculum_buckets",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, n_chars, lang,
             ntile({_CURR_BUCKETS}) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(min(n_chars) AS BIGINT)    AS min_chars,
           CAST(max(n_chars) AS BIGINT)    AS max_chars,
           CAST(sum(n_chars) AS BIGINT)    AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def p08_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning difficulty buckets: ``ntile`` splits the corpus
    into equal-population tiers along a deterministic total order (doc
    length, doc_id tiebreak so the tile cut can't flip cross-engine) — the
    easy→hard schedule a curriculum trainer consumes, and the missing
    member of the rank-function family (q32 covers rank/dense_rank/
    percent_rank; ntile's equal-COUNT buckets differ from i10's fixed-WIDTH
    bins).

    Scale note: ntile needs a global total order, but NOT a global sort —
    the rank comes from `operators/ranks.py`'s range-partitioned
    row_number (deterministic boundaries → parallel per-range windows +
    broadcast offsets, i21's pattern shared), and ntile's
    first-tiles-get-the-remainder sizing is closed-form arithmetic on
    the exact rank.  No single-partition WindowExec anywhere in the plan
    (asserted in tests/test_plans.py).
    No reference counterpart (SURVEY.md §2 Part B)."""
    from worker_etl_spark.operators.ranks import global_row_number, ntile_from_rn

    d = read_table(spark, sf_dir, "documents")
    ranked, n_rows = global_row_number(
        d.select("doc_id", "n_chars", "lang"), ["n_chars", "doc_id"]
    )
    ranked = ranked.withColumn(
        "bucket", ntile_from_rn(F.col("rn"), n_rows, _CURR_BUCKETS)
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .select(
            "bucket",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("min_chars").cast("long").alias("min_chars"),
            F.col("max_chars").cast("long").alias("max_chars"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.col("n_langs").cast("long").alias("n_langs"),
        )
        .orderBy("bucket")
    )


# --- p09: post-dedup token yield (effective dataset size) ----------------------
@register(
    "p09_dedup_token_yield",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    rare AS (
      SELECT h FROM shingles GROUP BY h HAVING count(*) <= {_DF_CAP}
    ),
    rs AS (
      SELECT s.doc_id, s.h FROM shingles s JOIN rare USING (h)
    ),
    card AS (
      SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rs a JOIN rs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a AS a, i.doc_b AS b
      FROM inter i
      JOIN card ca ON ca.doc_id = i.doc_a
      JOIN card cb ON cb.doc_id = i.doc_b
      WHERE i.c / CAST(ca.n + cb.n - i.c AS DOUBLE) >= {_CLUSTER_JACCARD}
    ),
    und AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ),
    reach(src, dst) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
    ),
    lbl AS (
      SELECT src AS node, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    grouped AS (
      SELECT d.doc_id, d.lang,
             len({sql_tokens(sql_norm_text('text'))}) AS n_tokens,
             COALESCE(l.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
    ),
    surv AS (SELECT group_id, min(doc_id) AS keeper FROM grouped GROUP BY group_id)
    SELECT g.lang,
           CAST(count(*) AS BIGINT)                       AS raw_docs,
           CAST(count(*) FILTER (WHERE g.doc_id = s.keeper) AS BIGINT)
                                                          AS surviving_docs,
           CAST(sum(g.n_tokens) AS BIGINT)                AS raw_tokens,
           CAST(sum(g.n_tokens) FILTER (WHERE g.doc_id = s.keeper) AS BIGINT)
                                                          AS surviving_tokens,
           round(sum(g.n_tokens) FILTER (WHERE g.doc_id = s.keeper)
                 / CAST(sum(g.n_tokens) AS DOUBLE), 6)    AS token_yield
    FROM grouped g JOIN surv s USING (group_id)
    GROUP BY g.lang ORDER BY g.lang
    """,
)
def p09_dedup_token_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective dataset size AFTER near-dup dedup, measured in tokens —
    the number a training-mixture budget actually consumes (raw token
    counts overstate a duplicated corpus): every doc joins its d07
    connected component (itself when unclustered), each cluster keeps its
    min-doc_id survivor (d11's rule), and per language the report compares
    raw vs surviving docs/tokens and the token yield.  Composition
    showcase: cluster labels (graph), token counting (text), and survivor
    selection compose as three key-equi joins, no operator re-implemented.

    Scale shape: the cluster-label table is sparse (only clustered docs);
    the corpus joins it LEFT on doc_id, the survivor table on group_id —
    both key-equi; token counting is scan-fused projection.  The oracle
    re-derives everything (recursive-CTE components included)."""
    labels = _cluster_labels(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(tokens(norm_text(F.col("text")))).alias("n_tokens"),
    )
    grouped = toks.join(
        labels.select(
            F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
    )
    surv = grouped.groupBy("group_id").agg(F.min("doc_id").alias("keeper"))
    j = grouped.join(surv, "group_id")
    kept = F.col("doc_id") == F.col("keeper")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("raw_docs"),
            F.count(F.when(kept, 1)).alias("surviving_docs"),
            F.sum("n_tokens").alias("raw_tokens"),
            F.sum(F.when(kept, F.col("n_tokens"))).alias("surviving_tokens"),
        )
        .select(
            "lang",
            F.col("raw_docs").cast("long").alias("raw_docs"),
            F.col("surviving_docs").cast("long").alias("surviving_docs"),
            F.col("raw_tokens").cast("long").alias("raw_tokens"),
            F.col("surviving_tokens").cast("long").alias("surviving_tokens"),
            F.round(
                F.col("surviving_tokens") / F.col("raw_tokens").cast("double"),
                6,
            ).alias("token_yield"),
        )
        .orderBy("lang")
    )


# --- p10: tokenizer fertility audit --------------------------------------------
from worker_etl_spark.queries.text_q import _SQL_BPE as _P10_SQL_BPE


@register(
    "p10_tokenizer_fertility",
    oracle=rf"""
    WITH toks AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS n_words,
             len(regexp_extract_all(text, '{_P10_SQL_BPE}')) AS n_subwords
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(sum(n_words) AS BIGINT)    AS total_words,
           CAST(sum(n_subwords) AS BIGINT) AS total_subwords,
           round(sum(n_subwords) / CAST(sum(n_words) AS DOUBLE), 6) AS fertility
    FROM toks GROUP BY lang ORDER BY lang
    """,
)
def p10_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY audit (subword pieces emitted per whitespace
    word) — the standard tokenizer-evaluation metric for multilingual
    corpora: a language whose fertility is far above the corpus norm pays
    proportionally more context window per sentence, which distorts both
    the effective mixture (p05 reweights by tokens, not words) and
    training cost.  Reuses the t01 whitespace tokenization and t08's
    BPE-ish regex pre-tokenizer verbatim, joined at language grain.

    Scale: two scan-fused regex projections + one lang-grain aggregate —
    no join, no shuffle beyond the 5-row combine."""
    from worker_etl_spark.queries.text_q import _BPE_RE

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.size(tokens(F.col("text"))).alias("n_words"),
        # pattern via F.lit, never F.expr (SQL literals eat backslashes/quotes)
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias(
            "n_subwords"
        ),
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_subwords").alias("total_subwords"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_words").cast("long").alias("total_words"),
            F.col("total_subwords").cast("long").alias("total_subwords"),
            F.round(
                F.col("total_subwords") / F.col("total_words").cast("double"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


# --- p11: k-anonymity audit ----------------------------------------------------
_P11_K = 5  # groups smaller than this are re-identification risks


@register(
    "p11_k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT c_mktsegment, n_name, count(*) AS group_size
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_mktsegment, n_name
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_groups,
           CAST(count(*) FILTER (WHERE group_size < {_P11_K}) AS BIGINT)
                                                          AS n_risky_groups,
           CAST(sum(group_size) FILTER (WHERE group_size < {_P11_K}) AS BIGINT)
                                                          AS n_risky_rows,
           CAST(min(group_size) AS BIGINT)                AS k_anonymity,
           round(coalesce(sum(group_size) FILTER (WHERE group_size < {_P11_K}), 0)
                 / CAST(sum(group_size) AS DOUBLE), 6)    AS risky_row_share
    FROM qi
    """,
)
def p11_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney's
    k-anonymity, public) — the privacy gate a training-data release runs
    before shipping anything derived from user records: every
    (segment × nation) group smaller than k is a re-identification risk,
    the table's k-anonymity IS the minimum group size, and the risky-row
    share quantifies how much suppression/generalization a release needs.
    PII regex redaction (t06) removes direct identifiers; THIS measures
    the quasi-identifier risk redaction can't see.

    Scale: one dimension-broadcast join + one QI-grain counting aggregate
    + a constant-size rollup — the audit costs one scan regardless of how
    many QI columns combine."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    qi = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    risky = F.col("group_size") < _P11_K
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count(F.when(risky, 1)).cast("long").alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("group_size"))).cast("long").alias("n_risky_rows"),
        F.min("group_size").cast("long").alias("k_anonymity"),
        F.round(
            F.coalesce(
                F.sum(F.when(risky, F.col("group_size"))), F.lit(0)
            )
            / F.sum("group_size").cast("double"),
            6,
        ).alias("risky_row_share"),
    )


# --- p13: right-to-erasure propagation audit -----------------------------------
_P13_FORGET_STRIDE = 37  # deterministic erasure request set: user_id % stride == 0


@register(
    "p13_erasure_propagation",
    oracle=f"""
    WITH forget AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % {_P13_FORGET_STRIDE} = 0
    ),
    kept AS (
      SELECT e.* FROM events e LEFT JOIN forget f USING (user_id)
      WHERE f.user_id IS NULL
    )
    SELECT 'events' AS surface,
           CAST((SELECT count(*) FROM events) AS BIGINT)          AS rows_before,
           CAST((SELECT count(*) FROM kept) AS BIGINT)            AS rows_after,
           CAST((SELECT count(DISTINCT user_id) FROM forget) AS BIGINT)
                                                                  AS users_erased,
           CAST((SELECT count(*) FROM kept k JOIN forget f USING (user_id))
                AS BIGINT)                                        AS residual_rows
    UNION ALL
    SELECT 'daily_rollup',
           CAST((SELECT count(*) FROM (SELECT date_trunc('day', ts), user_id
                                       FROM events GROUP BY 1, 2)) AS BIGINT),
           CAST((SELECT count(*) FROM (SELECT date_trunc('day', ts), user_id
                                       FROM kept GROUP BY 1, 2)) AS BIGINT),
           CAST((SELECT count(DISTINCT user_id) FROM forget) AS BIGINT),
           CAST((SELECT count(*) FROM (SELECT user_id FROM kept GROUP BY user_id)
                 k JOIN forget f USING (user_id)) AS BIGINT)
    ORDER BY surface
    """,
)
def p13_erasure_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure propagation audit (GDPR/CCPA deletion, the
    governance op every user-data pipeline must prove, not just run):
    given an erasure request set, the serving view drops every requested
    user via a broadcast anti-join (w08's merge-on-read delete pattern —
    the base table never rewrites on the request path), and the audit
    proves propagation on EVERY derived surface: raw rows AND the
    user-grain rollup both report before/after counts plus a residual-row
    count that must be zero — the compliance evidence.

    Scale shape: the request set is tiny (broadcast); each surface pays
    one anti-join fused into its own scan; the residual check is the same
    join inverted.  Composes with w08 (physical deletes at compaction)
    and p11 (k-anonymity of what remains)."""
    e = read_table(spark, sf_dir, "events")
    forget = (
        e.filter(F.col("user_id") % _P13_FORGET_STRIDE == 0)
        .select("user_id")
        .distinct()
    )
    kept = e.join(F.broadcast(forget), "user_id", "left_anti")

    def surface(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        residual = (
            after.select("user_id").distinct().join(F.broadcast(forget), "user_id")
        )
        return (
            before.agg(F.count(F.lit(1)).alias("rows_before"))
            .crossJoin(after.agg(F.count(F.lit(1)).alias("rows_after")))
            .crossJoin(forget.agg(F.count(F.lit(1)).alias("users_erased")))
            .crossJoin(residual.agg(F.count(F.lit(1)).alias("residual_rows")))
            .select(
                F.lit(name).alias("surface"),
                F.col("rows_before").cast("long").alias("rows_before"),
                F.col("rows_after").cast("long").alias("rows_after"),
                F.col("users_erased").cast("long").alias("users_erased"),
                F.col("residual_rows").cast("long").alias("residual_rows"),
            )
        )

    daily_before = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    daily_after = kept.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        surface("events", e, kept)
        .unionByName(surface("daily_rollup", daily_before, daily_after))
        .orderBy("surface")
    )


# --- p14: smoothed target encoding (ML-prep categorical encoder) ----------------
@register(
    "p14_target_encoding",
    oracle="""
    WITH enc AS (
      SELECT 'mktsegment' AS feature, c.c_mktsegment AS level,
             count(*) AS n,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 2
      UNION ALL
      SELECT 'orderpriority' AS feature, o_orderpriority AS level,
             count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders
      GROUP BY 2
    ),
    gstats AS (
      SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS gc,
             count(*) AS gn
      FROM orders
    )
    SELECT feature, level,
           CAST(n AS BIGINT) AS n,
           round(cents / (100.0 * n), 4) AS raw_mean,
           -- additive smoothing toward the global mean with pseudo-count m=100:
           -- enc = (sum + m*global_mean) / (n + m), all sums exact cents
           round((cents + 100.0 * gc / gn) / (100.0 * (n + 100)), 4)
             AS encoded
    FROM enc CROSS JOIN gstats
    ORDER BY feature, level
    """,
)
def p14_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of categorical features against a
    numeric target — the standard ML-prep encoder: each level of
    (customer market segment, order priority) maps to its mean order
    total, shrunk toward the global mean with pseudo-count m = 100 so
    rare levels don't memorize noise (enc = (sum + m*prior) / (n + m),
    the empirical-Bayes form every gradient-boosting pipeline uses).
    Emitted long-format (feature, level, n, raw_mean, encoded) — the
    encoder TABLE a training job broadcast-joins onto the fact stream.

    Scale: one aggregate per encoded feature over the fact table (map-
    side combined; segment needs one broadcast dim join), a constant-size
    global-prior frame cross-joined back.  Sums stay exact BIGINT cents
    until the final division, so the hash is engine-stable.  Encoding
    with the SAME statistics the model trains on leaks the target —
    pair with p03's leakage-safe split (fit on train only)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cents = F.sum(
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
    ).alias("cents")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("level"))
        .agg(F.count(F.lit(1)).alias("n"), cents)
        .select(F.lit("mktsegment").alias("feature"), "level", "n", "cents")
    )
    pri = (
        o.groupBy(F.col("o_orderpriority").alias("level"))
        .agg(F.count(F.lit(1)).alias("n"), cents)
        .select(F.lit("orderpriority").alias("feature"), "level", "n", "cents")
    )
    glob = o.agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("gc"),
        F.count(F.lit(1)).alias("gn"),
    )
    return (
        seg.unionByName(pri)
        .crossJoin(F.broadcast(glob))
        .select(
            "feature",
            "level",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("cents") / (100.0 * F.col("n")), 4).alias("raw_mean"),
            F.round(
                (F.col("cents") + 100.0 * F.col("gc") / F.col("gn"))
                / (100.0 * (F.col("n") + 100)),
                4,
            ).alias("encoded"),
        )
        .orderBy("feature", "level")
    )


# --- p15: deterministic weighted sampling without replacement (A-ES) ------------
@register(
    "p15_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             -- A-ES key u^(1/w): u = deterministic md5-uniform in (0,1],
             -- w = n_chars, so selection probability tracks document length
             round(pow(
               ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 + 1) / 4294967296.0),
               1.0 / n_chars), 9) AS k
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars, k,
             row_number() OVER (PARTITION BY lang
                                ORDER BY k DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars
    FROM ranked WHERE rnk <= 5
    ORDER BY lang, rnk
    """,
)
def p15_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement per language via the
    Efraimidis-Spirakis exponential-key scheme (A-ES, public): each doc
    gets key u^(1/w) with u uniform and w its weight (chars here — a
    proxy for token yield), and the top-k keys per stratum are a proper
    weighted sample.  u comes from the portable md5-uniform, NOT rand():
    the sample is a pure function of the data, so re-runs, retries and
    the DuckDB oracle all select the identical docs — the p02/q28
    reproducibility discipline extended from Bernoulli to weighted
    sampling.

    Scale: keys are row-local; top-k per stratum is a window that
    partial-sorts per partition before the single per-key shuffle —
    the distributed weighted-reservoir pattern, no global sort.  Keys
    are rounded to 1e-9 with a doc_id tiebreak so an ulp of libm pow()
    divergence can't reorder the cut."""
    from pyspark.sql.window import Window as W

    d = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            + 1
        )
        / F.lit(4294967296.0)
    )
    keyed = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.round(
            F.pow(u, F.lit(1.0) / F.col("n_chars")), 9
        ).alias("k"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("k"), "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("lang", "rnk", "doc_id", "n_chars")
        .orderBy("lang", "rnk")
    )


# --- p16: l-diversity audit (the sensitive-attribute half of p11) ----------------
@register(
    "p16_l_diversity",
    oracle="""
    WITH cell AS (
      SELECT c_mktsegment, n_name,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS sens,
             count(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT c_mktsegment, n_name,
             count(*)  AS l_distinct,
             sum(n)    AS group_size,
             max(n)    AS mode_count
      FROM cell GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT)                         AS n_groups,
           CAST(min(l_distinct) AS BIGINT)                  AS l_diversity,
           CAST(count(*) FILTER (WHERE l_distinct < 3) AS BIGINT)
                                                            AS n_groups_below_3,
           round(avg(CAST(l_distinct AS DOUBLE)), 4)        AS avg_distinct,
           -- worst-case homogeneity: share of the group held by its most
           -- common sensitive value (1.0 = attribute disclosed outright)
           round(max(mode_count / CAST(group_size AS DOUBLE)), 6)
                                                            AS max_homogeneity
    FROM grp
    """,
)
def p16_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., public) — the
    complement to p11's k-anonymity: a QI group can be large (k-safe)
    yet still leak its sensitive attribute if every member SHARES one
    value.  Over the same (segment x nation) quasi-identifier with the
    account-balance band as the sensitive attribute: the table's
    l-diversity (min distinct sensitive values per group), how many
    groups fall below l = 3, and the worst single-value homogeneity —
    the homogeneity-attack number.

    Scale: one dim-broadcast join, one (QI x sensitive)-grain count, one
    QI-grain re-aggregate of those counts, one constant-size rollup —
    the same one-scan discipline as p11, and the two audits share the
    first aggregate in a combined release gate."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    cell = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_mktsegment",
            "n_name",
            F.floor(F.col("c_acctbal") / 2000).cast("long").alias("sens"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grp = cell.groupBy("c_mktsegment", "n_name").agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("n").alias("group_size"),
        F.max("n").alias("mode_count"),
    )
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("l_distinct").cast("long").alias("l_diversity"),
        F.count(F.when(F.col("l_distinct") < 3, 1))
        .cast("long")
        .alias("n_groups_below_3"),
        F.round(F.avg(F.col("l_distinct").cast("double")), 4).alias(
            "avg_distinct"
        ),
        F.round(
            F.max(F.col("mode_count") / F.col("group_size").cast("double")), 6
        ).alias("max_homogeneity"),
    )


# --- p17: exact-quota stratified eval split ---------------------------------------
@register(
    "p17_stratified_split",
    oracle="""
    WITH strata AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_l) AS BIGINT) AS n,
             CAST(sum(n_l) // 10 AS BIGINT) AS total_eval
      FROM strata
    ),
    quota0 AS (
      SELECT s.lang, s.n_l,
             (s.n_l * t.total_eval) // t.n AS base,
             (s.n_l * t.total_eval) % t.n  AS rem,
             t.total_eval
      FROM strata s CROSS JOIN tot t
    ),
    quota AS (
      SELECT lang, n_l,
             base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                         <= total_eval - sum(base) OVER ()
                    THEN 1 ELSE 0 END AS q
      FROM quota0
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             row_number() OVER (PARTITION BY d.lang
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                         d.doc_id) AS rk
      FROM documents d
    )
    SELECT r.lang,
           CAST(q.n_l AS BIGINT)  AS n_docs,
           CAST(q.q AS BIGINT)    AS quota,
           CAST(count(*) FILTER (WHERE r.rk <= q.q) AS BIGINT) AS n_eval,
           CAST(coalesce(sum(r.n_chars) FILTER (WHERE r.rk <= q.q), 0)
                AS BIGINT)        AS eval_chars
    FROM ranked r JOIN quota q ON q.lang = r.lang
    GROUP BY r.lang, q.n_l, q.q
    ORDER BY r.lang
    """,
)
def p17_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified eval split with EXACT per-stratum quotas: a 10% eval set
    where each language contributes its largest-remainder-apportioned share
    (Σ quotas == ⌊N/10⌋ exactly), members chosen by deterministic md5 order —
    the guarantee p03's hash split (proportions only in expectation) and
    p15's weighted sample (per-language K, not corpus-budgeted) don't give.
    Eval-set size is a budget; this spends it exactly and reproducibly.

    Scale: the naive lowering is a per-language doc-grain rank window —
    |langs| tasks at corpus scale (the q79 fan-out lesson).  Here the rank
    is TWO-LEVEL: docs salt into (lang, md5-prefix-byte) buckets, each
    bucket ranks locally in parallel (the md5 prefix IS a prefix of the sort
    key, so bucket-major order ≡ md5 order), and bucket offsets come from a
    (|langs|·256)-row count aggregate joined back broadcast — the
    ranks.py recipe (round-8) generalized to grouped ranking.  Quota
    arithmetic runs on the |langs|-row strata frame (bounded window grain).
    The oracle keeps the naive window as the semantic spec."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    d = d.withColumn("bucket", F.substring("h", 1, 2))
    # per-(lang, bucket) counts -> per-lang cumulative offsets (tiny frame)
    from pyspark.sql.window import Window as W

    bcounts = d.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("bn"))
    offs = bcounts.select(
        "lang",
        "bucket",
        (
            F.coalesce(
                F.sum("bn").over(
                    W.partitionBy("lang")
                    .orderBy("bucket")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("off"),
    )
    ranked = d.join(F.broadcast(offs), ["lang", "bucket"]).withColumn(
        "rk",
        F.col("off")
        + F.row_number().over(
            W.partitionBy("lang", "bucket").orderBy("h", "doc_id")
        ),
    )
    strata = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    tot = strata.agg(
        F.sum("n_l").cast("long").alias("n"),
        F.expr("sum(n_l) DIV 10").cast("long").alias("total_eval"),
    )
    quota0 = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_l",
        F.expr("n_l * total_eval DIV n").alias("base"),
        F.expr("(n_l * total_eval) % n").alias("rem"),
        "total_eval",
    )
    w_all = W.partitionBy()  # |langs|-row frame: bounded aggregate grain
    quota = quota0.select(
        "lang",
        "n_l",
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_all.orderBy(F.desc("rem"), F.asc("lang")))
                <= F.col("total_eval") - F.sum("base").over(w_all),
                1,
            ).otherwise(0)
        ).alias("q"),
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .groupBy("lang", "n_l", "q")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("q"), 1).otherwise(0))
            .cast("long")
            .alias("n_eval"),
            F.coalesce(
                F.sum(F.when(F.col("rk") <= F.col("q"), F.col("n_chars"))), F.lit(0)
            )
            .cast("long")
            .alias("eval_chars"),
        )
        .select(
            "lang",
            F.col("n_l").cast("long").alias("n_docs"),
            F.col("q").cast("long").alias("quota"),
            "n_eval",
            "eval_chars",
        )
        .orderBy("lang")
    )
