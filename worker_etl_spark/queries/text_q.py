"""Text-analysis queries over the ``documents`` table.

Driver-mandated extension (no reference counterpart — SURVEY.md §2 Part B
records the absence; the reference's only string ops are trim/lower/regex,
``etl.py:694,898,213``).  Four operators: token counting, quality scoring,
language ID (marker-word heuristic), and document fingerprinting (full-hash +
min-shingle rolling hash).

Scale posture (100 TB): every operator is a pure projection/aggregation over
``documents`` — no UDFs, no collect, no joins.  Token/shingle explosion is
the only row-multiplying step and it is immediately re-aggregated per doc
(map-side combine), so the shuffle carries one row per (doc, aggregate), not
per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

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
from worker_etl_spark.queries import bounded_persist, register
from worker_etl_spark.sources.tables import read_table, spread


# --- t01: token counting → per-language stats --------------------------------
@register(
    "t01_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang, len({sql_tokens('text')}) AS n_tokens
      FROM documents
    )
    SELECT lang,
           count(*)                    AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(n_tokens)               AS min_tokens,
           max(n_tokens)               AS max_tokens,
           round(avg(n_tokens), 4)     AS avg_tokens
    FROM tok GROUP BY lang ORDER BY lang
    """,
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


# --- t02: per-document quality score -----------------------------------------
_SQL_TOK = sql_tokens("text")

@register(
    "t02_quality_score",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             length(text)                                          AS n_chars,
             len({_SQL_TOK})                                       AS n_tokens,
             length(regexp_replace(text, '\\s+', '', 'g'))         AS n_nonws,
             {sql_count_in(_SQL_TOK, STOPWORDS)}                   AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           round(n_nonws / CAST(n_tokens AS DOUBLE), 4)            AS avg_token_len,
           round(n_stop  / CAST(n_tokens AS DOUBLE), 4)            AS stop_ratio,
           round(0.5 * least(1.0, n_tokens / 200.0)
               + 0.3 * (n_stop / CAST(n_tokens AS DOUBLE))
               + 0.2 * least(1.0, (n_nonws / CAST(n_tokens AS DOUBLE)) / 8.0), 4)
                                                                   AS quality
    FROM feat ORDER BY doc_id
    """,
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    feat = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(tok).alias("n_tokens"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_nonws"),
        count_in(tok, STOPWORDS).alias("n_stop"),
    )
    nt = F.col("n_tokens").cast("double")
    return feat.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_nonws") / nt, 4).alias("avg_token_len"),
        F.round(F.col("n_stop") / nt, 4).alias("stop_ratio"),
        F.round(
            0.5 * F.least(F.lit(1.0), F.col("n_tokens") / 200.0)
            + 0.3 * (F.col("n_stop") / nt)
            + 0.2 * F.least(F.lit(1.0), (F.col("n_nonws") / nt) / 8.0),
            4,
        ).alias("quality"),
    ).orderBy("doc_id")


# --- t03: language ID (marker-word heuristic) --------------------------------
def _sql_lang_scores() -> str:
    return ",\n             ".join(
        f"{sql_count_in(_SQL_TOK, LANG_MARKERS[lang])} AS s_{lang}" for lang in LANG_ORDER
    )


def _sql_argmax() -> str:
    # First language in LANG_ORDER with the max score wins; all-zero → 'und'.
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_ORDER) + ")"
    whens = "\n             ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"CASE WHEN {best} = 0 THEN 'und'\n             {whens} END"


@register(
    "t03_langid",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_sql_lang_scores()}
      FROM documents
    ),
    pred AS (
      SELECT lang, {_sql_argmax()} AS predicted FROM scores
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def t03_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    scores = d.select(
        "doc_id",
        "lang",
        *[count_in(tok, LANG_MARKERS[lang]).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return (
        scores.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# --- t04: document fingerprinting (full hash + min-shingle rolling hash) -----
_SHINGLE = 8  # char-gram width for the rolling min-hash fingerprint

@register(
    "t04_fingerprint",
    headline=True,
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {sql_norm_text('text')} AS norm FROM documents
    ),
    shingled AS (
      SELECT doc_id,
             min({sql_hex_int(f'substring(norm, i, {_SHINGLE})')}) AS fp_shingle_min
      FROM norm, unnest(range(1, length(norm) - {_SHINGLE - 2})) AS t(i)
      WHERE length(norm) >= {_SHINGLE}
      GROUP BY doc_id
    )
    SELECT n.doc_id,
           {sql_hex_int('n.norm', 15)} AS fp_doc,
           s.fp_shingle_min
    FROM norm n JOIN shingled s USING (doc_id)
    ORDER BY n.doc_id
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # spread(): one-object corpora give the scan a single split; the shingle
    # explode+hash below is the heavy stage, so widen before it (no-op when
    # the source already has enough splits).
    # NOT persisted (opt r12, measured): sharing the normalized corpus across
    # the two branches via bounded_persist re-measured ~1 s SLOWER (1.24 →
    # 2.2 s median, control-normalized) — the cache materialization barrier
    # breaks the scan→norm→explode→partial-agg fusion and costs more than
    # the duplicated fused scan it saves.
    norm = spread(
        d.select("doc_id", norm_text(F.col("text")).alias("norm")).filter(
            F.length("norm") >= _SHINGLE
        )
    )
    # Explode shingle start positions, hash each char-gram, min per doc.
    # The min is computed with map-side partial aggregation, so the shuffle
    # carries one row per doc — the explode never crosses the network.
    shingled = (
        norm.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("norm") - (_SHINGLE - 1))).alias("i"),
            "norm",
        )
        .select("doc_id", hex_int(F.expr(f"substring(norm, i, {_SHINGLE})")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("fp_shingle_min"))
    )
    return (
        norm.select("doc_id", hex_int(F.col("norm"), 15).alias("fp_doc"))
        .join(shingled, "doc_id")
        .orderBy("doc_id")
    )


# --- t05: TF-IDF top terms per document --------------------------------------
@register(
    "t05_tfidf_topterms",
    headline=True,
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({sql_tokens(sql_norm_text('text'))}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, score, rank
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def t05_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF (``tf * (ln((N+1)/(df+1)) + 1)``), top-3 terms/doc.

    Scale shape: one explode that re-aggregates map-side into (doc, term)
    counts; document frequency is a second map-side-combined aggregate of
    those counts; the tf-df join is key-equi on term (shuffle-partitionable,
    vocab-sized); the corpus size joins in as a broadcast single row.
    Scores round to 6 dp before ranking with a term tiebreak, so the top-3
    cut is cross-engine stable."""
    d = read_table(spark, sf_dir, "documents")
    tok = spread(d.select("doc_id", norm_text(F.col("text")).alias("nt"))).select(
        "doc_id", F.explode(tokens(F.col("nt"))).alias("term")
    )
    # tf feeds BOTH the document-frequency build (a broadcast-side job) and
    # the scoring join; without the persist the tokenize→explode→(doc,term)
    # aggregate re-ran once per consumer (opt r12, guide §2.4 shared build —
    # materializing tf is the standard TF-IDF pipeline call).
    tf = bounded_persist(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")),
        "(doc, term) counts — ≤ corpus token volume",
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .orderBy("doc_id", "rank")
    )


# --- t06: PII redaction (regex email/phone masking) --------------------------
# Patterns kept to constructs with identical semantics in Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded/greedy quantifiers — no
# backrefs, no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

@register(
    "t06_pii_redaction",
    headline=True,
    oracle=f"""
    WITH seeded AS (
      -- documents.text carries no PII, so each doc is seeded with a
      -- deterministic email + phone derived from its id; the redactor then
      -- has real matches to find and the count columns pin the regexes.
      SELECT doc_id,
             text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}'))            AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}'))            AS n_phones,
           length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                                 '{_PHONE_RE}', '[PHONE]', 'g'))   AS redacted_len,
           substring(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                                    '{_PHONE_RE}', '[PHONE]', 'g'),
                     length(text) - 40, 41)                        AS redacted_tail
    FROM seeded ORDER BY doc_id
    """,
)
def t06_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII masking — the scrub step of a training-data pipeline.

    Pure JVM-side projection (``regexp_replace`` / ``regexp_extract_all``
    inside whole-stage codegen): no UDF, no shuffle, embarrassingly parallel
    at any scale.  The patterns are restricted to the Java∩RE2 common subset
    so the DuckDB oracle replays them byte-identically."""
    d = read_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    # Patterns go through the Python API (F.lit), never F.expr — Spark SQL
    # string literals eat backslash escapes, which would corrupt the regexes.
    return (
        seeded.select(
            "doc_id",
            F.length("text").alias("orig_len"),
            F.size(
                F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))
            ).alias("n_emails"),
            F.size(
                F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))
            ).alias("n_phones"),
            redacted.alias("redacted"),
        )
        .select(
            "doc_id",
            "n_emails",
            "n_phones",
            F.length("redacted").alias("redacted_len"),
            F.expr("substring(redacted, orig_len - 40, 41)").alias("redacted_tail"),
        )
        .orderBy("doc_id")
    )


# --- t07: corpus bigram statistics -------------------------------------------
@register(
    "t07_bigram_stats",
    oracle=f"""
    WITH toks AS (
      SELECT {sql_tokens(sql_norm_text('text'))} AS t FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bigrams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
)
def t07_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams.  The adjacent-pair construction is a per-row
    array transform (``F.transform`` over an index sequence — no shuffle, no
    positional self-join), and the explode re-aggregates map-side, so the
    shuffle carries one row per distinct bigram, not per token pair.  The
    final top-k is a total order (count DESC, bigram ASC) so the cut is
    cross-engine stable."""
    d = read_table(spark, sf_dir, "documents")
    t = tokens(norm_text(F.col("text")))
    bigrams = (
        d.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
                )
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# --- t08: BPE-ish regex tokenization vs whitespace ---------------------------
# GPT-2-style pre-tokenizer, restricted to the Java∩RE2 subset (no
# lookahead): contraction suffixes, space-prefixed letter/digit runs,
# punctuation runs.  Token COUNT approximates LLM token cost far better than
# whitespace words (punctuation and numbers split out).
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+"
_SQL_BPE = _BPE_RE.replace("'", "''")

@register(
    "t08_bpe_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_SQL_BPE}')) AS n_bpe,
             len({sql_tokens('text')})                    AS n_ws
      FROM documents
    )
    SELECT lang,
           CAST(sum(n_bpe) AS BIGINT)          AS total_bpe_tokens,
           CAST(sum(n_ws) AS BIGINT)           AS total_ws_tokens,
           round(avg(n_bpe), 4)                AS avg_bpe_tokens,
           round(sum(n_bpe) / CAST(sum(n_ws) AS DOUBLE), 4) AS bpe_per_word
    FROM tok GROUP BY lang ORDER BY lang
    """,
)
def t08_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver brief's second token-counting mode: a BPE-ish regex
    (contractions / letter runs / digit runs / punct runs) next to the
    whitespace tokenizer (t01), per-lang totals + tokens-per-word ratio.
    Pure JVM regexp projection — the pattern goes through F.lit, never
    F.expr (Spark SQL literals eat backslashes)."""
    d = read_table(spark, sf_dir, "documents")
    feat = d.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias("n_bpe"),
        F.size(tokens(F.col("text"))).alias("n_ws"),
    )
    return (
        feat.groupBy("lang")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
            F.round(
                F.sum("n_bpe") / F.sum("n_ws").cast("double"), 4
            ).alias("bpe_per_word"),
        )
        .orderBy("lang")
    )


# --- t09: content-defined chunking -------------------------------------------
_CDC_W = 8       # fingerprint window width
_CDC_MOD = 32    # boundary gate: windowed hash % mod == 0 (expected chunk ~32)


@register(
    "t09_cdc_chunking",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {sql_norm_text('text')} AS norm FROM documents
      WHERE length({sql_norm_text('text')}) >= {_CDC_W + 1}
    ),
    stats AS (
      SELECT doc_id,
             CAST(length(norm) AS BIGINT) AS doc_len,
             CAST(len(list_filter(
               range(2, length(norm) - {_CDC_W - 2}),
               i -> {sql_hex_int(f'substring(norm, i, {_CDC_W})')} % {_CDC_MOD} = 0
             )) + 1 AS BIGINT) AS n_chunks
      FROM norm
    )
    SELECT doc_id, doc_len, n_chunks,
           round(doc_len / CAST(n_chunks AS DOUBLE), 2) AS mean_chunk_len
    FROM stats ORDER BY doc_id
    """,
)
def t09_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking stats: a boundary falls wherever the
    windowed fingerprint ``hash(norm[i : i+W]) % MOD == 0`` — boundaries
    move WITH the content (insert one word and only the neighboring chunk
    re-cuts), which is what makes CDC the storage/dedup substrate (LBFS,
    FastCDC — public literature) that fixed-size chunking can't be.

    Scale shape: identical to the shingle pipeline — explode positions,
    filter on a codegen'd hash gate, re-aggregate map-side to ONE row per
    doc before the shuffle.  Chunk COUNT and mean length per doc are what a
    curation pipeline stores; cutting actual chunk text is the same plan
    with a sequence/slice projection."""
    d = read_table(spark, sf_dir, "documents")
    n = d.select("doc_id", norm_text(F.col("text")).alias("norm")).filter(
        F.length("norm") >= _CDC_W + 1
    )
    # NOT the in-row higher-order-filter shape (opt r13, measured NEGATIVE):
    # size(filter(sequence(...), i -> hex_int(...) % MOD = 0)) removes the
    # explode + per-doc aggregate exchange, but lambda bodies are
    # CodegenFallback — the md5/conv per position runs INTERPRETED, and the
    # measured end-to-end is 5.3 s vs ~3.6 s for this codegen'd explode
    # pipeline (idle host, t17 control flat).  Same regime as the r12
    # HOF-unroll revert: at this corpus size the query is compute-bound on
    # the hash, and codegen beats a saved exchange.
    pos = n.select(
        "doc_id",
        F.length("norm").cast("long").alias("doc_len"),
        F.explode(F.sequence(F.lit(2), F.length("norm") - (_CDC_W - 1))).alias("i"),
        "norm",
    )
    is_boundary = (
        hex_int(F.expr(f"substring(norm, i, {_CDC_W})")) % _CDC_MOD == 0
    ).cast("long")
    stats = (
        pos.select("doc_id", "doc_len", is_boundary.alias("b"))
        .groupBy("doc_id", "doc_len")
        .agg((F.sum("b") + 1).cast("long").alias("n_chunks"))
    )
    return stats.select(
        "doc_id",
        "doc_len",
        "n_chunks",
        F.round(F.col("doc_len") / F.col("n_chunks").cast("double"), 2).alias(
            "mean_chunk_len"
        ),
    ).orderBy("doc_id")


# --- t10: benchmark-contamination check (word-8-gram overlap) -----------------
_CONTAM_N = 8       # word n-gram width (the 8-13-gram band common in practice)
_EVAL_MOD = 11      # deterministic pseudo-benchmark: doc_id % 11 == 0 (~9%
                    # of docs — wide enough that the corpus's built-in
                    # near-dups land on both sides, so the check is
                    # non-trivial at sf0.01)


@register(
    "t10_contamination",
    headline=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens(sql_norm_text('text'))} AS toks FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, {sql_hex_int('g')} AS h FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {_CONTAM_N - 2}),
                      i -> array_to_string(toks[i:i+{_CONTAM_N - 1}], ' '))) AS g
        FROM toks WHERE len(toks) >= {_CONTAM_N}
      )
    ),
    ev AS (
      SELECT doc_id AS eval_doc, h FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    ),
    corp AS (
      SELECT doc_id AS corpus_doc, h FROM grams WHERE doc_id % {_EVAL_MOD} != 0
    ),
    card AS (SELECT eval_doc, count(*) AS n_eval FROM ev GROUP BY eval_doc),
    ov AS (
      SELECT corpus_doc, eval_doc, count(*) AS n_shared
      FROM corp JOIN ev USING (h) GROUP BY corpus_doc, eval_doc
    )
    SELECT o.corpus_doc, o.eval_doc, CAST(o.n_shared AS BIGINT) AS n_shared,
           round(o.n_shared / CAST(c.n_eval AS DOUBLE), 6) AS contamination
    FROM ov o JOIN card c USING (eval_doc)
    ORDER BY contamination DESC, corpus_doc, eval_doc LIMIT 10
    """,
)
def t10_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection — the pre-training hygiene check
    that keeps eval answers out of the training corpus: for every (corpus
    doc, eval doc) pair sharing at least one word-8-gram, report the shared
    distinct-8-gram count and the fraction of the eval doc's 8-grams covered.
    The eval set here is a deterministic doc_id slice so the oracle can
    re-derive it; in production it is the benchmark suite itself.

    Scale shape: the check is a hash-equi join on the 8-gram hash — and the
    eval side is benchmark-sized (tiny vs the corpus), so at 100 TB the join
    broadcasts the eval grams and the corpus side streams map-side through
    it.  Deliberately NO ``distinct`` on the corpus grams before the join:
    that would shuffle every corpus 8-gram (the whole-corpus volume) just to
    dedup rows the broadcast filter is about to discard.  Instead the raw
    gram stream hits the broadcast join first and only the surviving
    (corpus_doc, eval_doc, h) rows — contamination-sized — are deduped, so
    the only full-volume shuffle in the plan is none at all.
    No reference counterpart (driver-mandated extension, SURVEY.md §2)."""
    d = read_table(spark, sf_dir, "documents")
    toks = spread(d.select("doc_id", tokens(norm_text(F.col("text"))).alias("toks")))

    def grams(df, doc_alias):
        return (
            df.filter(F.size("toks") >= _CONTAM_N)
            .select(
                F.col("doc_id").alias(doc_alias),
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {_CONTAM_N - 1}),"
                        f" i -> array_join(slice(toks, i, {_CONTAM_N}), ' '))"
                    )
                ).alias("g"),
            )
            .select(doc_alias, hex_int(F.col("g")).alias("h"))
        )

    # Eval side is tiny: distinct + broadcast are both cheap.  NOT persisted:
    # the r12 persist (sharing ev across the broadcast-join build and the
    # cardinality build) measured a WASH twice — r12 contended (3.01→3.15
    # median) and r13 idle interleaved A/B (persist [2.77, 3.98, 3.5] vs
    # none [3.4, 4.05, 2.78], control flat) — so by the keep-only-wins rule
    # the extra materialization barrier goes.
    ev = grams(toks.filter(F.col("doc_id") % _EVAL_MOD == 0), "eval_doc").distinct()
    corp = grams(toks.filter(F.col("doc_id") % _EVAL_MOD != 0), "corpus_doc")
    card = ev.groupBy("eval_doc").agg(F.count(F.lit(1)).alias("n_eval"))
    ov = (
        corp.join(F.broadcast(ev), "h")
        # dedup AFTER the broadcast filter: repeated grams within a corpus
        # doc must count once, but only survivors pay the distinct.
        .select("corpus_doc", "eval_doc", "h")
        .distinct()
        .groupBy("corpus_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        ov.join(F.broadcast(card), "eval_doc")
        .select(
            "corpus_doc",
            "eval_doc",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.col("n_eval").cast("double"), 6
            ).alias("contamination"),
        )
        .orderBy(F.desc("contamination"), "corpus_doc", "eval_doc")
        .limit(10)
    )


# --- t11: repetition quality filters (Gopher-style) ---------------------------
_REP_TOP_WORD = 0.12   # flag: most frequent token exceeds this share
_REP_DUP_TRI = 0.02    # flag: duplicated-trigram share exceeds this


@register(
    "t11_repetition_filters",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {sql_tokens(sql_norm_text('text'))} AS t FROM documents
    ),
    words AS (SELECT doc_id, unnest(t) AS w FROM toks),
    wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
    wstats AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS n_tok FROM wc GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks WHERE len(t) >= 3
    ),
    tstats AS (
      SELECT doc_id, count(*) AS total, count(DISTINCT g) AS uniq
      FROM tri GROUP BY doc_id
    ),
    per_doc AS (
      SELECT w.doc_id,
             w.top_c / CAST(w.n_tok AS DOUBLE)                    AS top_word_frac,
             coalesce(1 - t.uniq / CAST(t.total AS DOUBLE), 0)    AS dup_tri_frac
      FROM wstats w LEFT JOIN tstats t ON t.doc_id = w.doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE p.top_word_frac > {_REP_TOP_WORD}
                                    OR p.dup_tri_frac > {_REP_DUP_TRI}) AS BIGINT)
                                    AS n_flagged,
           round(avg(p.top_word_frac), 6) AS avg_top_word_frac,
           round(max(p.dup_tri_frac), 6)  AS max_dup_tri_frac
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def t11_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, public):
    per document, the most-frequent-token share and the duplicated-trigram
    share; per language, how many documents a repetition gate would drop.
    These are the standard "degenerate text" screens a pre-training corpus
    runs after exact/near dedup.

    Scale shape: two explode→re-aggregate pipelines (word counts, trigram
    counts) each collapse to ONE row per doc before joining doc-keyed —
    token rows never cross a join, and the final rollup is language-grain.
    No reference counterpart (driver-mandated extension, SURVEY.md §2)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens(norm_text(F.col("text"))).alias("t"))
    words = toks.select("doc_id", F.explode("t").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    wstats = wc.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_tok")
    )
    tri = toks.filter(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 2),"
                   " i -> array_join(slice(t, i, 3), ' '))")
        ).alias("g"),
    )
    tstats = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("g").alias("uniq")
    )
    per_doc = (
        wstats.join(tstats, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("top_c") / F.col("n_tok").cast("double")).alias("top_word_frac"),
            F.coalesce(
                1 - F.col("uniq") / F.col("total").cast("double"), F.lit(0.0)
            ).alias("dup_tri_frac"),
        )
    )
    flagged = (F.col("top_word_frac") > _REP_TOP_WORD) | (
        F.col("dup_tri_frac") > _REP_DUP_TRI
    )
    return (
        per_doc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(flagged, 1)).alias("n_flagged"),
            F.round(F.avg("top_word_frac"), 6).alias("avg_top_word_frac"),
            F.round(F.max("dup_tri_frac"), 6).alias("max_dup_tri_frac"),
        )
        .orderBy("lang")
    )


# --- t12: vocabulary builder (top-K + coverage) -------------------------------
_VOCAB_K = 25


@register(
    "t12_vocab_coverage",
    oracle=f"""
    WITH words AS (
      SELECT unnest({sql_tokens(sql_norm_text('text'))}) AS w FROM documents
    ),
    counts AS (
      SELECT w, count(*) AS c FROM words GROUP BY w
    ),
    tot AS (SELECT sum(c) AS total FROM counts),
    ranked AS (
      SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rnk
      FROM counts
    )
    SELECT r.rnk, r.w AS token, CAST(r.c AS BIGINT) AS n_occurrences,
           round(r.c / CAST(t.total AS DOUBLE), 6) AS token_share,
           round(sum(r.c) OVER (ORDER BY r.rnk) / CAST(t.total AS DOUBLE), 6)
             AS cumulative_coverage
    FROM ranked r CROSS JOIN tot t
    WHERE r.rnk <= {_VOCAB_K}
    ORDER BY r.rnk
    """,
)
def t12_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder — the tokenizer-training precursor: corpus-wide
    token counts, the top-{_VOCAB_K} vocabulary ranked by frequency
    (alphabetical tiebreak), each token's corpus share, and the cumulative
    coverage curve a vocab-size decision reads.

    Scale shape: explode → count per token is one map-side-combined
    aggregation; the ranking window runs over the |vocab| frame (token
    types, not token occurrences) and the coverage window over the top-K
    slice only.  |vocab| ≪ corpus at any scale (Heaps' law), and the
    single-partition window is bounded by it."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(norm_text(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("total"))
    ranked = counts.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("c"), "w"))
    ).filter(F.col("rnk") <= _VOCAB_K)
    cum = W.orderBy("rnk").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rnk",
            F.col("w").alias("token"),
            F.col("c").cast("long").alias("n_occurrences"),
            F.round(F.col("c") / F.col("total").cast("double"), 6).alias(
                "token_share"
            ),
            F.round(
                F.sum("c").over(cum) / F.col("total").cast("double"), 6
            ).alias("cumulative_coverage"),
        )
        .orderBy("rnk")
    )


# --- t13: per-document word-entropy quality signal ---------------------------
_SQL_T13_TOK = sql_tokens(sql_norm_text("text"))

@register(
    "t13_word_entropy",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_SQL_T13_TOK}) AS w
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, lang, w, count(*) AS c FROM tok GROUP BY 1, 2, 3
    ),
    doc AS (
      SELECT doc_id, lang,
             CAST(sum(c) AS BIGINT)     AS n,
             sum(c * log2(c))           AS clc
      FROM cnt GROUP BY 1, 2
    ),
    ent AS (
      SELECT lang, round(log2(n) - clc / n, 6) AS entropy FROM doc
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                         AS n_docs,
           round(avg(entropy), 4)                           AS avg_entropy,
           min(entropy)                                     AS min_entropy,
           max(entropy)                                     AS max_entropy,
           CAST(count(CASE WHEN entropy < 3.0 THEN 1 END) AS BIGINT)
                                                            AS n_low_entropy
    FROM ent GROUP BY lang ORDER BY lang
    """,
)
def t13_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon word-entropy per document — the information-density quality
    signal real LLM-corpus filters use to drop keyword-stuffed / looping /
    boilerplate pages (low entropy = few token types dominate).  Computed
    exactly as H = log2(n) − Σ c·log2(c) / n from per-(doc, token) counts,
    so no probability column ever materializes.

    Scale shape: token explode is immediately re-aggregated to (doc, token)
    counts (map-side combine — the shuffle carries type counts, not token
    occurrences), then to one row per doc, then to one row per lang; every
    stage shrinks.  Pure built-ins end-to-end: explode + two hash
    aggregates, zero UDFs, identical double math (log2 over exact integer
    counts) on both engines with per-doc rounding pinned at 6 decimals
    before any cross-doc aggregate."""
    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select(
            "doc_id",
            "lang",
            F.explode(tokens(norm_text(F.col("text")))).alias("w"),
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    doc = cnt.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clc"),
    )
    ent = doc.select(
        "lang",
        F.round(F.log2("n") - F.col("clc") / F.col("n"), 6).alias("entropy"),
    )
    return (
        ent.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("entropy"), 4).alias("avg_entropy"),
            F.min("entropy").alias("min_entropy"),
            F.max("entropy").alias("max_entropy"),
            F.count(F.when(F.col("entropy") < 3.0, 1)).alias("n_low_entropy"),
        )
        .orderBy("lang")
    )


# --- t14: duplicated-substring share (exact corpus-level substring dedup) -----
_SUB_N = 12       # word n-gram width ≈ the 50-token windows of the public
                  # exact-substring dedup recipe, scaled to this corpus's
                  # short docs (Lee et al. 2021, "Deduplicating Training Data
                  # Makes Language Models Better" — public method, own code)
_SUB_FLAG = 0.5   # flag docs with more than half their windows duplicated


@register(
    "t14_substring_dup_share",
    headline=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens(sql_norm_text('text'))} AS toks FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, {sql_hex_int('g')} AS h FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {_SUB_N - 2}),
                      i -> array_to_string(toks[i:i+{_SUB_N - 1}], ' '))) AS g
        FROM toks WHERE len(toks) >= {_SUB_N}
      )
    ),
    shared AS (
      SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
    ),
    per_doc AS (
      SELECT g.doc_id,
             count(*)                              AS n_grams,
             count(s.h)                            AS n_dup
      FROM grams g LEFT JOIN shared s USING (h)
      GROUP BY g.doc_id
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_dup AS BIGINT)   AS n_dup_grams,
           round(n_dup / CAST(n_grams AS DOUBLE), 6) AS dup_share,
           (n_dup > {_SUB_FLAG} * n_grams)           AS flagged
    FROM per_doc
    ORDER BY dup_share DESC, doc_id LIMIT 20
    """,
)
def t14_substring_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup signal (the public exact-substring recipe
    at word-window grain): for every document, the share of its distinct
    word-12-gram windows that also occur in at least one OTHER document —
    the quantity a substring-dedup pass thresholds to cut boilerplate and
    templated spans that survive whole-doc dedup (d01) and near-dup (d05).
    Since each doc's grams are DISTINCT first, "duplicated" reduces to
    gram-frequency ≥ 2 corpus-wide.

    Scale shape: explode → per-doc distinct (shuffle 1, on (doc, h)) →
    gram-frequency HAVING ≥2 (shuffle 2, on h, map-side combined) → equi
    join back on h (co-partitioned with shuffle 2) → per-doc counts
    (shuffle 3, doc-grain rows only).  No all-pairs stage anywhere: cost is
    linear in total gram volume, the same shape the public recipe runs at
    trillion-token scale.  No reference counterpart (SURVEY.md §2 Part B)."""
    d = read_table(spark, sf_dir, "documents")
    toks = (
        spread(d.select("doc_id", "text"))
        .select("doc_id", tokens(norm_text(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= _SUB_N)
    )
    # Per-doc distinctness needs NO shuffle: all of a doc's gram hashes sit
    # in one array before the explode, so array_distinct == the old
    # (doc_id, h).distinct() exchange (opt r12, guide §1.2 step 1 / §2.4 —
    # the old shape recomputed the tokenize→explode→distinct pipeline THREE
    # times: totals, semi-join probe, shared build; interleaved A/B 28.8 s →
    # 2.1 s median).  Corpus doc-frequency is then one window over h and the
    # doc-grain rollup one map-side-combined aggregate — 2 shuffles, 0 joins.
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, size(toks) - {_SUB_N - 1}),"
                f" i -> CAST(conv(substring(md5(array_join(slice(toks, i, {_SUB_N}),"
                f" ' ')), 1, 8), 16, 10) AS BIGINT)))"
            )
        ).alias("h"),
    )
    cnt = grams.select(
        "doc_id", F.count(F.lit(1)).over(W.partitionBy("h")).alias("cnt")
    )
    per_doc = cnt.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).alias("n_dup"),
    )
    return (
        per_doc.select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_dup").cast("long").alias("n_dup_grams"),
            F.round(
                F.col("n_dup") / F.col("n_grams").cast("double"), 6
            ).alias("dup_share"),
            (F.col("n_dup") > _SUB_FLAG * F.col("n_grams")).alias("flagged"),
        )
        .orderBy(F.desc("dup_share"), "doc_id")
        .limit(20)
    )


# --- t16: distinctive terms per source (log-likelihood ratio) -----------------
_T16_TOP = 3
_T16_MIN_COUNT = 5  # ignore ultra-rare terms (LLR unstable, output noisy)


def _llr_term(k: str, e: str) -> str:
    """One Dunning LLR term k·ln(k/e) with the 0·ln(0)=0 convention —
    identical SQL text runs on both engines (exact-integer k, e as an exact
    ratio of integers, so the doubles agree bit-for-bit)."""
    return f"CASE WHEN {k} = 0 THEN 0.0 ELSE {k} * ln({k} / ({e})) END"


@register(
    "t16_distinctive_terms",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({sql_tokens(sql_norm_text('text'))}) AS term
      FROM documents
    ),
    tc AS (
      SELECT source, term, count(*) AS k11 FROM tok GROUP BY source, term
    ),
    term_tot AS (SELECT term, sum(k11) AS c1 FROM tc GROUP BY term),
    src_tot AS (SELECT source, sum(k11) AS r1 FROM tc GROUP BY source),
    n AS (SELECT sum(k11) AS nn FROM tc),
    cells AS (
      SELECT tc.source, tc.term,
             CAST(tc.k11 AS DOUBLE) AS k11,
             CAST(tt.c1 - tc.k11 AS DOUBLE) AS k21,
             CAST(st.r1 - tc.k11 AS DOUBLE) AS k12,
             CAST(n.nn - tt.c1 - st.r1 + tc.k11 AS DOUBLE) AS k22,
             CAST(st.r1 AS DOUBLE) AS r1, CAST(tt.c1 AS DOUBLE) AS c1,
             CAST(n.nn AS DOUBLE) AS nn
      FROM tc JOIN term_tot tt USING (term) JOIN src_tot st USING (source), n
      WHERE tc.k11 >= {_T16_MIN_COUNT}
    ),
    scored AS (
      SELECT source, term,
             round(2 * ({_llr_term('k11', 'r1 * c1 / nn')}
                      + {_llr_term('k12', 'r1 * (nn - c1) / nn')}
                      + {_llr_term('k21', '(nn - r1) * c1 / nn')}
                      + {_llr_term('k22', '(nn - r1) * (nn - c1) / nn')}), 4)
               AS llr
      FROM cells
    ),
    ranked AS (
      SELECT source, term, llr,
             row_number() OVER (PARTITION BY source
                                ORDER BY llr DESC, term) AS rnk
      FROM scored
    )
    SELECT source, term, llr, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_T16_TOP}
    ORDER BY source, rnk
    """,
)
def t16_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source via Dunning's log-likelihood ratio
    (the standard corpus-linguistics significance test, public): for each
    (source, term), LLR of the 2×2 contingency (term-in-source vs rest of
    corpus), top-3 per source — the "what makes this domain's language
    different" report a mixture-design pass reads next to p05's volume
    reweighting.  All four cell counts are exact integers and the expected
    values are exact integer ratios, so the doubles (and the round(4) that
    feeds the rank) agree across engines; ranks tie-break on term.

    Scale shape: explode → (source, term) counts (map-side combined), two
    marginal aggregates re-joined on term/source grain (vocab-sized, not
    corpus-sized), one 1-row total broadcast, and a per-source top-k
    window over the vocab-grain frame.  No reference counterpart."""
    d = read_table(spark, sf_dir, "documents")
    tok = spread(d.select("source", norm_text(F.col("text")).alias("nt"))).select(
        "source", F.explode(tokens(F.col("nt"))).alias("term")
    )
    tc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("k11"))
    term_tot = tc.groupBy("term").agg(F.sum("k11").alias("c1"))
    src_tot = tc.groupBy("source").agg(F.sum("k11").alias("r1"))
    nn = tc.agg(F.sum("k11").alias("nn"))
    cells = (
        tc.filter(F.col("k11") >= _T16_MIN_COUNT)
        .join(term_tot, "term")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            "term",
            F.col("k11").cast("double").alias("k11"),
            (F.col("c1") - F.col("k11")).cast("double").alias("k21"),
            (F.col("r1") - F.col("k11")).cast("double").alias("k12"),
            (F.col("nn") - F.col("c1") - F.col("r1") + F.col("k11"))
            .cast("double")
            .alias("k22"),
            F.col("r1").cast("double").alias("r1"),
            F.col("c1").cast("double").alias("c1"),
            F.col("nn").cast("double").alias("nn"),
        )
    )
    llr = F.round(
        2
        * (
            F.expr(_llr_term("k11", "r1 * c1 / nn"))
            + F.expr(_llr_term("k12", "r1 * (nn - c1) / nn"))
            + F.expr(_llr_term("k21", "(nn - r1) * c1 / nn"))
            + F.expr(_llr_term("k22", "(nn - r1) * (nn - c1) / nn"))
        ),
        4,
    )
    w = W.partitionBy("source").orderBy(F.desc("llr"), "term")
    return (
        cells.select("source", "term", llr.alias("llr"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _T16_TOP)
        .select("source", "term", "llr", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("source", "rnk")
    )


# --- t17: Count-Min sketch + exact audit ---------------------------------------
import random as _random

_CMS_P = 2147483647
_CMS_W = 512   # buckets per row
_CMS_D = 4     # hash rows (estimate = min over rows)
_cms_rng = _random.Random(20260814)
_CMS_HASHES: list[tuple[int, int]] = [
    (_cms_rng.randrange(1, 1_000_000), _cms_rng.randrange(0, _CMS_P))
    for _ in range(_CMS_D)
]
_T17_TOP = 10


def _cms_bucket(i: int) -> str:
    a, b = _CMS_HASHES[i]
    return f"((h * {a} + {b}) % {_CMS_P}) % {_CMS_W}"


@register(
    "t17_countmin_audit",
    headline=True,
    oracle=f"""
    WITH tok AS (
      SELECT unnest({sql_tokens(sql_norm_text('text'))}) AS term FROM documents
    ),
    th AS (SELECT term, {sql_hex_int('term')} AS h FROM tok),
    cms AS (
      SELECT i, bucket, count(*) AS c FROM (
        {" UNION ALL ".join(f"SELECT {i} AS i, {_cms_bucket(i)} AS bucket FROM th" for i in range(_CMS_D))}
      ) GROUP BY i, bucket
    ),
    exact AS (
      SELECT term, any_value(h) AS h, count(*) AS exact
      FROM th GROUP BY term
      ORDER BY exact DESC, term LIMIT {_T17_TOP}
    ),
    probes AS (
      {" UNION ALL ".join(f"SELECT term, exact, {i} AS i, {_cms_bucket(i)} AS bucket FROM exact" for i in range(_CMS_D))}
    ),
    est AS (
      SELECT p.term, any_value(p.exact) AS exact, min(c.c) AS est
      FROM probes p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
      GROUP BY p.term
    )
    SELECT term,
           CAST(exact AS BIGINT)       AS exact,
           CAST(est AS BIGINT)         AS est,
           CAST(est - exact AS BIGINT) AS overestimate
    FROM est ORDER BY exact DESC, term
    """,
)
def t17_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, public) built
    distributively, audited against exact counts: the token stream updates
    a {_CMS_D}x{_CMS_W} counter matrix ({_CMS_D} pairwise-independent hash
    rows; one tiny aggregate, the sketch IS the groupBy result), and each
    of the top-{_T17_TOP} exact terms probes its {_CMS_D} buckets — the
    estimate (min over rows) must over-count by construction, never
    under-count, and the audit reports by how much.  Everything is integer
    arithmetic on embedded hash constants, so unlike the built-in sketch
    ops (q29, rows-only), this sketch is value-hash-checked cross-engine.

    Scale shape: sketch build is one map-side-combined aggregate to
    {_CMS_D}·{_CMS_W} cells — CONSTANT state regardless of corpus size
    (the point of a sketch: mergeable across partitions, bounded memory);
    probes are a broadcast join of {_T17_TOP}·{_CMS_D} rows against it.
    No reference counterpart (SURVEY.md §2 Part B)."""
    d = read_table(spark, sf_dir, "documents")
    th = spread(
        d.select(norm_text(F.col("text")).alias("nt"))
    ).select(F.explode(tokens(F.col("nt"))).alias("term")).select(
        "term", hex_int(F.col("term")).alias("h")
    )
    cells = th.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_cms_bucket(i)).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("x")
    ).select("x.i", "x.bucket")
    cms = cells.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        th.groupBy("term")
        .agg(F.first("h").alias("h"), F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), "term")
        .limit(_T17_TOP)
    )
    probes = exact.select(
        "term",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_cms_bucket(i)).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("x"),
    ).select("term", "exact", "x.i", "x.bucket")
    est = (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("term")
        .agg(F.first("exact").alias("exact"), F.min("c").alias("est"))
    )
    return est.select(
        "term",
        F.col("exact").cast("long").alias("exact"),
        F.col("est").cast("long").alias("est"),
        (F.col("est") - F.col("exact")).cast("long").alias("overestimate"),
    ).orderBy(F.desc("exact"), "term")


# --- t18: bigram-LM perplexity proxy (LM-based quality filtering) -------------
_T18_SCALE = 1_000_000_000  # ln values rounded to 1e-9 and summed as BIGINTs


@register(
    "t18_bigram_perplexity",
    headline=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {sql_tokens(sql_norm_text('text'))} AS toks
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, lang,
             toks[i] AS w1, toks[i + 1] AS w2
      FROM toks, unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ),
    bg_counts AS (SELECT w1, w2, count(*) AS cb FROM bigrams GROUP BY w1, w2),
    ug_counts AS (SELECT w1, count(*) AS cu FROM bigrams GROUP BY w1),
    vocab AS (SELECT count(DISTINCT w2) AS v FROM bigrams),
    scored AS (
      SELECT b.doc_id, b.lang,
             -- add-1-smoothed bigram logprob, fixed-point at 1e-9 so the
             -- per-doc SUM is exact integer arithmetic (double sums are
             -- order-dependent; ln inputs are exact integer ratios)
             CAST(round(ln((bc.cb + 1) / CAST(uc.cu + vv.v AS DOUBLE))
                        * {_T18_SCALE}) AS BIGINT) AS lp
      FROM bigrams b
      JOIN bg_counts bc USING (w1, w2)
      JOIN ug_counts uc USING (w1)
      CROSS JOIN vocab vv
    ),
    per_doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             count(*) AS n_bigrams,
             CAST(-sum(lp) // count(*) AS BIGINT) AS nll_e9
      FROM scored GROUP BY doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT)        AS total_bigrams,
           CAST(min(nll_e9) AS BIGINT)           AS min_nll_e9,
           CAST(max(nll_e9) AS BIGINT)           AS max_nll_e9,
           CAST(sum(nll_e9) // count(*) AS BIGINT) AS avg_nll_e9
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def t18_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality filtering (the CCNet/perplexity-filter recipe,
    public): train an add-1-smoothed bigram LM on the corpus itself, score
    every document by its average per-bigram negative log-likelihood, and
    report the per-language NLL distribution — keyword-stuffed or
    boilerplate pages score as outliers against the corpus LM where
    surface heuristics (t02) miss them.  Determinism engineering: each
    bigram's log-probability is an ln of an EXACT integer ratio, rounded
    to 1e-9 and summed as BIGINT fixed point, so per-doc and per-lang
    aggregates are bit-identical cross-engine (a double sum would be
    summation-order lore).

    Scale shape: bigram explode → (w1,w2) and (w1) count aggregates
    (map-side combined, vocab-grain results); scoring re-joins the bigram
    stream against both count tables on their keys (the LM "training" and
    "scoring" passes of the real recipe); one doc-grain and one lang-grain
    aggregate close it out.  No reference counterpart (SURVEY.md §2)."""
    d = read_table(spark, sf_dir, "documents")
    # spread the RAW columns and tokenize ABOVE the exchange (opt r12, guide
    # §2.4): with the projection inside spread() the regex normalize+split of
    # the whole corpus ran below the shuffle on the source's single input
    # split.
    toks = (
        spread(d.select("doc_id", "lang", "text"))
        .select("doc_id", "lang", tokens(norm_text(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    bigrams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "lang", "bg.w1", "bg.w2")
    # cu and V are marginals of the (w1,w2) count table — derive them from
    # vocab-sized bg_counts instead of re-tokenizing and re-exploding the
    # whole corpus (sum(cb) over w2 ≡ count per w1, distinct w2 of pairs ≡
    # distinct w2), and PERSIST bg_counts so its three consumers share one
    # build (opt r12, guide §1.2 step 1: Spark has no common-subtree reuse,
    # so the unpersisted frame re-ran tokenize+explode per consumer — 4
    # corpus passes; now 2).  The persisted frame is vocab-grain (distinct
    # word pairs), o(corpus) per the bounded_persist contract.
    bg_counts = bounded_persist(
        bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")),
        "distinct bigram vocabulary",
    )
    ug_counts = bg_counts.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cu")
    )
    vocab = bg_counts.agg(F.countDistinct("w2").alias("v"))
    scored = (
        bigrams.join(bg_counts, ["w1", "w2"])
        .join(ug_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.log((F.col("cb") + 1) / (F.col("cu") + F.col("v")).cast("double"))
                * _T18_SCALE,
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("CAST(-sum(lp) div count(*) AS BIGINT)").alias("nll_e9"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            F.min("nll_e9").alias("min_nll_e9"),
            F.max("nll_e9").alias("max_nll_e9"),
            F.expr("CAST(sum(nll_e9) div count(*) AS BIGINT)").alias("avg_nll_e9"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_bigrams").cast("long").alias("total_bigrams"),
            "min_nll_e9",
            "max_nll_e9",
            "avg_nll_e9",
        )
        .orderBy("lang")
    )


# --- t19: Zipf rank-frequency fit ----------------------------------------------
_T19_TOP = 100      # fit over the top-K ranks (the Zipfian head)
_T19_SCALE = 1_000_000  # 1e-6: ln(rank) ~ 4.6 -> x^2 sums stay far below int64


@register(
    "t19_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({sql_tokens(sql_norm_text('text'))}) AS term FROM documents
    ),
    freq AS (
      SELECT term, count(*) AS f FROM tok GROUP BY term
    ),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r
      FROM freq QUALIFY r <= {_T19_TOP}
    ),
    pts AS (
      SELECT CAST(round(ln(r) * {_T19_SCALE}) AS BIGINT) AS x_e9,
             CAST(round(ln(f) * {_T19_SCALE}) AS BIGINT) AS y_e9
      FROM ranked
    ),
    s AS (
      SELECT count(*) AS n, sum(x_e9) AS sx, sum(y_e9) AS sy,
             sum(x_e9 * x_e9) AS sxx, sum(x_e9 * y_e9) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           -- OLS slope on the log-log points: the Zipf exponent estimate
           round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             AS zipf_slope
    FROM s
    """,
)
def t19_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit — natural language puts token frequencies
    on a log-log line of slope ≈ −1; corpora that deviate hard (flat:
    keyword lists / generated spam; steep: template boilerplate) fail the
    naturalness prior, making the fitted exponent a corpus-level quality
    gate beside the doc-level filters (t11/t13/t18).  The OLS slope over
    the top-{_T19_TOP} (ln rank, ln freq) points runs on 1e-6 fixed-point
    integers (1e-9 would overflow int64 in the x·x moment) (q66's exact-moment pattern: sums are BIGINT-exact, only the
    final closed form touches doubles).

    Scale: one token count aggregate (map-side combined), a top-K window
    over the vocab-grain result, and a constant-size moment reduce.
    No reference counterpart (SURVEY.md §2 Part B)."""
    d = read_table(spark, sf_dir, "documents")
    tok = spread(d.select(norm_text(F.col("text")).alias("nt"))).select(
        F.explode(tokens(F.col("nt"))).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = W.orderBy(F.desc("f"), "term")
    ranked = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _T19_TOP)
    )
    pts = ranked.select(
        F.round(F.log("r") * _T19_SCALE, 0).cast("long").alias("x_e9"),
        F.round(F.log("f") * _T19_SCALE, 0).cast("long").alias("y_e9"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_e9").alias("sx"),
        F.sum("y_e9").alias("sy"),
        F.sum(F.col("x_e9") * F.col("x_e9")).alias("sxx"),
        F.sum(F.col("x_e9") * F.col("y_e9")).alias("sxy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("zipf_slope"),
    )


# --- t20: code-vs-prose detection ----------------------------------------------
_T20_SYM_FLAG = 0.05   # symbol-char share above this → code-like
_T20_KW_FLAG = 2       # at least this many code keywords → code-like


@register(
    "t20_code_detection",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             length(text)
               - length(regexp_replace(text, '[{}\[\]();=<>|&]', '', 'g'))
               AS n_sym,
             len(regexp_extract_all(lower(text),
                 '\b(def|return|import|class|void|func|var|const|if|else)\b'))
               AS n_kw
      FROM documents WHERE length(text) > 0
    ),
    scored AS (
      SELECT lang,
             (n_sym / CAST(n_chars AS DOUBLE) > 0.05 AND n_kw >= 2) AS is_code
      FROM feats
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(count(*) FILTER (WHERE is_code) AS BIGINT) AS n_code_like,
           round(count(*) FILTER (WHERE is_code)
                 / CAST(count(*) AS DOUBLE), 6)            AS code_share
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def t20_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection — the mixture-routing signal that decides
    whether a document feeds the code pipeline or the text pipeline
    (mislabeling costs both: code tokenizes terribly as prose, prose
    pollutes code corpora): a doc is code-like when BOTH the structural-
    symbol share (braces/brackets/operators per char) and the programming-
    keyword count clear thresholds — two cheap orthogonal signals, per the
    public heuristic-prefilter practice (a learned classifier replaces the
    thresholds at quality, not plumbing, cost).  Counting is exact
    integers; the one division is share-of-counts.

    Scale: two scan-fused regex projections + a lang-grain rollup — no
    shuffle beyond the 5-row combine.  No reference counterpart."""
    d = read_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_sym = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[{}\[\]();=<>|&]", "")
    )
    n_kw = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")),
            F.lit(r"\b(def|return|import|class|void|func|var|const|if|else)\b"),
            F.lit(0),
        )
    )
    is_code = (
        (n_sym / F.length("text").cast("double") > _T20_SYM_FLAG)
        & (n_kw >= _T20_KW_FLAG)
    )
    return (
        d.select("lang", is_code.alias("is_code"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("is_code"), 1)).alias("n_code_like"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_code_like").cast("long").alias("n_code_like"),
            F.round(
                F.col("n_code_like") / F.col("n_docs").cast("double"), 6
            ).alias("code_share"),
        )
        .orderBy("lang")
    )


# --- t22: language-ID evaluation metrics ---------------------------------------
@register(
    "t22_langid_metrics",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_sql_lang_scores()}
      FROM documents
    ),
    pred AS (
      SELECT lang AS truth, {_sql_argmax()} AS predicted FROM scores
    ),
    per_class AS (
      SELECT c.lang,
             (SELECT count(*) FROM pred WHERE truth = c.lang AND predicted = c.lang) AS tp,
             (SELECT count(*) FROM pred WHERE truth != c.lang AND predicted = c.lang) AS fp,
             (SELECT count(*) FROM pred WHERE truth = c.lang AND predicted != c.lang) AS fn
      FROM (SELECT DISTINCT lang FROM documents) c
    )
    SELECT lang,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           round(tp / greatest(CAST(tp + fp AS DOUBLE), 1), 6) AS precision,
           round(tp / greatest(CAST(tp + fn AS DOUBLE), 1), 6) AS recall
    FROM per_class ORDER BY lang
    """,
)
def t22_langid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation IN the engine: per-class precision/recall of
    the t03 marker-word language identifier against the corpus's ground-
    truth labels — the evaluation loop that decides whether a heuristic
    filter is good enough to gate data (t03 emits the confusion matrix;
    this derives the decision metrics).  Counts are exact; P/R are exact-
    integer ratios rounded at 6dp.

    Scale shape: one scan scores and predicts (same projections as t03),
    then a truth×predicted-grain aggregate pivots into per-class TP/FP/FN
    with conditional sums — the confusion matrix never leaves the
    executor as rows, only class-grain counters do."""
    d = read_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    scores = d.select(
        "lang",
        *[count_in(tok, LANG_MARKERS[lang]).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    pr = scores.select(F.col("lang").alias("truth"), pred.alias("predicted"))
    classes = d.select(F.col("lang")).distinct()
    cells = pr.groupBy("truth", "predicted").agg(F.count(F.lit(1)).alias("n"))
    tp = cells.filter(F.col("truth") == F.col("predicted")).select(
        F.col("truth").alias("lang"), F.col("n").alias("tp")
    )
    fp = (
        cells.filter(F.col("truth") != F.col("predicted"))
        .groupBy(F.col("predicted").alias("lang"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        cells.filter(F.col("truth") != F.col("predicted"))
        .groupBy(F.col("truth").alias("lang"))
        .agg(F.sum("n").alias("fn"))
    )
    return (
        classes.join(tp, "lang", "left")
        .join(fp, "lang", "left")
        .join(fn, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("long").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("long").alias("fn"),
        )
        .select(
            "lang",
            "tp",
            "fp",
            "fn",
            F.round(
                F.col("tp")
                / F.greatest((F.col("tp") + F.col("fp")).cast("double"), F.lit(1.0)),
                6,
            ).alias("precision"),
            F.round(
                F.col("tp")
                / F.greatest((F.col("tp") + F.col("fn")).cast("double"), F.lit(1.0)),
                6,
            ).alias("recall"),
        )
        .orderBy("lang")
    )


# --- t23: readability scoring (Flesch-style proxy) ------------------------------
@register(
    "t23_readability",
    oracle=rf"""
    WITH feats AS (
      SELECT lang,
             len({sql_tokens(sql_norm_text('text'))}) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
             -- syllable proxy: vowel GROUPS per doc (the public
             -- Flesch-family approximation when no dictionary is loaded)
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)       AS n_docs,
           CAST(sum(n_words) AS BIGINT)   AS total_words,
           CAST(sum(n_sents) AS BIGINT)   AS total_sentences,
           CAST(sum(n_syll) AS BIGINT)    AS total_syllables,
           -- corpus-level Flesch reading ease from the exact totals
           round(206.835 - 1.015 * (sum(n_words) / CAST(sum(n_sents) AS DOUBLE))
                         - 84.6 * (sum(n_syll) / CAST(sum(n_words) AS DOUBLE)),
                 4) AS flesch_ease
    FROM feats GROUP BY lang ORDER BY lang
    """,
)
def t23_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring (Flesch reading ease, public formula, with the
    standard vowel-group syllable proxy) — the audience-level quality
    axis the length/repetition filters don't capture: a corpus can be
    clean and non-repetitive yet uniformly impenetrable (or uniformly
    trivial), and mixture designers balance reading levels explicitly.
    All three inputs (words, sentence-terminator runs, vowel groups) are
    exact integer counts; the formula applies once per language to the
    exact totals, so the one double expression evaluates identical
    operands on both engines.

    Scale: three scan-fused regex projections + a lang-grain rollup —
    the t01/t02 shape with a third counting unit (sentences).
    No reference counterpart (SURVEY.md §2 Part B)."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    feats = d.select(
        "lang",
        F.size(tokens(norm_text(F.col("text")))).alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))),
            F.lit(1),
        ).alias("n_sents"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ).alias("n_syll"),
    )
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_sents").alias("total_sentences"),
            F.sum("n_syll").alias("total_syllables"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_words").cast("long").alias("total_words"),
            F.col("total_sentences").cast("long").alias("total_sentences"),
            F.col("total_syllables").cast("long").alias("total_syllables"),
            F.round(
                F.lit(206.835)
                - 1.015
                * (F.col("total_words") / F.col("total_sentences").cast("double"))
                - 84.6
                * (F.col("total_syllables") / F.col("total_words").cast("double")),
                4,
            ).alias("flesch_ease"),
        )
        .orderBy("lang")
    )


# --- t25: template/boilerplate page detection -----------------------------------
_T25_MIN_GROUP = 3  # a skeleton shared by at least this many docs = template


@register(
    "t25_template_detection",
    oracle=f"""
    WITH skel AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[0-9]+', '0', 'g'), '\\s+', ' ', 'g'))) AS skeleton
      FROM documents
    ),
    groups AS (
      SELECT skeleton, count(*) AS n_docs, min(doc_id) AS exemplar
      FROM skel GROUP BY skeleton
    )
    SELECT CAST(count(*) AS BIGINT)                                AS n_skeletons,
           CAST(count(*) FILTER (WHERE n_docs >= {_T25_MIN_GROUP}) AS BIGINT)
                                                                   AS n_templates,
           CAST(sum(n_docs) FILTER (WHERE n_docs >= {_T25_MIN_GROUP}) AS BIGINT)
                                                                   AS n_templated_docs,
           round(coalesce(sum(n_docs) FILTER (WHERE n_docs >= {_T25_MIN_GROUP}), 0)
                 / CAST(sum(n_docs) AS DOUBLE), 6)                  AS templated_share,
           CAST(min(exemplar) FILTER (WHERE n_docs >= {_T25_MIN_GROUP}) AS BIGINT)
                                                                   AS first_exemplar
    FROM groups
    """,
)
def t25_template_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate PAGE detection — the crawler-cleanup step
    between exact dedup and near-dup: pages generated from one skeleton
    ("Showing 23 results for ...") are distinct strings (d01 misses
    them) yet not gradual variants (shingle near-dup over-pays for
    them); masking the VARIABLE slots (digit runs → 0, whitespace
    collapse, case fold) makes skeleton-mates hash-identical, so
    template discovery is one exact groupBy on the masked fingerprint —
    the public "structural dedup" recipe at its cheapest useful form
    (URL-pattern + DOM-path masks extend the same pipeline).

    Scale: one scan-fused masking projection + one fingerprint-grain
    aggregate; the report is skeleton-grain.  Templated share feeding
    p05's reweighting is the operational consumer."""
    d = read_table(spark, sf_dir, "documents")
    skeleton = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), r"[0-9]+", "0"),
                r"\s+",
                " ",
            )
        )
    )
    groups = (
        d.select("doc_id", skeleton.alias("skeleton"))
        .groupBy("skeleton")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("exemplar"))
    )
    is_t = F.col("n_docs") >= _T25_MIN_GROUP
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_skeletons"),
        F.count(F.when(is_t, 1)).cast("long").alias("n_templates"),
        F.sum(F.when(is_t, F.col("n_docs"))).cast("long").alias("n_templated_docs"),
        F.round(
            F.coalesce(F.sum(F.when(is_t, F.col("n_docs"))), F.lit(0))
            / F.sum("n_docs").cast("double"),
            6,
        ).alias("templated_share"),
        F.min(F.when(is_t, F.col("exemplar"))).cast("long").alias("first_exemplar"),
    )


# --- t26: writing-system (script) detection -------------------------------------
_T26_CJK = "[一-鿿]"          # CJK unified ideographs (U+4E00–U+9FFF)
_T26_LATIN = "[A-Za-zÀ-ÿ]"    # basic latin + latin-1 supplement letters


@register(
    "t26_script_detection",
    oracle=f"""
    WITH feats AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_T26_CJK}'))   AS n_cjk,
             len(regexp_extract_all(text, '{_T26_LATIN}')) AS n_latin,
             length(text) AS n_chars
      FROM documents WHERE length(text) > 0
    ),
    scored AS (
      SELECT lang,
             CASE WHEN n_cjk > n_latin THEN 'cjk'
                  WHEN n_latin > 0 THEN 'latin'
                  ELSE 'other' END AS script,
             n_cjk, n_latin
      FROM feats
    )
    SELECT lang, script,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(n_cjk) AS BIGINT) AS total_cjk_chars,
           CAST(sum(n_latin) AS BIGINT) AS total_latin_chars
    FROM scored GROUP BY lang, script ORDER BY lang, script
    """,
)
def t26_script_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writing-system (SCRIPT) detection — the i18n layer UNDER language
    ID: script is decidable from unicode ranges alone (no marker words,
    no model), so it is the cheap first router — a doc whose dominant
    script is CJK never needs the latin-language marker scan (t03), and
    a LABEL/script disagreement (lang='en' but CJK-dominant) is a
    mislabeling signal neither check finds alone.  Range counting via
    character-class regex is exact in the shared Java∩RE2 dialect
    (ranges verified cross-engine by the text-primitive fuzz suite's
    alphabets).

    Scale: two scan-fused range counts + a (lang, script) rollup."""
    d = read_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_cjk = F.size(
        F.regexp_extract_all("text", F.lit(_T26_CJK), F.lit(0))
    )
    n_latin = F.size(
        F.regexp_extract_all("text", F.lit(_T26_LATIN), F.lit(0))
    )
    scored = d.select(
        "lang",
        F.when(n_cjk > n_latin, "cjk")
        .when(n_latin > 0, "latin")
        .otherwise("other")
        .alias("script"),
        n_cjk.alias("n_cjk"),
        n_latin.alias("n_latin"),
    )
    return (
        scored.groupBy("lang", "script")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_cjk").cast("long").alias("total_cjk_chars"),
            F.sum("n_latin").cast("long").alias("total_latin_chars"),
        )
        .orderBy("lang", "script")
    )


# --- t27: line-level boilerplate detection (CCNet-style) ------------------------
_T27_MIN_DF = 5  # a line appearing in this many docs of one source = boilerplate


@register(
    "t27_line_boilerplate",
    oracle=f"""
    WITH lines AS (
      SELECT DISTINCT doc_id, source,
             trim(l) AS line
      FROM documents,
           unnest(string_split(text, chr(10))) AS t(l)
      WHERE length(trim(l)) > 0
    ),
    df AS (
      SELECT source, line, count(*) AS line_df
      FROM lines GROUP BY source, line
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                            AS n_distinct_lines,
           CAST(count(*) FILTER (WHERE line_df >= {_T27_MIN_DF}) AS BIGINT)
                                                               AS n_boilerplate,
           CAST(sum(line_df) FILTER (WHERE line_df >= {_T27_MIN_DF}) AS BIGINT)
                                                               AS boilerplate_occurrences,
           round(coalesce(sum(line_df) FILTER (WHERE line_df >= {_T27_MIN_DF}), 0)
                 / CAST(sum(line_df) AS DOUBLE), 6)            AS boilerplate_share
    FROM df GROUP BY source ORDER BY source
    """,
)
def t27_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level boilerplate detection — the CCNet recipe's actual dedup
    grain (public: CCNet dedups paragraphs/lines across a source before
    any doc-level pass, because nav bars, footers, and cookie banners
    repeat across a domain's pages while every PAGE stays unique): a
    line occurring in ≥{_T27_MIN_DF} distinct docs of one source is
    boilerplate, and the share of line occurrences that are boilerplate
    is the strip-ratio estimate the cleaning pass will remove.  Per-doc
    DISTINCT first, so a line repeated inside one doc counts once.

    Scale: line explode → (doc, source, line) distinct → (source, line)
    DF aggregate — t14's gram-frequency program at line grain, linear in
    line volume; the strip itself is then a broadcast/semi-join of the
    flagged lines back onto the explode (d11's survivor shape)."""
    d = read_table(spark, sf_dir, "documents")
    lines = (
        spread(d.select("doc_id", "source", F.col("text")))
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), "\n")).alias("l"),
        )
        .select("doc_id", "source", F.trim(F.col("l")).alias("line"))
        .filter(F.length("line") > 0)
        .distinct()
    )
    df_ = lines.groupBy("source", "line").agg(F.count(F.lit(1)).alias("line_df"))
    is_bp = F.col("line_df") >= _T27_MIN_DF
    return (
        df_.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_lines"),
            F.count(F.when(is_bp, 1)).cast("long").alias("n_boilerplate"),
            F.sum(F.when(is_bp, F.col("line_df")))
            .cast("long")
            .alias("boilerplate_occurrences"),
            F.round(
                F.coalesce(F.sum(F.when(is_bp, F.col("line_df"))), F.lit(0))
                / F.sum("line_df").cast("double"),
                6,
            ).alias("boilerplate_share"),
        )
        .orderBy("source")
    )


# --- t28: collocation extraction (pointwise mutual information) -----------------
_T28_MIN_COUNT = 10   # bigram support floor (PMI explodes on rare pairs)
_T28_SCALE = 1_000_000_000
_T28_TOP = 15


@register(
    "t28_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens(sql_norm_text('text'))} AS toks FROM documents
    ),
    bigrams AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM toks, unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ),
    bg AS (SELECT w1, w2, count(*) AS cb FROM bigrams GROUP BY w1, w2),
    u1 AS (SELECT w1, sum(cb) AS c1 FROM bg GROUP BY w1),
    u2 AS (SELECT w2, sum(cb) AS c2 FROM bg GROUP BY w2),
    n AS (SELECT sum(cb) AS nn FROM bg),
    scored AS (
      SELECT bg.w1, bg.w2, bg.cb,
             CAST(round(ln((bg.cb * n.nn) / CAST(u1.c1 * u2.c2 AS DOUBLE))
                        * {_T28_SCALE}) AS BIGINT) AS pmi_e9
      FROM bg JOIN u1 USING (w1) JOIN u2 USING (w2), n
      WHERE bg.cb >= {_T28_MIN_COUNT}
    )
    SELECT w1, w2, CAST(cb AS BIGINT) AS n_cooccur, pmi_e9
    FROM scored
    ORDER BY pmi_e9 DESC, w1, w2 LIMIT {_T28_TOP}
    """,
)
def t28_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information (the
    standard phrase-mining statistic, public): word pairs that co-occur
    far above chance (PMI = ln of the exact integer ratio n·c(w1,w2) /
    (c(w1)·c(w2))) are the multi-word units a tokenizer or phrase table
    should treat atomically — t07 counts bigrams, t16 scores
    distinctiveness ACROSS sources, PMI scores cohesion WITHIN the
    corpus.  A support floor keeps PMI's rare-pair explosion out
    (the classic failure mode); scores carry at 1e-9 fixed point so the
    rank cut is bit-stable.

    Scale: the t18 LM shape — bigram explode, vocab-grain marginals
    re-joined on word keys, 1-row total broadcast, top-k window."""
    d = read_table(spark, sf_dir, "documents")
    toks = spread(
        d.select(tokens(norm_text(F.col("text"))).alias("toks"))
    ).filter(F.size("toks") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    u1 = bg.groupBy("w1").agg(F.sum("cb").alias("c1"))
    u2 = bg.groupBy("w2").agg(F.sum("cb").alias("c2"))
    nn = bg.agg(F.sum("cb").alias("nn"))
    scored = (
        bg.filter(F.col("cb") >= _T28_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            "cb",
            F.round(
                F.log(
                    (F.col("cb") * F.col("nn"))
                    / (F.col("c1") * F.col("c2")).cast("double")
                )
                * _T28_SCALE,
                0,
            )
            .cast("long")
            .alias("pmi_e9"),
        )
    )
    return (
        scored.select(
            "w1", "w2", F.col("cb").cast("long").alias("n_cooccur"), "pmi_e9"
        )
        .orderBy(F.desc("pmi_e9"), "w1", "w2")
        .limit(_T28_TOP)
    )


# --- t29: BM25 ranked retrieval ---------------------------------------------------
_T29_TERMS = ["hash", "join", "vector"]


@register(
    "t29_bm25_retrieval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens(sql_norm_text('text'))} AS toks FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
    ),
    totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl
    ),
    hits AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(list_filter(toks,
                 x -> {' OR '.join(f"x = '{w}'" for w in _T29_TERMS)})) AS w
            FROM toks)
      GROUP BY doc_id, w
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term
    ),
    scored AS (
      SELECT h.doc_id,
             CAST(round(1e6 * ln(1 + (totals.n - df.df + 0.5) / (df.df + 0.5))
                  * (h.tf * 2.2)
                  / (h.tf + 1.2 * (0.25 + 0.75 * (dl.dl * totals.n)
                                           / CAST(totals.t AS DOUBLE)))) AS BIGINT)
               AS s
      FROM hits h
      JOIN dl ON dl.doc_id = h.doc_id
      JOIN df ON df.term = h.term
      CROSS JOIN totals
    )
    SELECT doc_id,
           CAST(sum(s) AS BIGINT)      AS score_micros,
           CAST(count(*) AS BIGINT)    AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score_micros DESC, doc_id
    LIMIT 15
    """,
)
def t29_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones, the public Okapi
    formula with k1=1.2, b=0.75): top-15 documents for a fixed conjunctive
    query — the SEARCH side of the index t05's TF-IDF only profiles.  Each
    (doc, term) partial score is ONE float expression over exact integer
    sufficient statistics (tf, dl, df, N, Σdl) written identically in both
    engines, rounded to 1e-6 fixed point BEFORE the per-doc sum (t18's
    ln-of-integer-ratio discipline), so ranking and scores hash-match.

    Scale: the token array is filtered to the query terms JVM-side BEFORE
    the explode, so the explode's fan-out is |matches|, not |tokens|; dl is
    a doc-grain aggregate off the same scan; df and the (N, Σdl) totals are
    term-grain/1-row broadcasts.  The only doc-scale shuffle is the
    (doc, term) tf aggregate — exactly an inverted index's posting build.
    No reference counterpart (SURVEY.md §2 Part B: no text analysis)."""
    d = read_table(spark, sf_dir, "documents")
    toks = spread(
        d.select("doc_id", tokens(norm_text(F.col("text"))).alias("toks"))
    )
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("t"),
    )
    terms_pred = " OR ".join(f"x = '{w}'" for w in _T29_TERMS)
    hits = (
        toks.select(
            "doc_id",
            F.explode(F.expr(f"filter(toks, x -> {terms_pred})")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_t = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        hits.join(dl, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.lit(1e6)
                * F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        0.25
                        + 0.75
                        * (F.col("dl") * F.col("n"))
                        / F.col("t").cast("double")
                    )
                ),
                0,
            )
            .cast("long")
            .alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("s").cast("long").alias("score_micros"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score_micros"), "doc_id")
        .limit(15)
    )


# --- t30: corpus novelty curve per source -----------------------------------------
_T30_N = 8  # word n-gram width for the novelty grain


@register(
    "t30_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {sql_tokens(sql_norm_text('text'))} AS toks
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source, {sql_hex_int('g')} AS h FROM (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(toks) - {_T30_N - 2}),
                      i -> array_to_string(toks[i:i+{_T30_N - 1}], ' '))) AS g
        FROM toks WHERE len(toks) >= {_T30_N}
      )
    ),
    first_seen AS (
      SELECT h, min(doc_id) AS first_doc FROM grams GROUP BY h
    ),
    per_source AS (
      SELECT g.source,
             CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT)                 AS grams_total,
             CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT)                          AS novel_total
      FROM grams g JOIN first_seen f USING (h)
      GROUP BY g.source
    )
    SELECT source, n_docs, grams_total, novel_total,
           CAST((novel_total * 1000000) // grams_total AS BIGINT) AS novelty_ppm
    FROM per_source ORDER BY source
    """,
)
def t30_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY accounting per source: the share of each source's
    distinct word-8-grams that first appear (by doc_id arrival order) in
    that source's own documents — the marginal-value metric of incremental
    crawls (t14 measures how duplicated a doc is; this measures how much
    genuinely NEW text a source contributes to the corpus, the number a
    data-buying or crawl-prioritization decision consumes).  A gram's first
    occurrence is its min doc_id — deterministic, order-independent.

    Scale: one explode → per-doc distinct (the t14 root shape), one
    gram-grain min aggregate (map-side combined), one gram-keyed equi-join
    back, one source-grain rollup.  Everything linear in gram volume; the
    ppm share is exact integer division.  No reference counterpart
    (SURVEY.md §2 Part B: no text analysis)."""
    d = read_table(spark, sf_dir, "documents")
    toks = spread(
        d.select(
            "doc_id", "source", tokens(norm_text(F.col("text"))).alias("toks")
        )
    ).filter(F.size("toks") >= _T30_N)
    grams = (
        toks.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_T30_N - 1}),"
                    f" i -> array_join(slice(toks, i, {_T30_N}), ' '))"
                )
            ).alias("g"),
        )
        .select("doc_id", "source", hex_int(F.col("g")).alias("h"))
        .distinct()
    )
    first_seen = grams.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_source = (
        grams.join(first_seen, "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("grams_total"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("novel_total"),
        )
    )
    return per_source.select(
        "source",
        "n_docs",
        "grams_total",
        "novel_total",
        F.expr("novel_total * 1000000 DIV grams_total").alias("novelty_ppm"),
    ).orderBy("source")
