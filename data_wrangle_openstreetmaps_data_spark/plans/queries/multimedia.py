"""Multimodal binary columns: real BMP/WAV codecs, frame sampling, features.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import (
    sample,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — video-style frame sampling plumbing: up to 4 byte-slice
    'frames' per media blob via the Arrow-batched ``frame_sample`` kernel
    (a real implementation seeks keyframes in the codec; the batch shape,
    schema and fan-out are the real thing). Oracle-checked because the
    fake blob is the utf8 text bytes (pure-ASCII corpus), so DuckDB
    reproduces each frame's hash and length with substr arithmetic."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents")
    frames = media.frame_sample(media.attach_fake_media(docs))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.col("frame")).alias("frame_hash"),
        F.length(F.col("frame")).cast("int").alias("n_bytes"),
    )


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — binary media column → Arrow-batched feature extraction
    (mapInPandas; deterministic stub decoder: md5-derived fake embedding).
    Oracle-checked: the fake media blob is the utf8 text bytes, so DuckDB
    reproduces n_bytes/content_hash/feature from md5(text); the float32
    feature lanes surface as exactly-convertible doubles in both engines."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents")
    feats = media.decode_features(media.attach_fake_media(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "content_hash",
        *[
            F.col("feature")[i].cast("double").alias(f"f{i}")
            for i in range(8)
        ],
    )


def q_media_decode_bmp(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL image decode: genuine 24-bit BMP files are built
    executor-side (one per document, geometry varying so the 4-byte row
    padding differs per doc), then parsed back with the stdlib struct
    codec (magic, header offsets, bottom-up rows) inside an Arrow
    mapInPandas kernel. Output is exact integer channel sums, which the
    oracle computes in CLOSED FORM from the fixture geometry — a decoder
    that mis-reads stride, padding, or row order cannot hash-match."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    stats = media.decode_media_stats(media.synthesize_media(docs, "bmp"))
    return stats.select(
        "doc_id",
        "n_bytes",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_media_decode_gif(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL GIF decode: genuine GIF89a files are built
    executor-side (256-entry global color table, a Graphic Control
    Extension so the parser must walk extension sub-blocks, and REAL
    LZW — variable code width with dictionary growth, not the
    uncompressed-GIF trick), then parsed back with a from-scratch
    stdlib LZW decoder (LSB-first codes, CLEAR resets, the cScSc
    code==next_code case) inside the same Arrow mapInPandas kernel as
    the BMP/PNG codecs. Pixel (x,y) has palette index base + x*y and
    palette entry i = (i, i+17, 255-i), all wrap-free on the fixture
    geometry, so channel sums are closed-form for the oracle; n_bytes
    is EXCLUDED because LZW length is an implementation detail."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    stats = media.decode_media_stats(media.synthesize_media(docs, "gif"))
    return stats.select(
        "doc_id",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_video_gif_frames(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL per-frame decode of an ANIMATED container: each doc
    gets a genuine multi-frame GIF89a (global palette, NETSCAPE looping
    extension, per-frame GCE + real-LZW image blocks — the stdlib-honest
    stand-in for video), decoded frame by frame in one Arrow
    mapInPandas kernel to (doc_id, frame, width, height, channel sums).
    Frame t's pixel index is base + x*y + t, so the oracle proves both
    values AND temporal order: sum_r(t) = sum_r(0) + t·N. This replaces
    the fake-bytes frame_sample story with a real container walk; the
    sampling query (q_frame_sample) composes on top."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id").filter(
        # every 7th doc: 7 is coprime to the nf modulus 5, so the
        # fixture covers ALL frame counts 2..6 (a %10 filter would pin
        # nf = 2 + doc%5 to the constant 2)
        F.col("doc_id") % 7 == 0
    )
    frames = media.decode_video_frames(
        media.synthesize_media(docs, "gifanim")
    )
    return frames.orderBy("doc_id", "frame")


def q_media_decode_png(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL PNG decode: genuine non-interlaced 8-bit RGB PNGs
    are built executor-side (stdlib zlib deflate, per-row filter type
    y % 5 so all five scanline filters — None/Sub/Up/Average/Paeth —
    appear in every image taller than 4 rows), then parsed back with the
    full chunk walk (CRC32-verified), inflate, and unfilter inside the
    same Arrow mapInPandas kernel as the BMP codec. Output is exact
    integer channel sums, closed-form for the oracle; n_bytes is
    EXCLUDED from the projection because deflate length is a zlib
    implementation detail, not arithmetic."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    stats = media.decode_media_stats(media.synthesize_media(docs, "png"))
    return stats.select(
        "doc_id",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_media_resize_gif(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL GIF resize pipeline: per-doc-geometry GIFs are
    LZW-decoded, nearest-neighbor resampled to 4×3, re-LZW-encoded as
    valid GIFs, and decoded AGAIN for the output stats — two full
    compressed-codec round trips in composed Arrow kernels, the same
    contract as q_media_resize_png. Oracle computes the resampled
    palette-index sums in closed form (idx = base + sx·sy at the NN
    sample points)."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    blobs = media.synthesize_media(docs, "gif")
    small = media.resize_media(blobs, 4, 3)
    return media.decode_media_stats(small).select(
        "doc_id",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_media_resize_png(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL PNG resize pipeline: per-doc-geometry PNGs decoded
    (inflate + unfilter), nearest-neighbor resampled to 4×3, re-encoded
    as valid PNGs (refilter + deflate), and decoded AGAIN for the output
    stats — two full compressed-codec round trips in composed Arrow
    kernels. Oracle computes the resampled channel sums in closed form,
    exactly like q_media_resize_bmp."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    blobs = media.synthesize_media(docs, "png")
    small = media.resize_media(blobs, 4, 3)
    return media.decode_media_stats(small).select(
        "doc_id",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_media_decode_wav(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL audio decode: genuine 16-bit PCM WAV files built
    executor-side (stdlib wave writer, per-doc sample counts), parsed
    back with the stdlib wave reader in the same Arrow kernel. Exact
    integer amplitude stats; oracle in closed form (arithmetic series)
    from the fixture parameters."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    stats = media.decode_media_stats(media.synthesize_media(docs, "wav"))
    return stats.select(
        "doc_id",
        "n_bytes",
        F.col("dim1").alias("n_samples"),
        F.col("dim2").alias("sample_rate"),
        F.col("stat1").alias("sum_amp"),
        F.col("stat2").alias("min_amp"),
        F.col("stat3").alias("max_amp"),
    )


def q_media_resize_bmp(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL image resize pipeline: genuine per-doc-geometry BMPs
    are decoded, nearest-neighbor resampled to 4×3, re-encoded as valid
    BMPs, and decoded AGAIN for the output stats — two full codec round
    trips in composed Arrow kernels. The oracle computes the resampled
    channel sums in closed form (output pixel (x,y) samples input
    (floor(x·W/4), floor(y·H/3))), so a resampler that picks the wrong
    source pixel or mis-encodes the smaller image cannot hash-match."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    blobs = media.synthesize_media(docs, "bmp")
    small = media.resize_media(blobs, 4, 3)
    return media.decode_media_stats(small).select(
        "doc_id",
        "n_bytes",
        F.col("dim1").alias("width"),
        F.col("dim2").alias("height"),
        F.col("stat1").alias("sum_b"),
        F.col("stat2").alias("sum_g"),
        F.col("stat3").alias("sum_r"),
    )


def q_media_resample_wav(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — REAL audio resample: genuine WAVs are decoded, decimated
    ×2 (keep every other sample, rate halves), re-encoded via the stdlib
    wave writer, and decoded again for the output stats — the audio
    analog of q_media_resize_bmp's double codec round trip. Oracle in
    closed form over the surviving even-index samples."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    blobs = media.synthesize_media(docs, "wav")
    half = media.resample_media(blobs, 2)
    return media.decode_media_stats(half).select(
        "doc_id",
        "n_bytes",
        F.col("dim1").alias("n_samples"),
        F.col("dim2").alias("sample_rate"),
        F.col("stat1").alias("sum_amp"),
        F.col("stat2").alias("min_amp"),
        F.col("stat3").alias("max_amp"),
    )


def q_image_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — corpus-level image analytics on REAL decoded pixels:
    per-channel intensity histogram (16 buckets of width 16) across
    every synthesized PNG, decoded executor-side (inflate + unfilter)
    by the Arrow channel kernel and folded with one hash aggregate —
    exact integer counts, the standard brightness/exposure audit of an
    image-corpus ingest. The oracle regenerates every pixel from the
    fixture's closed form on a generated (x, y) grid, so each hash
    match re-verifies the real PNG decode pixel-for-pixel."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    chans = media.decode_image_channels(
        media.synthesize_media(docs, "png")
    )
    return (
        chans.select(
            "channel", F.explode("values").alias("v")
        )
        .groupBy(
            "channel", F.expr("v div 16").cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("channel", "bucket")
    )


def q_image_equalize(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — corpus-level histogram EQUALIZATION plan on REAL decoded
    pixels (the contrast-enhancement everyone's image pipeline applies
    before feature extraction): the red-channel 16-bucket histogram
    (exact counts off the Arrow PNG decode) drives the classic CDF
    remap new_level = ((cdf − cdf_min)·15) div (N − cdf_min) — pure
    bigint arithmetic, no rounding ambiguity — emitting per bucket its
    count, CDF, and equalized target level, i.e. the lookup table the
    per-pixel remap kernel would broadcast. The pixel-sized work is the
    one decode+histogram pass; the equalization math runs on 16 rows.
    Every hash match re-verifies the PNG inflate/unfilter pixel-for-
    pixel (the fixture's closed form regenerates the oracle's pixels)."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    chans = media.decode_image_channels(
        media.synthesize_media(docs, "png")
    )
    hist = (
        chans.filter(F.col("channel") == "r")
        .select(F.explode("values").alias("v"))
        .groupBy(F.expr("v div 16").cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = hist.withColumn("cdf", F.sum("cnt").over(w))
    tot = c.agg(
        F.max("cdf").alias("n"), F.min("cdf").alias("cdf_min")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "cnt",
            "cdf",
            F.expr(
                "CAST((cdf - cdf_min) * 15 div (n - cdf_min) AS INT)"
            ).alias("new_level"),
        )
        .orderBy("bucket")
    )


def q_audio_dft(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — relational signal processing on REAL decoded audio: the
    magnitude of DFT bins k=1..3 over each WAV's samples, computed
    entirely in higher-order column expressions (zip_with + aggregate)
    over the decoded sample array. Float-sum order never arises: each
    term s_n·cos(2πkn/N) is floored onto an exact 1e-6 grid integer
    (both engines run the IDENTICAL expression text, same left-assoc
    multiplication order, same pi()), summed as exact bigints, and only
    the final sqrt touches the accumulated doubles. The oracle never
    decodes — it regenerates the samples from the fixture's closed form
    (s_n = base−500+13n), so the REAL wave-codec decode is implicitly
    re-verified sample-for-sample by every hash match."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    samples = media.decode_wav_samples(
        media.synthesize_media(docs, "wav")
    )

    def fold(k: int, fn: str) -> F.Column:
        return F.expr(
            f"aggregate(zip_with(samples, "
            f"sequence(0, size(samples) - 1), (s, i) -> "
            f"CAST(floor(s * {fn}(2 * pi() * {k} * i / size(samples)) "
            f"* 1000000 + 0.5) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    out = samples.select(
        "doc_id",
        F.size("samples").alias("n_samples"),
        *[
            text.round4(
                F.sqrt(
                    F.pow(fold(k, "cos") / F.lit(1e6), F.lit(2.0))
                    + F.pow(fold(k, "sin") / F.lit(1e6), F.lit(2.0))
                )
            ).alias(f"mag{k}")
            for k in (1, 2, 3)
        ],
    )
    return out


def q_audio_spectral_centroid(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — spectral centroid over the k=1..3 DFT bins of each REAL
    decoded WAV (the brightness feature an audio-curation pipeline
    thresholds on): centroid = Σ k·|X_k| / Σ |X_k|. Each magnitude is
    floored onto the exact 1e-4 grid BEFORE the ratio — the weighted
    sum of three grid integers is exact, so the centroid is one double
    division over exact bigints (the q_audio_dft grid-integer folds
    underneath; the oracle regenerates samples closed-form, so every
    hash match re-verifies the wave codec sample-for-sample)."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    samples = media.decode_wav_samples(
        media.synthesize_media(docs, "wav")
    )

    def fold(k: int, fn: str) -> F.Column:
        return F.expr(
            f"aggregate(zip_with(samples, "
            f"sequence(0, size(samples) - 1), (s, i) -> "
            f"CAST(floor(s * {fn}(2 * pi() * {k} * i / size(samples)) "
            f"* 1000000 + 0.5) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    def m4(k: int) -> F.Column:
        return F.floor(
            F.sqrt(
                F.pow(fold(k, "cos") / F.lit(1e6), F.lit(2.0))
                + F.pow(fold(k, "sin") / F.lit(1e6), F.lit(2.0))
            )
            * 10000
            + F.lit(0.5)
        ).cast("long")

    d = samples.select(
        "doc_id",
        F.size("samples").alias("n_samples"),
        m4(1).alias("m1"),
        m4(2).alias("m2"),
        m4(3).alias("m3"),
    )
    den = F.col("m1") + F.col("m2") + F.col("m3")
    num = F.col("m1") + 2 * F.col("m2") + 3 * F.col("m3")
    return d.select(
        "doc_id",
        "n_samples",
        "m1",
        "m2",
        "m3",
        text.round4(
            F.when(
                den > 0, num.cast("double") / den.cast("double")
            )
        ).alias("centroid"),
    )


def q_audio_rms(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-M — windowed loudness profile on REAL decoded audio: per
    8-sample window of each WAV clip, RMS level and absolute peak — the
    time-domain companion to q_audio_dft's frequency bins (clipping /
    silence detection in a media-ingest pipeline). The decode path is
    the same Arrow kernel; analysis is fully relational — posexplode to
    (doc, window = pos div 8) and ONE hash aggregate, no higher-order
    lambdas in the hot path. WAV samples are int16, so Σs² is an exact
    bigint (≤ 2³¹·window) and only the closing sqrt(Σs²/n) touches
    doubles, expression-mirrored. The oracle never decodes — it
    regenerates samples from the fixture's closed form (s_j = s0 + 13j),
    so the wave-codec decode is re-verified value-for-value on every
    hash match. Shuffle keyed by (doc, window): scales linearly in
    total sample count, windows stay ~clip-sized."""
    from data_wrangle_openstreetmaps_data_spark.multimodal import media

    docs = table(spark, sf, "documents").select("doc_id")
    samples = media.decode_wav_samples(
        media.synthesize_media(docs, "wav")
    )
    e = samples.select(
        "doc_id", F.posexplode("samples").alias("i", "s")
    ).select(
        "doc_id",
        F.expr("CAST(i div 8 AS BIGINT)").alias("win"),
        F.col("s").cast("long").alias("s"),
    )
    g = e.groupBy("doc_id", "win").agg(
        F.count(F.lit(1)).alias("n_win"),
        F.sum(F.col("s") * F.col("s")).alias("ss"),
        F.max(F.abs(F.col("s"))).alias("peak"),
    )
    rms = F.sqrt(
        F.col("ss").cast("double") / F.col("n_win").cast("double")
    )
    return g.select(
        "doc_id",
        "win",
        "n_win",
        "peak",
        text.round4(rms).alias("rms"),
    ).orderBy("doc_id", "win")


def _dft_term_sql(k: int, fn: str) -> str:
    return (
        f"list_transform(range(0, n), j -> CAST(floor((s0 + 13 * j) * "
        f"{fn}(2 * pi() * {k} * j / n) * 1000000 + 0.5) AS BIGINT))"
    )


ORACLES: dict[str, str | None] = {
    # closed-form pixel regeneration on a generated (x, y) grid —
    # the same channel formulas the PNG fixture encodes
    "q_image_equalize": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        ),
        d1 AS (SELECT doc_id, w, h, base, unnest(range(w)) AS x FROM p),
        d2 AS (SELECT doc_id, base, x, unnest(range(h)) AS y FROM d1),
        hist AS (
          SELECT CAST(((base + x * y) % 256) // 16 AS INT) AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM d2 GROUP BY 1
        ),
        c AS (
          SELECT bucket, cnt,
                 CAST(sum(cnt) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cdf
          FROM hist
        ),
        tot AS (
          SELECT max(cdf) AS n, min(cdf) AS cdf_min FROM c
        )
        SELECT bucket, cnt, cdf,
               CAST((cdf - cdf_min) * 15 // (n - cdf_min) AS INT)
                 AS new_level
        FROM c, tot ORDER BY bucket
    """,
    "q_image_histogram": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        ),
        d1 AS (SELECT doc_id, w, h, base, unnest(range(w)) AS x FROM p),
        d2 AS (SELECT doc_id, base, x, unnest(range(h)) AS y FROM d1),
        px AS (
          SELECT (base + x * y) % 256 AS r,
                 (2 * base + x) % 256 AS g,
                 (base + x + y) % 256 AS b
          FROM d2
        ),
        long AS (
          SELECT 'r' AS channel, r AS v FROM px
          UNION ALL SELECT 'g', g FROM px
          UNION ALL SELECT 'b', b FROM px
        )
        SELECT channel, CAST(v // 16 AS INT) AS bucket, count(*) AS cnt
        FROM long GROUP BY 1, 2 ORDER BY channel, bucket
    """,
    # closed-form DFT: samples regenerated from the WAV fixture's
    # arithmetic series; identical grid-integer term expression
    "q_audio_rms": """
        WITH p AS (
          SELECT doc_id,
                 16 + doc_id % 17 AS n,
                 doc_id % 1000 - 500 AS s0
          FROM documents
        ),
        d AS (SELECT doc_id, s0, unnest(range(n)) AS j FROM p),
        g AS (
          SELECT doc_id, j // 8 AS win,
                 count(*) AS n_win,
                 sum((s0 + 13 * j) * (s0 + 13 * j)) AS ss,
                 max(abs(s0 + 13 * j)) AS peak
          FROM d GROUP BY doc_id, j // 8
        )
        SELECT doc_id, win, n_win, peak,
               floor(sqrt(CAST(ss AS DOUBLE) / CAST(n_win AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS rms
        FROM g
        ORDER BY doc_id, win
    """,
    "q_audio_spectral_centroid": f"""
        WITH p AS (
          SELECT doc_id,
                 16 + doc_id % 17 AS n,
                 doc_id % 1000 - 500 AS s0
          FROM documents
        ),
        m AS (
          SELECT doc_id, CAST(n AS INT) AS n_samples,
                 {', '.join(
                     "CAST(floor(sqrt("
                     f"pow(CAST(list_sum({_dft_term_sql(k, 'cos')}) AS DOUBLE)"
                     " / 1e6, 2.0) + "
                     f"pow(CAST(list_sum({_dft_term_sql(k, 'sin')}) AS DOUBLE)"
                     " / 1e6, 2.0)"
                     f") * 10000 + 0.5) AS BIGINT) AS m{k}"
                     for k in (1, 2, 3)
                 )}
          FROM p
        )
        SELECT doc_id, n_samples, m1, m2, m3,
               CASE WHEN m1 + m2 + m3 > 0 THEN
                 floor(CAST(m1 + 2 * m2 + 3 * m3 AS DOUBLE)
                       / CAST(m1 + m2 + m3 AS DOUBLE)
                       * 10000 + 0.5) / 10000
               END AS centroid
        FROM m
    """,
    "q_audio_dft": f"""
        WITH p AS (
          SELECT doc_id,
                 16 + doc_id % 17 AS n,
                 doc_id % 1000 - 500 AS s0
          FROM documents
        )
        SELECT doc_id, CAST(n AS INT) AS n_samples,
               {', '.join(
                   "floor(sqrt("
                   f"pow(CAST(list_sum({_dft_term_sql(k, 'cos')}) AS DOUBLE)"
                   " / 1e6, 2.0) + "
                   f"pow(CAST(list_sum({_dft_term_sql(k, 'sin')}) AS DOUBLE)"
                   " / 1e6, 2.0)"
                   f") * 10000 + 0.5) / 10000 AS mag{k}"
                   for k in (1, 2, 3)
               )}
        FROM p
    """,
    # decimation oracle: surviving samples are s0 + 26j for
    # j in [0, ceil(n/2)) — arithmetic series again
    "q_media_resample_wav": """
        WITH p AS (
          SELECT doc_id,
                 (16 + doc_id % 17 + 1) // 2 AS n2,
                 doc_id % 1000 - 500 AS s0
          FROM documents
        )
        SELECT doc_id,
               44 + 2 * n2 AS n_bytes,
               n2 AS n_samples,
               CAST(4000 AS BIGINT) AS sample_rate,
               n2 * s0 + 26 * (n2 * (n2 - 1) // 2) AS sum_amp,
               s0 AS min_amp,
               s0 + 26 * (n2 - 1) AS max_amp
        FROM p
    """,
    # resize oracle: nearest-neighbor from the w×h fixture to 4×3 —
    # SX/SY are the sums of sampled source coordinates, so the channel
    # sums of the resized image are closed-form in (w, h, base)
    "q_media_resize_bmp": """
        WITH p AS (
          SELECT doc_id,
                 4 + doc_id % 5 AS w,
                 3 + doc_id % 4 AS h,
                 doc_id % 100 AS base
          FROM documents
        ), s AS (
          SELECT doc_id, base,
                 (w // 4) + (2 * w // 4) + (3 * w // 4) AS sx,
                 (h // 3) + (2 * h // 3) AS sy
          FROM p
        )
        SELECT doc_id,
               CAST(90 AS BIGINT) AS n_bytes,
               CAST(4 AS BIGINT) AS width,
               CAST(3 AS BIGINT) AS height,
               12 * base + 3 * sx + 4 * sy AS sum_b,
               24 * base + 3 * sx AS sum_g,
               12 * base + sx * sy AS sum_r
        FROM s
    """,
    # the fake media blob is encode(text,'utf-8'); the stub decoder's
    # feature lane i = md5_digest_byte[i]/255.0 as float32 — replicated
    # via hex-pair extraction from md5(text), with the same f64→f32→f64
    # round-trip so doubles match bit-for-bit
    "q_frame_sample": """
        WITH f AS (
          SELECT doc_id, text,
                 unnest(range(least(4, greatest(1,
                   octet_length(encode(text)) // 64)))) AS frame_idx
          FROM documents
        )
        SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
               md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64))
                 AS frame_hash,
               CAST(octet_length(encode(
                 substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)
               )) AS INT) AS n_bytes
        FROM f
    """,
    "q_multimodal_features": f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS content_hash,
               {', '.join(
                   "CAST(CAST(('0x' || substr(md5(text), "
                   f"{2 * i + 1}, 2))::INT / 255.0 AS REAL) AS DOUBLE) AS f{i}"
                   for i in range(8)
               )}
        FROM documents
    """,
    # closed-form expectations for the real BMP codec round trip: the
    # fixture writes pixel (x,y) as b=base+x+y, g=2*base+x, r=base+x*y
    # over a w×h image, so channel sums are arithmetic series and
    # n_bytes = 54-byte headers + padded-stride rows
    "q_media_decode_bmp": """
        WITH p AS (
          SELECT doc_id,
                 4 + doc_id % 5 AS w,
                 3 + doc_id % 4 AS h,
                 doc_id % 100 AS base
          FROM documents
        )
        SELECT doc_id,
               54 + ((3 * w + 3) // 4) * 4 * h AS n_bytes,
               w AS width,
               h AS height,
               w * h * base + h * (w * (w - 1) // 2)
                 + w * (h * (h - 1) // 2) AS sum_b,
               2 * w * h * base + h * (w * (w - 1) // 2) AS sum_g,
               w * h * base
                 + (w * (w - 1) // 2) * (h * (h - 1) // 2) AS sum_r
        FROM p
    """,
    # real PNG codec round trip: same pixel formulas as BMP (r=base+x*y,
    # g=2*base+x, b=base+x+y) over the w×h PNG fixture geometry; deflate
    # length is impl-defined so n_bytes is not in the projection
    # GIF NN-resize to 4×3: sampled idx = base + sx·sy, palette sums
    "q_media_resize_gif": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        ), s AS (
          SELECT doc_id, base,
                 (w // 4) + (2 * w // 4) + (3 * w // 4) AS sx,
                 (h // 3) + (2 * h // 3) AS sy
          FROM p
        )
        SELECT doc_id,
               CAST(4 AS BIGINT) AS width,
               CAST(3 AS BIGINT) AS height,
               CAST(255 * 12 - (12 * base + sx * sy) AS BIGINT) AS sum_b,
               CAST(12 * base + sx * sy + 17 * 12 AS BIGINT) AS sum_g,
               CAST(12 * base + sx * sy AS BIGINT) AS sum_r
        FROM s
    """,
    # animated GIF frames: idx = base + x*y + t per frame t
    "q_video_gif_frames": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 5 AS w,
                 2 + doc_id % 4 AS h,
                 doc_id % 90 AS base,
                 2 + doc_id % 5 AS nf
          FROM documents WHERE doc_id % 7 = 0
        ), f AS (
          SELECT doc_id, w, h, CAST(t AS INTEGER) AS frame,
                 w * h * (base + t)
                   + (w * (w - 1) // 2) * (h * (h - 1) // 2) AS sum_r
          FROM p, unnest(range(0, nf)) AS u(t)
        )
        SELECT doc_id, frame,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(255 * w * h - sum_r AS BIGINT) AS sum_b,
               CAST(sum_r + 17 * w * h AS BIGINT) AS sum_g,
               CAST(sum_r AS BIGINT) AS sum_r
        FROM f
        ORDER BY doc_id, frame
    """,
    # GIF: sum_r = N*base + Sx*Sy (palette idx), g = idx+17, b = 255-idx
    "q_media_decode_gif": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        ), s AS (
          SELECT doc_id, w, h,
                 w * h * base
                   + (w * (w - 1) // 2) * (h * (h - 1) // 2) AS sum_r
          FROM p
        )
        SELECT doc_id,
               w AS width,
               h AS height,
               255 * w * h - sum_r AS sum_b,
               sum_r + 17 * w * h AS sum_g,
               sum_r
        FROM s
    """,
    "q_media_decode_png": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        )
        SELECT doc_id,
               w AS width,
               h AS height,
               w * h * base + h * (w * (w - 1) // 2)
                 + w * (h * (h - 1) // 2) AS sum_b,
               2 * w * h * base + h * (w * (w - 1) // 2) AS sum_g,
               w * h * base
                 + (w * (w - 1) // 2) * (h * (h - 1) // 2) AS sum_r
        FROM p
    """,
    # PNG NN-resize to 4×3: identical sampled-coordinate sums as the BMP
    # resize oracle, over the PNG fixture geometry
    "q_media_resize_png": """
        WITH p AS (
          SELECT doc_id,
                 3 + doc_id % 7 AS w,
                 2 + doc_id % 5 AS h,
                 doc_id % 100 AS base
          FROM documents
        ), s AS (
          SELECT doc_id, base,
                 (w // 4) + (2 * w // 4) + (3 * w // 4) AS sx,
                 (h // 3) + (2 * h // 3) AS sy
          FROM p
        )
        SELECT doc_id,
               CAST(4 AS BIGINT) AS width,
               CAST(3 AS BIGINT) AS height,
               12 * base + 3 * sx + 4 * sy AS sum_b,
               24 * base + 3 * sx AS sum_g,
               12 * base + sx * sy AS sum_r
        FROM s
    """,
    # real WAV codec round trip: sample i = (doc_id%1000) - 500 + 13*i,
    # n = 16 + doc_id%17 samples; 44-byte canonical RIFF header + 2n
    "q_media_decode_wav": """
        WITH p AS (
          SELECT doc_id,
                 16 + doc_id % 17 AS n,
                 doc_id % 1000 - 500 AS s0
          FROM documents
        )
        SELECT doc_id,
               44 + 2 * n AS n_bytes,
               n AS n_samples,
               CAST(8000 AS BIGINT) AS sample_rate,
               n * s0 + 13 * n * (n - 1) // 2 AS sum_amp,
               s0 AS min_amp,
               s0 + 13 * (n - 1) AS max_amp
        FROM p
    """,
}
