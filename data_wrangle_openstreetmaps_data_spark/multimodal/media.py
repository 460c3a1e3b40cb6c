"""Multimodal (binary) column operators.

Pattern: a 100 TB multimodal corpus is a table
``(doc_id, media: binary, media_meta: struct)`` where the binary blobs
dominate storage. The rules that make this workable at scale:

- NEVER collect blobs; all decode happens executor-side in Arrow batches
  via ``mapInPandas`` — one Python worker per core, zero per-row pickling.
- Column pruning must keep blob bytes out of queries that only need
  metadata — metadata lives in its own struct column, so a
  metadata-only query never touches the binary bytes (parquet column
  projection).
- Batch size is bounded by bytes not rows:
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` should be sized so
  batch_rows × avg_blob ≤ executor-memory headroom.

Decoders come in two tiers:

- REAL stdlib codecs for genuine binary formats — 24-bit BMP parsed
  with ``struct`` (magic, header offsets, bottom-up rows, 4-byte row
  padding) and 16-bit PCM WAV parsed with the ``wave`` module — run
  inside the same Arrow ``mapInPandas`` kernels (see
  ``synthesize_media`` / ``decode_media_stats``). These are end-to-end
  real: the bytes on the wire are valid files any image/audio tool
  opens.
- Deterministic fakes in ``FAKE_DECODERS`` for codecs genuinely absent
  from this container (video/JPEG/MP3 need ffmpeg/PIL); swapping in a
  real codec changes ONE function, none of the Spark plumbing.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_image_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': normalized md5 bytes. A real
    implementation decodes the image and runs a vision encoder here."""
    d = hashlib.md5(blob).digest()
    return [b / 255.0 for b in d[:dim]]


FAKE_DECODERS = {
    "image": _fake_image_features,
    "audio": _fake_image_features,
    "video": _fake_image_features,
}


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Test fixture builder: derive a deterministic binary column + typed
    metadata from an existing table (blob = utf8 bytes of the text)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame, media_type: str = "image") -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector per blob.

    ``mapInPandas`` so a batch of blobs crosses the JVM↔Python boundary
    once as Arrow buffers; the kernel is the pluggable decoder."""
    decoder = FAKE_DECODERS.get(media_type)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder for media_type={media_type!r}; real codecs are "
            "stubbed in this environment (see module docstring)"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "content_hash": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": blobs.map(lambda b: decoder(bytes(b))),
                }
            )

    return df.select("doc_id", "media").mapInPandas(kernel, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: blob → smaller blob + updated metadata struct.

    Stub kernel: deterministic byte truncation proportional to the pixel
    reduction (a real implementation decodes, resamples, re-encodes).
    Demonstrates the metadata-consistency contract: the output struct
    reflects the transform, so downstream filters on dimensions stay
    correct without touching blob bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media = []
            out_meta = []
            for blob, meta in zip(pdf["media"], pdf["media_meta"]):
                b = bytes(blob)
                ow = meta["width"] or width
                oh = meta["height"] or height
                scale = (width * height) / max(1, ow * oh)
                n = max(1, int(len(b) * min(1.0, scale)))
                out_media.append(b[:n])
                out_meta.append(
                    {
                        "media_type": meta["media_type"],
                        "format": meta["format"],
                        "width": width,
                        "height": height,
                        "duration_ms": meta["duration_ms"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out_media,
                    "media_meta": out_meta,
                }
            )

    return df.select("doc_id", "media", "media_meta").mapInPandas(
        kernel, RESIZED_SCHEMA
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 4) -> DataFrame:
    """'Frame sampling' plumbing: emit up to max_frames byte-slices per
    blob (a real implementation seeks keyframes with a video codec).
    Demonstrates the 1→N mapInPandas expansion shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(b[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select("doc_id", "media").mapInPandas(kernel, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL stdlib codecs: 24-bit BMP (struct) and 16-bit PCM WAV (wave)
# ---------------------------------------------------------------------------
#
# The encode side exists to build genuine binary fixtures executor-side
# (no media files ship with the testdata); the decode side is a real
# parser — it trusts nothing but the bytes: magic, header offsets,
# bit depth, bottom-up row order and 4-byte row padding for BMP;
# RIFF/fmt chunk walking via the wave module for WAV. Feature outputs
# are exact integers (channel sums, amplitude extremes), so an oracle
# can verify the full encode→decode round trip in closed form.


def encode_bmp(width: int, height: int, base: int) -> bytes:
    """Write a valid uncompressed 24-bit BMP (BITMAPINFOHEADER).

    Pixel (x, y) in image coordinates (y=0 is the TOP row) has
    channels b = base + x + y, g = 2*base + x, r = base + x*y — all
    < 256 for the fixture ranges used here, so the values are
    closed-form for the oracle. Rows are written bottom-up with
    4-byte padding, as the format requires."""
    stride = (3 * width + 3) // 4 * 4
    pixel_bytes = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            row += bytes(
                (base + x + y, 2 * base + x, base + x * y)
            )  # B, G, R
        row += b"\x00" * (stride - 3 * width)
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp_stats(blob: bytes) -> tuple[int, int, int, int, int]:
    """Parse a 24-bit BMP and return (width, height, sum_b, sum_g,
    sum_r) over all pixels. Raises ValueError on anything that is not
    an uncompressed 24-bit BMP — a decoder that silently mis-reads
    padding or row order produces wrong sums, which is exactly what
    the oracle catches."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (pixel_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", blob, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (3 * width + 3) // 4 * 4
    sb = sg = sr = 0
    for row_i in range(height):
        src_row = (height - 1 - row_i) if bottom_up else row_i
        off = pixel_off + src_row * stride
        for x in range(width):
            b, g, r = blob[off + 3 * x: off + 3 * x + 3]
            sb += b
            sg += g
            sr += r
    return width, height, sb, sg, sr


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One PNG chunk: length, type, data, CRC32(type+data)."""
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, base: int) -> bytes:
    """Write a valid non-interlaced 8-bit RGB PNG (color type 2).

    Pixel (x, y) has r = base + x*y, g = 2*base + x, b = base + x + y —
    the SAME closed-form channel values as the BMP fixture, so the
    oracle's arithmetic-series sums carry over. Each row is written with
    filter type y % 5, so a fixture taller than 4 rows exercises ALL
    five PNG scanline filters (None/Sub/Up/Average/Paeth) and a decoder
    that botches any one of them cannot hash-match."""
    rows = [
        bytes(
            v
            for x in range(width)
            for v in ((base + x * y) % 256, (2 * base + x) % 256,
                      (base + x + y) % 256)
        )  # R, G, B
        for y in range(height)
    ]
    return _encode_png_pixels(rows, width, height)


def _encode_png_pixels(rows: list[bytes], width: int, height: int) -> bytes:
    """Encode raw RGB rows (3·width bytes each, y=0 top) as a valid
    non-interlaced 8-bit RGB PNG; row y gets filter type y % 5."""
    import zlib

    bpp = 3
    prev = bytes(bpp * width)
    filtered = bytearray()
    for y in range(height):
        raw = rows[y]
        ftype = y % 5
        filtered.append(ftype)
        for i, b in enumerate(raw):
            left = raw[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                filtered.append(b)
            elif ftype == 1:  # Sub
                filtered.append((b - left) & 0xFF)
            elif ftype == 2:  # Up
                filtered.append((b - up) & 0xFF)
            elif ftype == 3:  # Average
                filtered.append((b - (left + up) // 2) & 0xFF)
            else:  # Paeth
                filtered.append((b - _paeth(left, up, ul)) & 0xFF)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): pick of left/up/up-left whose
    value is closest to a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_stats(blob: bytes) -> tuple[int, int, int, int, int]:
    """Parse a non-interlaced 8-bit RGB PNG and return (width, height,
    sum_b, sum_g, sum_r) — same stat slots as the BMP decoder."""
    width, height, rows = _decode_png_pixels(blob)
    sb = sg = sr = 0
    for out in rows:
        for x in range(width):
            sr += out[3 * x]
            sg += out[3 * x + 1]
            sb += out[3 * x + 2]
    return width, height, sb, sg, sr


def _decode_png_pixels(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a non-interlaced 8-bit RGB PNG into raw RGB rows (y=0 top).
    Full chunk walk with CRC32 verification, multi-IDAT concatenation,
    zlib inflate, and per-row unfiltering of ALL five filter types.
    Raises ValueError on bad magic, bad CRC, or unsupported IHDR."""
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    off = 8
    width = height = None
    idat = bytearray()
    while off < len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        ctype = blob[off + 4: off + 8]
        data = blob[off + 8: off + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, off + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_col, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_col, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG: need 8-bit RGB non-interlaced, got "
                    f"depth={depth} color={ctype_col} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        off += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = 1 + bpp * width
    if len(raw) != stride * height:
        raise ValueError(
            f"IDAT length {len(raw)} != expected {stride * height}"
        )
    prev = bytes(bpp * width)
    rows: list[bytes] = []
    for y in range(height):
        ftype = raw[y * stride]
        line = raw[y * stride + 1: (y + 1) * stride]
        out = bytearray(bpp * width)
        for i, b in enumerate(line):
            left = out[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                out[i] = b
            elif ftype == 1:
                out[i] = (b + left) & 0xFF
            elif ftype == 2:
                out[i] = (b + up) & 0xFF
            elif ftype == 3:
                out[i] = (b + (left + up) // 2) & 0xFF
            elif ftype == 4:
                out[i] = (b + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype} on row {y}")
        prev = bytes(out)
        rows.append(prev)
    return width, height, rows


def _gif_lzw_compress(indices: bytes, min_code_size: int = 8) -> bytes:
    """REAL GIF LZW: variable code width (min+1 … 12 bits), dictionary
    growth, CLEAR emitted on dictionary overflow, EOI terminator, codes
    packed LSB-first. A real compressor (not the uncompressed-GIF
    clear-every-code trick) so the decoder's dictionary-growth and
    width-bump paths are genuinely exercised by every fixture."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out_bits: list[tuple[int, int]] = []  # (code, width at emit time)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    prefix = b""
    for byte in indices:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            out_bits.append((clear, width))
            table, next_code, width = fresh()
        prefix = bytes([byte])
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))

    acc = n_acc = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        packed.append(acc & 0xFF)
    # sub-blocks of <= 255 bytes, then the 0-length terminator
    blocks = bytearray([min_code_size])
    for i in range(0, len(packed), 255):
        chunk = packed[i: i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def encode_gif(width: int, height: int, base: int) -> bytes:
    """Write a valid GIF89a: logical screen descriptor, 256-entry global
    color table, a Graphic Control Extension (so decoders must walk
    extension sub-blocks), one non-interlaced image, real LZW data.

    Pixel (x, y) has palette index ``base + x*y`` (< 256 for the
    fixture geometry: base < 100, dims <= 9x6), and palette entry i is
    (r, g, b) = (i, i + 17, 255 - i) — wrap-free, so the oracle's
    channel sums stay closed-form: sum_r = N*base + Sx*Sy,
    sum_g = sum_r + 17N, sum_b = 255N - sum_r."""
    indices = bytes(
        (base + x * y) & 0xFF for y in range(height) for x in range(width)
    )
    return _encode_gif_indices(width, height, indices)


def _encode_gif_indices(width: int, height: int, indices: bytes) -> bytes:
    """Assemble a single-frame GIF89a around a raw index stream with the
    canonical fixture palette (i, i+17, 255-i) — shared by the encoder
    and the resize path so a resized image re-encodes bit-compatibly."""
    hdr = b"GIF89a" + struct.pack(
        "<HHBBB", width, height, 0xF7, 0, 0
    )  # 0xF7: global table, 8-bit color resolution, 256 entries
    palette = bytes(
        v for i in range(256) for v in (i, (i + 17) & 0xFF, 255 - i)
    )
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # ext + label + 4-byte block
    imgdesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    return (
        hdr + palette + gce + imgdesc
        + _gif_lzw_compress(indices) + b"\x3b"
    )


def _gif_lzw_decompress(
    data: bytes, min_code_size: int, n_pixels: int
) -> bytes:
    """GIF LZW decoder: LSB-first variable-width codes, CLEAR resets,
    the cScSc case (code == next_code), EOI stop. Raises ValueError on
    protocol violations."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = n_acc = pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while True:
        while n_acc < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
        if len(out) > n_pixels:
            raise ValueError("LZW produced more pixels than the image")
    if len(out) != n_pixels:
        raise ValueError(
            f"LZW produced {len(out)} pixels, expected {n_pixels}"
        )
    return bytes(out)


def decode_gif_stats(blob: bytes) -> tuple[int, int, int, int, int]:
    """Parse a GIF87a/89a (global color table, non-interlaced, first
    image) and return (width, height, sum_b, sum_g, sum_r) via palette
    lookup — same stat slots as the BMP/PNG decoders. Walks and skips
    extension blocks; raises ValueError on bad magic, interlaced
    images, or local color tables (not emitted by the fixture)."""
    w, h, palette, idx = _decode_gif_first(blob)
    sb = sg = sr = 0
    for i in idx:
        sr += palette[3 * i]
        sg += palette[3 * i + 1]
        sb += palette[3 * i + 2]
    return w, h, sb, sg, sr


def _decode_gif_first(blob: bytes) -> tuple[int, int, bytes, bytes]:
    """First image block of a GIF → (width, height, palette, indices);
    the shared parser under decode_gif_stats and resize_gif."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    off = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = blob[off: off + 3 * n]
        off += 3 * n
    def _guard(i: int) -> int:
        if i >= len(blob):
            raise ValueError("truncated GIF")
        return i

    while off < len(blob):
        b0 = blob[off]
        if b0 == 0x21:  # extension: label + sub-blocks
            off += 2
            while blob[_guard(off)] != 0:
                off += 1 + blob[off]
            off += 1
        elif b0 == 0x2C:  # image descriptor
            _lx, _ly, w, h, iflags = struct.unpack_from("<HHHHB", blob, off + 1)
            off += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if iflags & 0x80:
                raise ValueError("local color table not supported")
            if palette is None:
                raise ValueError("GIF missing global color table")
            min_code = blob[_guard(off)]
            off += 1
            data = bytearray()
            while blob[_guard(off)] != 0:
                ln = blob[off]
                if off + 1 + ln > len(blob):
                    raise ValueError("truncated GIF sub-block")
                data += blob[off + 1: off + 1 + ln]
                off += 1 + ln
            off += 1
            idx = _gif_lzw_decompress(bytes(data), min_code, w * h)
            return w, h, palette, idx
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF has no image data")


def resize_gif(blob: bytes, out_w: int, out_h: int) -> bytes:
    """REAL GIF resize: LZW-decode the index stream, nearest-neighbor
    resample with the same NN mapping as resize_bmp/resize_png, and
    re-encode (re-LZW) with the canonical palette — blob in, smaller
    valid GIF out."""
    width, height, _palette, idx = _decode_gif_first(blob)
    out = bytearray()
    for y in range(out_h):
        sy = y * height // out_h
        for x in range(out_w):
            out.append(idx[sy * width + x * width // out_w])
    return _encode_gif_indices(out_w, out_h, bytes(out))


def encode_gif_anim(
    width: int, height: int, base: int, n_frames: int
) -> bytes:
    """Write a valid ANIMATED GIF89a — the stdlib-honest stand-in for a
    video container: one global 256-entry palette, then per frame a
    Graphic Control Extension (6/100 s delay) + full-size image block
    with real LZW data. Frame t's pixel (x, y) has palette index
    ``base + x*y + t`` (wrap-free for the fixture geometry), so every
    frame's channel sums stay closed-form and frame ORDER is provable:
    sum_r(t) = sum_r(0) + t*N."""
    hdr = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = bytes(
        v for i in range(256) for v in (i, (i + 17) & 0xFF, 255 - i)
    )
    out = bytearray(hdr + palette)
    # NETSCAPE looping extension: one more application-extension block
    # the frame walker must skip correctly
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for t in range(n_frames):
        out += b"\x21\xf9\x04\x00\x06\x00\x00\x00"  # GCE, 6cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        indices = bytes(
            (base + x * y + t) & 0xFF
            for y in range(height)
            for x in range(width)
        )
        out += _gif_lzw_compress(indices)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    blob: bytes,
) -> list[tuple[int, int, int, int, int, int]]:
    """Decode EVERY frame of a (possibly animated) GIF → one tuple
    (frame, width, height, sum_b, sum_g, sum_r) per image block, in
    stream order. Shares the LZW decoder and block walker with
    decode_gif_stats; application/graphic-control extensions are
    skipped via their sub-block framing."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    off = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = blob[off: off + 3 * n]
        off += 3 * n

    def _guard(i: int) -> int:
        if i >= len(blob):
            raise ValueError("truncated GIF")
        return i

    frames: list[tuple[int, int, int, int, int, int]] = []
    while off < len(blob):
        b0 = blob[off]
        if b0 == 0x21:
            off += 2
            while blob[_guard(off)] != 0:
                off += 1 + blob[off]
            off += 1
        elif b0 == 0x2C:
            _lx, _ly, w, h, iflags = struct.unpack_from(
                "<HHHHB", blob, off + 1
            )
            off += 10
            if iflags & 0xC0:
                raise ValueError("interlace/local palette not supported")
            if palette is None:
                raise ValueError("GIF missing global color table")
            min_code = blob[_guard(off)]
            off += 1
            data = bytearray()
            while blob[_guard(off)] != 0:
                ln = blob[off]
                if off + 1 + ln > len(blob):
                    raise ValueError("truncated GIF sub-block")
                data += blob[off + 1: off + 1 + ln]
                off += 1 + ln
            off += 1
            idx = _gif_lzw_decompress(bytes(data), min_code, w * h)
            sb = sg = sr = 0
            for i in idx:
                sr += palette[3 * i]
                sg += palette[3 * i + 1]
                sb += palette[3 * i + 2]
            frames.append((len(frames), w, h, sb, sg, sr))
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
    ]
)


def decode_video_frames(df: DataFrame) -> DataFrame:
    """REAL per-frame decode over an animated-GIF binary column: each
    blob expands to one row per frame with exact integer channel sums.
    Same Arrow boundary discipline as decode_media_stats — blobs cross
    once, the frame table that returns is metadata-sized."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for fr, w, h, sb, sg, sr in decode_gif_frames(bytes(blob)):
                    rows.append((doc_id, fr, w, h, sb, sg, sr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame", "width", "height",
                    "sum_b", "sum_g", "sum_r",
                ],
            )

    return df.select("doc_id", "media").mapInPandas(
        kernel, VIDEO_FRAMES_SCHEMA
    )


def encode_wav(n_samples: int, base: int, rate: int = 8000) -> bytes:
    """Write a valid 16-bit PCM mono WAV via the stdlib wave module.

    Sample i = base - 500 + 13*i (signed 16-bit, closed-form for the
    oracle: sum = n*(base-500) + 13*n*(n-1)/2)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            struct.pack(
                f"<{n_samples}h",
                *[base - 500 + 13 * i for i in range(n_samples)],
            )
        )
    return buf.getvalue()


def decode_wav_stats(blob: bytes) -> tuple[int, int, int, int, int]:
    """Parse a PCM WAV and return (n_samples, sample_rate, sum_amp,
    min_amp, max_amp) over all samples of channel 0."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n_ch, sampwidth, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(),
            w.getnframes(),
        )
        if sampwidth != 2:
            raise ValueError(f"unsupported WAV sample width {sampwidth}")
        raw = w.readframes(n_frames)
    samples = struct.unpack(f"<{n_frames * n_ch}h", raw)[::n_ch]
    return (
        n_frames, rate, sum(samples), min(samples), max(samples)
    )


MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("dim1", T.LongType()),   # width | n_samples
        T.StructField("dim2", T.LongType()),   # height | sample_rate
        T.StructField("stat1", T.LongType()),  # sum_b  | sum_amp
        T.StructField("stat2", T.LongType()),  # sum_g  | min_amp
        T.StructField("stat3", T.LongType()),  # sum_r  | max_amp
    ]
)

SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("media", T.BinaryType()),
    ]
)


def _synth_params(doc_id: int, fmt: str) -> tuple[int, ...]:
    """Fixture geometry, shared by encoder and oracle: varies width
    mod 4-byte row padding (BMP) and sample count (WAV) per doc."""
    if fmt == "bmp":
        return 4 + doc_id % 5, 3 + doc_id % 4, doc_id % 100
    if fmt == "png":
        # h in 2..6 → rows with filter types y%5 cover all five PNG
        # filters once h ≥ 5; w varies so Sub/Paeth see ≥ 2 strides
        return 3 + doc_id % 7, 2 + doc_id % 5, doc_id % 100
    if fmt == "gif":
        # same geometry family as PNG; palette index base + x*y stays
        # < 256 (base < 100, dims <= 9x6) so channel sums stay wrap-free
        return 3 + doc_id % 7, 2 + doc_id % 5, doc_id % 100
    if fmt == "gifanim":
        # (w, h, base, n_frames); idx = base + x*y + t <= 119 wrap-free
        return 3 + doc_id % 5, 2 + doc_id % 4, doc_id % 90, 2 + doc_id % 5
    if fmt == "wav":
        return 16 + doc_id % 17, doc_id % 1000
    raise NotImplementedError(
        f"no synthesizer for format {fmt!r}; real video/JPEG codecs "
        "are not in this container (see module docstring)"
    )


def synthesize_media(df: DataFrame, fmt: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Build a real binary media column executor-side: one Arrow batch
    in, one batch of genuine BMP/WAV files out. This is the fixture
    path for an environment with no media files — at 100 TB the blobs
    arrive from object storage instead and this stage disappears."""
    _synth_params(0, fmt)  # fail fast on unsupported format

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            enc = {"bmp": encode_bmp, "png": encode_png,
                   "gif": encode_gif, "gifanim": encode_gif_anim,
                   "wav": encode_wav}[fmt]
            blobs = [enc(*_synth_params(int(i), fmt)) for i in ids]
            yield pd.DataFrame(
                {"doc_id": ids, "fmt": fmt, "media": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(kernel, SYNTH_SCHEMA)


def decode_media_stats(df: DataFrame) -> DataFrame:
    """REAL decode over the binary column: parse each blob with the
    stdlib codec for its format and emit exact integer stats. Arrow
    batches via mapInPandas — blob bytes cross the boundary once, and
    the stats frame that comes back is blob-free (metadata-sized), so
    everything downstream is cheap."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fmt, blob in zip(
                pdf["doc_id"], pdf["fmt"], pdf["media"]
            ):
                b = bytes(blob)
                if fmt == "bmp":
                    w, h, sb, sg, sr = decode_bmp_stats(b)
                    rows.append((doc_id, fmt, len(b), w, h, sb, sg, sr))
                elif fmt == "png":
                    w, h, sb, sg, sr = decode_png_stats(b)
                    rows.append((doc_id, fmt, len(b), w, h, sb, sg, sr))
                elif fmt == "gif":
                    w, h, sb, sg, sr = decode_gif_stats(b)
                    rows.append((doc_id, fmt, len(b), w, h, sb, sg, sr))
                elif fmt == "wav":
                    n, rate, s, lo, hi = decode_wav_stats(b)
                    rows.append((doc_id, fmt, len(b), n, rate, s, lo, hi))
                else:
                    raise NotImplementedError(
                        f"no real decoder for format {fmt!r}"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_bytes", "dim1", "dim2",
                    "stat1", "stat2", "stat3",
                ],
            )

    return df.select("doc_id", "fmt", "media").mapInPandas(
        kernel, MEDIA_STATS_SCHEMA
    )


def resize_bmp(blob: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize: parse a 24-bit BMP, nearest-neighbor resample
    to (out_w, out_h), re-encode as a valid BMP. Output pixel (x, y)
    samples input pixel (floor(x*W/out_w), floor(y*H/out_h)) — the
    standard NN mapping, closed-form for the oracle."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (pixel_off,) = struct.unpack_from("<I", blob, 10)
    _, width, height = struct.unpack_from("<Iii", blob, 14)
    _, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    in_stride = (3 * width + 3) // 4 * 4

    def px(x: int, y: int) -> bytes:  # image coords, y=0 top
        src_row = (height - 1 - y) if bottom_up else y
        off = pixel_off + src_row * in_stride + 3 * x
        return blob[off:off + 3]

    out_stride = (3 * out_w + 3) // 4 * 4
    pixel_bytes = out_stride * out_h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    rows = []
    for y in range(out_h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(out_w):
            row += px(x * width // out_w, y * height // out_h)
        row += b"\x00" * (out_stride - 3 * out_w)
        rows.append(bytes(row))
    return header + b"".join(rows)


WAV_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("samples", T.ArrayType(T.IntegerType())),
    ]
)


def decode_wav_samples(df: DataFrame) -> DataFrame:
    """REAL audio decode to the raw sample array (doc_id, samples):
    the Arrow kernel that feeds relational signal processing (e.g. the
    DFT query) — blob bytes cross the boundary once, the samples array
    is bounded by the clip length."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    n_ch, sampwidth, n_frames = (
                        w.getnchannels(), w.getsampwidth(), w.getnframes()
                    )
                    if sampwidth != 2 or n_ch != 1:
                        raise ValueError(
                            f"unsupported WAV layout ch={n_ch} "
                            f"width={sampwidth}"
                        )
                    raw = w.readframes(n_frames)
                rows.append(
                    (doc_id, list(struct.unpack(f"<{n_frames}h", raw)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "samples"])

    return df.select("doc_id", "media").mapInPandas(
        kernel, WAV_SAMPLES_SCHEMA
    )


PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("values", T.ArrayType(T.IntegerType())),
    ]
)


def decode_image_channels(df: DataFrame) -> DataFrame:
    """REAL image decode to per-channel pixel-value arrays
    (doc_id, channel r|g|b, values): the Arrow kernel feeding
    relational image analytics (histograms, channel stats). Dispatches
    on fmt (bmp/png); arrays are bounded by the image size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fmt, blob in zip(
                pdf["doc_id"], pdf["fmt"], pdf["media"]
            ):
                b = bytes(blob)
                if fmt == "png":
                    w, h, px_rows = _decode_png_pixels(b)
                    rgb = [
                        [row[3 * x + c] for row in px_rows
                         for x in range(w)]
                        for c in range(3)
                    ]
                    chans = {"r": rgb[0], "g": rgb[1], "b": rgb[2]}
                elif fmt == "bmp":
                    # reuse the BMP pixel reader via resize-free walk
                    (pixel_off,) = struct.unpack_from("<I", b, 10)
                    _, w, h = struct.unpack_from("<Iii", b, 14)
                    bottom_up = h > 0
                    h = abs(h)
                    stride = (3 * w + 3) // 4 * 4
                    blue, green, red = [], [], []
                    for y in range(h):
                        src = (h - 1 - y) if bottom_up else y
                        off = pixel_off + src * stride
                        for x in range(w):
                            blue.append(b[off + 3 * x])
                            green.append(b[off + 3 * x + 1])
                            red.append(b[off + 3 * x + 2])
                    chans = {"r": red, "g": green, "b": blue}
                else:
                    raise NotImplementedError(
                        f"decode_image_channels supports bmp|png, got {fmt!r}"
                    )
                for ch, vals in chans.items():
                    rows.append((doc_id, ch, vals))
            yield pd.DataFrame(rows, columns=["doc_id", "channel", "values"])

    return df.select("doc_id", "fmt", "media").mapInPandas(
        kernel, PIXELS_SCHEMA
    )


def resize_png(blob: bytes, out_w: int, out_h: int) -> bytes:
    """REAL PNG resize: decode (unfilter + inflate), nearest-neighbor
    resample with the same NN mapping as resize_bmp, re-encode as a
    valid PNG (re-filtered + deflated)."""
    width, height, rows = _decode_png_pixels(blob)
    out_rows = []
    for y in range(out_h):
        src = rows[y * height // out_h]
        row = bytearray()
        for x in range(out_w):
            sx = x * width // out_w
            row += src[3 * sx: 3 * sx + 3]
        out_rows.append(bytes(row))
    return _encode_png_pixels(out_rows, out_w, out_h)


def resize_media(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL resize over the binary column (BMP or PNG blobs): each blob
    is decoded, nearest-neighbor resampled, and re-encoded inside the
    Arrow kernel — blob in, smaller valid blob out, same (doc_id, fmt,
    media) schema so decode_media_stats composes directly downstream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, fmt, blob in zip(
                pdf["doc_id"], pdf["fmt"], pdf["media"]
            ):
                if fmt == "bmp":
                    small = resize_bmp(bytes(blob), out_w, out_h)
                elif fmt == "png":
                    small = resize_png(bytes(blob), out_w, out_h)
                elif fmt == "gif":
                    small = resize_gif(bytes(blob), out_w, out_h)
                else:
                    raise NotImplementedError(
                        f"resize_media supports bmp|png|gif, got {fmt!r}"
                    )
                out.append((doc_id, fmt, small))
            yield pd.DataFrame(out, columns=["doc_id", "fmt", "media"])

    return df.select("doc_id", "fmt", "media").mapInPandas(
        kernel, SYNTH_SCHEMA
    )


def resample_wav(blob: bytes, factor: int = 2) -> bytes:
    """REAL audio resample (decimation): parse a 16-bit PCM WAV, keep
    every `factor`-th sample, re-encode at rate/factor via the stdlib
    wave writer. (Plain decimation aliases above the new Nyquist — a
    production resampler low-passes first; the codec round trip and the
    rate/length bookkeeping are the contract here.)"""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n_ch, sampwidth, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(),
            w.getnframes(),
        )
        if sampwidth != 2 or n_ch != 1:
            raise ValueError(
                f"unsupported WAV layout ch={n_ch} width={sampwidth}"
            )
        raw = w.readframes(n_frames)
    samples = struct.unpack(f"<{n_frames}h", raw)[::factor]
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate // factor)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return out.getvalue()


def resample_media(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL resample over the binary column (WAV blobs), same composable
    (doc_id, fmt, media) schema as resize_media."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, fmt, blob in zip(
                pdf["doc_id"], pdf["fmt"], pdf["media"]
            ):
                if fmt != "wav":
                    raise NotImplementedError(
                        f"resample_media supports wav, got {fmt!r}"
                    )
                out.append((doc_id, fmt, resample_wav(bytes(blob), factor)))
            yield pd.DataFrame(out, columns=["doc_id", "fmt", "media"])

    return df.select("doc_id", "fmt", "media").mapInPandas(
        kernel, SYNTH_SCHEMA
    )
