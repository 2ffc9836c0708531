"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode path has two tiers. REAL: dependency-free PNM (P5/P6),
8-bit BMP, and 8-bit PNG parsers (``decode_pnm`` / ``decode_bmp`` /
``decode_png`` — the PNG path is stdlib zlib + the five scanline
filters), dispatched on the payload's magic bytes — genuine
struct/byte parsing, gated by m15/m16. STUB: formats needing entropy
codecs the stdlib lacks (jpeg/webp) raise a documented
NotImplementedError; ``fake_decode``
(bytes are the pixels) stands in for them. Everything Spark-side —
schemas, binary columns, UDF signatures, Arrow batch shapes,
partitioning — is real and oracle-tested in both tiers.

Scale notes (100 TB):
- Payloads ride in parquet binary columns; scans prune them unless the
  stage touches ``media`` (column pruning keeps metadata-only queries
  cheap — verified in tests via ReadSchema).
- Every stage is mapInPandas (narrow, no shuffle): media pipelines
  scale linearly with partitions; only the final scalar aggregations
  shuffle.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  when payloads are large; stages iterate per-batch, never materialize
  a whole partition.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ("png", "jpeg", "webp")


def attach_media(documents: DataFrame) -> DataFrame:
    """Derive an opaque media payload + typed metadata per document.

    Stands in for reading real blobs: payload bytes are the UTF-8 text
    ("pixels"), dimensions derive deterministically from doc_id. All
    JVM-side expressions — no Python in this hot path.
    """
    n_bytes = F.octet_length(F.col("text"))
    width = (F.lit(16) + F.col("doc_id") % 48).cast("int")
    return documents.select(
        "doc_id",
        "lang",
        F.encode("text", "UTF-8").alias("media"),
        F.element_at(F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_format"),
        width.alias("width"),
        F.ceil(n_bytes / width).cast("int").alias("height"),
        n_bytes.cast("long").alias("n_bytes"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_px", LongType()),
        StructField("sum_px", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


# --------------------------------------------------------------------
# Real, dependency-free container codecs. Two genuinely different
# on-disk layouts that decode to the SAME logical grayscale image:
#
# - PNM (P5 grayscale / P6 RGB): ASCII "P5\n<w> <h>\n<maxval>\n"
#   header with comment lines, then raw samples row-major top-down.
# - BMP (8-bit uncompressed, BITMAPINFOHEADER): little-endian binary
#   headers, a 256-entry grayscale palette, rows padded to a 4-byte
#   stride, stored BOTTOM-UP (or top-down when height is negative).
#
# decode_* are real struct/byte parsers — no Pillow, no fakes. The
# png/jpeg/webp stub below stays honest: those need entropy codecs
# this container doesn't ship.
# --------------------------------------------------------------------


def encode_pnm(pixels: bytes, width: int) -> bytes:
    """P5 (grayscale PNM) container for ``pixels`` (len must be a
    multiple of ``width``)."""
    if width <= 0 or len(pixels) % width:
        raise ValueError("pixel buffer must be height*width bytes")
    height = len(pixels) // width
    return b"P5\n%d %d\n255\n" % (width, height) + pixels


def decode_pnm(payload: bytes) -> np.ndarray:
    """Parse a binary PNM (P5 grayscale or P6 RGB) payload into its
    flat sample array (row-major, top-down — P6 interleaves RGB)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    per_px = 1 if payload[:2] == b"P5" else 3
    # header tokens: width, height, maxval — whitespace separated,
    # '#' comment lines allowed; ONE whitespace byte ends the header.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM samples not supported")
    n = width * height * per_px
    data = payload[pos : pos + n]
    if len(data) != n:
        raise ValueError(f"truncated PNM: want {n} samples, have {len(data)}")
    return np.frombuffer(data, dtype=np.uint8)


def encode_bmp8(pixels: bytes, width: int) -> bytes:
    """8-bit uncompressed BMP (grayscale palette: index i → (i,i,i))
    for ``pixels`` (len must be a multiple of ``width``): rows padded
    to a 4-byte stride and written bottom-up, per the format."""
    import struct

    if width <= 0 or len(pixels) % width:
        raise ValueError("pixel buffer must be height*width bytes")
    height = len(pixels) // width
    stride = (width + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    file_size = offset + stride * height
    file_hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, offset)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, stride * height,
        2835, 2835, 256, 0,
    )
    pad = b"\x00" * (stride - width)
    rows = [
        pixels[r * width : (r + 1) * width] + pad for r in range(height)
    ]
    return file_hdr + info_hdr + palette + b"".join(reversed(rows))


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse an 8-bit uncompressed BMP into its flat pixel-index array
    in row-major TOP-DOWN order (undoing the stride padding and the
    bottom-up row layout). With the grayscale palette encode_bmp8
    writes, index == gray value, so this is the decoded image."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 34:
        raise ValueError("BMP payload truncated inside the header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 8 or compression != 0:
        raise NotImplementedError(
            f"only 8-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    # header fields are UNTRUSTED: a corrupt width/height must become a
    # ValueError (-> quarantine verdict), never a whole-buffer
    # frombuffer read (numpy count<0) or an unbounded row loop
    if width <= 0:
        raise ValueError(f"BMP header declares non-positive width {width}")
    stride = (width + 3) & ~3
    if data_offset + stride * height > len(payload):
        raise ValueError(
            "BMP pixel data extends past the payload "
            f"(offset {data_offset} + {stride}x{height} > {len(payload)})"
        )
    rows = [
        np.frombuffer(payload, dtype=np.uint8, count=width,
                      offset=data_offset + r * stride)
        for r in range(height)
    ]
    if not top_down:
        rows.reverse()
    return np.concatenate(rows) if rows else np.empty(0, dtype=np.uint8)


# --------------------------------------------------------------------
# PNG (8-bit grayscale / RGB, non-interlaced) — stdlib zlib + the five
# scanline filter types, no Pillow. The one web-dominant format that
# IS reachable dependency-free (its only entropy codec is DEFLATE,
# which the stdlib ships); jpeg/webp stay honest stubs.
# --------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Stored-block size we frame OURSELVES (zlib.compress(level=0)'s
# internal segmentation is zlib-version-dependent; fixed framing keeps
# the container size arithmetically predictable for oracle SQL:
# idat = 2 + 5*ceil(raw/32768) + raw + 4).
_PNG_STORE_BLOCK = 32768


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """A valid zlib stream of uncompressed DEFLATE stored blocks with
    fixed ``_PNG_STORE_BLOCK`` framing — byte-deterministic across
    zlib versions (zlib.decompress reads it; we never rely on
    zlib.compress's internal block segmentation)."""
    import zlib

    out = [b"\x78\x01"]
    n = len(data)
    nb = max(1, -(-n // _PNG_STORE_BLOCK))
    for k in range(nb):
        chunk = data[k * _PNG_STORE_BLOCK : (k + 1) * _PNG_STORE_BLOCK]
        final = b"\x01" if k == nb - 1 else b"\x00"
        ln = len(chunk)
        out.append(final + struct.pack("<HH", ln, ln ^ 0xFFFF) + chunk)
    out.append(struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF))
    return b"".join(out)


def encode_png(pixels: bytes, width: int) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 scanlines,
    stored-block zlib) for ``pixels`` (len must be a multiple of
    ``width``). Container size is exactly
    ``8 + 25 + (12 + 2 + 5*ceil(raw/32768) + raw + 4) + 12`` with
    ``raw = height*(width+1)`` — the m16 oracle recomputes it."""
    if width <= 0 or not pixels or len(pixels) % width:
        # empty buffers are rejected: _zlib_stored would emit one stored
        # block for raw=0 while the advertised 5*ceil(raw/32768) formula
        # gives 0, and decode_png rejects zero-dimension headers anyway.
        raise ValueError("pixel buffer must be non-empty height*width bytes")
    height = len(pixels) // width
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib_stored(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Parse an 8-bit non-interlaced PNG (grayscale or RGB) into its
    flat sample array (row-major, top-down; RGB interleaves). Real
    decode: chunk walk with CRC verification, zlib inflate, and all
    five scanline filters (None/Sub/Up/Average/Paeth) reversed.
    Untrusted input raises ValueError (truncation anywhere — chunk
    table, IDAT stream, pixel mass — or CRC/length lies), never a
    numpy/zlib internal error."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    color = interlace = None
    idat: list[bytes] = []
    seen_iend = False
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = payload[pos + 8 + ln : pos + 12 + ln]
        if len(data) != ln or len(crc) != 4:
            raise ValueError("truncated PNG: chunk cut mid-stream")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != int.from_bytes(crc, "big"):
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError("PNG IHDR must be 13 bytes")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2):
                raise NotImplementedError(
                    f"only 8-bit gray/RGB PNG supported (depth={depth}, "
                    f"color={color})"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            if w == 0 or h == 0:
                # h == 0 matters as much as w == 0: expected becomes 0
                # and zlib treats max_length=0 as UNBOUNDED, so a
                # zero-height header would let a DEFLATE bomb inflate
                # fully before the length check.
                raise ValueError("PNG header declares zero dimension")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            seen_iend = True
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("truncated PNG: no IHDR")
    if not seen_iend:
        raise ValueError("truncated PNG: missing IEND")
    bpp = 1 if color == 0 else 3
    stride = w * bpp
    expected = h * (stride + 1)
    # header fields are UNTRUSTED: bound the allocation BEFORE
    # inflating — a header declaring a giant geometry, or a tiny IDAT
    # inflating 1000x (a zip bomb), must become a quarantine verdict,
    # never an executor OOM. 2^28 filtered bytes ≈ a 16k x 16k gray
    # image — far above any fixture, far below executor memory.
    if expected > (1 << 28):
        raise ValueError(
            f"PNG header declares {w}x{h}x{bpp} "
            f"({expected} filtered bytes) — over the decode bound"
        )
    try:
        do = zlib.decompressobj()
        raw = do.decompress(b"".join(idat), expected)
        # feed back the unconsumed input asking for ONE more byte: a
        # conforming stream of exactly `expected` bytes yields nothing
        # (only the adler trailer remains); any surplus output is a bomb
        bomb = (
            do.decompress(do.unconsumed_tail, 1) != b""
            if not do.eof
            else False
        )
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if bomb or len(raw) != expected:
        raise ValueError(
            f"PNG pixel data length mismatch: want {expected}, "
            f"have {len(raw)}{' plus surplus (inflate bomb)' if bomb else ''}"
        )
    out = bytearray(h * stride)
    prev = bytes(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        rec = bytearray(stride)
        if ft == 0:
            rec[:] = line
        elif ft == 1:  # Sub
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + left) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                rec[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {ft}")
        out[r * stride : (r + 1) * stride] = rec
        prev = bytes(rec)
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _real_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec path: dispatch on the payload's MAGIC bytes to the
    dependency-free PNM/BMP/PNG parsers above. Formats needing
    entropy codecs the stdlib lacks (jpeg/webp) remain a documented
    stub — this container ships none."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        f"no dependency-free decoder for format={fmt!r} (payload lacks "
        "PNM/BMP/PNG magic); jpeg/webp need codec libs this "
        "environment does not ship — use fake_decode for those"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stub decode: payload bytes ARE the pixel values."""
    return np.frombuffer(payload, dtype=np.uint8)


def decode_media(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Per-payload pixel stats via mapInPandas (Arrow batches in/out)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "lang", "n_px", "sum_px", "mean_px",
                    "min_px", "max_px",
                )
            }
            for did, lang, m, f in zip(
                pdf["doc_id"], pdf["lang"], pdf["media"], pdf["media_format"]
            ):
                if m is None or len(m) == 0:
                    # NULL/empty payload decodes to no pixels: emit no
                    # row, matching the oracle's per-byte unnest.
                    continue
                a = _real_decode(m, f) if use_real_codec else fake_decode(m)
                s = int(a.astype(np.int64).sum())
                out["doc_id"].append(did)
                out["lang"].append(lang)
                out["n_px"].append(len(a))
                out["sum_px"].append(s)
                # exact-int sum / exact-int count in one double division
                # — bit-matches the oracle's CAST(SUM(v) AS DOUBLE)/n
                out["mean_px"].append(s / len(a))
                out["min_px"].append(int(a.min()))
                out["max_px"].append(int(a.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(stage, _DECODE_SCHEMA)


_REAL_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("media", BinaryType()),
        StructField("media_format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


_CONTAINER_ARMS = ("pgm", "bmp", "png")
_ENCODERS = {"pgm": encode_pnm, "bmp": encode_bmp8, "png": encode_png}


def attach_real_media(documents: DataFrame) -> DataFrame:
    """Wrap each document's UTF-8 bytes in a REAL image container —
    doc_id % 3 rotates through a P5 PNM (ASCII header), an 8-bit BMP
    (bottom-up rows, 4-byte stride), and an 8-bit grayscale PNG
    (chunked, CRC'd, zlib stored-block IDAT). The logical image is
    identical in all three arms: width = 16 + doc_id % 48, the text
    bytes row-major, the final row zero-padded to the width — so one
    container-ignorant oracle covers every arm, and parity proves the
    PARSERS recover exactly the true pixels from three different
    on-disk layouts. Empty/NULL docs carry a NULL payload (no pixels →
    no decode row, the m04 convention).

    This is corpus prep (the stand-in for reading real blobs), not the
    operator under test; it runs as one narrow Arrow stage."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias, fmts, widths, heights, nbytes = [], [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w = int(16 + did % 48)
                fmt = _CONTAINER_ARMS[int(did) % 3]
                raw = (text or "").encode("utf-8")
                if not raw:
                    medias.append(None)
                    fmts.append(fmt)
                    widths.append(w)
                    heights.append(0)
                    nbytes.append(0)
                    continue
                h = -(-len(raw) // w)
                px = raw + b"\x00" * (w * h - len(raw))
                payload = _ENCODERS[fmt](px, w)
                medias.append(payload)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "lang": pdf["lang"].values,
                    "media": medias,
                    "media_format": fmts,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                }
            )

    return documents.select("doc_id", "lang", "text").mapInPandas(
        stage, _REAL_MEDIA_SCHEMA
    )


_HIST_SCHEMA = StructType(
    [StructField("lang", StringType())]
    + [StructField(f"b{i}", LongType()) for i in range(4)]
)


def byte_histogram(media: DataFrame) -> DataFrame:
    """4-bin byte-value histogram per payload, partially aggregated
    per Arrow batch in Python (map-side combine), then summed per lang
    JVM-side — the same partial-agg shape a 100 TB run needs."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[str, np.ndarray] = {}
            for lang, m in zip(pdf["lang"], pdf["media"]):
                acc.setdefault(lang, np.zeros(4, dtype=np.int64))
                if m is None or len(m) == 0:
                    continue  # lang still appears, contributing zeros
                a = np.frombuffer(m, dtype=np.uint8) >> 6  # 0..3
                acc[lang] += np.bincount(a, minlength=4)
            yield pd.DataFrame(
                [{"lang": k, **{f"b{i}": int(v[i]) for i in range(4)}} for k, v in acc.items()]
            )

    partial = media.mapInPandas(stage, _HIST_SCHEMA)
    return partial.groupBy("lang").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(4)]
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256, every: int = 4) -> DataFrame:
    """Treat the payload as a fixed-stride "video": split into
    ``frame_bytes`` frames, keep every ``every``-th (frame sampling).
    Explodes rows inside mapInPandas — output batches are bounded by
    input batch size × frames-per-doc."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_fr = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                for fno in range(0, (len(m) + frame_bytes - 1) // frame_bytes, every):
                    out_id.append(did)
                    out_no.append(fno)
                    out_fr.append(bytes(m[fno * frame_bytes : (fno + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": out_id, "frame_no": out_no, "frame": out_fr})

    return media.mapInPandas(stage, _FRAME_SCHEMA)


_FRAME_SUM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_sum", LongType()),
    ]
)


def frame_byte_sums(frames: DataFrame) -> DataFrame:
    """Per-frame integer byte sum + length — the feature-extraction
    stage a scene-cut detector runs on (a real detector extracts
    per-frame luma means; the stub sums payload bytes — same Arrow
    batch shape, numpy-vectorized). The sum is exact int64
    (≤ frame_bytes·255), so every downstream comparison is
    engine- and partitioning-independent."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, sums = [], []
            for f in pdf["frame"]:
                if f is None or len(f) == 0:
                    lens.append(0)
                    sums.append(0)
                else:
                    a = np.frombuffer(f, dtype=np.uint8)
                    lens.append(len(a))
                    sums.append(int(a.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "frame_no": pdf["frame_no"].values,
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return frames.mapInPandas(stage, _FRAME_SUM_SCHEMA)


def resize_media(media: DataFrame, keep_every: int = 2) -> DataFrame:
    """Stub resize: keep every k-th byte (deterministic downsample);
    metadata recomputed to match. Same signature a real resampler has:
    binary in, binary out, meta updated."""

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("media", BinaryType()),
            StructField("media_format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(m[::keep_every]) for m in pdf["media"]]
            w = (pdf["width"].astype("int64") // keep_every).clip(lower=1).astype("int32")
            n = pd.Series([len(r) for r in resized], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "lang": pdf["lang"].values,
                    "media": resized,
                    "media_format": pdf["media_format"].values,
                    "width": w.values,
                    "height": (-(-n // w)).astype("int32").values,
                    "n_bytes": n.values,
                }
            )

    return media.mapInPandas(stage, out_schema)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("peak_rms", DoubleType()),
    ]
)


def audio_window_energy(media: DataFrame, window: int = 64) -> DataFrame:
    """Audio-style windowed energy: treat the payload as 8-bit unsigned
    PCM, frame it into ``window``-sample windows (last window partial),
    and report per-doc window count + peak window RMS.

    RMS per window = sqrt(sum(v^2)/n) with the inner sum in exact int64
    (max 64*255^2 ≈ 4.2e6, far inside double's exact range), so the
    result is bit-identical at any partitioning and matches the SQL
    oracle. Same mapInPandas shape a real resampler/VAD stage has."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_nw, out_peak = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                if m is None or len(m) == 0:
                    # NULL/empty payload: emit nothing, matching the SQL
                    # oracle (its per-character unnest produces no row
                    # for a charless doc). np.frombuffer would raise on
                    # None anyway — skipping is the defined semantics.
                    continue
                a = np.frombuffer(m, dtype=np.uint8).astype(np.int64)
                n_w = (len(a) + window - 1) // window
                peak = 0.0
                for w0 in range(0, len(a), window):
                    seg = a[w0 : w0 + window]
                    peak = max(peak, float(np.sqrt(float((seg * seg).sum()) / len(seg))))
                out_id.append(did)
                out_nw.append(n_w)
                out_peak.append(peak)
            yield pd.DataFrame(
                {"doc_id": out_id, "n_windows": out_nw, "peak_rms": out_peak}
            )

    return media.mapInPandas(stage, _AUDIO_SCHEMA)


_PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_px", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(media: DataFrame, n_blocks: int = 32) -> DataFrame:
    """Block-mean perceptual hash per payload (the aHash family): split
    the decoded pixel stream into ``n_blocks`` equal spans; bit i is
    set iff span i's mean exceeds the whole-payload mean. Comparison is
    by integer cross-multiplication (block_sum · n > total · block_n),
    so the bits — and the hash — are exact on any engine, no float
    means. Empty/NULL payloads emit no row (nothing to hash).

    ``n_blocks`` up to 64 is supported: bit 63 is the int64 sign bit,
    so the packed hash is emitted as the SIGNED two's-complement value
    (what both Spark LongType and the SQL twin's BIGINT hold); band
    extraction via arithmetic-shift-then-mask and Hamming via
    bit_count(xor) are representation-exact either way.

    Scale shape: one narrow mapInPandas (no shuffle); downstream dedup
    groups on the hash value — candidate generation is an equi-shuffle
    on a 2^n_blocks-domain key, never an all-pairs comparison. For
    Hamming-near (not identical) matching, band the bits like SimHash
    (operators/dedup.py) — same machinery, hash split into band keys.
    """
    if n_blocks > 64:
        raise ValueError("perceptual_hash packs into int64: n_blocks <= 64")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_n, out_h = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                if m is None or len(m) == 0:
                    continue
                a = np.frombuffer(m, dtype=np.uint8).astype(np.int64)
                n = len(a)
                total = int(a.sum())
                # byte x belongs to block x·n_blocks // n — the same
                # assignment rule as the SQL twin's ((p-1)·m) // n, so
                # both engines partition identically (floor-BOUNDARY
                # spans are a *different* partition; don't mix them)
                blk = (np.arange(n, dtype=np.int64) * n_blocks) // n
                bs = np.bincount(blk, weights=a, minlength=n_blocks).astype(np.int64)
                bn = np.bincount(blk, minlength=n_blocks).astype(np.int64)
                bits = 0
                for i in range(n_blocks):
                    if bn[i] > 0 and int(bs[i]) * n > total * int(bn[i]):
                        bits |= 1 << i
                if bits >= 1 << 63:  # two's-complement into int64
                    bits -= 1 << 64
                out_id.append(did)
                out_n.append(n)
                out_h.append(bits)
            yield pd.DataFrame(
                {"doc_id": out_id, "n_px": out_n, "phash": out_h},
                columns=["doc_id", "n_px", "phash"],
            )

    return media.mapInPandas(stage, _PHASH_SCHEMA)


def difference_hash(
    media: DataFrame, block_bytes: int = 8, n_bits: int = 64
) -> DataFrame:
    """64-bit difference hash (dHash family) per payload: the leading
    ``(n_bits+1) * block_bytes`` bytes split into fixed-width blocks
    (absent tail blocks sum to 0), and bit i is set iff
    sum(block i) > sum(block i+1). Pure integer comparisons — exact on
    any engine — and NO global-mean threshold, so the hash is robust
    to the edits near-dup corpora actually contain: a suffix append or
    tail edit perturbs only the last block pair (≤ 2 bits), where a
    length-normalized block-MEAN hash shifts every block boundary and
    flips ~10+ bits on the same pair. Fixed-width blocks are the
    "top-left crop" analogy of real dHash's resize-to-grid: identical
    leading content → near-identical hash, regardless of total length.

    Bit 63 rides the int64 sign bit; the packed hash is emitted as the
    signed two's-complement value (what Spark LongType and the SQL
    twin's BIGINT both hold). Empty/NULL payloads emit no row.

    Scale shape: one narrow mapInPandas; downstream near-dup matching
    bands the 64 bits into r+1 bands (pigeonhole-exact at Hamming
    radius r) — with 2^16-domain band keys, bucket occupancy and thus
    candidate volume stay corpus-linear where a 16-bit hash's buckets
    collapse quadratically."""
    if n_bits > 64:
        raise ValueError("difference_hash packs into int64: n_bits <= 64")
    width = (n_bits + 1) * block_bytes

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_n, out_h = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                if m is None or len(m) == 0:
                    continue
                a = np.frombuffer(m[:width], dtype=np.uint8).astype(np.int64)
                n = len(a)
                padded = np.zeros(width, dtype=np.int64)
                padded[:n] = a
                sums = padded.reshape(n_bits + 1, block_bytes).sum(axis=1)
                bits = 0
                for i in range(n_bits):
                    if sums[i] > sums[i + 1]:
                        bits |= 1 << i
                if bits >= 1 << 63:  # two's-complement into int64
                    bits -= 1 << 64
                out_id.append(did)
                out_n.append(len(m))
                out_h.append(bits)
            yield pd.DataFrame(
                {"doc_id": out_id, "n_px": out_n, "phash": out_h},
                columns=["doc_id", "n_px", "phash"],
            )

    return media.mapInPandas(stage, _PHASH_SCHEMA)


_FRAME_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("fp", LongType())]
)


def frame_fingerprints(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """DISTINCT per-video frame fingerprints: the payload splits into
    ``frame_bytes`` frames and each frame folds to one integer —
    (Σ byteᵥ·(pos_in_frame+1)) · (frame_bytes+1) + frame_len, a
    position-weighted checksum that distinguishes reordered bytes
    where a plain sum cannot, packed with the length so partial tail
    frames never collide with full ones. Exact integer arithmetic, so
    any engine computes the identical fingerprint set.

    This is the video-dedup feature extractor: downstream Jaccard over
    the distinct-fingerprint SETS (m11) finds videos sharing most of
    their frames regardless of frame ORDER — trims, re-cuts,
    re-stitches. One narrow mapInPandas, no shuffle; output is bounded
    by frames-per-doc and already deduplicated per doc. Production
    swaps the checksum for a per-frame perceptual hash (the m07
    block-mean machinery applied per frame) — a data change to this
    column, not a plan change. Empty/NULL payloads emit nothing.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            fps: list[int] = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                if m is None or len(m) == 0:
                    continue
                a = np.frombuffer(m, dtype=np.uint8).astype(np.int64)
                n = len(a)
                pos = np.arange(n, dtype=np.int64)
                ws = np.bincount(
                    pos // frame_bytes, weights=a * (pos % frame_bytes + 1)
                ).astype(np.int64)
                fl = np.bincount(pos // frame_bytes).astype(np.int64)
                uf = np.unique(ws * (frame_bytes + 1) + fl)
                ids.extend([did] * len(uf))
                fps.extend(int(x) for x in uf)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return media.mapInPandas(stage, _FRAME_FP_SCHEMA)


_INTEGRITY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("status", StringType()),
        StructField("n_px", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def container_integrity(media: DataFrame) -> DataFrame:
    """Decode-level integrity gate over REAL containers (the m13
    metadata gate's deeper sibling): actually PARSE each payload with
    the PNM/BMP decoders and verify the pixel matrix matches the
    declared (width, height) metadata. Verdicts: 'ok' (parsed, dims
    agree), 'dim_mismatch' (parsed but wrong size), 'corrupt' (parser
    raised — truncated data, botched header), 'empty' (NULL payload).
    One narrow Arrow stage; quarantine decisions never shuffle."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in ("doc_id", "media_format", "status", "n_px", "n_bytes")
            }
            for did, m, f, w, h in zip(
                pdf["doc_id"], pdf["media"], pdf["media_format"],
                pdf["width"], pdf["height"],
            ):
                if m is None or len(m) == 0:
                    status, n_px, n_bytes = "empty", 0, 0
                else:
                    n_bytes = len(m)
                    try:
                        a = _real_decode(bytes(m), f)
                        n_px = len(a)
                        status = (
                            "ok" if n_px == int(w) * int(h) else "dim_mismatch"
                        )
                    except (ValueError, NotImplementedError, struct.error):
                        # struct.error: header unpacks on payloads cut
                        # inside the fixed header region (it is NOT a
                        # ValueError subclass)
                        status, n_px = "corrupt", 0
                out["doc_id"].append(did)
                out["media_format"].append(f)
                out["status"].append(status)
                out["n_px"].append(n_px)
                out["n_bytes"].append(n_bytes)
            yield pd.DataFrame(out)

    return media.mapInPandas(stage, _INTEGRITY_SCHEMA)
