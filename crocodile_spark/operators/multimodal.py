"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The codec is a REAL, dependency-free container parser: PNG / GIF / BMP
dimensions + channel count are decoded from the payload bytes
(struct.unpack over the formats' public container layouts) and WAV is
parsed by a real RIFF chunk walk (JUNK/LIST chunks before 'fmt ' are
handled, ADVICE r3). Since r4 the per-item features are REAL for every
image/audio format the operator recognizes -- no codec library needed:
BMP pixel buffers (uncompressed 8/24/32 bpp), WAV PCM s16le samples,
PNG pixels (stdlib zlib inflate + per-row unfiltering,
decode_png_pixels; bit depth 8, non-interlaced, non-palette), and GIF
first frames (pure-Python LZW + palette expansion, decode_gif_pixels;
global/local palettes, non-interlaced full frames). The BMP/WAV
statistics are value-checked against a DuckDB oracle that re-derives
them via hex/byte arithmetic; PNG/GIF stats cannot be replayed in SQL
(no zlib/LZW there) and are pytest-verified against numpy references.
Only unrecognized payloads (e.g. the synthetic opaque "video" rows) keep
the documented sha-derived placeholder feature.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("width", T.IntegerType(), True),     # claimed metadata
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, format string, n_bytes long, sha string, "
    "width int, height int, channels int, feat array<double>, "
    "ch_mean array<double>, ch_std array<double>"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (PNG spec, public)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def walk_riff_chunks(b: bytes):
    """Yield (chunk_id, data_offset, data_size) for each top-level chunk of
    a RIFF container, starting after the 12-byte RIFF/WAVE header; chunk
    sizes are padded to even offsets per the RIFF spec. Truncated chunks
    are clamped to the available bytes."""
    off = 12
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        (size,) = struct.unpack("<I", b[off + 4 : off + 8])
        data_off = off + 8
        size = min(size, max(0, len(b) - data_off))
        yield cid, data_off, size
        off = data_off + size + (size & 1)


def parse_wav(b: bytes) -> tuple:
    """(channels, data_offset, data_size, fmt_tag, bits_per_sample) via a
    REAL RIFF chunk walk (ADVICE r3: real WAVs carry JUNK/LIST chunks
    before 'fmt ', so a fixed offset-22 read returns garbage there).
    fmt_tag is wFormatTag at fmt offset 0; bits_per_sample is
    wBitsPerSample at fmt offset 14 (None when the fmt chunk is shorter
    than the canonical 16 bytes). Missing fmt/data -> Nones."""
    channels = data_off = data_size = fmt_tag = bits = None
    for cid, off, size in walk_riff_chunks(b):
        if cid == b"fmt " and size >= 4 and channels is None:
            (fmt_tag,) = struct.unpack("<H", b[off : off + 2])
            (channels,) = struct.unpack("<H", b[off + 2 : off + 4])
            if size >= 16:
                (bits,) = struct.unpack("<H", b[off + 14 : off + 16])
        elif cid == b"data" and data_off is None:
            data_off, data_size = off, size
    return channels, data_off, data_size, fmt_tag, bits


def walk_png_chunks(b: bytes):
    """Yield (chunk_type, data) for each PNG chunk after the 8-byte
    signature (public layout: u32 BE length, 4-byte type, data, u32 CRC).
    Truncated chunks are clamped."""
    off = 8
    while off + 8 <= len(b):
        (length,) = struct.unpack(">I", b[off : off + 4])
        ctype = b[off + 4 : off + 8]
        data_off = off + 8
        length = min(length, max(0, len(b) - data_off))
        yield ctype, b[data_off : data_off + length]
        off = data_off + length + 4  # skip CRC


# ingest-throughput guards for the PNG decoder on untrusted web bytes:
# total pixel-samples cap, and a separate budget for rows whose filter is
# inherently SEQUENTIAL in x (Average/Paeth) -- those run a Python loop, so
# a crafted or merely huge photo must degrade to the placeholder instead of
# stalling the Arrow batch. Sub rows are vectorized (per-channel cumsum).
PNG_MAX_SAMPLES = 64 * 1024 * 1024
PNG_MAX_SEQUENTIAL_SAMPLES = 4 * 1024 * 1024
# row-count cap: a 1xN tall-skinny PNG passes the sample cap yet would run
# the per-row loop tens of millions of times on cheap filters
PNG_MAX_ROWS = 1 << 16
# GIF area cap (pixels): the u16 header fields allow w=h=65535, whose LZW
# decode + palette expansion would emit gigabytes from a small payload
GIF_MAX_PIXELS = 16 * 1024 * 1024


def decode_png_pixels(b: bytes):
    """REAL PNG pixel decode, dependency-free: concatenate IDAT chunks,
    zlib-inflate (stdlib), undo the per-row filter (types 0-4: None, Sub,
    Up, Average, Paeth -- the PNG spec's arithmetic), return an
    (h, w*channels) uint8 array. Supports the common shape: bit depth 8,
    non-interlaced, color types 0/2/4/6 (palette type 3 would need PLTE
    indirection). Anything else -- malformed/truncated zlib data (like the
    synthetic junk-body fixtures) or an image over the decode budgets --
    returns None. None/Up rows are pure vector ops; Sub rows are a
    per-channel uint8-overflow cumsum; Average/Paeth rows are sequential
    by definition and draw from PNG_MAX_SEQUENTIAL_SAMPLES."""
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG or len(b) < 34:
        return None
    w, h = struct.unpack(">II", b[16:24])
    bit_depth, color_type, _comp, _filt, interlace = b[24:29]
    nch = _PNG_CHANNELS.get(color_type)
    if bit_depth != 8 or interlace != 0 or nch is None or color_type == 3:
        return None
    if w <= 0 or h <= 0 or h > PNG_MAX_ROWS or w * h * nch > PNG_MAX_SAMPLES:
        return None
    idat = b"".join(data for ctype, data in walk_png_chunks(b) if ctype == b"IDAT")
    if not idat:
        return None
    stride = w * nch
    need = h * (1 + stride)
    try:
        # decompressobj.max_length truly bounds the inflate: a crafted
        # decompression bomb stops at exactly the bytes the image needs
        raw = zlib.decompressobj().decompress(idat, need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    seq_budget = PNG_MAX_SEQUENTIAL_SAMPLES
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, offset=pos + 1, count=stride)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 2:  # Up
            out[y] = row + prev  # uint8 wraparound IS the mod-256 law
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256, vectorized
            for c in range(nch):
                np.cumsum(row[c::nch], dtype=np.uint8, out=out[y, c::nch])
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            seq_budget -= stride
            if seq_budget < 0:
                return None
            cur = np.zeros(stride, np.int32)
            row32 = row.astype(np.int32)
            prev32 = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                bb = prev32[x]
                if ftype == 3:
                    pred = (a + bb) // 2
                else:
                    c = prev32[x - nch] if x >= nch else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                cur[x] = (row32[x] + pred) & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            return None
    return out


def _gif_lzw_decode(data: bytes, min_code_size: int, max_out: int = 1 << 26):
    """Standard GIF LZW decode (LSB-first variable-width codes, CLEAR/END
    control codes, 12-bit dictionary cap). Returns the index stream or
    None on a malformed stream. Pure Python with a rolling bit buffer --
    O(stream length). ``max_out`` bounds the decoded size (the caller
    knows w*h): LZW expands small inputs by orders of magnitude, so an
    unbounded decode is a decompression-bomb vector on untrusted bytes."""
    # literals are byte indices, so a valid GIF's min code size is <= 8
    # (hypothesis found 9-11 overflowing the byte table)
    if not 2 <= min_code_size <= 8 or not data:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    # rolling LSB-first bit buffer: O(n) in the stream length. (The naive
    # int.from_bytes(whole stream) form is O(n^2) -- every code extraction
    # shifts a megabyte-sized integer on real-world GIFs.)
    buf = 0
    buf_bits = 0
    byte_iter = iter(data)
    nbits = min_code_size + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    prev = None
    out = bytearray()
    while True:
        while buf_bits < nbits:
            nxt = next(byte_iter, None)
            if nxt is None:
                return bytes(out)  # stream without explicit END
            buf |= nxt << buf_bits
            buf_bits += 8
        code = buf & ((1 << nbits) - 1)
        buf >>= nbits
        buf_bits -= nbits
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            nbits = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            return None
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        out.extend(entry)
        if len(out) > max_out:
            return bytes(out[:max_out])  # caller validates exact length
        prev = entry


def decode_gif_pixels(b: bytes):
    """REAL GIF decode, dependency-free: global color table + first image
    frame's LZW index stream -> (h, w*3) uint8 RGB array. Supports the
    common shape (global palette, non-interlaced, full-frame first image);
    local palettes are honored, interlaced/partial frames and malformed
    streams return None."""
    import numpy as np

    if b[:4] != b"GIF8" or len(b) < 13:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    if w * h > GIF_MAX_PIXELS:
        return None  # u16 fields allow 65535x65535: bomb guard
    packed = b[10]
    off = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        need = 3 * n_colors
        if off + need > len(b):
            return None
        gct = np.frombuffer(b, np.uint8, offset=off, count=need).reshape(-1, 3)
        off += need
    while off < len(b):
        marker = b[off]
        off += 1
        if marker == 0x3B:  # trailer
            return None
        if marker == 0x21:  # extension: label + sub-blocks
            off += 1
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
            continue
        if marker != 0x2C:
            return None
        if off + 9 > len(b):
            return None
        left, top, iw, ih = struct.unpack("<HHHH", b[off : off + 8])
        ipacked = b[off + 8]
        off += 9
        palette = gct
        if ipacked & 0x80:  # local color table
            n_colors = 2 << (ipacked & 0x07)
            need = 3 * n_colors
            if off + need > len(b):
                return None
            palette = np.frombuffer(b, np.uint8, offset=off, count=need).reshape(-1, 3)
            off += need
        if palette is None or ipacked & 0x40:  # no palette / interlaced
            return None
        if (left, top, iw, ih) != (0, 0, w, h) or w <= 0 or h <= 0:
            return None  # partial first frame: out of the supported shape
        if off >= len(b):
            return None
        min_code_size = b[off]
        off += 1
        data = bytearray()
        while off < len(b) and b[off] != 0:
            n = b[off]
            data.extend(b[off + 1 : off + 1 + n])
            off += 1 + n
        idx = _gif_lzw_decode(bytes(data), min_code_size, max_out=w * h)
        if idx is None or len(idx) < w * h:
            return None
        arr = np.frombuffer(idx[: w * h], np.uint8)
        if arr.max(initial=0) >= len(palette):
            return None
        return palette[arr].reshape(h, w * 3)
    return None


def parse_bmp(b: bytes) -> tuple:
    """(width, height, bpp, compression, pixel_data_offset) from the BMP
    file header + BITMAPINFOHEADER (public layout: data offset LE u32 at
    10, width/height LE i32 at 18/22, bpp LE u16 at 28, compression LE
    u32 at 30)."""
    (data_off,) = struct.unpack("<I", b[10:14])
    w, h = struct.unpack("<ii", b[18:26])
    (bpp,) = struct.unpack("<H", b[28:30])
    comp = struct.unpack("<I", b[30:34])[0] if len(b) >= 34 else None
    return w, abs(h), bpp, comp, data_off


def parse_media_header(b) -> tuple:
    """(format, width, height, channels) from container header bytes.

    Real parsing of the public container layouts:
      PNG  -- IHDR: width/height big-endian u32 at 16/20, color type at 25
      GIF  -- logical screen: width/height little-endian u16 at 6/8
      BMP  -- BITMAPINFOHEADER: width/height LE i32 at 18/22, bpp LE u16 at 28
      WAV  -- RIFF/WAVE 'fmt ' chunk located by a real chunk walk (r4)
    Unknown magic -> (None, None, None, None): opaque payloads flow through
    with null header fields instead of failing the batch.
    """
    if b is None:
        return (None, None, None, None)
    b = bytes(b)
    if b[:8] == _PNG_SIG and len(b) >= 26:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, _PNG_CHANNELS.get(b[25]))
    if b[:4] == b"GIF8" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, 3)
    if b[:2] == b"BM" and len(b) >= 30:
        w, h, bpp, _comp, _off = parse_bmp(b)
        return ("bmp", w, h, max(1, bpp // 8))
    if b[:4] == b"RIFF" and len(b) >= 24 and b[8:12] == b"WAVE":
        ch, _off, _size, _tag, _bits = parse_wav(b)
        return ("wav", None, None, ch)
    return (None, None, None, None)


def content_feature(b, dim: int = 8) -> list[float]:
    """Deterministic content-addressed placeholder embedding: ``dim``
    floats derived from sha256(payload). Used ONLY when real content
    statistics are unavailable -- unrecognized payloads, or recognized
    containers whose samples failed to decode (junk bodies, unsupported
    shapes, over-budget images). Every decodable PNG/GIF/BMP/WAV gets
    REAL per-channel statistics from media_content_stats instead."""
    if b is None:
        return [0.0] * dim
    h = hashlib.sha256(bytes(b)).digest()
    return [h[i] / 255.0 for i in range(dim)]


def media_content_stats(b) -> tuple:
    """(ch_mean, ch_std) REAL per-channel content statistics, decoded
    dependency-free (struct + numpy + stdlib zlib):

      PNG (bit depth 8, non-interlaced, non-palette) -- IDAT chunks
        inflated with zlib, per-row filters undone (decode_png_pixels),
        per-channel mean/std over the real pixels /255. Junk-body or
        unsupported-shape PNGs fall back to (None, None).
      BMP (uncompressed, 8/24/32 bpp) -- the pixel buffer at the header's
        data offset as interleaved unsigned channel bytes, normalized /255.
        When the buffer holds the full pixel array (rowsize*height), rows
        are decoded properly (4-byte row padding stripped); a truncated
        buffer falls back to the raw interleaved-buffer law (documented --
        the synthetic fixtures carry truncated junk bodies on purpose).
        8bpp is palette-indexed: stats are over the raw index bytes
        (index-intensity; the palette is not applied).
      WAV -- PCM s16le samples of the 'data' chunk (located by the chunk
        walk), channel = sample_index % channels, normalized /32768.

    std is the POPULATION std (numpy default ddof=0 / SQL stddev_pop).
    Unknown formats, undecodable payloads, and empty buffers ->
    (None, None). The payload is UNTRUSTED web content: any decoder
    surprise degrades to the placeholder instead of failing the whole
    Arrow batch (the decoders are also individually total -- the outer
    guard is defense in depth, exercised by the fuzz test)."""
    import numpy as np

    if b is None:
        return (None, None)
    try:
        return _content_stats_inner(bytes(b), np)
    except Exception:
        return (None, None)


def _content_stats_inner(b: bytes, np) -> tuple:
    if b[:8] == _PNG_SIG:
        px = decode_png_pixels(b)
        if px is None:
            return (None, None)  # compressed-but-undecodable or unsupported shape
        h, stride = px.shape
        nch = _PNG_CHANNELS.get(b[25], 1)
        chans = px.reshape(-1, nch).astype(np.float64)
        return (
            [float(x) / 255.0 for x in chans.mean(axis=0)],
            [float(x) / 255.0 for x in chans.std(axis=0)],
        )
    if b[:4] == b"GIF8":
        px = decode_gif_pixels(b)
        if px is None:
            return (None, None)
        chans = px.reshape(-1, 3).astype(np.float64)  # palette-expanded RGB
        return (
            [float(x) / 255.0 for x in chans.mean(axis=0)],
            [float(x) / 255.0 for x in chans.std(axis=0)],
        )
    if b[:2] == b"BM" and len(b) >= 34:
        w, h, bpp, comp, data_off = parse_bmp(b)
        if comp != 0 or bpp not in (8, 24, 32) or data_off >= len(b):
            return (None, None)
        nch = max(1, bpp // 8)
        buf = np.frombuffer(b, dtype=np.uint8, offset=data_off)
        row_size = ((w * nch + 3) // 4) * 4
        if w > 0 and h > 0 and len(buf) >= row_size * h:
            # full pixel array: strip the per-row padding
            rows = buf[: row_size * h].reshape(h, row_size)[:, : w * nch]
            samples = rows.reshape(-1)
        else:
            samples = buf  # truncated: raw interleaved-buffer law
        n = (len(samples) // nch) * nch if nch > 1 else len(samples)
        if n == 0:
            return (None, None)
        chans = samples[:n].reshape(-1, nch).astype(np.float64)
        return (
            [float(x) / 255.0 for x in chans.mean(axis=0)],
            [float(x) / 255.0 for x in chans.std(axis=0)],
        )
    if b[:4] == b"RIFF" and len(b) >= 24 and b[8:12] == b"WAVE":
        nch, data_off, data_size, fmt_tag, bits = parse_wav(b)
        if not nch or data_off is None or data_size < 2:
            return (None, None)
        # ADVICE r4: the s16le sample law below is only valid for
        # wFormatTag==1 (PCM) at 16 bits/sample; an 8-bit, float32
        # (tag 3), or ADPCM payload degrades to the placeholder like
        # every other undecodable payload instead of yielding wrong
        # "real" stats.
        if fmt_tag != 1 or bits != 16:
            return (None, None)
        n_samp = data_size // 2
        smp = np.frombuffer(
            b, dtype="<i2", offset=data_off, count=n_samp
        ).astype(np.float64)
        n = (len(smp) // nch) * nch
        if n == 0:
            return (None, None)
        chans = smp[:n].reshape(-1, nch)
        return (
            [float(x) / 32768.0 for x in chans.mean(axis=0)],
            [float(x) / 32768.0 for x in chans.std(axis=0)],
        )
    return (None, None)


def media_feature_from_stats(stats: tuple, b, dim: int = 8) -> list[float]:
    """Feature vector from ALREADY-COMPUTED content stats (the hot
    mapInPandas path decodes each payload exactly once): real per-channel
    mean/std 0.0-padded to ``dim//2`` slots each, or the sha placeholder
    when the payload did not decode."""
    means, stds = stats
    if means is None:
        return content_feature(b, dim)
    half = dim // 2
    m = (means + [0.0] * half)[:half]
    s = (stds + [0.0] * half)[:half]
    return m + s


def media_feature(b, dim: int = 8) -> list[float]:
    """The per-item feature vector: REAL per-channel mean/std for every
    decodable PNG/GIF/BMP/WAV, the sha-derived placeholder otherwise.
    Convenience single-payload form; batch callers use
    media_feature_from_stats to avoid decoding twice."""
    return media_feature_from_stats(media_content_stats(b), b, dim)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the opaque payload column:
    parsed container header fields + byte stats + placeholder embedding.

    Batch shape: the UDF sees an iterator of pandas DataFrames sized by
    spark.sql.execution.arrow.maxRecordsPerBatch; heavy media rows should
    lower that setting and/or pre-repartition by size bucket so one batch
    fits executor memory.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(parse_media_header)
            stats = pdf["payload"].map(media_content_stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": parsed.map(lambda t: t[0]),
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "sha": pdf["payload"].map(
                        lambda b: ""
                        if b is None
                        else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": parsed.map(lambda t: t[1]).astype("Int32"),
                    "height": parsed.map(lambda t: t[2]).astype("Int32"),
                    "channels": parsed.map(lambda t: t[3]).astype("Int32"),
                    # decode once per payload: feat derives from stats
                    "feat": [
                        media_feature_from_stats(t, b)
                        for t, b in zip(stats, pdf["payload"])
                    ],
                    "ch_mean": stats.map(lambda t: t[0]),
                    "ch_std": stats.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts)
    to be decoded downstream -- pure native expressions (sequence +
    explode); the frame decode itself needs a video codec (not shipped)."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


# -- deterministic synthetic payload builders (valid container headers) ----
def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_pixels(pixels, color_type: int = 2) -> bytes:
    """A fully VALID PNG (real CRCs, real zlib IDAT) carrying the given
    (h, w*channels) uint8 pixel array; rows alternate filter 0 (None) and
    filter 2 (Up) so the decoder's unfiltering is exercised."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, stride = px.shape
    nch = _PNG_CHANNELS[color_type]
    w = stride // nch
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    raw = bytearray()
    for y in range(h):
        if y % 2 == 0 or y == 0:
            raw.append(0)
            raw.extend(px[y].tobytes())
        else:
            raw.append(2)
            diff = (px[y].astype(np.int32) - px[y - 1].astype(np.int32)) & 0xFF
            raw.extend(diff.astype(np.uint8).tobytes())
    idat = zlib.compress(bytes(raw))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_png(w: int, h: int, color_type: int, body: bytes) -> bytes:
    return (
        _PNG_SIG
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes([8, color_type, 0, 0, 0])
        + b"\x00\x00\x00\x00"  # placeholder CRC (parser reads offsets only)
        + body
    )


def encode_gif(w: int, h: int, body: bytes) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + bytes([0xF7, 0, 0]) + body


def encode_gif_pixels(indices, palette) -> bytes:
    """A fully VALID GIF89a carrying real indexed pixels: 256-entry global
    color table, one full-frame image, and an LZW stream that emits an
    explicit CLEAR code before every literal -- valid (if inefficient) per
    the spec, accepted by any conformant decoder, and trivially
    bit-packable at a fixed 9-bit width."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)
    min_code, clear, end, nbits = 8, 256, 257, 9
    big, pos = 0, 0
    for v in idx.reshape(-1):
        big |= clear << pos
        pos += nbits
        big |= int(v) << pos
        pos += nbits
    big |= end << pos
    pos += nbits
    data = big.to_bytes((pos + 7) // 8, "little")
    blocks = b"".join(
        bytes([min(255, len(data) - i)]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0xF7, 0, 0])
        + pal.tobytes()
        + b"\x2C"
        + struct.pack("<HHHH", 0, 0, w, h)
        + b"\x00"
        + bytes([min_code])
        + blocks
        + b"\x00"
        + b"\x3B"
    )


def encode_bmp(w: int, h: int, bpp: int, body: bytes) -> bytes:
    # 14-byte file header + full 40-byte BITMAPINFOHEADER (r4 fix: the
    # trailing zero block is 24 bytes -- compression..clrImportant -- so
    # the pixel data really starts at the declared offset 54)
    return (
        b"BM"
        + struct.pack("<I", 54 + len(body))
        + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", w, h)
        + struct.pack("<HH", 1, bpp)
        + b"\x00" * 24
        + body
    )


def encode_wav(
    channels: int, rate: int, data: bytes, junk: bytes | None = None
) -> bytes:
    """WAV encoder. Default layout is canonical: 12-byte RIFF/WAVE header,
    'fmt ' chunk at byte offset 12 (16-byte PCM body), 'data' chunk at
    byte offset 36, samples from byte 44. With ``junk`` a JUNK chunk is
    inserted BEFORE 'fmt ' (the layout real tools emit for alignment),
    shifting every downstream offset -- readable only by a real chunk
    walk. Since r7 the driver oracle (SQL_MULTIMODAL) performs that walk
    via a recursive CTE, byte-for-byte the walk_riff_chunks/parse_wav
    law, so the gate fixture deliberately plants BOTH layouts."""
    chunks = b""
    if junk is not None:
        pad = junk + (b"\x00" if len(junk) % 2 else b"")
        chunks += b"JUNK" + struct.pack("<I", len(junk)) + pad
    chunks += (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, channels)
        + struct.pack("<I", rate)
        + struct.pack("<I", rate * channels * 2)
        + struct.pack("<HH", channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: images are VALID PNG/GIF/BMP
    payloads (random dims, junk bodies), audio is valid WAV, video is an
    opaque payload exercising the unknown-format fallback."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.choice(["image", "audio", "video"])
        junk = bytes(rng.getrandbits(8) for _ in range(rng.randrange(64, 512)))
        # dims >= 64 keep every synthetic BMP's junk body strictly smaller
        # than a full pixel array (row_size*height > 4096 > max body), so
        # the truncated raw-buffer stats law applies uniformly and the
        # DuckDB oracle replays one law; the full-array row-padding path
        # is pytest-covered with a properly sized BMP
        w = rng.randrange(64, 1024)
        h = rng.randrange(64, 1024)
        if kind == "image":
            fmt = rng.choice(["png", "gif", "bmp"])
            if fmt == "png":
                ct = rng.choice([0, 2, 6])
                if i % 2 == 0:
                    # REAL decodable PNG: small dims, seeded pixels, valid
                    # zlib IDAT -- exercises the full decode path
                    w = rng.randrange(4, 24)
                    h = rng.randrange(4, 24)
                    nch = _PNG_CHANNELS[ct]
                    px = [[rng.randrange(256) for _ in range(w * nch)]
                          for _ in range(h)]
                    payload = encode_png_pixels(px, color_type=ct)
                else:
                    # junk IDAT body: exercises the undecodable fallback
                    payload = encode_png(w, h, ct, junk)
                mime = "image/png"
            elif fmt == "gif":
                if i % 2 == 0:
                    # REAL decodable GIF: seeded indices + palette
                    w = rng.randrange(4, 24)
                    h = rng.randrange(4, 24)
                    indices = [[rng.randrange(256) for _ in range(w)]
                               for _ in range(h)]
                    palette = [(rng.randrange(256), rng.randrange(256),
                                rng.randrange(256)) for _ in range(256)]
                    payload = encode_gif_pixels(indices, palette)
                else:
                    payload = encode_gif(w, h, junk)
                mime = "image/gif"
            else:
                payload = encode_bmp(w, h, rng.choice([8, 24, 32]), junk)
                mime = "image/bmp"
            rows.append((i, kind, mime, payload, w, h, None))
        elif kind == "audio":
            # every third audio row carries a JUNK chunk before 'fmt '
            # (r7: the oracle's recursive chunk walk is gate-exercised on
            # non-canonical layouts, not just pytest)
            wav_junk = bytes(rng.getrandbits(8) for _ in range(20)) \
                if i % 3 == 0 else None
            payload = encode_wav(rng.choice([1, 2]), 16000, junk,
                                 junk=wav_junk)
            rows.append((i, kind, "audio/wav", payload, None, None,
                         rng.randrange(1000, 60000)))
        else:
            rows.append((i, kind, "video/mp4", junk, None, None,
                         rng.randrange(1000, 60000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
