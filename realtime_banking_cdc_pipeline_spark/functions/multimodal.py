"""Multimodal column plumbing (SURVEY.md §7 phase 4).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codecs (Pillow/ffmpeg/torchaudio) are not in this container, so
decode is stubbed behind an import-try with a deterministic fallback
feature extractor (byte stats + md5) that exercises the identical path.

At 100 TB: payload columns are huge — keep them out of shuffles. The
pattern below projects (id, payload) into ``mapInPandas``, emits small
feature rows, and joins features back by id if needed; Arrow batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("head_byte", T.IntegerType(), True),
    ]
)


def synthesize_ppm(media_id: int, width: int, height: int) -> bytes:
    """Deterministic P6 PPM payload: byte i of the pixel stream is
    (media_id + i) % 256. Pure bytes — the generative formula is shared
    with the DuckDB oracle, which recomputes the decoded statistics
    analytically (so the decoder below is oracle-verified)."""
    import numpy as np

    header = f"P6\n{width} {height}\n255\n".encode()
    idx = np.arange(width * height * 3, dtype=np.int64)
    return header + ((media_id + idx) % 256).astype(np.uint8).tobytes()


def synthesize_png(media_id: int, width: int, height: int) -> bytes:
    """Deterministic REAL PNG (8-bit RGB, zlib-deflated IDAT, correct
    CRCs): byte i of the raw pixel stream is (media_id + i) % 256 — the
    same generative formula as :func:`synthesize_ppm`, so the DuckDB
    oracle verifies the decode analytically. Row r uses filter type
    r % 5, cycling through ALL five PNG filters (None/Sub/Up/Average/
    Paeth) so every unfilter path in :func:`decode_image` is exercised
    by every image taller than 4 rows."""
    import struct
    import zlib

    import numpy as np

    stride = width * 3
    idx = np.arange(height * stride, dtype=np.int64)
    raw = ((media_id + idx) % 256).astype(np.int64).reshape(height, stride)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        row = raw[r]
        left = np.concatenate([np.zeros(3, dtype=np.int64), row[:-3]])
        upleft = np.concatenate([np.zeros(3, dtype=np.int64), prev[:-3]])
        f = r % 5
        if f == 0:
            filt = row
        elif f == 1:
            filt = (row - left) % 256
        elif f == 2:
            filt = (row - prev) % 256
        elif f == 3:
            filt = (row - (left + prev) // 2) % 256
        else:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (row - pred) % 256
        out += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(payload: bytes) -> "tuple[int, int, bytes]":
    """Parse PNG chunks, inflate IDAT, undo per-row filters; returns
    (width, height, raw RGB bytes). Stdlib zlib covers the codec: PNG's
    only compression is deflate, and the five row filters are exact
    integer arithmetic. Supports the 8-bit-RGB non-interlaced profile
    (color type 2) — others raise."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
        raise NotImplementedError(
            "only 8-bit RGB non-interlaced PNG decodes in-container"
        )
    stream = zlib.decompress(idat)
    stride = w * 3
    if len(stream) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    recon = bytearray()
    prev = bytes(stride)
    for r in range(h):
        f = stream[r * (stride + 1)]
        row = bytearray(stream[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if f == 1:
            for i in range(3, stride):
                row[i] = (row[i] + row[i - 3]) & 0xFF
        elif f == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = row[i - 3] if i >= 3 else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        recon += row
        prev = bytes(row)
    return w, h, bytes(recon)


def synthesize_gif(media_id: int, width: int, height: int) -> bytes:
    """Deterministic REAL GIF87a (256-color global palette, genuine
    variable-width LZW image data): pixel k's palette index is
    (media_id + k) % 256 and palette entry i is
    ((7*i) % 256, (11*i) % 256, (13*i) % 256), so the DuckDB oracle
    recomputes the decoded channel sums analytically. The LZW stream is
    produced by a real greedy longest-match compressor whose code-width
    state machine mirrors the decoder's exactly (the encoder simulates
    the decoder's dictionary growth, which lags the encoder's by one
    entry — the classic GIF width-bump trap), including the 4096-entry
    CLEAR reset, so large images exercise every decoder path."""
    import struct

    header = b"GIF87a" + struct.pack("<HH", width, height) + b"\xf7\x00\x00"
    palette = bytes(
        c
        for i in range(256)
        for c in ((7 * i) % 256, (11 * i) % 256, (13 * i) % 256)
    )
    descriptor = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    indices = bytes(
        (media_id + k) % 256 for k in range(width * height)
    )
    lzw = _gif_lzw_compress(indices, 8)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return header + palette + descriptor + bytes(blocks) + b"\x3b"


class _BitWriter:
    """LSB-first bit packer (the GIF LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif_lzw_compress(indices: bytes, mcs: int) -> bytes:
    """Greedy longest-match GIF LZW. The emitted code width follows the
    DECODER's dictionary size (which lags the encoder's by one entry:
    the decoder creates entry j while reading data code j+1), so both
    sides bump from w to w+1 bits on exactly the same code boundary."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()

    def fresh() -> tuple[dict, int]:
        return {bytes([i]): i for i in range(1 << mcs)}, end + 1

    table, next_code = fresh()
    width = mcs + 1
    sim_next = end + 1  # decoder's dictionary cursor
    first_data = True  # decoder adds nothing on the 1st data code
    bw.write(clear, width)

    def emit_data(code: int) -> None:
        nonlocal sim_next, width, first_data
        bw.write(code, width)
        if first_data:
            first_data = False
            return
        if sim_next < 4096:
            sim_next += 1
            if sim_next == (1 << width) and width < 12:
                width += 1

    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        else:
            bw.write(clear, width)
            table, next_code = fresh()
            width = mcs + 1
            sim_next = end + 1
            first_data = True
        w = bytes([c])
    if w:
        emit_data(table[w])
    bw.write(end, width)
    return bw.flush()


def _gif_lzw_decompress(data: bytes, mcs: int) -> bytes:
    """Full GIF LZW decoder: LSB-first variable-width codes, CLEAR/END
    handling, dictionary growth with the width bump at 2^w, and the
    KwKwK (code == next undefined entry) special case."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    pos = 0  # bit cursor
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        v = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("GIF LZW: code beyond dictionary")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _gif_decode(payload: bytes) -> "tuple[int, int, bytes, bytes]":
    """Parse a GIF87a/89a container: logical screen descriptor, global
    palette, skipped extensions, first image descriptor, LZW image
    data. Returns (width, height, palette_rgb, index_stream)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    _, _, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("GIF trailer before image data")
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    _, _, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
    pos += 10
    if iflags & 0x80:  # local palette overrides
        n = 2 << (iflags & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    if iflags & 0x40:
        raise NotImplementedError("interlaced GIF not decoded in-container")
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        lzw += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    indices = _gif_lzw_decompress(bytes(lzw), mcs)
    if len(indices) != w * h:
        raise ValueError("GIF index stream length mismatch")
    return w, h, palette, indices


def decode_image_rgb(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL image decode for the in-container formats — binary P6 PPM,
    uncompressed 24-bit BMP, 8-bit RGB PNG (stdlib zlib inflates
    IDAT; the five row filters are undone exactly), and 256-color
    GIF87a/89a (a from-scratch variable-width LZW decoder) — parsed
    with stdlib + numpy only (no Pillow in this container). Returns
    ``(width, height, rgb)`` with ``rgb`` shaped ``(h, w, 3)`` int64.
    Formats that genuinely need an external codec (JPEG/WebP/...)
    raise instead of faking."""
    import struct

    import numpy as np

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, palette, indices = _gif_decode(payload)
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        rgb = (
            pal[np.frombuffer(indices, dtype=np.uint8)]
            .astype(np.int64)
            .reshape(h, w, 3)
        )
        return int(w), int(h), rgb
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, raw = _png_unfilter(payload)
        rgb = (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(h, w, 3)
            .astype(np.int64)
        )
        return int(w), int(h), rgb
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB
        fields, pos = [], 2
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, _maxval = fields
        pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        rgb = pix.reshape(h, w, 3).astype(np.int64)
    elif payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if bpp != 24:
            raise NotImplementedError(f"only 24-bit uncompressed BMP ({bpp}bpp)")
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * abs(h), offset=data_off
        ).reshape(abs(h), row_bytes)[:, : w * 3]
        bgr = rows.reshape(abs(h), w, 3)
        if h > 0:  # positive height = bottom-up storage
            bgr = bgr[::-1]
        rgb = bgr[:, :, ::-1].astype(np.int64)
        h = abs(h)
    else:
        raise NotImplementedError(
            "only in-container formats (P6 PPM, 24-bit BMP, 8-bit RGB PNG) "
            "decode here; JPEG/WebP need an image codec library"
        )
    return int(w), int(h), rgb


def decode_image(payload: bytes) -> dict:
    """Decode (any in-container format, :func:`decode_image_rgb`) and
    report width/height/channels plus exact integer per-channel sums."""
    w, h, rgb = decode_image_rgb(payload)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }


def resize_image_box(payload: bytes, factor: int = 2) -> dict:
    """REAL image downsample: decode (:func:`decode_image_rgb`), then a
    ``factor``×``factor`` box filter — each output pixel is the integer
    mean (sum of the block, floor-divided by factor²) of its source
    block, dims must divide evenly (the resize a training pipeline runs
    before feature extraction; bilinear at integer scale IS the box
    filter). Exact integer arithmetic end-to-end, so the DuckDB oracle
    can replay the block sums analytically from the generative pixel
    formula."""
    w, h, rgb = decode_image_rgb(payload)
    if w % factor or h % factor:
        raise ValueError(f"dims {w}x{h} not divisible by {factor}")
    ow, oh = w // factor, h // factor
    blocks = rgb.reshape(oh, factor, ow, factor, 3).sum(axis=(1, 3))
    out = blocks // (factor * factor)
    return {
        "width": w,
        "height": h,
        "out_width": ow,
        "out_height": oh,
        "sum_r": int(out[:, :, 0].sum()),
        "sum_g": int(out[:, :, 1].sum()),
        "sum_b": int(out[:, :, 2].sum()),
    }


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def extract_image_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """Real decode over ``mapInPandas``: payload bytes in (Arrow
    batches), small typed feature rows out — payloads never shuffle.
    Undecodable payloads yield null features rather than failing the
    batch (the production posture for a corrupt-image tail)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                try:
                    f = decode_image(bytes(payload))
                except (NotImplementedError, ValueError, IndexError):
                    f = {}
                for k in ("width", "height", "channels", "sum_r", "sum_g", "sum_b"):
                    out[k].append(f.get(k))
            yield pd.DataFrame(out)

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, IMAGE_FEATURE_SCHEMA
    )


IMAGE_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def extract_image_resize(media: DataFrame, factor: int = 2,
                         id_col: str = "media_id",
                         payload_col: str = "payload") -> DataFrame:
    """Decode + box-downsample over ``mapInPandas`` (Arrow batches,
    payloads never shuffle); undecodable/odd-dim payloads yield null
    features rather than failing the batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_RESIZE_SCHEMA.fields]
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                try:
                    f = resize_image_box(bytes(payload), factor)
                except (NotImplementedError, ValueError, IndexError):
                    f = {}
                for k in cols[1:]:
                    out[k].append(f.get(k))
            yield pd.DataFrame(out)

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, IMAGE_RESIZE_SCHEMA
    )


def extract_binary_features(media: DataFrame, id_col: str = "media_id",
                            payload_col: str = "payload") -> DataFrame:
    """Deterministic per-payload features via ``mapInPandas`` — the same
    batch shape a real decoder would use (payload bytes in, small
    feature rows out, Arrow both ways)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "head_byte": payloads.map(
                        lambda b: b[0] if b else None
                    ),
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio: codec-free 16-bit PCM WAV — real RIFF parse, like the PPM/BMP
# image path (compressed codecs would need libs this container lacks)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def synthesize_wav(media_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit PCM mono WAV: sample i is
    ((media_id·31 + i·7) mod 2001) − 1000 — an integer waveform (no
    libm sine, whose bits differ across engines), shared with the
    DuckDB oracle that recomputes the decoded statistics analytically."""
    import struct

    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((media_id * 31 + i * 7) % 2001 - 1000).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _mulaw_decode_table() -> "np.ndarray":
    """The 256-entry G.711 mu-law byte -> linear PCM table (ITU-T
    G.711 / the classic Sun g711.c expansion): complement the byte,
    rebuild mantissa<<3 + bias, shift by the 3-bit segment, then
    re-apply sign. Pure integer arithmetic, so the DuckDB oracle
    replays the exact same map in SQL."""
    import numpy as np

    u = (~np.arange(256, dtype=np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def synthesize_wav_mulaw(
    media_id: int, n_samples: int, sample_rate: int = 8000
) -> bytes:
    """Deterministic G.711 mu-law mono WAV (format code 7, 8-bit
    samples): encoded byte k is (media_id*13 + k*7) % 256, so the
    oracle can regenerate the byte stream and expand it through the
    same closed-form G.711 map."""
    import struct

    import numpy as np

    k = np.arange(n_samples, dtype=np.int64)
    data = ((media_id * 13 + k * 7) % 256).astype(np.uint8).tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 7, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_audio(payload: bytes) -> dict:
    """REAL WAV decode: RIFF chunk walk, PCM-16 or G.711 mu-law
    (format 7 — expanded through the exact integer G.711 table),
    numpy samples. Exact integer statistics (abs-sum, energy, peak) —
    RMS and dBFS are one engine-side division/log away and carry no
    extra information for the parity check. Compressed audio (MP3/OGG/
    FLAC) raises: it needs codec libraries, honestly absent here."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAVE PCM decodes in-container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format == 7 and bits == 8:
        samples = _mulaw_decode_table()[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    else:
        raise NotImplementedError(
            f"only PCM-16 / mu-law-8 ({audio_format=} {bits=})"
        )
    return {
        "n_samples": int(samples.size) // channels,
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "sum_abs": int(np.abs(samples).sum()),
        "sum_sq": int((samples * samples).sum()),
        "peak": int(np.abs(samples).max()) if samples.size else 0,
    }


def extract_audio_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """Arrow-batched audio feature extraction (mapInPandas): payloads
    stay columnar in their partitions — same shape as the image path."""
    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf[id_col].astype("int64").values)
            yield out

    return media.mapInPandas(op, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: codec-free YUV4MPEG2 (.y4m) — real header+frame parse; frame
# sampling is the training-data op (every k-th frame → features)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sum_y", T.LongType(), True),
        T.StructField("sum_u", T.LongType(), True),
        T.StructField("sum_v", T.LongType(), True),
    ]
)


def synthesize_y4m(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Deterministic YUV4MPEG2 (C420): byte i of frame f's Y plane is
    (media_id + 17·f + 3·i) mod 256; U/V use offsets +101/+202 on the
    same formula. Shared with the analytic oracle."""
    import numpy as np

    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()]
    ysz, csz = width * height, (width // 2) * (height // 2)
    for f in range(n_frames):
        out.append(b"FRAME\n")
        iy = np.arange(ysz, dtype=np.int64)
        ic = np.arange(csz, dtype=np.int64)
        out.append(((media_id + 17 * f + 3 * iy) % 256).astype(np.uint8).tobytes())
        out.append(((media_id + 101 + 17 * f + 3 * ic) % 256).astype(np.uint8).tobytes())
        out.append(((media_id + 202 + 17 * f + 3 * ic) % 256).astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m_frames(payload: bytes, every_kth: int = 1) -> list[dict]:
    """REAL .y4m parse: stream header (W/H/C tags), FRAME-delimited raw
    4:2:0 planes, numpy plane sums for every k-th frame. Compressed
    containers (mp4/webm) raise — they need codec libraries."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "only raw YUV4MPEG2 decodes in-container; mp4/webm need codecs"
        )
    nl = payload.index(b"\n")
    width = height = None
    colorspace = "C420jpeg"
    for tag in payload[:nl].split(b" ")[1:]:
        if tag[:1] == b"W":
            width = int(tag[1:])
        elif tag[:1] == b"H":
            height = int(tag[1:])
        elif tag[:1] == b"C":
            colorspace = tag.decode()
    if width is None or height is None:
        raise ValueError("missing W/H in y4m header")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"only 4:2:0 ({colorspace})")
    ysz, csz = width * height, (width // 2) * (height // 2)
    frame_bytes = ysz + 2 * csz
    pos, idx, out = nl + 1, 0, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # FRAME line (may carry params)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("desynchronized y4m frame marker")
        body = payload[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError(
                f"truncated y4m frame {idx}: {len(body)} of {frame_bytes} bytes"
            )
        if idx % every_kth == 0:
            planes = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
            out.append(
                {
                    "frame_idx": idx,
                    "width": width,
                    "height": height,
                    "sum_y": int(planes[:ysz].sum()),
                    "sum_u": int(planes[ysz : ysz + csz].sum()),
                    "sum_v": int(planes[ysz + csz :].sum()),
                }
            )
        pos = fnl + 1 + frame_bytes
        idx += 1
    return out


def sample_video_frames(media: DataFrame, every_kth: int = 2,
                        id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """Arrow-batched frame sampling: one output row per sampled frame.
    Payloads stay in their partitions; the row multiplier is
    n_frames/k, the intended fan-out."""
    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for feat in decode_y4m_frames(payload, every_kth):
                    rows.append({"media_id": int(mid), **feat})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "sum_y", "sum_u", "sum_v",
                ],
            )

    return media.mapInPandas(op, VIDEO_FRAME_SCHEMA)
