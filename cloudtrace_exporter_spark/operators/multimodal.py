"""Multimodal column handling (SURVEY §2 B36 + driver north_star).

Contract: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, mapInPandas signatures — is real and
tested. Two decode tiers: ``decode_stub_features`` produces deterministic
byte-statistics features (the no-codec fallback), and ``decode_real``
genuinely decodes 24bpp BMP and binary PPM (pure numpy header+pixel
parsing — no codec library needed) with per-channel means and a luma
histogram; JPEG/PNG/video slots take a Pillow/ffmpeg call in the same
mapInPandas shape on a cluster with the libraries installed.

Scale notes: binary payloads dominate row size, so (1) metadata-only
queries must never read the blob column (parquet column pruning does this
when the blob is a separate column — verified in tests via ReadSchema),
(2) mapInPandas processes Arrow batches, and
``spark.sql.files.maxPartitionBytes`` (set in session.py) keeps
blob-heavy scan partitions bounded; for row-group-level control at real
scale, write blobs with small parquet row groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media metadata carried next to every blob column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

#: magic-byte prefixes for format sniffing (public file signatures)
_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "52494646": "wav_or_avi",
    "00000018": "mp4",
    "00000020": "mp4",
}


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesize a deterministic binary payload + metadata
    struct from the documents table (no media fixtures exist in the
    container; UTF-8 bytes stand in for encoded media so the plumbing is
    end-to-end real)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def sniff_format(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte format sniff over the first 4 bytes — built-ins only
    (hex + substring), no blob decode."""
    prefix = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    expr = F.lit("unknown")
    for magic, fmt in _MAGIC.items():
        expr = F.when(prefix.startswith(magic), F.lit(fmt)).otherwise(expr)
    return df.withColumn("sniffed_format", expr)


def decode_stub_features(df: DataFrame, *, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction with a STUBBED decoder.

    Real pipeline shape: Arrow batches in → per-row decode → fixed-size
    feature vector out. The stub derives deterministic pseudo-features
    from byte statistics (so tests can assert exact values); swap
    ``_stub_feature`` for a Pillow/torchvision call on a cluster with the
    libs installed. The UDF touches only (doc_id, payload) — column
    pruning keeps every other column out of the Arrow transfer.
    """

    def _stub_feature(buf: bytes) -> list[float]:
        if not buf:
            return [0.0] * n_features
        # deterministic byte-statistics "embedding" (mean/spread per stride)
        out = []
        for i in range(n_features):
            stride = buf[i::n_features]
            out.append(round(sum(stride) / max(len(stride), 1) / 255.0, 6))
        return out

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_meta"].map(
                        lambda m: m["media_type"] if m is not None else None
                    ),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(_stub_feature),
                }
            )

    return df.select("doc_id", "payload", "media_meta").mapInPandas(_extract, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("format", T.StringType(), True),  # bmp|ppm|unsupported
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("gray_hist", T.ArrayType(T.DoubleType()), True),  # normalized
    ]
)


def _parse_bmp(buf: bytes):
    """24-bit uncompressed (BI_RGB) BMP → (w, h, HxWx3 RGB float array).

    Pure header+pixel math on the public BMP layout (54-byte
    BITMAPINFOHEADER variant): little-endian fields, 4-byte-padded
    bottom-up BGR rows; negative biHeight means top-down. Returns None
    for anything that isn't a decodable 24bpp BI_RGB BMP.
    """
    import numpy as np

    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h_raw = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    h = abs(h_raw)
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    row_bytes = ((w * 3 + 3) // 4) * 4
    if len(buf) < off + row_bytes * h:
        return None
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage → top-down pixels
        bgr = bgr[::-1]
    return w, h, bgr[..., ::-1].astype(np.float64)  # BGR → RGB


def _parse_ppm(buf: bytes):
    """Binary PPM (P6, maxval ≤ 255) → (w, h, HxWx3 RGB float array).

    Netpbm header: ASCII magic + whitespace-separated width/height/maxval
    with '#' comments, then a single whitespace byte and raw RGB triples.
    """
    import numpy as np

    if len(buf) < 2 or buf[:2] != b"P6":
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(buf):
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < len(buf) and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        else:
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            tok = buf[start:pos]
            if not tok.isdigit():
                return None
            fields.append(int(tok))
    if len(fields) < 3 or pos >= len(buf):
        return None
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval <= 255) or len(buf) < pos + w * h * 3:
        return None
    rgb = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)
    return w, h, rgb.astype(np.float64)


def encode_bmp(rgb) -> bytes:
    """HxWx3 RGB uint8 array → 24-bit BI_RGB BMP bytes (the inverse of
    _parse_bmp; used by the synthetic-payload generator and tests)."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_bytes = ((w * 3 + 3) // 4) * 4
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # top-down RGB → bottom-up BGR
    pixel_bytes = padded.tobytes()
    header = (
        b"BM"
        + (54 + len(pixel_bytes)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_bytes).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + pixel_bytes


def _parse_png(buf: bytes):
    """8-bit non-interlaced PNG (grayscale / truecolor / truecolor+alpha)
    → (w, h, HxWx3 RGB float array) — stdlib ``zlib`` + the public PNG
    spec (ISO/IEC 15948 / RFC 2083), no codec library: chunk walk, IDAT
    inflate, and all five scanline filters (None/Sub/Up/Average/Paeth).
    This makes the real-corpus format path executable in codec-less
    environments (round-7 item: PNG is what an actual crawl corpus
    carries; BMP/PPM were the bootstrap). Alpha is dropped, grayscale is
    replicated across channels. Returns None for anything else
    (16-bit, palette, interlaced, truncated, bad zlib) — decode-tolerant
    like the other parsers.
    """
    import zlib

    import numpy as np

    if len(buf) < 8 or buf[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = None
    ctype = None
    idat = b""
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        pos += 12 + ln  # data + length/type/crc
        if typ == b"IHDR":
            if ln != 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, comp, filt, interlace = data[8], data[9], data[10], data[11], data[12]
            if depth != 8 or ctype not in (0, 2, 6) or comp != 0 or filt != 0 or interlace != 0:
                return None
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if not w or not h or ctype is None or not idat:
        return None
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        row = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int32)
        rpos += stride + 1
        if f == 0:
            cur = row
        elif f == 2:  # Up — whole-row vector add
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x by spec
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            return None
        recon[y] = cur.astype(np.uint8)
        prev = cur
    px = recon.reshape(h, w, ch)
    if ch == 1:
        rgb = np.repeat(px, 3, axis=2)
    elif ch == 4:
        rgb = px[..., :3]
    else:
        rgb = px
    return w, h, rgb.astype(np.float64)


def encode_png(rgb, *, filter_mode: str = "none") -> bytes:
    """HxWx3 RGB uint8 array → 8-bit truecolor PNG bytes (stdlib zlib;
    the inverse of _parse_png). ``filter_mode='none'`` writes filter 0
    on every scanline; ``'cycle'`` writes filter y % 5 so one payload
    exercises ALL five unfilter paths — the synthesized fixture uses
    'cycle' precisely so CI decodes every filter, not just the easy one."""
    import zlib

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ch = 3
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    zeros = np.zeros(ch, dtype=np.int32)
    for y in range(h):
        row = rgb[y].reshape(-1).astype(np.int32)
        f = 0 if filter_mode == "none" else y % 5
        a = np.concatenate([zeros, row[:-ch]]) if w * ch > ch else np.zeros_like(row)
        if f == 0:
            filt = row
        elif f == 1:
            filt = (row - a) & 0xFF
        elif f == 2:
            filt = (row - prev) & 0xFF
        elif f == 3:
            filt = (row - ((a + prev) >> 1)) & 0xFF
        else:
            c = np.concatenate([zeros, prev[:-ch]]) if w * ch > ch else np.zeros_like(row)
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            filt = (row - pred) & 0xFF
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = row
    raw = b"".join(lines)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / ISO 10918-1) — pure stdlib + numpy.
#
# Round-8 verdict item #2: the one real-corpus format that never decoded in
# CI (the Pillow path only ever executed its ImportError branch here). This
# is a from-the-spec baseline-sequential decoder — marker walk, DQT/DHT
# parsing, Huffman entropy decode with byte-unstuffing and restart markers,
# EXTEND, dequantize, 8x8 IDCT, chroma upsampling, JFIF YCbCr->RGB — plus a
# deliberately-simple spec-valid encoder so CI can synthesize real JPEG
# bytes without any codec library. Reference fidelity: the CE ``data``
# payload is opaque bytes (/root/reference/pkg/adapter/adapter.go:244);
# format handling is this engine's extension surface (SURVEY B36).
# ---------------------------------------------------------------------------

#: standard Annex-K (Table K.1/K.2) quantization tables, natural order.
_JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32


def _jpeg_zigzag() -> list[int]:
    """Zig-zag scan order (natural index for each zigzag position),
    generated from the diagonal walk so there is no 64-literal to typo."""
    order = []
    for d in range(15):
        rng = range(d + 1)
        for i in (rng if d % 2 else reversed(rng)):
            j = d - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return order


def _jpeg_dct_matrix():
    """Orthonormal 8x8 DCT-II matrix A: coef = A @ block @ A.T and
    block = A.T @ coef @ A (the separable form of the T.81 FDCT/IDCT)."""
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


def _jpeg_scale_qt(base: list[int], quality: int) -> list[int]:
    """libjpeg-style quality scaling of a base table (public formula:
    scale = 5000/q below 50 else 200-2q; entries clamped to [1, 255])."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [min(255, max(1, (v * scale + 50) // 100)) for v in base]


class _JpegBitWriter:
    """MSB-first bit writer with T.81 byte stuffing (FF -> FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def put_marker(self, marker: int) -> None:
        self.align()
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


#: encoder Huffman tables — deliberately simple but fully spec-valid
#: canonical codes: 12 DC categories as 4-bit codes (max code 11 < the
#: all-ones 15); AC = the first 255 (run,size) symbols as 9-bit codes
#: (0..254) plus symbol 255 as the single 10-bit code 510 (a DHT ``bits``
#: count is one byte, so 256-at-one-length is inexpressible; 510 != the
#: all-ones 1023). Compression is mediocre; validity and decoder coverage
#: are the point (the decoder accepts ANY conforming DHT, e.g. the
#: Annex-K tables real encoders emit).
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_ENC_AC_VALS = list(range(256))


def _enc_dc_code(sym: int) -> tuple[int, int]:
    return sym, 4


def _enc_ac_code(sym: int) -> tuple[int, int]:
    return (510, 10) if sym == 255 else (sym, 9)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category ssss, appended bits) for a DC diff / AC coefficient —
    T.81 F.1.2.1: negatives are sent as v + 2^ssss - 1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_quantize(rgb, *, quality: int, subsample: bool, grayscale: bool):
    """Shared encoder front half: RGB -> YCbCr -> padded planes -> FDCT
    -> quantized ZIGZAG coefficient grids. Returns (h, w, samp, qsel,
    mcus_x, mcus_y, coefs) with coefs[ci][gy][gx] a 64-int zigzag list.
    Both the baseline and the progressive encoder emit EXACTLY these
    integers, which is why their decodes are bit-identical."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qt = [
        np.array(_jpeg_scale_qt(_JPEG_QT_LUMA, quality), dtype=np.float64).reshape(8, 8),
        np.array(_jpeg_scale_qt(_JPEG_QT_CHROMA, quality), dtype=np.float64).reshape(8, 8),
    ]
    zz = _jpeg_zigzag()
    A = _jpeg_dct_matrix()

    def pad_to(plane, mh, mw):
        ph = (-plane.shape[0]) % mh or 0
        pw = (-plane.shape[1]) % mw or 0
        return np.pad(plane, ((0, ph), (0, pw)), mode="edge")

    if grayscale:
        planes = [pad_to(y, 8, 8)]
        samp = [(1, 1)]
        qsel = [0]
        mcu_h, mcu_w = 8, 8
    elif subsample:
        ys = pad_to(y, 16, 16)
        ce = pad_to(cb, 16, 16)
        re = pad_to(cr, 16, 16)
        cbs = ce.reshape(ce.shape[0] // 2, 2, ce.shape[1] // 2, 2).mean(axis=(1, 3))
        crs = re.reshape(re.shape[0] // 2, 2, re.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [ys, cbs, crs]
        samp = [(2, 2), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        mcu_h, mcu_w = 16, 16
    else:
        planes = [pad_to(y, 8, 8), pad_to(cb, 8, 8), pad_to(cr, 8, 8)]
        samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        mcu_h, mcu_w = 8, 8

    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w
    coefs = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        grid = []
        for gy in range(mcus_y * vs):
            row = []
            for gx in range(mcus_x * hs):
                block = plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] - 128.0
                qc = np.rint((A @ block @ A.T) / qt[qsel[ci]]).astype(np.int64)
                row.append([int(qc.flat[i]) for i in zz])
            grid.append(row)
        coefs.append(grid)
    return h, w, samp, qsel, mcus_x, mcus_y, coefs


def _jpeg_headers(
    h: int, w: int, samp, qsel, quality: int, sof_marker: int, restart_interval: int
) -> bytearray:
    """Shared encoder header block: SOI, JFIF APP0, DQT, SOFn, the four
    DHT tables, optional DRI — everything up to the first SOS."""
    zz = _jpeg_zigzag()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, base in ((0, _JPEG_QT_LUMA), (1, _JPEG_QT_CHROMA)):
        scaled = _jpeg_scale_qt(base, quality)
        out += seg(0xDB, bytes([tid]) + bytes(scaled[i] for i in zz))
    ncomp = len(samp)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += seg(sof_marker, sof)
    for tclass_tid, bits, vals in (
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
        (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += seg(0xC4, bytes([tclass_tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    return out


def encode_jpeg(
    rgb,
    *,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """HxWx3 RGB uint8 -> baseline JFIF JPEG bytes (pure stdlib+numpy).

    ``subsample=False`` writes 4:4:4 (one block per component per MCU);
    ``subsample=True`` writes 4:2:0 (2x2 Y blocks + box-averaged chroma)
    so the decoder's sampling-factor path executes in CI — the layout
    virtually every crawl-corpus JPEG uses. ``restart_interval=N`` emits
    DRI + RSTn markers every N MCUs (predictor reset + byte alignment),
    exercising the decoder's restart path. ``grayscale=True`` writes a
    single-component (Y-only) stream, the decoder's 1-component branch.
    """
    h, w, samp, qsel, mcus_x, mcus_y, coefs = _jpeg_quantize(
        rgb, quality=quality, subsample=subsample, grayscale=grayscale
    )
    ncomp = len(samp)

    bw = _JpegBitWriter()
    pred = [0] * ncomp
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.put_marker(0xD0 + ((mcu_count // restart_interval - 1) % 8))
                pred = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        seq = coefs[ci][my * vs + by][mx * hs + bx]
                        diff = seq[0] - pred[ci]
                        pred[ci] = seq[0]
                        s, bits = _jpeg_magnitude(diff)
                        bw.put(*_enc_dc_code(s))
                        if s:
                            bw.put(bits, s)
                        run = 0
                        last_nz = max((k for k in range(1, 64) if seq[k]), default=0)
                        for k in range(1, last_nz + 1):
                            if seq[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.put(*_enc_ac_code(0xF0))  # ZRL
                                run -= 16
                            s, bits = _jpeg_magnitude(seq[k])
                            bw.put(*_enc_ac_code((run << 4) | s))
                            bw.put(bits, s)
                            run = 0
                        if last_nz < 63:
                            bw.put(*_enc_ac_code(0x00))  # EOB

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = _jpeg_headers(h, w, samp, qsel, quality, 0xC0, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    rgb,
    *,
    quality: int = 85,
    subsample: bool = False,
    grayscale: bool = False,
    successive: bool = True,
) -> bytes:
    """HxWx3 RGB uint8 -> PROGRESSIVE (SOF2) JFIF JPEG bytes — the scan
    structure most web encoders emit. Shares the exact quantization
    front half with ``encode_jpeg`` (``_jpeg_quantize``), so a
    progressive encoding carries the IDENTICAL quantized coefficients
    as the baseline encoding of the same image — decoding both must be
    bit-identical (the pinned equivalence test).

    ``successive=True`` emits the full Annex-G grammar: a point-
    transformed DC scan (Al=1) + DC refinement, split AC spectral bands
    (1-5, 6-63) first-coded at Al=2 with EOBn end-of-band runs, then two
    refinement rounds per band (Ah=2→Al=1, Ah=1→Al=0) with buffered
    correction bits — every decoder path G.2 defines.
    ``successive=False`` emits spectral selection only (DC, then each
    band once at Al=0)."""
    h, w, samp, qsel, mcus_x, mcus_y, coefs = _jpeg_quantize(
        rgb, quality=quality, subsample=subsample, grayscale=grayscale
    )
    ncomp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    comp_blocks = []  # non-interleaved (cw, ch) per component
    for hs, vs in samp:
        cw = ((w * hs + hmax - 1) // hmax + 7) // 8
        ch = ((h * vs + vmax - 1) // vmax + 7) // 8
        comp_blocks.append((cw, ch))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = _jpeg_headers(h, w, samp, qsel, quality, 0xC2, 0)

    def sos_header(comp_ids, ss, se, ah, al, ac=False):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            ta = (0 if ci == 0 else 1) if ac else 0
            sos += bytes([ci + 1, (td << 4) | ta])
        return seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))

    def dc_first(al):
        bw = _JpegBitWriter()
        pred = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            dcv = coefs[ci][my * vs + by][mx * hs + bx][0] >> al
                            diff = dcv - pred[ci]
                            pred[ci] = dcv
                            s, bits = _jpeg_magnitude(diff)
                            bw.put(*_enc_dc_code(s))
                            if s:
                                bw.put(bits, s)
        return bw.flush()

    def dc_refine(al):
        bw = _JpegBitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            bw.put((coefs[ci][my * vs + by][mx * hs + bx][0] >> al) & 1, 1)
        return bw.flush()

    def ac_first(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                bw.put(*_enc_ac_code(nbits << 4))
                if nbits:
                    bw.put(eobrun - (1 << nbits), nbits)
                eobrun = 0

        cw, chh = comp_blocks[ci]
        for gy in range(chh):
            for gx in range(cw):
                seq = coefs[ci][gy][gx]
                # AC point transform: divide by 2^Al truncating TOWARD
                # ZERO (G.1.2.2) — not an arithmetic shift
                tv = [
                    (abs(seq[k]) >> al) * (1 if seq[k] >= 0 else -1)
                    for k in range(ss, se + 1)
                ]
                last = max((i for i, t in enumerate(tv) if t), default=-1)
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(last + 1):
                    if tv[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        bw.put(*_enc_ac_code(0xF0))
                        run -= 16
                    s, bits = _jpeg_magnitude(tv[i])
                    bw.put(*_enc_ac_code((run << 4) | s))
                    bw.put(bits, s)
                    run = 0
                if last < se - ss:
                    eobrun = 1
        flush_eob()
        return bw.flush()

    def ac_refine(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0
        pend: list[int] = []  # correction bits owed after the next EOBn

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                nbits = eobrun.bit_length() - 1
                bw.put(*_enc_ac_code(nbits << 4))
                if nbits:
                    bw.put(eobrun - (1 << nbits), nbits)
                for b in pend:
                    bw.put(b, 1)
                pend = []
                eobrun = 0

        cw, chh = comp_blocks[ci]
        for gy in range(chh):
            for gx in range(cw):
                seq = coefs[ci][gy][gx]
                t = [abs(seq[k]) >> al for k in range(ss, se + 1)]
                last_new = max((i for i, v in enumerate(t) if v == 1), default=-1)
                if last_new < 0:
                    # whole band joins the EOB run; its already-nonzero
                    # coefficients owe correction bits after the EOBn
                    eobrun += 1
                    pend.extend(v & 1 for v in t if v > 1)
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                held: list[int] = []  # corrections crossed since last symbol
                for i in range(last_new + 1):
                    if t[i] == 0:
                        run += 1
                        continue
                    # flush ZRLs at EVERY nonzero position (t>1 too, the
                    # libjpeg loop shape): a correction bit buffered
                    # across a >15-zero gap would be emitted behind the
                    # ZRL whose 16-zero span ends BEFORE its position,
                    # desyncing the decoder's crossing order (found by
                    # the id-gradient fixture, doc 1000)
                    while run > 15:
                        bw.put(*_enc_ac_code(0xF0))
                        for b in held:
                            bw.put(b, 1)
                        held = []
                        run -= 16
                    if t[i] > 1:
                        held.append(t[i] & 1)
                        continue
                    bw.put(*_enc_ac_code((run << 4) | 1))
                    bw.put(1 if seq[ss + i] > 0 else 0, 1)
                    for b in held:
                        bw.put(b, 1)
                    held = []
                    run = 0
                # the tail past the last newly-visible coefficient joins
                # the EOB run (held is empty here: every crossed t>1 bit
                # was emitted with the final symbol)
                if last_new < se - ss:
                    eobrun = 1
                    pend.extend(t[i] & 1 for i in range(last_new + 1, len(t)) if t[i] > 1)
        flush_eob()
        return bw.flush()

    all_comps = list(range(ncomp))
    bands = [(1, 5), (6, 63)]
    if successive:
        out += sos_header(all_comps, 0, 0, 0, 1) + dc_first(1)
        for ci in all_comps:
            for ss, se in bands:
                out += sos_header([ci], ss, se, 0, 2, ac=True) + ac_first(ci, ss, se, 2)
        for ah, al in ((2, 1), (1, 0)):
            for ci in all_comps:
                for ss, se in bands:
                    out += sos_header([ci], ss, se, ah, al, ac=True) + ac_refine(
                        ci, ss, se, al
                    )
        out += sos_header(all_comps, 0, 0, 1, 0) + dc_refine(0)
    else:
        out += sos_header(all_comps, 0, 0, 0, 0) + dc_first(0)
        for ci in all_comps:
            for ss, se in bands:
                out += sos_header([ci], ss, se, 0, 0, ac=True) + ac_first(ci, ss, se, 0)
    out += b"\xff\xd9"
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with byte unstuffing;
    stops at any non-RST marker; RST markers are consumed by reset()."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.pos >= len(self.buf):
            return False
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                return False
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                self.marker = nxt
                return False  # restart marker pending — reset() consumes it
            else:
                self.marker = nxt
                return False  # end of scan
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_bit(self) -> int | None:
        return self.read(1)

    def reset(self) -> bool:
        """Byte-align (discard pad bits) and consume the RSTn marker —
        either one a _fill already peeked, or the one sitting at pos
        (predictors are reset by the caller)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None:
            if not (0xD0 <= self.marker <= 0xD7):
                return False
            self.pos += 2
            self.marker = None
            return True
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


def _jpeg_huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical (length, code) -> symbol map from a DHT segment."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _jpeg_decode_sym(br: _JpegBitReader, lut: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = br.read_bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _jpeg_geometry(w: int, h: int, comps: list[tuple[int, int, int, int]]):
    """Shared frame geometry: (hmax, vmax, mcus_x, mcus_y, per-component
    [grid_w, grid_h, comp_w_blocks, comp_h_blocks]). The MCU-padded grid
    (grid_*) is what interleaved scans cover; non-interleaved scans
    cover only the ceil-dims block counts (comp_*_blocks) — T.81 A.2.4
    (the two differ when the MCU grid overshoots, e.g. a 17-px-wide
    4:2:0 luma: 4 grid columns, 3 data columns)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for _, hs, vs, _ in comps:
        cw = (w * hs + hmax - 1) // hmax  # component pixel width
        ch = (h * vs + vmax - 1) // vmax
        geo.append(
            (mcus_x * hs, mcus_y * vs, (cw + 7) // 8, (ch + 7) // 8)
        )
    return hmax, vmax, mcus_x, mcus_y, geo


def _jpeg_scan_baseline(br, comps, scan, huff, coefs, geom, restart, zz):
    """One baseline (sequential DCT) scan: interleaved MCU order, DC
    diff + AC run-length per block, RAW quantized ints accumulated into
    ``coefs`` (dequantization happens once at IDCT time, shared with the
    progressive path)."""
    hmax, vmax, mcus_x, mcus_y, geo = geom
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                if not br.reset():
                    return False
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, td, ta in scan:
                _, hs, vs, _ = comps[ci]
                dc_lut = huff.get((0, td))
                ac_lut = huff.get((1, ta))
                if dc_lut is None or ac_lut is None:
                    return False
                for by in range(vs):
                    for bx in range(hs):
                        blk = coefs[ci][my * vs + by][mx * hs + bx]
                        s = _jpeg_decode_sym(br, dc_lut)
                        if s is None or s > 11:
                            return False
                        diff = 0
                        if s:
                            v = br.read(s)
                            if v is None:
                                return False
                            diff = _jpeg_extend(v, s)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_sym(br, ac_lut)
                            if rs is None:
                                return False
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return False
                            v = br.read(sz)
                            if v is None:
                                return False
                            blk[zz[k]] = _jpeg_extend(v, sz)
                            k += 1
    return True


def _jpeg_scan_prog_dc(br, comps, scan, huff, coefs, geom, restart, ah, al):
    """Progressive DC scan (Ss=Se=0) — first pass (Ah=0: DC diffs,
    shifted left by Al) or refinement (Ah>0: one bit per block adding
    the 1<<Al term). Interleaved when the scan carries >1 component,
    else the component's own non-interleaved block raster (T.81 G.2)."""
    hmax, vmax, mcus_x, mcus_y, geo = geom
    pred = [0] * len(comps)
    units = []  # flattened block sequence: (ci, gy, gx) per data unit
    if len(scan) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, _, _ in scan:
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            units.append((ci, my * vs + by, mx * hs + bx))
        per_restart = len(scan) and restart  # restart counts MCUs
        mcu_size = sum(comps[ci][1] * comps[ci][2] for ci, _, _ in scan)
    else:
        ci = scan[0][0]
        _, _, cw, chh = geo[ci]
        for gy in range(chh):
            for gx in range(cw):
                units.append((ci, gy, gx))
        per_restart = restart
        mcu_size = 1
    luts = {}
    for ci, td, _ in scan:
        if ah == 0:
            lut = huff.get((0, td))
            if lut is None:
                return False
            luts[ci] = lut
    done = 0
    for ci, gy, gx in units:
        if per_restart and done and done % (per_restart * mcu_size) == 0:
            if not br.reset():
                return False
            pred = [0] * len(comps)
        done += 1
        blk = coefs[ci][gy][gx]
        if ah == 0:
            s = _jpeg_decode_sym(br, luts[ci])
            if s is None or s > 11:
                return False
            diff = 0
            if s:
                v = br.read(s)
                if v is None:
                    return False
                diff = _jpeg_extend(v, s)
            pred[ci] += diff
            blk[0] = pred[ci] << al
        else:
            bit = br.read(1)
            if bit is None:
                return False
            if bit:
                blk[0] |= 1 << al
    return True


def _jpeg_scan_prog_ac(br, comps, scan, huff, coefs, geom, restart, ss, se, ah, al, zz):
    """Progressive AC scan — spectral band [Ss, Se] of ONE component
    (T.81 G.1.1.1 forbids interleaved AC scans). First pass (Ah=0):
    run/size symbols with EOBn end-of-band runs, values shifted by Al.
    Refinement (Ah>0): one new-coefficient magnitude bit per symbol plus
    in-path correction bits for every already-nonzero coefficient the
    run crosses — including inside EOB runs (the G.2 algorithm, same
    control flow as the public libjpeg/T.81 flowcharts)."""
    if len(scan) != 1:
        return False
    ci, _, ta = scan[0]
    ac_lut = huff.get((1, ta))
    if ac_lut is None:
        return False
    _, _, cw, chh = geom[4][ci]
    eobrun = 0
    done = 0
    for gy in range(chh):
        for gx in range(cw):
            if restart and done and done % restart == 0:
                if not br.reset():
                    return False
                eobrun = 0
            done += 1
            blk = coefs[ci][gy][gx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _jpeg_decode_sym(br, ac_lut)
                    if rs is None:
                        return False
                    r, sz = rs >> 4, rs & 0x0F
                    if sz == 0:
                        if r < 15:
                            ext = br.read(r) if r else 0
                            if ext is None:
                                return False
                            eobrun = (1 << r) + ext - 1  # current block ends
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        return False
                    v = br.read(sz)
                    if v is None:
                        return False
                    blk[zz[k]] = _jpeg_extend(v, sz) << al
                    k += 1
            else:
                p1, m1 = 1 << al, -1 << al

                def _refine(b):
                    bit = br.read(1)
                    if bit is None:
                        return False
                    if bit and not (b[0] & p1 if b[0] > 0 else (-b[0]) & p1):
                        b[0] += p1 if b[0] > 0 else m1
                    return True

                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _jpeg_decode_sym(br, ac_lut)
                        if rs is None:
                            return False
                        r, sz = rs >> 4, rs & 0x0F
                        newval = 0
                        if sz == 0:
                            if r < 15:
                                ext = br.read(r) if r else 0
                                if ext is None:
                                    return False
                                eobrun = (1 << r) + ext
                                break  # remaining coeffs handled below
                        else:
                            if sz != 1:
                                return False
                            bit = br.read(1)
                            if bit is None:
                                return False
                            newval = p1 if bit else m1
                        # advance over r zero-history positions, refining
                        # every nonzero-history coefficient on the way
                        while k <= se:
                            idx = zz[k]
                            if blk[idx] != 0:
                                hold = [blk[idx]]
                                if not _refine(hold):
                                    return False
                                blk[idx] = hold[0]
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[zz[k]] = newval
                        k += 1
                if eobrun > 0:
                    # EOB run covers the REST of this block's band too:
                    # correction bits for its nonzero coefficients
                    while k <= se:
                        idx = zz[k]
                        if blk[idx] != 0:
                            hold = [blk[idx]]
                            if not _refine(hold):
                                return False
                            blk[idx] = hold[0]
                        k += 1
                    eobrun -= 1
    return True


def _parse_jpeg(buf: bytes):
    """Baseline-sequential (SOF0/1) AND progressive (SOF2) JPEG ->
    (w, h, HxWx3 RGB float array), or None for anything this decoder
    doesn't cover (arithmetic coding, 12-bit precision, truncated or
    corrupt streams) — decode-tolerant like the other parsers. Handles
    grayscale and 3-component YCbCr with h,v sampling factors in {1,2}
    (4:4:4, 4:2:2, 4:2:0), 8- and 16-bit DQT entries, multi-table DHT
    segments (including between progressive scans), DRI/RSTn restart
    intervals, and the full progressive scan grammar: interleaved and
    single-component DC first/refinement, per-component AC spectral
    bands with EOBn runs, and AC successive-approximation refinement
    with in-run correction bits (T.81 Annex G). Architecture: every
    scan accumulates RAW quantized coefficients into per-component
    full-frame block arrays; dequantization + the separable orthonormal
    IDCT run once at the end — which is also why baseline and
    progressive encodings of the same quantized coefficients decode to
    BIT-IDENTICAL pixels (pinned in tests). Pure stdlib + numpy from
    the public T.81 spec."""
    import numpy as np

    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    zz = _jpeg_zigzag()
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, qsel)
    restart = 0
    pos = 2
    progressive = False
    coefs = None  # per comp: grid_h x grid_w list of length-64 int lists
    geom = None
    scans_done = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(buf):
            return None
        ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        seg = buf[pos + 4 : pos + 2 + ln]
        if len(seg) != ln - 2:
            return None
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(seg):
                    return None
                if pq:
                    vals = [
                        int.from_bytes(seg[i + 2 * k : i + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                else:
                    vals = list(seg[i : i + 64])
                i += n
                nat = [0] * 64
                for k in range(64):
                    nat[zz[k]] = vals[k]
                qt[tid] = nat
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, q = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    return None
                comps.append((cid, hs, vs, q))
            # Untrusted-header guard (decode_real is the real-corpus
            # path): a ~200-byte crafted stream can declare 65535x65535x3
            # in its SOF and trigger a ~100 GB plane allocation before
            # any entropy data is read. Information bound: every MCU
            # costs >= 2 Huffman symbols per component (DC + EOB), so
            # len(buf) bytes cannot legitimately encode more than a few
            # thousand pixels per payload byte — reject far past that,
            # plus an absolute cap (mirrors _parse_bmp's payload-vs-dims
            # length check).
            if w == 0 or h == 0 or w * h > 2**24 or w * h > 4096 * len(buf):
                return None
            geom = _jpeg_geometry(w, h, comps)
            coefs = [
                [[[0] * 64 for _ in range(gw)] for _ in range(gh)]
                for gw, gh, _, _ in geom[4]
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / differential
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) != n:
                    return None
                huff[(tclass, tid)] = _jpeg_huff_lookup(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: decode one scan, then keep walking
            if coefs is None:
                return None
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                return None
            scan = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next((k for k, cc in enumerate(comps) if cc[0] == cid), None)
                if idx is None:
                    return None
                scan.append((idx, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            br = _JpegBitReader(buf, pos)
            if not progressive:
                if ss != 0 or se != 63 or ah or al:
                    return None
                ok = _jpeg_scan_baseline(br, comps, scan, huff, coefs, geom, restart, zz)
            elif ss == 0:
                if se != 0:
                    return None
                ok = _jpeg_scan_prog_dc(br, comps, scan, huff, coefs, geom, restart, ah, al)
            else:
                if se > 63 or ss > se:
                    return None
                ok = _jpeg_scan_prog_ac(
                    br, comps, scan, huff, coefs, geom, restart, ss, se, ah, al, zz
                )
            if not ok:
                return None
            scans_done += 1
            pos = br.pos
            if not progressive:
                break  # single-scan stream: tolerate trailing bytes
        # APPn / COM / anything else: skipped via the length walk
    if coefs is None or scans_done == 0:
        return None

    hmax, vmax, mcus_x, mcus_y, geo = geom
    A = _jpeg_dct_matrix()
    planes = []
    for ci, (_, hs, vs, q) in enumerate(comps):
        qtab = qt.get(q)
        if qtab is None:
            return None
        gw, gh, _, _ = geo[ci]
        plane = np.zeros((gh * 8, gw * 8), dtype=np.float64)
        qarr = np.array(qtab, dtype=np.float64)
        for gy in range(gh):
            for gx in range(gw):
                coef = np.array(coefs[ci][gy][gx], dtype=np.float64) * qarr
                plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = (
                    A.T @ coef.reshape(8, 8) @ A + 128.0
                )
        if hs < hmax or vs < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        yp = np.clip(planes[0], 0, 255)
        rgb = np.stack([yp, yp, yp], axis=-1)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    return w, h, rgb


def synthesize_jpeg_payload(
    df: DataFrame, *, width: int = 16, height: int = 16, quality: int = 95
) -> DataFrame:
    """Deterministic JPEG payload per doc_id — the SAME id-keyed RGB
    gradient as the BMP/PNG twins, so cross-format decode parity is
    testable (JPEG is lossy: parity is within a quantization tolerance,
    not bit-exact). Every third doc is written 4:2:0 so the decoder's
    subsampled MCU path executes in CI alongside 4:4:4, and every FIFTH
    doc is written PROGRESSIVE (SOF2, full successive-approximation
    scan script) so the Annex-G decode paths run in the registered
    query — a progressive encoding of the same quantized coefficients
    decodes bit-identically to the baseline one (pinned in tests), so
    the query's stats_agree certificate covers both entropy layouts."""
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id)
                rgb = np.stack(
                    [(xx * 7 + k) % 256, (yy * 11 + 3 * k) % 256, (xx + yy + 5 * k) % 256],
                    axis=-1,
                ).astype(np.uint8)
                enc = encode_jpeg_progressive if k % 5 == 0 else encode_jpeg
                payloads.append(
                    enc(rgb, quality=quality, subsample=(k % 3 == 0))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(_gen, schema)


def has_pillow() -> bool:
    """True when the optional Pillow codec library is importable — the
    env gate for decode_pillow (this container ships without it; a real
    cluster image installs it for JPEG/PNG corpora)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pixel_stats(doc_id, fmt, w, h, rgb, hist_bins):
    """Shared statistics tail of every image decoder (hand-rolled and
    Pillow-backed): per-channel means, ITU-R 601 luma histogram — one
    arithmetic path so the parity test compares decoders, not float
    formulas."""
    import numpy as np

    means = rgb.reshape(-1, 3).mean(axis=0)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    hist, _ = np.histogram(luma, bins=hist_bins, range=(0.0, 256.0))
    n = w * h
    return (
        doc_id, fmt, w, h, n,
        round(float(means[0]), 6), round(float(means[1]), 6), round(float(means[2]), 6),
        [round(float(x) / n, 6) for x in hist],
    )


def decode_pillow(df: DataFrame, *, hist_bins: int = 8) -> DataFrame:
    """ENV-GATED real-codec decode: the identical mapInPandas contract,
    DECODED_SCHEMA, and statistics tail as decode_real, with Pillow
    doing the image parse — this is the JPEG/PNG/TIFF path a real
    corpus needs (the hand-rolled BMP/PPM parsers below exist because
    this container ships no codec libraries). Raises ImportError at
    plan-build time on the driver when Pillow is absent — never
    per-task mid-job. Parity with the hand-rolled pipeline is pinned by
    tests/test_llm_ops.py on synthesized BMP payloads whenever the
    library is present.
    """
    if not has_pillow():
        raise ImportError(
            "decode_pillow requires Pillow (pip install Pillow); in codec-less "
            "environments use decode_real, whose BMP/PPM parsers are pure Python"
        )

    def _decode_one(doc_id, buf):
        import io

        import numpy as np
        from PIL import Image

        if not buf:
            return (doc_id, "unsupported", None, None, None, None, None, None, None)
        try:
            img = Image.open(io.BytesIO(buf))
            fmt = (img.format or "unknown").lower()
            rgb = np.asarray(img.convert("RGB"), dtype=np.float64)
        except Exception:
            return (doc_id, "unsupported", None, None, None, None, None, None, None)
        h, w = rgb.shape[:2]
        return _pixel_stats(doc_id, fmt, w, h, rgb, hist_bins)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _decode_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(_extract, DECODED_SCHEMA)


def decode_real(df: DataFrame, *, hist_bins: int = 8) -> DataFrame:
    """REAL (non-stub) decode: pure-Python/numpy BMP (24bpp BI_RGB),
    binary PPM (P6), and 8-bit PNG (stdlib zlib, all five scanline
    filters) decoders — header parse + pixel statistics, no codec
    libraries. Rows whose payload is none of these come back with
    ``format='unsupported'`` and null stats (decode-tolerant, like every
    ingest pipeline must be). Per-channel means, pixel counts, and a
    normalized ``hist_bins``-bin luma histogram (ITU-R 601 weights) out;
    Arrow-batched via mapInPandas, vectorized numpy per image.

    For JPEG/video, swap in Pillow/ffmpeg calls (decode_pillow is the
    env-gated JPEG path) — the Spark contract (schema, batching, column
    pruning) is unchanged.
    """
    import numpy as np

    def _decode_one(doc_id, buf):
        parsed = _parse_bmp(buf) if buf else None
        fmt = "bmp" if parsed else None
        if parsed is None and buf:
            parsed = _parse_ppm(buf)
            fmt = "ppm" if parsed else None
        if parsed is None and buf:
            parsed = _parse_png(buf)
            fmt = "png" if parsed else None
        if parsed is None and buf:
            parsed = _parse_jpeg(buf)
            fmt = "jpeg" if parsed else None
        if parsed is None:
            return (doc_id, "unsupported", None, None, None, None, None, None, None)
        w, h, rgb = parsed
        return _pixel_stats(doc_id, fmt, w, h, rgb, hist_bins)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _decode_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(_extract, DECODED_SCHEMA)


def synthesize_bmp_payload(df: DataFrame, *, width: int = 16, height: int = 16) -> DataFrame:
    """Deterministic BMP payload per doc_id (gradient keyed by the id) —
    the fixture adapter that lets the real decoder run end-to-end in an
    environment with no media files. Arrow-batched; payload is a genuine
    24bpp BMP that any external viewer would open."""
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id)
                rgb = np.stack(
                    [(xx * 7 + k) % 256, (yy * 11 + 3 * k) % 256, (xx + yy + 5 * k) % 256],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_bmp(rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(_gen, schema)


def synthesize_png_payload(df: DataFrame, *, width: int = 16, height: int = 16) -> DataFrame:
    """Deterministic PNG payload per doc_id — the SAME id-keyed RGB
    gradient as synthesize_bmp_payload, encoded as a real 8-bit
    truecolor PNG with ``filter_mode='cycle'`` so every scanline-filter
    path (None/Sub/Up/Average/Paeth) executes in CI. Because the pixel
    content is identical to the BMP twin, decode parity across formats
    is testable end-to-end."""
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id)
                rgb = np.stack(
                    [(xx * 7 + k) % 256, (yy * 11 + 3 * k) % 256, (xx + yy + 5 * k) % 256],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_png(rgb, filter_mode="cycle"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(_gen, schema)


def resize_stub(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stub: updates metadata (the real op would transform bytes).
    Kept as a narrow column op so pipelines can chain it today."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.media_type").alias("media_type"),
            F.col("media_meta.format").alias("format"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("media_meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_stub(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub for video rows: explodes deterministic frame
    offsets from duration metadata (real impl would emit one blob per
    frame via mapInPandas). Demonstrates the explode/partitioning shape:
    output rows ≈ duration/every_ms × input rows — repartition after."""
    n_frames = F.greatest(
        (F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    return df.withColumn(
        "frame_offset_ms",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)),
    )


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),  # over [-1, 1) samples
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_cross_rate", T.DoubleType(), True),
    ]
)


def _parse_wav(buf: bytes):
    """Canonical RIFF/WAVE PCM16 → (n_channels, sample_rate, frames×ch
    int16 array). Pure chunk-walk over the public RIFF layout ("fmt "
    must be audio_format=1, 16-bit; "data" carries raw little-endian
    samples). Returns None for anything else — decode-tolerant like
    _parse_bmp."""
    import numpy as np

    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = (
                int.from_bytes(body[0:2], "little"),  # audio_format
                int.from_bytes(body[2:4], "little"),  # n_channels
                int.from_bytes(body[4:8], "little"),  # sample_rate
                int.from_bytes(body[14:16], "little"),  # bits_per_sample
            )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, n_ch, rate, bits = fmt
    if audio_format != 1 or bits != 16 or n_ch <= 0 or rate <= 0:
        return None
    n = len(data) // (2 * n_ch)
    if n == 0:
        return None
    samples = np.frombuffer(data, dtype="<i2", count=n * n_ch).reshape(n, n_ch)
    return n_ch, rate, samples


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """frames×ch int16 array → canonical PCM16 WAV bytes (the inverse of
    _parse_wav; fixture generator + roundtrip tests)."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, n_ch = s.shape
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * n_ch * 2).to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (len(body)).to_bytes(4, "little") + body


def synthesize_wav_payload(df: DataFrame, *, sample_rate: int = 8000, n_frames: int = 800) -> DataFrame:
    """Deterministic PCM16 payload per doc_id (sine whose frequency and
    amplitude key off the id) — the audio twin of synthesize_bmp_payload:
    a genuine WAV any player would open, generated in-environment."""
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_frames, dtype=np.float64)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id)
                freq = 100.0 + (k % 40) * 25.0
                amp = 8000.0 + (k % 7) * 3000.0
                wave = (amp * np.sin(2.0 * np.pi * freq * t / sample_rate)).astype("<i2")
                payloads.append(encode_wav(wave, sample_rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(_gen, schema)


def decode_audio_real(df: DataFrame) -> DataFrame:
    """REAL audio decode: RIFF/WAVE PCM16 chunk-walk + sample statistics
    (duration, RMS / peak over [-1,1)-normalized samples, zero-crossing
    rate — the standard cheap audio-quality features), no codec
    libraries. Non-WAV payloads come back ``format='unsupported'`` with
    null stats. Arrow-batched mapInPandas, vectorized numpy per clip —
    the same Spark contract as decode_real; swap the parser for
    ffmpeg/soundfile for compressed codecs."""
    import numpy as np

    def _decode_one(doc_id, buf):
        parsed = _parse_wav(buf) if buf else None
        if parsed is None:
            return (doc_id, "unsupported", None, None, None, None, None, None, None)
        n_ch, rate, samples = parsed
        x = samples.astype(np.float64) / 32768.0
        mono = x.mean(axis=1)
        n = samples.shape[0]
        zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
        return (
            doc_id, "wav", n_ch, rate, n, n * 1000 // rate,
            round(float(np.sqrt((x * x).mean())), 6),
            round(float(np.abs(x).max()), 6),
            round(zc, 6),
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_DECODED_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _decode_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(_extract, AUDIO_DECODED_SCHEMA)


def resize_real(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """REAL image resize (nearest-neighbor) over decodable payloads:
    parse (BMP/PPM), index-map resample in numpy, re-encode as BMP —
    byte-in/byte-out like a production thumbnailing stage, retiring
    resize_stub for the decodable formats. Undecodable payloads pass
    through with ``resized=NULL`` (decode-tolerant). Arrow-batched
    mapInPandas; swap the parser/encoder pair for Pillow to cover
    compressed codecs — the Spark contract is unchanged."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def _resize_one(doc_id, buf):
        parsed = _parse_bmp(buf) if buf else None
        fmt = "bmp" if parsed else None
        if parsed is None and buf:
            parsed = _parse_ppm(buf)
            fmt = "ppm" if parsed else None
        if parsed is None:
            return (doc_id, "unsupported", None, None, None)
        w, h, rgb = parsed
        yi = (np.arange(height) * h) // height
        xi = (np.arange(width) * w) // width
        out = rgb[yi][:, xi].astype(np.uint8)
        return (doc_id, fmt, width, height, encode_bmp(out))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = [
                _resize_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(_run, schema)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _block_mean(gray, out_h: int, out_w: int):
    """Exact block-mean downsample with floor-edge bins — deterministic
    for any input size (no interpolation kernel to disagree about)."""
    import numpy as np

    h, w = gray.shape
    ye = [(i * h) // out_h for i in range(out_h)] + [h]
    xe = [(j * w) // out_w for j in range(out_w)] + [w]
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = gray[ye[i]: ye[i + 1], xe[j]: xe[j + 1]].mean()
    return out


def perceptual_hash(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """Perceptual image fingerprints: aHash (8×8 block-mean grid
    thresholded at its mean) and dHash (horizontal gradient signs over
    an 8×9 grid) as 64-bit integers — the visual near-duplicate
    primitive (re-encoded, resized, or slightly-edited images keep
    nearly identical hashes; MinHash-for-pixels). Decodes with the same
    pure-Python BMP/PPM parsers as decode_real and the same ITU-R 601
    luma — swap in Pillow for JPEG/PNG corpora, the hash math is
    decoder-independent.

    Scale shape: one Arrow-batched mapInPandas narrow map, zero
    shuffles; 64-bit outputs travel instead of pixels (the PQ
    bytes-shrinking argument). Rows-only by design (Python-side
    decode), like every multimodal path; the near-dup JOIN over these
    hashes is engine-checkable and tested with planted perturbations.
    """
    import numpy as np

    def _hash_one(doc_id, buf):
        parsed = _parse_bmp(buf) if buf else None
        fmt = "bmp" if parsed else None
        if parsed is None and buf:
            parsed = _parse_ppm(buf)
            fmt = "ppm" if parsed else None
        if parsed is None:
            return (doc_id, "unsupported", None, None)
        _w, _h, rgb = parsed
        luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        g8 = _block_mean(luma, 8, 8)
        m = g8.mean()
        abits = 0
        for i, v in enumerate(g8.ravel()):
            if v > m:
                abits |= 1 << i
        g9 = _block_mean(luma, 8, 9)
        dbits = 0
        for r in range(8):
            for c in range(8):
                if g9[r, c] < g9[r, c + 1]:
                    dbits |= 1 << (r * 8 + c)
        return (doc_id, fmt, _to_signed64(abits), _to_signed64(dbits))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PHASH_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _hash_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf[payload_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", F.col(payload_col).alias(payload_col)).mapInPandas(
        _run, PHASH_SCHEMA
    )


def _phash_bands(
    hashes: DataFrame, *, max_hamming: int, hash_col: str
) -> DataFrame:
    """Pigeonhole band table of a 64-bit perceptual-hash frame — one row
    per (doc, band) with the band's bit slice as the join key; any pair
    within ``max_hamming`` agrees exactly on ≥1 of the max_hamming+1
    bands. Shared by the self-join (phash_near_dups), the cross-frame
    probe (phash_dedup_incremental), and the streaming tier."""
    nb = max_hamming + 1
    offs = [(i * 64) // nb for i in range(nb)] + [64]
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        "doc_id", F.col(hash_col).alias("__h")
    )
    bands = []
    for i in range(nb):
        width = offs[i + 1] - offs[i]
        mask = (1 << width) - 1
        bands.append(
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"shiftrightunsigned(__h, {offs[i]})").bitwiseAND(
                    F.lit(mask)
                ).alias("key"),
            )
        )
    return h.select("doc_id", "__h", F.explode(F.array(*bands)).alias("b")).select(
        "doc_id", "__h", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )


def phash_near_dups(
    hashes: DataFrame, *, max_hamming: int = 4, hash_col: str = "ahash"
) -> DataFrame:
    """Visual near-duplicate pairs from perceptual hashes: all (a, b)
    with Hamming(hash_a, hash_b) ≤ ``max_hamming`` — WITHOUT the n²
    comparison. The 64-bit hash splits into ``max_hamming + 1`` bit
    bands; pigeonhole guarantees any qualifying pair agrees EXACTLY on
    at least one band (the SimHash banding argument, simhash_near_dups'
    text twin), so candidates come from band-bucket equi-joins and the
    full Hamming distance (bit_count of xor) verifies in-bucket. EXACT:
    no false negatives by construction.

    One explode (+1 band rows per image) + one banded self-join on
    64-bit keys + a distinct — linear in band-collision volume, never
    in image pairs.
    """
    banded = _phash_bands(hashes, max_hamming=max_hamming, hash_col=hash_col)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.__h").alias("ha"),
            F.col("b.__h").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synthesize_wav_envelope_payload(
    df: DataFrame,
    *,
    sample_rate: int = 8000,
    n_segments: int = 66,
    seg_len: int = 64,
    gain: float = 1.0,
) -> DataFrame:
    """Deterministic PCM16 payload whose AMPLITUDE ENVELOPE varies per
    segment (LCG keyed off doc_id) — the fingerprint-friendly twin of
    synthesize_wav_payload's steady sine, whose constant energy profile
    carries no sequence information. ``gain`` scales the whole clip
    (the planted "same recording, different volume" twin).
    """
    import numpy as np

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(seg_len, dtype=np.float64)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id)
                segs = []
                for i in range(n_segments):
                    x = (1103515245 * (k * 67 + i) + 12345) % (1 << 31)
                    amp = (2000 + x % 16000) * gain
                    freq = 200.0 + (k % 13) * 40.0
                    segs.append(amp * np.sin(2.0 * np.pi * freq * t / sample_rate))
                wave = np.concatenate(segs).astype("<i2")
                payloads.append(encode_wav(wave, sample_rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(_gen, schema)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def audio_fingerprint(
    df: DataFrame, *, n_bands: int = 65, payload_col: str = "payload"
) -> DataFrame:
    """64-bit acoustic fingerprint — the energy-DELTA sign sequence
    (Haitsma–Kalker's robust-hash idea reduced to its time axis): split
    the clip into ``n_bands`` equal frames, bit i = [energy(i+1) >
    energy(i)]. VOLUME-INVARIANT by construction (uniform gain scales
    every frame energy by the same factor, preserving all comparisons),
    so a re-encoded/re-leveled copy of the same recording fingerprints
    identically — the property raw byte hashing lacks. Decoder-
    independent, pure-numpy, zero-shuffle mapInPandas (the
    perceptual_hash contract for audio); near-dup pairs come from the
    SAME pigeonhole band join (``phash_near_dups(hash_col='afp')``).

    Clips too short for one sample per frame (or undecodable payloads)
    emit NULL and are excluded by the band join's null filter.
    """
    import numpy as np

    def _fp_one(doc_id, buf):
        parsed = _parse_wav(buf) if buf else None
        if parsed is None:
            return (doc_id, None, None)
        _, _, samples = parsed
        mono = samples.astype(np.float64).mean(axis=1)
        n = mono.shape[0]
        frame = n // n_bands
        if frame < 1:
            return (doc_id, None, int(n))
        e = (mono[: frame * n_bands].reshape(n_bands, frame) ** 2).sum(axis=1)
        bits = e[1:] > e[:-1]
        fp = 0
        for i, b in enumerate(bits[:64]):
            if b:
                fp |= 1 << i
        return (doc_id, _to_signed64(fp), int(n))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FP_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _fp_one(d, bytes(b) if b is not None else b"")
                for d, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(_extract, AUDIO_FP_SCHEMA)


# --------------------------------------------------------------------------
# Reject-reason certification (round 10): chain the codec-fuzz contract
# ("decode or clean-reject, never crash") into the driver's oracle gate
# --------------------------------------------------------------------------

#: SOF markers this decoder deliberately rejects (T.81 frame types the
#: real-world Huffman-sequential/progressive corpus doesn't use)
_JPEG_UNSUPPORTED_SOF = frozenset(
    {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def jpeg_reject_reason(buf: bytes) -> str:
    """Classify a payload against the JPEG decoder's accept/reject
    contract: ``'ok'`` (decodes), ``'not_jpeg'`` (no SOI), ``'arith'``
    (arithmetic/lossless/differential SOF — clean-rejected by design),
    ``'truncated'`` (marker or entropy stream runs off the buffer),
    ``'corrupt'`` (structurally intact but undecodable). Pure marker
    walk — never decodes entropy data, so classification costs bytes,
    not IDCTs. The codec fuzz family asserts decode-or-clean-reject per
    seed; this classifier lets a REGISTERED query count the rejects by
    reason so a decoder regression moves a row count in the driver's
    correctness gate, not just a pytest assertion."""
    if _parse_jpeg(buf) is not None:
        return "ok"
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return "not_jpeg"
    pos = 2
    saw_sos = False
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            return "corrupt"
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI reached: structure intact, decode failed
            return "corrupt"
        if marker in _JPEG_UNSUPPORTED_SOF:
            return "arith"
        if 0xD0 <= marker <= 0xD7:  # bare RSTn between scans
            pos += 2
            continue
        if pos + 4 > len(buf):
            return "truncated"
        ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if pos + 2 + ln > len(buf):
            return "truncated"
        pos += 2 + ln
        if marker == 0xDA:
            saw_sos = True
            # entropy-coded bytes follow; resync to the next real marker
            # (skip stuffed FF00 and RSTn) — absence of EOI = truncated
            while pos + 1 < len(buf):
                if buf[pos] == 0xFF and buf[pos + 1] not in (0x00, *range(0xD0, 0xD8)):
                    break
                pos += 1
            else:
                return "truncated"
    if not saw_sos:
        return "truncated"
    return "truncated"


def corrupt_jpeg_payloads(df: DataFrame, *, mode_col: str = "mode") -> DataFrame:
    """Deterministic payload corruptor for the reject-certification
    query: per row, apply ``mode``: ``'intact'`` (pass through),
    ``'truncate'`` (cut the stream at 60% — mid-entropy for any real
    image), ``'arith'`` (rewrite the SOF marker to SOF9, the
    arithmetic-sequential frame type — headers otherwise untouched),
    ``'garbage'`` (id-keyed non-JPEG bytes). Arrow-batched mapInPandas;
    output schema (doc_id, mode, payload)."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(mode_col, T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _find_sof_offset(buf: bytes) -> int:
        """Offset of the SOF0/1/2 marker found by WALKING the segment
        structure (round-11 advisor fix) — DQT/DHT payload bytes are not
        FF-stuffed, so a table coincidentally containing FF C0 must never
        be rewritten in place of the real frame header."""
        if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
            return -1
        pos = 2
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                return -1
            marker = buf[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                return pos
            if marker == 0xD9 or marker == 0xDA:  # EOI / scan: no SOF seen
                return -1
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
            if ln < 2:
                return -1
            pos += 2 + ln
        return -1

    def _corrupt_one(doc_id: int, mode: str, buf: bytes) -> bytes:
        if mode == "truncate":
            return buf[: max(4, (len(buf) * 3) // 5)]
        if mode == "arith":
            i = _find_sof_offset(buf)
            if i >= 0:
                return buf[:i] + b"\xff\xc9" + buf[i + 2 :]
            return buf
        if mode == "garbage":
            return bytes((doc_id * 31 + i * 7) % 256 for i in range(64))
        return buf

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _corrupt_one(int(d), m, bytes(b) if b is not None else b"")
                for d, m, b in zip(pdf["doc_id"], pdf[mode_col], pdf["payload"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], mode_col: pdf[mode_col], "payload": out}
            )

    return df.select("doc_id", mode_col, "payload").mapInPandas(_gen, schema)


REJECT_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("reject_reason", T.StringType()),
    ]
)


def decode_reject_report(df: DataFrame) -> DataFrame:
    """Per-payload accept/reject classification (jpeg_reject_reason)
    over a (doc_id, payload) frame — Arrow-batched mapInPandas, same
    plumbing contract as decode_real."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "reject_reason": [
                        jpeg_reject_reason(bytes(b) if b is not None else b"")
                        for b in pdf["payload"]
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_extract, REJECT_REPORT_SCHEMA)


def phash_dedup_incremental(
    new_hashes: DataFrame,
    corpus_hashes: DataFrame,
    *,
    max_hamming: int = 4,
    hash_col: str = "ahash",
    _cache: bool = True,
) -> DataFrame:
    """STATUS-emitting steady-state VISUAL dedup (round 11): the
    perceptual-hash twin of ``dedup.minhash_dedup_incremental`` — one
    row per NEW image, status ∈ {'kept', 'corpus_dup', 'batch_dup'},
    component = min id of the image's within-batch near-dup group:

    - Hamming(hash, corpus hash) ≤ max_hamming for ANY corpus image
      sharing a pigeonhole band → ``corpus_dup`` (EXACT: the banding
      has no false negatives, so a qualifying corpus match is never
      missed);
    - surviving new×new band-candidate pairs verify on full Hamming and
      collapse via ``dedup.connected_components`` → min-id ``kept``,
      the rest ``batch_dup``.

    Same single-pass steady-state contract as the text/semantic twins
    (a new image linked only to a DROPPED new image stays kept). Scale
    shape: both joins are band-bucket equi-joins over 64-bit keys —
    linear in band-collision volume, never |new|·|corpus|; the corpus
    side is the banded hash table (persist it once; the streaming tier
    accumulates it as parquet partitions).
    """
    from cloudtrace_exporter_spark.operators import dedup as _dedup
    from cloudtrace_exporter_spark.session import cache_once

    # _cache=False: the streaming tier persists the hash frame itself
    # and must not accumulate one band-cache entry per micro-batch —
    # the band table is a narrow projection of that persisted frame
    nb = _phash_bands(new_hashes, max_hamming=max_hamming, hash_col=hash_col)
    if _cache:
        nb = cache_once(nb)
    cb = _phash_bands(corpus_hashes, max_hamming=max_hamming, hash_col=hash_col)
    ham = F.bit_count(F.col("a.__h").bitwiseXOR(F.col("c.__h")))
    corpus_dups = (
        nb.alias("a")
        .join(
            cb.alias("c"),
            (F.col("a.band") == F.col("c.band")) & (F.col("a.key") == F.col("c.key")),
        )
        .filter(ham <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    survivors = nb.join(corpus_dups, "doc_id", "left_anti")
    ham2 = F.bit_count(F.col("sa.__h").bitwiseXOR(F.col("sb.__h")))
    batch_pairs = (
        survivors.alias("sa")
        .join(
            survivors.alias("sb"),
            (F.col("sa.band") == F.col("sb.band"))
            & (F.col("sa.key") == F.col("sb.key"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .filter(ham2 <= max_hamming)
        .select(F.col("sa.doc_id").alias("ia"), F.col("sb.doc_id").alias("ib"))
        .dropDuplicates(["ia", "ib"])
    )
    comp = _dedup.connected_components(batch_pairs, src="ia", dst="ib").withColumnRenamed(
        "id", "cid"
    )
    lbl = (
        survivors.select("doc_id")
        .distinct()
        .join(comp, F.col("doc_id") == F.col("cid"), "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("component"))
    )
    out = (
        nb.select("doc_id")
        .distinct()
        .join(
            lbl.select(F.col("doc_id").alias("lid"), "component"),
            F.col("doc_id") == F.col("lid"),
            "left",
        )
    )
    return out.select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("component"),
        F.when(F.col("lid").isNull(), F.lit("corpus_dup"))
        .when(F.col("component") == F.col("doc_id"), F.lit("kept"))
        .otherwise(F.lit("batch_dup"))
        .alias("status"),
    ).orderBy("doc_id")
