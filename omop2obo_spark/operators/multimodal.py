"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

Two decode tiers:

* **Real stdlib codecs** — PNG (full chunk walk with CRC verification,
  IHDR parse, zlib IDAT inflate, scanline unfiltering for all five filter
  types) and WAV (RIFF chunk walk, fmt parse, PCM sample decode).  These
  process real bytes end-to-end and are exercised by oracle-checked
  queries: the encoder writes genuine files, the decoder recovers pixel /
  sample values, and a closed-form SQL oracle checks the round trip.
* **Real structure parsers** — JPEG (marker-segment walk: SOF0–SOF15
  frame header, byte-stuffing/restart-marker-aware entropy scan) and
  MP4/ISO-BMFF (box walk: ftyp/moov/mvhd v0+v1/trak/mdat, largesize and
  to-end boxes).  Metadata extraction over crawled corpora is a header
  walk, not a pixel decode, so these are the production operation — the
  matching ``jpeg_build``/``mp4_build`` emit structurally genuine files
  for the oracle round trip.
* **Fake fallbacks** — pixel/sample-level decode for formats whose full
  codecs aren't in this container (JPEG DCT entropy decode, H.264) goes
  through the deterministic ``_fake_decode`` stub behind the same
  Arrow-batched ``mapInPandas`` plumbing; swapping in PIL/pyav means
  replacing one function body.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

def _frame_schema(id_type: T.DataType) -> T.StructType:
    """:func:`sample_frames` output; ``asset_id`` inherits the input id
    type (string asset ids are common — a hard-coded LongType would fail
    Arrow conversion for them)."""
    return T.StructType(
        [
            T.StructField("asset_id", id_type, False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )


def synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media assets (binary payload = seeded bytes)."""
    base = spark.range(n)
    payload = F.sha2(F.concat(F.lit(str(seed) + ":"), F.col("id").cast("string")), 512)
    return base.select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(payload, "utf-8").alias("media"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.col("id"), F.lit(10)) * 1000).cast("int").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# real PNG codec (stdlib only: zlib + struct; 8-bit grayscale)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    PNG (color type 0 or 2).

    Rows rotate through filter types None/Sub/Up (r % 3) so decoders must
    actually unfilter — a filter-0-only encoder would let a broken decoder
    pass the round-trip test. The Sub filter subtracts the pixel ``bpp``
    bytes left (per the spec), so RGB channels filter against their own
    channel.
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("png_encode expects an (h, w) or (h, w, 3) uint8 array")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError(f"3-d input must have 3 channels, got {img.shape[2]}")
    bpp = 1 if img.ndim == 2 else 3
    ctype_n = 0 if bpp == 1 else 2
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h, w * bpp)
    stride = w * bpp

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        row = flat[r]
        ft = r % 3
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub: x - left (bpp bytes back)
            filt = np.empty(stride, dtype=np.uint8)
            filt[:bpp] = row[:bpp]
            filt[bpp:] = row[bpp:] - row[:-bpp]
        else:  # Up: x - above
            filt = row - prev
        raw.append(ft)
        raw.extend(filt.tobytes())
        prev = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Real PNG decoder: signature check, chunk walk with CRC verification,
    IHDR parse, IDAT inflate, scanline unfiltering (all 5 filter types).

    Supports 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
    non-interlaced. Returns (width, height, bit_depth, color_type, pixels)
    with pixels shaped (h, w*channels) uint8.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG: chunk {ctype!r} overruns payload")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt_m, interlace = ihdr
    if depth != 8 or ctype_n not in (0, 2) or comp or filt_m or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype_n}, interlace={interlace})"
        )
    bpp = 1 if ctype_n == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub
            rec = line
            if bpp == 1:
                # recon[i] = raw[i] + recon[i-1]  ==  mod-256 prefix sum
                rec = np.cumsum(line.astype(np.uint64)).astype(np.uint8)
            else:
                for i in range(bpp, stride):
                    rec[i] = (int(rec[i]) + int(rec[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            rec = line + prev
        elif ft == 3:  # Average
            rec = line
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            rec = line
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[r] = rec
        prev = out[r]
    return w, h, depth, ctype_n, out


# ---------------------------------------------------------------------------
# real WAV codec (stdlib only: RIFF walk + PCM16)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Encode int16 PCM samples as a real RIFF/WAVE file."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real WAV decoder: RIFF chunk walk, fmt parse, PCM16 sample decode.
    Returns (channels, sample_rate, bits_per_sample, samples[int16])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + length > len(payload):
            raise ValueError(f"truncated WAV: chunk {cid!r} overruns payload")
        body = payload[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV: fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    return channels, rate, bits, np.frombuffer(data, dtype=np.int16)


# means are integer micro-units (floor(sum * 1e6 / n) over exact Python
# ints), not doubles: a double mean would round at the 6th decimal with
# three different half-rules across Python/Spark/DuckDB and flake the
# oracle hash on representable boundaries (e.g. n_px = 128)
# metric fields are NULLABLE: a corrupt asset emits a NULL-metadata row
# (totality policy — see the kernels), never a stage failure
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("bit_depth", T.LongType(), True),
        T.StructField("color_type", T.LongType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("sum_px", T.LongType(), True),
        T.StructField("mean_px_e6", T.LongType(), True),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("bits", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sum_amp", T.LongType(), True),
        T.StructField("mean_abs_e6", T.LongType(), True),
    ]
)


def png_metadata(df: DataFrame, id_col: str = "doc_id", binary_col: str = "media") -> DataFrame:
    """Decode a PNG binary column (real codec) into typed metadata +
    pixel statistics. Arrow-batched; payload bytes never shuffle — the
    decode runs where the scan runs and only the tiny stats move."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                # totality: corrupt PNGs emit a NULL-metadata row instead of
                # failing the stage (same policy as extract_features).
                try:
                    w, h, depth, ctype, px = png_decode(bytes(blob))
                    s = int(px.astype(np.uint64).sum())
                    n = int(px.size)
                    if n == 0:
                        raise ValueError("zero-pixel image")
                    rows.append((int(did), w, h, depth, ctype, n, s, s * 1_000_000 // n))
                except Exception:
                    rows.append((int(did),) + (None,) * 7)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_META_SCHEMA.fields],
                dtype=object,
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, IMAGE_META_SCHEMA)


def wav_metadata(df: DataFrame, id_col: str = "doc_id", binary_col: str = "media") -> DataFrame:
    """Decode a WAV binary column (real codec) into typed metadata +
    amplitude statistics. ``duration_ms = n_frames * 1000 // rate``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                # totality: one corrupt crawled asset (truncated chunks,
                # fmt claiming rate=0, odd-length PCM data — WAV has no
                # checksum) must emit a NULL-metadata row, not kill the
                # stage at 10^12 rows. rate==0 passes wav_decode (it only
                # validates structure) and would ZeroDivide the duration.
                try:
                    ch, rate, bits, samples = wav_decode(bytes(blob))
                    if rate <= 0 or ch <= 0:
                        raise ValueError(f"non-positive rate/channels: {rate}/{ch}")
                    n = len(samples) // ch
                    s = int(samples.astype(np.int64).sum())
                    sabs = int(np.abs(samples.astype(np.int64)).sum())
                    rows.append(
                        (int(did), ch, rate, bits, n, n * 1000 // rate, s,
                         sabs * 1_000_000 // max(len(samples), 1))
                    )
                except Exception:
                    rows.append((int(did),) + (None,) * 7)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_META_SCHEMA.fields],
                dtype=object,
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, AUDIO_META_SCHEMA)


# ---------------------------------------------------------------------------
# real JPEG structure codec (stdlib only): marker-segment builder + parser.
# JPEG entropy DECODING (Huffman/DCT) is out of scope — the marker walk is
# what metadata extraction needs (dimensions, components, progressive flag)
# and it must handle byte stuffing and restart markers byte-exactly.
# ---------------------------------------------------------------------------

_SOI, _EOI, _SOS, _DHT, _DRI, _APP0, _DQT = 0xD8, 0xD9, 0xDA, 0xC4, 0xDD, 0xE0, 0xDB
_SOF_MARKERS = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def jpeg_build(
    width: int,
    height: int,
    scan: bytes,
    n_components: int = 3,
    progressive: bool = False,
    restart_interval: int | None = None,
) -> bytes:
    """Build a structurally genuine JPEG byte stream: SOI, JFIF APP0, DQT,
    SOF0/SOF2 with real dimensions, DHT, (optional DRI), SOS, entropy data
    with spec-correct 0xFF byte stuffing (0xFF → 0xFF 0x00) and RSTn
    markers every ``restart_interval`` scan bytes, EOI. Marker lengths are
    all exact, so any conforming marker-walk parser reads it."""
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError(f"dimensions out of range: {width}x{height}")
    if n_components not in (1, 3):
        raise ValueError(f"n_components must be 1 or 3, got {n_components}")

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(struct.pack(">BB", 0xFF, _SOI))
    out += seg(_APP0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0))
    out += seg(_DQT, b"\x00" + bytes((i * 7 + 3) % 255 + 1 for i in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, n_components)
    for c in range(n_components):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)
    out += seg(0xC2 if progressive else 0xC0, sof)
    out += seg(_DHT, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    if restart_interval:
        out += seg(_DRI, struct.pack(">H", restart_interval))
    sos = bytes([n_components])
    for c in range(n_components):
        sos += struct.pack(">BB", c + 1, 0)
    sos += struct.pack(">BBB", 0, 63, 0)
    out += seg(_SOS, sos)
    rst = 0
    for i, b in enumerate(scan):
        if restart_interval and i and i % restart_interval == 0:
            out += struct.pack(">BB", 0xFF, 0xD0 + rst % 8)
            rst += 1
        out.append(b)
        if b == 0xFF:
            out.append(0x00)  # byte stuffing
    out += struct.pack(">BB", 0xFF, _EOI)
    return bytes(out)


def jpeg_parse_meta(payload: bytes) -> tuple[int, int, int, int, bool, bytes]:
    """Real JPEG marker walk: SOI check, segment iteration with exact
    2-byte lengths, fill-byte tolerance, SOF0–SOF15 frame-header parse
    (precision, height, width, components; SOF2/6/10/14 ⇒ progressive), and an
    entropy-data scan that un-stuffs 0xFF00 and skips RSTn restart
    markers until the next true marker. Returns
    ``(width, height, precision, n_components, progressive, scan_bytes)``
    where ``scan_bytes`` is the de-stuffed entropy payload.

    Replaces the former ``_fake_decode`` stub tier for images: dimension/
    metadata extraction over crawled JPEG corpora is a header walk, not a
    DCT decode (PIL's ``Image.open(...).size`` does the same walk)."""
    n = len(payload)
    if n < 4 or payload[0] != 0xFF or payload[1] != _SOI:
        raise ValueError("not a JPEG (missing SOI)")
    width = height = precision = ncomp = None
    progressive = False
    scan = bytearray()
    pos = 2
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes (spec: any number of 0xFF before marker)
        if pos >= n:
            raise ValueError("truncated marker")
        marker = payload[pos]
        pos += 1
        if marker == _EOI:
            if width is None:
                raise ValueError("EOI before SOF")
            return int(width), int(height), int(precision), int(ncomp), progressive, bytes(scan)
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if pos + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(f"bad segment length {seg_len} at {pos}")
        body = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker in _SOF_MARKERS:
            if len(body) < 6:
                raise ValueError(f"truncated SOF body ({len(body)} bytes)")
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            # all four progressive SOF variants: baseline-progressive (C2),
            # differential progressive (C6), progressive arithmetic (CA),
            # differential progressive arithmetic (CE) — not just SOF2
            progressive = marker in (0xC2, 0xC6, 0xCA, 0xCE)
        elif marker == _SOS:
            # entropy-coded data follows until the next real marker
            while pos < n:
                b = payload[pos]
                if b != 0xFF:
                    scan.append(b)
                    pos += 1
                    continue
                nxt = payload[pos + 1] if pos + 1 < n else None
                if nxt == 0x00:
                    scan.append(0xFF)  # stuffed data byte
                    pos += 2
                elif nxt == 0xFF:
                    # fill byte: spec B.1.1.2 allows any number of 0xFF
                    # before ANY marker, including in-scan RSTn — a data
                    # 0xFF is always stuffed as FF 00, so FF FF can only
                    # be fill + (marker prefix); drop one and re-examine
                    pos += 1
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    pos += 2  # restart marker
                else:
                    break  # next true marker (EOI or another segment)
    raise ValueError("no EOI marker")


JPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("prec_bits", T.LongType(), True),
        T.StructField("n_components", T.LongType(), True),
        T.StructField("progressive", T.LongType(), True),  # 0/1
        T.StructField("n_scan", T.LongType(), True),
        T.StructField("sum_scan", T.LongType(), True),
    ]
)


def jpeg_metadata(df: DataFrame, id_col: str = "doc_id", binary_col: str = "media") -> DataFrame:
    """Parse a JPEG binary column (real marker walk) into typed metadata +
    entropy-byte statistics. Same totality policy as png_metadata: a
    corrupt asset yields a NULL-metadata row, never a stage failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    w, h, prec, nc, prog, scan = jpeg_parse_meta(bytes(blob))
                    rows.append(
                        (int(did), w, h, prec, nc, int(prog), len(scan), sum(scan))
                    )
                except Exception:
                    rows.append((int(did),) + (None,) * 7)
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_META_SCHEMA.fields], dtype=object
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, JPEG_META_SCHEMA)


# ---------------------------------------------------------------------------
# real MP4 / ISO-BMFF structure codec (stdlib only): box builder + walker.
# Frame DECODING (H.264 etc.) is out of scope; duration/track metadata
# lives in the moov/mvhd box tree, which this parses for real (both the
# 32-bit v0 and 64-bit v1 mvhd layouts, largesize and to-end boxes).
# ---------------------------------------------------------------------------


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def mp4_build(
    timescale: int,
    duration: int,
    n_tracks: int = 1,
    mdat: bytes = b"",
    version: int = 0,
    brand: bytes = b"isom",
) -> bytes:
    """Build a structurally genuine MP4: ftyp, moov(mvhd + n trak(tkhd)),
    mdat. ``version`` selects the 32-bit (v0) or 64-bit (v1) mvhd/tkhd
    time layout — both occur in the wild and both must parse."""
    if version not in (0, 1):
        raise ValueError(f"mvhd version must be 0 or 1, got {version}")
    ftyp = _mp4_box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    if version == 0:
        times = struct.pack(">IIII", 0, 0, timescale, duration)
    else:
        times = struct.pack(">QQIQ", 0, 0, timescale, duration)
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", version) + times
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + matrix + b"\x00" * 24 + struct.pack(">I", n_tracks + 1),
    )
    traks = b""
    for t in range(n_tracks):
        if version == 0:
            ttimes = struct.pack(">IIIII", 0, 0, t + 1, 0, duration)
        else:
            ttimes = struct.pack(">QQIIQ", 0, 0, t + 1, 0, duration)
        tkhd = _mp4_box(
            b"tkhd",
            struct.pack(">B3B", version, 0, 0, 7) + ttimes
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
            + matrix + struct.pack(">II", 0, 0),
        )
        traks += _mp4_box(b"trak", tkhd)
    return ftyp + _mp4_box(b"moov", mvhd + traks) + _mp4_box(b"mdat", mdat)


def mp4_walk_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield ``(box_type, body_start, body_end)`` for each box in a span,
    handling 64-bit ``largesize`` (size==1) and to-end (size==0) boxes."""
    pos, n = start, len(payload) if end is None else end
    while pos + 8 <= n:
        size = struct.unpack(">I", payload[pos : pos + 4])[0]
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > n:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", payload[body : body + 8])[0]
            body += 8
        elif size == 0:
            size = n - pos
        if size < body - pos or pos + size > n:
            raise ValueError(f"bad box size {size} at {pos}")
        yield btype, body, pos + size
        pos += size
    if pos != n:
        raise ValueError(f"trailing garbage after boxes at {pos}")


def mp4_parse_meta(payload: bytes) -> tuple[bytes, int, int, int, int, bytes]:
    """Real ISO-BMFF box walk: top-level ftyp/moov/mdat, recurse into moov
    for mvhd (v0 32-bit / v1 64-bit time fields) and trak count. Returns
    ``(brand, version, timescale, duration, n_tracks, mdat_bytes)``."""
    brand = b""
    version = timescale = duration = None
    n_tracks = 0
    mdat = b""
    for btype, b0, b1 in mp4_walk_boxes(payload):
        if btype == b"ftyp":
            brand = payload[b0 : b0 + 4]
        elif btype == b"mdat":
            # multiple mdat boxes are legal in ISO-BMFF: accumulate bodies
            # so byte-count/byte-sum statistics cover every box
            mdat += payload[b0:b1]
        elif btype == b"moov":
            for ctype, c0, _c1 in mp4_walk_boxes(payload, b0, b1):
                if ctype == b"mvhd":
                    if _c1 - c0 < 1:
                        # guard BEFORE indexing: an empty mvhd body ending
                        # exactly at end-of-payload must raise the documented
                        # ValueError, not IndexError
                        raise ValueError("truncated mvhd body (0 bytes)")
                    version = payload[c0]
                    need = 20 if version == 0 else 32
                    if _c1 - c0 < need:
                        raise ValueError(
                            f"truncated mvhd v{version} body ({_c1 - c0} bytes)"
                        )
                    if version == 0:
                        timescale, duration = struct.unpack(
                            ">II", payload[c0 + 12 : c0 + 20]
                        )
                    else:
                        timescale = struct.unpack(">I", payload[c0 + 20 : c0 + 24])[0]
                        duration = struct.unpack(">Q", payload[c0 + 24 : c0 + 32])[0]
                elif ctype == b"trak":
                    n_tracks += 1
    if timescale is None:
        raise ValueError("no moov/mvhd box")
    return brand, int(version), int(timescale), int(duration), n_tracks, mdat


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("brand", T.StringType(), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("timescale", T.LongType(), True),
        T.StructField("duration", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.LongType(), True),
        T.StructField("n_mdat", T.LongType(), True),
        T.StructField("sum_mdat", T.LongType(), True),
    ]
)


def mp4_metadata(df: DataFrame, id_col: str = "doc_id", binary_col: str = "media") -> DataFrame:
    """Parse an MP4 binary column (real box walk) into typed metadata +
    mdat statistics; ``duration_ms = duration * 1000 // timescale``.
    Totality: corrupt assets emit NULL-metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                try:
                    brand, ver, ts, dur, nt, mdat = mp4_parse_meta(bytes(blob))
                    if ts <= 0:
                        raise ValueError("non-positive timescale")
                    rows.append(
                        (int(did), brand.decode("ascii", "replace"), ver, ts, dur,
                         dur * 1000 // ts, nt, len(mdat), sum(mdat))
                    )
                except Exception:
                    rows.append((int(did),) + (None,) * 8)
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP4_META_SCHEMA.fields], dtype=object
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, MP4_META_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB — deterministic fake decoder. A real implementation would be
    e.g. ``PIL.Image.open(io.BytesIO(payload))``; this derives a stable
    float vector from the bytes so downstream plumbing is testable."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    PNG payloads take the REAL path: decode pixels with the stdlib codec
    and emit a ``dim``-bin normalized intensity histogram. Other formats
    fall back to ``_fake_decode`` (no codecs in this container); the
    mapInPandas shape — iterator of pandas batches in, long feature rows
    out — is production form either way.

    A payload that LOOKS like a PNG but fails to decode (truncated IDAT,
    corrupt chunk — routine in crawled corpora) falls back to the hash
    feature instead of raising: at 10^12 rows one dirty asset must not
    kill the job. The crawl-hygiene funnel is where corrupt assets get
    dropped; feature extraction stays total.
    """

    def one(blob: bytes) -> list[float]:
        if blob[:8] == _PNG_SIG:
            try:
                _w, _h, _d, _c, px = png_decode(blob)
            except Exception:
                return _fake_decode(blob, dim).tolist()
            hist, _ = np.histogram(px, bins=dim, range=(0, 256))
            return (hist / max(px.size, 1)).astype(np.float32).tolist()
        return _fake_decode(blob, dim).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "feature": feats})

    return assets.select("asset_id", "media").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """STUB resize: real impl decodes + resamples; fake truncates the
    payload deterministically to width*height bytes. Plumbing (filter to
    images, batch transform, typed output) is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out = pdf.copy()
            out["media"] = [bytes(b)[:n] for b in pdf["media"]]
            out["width"] = width
            out["height"] = height
            yield out

    imgs = assets.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(run, assets.schema)


def sample_frames(assets: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """STUB frame sampling for video rows: real impl seeks the container;
    fake emits deterministic byte slices, one row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            # zip over columns, not iterrows — iterrows materializes a
            # Series per row (per-row Python object churn in the hot path)
            for aid, dur, media in zip(pdf["asset_id"], pdf["duration_ms"], pdf["media"]):
                if media is None:
                    continue  # no payload → no frames (row skipped, job survives)
                # duration_ms is nullable; NULL arrives as NaN in the pandas
                # batch and int(NaN) raises — treat unknown duration as one
                # sampled frame instead of failing the whole task
                n = 1 if pd.isna(dur) else min(max_frames, max(1, int(dur) // every_ms))
                blob = bytes(media)
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(blob[i * 8 : i * 8 + 8])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    vids = assets.filter(F.col("media_type") == "video")
    return vids.select("asset_id", "duration_ms", "media").mapInPandas(
        run, _frame_schema(assets.schema["asset_id"].dataType)
    )


def content_key_dedup(
    assets: DataFrame, id_col: str = "asset_id", binary_col: str = "media"
) -> DataFrame:
    """Exact byte-identity dedup for opaque media payloads — the
    multimodal twin of ``operators.dedup.exact_dedup``: md5 over the
    binary column, min-id canonical winner per key.

    Output: ``(id_col, content_key, canonical_id, group_size)``.

    Scale shape: the payload bytes NEVER shuffle — only the id and the
    32-hex-char key move (at 100 TB of media the payload column is the
    entire dataset; hashing at the scan and exchanging keys is the only
    viable plan). One shuffle on the content key via a window, exactly
    like the text-side exact dedup.
    """
    from pyspark.sql.window import Window

    keyed = assets.select(
        F.col(id_col), F.md5(F.col(binary_col)).alias("content_key")
    )
    # NULL payload = unknown content: singleton group per asset (same
    # contract as the text-side exact_dedup) — a shared NULL partition
    # would collapse every payload-less asset into one group
    grp = F.coalesce(
        F.col("content_key"), F.concat(F.lit("null:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(grp)
    return (
        keyed.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select(id_col, "content_key", "canonical_id", "group_size")
    )


IMAGE_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("px_sum", T.LongType(), False),
    ]
)


def image_resize(
    assets: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    binary_col: str = "media",
) -> DataFrame:
    """REAL image resize over the real codec: decode each PNG, nearest-
    neighbor sample to ``(out_w, out_h)`` with the integer mapping
    ``src_i = i * src // out`` (floor — deterministic, no float
    rounding), re-encode as a genuine PNG, and report the resized pixel
    sum so correctness is checkable without re-decoding downstream.
    Grayscale and RGB (the codec's supported color types) both work —
    channels are sampled together.

    This is the thumbnail/normalize step of a multimodal training
    pipeline. Arrow-batched ``mapInPandas``: payload bytes never shuffle
    — decode, resample, and re-encode run where the scan runs; the only
    thing that ever moves is whatever the caller selects downstream.
    """
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"output dims must be positive, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                w, h, _depth, ctype, px = png_decode(bytes(blob))
                ch = 1 if ctype == 0 else 3
                img = px.reshape(h, w, ch)
                xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
                yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
                out = img[yi][:, xi]  # nearest-neighbor gather
                flat = out.reshape(out_h, out_w * ch)
                rows.append(
                    (
                        int(did), w, h, out_w, out_h,
                        png_encode(flat if ch == 1 else out.reshape(out_h, out_w, 3)),
                        int(out.astype(np.uint64).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_RESIZE_SCHEMA.fields])

    return assets.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, IMAGE_RESIZE_SCHEMA
    )


AUDIO_DOWNSAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_rate", T.IntegerType(), False),
        T.StructField("out_rate", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("abs_sum", T.LongType(), False),
    ]
)


def audio_downsample(
    assets: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    binary_col: str = "media",
) -> DataFrame:
    """REAL audio downsample over the real codec: decode each PCM16 WAV,
    box-average every ``factor`` consecutive frames per channel (the
    anti-aliasing low-pass a bare stride decimation lacks; integer
    floor-toward-zero mean, deterministic), re-encode at
    ``rate // factor``, and report the new amplitude sum. A trailing
    partial group shorter than ``factor`` is dropped — every output
    frame averages exactly ``factor`` inputs, so the arithmetic is
    engine-replayable.

    Arrow-batched ``mapInPandas``; payload bytes never shuffle.
    """
    if factor <= 0:
        raise ValueError(f"factor must be positive, got {factor}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                ch, rate, _bits, samples = wav_decode(bytes(blob))
                if rate % factor:
                    raise ValueError(
                        f"factor {factor} does not divide rate {rate}"
                    )
                frames = samples.reshape(-1, ch)
                n_out = len(frames) // factor
                grouped = frames[: n_out * factor].reshape(n_out, factor, ch)
                # int32 sums can't overflow (factor * 32767 << 2^31);
                # Python-style floor division would round toward -inf —
                # use trunc toward zero to match the obvious SQL replay
                sums = grouped.astype(np.int32).sum(axis=1)
                out = (np.trunc(sums / factor)).astype(np.int16)
                rows.append(
                    (
                        int(did), rate, rate // factor, n_out,
                        wav_encode(out.reshape(-1), rate // factor, ch),
                        int(np.abs(out.astype(np.int64)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_DOWNSAMPLE_SCHEMA.fields]
            )

    return assets.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, AUDIO_DOWNSAMPLE_SCHEMA
    )
