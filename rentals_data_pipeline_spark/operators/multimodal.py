"""Multimodal (image/audio/video) column plumbing.

Media is modeled the way a 100 TB training-data lake stores it: an
opaque ``binary`` payload column plus typed metadata columns, processed
by Arrow-batched ``mapInPandas`` stages. ``decode_media`` is a REAL
decode path dispatching on magic bytes to the pure-Python container
parsers in ``operators/codecs.py`` — RIFF/WAVE (PCM 8/16/24/32-bit,
IEEE float, G.711 mu-law/A-law, EXTENSIBLE wrappers), PNG (zlib
inflate, all five scanline filters, 8/16-bit, gray/RGB/palette/alpha),
GIF (full LZW, interlace), BMP (BI_RGB 24/32), baseline JPEG (Huffman
entropy decode + IDCT, subsampling, restart markers), FLAC (Rice/LPC
frame decode, stereo decorrelation) and binary PPM P6
(``pack_wav``/``pack_ppm`` build genuine containers to feed it), plus
Motion-JPEG video in BOTH mainstream containers — AVI (RIFF walk) and
MP4 (ISO-BMFF box walk + stbl sample table, round 9) — and FLAC-in-Ogg
(round 10: page walk + lacing-table packet reassembly into the native
FLAC decoder). Compressed inter-frame AV codecs (H.264, Vorbis/Opus)
stay environment-gated — no PIL/ffmpeg in this container — and surface
as ``unsupported codec`` error ROWS, never task failures. Everything Spark-side is real and
tested:

- ``pack_media``: documents → media-shaped rows (payload bytes + typed
  metadata). Deterministic fake payloads (utf-8 of the text) so every
  downstream result is golden-testable.
- ``media_metadata``: pure built-ins (length/md5/hex-magic) — the
  cheap metadata pass that never deserializes payloads to Python.
- ``byte_histogram_features``: the deterministic stand-in feature
  extractor — 16-bin byte histogram per payload via ``mapInPandas``
  (numpy over Arrow batches; the exact shape a real embedding/decoder
  UDF has: binary in, fixed-dim float vector out).
- ``frame_sample``: every-k-th fixed-size byte frame, as built-in
  array-of-binary slicing — the frame-sampling plan shape for video,
  minus the codec.

At scale: metadata and frame sampling stay in whole-stage codegen;
only feature extraction crosses to Python, in Arrow batches, and the
payload column is pruned everywhere it isn't needed (Parquet column
pruning does this for free when media sits in its own column).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rentals_data_pipeline_spark.functions.widen import widen_if_narrow

if TYPE_CHECKING:  # pandas only crosses into executors inside mapInPandas
    import pandas as pd

Op = Callable[[DataFrame], DataFrame]

MEDIA_TYPES = ("image", "audio", "video")

N_HISTOGRAM_BINS = 16


def _widen(df: DataFrame, enabled: bool = True) -> DataFrame:
    """Ensure a CPU-bound Arrow stage gets at least core-count
    parallelism. The pack/decode pipelines are pure-Python per-blob
    work: their wall-clock is partitions-bounded, and a small corpus
    read from one parquet file arrives as ONE partition — 31 of 32
    cores idle through the whole decode (measured 16.3s -> 0.8s at
    sf0.1 for the Ogg FLAC stats query). Widening is CONDITIONAL: at
    real scale the scan already supplies >= defaultParallelism
    partitions and this is a no-op, so the shuffle (tiny doc_id+text
    rows — applied at the PACK stage, upstream of blob construction,
    never on packed payloads) only happens where it pays. Pack
    factories expose ``widen=False`` for multi-branch certification
    pipelines whose sliver branches already run concurrently through
    a union: there the shuffle+task overhead exceeds the win, and
    Spark does not reuse the repartition exchange across branch
    subtrees (both measured in plans/multimodal_queries.py). The probe
    mechanics (streaming/exchange guards, JVM-internal partition
    count) live in the ONE shared copy,
    functions/widen.py::widen_if_narrow."""
    return widen_if_narrow(df, enabled)


def pack_media(
    id_col: str = "doc_id", text_col: str = "text", out_payload: str = "payload"
) -> Op:
    """Turn a documents-shaped table into a media-shaped one:
    (id, media_type, payload binary, typed metadata). The payload is
    the utf-8 of the text — a deterministic fake blob; the metadata
    columns carry the schema a real ingest would attach."""

    def _apply(df: DataFrame) -> DataFrame:
        mt = F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col(id_col) % len(MEDIA_TYPES) + 1).cast("int"),
        )
        return df.select(
            F.col(id_col),
            mt.alias("media_type"),
            F.encode(F.col(text_col), "utf-8").alias(out_payload),
            F.struct(
                F.lit("synthetic/v1").alias("codec"),
                F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            ).alias("media_meta"),
        )

    return _apply


def media_metadata(payload_col: str = "payload") -> Op:
    """Metadata pass over binary payloads — built-ins only (no Python,
    no payload deserialization): byte length, content md5, magic bytes
    (hex of the first 4)."""

    def _apply(df: DataFrame) -> DataFrame:
        p = F.col(payload_col)
        return (
            df.withColumn("n_bytes", F.length(p).cast("long"))
            .withColumn("content_md5", F.md5(p))
            .withColumn("magic_hex", F.hex(F.substring(p, 1, 4)))
        )

    return _apply


def pack_wav(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    sample_rate: int = 8000,
    widen: bool = True,
) -> Op:
    """Build REAL RIFF/WAVE containers (8-bit unsigned PCM, mono) whose
    data chunk is the utf-8 of the text — a genuine codec payload, not
    a fake blob, so ``decode_media`` exercises a real container parse.
    NULL text packs to NULL payload (the decode stage must surface it
    as an error row, never a task failure). Arrow-batched mapInPandas;
    stdlib ``wave`` writes the 44-byte header per row — cheap relative
    to payload bytes, and the only Python-side packing in the module.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave as wavelib

        import pandas as pd

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                buf = io.BytesIO()
                with wavelib.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(sample_rate)
                    w.writeframes(text.encode("utf-8"))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_ppm(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    width: int = 16,
    height: int = 16,
    widen: bool = True,
) -> Op:
    """Build REAL binary-PPM (P6) image containers: ASCII header
    ``P6\\n{w} {h}\\n255\\n`` followed by exactly ``w*h*3`` RGB bytes —
    the utf-8 of the text, zero-padded when short, truncated when long
    — so ``decode_media`` exercises a genuine image-container parse
    with pixel values an oracle can recompute from the text. NULL text
    packs to NULL payload (the decode stage surfaces it as an error
    row, never a task failure). Arrow-batched mapInPandas, same
    plumbing contract as ``pack_wav``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )
    n_px = width * height * 3
    header = f"P6\n{width} {height}\n255\n".encode("ascii")

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                data = text.encode("utf-8")[:n_px]
                payloads.append(header + data + b"\x00" * (n_px - len(data)))
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_png(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    side: int = 16,
    widen: bool = True,
) -> Op:
    """Build REAL PNG containers (round 8): 8-bit grayscale
    ``side`` x ``side``, filter-0 scanlines, one zlib IDAT — pixel
    bytes ARE the text's utf-8 bytes (zero-padded/truncated to
    ``side**2``), so ``decode_media``'s PNG branch exercises a genuine
    signature + chunk-CRC + INFLATE + unfilter pass with pixel values
    an oracle recomputes from the text. The compression level is
    irrelevant to the decoded output (only the decode side is
    certified). NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )
    n_px = side * side

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct
        import zlib as _zlib

        import pandas as pd

        def chunk(typ: bytes, body: bytes) -> bytes:
            c = typ + body
            return (
                _struct.pack(">I", len(body))
                + c
                + _struct.pack(">I", _zlib.crc32(c) & 0xFFFFFFFF)
            )

        ihdr = chunk(
            b"IHDR", _struct.pack(">IIBBBBB", side, side, 8, 0, 0, 0, 0)
        )
        iend = chunk(b"IEND", b"")

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                data = text.encode("utf-8")[:n_px]
                data += b"\x00" * (n_px - len(data))
                raw = b"".join(
                    b"\x00" + data[r * side : (r + 1) * side]
                    for r in range(side)
                )
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + ihdr
                    + chunk(b"IDAT", _zlib.compress(raw, 6))
                    + iend
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_bmp(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    side: int = 16,
    widen: bool = True,
) -> Op:
    """Build REAL BMP containers (round 8): 24-bit BI_RGB
    ``side`` x ``side``, bottom-up rows (the common layout) — written
    so that the DECODED top-down R,G,B interleave is exactly the
    text's utf-8 bytes (zero-padded/truncated to ``side**2 * 3``),
    i.e. the writer performs the row flip and BGR swap the decoder
    undoes. This makes the oracle identical in shape to the PPM one
    while certifying the bottom-up + BGR path specifically. NULL text
    packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )
    n_bytes = side * side * 3

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import numpy as np
        import pandas as pd

        # side*3 stride: for side=16 it is 48, already 4-byte aligned
        stride = (side * 3 + 3) & ~3
        pad = stride - side * 3
        data_off = 14 + 40
        fsize = data_off + stride * side
        header = (
            b"BM"
            + _struct.pack("<IHHI", fsize, 0, 0, data_off)
            + _struct.pack(
                "<IiiHHIIiiII",
                40, side, side, 1, 24, 0, stride * side, 0, 0, 0, 0,
            )
        )

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                data = text.encode("utf-8")[:n_bytes]
                data += b"\x00" * (n_bytes - len(data))
                rgb = np.frombuffer(data, dtype=np.uint8).reshape(
                    side, side, 3
                )
                bgr_bottom_up = rgb[::-1, :, ::-1]  # row flip + BGR
                rows = b"".join(
                    bgr_bottom_up[r].tobytes() + b"\x00" * pad
                    for r in range(side)
                )
                payloads.append(header + rows)
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def _flac_crc8(data: bytes) -> int:  # poly 0x07, init 0
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _flac_crc16(data: bytes) -> int:  # poly 0x8005, init 0
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = (
                ((c << 1) ^ 0x8005) & 0xFFFF
                if c & 0x8000
                else (c << 1) & 0xFFFF
            )
    return c


def _flac_text_stream(data: bytes, n_samples: int) -> bytes:
    """NATIVE FLAC bytes for ``data``: fLaC magic + STREAMINFO + ONE
    fixed-blocking frame holding a VERBATIM subframe of ``n_samples``
    16-bit mono samples at 8 kHz — sample k IS byte k of ``data``
    (zero-padded/truncated), CRC-8/16 computed for real. Shared by
    ``pack_flac`` (bare container) and ``pack_ogg_flac`` (the same
    stream re-framed into Ogg pages) so both decode paths certify
    identical, oracle-replayable sample arithmetic."""
    data = data[:n_samples] + b"\x00" * max(0, n_samples - len(data))
    # STREAMINFO (34 bytes): min/max blocksize, min/max framesize 0,
    # 20-bit rate 8000 | 3-bit channels-1 = 0 | 5-bit bps-1 = 15 |
    # 36-bit total samples, MD5 zeros (optional per spec)
    nb = n_samples.to_bytes(2, "big")
    si = nb + nb + b"\x00" * 6
    si += bytes(
        [
            (8000 >> 12) & 0xFF,
            (8000 >> 4) & 0xFF,
            ((8000 & 0xF) << 4) | (0 << 1) | (15 >> 4),
            ((15 & 0xF) << 4) | 0,
        ]
    ) + n_samples.to_bytes(4, "big") + b"\x00" * 16
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + si
    # frame header: sync+fixed, blocksize code 0b0111 (16-bit-1 at
    # end), rate code 0b0100 (8 kHz), mono, 16 bps, frame #0
    fh = bytes([0xFF, 0xF8, 0x74, 0x08, 0x00])
    fh += (n_samples - 1).to_bytes(2, "big")
    fh += bytes([_flac_crc8(fh)])
    sub = b"\x02" + b"".join(
        b.to_bytes(2, "big") for b in data
    )  # verbatim subframe, 16-bit signed samples (bytes are 0..255)
    frame = fh + sub
    frame += _flac_crc16(frame).to_bytes(2, "big")
    return header + frame


def pack_flac(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    n_samples: int = 256,
    widen: bool = True,
) -> Op:
    """Build REAL FLAC containers (round 8): fLaC magic + STREAMINFO +
    ONE fixed-blocking frame holding a VERBATIM subframe of
    ``n_samples`` 16-bit mono samples at 8 kHz — sample k IS the
    text's byte k (zero-padded/truncated), so ``decode_media``'s FLAC
    branch exercises a genuine metadata-block walk + frame-header
    parse (blocksize/rate/channel/bps codes, UTF-8 frame number,
    CRC-8/CRC-16, both computed for real even though the decoder
    consumes them unverified) with sample values an oracle recomputes
    from the text. NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = [
                None
                if text is None
                else _flac_text_stream(text.encode("utf-8"), n_samples)
                for text in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_gif_anim(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    frame_px: int = 8,
    max_frames: int = 8,
    widen: bool = True,
) -> Op:
    """Build REAL animated GIF89a containers from the text — one
    ``frame_px`` x ``frame_px`` 4-color frame per 64-byte text chunk
    (up to ``max_frames``), each with a Graphic Control Extension
    carrying a deterministic delay — so the video path
    (``decode_video_frames``) exercises genuine multi-frame container
    parses with pixel values recomputable from the text. The LZW
    stream uses the spec-legal clear-per-pixel form (CLEAR before
    every pixel code keeps code width fixed — 2x the bits of real
    compression, irrelevant at 64 pixels/frame and dead simple to
    prove correct). NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )
    npx = frame_px * frame_px

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as pd

        # grayscale 4-color palette: index i -> luma 85*i
        gct = bytes(v for i in range(4) for v in (85 * i, 85 * i, 85 * i))

        def lzw_clear_per_pixel(indices: bytes) -> bytes:
            # LSB-first bit packing; mcs=2: CLEAR=4, END=5, width 3
            out = bytearray()
            acc = nacc = 0

            def put(code: int) -> None:
                nonlocal acc, nacc
                acc |= code << nacc
                nacc += 3
                while nacc >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nacc -= 8

            for px in indices:
                put(4)  # CLEAR: table resets, width stays 3
                put(px)
            put(5)  # END
            if nacc:
                out.append(acc & 0xFF)
            return bytes(out)

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                data = text.encode("utf-8")
                n_frames = max(1, min(max_frames, -(-len(data) // npx)))
                blob = bytearray(b"GIF89a")
                blob += _struct.pack(
                    "<HHBBB", frame_px, frame_px, 0x80 | 1, 0, 0
                )
                blob += gct
                for f in range(n_frames):
                    chunk = data[f * npx : (f + 1) * npx]
                    idx = bytes(b & 3 for b in chunk) + b"\x00" * (
                        npx - len(chunk)
                    )
                    blob += b"\x21\xf9\x04\x00" + _struct.pack(
                        "<H", 10 * (f + 1)
                    ) + b"\x00\x00"
                    blob += b"\x2c" + _struct.pack(
                        "<HHHHB", 0, 0, frame_px, frame_px, 0
                    )
                    blob.append(2)  # min LZW code size
                    lzw = lzw_clear_per_pixel(idx)
                    for i in range(0, len(lzw), 255):
                        part = lzw[i : i + 255]
                        blob.append(len(part))
                        blob += part
                    blob.append(0)
                blob += b"\x3b"
                payloads.append(bytes(blob))
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def _dc_only_jpeg(tiles: list[int]) -> bytes:
    """Grayscale 16x16 baseline JPEG of four constant 8x8 blocks in
    raster order — DC-only entropy data with unit quant tables, so a
    constant block quantizes to an exact integer DC (``8 * (v-128)``)
    and decode reproduces the tile values EXACTLY. Canonical Huffman:
    12 DC categories at 4 bits (code for category s IS s), one 1-bit
    AC EOB (code 0). Shared by ``pack_avi_mjpeg`` / ``pack_mp4_mjpeg``
    so both containers carry bit-identical frame payloads."""
    out = bytearray(b"\xff\xd8")

    def seg(m: int, body: bytes) -> bytes:
        return bytes([0xFF, m]) + (len(body) + 2).to_bytes(2, "big") + body

    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(
        0xC0,
        bytes([8]) + (16).to_bytes(2, "big")
        + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]),
    )
    dc_bits = [0] * 16
    dc_bits[3] = 12
    ac_bits = [0] * 16
    ac_bits[0] = 1
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
        + bytes([0x10]) + bytes(ac_bits) + bytes([0x00]),
    )
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    ebytes = bytearray()
    acc = nacc = 0

    def put(val: int, nbits: int) -> None:
        nonlocal acc, nacc
        for i in range(nbits - 1, -1, -1):
            acc = (acc << 1) | ((val >> i) & 1)
            nacc += 1
            if nacc == 8:
                ebytes.append(acc)
                if acc == 0xFF:  # byte stuffing
                    ebytes.append(0x00)
                acc = nacc = 0

    pred = 0
    for v in tiles:
        dc = 8 * (v - 128)
        diff = dc - pred
        pred = dc
        s = abs(diff).bit_length()
        put(s, 4)
        if s:
            put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        put(0, 1)  # EOB
    if nacc:
        put((1 << (8 - nacc)) - 1, 8 - nacc)  # 1-pad to byte
    out += ebytes
    out += b"\xff\xd9"
    return bytes(out)


def _mjpeg_text_frames(data: bytes, max_frames: int) -> list[bytes]:
    """The shared text→frames derivation: one 16x16 DC-only JPEG per
    64-byte chunk (at least 1, at most ``max_frames``), tile luma
    ``85 * (byte & 3)`` of the chunk's bytes 0/16/32/48 — the same
    4-level quantization ``pack_gif_anim`` uses, so motion semantics
    are comparable across GIF/AVI/MP4 and every oracle replays frame
    means from the text's bytes alone."""
    n_frames = max(1, min(max_frames, -(-len(data) // 64)))
    frames = []
    for f in range(n_frames):
        ch = data[f * 64 : (f + 1) * 64]
        frames.append(_dc_only_jpeg([
            85 * ((ch[k] if k < len(ch) else 0) & 3)
            for k in (0, 16, 32, 48)
        ]))
    return frames


def pack_avi_mjpeg(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    max_frames: int = 8,
    widen: bool = True,
) -> Op:
    """Build REAL Motion-JPEG AVI containers from the text — one 16x16
    grayscale frame per 64-byte chunk (up to ``max_frames``), each
    frame four 8x8 constant tiles whose luma is ``85 * (byte & 3)`` of
    the chunk's bytes 0/16/32/48 (the same 4-level quantization
    ``pack_gif_anim`` uses, so motion semantics are comparable across
    containers). Frames are DC-only baseline JPEGs: with unit quant
    tables a constant block quantizes to an exact integer DC
    (``8 * (v - 128)``), so decode reproduces the tile values EXACTLY
    and per-frame means are recomputable from the text. The RIFF
    skeleton is spec-shaped (avih + vids strl with MJPG handler +
    movi '00dc' chunks) at scale/rate = 1/10 -> 10 cs per frame.
    NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as pd

        def chunk(fcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) & 1 else b""
            return fcc + len(body).to_bytes(4, "little") + body + pad

        def lst(kind: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", kind + body)

        strh = (
            b"vids" + b"MJPG" + bytes(12)
            + (1).to_bytes(4, "little") + (10).to_bytes(4, "little")
            + bytes(28)
        )
        strf = (
            (40).to_bytes(4, "little") + (16).to_bytes(4, "little")
            + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + b"MJPG" + bytes(20)
        )
        strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                jpegs = _mjpeg_text_frames(text.encode("utf-8"), max_frames)
                avih = _struct.pack(
                    "<14I", 100_000, 0, 0, 0, len(jpegs), 0, 1, 0,
                    16, 16, 0, 0, 0, 0,
                )
                hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
                movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
                payload = b"AVI " + hdrl + lst(b"movi", movi_body)
                payloads.append(
                    b"RIFF" + len(payload).to_bytes(4, "little") + payload
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_mp4_mjpeg(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    max_frames: int = 8,
    widen: bool = True,
) -> Op:
    """Build REAL Motion-JPEG MP4 (ISO-BMFF) containers from the text —
    the SAME frame derivation as ``pack_avi_mjpeg`` (16x16 DC-only
    JPEG per 64-byte chunk, exact-decoding constant tiles), carried in
    a spec-shaped ISO/IEC 14496-12 skeleton: ``ftyp`` + ``mdat``
    (concatenated frame JPEGs) + ``moov`` with mvhd, trak/tkhd, and a
    full sample table — 'jpeg' visual sample entry, stts (one run of
    10-tick deltas at timescale 100 → 10 cs/frame), one-chunk stsc,
    per-sample stsz, stco pointing into mdat. Decode through
    ``codecs.py::decode_mp4_mjpeg_frames`` reproduces the tile values
    EXACTLY, so per-frame means replay from the text's bytes in the
    oracle. NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as pd

        def box(typ: bytes, body: bytes) -> bytes:
            return (8 + len(body)).to_bytes(4, "big") + typ + body

        def full(typ: bytes, body: bytes, flags: int = 0) -> bytes:
            return box(typ, bytes([0]) + flags.to_bytes(3, "big") + body)

        unity = _struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big")
                   + b"isomiso2mp41")
        jpeg_entry_tail = (
            bytes(6) + (1).to_bytes(2, "big")          # data_ref_index
            + bytes(16)                                # pre_defined/reserved
            + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")  # w x h
            + (0x00480000).to_bytes(4, "big") * 2      # 72 dpi
            + bytes(4) + (1).to_bytes(2, "big")        # frame_count
            + bytes(32)                                # compressorname
            + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
        )
        dref = full(b"dref", (1).to_bytes(4, "big")
                    + full(b"url ", b"", flags=1))
        hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"\x00")
        vmhd = full(b"vmhd", bytes(8), flags=1)

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                jpegs = _mjpeg_text_frames(text.encode("utf-8"), max_frames)
                n = len(jpegs)
                dur = 10 * n  # timescale 100, 10 ticks per frame
                mdat = box(b"mdat", b"".join(jpegs))
                first_off = len(ftyp) + 8  # mdat body start in the file
                mvhd = full(b"mvhd", _struct.pack(">IIII", 0, 0, 100, dur)
                            + (0x00010000).to_bytes(4, "big")
                            + (0x0100).to_bytes(2, "big") + bytes(10)
                            + unity + bytes(24) + (2).to_bytes(4, "big"))
                tkhd = full(b"tkhd", _struct.pack(">IIII", 0, 0, 1, 0)
                            + dur.to_bytes(4, "big") + bytes(16)
                            + unity + (16 << 16).to_bytes(4, "big")
                            + (16 << 16).to_bytes(4, "big"), flags=3)
                mdhd = full(b"mdhd", _struct.pack(">IIII", 0, 0, 100, dur)
                            + _struct.pack(">HH", 0x55C4, 0))
                stsd = full(b"stsd", (1).to_bytes(4, "big")
                            + box(b"jpeg", jpeg_entry_tail))
                stts = full(b"stts", (1).to_bytes(4, "big")
                            + _struct.pack(">II", n, 10))
                stsc = full(b"stsc", (1).to_bytes(4, "big")
                            + _struct.pack(">III", 1, n, 1))
                stsz = full(b"stsz", (0).to_bytes(4, "big")
                            + n.to_bytes(4, "big")
                            + b"".join(len(j).to_bytes(4, "big")
                                       for j in jpegs))
                stco = full(b"stco", (1).to_bytes(4, "big")
                            + first_off.to_bytes(4, "big"))
                stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
                minf = box(b"minf", vmhd + dref + stbl)
                mdia = box(b"mdia", mdhd + hdlr + minf)
                moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
                payloads.append(ftyp + mdat + moov)
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def _ogg_crc(page: bytes) -> int:
    """Ogg page CRC32: polynomial 0x04c11db7, no bit reflection, zero
    init/xorout (RFC 3533 §6) — NOT zlib's reflected CRC, so computed
    directly; pages are small and this runs only in the packer."""
    crc = 0
    for b in page:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def _ogg_page_raw(serial: int, seq: int, granule: int, segs: list[int],
                  payload: bytes, htype: int = 0) -> bytes:
    """One RFC 3533 Ogg page with a GENUINE CRC and an EXPLICIT lacing
    table (``len(segs) <= 255`` — the page-format bound)."""
    hdr = (b"OggS" + bytes([0, htype])
           + granule.to_bytes(8, "little", signed=True)
           + serial.to_bytes(4, "little")
           + seq.to_bytes(4, "little")
           + b"\x00\x00\x00\x00"
           + bytes([len(segs)]) + bytes(segs))
    full_page = hdr + payload
    crc = _ogg_crc(full_page)
    return full_page[:22] + crc.to_bytes(4, "little") + full_page[26:]


def _ogg_page(serial: int, seq: int, granule: int, payload: bytes,
              htype: int = 0) -> bytes:
    """One-page packet: 255-wise lacing with a terminating value
    < 255. Payloads above 255*255-1 bytes overflow a single page's
    lacing table — use ``_ogg_packet_pages``."""
    segs = []
    rest = len(payload)
    while True:
        segs.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255
    return _ogg_page_raw(serial, seq, granule, segs, payload, htype)


def _ogg_packet_pages(serial: int, start_seq: int, granule: int,
                      payload: bytes, htype_first: int = 0,
                      htype_last: int = 0) -> tuple[bytes, int]:
    """One packet as however many pages RFC 3533 needs: a page holds
    at most 255 lacing values, so a packet over 255*255-1 bytes spans
    CONTINUATION pages (flag 0x01; non-final pages carry granule -1 —
    no packet completes on them). Returns (pages_bytes, next_seq).
    ``decode_ogg_flac`` reassembles exactly this framing (pinned by
    the continuation test). A one-page packet degenerates to
    ``_ogg_page`` output."""
    n = len(payload)
    segs = [255] * (n // 255) + [n % 255]
    out = []
    off = 0
    n_pages = -(-len(segs) // 255)
    for p in range(n_pages):
        group = segs[p * 255 : (p + 1) * 255]
        body = payload[off : off + sum(group)]
        off += sum(group)
        last = p == n_pages - 1
        htype = (htype_first if p == 0 else 0x01) | (htype_last if last else 0)
        out.append(
            _ogg_page_raw(serial, start_seq + p,
                          granule if last else -1, group, body, htype)
        )
    return b"".join(out), start_seq + n_pages


def pack_ogg_flac(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    n_samples: int = 256,
    widen: bool = True,
) -> Op:
    """Build REAL Ogg FLAC streams (round 10) per the xiph Ogg FLAC
    mapping: a BOS page whose single packet is the 9-byte mapping
    header (0x7F 'FLAC', version 1.0, header-packet count 0) + the
    native fLaC signature + STREAMINFO, then ONE audio page (EOS)
    whose packet is the SAME verbatim 16-bit frame ``pack_flac``
    emits — sample k IS the text's byte k — with genuine RFC 3533
    page CRCs and granule position = ``n_samples`` (Ogg FLAC granules
    are sample numbers). ``decode_media``'s Ogg branch
    (operators/codecs.py::decode_ogg_flac) reassembles the packets
    and feeds the certified native FLAC frame decoder, so the oracle
    replays the decoded sample stats from text bytes exactly as for
    the bare container. NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                native = _flac_text_stream(text.encode("utf-8"), n_samples)
                # native[:42] = fLaC + STREAMINFO block (4 + 4 + 34)
                bos = (b"\x7fFLAC" + bytes([1, 0])
                       + (0).to_bytes(2, "big") + native[:42])
                # the frame packet spans continuation pages above
                # 255*255-1 bytes (n_samples ~> 32.5k) — RFC framing,
                # not a crash (round-10 second review pass)
                frames, _ = _ogg_packet_pages(
                    9, 1, n_samples, native[42:], htype_last=4
                )
                payloads.append(_ogg_page(9, 0, 0, bos, htype=2) + frames)
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def pack_ogg_opus(
    id_col: str = "doc_id",
    text_col: str = "text",
    out_payload: str = "payload",
    max_pages: int = 8,
    widen: bool = True,
) -> Op:
    """Build REAL Ogg Opus streams from the text — RFC 3533 pages with
    GENUINE CRCs: a BOS page carrying an RFC 7845 OpusHead (mono,
    48 kHz input rate, zero pre-skip), an OpusTags comment page, then
    one audio page per 64-byte text chunk (at least 1, at most
    ``max_pages``; the chunk bytes ARE the packet payload — the probe
    never parses them) whose granule positions advance 480 samples
    (10 ms at the fixed 48 kHz Opus granule rate) per page; the last
    page carries EOS. So ``probe_container`` reports duration =
    n_chunks * 10 ms and n_frames (completed packets) = n_chunks + 2
    exactly — both replayable from the text's byte length in the
    oracle. Entropy decode of Opus itself stays environment-gated; the
    CONTAINER is fully real. NULL text packs to NULL payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_payload, T.BinaryType()),
        ]
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as pd

        head = (b"OpusHead" + bytes([1, 1]) + _struct.pack("<H", 0)
                + _struct.pack("<I", 48000) + _struct.pack("<h", 0)
                + b"\x00")
        tags = (b"OpusTags" + _struct.pack("<I", 4) + b"pack"
                + _struct.pack("<I", 0))

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                data = text.encode("utf-8")
                n = max(1, min(max_pages, -(-len(data) // 64)))
                out = (_ogg_page(7, 0, 0, head, htype=2)
                       + _ogg_page(7, 1, 0, tags))
                for i in range(n):
                    chunk = data[i * 64 : (i + 1) * 64] or b"\x00"
                    out += _ogg_page(7, 2 + i, 480 * (i + 1), chunk,
                                     htype=4 if i == n - 1 else 0)
                payloads.append(out)
            yield pd.DataFrame({id_col: pdf[id_col], out_payload: payloads})

    def _apply(df: DataFrame) -> DataFrame:
        return _widen(df.select(id_col, text_col), widen).mapInPandas(
            _pack, out_schema
        )

    return _apply


def decode_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_frames: int = 64,
) -> DataFrame:
    """Per-frame decode of animated containers — GIF 87a/89a
    (codecs.py::decode_gif_frames: GCE disposal/transparency
    compositing, sub-rect placement, bomb-guarded), Motion-JPEG AVI
    (codecs.py::decode_avi_mjpeg_frames: RIFF walk + per-chunk JPEG,
    same budget guards) and Motion-JPEG MP4
    (codecs.py::decode_mp4_mjpeg_frames: ISO-BMFF box walk + stbl
    sample table, round 9), dispatched on magic bytes. One OUTPUT ROW
    PER FRAME of the composited logical screen: frame index, total
    frame count, GCE delay (centiseconds), geometry, exact
    per-channel means (integer sums / pixel count in float64 —
    deterministic), and ``truncated`` — True on every frame row of a
    clip whose decode the shared pixel budget stopped early, so
    motion features downstream can tell a complete clip from a
    budget-capped one instead of silently reading partial video.
    Corrupt/NULL/foreign payloads are error rows, never task
    failures; still images decode as a 1-frame video (parity with
    ``decode_media``'s first-frame view, pinned by test)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("delay_cs", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("truncated", T.BooleanType()),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from rentals_data_pipeline_spark.operators.codecs import (
            _MP4_MAGIC,
            CodecError,
            decode_avi_mjpeg_frames,
            decode_gif_frames,
            decode_mp4_mjpeg_frames,
        )

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append(
                        (doc_id, None, None, None, None, None,
                         None, None, None, None, "null payload")
                    )
                    continue
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        frames, delays, trunc = decode_avi_mjpeg_frames(
                            raw, max_frames=max_frames
                        )
                    elif len(raw) >= 12 and raw[4:8] in _MP4_MAGIC:
                        frames, delays, trunc = decode_mp4_mjpeg_frames(
                            raw, max_frames=max_frames
                        )
                    else:  # GIF path also owns the foreign-magic error
                        frames, delays, trunc = decode_gif_frames(
                            raw, max_frames=max_frames
                        )
                except CodecError as e:
                    rows.append(
                        (doc_id, None, None, None, None, None,
                         None, None, None, None, str(e))
                    )
                    continue
                except Exception as e:  # hostile blob != task failure
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         None, None,
                         f"decode failure: {type(e).__name__}: {str(e)[:120]}")
                    )
                    continue
                n = len(frames)
                for i, (fr, dl) in enumerate(zip(frames, delays)):
                    h, w = fr.shape[:2]
                    sums = fr.reshape(-1, 3).astype("int64").sum(axis=0)
                    cnt = float(h * w)
                    rows.append(
                        (doc_id, i, n, dl, w, h,
                         float(sums[0]) / cnt, float(sums[1]) / cnt,
                         float(sums[2]) / cnt, trunc, None)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def decode_media(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real media decode for every container pure Python can parse —
    magic-byte dispatch to ``operators/codecs.py``: RIFF/WAVE (PCM
    8/16/24/32-bit, IEEE float32/64, G.711 mu-law/A-law, EXTENSIBLE
    wrappers), PNG (8/16-bit; gray/RGB/palette/gray+alpha/RGBA; all
    five scanline filters), GIF 87a/89a first frame (full LZW,
    interlace), BMP (BI_RGB 24/32), baseline-sequential JPEG (Huffman
    + IDCT, 4:2:0/4:2:2/4:4:4, restart intervals, JFIF YCbCr->RGB),
    FLAC (constant/verbatim/fixed/LPC subframes, Rice residuals,
    stereo decorrelation — lossless, bit-exact) and binary PPM P6
    (maxval <= 255).
    mapInPandas over (id, payload) yielding one row per media item with
    ``n_channels``, ``sample_rate`` (NULL for images),
    ``decoded: array<array<double>>`` (one inner array per channel,
    de-interleaved; audio sample values at native width — 8-bit
    unsigned 0..255, wider widths signed, G.711 expanded to 16-bit
    linear — image channels R,G,B(,A) row-major 0..255, 16-bit PNG
    0..65535) and ``decode_error: string`` (NULL on success). Decode
    failures — NULL payloads, foreign magic bytes, truncated
    containers, unsupported sample widths / maxvals — are ROWS, not
    task failures: at 100 TB a corrupt blob must never kill a stage.
    Motion-JPEG video decodes in BOTH mainstream containers — AVI
    (RIFF walk) and, since round 9, MP4 (ISO-BMFF sample-table walk) —
    as a first-frame view here (``decode_video_frames`` is the
    per-frame surface); FLAC-in-Ogg decodes since round 10 (page walk
    + packet reassembly into the native FLAC decoder). Compressed AV
    codecs (H.264-in-MP4, Opus/Vorbis-in-Ogg) stay environment-gated:
    no av libs in this container, so they surface as ``unsupported``
    error rows with the codec/magic recorded for triage.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("decoded", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from rentals_data_pipeline_spark.operators.codecs import (
            CodecError,
            sniff_and_decode,
        )

        for pdf in batches:
            cols: dict[str, list] = {
                id_col: list(pdf[id_col]),
                "n_channels": [],
                "sample_rate": [],
                "decoded": [],
                "decode_error": [],
            }

            def emit(nch=None, sr=None, decoded=None, err=None):
                cols["n_channels"].append(nch)
                cols["sample_rate"].append(sr)
                cols["decoded"].append(decoded)
                cols["decode_error"].append(err)

            for payload in pdf[payload_col]:
                if payload is None:
                    emit(err="null payload")
                    continue
                try:
                    nch, sr, channels = sniff_and_decode(bytes(payload))
                except CodecError as e:  # corrupt blob != task failure
                    emit(err=str(e))
                    continue
                except Exception as e:  # decoder BUG != task failure either:
                    # at 100 TB one hostile blob tripping an unforeseen
                    # IndexError/ValueError must not kill the stage —
                    # surface it as a distinguishable error row instead
                    emit(err=f"decode failure: {type(e).__name__}: {str(e)[:120]}")
                    continue
                emit(nch=nch, sr=sr, decoded=[c.tolist() for c in channels])
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def probe_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Header-only media triage over a binary column: format, codec,
    track count, dimensions, channels, sample rate, duration and the
    header-declared frame/packet count (``n_frames`` — AVI
    dwTotalFrames, MP4 stsz sample count, Ogg completed packets) per
    blob — WITHOUT decoding payload bytes (codecs.py::probe_container).
    Covers every decodable container (incl. MJPEG-in-MP4, decodable
    since round 9) plus the compressed-codec MP4/Ogg blobs this
    environment cannot decode — so a curation pipeline can still
    filter/route/report on AV blobs it will never decode here. At
    100 TB this is the pass that runs on EVERYTHING (cost independent
    of blob size for framed containers) and decides what the
    expensive ``decode_media`` pass touches.
    Corrupt/foreign/NULL blobs are rows carrying ``probe_error``,
    never task failures — same contract as ``decode_media``.
    ``passthrough`` columns ride along untouched (e.g. an event-time
    column, so a streaming triage can watermark the probe output)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *(df.schema[c] for c in passthrough),
            T.StructField("format", T.StringType()),
            T.StructField("codec", T.StringType()),
            T.StructField("n_tracks", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("probe_error", T.StringType()),
        ]
    )
    fields = ("format", "codec", "n_tracks", "width", "height",
              "channels", "sample_rate", "duration_s", "n_frames")

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from rentals_data_pipeline_spark.operators.codecs import (
            CodecError,
            probe_container,
        )

        for pdf in batches:
            cols: dict[str, list] = {id_col: list(pdf[id_col])}
            for c in passthrough:
                cols[c] = list(pdf[c])
            for f in fields:
                cols[f] = []
            cols["probe_error"] = []

            def emit(meta: "dict | None", err: "str | None" = None) -> None:
                for f in fields:
                    cols[f].append(meta.get(f) if meta else None)
                cols["probe_error"].append(err)

            for payload in pdf[payload_col]:
                if payload is None:
                    emit(None, "null payload")
                    continue
                try:
                    emit(probe_container(bytes(payload)))
                except CodecError as e:
                    emit(None, str(e))
                except Exception as e:  # prober BUG != task failure
                    emit(None, f"probe failure: {type(e).__name__}: "
                               f"{str(e)[:120]}")
            yield pd.DataFrame(cols)

    return df.select(id_col, *passthrough, payload_col).mapInPandas(
        _probe, out_schema
    )


def byte_histogram_features(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_bins: int = N_HISTOGRAM_BINS,
) -> Callable[[DataFrame], DataFrame]:
    """Deterministic stand-in feature extractor: normalized ``n_bins``
    byte-value histogram per payload, via Arrow-batched mapInPandas
    (numpy bincount — vectorized, no per-row Python loops). This is the
    exact plumbing shape of a real decode/embed UDF: binary in,
    fixed-dim double vector out, schema declared up front."""

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    width = 256 // n_bins

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:  # null blob -> null features, not a crash
                    feats.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_bins)[:n_bins]
                total = hist.sum()
                feats.append(
                    (hist / total).astype(float).tolist()
                    if total
                    else [0.0] * n_bins
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(id_col, payload_col).mapInPandas(_extract, out_schema)

    return _apply


def frame_sample(
    payload_col: str = "payload",
    frame_size: int = 16,
    stride: int = 4,
    out_col: str = "frames",
) -> Op:
    """Every ``stride``-th fixed-size byte frame of the payload, as
    array<binary> — the video frame-sampling plan shape (codec-free),
    pure built-ins. Frame f starts at byte 1 + f·stride·frame_size."""

    def _apply(df: DataFrame) -> DataFrame:
        p = F.col(payload_col)
        n_frames = F.floor(
            (F.length(p) - F.lit(frame_size)) / F.lit(stride * frame_size)
        ) + F.lit(1)
        idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        frames = F.transform(
            idx,
            lambda f: F.substring(
                p, f * F.lit(stride * frame_size) + 1, F.lit(frame_size)
            ),
        )
        return df.withColumn(
            out_col, F.when(F.length(p) >= frame_size, frames).otherwise(F.array())
        )

    return _apply


def resize_grid(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    src_size: int = 32,
    dst_size: int = 8,
) -> Op:
    """Deterministic stand-in for image resize: interpret the payload's
    first src_size² bytes as a square luma grid (zero-padded if short)
    and block-average it down to dst_size × dst_size, emitted as
    ``resized: array<double>`` (row-major, length dst_size²).

    The Spark-side plumbing — binary column in, Arrow-batched
    mapInPandas, fixed-dim vector out, numpy reshape/mean with no
    per-pixel Python — is exactly what a real decode→resize UDF needs;
    only the "decode" (byte reinterpretation) is fake, per the
    environment's no-codec constraint (see decode_media).
    ``src_size`` must be a multiple of ``dst_size``.
    """
    if src_size % dst_size:
        raise ValueError("src_size must be a multiple of dst_size")
    block = src_size // dst_size

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("resized", T.ArrayType(T.DoubleType())),
        ]
    )

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        n = src_size * src_size
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:  # null blob -> null grid, not a crash
                    out.append(None)
                    continue
                arr = np.frombuffer(payload[:n], dtype=np.uint8)
                if len(arr) < n:
                    arr = np.pad(arr, (0, n - len(arr)))
                grid = arr.reshape(src_size, src_size).astype(np.float64)
                small = grid.reshape(
                    dst_size, block, dst_size, block
                ).mean(axis=(1, 3))
                out.append(small.ravel().tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(id_col, payload_col).mapInPandas(_resize, out_schema)

    return _apply


def audio_energy(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 64,
) -> Op:
    """Deterministic stand-in for audio feature extraction: interpret
    payload bytes as unsigned 8-bit PCM samples and emit per-window RMS
    energy as ``energy: array<double>`` (one value per full ``window``
    of samples; a trailing partial window is dropped, zero-length and
    NULL payloads yield an empty array — NULL media are routine in
    petabyte corpora and must not crash the kernel, matching the
    similarity kernels' NULL-vector treatment).

    Same Arrow/mapInPandas plumbing contract as ``resize_grid``; the
    arithmetic (integer squares summed exactly, divide by a power-of-two
    window, IEEE sqrt) is bit-reproducible in ANSI SQL, so unlike most
    DSP this kernel is hash-certifiable end-to-end.
    """
    if window & (window - 1):
        raise ValueError("window must be a power of two (exact division)")

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("energy", T.ArrayType(T.DoubleType())),
        ]
    )

    def _energy(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append([])
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                n_full = len(arr) // window
                if n_full == 0:
                    out.append([])
                    continue
                w = arr[: n_full * window].reshape(n_full, window)
                out.append(np.sqrt((w * w).sum(axis=1) / window).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "energy": out})

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(id_col, payload_col).mapInPandas(_energy, out_schema)

    return _apply


def audio_dominant_lag(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_samples: int = 160,
    max_lag: int = 16,
) -> Op:
    """Autocorrelation periodicity detection — the classic pitch/
    fundamental-period estimator: over the first ``n_samples`` bytes of
    the payload, score every lag in [1, max_lag] by the raw
    autocorrelation  sum_i v[i] * v[i+lag]  and report the argmax
    (smallest lag wins ties). Payloads shorter than 2 * ``max_lag``
    samples yield NULLs.

    Like ``audio_energy``, this is EXACT DSP: integer sample products
    summed in int64, no floats anywhere — the arithmetic a hash gate
    can certify bit-for-bit from an ANSI oracle. The kernel is an
    Arrow-batched mapInPandas map stage (numpy shifted dot products,
    vectorized per payload), stateless and shuffle-free: at 100 TB it
    fuses into the media scan like every other extractor here.
    """

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("best_lag", T.IntegerType()),
            T.StructField("best_score", T.LongType()),
        ]
    )

    def _lag(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            lags, scores = [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    lags.append(None)
                    scores.append(None)
                    continue
                arr = np.frombuffer(
                    payload[:n_samples], dtype=np.uint8
                ).astype(np.int64)
                m = len(arr)
                if m < 2 * max_lag:
                    lags.append(None)
                    scores.append(None)
                    continue
                sc = np.array(
                    [
                        int(np.dot(arr[: m - lag], arr[lag:]))
                        for lag in range(1, max_lag + 1)
                    ],
                    dtype=np.int64,
                )
                best = int(sc.argmax())  # first max -> smallest lag
                lags.append(best + 1)
                scores.append(int(sc[best]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "best_lag": pd.array(lags, dtype="Int32"),
                    "best_score": pd.array(scores, dtype="Int64"),
                }
            )

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(id_col, payload_col).mapInPandas(_lag, out_schema)

    return _apply


def shot_boundaries(
    payload_col: str = "payload",
    frame_size: int = 64,
    n_bins: int = 16,
    threshold: int | None = None,
) -> Op:
    """Shot-boundary detection, codec-free: consecutive fixed-size
    byte frames are compared by the L1 distance of their ``n_bins``
    byte-value histograms; a jump above ``threshold`` marks a cut —
    the standard first pass of video curation (scene segmentation
    before frame sampling). EXACT arithmetic end to end: integer
    histogram counts, integer L1, integer threshold — hash-certifiable
    like audio_energy/dominant_lag.

    Everything runs INSIDE the row as nested codegen array lambdas
    (frame slice → per-bin filter-count → zip_with |Δ| fold), then one
    posexplode to (id, frame, l1_change, is_boundary) rows — zero
    shuffles before the explode, so at 100 TB this fuses into the
    media scan like every extractor here.
    """
    thr = frame_size // 2 if threshold is None else threshold

    def _apply(df: DataFrame) -> DataFrame:
        # staged columns so each expensive array is built ONCE per row
        # (a single nested expression re-derives the frame's char
        # split + ascii for every one of the 16 bins — measured 14x
        # slower at sf0.1); after the one string->code pass everything
        # is integer-array work
        s = F.decode(F.col(payload_col), "utf-8")
        codes = F.transform(
            F.split(s, ""),
            lambda c: F.floor(F.ascii(c) / F.lit(256 // n_bins)).cast(
                "int"
            ),
        )
        staged = (
            df.select(F.col("doc_id"), F.col(payload_col))
            .withColumn(
                "_nf", F.floor(F.length(s) / F.lit(frame_size)).cast("int")
            )
            .where(F.col("_nf") >= 2)
            .withColumn("_codes", codes)
        )
        frames = F.transform(
            F.sequence(F.lit(0), F.col("_nf") - 1),
            lambda f: F.slice(
                F.col("_codes"), f * F.lit(frame_size) + 1, frame_size
            ),
        )
        staged = staged.withColumn("_frames", frames)
        hists = F.transform(
            F.col("_frames"),
            lambda fr: F.transform(
                F.sequence(F.lit(0), F.lit(n_bins - 1)),
                lambda b: F.size(
                    F.filter(fr, lambda x: x == b)
                ).cast("long"),
            ),
        )
        staged = staged.withColumn("_hists", hists)
        l1 = F.transform(
            F.sequence(F.lit(1), F.col("_nf") - 1),
            lambda f: F.aggregate(
                F.zip_with(
                    F.element_at(F.col("_hists"), f + 1),
                    F.element_at(F.col("_hists"), f),
                    lambda a, b: F.abs(a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        out = staged.select(
            F.col("doc_id"),
            F.posexplode(l1).alias("_p", "l1_change"),
        )
        return out.select(
            "doc_id",
            (F.col("_p") + 1).cast("int").alias("frame"),
            F.col("l1_change").cast("long").alias("l1_change"),
            (F.col("l1_change") > F.lit(thr)).alias("is_boundary"),
        )

    return _apply
