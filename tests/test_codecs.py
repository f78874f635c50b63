"""Tests for the pure-Python media codecs behind ``decode_media``.

Strategy: each test ENCODES a container with an independent writer —
stdlib ``wave`` for PCM WAV (proving byte-parity with the round-5
stdlib-based decoder on its certified subset), hand-built
struct/zlib writers for float/G.711/EXTENSIBLE WAV, PNG, GIF and BMP —
then decodes and compares planes against the known pixels/samples.
The GIF writer is a real LZW compressor kept in code-width sync with
the decoder, so dictionary growth, width bumps and the KwKwK case are
exercised by construction, not by luck.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from rentals_data_pipeline_spark.operators import codecs as C
from rentals_data_pipeline_spark.operators import multimodal as MM

# ---------------------------------------------------------------------------
# encoders (test-side, independent of the decoders under test)
# ---------------------------------------------------------------------------


def _wav(fmt_code: int, nch: int, sr: int, bits: int, data: bytes,
         extensible: bool = False) -> bytes:
    """Minimal RIFF/WAVE writer for arbitrary format codes."""
    if extensible:
        # cbSize=22, wValidBits, dwChannelMask, SubFormat GUID whose
        # first two bytes are the wrapped code.
        sub = struct.pack("<H", fmt_code) + b"\x00\x00" + bytes(12)
        body = struct.pack(
            "<HHIIHHHHI", 0xFFFE, nch, sr, sr * nch * bits // 8,
            nch * bits // 8, bits, 22, bits, 0,
        ) + sub
    else:
        body = struct.pack(
            "<HHIIHH", fmt_code, nch, sr, sr * nch * bits // 8,
            nch * bits // 8, bits,
        )
    chunks = b"fmt " + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


_PNG_FILTERS = {0: "none", 1: "sub", 2: "up", 3: "average", 4: "paeth"}


def _png_filter_row(ft: int, row: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Apply (encode-direction) PNG filter ``ft`` to one recon row."""
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int32)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - up
    elif ft == 3:
        out = r - ((left + up) >> 1)
    else:  # paeth
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        out = r - pred
    return (out % 256).astype(np.uint8)


def _png(pixels: np.ndarray, color: int, depth: int = 8,
         plte: bytes | None = None, interlace: int = 0,
         filters: list[int] | None = None) -> bytes:
    """Encode ``pixels`` (h, w, nch) with a chosen per-row filter type."""
    h, w, nch = pixels.shape

    def pack_subbyte(vals2d):  # MSB-first bit packing, rows byte-padded
        hh, ww = vals2d.shape
        bits = (
            (vals2d[:, :, None].astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(hh, ww * depth)
        return np.packbits(bits, axis=1)

    if depth < 8:
        assert nch == 1
        rows = pack_subbyte(pixels[:, :, 0])
        bpp = 1
    elif depth == 16:
        raw = pixels.astype(">u2").tobytes()
        bpp = nch * 2
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * bpp)
    else:
        raw = pixels.astype(np.uint8).tobytes()
        bpp = nch
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * bpp)
    scan = bytearray()
    if interlace == 1:
        # true Adam7: each pass is its own filtered sub-image
        fi = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            subpx = pixels[y0::dy, x0::dx, :]
            ch_, cw_ = subpx.shape[0], subpx.shape[1]
            if ch_ == 0 or cw_ == 0:
                continue
            if depth < 8:
                srows = pack_subbyte(subpx[:, :, 0])
            elif depth == 16:
                srows = np.frombuffer(
                    np.ascontiguousarray(subpx).astype(">u2").tobytes(),
                    dtype=np.uint8,
                ).reshape(ch_, cw_ * bpp)
            else:
                srows = np.ascontiguousarray(subpx).astype(
                    np.uint8
                ).reshape(ch_, cw_ * bpp)
            prev = np.zeros(srows.shape[1], dtype=np.uint8)
            for y in range(ch_):
                ft = filters[fi % len(filters)] if filters else fi % 5
                fi += 1
                scan.append(ft)
                scan += _png_filter_row(ft, srows[y], prev, bpp).tobytes()
                prev = srows[y]
    else:
        filters = filters if filters is not None else [y % 5 for y in range(h)]
        prev = np.zeros(rows.shape[1], dtype=np.uint8)
        for y in range(h):
            ft = filters[y]
            scan.append(ft)
            scan += _png_filter_row(ft, rows[y], prev, bpp).tobytes()
            prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = C._PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
    return out + _png_chunk(b"IEND", b"")


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder kept in width-sync with the decoder under test
    (decoder appends one table entry per post-first code and bumps the
    code width when its table length reaches 2^size)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        # decoder table length after it consumes the code we just
        # emitted will be next_code - 1; mirror its bump rule
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        w = bytes([ch])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(idx: np.ndarray, palette: np.ndarray, interlace: bool = False,
         min_code_size: int = 2) -> bytes:
    """GIF89a writer: global color table, one image descriptor."""
    h, w = idx.shape
    ct_bits = max(1, (len(palette) - 1).bit_length())
    ct = palette.astype(np.uint8).tobytes()
    ct += b"\x00" * (3 * (1 << ct_bits) - len(ct))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    out += ct
    # a comment extension, to prove the skip path
    out += b"\x21\xfe\x05hello\x00"
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _lzw_encode(rows.astype(np.uint8).tobytes(), min_code_size)
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out += b"\x00\x3b"
    return bytes(out)


def _gif_anim(
    screen: tuple,
    palette: np.ndarray,
    frames: list,
    bg_idx: int = 0,
    min_code_size: int = 2,
) -> bytes:
    """GIF89a animation writer: each frame is a dict with ``idx``
    (sub-rect index array), ``left``/``top``, and optional
    ``disposal``/``transparent``/``delay`` emitted as a Graphic
    Control Extension."""
    sw, sh = screen
    ct_bits = max(1, (len(palette) - 1).bit_length())
    ct = palette.astype(np.uint8).tobytes()
    ct += b"\x00" * (3 * (1 << ct_bits) - len(ct))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (ct_bits - 1), bg_idx, 0)
    out += ct
    for f in frames:
        idx = f["idx"]
        h, w = idx.shape
        gp = (f.get("disposal", 0) & 7) << 2
        if f.get("transparent") is not None:
            gp |= 1
        out += b"\x21\xf9\x04" + bytes([gp]) + struct.pack(
            "<H", f.get("delay", 0)
        ) + bytes([f.get("transparent") or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), w, h, 0
        )
        data = _lzw_encode(idx.astype(np.uint8).tobytes(), min_code_size)
        out.append(min_code_size)
        for i in range(0, len(data), 255):
            part = data[i : i + 255]
            out.append(len(part))
            out += part
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """BI_RGB writer; ``pixels`` is (h, w, 3|4) RGB(A), top-down."""
    h, w, nch = pixels.shape
    bits = nch * 8
    stride = (w * nch + 3) & ~3
    bgr = pixels[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    rows = bgr if top_down else bgr[::-1]
    body = bytearray()
    for y in range(h):
        rb = rows[y].astype(np.uint8).tobytes()
        body += rb + b"\x00" * (stride - len(rb))
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bits, 0,
        len(body), 2835, 2835, 0, 0,
    )
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + hdr + bytes(body)
    )


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_stdlib_parity_8_and_16bit():
    """The manual RIFF walk matches stdlib ``wave`` readback exactly on
    the round-5 certified subset (8-bit unsigned / 16-bit signed PCM)."""
    for sw, arr in [
        (1, np.array([0, 1, 128, 255], dtype=np.uint8)),
        (2, np.array([0, 1000, -2000, 32767, -32768, 5, -6], dtype="<i2")),
    ]:
        for nch in (1, 2):
            n = len(arr) - len(arr) % nch
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(nch)
                wf.setsampwidth(sw)
                wf.setframerate(8000)
                wf.writeframes(arr[:n].tobytes())
            got_nch, sr, chans = C.decode_wav(buf.getvalue())
            assert (got_nch, sr) == (nch, 8000)
            for c in range(nch):
                assert chans[c].tolist() == arr[:n][c::nch].astype(float).tolist()


def test_wav_24bit_sign_extension():
    samples = [1, -1, 8388607, -8388608, 0]
    data = b"".join(
        int(s).to_bytes(3, "little", signed=True) for s in samples
    )
    nch, sr, chans = C.decode_wav(_wav(C._WAV_PCM, 1, 16000, 24, data))
    assert (nch, sr) == (1, 16000)
    assert chans[0].tolist() == [float(s) for s in samples]


def test_wav_32bit_and_float():
    ints = np.array([0, 2**31 - 1, -(2**31), 42], dtype="<i4")
    nch, _, chans = C.decode_wav(_wav(C._WAV_PCM, 1, 8000, 32, ints.tobytes()))
    assert chans[0].tolist() == ints.astype(float).tolist()

    f32 = np.array([0.0, -0.5, 1.25, 3.0], dtype="<f4")
    _, _, chans = C.decode_wav(_wav(C._WAV_FLOAT, 1, 8000, 32, f32.tobytes()))
    assert chans[0].tolist() == f32.astype(float).tolist()

    f64 = np.array([0.125, -2.5], dtype="<f8")
    _, _, chans = C.decode_wav(_wav(C._WAV_FLOAT, 1, 8000, 64, f64.tobytes()))
    assert chans[0].tolist() == f64.tolist()


def test_wav_g711_known_values():
    """ITU-T G.711 anchor points: mu-law 0xFF/0x7F are +-0, 0x80 is the
    positive max 32124; A-law 0x55 is -8, 0xAA the positive max 32256;
    both tables are odd-symmetric under sign-bit flip."""
    _, _, chans = C.decode_wav(
        _wav(C._WAV_ULAW, 1, 8000, 8, bytes([0xFF, 0x7F, 0x80]))
    )
    assert chans[0].tolist() == [0.0, 0.0, 32124.0]
    _, _, chans = C.decode_wav(
        _wav(C._WAV_ALAW, 1, 8000, 8, bytes([0x55, 0xAA]))
    )
    assert chans[0].tolist() == [-8.0, 32256.0]
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(C._ULAW[b], -C._ULAW[b ^ 0x80])
    assert np.array_equal(C._ALAW[b], -C._ALAW[b ^ 0x80])


def test_wav_extensible_wrapper_and_stereo_float():
    left = np.array([0.5, -1.0, 2.0], dtype="<f4")
    right = np.array([4.0, 0.25, -8.0], dtype="<f4")
    inter = np.empty(6, dtype="<f4")
    inter[0::2], inter[1::2] = left, right
    raw = _wav(C._WAV_FLOAT, 2, 44100, 32, inter.tobytes(), extensible=True)
    nch, sr, chans = C.decode_wav(raw)
    assert (nch, sr) == (2, 44100)
    assert chans[0].tolist() == left.astype(float).tolist()
    assert chans[1].tolist() == right.astype(float).tolist()


def test_wav_errors():
    with pytest.raises(C.CodecError, match="unsupported wav format"):
        C.decode_wav(_wav(0x0055, 1, 8000, 16, b"\x00\x00"))  # MPEG
    with pytest.raises(C.CodecError, match="missing fmt"):
        C.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(C.CodecError, match="missing data"):
        raw = _wav(C._WAV_PCM, 1, 8000, 16, b"")
        C.decode_wav(raw[: raw.index(b"data")])
    with pytest.raises(C.CodecError, match="unsupported sample width"):
        C.decode_wav(_wav(C._WAV_PCM, 1, 8000, 64, b"\x00" * 8))


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_all_filters_roundtrip():
    """A seeded random RGB image tall enough that every filter type
    (None/Sub/Up/Average/Paeth) encodes at least two rows decodes back
    to the exact pixels."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    nch, sr, chans = C.decode_png(_png(px, color=2))
    assert (nch, sr) == (3, None)
    for c in range(3):
        assert np.array_equal(
            chans[c].reshape(10, 7), px[:, :, c].astype(float)
        )


def test_png_grayscale_and_alpha():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    nch, _, chans = C.decode_png(_png(gray, color=0))
    assert nch == 1
    assert np.array_equal(chans[0], gray.reshape(-1).astype(float))

    ga = rng.integers(0, 256, size=(4, 3, 2), dtype=np.uint8)
    nch, _, chans = C.decode_png(_png(ga, color=4))
    assert nch == 2
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    nch, _, chans = C.decode_png(_png(rgba, color=6))
    assert nch == 4
    for c in range(4):
        assert np.array_equal(chans[c], rgba[:, :, c].reshape(-1).astype(float))


def test_png_16bit_depth():
    px = np.array([[[0], [256]], [[65535], [1000]]], dtype=np.uint16)
    nch, _, chans = C.decode_png(_png(px, color=0, depth=16))
    assert nch == 1
    assert chans[0].tolist() == [0.0, 256.0, 65535.0, 1000.0]


def test_png_palette():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = np.array([[[0], [1]], [[2], [3]]], dtype=np.uint8)
    nch, _, chans = C.decode_png(_png(idx, color=3, plte=pal))
    assert nch == 3
    assert chans[0].tolist() == [255.0, 0.0, 0.0, 7.0]
    assert chans[1].tolist() == [0.0, 255.0, 0.0, 8.0]
    assert chans[2].tolist() == [0.0, 0.0, 255.0, 9.0]


def test_png_subbyte_depths():
    """1/2/4-bit grayscale and palette PNGs: MSB-first bit unpacking
    with byte-padded scanlines, grayscale scaled to 0..255
    (255/(2^d-1)), palette indices used raw — across odd widths (pad
    bits in play), all five filters, and Adam7 interlace."""
    rng = np.random.default_rng(5)
    # grayscale: every depth, odd width, plain + interlaced
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        px = rng.integers(0, mx + 1, size=(9, 13, 1), dtype=np.uint16)
        want = px[:, :, 0].astype(np.float64) * (255.0 / mx)
        for inter in (0, 1):
            nch, _, chans = C.decode_png(
                _png(px, color=0, depth=depth, interlace=inter)
            )
            assert nch == 1
            assert np.allclose(
                chans[0].reshape(9, 13), want, atol=1e-12
            ), (depth, inter)
    # 2-bit palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = rng.integers(0, 4, size=(6, 7, 1), dtype=np.uint16)
    want_rgb = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)[
        idx[:, :, 0]
    ]
    for inter in (0, 1):
        nch, _, chans = C.decode_png(
            _png(idx, color=3, depth=2, plte=pal, interlace=inter)
        )
        assert nch == 3
        for c in range(3):
            assert np.array_equal(
                chans[c].reshape(6, 7), want_rgb[:, :, c].astype(np.float64)
            ), inter
    # spec-illegal combo (RGB at 4-bit) stays a typed error: patch the
    # IHDR depth/color bytes of a valid blob (the test writer refuses
    # to build one)
    bad = bytearray(_png(np.zeros((2, 2, 3), dtype=np.uint16), color=2))
    at = bad.index(b"IHDR") + 4 + 8  # past type + w(4) + h(4)
    bad[at] = 4  # depth; color byte at at+1 stays 2 (RGB)
    with pytest.raises(C.CodecError, match="bit depth"):
        C.decode_png(bytes(bad))


def test_png_adam7_interlaced():
    """Adam7 round-trips bit-exact across color types, depths, odd
    geometries (passes 1-4 empty for tiny images), and all five
    filters; a bad interlace method stays a typed error."""
    rng = np.random.default_rng(9)
    cases = [
        (rng.integers(0, 256, size=(13, 21, 1), dtype=np.uint16), 0, 8),
        (rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint16), 2, 8),
        (rng.integers(0, 65536, size=(9, 7, 4), dtype=np.uint16), 6, 16),
        (rng.integers(0, 256, size=(2, 3, 2), dtype=np.uint16), 4, 8),
        (rng.integers(0, 256, size=(1, 1, 1), dtype=np.uint16), 0, 8),
    ]
    for px, color, depth in cases:
        if depth == 8:
            px = (px % 256).astype(np.uint16)
        plain = C.decode_png(_png(px, color=color, depth=depth))
        inter = C.decode_png(_png(px, color=color, depth=depth, interlace=1))
        assert inter[0] == plain[0]
        for a, b in zip(inter[2], plain[2]):
            assert np.array_equal(a, b), (color, depth, px.shape)
    # palette + Adam7
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = rng.integers(0, 4, size=(11, 5, 1), dtype=np.uint16)
    plain = C.decode_png(_png(idx, color=3, plte=pal))
    inter = C.decode_png(_png(idx, color=3, plte=pal, interlace=1))
    for a, b in zip(inter[2], plain[2]):
        assert np.array_equal(a, b)


def test_png_errors():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    bad = bytearray(_png(px, color=0))
    at = bad.index(b"IHDR") + 4 + 12  # interlace byte of IHDR body
    bad[at] = 2
    with pytest.raises(C.CodecError, match="interlace"):
        C.decode_png(bytes(bad))
    good = _png(px, color=0)
    with pytest.raises(C.CodecError, match="truncated"):
        C.decode_png(good[:20])
    with pytest.raises(C.CodecError, match="bad signature"):
        C.decode_png(b"\x89PNX" + good[4:])
    with pytest.raises(C.CodecError, match="palette index out of range"):
        C.decode_png(_png(px + 5, color=3, plte=bytes([1, 2, 3])))


def test_png_bounded_inflate_defuses_decompression_bomb():
    """A small declared image with a many-MB zlib payload must decode
    only the declared bytes — the inflate is bounded by the dimension
    cap, so the hostile tail is never allocated (pre-fix this
    decompressed ~50 MB for a 64x64 image; a real bomb would be GBs)."""
    w = h = 64
    rows = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 + pixels
    bomb = zlib.compress(rows + bytes(50_000_000))  # tail past declared size
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    nch, _, chans = C.decode_png(raw)
    assert nch == 1 and chans[0].shape == (w * h,)
    assert not chans[0].any()


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

_PAL4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def test_gif_lzw_roundtrip_with_width_bumps():
    """A 16x16 repetitive 4-color frame: min code size 2 forces the LZW
    dictionary through several width bumps (8->16->32->...), and the
    repetition makes multi-byte dictionary hits (and KwKwK) inevitable."""
    y, x = np.mgrid[0:16, 0:16]
    idx = ((x // 2 + y // 3) % 4).astype(np.uint8)
    nch, sr, chans = C.decode_gif(_gif(idx, _PAL4))
    assert (nch, sr) == (3, None)
    for c in range(3):
        assert np.array_equal(
            chans[c].reshape(16, 16), _PAL4[idx][:, :, c].astype(float)
        )


def test_gif_animation_compositing():
    """Multi-frame decode with all three disposal semantics: sub-rect
    placement composites over the previous canvas, transparency lets
    the prior frame show through, disposal=2 resets the frame's rect
    to background, disposal=3 reverts the canvas, and delays surface
    in centiseconds."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    full_red = np.full((4, 4), 1, dtype=np.uint8)
    patch_green = np.full((2, 2), 2, dtype=np.uint8)
    # green patch with a transparent hole at (0, 0)
    holed = patch_green.copy()
    holed[0, 0] = 3
    raw = _gif_anim(
        (4, 4),
        pal,
        [
            {"idx": full_red, "delay": 10},
            # composites at (1,1); disposal=3 -> canvas reverts after
            {"idx": holed, "left": 1, "top": 1, "transparent": 3,
             "disposal": 3, "delay": 20},
            # after revert, a blue patch with disposal=2 -> rect resets
            {"idx": np.full((2, 2), 3, dtype=np.uint8), "left": 2,
             "top": 2, "disposal": 2},
            # final full-transparent frame: canvas shows disposal-2 hole
            {"idx": np.full((1, 1), 0, dtype=np.uint8), "transparent": 0},
        ],
    )
    frames, delays, _ = C.decode_gif_frames(raw)
    assert len(frames) == 4 and delays == [10, 20, 0, 0]
    red, green, blue, black = (
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0],
    )
    assert frames[0].tolist() == [[red] * 4] * 4
    # frame 2: green patch at (1,1)..(2,2) except the transparent hole
    f1 = frames[1].tolist()
    assert f1[1][1] == red  # hole -> red shows through
    assert f1[1][2] == green and f1[2][1] == green and f1[2][2] == green
    assert f1[0][0] == red
    # frame 3: canvas reverted (no green), blue patch at (2,2)..(3,3)
    f2 = frames[2].tolist()
    assert f2[1][1] == red and f2[1][2] == red
    assert f2[2][2] == blue and f2[3][3] == blue
    # frame 4: disposal=2 reset the blue rect to background (black)
    f3 = frames[3].tolist()
    assert f3[2][2] == black and f3[3][3] == black
    assert f3[0][0] == red


def test_gif_animation_caps_and_single_frame_parity():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = (np.arange(16, dtype=np.uint8) % 2).reshape(4, 4)
    frames, _, _ = C.decode_gif_frames(
        _gif_anim((4, 4), pal, [{"idx": idx}] * 10), max_frames=3
    )
    assert len(frames) == 3
    # single-image parity: decode_gif_frames agrees with decode_gif
    raw1 = _gif(idx, pal)
    nch, _, chans = C.decode_gif(raw1)
    f, _, _ = C.decode_gif_frames(raw1)
    assert len(f) == 1
    for c in range(3):
        assert np.array_equal(
            f[0][:, :, c].reshape(-1).astype(np.float64), chans[c]
        )


def test_gif_interlaced():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, size=(8, 5), dtype=np.uint8)
    nch, _, chans = C.decode_gif(_gif(idx, _PAL4, interlace=True))
    assert nch == 3
    for c in range(3):
        assert np.array_equal(
            chans[c].reshape(8, 5), _PAL4[idx][:, :, c].astype(float)
        )


def test_gif_errors():
    idx = np.zeros((2, 2), dtype=np.uint8)
    good = _gif(idx, _PAL4)
    with pytest.raises(C.CodecError, match="unsupported version"):
        C.decode_gif(b"GIF90a" + good[6:])
    with pytest.raises(C.CodecError, match="truncated image data"):
        C.decode_gif(good[:-6])


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_24bit_bottom_up_with_padding():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)  # stride pads
    nch, sr, chans = C.decode_bmp(_bmp(px))
    assert (nch, sr) == (3, None)
    for c in range(3):
        assert np.array_equal(
            chans[c].reshape(2, 3), px[:, :, c].astype(float)
        )


def test_bmp_32bit_top_down():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(3, 2, 4), dtype=np.uint8)
    nch, _, chans = C.decode_bmp(_bmp(px, top_down=True))
    assert nch == 4
    for c in range(4):
        assert np.array_equal(
            chans[c].reshape(3, 2), px[:, :, c].astype(float)
        )


def test_bmp_errors():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    good = _bmp(px)
    with pytest.raises(C.CodecError, match="unsupported bmp compression"):
        bad = bytearray(good)
        bad[30] = 1  # BI_RLE8
        C.decode_bmp(bytes(bad))
    with pytest.raises(C.CodecError, match="truncated pixel data"):
        C.decode_bmp(good[:-2])


# ---------------------------------------------------------------------------
# dispatch + Spark e2e
# ---------------------------------------------------------------------------


def test_sniff_dispatch_unknown_magic():
    with pytest.raises(C.CodecError, match="unsupported codec: magic=00114242"):
        C.sniff_and_decode(b"\x00\x11BBgarbage-magic")
    # OggS magic routes to the Ogg branch since round 10: a torso too
    # short to hold one page header is a parse error, not unknown magic
    with pytest.raises(C.CodecError, match="ogg parse error: no pages"):
        C.sniff_and_decode(b"OggS\x00\x02vorbis-not-parsed")


def test_decode_media_all_containers(spark):
    """One Spark pass over five container formats plus an Ogg blob:
    every format decodes to its known planes; the Ogg is an error
    ROW."""
    png_px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    gif_idx = np.array([[1, 2], [3, 0]], dtype=np.uint8)
    bmp_px = np.arange(100, 112, dtype=np.uint8).reshape(2, 2, 3)
    f32 = np.array([1.5, -2.25], dtype="<f4")
    payloads = [
        (1, bytearray(_png(png_px, color=2))),
        (2, bytearray(_gif(gif_idx, _PAL4))),
        (3, bytearray(_bmp(bmp_px))),
        (4, bytearray(_wav(C._WAV_FLOAT, 1, 22050, 32, f32.tobytes()))),
        (5, bytearray(b"P6\n2 1\n255\n" + bytes(range(6)))),
        (6, bytearray(b"OggS\x00\x02vorbis")),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in MM.decode_media(df).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["n_channels"] == 3
    assert rows[1]["decoded"][0] == [0.0, 3.0, 6.0, 9.0]
    assert rows[2]["decoded"][0] == [255.0, 0.0, 0.0, 0.0]  # R plane
    assert rows[3]["decoded"][2] == [102.0, 105.0, 108.0, 111.0]
    assert rows[4]["sample_rate"] == 22050
    assert rows[4]["decoded"] == [[1.5, -2.25]]
    assert rows[5]["n_channels"] == 3 and rows[5]["sample_rate"] is None
    assert rows[5]["decoded"] == [[0.0, 3.0], [1.0, 4.0], [2.0, 5.0]]
    assert rows[6]["decode_error"].startswith("ogg parse error")


# ---------------------------------------------------------------------------
# property-based roundtrips (pure decoders, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DIMS = st.tuples(st.integers(1, 12), st.integers(1, 12))


@settings(max_examples=40, deadline=None)
@given(
    dims=_DIMS,
    color=st.sampled_from([0, 2, 4, 6]),
    depth=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(dims, color, depth, seed):
    """Any image, any color type, both depths, rotating row filters:
    decode(encode(px)) == px exactly."""
    h, w = dims
    nch = C._PNG_CHANNELS[color]
    rng = np.random.default_rng(seed)
    hi = 65536 if depth == 16 else 256
    px = rng.integers(0, hi, size=(h, w, nch), dtype=np.uint16)
    got_nch, sr, chans = C.decode_png(_png(px, color=color, depth=depth))
    assert (got_nch, sr) == (nch, None)
    for c in range(nch):
        assert np.array_equal(chans[c].reshape(h, w), px[:, :, c].astype(float))


@settings(max_examples=40, deadline=None)
@given(
    dims=_DIMS,
    ncolors=st.sampled_from([2, 4, 16, 256]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(dims, ncolors, interlace, seed):
    """Any palette size (hence any LZW min code size 2..8), interlaced
    or not: the decoded planes equal palette[idx] exactly. Random index
    streams drive the LZW dictionary through arbitrary growth."""
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    mcs = max(2, (ncolors - 1).bit_length())
    raw = _gif(idx, pal, interlace=interlace, min_code_size=mcs)
    nch, sr, chans = C.decode_gif(raw)
    assert (nch, sr) == (3, None)
    want = pal[idx].astype(float)
    for c in range(3):
        assert np.array_equal(chans[c].reshape(h, w), want[:, :, c])


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 64),
    nch=st.integers(1, 4),
    code=st.sampled_from(["pcm16", "pcm24", "pcm32", "f32", "f64"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, nch, code, seed):
    """Any channel count and sample width: interleave -> container ->
    decode de-interleaves to the exact per-channel sequences."""
    rng = np.random.default_rng(seed)
    total = n * nch
    if code == "pcm16":
        vals = rng.integers(-(2**15), 2**15, size=total, dtype="<i2")
        data, fmt, bits = vals.tobytes(), C._WAV_PCM, 16
    elif code == "pcm24":
        vals = rng.integers(-(2**23), 2**23, size=total).astype(np.int64)
        data = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
        fmt, bits = C._WAV_PCM, 24
    elif code == "pcm32":
        vals = rng.integers(-(2**31), 2**31, size=total, dtype="<i4")
        data, fmt, bits = vals.tobytes(), C._WAV_PCM, 32
    elif code == "f32":
        vals = rng.standard_normal(total).astype("<f4")
        data, fmt, bits = vals.tobytes(), C._WAV_FLOAT, 32
    else:
        vals = rng.standard_normal(total).astype("<f8")
        data, fmt, bits = vals.tobytes(), C._WAV_FLOAT, 64
    got_nch, sr, chans = C.decode_wav(_wav(fmt, nch, 8000, bits, data))
    assert (got_nch, sr) == (nch, 8000)
    for c in range(nch):
        assert chans[c].tolist() == [float(v) for v in vals[c::nch]]


@settings(max_examples=40, deadline=None)
@given(
    dims=_DIMS,
    alpha=st.booleans(),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(dims, alpha, top_down, seed):
    h, w = dims
    nch = 4 if alpha else 3
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    got_nch, sr, chans = C.decode_bmp(_bmp(px, top_down=top_down))
    assert (got_nch, sr) == (nch, None)
    for c in range(nch):
        assert np.array_equal(chans[c].reshape(h, w), px[:, :, c].astype(float))


def test_decode_media_empty_frame(spark):
    """Zero-row input: the Arrow stage yields an empty frame with the
    declared schema, no task failures."""
    df = spark.createDataFrame([], "doc_id long, payload binary")
    out = MM.decode_media(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_channels", "sample_rate", "decoded", "decode_error",
    ]


# ---------------------------------------------------------------------------
# JPEG: independent test-side encoder (forward DCT + quant + Huffman)
# ---------------------------------------------------------------------------


class _JpegBits:
    """MSB-first bit writer with JPEG 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0)
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _cat(v):
    return abs(int(v)).bit_length()


def _equal_length_table(symbols):
    """Canonical table with every code the same length L, 2^L > n, so
    the all-ones code stays unused (spec padding rule)."""
    syms = sorted(symbols)
    L = max(2, len(syms).bit_length())
    return {s: (i, L) for i, s in enumerate(syms)}, L, syms


def _dht(tc, th, codes_L_syms):
    _, L, syms = codes_L_syms
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bytes([16 * tc + th]) + bytes(bits) + bytes(syms)


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _encode_jpeg(px, sampling=None, qluma=None, qchroma=None, restart=0):
    """Baseline JFIF encoder: forward orthonormal DCT, quantization,
    equal-length canonical Huffman tables (declared via DHT), optional
    chroma subsampling and restart intervals. Independent of the
    decoder under test; shares only the public zigzag/basis constants."""
    C_ = C._DCT_C
    zz = C._ZZ
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    assert nch in (1, 3)
    if sampling is None:
        sampling = [(1, 1)] * nch
    if qluma is None:
        qluma = np.ones(64, dtype=np.int32)
    if qchroma is None:
        qchroma = qluma
    if nch == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def prep(plane, hs, vs):
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:  # box-average subsample
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        return np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )

    comps = [prep(p, *sampling[i]) for i, p in enumerate(planes)]
    qnat = []
    for i in range(nch):
        qz = qluma if i == 0 else qchroma
        qn = np.zeros(64, dtype=np.float64)
        qn[zz] = qz
        qnat.append(qn.reshape(8, 8))

    # pass 1: MCU-ordered quantized blocks
    mcu_blocks = []  # list per MCU of (comp, zigzag coefs)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        row = []
        for ci in range(nch):
            hs, vs = sampling[ci]
            for by in range(vs):
                for bx in range(hs):
                    r0, c0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    blk = comps[ci][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    F_ = C_ @ blk @ C_.T
                    q = np.round(F_ / qnat[ci]).astype(np.int64)
                    row.append((ci, q.reshape(-1)[zz]))
        mcu_blocks.append(row)

    # pass 2: symbol streams per table class (luma=0, chroma=1)
    def stream(restart_reset):
        preds = [0] * nch
        toks = []  # (cls, 'dc'|'ac', symbol, extra_val, extra_len) or 'rst'
        for mcu, row in enumerate(mcu_blocks):
            if restart and mcu and mcu % restart == 0:
                toks.append(("rst",))
                preds = [0] * nch
            for ci, coef in row:
                cls = 0 if ci == 0 else 1
                diff = int(coef[0]) - preds[ci]
                preds[ci] = int(coef[0])
                s = _cat(diff)
                extra = diff if diff >= 0 else diff + (1 << s) - 1
                toks.append((cls, "dc", s, extra, s))
                run = 0
                for k in range(1, 64):
                    v = int(coef[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        toks.append((cls, "ac", 0xF0, 0, 0))
                        run -= 16
                    s = _cat(v)
                    extra = v if v >= 0 else v + (1 << s) - 1
                    toks.append((cls, "ac", (run << 4) | s, extra, s))
                    run = 0
                if run:
                    toks.append((cls, "ac", 0x00, 0, 0))
        return toks

    toks = stream(restart)
    ncls = 1 if nch == 1 else 2
    dc_tbl = [
        _equal_length_table(
            {t[2] for t in toks if t[0] == c and t[1] == "dc"} or {0}
        )
        for c in range(ncls)
    ]
    ac_tbl = [
        _equal_length_table(
            {t[2] for t in toks if t[0] == c and t[1] == "ac"} or {0}
        )
        for c in range(ncls)
    ]

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes(int(x) for x in qluma)
    if nch == 3:
        dqt += bytes([1]) + bytes(int(x) for x in qchroma)
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nch])
    for ci in range(nch):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, 16 * hs + vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    dht = b"".join(
        _dht(0, c, dc_tbl[c]) + _dht(1, c, ac_tbl[c]) for c in range(ncls)
    )
    out += _seg(0xC4, dht)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([nch])
    for ci in range(nch):
        c = 0 if ci == 0 else 1
        sos += bytes([ci + 1, 16 * c + c])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _JpegBits()
    rst_i = 0
    for t in toks:
        if t[0] == "rst":
            bw.pad()
            out += bw.out
            bw = _JpegBits()
            out += bytes([0xFF, 0xD0 + (rst_i % 8)])
            rst_i += 1
            continue
        cls, kind, sym, extra, elen = t
        code, L = (dc_tbl if kind == "dc" else ac_tbl)[cls][0][sym]
        bw.put(code, L)
        if elen:
            bw.put(extra, elen)
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_jpeg_progressive(
    px,
    sampling=None,
    qluma=None,
    qchroma=None,
    restart=0,
    dc_al=1,
    ac_al=1,
    ac_bands=((1, 5), (6, 63)),
):
    """Progressive JFIF encoder (SOF2): spectral selection +
    successive approximation per ITU-T T.81 G.2, modeled on libjpeg's
    encoder — DC first scan (interleaved, point transform dc_al) and
    bit-per-block DC refinements; per-component AC first scans with
    EOBn run accumulation for each spectral band at ac_al, then AC
    refinement scans with buffered correction bits down to Al=0.
    Independent of the decoder under test; shares only the public
    zigzag/basis constants."""
    C_ = C._DCT_C
    zz = C._ZZ
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    assert nch in (1, 3)
    if sampling is None:
        sampling = [(1, 1)] * nch
    if qluma is None:
        qluma = np.ones(64, dtype=np.int32)
    if qchroma is None:
        qchroma = qluma
    if nch == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def prep(plane, hs, vs):
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            p = np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            plane = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        return np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )

    comps = [prep(p, *sampling[i]) for i, p in enumerate(planes)]
    qnat = []
    for i in range(nch):
        qzv = qluma if i == 0 else qchroma
        qn = np.zeros(64, dtype=np.float64)
        qn[zz] = qzv
        qnat.append(qn.reshape(8, 8))
    # quantized zigzag blocks per comp on the MCU-padded grid
    qblocks = []
    for ci in range(nch):
        hs, vs = sampling[ci]
        bw, bh = mcux * hs, mcuy * vs
        grid = []
        for by in range(bh):
            row = []
            for bx in range(bw):
                blk = comps[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                F_ = C_ @ blk @ C_.T
                q = np.round(F_ / qnat[ci]).astype(np.int64)
                row.append(q.reshape(-1)[zz])
            grid.append(row)
        qblocks.append(grid)
    # non-interleaved (AC-scan) grids: component sample dims, not MCU pad
    nb = []
    for ci in range(nch):
        hs, vs = sampling[ci]
        cw = -(-w * hs // hmax)
        chh = -(-h * vs // vmax)
        nb.append((-(-cw // 8), -(-chh // 8)))

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes(int(x) for x in qluma)
    if nch == 3:
        dqt += bytes([1]) + bytes(int(x) for x in qchroma)
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nch])
    for ci in range(nch):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, 16 * hs + vs, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))

    def tdc(v, al):
        return int(v) >> al  # DC point transform: arithmetic shift

    def tac(v, al):
        a = abs(int(v)) >> al  # AC: magnitude shift (toward zero)
        return -a if v < 0 else a

    def scan_tokens_dc_first(al):
        toks = []
        preds = [0] * nch
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                toks.append(("rst",))
                preds = [0] * nch
            my, mx = divmod(mcu, mcux)
            for ci in range(nch):
                hs, vs = sampling[ci]
                cls = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        v = tdc(qblocks[ci][my * vs + by][mx * hs + bx][0], al)
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _cat(diff)
                        extra = diff if diff >= 0 else diff + (1 << s) - 1
                        toks.append(("sym", ("dc", cls), s))
                        if s:
                            toks.append(("bits", extra, s))
        return toks

    def scan_tokens_dc_refine(al):
        toks = []
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                toks.append(("rst",))
            my, mx = divmod(mcu, mcux)
            for ci in range(nch):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(qblocks[ci][my * vs + by][mx * hs + bx][0])
                        toks.append(("bits", (v >> al) & 1, 1))
        return toks

    def scan_tokens_ac_first(ci, ss, se, al):
        toks = []
        cls = 0 if ci == 0 else 1
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                toks.append(("sym", ("ac", cls), nbits << 4))
                if nbits:
                    toks.append(("bits", eobrun - (1 << nbits), nbits))
                eobrun = 0

        nbw, nbh = nb[ci]
        for unit in range(nbw * nbh):
            if restart and unit and unit % restart == 0:
                flush_eob()
                toks.append(("rst",))
            blk = qblocks[ci][unit // nbw][unit % nbw]
            t = [tac(blk[k], al) for k in range(64)]
            nz = [k for k in range(ss, se + 1) if t[k] != 0]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(ss, nz[-1] + 1):
                if t[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    toks.append(("sym", ("ac", cls), 0xF0))
                    run -= 16
                s = _cat(t[k])
                extra = t[k] if t[k] >= 0 else t[k] + (1 << s) - 1
                toks.append(("sym", ("ac", cls), (run << 4) | s))
                toks.append(("bits", extra, s))
                run = 0
            if nz[-1] < se:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return toks

    def scan_tokens_ac_refine(ci, ss, se, al):
        toks = []
        cls = 0 if ci == 0 else 1
        eobrun = 0
        be: list = []  # correction bits pending behind the EOB run

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                toks.append(("sym", ("ac", cls), nbits << 4))
                if nbits:
                    toks.append(("bits", eobrun - (1 << nbits), nbits))
                for bit in be:
                    toks.append(("bits", bit, 1))
                be.clear()
                eobrun = 0

        nbw, nbh = nb[ci]
        for unit in range(nbw * nbh):
            if restart and unit and unit % restart == 0:
                flush_eob()
                toks.append(("rst",))
            blk = qblocks[ci][unit // nbw][unit % nbw]
            absval = [abs(int(blk[k])) >> al for k in range(64)]
            eob = 0
            for k in range(ss, se + 1):
                if absval[k] == 1:
                    eob = k
            r = 0
            br: list = []  # correction bits pending behind the next symbol
            for k in range(ss, se + 1):
                temp = absval[k]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush_eob()
                    toks.append(("sym", ("ac", cls), 0xF0))
                    r -= 16
                    for bit in br:
                        toks.append(("bits", bit, 1))
                    br.clear()
                if temp > 1:  # history nonzero: one correction bit
                    br.append(temp & 1)
                    continue
                flush_eob()  # newly nonzero: (run, 1) + sign
                toks.append(("sym", ("ac", cls), (r << 4) | 1))
                toks.append(("bits", 1 if blk[k] > 0 else 0, 1))
                for bit in br:
                    toks.append(("bits", bit, 1))
                br.clear()
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return toks

    def emit_scan(scomp_idxs, ss, se, ah, al, toks):
        # per-scan equal-length canonical tables, redefined via DHT
        keys = sorted({t[1] for t in toks if t[0] == "sym"})
        tables = {}
        dht = b""
        for kind, cls in keys:
            tbl = _equal_length_table(
                {t[2] for t in toks if t[0] == "sym" and t[1] == (kind, cls)}
            )
            tables[(kind, cls)] = tbl
            dht += _dht(0 if kind == "dc" else 1, cls, tbl)
        if dht:
            out.extend(_seg(0xC4, dht))
        sos = bytes([len(scomp_idxs)])
        for ci in scomp_idxs:
            cls = 0 if ci == 0 else 1
            sos += bytes([ci + 1, 16 * cls + cls])
        sos += bytes([ss, se, 16 * ah + al])
        out.extend(_seg(0xDA, sos))
        bw_ = _JpegBits()
        rst_i = 0
        for t in toks:
            if t[0] == "rst":
                bw_.pad()
                out.extend(bw_.out)
                out.extend(bytes([0xFF, 0xD0 + (rst_i % 8)]))
                rst_i += 1
                bw_ = _JpegBits()
            elif t[0] == "sym":
                code, ln = tables[t[1]][0][t[2]]
                bw_.put(code, ln)
            else:
                bw_.put(t[1], t[2])
        bw_.pad()
        out.extend(bw_.out)

    all_comps = list(range(nch))
    emit_scan(all_comps, 0, 0, 0, dc_al, scan_tokens_dc_first(dc_al))
    for al in range(dc_al - 1, -1, -1):
        emit_scan(all_comps, 0, 0, al + 1, al, scan_tokens_dc_refine(al))
    for ci in all_comps:
        for ss, se in ac_bands:
            emit_scan([ci], ss, se, 0, ac_al, scan_tokens_ac_first(ci, ss, se, ac_al))
    for al in range(ac_al - 1, -1, -1):
        for ci in all_comps:
            for ss, se in ac_bands:
                emit_scan(
                    [ci], ss, se, al + 1, al,
                    scan_tokens_ac_refine(ci, ss, se, al),
                )
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_uniform_gray_is_exact():
    """Analytic anchor: a constant image is DC-only; with unit quant
    tables the DC path is exact end-to-end, so decode == input exactly
    (this breaks encoder/decoder error-cancellation circularity)."""
    px = np.full((16, 24), 100, dtype=np.uint8)
    nch, sr, chans = C.decode_jpeg(_encode_jpeg(px))
    assert (nch, sr) == (1, None)
    assert np.array_equal(chans[0], np.full(16 * 24, 100.0))


def test_jpeg_grayscale_declared_sampling_factors():
    """ITU-T T.81 A.2.2: a single-component scan uses ONE data unit per
    MCU on a ceil(w/8) x ceil(h/8) grid regardless of the SOF's declared
    sampling factors. Encode a grayscale image at (1,1) — whose entropy
    stream IS the spec's block-raster order — then patch the SOF hv byte
    to 2x2: the file stays spec-valid and must decode identically
    (pre-fix, the hmax/vmax-padded interleaved geometry over-read the
    stream and raised a spurious 'truncated entropy data')."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    raw = _encode_jpeg(px)
    ref_nch, _, ref_chans = C.decode_jpeg(raw)
    sof_at = raw.index(b"\xff\xc0")
    hv_at = sof_at + 2 + 2 + 1 + 2 + 2 + 1 + 1  # marker,len,prec,h,w,ncomp,cid
    assert raw[hv_at] == 0x11
    patched = raw[:hv_at] + b"\x22" + raw[hv_at + 1 :]
    nch, sr, chans = C.decode_jpeg(patched)
    assert (nch, sr) == (ref_nch, None)
    assert np.array_equal(chans[0], ref_chans[0])


def test_jpeg_rgb_444_near_lossless_roundtrip():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    nch, _, chans = C.decode_jpeg(_encode_jpeg(px))
    assert nch == 3
    worst = max(
        np.abs(chans[c].reshape(24, 17) - px[:, :, c]).max() for c in range(3)
    )
    assert worst <= 4.0  # unit quant: only DCT-coefficient rounding


def test_jpeg_420_subsampling_and_restart():
    """4:2:0 MCU interleave + upsampling + restart markers: use an
    R=G=B image so chroma is exactly 128 (subsampling lossless) and the
    luma path bounds the error; DRI=2 forces three restart segments."""
    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, size=(24, 20), dtype=np.uint8)
    px = np.stack([gray] * 3, axis=2)
    raw = _encode_jpeg(
        px, sampling=[(2, 2), (1, 1), (1, 1)], restart=2
    )
    assert b"\xff\xd0" in raw or b"\xff\xd1" in raw  # RST really emitted
    nch, _, chans = C.decode_jpeg(raw)
    assert nch == 3
    for c in range(3):
        err = np.abs(chans[c].reshape(24, 20) - gray).max()
        assert err <= 4.0


def test_jpeg_coarse_quant_uniform_blocks():
    """Uniform image under a COARSE table: only the DC survives, and
    the error is bounded by q00/16 per the DC arithmetic."""
    q = np.full(64, 16, dtype=np.int32)
    px = np.full((8, 8), 77, dtype=np.uint8)
    _, _, chans = C.decode_jpeg(_encode_jpeg(px, qluma=q))
    assert np.all(np.abs(chans[0] - 77.0) <= 1.5)


def test_jpeg_unsupported_modes_are_rows():
    px = np.full((8, 8), 50, dtype=np.uint8)
    good = _encode_jpeg(px)
    # SOF0 re-marked as SOF2 routes to the progressive decoder, where a
    # baseline full-band scan (Ss=0, Se=63) is a spec violation — a
    # typed error row, not a crash or a silent wrong decode
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(C.CodecError, match="bad spectral range"):
        C.decode_jpeg(prog)
    with pytest.raises(C.CodecError, match="truncated"):
        C.decode_jpeg(good[:20])
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(C.CodecError, match="non-baseline"):
        C.decode_jpeg(arith)


def test_jpeg_progressive_gray_matches_sequential():
    """Progressive and sequential encodings of the SAME quantized
    coefficients must decode bit-identically: both decoders
    reconstruct exact integer coefficients, and dequant/IDCT/crop are
    shared code. 16x24 exercises partial edge blocks; (dc_al, ac_al)
    up to 2 exercises multi-pass successive approximation."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    _, _, base = C.decode_jpeg(_encode_jpeg(px))
    for dc_al, ac_al in ((1, 1), (2, 2), (0, 1)):
        nch, sr, chans = C.decode_jpeg(
            _encode_jpeg_progressive(px, dc_al=dc_al, ac_al=ac_al)
        )
        assert (nch, sr) == (1, None)
        assert np.array_equal(chans[0], base[0]), (dc_al, ac_al)


def test_jpeg_progressive_rgb_420_restart_matches_sequential():
    """Color progressive with 4:2:0 subsampling, coarse quant tables,
    restart intervals, and three spectral bands: the DC scan is
    interleaved over the MCU-padded grid while AC scans walk each
    component's own non-interleaved grid — the geometry split the
    sequential decoder never exercises."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    q = np.full(64, 8, dtype=np.int32)
    q[0] = 4
    kw = dict(sampling=[(2, 2), (1, 1), (1, 1)], qluma=q, qchroma=q)
    _, _, base = C.decode_jpeg(_encode_jpeg(px, restart=2, **kw))
    nch, sr, chans = C.decode_jpeg(
        _encode_jpeg_progressive(
            px, restart=2, ac_bands=((1, 2), (3, 20), (21, 63)), **kw
        )
    )
    assert (nch, sr) == (3, None)
    for got, want in zip(chans, base):
        assert np.array_equal(got, want)


def test_jpeg_progressive_eobrun_sparse():
    """A nearly-flat image with one busy corner forces long multi-block
    EOBn runs in both first and refinement AC scans — the run-length
    machinery a dense image never touches. Verified bit-identical to
    the sequential decode of the same coefficients."""
    px = np.full((40, 48), 128, dtype=np.uint8)
    rng = np.random.default_rng(3)
    px[:8, :8] = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    px[32:, 40:] = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    _, _, base = C.decode_jpeg(_encode_jpeg(px))
    raw = _encode_jpeg_progressive(px, ac_al=2)
    _, _, chans = C.decode_jpeg(raw)
    assert np.array_equal(chans[0], base[0])


def test_jpeg_progressive_empty_scan_header_typed_error():
    """A progressive SOS with Ns=0 passes the length math but must be
    a typed CodecError, not an IndexError leaking from the component
    lookup (review finding)."""
    px = np.full((8, 8), 50, dtype=np.uint8)
    raw = bytearray(_encode_jpeg_progressive(px))
    i = raw.index(b"\xff\xda")
    # rewrite the first SOS as Ns=0: length 2+4, body [0, Ss, Se, AhAl]
    patched = bytes(raw[:i]) + b"\xff\xda\x00\x06\x00\x00\x00\x10" + bytes(
        raw[i + 2 + int.from_bytes(raw[i + 2 : i + 4], "big") :]
    )
    with pytest.raises(C.CodecError, match="empty scan header"):
        C.decode_jpeg(patched)


def test_jpeg_non_interleaved_multiscan_refused():
    """A 3-component frame whose first SOS covers only 1 component
    (spec-legal non-interleaved baseline) must be an error row, not a
    silent 1-channel 'success' that drops the chroma."""
    px = np.full((8, 8, 3), 90, dtype=np.uint8)
    raw = _encode_jpeg(px)
    i = raw.index(b"\xff\xda")
    ln = int.from_bytes(raw[i + 2 : i + 4], "big")
    body = raw[i + 4 : i + 2 + ln]
    one = bytes([1]) + body[1:3] + body[-3:]  # ns=1, first comp, Ss/Se/AhAl
    hacked = raw[:i] + b"\xff\xda" + struct.pack(">H", 2 + len(one)) + one + raw[i + 2 + ln :]
    with pytest.raises(C.CodecError, match="non-interleaved"):
        C.decode_jpeg(hacked)


def test_flac_hostile_declared_total_rejected():
    """A KB-scale blob whose STREAMINFO declares hundreds of millions
    of samples must be refused BEFORE any per-sample allocation."""
    raw = bytearray(_encode_flac([[0] * 16]))
    info = 8  # 4-byte magic + 4-byte block header
    raw[info + 13] |= 0x0F
    raw[info + 14 : info + 18] = b"\xff\xff\xff\xff"  # total ~= 2^36
    with pytest.raises(C.CodecError, match="implausible sample count"):
        C.decode_flac(bytes(raw))


@settings(max_examples=25, deadline=None)
@given(
    dims=st.tuples(st.integers(8, 40), st.integers(8, 40)),
    color=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(dims, color, seed):
    """Any size (non-multiple-of-8 included), gray or RGB: unit-quant
    roundtrip error stays within the DCT rounding bound."""
    h, w = dims
    rng = np.random.default_rng(seed)
    if color:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    else:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    nch, _, chans = C.decode_jpeg(_encode_jpeg(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert nch == want.shape[2]
    for c in range(nch):
        assert np.abs(chans[c].reshape(h, w) - want[:, :, c]).max() <= 4.0


@settings(max_examples=15, deadline=None)
@given(
    dims=st.tuples(st.integers(8, 40), st.integers(8, 40)),
    color=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_property_matches_sequential(dims, color, seed):
    """ANY geometry (partial edge blocks included), gray or RGB:
    the progressive encoding of the same quantized coefficients
    decodes bit-identically to the sequential one."""
    h, w = dims
    rng = np.random.default_rng(seed)
    if color:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    else:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    _, _, base = C.decode_jpeg(_encode_jpeg(px))
    nch, _, chans = C.decode_jpeg(_encode_jpeg_progressive(px))
    assert len(chans) == len(base)
    for got, want in zip(chans, base):
        assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# FLAC: independent test-side encoder (lossless -> roundtrips are EXACT)
# ---------------------------------------------------------------------------


class _FlacWriterBits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def sput(self, v, length):
        self.put(v & ((1 << length) - 1), length)

    def align(self):
        while self.n:
            self.put(0, 1)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe_bits(bw, samples, bps, kind):
    bw.put(0, 1)  # padding
    if kind == "constant":
        assert len(set(samples)) == 1
        bw.put(0, 6)
        bw.put(0, 1)  # no wasted bits
        bw.sput(int(samples[0]), bps)
        return
    if kind == "verbatim":
        bw.put(1, 6)
        bw.put(0, 1)
        for s in samples:
            bw.sput(int(s), bps)
        return
    # "fixedK"; a real encoder never picks order > block length
    order = min(int(kind[-1]), len(samples))
    bw.put(8 + order, 6)
    bw.put(0, 1)
    for s in samples[:order]:
        bw.sput(int(s), bps)
    coefs = _FIXED[order]
    res = [
        int(samples[i]) - sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    zig = [2 * r if r >= 0 else -2 * r - 1 for r in res]
    bw.put(0, 2)  # rice (4-bit params)
    bw.put(0, 4)  # partition order 0
    param = max((z.bit_length() for z in zig), default=0)
    if param > 14:  # escaped raw partition
        bw.put(15, 4)
        nb = max(r.bit_length() + 1 for r in res)
        bw.put(nb, 5)
        for r in res:
            bw.sput(r, nb)
    else:
        bw.put(param, 4)
        for z in zig:
            q = z >> param
            bw.put(1, q + 1)  # q zeros then a one
            if param:
                bw.put(z & ((1 << param) - 1), param)


def _encode_flac(channels, sr=44100, bps=16, block_size=None, kind="verbatim",
                 stereo_mode="independent"):
    """Spec-shaped FLAC writer: STREAMINFO + fixed-blocking frames.
    CRC bytes are written as zero (the decoder under test consumes but
    does not verify them, PNG-style)."""
    nch = len(channels)
    total = len(channels[0])
    block_size = block_size or max(total, 16)
    bw = _FlacWriterBits()
    bw.put(0x664C6143, 32)  # fLaC
    bw.put(0x80, 8)  # last block, STREAMINFO
    bw.put(34, 24)
    bw.put(block_size, 16)
    bw.put(block_size, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(sr, 20)
    bw.put(nch - 1, 3)
    bw.put(bps - 1, 5)
    bw.put(total, 36)
    for _ in range(16):
        bw.put(0, 8)  # md5 zeros
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps]
    nframes = -(-total // block_size) if total else 1
    for f in range(nframes):
        lo, hi = f * block_size, min((f + 1) * block_size, total)
        bs = hi - lo
        bw.put(0x3FFE, 14)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(7, 4)  # explicit 16-bit block size
        bw.put(0, 4)  # rate from STREAMINFO
        ch_code = {"independent": nch - 1, "left-side": 8}[stereo_mode]
        bw.put(ch_code, 4)
        bw.put(ss_code, 3)
        bw.put(0, 1)
        assert f < 128
        bw.put(f, 8)  # UTF-8 frame number, single byte
        bw.put(bs - 1, 16)
        bw.put(0, 8)  # CRC-8 (unverified)
        if stereo_mode == "left-side":
            left = channels[0][lo:hi]
            side = [int(a) - int(b) for a, b in zip(left, channels[1][lo:hi])]
            _flac_subframe_bits(bw, left, bps, kind)
            _flac_subframe_bits(bw, side, bps + 1, kind)
        else:
            for c in range(nch):
                _flac_subframe_bits(bw, channels[c][lo:hi], bps, kind)
        bw.align()
        bw.put(0, 16)  # CRC-16 (unverified)
    return bytes(bw.out)


def test_flac_constant_and_verbatim_exact():
    const = np.full(100, -12345, dtype=np.int64)
    nch, sr, chans = C.decode_flac(_encode_flac([const], kind="constant"))
    assert (nch, sr) == (1, 44100)
    assert chans[0].tolist() == const.astype(float).tolist()

    rng = np.random.default_rng(2)
    l = rng.integers(-(2**15), 2**15, size=130, dtype=np.int64)
    r = rng.integers(-(2**15), 2**15, size=130, dtype=np.int64)
    raw = _encode_flac([l, r], sr=48000, block_size=48)  # 3 frames
    nch, sr, chans = C.decode_flac(raw)
    assert (nch, sr) == (2, 48000)
    assert chans[0].tolist() == l.astype(float).tolist()
    assert chans[1].tolist() == r.astype(float).tolist()


def test_flac_fixed_predictor_rice_exact():
    """Order-2 fixed predictor over a noisy ramp: small residuals ride
    the rice path; FLAC is lossless so equality is exact."""
    rng = np.random.default_rng(3)
    n = 200
    ramp = (np.arange(n) * 7 + rng.integers(-5, 6, size=n)).astype(np.int64)
    raw = _encode_flac([ramp], kind="fixed2", block_size=64)
    _, _, chans = C.decode_flac(raw)
    assert chans[0].tolist() == ramp.astype(float).tolist()


def test_flac_escaped_partition_exact():
    """Residuals too wide for a rice param (max 14 bits) force the
    escaped raw-bits partition path."""
    jumps = np.array([0, 30000, -30000, 29999, -29998, 5, -5, 0], dtype=np.int64)
    raw = _encode_flac([jumps], kind="fixed1")
    _, _, chans = C.decode_flac(raw)
    assert chans[0].tolist() == jumps.astype(float).tolist()


def test_flac_left_side_stereo_exact():
    rng = np.random.default_rng(4)
    l = rng.integers(-1000, 1000, size=96, dtype=np.int64)
    r = l + rng.integers(-50, 50, size=96)  # correlated -> small side
    raw = _encode_flac([l, r], stereo_mode="left-side", kind="fixed1")
    nch, _, chans = C.decode_flac(raw)
    assert nch == 2
    assert chans[0].tolist() == l.astype(float).tolist()
    assert chans[1].tolist() == r.astype(float).tolist()


def test_flac_errors():
    good = _encode_flac([np.zeros(10, dtype=np.int64)])
    with pytest.raises(C.CodecError, match="bad signature"):
        C.decode_flac(b"fLaX" + good[4:])
    with pytest.raises(C.CodecError, match="truncated|lost frame sync"):
        C.decode_flac(good[:30])


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 300),
    nch=st.integers(1, 3),
    bps=st.sampled_from([8, 16, 24]),
    kind=st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]),
    bsz=st.sampled_from([16, 48, 4096]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, nch, bps, kind, bsz, seed):
    """Lossless: any signal, width, channel count, predictor order and
    framing decodes to EXACTLY the input samples."""
    rng = np.random.default_rng(seed)
    hi = 1 << (bps - 1)
    chans_in = [
        rng.integers(-hi, hi, size=n, dtype=np.int64) for _ in range(nch)
    ]
    raw = _encode_flac(chans_in, bps=bps, kind=kind, block_size=bsz)
    nch_out, sr, chans = C.decode_flac(raw)
    assert (nch_out, sr) == (nch, 44100)
    for c in range(nch):
        assert chans[c].tolist() == chans_in[c].astype(float).tolist()


def test_decode_media_flac_payload(spark):
    rng = np.random.default_rng(8)
    sig = rng.integers(-2000, 2000, size=64, dtype=np.int64)
    raw = _encode_flac([sig], sr=22050, kind="fixed2")
    df = spark.createDataFrame(
        [(1, bytearray(raw))], "doc_id long, payload binary"
    )
    row = MM.decode_media(df).collect()[0]
    assert row["decode_error"] is None
    assert row["n_channels"] == 1 and row["sample_rate"] == 22050
    assert row["decoded"] == [sig.astype(float).tolist()]


# ---------------------------------------------------------------------------
# AVI / MJPEG: test-side RIFF writer (independent of the decoder; uses
# the proven _encode_jpeg for frame payloads)
# ---------------------------------------------------------------------------


def _riff_chunk(fcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fcc + len(body).to_bytes(4, "little") + body + pad


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def _avi_mjpeg(
    jpeg_frames,
    w,
    h,
    fps=10,
    handler=b"MJPG",
    strf_comp=b"MJPG",
    audio_first=False,
    rec_wrap=False,
    drops=(),
):
    """Minimal spec-shaped AVI: RIFF(AVI )/LIST hdrl(avih + strl per
    stream)/LIST movi. ``audio_first`` prepends an auds stream so the
    video stream is #1 and its chunks are '01dc' (plus skippable '00wb'
    audio chunks); ``rec_wrap`` nests the frame chunks in a 'rec '
    LIST; ``drops`` marks frame indices written as zero-size chunks."""
    strh_v = (
        b"vids" + handler + bytes(12)
        + (1).to_bytes(4, "little") + fps.to_bytes(4, "little") + bytes(28)
    )
    strf_v = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + strf_comp + bytes(20)
    )
    strl_v = _riff_list(
        b"strl", _riff_chunk(b"strh", strh_v) + _riff_chunk(b"strf", strf_v)
    )
    strls = strl_v
    n_streams = 1
    if audio_first:
        strh_a = (
            b"auds" + bytes(16)
            + (1).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + bytes(28)
        )
        strls = _riff_list(b"strl", _riff_chunk(b"strh", strh_a)) + strl_v
        n_streams = 2
    avih = struct.pack(
        "<14I", 10**6 // fps, 0, 0, 0, len(jpeg_frames), 0, n_streams,
        0, w, h, 0, 0, 0, 0,
    )
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih) + strls)
    vid = b"01" if audio_first else b"00"
    movi_body = b""
    if audio_first:
        movi_body += _riff_chunk(b"00wb", b"\x80" * 11)  # skipped
    frames_body = b""
    for i, jf in enumerate(jpeg_frames):
        frames_body += _riff_chunk(vid + b"dc", b"" if i in drops else jf)
    if rec_wrap:
        movi_body += _riff_list(b"rec ", frames_body)
    else:
        movi_body += frames_body
    movi = _riff_list(b"movi", movi_body)
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def _expected_frame(jf: bytes) -> np.ndarray:
    nch, _, planes = C.decode_jpeg(jf)
    if nch == 1:
        side = int(round(len(planes[0]) ** 0.5))
        return np.repeat(
            planes[0].astype(np.uint8).reshape(side, -1, 1), 3, 2
        )
    n = len(planes[0])
    side = int(round(n ** 0.5))
    return np.stack(
        [p.astype(np.uint8).reshape(side, -1) for p in planes], axis=2
    )


def test_avi_mjpeg_grayscale_roundtrip():
    """Frames decode bit-exactly to what decode_jpeg yields for each
    chunk's blob (gray replicated to 3 channels), delays from
    strh scale/rate in centiseconds."""
    rng = np.random.default_rng(42)
    blobs = [
        _encode_jpeg(rng.integers(0, 256, size=(16, 16), dtype=np.uint8))
        for _ in range(3)
    ]
    frames, delays, _ = C.decode_avi_mjpeg_frames(
        _avi_mjpeg(blobs, 16, 16, fps=20)
    )
    assert len(frames) == 3 and delays == [5, 5, 5]
    for fr, jf in zip(frames, blobs):
        assert fr.shape == (16, 16, 3)
        assert np.array_equal(fr, _expected_frame(jf))


def test_avi_mjpeg_color_and_progressive_frames():
    """Color baseline and progressive JPEG frames both ride the same
    chunk walk (the decoder dispatches internally on SOF2)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    blobs = [_encode_jpeg(px), _encode_jpeg_progressive(gray)]
    frames, delays, _ = C.decode_avi_mjpeg_frames(_avi_mjpeg(blobs, 8, 8))
    assert len(frames) == 2 and delays == [10, 10]
    assert np.array_equal(frames[0], _expected_frame(blobs[0]))
    assert np.array_equal(frames[1], _expected_frame(blobs[1]))


def test_avi_mjpeg_audio_stream_and_rec_list():
    """Video as stream #1 behind an audio stream: '00wb' chunks skip,
    '01dc' chunks decode, 'rec ' LIST recursion reaches the frames."""
    px = np.full((8, 8), 77, dtype=np.uint8)
    blobs = [_encode_jpeg(px)] * 2
    raw = _avi_mjpeg(blobs, 8, 8, audio_first=True, rec_wrap=True)
    frames, delays, _ = C.decode_avi_mjpeg_frames(raw)
    assert len(frames) == 2
    assert all(np.all(fr == 77) for fr in frames)


def test_avi_mjpeg_dropped_frames_extend_delay():
    """Zero-size video chunks are dropped frames: no new image, the
    previous frame's delay extends (standard MJPEG padding)."""
    px0 = np.full((8, 8), 10, dtype=np.uint8)
    px1 = np.full((8, 8), 200, dtype=np.uint8)
    blobs = [_encode_jpeg(px0), _encode_jpeg(px0), _encode_jpeg(px1)]
    raw = _avi_mjpeg(blobs, 8, 8, fps=10, drops=(1,))
    frames, delays, _ = C.decode_avi_mjpeg_frames(raw)
    assert len(frames) == 2
    assert delays == [20, 10]  # frame 0 held through the drop
    assert np.all(frames[0] == 10) and np.all(frames[1] == 200)


def test_avi_mjpeg_max_frames_cap():
    px = np.full((8, 8), 50, dtype=np.uint8)
    blobs = [_encode_jpeg(px)] * 5
    frames, delays, _ = C.decode_avi_mjpeg_frames(
        _avi_mjpeg(blobs, 8, 8), max_frames=2
    )
    assert len(frames) == 2 and len(delays) == 2


def test_avi_mjpeg_rejects_non_mjpeg_codec():
    px = np.full((8, 8), 50, dtype=np.uint8)
    raw = _avi_mjpeg(
        [_encode_jpeg(px)], 8, 8, handler=b"H264", strf_comp=b"H264"
    )
    with pytest.raises(C.CodecError, match="unsupported avi codec: H264"):
        C.decode_avi_mjpeg_frames(raw)


def test_avi_mjpeg_malformed_raise_codecerror():
    px = np.full((8, 8), 50, dtype=np.uint8)
    good = _avi_mjpeg([_encode_jpeg(px)], 8, 8)
    with pytest.raises(C.CodecError, match="bad signature"):
        C.decode_avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # a chunk size overrunning its parent
    bad = bytearray(good)
    at = bad.index(b"00dc") + 4
    bad[at : at + 4] = (2**30).to_bytes(4, "little")
    with pytest.raises(C.CodecError, match="overruns parent"):
        C.decode_avi_mjpeg_frames(bytes(bad))
    # movi with no hdrl
    movi = _riff_list(b"movi", _riff_chunk(b"00dc", _encode_jpeg(px)))
    payload = b"AVI " + movi
    naked = b"RIFF" + len(payload).to_bytes(4, "little") + payload
    with pytest.raises(C.CodecError, match="movi before hdrl"):
        C.decode_avi_mjpeg_frames(naked)


def test_avi_rec_nesting_bomb_raises_codecerror():
    """Hostile nesting: thousands of nested 'rec ' LISTs must raise
    CodecError (depth cap), never RecursionError — the contract every
    caller of the corrupt-blob-is-a-row pipeline relies on."""
    inner = _riff_chunk(b"00dc", b"")
    for _ in range(3000):
        inner = _riff_list(b"rec ", inner)
    px = np.full((8, 8), 9, dtype=np.uint8)
    good = _avi_mjpeg([_encode_jpeg(px)], 8, 8)
    movi_list_at = good.index(b"movi") - 8  # back over LIST hdr + size
    # splice the bomb in place of the original movi LIST
    payload = good[8:movi_list_at]
    body = b"movi" + inner
    bomb = payload + b"LIST" + len(body).to_bytes(4, "little") + body
    raw = b"RIFF" + len(bomb).to_bytes(4, "little") + bomb
    with pytest.raises(C.CodecError, match="nesting too deep"):
        C.decode_avi_mjpeg_frames(raw)


def test_avi_leading_dropped_frame_preserves_duration():
    """A zero-size chunk BEFORE the first decoded frame charges its
    delay to that first frame (declared duration survives), mirroring
    how mid-stream drops extend the previous frame."""
    px0 = np.full((8, 8), 10, dtype=np.uint8)
    px1 = np.full((8, 8), 200, dtype=np.uint8)
    blobs = [_encode_jpeg(px0), _encode_jpeg(px0), _encode_jpeg(px1)]
    raw = _avi_mjpeg(blobs, 8, 8, fps=10, drops=(0,))
    frames, delays, _ = C.decode_avi_mjpeg_frames(raw)
    assert len(frames) == 2
    assert delays == [20, 10] and sum(delays) == 30
    assert np.all(frames[0] == 10) and np.all(frames[1] == 200)


def test_avi_nul_handler_falls_back_to_strf_compression():
    """Real-world encoder shape: blank/NUL strh handler with MJPG in
    strf biCompression — the decoder accepts it, and the probe must
    report 'mjpeg' (never NUL bytes in the codec column)."""
    px = np.full((8, 8), 33, dtype=np.uint8)
    raw = _avi_mjpeg(
        [_encode_jpeg(px)], 8, 8, handler=b"\x00\x00\x00\x00",
        strf_comp=b"MJPG",
    )
    frames, _, _ = C.decode_avi_mjpeg_frames(raw)
    assert len(frames) == 1 and np.all(frames[0] == 33)
    assert C.probe_container(raw)["codec"] == "mjpeg"
    # and the unsupported-codec error names the field that carries a
    # codec, not four NUL bytes
    bad = _avi_mjpeg(
        [_encode_jpeg(px)], 8, 8, handler=b"\x00\x00\x00\x00",
        strf_comp=b"H264",
    )
    with pytest.raises(C.CodecError, match="unsupported avi codec: H264"):
        C.decode_avi_mjpeg_frames(bad)


def test_avi_codec_probe_decoder_parity():
    """probe_container's codec field must agree with the decoder gate
    on the SAME either-field membership: an XVID handler over an MJPG
    strf decodes, so it probes 'mjpeg'; a case-mismatched 'Mjpg'
    handler is rejected by the decoder, so it must NOT probe 'mjpeg'."""
    px = np.full((8, 8), 60, dtype=np.uint8)
    xvid_mjpg = _avi_mjpeg(
        [_encode_jpeg(px)], 8, 8, handler=b"XVID", strf_comp=b"MJPG"
    )
    frames, _, _ = C.decode_avi_mjpeg_frames(xvid_mjpg)  # decoder accepts
    assert len(frames) == 1
    assert C.probe_container(xvid_mjpg)["codec"] == "mjpeg"

    mixed_case = _avi_mjpeg(
        [_encode_jpeg(px)], 8, 8, handler=b"Mjpg", strf_comp=b"Mjpg"
    )
    with pytest.raises(C.CodecError, match="unsupported avi codec"):
        C.decode_avi_mjpeg_frames(mixed_case)
    assert C.probe_container(mixed_case)["codec"] == "mjpg"  # not mjpeg


def test_jpeg_fill_bytes_probe_matches_decode():
    """probe_container and decode_jpeg must agree on fill-byte-padded
    files: a file the decoder accepts must not be rejected by the
    triage pass that routes it (they share _JpegMarkerWalker)."""
    px = np.full((8, 8), 120, dtype=np.uint8)
    for enc in (_encode_jpeg, _encode_jpeg_progressive):
        padded = _insert_fill_bytes(enc(px))
        info = C.probe_container(padded)
        assert info["format"] == "jpeg"
        assert (info["width"], info["height"]) == (8, 8)


def test_gif_offscreen_rect_still_validates_transparent_index():
    """A frame rect placed entirely off the logical screen must not
    legitimize an out-of-range GCE transparency index — the check runs
    before clipping, like the pixel-index check."""
    pal = np.array([[0, 0, 0], [255, 0, 0]], dtype=np.uint8)
    blob = _gif_anim(
        (4, 4),
        pal,
        [
            {"idx": np.zeros((4, 4), dtype=np.uint8)},
            {"idx": np.zeros((2, 2), dtype=np.uint8), "left": 100,
             "top": 100, "transparent": 5},
        ],
    )
    with pytest.raises(C.CodecError, match="palette index out of range"):
        C.decode_gif_frames(blob)


def test_avi_probe_header_only():
    px = np.full((8, 8), 50, dtype=np.uint8)
    raw = _avi_mjpeg(
        [_encode_jpeg(px)] * 4, 8, 8, fps=25, audio_first=True
    )
    info = C.probe_container(raw)
    assert info["format"] == "avi" and info["codec"] == "mjpeg"
    assert info["n_tracks"] == 2
    assert (info["width"], info["height"]) == (8, 8)
    assert info["duration_s"] == pytest.approx(4 / 25)


def test_avi_sniff_decodes_first_frame():
    px = np.full((8, 8), 99, dtype=np.uint8)
    raw = _avi_mjpeg([_encode_jpeg(px), _encode_jpeg(px // 2)], 8, 8)
    nch, sr, chans = C.sniff_and_decode(raw)
    assert (nch, sr) == (3, None)
    assert all(np.all(c == 99.0) for c in chans)


def _insert_fill_bytes(raw: bytes) -> bytes:
    """Pad a JPEG with 0xFF fill bytes before every marker in the
    header region (T.81 B.1.1.2 allows any run of 0xFF before the
    marker id). Only pads up to the first SOS so the entropy stream —
    where 0xFF has byte-stuffing semantics — is untouched."""
    out = bytearray(raw[:2])
    pos = 2
    while pos + 2 <= len(raw):
        assert raw[pos] == 0xFF
        out += b"\xff\xff\xff"  # fill run before the marker
        m = raw[pos + 1]
        if m == 0xDA:  # SOS: copy the rest verbatim
            out += raw[pos:]
            return bytes(out)
        ln = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        out += raw[pos : pos + 2 + ln]
        pos += 2 + ln
    raise AssertionError("no SOS in test jpeg")


def test_jpeg_fill_bytes_before_markers_decode():
    """0xFF fill bytes before marker ids (T.81 B.1.1.2) must not
    misparse as a bogus segment — padded and unpadded files decode to
    identical pixels, on both the sequential and progressive paths
    (round-8 ADVICE fix, exercised through the shared marker walker)."""
    px = (np.arange(64, dtype=np.uint8) * 3 % 251).reshape(8, 8)
    for enc in (_encode_jpeg, _encode_jpeg_progressive):
        raw = enc(px)
        padded = _insert_fill_bytes(raw)
        assert padded != raw
        base = C.decode_jpeg(raw)
        got = C.decode_jpeg(padded)
        assert np.array_equal(base[2], got[2])


def test_gif_frames_transparent_index_out_of_range_raises():
    """A GCE transparency index past the active color table raises the
    same CodecError as an out-of-range pixel index (round-8 ADVICE fix)
    instead of silently disabling transparency."""
    pal = np.array([[0, 0, 0], [255, 0, 0]], dtype=np.uint8)
    blob = _gif_anim(
        (4, 4),
        pal,
        [{"idx": np.zeros((4, 4), dtype=np.uint8), "transparent": 5}],
    )
    with pytest.raises(C.CodecError, match="palette index out of range"):
        C.decode_gif_frames(blob)


# ---------------------------------------------------------------------------
# hostile-blob hardening: mutation fuzz + decompression-bomb guards
# ---------------------------------------------------------------------------


def _small_valid_blobs() -> dict[str, bytes]:
    """One small valid blob per container, from the test-side writers."""
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = (np.arange(16, dtype=np.uint8) % 2).reshape(4, 4)
    sig = np.array([0, 100, -100, 50], dtype=np.int64)
    return {
        "wav": _wav(1, 1, 8000, 16,
                    np.array([0, 1000, -1000], dtype="<i2").tobytes()),
        "png": _png(px, color=2),
        "png_adam7": _png(px, color=2, interlace=1),
        "gif": _gif(idx, pal),
        "bmp": _bmp(px),
        "jpeg": _encode_jpeg(px[:, :, 0]),
        "jpeg_prog": _encode_jpeg_progressive(px[:, :, 0]),
        "flac": _encode_flac([sig]),
        "ppm": b"P6\n4 4\n255\n" + bytes(48),
        "avi": _avi_mjpeg(
            [_encode_jpeg(px[:, :, 0]), _encode_jpeg(px[:, :, 1])], 4, 4
        ),
        "ogg_flac": _ogg_flac([sig]),
    }


def test_decoder_mutation_fuzz_codecerror_only():
    """Truncations, bit flips and spliced garbage over every container
    must either decode or raise CodecError — never IndexError /
    ValueError / struct.error leaking out of a parser.  This is the
    unit-level guarantee behind ``decode_media``'s corrupt-blob-is-a-
    row contract (the broad except there is defense in depth, not the
    primary mechanism)."""
    import random

    rng = random.Random(20260814)
    for name, blob in _small_valid_blobs().items():
        for _ in range(400):
            b = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:  # truncate
                b = b[: rng.randrange(len(b))]
            elif op == 1:  # flip 1-5 bytes
                for _ in range(rng.randrange(1, 6)):
                    if b:
                        b[rng.randrange(len(b))] = rng.randrange(256)
            else:  # truncate + splice random tail
                b = b[: rng.randrange(len(b))] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(40))
                )
            try:
                C.sniff_and_decode(bytes(b))
            except C.CodecError:
                pass  # the contract: corrupt blob -> typed error

def test_gif_frames_mutation_fuzz_codecerror_only():
    """decode_gif_frames has its own entry surface (not reached via
    sniff_and_decode), so it carries its own standing fuzz: mutated
    animations either decode or raise CodecError — never a leaked
    IndexError/ValueError/struct.error."""
    import random

    rng = random.Random(20260815)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    blob = _gif_anim(
        (6, 5),
        pal,
        [
            {"idx": np.full((6, 5), 1, dtype=np.uint8), "delay": 5},
            {"idx": np.full((2, 2), 2, dtype=np.uint8), "left": 1,
             "top": 2, "transparent": 3, "disposal": 2},
            {"idx": np.full((3, 3), 3, dtype=np.uint8), "disposal": 3},
        ],
    )
    for _ in range(400):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            b = b[: rng.randrange(len(b))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[: rng.randrange(len(b))] + bytes(
                rng.randrange(256) for _ in range(rng.randrange(40))
            )
        try:
            C.decode_gif_frames(bytes(b))
        except C.CodecError:
            pass


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 6),
    h_tiles=st.integers(1, 3),
    w_tiles=st.integers(1, 3),
    fps=st.sampled_from([5, 10, 25, 100]),
    audio_first=st.booleans(),
    rec_wrap=st.booleans(),
    drop_first=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_mjpeg_roundtrip_property(
    n_frames, h_tiles, w_tiles, fps, audio_first, rec_wrap, drop_first, seed
):
    """Property sweep over container geometry and framing: any frame
    count, frame size, fps, stream layout, rec-wrapping and a leading
    drop — every decoded frame matches decode_jpeg of its chunk blob
    and the delay total equals (declared frames) x (frame period)."""
    rng = np.random.default_rng(seed)
    h, w = 8 * h_tiles, 8 * w_tiles
    blobs = [
        _encode_jpeg(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    drops = (0,) if drop_first and n_frames > 1 else ()
    raw = _avi_mjpeg(
        blobs, w, h, fps=fps, audio_first=audio_first,
        rec_wrap=rec_wrap, drops=drops,
    )
    frames, delays, _ = C.decode_avi_mjpeg_frames(raw)
    kept = [b for i, b in enumerate(blobs) if i not in drops]
    assert len(frames) == len(kept)
    per = round(100 / fps)
    assert sum(delays) == n_frames * per  # dropped delay folds forward
    for fr, jf in zip(frames, kept):
        assert fr.shape == (h, w, 3)
        nch, _, planes = C.decode_jpeg(jf)
        want = np.repeat(
            planes[0].astype(np.uint8).reshape(h, w, 1), 3, 2
        )
        assert np.array_equal(fr, want)


def test_avi_frames_mutation_fuzz_codecerror_only():
    """decode_avi_mjpeg_frames has its own entry surface (multi-frame,
    not reached via sniff_and_decode's 1-frame view), so it carries its
    own standing fuzz, like decode_gif_frames."""
    import random

    rng = random.Random(20260815)
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = _avi_mjpeg(
        [_encode_jpeg(px), _encode_jpeg(px[::-1]), _encode_jpeg(px.T)],
        8, 8, fps=20, audio_first=True, rec_wrap=True, drops=(1,),
    )
    for _ in range(400):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            b = b[: rng.randrange(len(b))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[: rng.randrange(len(b))] + bytes(
                rng.randrange(256) for _ in range(rng.randrange(40))
            )
        try:
            C.decode_avi_mjpeg_frames(bytes(b))
        except C.CodecError:
            pass


def _bomb_png() -> bytes:
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    return C._PNG_SIG + _png_chunk(b"IHDR", ihdr)


def _bomb_gif() -> bytes:
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.zeros((4, 4), dtype=np.uint8)
    b = bytearray(_gif(idx, pal))
    # descriptor: 0x2C left(2) top(2) w(2) h(2) -- the all-0/255
    # palette and the writer's fixed extension contain no 0x2C, so
    # the first occurrence IS the descriptor
    at = bytes(b).index(b"\x2c")
    b[at + 5 : at + 9] = b"\xff\xff\xff\xff"  # 65535 x 65535 declared
    return bytes(b)


def _bomb_jpeg() -> bytes:
    b = bytearray(_encode_jpeg(np.zeros((4, 4), dtype=np.uint8)))
    at = bytes(b).index(b"\xff\xc0")
    b[at + 5 : at + 9] = b"\xff\xff\xff\xff"  # h=w=65535 in SOF
    return bytes(b)


def _bomb_flac() -> bytes:
    b = bytearray(_encode_flac([np.zeros(8, dtype=np.int64)]))
    # STREAMINFO packed u64 at bytes 18..26: sr(20) nch(3) bps(5)
    # total(36) -- declare 2^35 total samples
    v = int.from_bytes(b[18:26], "big")
    v = (v & ~((1 << 36) - 1)) | (1 << 35)
    b[18:26] = v.to_bytes(8, "big")
    return bytes(b)


@pytest.mark.parametrize("maker", [_bomb_png, _bomb_gif, _bomb_jpeg,
                                   _bomb_flac])
def test_decompression_bomb_headers_rejected_fast(maker):
    """A tiny blob whose header commands a multi-GB allocation must be
    rejected BEFORE the allocation: at 100 TB one crafted row must not
    OOM an executor.  The cap fires on declared dimensions, so the
    error arrives in microseconds regardless of payload size."""
    import time

    blob = maker()
    assert len(blob) < 4096  # the whole point: tiny blob, huge claim
    t0 = time.time()
    with pytest.raises(C.CodecError, match="implausible"):
        C.sniff_and_decode(blob)
    assert time.time() - t0 < 1.0


def test_decode_media_hostile_batch(spark):
    """A batch mixing valid, corrupt, bomb-header and NULL payloads
    comes back as one row each -- good rows decoded, bad rows carrying
    decode_error -- with no task failure."""
    good = _small_valid_blobs()["wav"]
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[:20])),          # truncated
        (3, bytearray(_bomb_png())),        # bomb header
        (4, bytearray(b"\x00\x01garbage")), # foreign magic
        (5, None),                          # NULL payload
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in MM.decode_media(df).collect()}
    assert len(out) == 5
    assert out[1]["decode_error"] is None and out[1]["n_channels"] == 1
    for k in (2, 3, 4, 5):
        assert out[k]["decode_error"] is not None
    assert "implausible" in out[3]["decode_error"]


# ---------------------------------------------------------------------------
# header-only container probe (probe_container / probe_media)
# ---------------------------------------------------------------------------


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4_mvhd(timescale: int, duration: int) -> bytes:
    body = bytes(4)  # version 0 + flags
    body += struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += bytes(10) + bytes(36) + bytes(24) + struct.pack(">I", 3)
    return _box(b"mvhd", body)


def _mp4_trak(handler: bytes, fourcc: bytes, *, timescale: int,
              duration: int, width: int = 0, height: int = 0,
              channels: int = 0, rate: int = 0) -> bytes:
    mdhd = _box(b"mdhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale,
                                                duration)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = _box(b"hdlr", bytes(4) + bytes(4) + handler + bytes(12) + b"\x00")
    if handler == b"vide":
        entry = (bytes(6) + struct.pack(">H", 1)          # dri
                 + struct.pack(">HH", 0, 0) + bytes(12)   # pre/reserved
                 + struct.pack(">HH", width, height)
                 + struct.pack(">II", 0x00480000, 0x00480000)
                 + bytes(4) + struct.pack(">H", 1) + bytes(32)
                 + struct.pack(">Hh", 24, -1))
    else:
        entry = (bytes(6) + struct.pack(">H", 1)
                 + bytes(8)                               # reserved
                 + struct.pack(">HH", channels, 16)
                 + bytes(4)                               # predef+reserved
                 + struct.pack(">I", rate << 16))
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1)
                + _box(fourcc, entry))
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", mdia)


def _mp4(tracks: list[bytes], timescale: int = 1000,
         duration: int = 2500) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1")
    moov = _box(b"moov", _mp4_mvhd(timescale, duration) + b"".join(tracks))
    return ftyp + moov + _box(b"mdat", bytes(64))


def _ogg_page(serial: int, seq: int, granule: int, payload: bytes,
              htype: int = 0) -> bytes:
    segs = []
    rest = payload
    while True:
        segs.append(min(len(rest), 255))
        if len(rest) < 255:
            break
        rest = rest[255:]
    return (b"OggS" + bytes([0, htype])
            + granule.to_bytes(8, "little", signed=True)
            + struct.pack("<IIi", serial, seq, 0)  # crc unchecked by probe
            + bytes([len(segs)]) + bytes(segs) + payload)


def _ogg_opus(granule_end: int = 96000, in_rate: int = 24000) -> bytes:
    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
            + struct.pack("<I", in_rate) + struct.pack("<h", 0) + b"\x00")
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    return (_ogg_page(7, 0, 0, head, htype=2)
            + _ogg_page(7, 1, -1, tags)
            + _ogg_page(7, 2, granule_end, bytes(40), htype=4))


def _ogg_vorbis(granule_end: int = 88200, rate: int = 44100) -> bytes:
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", rate) + bytes(12) + b"\xb8\x01")
    return (_ogg_page(9, 0, 0, ident, htype=2)
            + _ogg_page(9, 1, granule_end, bytes(25), htype=4))


def _ogg_flac(channels, sr=44100, **flac_kw) -> bytes:
    """xiph Ogg FLAC mapping around the test-side native writer: BOS
    packet = 0x7F'FLAC' v1.0 + zero header packets + fLaC +
    STREAMINFO (native[:42]), one EOS audio page with the frames."""
    native = _encode_flac(channels, sr=sr, **flac_kw)
    bos = b"\x7fFLAC" + bytes([1, 0]) + (0).to_bytes(2, "big") + native[:42]
    return (_ogg_page(3, 0, 0, bos, htype=2)
            + _ogg_page(3, 1, len(channels[0]), native[42:], htype=4))


def _ogg_page_raw(serial: int, seq: int, granule: int, segs: list[int],
                  payload: bytes, htype: int = 0) -> bytes:
    """A page with an EXPLICIT lacing table (no auto-termination) so
    tests can split one packet across pages — a final lacing value of
    255 means the packet continues on the next page (flag 0x01)."""
    return (b"OggS" + bytes([0, htype])
            + granule.to_bytes(8, "little", signed=True)
            + struct.pack("<IIi", serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs) + payload)


def test_probe_decodable_formats():
    blobs = _small_valid_blobs()
    p = C.probe_container(blobs["wav"])
    assert (p["format"], p["codec"]) == ("wav", "pcm_s16le")
    assert (p["channels"], p["sample_rate"]) == (1, 8000)
    assert p["duration_s"] == pytest.approx(3 / 8000)
    p = C.probe_container(blobs["png"])
    assert (p["format"], p["width"], p["height"], p["channels"]) == (
        "png", 4, 4, 3)
    p = C.probe_container(blobs["gif"])
    assert (p["format"], p["width"], p["height"]) == ("gif", 4, 4)
    p = C.probe_container(blobs["bmp"])
    assert (p["format"], p["width"], p["height"], p["channels"]) == (
        "bmp", 4, 4, 3)
    p = C.probe_container(blobs["jpeg"])
    assert (p["format"], p["codec"], p["width"], p["height"]) == (
        "jpeg", "jpeg/baseline", 4, 4)
    p = C.probe_container(blobs["flac"])
    assert (p["format"], p["channels"], p["sample_rate"]) == (
        "flac", 1, 44100)
    assert p["duration_s"] == pytest.approx(4 / 44100)
    p = C.probe_container(blobs["ppm"])
    assert (p["format"], p["width"], p["height"]) == ("ppm", 4, 4)


def test_probe_mp4_video_and_audio_tracks():
    raw = _mp4([
        _mp4_trak(b"vide", b"avc1", timescale=30000, duration=75000,
                  width=640, height=360),
        _mp4_trak(b"soun", b"mp4a", timescale=48000, duration=120000,
                  channels=2, rate=48000),
    ])
    p = C.probe_container(raw)
    assert p["format"] == "mp4" and p["codec"] == "avc1"
    assert (p["n_tracks"], p["width"], p["height"]) == (2, 640, 360)
    assert (p["channels"], p["sample_rate"]) == (2, 48000)
    assert p["duration_s"] == pytest.approx(2.5)  # mvhd 2500/1000


def test_probe_mp4_audio_only_64bit_boxes():
    raw = _mp4([_mp4_trak(b"soun", b"mp4a", timescale=8000, duration=16000,
                          channels=1, rate=8000)])
    p = C.probe_container(raw)
    assert p["codec"] == "mp4a" and p["width"] is None
    assert (p["channels"], p["sample_rate"]) == (1, 8000)


def test_probe_ogg_opus_duration_at_48k():
    p = C.probe_container(_ogg_opus(granule_end=96000))
    assert (p["format"], p["codec"], p["channels"]) == ("ogg", "opus", 2)
    assert p["sample_rate"] == 24000  # declared input rate
    assert p["duration_s"] == pytest.approx(2.0)  # granules run at 48k


def test_probe_ogg_vorbis_duration_at_stream_rate():
    p = C.probe_container(_ogg_vorbis(granule_end=88200, rate=44100))
    assert (p["codec"], p["sample_rate"]) == ("vorbis", 44100)
    assert p["duration_s"] == pytest.approx(2.0)
    assert p["n_tracks"] == 1


def test_probe_never_reads_payload_bytes():
    """Truncating every payload byte after the headers must not change
    the probe result: the triage pass is header-only by contract."""
    full = _mp4([_mp4_trak(b"vide", b"avc1", timescale=1000, duration=1000,
                           width=64, height=64)])
    headless = full[: full.index(b"mdat") + 4]  # drop all mdat bytes
    assert C.probe_container(full) == C.probe_container(headless)


def test_ogg_flac_decode_matches_native():
    """FLAC-in-Ogg (round 10): the Ogg re-framing is lossless — the
    reassembled stream decodes bit-identically to the bare container,
    through sniff_and_decode's Ogg branch."""
    sig = np.array([0, 100, -100, 50], dtype=np.int64)
    n1 = C.decode_flac(_encode_flac([sig]))
    n2 = C.sniff_and_decode(_ogg_flac([sig]))
    assert n1[0] == n2[0] == 1 and n1[1] == n2[1] == 44100
    assert list(n1[2][0]) == list(n2[2][0]) == [0, 100, -100, 50]
    p = C.probe_container(_ogg_flac([sig]))
    assert (p["format"], p["codec"], p["channels"], p["sample_rate"]) == (
        "ogg", "flac", 1, 44100)
    assert p["duration_s"] == pytest.approx(4 / 44100)
    assert p["n_frames"] == 2  # completed packets: mapping BOS + 1 frame


def test_ogg_flac_packet_continuation_across_pages():
    """RFC 3533 lacing: a packet whose final lacing value is 255
    continues on the next page (flag 0x01). The reassembler must glue
    the halves, reject a continuation page without the flag, and
    reject a stream ending mid-packet."""
    sig = np.array(list(range(-128, 128)), dtype=np.int64)
    native = _encode_flac([sig])
    frames = native[42:]
    assert len(frames) > 255  # the split below must actually split
    bos = b"\x7fFLAC" + bytes([1, 0]) + (0).to_bytes(2, "big") + native[:42]
    tail = frames[255:]
    segs2 = [255] * (len(tail) // 255) + [len(tail) % 255]
    ogg = (_ogg_page(5, 0, 0, bos, htype=2)
           + _ogg_page_raw(5, 1, -1, [255], frames[:255])
           + _ogg_page_raw(5, 2, 256, segs2, tail, htype=0x04 | 0x01))
    nch, sr, chans = C.decode_ogg_flac(ogg)
    assert nch == 1 and list(chans[0]) == list(range(-128, 128))
    bad = (_ogg_page(5, 0, 0, bos, htype=2)
           + _ogg_page_raw(5, 1, -1, [255], frames[:255])
           + _ogg_page_raw(5, 2, 256, segs2, tail, htype=0x04))
    with pytest.raises(C.CodecError, match="lost packet continuation"):
        C.decode_ogg_flac(bad)
    trunc = (_ogg_page(5, 0, 0, bos, htype=2)
             + _ogg_page_raw(5, 1, -1, [255], frames[:255]))
    with pytest.raises(C.CodecError, match="truncated final packet"):
        C.decode_ogg_flac(trunc)
    orphan = (_ogg_page(5, 0, 0, bos, htype=2)
              + _ogg_page_raw(5, 1, 256, segs2, tail, htype=0x04 | 0x01))
    with pytest.raises(C.CodecError, match="orphan continuation page"):
        C.decode_ogg_flac(orphan)


def test_ogg_packet_pages_spans_large_packets():
    """A packet over 255*255-1 bytes must span RFC continuation pages
    (flag 0x01, granule -1 on non-final pages) instead of overflowing
    a single page's lacing byte (second r10 review pass: the packer
    crashed with ValueError at n_samples ~> 32.5k where pack_flac
    worked). Roundtrip through the product packer + decoder."""
    from rentals_data_pipeline_spark.operators.multimodal import (
        _flac_text_stream, _ogg_packet_pages, _ogg_page)
    for n in (256, 40000):  # 1-page and 2-page frame packets
        text = ("paging " * 8000)[: max(10, n // 3)]
        native = _flac_text_stream(text.encode(), n)
        bos = (b"\x7fFLAC" + bytes([1, 0]) + (0).to_bytes(2, "big")
               + native[:42])
        frames, nxt = _ogg_packet_pages(9, 1, n, native[42:], htype_last=4)
        assert nxt - 1 == (1 if n == 256 else 2)  # 2-page continuation
        ogg = _ogg_page(9, 0, 0, bos, htype=2) + frames
        nch, sr, chans = C.decode_ogg_flac(ogg)
        data = text.encode()[:n] + b"\x00" * max(0, n - len(text.encode()))
        assert nch == 1 and sr == 8000
        assert [int(x) for x in chans[0]] == list(data)
        p = C.probe_container(ogg)
        assert p["codec"] == "flac" and p["n_frames"] == 2


def test_ogg_trailing_torso_is_truncation():
    """1..26 trailing bytes are a page-header torso: both the decode
    and the probe must triage them as truncation, not silently accept
    what a 27-byte torso would reject (round-10 review finding)."""
    sig = np.array([0, 100, -100, 50], dtype=np.int64)
    blob = _ogg_flac([sig])
    assert C.decode_ogg_flac(blob)  # clean blob decodes
    for tail in (1, 20, 26):
        with pytest.raises(C.CodecError, match="truncated page header"):
            C.decode_ogg_flac(blob + b"x" * tail)
        with pytest.raises(C.CodecError, match="truncated page header"):
            C.probe_container(blob + b"x" * tail)


def test_ogg_non_flac_codecs_are_gated():
    """Entropy-coded Ogg codecs stay environment-gated with a NAMED
    triage error (parity with the MP4/AVI unsupported-codec gates);
    structural damage stays a parse error."""
    with pytest.raises(C.CodecError, match="unsupported ogg codec: opus"):
        C.sniff_and_decode(_ogg_opus())
    with pytest.raises(C.CodecError, match="unsupported ogg codec: vorbis"):
        C.sniff_and_decode(_ogg_vorbis())
    with pytest.raises(C.CodecError, match="ogg parse error: no pages"):
        C.sniff_and_decode(b"OggS\x00\x02vorbis")
    with pytest.raises(C.CodecError, match="bad flac mapping header"):
        C.decode_ogg_flac(
            _ogg_page(3, 0, 0, b"\x7fFLAC\x01\x00\x00\x00garbage", htype=2)
        )
    # a FLAC stream multiplexed BEHIND a vorbis stream still decodes:
    # stream selection is by mapping magic, not file order
    sig = np.array([1, 2, 3, 4], dtype=np.int64)
    fl = _ogg_flac([sig])
    vb = _ogg_vorbis()
    # interleave: vorbis BOS, flac BOS, flac audio, vorbis audio
    vb_bos = vb[: vb.index(b"OggS", 4)]
    vb_rest = vb[len(vb_bos):]
    fl_bos = fl[: fl.index(b"OggS", 4)]
    fl_rest = fl[len(fl_bos):]
    mux = vb_bos + fl_bos + fl_rest + vb_rest
    nch, sr, chans = C.decode_ogg_flac(mux)
    assert list(chans[0]) == [1, 2, 3, 4]


def test_probe_mutation_fuzz_codecerror_only():
    import random

    rng = random.Random(20260815)
    blobs = list(_small_valid_blobs().values()) + [
        _mp4([_mp4_trak(b"soun", b"mp4a", timescale=8000, duration=8000,
                        channels=1, rate=8000)]),
        _ogg_opus(),
        _ogg_vorbis(),
    ]
    for blob in blobs:
        for _ in range(300):
            b = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                b = b[: rng.randrange(len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    if b:
                        b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b = b[: rng.randrange(len(b))] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(40))
                )
            try:
                C.probe_container(bytes(b))
            except C.CodecError:
                pass


def test_probe_media_mixed_batch(spark):
    rows = [
        (1, bytearray(_small_valid_blobs()["wav"])),
        (2, bytearray(_mp4([_mp4_trak(b"vide", b"avc1", timescale=1000,
                                      duration=1000, width=64, height=48)]))),
        (3, bytearray(_ogg_opus())),
        (4, bytearray(b"\x00\x01garbage")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in MM.probe_media(df).collect()}
    assert out[1]["format"] == "wav" and out[1]["probe_error"] is None
    assert out[2]["format"] == "mp4" and out[2]["width"] == 64
    assert out[3]["codec"] == "opus"
    assert out[4]["format"] is None and "unsupported" in out[4]["probe_error"]
    assert out[5]["probe_error"] == "null payload"


@settings(max_examples=30, deadline=None)
@given(
    kind=st.sampled_from(["wav", "png", "gif", "bmp", "flac", "ppm"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_probe_agrees_with_decode_property(kind, seed):
    """Coherence contract: for every decodable container, the header
    fields the probe CLAIMS must match what the full decode PRODUCES —
    channel count, sample rate, and pixel/sample geometry. A probe
    that lies would mis-route the triage pass at scale."""
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
    if kind == "wav":
        n = int(rng.integers(1, 200))
        raw = _wav(1, 1, 8000, 16,
                   rng.integers(-1000, 1000, size=n).astype("<i2").tobytes())
    elif kind == "png":
        raw = _png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint16),
                   color=2)
    elif kind == "gif":
        pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        raw = _gif(rng.integers(0, 4, size=(h, w)).astype(np.uint8), pal)
    elif kind == "bmp":
        raw = _bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    elif kind == "flac":
        n = int(rng.integers(1, 120))
        raw = _encode_flac(
            [rng.integers(-500, 500, size=n).astype(np.int64)])
    else:
        raw = (f"P6\n{w} {h}\n255\n".encode()
               + bytes(int(w) * int(h) * 3))
    p = C.probe_container(raw)
    nch, sr, chans = C.sniff_and_decode(raw)
    assert p["channels"] == nch
    assert p["sample_rate"] == sr
    if p["width"] is not None:
        assert p["width"] * p["height"] == len(chans[0])
    if p["duration_s"] is not None and sr:
        assert p["duration_s"] == pytest.approx(len(chans[0]) / sr)


# ---------------------------------------------------------------------------
# MP4 / Motion-JPEG (round 9): independent ISO-BMFF writer + sample-table
# decode, truncation flags, and the standing 10k+ box-parser fuzz
# ---------------------------------------------------------------------------


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _mp4_full(typ: bytes, body: bytes, flags: int = 0) -> bytes:
    return _mp4_box(typ, bytes([0]) + flags.to_bytes(3, "big") + body)


def _mp4_mjpeg(
    jpeg_frames,
    *,
    timescale=100,
    delta=10,
    fourcc=b"jpeg",
    chunks=None,
    co64=False,
    const_size=False,
    drops=(),
    audio_first=False,
    faststart=False,
):
    """Independent spec-shaped MJPEG-in-MP4 writer: ftyp + mdat + moov
    (or moov-first when ``faststart``), arbitrary chunking via
    ``chunks`` (samples per chunk), 64-bit offsets via ``co64``,
    constant-size stsz via ``const_size`` (requires equal frames),
    zero-size padding samples via ``drops``, and an audio trak FIRST
    via ``audio_first`` (the decoder must skip to the vide trak)."""
    sizes = [0 if i in drops else len(j) for i, j in enumerate(jpeg_frames)]
    bodies = [b"" if i in drops else j for i, j in enumerate(jpeg_frames)]
    n = len(jpeg_frames)
    if chunks is None:
        chunks = [n]
    assert sum(chunks) == n

    def moov_bytes(chunk_offsets):
        stsd = _mp4_full(
            b"stsd",
            (1).to_bytes(4, "big")
            + _mp4_box(
                fourcc,
                bytes(6) + (1).to_bytes(2, "big") + bytes(16)
                + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
                + bytes(46),
            ),
        )
        stts = _mp4_full(
            b"stts", (1).to_bytes(4, "big") + struct.pack(">II", n, delta)
        )
        runs = []
        for ci, spc in enumerate(chunks):
            if not runs or runs[-1][1] != spc:
                runs.append((ci + 1, spc))
        stsc = _mp4_full(
            b"stsc",
            len(runs).to_bytes(4, "big")
            + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
        )
        if const_size:
            assert len(set(sizes)) == 1
            stsz = _mp4_full(
                b"stsz", sizes[0].to_bytes(4, "big") + n.to_bytes(4, "big")
            )
        else:
            stsz = _mp4_full(
                b"stsz",
                (0).to_bytes(4, "big") + n.to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sizes),
            )
        if co64:
            stco = _mp4_full(
                b"co64",
                len(chunk_offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(8, "big") for o in chunk_offsets),
            )
        else:
            stco = _mp4_full(
                b"stco",
                len(chunk_offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(4, "big") for o in chunk_offsets),
            )
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        mdhd = _mp4_full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, delta * n)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _mp4_full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"\x00")
        mdia = _mp4_box(b"mdia", mdhd + hdlr + _mp4_box(b"minf", stbl))
        trak = _mp4_box(b"trak", mdia)
        traks = trak
        if audio_first:
            a_mdhd = _mp4_full(
                b"mdhd",
                struct.pack(">IIII", 0, 0, 8000, 8000)
                + struct.pack(">HH", 0x55C4, 0),
            )
            a_hdlr = _mp4_full(
                b"hdlr", bytes(4) + b"soun" + bytes(12) + b"\x00"
            )
            traks = _mp4_box(b"trak", _mp4_box(b"mdia", a_mdhd + a_hdlr)) \
                + trak
        mvhd = _mp4_full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, delta * n)
            + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
            + bytes(10) + bytes(36) + bytes(24) + (2).to_bytes(4, "big"),
        )
        return _mp4_box(b"moov", mvhd + traks)

    ftyp = _mp4_box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"mp41")
    mdat = _mp4_box(b"mdat", b"".join(bodies))

    def offsets(mdat_body_at):
        outs, pos, si = [], mdat_body_at, 0
        for spc in chunks:
            outs.append(pos)
            for _ in range(spc):
                pos += sizes[si]
                si += 1
        return outs

    if faststart:
        # moov size is offset-value-independent (fixed-width fields):
        # build once with placeholders, then with real offsets
        probe_moov = moov_bytes(offsets(0))
        at = len(ftyp) + len(probe_moov) + 8
        moov = moov_bytes(offsets(at))
        assert len(moov) == len(probe_moov)
        return ftyp + moov + mdat
    moov = moov_bytes(offsets(len(ftyp) + 8))
    return ftyp + mdat + moov


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 6),
    h_tiles=st.integers(1, 3),
    w_tiles=st.integers(1, 3),
    delta=st.sampled_from([1, 4, 10, 100]),
    layout=st.sampled_from(["one", "per_frame", "split"]),
    co64=st.booleans(),
    faststart=st.booleans(),
    audio_first=st.booleans(),
    drop_first=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_mjpeg_roundtrip_property(
    n_frames, h_tiles, w_tiles, delta, layout, co64, faststart,
    audio_first, drop_first, seed,
):
    """Property sweep over sample-table geometry: any frame count and
    size, any chunking (one chunk / chunk-per-sample / uneven split),
    32- or 64-bit offsets, moov-before- or after-mdat, a leading audio
    trak and a leading zero-size padding sample — every decoded frame
    must equal decode_jpeg of its sample bytes and the delay total
    must equal n_frames x the stts period (clamped to >= 1 cs)."""
    rng = np.random.default_rng(seed)
    h, w = 8 * h_tiles, 8 * w_tiles
    blobs = [
        _encode_jpeg(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    if layout == "one":
        chunks = [n_frames]
    elif layout == "per_frame":
        chunks = [1] * n_frames
    else:
        cut = max(1, n_frames // 2)
        chunks = [cut, n_frames - cut] if n_frames > 1 else [1]
    drops = (0,) if drop_first and n_frames > 1 else ()
    raw = _mp4_mjpeg(
        blobs, delta=delta, chunks=chunks, co64=co64,
        faststart=faststart, audio_first=audio_first, drops=drops,
    )
    frames, delays, truncated = C.decode_mp4_mjpeg_frames(raw)
    kept = [b for i, b in enumerate(blobs) if i not in drops]
    assert not truncated
    assert len(frames) == len(kept)
    per = max(1, round(100 * delta / 100))
    assert sum(delays) == n_frames * per  # dropped delay folds forward
    for fr, jf in zip(frames, kept):
        assert fr.shape == (h, w, 3)
        nch, _, planes = C.decode_jpeg(jf)
        want = np.repeat(
            planes[0].astype(np.uint8).reshape(h, w, 1), 3, 2
        )
        assert np.array_equal(fr, want)


def test_mp4_const_size_stsz_and_delay_clamp():
    """Constant-size stsz path + sub-centisecond stts period: four
    identical frames at delta=1/timescale=1000 (1 ms) must decode with
    the 1 cs delay floor."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    jf = _encode_jpeg(px)
    raw = _mp4_mjpeg([jf] * 4, timescale=1000, delta=1, const_size=True)
    frames, delays, truncated = C.decode_mp4_mjpeg_frames(raw)
    assert len(frames) == 4 and not truncated
    assert delays == [1, 1, 1, 1]


def test_mp4_unsupported_codec_and_missing_boxes():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    jf = _encode_jpeg(px)
    with pytest.raises(C.CodecError, match="unsupported mp4 codec: avc1"):
        C.decode_mp4_mjpeg_frames(_mp4_mjpeg([jf], fourcc=b"avc1"))
    # no moov at all
    naked = _mp4_box(b"ftyp", b"isom" + bytes(8)) + _mp4_box(b"mdat", jf)
    with pytest.raises(C.CodecError, match="no moov box"):
        C.decode_mp4_mjpeg_frames(naked)
    # drop the stsz box: the strict missing-table gate
    raw = _mp4_mjpeg([jf])
    at = raw.index(b"stsz") - 4
    ln = int.from_bytes(raw[at : at + 4], "big")
    gutted = raw[:at] + raw[at + ln :]
    # parent box sizes now lie; either complaint is a CodecError
    with pytest.raises(C.CodecError):
        C.decode_mp4_mjpeg_frames(gutted)
    # sample offset beyond the buffer
    raw2 = bytearray(_mp4_mjpeg([jf]))
    at = bytes(raw2).index(b"stco") + 4 + 4 + 4  # box hdr + fullbox + count
    raw2[at : at + 4] = (len(raw2) + 1000).to_bytes(4, "big")
    with pytest.raises(C.CodecError, match="sample out of range"):
        C.decode_mp4_mjpeg_frames(bytes(raw2))


def test_mp4_audio_only_has_no_video_track():
    raw = _mp4([_mp4_trak(b"soun", b"mp4a", timescale=8000, duration=8000,
                          channels=1, rate=8000)])
    with pytest.raises(C.CodecError, match="no video track"):
        C.decode_mp4_mjpeg_frames(raw)


def test_mp4_sniff_first_frame_parity():
    """sniff_and_decode must expose the MP4 opening frame exactly as
    decode_mp4_mjpeg_frames does (the AVI/GIF stills contract)."""
    rng = np.random.default_rng(7)
    blobs = [
        _encode_jpeg(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))
        for _ in range(3)
    ]
    raw = _mp4_mjpeg(blobs)
    nch, sr, chans = C.sniff_and_decode(raw)
    assert (nch, sr) == (3, None)
    first, _, _ = C.decode_mp4_mjpeg_frames(raw, max_frames=1)
    for c in range(3):
        assert np.array_equal(
            chans[c].astype(np.uint8), first[0][:, :, c].reshape(-1)
        )


def test_mp4_frames_mutation_fuzz_codecerror_only():
    """The round-9 box-parser fuzz gate: 10k+ mutations (truncation,
    byte flips, tail grafts) over three container shapes — every
    failure must be CodecError, never IndexError/OverflowError/
    MemoryError/hang (the sample-table walk touches offsets, sizes
    and run-lengths, all attacker-controlled)."""
    import random

    rng = random.Random(20260815)
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    shapes = [
        _mp4_mjpeg([_encode_jpeg(px), _encode_jpeg(px[::-1])]),
        _mp4_mjpeg([_encode_jpeg(px)] * 3, chunks=[1, 1, 1], co64=True,
                   faststart=True),
        _mp4_mjpeg([_encode_jpeg(px.T)], audio_first=True),
    ]
    for blob in shapes:
        for _ in range(3500):
            b = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                b = b[: rng.randrange(len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b = b[: rng.randrange(len(b))] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(40))
                )
            try:
                C.decode_mp4_mjpeg_frames(bytes(b))
            except C.CodecError:
                pass


def test_probe_n_frames_declared_counts():
    """The probe's n_frames field: AVI dwTotalFrames, MP4 stsz sample
    count, Ogg completed packets (lacing < 255, continuations merged);
    NULL for containers without a declared count."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    jf = _encode_jpeg(px)
    assert C.probe_container(_avi_mjpeg([jf] * 3, 8, 8))["n_frames"] == 3
    assert C.probe_container(_mp4_mjpeg([jf] * 5))["n_frames"] == 5
    # opus: BOS + tags + one 300-byte audio packet spanning a lacing
    # continuation (255 + 45) => 3 packets, not 4
    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
            + struct.pack("<I", 24000) + struct.pack("<h", 0) + b"\x00")
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    raw = (_ogg_page(7, 0, 0, head, htype=2)
           + _ogg_page(7, 1, -1, tags)
           + _ogg_page(7, 2, 96000, bytes(300), htype=4))
    p = C.probe_container(raw)
    assert p["n_frames"] == 3
    assert C.probe_container(_small_valid_blobs()["wav"])["n_frames"] is None
    assert C.probe_container(_small_valid_blobs()["png"])["n_frames"] is None


def test_video_budget_truncation_flag(monkeypatch):
    """The round-9 truncation contract across all three video paths: a
    pixel budget that stops decode mid-stream sets truncated=True; a
    budget that exactly covers the clip (or a plain max_frames cap)
    does not."""
    rng = np.random.default_rng(3)
    blobs = [
        _encode_jpeg(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))
        for _ in range(4)
    ]
    avi = _avi_mjpeg(blobs, 8, 8)
    mp4 = _mp4_mjpeg(blobs)
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], dtype=np.uint8)
    gif = _gif_anim(
        (8, 8),
        pal,
        [
            {"idx": rng.integers(0, 4, size=(8, 8)).astype(np.uint8),
             "left": 0, "top": 0}
            for _ in range(4)
        ],
    )
    # budget for exactly two 8x8 frames
    monkeypatch.setattr(C, "_MAX_PIXELS", 2 * 64)
    for raw, dec in ((avi, C.decode_avi_mjpeg_frames),
                     (mp4, C.decode_mp4_mjpeg_frames),
                     (gif, C.decode_gif_frames)):
        frames, _, truncated = dec(raw)
        assert len(frames) == 2
        assert truncated, dec.__name__
    # full budget: complete decode, flag clear
    monkeypatch.setattr(C, "_MAX_PIXELS", 1 << 26)
    for raw, dec in ((avi, C.decode_avi_mjpeg_frames),
                     (mp4, C.decode_mp4_mjpeg_frames),
                     (gif, C.decode_gif_frames)):
        frames, _, truncated = dec(raw)
        assert len(frames) == 4
        assert not truncated, dec.__name__
    # max_frames is the caller's cap, not truncation
    for raw, dec in ((avi, C.decode_avi_mjpeg_frames),
                     (mp4, C.decode_mp4_mjpeg_frames),
                     (gif, C.decode_gif_frames)):
        frames, _, truncated = dec(raw, max_frames=2)
        assert len(frames) == 2
        assert not truncated, dec.__name__
    # budget that runs out exactly at the last GIF frame: no more
    # image data follows, so the precise flag stays False
    monkeypatch.setattr(C, "_MAX_PIXELS", 4 * 64)
    frames, _, truncated = C.decode_gif_frames(gif)
    assert len(frames) == 4 and not truncated


def test_avi_delay_clamp_sub_centisecond():
    """strh scale/rate describing a 1 ms frame period must clamp the
    per-frame delay to 1 cs instead of rounding to 0 and collapsing
    downstream durations."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = _avi_mjpeg([_encode_jpeg(px)] * 3, 8, 8, fps=1000)
    frames, delays, _ = C.decode_avi_mjpeg_frames(raw)
    assert len(frames) == 3
    assert delays == [1, 1, 1]


def test_ogg_crc_helper_is_genuine():
    """pack_ogg_opus writes real RFC 3533 CRCs: pin the bitwise helper
    against an independent table-driven implementation and the known
    poly-0x04C11DB7/init-0/no-reflect check value for '123456789'
    (the CRC-32/POSIX check 0x765E7680 before its final xorout)."""
    from rentals_data_pipeline_spark.operators.multimodal import _ogg_crc

    poly = 0x04C11DB7
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ poly if r & 0x80000000 else (r << 1)) \
                & 0xFFFFFFFF
        tbl.append(r)

    def table_crc(data: bytes) -> int:
        crc = 0
        for byte in data:
            crc = ((crc << 8) ^ tbl[((crc >> 24) ^ byte) & 0xFF]) \
                & 0xFFFFFFFF
        return crc

    assert _ogg_crc(b"123456789") == 0x89A1897F
    rng = np.random.default_rng(11)
    for n in (0, 1, 27, 255, 300):
        v = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        assert _ogg_crc(v) == table_crc(v)
