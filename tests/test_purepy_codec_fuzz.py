"""Property fuzz for the stdlib BMP/PNG codec (r11 verdict item 7).

purepy_image is load-bearing: it is the last auto-wire rung under
multimodal decode/transform, so the REAL branch executes in CI
everywhere. Before r12 it was pinned by one round-trip test; this file
fuzzes it: random sizes/channels/pixels through encode→decode identity,
a reference PNG writer emitting RANDOM per-row filters (1-4: Sub, Up,
Average, Paeth — the repo encoder only writes filter 0, so the decode
filters were otherwise only covered by the hand-built vectors in
test_llm), BMP 24/32-bit both row orders, resize_nearest reference
equality, and a PIL differential when PIL is importable (it is not in
this container; the leg is written for environments that have it).

No SparkSession — the codec is plain Python; this file runs in
milliseconds-per-example.
"""

from __future__ import annotations

import struct
import zlib

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

from jetro_spark.llm import purepy_image as PP

pytestmark = pytest.mark.skipif(not HAVE_HYPOTHESIS,
                                reason="hypothesis not installed")


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png_with_filters(w: int, h: int, ch: int, px: bytes,
                      filters: list[int]) -> bytes:
    """Reference PNG writer applying the SPEC's forward filter per row —
    the inverse of the decoder's unfilter, written independently from
    the spec (RFC 2083 §6) so encoder and decoder bugs cannot cancel."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    prev = bytearray(stride)
    scan = bytearray()
    for y in range(h):
        line = bytearray(px[y * stride:(y + 1) * stride])
        f = filters[y]
        out = bytearray(line)
        if f == 1:      # Sub: raw - left
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                out[i] = (line[i] - a) & 0xFF
        elif f == 2:    # Up: raw - above
            for i in range(stride):
                out[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:    # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        scan += bytes([f]) + out
        prev = line
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR",
                     struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
            + _chunk(b"IEND", b""))


def _bmp(w: int, h: int, px: bytes, *, bpp: int = 24,
         top_down: bool = False) -> bytes:
    """Reference BMP writer (BI_RGB, BITMAPINFOHEADER): rows padded to
    4 bytes, BGR(A) storage, bottom-up unless top_down."""
    nch = bpp // 8
    row_raw = w * nch
    pad = (-row_raw) % 4
    rows = [px[y * w * 3:(y + 1) * w * 3] for y in range(h)]
    body = bytearray()
    order = rows if top_down else rows[::-1]
    for r in order:
        for x in range(w):
            rr, gg, bb = r[x * 3], r[x * 3 + 1], r[x * 3 + 2]
            body += bytes((bb, gg, rr) + ((255,) if nch == 4 else ()))
        body += b"\x00" * pad
    hdr_h = h if not top_down else -h
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, bpp, 0,
                          len(body), 2835, 2835, 0, 0)
            + bytes(body))


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 17), st.integers(1, 13),
       st.sampled_from([1, 2, 3, 4]), st.randoms(use_true_random=False))
def test_png_roundtrip_identity(w, h, ch, rng):
    px = bytearray(rng.randrange(256) for _ in range(w * h * ch))
    raw = PP.encode_png(w, h, ch, px)
    assert PP.probe(raw) == "png"
    assert PP.decode_size(raw) == (w, h)
    dw, dh, dch, dpx = PP.decode_pixels(raw)
    assert (dw, dh, dch) == (w, h, ch)
    assert bytes(dpx) == bytes(px)


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 17), st.integers(1, 13),
       st.sampled_from([1, 2, 3, 4]), st.randoms(use_true_random=False))
def test_png_all_filters_decode(w, h, ch, rng):
    """Random per-row filter mix through the independent reference
    encoder — exercises Sub/Up/Average/Paeth on random content, where
    the repo encoder alone (filter 0) never would."""
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    filters = [rng.randrange(5) for _ in range(h)]
    raw = _png_with_filters(w, h, ch, px, filters)
    dw, dh, dch, dpx = PP.decode_pixels(raw)
    assert (dw, dh, dch) == (w, h, ch)
    assert bytes(dpx) == px, f"filters={filters}"


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 15), st.integers(1, 11),
       st.sampled_from([24, 32]), st.booleans(),
       st.randoms(use_true_random=False))
def test_bmp_decode_both_orders(w, h, bpp, top_down, rng):
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    raw = _bmp(w, h, px, bpp=bpp, top_down=top_down)
    assert PP.probe(raw) == "bmp"
    assert PP.decode_size(raw) == (w, h)
    dw, dh, dch, dpx = PP.decode_pixels(raw)
    nch = bpp // 8  # 32-bit keeps the alpha plane (ch=4)
    assert (dw, dh, dch) == (w, h, nch)
    if nch == 3:
        assert bytes(dpx) == px
    else:
        want = b"".join(px[i * 3:i * 3 + 3] + b"\xff"
                        for i in range(w * h))
        assert bytes(dpx) == want


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.sampled_from([1, 3, 4]),
       st.integers(1, 16), st.integers(1, 16),
       st.randoms(use_true_random=False))
def test_resize_nearest_reference(w, h, ch, nw, nh, rng):
    px = bytearray(rng.randrange(256) for _ in range(w * h * ch))
    got = PP.resize_nearest(w, h, ch, px, nw, nh)
    assert len(got) == nw * nh * ch
    for y in range(nh):
        for x in range(nw):
            sx, sy = x * w // nw, y * h // nh
            assert got[(y * nw + x) * ch:(y * nw + x) * ch + ch] \
                == px[(sy * w + sx) * ch:(sy * w + sx) * ch + ch]
    # identity when dims match
    assert PP.resize_nearest(w, h, ch, px, w, h) == px


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 17), st.integers(1, 13),
       st.sampled_from([1, 3, 4]), st.randoms(use_true_random=False))
def test_png_pil_differential(w, h, ch, rng):
    """PIL differential when available: PIL must decode our PNGs to the
    same pixels, and our decoder must read PIL-written PNGs exactly."""
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed in this container")
    import io

    px = bytearray(rng.randrange(256) for _ in range(w * h * ch))
    raw = PP.encode_png(w, h, ch, px)
    im = Image.open(io.BytesIO(raw))
    assert im.size == (w, h)
    assert im.tobytes() == bytes(px)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    dw, dh, dch, dpx = PP.decode_pixels(buf.getvalue())
    assert (dw, dh, dch, bytes(dpx)) == (w, h, ch, bytes(px))
