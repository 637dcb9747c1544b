"""Exhaustive PNG row-filter coverage for the native fast-path decoder.

The PIL-produced fixtures in test_png_loader.py exercise whatever filters
Pillow's encoder happens to pick; this hand-encodes PNGs that FORCE each of
the five row filters (None/Sub/Up/Average/Paeth) — including first-row
cases where the up-neighbor is absent — for both gray (bpp 1) and RGB
(bpp 3), and checks the native decode (native/png_decode.cpp defilter_row)
byte-equal against the original pixels and against PIL decoding the same
bytes. Also covers the RGB-file -> red-channel rule and the libpng
fallback (palette file the fast path declines).
"""

import os
import struct
import zlib

import numpy as np
import pytest

from srvp_tpu.native.loader import decode_png_batch

def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def _filter_row(ftype, row, prev, bpp):
    """PNG encoder-side filtering (the inverse of defilter_row)."""
    row = row.astype(np.int32)
    up = prev.astype(np.int32) if prev is not None else np.zeros_like(row)
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    ul = np.zeros_like(row)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = row
    elif ftype == 1:
        out = row - left
    elif ftype == 2:
        out = row - up
    elif ftype == 3:
        out = row - ((left + up) >> 1)
    elif ftype == 4:
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        out = row - pred
    return (out & 0xFF).astype(np.uint8)


def encode_png(img, row_filters):
    """Minimal PNG encoder with explicit per-row filter types."""
    h, w = img.shape[:2]
    bpp = 1 if img.ndim == 2 else img.shape[2]
    color_type = 0 if bpp == 1 else 2
    flat = img.reshape(h, w * bpp)
    raw = bytearray()
    prev = None
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        raw.append(f)
        raw += _filter_row(f, flat[y], prev, bpp).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


@pytest.fixture(scope="module")
def native_available():
    if decode_png_batch([], 8, 8, 1) is None:
        pytest.skip("native library unavailable")


def _roundtrip(tmp_path, img, row_filters, channels, name):
    from PIL import Image
    h, w = img.shape[:2]
    data = encode_png(img, row_filters)
    path = str(tmp_path / f"{name}.png")
    with open(path, "wb") as f:
        f.write(data)
    # PIL accepts the hand-encoded file => the encoder side is valid PNG
    pil = np.asarray(Image.open(path))
    np.testing.assert_array_equal(pil, img)
    out = decode_png_batch([path], h, w, channels, n_threads=1)
    assert out is not None
    return out[0]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("bpp", [1, 3])
def test_single_filter_type(native_available, tmp_path, ftype, bpp):
    rng = np.random.RandomState(100 * bpp + ftype)
    shape = (16, 24) if bpp == 1 else (16, 24, 3)
    img = rng.randint(0, 256, shape, np.uint8)
    got = _roundtrip(tmp_path, img, [ftype], bpp, f"f{ftype}_bpp{bpp}")
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("bpp", [1, 3])
def test_mixed_filters_per_row(native_available, tmp_path, bpp):
    """Adjacent rows with different filters chain prev-row state correctly
    (each defiltered row becomes the next row's up-neighbor)."""
    rng = np.random.RandomState(7 + bpp)
    shape = (20, 17) if bpp == 1 else (20, 17, 3)
    img = rng.randint(0, 256, shape, np.uint8)
    got = _roundtrip(tmp_path, img, [4, 3, 2, 1, 0], bpp, f"mixed{bpp}")
    np.testing.assert_array_equal(got, img)


def test_rgb_file_red_channel_rule(native_available, tmp_path):
    """channels=1 on an RGB file takes the RED channel (data/kth.py
    frame[:, :, 0] semantics), through every filter type."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (12, 12, 3), np.uint8)
    data = encode_png(img, [0, 1, 2, 3, 4])
    path = str(tmp_path / "rgb.png")
    with open(path, "wb") as f:
        f.write(data)
    out = decode_png_batch([path], 12, 12, 1, n_threads=1)
    np.testing.assert_array_equal(out[0], img[:, :, 0])


def test_palette_file_uses_libpng_fallback(native_available, tmp_path):
    """Palette PNGs are outside the fast path; the libpng fallback must
    produce PIL-identical RGB pixels."""
    from PIL import Image
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (10, 10, 3), np.uint8)
    path = str(tmp_path / "pal.png")
    Image.fromarray(img).convert(
        "P", palette=Image.ADAPTIVE, colors=64).save(path)
    pil = np.asarray(Image.open(path).convert("RGB"))
    out = decode_png_batch([path], 10, 10, 3, n_threads=1)
    np.testing.assert_array_equal(out[0], pil)


def test_wrong_dimensions_raise(native_available, tmp_path):
    """A wrong-size frame errors like the pure-Python path (shape mismatch
    via the PIL fallback), never silently produces garbage."""
    img = np.zeros((8, 8), np.uint8)
    path = str(tmp_path / "dims.png")
    with open(path, "wb") as f:
        f.write(encode_png(img, [0]))
    with pytest.raises((IOError, ValueError)):
        decode_png_batch([path], 16, 16, 1, n_threads=1)


def test_non_png_file_falls_back_to_pil(native_available, tmp_path):
    """A JPEG misnamed *.png decodes through the PIL fallback with identical
    pixels to the per-item PIL path (the native decoder rejects the
    signature; the pure-Python path sniffs content and succeeds)."""
    from PIL import Image
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 16), np.uint8)
    path = str(tmp_path / "fake.png")
    Image.fromarray(img).save(path, format="JPEG", quality=95)
    expected = np.array(Image.open(path))
    got = decode_png_batch([path], 16, 16, 1, n_threads=1)
    np.testing.assert_array_equal(got[0], expected)


def test_timemajor_fallback_places_frames_correctly(native_available, tmp_path):
    """PIL fallback for the offsets (time-major) decoder writes each frame
    at its (t, b) destination, matching the native layout contract."""
    from PIL import Image
    from srvp_tpu.native import decode_png_timemajor
    rng = np.random.RandomState(1)
    paths, imgs = [], []
    for b in range(2):
        for t in range(3):
            img = rng.randint(0, 255, (8, 8), np.uint8)
            p = str(tmp_path / f"v{b}_t{t}.png")
            Image.fromarray(img).save(p, format="JPEG", quality=95)
            imgs.append((b, t, np.array(Image.open(p))))
            paths.append(p)
    out = decode_png_timemajor(paths, 2, 3, 8, 8, 1, n_threads=1)
    assert out.shape == (3, 2, 8, 8, 1)
    for b, t, ref in imgs:
        np.testing.assert_array_equal(out[t, b, :, :, 0], ref)
