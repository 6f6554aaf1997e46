"""Native C++ frame loader: decode + prefetch correctness vs numpy."""

import os

import numpy as np
import pytest

from cusift_tpu.utils import native_loader

pytestmark = pytest.mark.skipif(not native_loader.native_available(),
                                reason="g++ / native build unavailable")


def _write_pgm(path, arr, maxval=255):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n# comment\n{w} {h}\n{maxval}\n".encode())
        if maxval > 255:
            f.write(arr.astype(">u2").tobytes())
        else:
            f.write(arr.astype(np.uint8).tobytes())


def _write_ppm(path, arr):
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.astype(np.uint8).tobytes())


def test_decode_pgm8(tmp_path, rng):
    img = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    p = str(tmp_path / "a.pgm")
    _write_pgm(p, img)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, img / 255.0, atol=1e-6)


def test_decode_pgm16_depth(tmp_path, rng):
    depth = rng.integers(0, 30000, size=(32, 40)).astype(np.uint16)
    p = str(tmp_path / "d.pgm")
    _write_pgm(p, depth, maxval=65535)
    out = native_loader.decode(p, scale=1.0 / 5000.0)
    np.testing.assert_allclose(out, depth / 5000.0, rtol=1e-5)


def test_decode_ppm_gray(tmp_path, rng):
    img = rng.integers(0, 256, size=(24, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "c.ppm")
    _write_ppm(p, img)
    out = native_loader.decode(p)
    ref = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) / 255.0
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_npy(tmp_path, rng):
    arr = rng.normal(size=(20, 28)).astype(np.float32)
    p = str(tmp_path / "x.npy")
    np.save(p, arr)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, arr, atol=1e-7)


def test_stream_order_and_content(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(12):
        img = rng.integers(0, 256, size=(16, 20)).astype(np.uint8)
        p = str(tmp_path / f"f{i:03d}.pgm")
        _write_pgm(p, img)
        paths.append(p)
        imgs.append(img / 255.0)
    stream = native_loader.FrameStream(paths, threads=3, queue_depth=4)
    got = list(stream)
    assert len(got) == 12
    for a, b in zip(got, imgs):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_stream_bad_file_raises(tmp_path):
    p = str(tmp_path / "bad.pgm")
    with open(p, "wb") as f:
        f.write(b"not an image")
    stream = native_loader.FrameStream([p])
    with pytest.raises(ValueError):
        next(stream)


def test_decode_npy_uint8_normalises(tmp_path, rng):
    """scale == 0 must normalise integer dtypes by their max (contract)."""
    img = (rng.random((8, 16)) * 255).astype(np.uint8)
    p = tmp_path / "u8.npy"
    np.save(p, img)
    out = native_loader.decode(str(p))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def _write_png(path, arr, filters=None):
    """Minimal PNG encoder with explicit per-row filter types.

    arr: uint8 HxW (gray8), uint16 HxW (gray16, big-endian samples), or
    uint8 HxWx3 (RGB).  `filters` is an int or per-row list in 0..4 so the
    Sub/Up/Average/Paeth unfilter paths can be exercised deliberately
    (cv2.imwrite picks filters adaptively and can't be forced).
    """
    import struct
    import zlib

    if arr.ndim == 2 and arr.dtype == np.uint16:
        depth, ctype, bpp = 16, 0, 2
        raw = arr.astype(">u2").tobytes()
    elif arr.ndim == 2:
        depth, ctype, bpp = 8, 0, 1
        raw = arr.astype(np.uint8).tobytes()
    else:
        depth, ctype, bpp = 8, 2, 3
        raw = arr.astype(np.uint8).tobytes()
    h, w = arr.shape[:2]
    stride = w * bpp
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = rows[y]
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        u = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        ft = filters[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - a
        elif ft == 2:
            enc = cur - u
        elif ft == 3:
            enc = cur - (a + u) // 2
        else:  # Paeth
            p = a + u - c
            pa, pb, pc = np.abs(p - a), np.abs(p - u), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, u, c))
            enc = cur - pred
        out.append(ft)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(bytes(out))))
        f.write(chunk(b"IEND", b""))


def test_decode_png8_gray(tmp_path, rng):
    img = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, img / 255.0, atol=1e-6)


def test_decode_png16_depth_scale(tmp_path, rng):
    depth = rng.integers(0, 30000, size=(32, 40)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    _write_png(p, depth)
    out = native_loader.decode(p, scale=1.0 / 5000.0)
    np.testing.assert_allclose(out, depth / 5000.0, rtol=1e-5)


def test_decode_png_rgb_to_gray(tmp_path, rng):
    img = rng.integers(0, 256, size=(24, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, img, filters=1)
    out = native_loader.decode(p)
    ref = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) / 255.0
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_png_all_filters(tmp_path):
    """Smooth gradient image with every filter type exercised row by row."""
    yy, xx = np.mgrid[0:40, 0:52]
    img = ((np.sin(yy / 6.0) + np.cos(xx / 9.0) + 2.0) * 60).astype(np.uint8)
    filters = [(y % 5) for y in range(40)]
    p = str(tmp_path / "f.png")
    _write_png(p, img, filters=filters)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, img / 255.0, atol=1e-6)


def test_decode_png_cv2_oracle(tmp_path, rng):
    """cv2.imwrite-encoded PNG (adaptive filters, real zlib stream)."""
    cv2 = pytest.importorskip("cv2")
    img = (rng.random((37, 53)) * 255).astype(np.uint8)
    p = str(tmp_path / "o.png")
    assert cv2.imwrite(p, img)
    want = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, want / 255.0, atol=1e-6)


def test_decode_png_oversized_idat_rejected(tmp_path, rng):
    """IDAT inflating past the IHDR-declared size must fail, not OOM."""
    import struct
    import zlib

    img = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    p = tmp_path / "evil.png"
    _write_png(str(p), img)
    # splice in an IDAT whose stream inflates to ~16 MB for an 8x8 image
    blob = zlib.compress(b"\x00" * (16 << 20))
    b = bytearray(p.read_bytes())
    start = b.index(b"IDAT") - 4
    end = start + 12 + struct.unpack(">I", b[start:start + 4])[0]
    evil = (struct.pack(">I", len(blob)) + b"IDAT" + blob
            + struct.pack(">I", zlib.crc32(b"IDAT" + blob)))
    b[start:end] = evil
    p.write_bytes(bytes(b))
    with pytest.raises(ValueError):
        native_loader.decode(str(p))


def test_decode_ppm16(tmp_path, rng):
    """16-bit P6: big-endian samples, not byte-interleaved-as-RGB garbage."""
    h, w = 4, 6
    rgb = (rng.random((h, w, 3)) * 65535).astype(np.uint16)
    hdr = f"P6\n{w} {h}\n65535\n".encode()
    p = tmp_path / "c16.ppm"
    p.write_bytes(hdr + rgb.astype(">u2").tobytes())
    out = native_loader.decode(str(p))
    want = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2]).astype(np.float32) / 65535.0
    np.testing.assert_allclose(out, want, atol=1e-4)
