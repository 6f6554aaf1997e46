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
