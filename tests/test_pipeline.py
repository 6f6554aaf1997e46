"""Host->device frame pipelining (utils/pipeline.py)."""

import numpy as np
import jax

from cusift_tpu.utils.pipeline import device_frames, pack_frame


def test_pack_frame(rng):
    img = rng.random((12, 16)).astype(np.float32)
    depth = rng.random((12, 16)).astype(np.float32)
    p = pack_frame(img, depth)
    assert p.shape == (2, 12, 16)
    np.testing.assert_array_equal(p[0], img)
    np.testing.assert_array_equal(p[1], depth)
    p0 = pack_frame(img, None)
    np.testing.assert_array_equal(p0[1], 0.0)


def test_device_frames_order_and_content(rng):
    frames = [(np.full((4, 4), i, np.float32),
               np.full((4, 4), 10 + i, np.float32)) for i in range(7)]
    out = list(device_frames(iter(frames), prefetch=2))
    assert len(out) == 7
    for i, f in enumerate(out):
        assert isinstance(f, jax.Array)
        np.testing.assert_array_equal(np.asarray(f[0]), frames[i][0])
        np.testing.assert_array_equal(np.asarray(f[1]), frames[i][1])


def test_device_frames_empty():
    assert list(device_frames(iter([]))) == []


def test_producer_exception_propagates(rng):
    """A corrupt frame mid-sequence must raise in the consumer, not end the
    stream cleanly on silently truncated data (ADVICE r1, medium)."""
    def frames():
        yield (np.zeros((4, 4), np.float32), None)
        raise IOError("corrupt frame")

    it = device_frames(frames(), prefetch=2)
    next(it)
    import pytest
    with pytest.raises(IOError, match="corrupt frame"):
        list(it)


def test_early_consumer_exit_unblocks_producer():
    """Breaking out of the stream early must not leave the producer thread
    blocked forever on a full queue."""
    import threading
    produced = []

    def frames():
        for i in range(100):
            produced.append(i)
            yield (np.full((4, 4), i, np.float32), None)

    it = device_frames(frames(), prefetch=1)
    next(it)
    it.close()  # consumer stops early -> cancel flag set in finally
    deadline = threading.Event()
    # the producer should stop emitting shortly after cancellation
    deadline.wait(0.5)
    n_after_close = len(produced)
    deadline.wait(0.3)
    assert len(produced) == n_after_close  # no further production
    assert n_after_close < 100
