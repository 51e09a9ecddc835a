"""Native runtime tests: C++ ring buffer semantics, threaded pump, stats."""

import threading

import numpy as np
import pytest

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.runtime import RealtimeEngine, native_lib

from ref_loader import snr_db

pytestmark = pytest.mark.skipif(not native_lib.available(),
                                reason="native toolchain unavailable")


def test_ring_roundtrip():
    ring = native_lib.NativeRing(1024)
    assert ring.capacity == 1024
    data = np.arange(300, dtype=np.float32)
    assert ring.write(data) == 300
    assert ring.available() == 300
    out = ring.read(300)
    np.testing.assert_array_equal(out, data)
    assert ring.available() == 0


def test_ring_wraparound_and_partial():
    ring = native_lib.NativeRing(256)
    for it in range(10):  # force index wrap
        data = np.full(200, it, dtype=np.float32)
        assert ring.write(data) == 200
        out = ring.read(200)
        np.testing.assert_array_equal(out, data)
    # overfill: partial write
    big = np.ones(1000, dtype=np.float32)
    wrote = ring.write(big)
    assert wrote == 256
    assert ring.space() == 0
    # underrun: read_block zero-fills and reports xrun
    ring.read(256)
    blk, ok = ring.read_block(128)
    assert not ok and np.all(blk == 0.0)


def test_ring_threaded_spsc():
    ring = native_lib.NativeRing(4096)
    n = 200_000
    src = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    received = []

    def producer():
        i = 0
        while i < n:
            i += ring.write(src[i : i + 512])

    def consumer():
        got = 0
        while got < n:
            out = ring.read(512)
            if out.size:
                received.append(out)
                got += out.size

    t1, t2 = threading.Thread(target=producer), threading.Thread(target=consumer)
    t1.start(); t2.start(); t1.join(); t2.join()
    np.testing.assert_array_equal(np.concatenate(received), src)


def test_realtime_engine_end_to_end():
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    chain = Chain([ops.lowcut(cfg, 300.0), ops.softclipper(cfg)])
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal(512 * 12) * 0.3).astype(np.float32)

    eng = RealtimeEngine(chain, cfg)
    eng.start()
    try:
        i = 0
        while i < sig.size:
            i += eng.push(sig[i : i + 2048])
        eng.drain()
        out = eng.pull(sig.size)
    finally:
        eng.stop()

    # compare against direct offline render of the same chain
    from pyaudiodsptools_tpu import render

    golden = np.asarray(render(chain, sig, cfg))[: out.size]
    assert out.size >= 512 * 11  # all but possibly the in-flight tail
    assert snr_db(golden, out) > 100.0 or np.array_equal(golden, out)

    stats = eng.stats()
    assert stats["blocks"] >= 11
    assert stats["worst_ns"] > 0
