"""Audio-device adapter (runtime/portaudio.py): callback wiring + gating.

No audio hardware or PortAudio bindings exist in CI, so the duplex callback
path is exercised against a FAKE sounddevice module whose Stream invokes the
callback from a clock thread — the adapter code under test is identical to
what a real installation runs. A final test asserts the clean no-backend
failure mode; a skip-gated test covers real hardware when present."""

import sys
import threading
import time
import types

import numpy as np
import pytest

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.runtime import RealtimeEngine
from pyaudiodsptools_tpu.runtime import portaudio as pa_mod
from pyaudiodsptools_tpu.runtime.portaudio import (DuplexAudioStream,
                                                   available_backend)


class _FakeStream:
    """Minimal sounddevice.Stream: drives the callback at block cadence.

    Pacing models real hardware meeting its deadline: before each callback
    (after the first) it waits until the engine has the previous block's
    output ready, so the assertion below tests the WIRING exactly — real
    PortAudio at 11.6 ms/block gives the ~1 ms chain step the same slack."""

    engine = None  # bound by the test before start()

    def __init__(self, samplerate, blocksize, channels, dtype, device,
                 callback):
        assert channels == 1 and dtype == "float32"
        self.blocksize = blocksize
        self.callback = callback
        self._stop = threading.Event()
        self.captured = []
        rng = np.random.default_rng(3)
        self._input = (rng.standard_normal((150, blocksize)) * 0.25
                       ).astype(np.float32)
        self._i = 0

    def _run(self):
        while not self._stop.is_set() and self._i < len(self._input):
            if self.engine is not None and self._i >= 1:
                deadline = time.monotonic() + 2.0
                while (self.engine.out_ring.available() < self.blocksize
                       and time.monotonic() < deadline):
                    time.sleep(0.0005)
            indata = self._input[self._i][:, None]
            outdata = np.zeros((self.blocksize, 1), np.float32)
            self.callback(indata, outdata, self.blocksize, None, None)
            self.captured.append(outdata[:, 0].copy())
            self._i += 1

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    def close(self):
        pass


def _engine(block=512):
    cfg = EngineConfig(sample_rate=44100, block_size=block)
    chain = Chain([ops.lowcut(cfg, 200.0), ops.softclipper(cfg, 0.4)])
    return RealtimeEngine(chain, cfg), cfg, chain


def test_duplex_stream_with_fake_sounddevice(monkeypatch):
    fake = types.ModuleType("sounddevice")
    fake.Stream = _FakeStream
    monkeypatch.setitem(sys.modules, "sounddevice", fake)

    eng, cfg, chain = _engine()
    monkeypatch.setattr(_FakeStream, "engine", eng)
    stream = DuplexAudioStream(eng)
    assert stream.backend == "sounddevice"
    with stream:
        fake_stream = stream._stream
        # let the fake clock thread feed ~all blocks through the engine
        deadline = time.monotonic() + 30.0
        while (fake_stream._i < 150 and time.monotonic() < deadline):
            time.sleep(0.01)
    cap = fake_stream.captured
    assert len(cap) == 150
    assert stream.overrun_samples == 0
    got = np.concatenate(cap)
    # The pipeline is causal with ring latency: output == chain(input) with
    # some leading silence. Recover the offset and compare the overlap.
    want_in = fake_stream._input.reshape(-1)
    st = chain.init_state()
    outs = []
    for i in range(0, want_in.size, cfg.block_size):
        st, o = chain.step(st, want_in[i:i + cfg.block_size])
        outs.append(np.asarray(o))
    want = np.concatenate(outs)
    nzg = np.nonzero(np.abs(got) > 0)[0]
    assert nzg.size, "no audio ever reached the output callback"
    # Ring latency = whole blocks between the chain's first nonzero sample
    # (the FIR op adds its own leading silence) and where it appears on the
    # device output.
    lag = nzg[0] - np.nonzero(np.abs(want) > 0)[0][0]
    assert lag >= 0 and lag % cfg.block_size == 0, lag
    n = got.size - lag
    assert n >= 50 * cfg.block_size, f"only {n} samples flowed"
    np.testing.assert_array_equal(got[lag:], want[:n])


def test_no_backend_is_clean_error(monkeypatch):
    monkeypatch.setattr(pa_mod, "_try_import", lambda name: None)
    assert available_backend() is None
    eng, _, _ = _engine()
    with pytest.raises(RuntimeError, match="sounddevice"):
        DuplexAudioStream(eng)


@pytest.mark.skipif(available_backend() is None,
                    reason="no PortAudio binding installed")
def test_real_hardware_roundtrip():  # pragma: no cover - hardware only
    eng, _, _ = _engine()
    with DuplexAudioStream(eng):
        time.sleep(1.0)
    assert eng.stats()["blocks"] >= 0
