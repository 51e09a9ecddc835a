"""Smoke-run the example scripts in-process (the conftest platform applies;
subprocesses on this machine cannot switch JAX platforms). Each example must
run to completion and produce sane output."""

import os
import runpy
import wave

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(name):
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def _read(path):
    with wave.open(path) as f:
        return (np.frombuffer(f.readframes(f.getnframes()), np.int16)
                .astype(np.float32) / 32768.0)


def test_example1_offline_mono():
    _run("example1_offline_mono.py")
    out = _read("/tmp/output_mono.wav")
    assert out.size >= 264600 and np.isfinite(out).all() and np.abs(out).max() > 1e-3


def test_example2_offline_stereo():
    _run("example2_offline_stereo.py")
    with wave.open("/tmp/output_stereo.wav") as f:
        assert f.getnchannels() == 2


def test_example3_realtime_stream():
    _run("example3_realtime_stream.py")


def test_example4_accelerator():
    _run("example4_accelerator.py")
    out = _read("/tmp/output_accel.wav")
    assert np.isfinite(out).all()


def test_example5_sharded_multichip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _run("example5_sharded_multichip.py")


def test_cli_render(tmp_path):
    from pyaudiodsptools_tpu.__main__ import main

    out = tmp_path / "cli.wav"
    rc = main(["/root/reference/TestFile16BitMono.wav", str(out),
               "--block-size", "4096",
               "--chain", '[{"op": "lowcut", "cutoff_hz": 800}]'])
    assert rc in (0, None) and out.exists()
    data = _read(str(out))
    assert data.size >= 264600 and np.isfinite(data).all()
