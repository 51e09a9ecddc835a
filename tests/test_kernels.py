"""Pallas dynamics kernel vs the faithful scan implementation (interpret mode
on CPU; the real TPU path is exercised by bench.py)."""

import numpy as np
import pytest

from pyaudiodsptools_tpu import EngineConfig
from pyaudiodsptools_tpu.ops import compressor, gate
from pyaudiodsptools_tpu.kernels.dynamics_pallas import fast_compressor, fast_gate

from ref_loader import snr_db


def _burst(C, n, seed=3):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((C, n)) * 0.02).astype(np.float32)
    for start in range(0, n, 3000):
        w = min(700, n - start)
        x[:, start : start + w] += (rng.standard_normal((C, w)) * 0.7
                                    ).astype(np.float32)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


@pytest.mark.parametrize("factory,fast_factory", [
    (compressor, fast_compressor), (gate, fast_gate)])
def test_kernel_matches_scan(factory, fast_factory):
    cfg = EngineConfig(44100, 512)
    base = factory(cfg)
    fast = fast_factory(cfg, interpret=True)

    x = _burst(4, 512 * 10)
    blocks = x.reshape(4, 10, 512)

    golden = np.asarray(base.offline(base.params, blocks))
    ours = np.asarray(fast.offline(fast.params, blocks))
    assert snr_db(golden, ours) > 100.0


def test_kernel_state_carry():
    """Kernel streaming steps must agree with the scan's carried state."""
    cfg = EngineConfig(44100, 512)
    base = compressor(cfg)
    fast = fast_compressor(cfg, interpret=True)

    x = _burst(2, 512 * 6, seed=9)
    b_state = base.init_state(base.params, (2,))
    f_state = fast.init_state(fast.params, (2,))
    for i in range(6):
        blk = x[:, i * 512 : (i + 1) * 512]
        b_state, b_out = base.step(base.params, b_state, blk)
        f_state, f_out = fast.step(fast.params, f_state, blk)
        assert snr_db(np.asarray(b_out), np.asarray(f_out)) > 100.0
    for k in ("mode", "x", "y"):
        np.testing.assert_array_equal(np.asarray(b_state[k]),
                                      np.asarray(f_state[k]))


def test_kernel_state_carry_nonmultiple_block():
    """Block length not a multiple of the kernel's time tile: zero padding
    must not advance the automaton state (regression: padded tail samples
    previously walked the carry forward)."""
    cfg = EngineConfig(44100, 1500)  # > t_tile=1024 and not a multiple
    base = compressor(cfg, -18.0, 0.6)
    fast = fast_compressor(cfg, -18.0, 0.6, interpret=True)

    x = _burst(2, 1500 * 6, seed=13).reshape(2, 6, 1500)
    b_state = base.init_state(base.params, (2,))
    f_state = fast.init_state(fast.params, (2,))
    for i in range(6):
        b_state, b_out = base.step(base.params, b_state, x[:, i])
        f_state, f_out = fast.step(fast.params, f_state, x[:, i])
        assert snr_db(np.asarray(b_out), np.asarray(f_out)) > 100.0
    for k in ("mode", "x", "y"):
        np.testing.assert_array_equal(np.asarray(b_state[k]),
                                      np.asarray(f_state[k]))
