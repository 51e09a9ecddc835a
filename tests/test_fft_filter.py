"""Parity + unit tests for the overlap-save FFT filters.

Golden model: /root/reference/pyAudioDspTools/EffectFFTFilter.py run live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiodsptools_tpu.core.config import EngineConfig
from pyaudiodsptools_tpu.core import block as blk
from pyaudiodsptools_tpu.ops import fft_filter

from ref_loader import chunked, ref_config, run_ref_device, snr_db


def _rng_signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.3).astype(np.float32)


@pytest.mark.parametrize("block_size", [512, 4096])
@pytest.mark.parametrize("kind,cutoff", [("lowcut", 800.0), ("highcut", 4000.0)])
def test_parity_streaming(block_size, kind, cutoff):
    ref = ref_config(44100, block_size)
    sig = _rng_signal(block_size * 7 + 123)
    chunks = chunked(sig, block_size)

    if kind == "lowcut":
        dev = ref.CreateLowCutFilter(cutoff)
    else:
        dev = ref.CreateHighCutFilter(cutoff)
    golden = run_ref_device(dev, chunks)

    cfg = EngineConfig(sample_rate=44100, block_size=block_size)
    eff = getattr(fft_filter, kind)(cfg, cutoff)
    state = eff.state()
    outs = []
    for c in chunks:
        state, out = eff(state, jnp.asarray(c))
        outs.append(np.asarray(out))
    ours = np.concatenate(outs)

    assert snr_db(golden, ours) > 100.0


def test_offline_matches_streaming():
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    eff = fft_filter.lowcut(cfg, 300.0)
    sig = _rng_signal(512 * 5)
    blocks = blk.make_blocks(jnp.asarray(sig), 512)

    state = eff.state()
    outs = []
    for i in range(blocks.shape[0]):
        state, out = eff(state, blocks[i])
        outs.append(out)
    streamed = jnp.stack(outs)

    batched = eff.offline(eff.params, blocks)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(batched),
                               rtol=0, atol=1e-6)


def test_offline_batched_channels():
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    eff = fft_filter.highcut(cfg, 6000.0)
    sig = np.stack([_rng_signal(512 * 4, seed=s) for s in range(3)])
    blocks = blk.make_blocks(jnp.asarray(sig), 512)  # (3, 4, 512)
    out = eff.offline(eff.params, blocks)
    assert out.shape == blocks.shape
    # each channel independently equals the single-channel result
    for c in range(3):
        single = eff.offline(eff.params, blocks[c])
        np.testing.assert_array_equal(np.asarray(out[c]), np.asarray(single))


def test_one_block_latency():
    """Impulse at sample 0 must emerge at sample block_size (EffectFFTFilter.py:10)."""
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    eff = fft_filter.highcut(cfg, 8000.0)
    sig = np.zeros(512 * 4, dtype=np.float32)
    sig[0] = 1.0
    blocks = blk.make_blocks(jnp.asarray(sig), 512)
    out = np.asarray(blk.combine_blocks(eff.offline(eff.params, blocks)))
    peak = np.argmax(np.abs(out))
    assert peak == 512


# ---------------------------------------------------------------------------
# plan_segments geometry (ops/fft_filter.plan_segments): the accelerator
# branch grows small-block windows onto the MXU matmul-FFT path. CPU CI
# never runs on that backend, so these tests monkeypatch
# jax.default_backend to pin the exact (halo, seg) the planner picks —
# a wrong window choice at B=512 would otherwise ship silently.
# ---------------------------------------------------------------------------


def _patched_plan(monkeypatch, backend, kernel_len, block_size):
    import jax as _jax

    from pyaudiodsptools_tpu.ops.fft_filter import plan_segments

    monkeypatch.setattr(_jax, "default_backend", lambda: backend)
    return plan_segments(kernel_len, block_size)


@pytest.mark.parametrize("block_size,kernel_len,want", [
    # B=4096: total=8 already clears the 128*128 MXU threshold -> unchanged
    (4096, 2047, (1, 7)),
    # B=1024: window grows 8 -> 16 blocks to reach 16384 = 128*128
    (1024, 511, (1, 15)),
    # B=512: window grows 8 -> 32 blocks (16384 samples); halo bumps 1 -> 2
    # so the fused kernel's store slice is 8-sublane aligned (q = B/n2 = 4)
    (512, 255, (2, 30)),
    # B=512, 5-block kernel: halo=5 forces total>=32 via the 4x floor
    # (MXU-eligible), then aligns 5 -> 6
    (512, 5 * 512 + 1, (6, 26)),
    # B=512, kernel just past one block -> halo=2, 4x floor keeps total=8,
    # growth 8 -> 32
    (512, 512 + 2, (2, 30)),
])
def test_plan_segments_accelerator_geometry(monkeypatch, block_size,
                                            kernel_len, want):
    assert _patched_plan(monkeypatch, "tpu", kernel_len, block_size) == want


@pytest.mark.parametrize("block_size,kernel_len,want", [
    (4096, 2047, (1, 7)),
    (1024, 511, (1, 7)),
    (512, 255, (1, 7)),
    (512, 5 * 512 + 1, (5, 27)),   # 4x-halo floor applies on every backend
])
def test_plan_segments_cpu_geometry(monkeypatch, block_size, kernel_len,
                                    want):
    assert _patched_plan(monkeypatch, "cpu", kernel_len, block_size) == want


def test_plan_segments_grown_window_is_mxu_eligible(monkeypatch):
    import jax as _jax

    from pyaudiodsptools_tpu.kernels.matmul_fft import use_mxu_fft

    for block_size, kernel_len in [(512, 255), (1024, 511), (4096, 2047)]:
        halo, seg = _patched_plan(monkeypatch, "tpu", kernel_len, block_size)
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        assert use_mxu_fft((halo + seg) * block_size), (block_size, halo, seg)
        # halo still covers the kernel and the window is a pow2 block count
        assert halo * block_size >= kernel_len - 1
        assert ((halo + seg) & (halo + seg - 1)) == 0


def test_plan_segments_non_pow2_block_stays_on_fft_path(monkeypatch):
    # a non-pow2 window can never hit the MXU tier: the planner must keep
    # the default 8-block window rather than growing it for nothing
    assert _patched_plan(monkeypatch, "tpu", 255, 500) == (1, 7)


def test_fir_plans_offline_in_512_units(monkeypatch):
    """Big pow2 engine blocks plan the OFFLINE segmentation in 512-sample
    units so the halo hugs the stripped kernel (streaming stays on engine
    blocks). Pinned on the accelerator branch: the B=4096 chain-like
    cascade kernel (~6.1k samples) gets halo 14x512 = 7168 instead of
    2x4096 = 8192 (window overlap 1.28x vs 1.33x)."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    from pyaudiodsptools_tpu.ops import fft_filter as ff

    eff = ff.fir(np.concatenate([np.zeros(3073), np.random.default_rng(0)
                                 .standard_normal(6143)]), 4096)
    p = eff.params
    assert p.seg_unit == 512
    assert (p.halo, p.seg) == (14, 50)       # n = 64*512 = 32768
    assert p.slack == 14 * 512 - 6142        # >= n2 for the no-pad gather
    assert p.slack >= 128
    # alignment for the fused kernel's store (q = 512/128 = 4)
    assert (p.halo * 4) % 8 == 0 and (p.seg * 4) % 8 == 0
    # engine-block streaming window unchanged
    assert p.block_size == 4096


def test_fir_single_lowcut_unit_geometry(monkeypatch):
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    from pyaudiodsptools_tpu import EngineConfig, ops

    p = ops.lowcut(EngineConfig(44100, 4096), 800.0).params
    # stripped kernel 2047: halo 4 units is aligned but leaves slack 2 <
    # n2, so plan_segments bumps to 6 (next aligned value) -> n = 16384
    assert p.seg_unit == 512 and (p.halo, p.seg) == (6, 26)
