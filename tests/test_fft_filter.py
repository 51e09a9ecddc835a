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
