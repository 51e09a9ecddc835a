"""Time-sharded biquad scan vs the single-device implementation."""

import jax
import numpy as np
import pytest

from pyaudiodsptools_tpu import EngineConfig
from pyaudiodsptools_tpu.core import block as blk
from pyaudiodsptools_tpu.ops.eq3band import eq3band
from pyaudiodsptools_tpu.parallel import make_mesh
from pyaudiodsptools_tpu.parallel.timescan import eq3band_offline_sharded

from ref_loader import snr_db


@pytest.mark.parametrize("time_shards", [2, 4, 8])
def test_sharded_biquad_equals_single(time_shards):
    if len(jax.devices()) < time_shards:
        pytest.skip("needs virtual devices")
    cfg = EngineConfig(44100, 512)
    eff = eq3band(cfg, 200.0, 3.0, 1000.0, -2.0, 8000.0, 2.0)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    sig = (rng.standard_normal((2, 512 * 16)) * 0.4).astype(np.float32)
    blocks = blk.make_blocks(jnp.asarray(sig), 512)

    golden = np.asarray(eff.offline(eff.params, blocks))

    mesh = make_mesh(channel=1, time=time_shards)
    out = np.asarray(eq3band_offline_sharded(eff.params, blocks, mesh))
    # Both paths sit at the float32-IIR accuracy floor (~68 dB vs a float64
    # sequential recursion — measured; the sharded result is as accurate as
    # the single-device one, just differently associated).
    assert snr_db(golden, out) > 60.0


def test_sharded_renderer_uses_timescan():
    """A chain containing the biquad EQ renders time-sharded end-to-end."""
    import jax.numpy as jnp

    from pyaudiodsptools_tpu import Chain, ops, render
    from pyaudiodsptools_tpu.parallel import ShardedRenderer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = EngineConfig(44100, 512)
    chain = Chain([
        ops.lowcut(cfg, 150.0),
        ops.eq3band(cfg, 200.0, 3.0, 1000.0, -2.0, 8000.0, 2.0),
        ops.softclipper(cfg, 0.44),
    ])
    rng = np.random.default_rng(2)
    sig = (rng.standard_normal((4, 512 * 16)) * 0.4).astype(np.float32)
    golden = np.asarray(render(chain, sig, cfg))

    mesh = make_mesh(channel=2, time=4)
    out = np.asarray(ShardedRenderer(chain, cfg, mesh).render(sig))
    out = out[:, : golden.shape[-1]]
    assert snr_db(golden, out) > 60.0
