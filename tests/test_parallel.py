"""Sharding equivalence tests on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded render must match the single-device render for every mesh layout."""

import jax
import numpy as np
import pytest

from pyaudiodsptools_tpu import Chain, EngineConfig, ops, render
from pyaudiodsptools_tpu.parallel import ShardedRenderer, make_mesh

from ref_loader import snr_db


def _chain8(cfg):
    return Chain([
        ops.lowcut(cfg, 120.0),
        ops.highcut(cfg, 12000.0),
        ops.eq3band_fft(cfg, 250.0, 2.0, 1500.0, -1.5, 6000.0, 2.5),
        ops.compressor(cfg, -18.0, 0.6, 3.1, 30.1),
        ops.gate(cfg, -45.0, 0.1, 3.1, 200.1),
        ops.delay(cfg, 150.0, 2),
        ops.tremolo(cfg, 0.3, 5.0),
        ops.softclipper(cfg, 0.44),
    ])


@pytest.fixture(scope="module")
def data():
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    rng = np.random.default_rng(0)
    sig = np.clip(rng.standard_normal((8, 512 * 16)) * 0.3, -0.99, 0.99
                  ).astype(np.float32)
    chain = _chain8(cfg)
    golden = np.asarray(render(chain, sig, cfg))
    return cfg, chain, sig, golden


@pytest.mark.parametrize("channel,time", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_equals_single(data, channel, time):
    cfg, chain, sig, golden = data
    if len(jax.devices()) < channel * time:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(channel=channel, time=time)
    r = ShardedRenderer(chain, cfg, mesh)
    out = np.asarray(r.render(sig))[:, : golden.shape[-1]]
    assert snr_db(golden, out) > 100.0 or np.array_equal(golden, out)


def test_fir_halo_correctness():
    """Time-sharding an FFT filter must reproduce the 3-block window across
    shard boundaries (halo exchange)."""
    cfg = EngineConfig(sample_rate=44100, block_size=512)
    chain = Chain([ops.lowcut(cfg, 400.0)])
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal((2, 512 * 8)) * 0.4).astype(np.float32)
    golden = np.asarray(render(chain, sig, cfg))
    mesh = make_mesh(channel=1, time=8)
    out = np.asarray(ShardedRenderer(chain, cfg, mesh).render(sig))
    np.testing.assert_allclose(golden, out[:, : golden.shape[-1]], atol=2e-6)


def test_render_local_channels_and_meters(data):
    """Per-host shard assembly path (single process: local == global) and
    the cross-shard metering reductions."""
    from pyaudiodsptools_tpu.parallel import dist

    cfg, chain, sig, golden = data
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(channel=4, time=2)
    r = ShardedRenderer(chain, cfg, mesh)
    out = np.asarray(dist.render_local_channels(r, sig))
    assert out.shape == sig.shape
    assert snr_db(golden, out[:, : golden.shape[-1]]) > 100.0

    blocks = r.render_blocks(
        jax.device_put(
            np.asarray(sig).reshape(8, -1, cfg.block_size), r._in_sharding))
    m = dist.sharded_meters(blocks)
    assert 0 < m["peak"] < 4.0 and 0 < m["rms"] < m["peak"]
