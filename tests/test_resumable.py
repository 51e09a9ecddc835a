"""Resumable render: checkpointed segments, crash-resume equivalence."""

import numpy as np
import jax.numpy as jnp

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.core import block as blk
from pyaudiodsptools_tpu.engine.resumable import render_resumable


def _chain(cfg):
    return Chain([ops.lowcut(cfg, 200.0), ops.compressor(cfg, -20.0, 0.5),
                  ops.delay(cfg, 100.0, 2)])


def test_resumable_matches_direct(tmp_path):
    cfg = EngineConfig(44100, 512)
    chain = _chain(cfg)
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(512 * 20) * 0.4).astype(np.float32)
    blocks = blk.make_blocks(jnp.asarray(sig), 512)

    direct = np.asarray(chain.render_blocks(blocks))
    out = np.asarray(render_resumable(chain, blocks, str(tmp_path / "ck"),
                                      segment_blocks=6))
    np.testing.assert_allclose(direct, out, atol=2e-6)


def test_resume_after_injected_crash(tmp_path):
    cfg = EngineConfig(44100, 512)
    chain = _chain(cfg)
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal(512 * 18) * 0.4).astype(np.float32)
    blocks = blk.make_blocks(jnp.asarray(sig), 512)

    golden = np.asarray(render_resumable(chain, blocks,
                                         str(tmp_path / "ref"), segment_blocks=4))

    ckpt = str(tmp_path / "crashy")
    import pytest

    with pytest.raises(RuntimeError, match="injected fault"):
        render_resumable(chain, blocks, ckpt, segment_blocks=4, stop_after=2)
    # resume picks up from the checkpoint and matches the uninterrupted run
    resumed = np.asarray(render_resumable(chain, blocks, ckpt, segment_blocks=4))
    np.testing.assert_array_equal(golden, resumed)
