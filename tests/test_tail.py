"""Fused tail kernel (kernels/tail_pallas): interpret-mode equality against
the member ops' own offline paths, plus fusion-pass grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiodsptools_tpu import EngineConfig, ops
from pyaudiodsptools_tpu.engine.chain import fuse_tail_runs
from pyaudiodsptools_tpu.kernels.tail_pallas import (fused_tail,
                                                     tail_fusable)

CFG = EngineConfig(sample_rate=44100, block_size=512)


def _blocks(key, shape, scale=0.6):
    return scale * jax.random.normal(jax.random.key(key), shape,
                                     dtype=jnp.float32)


def _sequential(effects, blocks):
    for e in effects:
        blocks = e.offline(e.params, blocks)
    return blocks


def _check(effects, shape, key=0, tile=1024, scale=0.6):
    blocks = _blocks(key, shape, scale)
    want = _sequential(effects, blocks)
    fused = fused_tail(effects, interpret=True)
    # force the kernel path with a small tile so multi-tile + halo branches
    # are exercised even on short test signals
    from pyaudiodsptools_tpu.kernels import tail_pallas

    stages, n_scal, n_gain, D = tail_pallas._plan_stages(effects)
    x = blocks.reshape(shape[0], -1) if len(shape) == 3 else blocks.reshape(1, -1)
    params = tuple(e.params for e in effects)
    from pyaudiodsptools_tpu.ops.tremolo import TremoloParams, gain_row

    grows = [gain_row(p, shape[-2], shape[-1]) for p in params
             if isinstance(p, TremoloParams)]
    gains = jnp.stack(grows) if grows else None
    scal = tail_pallas._pack_scalars(effects, params)
    got = tail_pallas.tail_kernel(stages, n_scal, n_gain, D, scal, x, gains,
                                  tile=tile, interpret=True)
    got = got.reshape(shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
    return fused


def test_delay_tremolo_softclip_multitile():
    effects = [ops.delay(CFG, time_in_ms=9.0, feedback_loops=2),
               ops.tremolo(CFG, 0.3, 5.0),
               ops.softclipper(CFG, 0.44)]
    # 8 channels, 12 blocks of 512 = 6144 samples; tile=1024 -> 6 time tiles
    _check(effects, (8, 12, 512))


def test_tremolo_softclip_no_taps():
    effects = [ops.tremolo(CFG, 0.5, 3.0), ops.softclipper(CFG, 0.2)]
    _check(effects, (8, 5, 512))


def test_waveshaper_before_delay_halo_silence():
    # harddistortion maps 0 -> ~0.95: the kernel must re-zero the
    # before-start halo so the delay taps still read silence
    effects = [ops.harddistortion(CFG),
               ops.delay(CFG, time_in_ms=5.0, feedback_loops=2)]
    _check(effects, (8, 6, 512), scale=0.4)


def test_wet_delay_and_saturator():
    effects = [ops.delay(CFG, time_in_ms=7.0, feedback_loops=3, wet=True),
               ops.saturator(CFG, -18.0, 1.5, "soft")]
    _check(effects, (8, 7, 512))


def test_two_delays_cumulative_halo():
    effects = [ops.delay(CFG, time_in_ms=4.0, feedback_loops=2),
               ops.softclipper(CFG, 0.3),
               ops.delay(CFG, time_in_ms=6.0, feedback_loops=1)]
    _check(effects, (8, 8, 512))


def test_bitcrusher_in_tail():
    effects = [ops.tremolo(CFG, 0.4, 6.0), ops.bitcrusher(CFG)]
    _check(effects, (8, 4, 512))


def test_remainder_tile():
    # T = 2560 with tile=1024 -> REM = 512 exercises the partial-tile DMAs
    effects = [ops.delay(CFG, time_in_ms=3.0, feedback_loops=2),
               ops.softclipper(CFG, 0.44)]
    _check(effects, (8, 5, 512))


def test_mono_blocks_shape():
    effects = [ops.tremolo(CFG, 0.3, 5.0), ops.softclipper(CFG, 0.44)]
    blocks = _blocks(3, (6, 512))
    want = _sequential(effects, blocks)
    got = fused_tail(effects, interpret=True).offline(
        tuple(e.params for e in effects), blocks)
    # mono (nb, B) reshapes to C=1: the kernel pads rows to the 8-sublane
    # multiple internally, so mono rides the fused path (no fallback)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_mono_c1_through_kernel_with_taps():
    # C=1 exercises the row-padding path with a delay halo: pad rows are
    # zeros and must stay inert through taps/gain/map stages
    effects = [ops.delay(CFG, time_in_ms=9.0, feedback_loops=2),
               ops.tremolo(CFG, 0.3, 5.0),
               ops.softclipper(CFG, 0.44)]
    _check(effects, (12, 512))


def test_c3_through_kernel():
    # C=3 (not a sublane multiple): fused == sequential after row padding
    effects = [ops.harddistortion(CFG),
               ops.delay(CFG, time_in_ms=5.0, feedback_loops=2)]
    _check(effects, (3, 6, 512), scale=0.4)


def test_streaming_step_matches_members():
    effects = [ops.delay(CFG, time_in_ms=9.0, feedback_loops=2),
               ops.tremolo(CFG, 0.3, 5.0),
               ops.softclipper(CFG, 0.44)]
    fused = fused_tail(effects, interpret=True)
    state_f = fused.state((2,))
    states = [e.state((2,)) for e in effects]
    blocks = _blocks(1, (2, 4, 512))
    for bi in range(4):
        blk = blocks[:, bi]
        state_f, out_f = fused.step(fused.params, state_f, blk)
        out_m = blk
        for k, e in enumerate(effects):
            states[k], out_m = e.step(e.params, states[k], out_m)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_m),
                                   rtol=1e-6, atol=1e-7)


def test_fusable_predicate():
    assert tail_fusable(ops.delay(CFG, 5.0, 2))
    assert not tail_fusable(ops.delay(CFG, 5.0, 2, use_lowcut_filter=True))
    assert tail_fusable(ops.tremolo(CFG))
    assert tail_fusable(ops.softclipper(CFG))
    assert tail_fusable(ops.saturator(CFG))
    assert tail_fusable(ops.harddistortion(CFG))
    assert tail_fusable(ops.bitcrusher(CFG))
    assert not tail_fusable(ops.lowcut(CFG, 160.0))
    assert not tail_fusable(ops.compressor(CFG))


def test_fuse_tail_runs_grouping():
    effects = (ops.compressor(CFG),
               ops.delay(CFG, 5.0, 2),
               ops.tremolo(CFG),
               ops.softclipper(CFG))
    out = fuse_tail_runs(effects)
    assert len(out) == 2
    assert out[0].name == "compressor"
    assert out[1].name.startswith("tail:")
    # single fusable effect stays unfused
    out2 = fuse_tail_runs((ops.compressor(CFG), ops.tremolo(CFG)))
    assert [e.name for e in out2] == ["compressor", "tremolo"]
