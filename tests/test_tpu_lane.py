"""Real-TPU test lane: the non-interpret Mosaic paths, on the chip.

Run with  PADT_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_lane.py -q
(conftest pins the platform; on the default CPU lane these all skip). The
cases cover exactly the surfaces whose interpret-mode tests cannot catch a
Mosaic lowering regression: the fused conv kernels, the dynamics kernels,
the fused tail kernel, and one end-to-end kernel-backed chain render.

Budget and discipline (measured round 3/4):
* Full lane: ~230-360 s on an idle chip; budget 900 s — concurrent CPU load
  has pushed it past 590 s. Per-round pass/fail + wall time is recorded in
  TPU_LANE_r{N}.txt at the repo root.
* Per-change smoke subset: ``-m tpu_smoke`` (~60 s) covers one case per
  kernel family; run it after every kernel edit, the full lane before
  committing a kernel change.
* NEVER kill a running TPU process (single-client tunnel: a killed client
  wedges the tunnel for up to ~45 min). Run under ``timeout``, serialize
  all TPU processes, and let them exit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import snr_db

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="real-TPU lane (set PADT_TEST_PLATFORM=tpu)"),
]


def test_segmented_conv_fused_on_chip():
    from pyaudiodsptools_tpu.kernels.pallas_conv import segmented_conv_fused
    from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

    B, halo, seg = 2048, 2, 6  # n = 16384
    n = (halo + seg) * B
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 12 * B)).astype(np.float32)
    k = rng.standard_normal(3000) * 0.1
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - 3000)])))
    got = np.asarray(segmented_conv_fused(jnp.asarray(x), spec, B, halo, seg,
                                          1371))
    ref = np.stack([np.convolve(x[c], k)[: 12 * B] for c in range(3)])
    ref = np.concatenate([np.zeros((3, 1371)), ref[:, : 12 * B - 1371]],
                         axis=1)
    assert snr_db(ref.astype(np.float32), got) > 95.0


@pytest.mark.tpu_smoke
def test_conv_pairs_fused_on_chip():
    from pyaudiodsptools_tpu.kernels.pallas_conv import conv_pairs_fused

    n = 16384
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, n)).astype(np.float32)
    k = rng.standard_normal(2000) / 100.0
    H = np.fft.rfft(np.concatenate([k, np.zeros(n - 2000)]))
    packed = jnp.asarray(np.stack([H.real, H.imag]).astype(np.float32))
    got = np.asarray(conv_pairs_fused(jnp.asarray(x), packed, n,
                                      pairs_per_step=2))
    want = np.fft.irfft(np.fft.rfft(x, axis=-1) * H, n=n, axis=-1)
    assert snr_db(want.astype(np.float32), got) > 95.0


def _burst(channels, n, seed=5):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((channels, n)) * 0.02).astype(np.float32)
    for start in range(0, n, 3000):
        seg = min(700, n - start)
        x[:, start:start + seg] += (rng.standard_normal((channels, seg)) * 0.7
                                    ).astype(np.float32)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


@pytest.mark.tpu_smoke
def test_dynamics_kernels_on_chip():
    """Serial kernel == speculative offline kernel == (ulp-close to) the
    faithful scan, all executing the real Mosaic lowering."""
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels.dynamics_pallas import (
        dynamics_pallas, dynamics_pallas_offline)
    from pyaudiodsptools_tpu.ops import dynamics as dyn

    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6, 3.1, 30.1)
    x = jnp.asarray(_burst(4, 512 * 24))

    st = dyn.init_state(comp.params, (4,))
    _, want = dyn.step(comp.params, st, x)

    st2 = dyn.init_state(comp.params, (4,))
    _, got_serial = dynamics_pallas(comp.params, st2, x)
    assert snr_db(np.asarray(want), np.asarray(got_serial)) > 100.0

    got_spec = dynamics_pallas_offline(comp.params, x)
    np.testing.assert_array_equal(np.asarray(got_serial), np.asarray(got_spec))


@pytest.mark.tpu_smoke
def test_fused_tail_on_chip(monkeypatch):
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels.tail_pallas import fused_tail

    # bit-equality vs the op path requires the generic pow on both sides
    # (the fast-pow default is covered by test_fused_tail_fast_pow_on_chip)
    monkeypatch.setenv("PADT_TAIL_FAST_POW", "0")
    cfg = EngineConfig(44100, 512)
    effs = [ops.delay(cfg, 150.0, 2), ops.tremolo(cfg, 0.3, 5.0),
            ops.softclipper(cfg, 0.44)]
    fused = fused_tail(effs)
    rng = np.random.default_rng(3)
    blocks = jnp.asarray((rng.standard_normal((2, 24, 512)) * 0.4
                          ).astype(np.float32))
    got = fused.offline(fused.params, blocks)
    want = blocks
    for e in effs:
        want = e.offline(e.params, want)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.tpu_smoke
def test_fused_tail_mono_on_chip(monkeypatch):
    """Mono (C=1, the reference's primary shape) rides the fused tail via
    internal row padding — real Mosaic lowering, not interpret mode."""
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels.tail_pallas import fused_tail

    monkeypatch.setenv("PADT_TAIL_FAST_POW", "0")  # see test_fused_tail_on_chip
    cfg = EngineConfig(44100, 512)
    effs = [ops.delay(cfg, 150.0, 2), ops.tremolo(cfg, 0.3, 5.0),
            ops.softclipper(cfg, 0.44)]
    fused = fused_tail(effs)
    rng = np.random.default_rng(9)
    blocks = jnp.asarray((rng.standard_normal((24, 512)) * 0.4
                          ).astype(np.float32))
    got = fused.offline(fused.params, blocks)
    want = blocks
    for e in effs:
        want = e.offline(e.params, want)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_chain8_kernel_backed_on_chip():
    """The full flagship chain with every kernel engaged (fused LTI conv,
    dynamics cascade, fused tail) vs the faithful scan-based chain."""
    from pyaudiodsptools_tpu import EngineConfig
    from pyaudiodsptools_tpu.core import block as blk
    from __graft_entry__ import _chain8

    cfg = EngineConfig(sample_rate=44100, block_size=4096)
    sig = _burst(2, 4096 * 12, seed=11)
    blocks = blk.make_blocks(jnp.asarray(sig), cfg.block_size)

    from pyaudiodsptools_tpu import Chain

    fast = _chain8(cfg, fast_dynamics=True)
    slow = Chain(_chain8(cfg, fast_dynamics=False).effects, fuse=False)
    got = np.asarray(blk.combine_blocks(fast.render_blocks(blocks)))
    want = np.asarray(blk.combine_blocks(slow.render_blocks(blocks)))
    # Two bf16x3 convolution stages (~102 dB each) + the dynamics kernels'
    # arithmetic ramp evaluation compound to ~94 dB end-to-end (measured on
    # chip) — 30+ dB above the 60 dB parity contract.
    assert snr_db(want, got) > 90.0


def test_segmented_conv_radix2_on_chip(monkeypatch):
    """The radix-2 DIF path (env-gated) at the production geometry
    (B=4096, n=32768), real Mosaic lowering vs the numpy oracle."""
    monkeypatch.setenv("PADT_CONV_RADIX2", "1")
    from pyaudiodsptools_tpu.kernels.pallas_conv import (segmented_conv_fused,
                                                         use_radix2)
    from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

    assert use_radix2(32768)
    B, halo, seg = 4096, 2, 6
    n = (halo + seg) * B
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 13 * B)).astype(np.float32)
    k = rng.standard_normal(6000) * 0.1
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - 6000)])))
    got = np.asarray(segmented_conv_fused(jnp.asarray(x), spec, B, halo, seg,
                                          2047))
    ref = np.stack([np.convolve(x[c], k)[: 13 * B] for c in range(2)])
    ref = np.concatenate([np.zeros((2, 2047)), ref[:, : 13 * B - 2047]],
                         axis=1)
    assert snr_db(ref.astype(np.float32), got) > 95.0


@pytest.mark.tpu_smoke
def test_segmented_conv_small_block_grown_window_on_chip():
    """B=512 with the grown 32-block window (n=16384, q = B/n2 = 4): the
    first on-chip capture at this geometry found Mosaic rejecting the
    (1, 31) plan's 124-row store slice — plan_segments now aligns to
    (2, 30) and this case pins the small-block path's real lowering."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import (segmented_conv_fused,
                                                         use_fused_dma)
    from pyaudiodsptools_tpu.ops.fft_filter import (pack_spectrum,
                                                    plan_segments)

    B = 512
    halo, seg = plan_segments(255, B)
    assert (halo, seg) == (2, 30)
    assert use_fused_dma((halo + seg) * B, B, halo, seg)
    n = (halo + seg) * B
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 90 * B)).astype(np.float32)
    k = rng.standard_normal(255) * 0.1
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - 255)])))
    got = np.asarray(segmented_conv_fused(jnp.asarray(x), spec, B, halo, seg,
                                          385, slack=halo * B - 254))
    ref = np.stack([np.convolve(x[c], k)[: 90 * B] for c in range(3)])
    ref = np.concatenate([np.zeros((3, 385)), ref[:, : 90 * B - 385]], axis=1)
    assert snr_db(ref.astype(np.float32), got) > 95.0


@pytest.mark.tpu_smoke
def test_quickstart_chain_lone_dynamics_on_chip():
    """The README quick-start chain [lowcut, compressor, softclipper]: the
    LONE compressor must render via the Pallas kernel (fuse_lti_runs round-5
    routing), real Mosaic lowering, vs the faithful scan chain."""
    from pyaudiodsptools_tpu import Chain, EngineConfig, ops
    from pyaudiodsptools_tpu.core import block as blk

    cfg = EngineConfig(sample_rate=44100, block_size=4096)

    def effects():
        return [ops.lowcut(cfg, 800.0), ops.compressor(cfg, -18.0, 0.6),
                ops.softclipper(cfg, 0.44)]

    fast = Chain(effects())
    assert [e.name for e in fast.exec_effects][1] == "compressor_pallas"
    slow = Chain(effects(), fuse=False)

    sig = _burst(2, 4096 * 12, seed=21)
    blocks = blk.make_blocks(jnp.asarray(sig), cfg.block_size)
    got = np.asarray(blk.combine_blocks(fast.render_blocks(blocks)))
    want = np.asarray(blk.combine_blocks(slow.render_blocks(blocks)))
    assert snr_db(want, got) > 90.0


@pytest.mark.tpu_smoke
def test_fused_tail_fast_pow_on_chip(monkeypatch):
    """The opt-in fast-pow softclip (ws._pow01_fast — A/B'd and defaulted
    OFF, BENCH_AB_r05) on real Mosaic lowering, vs a float64 numpy oracle
    of the same chain — the bit-surgery exp2/log2 must keep lowering and
    holding parity far above the 60 dB contract while it stays selectable."""
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels.tail_pallas import fused_tail

    monkeypatch.setenv("PADT_TAIL_FAST_POW", "1")
    cfg = EngineConfig(44100, 512)
    effs = [ops.delay(cfg, 150.0, 2), ops.tremolo(cfg, 0.3, 5.0),
            ops.softclipper(cfg, 0.44)]
    fused = fused_tail(effs)
    from pyaudiodsptools_tpu.kernels.tail_pallas import _plan_stages

    map_fns = [st[1].__name__ for st in _plan_stages(effs)[0]
               if st[0] == "map"]
    assert "_softclip_fast" in map_fns, map_fns
    rng = np.random.default_rng(17)
    blocks = jnp.asarray((rng.standard_normal((2, 24, 512)) * 0.4
                          ).astype(np.float32))
    got = np.asarray(fused.offline(fused.params, blocks))
    # float64 oracle through the op math (delay/tremolo exact in f32; the
    # softclip pow in float64)
    want = blocks
    for e in effs[:-1]:
        want = e.offline(e.params, want)
    w = np.asarray(want, np.float64)
    drive = 0.44 + 1.0
    neg = w < 0
    a = np.clip(np.abs(w), -1.0, 1.0)
    a = -1.0 * np.abs(a - 1.0) ** drive + 1.0
    want64 = np.where(neg, -a, a)
    assert snr_db(want64.astype(np.float32), got) > 100.0


@pytest.mark.tpu_smoke
def test_spec_dynamics_relayout_on_chip():
    """C=64 engages the single-pass relayout kernels (kernels/relayout.py)
    around the speculative sweep — real Mosaic lowering of the tile-block
    DMA + in-VMEM transposes, bit-equal to the serial kernel. T is chosen
    ragged (not a multiple of 128 or the segment length) so the xtail
    redirect, the closing chunk, and the 128-wide tail patch all execute."""
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels import relayout as rl
    from pyaudiodsptools_tpu.kernels.dynamics_pallas import (
        dynamics_pallas, dynamics_pallas_offline)
    from pyaudiodsptools_tpu.ops import dynamics as dyn

    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6, 3.1, 30.1)
    gate = ops.gate(cfg, -45.0, 0.1, 3.1, 200.1)
    C, T = 64, 44100 * 3 + 331
    x = jnp.asarray(_burst(C, T, seed=23))

    st = dyn.init_state(comp.params, (C,))
    st, mid = dynamics_pallas(comp.params, st, x)
    st2 = dyn.init_state(gate.params, (C,))
    _, want = dynamics_pallas(gate.params, st2, mid)

    got = dynamics_pallas_offline([comp.params, gate.params], x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.tpu_smoke
def test_segmented_conv_union_dma_on_chip():
    """Signal long enough to engage the union-DMA kernel (rows >= U) at the
    flagship cascade geometry (halo 18 / seg 46 @ 512-unit planning,
    n=32768, radix-2 path): one-descriptor union loads + one-block stores,
    real Mosaic lowering vs the numpy oracle, including the head-roll
    (rho > 0 via a large shift) and the tail-buffer redirect."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import (_plan, auto_pairs,
                                                         segmented_conv_fused)
    from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

    B, halo, seg = 512, 18, 46
    n = (halo + seg) * B  # 32768
    n1, n2 = _plan(n)
    P = auto_pairs(n, 2)
    win_rows = seg * B // n2
    U = (2 * P - 1) * win_rows + n1
    nb, eb = 28, 4096  # 28 engine blocks of 4096
    rows = nb * eb // n2
    assert rows >= U, (rows, U)

    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, nb * eb)).astype(np.float32)
    klen = 6143
    shift = 3071
    k = rng.standard_normal(klen) * 0.02
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - klen)])))
    got = np.asarray(segmented_conv_fused(
        jnp.asarray(x), spec, B, halo, seg, shift,
        slack=halo * B - (klen - 1)))
    ref = np.stack([np.convolve(x[c], k)[: nb * eb] for c in range(2)])
    ref = np.concatenate([np.zeros((2, shift)), ref[:, : nb * eb - shift]],
                         axis=1)
    assert snr_db(ref.astype(np.float32), got) > 95.0


def test_segmented_conv_union_n2_256_on_chip():
    """Union-DMA at an n2=256 geometry (the reverb plan: halo 3 / seg 13
    @4096, shift 0): Mosaic's affine prover needs the explicit sublane
    hints here (r5: reverb was the first geometry to fail without them),
    so this case pins the hinted lowering against the numpy oracle."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import (_plan,
                                                         segmented_conv_fused)
    from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

    B, halo, seg = 4096, 3, 13
    n = (halo + seg) * B  # 65536 -> plan (256, 256)
    assert _plan(n) == (256, 256)
    nb = 28
    rng = np.random.default_rng(41)
    x = rng.standard_normal((2, nb * B)).astype(np.float32)
    klen = 9000
    k = rng.standard_normal(klen) * 0.01
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - klen)])))
    got = np.asarray(segmented_conv_fused(
        jnp.asarray(x), spec, B, halo, seg, 0))
    ref = np.stack([np.convolve(x[c], k)[: nb * B] for c in range(2)])
    assert snr_db(ref.astype(np.float32), got) > 95.0
