"""LTI chain fusion (engine/chain.fuse_lti_runs + ops/fft_filter.fir) and the
speculative segment-parallel dynamics kernel (dynamics_pallas_offline)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.kernels.dynamics_pallas import dynamics_pallas_offline

from ref_loader import snr_db


def _fir_effects(cfg):
    return [
        ops.lowcut(cfg, 120.0),
        ops.highcut(cfg, 12000.0),
        ops.eq3band_fft(cfg, 250.0, 2.0, 1500.0, -1.5, 6000.0, 2.5),
    ]


def test_fused_offline_matches_unfused():
    cfg = EngineConfig(44100, 512)
    fused = Chain(_fir_effects(cfg), fuse=True)
    plain = Chain(_fir_effects(cfg), fuse=False)
    assert len(fused.exec_effects) == 1
    assert len(plain.exec_effects) == 3

    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        (rng.standard_normal((2, 20, 512)) * 0.3).astype(np.float32))
    a = np.asarray(fused.render_blocks(blocks))
    b = np.asarray(plain.render_blocks(blocks))
    assert snr_db(b, a) > 100.0


def test_fused_streaming_matches_unfused_and_offline():
    cfg = EngineConfig(44100, 512)
    fused = Chain(_fir_effects(cfg), fuse=True)
    plain = Chain(_fir_effects(cfg), fuse=False)

    rng = np.random.default_rng(1)
    blocks = jnp.asarray(
        (rng.standard_normal((2, 12, 512)) * 0.3).astype(np.float32))
    sf, sp = fused.init_state((2,)), plain.init_state((2,))
    outs_f, outs_p = [], []
    for i in range(12):
        sf, bf = fused.step(sf, blocks[:, i])
        sp, bp = plain.step(sp, blocks[:, i])
        outs_f.append(np.asarray(bf))
        outs_p.append(np.asarray(bp))
    # compare whole streams (individual early blocks are pure latency zeros)
    f, p = np.stack(outs_f, axis=1), np.stack(outs_p, axis=1)
    assert snr_db(p, f) > 100.0
    offline = np.asarray(fused.render_blocks(blocks))
    assert snr_db(offline, f) > 100.0


def test_fusion_skips_nonlti_and_short_runs():
    cfg = EngineConfig(44100, 512)
    chain = Chain([
        ops.lowcut(cfg, 120.0),          # run of 1: kept as-is
        ops.compressor(cfg),              # non-LTI boundary
        ops.highcut(cfg, 9000.0),
        ops.eq3band_fft(cfg, 250.0, 2.0, 1500.0, -1.5, 6000.0, 2.5),
    ])
    names = [e.name for e in chain.exec_effects]
    assert names[0] == "lowcut" and names[1] == "compressor"
    assert len(names) == 3 and names[2].startswith("fir_cascade")


def test_generic_fir_matches_numpy_convolution():
    from pyaudiodsptools_tpu.ops.fft_filter import fir

    rng = np.random.default_rng(2)
    kernel = rng.standard_normal(700) / 700.0
    eff = fir(kernel, 256)
    x = (rng.standard_normal((3, 8, 256)) * 0.5).astype(np.float32)
    got = np.asarray(eff.offline(eff.params, jnp.asarray(x)))
    want = np.stack([
        np.convolve(x[c].reshape(-1), kernel)[: 8 * 256] for c in range(3)
    ]).reshape(3, 8, 256)
    assert snr_db(want.astype(np.float32), got) > 100.0


@pytest.mark.parametrize("mk", [
    lambda cfg: [ops.lowcut(cfg, 200.0), ops.delay(cfg, 40.0, 2)],
    lambda cfg: [ops.delay(cfg, 30.0, 2, wet=True), ops.highcut(cfg, 9000.0)],
    lambda cfg: [ops.lowcut(cfg, 300.0), ops.reverb(cfg, 120.0)],
    lambda cfg: [ops.delay(cfg, 25.0, 2, use_lowcut_filter=True,
                           lowcut_hz=100.0), ops.highcut(cfg, 8000.0)],
])
def test_delay_reverb_fuse(mk):
    cfg = EngineConfig(44100, 512)
    fused = Chain(mk(cfg), fuse=True)
    plain = Chain(mk(cfg), fuse=False)
    assert len(fused.exec_effects) == 1

    rng = np.random.default_rng(3)
    blocks = jnp.asarray(
        (rng.standard_normal((2, 24, 512)) * 0.3).astype(np.float32))
    a = np.asarray(fused.render_blocks(blocks))
    b = np.asarray(plain.render_blocks(blocks))
    assert snr_db(b, a) > 90.0


# --- speculative segment-parallel dynamics -------------------------------

def _signals(n):
    rng = np.random.default_rng(42)
    yield "bursty", (rng.standard_normal((2, n)) * 0.3 *
                     (rng.random((2, n)) > 0.5)).astype(np.float32)
    # adversarial: hovers around threshold with no sync windows anywhere,
    # forcing the sweep loop toward its serial worst case
    yield "alternating", np.tile([0.9, 1e-4], n // 2)[None, :].repeat(
        2, 0).astype(np.float32)
    yield "silence", np.zeros((2, n), np.float32)


@pytest.mark.parametrize("factory,kwargs", [
    (ops.compressor, dict(threshold_db=-18.0, ratio=0.6)),
    (ops.gate, dict(threshold_db=-45.0, depth=0.1)),
])
@pytest.mark.parametrize("segments", [1, 5, 16])
def test_spec_dynamics_matches_scan(factory, kwargs, segments):
    cfg = EngineConfig(44100, 512)
    eff = factory(cfg, **kwargs)
    n = 30000
    for name, sig in _signals(n):
        x = jnp.asarray(sig)
        st = eff.init_state(eff.params, (2,))
        _, want = eff.step(eff.params, st, x)
        got = dynamics_pallas_offline(eff.params, x, segments=segments,
                                      interpret=True)
        assert snr_db(np.asarray(want), np.asarray(got)) > 100.0, (
            name, segments)


def test_spec_dynamics_short_attack_edge():
    """x_max == 1 collapses ATTACK entirely (trigger jumps straight to
    HOLD); the single-int encoding must handle it."""
    cfg = EngineConfig(44100, 512)
    eff = ops.compressor(cfg, threshold_db=-20.0, ratio=0.5,
                         attack_ms=1000.0 / 44100.0, release_ms=2.0)
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((1, 8000)) * 0.5
                     ).astype(np.float32))
    st = eff.init_state(eff.params, (1,))
    _, want = eff.step(eff.params, st, x)
    got = dynamics_pallas_offline(eff.params, x, segments=7, interpret=True)
    assert snr_db(np.asarray(want), np.asarray(got)) > 100.0


def test_dynamics_cascade_matches_scan_fold():
    """fused_dynamics runs compressor->gate in ONE kernel pass; must match
    folding the two faithful scans (including on a signal with no sync
    windows)."""
    from pyaudiodsptools_tpu.kernels.dynamics_pallas import fused_dynamics

    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6, 3.1, 30.1)
    gate = ops.gate(cfg, -45.0, 0.1, 3.1, 200.1)
    fused = fused_dynamics([comp, gate], interpret=True)

    rng = np.random.default_rng(11)
    for sig in [
        (rng.standard_normal((2, 30000)) * 0.3 *
         (rng.random((2, 30000)) > 0.5)).astype(np.float32),
        np.tile([0.9, 1e-4], 15000)[None, :].repeat(2, 0).astype(np.float32),
    ]:
        x = jnp.asarray(sig)
        st1 = comp.init_state(comp.params, (2,))
        st2 = gate.init_state(gate.params, (2,))
        _, mid = comp.step(comp.params, st1, x)
        _, want = gate.step(gate.params, st2, mid)
        got = fused.offline(fused.params, x.reshape(2, -1, 500)).reshape(2, -1)
        assert snr_db(np.asarray(want), np.asarray(got)) > 100.0

    # streaming fold is the faithful scans verbatim
    x = jnp.asarray((rng.standard_normal((2, 4000)) * 0.4).astype(np.float32))
    st = fused.init_state(fused.params, (2,))
    _, out = fused.step(fused.params, st, x)
    st1 = comp.init_state(comp.params, (2,))
    st2 = gate.init_state(gate.params, (2,))
    _, mid = comp.step(comp.params, st1, x)
    _, want = gate.step(gate.params, st2, mid)
    assert bool(jnp.all(out == want))


def _conv_bar() -> float:
    """SNR bar for the fused conv kernels: 100 dB on the default (direct
    bf16x3) and highest tiers; the opt-in PADT_FFT_PRECISION=fast Karatsuba
    tier trades ~3 dB for 25% fewer MXU passes (documented in pallas_conv.py)
    and is barred at its measured floor minus margin."""
    import os

    return 95.0 if os.environ.get("PADT_FFT_PRECISION", "").lower() == "fast" \
        else 100.0


@pytest.mark.parametrize("n,B,P", [(16384, 5, 2), (32768, 7, 4), (65536, 4, 8)])
def test_pallas_fused_conv_matches_fft(n, B, P):
    """The fully-fused Pallas conv kernel must equal irfft(rfft*H),
    including odd batch sizes (group padding) across sizes/pair counts."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import conv_pairs_fused

    rng = np.random.default_rng(n % 97)
    x = rng.standard_normal((B, n)).astype(np.float32)
    k = rng.standard_normal(2000) / 100.0
    H = np.fft.rfft(np.concatenate([k, np.zeros(n - len(k))]))
    packed = jnp.asarray(np.stack([H.real, H.imag]).astype(np.float32))
    want = np.fft.irfft(np.fft.rfft(x, axis=-1) * H, n=n, axis=-1)
    got = np.asarray(conv_pairs_fused(jnp.asarray(x), packed, n,
                                      pairs_per_step=P, interpret=True))
    assert got.shape == (B, n)
    assert snr_db(want.astype(np.float32), got) > _conv_bar()


@pytest.mark.parametrize("C,nb,klen,shift", [
    (3, 25, 4000, 1371),   # odd segment count -> group padding; big shift
    (1, 6, 1, 0),          # identity kernel, single short channel
    (2, 48, 4096, 2048),   # kernel exactly filling the halo
])
def test_segmented_conv_fused_matches_oracle(C, nb, klen, shift):
    _segmented_case(2048, C, nb, klen, shift)


@pytest.mark.parametrize("C,nb,klen,shift", [(2, 25, 6000, 2047),
                                             (1, 13, 1, 0)])
def test_segmented_conv_fused_radix2(C, nb, klen, shift):
    """The production geometry (B=4096, halo 2, seg 6 -> n=32768) takes the
    radix-2 DIF path (use_radix2); oracle equality must hold there too."""
    import os

    os.environ["PADT_CONV_RADIX2"] = "1"
    try:
        from pyaudiodsptools_tpu.kernels.pallas_conv import use_radix2

        assert use_radix2(32768)
        _segmented_case(4096, C, nb, klen, shift)
    finally:
        os.environ.pop("PADT_CONV_RADIX2", None)


def _segmented_case(B, C, nb, klen, shift, slack=None):
    """The in-kernel-windowed segmented conv (manual HBM DMA of overlapping
    windows + wrap-free writeback) must equal the delayed linear convolution
    y[m] = conv(x, k)[m - shift] — the same contract segmented_fft_conv
    implements with XLA-side window stacking."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import segmented_conv_fused
    from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

    halo, seg = 2, 6  # n = 8 * B
    n = (halo + seg) * B
    rng = np.random.default_rng(klen % 89)
    x = rng.standard_normal((C, nb * B)).astype(np.float32)
    k = rng.standard_normal(klen) * 0.1
    spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - klen)])))
    got = np.asarray(segmented_conv_fused(jnp.asarray(x), spec, B, halo, seg,
                                          shift, slack=slack,
                                          interpret=True))
    ref = np.stack([np.convolve(x[c], k)[: nb * B] for c in range(C)])
    if shift:
        ref = np.concatenate([np.zeros((C, shift)), ref[:, : nb * B - shift]],
                             axis=1)
    assert got.shape == x.shape
    assert snr_db(ref.astype(np.float32), got) > _conv_bar()


def test_set_precision_tier_roundtrip():
    """Runtime tier switching rebuilds the pre-split constant sets (used by
    single-process tier benchmarking)."""
    from pyaudiodsptools_tpu.kernels import pallas_conv as pc

    try:
        pc.set_precision_tier("fast")
        (c1, _), _ = pc._consts_np(16384, 2)
        assert len(c1) == 4  # Karatsuba: re/im/sum/dif pre-split pairs
        pc.set_precision_tier("high")
        (c1, _), _ = pc._consts_np(16384, 2)
        assert len(c1) == 2  # direct: re/im pairs
        pc.set_precision_tier("highest")
        (c1, _), _ = pc._consts_np(16384, 2)
        assert isinstance(c1[0], np.ndarray) and c1[0].dtype == np.float32
    finally:
        pc.set_precision_tier("high")


def test_auto_pairs_vmem_guard():
    """Large conv windows shrink pairs-per-step so the kernel's scoped VMEM
    stays inside the 100 MB limit (the reverb-at-B=4096 window, n=524288,
    OOM'd at P=4: 115.9 MB)."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import auto_pairs

    assert auto_pairs(32768) == 4       # production chain geometry
    assert auto_pairs(262144) == 4      # fits: ~57.7 MB
    assert auto_pairs(524288) == 2      # reverb at B=4096
    assert auto_pairs(1048576) == 1


@pytest.mark.parametrize("C,nb,klen,shift", [
    (2, 25, 2000, 1371),   # delta = 1371 % 128 = 91 -> spectral delay
    (1, 26, 3500, 597),    # mono; delta = 85; ample slack
])
def test_segmented_conv_fused_nopad_spectral_shift(C, nb, klen, shift):
    """The no-pad gather with a NON-row-aligned output delay: the sub-row
    remainder rides the spectrum as an exact unit-phasor delay (slack
    provided and sufficient), so no full-signal pad copy happens. Oracle
    equality must hold bit-for-SNR with the padded path's contract."""
    B, halo = 2048, 2
    slack = halo * B - (klen - 1)
    n2 = 128  # _plan(16384)[1]
    assert shift % n2 != 0 and slack >= shift % n2  # the path under test
    _segmented_case(B, C, nb, klen, shift, slack=slack)


def test_segmented_conv_fused_insufficient_slack_falls_back():
    """When the kernel nearly fills the halo, the sub-row delay would break
    the wrap-free region: the padded path must be kept (and stay correct)."""
    B, halo, klen, shift = 2048, 2, 4095, 1371  # slack = 2 < delta = 91
    assert halo * B - (klen - 1) < 1371 % 128
    _segmented_case(B, 2, 25, klen, shift, slack=halo * B - (klen - 1))


def test_segmented_conv_fused_large_shift_falls_back():
    """A shift so large that more than one window would start before the
    signal (rho > win_rows) is outside the no-pad gather's head-fix reach:
    the padded path must engage and stay correct."""
    B, halo, seg = 2048, 2, 6
    klen = 1000
    shift = 7 * B  # rho ~ 7 blocks of rows > win_rows (6 blocks)
    _segmented_case(B, 2, 25, klen, shift, slack=halo * B - (klen - 1))


@pytest.mark.parametrize("seed", range(6))
def test_random_chain_fused_matches_unfused(seed):
    """Property test over the fusion pass's composition space: a random
    effect sequence rendered through Chain(fuse=True) must match the same
    sequence with fusion disabled. On the CPU lane this sweeps LTI-run
    grouping and its interleaving with unfusable ops (tail/dynamics fusion
    is TPU-gated; their composition runs on chip via
    test_tpu_lane.test_chain8_kernel_backed_on_chip)."""
    from pyaudiodsptools_tpu import Chain, EngineConfig, ops

    cfg = EngineConfig(44100, 512)
    rng = np.random.default_rng(seed)
    pool = [
        lambda: ops.lowcut(cfg, float(rng.integers(80, 400))),
        lambda: ops.highcut(cfg, float(rng.integers(4000, 12000))),
        lambda: ops.delay(cfg, float(rng.integers(3, 12)), 2),
        lambda: ops.tremolo(cfg, 0.3, float(rng.integers(2, 8))),
        lambda: ops.softclipper(cfg, 0.4),
        lambda: ops.saturator(cfg, -16.0, 1.5, "soft"),
        lambda: ops.compressor(cfg, -18.0, 0.6, 3.1, 20.1),
        lambda: ops.harddistortion(cfg),
    ]
    effects = [pool[i]() for i in rng.integers(0, len(pool),
                                               size=rng.integers(3, 7))]
    blocks = jnp.asarray((rng.standard_normal((2, 8, 512)) * 0.3
                          ).astype(np.float32))
    want = np.asarray(Chain(effects, fuse=False).render_blocks(blocks))
    got = np.asarray(Chain(effects, fuse=True).render_blocks(blocks))
    # fused LTI cascades change float rounding (one conv vs N); everything
    # else in the CPU lane is either identical code or scan-exact
    err = want - got
    snr = 10 * np.log10(np.sum(want ** 2) / max(np.sum(err ** 2), 1e-30))
    assert snr > 90.0, (snr, [e.name for e in effects])


# --- lone dynamics routing (round-5: the README quick-start chain) --------

def _quickstart(cfg, dyn):
    return [ops.lowcut(cfg, 800.0), dyn, ops.softclipper(cfg, 0.44)]


@pytest.mark.parametrize("factory", [
    lambda cfg: ops.compressor(cfg, -18.0, 0.6),
    lambda cfg: ops.gate(cfg, -40.0),
])
def test_lone_dynamics_routes_through_kernel_on_tpu(monkeypatch, factory):
    """On the TPU backend a LONE compressor/gate (dynamics run of 1) must be
    wrapped with the kernel-backed ``fast_effect`` — the faithful lax.scan
    offline path measures ~23 Msamples/s on chip vs ~6.7 Gsamples/s for the
    speculative kernel (BENCH_OPS.json), so an unwrapped single would
    dominate any chain it appears in (the README quick-start chain is
    exactly this shape)."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    cfg = EngineConfig(44100, 4096)
    chain = Chain(_quickstart(cfg, factory(cfg)))
    names = [e.name for e in chain.exec_effects]
    assert len(names) == 3, names
    assert names[1].endswith("_pallas"), names


def test_lone_dynamics_stays_faithful_on_cpu():
    """Off-TPU the scan path stays (the Pallas kernel is Mosaic-only)."""
    cfg = EngineConfig(44100, 4096)
    chain = Chain(_quickstart(cfg, ops.compressor(cfg, -18.0, 0.6)))
    assert [e.name for e in chain.exec_effects][1] == "compressor"


def test_lone_dynamics_wrapper_chain_matches_scan_chain():
    """Interpret-mode render of the quick-start chain with the compressor
    wrapped exactly as fuse_lti_runs wraps it on TPU, vs the faithful scan
    chain — pins the wrapped structure's numerics on the CPU lane."""
    from pyaudiodsptools_tpu.kernels.dynamics_pallas import fast_effect

    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((2, 24 * 512)) * 0.05).astype(np.float32)
    for s in range(0, x.shape[1], 3000):
        w = min(700, x.shape[1] - s)
        x[:, s:s + w] += (rng.standard_normal((2, w)) * 0.7).astype(np.float32)
    blocks = jnp.asarray(np.clip(x, -0.99, 0.99).reshape(2, 24, 512))

    fast = Chain(_quickstart(cfg, fast_effect(comp, interpret=True)),
                 fuse=False)
    plain = Chain(_quickstart(cfg, comp), fuse=False)
    got = np.asarray(fast.render_blocks(blocks))
    want = np.asarray(plain.render_blocks(blocks))
    assert snr_db(want, got) > 100.0

    # streaming path of the wrapper (serial Pallas kernel), same structure
    sf, sp = fast.init_state((2,)), plain.init_state((2,))
    for i in range(6):
        sf, bf = fast.step(sf, blocks[:, i])
        sp, bp = plain.step(sp, blocks[:, i])
        assert snr_db(np.asarray(bp), np.asarray(bf)) > 100.0


@pytest.mark.parametrize("sig_name", ["bursty", "alternating", "silence"])
def test_dyn_loop_strategies_bit_equal(monkeypatch, sig_name):
    """The three offline sweep-loop strategies (hybrid prepass [default] /
    write-every-sweep / states-only, PADT_DYN_LOOP) must produce
    bit-identical audio: they compute the same entry fixpoint and always
    render from converged entries — including the adversarial no-sync
    'alternating' signal that drives the loop toward its serial worst
    case, and 'silence' (k=1, prepass already converged)."""
    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6)
    gate = ops.gate(cfg, -45.0, 0.1)
    sig = dict(_signals(24000))[sig_name]
    outs = {}
    for loop in ("hybrid", "write", "states"):
        monkeypatch.setenv("PADT_DYN_LOOP", loop)
        outs[loop] = np.asarray(dynamics_pallas_offline(
            [comp.params, gate.params], jnp.asarray(sig), segments=9,
            interpret=True))
    np.testing.assert_array_equal(outs["hybrid"], outs["write"])
    np.testing.assert_array_equal(outs["hybrid"], outs["states"])


# --- union-DMA windowed conv (round 5) ------------------------------------

def _assert_union(B, C, nb, klen, shift, slack):
    """Geometry must actually select _kernel_dma_union (signal long enough
    that rows >= U), then match the numpy oracle."""
    from pyaudiodsptools_tpu.kernels.pallas_conv import _plan, auto_pairs

    halo, seg = 2, 6
    n = (halo + seg) * B
    n1, n2 = _plan(n)
    P = auto_pairs(n, 2)
    win_rows = seg * B // n2
    U = (2 * P - 1) * win_rows + n1
    assert nb * B // n2 >= U, "test geometry must engage the union path"
    _segmented_case(B, C, nb, klen, shift, slack=slack)


@pytest.mark.parametrize("shift", [0, 1371, 9219])
def test_segmented_union_dma(shift):
    """Long signal engages the one-descriptor union loads/stores; the
    head-roll (rho), the tail-buffer redirect, and the sub-row spectral
    delta all ride the union path. 40 engine blocks at B=2048: rows=640
    >= U=416."""
    halo = 2
    klen = 1000
    _assert_union(2048, 2, 40, klen, shift,
                  slack=halo * 2048 - (klen - 1))


def test_segmented_union_dma_ragged_tail():
    """Signal length that pads S to the pairs-per-step multiple: the last
    union loads entirely from the zero-extended tail buffer."""
    halo = 2
    klen = 700
    _assert_union(2048, 3, 41, klen, 2047,
                  slack=halo * 2048 - (klen - 1))
