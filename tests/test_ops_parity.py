"""Golden parity tests: every op vs the live reference implementation.

Pattern (SURVEY.md §4): run the reference device chunk-by-chunk on CPU, run our
op both streaming and offline, require SNR >= 60 dB (BASELINE.json bound; most
ops land far above because only dtype differs).
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiodsptools_tpu.core import block as blk
from pyaudiodsptools_tpu.core.config import EngineConfig
from pyaudiodsptools_tpu.ops import (bitcrusher, compressor, delay, eq3band,
                                     eq3band_fft, gate, harddistortion,
                                     reverb, saturator, softclipper, tremolo)

from ref_loader import chunked, ref_config, run_ref_device, snr_db

SR = 44100
B = 512
N = B * 9 + 100  # ragged tail exercises padding


def _sig(seed=0, n=N, scale=0.5):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * scale).astype(np.float32)


def _burst_sig(n=N):
    """Loud bursts separated by quiet spans — exercises every automaton mode."""
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) * 0.02).astype(np.float32)
    for start in range(0, n, 4000):
        x[start : start + 900] += (rng.standard_normal(min(900, n - start)) * 0.7
                                   ).astype(np.float32)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def _run_ours(eff, sig, streaming=True):
    cfgB = B
    chunks = chunked(sig, cfgB)
    if streaming:
        state = eff.state()
        outs = []
        for c in chunks:
            state, out = eff(state, jnp.asarray(c))
            outs.append(np.asarray(out))
        return np.concatenate(outs)
    blocks = blk.make_blocks(jnp.asarray(sig), cfgB)
    return np.asarray(blk.combine_blocks(eff.offline(eff.params, blocks)))


def _check(golden, eff, sig, bound=60.0, consistency=110.0):
    ours_s = _run_ours(eff, sig, streaming=True)
    ours_o = _run_ours(eff, sig, streaming=False)
    s1, s2 = snr_db(golden, ours_s), snr_db(golden, ours_o)
    assert s1 > bound, f"streaming SNR {s1:.1f} dB < {bound}"
    assert s2 > bound, f"offline SNR {s2:.1f} dB < {bound}"
    # streaming and offline must agree with each other (exactly for most ops;
    # reassociation-limited for the float32 IIR scan)
    c = snr_db(ours_s, ours_o)
    assert c > consistency or np.array_equal(ours_s, ours_o), f"consistency {c:.1f} dB"


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(sample_rate=SR, block_size=B)


def test_eq3band_fft(cfg):
    ref = ref_config(SR, B)
    sig = _sig(1)
    dev = ref.CreateEQ3BandFFT(220.0, 4.5, 1200.0, -3.0, 6000.0, 6.0)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = eq3band_fft(cfg, 220.0, 4.5, 1200.0, -3.0, 6000.0, 6.0)
    _check(golden, eff, sig, bound=90.0)


def test_eq3band_biquad(cfg):
    ref = ref_config(SR, B)
    sig = _sig(2)
    dev = ref.CreateEQ3Band(200.0, 3.5, 1000.0, -2.5, 8000.0, 4.0)
    outs = []
    for c in chunked(sig, B):
        o = dev.applylowband(c.copy())
        o = dev.applymidband(o)
        o = dev.applyhighband(o)
        outs.append(np.asarray(o))
    golden = np.concatenate(outs)
    eff = eq3band(cfg, 200.0, 3.5, 1000.0, -2.5, 8000.0, 4.0)
    # The reference's biquad loop upcasts to float64 (numpy.insert of float64
    # state); the double-float (f32x2) companion-matrix scan tracks it to
    # ~110 dB (measured; plain f32 landed 62-68 dB).
    _check(golden, eff, sig, bound=100.0, consistency=100.0)


def test_compressor(cfg):
    ref = ref_config(SR, B)
    sig = _burst_sig()
    dev = ref.CreateCompressor(-15, 0.6, 3.1, 30.1)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = compressor(cfg, -15, 0.6, 3.1, 30.1)
    _check(golden, eff, sig, bound=100.0)


def test_gate(cfg):
    ref = ref_config(SR, B)
    sig = _burst_sig()
    dev = ref.CreateGate(-25, 0.1, 3.1, 200.1)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = gate(cfg, -25, 0.1, 3.1, 200.1)
    _check(golden, eff, sig, bound=100.0)


def test_delay(cfg):
    ref = ref_config(SR, B)
    sig = _sig(3, n=B * 40)  # long enough to hear the 500 ms taps
    dev = ref.CreateDelay(200, 3)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = delay(cfg, 200, 3)
    _check(golden, eff, sig, bound=100.0)


def test_delay_wet(cfg):
    ref = ref_config(SR, B)
    sig = _sig(4, n=B * 40)
    dev = ref.CreateDelay(150, 2, wet=True)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = delay(cfg, 150, 2, wet=True)
    _check(golden, eff, sig, bound=100.0)


def test_tremolo(cfg):
    ref = ref_config(SR, B)
    sig = _sig(5, n=B * 64)
    dev = ref.CreateTremolo(0.4, 4.5)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = tremolo(cfg, 0.4, 4.5)
    _check(golden, eff, sig, bound=100.0)


def test_tremolo_freeze_quirk(cfg):
    """LFO length == multiple relationship that triggers the reference's
    copy[-0:] freeze — our phase schedule must reproduce it."""
    ref = ref_config(SR, B)
    # sr/lfo_hz chosen so the rolling copy hits exactly the chunk size:
    # L = 1024 (two chunks), freeze at first consume leaving exactly 512.
    lfo_hz = SR / 1024.0
    sig = _sig(6, n=B * 16)
    dev = ref.CreateTremolo(0.5, lfo_hz)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = tremolo(cfg, 0.5, lfo_hz)
    _check(golden, eff, sig, bound=100.0)


def test_saturator(cfg):
    ref = ref_config(SR, B)
    for mode in ("hard", "soft"):
        sig = _sig(7, scale=0.6)
        dev = ref.CreateSaturator(-20.0, 2.0, mode)
        golden = run_ref_device(dev, chunked(sig, B))
        eff = saturator(cfg, -20.0, 2.0, mode)
        _check(golden, eff, sig, bound=100.0)


def test_softclipper(cfg):
    ref = ref_config(SR, B)
    sig = _sig(8, scale=0.8)
    dev = ref.CreateSoftClipper(0.44)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = softclipper(cfg, 0.44)
    _check(golden, eff, sig, bound=100.0)


def test_harddistortion(cfg):
    ref = ref_config(SR, B)
    sig = _sig(9, scale=0.7)
    dev = ref.CreateHardDistortion()
    golden = run_ref_device(dev, chunked(sig, B))
    eff = harddistortion(cfg)
    _check(golden, eff, sig, bound=100.0)


def test_bitcrusher(cfg):
    ref = ref_config(SR, B)
    sys.path.insert(0, "/root/reference")
    from pyAudioDspTools._EffectBitCrusher import CreateBitCrusher

    sig = _sig(10, scale=0.5)
    dev = CreateBitCrusher()
    golden = run_ref_device(dev, chunked(sig, B))
    eff = bitcrusher(cfg)
    _check(golden, eff, sig, bound=100.0)


def test_reverb(cfg):
    ref = ref_config(SR, B)
    from pyAudioDspTools._EffectReverb import CreateReverb

    sig = _sig(11, n=B * 80)
    dev = CreateReverb(1500)
    chunks = chunked(sig, B)
    golden = np.concatenate([np.asarray(dev.applyreverb(c.copy())) for c in chunks])
    eff = reverb(cfg, 1500)
    _check(golden, eff, sig, bound=90.0)


def test_fast_pow_accuracy():
    """The tail kernel's bounded-domain pow (ws._pow01_fast: exp2(d*log2 u)
    with short polynomials) must stay within ~1e-6 absolute of float64
    np.power over its whole domain — the margin that keeps the softclipper
    >100 dB against the reference."""
    from pyaudiodsptools_tpu.ops.waveshapers import _pow01_fast

    rng = np.random.default_rng(11)
    u = np.concatenate([
        rng.random(200_000),                      # bulk of the domain
        10.0 ** rng.uniform(-30, 0, 50_000),      # tiny magnitudes
        np.array([0.0, 1.0, 1e-38, 1e-30, 0.5, 0.9999999]),
    ]).astype(np.float32)
    for d in (1.0, 1.44, 2.0, 2.7):
        got = np.asarray(_pow01_fast(jnp.asarray(u), d), np.float64)
        want = np.power(u.astype(np.float64), d)
        assert np.max(np.abs(got - want)) < 1e-6, d


def test_softclipper_fast_pow_matches_reference(cfg):
    """The fast-pow softclip variant (the TPU tail kernel's map stage,
    PADT_TAIL_FAST_POW default on) against the live reference — same bar
    as the faithful op."""
    from pyaudiodsptools_tpu.ops.waveshapers import _softclip_fast

    ref = ref_config(SR, B)
    sig = _sig(8, scale=0.8)
    dev = ref.CreateSoftClipper(0.44)
    golden = run_ref_device(dev, chunked(sig, B))
    eff = softclipper(cfg, 0.44)
    got = np.asarray(_softclip_fast(eff.params, jnp.asarray(sig)))
    assert snr_db(golden[: len(sig)], got[: len(golden)]) > 100.0
