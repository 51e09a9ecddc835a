"""Pallas relayout kernels (kernels/relayout.py): interpret-mode correctness
vs the XLA pad/transpose construction, round-trips, ragged-tail clamps, and
the full speculative dynamics path riding them at an eligible geometry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyaudiodsptools_tpu.kernels import relayout as rl

SUB = 8


def _geom(C, T, segments):
    t_tile = 64
    unit = 128 if C % 8 == 0 and 128 % C == 0 else t_tile
    unit = max(unit, t_tile)
    L = -(-max(unit, -(-T // segments)) // unit) * unit
    G = -(-T // L)
    Tp = G * L
    R = C * G
    Rp = -(-R // (SUB * 128)) * (SUB * 128)
    K = Rp // SUB
    return G, L, Tp, R, Rp, K


def _xla_pack(x, G, L, K, R, Rp, Tp):
    C, T = x.shape
    xp = jnp.pad(x, ((0, 0), (0, Tp - T)))
    xk = jax.lax.reshape(xp.reshape(C, G, L), (L, R), dimensions=(2, 1, 0))
    return jnp.pad(xk, ((0, 0), (0, Rp - R))).reshape(L * SUB, K)


@pytest.mark.parametrize("T", [64 * 64 * 4, 64 * 64 * 4 + 777])
def test_pack_matches_xla_on_valid_region(T):
    C, segments = 64, 4
    G, L, Tp, R, Rp, K = _geom(C, T, segments)
    assert rl.use_relayout(C, T, G, L, K, R, Rp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    want = np.asarray(_xla_pack(x, G, L, K, R, Rp, Tp))
    got = np.asarray(rl.time_major_pack(x, G, L, K, interpret=True))
    assert got.shape == want.shape
    # compare only positions the kernel contracts to write: sample l of
    # segment g valid iff g*L + l < T; lanes < R
    lv = np.arange(L)[:, None]
    rv = np.arange(Rp)[None, :]
    g = rv // C
    valid = (rv < R) & (g * L + lv < T)
    valid8 = valid.reshape(L, SUB, K).transpose(0, 1, 2).reshape(L * SUB, K)
    # rebuild mask in (L*8, K) indexing: row l*8+s covers lanes s*K..s*K+K
    m = np.zeros((L * SUB, K), bool)
    for s in range(SUB):
        m[s::SUB, :] = valid[:, s * K:(s + 1) * K]
    np.testing.assert_array_equal(want[m], got[m])


@pytest.mark.parametrize("T", [64 * 64 * 4, 64 * 64 * 4 + 777])
def test_roundtrip(T):
    C, segments = 64, 4
    G, L, Tp, R, Rp, K = _geom(C, T, segments)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    tm = rl.time_major_pack(x, G, L, K, interpret=True)
    back = rl.time_major_unpack(tm, C, T, G, L, interpret=True)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


def test_ineligible_geometries():
    # C not sublane-aligned / K % C != 0 style cases fall back
    assert not rl.use_relayout(2, 30000, 16, 1920, 128, 32, 1024)
    # window cannot fit the last segment's valid span
    assert not rl.use_relayout(64, 64 * 10 + 1, 11, 64, 1024, 704, 1024)


def test_spec_dynamics_rides_relayout_interpret():
    """dynamics_pallas_offline at an eligible geometry (C=64) must engage
    the relayout kernels (interpret mode here) and still match the scan."""
    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels.dynamics_pallas import (
        dynamics_pallas_offline)
    import pyaudiodsptools_tpu.kernels.dynamics_pallas as dpmod

    cfg = EngineConfig(44100, 512)
    comp = ops.compressor(cfg, -18.0, 0.6)
    C, T = 64, 40000
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, T)) * 0.02).astype(np.float32)
    for s in range(0, T, 3000):
        w = min(700, T - s)
        x[:, s:s + w] += (rng.standard_normal((C, w)) * 0.7).astype(np.float32)
    x = np.clip(x, -0.99, 0.99).astype(np.float32)

    # confirm the geometry actually engages the kernels
    segments = max(1, min(8192 // C, T // 2048))
    G, L, Tp, R, Rp, K = _geom(C, T, segments)
    assert rl.use_relayout(C, T, G, L, K, R, Rp)

    st = comp.init_state(comp.params, (C,))
    _, want = comp.step(comp.params, st, jnp.asarray(x))
    got = dynamics_pallas_offline(comp.params, jnp.asarray(x),
                                  interpret=True)
    err = np.asarray(want) - np.asarray(got)
    p = float(np.sum(np.asarray(want) ** 2))
    snr = 10 * np.log10(p / max(float(np.sum(err ** 2)), 1e-30))
    assert snr > 100.0, snr


@pytest.mark.parametrize("C", [8, 128])
def test_roundtrip_other_channel_widths(C):
    """P = 128 // C varies the per-step descriptor fan-out (16 at C=8,
    1 at C=128); both ends of the range must round-trip exactly,
    including a ragged tail."""
    T = 128 * 64 * 3 + 533
    segments = 6
    G, L, Tp, R, Rp, K = _geom(C, T, segments)
    assert rl.use_relayout(C, T, G, L, K, R, Rp), (C, G, L, K)
    rng = np.random.default_rng(C)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    tm = rl.time_major_pack(x, G, L, K, interpret=True)
    back = rl.time_major_unpack(tm, C, T, G, L, interpret=True)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


def test_roundtrip_exact_multiple_no_tail():
    """T an exact multiple of L: the closing chunk and patch overlap
    already-written identical data (idempotence path)."""
    C = 64
    G, L = 5, 128 * 20
    T = G * L
    R = C * G
    Rp = -(-R // 1024) * 1024
    K = Rp // 8
    assert rl.use_relayout(C, T, G, L, K, R, Rp)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    tm = rl.time_major_pack(x, G, L, K, interpret=True)
    back = rl.time_major_unpack(tm, C, T, G, L, interpret=True)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))
