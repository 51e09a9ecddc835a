"""VMEM planning for the fused conv kernels (pallas_conv.auto_pairs).

Round-4 shipped a one-point empirical '55 bytes per P*n slot' fit calibrated
against a single Mosaic OOM; round 5 replaced it with a derived estimate
(exact scratch + exact tier/radix-aware constant set + modeled stage
margin). These tests pin (a) the constant-byte mirror to the REAL nbytes of
the arrays the kernel ships, across every tier x radix combination, and
(b) the planning decisions at the shipping geometries, so a tier/radix/shape
change that moves the live set fails here before it OOMs on chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyaudiodsptools_tpu.kernels import pallas_conv as pc

TIERS = ["highest", "high", "fast"]
RADIX = ["0", "1"]
# shipping geometries: flagship chain cascade window, conv_pairs size,
# reverb window at B=4096 (the observed-OOM size), B=512 grown window
SIZES = [16384, 32768, 131072, 524288]


@pytest.fixture
def tier_env(monkeypatch):
    """Restore the precision tier and radix-2 flag after each test."""
    yield monkeypatch
    pc.set_precision_tier("high")


def _actual_const_bytes(n, P):
    arrays, _specs, _math, n_spec = pc._const_inputs(n, P, grid_ndim=2)
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((2, n // 2 + 1))
                         .astype(np.float32))
    spec_arrays, _shape = pc._spectrum_rows(packed, n, P)
    assert len(spec_arrays) == n_spec
    return sum(int(np.asarray(a).nbytes) for a in arrays + spec_arrays)


@pytest.mark.parametrize("tier", TIERS)
@pytest.mark.parametrize("radix2", RADIX)
@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("P", [1, 2, 4])
def test_const_bytes_mirror_matches_real_arrays(tier_env, tier, radix2, n,
                                                P):
    tier_env.setenv("PADT_CONV_RADIX2", radix2)
    pc.set_precision_tier(tier)
    assert pc._const_bytes(n, P) == _actual_const_bytes(n, P), (tier, radix2,
                                                                n, P)


@pytest.mark.parametrize("tier", TIERS)
@pytest.mark.parametrize("radix2", RADIX)
def test_auto_pairs_decisions_stable_across_tiers(tier_env, tier, radix2):
    """Every shipping geometry keeps its validated pairs-per-step under
    every tier/radix combination, and the estimated live set always fits
    the kernels' vmem_limit_bytes."""
    tier_env.setenv("PADT_CONV_RADIX2", radix2)
    pc.set_precision_tier(tier)
    # flagship cascade (n=32768) keeps P=2 (BENCH_AB_r04 pairs sweep)
    assert pc.auto_pairs(32768, 2) == 2
    # reverb at B=4096 (n=524288): P=4 OOM'd on chip in r4 -> must shrink.
    # The default config (high, radix-2) lands on the chip-validated P=2;
    # the Karatsuba tier's larger constant set may shrink further, but
    # never below 1 and always inside the limit.
    p_big = pc.auto_pairs(524288, 4)
    if tier == "high" and radix2 == "1":
        assert p_big == 2
    assert 1 <= p_big <= 2
    for n in SIZES:
        p = pc.auto_pairs(n, 4)
        assert pc.vmem_estimate_bytes(n, p) <= pc.VMEM_LIMIT, (tier, radix2,
                                                               n, p)


def test_estimate_monotone_in_pairs(tier_env):
    for n in SIZES:
        assert (pc.vmem_estimate_bytes(n, 4)
                > pc.vmem_estimate_bytes(n, 2)
                > pc.vmem_estimate_bytes(n, 1))
