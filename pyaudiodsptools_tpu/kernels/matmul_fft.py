"""Matmul (MXU) FFT convolution for the segmented overlap-save path.

XLA:TPU's native FFT runs on the VPU and measures ~5-10x off roofline for
the batched mid-size transforms the segmented convolution needs. The MXU is
the chip's FLOP engine, and a pow2 FFT factors exactly into two dense DFT
matmuls (the classic 4-step algorithm):

    x(N) -> A[n1, n2] (N = N1*N2, n = n1*N2 + n2)
    stage 1: DFT_N1 along n1 (matmul with the N1-point DFT matrix)
    twiddle: * W_N^(k1*n2)
    stage 2: DFT_N2 along n2 (matmul with the N2-point DFT matrix)
    giving X in GRID layout X'[k1, k2] = X[k1 + N1*k2]

For convolution the grid layout never needs unscrambling: the filter
spectrum is reordered into the same grid once (host/param side is a cheap
device reshape), multiplied elementwise, and the inverse 4-step (reverse
stages, conjugate twiddles) lands back in natural sample order.

Real signals use the two-for-one complex packing: rows are paired as
z = x_a + i*x_b; because the filter kernel is real (conjugate-symmetric
spectrum), irfft-equivalent recovery is just Re(y) -> conv_a,
Im(y) -> conv_b. No rfft untangling, exact in infinite precision.

Complex matmuls run as real einsums. Precision tiers measured on v5e for a
full conv (fft -> spectrum multiply -> ifft) vs float64:

    HIGHEST (bf16x6, ~= true f32)   128 dB   <- default FOR THIS MODULE
    HIGH    (bf16x3)                 89 dB   ~1% faster end-to-end
    DEFAULT (bf16)                   47 dB   rejected (parity bar is 60)

NOTE ON DEFAULTS: this einsum path is only the FALLBACK for accelerator
backends without Mosaic (the TPU chain runs kernels/pallas_conv.py, whose
in-kernel bf16x3/Karatsuba tiers and their own measured dB/defaults are
documented there — pallas_conv is the shipping configuration). Here the
einsums are never the bottleneck, so the fallback keeps full-precision
HIGHEST; ``PADT_FFT_PRECISION=high`` opts this module into bf16x3.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_PREC = (jax.lax.Precision.HIGH
         if os.environ.get("PADT_FFT_PRECISION", "highest").lower() == "high"
         else jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=None)
def _plan(n: int) -> tuple[int, int]:
    """Split pow2 n into (N1, N2) with N1 >= N2, both >= 64 when possible
    (MXU tiles are 128x128; tiny DFT matrices waste the array)."""
    n1 = 1
    while n1 * n1 < n:
        n1 *= 2
    return n1, n // n1


@lru_cache(maxsize=None)
def _consts(n: int):
    """Host-side f64 DFT matrices + twiddles for size n, as f32 NUMPY arrays
    (numpy, not jnp: values created inside a jit trace must not be cached)."""
    n1, n2 = _plan(n)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)  # W_N^(k1*n2)
    c = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return c(f1), c(f2), c(tw)


def _cmatmul_left(fr, fi, ar, ai):
    """(fr + i fi) @ (ar + i ai) along the contracted middle axis:
    f: (K, N), a: (B, N, M) -> (B, K, M). Karatsuba: 3 real matmuls
    instead of 4 (the extra elementwise adds are VPU noise next to a
    precision=HIGHEST matmul)."""
    def mm(f, a):
        return jnp.einsum("kn,bnm->bkm", f, a, precision=_PREC)

    t1 = mm(fr, ar)
    t2 = mm(fi, ai)
    t3 = mm(fr + fi, ar + ai)
    return t1 - t2, t3 - t1 - t2


def _cmatmul_right(ar, ai, fr, fi):
    """a: (B, K, N), f: (N, M) -> (B, K, M). Karatsuba, as above."""
    def mm(a, f):
        return jnp.einsum("bkn,nm->bkm", a, f, precision=_PREC)

    t1 = mm(ar, fr)
    t2 = mm(ai, fi)
    t3 = mm(ar + ai, fr + fi)
    return t1 - t2, t3 - t1 - t2


def fft_grid(zr: jnp.ndarray, zi: jnp.ndarray, n: int):
    """Complex FFT (batch, n) -> grid layout (batch, N1, N2),
    X'[k1,k2] = X[k1 + N1*k2]."""
    n1, n2 = _plan(n)
    (f1r, f1i), _, (twr, twi) = _consts(n)
    ar = zr.reshape(zr.shape[:-1] + (n1, n2))
    ai = zi.reshape(zi.shape[:-1] + (n1, n2))
    br, bi = _cmatmul_left(f1r, f1i, ar, ai)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    _, (f2r, f2i), _ = _consts(n)
    return _cmatmul_right(cr, ci, f2r, f2i)


def ifft_grid(xr: jnp.ndarray, xi: jnp.ndarray, n: int):
    """Inverse of fft_grid: grid (batch, N1, N2) -> (batch, n) samples."""
    n1, n2 = _plan(n)
    (f1r, f1i), (f2r, f2i), (twr, twi) = _consts(n)
    # reverse stage 2 (conjugate transform), conjugate twiddle, stage 1
    dr, di = _cmatmul_right(xr, xi, f2r, -f2i)
    cr = dr * twr + di * twi
    ci = di * twr - dr * twi
    ar, ai = _cmatmul_left(f1r, -f1i, cr, ci)
    s = 1.0 / n
    return (ar * s).reshape(ar.shape[:-2] + (n,)), \
           (ai * s).reshape(ai.shape[:-2] + (n,))


def grid_spectrum(packed_rfft: jnp.ndarray, n: int):
    """(2, n//2+1) packed rfft -> grid-layout (real, imag) (N1, N2).

    Rebuilds the full conjugate-symmetric spectrum and reorders it so
    H'[k1,k2] = H[k1 + N1*k2] (cheap device-side one-off per call)."""
    n1, n2 = _plan(n)
    hr_half, hi_half = packed_rfft[0], packed_rfft[1]
    hr = jnp.concatenate([hr_half, hr_half[1:-1][::-1]])
    hi = jnp.concatenate([hi_half, -hi_half[1:-1][::-1]])
    # flat index k = k1 + N1*k2 -> reshape (N2, N1) then transpose
    return hr.reshape(n2, n1).T, hi.reshape(n2, n1).T


def conv_pairs(flat: jnp.ndarray, packed_rfft: jnp.ndarray,
               n: int) -> jnp.ndarray:
    """Circular convolution of real rows with a real kernel's spectrum.

    flat: (B, n) float32; packed_rfft: (2, n//2+1). Equals
    irfft(rfft(flat) * H) in f32. Rows are processed two at a time as one
    complex signal (exact for a real kernel).
    """
    B = flat.shape[0]
    if B % 2:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    z = flat.reshape(-1, 2, n)
    zr, zi = z[:, 0, :], z[:, 1, :]
    xr, xi = fft_grid(zr, zi, n)
    hr, hi = grid_spectrum(packed_rfft, n)
    yr = xr * hr - xi * hi
    yi = xr * hi + xi * hr
    or_, oi = ifft_grid(yr, yi, n)
    out = jnp.stack([or_, oi], axis=1).reshape(-1, n)
    return out[:B].astype(jnp.float32)


def use_mxu_fft(n: int) -> bool:
    """MXU path eligibility: pow2 size with both factors >= 128 so the DFT
    matmuls tile the MXU, and a non-CPU backend (on CPU jnp.fft wins)."""
    if n < 128 * 128 or n & (n - 1):
        return False
    return jax.default_backend() != "cpu"
