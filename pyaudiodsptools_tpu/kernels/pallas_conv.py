"""Fully-fused Pallas TPU kernel for the segmented FFT convolution.

kernels/matmul_fft.py runs the 4-step FFT as XLA einsums — correct and
faster than XLA's VPU FFT, but every stage round-trips its intermediate
through HBM (~7 tensor-sized passes per convolution plus layout changes),
which dominates the cost. This kernel keeps a group of windows resident in
VMEM through ALL stages — forward DFT matmuls, twiddle, spectrum multiply,
inverse — so HBM sees exactly one read of the windows and one write of the
results. DFT matmuls run on the MXU with ``precision=HIGHEST`` (measured
~140 dB per matmul on v5e).

Layout: windows are packed two-real-rows-per-complex-signal like
matmul_fft.conv_pairs. Host side arranges P pairs per grid step as a 2D
block ``(n1, 2*P*n2)`` whose column halves are [real | imag] parts, pairs
minor — the whole kernel then works on plain 2D VMEM arrays (matmuls and
contiguous column slices only; no in-kernel transposes or 4D relayouts).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul_fft import _plan

# Mosaic only lowers DEFAULT and HIGHEST dot precisions (HIGH raises
# NotImplementedError in-kernel), so the bf16x3 tier is implemented here
# MANUALLY: each f32 operand splits into hi + lo bfloat16 halves and the
# product takes three bf16 MXU passes (hi*hi + hi*lo + lo*hi) — XLA's HIGH
# scheme, half the passes of HIGHEST's six. Measured ON CHIP for a full
# segmented conv vs float64: bf16x3 102.4 dB / 13.2 ms vs HIGHEST 132.2 dB
# / 20.4 ms (64ch x 30 s, n=32768). 102 dB is ~42 dB above the 60 dB
# parity contract and above every test bar in the suite, so bf16x3 is the
# DEFAULT for these kernels; PADT_FFT_PRECISION=highest restores full f32.
# (The einsum fallback in matmul_fft.py keeps its own HIGHEST default.)
import os as _os

_HI = jax.lax.Precision.HIGHEST
_USE_B3 = _os.environ.get("PADT_FFT_PRECISION",
                          "high").lower() != "highest"


@lru_cache(maxsize=None)
def _consts_np(n: int, pairs: int):
    """f32 numpy constants for size n with P pairs per step: DFT matrices
    plus the twiddle and (empty) spectrum tiles repeated per pair."""
    n1, n2 = _plan(n)
    k1, k2 = np.arange(n1), np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)
    twr = np.tile(tw.real.astype(np.float32), (1, pairs))   # (n1, P*n2)
    twi = np.tile(tw.imag.astype(np.float32), (1, pairs))
    c = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return c(f1), c(f2), (twr, twi)


def _split_b16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm(a, b):
    if not _USE_B3:
        return jnp.dot(a, b, precision=_HI,
                       preferred_element_type=jnp.float32)
    ah, al = _split_b16(a)
    bh, bl = _split_b16(b)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _conv_math(n1, n2, P, X, f1r, f1i, f2r, f2i, twr, twi, hr, hi):
    """All DFT stages on a VMEM-resident block X (n1, 2*P*n2) whose column
    halves are [real | imag] parts, pairs minor. Returns (zr, zi), each
    (n1, P*n2): the time-domain circular convolutions in natural row-major
    sample order per pair column slab."""
    h = P * n2  # column half: [0:h) = real parts, [h:2h) = imag parts

    # stage 1: contract n1. One matmul of the full block per DFT part —
    # real and imaginary columns ride the same product.
    A = _mm(f1r[:], X)
    B = _mm(f1i[:], X)
    yr = A[:, :h] - B[:, h:]
    yi = A[:, h:] + B[:, :h]

    # twiddle (pair-tiled (n1, h))
    cr = yr * twr[:] - yi * twi[:]
    ci = yr * twi[:] + yi * twr[:]

    # stage 2: contract n2 (rows (n1*P, n2))
    cr2 = cr.reshape(n1 * P, n2)
    ci2 = ci.reshape(n1 * P, n2)
    xr = _mm(cr2, f2r[:]) - _mm(ci2, f2i[:])
    xi = _mm(cr2, f2i[:]) + _mm(ci2, f2r[:])

    # spectrum multiply (h tiled to rows (n1*P, n2))
    ur = xr * hr[:] - xi * hi[:]
    ui = xr * hi[:] + xi * hr[:]

    # inverse stage 2: multiply by conj(F2)
    vr = _mm(ur, f2r[:]) + _mm(ui, f2i[:])
    vi = _mm(ui, f2r[:]) - _mm(ur, f2i[:])

    # inverse twiddle (conjugate)
    vr = vr.reshape(n1, h)
    vi = vi.reshape(n1, h)
    wr = vr * twr[:] + vi * twi[:]
    wi = vi * twr[:] - vr * twi[:]

    # inverse stage 1: conj(F1) @ W, scaled by 1/n
    zr = (_mm(f1r[:], wr) + _mm(f1i[:], wi)) * (1.0 / (n1 * n2))
    zi = (_mm(f1r[:], wi) - _mm(f1i[:], wr)) * (1.0 / (n1 * n2))
    return zr, zi


def _kernel(n1, n2, P, x_ref, f1r, f1i, f2r, f2i, twr, twi, hr, hi, out_ref):
    zr, zi = _conv_math(n1, n2, P, x_ref[:], f1r, f1i, f2r, f2i, twr, twi,
                        hr, hi)
    out_ref[:] = jnp.concatenate([zr, zi], axis=1)


def conv_pairs_fused(flat: jnp.ndarray, packed_rfft: jnp.ndarray, n: int,
                     pairs_per_step: int = 4,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in for matmul_fft.conv_pairs: circular convolution of real rows
    (B, n) with a real kernel's packed rfft, one fused kernel pass."""
    n1, n2 = _plan(n)
    P = pairs_per_step
    B = flat.shape[0]
    rows_per_group = 2 * P
    pad_rows = (-B) % rows_per_group
    if pad_rows:
        flat = jnp.pad(flat, ((0, pad_rows), (0, 0)))
    ng = flat.shape[0] // rows_per_group  # grid length

    # (ng, P, 2, n1, n2) -> (n1, ng, 2, P, n2): per group the columns are
    # [P real rows | P imag rows], pairs minor — a contiguous 2D block.
    xk = flat.reshape(ng, P, 2, n1, n2)
    xk = jnp.transpose(xk, (3, 0, 2, 1, 4)).reshape(n1, ng * 2 * P * n2)

    (f1r, f1i), (f2r, f2i), (twr, twi) = _consts_np(n, P)

    # spectrum in grid layout, tiled per pair as rows (n1*P, n2)
    hr_half, hi_half = packed_rfft[0], packed_rfft[1]
    hr_full = jnp.concatenate([hr_half, hr_half[1:-1][::-1]])
    hi_full = jnp.concatenate([hi_half, -hi_half[1:-1][::-1]])
    hg_r = hr_full.reshape(n2, n1).T  # (n1, n2)
    hg_i = hi_full.reshape(n2, n1).T
    hrow_r = jnp.tile(hg_r[:, None, :], (1, P, 1)).reshape(n1 * P, n2)
    hrow_i = jnp.tile(hg_i[:, None, :], (1, P, 1)).reshape(n1 * P, n2)

    blk = 2 * P * n2
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, n1, n2, P),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((n1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const2((n1, n1)), const2((n1, n1)),
            const2((n2, n2)), const2((n2, n2)),
            const2((n1, P * n2)), const2((n1, P * n2)),
            const2((n1 * P, n2)), const2((n1 * P, n2)),
        ],
        out_specs=pl.BlockSpec((n1, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1, ng * blk), jnp.float32),
        # the stage intermediates' peak live set exceeds the default 16 MB
        # scoped budget; v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xk, jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(f2r),
      jnp.asarray(f2i), jnp.asarray(twr), jnp.asarray(twi), hrow_r, hrow_i)

    out = out.reshape(n1, ng, 2, P, n2)
    out = jnp.transpose(out, (1, 3, 2, 0, 4)).reshape(ng * rows_per_group, n)
    return out[:B].astype(jnp.float32)


# ---------------------------------------------------------------------------
# v2: segmented convolution with IN-KERNEL windowing (manual HBM DMA)
# ---------------------------------------------------------------------------
#
# conv_pairs_fused still needs its overlapping windows materialized and
# relaid-out by XLA before the kernel runs (a jnp.stack of (G+H)B-sample
# slices plus two full-tensor transposes) — ~5 signal-sized HBM passes of
# pure data movement around a compute-bound kernel. This kernel removes all
# of it: the flat padded signal stays in HBM; each grid step DMAs its 2P
# overlapping windows straight into the VMEM compute layout (a window is a
# contiguous (n1, n2) slice of the signal viewed as rows of n2 samples,
# because the 4-step's stage-1 operand IS the window reshaped row-major),
# and DMAs only the wrap-free region of each result back. HBM sees
# (G+H)/G reads and exactly one write of the signal — nothing else.


def _kernel_dma(n1, n2, P, halo_rows, win_rows, grows,
                f1r, f1i, f2r, f2i, twr, twi, hr, hi, x_hbm,
                out_hbm, xscr, zscr, lsem, ssem):
    # Double-buffered across grid steps: step i prefetches step i+1's
    # windows while computing, and step i's result stores are only waited
    # two steps later (when their zscr slot is about to be reused), so both
    # DMA directions overlap the matmul stages.
    ng = pl.num_programs(1)
    total = pl.num_programs(0) * ng
    i = pl.program_id(0) * ng + pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    # Column slab of signal p within the [P real | P imag] block layout:
    # pair q = p // 2 packs segments (base+2q) as real, (base+2q+1) as imag.
    def col(p):
        return ((p % 2) * P + p // 2) * n2

    def load_dma(j, s, p):
        c = jax.lax.div(j, ng)
        base = jax.lax.rem(j, ng) * 2 * P
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds((base + p) * win_rows, n1), :],
            xscr.at[s, :, pl.ds(col(p), n2)],
            lsem.at[s, p])

    def store_dma(j, s, p):
        c = jax.lax.div(j, ng)
        base = jax.lax.rem(j, ng) * 2 * P
        return pltpu.make_async_copy(
            zscr.at[s, pl.ds(halo_rows, grows), pl.ds(col(p), n2)],
            out_hbm.at[c, base + p],
            ssem.at[s, p])

    @pl.when(i == 0)
    def _warmup():
        for p in range(2 * P):
            load_dma(i, slot, p).start()

    @pl.when(i + 1 < total)
    def _prefetch():
        for p in range(2 * P):
            load_dma(i + 1, nslot, p).start()

    for p in range(2 * P):
        load_dma(i, slot, p).wait()

    zr, zi = _conv_math(n1, n2, P, xscr[slot], f1r, f1i, f2r, f2i, twr, twi,
                        hr, hi)

    # zscr[slot] was last written at step i-2; its stores must have drained.
    @pl.when(i >= 2)
    def _drain_prev():
        for p in range(2 * P):
            store_dma(i - 2, slot, p).wait()

    zscr[slot] = jnp.concatenate([zr, zi], axis=1)
    for p in range(2 * P):
        store_dma(i, slot, p).start()

    @pl.when((i + 1 == total) & (i >= 1))
    def _drain_last_prev():
        for p in range(2 * P):
            store_dma(i - 1, nslot, p).wait()

    @pl.when(i + 1 == total)
    def _drain_last():
        for p in range(2 * P):
            store_dma(i, slot, p).wait()


def use_fused_dma(n: int, block_size: int) -> bool:
    """Eligibility for the in-kernel-windowed path: MXU-worthy pow2 size and
    window geometry expressible as whole (.., n2) rows."""
    from .matmul_fft import use_mxu_fft

    if not use_mxu_fft(n):
        return False
    n2 = _plan(n)[1]
    return block_size % n2 == 0


def segmented_conv_fused(x: jnp.ndarray, packed_rfft: jnp.ndarray,
                         block_size: int, halo: int, seg: int, shift: int,
                         pairs_per_step: int = 4,
                         interpret: bool = False) -> jnp.ndarray:
    """Segmented overlap-save linear convolution with output delay, fully
    in-kernel: ``y[m] = conv(x, h)[m - shift]`` per channel.

    x: (C, T) float32; packed_rfft: (2, n//2+1) with n = (halo+seg)*B.
    Windows of n samples at stride seg*B (left halo covering the kernel) are
    gathered by DMA inside the kernel; only each window's wrap-free last
    seg*B samples are written back. Returns (C, T) float32.
    """
    B = block_size
    n = (halo + seg) * B
    n1, n2 = _plan(n)
    P = pairs_per_step
    C, T = x.shape
    seg_len = seg * B
    assert B % n2 == 0 and n1 * n2 == n

    n_seg = -(-T // seg_len)
    S = -(-n_seg // (2 * P)) * (2 * P)  # segments padded per channel
    # Padded signal: window s reads [s*seg_len, s*seg_len + n); data starts
    # at halo*B + shift (gathering each window `shift` early lands its
    # wrap-free region exactly on the delayed output, fft_filter.py docs).
    lead = halo * B + shift
    L = max((S - 1) * seg_len + n, lead + T)
    L = -(-L // n2) * n2
    xp = jnp.pad(x, ((0, 0), (lead, L - lead - T)))
    x3 = xp.reshape(C, L // n2, n2)

    (f1r, f1i), (f2r, f2i), (twr, twi) = _consts_np(n, P)

    # spectrum tiled per pair as rows (n1*P, n2) — same grid layout as v1
    hr_half, hi_half = packed_rfft[0], packed_rfft[1]
    hr_full = jnp.concatenate([hr_half, hr_half[1:-1][::-1]])
    hi_full = jnp.concatenate([hi_half, -hi_half[1:-1][::-1]])
    hg_r = hr_full.reshape(n2, n1).T
    hg_i = hi_full.reshape(n2, n1).T
    hrow_r = jnp.tile(hg_r[:, None, :], (1, P, 1)).reshape(n1 * P, n2)
    hrow_i = jnp.tile(hg_i[:, None, :], (1, P, 1)).reshape(n1 * P, n2)

    halo_rows = halo * B // n2
    win_rows = seg_len // n2
    grows = n1 - halo_rows  # wrap-free rows per window = seg_len // n2

    const2 = lambda shape: pl.BlockSpec(shape, lambda c, g: (0, 0),
                                        memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        partial(_kernel_dma, n1, n2, P, halo_rows, win_rows, grows),
        grid=(C, S // (2 * P)),
        in_specs=[
            const2((n1, n1)), const2((n1, n1)),
            const2((n2, n2)), const2((n2, n2)),
            const2((n1, P * n2)), const2((n1, P * n2)),
            const2((n1 * P, n2)), const2((n1 * P, n2)),
            any_spec,
        ],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((C, S, grows, n2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, n1, 2 * P * n2), jnp.float32),
            pltpu.VMEM((2, n1, 2 * P * n2), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2 * P)),
            pltpu.SemaphoreType.DMA((2, 2 * P)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(f2r), jnp.asarray(f2i),
      jnp.asarray(twr), jnp.asarray(twi), hrow_r, hrow_i, x3)

    return out.reshape(C, S * seg_len)[:, :T]
