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
# Tiers: "highest" = f32 HIGHEST dots (~132 dB, slowest); "high" (default) =
# direct bf16x3 (~102 dB); "fast" = Karatsuba complex bf16x3 — 9 MXU passes
# per complex matmul instead of 12, but the 3-mult Gauss trick's cancellation
# costs ~3 dB (~99 dB measured vs the FFT oracle).
# Chain A/B on chip (BENCH_AB_r04.json, radix-2 on): fast 2.878 vs high
# 2.869 Gsamples/s — 0.3%, within run noise — so "high" keeps the default
# and its extra 3 dB; "fast" stays one env var away for bandwidth-starved
# deployments.
_TIER = _os.environ.get("PADT_FFT_PRECISION", "high").lower()
_USE_B3 = _TIER != "highest"
_USE_KARA = _TIER == "fast"


def set_precision_tier(tier: str) -> None:
    """Switch the conv precision tier at runtime ('highest'/'high'/'fast').

    The tier is read at TRACE time: callers must rebuild any Chain / jitted
    function after switching (fresh Chains create fresh jit caches), and the
    host-side constant cache is cleared here. Intended for benchmarking both
    tiers in one process; production selects via PADT_FFT_PRECISION."""
    global _TIER, _USE_B3, _USE_KARA
    _TIER = tier.lower()
    _USE_B3 = _TIER != "highest"
    _USE_KARA = _TIER == "fast"
    _consts_np.cache_clear()


@lru_cache(maxsize=None)
def _consts_np(n: int, pairs: int):
    """Numpy constants for size n with P pairs per step.

    The bf16x3 tier ships every DFT matrix PRE-SPLIT into hi/lo bfloat16
    halves — plus the Karatsuba combinations sum = re+im and dif = re-im —
    so the kernel never spends VPU passes splitting constants (f32 matrices
    are kept for the HIGHEST tier). Twiddles stay f32 (elementwise only).
    """
    n1, n2 = _plan(n)
    k1, k2 = np.arange(n1), np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)
    twr = np.tile(tw.real.astype(np.float32), (1, pairs))   # (n1, P*n2)
    twi = np.tile(tw.imag.astype(np.float32), (1, pairs))
    c = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    if not _USE_B3:
        return (c(f1), c(f2)), (twr, twi)

    def split(a):
        a = a.astype(np.float32)
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return np.asarray(hi), np.asarray(lo)

    def parts(f):
        re, im = f.real, f.imag
        ms = (re, im, re + im, re - im) if _USE_KARA else (re, im)
        return tuple(split(m) for m in ms)

    return (parts(f1), parts(f2)), (twr, twi)


def _split_b16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm3(c, dh, dl):
    """bf16x3 product of a pre-split constant pair ``c = (ch_ref, cl_ref)``
    and pre-split data (dh, dl): ch@dh + ch@dl + cl@dh (XLA's HIGH scheme)."""
    ch, cl = c[0][:], c[1][:]
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(ch, dh) + d(ch, dl) + d(cl, dh)


def _mm3r(dh, dl, c):
    """Right-hand form: data @ constant."""
    ch, cl = c[0][:], c[1][:]
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(dh, ch) + d(dh, cl) + d(dl, ch)


def _cmul_left_kara(F, ar, ai, conj: bool):
    """Karatsuba complex matmul (F or conj(F)) @ (ar + i ai) with F's four
    pre-split parts (re, im, re+im, re-im): 3 bf16x3 products instead of 4.
    Data is split ONCE per operand here (the only per-step splits)."""
    Fr, Fi, Fs, Fd = F
    sh, sl = _split_b16(ar + ai)
    ah, al = _split_b16(ar)
    bh, bl = _split_b16(ai)
    t1 = _mm3(Fr, ah, al)
    t2 = _mm3(Fi, bh, bl)
    if conj:       # yr = Fr@ar + Fi@ai ; yi = Fr@ai - Fi@ar
        t3 = _mm3(Fd, sh, sl)
        return t1 + t2, t3 - t1 + t2
    else:          # yr = Fr@ar - Fi@ai ; yi = Fr@ai + Fi@ar
        t3 = _mm3(Fs, sh, sl)
        return t1 - t2, t3 - t1 - t2


def _cmul_right_kara(ar, ai, F, conj: bool):
    """Karatsuba (ar + i ai) @ (F or conj(F)), right-hand form."""
    Fr, Fi, Fs, Fd = F
    sh, sl = _split_b16(ar + ai)
    ah, al = _split_b16(ar)
    bh, bl = _split_b16(ai)
    t1 = _mm3r(ah, al, Fr)
    t2 = _mm3r(bh, bl, Fi)
    if conj:       # yr = ar@Fr + ai@Fi ; yi = ai@Fr - ar@Fi
        t3 = _mm3r(sh, sl, Fd)
        return t1 + t2, t3 - t1 + t2
    else:
        t3 = _mm3r(sh, sl, Fs)
        return t1 - t2, t3 - t1 - t2


def _cmul_left_b3(F, ar, ai, conj: bool):
    """Direct complex matmul with pre-split constants, bf16x3 products
    (4 products / 12 MXU passes — no Gauss-trick cancellation)."""
    Fr, Fi = F[0], F[1]
    ah, al = _split_b16(ar)
    bh, bl = _split_b16(ai)
    Ar, Ai = _mm3(Fr, ah, al), _mm3(Fr, bh, bl)
    Br, Bi = _mm3(Fi, ah, al), _mm3(Fi, bh, bl)
    if conj:   # yr = Fr@ar + Fi@ai ; yi = Fr@ai - Fi@ar
        return Ar + Bi, Ai - Br
    return Ar - Bi, Ai + Br


def _cmul_right_b3(ar, ai, F, conj: bool):
    Fr, Fi = F[0], F[1]
    ah, al = _split_b16(ar)
    bh, bl = _split_b16(ai)
    Ar, Ai = _mm3r(ah, al, Fr), _mm3r(bh, bl, Fr)
    Br, Bi = _mm3r(ah, al, Fi), _mm3r(bh, bl, Fi)
    if conj:   # yr = ar@Fr + ai@Fi ; yi = ai@Fr - ar@Fi
        return Ar + Bi, Ai - Br
    return Ar - Bi, Ai + Br


def _mm_hi(a, b):
    return jnp.dot(a, b, precision=_HI, preferred_element_type=jnp.float32)


def _cmul_left_hi(F, ar, ai, conj: bool):
    f1r, f1i = F
    s = -1.0 if conj else 1.0
    return (_mm_hi(f1r[:], ar) - s * _mm_hi(f1i[:], ai),
            _mm_hi(f1r[:], ai) + s * _mm_hi(f1i[:], ar))


def _cmul_right_hi(ar, ai, F, conj: bool):
    f2r, f2i = F
    if conj:   # (ar + i ai) @ conj(F)
        return (_mm_hi(ar, f2r[:]) + _mm_hi(ai, f2i[:]),
                _mm_hi(ai, f2r[:]) - _mm_hi(ar, f2i[:]))
    return (_mm_hi(ar, f2r[:]) - _mm_hi(ai, f2i[:]),
            _mm_hi(ar, f2i[:]) + _mm_hi(ai, f2r[:]))


def _conv_math(n1, n2, P, X, F1, F2, twr, twi, hr, hi,
               stage_ref=None):
    """All DFT stages on a VMEM-resident block X (n1, 2*P*n2) whose column
    halves are [real | imag] parts, pairs minor. ``F1``/``F2`` are the
    stage DFT matrices: pre-split bf16 part tuples on the bf16x3 tier, f32
    (re, im) refs on the HIGHEST tier. Returns (zr, zi), each (n1, P*n2):
    the time-domain circular convolutions in natural row-major sample order
    per pair column slab."""
    h = P * n2  # column half: [0:h) = real parts, [h:2h) = imag parts
    if _USE_KARA:
        cmul_l, cmul_r = _cmul_left_kara, _cmul_right_kara
    elif _USE_B3:
        cmul_l, cmul_r = _cmul_left_b3, _cmul_right_b3
    else:
        cmul_l, cmul_r = _cmul_left_hi, _cmul_right_hi

    def stage(r, i_):
        # Optional VMEM round-trip between pipeline stages: materializing
        # the intermediates in scratch shrinks the math's register live
        # set so Mosaic can overlap the window DMA with the matmul stages
        # (PADT_CONV_STAGE_SCRATCH A/B; see BENCH_CONV_r05.json).
        if stage_ref is None:
            return r, i_
        rows = r.shape[0]
        stage_ref[pl.ds(0, rows), pl.ds(0, h)] = r
        stage_ref[pl.ds(0, rows), pl.ds(h, h)] = i_
        return (stage_ref[pl.ds(0, rows), pl.ds(0, h)],
                stage_ref[pl.ds(0, rows), pl.ds(h, h)])

    # stage 1: contract n1
    yr, yi = cmul_l(F1, X[:, :h], X[:, h:], conj=False)

    # twiddle (pair-tiled (n1, h))
    cr = yr * twr[:] - yi * twi[:]
    ci = yr * twi[:] + yi * twr[:]
    cr, ci = stage(cr, ci)

    # stage 2: contract n2 (rows (n1*P, n2))
    xr, xi = cmul_r(cr.reshape(n1 * P, n2), ci.reshape(n1 * P, n2), F2,
                    conj=False)

    # spectrum multiply (h tiled to rows (n1*P, n2))
    ur = xr * hr[:] - xi * hi[:]
    ui = xr * hi[:] + xi * hr[:]
    ur, ui = stage(ur.reshape(n1, h), ui.reshape(n1, h))
    ur, ui = ur.reshape(n1 * P, n2), ui.reshape(n1 * P, n2)

    # inverse stage 2: multiply by conj(F2)
    vr, vi = cmul_r(ur, ui, F2, conj=True)

    # inverse twiddle (conjugate)
    vr = vr.reshape(n1, h)
    vi = vi.reshape(n1, h)
    wr = vr * twr[:] + vi * twi[:]
    wi = vi * twr[:] - vr * twi[:]

    # inverse stage 1: conj(F1) @ W, scaled by 1/n
    zr, zi = cmul_l(F1, wr, wi, conj=True)
    s = 1.0 / (n1 * n2)
    return zr * s, zi * s


# ---------------------------------------------------------------------------
# Radix-2 (DIF) outer split: for n with _plan(n)[0] >= 256 the 4-step's
# per-sample cost 2*(n1+n2) is dominated by the sqrt-growth of n1. One
# decimation-in-frequency level runs TWO size-n/2 pipelines whose plan is
# square (e.g. n=32768: (256,128) -> 2x(128,128)), cutting MXU MACs by ~1/3
# at the cost of two exact VPU butterflies and one twiddle — no extra
# precision loss. The halves are contiguous ROW ranges of the (n1, n2)
# window layout (sample s = r*n2 + c), so no in-kernel relayout is needed:
#   a = x0 + x1;  b = (x0 - x1) * W_n^t          (forward DIF)
#   out[t] = (e[t] + conj(W_n^t) o[t]) / 2;  out[t+m] = (e[t] - ...) / 2
# where e/o are the size-m convolution pipelines against the even/odd bins
# of the spectrum.
# ---------------------------------------------------------------------------


def use_radix2(n: int) -> bool:
    # Default ON: validated on chip at the production geometry
    # (tests/test_tpu_lane.py::test_segmented_conv_radix2_on_chip, n=32768,
    # >95 dB) and A/B'd on the full chain — radix-2 wins 2.87 vs 2.75
    # Gsamples/s at the bf16x3 tier (BENCH_AB_r04.json, 64ch x 30s).
    # PADT_CONV_RADIX2=0 restores the flat 4-step.
    if _os.environ.get("PADT_CONV_RADIX2", "1") == "0":
        return False
    n1, n2 = _plan(n)
    if n1 < 2 * n2 or n1 < 256:
        return False
    m1, m2 = _plan(n // 2)
    return min(m1, m2) >= 128  # halves must keep full MXU-width contractions


@lru_cache(maxsize=None)
def _dif_np(n: int, pairs: int):
    """DIF twiddle W_n^t over the first-half grid (n1/2, n2), pair-tiled."""
    n1, n2 = _plan(n)
    h1 = n1 // 2
    t = (np.arange(h1)[:, None] * n2 + np.arange(n2)[None, :]).astype(
        np.float64)
    w = np.exp(-2j * np.pi * t / n)
    return (np.tile(w.real.astype(np.float32), (1, pairs)),
            np.tile(w.imag.astype(np.float32), (1, pairs)))


def _conv_math_r2(n1, n2, m1, m2, P, X, F1, F2, twm_r, twm_i, dif_r, dif_i,
                  hrE, hiE, hrO, hiO, stage_ref=None):
    """Radix-2 wrapper around two size-m _conv_math cores (m = n/2).

    X: (n1, 2*P*n2) with [real | imag] column halves. The size-m cores see
    (n1/2, 2*P*n2) blocks in exactly the same layout because the m-plan's
    minor factor equals n2 (asserted host-side). ``hrE/hiE`` carry the even
    spectrum bins in m-grid layout; ``hrO/hiO`` the odd bins."""
    h = P * n2
    h1 = n1 // 2
    x0r, x0i = X[:h1, :h], X[:h1, h:]
    x1r, x1i = X[h1:, :h], X[h1:, h:]
    ar, ai = x0r + x1r, x0i + x1i
    dr, di = x0r - x1r, x0i - x1i
    br = dr * dif_r[:] - di * dif_i[:]
    bi = dr * dif_i[:] + di * dif_r[:]
    A = jnp.concatenate([ar, ai], axis=1)
    B = jnp.concatenate([br, bi], axis=1)
    er, ei = _conv_math(m1, m2, P, A, F1, F2, twm_r, twm_i, hrE, hiE,
                        stage_ref=stage_ref)
    orr, oi = _conv_math(m1, m2, P, B, F1, F2, twm_r, twm_i, hrO, hiO,
                         stage_ref=stage_ref)
    # recombine with conj(W): Re(w' o) = or*wr + oi*wi; Im = oi*wr - or*wi
    wor = orr * dif_r[:] + oi * dif_i[:]
    woi = oi * dif_r[:] - orr * dif_i[:]
    zr = jnp.concatenate([(er + wor), (er - wor)], axis=0) * 0.5
    zi = jnp.concatenate([(ei + woi), (ei - woi)], axis=0) * 0.5
    return zr, zi


def _const_inputs_flat(n: int, P: int, grid_ndim: int):
    """Kernel-input form of the DFT constants for the active precision tier.

    Returns (arrays, specs, pack): flat input arrays + their BlockSpecs, and
    ``pack(refs) -> (F1, F2, twr_ref, twi_ref)`` regrouping the kernel's refs
    into what _conv_math expects."""
    (c1, c2), (twr, twi) = _consts_np(n, P)
    n1, n2 = _plan(n)
    idx = (lambda i: (0, 0)) if grid_ndim == 1 else (lambda c, g: (0, 0))
    spec = lambda shape: pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)
    if _USE_B3:
        np1 = len(c1)  # pre-split part pairs per DFT matrix (2 or 4)
        arrays = ([jnp.asarray(m) for pair in c1 for m in pair]
                  + [jnp.asarray(m) for pair in c2 for m in pair]
                  + [jnp.asarray(twr), jnp.asarray(twi)])
        specs = ([spec((n1, n1))] * (2 * np1) + [spec((n2, n2))] * (2 * np1)
                 + [spec((n1, P * n2))] * 2)

        def pack(refs):
            F1 = tuple((refs[2 * i], refs[2 * i + 1]) for i in range(np1))
            F2 = tuple((refs[2 * np1 + 2 * i], refs[2 * np1 + 2 * i + 1])
                       for i in range(np1))
            return F1, F2, refs[4 * np1], refs[4 * np1 + 1]
    else:
        arrays = [jnp.asarray(m) for m in (c1[0], c1[1], c2[0], c2[1],
                                           twr, twi)]
        specs = ([spec((n1, n1))] * 2 + [spec((n2, n2))] * 2
                 + [spec((n1, P * n2))] * 2)

        def pack(refs):
            return (refs[0], refs[1]), (refs[2], refs[3]), refs[4], refs[5]
    return arrays, specs, pack


def _const_inputs(n: int, P: int, grid_ndim: int):
    """Constants + math dispatcher for size n, radix-2-aware.

    Returns (arrays, specs, math, n_spec):
      * arrays/specs — the constant kernel inputs and their BlockSpecs;
      * math(X, const_refs, spec_refs) -> (zr, zi) — the whole conv math on
        a VMEM-resident block;
      * n_spec — how many spectrum-row inputs the kernel takes (2 flat /
        4 radix-2; built per call by _spectrum_rows).
    """
    n1, n2 = _plan(n)
    if not use_radix2(n):
        arrays, specs, pack = _const_inputs_flat(n, P, grid_ndim)

        def math(X, consts, spec_refs, stage_ref=None):
            F1, F2, twr, twi = pack(consts)
            return _conv_math(n1, n2, P, X, F1, F2, twr[:], twi[:],
                              spec_refs[0], spec_refs[1],
                              stage_ref=stage_ref)

        return arrays, specs, math, 2

    m = n // 2
    m1, m2 = _plan(m)
    assert m1 == n1 // 2 and m2 == n2, (n, (n1, n2), (m1, m2))
    arrays, specs, pack = _const_inputs_flat(m, P, grid_ndim)
    dif_r, dif_i = _dif_np(n, P)
    idx = (lambda i: (0, 0)) if grid_ndim == 1 else (lambda c, g: (0, 0))
    dspec = pl.BlockSpec((n1 // 2, P * n2), idx, memory_space=pltpu.VMEM)
    n_core = len(arrays)
    arrays = arrays + [jnp.asarray(dif_r), jnp.asarray(dif_i)]
    specs = specs + [dspec, dspec]

    def math(X, consts, spec_refs, stage_ref=None):
        F1, F2, twr, twi = pack(consts[:n_core])
        dr, di = consts[n_core], consts[n_core + 1]
        return _conv_math_r2(n1, n2, m1, m2, P, X, F1, F2, twr[:], twi[:],
                             dr, di, spec_refs[0], spec_refs[1],
                             spec_refs[2], spec_refs[3],
                             stage_ref=stage_ref)

    return arrays, specs, math, 4


def _spectrum_rows(packed_rfft, n: int, P: int):
    """Per-call spectrum kernel inputs: row-tiled grids matching the math
    dispatcher's layout. Returns (arrays, shapes)."""
    n1, n2 = _plan(n)
    hr_half, hi_half = packed_rfft[0], packed_rfft[1]
    hr_full = jnp.concatenate([hr_half, hr_half[1:-1][::-1]])
    hi_full = jnp.concatenate([hi_half, -hi_half[1:-1][::-1]])

    def rows(hr, hi, g1, g2):
        out = []
        for hh in (hr, hi):
            hg = hh.reshape(g2, g1).T
            out.append(jnp.tile(hg[:, None, :], (1, P, 1)).reshape(g1 * P,
                                                                   g2))
        return out

    if not use_radix2(n):
        return rows(hr_full, hi_full, n1, n2), (n1 * P, n2)
    m1, m2 = _plan(n // 2)
    even = rows(hr_full[0::2], hi_full[0::2], m1, m2)
    odd = rows(hr_full[1::2], hi_full[1::2], m1, m2)
    return even + odd, (m1 * P, m2)


def _kernel(math, n_consts, n_spec, x_ref, *rest):
    consts = rest[:n_consts]
    spec_refs = rest[n_consts:n_consts + n_spec]
    out_ref = rest[n_consts + n_spec]
    zr, zi = math(x_ref[:], consts, spec_refs)
    out_ref[:] = jnp.concatenate([zr, zi], axis=1)


def conv_pairs_fused(flat: jnp.ndarray, packed_rfft: jnp.ndarray, n: int,
                     pairs_per_step: int = 4,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in for matmul_fft.conv_pairs: circular convolution of real rows
    (B, n) with a real kernel's packed rfft, one fused kernel pass."""
    n1, n2 = _plan(n)
    P = auto_pairs(n, pairs_per_step)
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

    carrays, cspecs, math, n_spec = _const_inputs(n, P, grid_ndim=1)
    spec_arrays, spec_shape = _spectrum_rows(packed_rfft, n, P)

    blk = 2 * P * n2
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, math, len(carrays), n_spec),
        grid=(ng,),
        in_specs=([pl.BlockSpec((n1, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)]
                  + cspecs + [const2(spec_shape)] * n_spec),
        out_specs=pl.BlockSpec((n1, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1, ng * blk), jnp.float32),
        # the stage intermediates' peak live set exceeds the default 16 MB
        # scoped budget; v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xk, *carrays, *spec_arrays)

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


def _kernel_dma(n1, n2, P, halo_rows, win_rows, grows, rho, tail0, math,
                n_consts, n_spec, *refs):
    """``rho``/``tail0`` drive the no-pad gather (segmented_conv_fused):
    rho > 0 or tail0 >= 0 means x_hbm is the UNPADDED signal viewed as
    (C, T//n2, n2): window rows are offset by -rho, the first window's
    missing head is rolled+zeroed in VMEM, and windows past ``tail0`` load
    from the small zero-extended tail buffer instead. tail0 < 0 disables
    the tail redirect (padded path)."""
    consts = refs[:n_consts]
    spec_refs = refs[n_consts:n_consts + n_spec]
    x_hbm = refs[n_consts + n_spec]
    t_hbm = refs[n_consts + n_spec + 1]
    out_hbm, xscr, zscr, lsem, ssem = refs[n_consts + n_spec + 2:]
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

    NOPAD = tail0 >= 0

    def _row0(j, p):
        base = jax.lax.rem(j, ng) * 2 * P
        return (base + p) * win_rows - rho

    def _main_desc(j, s, p):
        c = jax.lax.div(j, ng)
        row0 = _row0(j, p)
        start = jnp.maximum(row0, 0) if NOPAD else row0
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(start, n1), :],
            xscr.at[s, :, pl.ds(col(p), n2)],
            lsem.at[s, p])

    def _tail_desc(j, s, p):
        # windows past the signal end read the small zero-extended tail
        # buffer; same shape and semaphore, so the wait below matches either
        c = jax.lax.div(j, ng)
        tstart = jnp.clip(_row0(j, p) - tail0, 0, n1)
        return pltpu.make_async_copy(
            t_hbm.at[c, pl.ds(tstart, n1), :],
            xscr.at[s, :, pl.ds(col(p), n2)],
            lsem.at[s, p])

    def start_load(j, s, p):
        if not NOPAD:
            _main_desc(j, s, p).start()
            return
        use_tail = _row0(j, p) > tail0
        pl.when(jnp.logical_not(use_tail))(
            lambda: _main_desc(j, s, p).start())
        pl.when(use_tail)(lambda: _tail_desc(j, s, p).start())

    def wait_load(j, s, p):
        # Both descriptors copy an identical (n1, n2) f32 block on
        # lsem[s, p], so one wait serves whichever start_load issued — but
        # the waited descriptor's source view must still be constructible:
        # for past-the-end windows the main descriptor's pl.ds(start, n1)
        # would dangle past x_hbm, so the wait view clamps its start into
        # range (the wait only consumes the semaphore + byte count; the
        # clamped view is never dereferenced). ADVICE r4: this removes the
        # dependence on Pallas tolerating unrealized OOB slice views.
        if not NOPAD:
            _main_desc(j, s, p).wait()
            return
        c = jax.lax.div(j, ng)
        start = jnp.clip(_row0(j, p), 0, x_hbm.shape[1] - n1)
        pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(start, n1), :],
            xscr.at[s, :, pl.ds(col(p), n2)],
            lsem.at[s, p]).wait()

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
            start_load(i, slot, p)

    @pl.when(i + 1 < total)
    def _prefetch():
        for p in range(2 * P):
            start_load(i + 1, nslot, p)

    for p in range(2 * P):
        wait_load(i, slot, p)

    if NOPAD and rho:
        # window 0 (this channel's first grid step, slab p=0 at columns
        # [0, n2)) was loaded from row 0 instead of row -rho: shift its rows
        # down by the static rho and zero the before-start head.
        @pl.when(pl.program_id(1) == 0)
        def _head_fix():
            blk = xscr[slot, :, 0:n2]
            rolled = pltpu.roll(blk, shift=rho, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
            xscr[slot, :, 0:n2] = jnp.where(rows < rho, 0.0, rolled)

    zr, zi = math(xscr[slot], consts, spec_refs)

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


VMEM_LIMIT = 100 * 1024 * 1024   # vmem_limit_bytes passed to the kernels
VMEM_BUDGET = 80 * 1024 * 1024   # planning budget (headroom for allocator)


def _const_bytes(n: int, P: int) -> int:
    """Exact bytes of the kernel-resident constant set — DFT matrices,
    twiddles, DIF twiddles, spectrum rows — for the ACTIVE precision tier
    and radix flags. Mirrors the shapes _const_inputs_flat/_const_inputs/
    _spectrum_rows build (pinned to their real nbytes by
    tests/test_conv_vmem.py, so the two cannot drift apart silently)."""
    def flat(nn):
        n1, n2 = _plan(nn)
        if _USE_B3:
            np1 = 4 if _USE_KARA else 2  # (re, im[, re+im, re-im]) parts
            f = 2 * np1 * (n1 * n1 + n2 * n2) * 2  # hi/lo bf16 halves
        else:
            f = 2 * (n1 * n1 + n2 * n2) * 4        # f32 re/im
        return f + 2 * n1 * P * n2 * 4             # twiddles, pair-tiled
    if use_radix2(n):
        n1, n2 = _plan(n)
        b = flat(n // 2) + 2 * (n1 // 2) * P * n2 * 4  # + DIF twiddles
    else:
        b = flat(n)
    return b + 8 * P * n  # spectrum rows: 2x(n1*P, n2) / 4x(m1*P, m2) f32


def vmem_estimate_bytes(n: int, P: int) -> int:
    """Static live-set estimate for the fused conv kernels at (n, P):

    * window + result scratch, double-buffered: exactly 4 data blocks
      (a block is the (n1, 2*P*n2) f32 compute layout, 8*P*n bytes);
    * the constant set: exact, tier/radix-aware (_const_bytes);
    * 2 blocks of margin for the _conv_math stage intermediates — the
      observed n=524288/P=4 Mosaic stack (115.9 MB) calibrates the true
      peak to ~1 live block beyond scratch+constants; 2 covers allocator
      slack and tier changes.

    Replaces the round-4 one-point '55 bytes per P*n slot' fit (ADVICE r4 /
    VERDICT r4 #8) with terms that track tier/radix/shape changes."""
    block = 8 * P * n
    return 4 * block + _const_bytes(n, P) + 2 * block




def _kernel_dma_union(n1, n2, P, halo_rows, win_rows, grows, rho, tail0u,
                      U, math, n_consts, n_spec, use_stage, *refs):
    """Union-DMA variant of _kernel_dma (the default no-pad path): one grid
    step's 2P overlapping windows are CONSECUTIVE segments, so their union
    is one contiguous (U, n2) row range — loaded with ONE descriptor
    instead of 2P, and the 2P wrap-free results store as ONE contiguous
    (2P, grows, n2) block. Measured motivation (round 5, BENCH_CONV_r05):
    at the flagship geometry a window transfer is ~128 KB = ~0.3 us at
    copy bandwidth, the same order as a descriptor's issue cost, so the
    per-window kernel spent ~4 ms of its 9.8 ms wall on DMA issue
    (DMA-only variant: 6.0 ms vs ~1.7 ms of pure data). The union cuts
    descriptors 4x per direction and reads ~20% fewer bytes (shared
    halos). Window p's operand is the union rows [p*win_rows, +n1), and
    the whole union head-rolls by rho at the channel's first step, which
    reconstructs the virtual pre-signal zeros for EVERY window at once.
    Windows past the signal end load the union from the zero-extended
    tail buffer (tail0u = signal_rows - U; unions never straddle it)."""
    consts = refs[:n_consts]
    spec_refs = refs[n_consts:n_consts + n_spec]
    x_hbm = refs[n_consts + n_spec]
    t_hbm = refs[n_consts + n_spec + 1]
    if use_stage:
        (out_hbm, xu, zu, lsem, ssem,
         stage_ref) = refs[n_consts + n_spec + 2:]
    else:
        out_hbm, xu, zu, lsem, ssem = refs[n_consts + n_spec + 2:]
        stage_ref = None
    ng = pl.num_programs(1)
    total = pl.num_programs(0) * ng
    i = pl.program_id(0) * ng + pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def _s_u(j):
        return jax.lax.rem(j, ng) * (2 * P * win_rows) - rho

    def start_load(j, s):
        c = jax.lax.div(j, ng)
        s_u = _s_u(j)
        use_tail = s_u > tail0u

        # all starts are provably sublane-aligned (win_rows, rho, U and
        # the signal's row count are 8-multiples - enforced by the union
        # eligibility conditions); the explicit hints are required at
        # n2 > 128 where Mosaic's affine prover gives up (reverb, r5)
        def from_main():
            pltpu.make_async_copy(
                x_hbm.at[c, pl.ds(pl.multiple_of(jnp.maximum(s_u, 0), 8),
                                  U), :],
                xu.at[s], lsem.at[s]).start()

        def from_tail():
            pltpu.make_async_copy(
                t_hbm.at[c, pl.ds(pl.multiple_of(s_u - tail0u, 8), U), :],
                xu.at[s], lsem.at[s]).start()

        pl.when(jnp.logical_not(use_tail))(from_main)
        pl.when(use_tail)(from_tail)

    def wait_load(j, s):
        # equal byte counts either way; wait via the always-in-bounds tail
        # view (clip keeps the unused view constructible)
        c = jax.lax.div(j, ng)
        ts = pl.multiple_of(jnp.clip(_s_u(j) - tail0u, 0, U), 8)
        pltpu.make_async_copy(
            t_hbm.at[c, pl.ds(ts, U), :], xu.at[s], lsem.at[s]).wait()

    def store_dma(j, s):
        c = jax.lax.div(j, ng)
        base = jax.lax.rem(j, ng) * 2 * P
        return pltpu.make_async_copy(
            zu.at[s], out_hbm.at[c, pl.ds(base, 2 * P)], ssem.at[s])

    @pl.when(i == 0)
    def _warmup():
        start_load(i, slot)

    @pl.when(i + 1 < total)
    def _prefetch():
        start_load(i + 1, nslot)

    wait_load(i, slot)

    if rho:
        # channel's first union started at row 0 instead of -rho: rolling
        # down by the static rho and zeroing the head reconstructs
        # x[s_u + r] (zeros before the signal) for the WHOLE union
        @pl.when(pl.program_id(1) == 0)
        def _head_fix():
            blk = xu[slot]
            rolled = pltpu.roll(blk, shift=rho, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (U, n2), 0)
            xu[slot] = jnp.where(rows < rho, 0.0, rolled)

    # window p = union rows [p*win_rows, +n1); column slabs are
    # [P real | P imag], pairs minor: slab order 0,2,..,1,3,..
    xv = xu[slot]
    order = [2 * q for q in range(P)] + [2 * q + 1 for q in range(P)]
    X = jnp.concatenate(
        [xv[p * win_rows:p * win_rows + n1, :] for p in order], axis=1)
    zr, zi = math(X, consts, spec_refs, stage_ref=stage_ref)

    # zu[slot] was last written at step i-2; its store must have drained
    @pl.when(i >= 2)
    def _drain_prev():
        store_dma(i - 2, slot).wait()

    for p in range(2 * P):
        src = zr if p % 2 == 0 else zi
        q = p // 2
        zu[slot, p] = src[halo_rows:, q * n2:(q + 1) * n2]

    store_dma(i, slot).start()

    @pl.when((i + 1 == total) & (i >= 1))
    def _drain_last_prev():
        store_dma(i - 1, nslot).wait()

    @pl.when(i + 1 == total)
    def _drain_last():
        store_dma(i, slot).wait()




def _kernel_dma_union_autoout(n1, n2, P, halo_rows, win_rows, grows, rho,
                              tail0u, U, math, n_consts, n_spec, *refs):
    """Union kernel with the STORE side on Pallas's automatic output
    pipeline (BlockSpec per (c, g) block) instead of manual DMA — A/B
    experiment for the manual-DMA bandwidth floor (see _kernel_dma_union's
    docstring; selected by PADT_CONV_AUTOOUT=1)."""
    consts = refs[:n_consts]
    spec_refs = refs[n_consts:n_consts + n_spec]
    x_hbm = refs[n_consts + n_spec]
    t_hbm = refs[n_consts + n_spec + 1]
    o_ref, xu, lsem = refs[n_consts + n_spec + 2:]
    ng = pl.num_programs(1)
    total = pl.num_programs(0) * ng
    i = pl.program_id(0) * ng + pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def _s_u(j):
        return jax.lax.rem(j, ng) * (2 * P * win_rows) - rho

    def start_load(j, s):
        c = jax.lax.div(j, ng)
        s_u = _s_u(j)
        use_tail = s_u > tail0u

        # all starts are provably sublane-aligned (win_rows, rho, U and
        # the signal's row count are 8-multiples - enforced by the union
        # eligibility conditions); the explicit hints are required at
        # n2 > 128 where Mosaic's affine prover gives up (reverb, r5)
        def from_main():
            pltpu.make_async_copy(
                x_hbm.at[c, pl.ds(pl.multiple_of(jnp.maximum(s_u, 0), 8),
                                  U), :],
                xu.at[s], lsem.at[s]).start()

        def from_tail():
            pltpu.make_async_copy(
                t_hbm.at[c, pl.ds(pl.multiple_of(s_u - tail0u, 8), U), :],
                xu.at[s], lsem.at[s]).start()

        pl.when(jnp.logical_not(use_tail))(from_main)
        pl.when(use_tail)(from_tail)

    def wait_load(j, s):
        c = jax.lax.div(j, ng)
        ts = jnp.clip(_s_u(j) - tail0u, 0, U)
        pltpu.make_async_copy(
            t_hbm.at[c, pl.ds(ts, U), :], xu.at[s], lsem.at[s]).wait()

    @pl.when(i == 0)
    def _warmup():
        start_load(i, slot)

    @pl.when(i + 1 < total)
    def _prefetch():
        start_load(i + 1, nslot)

    wait_load(i, slot)

    if rho:
        @pl.when(pl.program_id(1) == 0)
        def _head_fix():
            blk = xu[slot]
            rolled = pltpu.roll(blk, shift=rho, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (U, n2), 0)
            xu[slot] = jnp.where(rows < rho, 0.0, rolled)

    xv = xu[slot]
    order = [2 * q for q in range(P)] + [2 * q + 1 for q in range(P)]
    X = jnp.concatenate(
        [xv[p * win_rows:p * win_rows + n1, :] for p in order], axis=1)
    zr, zi = math(X, consts, spec_refs)

    for p in range(2 * P):
        src = zr if p % 2 == 0 else zi
        q = p // 2
        o_ref[0, p] = src[halo_rows:, q * n2:(q + 1) * n2]


def auto_pairs(n: int, requested: int = 4) -> int:
    """Largest pairs-per-step whose estimated peak live set fits
    VMEM_BUDGET (headroom under the kernels' VMEM_LIMIT)."""
    p = requested
    while p > 1 and vmem_estimate_bytes(n, p) > VMEM_BUDGET:
        p //= 2
    return p


def use_fused_dma(n: int, block_size: int, halo: int | None = None,
                  seg: int | None = None) -> bool:
    """Eligibility for the in-kernel-windowed path: MXU-worthy pow2 size,
    window geometry expressible as whole (.., n2) rows, and (when halo/seg
    are given) an 8-sublane-aligned wrap-free store slice — Mosaic rejects
    sub-tile row slices (plan_segments aligns its own geometry; this guard
    keeps direct callers with odd geometries on the XLA path instead of
    failing to compile)."""
    from .matmul_fft import use_mxu_fft

    if not use_mxu_fft(n):
        return False
    n2 = _plan(n)[1]
    if block_size % n2:
        return False
    if halo is not None and seg is not None:
        q = block_size // n2
        if (halo * q) % 8 or (seg * q) % 8:
            return False
    return True


def segmented_conv_fused(x: jnp.ndarray, packed_rfft: jnp.ndarray,
                         block_size: int, halo: int, seg: int, shift: int,
                         pairs_per_step: int = 2, slack: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Segmented overlap-save linear convolution with output delay, fully
    in-kernel: ``y[m] = conv(x, h)[m - shift]`` per channel.

    x: (C, T) float32; packed_rfft: (2, n//2+1) with n = (halo+seg)*B.
    Windows of n samples at stride seg*B (left halo covering the kernel) are
    gathered by DMA inside the kernel; only each window's wrap-free last
    seg*B samples are written back. Returns (C, T) float32.

    No-pad gather: the old path materialized a full left-shifted copy of
    the signal (``jnp.pad`` by halo*B + shift) just to make every window's
    rows line up — two full HBM passes of pure data movement (~1.5 ms at
    the flagship geometry, measured in BENCH_OPS.json). Instead the kernel
    now gathers straight from the unpadded signal: the row-aligned part of
    the offset moves into the DMA index (rho rows), the sub-row remainder
    delta moves into the spectrum as an exact unit-phasor delay
    (h'[k] = h[k-delta], phases built in float64 at trace time), window 0's
    missing head rows are rolled+zeroed in VMEM (static shift), and the few
    windows past the signal end read a small zero-extended tail buffer.
    Requires halo*B >= kernel_len - 1 + delta: ``slack`` is the caller's
    halo*B - (kernel_len - 1); when delta > 0 and slack is unknown or too
    small, the padded path is kept (delta == 0 — every shift-free caller —
    needs no slack).
    """
    B = block_size
    n = (halo + seg) * B
    n1, n2 = _plan(n)
    C, T = x.shape
    seg_len = seg * B
    assert B % n2 == 0 and n1 * n2 == n
    win_rows_pre = seg_len // n2
    # Pairs-per-step: on the union-DMA path SMALLER steps win (P=1: 8.65 ms
    # vs P=2: 9.76 at the flagship cascade — BENCH_CONV_r05 P sweep; the
    # per-step math's register pressure is what blocks DMA/compute
    # overlap), so union-eligible geometries default to P=1; the
    # per-window path keeps the r4-swept default. PADT_CONV_PAIRS
    # overrides for A/Bs.
    p_env = int(_os.environ.get("PADT_CONV_PAIRS", "0"))
    _delta = shift % n2
    _rho = (halo * B + shift - _delta) // n2
    _nopad_pre = (T % n2 == 0 and T // n2 >= n1
                  and 0 <= _rho <= min(win_rows_pre, n1 - 1)
                  and (_delta == 0
                       or (slack is not None and _delta <= slack)))
    # union alignment: every union row start is g*(2P*win_rows) - rho, so
    # rho must be sublane-aligned (Mosaic proves divisibility by 8 for
    # dim-1 DMA starts; reverb's lead produced an unaligned rho - caught
    # on chip in r5)
    union_possible = (_nopad_pre and T // n2 >= win_rows_pre + n1
                      and _rho % 8 == 0 and (T // n2) % 8 == 0)
    if p_env:
        P = auto_pairs(n, p_env)
    elif union_possible:
        P = 1
    else:
        P = auto_pairs(n, pairs_per_step)

    n_seg = -(-T // seg_len)
    S = -(-n_seg // (2 * P)) * (2 * P)  # segments padded per channel
    # Window s reads samples [s*seg_len - halo*B - shift, ... + n): the
    # halo covers the kernel and gathering `shift` early lands the
    # wrap-free region exactly on the delayed output (fft_filter.py docs).
    lead = halo * B + shift
    win_rows = seg_len // n2
    halo_rows = halo * B // n2
    grows = n1 - halo_rows  # wrap-free rows per window = seg_len // n2

    delta = shift % n2
    rho = (lead - delta) // n2
    nopad = (T % n2 == 0 and T // n2 >= n1 and 0 <= rho <= min(win_rows, n1 - 1)
             and (delta == 0 or (slack is not None and delta <= slack)))
    U = (2 * P - 1) * win_rows + n1  # union rows per grid step
    # one-descriptor union loads/stores (alignment: see union_possible)
    union = (nopad and T // n2 >= U and rho % 8 == 0
             and (T // n2) % 8 == 0)
    if nopad:
        if delta:
            k = np.arange(n // 2 + 1)
            ph = np.exp(-2j * np.pi * delta / n * k)  # float64 phases
            cr = jnp.asarray(ph.real.astype(np.float32))
            si = jnp.asarray(ph.imag.astype(np.float32))
            hr, hi = packed_rfft[0], packed_rfft[1]
            packed_rfft = jnp.stack([hr * cr - hi * si, hi * cr + hr * si])
        x3 = x.reshape(C, T // n2, n2)
        if union:
            tail0 = T // n2 - U
            tbuf = jnp.concatenate(
                [x3[:, tail0:, :], jnp.zeros((C, U, n2), x.dtype)], axis=1)
        else:
            tail0 = T // n2 - n1
            tbuf = jnp.concatenate(
                [x3[:, tail0:, :], jnp.zeros((C, n1, n2), x.dtype)], axis=1)
    else:
        L = max((S - 1) * seg_len + n, lead + T)
        L = -(-L // n2) * n2
        xp = jnp.pad(x, ((0, 0), (lead, L - lead - T)))
        x3 = xp.reshape(C, L // n2, n2)
        tbuf = jnp.zeros((C, 1, n2), x.dtype)
        rho, tail0 = 0, -1

    carrays, cspecs, math, n_spec = _const_inputs(n, P, grid_ndim=2)
    spec_arrays, spec_shape = _spectrum_rows(packed_rfft, n, P)

    const2 = lambda shape: pl.BlockSpec(shape, lambda c, g: (0, 0),
                                        memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    autoout = _os.environ.get("PADT_CONV_AUTOOUT", "0") == "1"
    if union and autoout:
        out = pl.pallas_call(
            partial(_kernel_dma_union_autoout, n1, n2, P, halo_rows,
                    win_rows, grows, rho, tail0, U, math, len(carrays),
                    n_spec),
            grid=(C, S // (2 * P)),
            in_specs=(cspecs + [const2(spec_shape)] * n_spec
                      + [any_spec, any_spec]),
            out_specs=pl.BlockSpec((1, 2 * P, grows, n2),
                                   lambda c, g: (c, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, S, grows, n2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, U, n2), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(*carrays, *spec_arrays, x3, tbuf)
        return out.reshape(C, S * seg_len)[:, :T]
    if union:
        use_stage = _os.environ.get("PADT_CONV_STAGE_SCRATCH", "0") == "1"
        kern = partial(_kernel_dma_union, n1, n2, P, halo_rows, win_rows,
                       grows, rho, tail0, U, math, len(carrays), n_spec,
                       use_stage)
        scratch = [
            pltpu.VMEM((2, U, n2), jnp.float32),
            pltpu.VMEM((2, 2 * P, grows, n2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if use_stage:
            scratch.append(pltpu.VMEM((n1, 2 * P * n2), jnp.float32))
    else:
        kern = partial(_kernel_dma, n1, n2, P, halo_rows, win_rows, grows,
                       rho, tail0, math, len(carrays), n_spec)
        scratch = [
            pltpu.VMEM((2, n1, 2 * P * n2), jnp.float32),
            pltpu.VMEM((2, n1, 2 * P * n2), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2 * P)),
            pltpu.SemaphoreType.DMA((2, 2 * P)),
        ]
    out = pl.pallas_call(
        kern,
        grid=(C, S // (2 * P)),
        in_specs=(cspecs + [const2(spec_shape)] * n_spec
                  + [any_spec, any_spec]),
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((C, S, grows, n2), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*carrays, *spec_arrays, x3, tbuf)

    return out.reshape(C, S * seg_len)[:, :T]
