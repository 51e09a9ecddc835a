"""Fused Pallas TPU kernel for post-chain elementwise/tap tails.

A chain tail like ``delay -> tremolo -> softclipper`` (the reference's
Example-style chains end in exactly such runs: EffectDelay.py:60-69 shifted
adds, EffectTremolo.py:42-46 LFO gain, EffectSoftClipper.py:37-44 waveshape)
is pure data movement for XLA: each op is a trivial map, but the pads and
broadcasts materialize intermediates, so the tail costs several full-signal
HBM round trips. This kernel runs the WHOLE run in one pass: each grid step
DMAs a time tile (plus a left halo covering all delay taps) into VMEM,
applies every stage in order on the resident window, and writes the finished
tile — HBM sees ~(S+D)/S reads and exactly one write of the signal.

Stage kinds (built from the member Effects by :func:`fused_tail`):

* ``taps`` — a Delay without pre-filters: ``y = dry + sum_k w_k * x[t-d_k]``
  (offsets static, weights as runtime scalars in SMEM). Reads the halo.
* ``gain`` — a Tremolo: multiply by a per-sample gain row, precomputed on the
  XLA side by the same phase-schedule math as ops/tremolo.offline (freeze
  quirk included, ops/tremolo.gain_row) and DMA'd alongside the signal tile.
* ``map``  — a stateless waveshaper (saturator/softclipper/harddistortion/
  bitcrusher): the op's own pure function applied to the resident window,
  its scalar params reconstructed from SMEM (bit-identical formulas).

Halo semantics: positions before the signal start are SILENCE after every
stage (a delay's history buffer starts at zeros, EffectDelay.py:33) — so the
kernel re-zeroes the before-start region after any stage that precedes a
``taps`` stage (waveshapers may map 0 to non-zero: the reference's
HardDistortion maps 0 -> ~0.95, EffectHardDistortion.py:38-40).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.base import Effect
from ..ops.delay import DelayParams
from ..ops.tremolo import TremoloParams, gain_row
from ..ops import waveshapers as ws

ROWS = 8          # channel rows per grid step (f32 sublane count)
LANE = 128

# params-type -> pure elementwise fn for "map" stages
_MAP_FNS = {
    ws.SaturatorParams: ws._saturate,
    ws.SoftClipperParams: ws._softclip,
    ws.HardDistortionParams: ws._harddist,
    ws.BitCrusherParams: ws._bitcrush,
}


def tail_fusable(effect: Effect) -> bool:
    """Can this effect join a fused tail run?"""
    p = effect.params
    if isinstance(p, DelayParams):
        return not (p.use_lowcut or p.use_highcut)
    if isinstance(p, TremoloParams):
        return True
    return type(p) in _MAP_FNS


def _plan_stages(effects):
    """Static stage plan + scalar/gain slot assignment.

    Returns (stages, n_scalars, n_gain_rows, D_total) where each stage is
      ("taps", offsets: tuple[int], wet: bool, scal_base: int)
      ("gain", row: int)
      ("map", fn, treedef, scal_base: int, n_leaves: int)
    and D_total is the halo: the sum of stage max offsets.
    """
    stages = []
    n_scal = 0
    n_gain = 0
    D = 0
    for e in effects:
        p = e.params
        if isinstance(p, DelayParams):
            offsets = tuple(p.time_in_samples * (k + 1)
                            for k in range(p.feedback_loops))
            stages.append(("taps", offsets, p.wet, n_scal))
            n_scal += len(offsets)
            if offsets:
                D += max(offsets)
        elif isinstance(p, TremoloParams):
            stages.append(("gain", n_gain))
            n_gain += 1
        else:
            fn = _MAP_FNS[type(p)]
            if (isinstance(p, ws.SoftClipperParams)
                    and os.environ.get("PADT_TAIL_FAST_POW", "0") == "1"):
                # Opt-in: an explicit bounded-domain exp2/log2 pow
                # (ws._pow01_fast) was A/B'd on chip and LOST to Mosaic's
                # builtin pow lowering (tail standalone 5.37 vs 4.99 ms,
                # BENCH_AB_r05 tail section) — the VPU's native
                # transcendental path is already cheaper than a ~35-op
                # polynomial. Kept selectable for future hardware.
                fn = ws._softclip_fast
            leaves, treedef = jax.tree.flatten(p)
            stages.append(("map", fn, treedef, n_scal, len(leaves)))
            n_scal += len(leaves)
    return stages, n_scal, n_gain, D


def _pack_scalars(members, params) -> jnp.ndarray:
    """(1, n) f32 vector of all runtime stage scalars, in plan order."""
    vals = []
    for e, p in zip(members, params):
        if isinstance(p, DelayParams):
            vals.extend(p.ramp[k] for k in range(p.feedback_loops))
        elif isinstance(p, TremoloParams):
            pass
        else:
            vals.extend(jax.tree.leaves(p))
    if not vals:
        return jnp.zeros((1, 1), jnp.float32)
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]).reshape(1, -1)


def _apply_stages(stages, scal, w, gains, before_start):
    """Run the stage list on a resident window value ``w`` (ROWS, W)."""
    taps_after = [any(s[0] == "taps" for s in stages[k + 1:])
                  for k in range(len(stages))]
    for k, stage in enumerate(stages):
        kind = stage[0]
        if kind == "taps":
            _, offsets, wet, base = stage
            acc = jnp.zeros_like(w) if wet else w
            for i, d in enumerate(offsets):
                acc = acc + scal[0, base + i] * pltpu.roll(w, shift=d, axis=1)
            w = acc
            # wrapped garbage lands in [0, applied-offset sum): never read by
            # later taps (their reads stay right of it) nor the output slice.
        elif kind == "gain":
            w = w * gains[stage[1]:stage[1] + 1, :]
        else:
            _, fn, treedef, base, n = stage
            p = jax.tree.unflatten(
                treedef, [scal[0, base + i] for i in range(n)])
            w = fn(p, w).astype(jnp.float32)
        if taps_after[k]:
            # before-start positions are silence for the next delay's reads
            w = jnp.where(before_start, 0.0, w)
    return w


def _kernel(stages, NT, S, D, REM, NG, scal_ref, x_hbm, g_hbm, out_hbm,
            win, gsc, osc, lsem, ssem):
    W = D + S
    total = pl.num_programs(0) * NT
    i = pl.program_id(0) * NT + pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    # --- DMA descriptor builders (same args for start and wait) -----------
    # pl.multiple_of: S and D are 128-multiples but Mosaic cannot prove it
    # for products/sums with the traced tile index.
    def _al(v):
        return pl.multiple_of(v, LANE)

    def d_main(j, s, width):
        c = jax.lax.div(j, NT)
        t = jax.lax.rem(j, NT)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * ROWS, ROWS), pl.ds(_al(t * S), width)],
            win.at[s, :, pl.ds(D, width)], lsem.at[s, 0])

    def d_gmain(j, s, width):
        t = jax.lax.rem(j, NT)
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(_al(t * S), width)],
            gsc.at[s, :, pl.ds(D, width)], lsem.at[s, 2])

    def d_halo(j, s):
        c = jax.lax.div(j, NT)
        t = jax.lax.rem(j, NT)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * ROWS, ROWS), pl.ds(_al(t * S - D), D)],
            win.at[s, :, pl.ds(0, D)], lsem.at[s, 1])

    def d_ghalo(j, s):
        t = jax.lax.rem(j, NT)
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(_al(t * S - D), D)],
            gsc.at[s, :, pl.ds(0, D)], lsem.at[s, 3])

    def d_store(j, s, width):
        c = jax.lax.div(j, NT)
        t = jax.lax.rem(j, NT)
        return pltpu.make_async_copy(
            osc.at[s, :, pl.ds(0, width)],
            out_hbm.at[pl.ds(c * ROWS, ROWS), pl.ds(_al(t * S), width)],
            ssem.at[s])

    def for_widths(t, fn):
        """Run fn(width) under the static/dynamic remainder branch."""
        if REM:
            pl.when(t < NT - 1)(lambda: fn(S))
            pl.when(t == NT - 1)(lambda: fn(REM))
        else:
            fn(S)

    def start_loads(j, s):
        t = jax.lax.rem(j, NT)
        for_widths(t, lambda width: d_main(j, s, width).start())
        if NG:
            for_widths(t, lambda width: d_gmain(j, s, width).start())
        if D:
            pl.when(t > 0)(lambda: d_halo(j, s).start())
            if NG:
                pl.when(t > 0)(lambda: d_ghalo(j, s).start())

    def wait_loads(j, s):
        t = jax.lax.rem(j, NT)
        for_widths(t, lambda width: d_main(j, s, width).wait())
        if NG:
            for_widths(t, lambda width: d_gmain(j, s, width).wait())
        if D:
            pl.when(t > 0)(lambda: d_halo(j, s).wait())
            if NG:
                pl.when(t > 0)(lambda: d_ghalo(j, s).wait())

    # --- pipeline ----------------------------------------------------------
    pl.when(i == 0)(lambda: start_loads(i, slot))
    pl.when(i + 1 < total)(lambda: start_loads(i + 1, nslot))
    wait_loads(i, slot)

    t = jax.lax.rem(i, NT)
    t0 = t * S
    w = win[slot]
    gains = gsc[slot] if NG else None
    if D:
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
        # (t0 + j < D) marks before-start positions; it also zeroes the
        # never-loaded halo at t == 0 (S >= D, so the mask is empty at t > 0)
        before_start = (t0 + cols) < D
        w = jnp.where(before_start, 0.0, w)
    else:
        before_start = None
    w = _apply_stages(stages, scal_ref, w, gains, before_start)

    # osc[slot] was last stored at step i-2: drain before overwriting
    pl.when(i >= 2)(lambda: for_widths(jax.lax.rem(i - 2, NT),
                                       lambda wd: d_store(i - 2, slot, wd).wait()))
    osc[slot] = w[:, D:D + S]
    for_widths(t, lambda width: d_store(i, slot, width).start())

    pl.when((i + 1 == total) & (i >= 1))(
        lambda: for_widths(jax.lax.rem(i - 1, NT),
                           lambda wd: d_store(i - 1, nslot, wd).wait()))
    pl.when(i + 1 == total)(
        lambda: for_widths(t, lambda width: d_store(i, slot, width).wait()))


def _geometry(T: int, D_total: int, tile: int):
    D = -(-D_total // LANE) * LANE if D_total else 0
    S = max(min(tile, -(-T // LANE) * LANE), D, LANE)
    NT = max(1, -(-T // S))
    REM = T - (NT - 1) * S
    if REM == S:
        REM = 0
    return D, S, NT, REM


def tail_kernel_supported(C: int, T: int, D_total: int,
                          tile: int = 32768) -> bool:
    """Geometry guard: VMEM within budget (any C — rows are padded to the
    8-row f32 sublane multiple inside :func:`tail_kernel`)."""
    del C  # padded internally; per-step VMEM is independent of channel count
    D, S, _, _ = _geometry(T, D_total, tile)
    W = D + S
    vmem = 2 * ROWS * W * 4 + 2 * ROWS * S * 4 + 2 * W * 4
    return vmem <= 80 * 1024 * 1024


def tail_kernel(stages, n_scal: int, n_gain: int, D_total: int,
                scal: jnp.ndarray, x: jnp.ndarray,
                gains: jnp.ndarray | None,
                tile: int = 32768, interpret: bool = False) -> jnp.ndarray:
    """Run a fused tail over ``x``: (C, T) -> (C, T), any C.

    Channel rows are zero-padded up to the 8-row f32 sublane multiple: every
    stage acts per-row (taps/gain along time, maps elementwise), so the pad
    rows never influence the kept rows and are sliced off after the call —
    this keeps mono (the reference's primary shape, Example1.py) on the fused
    one-HBM-pass path instead of the sequential member fallback."""
    C, T = x.shape
    pad_c = -C % ROWS
    if pad_c:
        x = jnp.pad(x, ((0, pad_c), (0, 0)))
        C += pad_c
    D, S, NT, REM = _geometry(T, D_total, tile)
    NG = n_gain
    W = D + S

    if gains is None:
        gains = jnp.zeros((1, LANE), jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, stages, NT, S, D, REM, NG),
        grid=(C // ROWS, NT),
        in_specs=[
            pl.BlockSpec((1, scal.shape[1]), lambda c, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((C, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, W), jnp.float32),
            pltpu.VMEM((2, max(NG, 1), W), jnp.float32),
            pltpu.VMEM((2, ROWS, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, x, gains)
    return out[:C - pad_c] if pad_c else out


def fused_tail(effects, interpret: bool = False) -> Effect:
    """ONE Effect for a tail run (delay / tremolo / waveshapers, in order):
    offline runs the fused Pallas kernel (one HBM pass); streaming falls back
    to the members' own faithful steps with a tuple state.

    ``time_parallel`` is False: the Pallas offline path has no GSPMD
    partitioning rule, so sharded renders route it through the per-device
    shard_map lane (parallel/sharding._gathered_apply)."""
    members = tuple(effects)
    stages, n_scal, n_gain, D_total = _plan_stages(members)

    def _sequential(params, blocks):
        for e, p in zip(members, params):
            blocks = e.offline(p, blocks)
        return blocks

    def offline(params, blocks: jnp.ndarray) -> jnp.ndarray:
        shape = blocks.shape
        if blocks.ndim == 2:
            x = blocks.reshape(1, -1)
        elif blocks.ndim == 3:
            x = blocks.reshape(shape[0], -1)
        else:
            return _sequential(params, blocks)
        C, T = x.shape
        if not tail_kernel_supported(C, T, D_total):
            return _sequential(params, blocks)
        nb, B = shape[-2], shape[-1]
        rows = [gain_row(p, nb, B) for p in params
                if isinstance(p, TremoloParams)]
        gains = jnp.stack(rows) if rows else None
        scal = _pack_scalars(members, params)
        out = tail_kernel(stages, n_scal, n_gain, D_total, scal, x, gains,
                          interpret=interpret)
        return out.reshape(shape)

    def step(params, state, block: jnp.ndarray):
        new_states = []
        for e, p, st in zip(members, params, state):
            st, block = e.step(p, st, block)
            new_states.append(st)
        return tuple(new_states), block

    def init_state(params, batch_shape: tuple[int, ...] = ()):
        return tuple(e.init_state(p, batch_shape)
                     for e, p in zip(members, params))

    name = "tail:" + "+".join(e.name for e in members)
    return Effect(name=name, params=tuple(e.params for e in members),
                  init_state=init_state, step=step, offline=offline,
                  time_parallel=False)
