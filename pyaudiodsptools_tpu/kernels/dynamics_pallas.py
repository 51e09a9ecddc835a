"""Pallas TPU kernel for the compressor/gate envelope automaton.

The faithful implementation (ops/dynamics.py) is a ``lax.scan`` whose
per-sample step costs a full loop iteration of XLA while-loop overhead. This
kernel runs the identical automaton as ONE fused on-chip loop: channels live
across VPU lanes, the carry (mode/x/y/skip) persists in VMEM scratch across a
time-tiled grid, and each sample is ~25 vector ops on a (1, C) row — no
per-step dispatch, no HBM round-trips for the carry.

Numerical note: the scan path gathers the exact float32 ``numpy.linspace``
ramp tables; this kernel computes ramp values arithmetically
(``start + i*step``), which differs by <= 2 ulp from the table — far inside
the 60 dB parity bound (verified vs the scan path in tests/test_kernels.py).

The automaton itself is derived in ops/dynamics.py's module docstring
(parity target /root/reference/pyAudioDspTools/EffectCompressor.py:68-124 and
EffectGate.py:69-126).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.base import Effect
from ..ops.dynamics import ATTACK, HOLD, RELEASE, REST, DynamicsParams, init_state

LANES = 128


def _automaton_rows(scalars, mode, x, y, skip, row):
    """One sample across all channel lanes; mirrors ops/dynamics.py
    _automaton_step with arithmetic ramp evaluation. ``scalars`` are traced
    jnp scalars (read from SMEM inside the kernel).

    ``ratio_gain`` (the scan's attack_env[x_max-1], used for HOLD and
    re-trigger) and ``rel0`` (release_env[0], the release ramp base) are
    DISTINCT scalars: they agree for x_max >= 2, but numpy.linspace(1.0, r,
    num=1) == [1.0], so at x_max == 1 the hold gain is 1.0 while the release
    ramp still starts at r — matching the scan (and the reference) exactly."""
    thr, pre_gain, ratio_gain, att_step, rel0, rel_step, x_max, y_max = scalars
    over = jnp.abs(row) > thr

    att_g = 1.0 + x.astype(jnp.float32) * att_step
    rel_g = rel0 + y.astype(jnp.float32) * rel_step

    is_rest = mode == REST
    is_att = mode == ATTACK
    is_hold = mode == HOLD
    is_rel = mode == RELEASE
    skip_b = skip != 0

    gain = jnp.where(
        is_att, att_g,
        jnp.where(is_hold | is_rel, jnp.where(over, ratio_gain, rel_g), 1.0),
    )
    gain = jnp.where(skip_b, 1.0, gain)

    live = jnp.logical_not(skip_b)
    trig = is_rest & over & live
    n_mode = jnp.where(trig, jnp.where(x_max == 1, HOLD, ATTACK), mode)
    n_x = jnp.where(trig, 1, x)

    adv = is_att & live
    n_x = jnp.where(adv, x + 1, n_x)
    n_mode = jnp.where(adv & (x + 1 >= x_max), HOLD, n_mode)

    to_rel = is_hold & ~over & live
    rel_adv = (is_rel & ~over & live) | to_rel
    n_y = jnp.where(rel_adv, y + 1, y)
    n_x = jnp.where(rel_adv, 0, n_x)
    n_mode = jnp.where(rel_adv, RELEASE, n_mode)

    done = rel_adv & (y + 1 >= y_max)
    n_mode = jnp.where(done, REST, n_mode)
    n_x = jnp.where(done, 0, n_x)
    n_y = jnp.where(done, 0, n_y)
    n_skip = done.astype(jnp.int32)

    re_trig = is_rel & over & live
    n_mode = jnp.where(re_trig, HOLD, n_mode)
    n_x = jnp.where(re_trig, x_max, n_x)
    n_y = jnp.where(re_trig, 0, n_y)

    n_skip = jnp.where(skip_b, 0, n_skip)
    out_row = row * pre_gain * gain
    return n_mode, n_x, n_y, n_skip, out_row


def _pack_fscal(params: DynamicsParams) -> jnp.ndarray:
    """Scalar operands (SMEM): params may be jit-traced, so scalars travel
    as data. ratio_gain (hold/re-trigger gain, attack_env[x_max-1]) and rel0
    (release_env[0]) differ when x_max == 1 — numpy.linspace(1.0, r, num=1)
    is [1.0] — so both are carried."""
    ratio_gain = params.attack_env[-1]
    rel0 = params.release_env[0]
    return jnp.stack([
        params.threshold.astype(jnp.float32),
        params.pre_gain.astype(jnp.float32),
        ratio_gain,
        (ratio_gain - 1.0) / max(params.x_max - 1, 1),
        rel0,
        (1.0 - rel0) / max(params.y_max - 1, 1),
    ]).reshape(1, 6)


def _kernel(t_tile, fscal_ref, iscal_ref, x_ref, m0, x0, y0, s0,
            out_ref, mf, xf, yf, sf, mode_s, xs_s, ys_s, skip_s):
    scalars = (
        fscal_ref[0, 0],  # threshold
        fscal_ref[0, 1],  # pre_gain
        fscal_ref[0, 2],  # ratio_gain (attack_env[x_max-1]: hold/re-trig)
        fscal_ref[0, 3],  # attack ramp step
        fscal_ref[0, 4],  # release ramp base (release_env[0])
        fscal_ref[0, 5],  # release ramp step
        iscal_ref[0, 0],  # x_max
        iscal_ref[0, 1],  # y_max
    )
    # Remaining VALID samples at this tile's start (padded tail samples must
    # not touch state). program_id is read at kernel top level — inside the
    # fori_loop body it cannot lower in interpret mode.
    tile_start = pl.program_id(0) * t_tile
    valid = iscal_ref[0, 2]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        mode_s[:] = m0[:]
        xs_s[:] = x0[:]
        ys_s[:] = y0[:]
        skip_s[:] = s0[:]

    def body(i, _):
        row = x_ref[pl.ds(i, 1), :]
        n_mode, n_x, n_y, n_skip, out_row = _automaton_rows(
            scalars, mode_s[:], xs_s[:], ys_s[:], skip_s[:], row)
        out_ref[pl.ds(i, 1), :] = out_row
        # Zero-padding to the tile size must not advance the automaton: the
        # returned state is the carry for the NEXT streaming block (zeros
        # would advance ATTACK unconditionally and walk HOLD toward REST).
        upd = tile_start + i < valid
        mode_s[:] = jnp.where(upd, n_mode, mode_s[:])
        xs_s[:] = jnp.where(upd, n_x, xs_s[:])
        ys_s[:] = jnp.where(upd, n_y, ys_s[:])
        skip_s[:] = jnp.where(upd, n_skip, skip_s[:])
        return 0

    jax.lax.fori_loop(0, t_tile, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        mf[:] = mode_s[:]
        xf[:] = xs_s[:]
        yf[:] = ys_s[:]
        sf[:] = skip_s[:]


def dynamics_pallas(params: DynamicsParams, state, x: jnp.ndarray,
                    t_tile: int = 1024, interpret: bool = False):
    """Run the automaton over ``x``: (C, T) -> (state, out).

    C is padded to a lane multiple; T to the tile size. State dict matches
    ops/dynamics.init_state with batch shape (C,).
    """
    C, T = x.shape
    c_pad = (-C) % LANES
    t_pad = (-T) % t_tile
    xt = jnp.pad(x, ((0, c_pad), (0, t_pad))).T  # (Tp, Cp) time-major
    Tp, Cp = xt.shape

    def prep(v):
        return jnp.pad(v.astype(jnp.int32), (0, c_pad)).reshape(1, Cp)

    m0 = prep(state["mode"])
    x0 = prep(state["x"])
    y0 = prep(state["y"])
    s0 = prep(state["skip"])

    # Scalar operands (SMEM): params may be jit-traced, so scalars travel as
    # data, not trace-time constants.
    fscal = _pack_fscal(params)
    iscal = jnp.array([[params.x_max, params.y_max, T]], dtype=jnp.int32)

    grid = (Tp // t_tile,)
    row_spec = pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out, mf, xf, yf, sf = pl.pallas_call(
        partial(_kernel, t_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t_tile, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[
            pl.BlockSpec((t_tile, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.int32),
            jax.ShapeDtypeStruct((1, Cp), jnp.int32),
            jax.ShapeDtypeStruct((1, Cp), jnp.int32),
            jax.ShapeDtypeStruct((1, Cp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, Cp), jnp.int32),
            pltpu.VMEM((1, Cp), jnp.int32),
            pltpu.VMEM((1, Cp), jnp.int32),
            pltpu.VMEM((1, Cp), jnp.int32),
        ],
        interpret=interpret,
    )(fscal, iscal, xt, m0, x0, y0, s0)

    out = out.T[:C, :T]
    new_state = {
        "mode": mf[0, :C],
        "x": xf[0, :C],
        "y": yf[0, :C],
        "skip": sf[0, :C] != 0,
    }
    return new_state, out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Speculative segment-parallel offline kernel
# ---------------------------------------------------------------------------
#
# The serial kernel above is latency-bound: one (1, C) row of ~25 dependent
# vector ops per sample, T samples long. But the over-threshold mask depends
# only on the INPUT (never on the automaton's own output), so the whole gain
# trajectory is a deterministic function of (entry state, mask sequence) —
# which makes speculative execution sound: split time into G segments, run
# every segment in parallel from a guessed entry state, then sweep exit ->
# next entry until fixpoint. The automaton *synchronizes*: any run of
# x_max+1 over-samples forces state HOLD and any run that completes a release
# forces REST, independent of the entry state — so on real audio nearly every
# segment's exit is already entry-independent and the loop converges in 2-3
# sweeps (elapsed ~= 3·T/G serial samples instead of T). Worst case (no sync
# windows anywhere) converges in G sweeps — the same total serial work as the
# plain kernel. The fixpoint reproduces the exact serial state trajectory, so
# outputs are bit-identical to the serial kernel.
#
# State is packed into ONE int per lane (shortening the per-sample dependent
# chain vs the 4-array carry above):
#   s = -1            skip (the reference's double counter increment)
#   s = 0             REST
#   s in [1, x_max)   ATTACK, x == s
#   s = x_max         HOLD
#   s = x_max + y     RELEASE, y in [1, y_max)
SUBLANES = 8


def encode_state(params: DynamicsParams, state) -> jnp.ndarray:
    """Pack the dict carry (ops/dynamics.init_state layout) into single ints."""
    mode, x, y = state["mode"], state["x"], state["y"]
    s = jnp.where(mode == ATTACK, x,
                  jnp.where(mode == HOLD, params.x_max,
                            jnp.where(mode == RELEASE, params.x_max + y, 0)))
    return jnp.where(state["skip"], -1, s).astype(jnp.int32)


def _int_automaton(scalars, s, row):
    """Single-int automaton, one sample: (state, input row) -> (output row,
    next state). Semantics identical to _automaton_rows (see the encoding
    comment above)."""
    thr, pre, ratio, att_step, rel0, rel_step, x_max, end = scalars
    x_max_f = x_max.astype(jnp.float32)
    s_f = s.astype(jnp.float32)
    over = jnp.abs(row) > thr
    pos = s > 0
    in_att = pos & (s < x_max)
    att_g = 1.0 + s_f * att_step
    rel_g = rel0 + (s_f - x_max_f) * rel_step
    hi_g = jnp.where(over, ratio, rel_g)
    gain = jnp.where(pos, jnp.where(in_att, att_g, hi_g), 1.0)

    sp1 = s + 1
    rel_next = jnp.where(sp1 == end, -1, sp1)   # release done -> skip
    hi_next = jnp.where(over, x_max, rel_next)  # hold stay / re-trigger
    n = jnp.where(in_att, sp1, hi_next)         # attack ignores the mask
    n = jnp.where(s == 0, over.astype(jnp.int32), n)  # REST trigger
    n = jnp.where(s < 0, 0, n)                  # skip consumes itself
    return row * pre * gain, n


def _int_automaton_state(scalars, s, row):
    """State transition only — the gain path (the automaton's output, which
    never feeds back into the state) is omitted. Used by the states-only
    fixpoint sweeps."""
    thr, pre, ratio, att_step, rel0, rel_step, x_max, end = scalars
    over = jnp.abs(row) > thr
    pos = s > 0
    in_att = pos & (s < x_max)
    sp1 = s + 1
    rel_next = jnp.where(sp1 == end, -1, sp1)
    hi_next = jnp.where(over, x_max, rel_next)
    n = jnp.where(in_att, sp1, hi_next)
    n = jnp.where(s == 0, over.astype(jnp.int32), n)
    return jnp.where(s < 0, 0, n)


def _read_scalars(n_ops, fscal_ref, iscal_ref):
    scalars = []
    for j in range(n_ops):  # static unroll
        scalars.append((
            fscal_ref[j, 0],  # threshold
            fscal_ref[j, 1],  # pre_gain
            fscal_ref[j, 2],  # hold/re-trigger gain (attack_env[x_max-1])
            fscal_ref[j, 3],  # attack ramp step
            fscal_ref[j, 4],  # release ramp base (release_env[0])
            fscal_ref[j, 5],  # release ramp step
            iscal_ref[j, 0],  # x_max
            iscal_ref[j, 1],  # x_max + y_max: release completion boundary
        ))
    return scalars


def _spec_kernel(t_tile, n_ops, unroll, fscal_ref, iscal_ref, x_ref,
                 e_ref, out_ref, z_ref, s_scr):
    """Speculative sweep over one time tile, running a CASCADE of n_ops
    automatons per sample (op j+1 consumes op j's output — a fused
    compressor->gate chain costs one HBM pass). State rows for op j live at
    sublane rows [j*8, j*8+8)."""
    scalars = _read_scalars(n_ops, fscal_ref, iscal_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_scr[:] = e_ref[:]

    # Manual unroll: Mosaic's fori_loop only lowers unroll=1 or full, so
    # the body processes `unroll` consecutive samples per iteration —
    # amortizing loop/slice-index overhead along the serial walk. The
    # factor is clamped host-side to divide t_tile. A/B'd on chip
    # (bench_dyn.py, PADT_DYN_UNROLL).
    def body(i, _):
        for k in range(unroll):  # static
            idx = i * unroll + k
            row = x_ref[pl.ds(idx * SUBLANES, SUBLANES), :]  # one sample
            for j in range(n_ops):
                s = s_scr[pl.ds(j * SUBLANES, SUBLANES), :]
                row, n = _int_automaton(scalars[j], s, row)
                s_scr[pl.ds(j * SUBLANES, SUBLANES), :] = n
            out_ref[pl.ds(idx * SUBLANES, SUBLANES), :] = row
        return 0

    jax.lax.fori_loop(0, t_tile // unroll, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        z_ref[:] = s_scr[:]


def _spec_state_kernel(t_tile, n_ops, unroll, fscal_ref, iscal_ref,
                       x_ref, e_ref, z_ref, s_scr):
    """States-only speculative sweep: identical automaton walk but the ONLY
    output is the exit-state tensor — no per-sample HBM writes, and the last
    cascade stage skips its (unused) gain application. The fixpoint loop
    runs this; one _spec_kernel pass then writes the audio (ROADMAP #2)."""
    scalars = _read_scalars(n_ops, fscal_ref, iscal_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_scr[:] = e_ref[:]

    def body(i, _):
        for k in range(unroll):  # static (see _spec_kernel's unroll note)
            idx = i * unroll + k
            row = x_ref[pl.ds(idx * SUBLANES, SUBLANES), :]
            for j in range(n_ops):
                s = s_scr[pl.ds(j * SUBLANES, SUBLANES), :]
                if j + 1 < n_ops:
                    row, n = _int_automaton(scalars[j], s, row)
                else:
                    n = _int_automaton_state(scalars[j], s, row)
                s_scr[pl.ds(j * SUBLANES, SUBLANES), :] = n
        return 0

    jax.lax.fori_loop(0, t_tile // unroll, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        z_ref[:] = s_scr[:]


def dynamics_pallas_offline(params, x: jnp.ndarray,
                            segments: int | None = None,
                            t_tile: int | None = None,
                            interpret: bool = False) -> jnp.ndarray:
    """Whole-signal automaton (or automaton CASCADE), segment-parallel:
    (C, T) -> (C, T). ``params`` is one DynamicsParams or a sequence of
    them; a sequence runs op j+1 on op j's per-sample output inside the
    same kernel (one HBM pass for the whole dynamics chain).

    Entry state is REST everywhere (matching ops/dynamics.offline). The
    speculative sweep loop runs until the segment entry states reach their
    fixpoint, so the result equals the serial simulation exactly.
    """
    params_list = (list(params) if isinstance(params, (list, tuple))
                   else [params])
    n_ops = len(params_list)
    C, T = x.shape
    if segments is None:
        # Fill ~8192 lanes of parallel work (measured optimum on v5e: the
        # per-sample dependent-latency component shrinks with more segments
        # until VMEM tiling and sweep-count effects win) but keep segments
        # long enough (>= ~2048 samples) that sync windows are likely.
        segments = max(1, min(8192 // max(C, 1), T // 2048))
    import os

    if t_tile is None:
        t_tile = int(os.environ.get("PADT_DYN_TTILE", "0"))
    if not t_tile:
        # In+out time tiles are double-buffered in VMEM; keep
        # 2 * 2 * (t_tile * 8 * K * 4B) within ~8 MB. Larger tiles were
        # A/B'd on chip and LOSE (BENCH_DYN_r05 t_tile sweep: 64 -> 11.7,
        # 128 -> 11.5, 256 -> 17.3 ms): the sweep is VPU-throughput-bound
        # (~50 element-ops x k sweeps over the whole signal), so tile size
        # only moves overheads, and 256 spills the pipelined live set.
        k_est = (-(-C * segments // (SUBLANES * LANES)) * LANES)
        t_tile = max(8, min(256, (2 * 1024 * 1024) // (SUBLANES * 4 * k_est)))
    # Segment length must be a t_tile multiple: time-padding is only legal at
    # the very end of the signal (zeros inside the timeline would corrupt the
    # state handoff between segments). When the channel count is eligible
    # for the single-pass relayout kernels, L is additionally rounded to a
    # 128-multiple (their DMA windows need 128-lane-aligned starts;
    # kernels/relayout.py) — a few extra padded samples per segment.
    import math

    unit = t_tile
    if C % SUBLANES == 0 and LANES % C == 0:
        unit = t_tile * LANES // math.gcd(t_tile, LANES)
    L = -(-max(unit, -(-T // segments)) // unit) * unit
    G = -(-T // L)
    Tp = G * L
    R = C * G
    Rp = -(-R // (SUBLANES * LANES)) * (SUBLANES * LANES)
    K = Rp // SUBLANES

    # (C, G, L) -> time-major (L, R), r = g*C + c (SEGMENT-major: segment
    # g's channels are CONTIGUOUS lanes, which makes each (segment, time
    # window) a contiguous DMA rectangle of the (L, 8, K) view — the
    # property the Pallas relayout kernels below need); each sample's Rp
    # lanes occupy 8 contiguous sublane rows of a (L*8, K) array.
    from .relayout import time_major_pack, time_major_unpack, use_relayout

    if use_relayout(C, T, G, L, K, R, Rp, interpret):
        # single-pass in-kernel relayout: 1 HBM read + 1 write + in-VMEM
        # transposes, vs ~3 XLA materializations (measured 4.9 ms vs the
        # kernel's ~2 ms at the flagship size — BENCH_DYN_r05 parts)
        xk = time_major_pack(x, G, L, K, interpret=interpret)
    else:
        xp = jnp.pad(x, ((0, 0), (0, Tp - T)))
        xk = jax.lax.reshape(xp.reshape(C, G, L), (L, R),
                             dimensions=(2, 1, 0))
        xk = jnp.pad(xk, ((0, 0), (0, Rp - R))).reshape(L * SUBLANES, K)

    fscal = jnp.concatenate([_pack_fscal(p) for p in params_list], axis=0)
    iscal = jnp.array([[p.x_max, p.x_max + p.y_max] for p in params_list],
                      dtype=jnp.int32)

    # Walk unroll factor (trace-time): amortizes fori_loop/slice-index
    # overhead along the serial sample walk. A/B'd on chip (bench_dyn.py).
    unroll = int(os.environ.get("PADT_DYN_UNROLL", "1"))
    while unroll > 1 and t_tile % unroll:
        unroll //= 2

    state_spec = pl.BlockSpec((n_ops * SUBLANES, K), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    smem_specs = [
        pl.BlockSpec((n_ops, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ops, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    x_spec = pl.BlockSpec((t_tile * SUBLANES, K), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    sweep_call = pl.pallas_call(
        partial(_spec_kernel, t_tile, n_ops, unroll),
        grid=(L // t_tile,),
        in_specs=smem_specs + [x_spec, state_spec],
        out_specs=[x_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((L * SUBLANES, K), jnp.float32),
            jax.ShapeDtypeStruct((n_ops * SUBLANES, K), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((n_ops * SUBLANES, K), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    # States-only sweep for the fixpoint loop: reads the signal, writes ONLY
    # the (n_ops*8, K) exit-state tensor — no audio writes until the final
    # output pass.
    state_call = pl.pallas_call(
        partial(_spec_state_kernel, t_tile, n_ops, unroll),
        grid=(L // t_tile,),
        in_specs=smem_specs + [x_spec, state_spec],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((n_ops * SUBLANES, K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_ops * SUBLANES, K), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def to_logical(e):
        # (n_ops*8, K) -> (n_ops, G, C)  [r = g*C + c, segment-major]
        return e.reshape(n_ops, Rp)[:, :R].reshape(n_ops, G, C)

    def from_logical(el):
        flat = el.reshape(n_ops, R)
        return jnp.pad(flat, ((0, 0), (0, Rp - R))).reshape(
            n_ops * SUBLANES, K)

    def next_entries(e, z):
        el, zl = to_logical(e), to_logical(z)
        # segment 0 keeps its true entry (REST); others take the previous
        # segment's exit. Fixpoint == the serial state trajectory.
        en = jnp.concatenate([el[:, :1, :], zl[:, :-1, :]], axis=1)
        return from_logical(en), jnp.all(en == el)

    e0 = jnp.zeros((n_ops * SUBLANES, K), jnp.int32)
    import os

    # Loop strategy (PADT_DYN_LOOP: hybrid | write | states; legacy
    # PADT_DYN_STATES_ONLY=1 selects 'states'). All three compute the same
    # entry-state fixpoint and render the audio from already-converged
    # entries, so their outputs are bit-identical (tests/test_fusion.py
    # asserts it in interpret mode); they differ only in walk/HBM cost:
    #   states: k state walks to fixpoint + 1 output walk  (k+1 walks,
    #           k+1 reads, 1 write)
    #   write:  k full walks, writing audio every sweep    (k walks,
    #           k reads, k writes)
    #   hybrid: 1 state walk (prepass, no audio write, last op's gain path
    #           skipped) + k-1 full walks                  (k walks,
    #           k reads, k-1 writes) — strictly <= 'write' cost; default.
    # All loops bound the sweep count at G+2. The bound is unreachable
    # margin, not a semantic cap: entries propagate at least one segment per
    # sweep (segment g's entry is exact once segments 0..g-1's exits are),
    # so the fixpoint lands in <= G sweeps and the `done` flag exits first.
    # It matters that it's unreachable: a cap-exit would return audio from
    # one-iteration-stale entries on the audio-writing paths but exact
    # audio on the states-only path (which runs a final output pass), and
    # the env-selected paths must stay bit-equal (ADVICE r4).
    loop = os.environ.get("PADT_DYN_LOOP", "hybrid").lower()
    if os.environ.get("PADT_DYN_STATES_ONLY", "0") == "1":
        loop = "states"
    # Debug-only sweep cap for bench_dyn --parts (caps the while_loop
    # iteration bound; output is WRONG when it truncates convergence —
    # never set in production).
    cap = int(os.environ.get("PADT_DYN_MAX_SWEEPS", "0")) or (G + 2)

    def wcond(carry):
        _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(done), it < cap)

    def wbody(carry):
        e, _, _, it = carry
        out, z = sweep_call(fscal, iscal, xk, e)
        en, done = next_entries(e, z)
        return en, out, done, it + 1

    if loop == "states":
        # States-only loop + separate output pass: k+1 full automaton walks
        # for k sweeps. Kept for A/B (BENCH_DYN_r04).
        def cond(carry):
            _, done, it = carry
            return jnp.logical_and(jnp.logical_not(done), it < cap)

        def body(carry):
            e, _, it = carry
            z = state_call(fscal, iscal, xk, e)
            en, done = next_entries(e, z)
            return en, done, it + 1

        e_fix, _, _ = jax.lax.while_loop(
            cond, body, (e0, jnp.bool_(False), jnp.int32(0)))
        out, _ = sweep_call(fscal, iscal, xk, e_fix)
    elif loop == "write":
        # Write-every-sweep loop (round-4 default, kept for A/B): first
        # iteration peeled so the loop carry starts from a real output
        # buffer instead of a full-signal zeros fill.
        out1, z1 = sweep_call(fscal, iscal, xk, e0)
        e1, done1 = next_entries(e0, z1)
        _, out, _, _ = jax.lax.while_loop(
            wcond, wbody, (e1, out1, done1, jnp.int32(1)))
    else:
        # Hybrid (default, round 5): the FIRST sweep always runs from
        # guessed entries whose audio is discarded unless it already
        # confirms the fixpoint — so run it as the cheaper states-only
        # prepass (no audio write, no last-op gain path), then render with
        # write-every-sweep audio sweeps from the advanced entries. At the
        # typical k=2 on real audio this is 1 cheap + 1 full walk and
        # 2 reads + 1 write, vs 'write''s 2 full walks and 2 reads +
        # 2 writes. The peeled audio sweep below runs even when the
        # prepass already converged (audio must be rendered regardless),
        # making the rare k=1 case cost the same 2 walks as 'write'.
        z1 = state_call(fscal, iscal, xk, e0)
        e1, _ = next_entries(e0, z1)
        out2, z2 = sweep_call(fscal, iscal, xk, e1)
        e2, done2 = next_entries(e1, z2)
        _, out, _, _ = jax.lax.while_loop(
            wcond, wbody, (e2, out2, done2, jnp.int32(2)))

    if use_relayout(C, T, G, L, K, R, Rp, interpret):
        return time_major_unpack(out, C, T, G, L, interpret=interpret)
    out = out.reshape(L, Rp)[:, :R].reshape(L, G, C)
    return jax.lax.reshape(out, (C, Tp), dimensions=(2, 1, 0))[:, :T]


def fast_effect(base: Effect, interpret: bool = False) -> Effect:
    """Wrap a faithful dynamics Effect with kernel-backed offline/step paths.

    Works on (C, T)-shaped batches (1-D channel axis) and plain (T,) mono.
    """
    params = base.params

    def offline(params: DynamicsParams, blocks: jnp.ndarray) -> jnp.ndarray:
        shape = blocks.shape
        if blocks.ndim == 2:  # (nb, B) mono
            x = blocks.reshape(1, -1)
        elif blocks.ndim == 3:  # (C, nb, B)
            x = blocks.reshape(shape[0], -1)
        else:
            raise ValueError("fast dynamics supports (nb,B) or (C,nb,B) blocks")
        out = dynamics_pallas_offline(params, x, interpret=interpret)
        return out.reshape(shape)

    def step(params: DynamicsParams, state, block: jnp.ndarray):
        if block.ndim == 1:
            st = {k: v.reshape(1) for k, v in state.items()}
            st, out = dynamics_pallas(params, st, block.reshape(1, -1),
                                      t_tile=min(1024, block.shape[-1]),
                                      interpret=interpret)
            return {k: v.reshape(()) for k, v in st.items()}, out.reshape(-1)
        st, out = dynamics_pallas(params, state, block,
                                  t_tile=min(1024, block.shape[-1]),
                                  interpret=interpret)
        return st, out

    return Effect(name=f"{base.name}_pallas", params=params,
                  init_state=base.init_state, step=step, offline=offline,
                  time_parallel=False)


def fast_compressor(cfg, *args, interpret: bool = False, **kwargs) -> Effect:
    from ..ops.dynamics import compressor

    return fast_effect(compressor(cfg, *args, **kwargs), interpret=interpret)


def fast_gate(cfg, *args, interpret: bool = False, **kwargs) -> Effect:
    from ..ops.dynamics import gate

    return fast_effect(gate(cfg, *args, **kwargs), interpret=interpret)


def fused_dynamics(effects, interpret: bool = False) -> Effect:
    """ONE Effect running a cascade of dynamics automatons (compressor/gate
    in any order/number) in a single kernel pass: op j+1 consumes op j's
    per-sample output inside the loop, so an adjacent compressor->gate pair
    costs one HBM round-trip instead of two. Streaming runs the serial
    Pallas kernel per op (state = tuple of per-op dicts); with
    ``interpret=True`` (CPU tests) streaming folds the faithful scans, which
    is exactly equal."""
    from ..ops import dynamics as dyn

    params = tuple(e.params for e in effects)

    def offline(params, blocks: jnp.ndarray) -> jnp.ndarray:
        shape = blocks.shape
        if blocks.ndim == 2:  # (nb, B) mono
            x = blocks.reshape(1, -1)
        elif blocks.ndim == 3:  # (C, nb, B)
            x = blocks.reshape(shape[0], -1)
        else:
            raise ValueError("fused dynamics supports (nb,B) or (C,nb,B)")
        out = dynamics_pallas_offline(list(params), x, interpret=interpret)
        return out.reshape(shape)

    def step(params, state, block: jnp.ndarray):
        new_states = []
        for p, st in zip(params, state):
            if interpret:
                st, block = dyn.step(p, st, block)
            elif block.ndim == 1:
                st1 = {k: v.reshape(1) for k, v in st.items()}
                st1, out = dynamics_pallas(p, st1, block.reshape(1, -1),
                                           t_tile=min(1024, block.shape[-1]))
                st = {k: v.reshape(()) for k, v in st1.items()}
                block = out.reshape(-1)
            else:
                st, block = dynamics_pallas(p, st, block,
                                            t_tile=min(1024, block.shape[-1]))
            new_states.append(st)
        return tuple(new_states), block

    def init_state(params, batch_shape: tuple[int, ...] = ()):
        return tuple(dyn.init_state(p, batch_shape) for p in params)

    name = "dynamics_cascade:" + "+".join(e.name for e in effects)
    return Effect(name=name, params=params, init_state=init_state, step=step,
                  offline=offline, time_parallel=False)
