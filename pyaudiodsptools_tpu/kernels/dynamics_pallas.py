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
    jnp scalars (read from SMEM inside the kernel)."""
    thr, pre_gain, ratio_gain, att_step, rel_step, x_max, y_max = scalars
    over = jnp.abs(row) > thr

    att_g = 1.0 + x.astype(jnp.float32) * att_step
    rel_g = ratio_gain + y.astype(jnp.float32) * rel_step

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


def _kernel(t_tile, fscal_ref, iscal_ref, x_ref, m0, x0, y0, s0,
            out_ref, mf, xf, yf, sf, mode_s, xs_s, ys_s, skip_s):
    scalars = (
        fscal_ref[0, 0],  # threshold
        fscal_ref[0, 1],  # pre_gain
        fscal_ref[0, 2],  # ratio_gain (attack_env[-1], exact f32)
        fscal_ref[0, 3],  # attack ramp step
        fscal_ref[0, 4],  # release ramp step
        iscal_ref[0, 0],  # x_max
        iscal_ref[0, 1],  # y_max
    )

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
        mode_s[:] = n_mode
        xs_s[:] = n_x
        ys_s[:] = n_y
        skip_s[:] = n_skip
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
    ratio_gain = params.attack_env[-1]
    fscal = jnp.stack([
        params.threshold.astype(jnp.float32),
        params.pre_gain.astype(jnp.float32),
        ratio_gain,
        (ratio_gain - 1.0) / max(params.x_max - 1, 1),
        (1.0 - ratio_gain) / max(params.y_max - 1, 1),
    ]).reshape(1, 5)
    iscal = jnp.array([[params.x_max, params.y_max]], dtype=jnp.int32)

    grid = (Tp // t_tile,)
    row_spec = pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out, mf, xf, yf, sf = pl.pallas_call(
        partial(_kernel, t_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
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


def _fast_effect(base: Effect, interpret: bool = False) -> Effect:
    """Wrap a faithful dynamics Effect with kernel-backed offline/step paths.

    Works on (C, T)-shaped batches (1-D channel axis) and plain (T,) mono.
    """
    params = base.params

    def offline(params: DynamicsParams, blocks: jnp.ndarray) -> jnp.ndarray:
        shape = blocks.shape
        if blocks.ndim == 2:  # (nb, B) mono
            x = blocks.reshape(1, -1)
            st = init_state(params, (1,))
        elif blocks.ndim == 3:  # (C, nb, B)
            x = blocks.reshape(shape[0], -1)
            st = init_state(params, (shape[0],))
        else:
            raise ValueError("fast dynamics supports (nb,B) or (C,nb,B) blocks")
        _, out = dynamics_pallas(params, st, x, interpret=interpret)
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

    return _fast_effect(compressor(cfg, *args, **kwargs), interpret=interpret)


def fast_gate(cfg, *args, interpret: bool = False, **kwargs) -> Effect:
    from ..ops.dynamics import gate

    return _fast_effect(gate(cfg, *args, **kwargs), interpret=interpret)
