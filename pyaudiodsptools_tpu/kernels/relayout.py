"""Pallas relayout kernels: natural (C, T) <-> speculative time-major.

The segment-parallel dynamics kernel (dynamics_pallas.dynamics_pallas_offline)
computes on a time-major layout: sample l of segment g, channel c lives at
row ``l*8 + r // K``, column ``r % K`` of an (L*8, K) f32 array with
``r = g*C + c`` (segment-major lanes). Building that layout with XLA
pad/transpose/reshape chains costs ~3 full-signal materializations per
direction — measured 4.9 ms in + 4.3 ms out at the flagship size, i.e. MOST
of the dynamics stage's wall (one speculative sweep is ~1.1 ms;
BENCH_DYN_r05 parts + the layout-variant experiment) — so these kernels do
each direction as ONE HBM pass: per grid step, gather DMAs, in-VMEM
(C, w) <-> (w, C) transposes, and one full-tile DMA on the time-major side,
double-buffered so both DMA directions overlap the transposes.

Geometry — every DMA must cover whole (8, 128) tiles of the time-major
array (Mosaic rejects sub-tile slices) and dynamic lane offsets must be
provably 128-aligned:

* One grid step moves a FULL tile block: rows [l0*8, (l0+w)*8), lanes
  [b*128, (b+1)*128) of (L*8, K) — that block holds time window [l0, l0+w)
  of 8*P segments (P = 128 // C per sublane, 8 sublanes), assembled in VMEM
  as a (w, 8, 128) stack of per-segment transposes. Requires
  ``128 % C == 0`` and ``C % 8 == 0``.
* The last window of each segment clamps to ``L - w`` (idempotent
  overlap); L and w are 128-multiples so every dynamic start stays aligned
  (the offline planner rounds L up when C is eligible).
* The LAST segment is shorter than L (Lv = T - (G-1)*L valid samples).
  PACK reads it from a small zero-extended side buffer (C, L + w) so every
  descriptor stays in-bounds without dynamic widths. UNPACK skips its
  out-of-range window stores, writes a 128-aligned shifted-back closing
  chunk, and emits the final 128 samples as a separate tiny output that
  the host wrapper applies with a static dynamic_update_slice. Time-major
  rows past Lv in the last segment (and lanes >= C*G) carry zeros/garbage
  the sweep kernels may read, which is harmless by construction — those
  samples' exit states are dropped by the entry shift and their audio is
  never unpacked (the same argument that lets the XLA fallback zero-pad
  them; dynamics_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
_W_CANDIDATES = (1024, 512, 256)


def _pick_w(C: int, T: int, G: int, L: int) -> int | None:
    last_valid = T - (G - 1) * L
    for w in _W_CANDIDATES:
        if w <= L and w <= last_valid:
            return w
    return None


def use_relayout(C: int, T: int, G: int, L: int, K: int, R: int, Rp: int,
                 interpret: bool = False) -> bool:
    """Geometry eligibility for the single-pass relayout kernels."""
    return (C % SUBLANES == 0 and C <= LANES and LANES % C == 0
            and L % LANES == 0 and K % LANES == 0
            and _pick_w(C, T, G, L) is not None)


def _al(v):
    return pl.multiple_of(v, LANES)


def _seg(b, s, q, C, K):
    """Segment index stored at lane block b, sublane s, slot q."""
    return (s * K + b * LANES) // C + q


def _pack_kernel(w, G, L, C, T, P, x_hbm, xt_hbm, out_hbm, xin, xt, lsem,
                 ssem):
    nw = pl.num_programs(1)
    i = pl.program_id(0) * nw + pl.program_id(1)
    total = pl.num_programs(0) * nw
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)
    K = out_hbm.shape[1]

    def geom(j):
        b = jax.lax.div(j, nw)
        l0 = jnp.minimum(jax.lax.rem(j, nw) * w, L - w)
        return b, _al(l0)

    def load_one(j, sl, s, q):
        b, l0 = geom(j)
        g = _seg(b, s, q, C, K)
        last = g == G - 1

        def from_tail():
            pltpu.make_async_copy(
                xt_hbm.at[:, pl.ds(l0, w)], xin.at[sl, s, q],
                lsem.at[sl, s, q]).start()

        def from_main():
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(_al(g * L + l0), w)], xin.at[sl, s, q],
                lsem.at[sl, s, q]).start()

        pl.when(jnp.logical_and(g < G, last))(from_tail)
        pl.when(jnp.logical_and(g < G, jnp.logical_not(last)))(from_main)

    def wait_one(j, sl, s, q):
        b, l0 = geom(j)
        g = _seg(b, s, q, C, K)
        # same byte count either source; wait via the always-in-bounds
        # tail view (the ADVICE-r4 pattern from pallas_conv.wait_load)
        pl.when(g < G)(lambda: pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(l0, w)], xin.at[sl, s, q],
            lsem.at[sl, s, q]).wait())

    def store(j, sl):
        b, l0 = geom(j)
        return pltpu.make_async_copy(
            xt.at[sl],
            out_hbm.at[pl.ds(pl.multiple_of(l0 * SUBLANES, 1024),
                             w * SUBLANES),
                       pl.ds(_al(b * LANES), LANES)],
            ssem.at[sl])

    @pl.when(i == 0)
    def _warm():
        for s in range(SUBLANES):
            for q in range(P):
                load_one(i, slot, s, q)

    @pl.when(i + 1 < total)
    def _pre():
        for s in range(SUBLANES):
            for q in range(P):
                load_one(i + 1, nslot, s, q)

    for s in range(SUBLANES):
        for q in range(P):
            wait_one(i, slot, s, q)

    @pl.when(i >= 2)
    def _drain():
        store(i - 2, slot).wait()

    # assemble the (w*8, 128) tile block: row t*8 + s carries sublane
    # group s's segments for sample t
    rows = [jnp.concatenate([xin[slot, s, q].T for q in range(P)], axis=1)
            for s in range(SUBLANES)]           # each (w, 128)
    xt[slot] = jnp.stack(rows, axis=1).reshape(w * SUBLANES, LANES)

    store(i, slot).start()

    @pl.when((i + 1 == total) & (i >= 1))
    def _drain_prev():
        store(i - 1, nslot).wait()

    @pl.when(i + 1 == total)
    def _drain_last():
        store(i, slot).wait()


def _unpack_kernel(w, G, L, C, T, P, tm_hbm, y_hbm, patch_hbm, tin, yt,
                   tfin, yfin, lsem, ssem, fsem):
    nw = pl.num_programs(1)
    i = pl.program_id(0) * nw + pl.program_id(1)
    total = pl.num_programs(0) * nw
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)
    K = tm_hbm.shape[1]
    Lv = T - (G - 1) * L
    # closing chunk of the last segment: 128-aligned shifted-back window
    # (static); covers rows up to l0f + w >= Lv - 128
    l0f = ((Lv - w) // LANES) * LANES
    # second aligned window whose rows cover [Lv-128, Lv)
    l0p = min(l0f + LANES, L - w)
    a = Lv - LANES - l0p
    gG = G - 1
    r0 = gG * C
    bG = (r0 % K) // LANES
    sG = r0 // K
    qG = (r0 % LANES) // C

    def geom(j):
        b = jax.lax.div(j, nw)
        l0 = jnp.minimum(jax.lax.rem(j, nw) * w, L - w)
        return b, _al(l0)

    def load(j, sl):
        b, l0 = geom(j)
        return pltpu.make_async_copy(
            tm_hbm.at[pl.ds(pl.multiple_of(l0 * SUBLANES, 1024),
                            w * SUBLANES),
                      pl.ds(_al(b * LANES), LANES)],
            tin.at[sl], lsem.at[sl])

    def _stq(j, sl, s, q, wait):
        b, l0 = geom(j)
        g = _seg(b, s, q, C, K)
        in_range = jnp.where(g == G - 1, l0 + w <= Lv, g < G)

        def d():
            return pltpu.make_async_copy(
                yt.at[sl, s, q], y_hbm.at[:, pl.ds(_al(g * L + l0), w)],
                ssem.at[sl, s, q])

        if wait:
            pl.when(in_range)(lambda: d().wait())
        else:
            pl.when(in_range)(lambda: d().start())

    @pl.when(i == 0)
    def _warm():
        load(i, slot).start()

    @pl.when(i + 1 < total)
    def _pre():
        load(i + 1, nslot).start()

    load(i, slot).wait()

    @pl.when(i >= 2)
    def _drain():
        for s in range(SUBLANES):
            for q in range(P):
                _stq(i - 2, slot, s, q, wait=True)

    t3 = tin[slot].reshape(w, SUBLANES, LANES)
    for s in range(SUBLANES):
        for q in range(P):
            yt[slot, s, q] = t3[:, s, q * C:(q + 1) * C].T

    for s in range(SUBLANES):
        for q in range(P):
            _stq(i, slot, s, q, wait=False)

    # last segment's closing chunk + 128-wide tail patch, once per call
    @pl.when(i == total - 1)
    def _final_chunk():
        def rect(l0s):
            return pltpu.make_async_copy(
                tm_hbm.at[pl.ds(pl.multiple_of(jnp.int32(l0s * SUBLANES),
                                               1024), w * SUBLANES),
                          pl.ds(_al(jnp.int32(bG * LANES)), LANES)],
                tfin, fsem.at[0])

        ld = rect(l0f)
        ld.start()
        ld.wait()
        t3f = tfin.reshape(w, SUBLANES, LANES)
        yfin[...] = t3f[:, sG, qG * C:(qG + 1) * C].T
        st = pltpu.make_async_copy(
            yfin, y_hbm.at[:, pl.ds(_al(jnp.int32(gG * L + l0f)), w)],
            fsem.at[0])
        st.start()
        st.wait()
        ld2 = rect(l0p)
        ld2.start()
        ld2.wait()
        t3p = tfin.reshape(w, SUBLANES, LANES)
        yfin[:, :LANES] = t3p[a:a + LANES, sG, qG * C:(qG + 1) * C].T
        st2 = pltpu.make_async_copy(
            yfin.at[:, pl.ds(0, LANES)], patch_hbm, fsem.at[0])
        st2.start()
        st2.wait()

    @pl.when((i + 1 == total) & (i >= 1))
    def _drain_prev():
        for s in range(SUBLANES):
            for q in range(P):
                _stq(i - 1, nslot, s, q, wait=True)

    @pl.when(i + 1 == total)
    def _drain_last():
        for s in range(SUBLANES):
            for q in range(P):
                _stq(i, slot, s, q, wait=True)


def time_major_pack(x: jnp.ndarray, G: int, L: int, K: int,
                    interpret: bool = False) -> jnp.ndarray:
    """(C, T) natural -> (L*8, K) time-major (r = g*C + c)."""
    C, T = x.shape
    w = _pick_w(C, T, G, L)
    P = LANES // C
    NB = K // LANES
    nw = -(-L // w)
    Lv = T - (G - 1) * L
    # zero-extended last segment (small: C x (L + w)); every last-segment
    # window reads from here so no descriptor needs a dynamic width
    xtail = jnp.concatenate(
        [x[:, (G - 1) * L:],
         jnp.zeros((C, L + w - Lv), jnp.float32)], axis=1)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    return pl.pallas_call(
        partial(_pack_kernel, w, G, L, C, T, P),
        grid=(NB, nw),
        in_specs=[any_spec, any_spec],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((L * SUBLANES, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, SUBLANES, P, C, w), jnp.float32),
            pltpu.VMEM((2, w * SUBLANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SUBLANES, P)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, xtail)


def time_major_unpack(tm: jnp.ndarray, C: int, T: int, G: int, L: int,
                      interpret: bool = False) -> jnp.ndarray:
    """(L*8, K) time-major (r = g*C + c) -> (C, T) natural."""
    K = tm.shape[1]
    w = _pick_w(C, T, G, L)
    P = LANES // C
    NB = K // LANES
    nw = -(-L // w)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    y, patch = pl.pallas_call(
        partial(_unpack_kernel, w, G, L, C, T, P),
        grid=(NB, nw),
        in_specs=[any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct((C, T), jnp.float32),
                   jax.ShapeDtypeStruct((C, LANES), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, w * SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((2, SUBLANES, P, C, w), jnp.float32),
            pltpu.VMEM((w * SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((C, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, SUBLANES, P)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tm)
    # XLA applies the tiny tail patch; static-start DUS on an otherwise
    # dead buffer lowers in place
    return jax.lax.dynamic_update_slice(y, patch, (0, T - LANES))
