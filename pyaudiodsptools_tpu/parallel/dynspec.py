"""Cross-device speculative dynamics: keep compressor/gate TIME-sharded.

The dynamics automaton (ops/dynamics.py; reference semantics
EffectCompressor.py:68-124 / EffectGate.py:69-126) is sequential in time, so
a time-sharded mesh previously had to all-gather the time axis and run it
per-channel (parallel/sharding.py routed it through the channel-gathered
path). This module extends the single-chip speculative-segment idea
(kernels/dynamics_pallas.py) ACROSS the mesh's 'time' axis:

  * every device scans its local time segment from a guessed entry state
    (initially REST — the all-zeros state);
  * exit states hop to the next device with ``lax.ppermute``;
  * repeat until the entry states reach their global fixpoint (detected with
    a psum'd changed-flag), which reproduces the exact serial trajectory —
    the automaton's state is a few small ints per channel, so each round
    moves only O(channels) bytes over ICI.

Convergence is <= n_time rounds worst case, and 2-3 on real audio because
the automaton synchronizes (any completed attack or release forces a state
independent of the entry guess). The loop's last round computes its output
from the already-converged entries, so the result is bit-identical to the
single-device render (tests/test_dynspec.py asserts exact equality).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import dynamics as dyn
from ..ops.dynamics import DynamicsParams


def is_dynamics_params(p) -> bool:
    """True for one DynamicsParams or a (fused-cascade) tuple of them."""
    if isinstance(p, DynamicsParams):
        return True
    return (isinstance(p, tuple) and len(p) > 0
            and all(isinstance(q, DynamicsParams) for q in p))


def _as_list(params):
    return list(params) if isinstance(params, tuple) else [params]


def _stepper():
    """Per-device sweep primitive: the serial Pallas kernel on TPU (VPU lanes
    across channels, no per-sample dispatch), the faithful scan elsewhere —
    the two are bit-identical (tests/test_kernels.py).

    The kernel-inside-shard_map-inside-while_loop composition cannot run
    compiled in CI (the chip has one device; CI meshes are virtual CPU
    devices), so ``PADT_DYNSPEC_INTERPRET=1`` forces the Pallas stepper in
    interpret mode on any backend — tests/test_dynspec.py exercises the
    composition that way on the 8-device virtual mesh."""
    import os

    interpret = os.environ.get("PADT_DYNSPEC_INTERPRET", "0") == "1"
    if jax.default_backend() == "tpu" or interpret:
        from ..kernels.dynamics_pallas import dynamics_pallas

        return lambda p, st, x: dynamics_pallas(
            p, st, x, t_tile=min(1024, x.shape[-1]), interpret=interpret)
    return dyn.step


_compiled_multidevice_warned = False


def _warn_first_compiled_multidevice(mesh) -> None:
    """Loud, once-per-process fence (VERDICT r4 #7): the COMPILED (non-
    interpret) Pallas stepper inside shard_map inside while_loop has never
    executed on a real multi-device TPU mesh — CI covers the composition in
    interpret mode on a virtual mesh only, and this environment has one
    chip. When a pod exists, run ``python bench_pod.py
    --compiled-dynspec-probe`` (a tiny isolated render of exactly this
    branch) before relying on it in a long job."""
    global _compiled_multidevice_warned
    import os

    interpret = os.environ.get("PADT_DYNSPEC_INTERPRET", "0") == "1"
    if (not _compiled_multidevice_warned and not interpret
            and jax.default_backend() == "tpu"
            and mesh.shape.get("time", 1) > 1):
        import warnings

        warnings.warn(
            "dynspec: first compiled Pallas-stepper execution on a "
            "multi-device 'time' mesh in this process — this Mosaic "
            "composition is CI-validated in interpret mode only; probe it "
            "with `python bench_pod.py --compiled-dynspec-probe` first "
            "(see parallel/dynspec.py).", stacklevel=3)
        _compiled_multidevice_warned = True


def _local_sweep(step, params_list, entries, x):
    """Scan the local segment from the given entry states: returns (exit
    states, output). Op j+1 consumes op j's output (cascade order)."""
    exits = []
    out = x
    for p, st in zip(params_list, entries):
        st, out = step(p, st, out)
        exits.append(st)
    return tuple(exits), out


def dynamics_offline_time_sharded(params, blocks: jnp.ndarray,
                                  mesh: Mesh) -> jnp.ndarray:
    """Time-sharded offline dynamics (single op or fused cascade).

    blocks: (C, nb, B) laid out P('channel', 'time', None) on ``mesh``;
    returns the same layout. Must be called under jit (ShardedRenderer does).
    """
    n_time = mesh.shape["time"]
    step = _stepper()
    _warn_first_compiled_multidevice(mesh)

    def local(params, b):
        params_list = _as_list(params)
        C, nb_loc, B = b.shape
        x = b.reshape(C, nb_loc * B)
        t = jax.lax.axis_index("time")
        e0 = tuple(dyn.init_state(p, (C,)) for p in params_list)
        perm = [(i, i + 1) for i in range(n_time - 1)]

        def body(carry):
            e, _, it, _ = carry
            z, out = _local_sweep(step, params_list, e, x)
            # device i's exit becomes device i+1's entry; device 0 keeps the
            # true initial state (REST — ppermute's zero-fill equals it, but
            # the where() keeps correctness independent of that encoding).
            zn = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "time", perm), z)
            en = jax.tree.map(
                lambda new, init: jnp.where(t == 0, init, new), zn, e0)
            moved = jax.tree.reduce(
                jnp.logical_or,
                jax.tree.map(lambda a, b2: jnp.any(a != b2), en, e),
            )
            changed = jax.lax.psum(moved.astype(jnp.int32), "time") > 0
            return en, out, it + 1, changed

        def cond(carry):
            _, _, it, changed = carry
            return jnp.logical_and(changed, it < n_time + 1)

        carry = (e0, jnp.zeros_like(x), jnp.int32(0), jnp.bool_(True))
        _, out, _, _ = jax.lax.while_loop(cond, body, carry)
        return out.reshape(C, nb_loc, B)

    pspec = jax.tree.map(lambda _: P(), params)
    spec = P("channel", "time", None)
    return jax.shard_map(local, mesh=mesh, in_specs=(pspec, spec),
                         out_specs=spec, check_vma=False)(params, blocks)
