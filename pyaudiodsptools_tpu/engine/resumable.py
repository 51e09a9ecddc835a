"""Resumable offline rendering: crash recovery for long renders.

SURVEY.md §5 failure-detection plan: the reference has nothing; the minimal
TPU-native mechanism is deterministic re-render from block k — snapshot the
chain state every N blocks, and on restart resume from the last complete
segment. Because every op's state is an explicit pytree, a snapshot is just
arrays; determinism comes from jit purity.

Checkpoint layout (directory):
    meta.json               {"segment": k, "blocks_done": n}
    state.npz               flattened chain-state leaves
    out_00000.npy ...       rendered output segments
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .chain import Chain


def _save_state(path: str, state) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(path, *[np.asarray(l) for l in leaves])


def _load_state(path: str, template):
    archive = np.load(path)
    leaves = [jnp.asarray(archive[k]) for k in archive.files]
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, leaves)


def render_resumable(chain: Chain, blocks: jnp.ndarray, ckpt_dir: str,
                     segment_blocks: int = 64,
                     stop_after: int | None = None) -> jnp.ndarray:
    """Render ``(..., nb, B)`` blocks with periodic checkpoints; resumes
    automatically if ``ckpt_dir`` holds a partial run for the same shape.

    ``stop_after`` aborts after that many segments (fault-injection hook for
    testing crash/resume behavior)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    state_path = os.path.join(ckpt_dir, "state.npz")

    nb = blocks.shape[-2]
    n_seg = -(-nb // segment_blocks)
    batch_shape = blocks.shape[:-2]

    start_seg = 0
    state = chain.init_state(batch_shape)
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if meta.get("shape") == list(blocks.shape) and meta["segment"] < n_seg:
            start_seg = meta["segment"]
            state = _load_state(state_path, state)

    outs = []
    for seg in range(n_seg):
        seg_path = os.path.join(ckpt_dir, f"out_{seg:05d}.npy")
        lo, hi = seg * segment_blocks, min((seg + 1) * segment_blocks, nb)
        if seg < start_seg:
            outs.append(jnp.asarray(np.load(seg_path)))
            continue
        if stop_after is not None and seg >= start_seg + stop_after:
            raise RuntimeError(f"injected fault after segment {seg}")
        seg_blocks = blocks[..., lo:hi, :]
        state, out = _render_segment(chain, state, seg_blocks)
        np.save(seg_path, np.asarray(out))
        _save_state(state_path, state)
        json.dump({"segment": seg + 1, "shape": list(blocks.shape)},
                  open(meta_path, "w"))
        outs.append(out)
    return jnp.concatenate(outs, axis=-2)


def _render_segment(chain: Chain, state, seg_blocks):
    """One checkpointed segment: scan the chain step over its blocks."""
    xs = jnp.moveaxis(seg_blocks, -2, 0)

    def body(st, blk):
        return _step(chain, st, blk)

    state, ys = jax.lax.scan(body, state, xs)
    return state, jnp.moveaxis(ys, 0, -2)


def _step(chain: Chain, state, block):
    new_states = []
    for eff, st in zip(chain.exec_effects, state):
        st, block = eff.step(eff.params, st, block)
        new_states.append(st)
    return tuple(new_states), block
