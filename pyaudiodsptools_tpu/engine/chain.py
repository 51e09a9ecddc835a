"""Effect chains: composition, state, and jit-compiled execution.

The reference's execution model is a nested Python loop — ``for chunk: for
device: chunk = device.apply(chunk)`` (Example1.py:14-18). Here a chain is
function composition over ``(params, state, block)`` ops; a whole offline
render is one jit-compiled program (each op's block-parallel ``offline`` path
chained, falling back to ``lax.scan`` of its streaming step), and a streaming
step is one jit-compiled block function with a single state pytree.

Per-device-sequential offline processing is equivalent to the reference's
chunk-major loop because each device's state depends only on its own input
stream — the loop orders commute (SURVEY.md §3.2).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..ops.base import Effect


class Chain:
    """An ordered effect chain with explicit state.

    >>> chain = Chain([ops.lowcut(cfg, 800), ops.compressor(cfg)])
    >>> state = chain.init_state()
    >>> state, out = chain.step(state, block)          # streaming (jitted)
    >>> out_blocks = chain.render_blocks(blocks)       # offline (jitted)
    """

    def __init__(self, effects: Sequence[Effect]):
        self.effects = tuple(effects)
        self._jit_step = jax.jit(partial(_chain_step, self.effects))
        self._jit_render = jax.jit(partial(_chain_render, self.effects))

    def __iter__(self):
        return iter(self.effects)

    def __len__(self) -> int:
        return len(self.effects)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> tuple[Any, ...]:
        return tuple(e.state(batch_shape) for e in self.effects)

    def step(self, state, block):
        """Process one block through the whole chain (compiled once per
        block shape)."""
        return self._jit_step(state, block)

    def render_blocks(self, blocks: jnp.ndarray) -> jnp.ndarray:
        """Offline: process all ``(..., num_blocks, block_size)`` blocks."""
        return self._jit_render(blocks)


def _chain_step(effects, state, block):
    new_states = []
    for eff, st in zip(effects, state):
        st, block = eff.step(eff.params, st, block)
        new_states.append(st)
    return tuple(new_states), block


def _scan_offline(eff: Effect, blocks: jnp.ndarray) -> jnp.ndarray:
    """Fallback offline path: lax.scan of the streaming step over blocks."""
    state = eff.init_state(eff.params, blocks.shape[:-2])
    xs = jnp.moveaxis(blocks, -2, 0)

    def body(st, blk):
        st, out = eff.step(eff.params, st, blk)
        return st, out

    _, ys = jax.lax.scan(body, state, xs)
    return jnp.moveaxis(ys, 0, -2)


def _chain_render(effects, blocks):
    for eff in effects:
        if eff.offline is not None:
            blocks = eff.offline(eff.params, blocks)
        else:
            blocks = _scan_offline(eff, blocks)
    return blocks
