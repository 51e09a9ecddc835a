"""Offline rendering: signal/file -> chain -> signal/file.

The canonical end-to-end path (Example1.py parity): read wav, block, render
the whole chain as one jitted program, deblock, write wav. Output length
matches the reference's CombineChunks (padded to whole blocks) unless
``trim=True``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import block as blk
from ..core import wavio
from ..core.config import EngineConfig
from .chain import Chain


def render(chain: Chain, signal, cfg: EngineConfig, trim: bool = False):
    """Render ``(..., n)`` audio through the chain. Leading axes are channels."""
    signal = jnp.asarray(signal)
    n = signal.shape[-1]
    blocks = blk.make_blocks(signal, cfg.block_size)
    # blocks is freshly built and never reused -> donate its buffer.
    out = chain.render_blocks(blocks, donate=True)
    return blk.combine_blocks(out, n if trim else None)


def render_segmented(chain: Chain, signal, cfg: EngineConfig,
                     segment_blocks: int = 512, trim: bool = False):
    """Bounded-memory exact render for signals too long to materialize.

    ``render`` keeps the whole signal plus several intermediates in device
    memory (fine up to minutes of multichannel audio); this path scans the
    chain's streaming step over ``segment_blocks``-block segments with the
    state pytree carried across, so device memory is O(segment + state)
    while results stay exact (the step path IS the op semantics). Roughly
    4x slower than the fully block-parallel offline path — still thousands
    of times realtime — so use it when memory, not time, is the constraint.
    """
    from functools import partial

    import jax

    from .resumable import _render_segment

    if segment_blocks < 1:
        raise ValueError(f"segment_blocks must be >= 1, got {segment_blocks}")
    signal = jnp.asarray(signal)
    n = signal.shape[-1]
    blocks = blk.make_blocks(signal, cfg.block_size)
    nb = blocks.shape[-2]
    state = chain.init_state(blocks.shape[:-2])
    seg_fn = jax.jit(partial(_render_segment, chain._structure))
    outs = []
    for lo in range(0, nb, segment_blocks):
        hi = min(lo + segment_blocks, nb)
        state, out = seg_fn(chain.params, state, blocks[..., lo:hi, :])
        outs.append(np.asarray(out))
    out = jnp.asarray(np.concatenate(outs, axis=-2))
    return blk.combine_blocks(out, n if trim else None)


def render_file(chain: Chain, in_path: str, out_path: str, cfg: EngineConfig,
                trim: bool = False) -> np.ndarray:
    """wav -> chain -> wav (Example1.py:1-23 / Example2.py parity, mono or
    multichannel)."""
    audio, _rate = wavio.read_wav(in_path)
    out = np.asarray(render(chain, audio, cfg, trim=trim))
    wavio.write_wav(out_path, out, cfg.sample_rate)
    return out
