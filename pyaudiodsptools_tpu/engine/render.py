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
    out = chain.render_blocks(blocks)
    return blk.combine_blocks(out, n if trim else None)


def render_file(chain: Chain, in_path: str, out_path: str, cfg: EngineConfig,
                trim: bool = False) -> np.ndarray:
    """wav -> chain -> wav (Example1.py:1-23 / Example2.py parity, mono or
    multichannel)."""
    audio, _rate = wavio.read_wav(in_path)
    out = np.asarray(render(chain, audio, cfg, trim=trim))
    wavio.write_wav(out_path, out, cfg.sample_rate)
    return out
