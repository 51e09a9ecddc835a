"""Blocking / deblocking of audio signals.

TPU-native replacement for the reference's ``MakeChunks`` / ``CombineChunks``
(``/root/reference/pyAudioDspTools/Utility.py:8-48``). Instead of a Python list
of small arrays, signals are dense ``(..., num_blocks, block_size)`` arrays that
batch over the block axis, which is what lets the FFT effects run one large
batched FFT instead of one tiny FFT per chunk.

The reference has a known quirk: its pad condition tests divisibility by the
chunk *count*, not the chunk size (Utility.py:23), so e.g. a 1000-sample signal
with chunk_size=512 yields 2 chunks of 500. ``make_blocks`` always pads to a
multiple of ``block_size`` (the sane semantics); ``legacy_chunk_sizes`` exposes
the reference's exact partition for compatibility/parity checks.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def num_blocks(n_samples: int, block_size: int) -> int:
    return -(-n_samples // block_size)


def make_blocks(signal: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Split ``(..., n)`` signal into ``(..., num_blocks, block_size)``,
    zero-padding the tail. Mirrors Utility.py:8-28 with always-pad semantics."""
    n = signal.shape[-1]
    nb = num_blocks(n, block_size)
    pad = nb * block_size - n
    if pad:
        pad_width = [(0, 0)] * (signal.ndim - 1) + [(0, pad)]
        signal = jnp.pad(signal, pad_width)
    return signal.reshape(signal.shape[:-1] + (nb, block_size))


def combine_blocks(blocks: jnp.ndarray, n_samples: int | None = None) -> jnp.ndarray:
    """Inverse of :func:`make_blocks`: ``(..., nb, B) -> (..., nb*B)``,
    optionally truncated to the original length. Replaces the reference's
    O(n^2) ``numpy.append`` loop (Utility.py:45-48) with a reshape."""
    out = blocks.reshape(blocks.shape[:-2] + (-1,))
    if n_samples is not None:
        out = out[..., :n_samples]
    return out


def legacy_chunk_sizes(n_samples: int, chunk_size: int) -> list[int]:
    """The exact chunk partition the reference's ``MakeChunks`` produces,
    including the Utility.py:23 quirk (pad only when ``n % num_chunks != 0``)."""
    count = math.ceil(np.float32(n_samples / chunk_size))
    if n_samples % count != 0:
        padded = n_samples + (chunk_size - (n_samples % chunk_size))
    else:
        padded = n_samples
    if padded % count != 0:  # pragma: no cover - mirrors reference failure mode
        raise ValueError("reference MakeChunks would fail on this shape")
    return [padded // count] * count


def padded_length(n_samples: int, block_size: int) -> int:
    return num_blocks(n_samples, block_size) * block_size
