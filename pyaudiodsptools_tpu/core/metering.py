"""Structured per-block metering (SURVEY.md §5 observability plan).

The reference's only metering is print-based average level (`InfodBV`,
Utility.py:122-168). Here meters are pure functions over blocks, returning a
small metrics pytree that can ride along a jitted render; on a sharded mesh
the reductions cross shards with ``psum``-style collectives automatically
(they are plain jnp reductions under GSPMD).
"""

from __future__ import annotations

import jax.numpy as jnp


def block_meters(blocks: jnp.ndarray) -> dict:
    """Per-block peak/RMS over ``(..., num_blocks, block_size)``."""
    peak = jnp.max(jnp.abs(blocks), axis=-1)
    rms = jnp.sqrt(jnp.mean(jnp.square(blocks), axis=-1))
    return {"peak": peak, "rms": rms}


def summary_meters(signal: jnp.ndarray) -> dict:
    """Whole-signal meters: peak, RMS, mean |x| in dB (InfodBV-compatible),
    clip count."""
    absx = jnp.abs(signal)
    mean_abs = jnp.mean(absx)
    return {
        "peak": jnp.max(absx),
        "rms": jnp.sqrt(jnp.mean(jnp.square(signal))),
        "dbv": 20.0 * jnp.log10(mean_abs),
        "clipped": jnp.sum(absx >= 1.0),
    }
