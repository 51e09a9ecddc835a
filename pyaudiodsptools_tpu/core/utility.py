"""Mixing, gain, metering, bit-depth conversion and dither.

Parity targets in ``/root/reference/pyAudioDspTools/Utility.py``:
``MixSignals`` :51-72, ``VolumeChange`` :171-194, ``InfodBV``/``InfodBV16Bit``
:122-168, ``ConvertdBVTo16Bit``/``Convert16BitTodBV`` :75-83, dither :86-105.

Deliberate changes (SURVEY.md §7): dither takes an explicit PRNG key instead
of unseeded ``numpy.random.randint`` (Utility.py:87,98).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mix_signals(*signals: jnp.ndarray) -> jnp.ndarray:
    """Sum signals then clip to [-1, 1] (Utility.py:51-72)."""
    mixed = signals[0]
    for s in signals[1:]:
        mixed = mixed + s
    return jnp.clip(mixed, -1.0, 1.0)


def volume_change(signal: jnp.ndarray, gain_db: float,
                  overflow_protection: bool = True) -> jnp.ndarray:
    """Gain in dB, optional clip (Utility.py:171-194)."""
    out = (10.0 ** (gain_db / 20.0)) * signal
    if overflow_protection:
        out = jnp.clip(out, -1.0, 1.0)
    return out


def info_dbv(signal: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute amplitude in dB re 1.0 (Utility.py:122-144)."""
    return 20.0 * jnp.log10(jnp.mean(jnp.abs(signal)))


def info_dbv_16bit(signal: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute amplitude in dB re 32767 (Utility.py:146-168)."""
    return 20.0 * jnp.log10(jnp.mean(jnp.abs(signal)) / 32767.0)


def dbv_to_16bit(signal: jnp.ndarray) -> jnp.ndarray:
    """Clip then scale to int16 by 2**15-1 (Utility.py:75-78)."""
    return (jnp.clip(signal, -1.0, 1.0) * (2**15 - 1)).astype(jnp.int16)


def from_16bit_to_dbv(int_signal: jnp.ndarray) -> jnp.ndarray:
    """int16 -> float scaled by /32767 (Utility.py:81-83)."""
    return (int_signal / 32767.0).astype(jnp.float32)


def dither_16bit_to_8bit(key: jax.Array, int_signal: jnp.ndarray) -> jnp.ndarray:
    """Rectangular-dither 16->8 bit (Utility.py:86-94): round(x/256) plus
    dither in {-1, 0}, clipped to ±127. Kept int16-typed like the reference."""
    dither = jax.random.randint(key, int_signal.shape, -1, 1)
    out = jnp.round(int_signal / 256.0).astype(jnp.int16)
    out = out + dither.astype(jnp.int16)
    return jnp.clip(out, -127, 127)


def dither_32bit_to_16bit(key: jax.Array, int_signal: jnp.ndarray) -> jnp.ndarray:
    """Rectangular-dither 32->16 bit (Utility.py:97-105): round(x/65535) plus
    dither in {-1, 0}, clipped to ±32767, cast int16."""
    dither = jax.random.randint(key, int_signal.shape, -1, 1)
    out = jnp.round(int_signal / 65535.0).astype(jnp.int32)
    out = out + dither
    return jnp.clip(out, -32767, 32767).astype(jnp.int16)
