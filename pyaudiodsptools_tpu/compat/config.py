"""Drop-in replacement for the reference's module-singleton config
(``/root/reference/pyAudioDspTools/config.py``).

``initialize(sampling_rate, chunk_size)`` sets module-level values that compat
device constructors snapshot at build time — the same semantics migrating users
expect. New code should pass :class:`~pyaudiodsptools_tpu.core.config.EngineConfig`
explicitly instead.

``use_gpu`` is accepted for signature compatibility; backend selection is by
JAX platform (the reference documents the flag but never reads it either,
config.py:10-11 vs. no consumer — SURVEY.md §2.3 #23).
"""

from __future__ import annotations

from ..core.config import EngineConfig

sampling_rate: int | None = None
chunk_size: int | None = None
use_gpu: bool = False
_gpu_available: bool = True  # kept for API parity; meaningless under JAX


def initialize(sampling_rate_: int, chunk_size_: int, use_gpu_: bool = False) -> None:
    global sampling_rate, chunk_size, use_gpu
    sampling_rate = sampling_rate_
    chunk_size = chunk_size_
    use_gpu = use_gpu_


def current() -> EngineConfig:
    if sampling_rate is None or chunk_size is None:
        raise RuntimeError(
            "pyaudiodsptools_tpu.compat.config.initialize(sampling_rate, "
            "chunk_size) must be called before constructing devices"
        )
    return EngineConfig(sample_rate=sampling_rate, block_size=chunk_size)
