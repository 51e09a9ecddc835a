"""Load the reference implementation (pyAudioDspTools) for golden parity tests.

The reference at /root/reference is pure Python/NumPy and executes fine on CPU;
running it live gives always-fresh golden vectors (SURVEY.md §4 test plan).
Tests that need it are skipped when the mount is absent.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

REF_PATH = "/root/reference"


def load_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import pyAudioDspTools  # noqa: F401
    except ImportError:  # pragma: no cover
        pytest.skip("reference pyAudioDspTools not available")
    return pyAudioDspTools


def ref_config(sampling_rate: int = 44100, chunk_size: int = 512):
    ref = load_reference()
    ref.config.initialize(sampling_rate, chunk_size)
    return ref


def snr_db(golden: np.ndarray, ours: np.ndarray) -> float:
    """Signal-to-error ratio in dB; >=60 is the parity bound (BASELINE.json)."""
    golden = np.asarray(golden, dtype=np.float64)
    ours = np.asarray(ours, dtype=np.float64)
    assert golden.shape == ours.shape, (golden.shape, ours.shape)
    err = np.sum((golden - ours) ** 2)
    if err == 0:
        return np.inf
    sig = np.sum(golden**2)
    return 10.0 * np.log10(sig / err)


def run_ref_device(device, chunks: list[np.ndarray]) -> np.ndarray:
    """Fold a reference device's .apply over chunks and concatenate."""
    outs = [np.asarray(device.apply(c.copy())) for c in chunks]
    return np.concatenate(outs)


def chunked(signal: np.ndarray, chunk_size: int) -> list[np.ndarray]:
    n = len(signal)
    nb = -(-n // chunk_size)
    padded = np.zeros(nb * chunk_size, dtype=signal.dtype)
    padded[:n] = signal
    return [padded[i * chunk_size : (i + 1) * chunk_size] for i in range(nb)]
