"""3-band EQ, FFT form (Kaiser-windowed shelving filters via overlap-save).

Behavioral parity target: ``/root/reference/pyAudioDspTools/EffectEQ3BandFFT.py``:
three windowed-sinc filters built at init with Kaiser(beta=6) windows —
high shelf = spectrally-inverted lowcut at ``f - f/4`` (:72-90), low shelf =
highcut at ``f + f/4`` (:95-107), mid = lowpass(f+f/4) x highpass(f-f/4)
spectral product (:112-143, combined at :188) — then per block: one shared
forward FFT of the 3-block window, three band multiplies, the shelf-gain trick
``band*g - band = band*(g-1)`` (:195,200,205), mixed with the 1-block-delayed
dry middle chunk (:209). Latency: exactly one block.

TPU-first: a single rfft of the window; the three band spectra are combined
into ONE weighted spectrum ``(g_hi-1)*H_hi + (g_lo-1)*H_lo + (g_mid-1)*H_mid``
at build time — the whole EQ is mathematically one overlap-save filter plus
the dry delayed path, so the per-block cost equals a single FFT filter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from .base import Effect, pytree_dataclass
from . import fft_filter
from .fft_filter import overlap_save_spectrum, sinc_kernel


@pytree_dataclass(meta_fields=("block_size", "slice_start", "slice_end",
                               "shift"))
class EQ3BandFFTParams:
    # Combined wet spectrum: sum over bands of (gain-1) * band spectrum,
    # packed as (2, n) float32 real/imag (fft_filter.pack_spectrum).
    spectrum: jnp.ndarray      # (2, 3B//2 + 1) — streaming form
    spectrum_seg: jnp.ndarray  # (2, (G+1)B//2 + 1) — segmented offline form
    block_size: int
    slice_start: int
    slice_end: int
    shift: int


def eq3band_fft(cfg: EngineConfig, lowshelf_hz: float, lowshelf_db: float,
                mid_hz: float, mid_db: float, highshelf_hz: float,
                highshelf_db: float) -> Effect:
    B = cfg.block_size
    fs = cfg.sample_rate
    fl = (B // 2) - 1

    # Band kernels, built exactly as the reference does (float64 on host).
    h_highshelf = sinc_kernel(highshelf_hz - highshelf_hz / 4, fs, fl,
                              "kaiser6", invert=True)
    h_lowshelf = sinc_kernel(lowshelf_hz + lowshelf_hz / 4, fs, fl, "kaiser6")
    h_mid_lp = sinc_kernel(mid_hz + mid_hz / 4, fs, fl, "kaiser6")
    h_mid_hp = sinc_kernel(mid_hz - mid_hz / 4, fs, fl, "kaiser6", invert=True)

    H_hi = overlap_save_spectrum(h_highshelf, B)
    H_lo = overlap_save_spectrum(h_lowshelf, B)
    # Mid band is the spectral product of its low/high pass (EffectEQ3BandFFT.py:188)
    # — a linear convolution in time (supports sum to 2fl-1 < B, wrap-free).
    H_mid = overlap_save_spectrum(h_mid_lp, B) * overlap_save_spectrum(h_mid_hp, B)
    k_mid = np.convolve(h_mid_lp, h_mid_hp)

    def g(db: float) -> float:
        return 10.0 ** (db / 20.0) - 1.0

    combined = g(highshelf_db) * H_hi + g(lowshelf_db) * H_lo + g(mid_db) * H_mid
    k_combined = (g(highshelf_db) * np.concatenate([h_highshelf,
                                                    np.zeros(fl - 1)])
                  + g(lowshelf_db) * np.concatenate([h_lowshelf,
                                                     np.zeros(fl - 1)])
                  + g(mid_db) * k_mid)

    seg_len = (fft_filter.SEGMENT_BLOCKS + 1) * B
    seg = np.fft.rfft(np.concatenate([k_combined,
                                      np.zeros(seg_len - len(k_combined))]))
    params = EQ3BandFFTParams(
        spectrum=fft_filter.pack_spectrum(combined),
        spectrum_seg=fft_filter.pack_spectrum(seg),
        block_size=B,
        slice_start=B + fl // 2,
        slice_end=B - fl // 2,
        shift=B - fl // 2,
    )
    # Effective impulse response: wet kernel at its latency shift plus the
    # 1-block-delayed dry path (unit tap at index B).
    shift = B - fl // 2
    eff_kernel = np.zeros(max(shift + len(k_combined), B + 1))
    eff_kernel[shift : shift + len(k_combined)] += k_combined
    eff_kernel[B] += 1.0
    return Effect(name="eq3band_fft", params=params, init_state=init_state,
                  step=step, offline=offline, lti_kernel=eff_kernel)


def init_state(params: EQ3BandFFTParams, batch_shape: tuple[int, ...] = ()):
    B = params.block_size
    z = jnp.zeros(batch_shape + (B,), dtype=jnp.float32)
    return {"prev1": z, "prev2": z}


def _wet(params: EQ3BandFFTParams, window: jnp.ndarray) -> jnp.ndarray:
    B = params.block_size
    out = fft_filter.batched_rfft_filter(window.astype(jnp.float32),
                                         params.spectrum, 3 * B)
    return out[..., params.slice_start : 3 * B - params.slice_end]


def step(params: EQ3BandFFTParams, state, block: jnp.ndarray):
    """Wet (combined bands) + dry middle chunk, both latency-aligned at one
    block (EffectEQ3BandFFT.py:156-211)."""
    window = jnp.concatenate([state["prev2"], state["prev1"], block], axis=-1)
    out = (_wet(params, window) + state["prev1"]).astype(jnp.float32)
    return {"prev1": block, "prev2": state["prev1"]}, out


def offline(params: EQ3BandFFTParams, blocks: jnp.ndarray) -> jnp.ndarray:
    """Segmented fast convolution for the wet path + a 1-block-delayed dry
    path (the reference's latency-aligned dry mix, EffectEQ3BandFFT.py:209)."""
    B = params.block_size
    wet = fft_filter.segmented_fft_conv(params.spectrum_seg, blocks,
                                        params.shift, B)
    pad = [(0, 0)] * (blocks.ndim - 2) + [(1, 0), (0, 0)]
    dry = jnp.pad(blocks, pad)[..., :-1, :]
    return (wet + dry).astype(jnp.float32)
