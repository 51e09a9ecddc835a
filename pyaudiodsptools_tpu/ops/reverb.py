"""Reverb: early-reflection multi-tap delay lines with high-cut damping.

Parity target: ``/root/reference/pyAudioDspTools/_EffectReverb.py`` (unexported
WIP in the reference but exercised by its ModuleTests.py:45,80; shipped
first-class here per SURVEY.md §7). Structure:

* two delay lines; line k high-cut filters the input (5000 Hz / 150 Hz, with
  the FFT filter's one-block latency), then writes taps at multiples of
  ``reverb_samples // loops`` with gains ``linspace(0.3, 0.01, loops)`` —
  looping ``range(loops-1)`` like the reference (:49), so the last ramp entry
  is unused;
* both lines are wet-only; the output is their sum (:15-23) — no dry signal.

Like the Delay, each line is linear and time-invariant in its (filtered)
input, so the offline path is filtered input + shifted adds, fully parallel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from .base import Effect, pytree_dataclass
from . import fft_filter


@pytree_dataclass(meta_fields=("time_in_samples", "n_taps", "block_size"))
class ReverbLineParams:
    ramp: jnp.ndarray
    highcut: fft_filter.FIRParams
    time_in_samples: int
    n_taps: int
    block_size: int


@pytree_dataclass(meta_fields=("halo_blocks", "seg_blocks", "block_size"))
class ReverbParams:
    line1: ReverbLineParams
    line2: ReverbLineParams
    # Whole-reverb impulse response as one segmented-conv spectrum: the sum
    # over lines of (highcut kernel convolved into the tap train), filter
    # latency folded in. Offline cost = one FFT convolution instead of ~150
    # full-signal tap adds.
    spectrum_full: jnp.ndarray
    halo_blocks: int
    seg_blocks: int
    block_size: int


def _line(cfg: EngineConfig, reverb_samples: int, loops: int,
          highcut_hz: float) -> ReverbLineParams:
    return ReverbLineParams(
        ramp=jnp.asarray(np.linspace(0.3, 0.01, num=loops, dtype=np.float32)),
        highcut=fft_filter.highcut(cfg, highcut_hz).params,
        time_in_samples=reverb_samples // loops,
        n_taps=loops - 1,  # range(len(ramp)-1), _EffectReverb.py:49
        block_size=cfg.block_size,
    )


def _line_kernel(cfg: EngineConfig, reverb_samples: int, loops: int,
                 highcut_hz: float) -> np.ndarray:
    """Host-side impulse response of one line: ramp-scaled copies of the
    high-cut sinc kernel at tap offsets, plus the FFT filter's one-block
    latency (out[m] = conv(x, hk)[m - (B - fl//2)])."""
    B = cfg.block_size
    fl = (B // 2) - 1
    hk = fft_filter.sinc_kernel(highcut_hz, cfg.sample_rate, fl, "blackman")
    s0 = B - fl // 2
    time = reverb_samples // loops
    ramp = np.linspace(0.3, 0.01, num=loops, dtype=np.float32)
    k = np.zeros(time * (loops - 1) + s0 + fl)
    for i in range(loops - 1):
        off = time * (i + 1) + s0
        k[off : off + fl] += float(ramp[i]) * hk
    return k


def reverb(cfg: EngineConfig, time_in_ms: float = 1500.0) -> Effect:
    reverb_samples = int((time_in_ms / 1000) * cfg.sample_rate)
    k1 = _line_kernel(cfg, reverb_samples, 100, 5000.0)
    k2 = _line_kernel(cfg, reverb_samples, 50, 150.0)
    k = np.zeros(max(len(k1), len(k2)))
    k[: len(k1)] += k1
    k[: len(k2)] += k2
    spec, halo, seg = fft_filter.pack_segmented_kernel(k, cfg.block_size)
    params = ReverbParams(
        line1=_line(cfg, reverb_samples, 100, 5000.0),
        line2=_line(cfg, reverb_samples, 50, 150.0),
        spectrum_full=spec,
        halo_blocks=halo,
        seg_blocks=seg,
        block_size=cfg.block_size,
    )
    return Effect(name="reverb", params=params, init_state=init_state,
                  step=step, offline=offline, lti_kernel=k)


def _line_buffer_len(p: ReverbLineParams) -> int:
    B = p.block_size
    raw = p.time_in_samples * p.n_taps + B
    return max(-(-raw // B) * B, B)


def _line_state(p: ReverbLineParams, batch_shape):
    return {
        "filter": fft_filter.fir_init_state(p.highcut, batch_shape),
        "buffer": jnp.zeros(batch_shape + (_line_buffer_len(p),), dtype=jnp.float32),
    }


def init_state(params: ReverbParams, batch_shape: tuple[int, ...] = ()):
    return {"line1": _line_state(params.line1, batch_shape),
            "line2": _line_state(params.line2, batch_shape)}


def _line_step(p: ReverbLineParams, st, block):
    fstate, filtered = fft_filter.fir_step(p.highcut, st["filter"], block)
    n = block.shape[-1]
    buf = st["buffer"]
    for k in range(p.n_taps):
        start = p.time_in_samples * (k + 1)
        buf = buf.at[..., start : start + n].add(filtered * p.ramp[k])
    out = buf[..., :n]
    buf = jnp.concatenate([buf[..., n:], jnp.zeros_like(block)], axis=-1)
    return {"filter": fstate, "buffer": buf}, out


def step(params: ReverbParams, state, block: jnp.ndarray):
    st1, wet1 = _line_step(params.line1, state["line1"], block)
    st2, wet2 = _line_step(params.line2, state["line2"], block)
    return {"line1": st1, "line2": st2}, (wet1 + wet2).astype(jnp.float32)


def offline(params: ReverbParams, blocks: jnp.ndarray) -> jnp.ndarray:
    """One segmented FFT convolution with the combined two-line impulse
    response (both high-cut prefilters and all ~150 taps folded into a single
    host-built kernel — the whole reverb is LTI)."""
    return fft_filter.segmented_fft_conv(
        params.spectrum_full, blocks, 0, params.block_size,
        params.halo_blocks, params.seg_blocks)
