"""Delay: multi-tap echo with a feedback gain ramp.

Parity target: ``/root/reference/pyAudioDspTools/EffectDelay.py:30-74``. The
reference keeps a sliding buffer of ``time*(loops+2)`` samples; each apply
writes ``input * ramp[k]`` at offsets ``time*(k+1)`` and mixes (or returns) the
buffer head. Since the buffer only ever accumulates scaled copies of the *dry*
input, the whole device is linear time-invariant:

    y[n] = x[n] (dry, unless wet) + sum_k ramp[k] * x[n - time*(k+1)]

so the offline path is a handful of shifted adds over the full signal — no
scan, fully parallel. Streaming keeps the reference's buffer as explicit state.

Known reference bug handled deliberately (SURVEY.md §7): constructing with
``use_lowcut_filter/use_highcut_filter=True`` crashes the reference (calls
nonexistent methods, EffectDelay.py:56-58). Here the filters work; they apply
the standard FFT filters (with their 1-block latency) to the input first.

The feedback ramp is ``linspace(0.5, 0.1, feedback_loops)`` (EffectDelay.py:35).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from .base import Effect, pytree_dataclass
from . import fft_filter


@pytree_dataclass(meta_fields=("time_in_samples", "feedback_loops", "wet",
                               "block_size", "use_lowcut", "use_highcut"))
class DelayParams:
    ramp: jnp.ndarray                    # (feedback_loops,)
    lowcut: fft_filter.FIRParams | None
    highcut: fft_filter.FIRParams | None
    time_in_samples: int
    feedback_loops: int
    wet: bool
    block_size: int
    use_lowcut: bool
    use_highcut: bool


def delay(cfg: EngineConfig, time_in_ms: float = 500.0, feedback_loops: int = 2,
          lowcut_hz: float = 40.0, highcut_hz: float = 12000.0,
          use_lowcut_filter: bool = False, use_highcut_filter: bool = False,
          wet: bool = False) -> Effect:
    time_in_samples = int(time_in_ms * (cfg.sample_rate / 1000))
    params = DelayParams(
        ramp=jnp.asarray(np.linspace(0.5, 0.1, num=feedback_loops, dtype=np.float32)),
        lowcut=fft_filter.lowcut(cfg, lowcut_hz).params if use_lowcut_filter else None,
        highcut=fft_filter.highcut(cfg, highcut_hz).params if use_highcut_filter else None,
        time_in_samples=time_in_samples,
        feedback_loops=feedback_loops,
        wet=wet,
        block_size=cfg.block_size,
        use_lowcut=use_lowcut_filter,
        use_highcut=use_highcut_filter,
    )
    # Effective impulse response (the op is LTI): dry tap (unless wet) plus
    # ramp[k] at time*(k+1), convolved with any enabled pre-filters' kernels.
    ramp64 = np.linspace(0.5, 0.1, num=feedback_loops, dtype=np.float32
                         ).astype(np.float64)
    eff_kernel = np.zeros(time_in_samples * feedback_loops + 1)
    if not wet:
        eff_kernel[0] = 1.0
    for k in range(feedback_loops):
        eff_kernel[time_in_samples * (k + 1)] += ramp64[k]
    for enabled, hz, invert in ((use_lowcut_filter, lowcut_hz, True),
                                (use_highcut_filter, highcut_hz, False)):
        if enabled:
            fl = (cfg.block_size // 2) - 1
            k_f = fft_filter.sinc_kernel(hz, cfg.sample_rate, fl, "blackman",
                                         invert)
            shifted = np.concatenate(
                [np.zeros(cfg.block_size - fl // 2), k_f])
            eff_kernel = np.convolve(eff_kernel, shifted)
    return Effect(name="delay", params=params, init_state=init_state, step=step,
                  offline=offline, lti_kernel=eff_kernel)


def _buffer_len(params: DelayParams) -> int:
    # time*(loops+2) like the reference (EffectDelay.py:33-34), but also large
    # enough for the farthest tap plus one block (the reference crashes when a
    # chunk overruns its buffer; we size correctly), rounded up to a whole
    # number of blocks so the sliding window stays block-aligned.
    B = params.block_size
    raw = max(params.time_in_samples * (params.feedback_loops + 2),
              params.time_in_samples * params.feedback_loops + B)
    return max(-(-raw // B) * B, B)


def init_state(params: DelayParams, batch_shape: tuple[int, ...] = ()):
    state = {"buffer": jnp.zeros(batch_shape + (_buffer_len(params),),
                                 dtype=jnp.float32)}
    if params.use_lowcut:
        state["lowcut"] = fft_filter.fir_init_state(params.lowcut, batch_shape)
    if params.use_highcut:
        state["highcut"] = fft_filter.fir_init_state(params.highcut, batch_shape)
    return state


def _prefilter_step(params: DelayParams, state, block):
    if params.use_lowcut:
        state["lowcut"], block = fft_filter.fir_step(params.lowcut, state["lowcut"], block)
    if params.use_highcut:
        state["highcut"], block = fft_filter.fir_step(params.highcut, state["highcut"], block)
    return state, block


def step(params: DelayParams, state, block: jnp.ndarray):
    state = dict(state)
    state, block = _prefilter_step(params, state, block)
    n = block.shape[-1]
    buf = state["buffer"]
    # Write input * ramp[k] at offsets time*(k+1) (EffectDelay.py:60-64).
    for k in range(params.feedback_loops):
        start = params.time_in_samples * (k + 1)
        buf = buf.at[..., start : start + n].add(block * params.ramp[k])
    head = buf[..., :n]
    out = head if params.wet else block + head
    # Slide buffer left by one block and zero-fill (EffectDelay.py:71-72).
    zeros = jnp.zeros_like(block)
    buf = jnp.concatenate([buf[..., n:], zeros], axis=-1)
    state["buffer"] = buf
    return state, out.astype(jnp.float32)


def offline(params: DelayParams, blocks: jnp.ndarray) -> jnp.ndarray:
    if params.use_lowcut:
        blocks = fft_filter.fir_offline(params.lowcut, blocks)
    if params.use_highcut:
        blocks = fft_filter.fir_offline(params.highcut, blocks)
    nb, B = blocks.shape[-2], blocks.shape[-1]
    n = nb * B
    x = blocks.reshape(blocks.shape[:-2] + (n,))
    acc = jnp.zeros_like(x) if params.wet else x
    # y = x + sum_k ramp[k] * shift(x, time*(k+1)): pure shifted adds.
    for k in range(params.feedback_loops):
        d = params.time_in_samples * (k + 1)
        if d >= n:
            continue
        shifted = jnp.pad(x[..., : n - d], [(0, 0)] * (x.ndim - 1) + [(d, 0)])
        acc = acc + shifted * params.ramp[k]
    return acc.reshape(blocks.shape).astype(jnp.float32)
