"""Reference-compatible device classes: ``Create<Name>(params).apply(chunk)``.

Each class wraps a functional op from :mod:`pyaudiodsptools_tpu.ops` with an
internal state pytree and a jit-compiled step, reproducing the reference's
stateful-object contract (numpy in, numpy out, identical chunk length) so a
``pyAudioDspTools`` user can switch imports and keep their chain loop.

Construction snapshots :mod:`..compat.config` like the reference snapshots its
global config (SURVEY.md §3.1). Jitted steps are cached per op, so creating
many devices does not recompile.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..ops.eq3band import eq_band
from . import config as _config


@lru_cache(maxsize=None)
def _jitted(step_fn):
    return jax.jit(step_fn)


class _Device:
    """Base wrapper: owns an Effect, its state, and a cached jitted step."""

    def __init__(self, effect):
        self._effect = effect
        self._state = effect.state()
        self._step = _jitted(effect.step)

    def apply(self, float_array_input):
        """Process one chunk, advancing internal state (reference contract:
        output has the exact same size as the input)."""
        self._state, out = self._step(
            self._effect.params, self._state, jnp.asarray(float_array_input)
        )
        return np.asarray(out)

    def reset(self):
        self._state = self._effect.state()


class CreateHighCutFilter(_Device):
    """EffectFFTFilter.py:5-75 parity (1 block latency)."""

    def __init__(self, cutoff_frequency=8000):
        super().__init__(ops.highcut(_config.current(), cutoff_frequency))


class CreateLowCutFilter(_Device):
    """EffectFFTFilter.py:78-151 parity (1 block latency)."""

    def __init__(self, cutoff_frequency=160):
        super().__init__(ops.lowcut(_config.current(), cutoff_frequency))


class CreateEQ3BandFFT(_Device):
    """EffectEQ3BandFFT.py parity (1 block latency)."""

    def __init__(self, lowshelf_frequency, lowshelf_db, midband_frequency,
                 midband_db, highshelf_frequency, highshelf_db):
        super().__init__(ops.eq3band_fft(
            _config.current(), lowshelf_frequency, lowshelf_db,
            midband_frequency, midband_db, highshelf_frequency, highshelf_db))


class CreateEQ3Band:
    """EffectEQ3Band.py parity: per-band apply methods, zero latency.

    The reference hard-codes Fs=44100 (EffectEQ3Band.py:33); these bands honor
    the configured sampling rate (identical at 44100).
    """

    def __init__(self, low_shelf_frequency, low_shelf_gain, mid_frequency,
                 mid_gain, high_shelf_frequency, high_shelf_gain):
        cfg = _config.current()
        self._low = _Device(eq_band(cfg, "low", low_shelf_frequency,
                                                low_shelf_gain))
        self._mid = _Device(eq_band(cfg, "mid", mid_frequency,
                                                mid_gain))
        self._high = _Device(eq_band(cfg, "high",
                                                 high_shelf_frequency,
                                                 high_shelf_gain))

    def applylowband(self, float_array_input):
        return self._low.apply(float_array_input)

    def applymidband(self, float_array_input):
        return self._mid.apply(float_array_input)

    def applyhighband(self, float_array_input):
        return self._high.apply(float_array_input)


class CreateCompressor(_Device):
    """EffectCompressor.py parity (zero latency)."""

    def __init__(self, threshold_in_db=-15, ratio=0.60, attack_in_ms=3.1,
                 release_in_ms=30.1):
        super().__init__(ops.compressor(_config.current(), threshold_in_db,
                                        ratio, attack_in_ms, release_in_ms))


class CreateGate(_Device):
    """EffectGate.py parity (zero latency). Envelope lengths honor the
    configured sampling rate (the reference hard-codes 44100,
    EffectGate.py:29,32)."""

    def __init__(self, threshold_in_db=-5, depth=0.1, attack=3.1, release=200.1):
        super().__init__(ops.gate(_config.current(), threshold_in_db, depth,
                                  attack, release))


class CreateDelay(_Device):
    """EffectDelay.py parity (zero latency). Unlike the reference, the
    lowcut/highcut filter options actually work (the reference calls
    nonexistent methods and crashes, EffectDelay.py:56-58 — SURVEY.md §7)."""

    def __init__(self, time_in_ms=500, feedback_loops=2,
                 lowcut_filter_frequency=40, highcut_filter_frequency=12000,
                 use_lowcut_filter=False, use_highcut_filter=False, wet=False):
        super().__init__(ops.delay(
            _config.current(), time_in_ms, feedback_loops,
            lowcut_filter_frequency, highcut_filter_frequency,
            use_lowcut_filter, use_highcut_filter, wet))


class CreateTremolo(_Device):
    """EffectTremolo.py parity (zero latency), including .reset()."""

    def __init__(self, tremolo_depth=0.4, lfo_in_hertz=4.5):
        super().__init__(ops.tremolo(_config.current(), tremolo_depth,
                                     lfo_in_hertz))


class CreateSaturator(_Device):
    """EffectSaturator.py parity (stateless)."""

    def __init__(self, saturation_threshold_in_db=-20.0, makeup_gain=2.0,
                 mode="hard"):
        super().__init__(ops.saturator(_config.current(),
                                       saturation_threshold_in_db,
                                       makeup_gain, mode))


class CreateSoftClipper(_Device):
    """EffectSoftClipper.py parity (stateless)."""

    def __init__(self, drive=0.44):
        super().__init__(ops.softclipper(_config.current(), drive))


class CreateHardDistortion(_Device):
    """EffectHardDistortion.py parity (stateless)."""

    def __init__(self):
        super().__init__(ops.harddistortion(_config.current()))


class CreateBitCrusher(_Device):
    """_EffectBitCrusher.py parity — unexported WIP in the reference, shipped
    first-class here (SURVEY.md §7)."""

    def __init__(self):
        super().__init__(ops.bitcrusher(_config.current()))


class CreateReverb(_Device):
    """_EffectReverb.py parity — unexported WIP in the reference, shipped
    first-class here. ``applyreverb`` is the reference's method name."""

    def __init__(self, time_in_ms=1500):
        super().__init__(ops.reverb(_config.current(), time_in_ms))

    def applyreverb(self, float32_array_input):
        return self.apply(float32_array_input)


# Accelerator-variant aliases. The reference duplicates its FFT effects into
# hand-written CuPy clones (EffectFFTFilterGPU.py, EffectEQ3BandFFTGPU.py,
# SURVEY.md §2.3); under JAX the same op runs on whatever backend is active,
# so the *GPU names are aliases kept for drop-in compatibility.
CreateHighCutFilterGPU = CreateHighCutFilter
CreateLowCutFilterGPU = CreateLowCutFilter
CreateEQ3BandFFTGPU = CreateEQ3BandFFT
