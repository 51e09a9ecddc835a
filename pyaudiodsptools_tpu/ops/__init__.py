"""Effect-op library: pure `(params, state, block) -> (state, block)` kernels.

One op per reference effect (SURVEY.md §2.2 #8-20), including the reference's
unexported WIP Reverb and BitCrusher, shipped first-class.
"""

from .base import Effect, pytree_dataclass
from .fft_filter import highcut, lowcut
from .eq3band_fft import eq3band_fft
from .eq3band import eq3band
from .dynamics import compressor, gate
from .delay import delay
from .tremolo import tremolo
from .reverb import reverb
from .waveshapers import saturator, softclipper, harddistortion, bitcrusher

__all__ = [
    "Effect", "pytree_dataclass",
    "highcut", "lowcut", "eq3band_fft", "eq3band", "compressor", "gate",
    "delay", "tremolo", "reverb", "saturator", "softclipper",
    "harddistortion", "bitcrusher",
]
