"""Accelerator offline render — the reference's Example4.py, TPU-native.

The reference's GPU path duplicates its FFT filters into CuPy clones and
copies chunks to the device by hand (Example4.py:5-24) with a large 88200
chunk to amortize dispatch. Under JAX the SAME ops run on whatever backend is
active (TPU here); device placement and batching are automatic, and the whole
multi-channel render is one compiled program.
"""

import jax
import numpy as np

import os as _os
import sys as _sys

# allow standalone `python examples/<name>.py` without installing:
# the repo root is the import path when run from a checkout
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from pyaudiodsptools_tpu import Chain, EngineConfig, ops, render
from pyaudiodsptools_tpu.core import wavio

print("running on:", jax.devices()[0])

cfg = EngineConfig(sample_rate=44100, block_size=88200)
chain = Chain([ops.lowcut(cfg, 800)])

audio, _ = wavio.read_wav("/root/reference/TestFile16BitMono.wav")
out = np.asarray(render(chain, audio, cfg))
wavio.write_wav("/tmp/output_accel.wav", out, cfg.sample_rate)
print("wrote /tmp/output_accel.wav", out.shape)
