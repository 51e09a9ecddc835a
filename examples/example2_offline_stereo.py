"""Offline stereo render — the reference's Example2.py, TPU-native.

The reference processes stereo as two per-channel device instances in an
interleaved Python loop (Example2.py:13-23). Here channels are just a leading
batch axis: the same chain renders (2, n) audio in one program.
"""

import numpy as np

import os as _os
import sys as _sys

# allow standalone `python examples/<name>.py` without installing:
# the repo root is the import path when run from a checkout
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from pyaudiodsptools_tpu import Chain, EngineConfig, ops, render
from pyaudiodsptools_tpu.core import wavio

cfg = EngineConfig(sample_rate=44100, block_size=4096)
chain = Chain([ops.lowcut(cfg, 800)])

audio, _ = wavio.read_wav("/root/reference/TestFile16BitStereo.wav")  # (2, n)
out = np.asarray(render(chain, audio, cfg))
wavio.write_wav("/tmp/output_stereo.wav", out, cfg.sample_rate)
print("wrote /tmp/output_stereo.wav", out.shape)
