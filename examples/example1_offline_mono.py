"""Offline mono render — the reference's Example1.py, TPU-native.

Reference flow (Example1.py:1-23): initialize config, read wav, MakeChunks,
per-chunk LowCut(800).apply loop, CombineChunks, write wav. Here the whole
render is one jit-compiled program.
"""

import os as _os
import sys as _sys

# allow standalone `python examples/<name>.py` without installing:
# the repo root is the import path when run from a checkout
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from pyaudiodsptools_tpu import Chain, EngineConfig, ops, render_file

cfg = EngineConfig(sample_rate=44100, block_size=4096)
chain = Chain([ops.lowcut(cfg, 800)])

render_file(chain, "/root/reference/TestFile16BitMono.wav",
            "/tmp/output_mono.wav", cfg)
print("wrote /tmp/output_mono.wav")
