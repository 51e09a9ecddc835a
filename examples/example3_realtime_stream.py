"""Realtime streaming — the reference's Example3.py, TPU-native.

The reference runs a PyAudio duplex stream with the effect in the C callback
(Example3.py:20-25) and polls CPU load. Here the native ring-buffer runtime
pumps fixed blocks through the precompiled TPU chain step; a synthetic
producer stands in for the sound card (no audio hardware in this container),
and deadline stats replace stream.get_cpu_load().
"""

import time

import numpy as np

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.core import generators
from pyaudiodsptools_tpu.runtime import RealtimeEngine

cfg = EngineConfig(sample_rate=44100, block_size=512)
chain = Chain([ops.lowcut(cfg, 160), ops.compressor(cfg, -20.0, 0.5)])

engine = RealtimeEngine(chain, cfg)
engine.start()

sig = np.asarray(generators.sine(440.0, cfg.sample_rate * 2, cfg.sample_rate)) * 0.5
budget_ms = cfg.block_duration_ms
try:
    i = 0
    while i < sig.size:
        i += engine.push(sig[i : i + 2048])
        time.sleep(0.001)
    engine.drain()
    out = engine.pull(sig.size)
finally:
    engine.stop()

stats = engine.stats()
print(f"processed {stats['blocks']} blocks of {cfg.block_size} "
      f"(budget {budget_ms:.1f} ms/block)")
print(f"mean {stats['mean_ns']/1e6:.3f} ms, worst {stats['worst_ns']/1e6:.3f} ms, "
      f"xruns {stats['xruns']}")
