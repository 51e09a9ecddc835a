"""Multi-chip sharded render — beyond the reference: 64 channels over a
('channel', 'time') mesh. Run with real chips, or simulate on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/example5_sharded_multichip.py
"""

import jax
import numpy as np

import os as _os
import sys as _sys

# allow standalone `python examples/<name>.py` without installing:
# the repo root is the import path when run from a checkout
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from pyaudiodsptools_tpu import Chain, EngineConfig, ops
from pyaudiodsptools_tpu.parallel import ShardedRenderer, make_mesh

cfg = EngineConfig(sample_rate=44100, block_size=4096)
chain = Chain([
    ops.lowcut(cfg, 120.0),
    ops.eq3band_fft(cfg, 250.0, 2.0, 1500.0, -1.5, 6000.0, 2.5),
    ops.compressor(cfg, -18.0, 0.6),
    ops.softclipper(cfg, 0.44),
])

n_dev = len(jax.devices())
time_ax = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh(channel=n_dev // time_ax, time=time_ax)
print("mesh:", dict(mesh.shape))

channels = 8 * mesh.shape["channel"]
rng = np.random.default_rng(0)
sig = (rng.standard_normal((channels, 44100 * 4)) * 0.3).astype(np.float32)

renderer = ShardedRenderer(chain, cfg, mesh)
out = np.asarray(renderer.render(sig))
print("rendered", out.shape, "peak", float(np.abs(out).max()))
