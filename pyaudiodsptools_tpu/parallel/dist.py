"""Multi-host distributed runtime (SURVEY.md §2.4, §7 step 6).

The reference has no distributed layer at all; this module supplies the
TPU-native one: ``jax.distributed.initialize`` over the pod's coordination
service, a global ('channel', 'time') mesh spanning all hosts (channel groups
ride DCN across hosts, time halos ride ICI within a slice), and per-host
channel I/O helpers so each host only touches its own shard of the audio.

Single-host multi-chip works through the same path (initialize() is then a
no-op). Multi-host correctness is CI-tested via the virtual-device mesh
(tests/test_parallel.py) and the driver's dryrun_multichip entry; real pod
runs use exactly this module.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.config import EngineConfig
from ..engine.chain import Chain
from .sharding import ShardedRenderer


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join the JAX distributed runtime. With no arguments, uses the TPU
    pod's automatic bootstrap (metadata-provided coordinator)."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(time: int = 1) -> Mesh:
    """('channel', 'time') mesh over ALL devices in the job (every host's
    chips). Channel groups land on different hosts first, so cross-host
    traffic is the embarrassingly-parallel channel axis (DCN), while time
    halos stay within a host's chips (ICI)."""
    devices = jax.devices()
    n = len(devices)
    if n % time:
        raise ValueError(f"{n} devices not divisible by time={time}")
    arr = np.asarray(devices).reshape(n // time, time)
    return Mesh(arr, axis_names=("channel", "time"))


def host_channel_slice(total_channels: int) -> slice:
    """The channel range this host is responsible for feeding/draining."""
    pid, np_ = jax.process_index(), jax.process_count()
    if total_channels % np_:
        raise ValueError(f"{total_channels} channels not divisible by "
                         f"{np_} hosts")
    per = total_channels // np_
    return slice(pid * per, (pid + 1) * per)


def distributed_renderer(chain: Chain, cfg: EngineConfig,
                         time: int = 1) -> ShardedRenderer:
    """A ShardedRenderer over the global multi-host mesh."""
    return ShardedRenderer(chain, cfg, global_mesh(time=time))
