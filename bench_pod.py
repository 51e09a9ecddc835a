"""One-command pod benchmark: flagship chain over an N-chip mesh.

This environment has ONE tunneled TPU chip, so real pod *performance* cannot
be measured here — but the day a pod slice exists, this script is the whole
protocol (VERDICT r4 #6):

    python bench_pod.py                      # all visible devices
    python bench_pod.py --devices 4 --time 2 # 2x2 (channel, time) mesh
    python bench_pod.py --compiled-dynspec-probe
        # FIRST run this: executes the compiled (non-interpret) Pallas
        # dynamics stepper inside shard_map inside while_loop on a tiny
        # workload — the one composition CI can only cover in interpret
        # mode (parallel/dynspec.py) — before committing to the full bench.

It reports samples/s, efficiency vs the committed single-chip headline
(latest BENCH_r{N}.json at the repo root), and the MODELED scaling
prediction to check the measurement against (ICI halo + dynspec-carry bytes
vs compute time; see _predict_scaling). CI keeps the script from rotting by
running it on the 8-device virtual CPU mesh (tests/test_pod_bench.py) with
``--virtual 8 --seconds 0.75 --channels 8 --smoke``.

Baseline anchor: BASELINE.md:35's >=85%-efficiency-at-N>=2-hosts north star.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

SAMPLE_RATE = 44100


def _single_chip_headline() -> tuple[float, str] | tuple[None, None]:
    """samples/s from the newest committed driver capture (BENCH_r{N})."""
    here = os.path.dirname(os.path.abspath(__file__))
    caps = sorted(glob.glob(os.path.join(here, "BENCH_r[0-9]*.json")))
    if not caps:
        return None, None
    name = caps[-1]
    data = json.loads(open(name).read())
    data = data.get("parsed", data)
    return float(data["value"]), os.path.basename(name)


def _predict_scaling(n_dev: int, time_ax: int, channels: int, seconds: float,
                     block_size: int, single_chip_sps: float | None):
    """Modeled efficiency at N devices on a ('channel', 'time') mesh.

    Per render of C channels x S seconds (T = S*44100 samples):
      * compute: T*C / single_chip_sps, split N ways (the chain is
        embarrassingly parallel along channels; time-sharding adds the
        terms below).
      * FIR halo (parallel/mesh.py): each time boundary moves a fixed
        2-block halo per channel-shard row, once per fused FIR stage
        (1 stage after LTI fusion) -> bytes = (time-1) * C/ch_ax * 2*B * 4.
      * dynspec carries (parallel/dynspec.py): k fixpoint rounds (2-3 on
        real audio; 3 modeled) x 4 int32 state leaves per op x 2 ops x
        C/ch_ax bytes per boundary — O(channels), negligible by design.
      * per-round latency: each dynspec round is a ppermute + psum
        synchronization over the time axis (~5 us/hop modeled on ICI).
    ICI bandwidth modeled at 45 GB/s usable per link (v5e ring); DCN hops
    (multi-host channel axis) don't appear because the channel axis
    communicates nothing inside a render.
    """
    ch_ax = n_dev // time_ax
    T = seconds * SAMPLE_RATE
    if single_chip_sps is None:
        single_chip_sps = 3.59e9  # committed r4 headline as fallback
    compute_s = T * channels / single_chip_sps / n_dev
    ici_bw = 45e9
    halo_bytes = (time_ax - 1) * (channels / ch_ax) * 2 * block_size * 4
    dyn_rounds = 3
    dyn_bytes = dyn_rounds * (time_ax - 1) * (channels / ch_ax) * 4 * 4 * 2
    latency_s = dyn_rounds * (time_ax - 1) * 5e-6
    comm_s = (halo_bytes + dyn_bytes) / ici_bw + latency_s
    total = compute_s + comm_s
    return {
        "n_devices": n_dev,
        "mesh": f"{ch_ax}x{time_ax}",
        "predicted_samples_per_s": round(T * channels / total, 1),
        "predicted_efficiency_vs_linear": round(compute_s / total, 4),
        "modeled_comm_ms": round(comm_s * 1e3, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="devices to use (0 = all visible)")
    ap.add_argument("--time", type=int, default=0,
                    help="time-axis size (0 = 2 if even device count else 1)")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--block-size", type=int, default=4096)
    ap.add_argument("--passes", type=int, default=16)
    ap.add_argument("--virtual", type=int, default=0, metavar="N",
                    help="provision N virtual CPU devices (CI smoke)")
    ap.add_argument("--smoke", action="store_true",
                    help="single untimed pass; correctness/compile only")
    ap.add_argument("--compiled-dynspec-probe", action="store_true",
                    help="run the compiled Pallas dynspec stepper on a tiny "
                         "sharded workload first (see parallel/dynspec.py)")
    args = ap.parse_args()

    import jax

    if args.virtual:
        # must precede any backend touch; sitecustomize pre-registers the
        # TPU plugin so env vars alone cannot switch platforms here
        jax.config.update("jax_num_cpu_devices", args.virtual)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pyaudiodsptools_tpu import EngineConfig
    from pyaudiodsptools_tpu.parallel import ShardedRenderer, make_mesh
    from __graft_entry__ import _chain8

    devices = jax.devices()
    n_dev = args.devices or len(devices)
    devices = devices[:n_dev]
    time_ax = args.time or (2 if n_dev % 2 == 0 and n_dev >= 2 else 1)
    mesh = make_mesh(channel=n_dev // time_ax, time=time_ax,
                     devices=devices)

    cfg = EngineConfig(sample_rate=SAMPLE_RATE, block_size=args.block_size)
    on_tpu = jax.default_backend() == "tpu"

    if args.compiled_dynspec_probe:
        from pyaudiodsptools_tpu.parallel.dynspec import (
            dynamics_offline_time_sharded)
        from pyaudiodsptools_tpu.ops import compressor, gate

        params = (compressor(cfg, -18.0, 0.6).params,
                  gate(cfg, -45.0, 0.1).params)
        C = 8 * mesh.shape["channel"]
        nb = 2 * mesh.shape["time"]
        rng = np.random.default_rng(1)
        small = jnp.asarray((rng.standard_normal(
            (C, nb, args.block_size)) * 0.4).astype(np.float32))
        probe = jax.jit(lambda p, b: dynamics_offline_time_sharded(
            p, b, mesh))(params, small)
        probe.block_until_ready()
        assert bool(jnp.all(jnp.isfinite(probe)))
        print(json.dumps({"dynspec_probe": "ok",
                          "compiled": bool(on_tpu),
                          "mesh": dict(mesh.shape)}))

    chain = _chain8(cfg, fast_dynamics=on_tpu)
    renderer = ShardedRenderer(chain, cfg, mesh)

    nb = -(-int(args.seconds * SAMPLE_RATE) // args.block_size)
    nb = -(-nb // time_ax) * time_ax
    C = -(-args.channels // mesh.shape["channel"]) * mesh.shape["channel"]

    @jax.jit
    def gen(key):
        noise = 0.25 * jax.random.normal(
            key, (C, nb * args.block_size), dtype=jnp.float32)
        t = jnp.arange(nb * args.block_size, dtype=jnp.float32)
        burst = (jnp.sin(2 * jnp.pi * t / (SAMPLE_RATE // 3)) > 0.6).astype(
            jnp.float32) * 0.5 + 0.3
        return jnp.clip(noise * burst, -0.99, 0.99).reshape(
            C, nb, args.block_size)

    blocks = gen(jax.random.key(0))
    blocks.block_until_ready()
    total_samples = C * nb * args.block_size

    out = renderer.render_blocks(blocks)
    out.block_until_ready()
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite pod render"

    single_sps, single_art = _single_chip_headline()
    prediction = [_predict_scaling(n, min(time_ax, n), C, args.seconds,
                                   args.block_size, single_sps)
                  for n in (1, 2, 4, 8) if n <= max(8, n_dev)]

    result = {
        "metric": "8-effect chain throughput, pod mesh",
        "unit": "samples/s",
        "mesh": dict(mesh.shape),
        "devices": n_dev,
        "platform": jax.default_backend(),
        "channels": C,
        "seconds": args.seconds,
        "block_size": args.block_size,
        "single_chip_artifact": single_art,
        "predicted": prediction,
    }

    if args.smoke:
        result["smoke"] = "ok (untimed; virtual mesh measures nothing)"
        print(json.dumps(result))
        return 0

    # timing discipline: chained dependent passes + checksum readback
    # (see bench.py for the tunneled-backend rationale)
    checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    renb = jax.jit(lambda b, o, eps: renderer._fn(
        renderer.chain.params, b + eps * o))
    eps = jnp.float32(1e-6)
    o = renb(blocks, out, eps)
    float(checksum(o))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        oo = o
        for _ in range(args.passes):
            oo = renb(blocks, oo, eps)
        assert np.isfinite(float(checksum(oo)))
        runs.append((time.perf_counter() - t0) / args.passes)
    dt = min(runs)
    sps = total_samples / dt
    result["value"] = round(sps, 1)
    result["wall_s"] = round(dt, 4)
    if single_sps:
        result["efficiency_vs_single_chip_linear"] = round(
            sps / (single_sps * n_dev), 4)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
