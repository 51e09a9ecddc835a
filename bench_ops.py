"""Per-op timing harness — the reference's ModuleTests.py timing pattern,
TPU-native: every effect timed over 60 s of generated audio, reporting
ms/block and realtime factor (the reference prints the same numbers per
device, ModuleTests.py:96-214).

Usage:  python bench_ops.py [--channels C] [--seconds S] [--block B]
Runs on whatever JAX platform is active (TPU under the driver; set
JAX_PLATFORMS=cpu to compare against the reference's CPU numbers).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import os
    if os.environ.get("PADT_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PADT_BENCH_PLATFORM"])

    from pyaudiodsptools_tpu import EngineConfig, ops

    cfg = EngineConfig(sample_rate=44100, block_size=args.block)
    n = int(args.seconds * cfg.sample_rate)
    nb = -(-n // cfg.block_size)
    lead = (args.channels,) if args.channels > 1 else ()
    # generate on device (the tunneled dev TPU cannot stream large host buffers)
    key = jax.random.key(0)
    blocks = jax.jit(lambda k: jnp.clip(
        0.3 * jax.random.normal(k, lead + (nb, cfg.block_size), jnp.float32),
        -0.99, 0.99))(key)
    blocks.block_until_ready()
    total = blocks.size

    effects = {
        "saturator": ops.saturator(cfg),
        "compressor": ops.compressor(cfg),
        "delay": ops.delay(cfg, 500, 2),
        "tremolo": ops.tremolo(cfg),
        "harddistortion": ops.harddistortion(cfg),
        "gate": ops.gate(cfg),
        "lowcut": ops.lowcut(cfg, 160),
        "highcut": ops.highcut(cfg, 8000),
        "eq3band_fft": ops.eq3band_fft(cfg, 200, 3.0, 1000, -2.0, 8000, 2.0),
        "eq3band_biquad": ops.eq3band(cfg, 200, 3.0, 1000, -2.0, 8000, 2.0),
        "softclipper": ops.softclipper(cfg),
        "bitcrusher": ops.bitcrusher(cfg),
        "reverb": ops.reverb(cfg, 1500),
    }
    if jax.default_backend() == "tpu":
        from pyaudiodsptools_tpu.kernels.dynamics_pallas import (
            fast_compressor, fast_gate)

        effects["compressor_pallas"] = fast_compressor(cfg)
        effects["gate_pallas"] = fast_gate(cfg)

    # Honest clock for the tunneled TPU backend: block_until_ready can
    # return before execution completes, so each timed run chains N passes
    # through a data dependency and fetches a checksum scalar inside the
    # timed region (bench.py uses the same discipline).
    results = {}
    budget_ms = cfg.block_duration_ms
    N = 4
    eps = jnp.float32(1e-6)
    for name, eff in effects.items():
        fn = jax.jit(lambda p, b, o, e, _f=eff.offline: _f(p, b + e * o))
        checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
        out = fn(eff.params, blocks, blocks, eps)
        assert np.isfinite(float(checksum(out)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = out
            for _ in range(N):
                o = fn(eff.params, blocks, o, eps)
            assert np.isfinite(float(checksum(o)))
            times.append((time.perf_counter() - t0) / N)
        dt = min(times)
        ms_per_block = 1000.0 * dt / nb
        total_samples = total
        rt = (total_samples / cfg.sample_rate) / dt
        results[name] = {
            "ms_per_block": round(ms_per_block, 5),
            "realtime_factor": round(rt, 1),
            "samples_per_s": round(total_samples / dt, 1),
        }
        if not args.json:
            print(f"{name:16s} {ms_per_block:10.5f} ms/block "
                  f"(budget {budget_ms:.2f})  {rt:12.1f}x realtime")

    if args.json:
        print(json.dumps({"device": str(jax.devices()[0]),
                          "channels": args.channels,
                          "block_size": args.block,
                          "results": results}))


if __name__ == "__main__":
    main()
