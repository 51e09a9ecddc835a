"""A/B the conv kernel's speed tiers on the chip, in ONE process.

Round-3 built two accelerators and shipped both off pending on-chip data:
the radix-2 DIF outer split (kernels/pallas_conv.use_radix2, env
PADT_CONV_RADIX2) and the Karatsuba 'fast' precision tier
(PADT_FFT_PRECISION). This harness times the full 8-effect chain (the
bench.py headline config) under all {radix2} x {precision} combinations in
a single process — in-process toggling via os.environ +
pallas_conv.set_precision_tier keeps the single-client TPU tunnel to one
process — and prints one JSON object with every cell, so the shipped
defaults trace to a committed artifact (BENCH_AB_r{N}.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SAMPLE_RATE = 44100
BLOCK_SIZE = 4096
CHANNELS = 64
SECONDS = 30.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyaudiodsptools_tpu import EngineConfig
    from pyaudiodsptools_tpu.kernels import pallas_conv
    from __graft_entry__ import _chain8

    cfg = EngineConfig(sample_rate=SAMPLE_RATE, block_size=BLOCK_SIZE)
    n = int(SECONDS * SAMPLE_RATE)
    nb = -(-n // BLOCK_SIZE)

    @jax.jit
    def gen(key):
        noise = 0.25 * jax.random.normal(key, (CHANNELS, nb * BLOCK_SIZE),
                                         dtype=jnp.float32)
        t = jnp.arange(nb * BLOCK_SIZE, dtype=jnp.float32)
        burst = (jnp.sin(2 * jnp.pi * t / (SAMPLE_RATE // 3)) > 0.6).astype(
            jnp.float32) * 0.5 + 0.3
        sig = jnp.clip(noise * burst, -0.99, 0.99)
        return sig.reshape(CHANNELS, nb, BLOCK_SIZE)

    blocks = gen(jax.random.key(0))
    blocks.block_until_ready()
    total_samples = CHANNELS * nb * BLOCK_SIZE
    checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    eps = jnp.float32(1e-6)
    N = 4

    def time_config(radix2: str, tier: str) -> dict:
        os.environ["PADT_CONV_RADIX2"] = radix2
        pallas_conv.set_precision_tier(tier)
        # fresh chain -> fresh jit caches; tier/radix2 are trace-time choices
        chain = _chain8(cfg, fast_dynamics=jax.default_backend() != "cpu")
        fn = jax.jit(lambda b, o, e: chain.render_blocks(b + e * o))
        out = fn(blocks, blocks, eps)
        peak = float(checksum(out))
        assert np.isfinite(peak) and peak > 0, f"bad output (peak={peak})"
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = out
            for _ in range(N):
                o = fn(blocks, o, eps)
            assert np.isfinite(float(checksum(o)))
            runs.append((time.perf_counter() - t0) / N)
        dt = min(runs)
        return {"radix2": radix2, "tier": tier,
                "samples_per_s": round(total_samples / dt, 1),
                "wall_s": round(dt, 4)}

    if "--tail" in sys.argv:
        # Round-5 A/B: the softclipper pow inside the fused tail
        # (PADT_TAIL_FAST_POW: generic jnp pow vs ws._pow01_fast) on the
        # STANDALONE tail stage at the flagship size, plus the full chain
        # under each. SNR of fast vs generic is reported so the win is
        # traceable next to its accuracy cost (also pinned >100 dB vs the
        # reference in tests/test_ops_parity.py).
        from pyaudiodsptools_tpu import ops
        from pyaudiodsptools_tpu.kernels.tail_pallas import fused_tail

        tail_effs = [ops.delay(cfg, 150.0, 2), ops.tremolo(cfg, 0.3, 5.0),
                     ops.softclipper(cfg, 0.44)]
        res = {}
        outs = {}
        for mode in ("0", "1"):
            os.environ["PADT_TAIL_FAST_POW"] = mode
            tail = fused_tail(tail_effs)
            fn = jax.jit(lambda b, o, e, _t=tail: _t.offline(
                _t.params, b + e * o))
            out = fn(blocks, blocks, eps)
            out.block_until_ready()
            outs[mode] = np.asarray(out[:, :4, :])  # 4 MB probe slice
            tiny = jax.jit(lambda o: jnp.max(jnp.abs(o[..., :1, :8])))
            float(tiny(out))
            rtt = min((lambda t0: (float(tiny(out)),
                                   time.perf_counter() - t0)[1])(
                time.perf_counter()) for _ in range(5))
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = out
                for _ in range(8):
                    o = fn(blocks, o, eps)
                assert np.isfinite(float(checksum(o)))
                el = time.perf_counter() - t0
                runs.append(max(el - rtt, el / 2) / 8)
            res[f"tail_standalone_fast{mode}_ms"] = round(min(runs) * 1e3, 3)
            cell = time_config("1", "high")
            res[f"chain_fast{mode}_samples_per_s"] = cell["samples_per_s"]
        err = outs["0"] - outs["1"]
        p = float(np.sum(outs["0"].astype(np.float64) ** 2))
        snr = 10 * np.log10(p / max(float(np.sum(err.astype(
            np.float64) ** 2)), 1e-30))
        res["fast_vs_generic_snr_db"] = round(snr, 1)
        print(json.dumps({
            "metric": "tail fast-pow A/B, 64 channels, 1 chip",
            "device": str(jax.devices()[0]),
            "channels": CHANNELS, "block_size": BLOCK_SIZE,
            "seconds": SECONDS, **res,
        }))
        return

    cells = []
    for radix2 in ("0", "1"):
        for tier in ("high", "fast", "highest"):
            cell = time_config(radix2, tier)
            cells.append(cell)
            print(f"# radix2={radix2} tier={tier}: "
                  f"{cell['samples_per_s'] / 1e9:.3f} Gsamples/s",
                  file=sys.stderr)

    best = max(cells, key=lambda c: c["samples_per_s"])
    print(json.dumps({
        "metric": "8-effect chain A/B, 64 channels, 1 chip",
        "device": str(jax.devices()[0]),
        "channels": CHANNELS, "block_size": BLOCK_SIZE, "seconds": SECONDS,
        "cells": cells, "best": best,
    }))


if __name__ == "__main__":
    main()
