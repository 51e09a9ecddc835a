"""Dynamics offline-kernel A/B harness (the BENCH_DYN_r{N} capture).

Times the speculative segment-parallel cascade (compressor+gate, the
flagship chain's dynamics stage) standalone at the flagship size, across:
  * loop strategy (PADT_DYN_LOOP): hybrid (default) / write / states
  * walk unroll (PADT_DYN_UNROLL)
  * optionally a segments sweep (--segments)

All strategies are bit-equal (asserted here on chip and in
tests/test_fusion.py in interpret mode); the A/B is pure cost. Timing uses
the chained-pass + checksum-readback discipline with the measured sync RTT
subtracted (see bench.py / bench_ops.py).

Usage: python bench_dyn.py [--channels 64] [--seconds 30] [--json out.json]
                           [--segments] [--unrolls 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SAMPLE_RATE = 44100


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--json", default="")
    ap.add_argument("--parts", action="store_true",
                    help="decompose: transposes / single-sweep walls")
    ap.add_argument("--tiles", action="store_true",
                    help="sweep the time-tile size at the best config")
    ap.add_argument("--segments", action="store_true",
                    help="also sweep the segment count at the best config")
    ap.add_argument("--unrolls", default="1,2,4")
    ap.add_argument("--passes", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu.kernels import dynamics_pallas as dp

    cfg = EngineConfig(sample_rate=SAMPLE_RATE, block_size=4096)
    comp = ops.compressor(cfg, -18.0, 0.6, 3.1, 30.1)
    gate = ops.gate(cfg, -45.0, 0.1, 3.1, 200.1)
    params = [comp.params, gate.params]

    T = int(args.seconds * SAMPLE_RATE)
    C = args.channels

    @jax.jit
    def gen(key):
        noise = 0.25 * jax.random.normal(key, (C, T), dtype=jnp.float32)
        t = jnp.arange(T, dtype=jnp.float32)
        burst = (jnp.sin(2 * jnp.pi * t / (SAMPLE_RATE // 3)) > 0.6).astype(
            jnp.float32) * 0.5 + 0.3
        return jnp.clip(noise * burst, -0.99, 0.99)

    x = gen(jax.random.key(0))
    x.block_until_ready()

    checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    tiny = jax.jit(lambda o: jnp.max(jnp.abs(o[..., :8])))

    def rtt_of(o):
        float(tiny(o))
        vals = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(o))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    def timed(fn, ref=None):
        """ms per pass, RTT-corrected; returns (ms, output)."""
        f = jax.jit(lambda a, o, e: fn(a + e * o))
        eps = jnp.float32(1e-6)
        out = f(x, x, eps)
        out.block_until_ready()
        if ref is not None:
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
        rtt = rtt_of(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = out
            for _ in range(args.passes):
                o = f(x, o, eps)
            assert np.isfinite(float(checksum(o)))
            el = time.perf_counter() - t0
            times.append(max(el - rtt, el / 2) / args.passes)
        return round(min(times) * 1e3, 3), out

    def run(loop, unroll, segments=None, t_tile=None):
        os.environ["PADT_DYN_LOOP"] = loop
        os.environ["PADT_DYN_UNROLL"] = str(unroll)
        return timed(lambda a: dp.dynamics_pallas_offline(
            params, a, segments=segments, t_tile=t_tile))

    if args.parts:
        # Decompose the call: layout transposes alone, one audio sweep
        # alone, one states-only sweep alone — pinning where the wall goes
        # (the A/B grid cannot separate XLA-serial transposes from the
        # issue-bound walk).
        from functools import partial as _partial

        import pyaudiodsptools_tpu.kernels.dynamics_pallas as _dp

        n_ops = len(params)
        G = max(1, min(8192 // C, T // 2048))
        parts = {}

        def in_layout(a):
            L = -(-T // G)
            Tp = G * L
            R = C * G
            Rp = -(-R // (8 * 128)) * (8 * 128)
            xp = jnp.pad(a, ((0, 0), (0, Tp - T)))
            xk = jnp.moveaxis(xp.reshape(C, G, L), 2, 0).reshape(L, R)
            return jnp.pad(xk, ((0, 0), (0, Rp - R))).reshape(L * 8, Rp // 8)

        def out_layout(o):
            L = o.shape[0] // 8
            K = o.shape[1]
            R = C * G
            ol = o.reshape(L, K * 8)[:, :R].reshape(L, C, G)
            return jnp.moveaxis(ol, 0, 2).reshape(C, G * L)[:, :T]

        def timed_scalar_chain(f, arg0):
            """Time f(arg, scalar) chained through a dependent scalar (for
            fns whose output shape differs from the input)."""
            fj = jax.jit(f)
            o0 = fj(arg0, jnp.float32(1.0))
            o0.block_until_ready()
            rtt = rtt_of(o0)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                oo = jnp.float32(1.0)
                for _ in range(args.passes):
                    oo = jnp.max(jnp.abs(fj(arg0, oo))) * 0 + 1.0
                float(oo)
                el = time.perf_counter() - t0
                runs.append(max(el - rtt, el / 2) / args.passes)
            return round(min(runs) * 1e3, 3), o0

        from pyaudiodsptools_tpu.kernels import relayout as rlk

        unit = 128 if C % 8 == 0 and 128 % C == 0 else 64
        L = -(-max(unit, -(-T // G)) // unit) * unit
        Gr = -(-T // L)
        K = (-(-C * Gr // 1024) * 1024) // 8
        ms, xk0 = timed_scalar_chain(
            lambda a, s: rlk.time_major_pack(a * s, Gr, L, K), x)
        parts["pack_kernel_ms"] = ms
        ms, _ = timed_scalar_chain(
            lambda o, s: rlk.time_major_unpack(o * s, C, T, Gr, L), xk0)
        parts["unpack_kernel_ms"] = ms
        ms, _ = timed_scalar_chain(lambda a, s: in_layout(a * s), x)
        parts["xla_pack_ms_biased"] = ms  # legacy XLA path, upper bound
        print("parts so far", parts)

        # exactly-one-sweep walls via the debug sweep cap (output wrong,
        # timing meaningful): write@cap1 = transposes + 1 full sweep;
        # hybrid@cap1 = transposes + 1 state + 1 full sweep
        os.environ["PADT_DYN_MAX_SWEEPS"] = "1"
        for loop in ("write", "hybrid"):
            os.environ["PADT_DYN_LOOP"] = loop
            ms1, _ = timed(lambda a: dp.dynamics_pallas_offline(params, a))
            parts[f"{loop}_capped_1sweep_ms"] = ms1
        del os.environ["PADT_DYN_MAX_SWEEPS"]
        print(json.dumps(parts))
        results_parts = parts
    else:
        results_parts = None

    results = {"what": ("dynamics cascade (compressor+gate) offline kernel "
                        f"A/Bs, {C}ch x {args.seconds:g}s, RTT-corrected"),
               "loop_unroll_ms": {}, "bit_equal": True}
    if results_parts:
        results["parts"] = results_parts
    ref = None
    best = (None, 1e9)
    for loop in ("hybrid", "write", "states"):
        for unroll in [int(u) for u in args.unrolls.split(",")]:
            ms, out = run(loop, unroll)
            if ref is None:
                ref = out
            else:
                eq = bool(jnp.all(ref == out))
                results["bit_equal"] = results["bit_equal"] and eq
            key = f"{loop}/u{unroll}"
            results["loop_unroll_ms"][key] = ms
            if ms < best[1]:
                best = (key, ms)
            print(key, ms, "ms")
    results["best"] = {"config": best[0], "ms": best[1]}

    if args.tiles:
        loop, u = best[0].split("/u")
        tile_ms = {}
        for tt in (64, 128, 256):
            ms, _ = run(loop, int(u), t_tile=tt)
            tile_ms[str(tt)] = ms
            print(f"t_tile={tt}", ms, "ms")
        results["t_tile_sweep_ms"] = tile_ms

    if args.segments:
        loop, u = best[0].split("/u")
        seg_ms = {}
        for g in (64, 96, 128, 192, 256):
            ms, _ = run(loop, int(u), segments=g)
            seg_ms[str(g)] = ms
            print(f"segments={g}", ms, "ms")
        results["segments_sweep_ms"] = seg_ms

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
