"""Per-op timing harness — the reference's ModuleTests.py timing pattern,
TPU-native: every effect timed over generated audio, reporting ms/block,
realtime factor, and (with --roofline) the modeled HBM bytes / MXU flops /
VPU flops next to the measured time as a % of the device's rooflines, with
the binding resource named (pyaudiodsptools_tpu/roofline.py; SURVEY.md §5's
"cost model check vs roofline" mandate).

Usage:  python bench_ops.py [--channels C] [--seconds S] [--block B]
                            [--json] [--roofline] [--chain]
--chain additionally times the flagship 8-effect chain's three fused kernel
stages (segmented conv, dynamics cascade, fused tail) separately, so the
headline wall time decomposes into named, modeled pieces. Runs on whatever
JAX platform is active. The captured chip run is committed as
BENCH_OPS.json at the repo root (re-capture with the command in
docs/gen_roofline.py, which renders it to docs/roofline.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


_SYNC_RTT = [0.0]  # measured once in main(); subtracted from timed regions


def _timed(fn, args, checksum, n_chain=8, reps=3):
    """Honest tunneled-TPU clock: chain n data-dependent passes, fetch a
    checksum scalar inside the timed region, take the best of reps. The
    readback costs a FIXED ~20-25 ms tunnel sync round-trip (measured; see
    bench.py) — the measured RTT is subtracted from the region before
    dividing by the pass count, so per-pass numbers approximate device
    time rather than device time + RTT/n."""
    out = fn(*args)
    assert np.isfinite(float(checksum(out)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = out
        for _ in range(n_chain):
            o = fn(args[0], args[1], o, args[3])
        assert np.isfinite(float(checksum(o)))
        elapsed = time.perf_counter() - t0
        times.append(max(elapsed - _SYNC_RTT[0], elapsed / 2) / n_chain)
    return min(times)


def _measure_rtt(checksum_tiny, ref, reps=5):
    """Tunnel sync latency: readback of a tiny dependent scalar."""
    float(checksum_tiny(ref))
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(checksum_tiny(ref))
        rtts.append(time.perf_counter() - t0)
    return min(rtts)


def _calibrate(pk):
    """Achieved-peak calibration: a big HBM copy stream and a big bf16
    matmul, timed with the same RTT-corrected discipline. The roofline
    table's % columns use SPEC peaks; these rows show what this chip
    actually sustains, so 'x% of spec roof' can be read against the
    achievable ceiling."""
    import jax
    import jax.numpy as jnp

    copy = jax.jit(lambda a, s: a * s)  # read + write, no reuse
    x = jnp.ones((64, 2 * 1024 * 1024), jnp.float32)  # 512 MB
    x.block_until_ready()
    s0 = jnp.float32(1.000001)
    checksum = jax.jit(lambda o: jnp.max(o[..., :8]))
    o = copy(x, s0)
    float(checksum(o))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        o2 = o
        for _ in range(8):
            o2 = copy(o2, s0)
        float(checksum(o2))
        el = time.perf_counter() - t0
        times.append(max(el - _SYNC_RTT[0], el / 2) / 8)
    dt_copy = min(times)
    hbm = 2 * x.size * 4 / dt_copy  # bytes moved per pass / s

    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32
                                      ).astype(jnp.bfloat16))
    o = mm(a, a)
    float(checksum(o.astype(jnp.float32)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        o2 = o
        for _ in range(8):
            o2 = mm(o2, a)
        float(checksum(o2.astype(jnp.float32)))
        el = time.perf_counter() - t0
        times.append(max(el - _SYNC_RTT[0], el / 2) / 8)
    dt_mm = min(times)
    flops = 2 * m ** 3 / dt_mm

    # VPU: 64 dependent fused multiply-adds per element on a 64 MB array —
    # one fused elementwise kernel, compute-bound (16 MB/64fma >> HBM time)
    K = 64
    xv = jnp.full((16, 1024 * 1024), 1.0001, jnp.float32)
    xv.block_until_ready()

    @jax.jit
    def fmachain(v, a, b):
        for _ in range(K):
            v = v * a + b
        return v
    av, bv = jnp.float32(0.9999), jnp.float32(1e-7)
    o = fmachain(xv, av, bv)
    float(checksum(o))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        o2 = o
        for _ in range(8):
            o2 = fmachain(o2, av, bv)
        float(checksum(o2))
        el = time.perf_counter() - t0
        times.append(max(el - _SYNC_RTT[0], el / 2) / 8)
    vpu_flops = 2.0 * K * xv.size / min(times)
    return {
        "hbm_copy_gbps": round(hbm / 1e9, 1),
        "hbm_copy_pct_of_spec": round(100 * hbm / pk.hbm_bytes_per_s, 1),
        "mxu_bf16_tflops": round(flops / 1e12, 1),
        "mxu_pct_of_spec": round(100 * flops / pk.mxu_bf16_flops, 1),
        "vpu_fma_tflops": round(vpu_flops / 1e12, 2),
        "vpu_pct_of_spec": round(100 * vpu_flops / pk.vpu_f32_flops, 1),
        "sync_rtt_ms": round(_SYNC_RTT[0] * 1e3, 2),
    }


def _op_model(name, eff, C, T):
    """Attach the roofline cost model matching this op's execution path."""
    from pyaudiodsptools_tpu import roofline as rl

    p = eff.params
    conv = rl.conv_cost_from_params(C, T, p)
    if name in ("lowcut", "highcut", "eq3band_fft", "reverb",
                "eq3band_biquad") and conv is not None:
        return conv
    if name in ("compressor_pallas", "gate_pallas"):
        return rl.dynamics_cost(C, T, n_ops=1)
    if name in ("compressor", "gate"):
        # faithful scan: one read+write, ~22 dependent VPU ops/sample
        return rl.simple_cost(C, T, vpu_flops_per_sample=22.0)
    if name == "delay":
        taps = 1 + getattr(p, "feedback_loops", 1)
        return rl.simple_cost(C, T, read_passes=float(taps))
    return rl.simple_cost(C, T)


def _chain_stages(cfg, blocks, checksum, pk, eps):
    """Time each fused exec-effect of the flagship chain separately."""
    import jax

    from pyaudiodsptools_tpu import roofline as rl
    from pyaudiodsptools_tpu.ops.dynamics import DynamicsParams
    from __graft_entry__ import _chain8

    chain = _chain8(cfg, fast_dynamics=jax.default_backend() != "cpu")
    C = blocks.shape[0]
    T = blocks.shape[-2] * blocks.shape[-1]
    rows = {}
    for eff in chain.exec_effects:
        fn = jax.jit(lambda p, b, o, e, _f=eff.offline: _f(p, b + e * o))
        dt = _timed(fn, (eff.params, blocks, blocks, eps), checksum)
        p = eff.params
        if isinstance(p, tuple) and p and isinstance(p[0], DynamicsParams):
            cost = rl.dynamics_cost(C, T, n_ops=len(p))
        elif isinstance(p, DynamicsParams):
            cost = rl.dynamics_cost(C, T, n_ops=1)
        elif eff.name.startswith("tail:") or "tail" in eff.name:
            cost = rl.tail_cost(C, T)
        else:
            cost = rl.conv_cost_from_params(C, T, p) or rl.simple_cost(C, T)
        rows[eff.name] = {"ms": round(dt * 1e3, 3),
                          **rl.classify(dt, cost, pk)}
    # the whole fused chain for reference
    fn = jax.jit(lambda p, b, o, e: chain._jit_render(p, b + e * o))
    dt = _timed(fn, (chain.params, blocks, blocks, eps), checksum)
    rows["chain8_total"] = {"ms": round(dt * 1e3, 3)}

    # README quick-start chain [lowcut, compressor, softclipper]: its LONE
    # compressor is routed through the Pallas kernel by fuse_lti_runs
    # (round 5); before that routing this chain silently fell to the
    # ~23 Msamples/s lax.scan path (~500 ms/render at the flagship size).
    from pyaudiodsptools_tpu import Chain, ops as _ops

    qs = Chain([_ops.lowcut(cfg, 800.0), _ops.compressor(cfg, -18.0, 0.6),
                _ops.softclipper(cfg, 0.44)])
    fn = jax.jit(lambda p, b, o, e: qs._jit_render(p, b + e * o))
    dt = _timed(fn, (qs.params, blocks, blocks, eps), checksum)
    rows["chain_quickstart:lowcut+compressor+softclipper"] = {
        "ms": round(dt * 1e3, 3),
        "samples_per_s": round(C * T / dt, 1)}
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--roofline", action="store_true",
                    help="attach cost models + roofline %% per op")
    ap.add_argument("--chain", action="store_true",
                    help="also decompose the flagship chain's fused stages")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import os
    if os.environ.get("PADT_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PADT_BENCH_PLATFORM"])

    from pyaudiodsptools_tpu import EngineConfig, ops
    from pyaudiodsptools_tpu import roofline as rl

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
    C = args.channels
    T = nb * cfg.block_size
    pk = rl.peaks_for(jax.devices()[0].device_kind)

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

    results = {}
    budget_ms = cfg.block_duration_ms
    eps = jnp.float32(1e-6)
    checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    tiny = jax.jit(lambda o: jnp.max(jnp.abs(o[..., :1, :8])))
    _SYNC_RTT[0] = _measure_rtt(tiny, blocks)
    # Every timed region wraps the op in `b + eps*o` (the data-chaining
    # perturbation) - itself a signal-sized XLA pass. Its cost is measured
    # here and REPORTED (calibration.perturb_pass_ms) rather than
    # subtracted, so row values stay comparable with earlier rounds; true
    # op cost ~= row ms - perturb_pass_ms (per whole render).
    perturb = jax.jit(lambda p, b, o, e: b + e * o)
    perturb_dt = _timed(perturb, (None, blocks, blocks, eps), checksum)
    for name, eff in effects.items():
        fn = jax.jit(lambda p, b, o, e, _f=eff.offline: _f(p, b + e * o))
        dt = _timed(fn, (eff.params, blocks, blocks, eps), checksum)
        ms_per_block = 1000.0 * dt / nb
        rt = (total / cfg.sample_rate / max(C, 1)) / dt * max(C, 1)
        results[name] = {
            "ms_per_block": round(ms_per_block, 5),
            "realtime_factor": round((total / cfg.sample_rate) / dt, 1),
            "samples_per_s": round(total / dt, 1),
        }
        if args.roofline:
            results[name].update(
                rl.classify(dt, _op_model(name, eff, C, T), pk))
        if not args.json:
            extra = (f"  [{results[name].get('bound', '')}]"
                     if args.roofline else "")
            print(f"{name:18s} {ms_per_block:10.5f} ms/block "
                  f"(budget {budget_ms:.2f})  "
                  f"{results[name]['realtime_factor']:12.1f}x realtime{extra}")

    payload = {"device": str(jax.devices()[0]),
               "device_kind": jax.devices()[0].device_kind,
               "channels": args.channels,
               "block_size": args.block,
               "seconds": args.seconds,
               "results": results}
    if args.roofline:
        payload["peaks"] = {"mxu_bf16_flops": pk.mxu_bf16_flops,
                            "hbm_bytes_per_s": pk.hbm_bytes_per_s,
                            "vpu_f32_flops": pk.vpu_f32_flops}
        payload["calibration"] = _calibrate(pk)
        payload["calibration"]["perturb_pass_ms"] = round(
            perturb_dt * 1e3, 3)
    if args.chain:
        chain_cfg = EngineConfig(sample_rate=44100, block_size=4096)
        nbc = -(-int(30.0 * 44100) // 4096)
        cblocks = jax.jit(lambda k: jnp.clip(
            0.3 * jax.random.normal(k, (64, nbc, 4096), jnp.float32),
            -0.99, 0.99))(key)
        cblocks.block_until_ready()
        payload["chain_stages"] = _chain_stages(chain_cfg, cblocks, checksum,
                                                pk, eps)
        if not args.json:
            for k, v in payload["chain_stages"].items():
                print(f"chain[{k}]: {v}")

    if args.json:
        print(json.dumps(payload))


if __name__ == "__main__":
    main()
