"""Headline benchmark: full 8-effect chain, 64 channels, samples/s per chip.

Matches BASELINE.json's metric ("samples/s/chip through full 8-effect chain")
and config 4 (8-effect serial chain, 64 parallel channels). Baseline to beat:
the reference's measured single-core chain throughput, 0.28 Msamples/s
(BASELINE.md, measured by running the reference's own harness configs).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_S = 0.28e6  # reference 8-effect chain, 1 CPU core
SAMPLE_RATE = 44100
BLOCK_SIZE = 4096
CHANNELS = 64
SECONDS = 30.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    import os
    if os.environ.get("PADT_BENCH_PLATFORM"):
        # env JAX_PLATFORMS alone cannot switch: sitecustomize pre-imports jax
        jax.config.update("jax_platforms", os.environ["PADT_BENCH_PLATFORM"])

    from pyaudiodsptools_tpu import EngineConfig
    from __graft_entry__ import _chain8

    cfg = EngineConfig(sample_rate=SAMPLE_RATE, block_size=BLOCK_SIZE)
    # Pallas dynamics kernels on TPU; faithful scans elsewhere (the kernels
    # are parity-verified >100 dB against the scans in tests/test_kernels.py)
    chain = _chain8(cfg, fast_dynamics=jax.default_backend() != "cpu")

    # Generate the test signal ON DEVICE: production audio is device-resident
    # after a single load, and the tunneled dev TPU cannot stream hundreds of
    # MB host->device. Band-limited-ish noise with bursts exercises every
    # automaton mode of the dynamics ops.
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

    # Timing discipline for the tunneled TPU backend: block_until_ready can
    # return before execution completes there, so the only honest clock stop
    # is a host readback that DEPENDS on the result. Each timed run renders
    # N chained passes (pass i+1's input depends on pass i's output, so they
    # cannot overlap) and fetches a checksum scalar inside the timed region.
    # The readback costs a FIXED ~20-25 ms tunnel round-trip (measured:
    # N=1 -> 28.5 ms/pass, N=16 -> 3.8 ms/pass for a trivial op, identical
    # for host-side and in-graph fori_loop chaining — so it is sync latency,
    # not per-dispatch cost); N=32 amortizes it to ~0.8 ms and the estimated
    # RTT is reported alongside.
    checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    chain_fn = chain.render_blocks
    renb = jax.jit(lambda b, o, eps: chain_fn(b + eps * o))
    N = 32
    eps = jnp.float32(1e-6)  # nonzero: every pass computes on genuinely new data

    # compile + warmup (render and checksum programs)
    out = renb(blocks, blocks, eps)
    peak = float(checksum(out))
    assert np.isfinite(peak) and peak > 0, f"bad output (peak={peak})"

    # sync RTT estimate: readback of a tiny dependent scalar
    tiny = jax.jit(lambda o: jnp.max(jnp.abs(o[..., :1, :8])))
    float(tiny(out))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(out))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(N):
            o = renb(blocks, o, eps)
        assert np.isfinite(float(checksum(o)))
        runs.append((time.perf_counter() - t0) / N)
    dt = min(runs)

    samples_per_s = total_samples / dt
    result = {
        "metric": "8-effect chain throughput, 64 channels, 1 chip",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "seconds_of_audio": SECONDS,
            "channels": CHANNELS,
            "block_size": BLOCK_SIZE,
            "wall_s": round(dt, 4),
            "passes_per_timed_region": N,
            "sync_rtt_ms": round(rtt * 1e3, 2),
            "realtime_factor_per_chip": round(samples_per_s / SAMPLE_RATE, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
