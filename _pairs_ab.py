import time, json
import numpy as np
import jax, jax.numpy as jnp
from pyaudiodsptools_tpu import EngineConfig
from pyaudiodsptools_tpu.kernels.pallas_conv import segmented_conv_fused
from pyaudiodsptools_tpu.ops.fft_filter import pack_spectrum

B, halo, seg = 4096, 2, 6
n = (halo + seg) * B
rng = np.random.default_rng(0)
C, nb = 64, 323
x = jnp.asarray(rng.standard_normal((C, nb * B)).astype(np.float32) * 0.3)
x.block_until_ready()
k = rng.standard_normal(6000) * 0.1
spec = pack_spectrum(np.fft.rfft(np.concatenate([k, np.zeros(n - 6000)])))
shift, slack = 2047, halo * B - 5999

checksum = jax.jit(lambda o: jnp.max(jnp.abs(o)))
tiny = jax.jit(lambda o: jnp.max(jnp.abs(o[..., :8])))
float(tiny(x))
rtts = []
for _ in range(5):
    t0 = time.perf_counter(); float(tiny(x)); rtts.append(time.perf_counter()-t0)
rtt = min(rtts)

eps = jnp.float32(1e-6)
res = {}
for P in (2, 4, 8):
    f = jax.jit(lambda b, o, e, p=P: segmented_conv_fused(
        b + e * o, spec, B, halo, seg, shift, pairs_per_step=p, slack=slack))
    out = f(x, x, eps)
    float(checksum(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(8):
            o = f(x, o, eps)
        float(checksum(o))
        el = time.perf_counter()-t0
        ts.append(max(el-rtt, el/2)/8)
    res[P] = round(min(ts)*1e3, 3)
    print(P, res[P], flush=True)
print(json.dumps({"conv_ms_by_pairs": res, "sync_rtt_ms": round(rtt*1e3,2)}))
