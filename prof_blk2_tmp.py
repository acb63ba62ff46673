import numpy as np, jax, jax.numpy as jnp, time
from video_llava_tpu.ops import quant4 as q4
rng = np.random.default_rng(0)
D, F = 4096, 22016
w = jnp.asarray(rng.integers(-120, 120, (D // 2, F)), jnp.int8)
s = jnp.asarray(rng.random((D // 128, F)) * 0.01 + 0.001, jnp.float32)

def chain(fn, b, K=30):
    x0 = jnp.asarray(rng.standard_normal((b, D)), jnp.float32)
    def chained(x):
        def body(i, c):
            out = fn(c, w, s)
            return x0 + (out[0, 0] * 0).astype(x0.dtype)
        return fn(jax.lax.fori_loop(0, K - 1, body, x0), w, s)
    f = jax.jit(chained)
    r = f(x0); np.asarray(r[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = f(x0); np.asarray(r[0, 0])
        best = min(best, (time.perf_counter() - t0) / K)
    return best

for b in (8, 32, 64, 128, 512):
    t = chain(q4.int4_matmul_pallas, b)
    print(f"pallas-block b={b:4d}: {t*1e6:8.1f} us/call", flush=True)
# parity spot check
x = jnp.asarray(rng.standard_normal((32, D)), jnp.float32)
a = np.asarray(q4.int4_matmul_pallas(x, w, s))
r = np.asarray(q4.int4_matmul_xla(x, w, s))
cos = float(a.ravel() @ r.ravel() / (np.linalg.norm(a) * np.linalg.norm(r)))
print("cos vs xla:", round(cos, 6))
