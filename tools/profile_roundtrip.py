import time
import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.key(0)
print("devices:", jax.devices(), flush=True)

x = jnp.zeros(8)
tiny = jax.jit(lambda a: a + 1)
t0 = time.perf_counter(); r = tiny(x); print("dispatch tiny:", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter(); v = np.asarray(r); print("fetch tiny:", time.perf_counter() - t0, v[:2], flush=True)
for i in range(3):
    t0 = time.perf_counter(); v = np.asarray(tiny(x)); print("tiny roundtrip:", (time.perf_counter() - t0) * 1e3, "ms", flush=True)

A = jax.random.normal(key, (2048, 2048), jnp.float32)
mm = jax.jit(lambda a: (a @ a).sum())
t0 = time.perf_counter(); r = mm(A); print("dispatch mm:", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter(); v = float(r); print("fetch mm:", time.perf_counter() - t0, v, flush=True)
for i in range(3):
    t0 = time.perf_counter(); v = float(mm(A)); print("mm roundtrip:", (time.perf_counter() - t0) * 1e3, "ms", flush=True)

mm8 = jax.jit(lambda a: (a @ a).sum())
A8 = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
t0 = time.perf_counter(); v = float(mm8(A8)); print("mm 8192 bf16 compile+run:", (time.perf_counter() - t0) * 1e3, "ms", flush=True)
for i in range(3):
    t0 = time.perf_counter(); v = float(mm8(A8)); print("mm 8192 bf16 roundtrip:", (time.perf_counter() - t0) * 1e3, "ms", flush=True)
