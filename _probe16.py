import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from jstsp19_tpu.core import prng
from jstsp19_tpu.harness.pipeline import PointConfig, realization_errors
pc = PointConfig(methods=("proposed",))
run = jax.jit(lambda ks, v: jax.vmap(lambda k: realization_errors(k, pc, v))(ks)["proposed"])
keys = prng.realization_keys(prng.experiment_key(0), 0, 16)
t0=time.time()
m = float(jnp.mean(run(keys, jnp.float32(1.0))))
print(f"batch16 compile+run {time.time()-t0:.1f}s nmse={m:.4f}", flush=True)
t0=time.time(); m = float(jnp.mean(run(keys, jnp.float32(1.0))))
print(f"steady {time.time()-t0:.3f}s", flush=True)
