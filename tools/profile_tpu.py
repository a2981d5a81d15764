import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

log = open("/tmp/profile_tpu.log", "a", buffering=1)
def p(*a): print(*a, file=log, flush=True)

from jstsp19_tpu.core import prng
from jstsp19_tpu.solvers.lowrank import svt

B, N, M = 32, 32, 140
key = jax.random.key(0)

def timeit(label, fn, *args):
    r = fn(*args); _ = float(jnp.sum(jnp.abs(r))) if hasattr(r, 'dtype') else r
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        s = float(jnp.sum(jnp.abs(r)))
        best = min(best, time.time()-t0)
    p(f"{label}: {best*1000:.1f} ms")
    return best

X = prng.complex_normal(key, (B, N, M))

# scan of 100 svts (batched) — the eigh cost
@jax.jit
def scan_svt(X):
    def body(c, _):
        return svt(c, 0.01) + 0.001*X, None
    out, _ = jax.lax.scan(body, X, None, length=100)
    return out
timeit("scan100 svt batch32 (32x140)", scan_svt, X)

# scan of 100 dictionary correlations (the matmul cost)
A = prng.complex_normal(jax.random.fold_in(key,1), (N, 32))
Bm = prng.complex_normal(jax.random.fold_in(key,2), (16, M))
@jax.jit
def scan_dict(X):
    AhA = A.conj().T@A; BBh = Bm@Bm.conj().T
    def body(c, _):
        v = jnp.einsum('ng,bnm,km->bgk', A.conj(), c, Bm.conj())
        r = jnp.einsum('gh,bhk,kj->bgj', AhA, v, BBh)
        c2 = c + 0.0001*jnp.einsum('ng,bgk,km->bnm', A, r, Bm)
        return c2, None
    out, _ = jax.lax.scan(body, X, None, length=100)
    return out
timeit("scan100 dict-correlation batch32", scan_dict, X)

# elementwise chain
@jax.jit
def scan_elem(X):
    def body(c, _):
        return c*0.99 + jnp.abs(c)*0.001j, None
    out, _ = jax.lax.scan(body, X, None, length=100)
    return out
timeit("scan100 elementwise batch32", scan_elem, X)
