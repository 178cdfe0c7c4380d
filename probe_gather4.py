import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
bond = sys_.terms[0]
idx = bond.index
k_arr = bond.k; l_arr = bond.length
B = jax.lax.optimization_barrier

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 1.0:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")

# step by step
timeit("g1: gather only", lambda xx, ii: B((xx[ii[:,0]], xx[ii[:,1]])), x, idx)
timeit("g2: +sub", lambda xx, ii: (lambda t: t[0]-t[1])(B((xx[ii[:,0]], xx[ii[:,1]]))), x, idx)
timeit("g3: +sum(d*d) scalar", lambda xx, ii: (lambda t: jnp.sum((t[0]-t[1])**2))(B((xx[ii[:,0]], xx[ii[:,1]]))), x, idx)
timeit("g4: +sqrt+sum axis1 then scalar", lambda xx, ii: (lambda t: jnp.sum(jnp.sqrt(jnp.sum((t[0]-t[1])**2, axis=1))))(B((xx[ii[:,0]], xx[ii[:,1]]))), x, idx)
def g5(xx, ii, kk, ll):
    xi, xj = B((xx[ii[:,0]], xx[ii[:,1]]))
    r = jnp.sqrt(jnp.sum((xi-xj)**2, axis=1))
    return jnp.sum(kk*(r-ll)**2)
timeit("g5: full traced k,l", g5, x, idx, k_arr, l_arr)
def g6(xx, ii):
    xi, xj = B((xx[ii[:,0]], xx[ii[:,1]]))
    r = jnp.sqrt(jnp.sum((xi-xj)**2, axis=1))
    return jnp.sum(k_arr*(r-l_arr)**2)   # closure constants
timeit("g6: full const k,l", g6, x, idx)
