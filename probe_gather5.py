import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit, WaterBox

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
box = sys_.default_box
bond = sys_.terms[0]
B = jax.lax.optimization_barrier

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 1.0:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")

idx = bond.index
v = jnp.ones((idx.shape[0], 3), jnp.float32)
timeit("scatter-add all traced", lambda xx, ii, vv: (xx*0.0).at[ii[:,0]].add(vv), x, idx, v)
timeit("scatter-set all traced", lambda xx, ii, vv: (xx*0.0).at[ii[:,0]].set(vv), x, idx, v)
timeit("argsort 23k", lambda xx: jnp.argsort(xx[:,0]), x)
timeit("sort 23k", lambda xx: jnp.sort(xx[:,0]), x)
timeit("top_k... lax.sort pair", lambda xx: jax.lax.sort((xx[:,0], jax.lax.iota(jnp.int32, xx.shape[0])), num_keys=1), x)

# term energy with term passed as traced pytree arg
timeit("bond term energy (term traced)", lambda xx, tt: tt.energy(xx, box, None), x, bond)
timeit("bond term grad (term traced)", lambda xx, tt: jax.grad(lambda y: tt.energy(y, box, None))(xx), x, bond)
# whole system energy traced vs closure
timeit("system energy (system traced)", lambda xx, ss: ss.energy(xx, box), x, sys_)
