import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
box = sys_.default_box
bond = sys_.terms[0]

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 1.5:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")

idx = bond.index
timeit("gather traced idx", lambda xx, ii: (xx[ii[:,0]], xx[ii[:,1]]), x, idx)
timeit("gather const idx", lambda xx: (xx[idx[:,0]], xx[idx[:,1]]), x)
# scatter-add (force pattern)
v = jnp.ones((idx.shape[0], 3), jnp.float32)
timeit("scatter-add traced idx", lambda xx, ii, vv: jnp.zeros_like(xx).at[ii[:,0]].add(vv), x, idx, v)
timeit("scatter-add const idx", lambda xx, vv: jnp.zeros_like(xx).at[idx[:,0]].add(vv), x, v)
# bond energy with traced indices
def be(xx, ii):
    dd = xx[ii[:,0]] - xx[ii[:,1]]
    r = jnp.linalg.norm(dd, axis=1)
    return jnp.sum(bond.k*(r-bond.length)**2)
timeit("bond energy traced idx", be, x, idx)
timeit("bond grad traced idx", lambda xx, ii: jax.grad(be)(xx, ii), x, idx)
# nonbonded exceptions (34709 pairs)
nb = sys_.terms[3]
eidx = nb.exception_index
timeit("exceptions gather traced", lambda xx, ii: xx[ii[:,0]]-xx[ii[:,1]], x, eidx)
timeit("argsort traced", lambda xx: jnp.argsort(xx[:,0]), x)
