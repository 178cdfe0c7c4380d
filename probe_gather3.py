import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
bond = sys_.terms[0]
nb = sys_.terms[3]
eidx = nb.exception_index

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 1.5:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")

B = jax.lax.optimization_barrier

def diff_bar(xx, ii):
    xi, xj = B((xx[ii[:,0]], xx[ii[:,1]]))
    return xi - xj
timeit("excep gather+sub with barrier", diff_bar, x, eidx)

def be_bar(xx, ii):
    xi, xj = B((xx[ii[:,0]], xx[ii[:,1]]))
    dd = xi - xj
    r = jnp.sqrt(jnp.sum(dd*dd, axis=1))
    return jnp.sum(bond.k*(r-bond.length)**2)
timeit("bond energy barrier", be_bar, x, bond.index)
timeit("bond grad barrier", lambda xx, ii: jax.grad(be_bar)(xx, ii), x, bond.index)

# scatter with barrier before/after
v = jnp.ones((eidx.shape[0], 3), jnp.float32)
def scat_bar(xx, ii, vv):
    vv = B(vv)
    out = jnp.zeros_like(xx).at[ii[:,0]].add(vv)
    return B(out)
timeit("scatter-add barrier", scat_bar, x, eidx, v)
# segment_sum
timeit("segment_sum", lambda ii, vv: jax.ops.segment_sum(vv, ii[:,0], num_segments=23558), eidx, v)
# one-hot matmul alternative for scatter: (N, E) too big; try sorted-segment trick:
