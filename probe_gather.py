import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
box = sys_.default_box
bond = sys_.terms[0]

def timeit(name, fn, *args, reps=None):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 1.5:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")

timeit("empty (dispatch overhead)", lambda xx: xx[0,0]+1.0, x)
print("bond count:", bond.index.shape)
i, j = bond.index[:,0], bond.index[:,1]
timeit("gather 2x(B,3)", lambda xx: (xx[i], xx[j]), x)
timeit("bond energy raw", lambda xx: jnp.sum((jnp.linalg.norm(xx[i]-xx[j],axis=1)-bond.length)**2*bond.k), x)
timeit("bond term energy", lambda xx: bond.energy(xx, box, None), x)
timeit("bond grad", lambda xx: jax.grad(lambda y: bond.energy(y, box, None))(xx), x)
# chained: 10x bond energy in one program
def chain(xx):
    tot = 0.0
    for r in range(10):
        tot = tot + bond.energy(xx + r*1e-6, box, None)
    return tot
timeit("10x bond energy (one program)", chain, x)
