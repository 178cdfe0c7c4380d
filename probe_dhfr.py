import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

t0=time.perf_counter()
d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
box = sys_.default_box
print(f"build: {time.perf_counter()-t0:.1f}s; {sys_.n_particles} atoms; terms:",
      [type(t).__name__ for t in sys_.terms])

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 2.0:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")
    return r

for t in sys_.terms:
    nm = type(t).__name__
    timeit(f"energy {nm}", lambda xx, tt=t: tt.energy(xx, box, None), x)
    timeit(f"force  {nm}", lambda xx, tt=t: jax.grad(lambda y: tt.energy(y, box, None))(xx), x)

# sort/gather costs
timeit("argsort x", lambda xx: jnp.argsort(xx[:,0]), x)
p = jnp.argsort(x[:,0])
timeit("permute (N,3) x3", lambda xx, pp: (xx[pp], xx[pp], xx[pp]), x, p)
# exclusion-pair gather cost
nb = [t for t in sys_.terms if type(t).__name__=="NonbondedTerm"][0]
exc = nb.exclusion_index if hasattr(nb, "exclusion_index") else None
print("exclusions:", None if exc is None else exc.shape,
      "exceptions:", nb.exception_index.shape)
if exc is not None and exc.shape[0]:
    timeit("gather excl pairs", lambda xx: xx[exc[:,0]] - xx[exc[:,1]], x)
