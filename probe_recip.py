import time
import jax, jax.numpy as jnp, numpy as np
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = d.sampler_state().positions
box = sys_.default_box
rec = [t for t in sys_.terms if type(t).__name__=="EwaldReciprocalTerm"][0]
print("kmax:", rec.kmax, "n_k legacy:", rec.kvecs.shape)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 2.0:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms (n={n})")
    return r

legacy = rec.replace(kmax=None)
u_new = timeit("recip factorized", lambda xx, tt: tt.energy(xx, box, None), x, rec)
u_old = timeit("recip legacy", lambda xx, tt: tt.energy(xx, box, None), x, legacy)
print("U new/old:", float(u_new), float(u_old), "rel diff:",
      abs(float(u_new-u_old))/abs(float(u_old)))
g = timeit("recip factorized grad", lambda xx, tt: jax.grad(lambda y: tt.energy(y, box, None))(xx), x, rec)
g_old = jax.jit(lambda xx, tt: jax.grad(lambda y: tt.energy(y, box, None))(xx))(x, legacy)
print("max force diff:", float(jnp.max(jnp.abs(g-g_old))), "scale:", float(jnp.max(jnp.abs(g_old))))
