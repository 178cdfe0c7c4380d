import time
import jax, jax.numpy as jnp, numpy as np
from scipy.spatial import cKDTree
from openmmtools_tpu.models import DHFRExplicit

d = DHFRExplicit()
sys_ = d.system
x = np.asarray(d.sampler_state().positions)
box = np.asarray(sys_.default_box)
L = np.diagonal(box)
nb = sys_.terms[3]
print("switch_width:", nb.switch_width, "method:", nb.method, "cutoff:", nb.cutoff)

r_list = float(nb.cutoff) + 0.12
xw = x - L*np.floor(x/L)
tree = cKDTree(xw, boxsize=L)
t0=time.perf_counter()
pairs = tree.query_pairs(r_list, output_type="ndarray")
print(f"kdtree pairs: {len(pairs)} in {time.perf_counter()-t0:.2f}s")
deg = np.bincount(pairs.ravel(), minlength=len(x))
k_max = int(deg.max()); print("max degree:", k_max, "mean:", deg.mean())
K = ((k_max + 31)//32)*32
idx = np.full((len(x), K), -1, np.int64)
fill = np.zeros(len(x), int)
for a, b in pairs:
    idx[a, fill[a]] = b; fill[a] += 1
    idx[b, fill[b]] = a; fill[b] += 1
mask = idx >= 0
idxj = jnp.asarray(np.where(mask, idx, 0).astype(np.int32))
maskj = jnp.asarray(mask)

from openmmtools_tpu.ops.neighborlist import NeighborList
nbr = NeighborList(idx=idxj, mask=maskj, overflow=jnp.asarray(False), r_list=r_list)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0 < 2.0:
        r = jax.block_until_ready(f(*args)); n+=1
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms  (n={n})")
    return r

xj = jnp.asarray(x, jnp.float32)
boxj = jnp.asarray(box)
u = timeit("energy_neighbors traced", lambda xx, tt, ii, mm: tt.energy_neighbors(xx, boxj, None, NeighborList(ii, mm, jnp.asarray(False), r_list)), xj, nb, idxj, maskj)
print("U_nbr =", float(u))
g = timeit("grad energy_neighbors traced", lambda xx, tt, ii, mm: jax.grad(lambda y: tt.energy_neighbors(y, boxj, None, NeighborList(ii, mm, jnp.asarray(False), r_list)))(xx), xj, nb, idxj, maskj)
u_dense = timeit("dense energy traced", lambda xx, tt: tt.energy(xx, boxj, None), xj, nb)
print("U_dense =", float(u_dense), "diff:", float(u - u_dense))
