import os, sys
sys.path.insert(0, "/root/repo")
import time, numpy as np
t00 = time.time()
def log(msg): print(f'[{time.time()-t00:7.1f}s] {msg}', flush=True)
import jax, jax.numpy as jnp
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.accel.grid import build_grid, dda_crossings

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
grid = build_grid(scene.medium)
B = 32768
M = B * grid.c_max + grid.n_cells * 127
Mp = ((M + 127)//128)*128
log(f'M={M}')
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (B,3), minval=jnp.array([-1.,0.,-1.]), maxval=jnp.array([1.,2.,1.]))
d = jax.random.normal(key, (B,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)
keys_big = jax.random.randint(key, (Mp,), 0, 3456, dtype=jnp.int32)
vals = [jax.random.uniform(jax.random.fold_in(key,i), (Mp,)) for i in range(8)]

REP = 8
def devloop(fn, x0, name):
    def g(x):
        for i in range(REP):
            x = fn(x)
        return x
    gj = jax.jit(g)
    r = gj(x0); jax.block_until_ready(r)
    t0=time.time(); r = gj(x0); np.asarray(jnp.ravel(r)[:1])
    log(f'{name}: {(time.time()-t0-0.029)/REP*1e3:7.2f} ms')

# dda chained: o depends on previous output
def f_dda(x):
    cells, tin, tout = dda_crossings(grid, o + x[:, None]*1e-20, d)
    return tin[:, 0]
devloop(f_dda, jnp.zeros(B), 'dda (chained)')

def f_cummax(x):
    return jax.lax.cummax(x).astype(jnp.float32) * 1e-9
devloop(f_cummax, vals[0], 'cummax 1.5M')

def f_cumsum(x):
    return jnp.cumsum(x) * 1e-9
devloop(f_cumsum, vals[0], 'cumsum 1.5M')

def f_sort11(x):
    k = (x * 1e3).astype(jnp.int32) % 3456
    s = jax.lax.sort([k] + [v + x*0 for v in vals] + [k, k], num_keys=1, is_stable=True)
    return s[1]
devloop(f_sort11, vals[0], 'stable sort 1key+10ops 1.5M')

def f_sort2(x):
    k = (x * 1e3).astype(jnp.int32) % 3456
    s = jax.lax.sort([k, x], num_keys=1, is_stable=True)
    return s[1]
devloop(f_sort2, vals[0], 'stable sort 1key+1op 1.5M')

def f_ss(x):
    k = jnp.sort((x * 1e3).astype(jnp.int32) % 3456)
    t = jnp.searchsorted(k, jnp.arange(3457))
    return t.astype(jnp.float32) * 1e-9 + x[:3457]*0
devloop(f_ss, vals[0], 'sort-int + searchsorted 3457q')

# kernel alone, chained through items
from gvr_tpu.kernels.gridtrace import tau_pass
items0 = jnp.stack([v for v in vals], axis=0)
nb = Mp // 128
first = jnp.zeros(nb, jnp.int32)
nsl = jnp.full(nb, min(grid.s_cap, 2), jnp.int32)
def f_kern(x):
    it = items0 + x[None, :]*1e-20
    return tau_pass(grid.table, first, nsl, it, grid.s_cap)
devloop(f_kern, vals[0], f'tau kernel {nb} blocks x s_cap={grid.s_cap} all-live')
nsl0 = jnp.zeros(nb, jnp.int32)
def f_kern0(x):
    it = items0 + x[None, :]*1e-20
    return tau_pass(grid.table, first, nsl0, it, grid.s_cap)
devloop(f_kern0, vals[0], 'tau kernel all-dead (pure step overhead)')
