import os, sys
sys.path.insert(0, "/root/repo")
import time, numpy as np
def log(msg): print(msg, flush=True)
import jax, jax.numpy as jnp
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.accel.grid import build_grid, _oddeven_sort_rows, _shift_cummax

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
grid = build_grid(scene.medium)
B = 32768
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (B,3), minval=jnp.array([-1.,0.,-1.]), maxval=jnp.array([1.,2.,1.]))
d = jax.random.normal(key, (B,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)
ts0 = jax.random.uniform(key, (22, B))
big = jax.random.uniform(key, (715560,))

REP = 8
def devloop(fn, x0, name):
    def g(x):
        for i in range(REP):
            x = fn(x)
        return x
    gj = jax.jit(g)
    r = gj(x0); jax.block_until_ready(r)
    t0=time.time(); r = gj(x0); np.asarray(jnp.ravel(r)[:1])
    log(f'{name}: {(time.time()-t0-0.029)/REP*1e3:8.2f} ms')

glo = grid.lo
sx, sy, sz = grid.side
def f_planes(x):
    oo = o + x[:, None]*1e-20
    d_safe = jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    inv_d = 1.0 / d_safe
    planes = []
    for ax, n_ax in ((0, sx), (1, sy), (2, sz)):
        i = jnp.arange(n_ax + 1, dtype=jnp.float32)[:, None]
        planes.append((glo[ax] + i * grid.cell[ax] - oo[None, :, ax]) * inv_d[None, :, ax])
    ts = jnp.concatenate(planes, axis=0)
    return ts[0]
devloop(f_planes, jnp.zeros(B), 'planes only')

def f_sortnet(x):
    ts = _oddeven_sort_rows(ts0 + x[None, :]*1e-20)
    return ts[0]
devloop(f_sortnet, jnp.zeros(B), 'odd-even sort [22,32k]')

def f_mid(x):
    ts = ts0 + x[None, :]*1e-20
    t_in = ts[:-1]; t_out = ts[1:]
    mid = o[None] + (0.5*(t_in+t_out))[..., None] * d[None]
    side = jnp.asarray(grid.side, jnp.int32)
    idx = jnp.clip(((mid - glo) * grid.inv_cell).astype(jnp.int32), 0, side-1)
    cid = (idx[...,0]*side[1]+idx[...,1])*side[2]+idx[...,2]
    return cid[0].astype(jnp.float32)
devloop(f_mid, jnp.zeros(B), 'midpoint cells [21,32k]')

def f_shiftmax(x):
    y = _shift_cummax((x*1e3).astype(jnp.int32))
    return y.astype(jnp.float32)*1e-9
devloop(f_shiftmax, big, 'shift-cummax 715k')

from gvr_tpu.accel.grid import dda_crossings
def f_dda_full(x):
    cells, tin, tout = dda_crossings(grid, o + x[:, None]*1e-20, d)
    return tin[:, 0]
devloop(f_dda_full, jnp.zeros(B), 'dda full')
