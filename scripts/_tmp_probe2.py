import os, sys
sys.path.insert(0, "/root/repo")
import time, math, numpy as np
t00 = time.time()
def log(msg): print(f'[{time.time()-t00:7.1f}s] {msg}', flush=True)
import jax, jax.numpy as jnp
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.accel.grid import build_grid, dda_crossings, _run_starts, H
from gvr_tpu.kernels.gridtrace import tau_pass, BLK
from gvr_tpu.integrators.gridscatter import _bcast3, _block_tables

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
grid = build_grid(scene.medium)
log(f'grid side={grid.side} s_cap={grid.s_cap}')
B = 32768
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (B,3), minval=jnp.array([-1.,0.,-1.]), maxval=jnp.array([1.,2.,1.]))
d = jax.random.normal(key, (B,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)

c = grid.c_max
cgrid = grid  # closure

def stage(fn, name, n=10):
    f = jax.jit(fn)
    r = f(o, d); jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0=time.time()
    for _ in range(n): r = f(o, d)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    log(f'{name}: {((time.time()-t0)/n)*1e3:.2f} ms')

def s_dda(o, d):
    return dda_crossings(grid, o, d)
stage(s_dda, 'dda')

def s_items(o, d):
    cells, tin, tout = dda_crossings(grid, o, d)
    payload = _bcast3(o,B,c)+_bcast3(d,B,c)+[tin.reshape(-1), tout.reshape(-1)]
    # replicate pad_sort_items inline, staged
    m = cells.reshape(-1).shape[0]
    return payload[0] + cells.reshape(-1)
stage(s_items, 'dda+payload bcast')

from gvr_tpu.accel.grid import pad_sort_items
def s_sort(o, d):
    cells, tin, tout = dda_crossings(grid, o, d)
    payload = _bcast3(o,B,c)+_bcast3(d,B,c)+[tin.reshape(-1), tout.reshape(-1)]
    pay_f, block_cell, unsort = pad_sort_items(grid, cells.reshape(-1), payload, BLK)
    return pay_f[0]
stage(s_sort, 'dda+payload+pad_sort')

def s_kernel(o, d):
    cells, tin, tout = dda_crossings(grid, o, d)
    payload = _bcast3(o,B,c)+_bcast3(d,B,c)+[tin.reshape(-1), tout.reshape(-1)]
    pay_f, block_cell, unsort = pad_sort_items(grid, cells.reshape(-1), payload, BLK)
    first, nsl = _block_tables(grid, block_cell)
    items = jnp.stack(pay_f, axis=0)
    tau_flat = tau_pass(grid.table, first, nsl, items, grid.s_cap)
    return tau_flat
stage(s_kernel, '... + tau kernel')

def s_unsort(o, d):
    cells, tin, tout = dda_crossings(grid, o, d)
    payload = _bcast3(o,B,c)+_bcast3(d,B,c)+[tin.reshape(-1), tout.reshape(-1)]
    pay_f, block_cell, unsort = pad_sort_items(grid, cells.reshape(-1), payload, BLK)
    first, nsl = _block_tables(grid, block_cell)
    items = jnp.stack(pay_f, axis=0)
    tau_flat = tau_pass(grid.table, first, nsl, items, grid.s_cap)
    return unsort(tau_flat)
stage(s_unsort, '... + unsort (full)')
