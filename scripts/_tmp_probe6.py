import os, sys
sys.path.insert(0, "/root/repo")
import time, math, numpy as np
def log(msg): print(msg, flush=True)
import jax, jax.numpy as jnp
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.accel.grid import build_grid, dda_crossings, sort_items, pad_sort_items
from gvr_tpu.kernels.gridtrace import span_tau_pass, solve_pass, TAU_BLK, BLK
from gvr_tpu.integrators.gridscatter import (grid_tau_crossings,
    grid_solve_from_crossings, _bcast3)

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
grid = build_grid(scene.medium)
log(f'side={grid.side} s_cap={grid.s_cap} c_max={grid.c_max} S2={grid.table2.shape}')
B = 32768
key = jax.random.PRNGKey(0)
o1 = jax.random.uniform(key, (2*B,3), minval=jnp.array([-1.,0.,-1.]), maxval=jnp.array([1.,2.,1.]))
d1 = jax.random.normal(key, (2*B,3)); d1 = d1/jnp.linalg.norm(d1,axis=1,keepdims=True)
u = jax.random.uniform(key, (B,))

REP = 8
def devloop(fn, x0, name):
    def g(x):
        for i in range(REP):
            x = fn(x)
        return x
    gj = jax.jit(g)
    r = gj(x0); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0=time.time(); r = gj(x0); np.asarray(jnp.ravel(r)[:1])
        best = min(best, (time.time()-t0-0.029)/REP)
    log(f'{name}: {best*1e3:8.2f} ms')

def f_tau(x):
    tau, cells, tin, tout = grid_tau_crossings(grid, o1 + x[:,None]*1e-20, d1)
    return jnp.sum(tau, axis=1)
devloop(f_tau, jnp.zeros(2*B), 'merged tau crossings (2B=65k)')

def f_sortonly(x):
    cells, tin, tout = dda_crossings(grid, o1 + x[:,None]*1e-20, d1)
    b, c = cells.shape
    payload = _bcast3(o1,b,c)+_bcast3(d1,b,c)+[jnp.broadcast_to(jnp.float32(1e8), (b*c,))]
    cell_s, pay_s, s_lo, n_sl, unsort = sort_items(grid, cells.reshape(-1), payload, TAU_BLK)
    return pay_s[0][:2*B]
devloop(f_sortonly, jnp.zeros(2*B), 'dda+sort_items only')

def f_solve(x):
    oo = o1[:B] + x[:,None]*1e-20
    tau, cells, tin, tout = grid_tau_crossings(grid, oo, d1[:B])
    t, sc, alb, tt = grid_solve_from_crossings(grid, oo, d1[:B], tau, cells, tin, tout, u, 12)
    return t
devloop(f_solve, jnp.zeros(B), 'tau(B) + solve')

# full wavefront iteration cost: time known-iteration-count run
from gvr_tpu.integrators.gridscatter import wavefront_pixels_grid
from gvr_tpu.cameras import PinholeCamera
from gvr_tpu.config import RenderConfig
cam = PinholeCamera.create([0,1,6],[0,1,0],0.25*math.pi)
for spp in (1, 4):
    cfg = RenderConfig(width=181, height=181, spp=spp, engine='grid')
    ids = jnp.arange(181*181, dtype=jnp.int32)[:32768]
    fw = jax.jit(lambda sc, i: wavefront_pixels_grid(sc, grid, cam, cfg, i))
    r = np.asarray(fw(scene, ids))
    t0=time.time(); r = np.asarray(fw(scene, ids)); dt = time.time()-t0
    log(f'wavefront spp{spp} B=32768: {dt:.2f}s mean={r.mean():.4f}')
