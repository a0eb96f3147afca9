import os, sys
sys.path.insert(0, "/root/repo")
import time, math, numpy as np
t00 = time.time()
def log(msg): print(f'[{time.time()-t00:7.1f}s] {msg}', flush=True)
import jax, jax.numpy as jnp
log('jax imported')
from gvr_tpu.scene.scene import load_gmm
from gvr_tpu.cameras import PinholeCamera
from gvr_tpu.config import RenderConfig
from gvr_tpu.accel.grid import build_grid
from gvr_tpu.integrators.gridscatter import grid_tau_crossings, grid_free_flight, wavefront_pixels_grid

scene = load_gmm('/root/reference/scenes/gaussians/10k_random.txt')
log('scene loaded')
grid = build_grid(scene.medium)
log(f'grid built side={grid.side} s_cap={grid.s_cap} slices={grid.n_slices} c_max={grid.c_max}')

B = 32768
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (B,3), minval=jnp.array([-1.,0.,-1.]), maxval=jnp.array([1.,2.,1.]))
d = jax.random.normal(key, (B,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)
log('rays made')

f1 = jax.jit(lambda o,d: grid_tau_crossings(grid, o, d)[0])
r = np.asarray(f1(o,d)); log(f'tau crossings compiled+run, sum={r.sum():.3f}')
t0=time.time()
for _ in range(10): r = f1(o,d)
np.asarray(r[:1]); log(f'tau crossings: {(time.time()-t0)/10*1e3:.2f} ms/call (dispatch-pipelined)')

f2 = jax.jit(lambda o,d,u: grid_free_flight(grid, o, d, u, 12))
u = jnp.full((B,), 0.5)
r = f2(o,d,u); np.asarray(r[0][:1]); log('free flight compiled')
t0=time.time()
for _ in range(10): r = f2(o,d,u)
np.asarray(r[0][:1]); log(f'free flight: {(time.time()-t0)/10*1e3:.2f} ms/call')

cam = PinholeCamera.create([0,1,6],[0,1,0],0.25*math.pi)
cfg = RenderConfig(width=128, height=128, spp=4, engine='grid')
fw = jax.jit(lambda sc, ids: wavefront_pixels_grid(sc, grid, cam, cfg, ids))
ids = jnp.arange(128*128, dtype=jnp.int32)
log('compiling wavefront (128^2 spp4, one chunk)...')
r = np.asarray(fw(scene, ids)); log(f'wavefront compiled+run, mean={r.mean():.4f}')
t0=time.time(); r = np.asarray(fw(scene, ids)); log(f'wavefront steady: {time.time()-t0:.2f}s for {128*128*4} paths')
