"""Dense voxel-grid medium (the reference's declared-but-dead VOXELS type).

The reference declares ``VolumeType::VOXELS`` and a ``load_VDB`` stub but
never implements either (scene.h:21-22, 122, 144-145).  gvr_tpu makes the
type real: a dense cell-centered ``sigma_t``/``albedo`` grid with trilinear
interpolation, rendered by the medium-agnostic marchers
(``render_pure_raymarch``, integrator.h:100-267 — the one reference
integrator written to work on ANY medium that can report its entry/exit
interval and a pointwise sigma).

TPU formulation: the grid lives as a dense [X,Y,Z] array in HBM; a
trilinear sample is eight gathers + lerps, vectorized over the ray batch.
That is the right trade for a *baseline* marcher (the grid is small and
XLA fuses the lerp chain); a production voxel path tracer would tile the
grid through VMEM like kernels/gridtrace.py streams the Gaussian tables.

Also provides ``VoxelGrid.from_gaussians`` — bake any GaussianMixture to a
voxel grid — which doubles as a cross-representation validation: the same
medium rendered through the GMM analytic path and through its baked grid
must produce the same image as the bake resolution rises
(tests/test_voxels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class VoxelGrid:
    """Cell-centered dense voxel medium over the AABB [lo, hi].

    sigma_t [X,Y,Z] extinction, albedo [X,Y,Z] single-scattering albedo.
    Samples live at cell centers; interpolation is trilinear with
    clamp-to-edge (the medium is still bounded hard by the AABB — the
    clamp only affects the outermost half-cell band).
    """

    def __init__(self, lo, hi, sigma_t, albedo):
        self.lo = lo
        self.hi = hi
        self.sigma_t = sigma_t
        self.albedo = albedo

    def tree_flatten(self):
        return (self.lo, self.hi, self.sigma_t, self.albedo), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @staticmethod
    def create(lo, hi, sigma_t, albedo=0.9) -> "VoxelGrid":
        sigma_t = jnp.asarray(sigma_t, jnp.float32)
        assert sigma_t.ndim == 3, "sigma_t must be [X,Y,Z]"
        albedo = jnp.asarray(albedo, jnp.float32)
        if albedo.ndim == 0:
            albedo = jnp.broadcast_to(albedo, sigma_t.shape)
        assert albedo.shape == sigma_t.shape
        return VoxelGrid(jnp.asarray(lo, jnp.float32).reshape(3),
                         jnp.asarray(hi, jnp.float32).reshape(3),
                         sigma_t, albedo)

    # -- medium protocol (what the marchers require) -------------------------

    @property
    def n(self) -> int:
        """Per-ray working-set scale for pick_chunk: a trilinear sample is
        O(1) regardless of grid resolution."""
        return 1

    @property
    def res(self):
        return self.sigma_t.shape

    def aabbs(self) -> tuple:
        """([1,3] min, [1,3] max) — the grid is one bounded primitive."""
        return self.lo[None, :], self.hi[None, :]

    def intersect(self, origin, direction):
        """Slab test against the grid AABB (the voxel analog of
        Gaussian::intersect_direct's entry/exit interval).

        origin/direction [...,3] -> (t_enter, t_exit, hit) each [...,1]
        so the result plugs into the same per-primitive active-mask
        machinery as the other media.
        """
        inv = 1.0 / jnp.where(jnp.abs(direction) > 1e-12, direction,
                              jnp.where(direction >= 0, 1e-12, -1e-12))
        a = (self.lo - origin) * inv
        b = (self.hi - origin) * inv
        t0 = jnp.max(jnp.minimum(a, b), axis=-1)
        t1 = jnp.min(jnp.maximum(a, b), axis=-1)
        hit = (t0 <= t1) & (t1 >= 0.0)
        return t0[..., None], t1[..., None], hit[..., None]

    def _trilinear(self, grid, x):
        """Trilinear sample of grid [X,Y,Z] at world points x [...,3]."""
        res = jnp.asarray(grid.shape, jnp.float32)
        # cell-centered: sample i sits at lo + (i + 0.5) * cell
        f = (x - self.lo) / (self.hi - self.lo) * res - 0.5
        f = jnp.clip(f, 0.0, res - 1.0)
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0,
                      jnp.asarray(grid.shape, jnp.int32) - 2)
        w = f - i0.astype(jnp.float32)                       # [...,3]
        ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
        wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]

        def g(dx, dy, dz):
            return grid[ix + dx, iy + dy, iz + dz]

        c00 = g(0, 0, 0) * (1 - wz) + g(0, 0, 1) * wz
        c01 = g(0, 1, 0) * (1 - wz) + g(0, 1, 1) * wz
        c10 = g(1, 0, 0) * (1 - wz) + g(1, 0, 1) * wz
        c11 = g(1, 1, 0) * (1 - wz) + g(1, 1, 1) * wz
        c0 = c00 * (1 - wy) + c01 * wy
        c1 = c10 * (1 - wy) + c11 * wy
        return c0 * (1 - wx) + c1 * wx

    def sigma_albedo(self, x, active_mask):
        """(sigma_a, sigma_s) at points x [...,3] under the AABB active
        mask [...,1] — the same contract as
        GaussianMixture.sigma_albedo (gmm.h:98-126)."""
        inside = active_mask[..., 0]
        st = self._trilinear(self.sigma_t, x) * inside
        a = self._trilinear(self.albedo, x)
        return (1.0 - a) * st, a * st

    # -- construction helpers -------------------------------------------------

    @staticmethod
    def from_gaussians(gmm, res: int = 64, pad: float = 0.05,
                       chunk: int = 8192) -> "VoxelGrid":
        """Bake a GaussianMixture to a voxel grid (host-side, chunked).

        sigma_t(x) = sum_i mu_t_i(x); albedo(x) = the mixture's
        density-weighted albedo blend (gmm.h:98-126) with the scene-wide
        mean albedo where the field vanishes (interpolation-safe filler).
        """
        bmin, bmax = (np.asarray(a, np.float64) for a in gmm.aabbs())
        lo = bmin.min(axis=0) - pad
        hi = bmax.max(axis=0) + pad
        cell = (hi - lo) / res
        axes = [lo[k] + (np.arange(res) + 0.5) * cell[k] for k in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"),
                       axis=-1).reshape(-1, 3).astype(np.float32)

        mean_albedo = float(np.asarray(gmm.albedo).mean())
        st = np.empty(pts.shape[0], np.float32)
        al = np.empty(pts.shape[0], np.float32)

        @jax.jit
        def eval_chunk(gmm, p):
            mt = gmm.mu_t(p)                                  # [B,N]
            s = jnp.sum(mt, axis=-1)
            sa = jnp.sum(mt * gmm.albedo, axis=-1)
            safe = jnp.where(s > 1e-25, s, 1.0)
            a = jnp.where(s > 1e-25, sa / safe, mean_albedo)
            return s, a

        for start in range(0, pts.shape[0], chunk):
            p = pts[start:start + chunk]
            npad = chunk - p.shape[0]
            if npad:
                p = np.concatenate([p, np.zeros((npad, 3), np.float32)])
            s, a = eval_chunk(gmm, jnp.asarray(p))
            end = start + chunk - npad
            st[start:end] = np.asarray(s)[:chunk - npad]
            al[start:end] = np.asarray(a)[:chunk - npad]

        shape = (res, res, res)
        return VoxelGrid.create(lo, hi, st.reshape(shape), al.reshape(shape))


def load_voxels(path, env_color=None):
    """Load a voxel scene from an .npz file.

    Keys: ``sigma_t`` [X,Y,Z] (required); optional ``albedo`` (scalar or
    [X,Y,Z]), ``lo``/``hi`` [3] (default unit cube), ``lights`` [L,6]
    (position + intensity rows), ``env_color`` [3].
    """
    from gvr_tpu.scene.scene import Scene, Light, DEFAULT_ENV_COLOR
    data = np.load(path)
    if "sigma_t" not in data:
        raise ValueError(f"voxel scene {path} lacks 'sigma_t' [X,Y,Z]")
    sigma_t = data["sigma_t"]
    albedo = data["albedo"] if "albedo" in data else 0.9
    lo = data["lo"] if "lo" in data else np.zeros(3, np.float32)
    hi = data["hi"] if "hi" in data else np.ones(3, np.float32)
    lights = [Light(row[0:3].astype(np.float32), row[3:6].astype(np.float32))
              for row in (data["lights"] if "lights" in data
                          else np.zeros((0, 6), np.float32))]
    if env_color is None:
        env_color = (tuple(data["env_color"]) if "env_color" in data
                     else DEFAULT_ENV_COLOR)
    grid = VoxelGrid.create(lo, hi, sigma_t, albedo)
    return Scene.create(grid, lights, env_color)
