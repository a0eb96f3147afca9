from gvr_tpu.scene.gaussians import GaussianMixture
from gvr_tpu.scene.spheres import SphereMixture
from gvr_tpu.scene.voxels import VoxelGrid, load_voxels
from gvr_tpu.scene.scene import Scene, Light, load_scene, load_gmm, load_smm

__all__ = [
    "GaussianMixture",
    "SphereMixture",
    "VoxelGrid",
    "Scene",
    "Light",
    "load_scene",
    "load_gmm",
    "load_smm",
    "load_voxels",
]
