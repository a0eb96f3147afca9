from gvr_tpu.io.ppm import read_ppm, write_ppm
from gvr_tpu.io.gif import write_gif

__all__ = ["read_ppm", "write_ppm", "write_gif"]
