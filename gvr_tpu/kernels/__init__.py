from gvr_tpu.kernels.pathtrace import bounce_step_pallas, pallas_available

__all__ = ["bounce_step_pallas", "pallas_available"]
