from gvr_tpu.utils.image import psnr, mse

__all__ = ["psnr", "mse"]
