from gvr_tpu.inverse.fit import fit_gaussians, fit_loss, FitState
from gvr_tpu.inverse.sfd import sfd_gradient

__all__ = ["fit_gaussians", "fit_loss", "FitState", "sfd_gradient"]
