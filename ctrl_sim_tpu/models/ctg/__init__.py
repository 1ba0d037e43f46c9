"""CTG++ diffusion baseline: DiT trunk, Gaussian diffusion, RTG model."""

from ctrl_sim_tpu.models.ctg.diffusion import GaussianDiffusion
from ctrl_sim_tpu.models.ctg.dit import DiT
from ctrl_sim_tpu.models.ctg.rtg_model import RTGModel

__all__ = ["DiT", "GaussianDiffusion", "RTGModel"]
