"""Model families: CtRL-Sim transformer (+ DT / IL / trajeglish variants)
and the CTG++ diffusion baseline, in flax.linen."""

from ctrl_sim_tpu.models.ctrl_sim import CtRLSim

__all__ = ["CtRLSim"]
