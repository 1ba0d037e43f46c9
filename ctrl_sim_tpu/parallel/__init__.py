"""Device meshes and GSPMD shardings for multi-chip / multi-host scaling."""

from ctrl_sim_tpu.parallel.mesh import MeshSpec, make_mesh

__all__ = ["MeshSpec", "make_mesh"]
