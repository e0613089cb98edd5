from .mesh import build_sharded_sim_step, make_mesh

__all__ = ["build_sharded_sim_step", "make_mesh"]
