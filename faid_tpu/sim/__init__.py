from .pipeline import build_sim_step
from .runner import MonteCarloRunner, SnrResult, snr_points

__all__ = ["build_sim_step", "MonteCarloRunner", "SnrResult", "snr_points"]
