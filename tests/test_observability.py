"""Histograms, forensic error-frame replay, and iterCount reporting."""

import numpy as np
import jax
import jax.numpy as jnp

from faid_tpu.code.toy import toy_code
from faid_tpu.config import DecodeMethod, SimConfig
from faid_tpu.sim.pipeline import build_debug_step, build_sim_step
from faid_tpu.sim.runner import MonteCarloRunner


def cfg_at(**kw):
    base = dict(decode_method=DecodeMethod.FAID_DTBF, max_iteration=2,
                mod_type=2, batch_per_device=4, seed=3, fake_encode=True,
                min_frames=8, min_frame_errors=0, rounds_per_sync=2)
    base.update(kw)
    return SimConfig(**base)


def test_histograms_sum_to_frames():
    code = toy_code()
    cfg = cfg_at()
    step = jax.jit(build_sim_step(code, cfg))
    out = jax.tree.map(np.asarray,
                       step(jax.random.key(0), jnp.float32(cfg.sigma_at(2.0))))
    assert out["mp_hist"].sum() == out["test_frames"]
    assert out["bf_hist"].sum() == out["test_frames"]
    # mp_iters total must equal the histogram-weighted sum
    assert (out["mp_hist"] * np.arange(len(out["mp_hist"]))).sum() \
        == out["mp_iters"]


def test_debug_step_matches_sim_step_counts():
    """The forensic replay must reproduce the exact error counts of the
    hot-path step for the same key."""
    code = toy_code()
    cfg = cfg_at()
    step = jax.jit(build_sim_step(code, cfg))
    debug = jax.jit(build_debug_step(code, cfg))
    key = jax.random.key(7)
    sigma = jnp.float32(cfg.sigma_at(-3.0))  # noisy: guaranteed errors
    a = jax.tree.map(np.asarray, step(key, sigma))
    b = jax.tree.map(np.asarray, debug(key, sigma))
    assert a["error_bits"] == int(b["err_bits"].sum())
    assert a["error_frames"] == int((b["err_bits"] > 0).sum())


def test_runner_forensics_and_itercount(tmp_path):
    code = toy_code()
    cfg = cfg_at(snr_start=-3.0, snr_pass=1.0, snr_end=-2.0,
                 min_frames=8)
    r = MonteCarloRunner(cfg, code=code, max_rounds_per_snr=4)
    r.run()
    assert r.results[0].err_chunks, "low SNR must produce error chunks"
    r.write_itercount_txt(tmp_path / "iterCount.txt")
    txt = (tmp_path / "iterCount.txt").read_text()
    assert "mp_iters" in txt and "bf_rounds" in txt

    n = r.collect_error_frames(tmp_path, max_frames=16)
    assert n > 0
    idx = (tmp_path / "errorindex.txt").read_text()
    assert "frame" in idx and "b" in idx
    # every dumped line names at least one block+offset
    first = idx.splitlines()[0]
    assert " : b" in first
    # counted errors in the dump are consistent with the runner counters
    total_err_frames = r.results[0].counters["error_frames"]
    assert n <= max(total_err_frames, 16)
