"""Small synthetic QC-LDPC codes for tests and the multi-chip dry run.

Same structural family as the 50G-PON code (QC with shifted-identity
blocks, mixed column weights including weight-3 VNs so the DTBF flip rule
has eligible targets) but tiny, so full-pipeline graphs compile in
seconds.  Deterministic: the generator searches seeds until the parity
submatrix H_p is invertible over GF(2) (required by the systematic
encoder, code/encoder.py)."""

from __future__ import annotations

import functools

import numpy as np

from .encoder import solve_parity_projection
from .qc_matrix import QCCode


@functools.lru_cache(maxsize=4)
def toy_code(z: int = 8, n_block_cols: int = 12, n_block_rows: int = 4,
             row_degree: int = 6, seed: int = 0) -> QCCode:
    rng_seed = seed
    for _ in range(64):
        rng = np.random.default_rng(rng_seed)
        block_cols, shifts = [], []
        n_par = n_block_rows
        par = n_block_cols - n_par + np.arange(n_par)
        for r in range(n_block_rows):
            # Lower block-bidiagonal parity part (par[r-1], par[r]) keeps
            # H_p triangular with invertible diagonal blocks - the closed
            # dual-diagonal cycle is singular over GF(2), so the cycle is
            # deliberately broken at row 0.
            par_cols = [par[r]] if r == 0 else [par[r - 1], par[r]]
            info = rng.choice(n_block_cols - n_par,
                              size=row_degree - len(par_cols), replace=False)
            cols = np.sort(np.concatenate([info, par_cols]))
            block_cols.append(tuple(int(c) for c in cols))
            shifts.append(tuple(int(s) for s in
                                rng.integers(0, z, size=len(cols))))
        code = QCCode(
            name=f"toy_z{z}_c{n_block_cols}_r{n_block_rows}_s{rng_seed}",
            z=z, n_var=n_block_cols * z, n_chk=n_block_rows * z,
            block_cols=tuple(block_cols), shifts=tuple(shifts),
            degrees=tuple(len(c) for c in block_cols))
        if code.vn_weight_np.min() == 0:
            rng_seed += 1
            continue
        try:
            solve_parity_projection(code.h_dense(), code.n_info)
        except ValueError:
            rng_seed += 1
            continue
        return code
    raise RuntimeError("no invertible toy code found")


def toy_encoder_matrix(code: QCCode) -> np.ndarray:
    """Uncached encoder projection for toy codes (small, recompute)."""
    return solve_parity_projection(code.h_dense(), code.n_info)
