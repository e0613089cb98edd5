"""FAID V2C lookup tables as data.

The reference selects between three compiled-in LUT families with
``#define FAID3 / FAID32 / FAID2`` (reference CDecoder_FAID.cpp:8,12-127)
plus a dedicated family inside the 2B1C decoder
(CDecoder_FAID_2B1C.cpp:11-46) and a shared error-floor table
(CDecoder_FAID.cpp:133-168).  Here they are plain arrays indexed
``[iteration][weight_bucket][|v2c|]`` with the weight buckets
{3, 6, 11, other} (CDecoder_FAID.cpp:692-705) and magnitudes 0..7 where
index 7 doubles as the overflow bucket for |v2c| >= 8
(CDecoder_FAID.cpp:783-852).

All published rows are identical across weight buckets, so we store one
row per iteration and keep the bucket axis implicit; ``table_for`` expands
to the full [iters, 4, 8] shape if a future family differentiates buckets.
"""

from __future__ import annotations

import numpy as np

from ..config import FaidLutFamily

# [6 iterations, 8 magnitudes]; reference CDecoder_FAID.cpp:12-48 (FAID3).
_FAID3 = np.array([
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 4, 4, 4, 4],
    [0, 1, 1, 3, 3, 4, 4, 4],
    [0, 1, 1, 3, 3, 3, 6, 6],
    [0, 1, 1, 3, 3, 3, 7, 7],
], dtype=np.int8)

# reference CDecoder_FAID.cpp:50-88 (FAID32).
_FAID32 = np.array([
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 4, 4, 4, 4],
    [1, 1, 1, 1, 4, 4, 4, 4],
    [1, 1, 1, 1, 5, 5, 5, 5],
    [1, 1, 1, 1, 6, 6, 6, 6],
], dtype=np.int8)

# reference CDecoder_FAID.cpp:90-127 (FAID2).
_FAID2 = np.array([
    [0, 0, 2, 2, 2, 2, 2, 2],
    [0, 0, 2, 2, 2, 2, 2, 2],
    [1, 1, 1, 3, 3, 3, 3, 3],
    [1, 1, 1, 4, 4, 4, 4, 4],
    [1, 1, 1, 5, 5, 5, 5, 5],
    [1, 1, 1, 6, 6, 6, 6, 6],
], dtype=np.int8)

# reference CDecoder_FAID_2B1C.cpp:11-46.
_FAID_2B1C = np.array([
    [0, 0, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 2, 3, 3, 3, 3],
    [0, 1, 1, 3, 3, 4, 4, 4],
    [0, 1, 1, 3, 3, 3, 6, 6],
    [0, 1, 1, 3, 3, 3, 7, 7],
], dtype=np.int8)

# Error-floor table, identical for every iteration and family
# (reference CDecoder_FAID.cpp:133-168, CDecoder_FAID_2B1C.cpp:49-84).
EF_ROW = np.array([2, 3, 3, 4, 5, 6, 6, 7], dtype=np.int8)

_FAMILIES = {
    FaidLutFamily.FAID3: _FAID3,
    FaidLutFamily.FAID32: _FAID32,
    FaidLutFamily.FAID2: _FAID2,
    FaidLutFamily.FAID_2B1C: _FAID_2B1C,
}


def table_for(family: FaidLutFamily, max_iter: int) -> np.ndarray:
    """[max_iter, 8] int8; iterations beyond 6 reuse the last row
    (the reference switch's ``default`` case, CDecoder_FAID.cpp:772)."""
    base = _FAMILIES[family]
    if max_iter <= base.shape[0]:
        return base[:max_iter]
    extra = np.repeat(base[-1:], max_iter - base.shape[0], axis=0)
    return np.concatenate([base, extra], axis=0)


def ef_table(max_iter: int) -> np.ndarray:
    return np.repeat(EF_ROW[None, :], max_iter, axis=0)
