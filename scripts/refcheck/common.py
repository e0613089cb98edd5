"""Shared pieces of the reference-binary validation harness.

One source of truth for the Profile.txt the harness feeds to the
reference's ``ReadProfile`` (reference CTool.cpp:588-621 parses fixed
token order) - previously copy-pasted in run_parity.py, run_fer.py and
tests/test_refbinary.py, which had already drifted on MaxIteration.
"""

from __future__ import annotations

import pathlib

REPO = pathlib.Path(__file__).resolve().parents[2]
BUILD = REPO / ".refbuild"
HARNESS = BUILD / "refharness"

PROFILE_TMPL = """Simulation parameter
StartSNR: 3
SNRPass: 0.1
EndSNR: 5
DecodeMethod: {method}
MaxIteration: {max_iter}
Modulation Parameter:
modType: 2
InterleaveModType: 1
NMS  Factor:
Factor_1: {f1}
Factor_2: {f2}
noFrames: 32
scale: 13
Matrix Factor
FileName: 50GPON-CP12
Z: 256
"""


def write_profile(workdir, method: int, f1: int, f2: int,
                  max_iter: int = 6) -> None:
    (pathlib.Path(workdir) / "Profile.txt").write_text(
        PROFILE_TMPL.format(method=int(method), f1=f1, f2=f2,
                            max_iter=max_iter))
