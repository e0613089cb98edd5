"""Multi-host (DCN) execution-path test: two real OS processes join a
jax.distributed cluster over a loopback coordinator (2 hosts x 4 virtual
CPU devices), build the global 8-device mesh, and run a sharded
Monte-Carlo loop end-to-end.  Verifies the cli.py --multihost contract
(psum counter reduction spanning the process boundary = DCN) that round 1
had never executed."""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mc_step():
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/multihost_smoke.py"),
         "--launch", "2", "--port", str(_free_port())],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "multihost smoke OK" in r.stdout
