"""On-hardware test suite (run OUTSIDE tests/: that conftest forces CPU).

Usage, each round, on the machine with the TPU attached:

    python -m pytest tpu_tests -q

Tests here self-skip when no TPU backend is available, so the command is
safe anywhere; on hardware it machine-checks the compiled Pallas kernels
against the XLA f32 oracle and writes ``KERNEL_NUMERICS.json`` at the repo
root (committed per round beside BENCH_r0N.json).
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO_ROOT, os.path.join(REPO_ROOT, "benchmarks")):
    if p not in sys.path:
        sys.path.insert(0, p)
