"""Per-round on-hardware gate: COMPILED Pallas kernels vs the XLA oracle.

The CI suite (tests/) validates the fused kernels in interpreter mode only
(conftest forces CPU); a Mosaic compiler update could change compiled
behavior between rounds without any CPU test noticing. This gate runs the
three-way comparison from ``benchmarks/check_fused_on_hw.py`` — fused
kernels vs XLA-default vs the f32-HIGHEST oracle, full render outputs AND
train-step loss + parameter-gradient cosine — on the real chip, asserts
the fused error stays within 3x of XLA-default's own bf16 error, and
writes the machine-readable report to ``KERNEL_NUMERICS.json``.
"""

import json
import os

import pytest

import conftest


def _tpu_available() -> bool:
    import jax

    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@pytest.mark.tpu
def test_fused_kernels_match_oracle_on_hardware():
    if not _tpu_available():
        pytest.skip("no TPU backend (run `python -m pytest tpu_tests` "
                    "on hardware)")
    from check_fused_on_hw import run_check

    report = run_check()
    out_path = os.path.join(conftest.REPO_ROOT, "KERNEL_NUMERICS.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    assert report["ok"], report
