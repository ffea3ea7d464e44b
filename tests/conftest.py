import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax is imported; the
# sitecustomize in this image force-registers the axon TPU backend, so the
# platform is also overridden programmatically below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Field-network parity against the fp32 PyTorch oracle needs exact fp32
# matmuls (the TPU default is bf16-pass matmul).
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the PyTorch reference importable as a golden-value oracle.

    The reference's ``model/__init__.py`` imports torchvision (absent here),
    so register ``model`` as a stub package whose submodules resolve from the
    reference tree without executing the real ``__init__``.
    """
    import types

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "model" not in sys.modules:
        stub = types.ModuleType("model")
        stub.__path__ = [os.path.join(REFERENCE_ROOT, "model")]
        sys.modules["model"] = stub
    # Stub third-party deps of the reference absent from this image.
    if "mcubes" not in sys.modules:
        mcubes = types.ModuleType("mcubes")

        def _mc_unavailable(*a, **k):
            raise RuntimeError("mcubes unavailable in test env")

        mcubes.marching_cubes = _mc_unavailable
        sys.modules["mcubes"] = mcubes
    if "icecream" not in sys.modules:
        icecream = types.ModuleType("icecream")
        icecream.ic = lambda *a, **k: None
        sys.modules["icecream"] = icecream
