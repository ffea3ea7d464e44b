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


def _install_torchvision_stub():
    """Stub the absent torchvision package: utils/transforms placeholders
    plus a REAL ``models.vgg16`` (standard architecture, torch.nn layers,
    random init) so the reference's in-tree LPIPS can be instantiated."""
    import types

    if "torchvision" in sys.modules and hasattr(sys.modules["torchvision"],
                                                "models"):
        return
    import torch.nn as nn

    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")

        def _flow_to_image(flow):
            # Magnitude visualization stand-in for torchvision's HSV
            # encoding: render_visdata only saves the result as a debug
            # image. (A bare None is NOT enough: the reference's
            # try/except fallback at model/training.py:302-303 calls
            # torch.zeros_like on a numpy array and crashes.)
            import torch as _t

            mag = _t.linalg.norm(flow.float(), dim=0, keepdim=True)
            return (mag / (mag.max() + 1e-6) * 255).to(
                _t.uint8).repeat(3, 1, 1)

        tvu.flow_to_image = _flow_to_image
        tvt = types.ModuleType("torchvision.transforms")
        tv.utils, tv.transforms = tvu, tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        sys.modules["torchvision.transforms"] = tvt

    models = types.ModuleType("torchvision.models")

    def vgg16(weights=None, pretrained=False, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(c_in, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                c_in = v
        obj = types.SimpleNamespace(features=nn.Sequential(*layers))
        return obj

    models.vgg16 = vgg16
    models.VGG16_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = models
    sys.modules["torchvision.models"] = models


def setup_reference_trainer_env():
    """Full environment to drive the reference *training driver* on CPU:
    torchvision stub, populated ``model`` package attributes, cuda->cpu
    patches, and cpu-mapped ``torch.load``. Returns the loaded reference
    ``train`` module (cached)."""
    add_reference_to_path()
    _install_torchvision_stub()

    import matplotlib

    matplotlib.use("Agg")

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    # Module.cuda is hit by the reference's pose refinement (:87) and
    # eval-time pose optimization (eval.py:52).
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not getattr(torch, "_copenerf_cpu_patched", False):
        torch._copenerf_cpu_patched = True
        orig_tensor_to = torch.Tensor.to
        orig_module_to = torch.nn.Module.to
        orig_load = torch.load

        def cpu_args(args, kwargs):
            args = tuple(
                "cpu" if (isinstance(a, str) and a.startswith("cuda"))
                or (isinstance(a, torch.device) and a.type == "cuda")
                else a for a in args)
            dev = kwargs.get("device")
            if (isinstance(dev, str) and dev.startswith("cuda")) or (
                    isinstance(dev, torch.device) and dev.type == "cuda"):
                kwargs = dict(kwargs, device="cpu")
            return args, kwargs

        def tensor_to(self, *args, **kwargs):
            args, kwargs = cpu_args(args, kwargs)
            return orig_tensor_to(self, *args, **kwargs)

        def module_to(self, *args, **kwargs):
            args, kwargs = cpu_args(args, kwargs)
            return orig_module_to(self, *args, **kwargs)

        def load_cpu(*a, **k):
            k.setdefault("map_location", "cpu")
            return orig_load(*a, **k)

        torch.Tensor.to = tensor_to
        torch.nn.Module.to = module_to
        torch.load = load_cpu

    import model
    from model.checkpoints import CheckpointIO
    from model.losses import EdgePreservingSmoothnessLoss, SmoothnessLoss
    from model.neus_fields import (NeRF, MotionNetwork, RenderingNetwork,
                                   SDFNetwork, SingleVarianceNetwork)
    from model.neus_renderer import NeuSRenderer
    from model.poses_retriever import PoseRetriever
    from model.training import Trainer

    for name, obj in [
            ("CheckpointIO", CheckpointIO), ("Trainer", Trainer),
            ("EdgePreservingSmoothnessLoss", EdgePreservingSmoothnessLoss),
            ("SmoothnessLoss", SmoothnessLoss), ("NeRF", NeRF),
            ("MotionNetwork", MotionNetwork),
            ("RenderingNetwork", RenderingNetwork),
            ("SDFNetwork", SDFNetwork),
            ("SingleVarianceNetwork", SingleVarianceNetwork),
            ("NeuSRenderer", NeuSRenderer),
            ("PoseRetriever", PoseRetriever)]:
        setattr(model, name, obj)

    if "ref_train" not in sys.modules:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_train", os.path.join(REFERENCE_ROOT, "train.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_train"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_train"]
