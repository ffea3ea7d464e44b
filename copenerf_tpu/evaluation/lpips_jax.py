"""LPIPS (VGG16 backbone, v0.1 linear heads) in pure JAX.

Mirrors the reference's metric definition (``/root/reference/lpipsPyTorch/``:
``modules/lpips.py:8-36``, ``modules/networks.py:12-96``): VGG16 features at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, input rescaled by the LPIPS
shift/scale constants, channel-unit-normalized feature differences squared,
1x1 linear heads, spatial mean, summed over the 5 stages.

This zero-egress image ships no pretrained VGG weights, so weights are
ingested from user-provided files (``weights(vgg_path, lin_path)``):

  * ``vgg_path``: a torchvision ``vgg16`` state dict (``.pth``/``.pt``) or an
    ``.npz`` with the same ``features.N.weight/bias`` keys;
  * ``lin_path``: the LPIPS v0.1 linear-head state dict (``lin0.model.1.weight``
    ... ``lin4.model.1.weight``) as shipped by the PerceptualSimilarity repo
    (the reference downloads these at runtime,
    ``lpipsPyTorch/modules/utils.py:11-30``).

Search order for default weights: ``$COPENERF_LPIPS_VGG`` /
``$COPENERF_LPIPS_LIN`` env vars, then ``~/.cache/copenerf_tpu/lpips/``.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# torchvision vgg16 ``features`` conv indices, grouped by LPIPS stage.
_VGG16_STAGES = (
    (0, 2),              # -> relu1_2,  64 ch
    (5, 7),              # -> relu2_2, 128 ch
    (10, 12, 14),        # -> relu3_3, 256 ch
    (17, 19, 21),        # -> relu4_3, 512 ch
    (24, 26, 28),        # -> relu5_3, 512 ch
)
STAGE_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling layer constants (lpipsPyTorch/modules/networks.py).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _as_numpy_state(path: str) -> dict:
    """Load a torch state dict or an npz into {key: np.ndarray}."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_weights(vgg_path: str, lin_path: str) -> dict:
    """Build the LPIPS param pytree from torchvision-vgg16 + linear-head
    checkpoints. Conv weights stay in torch OIHW layout (used as-is by
    ``lax.conv_general_dilated``)."""
    vgg = _as_numpy_state(vgg_path)
    # Accept both bare ``features.N.*`` and full-model ``features.N.*`` keys.
    def vkey(i, leaf):
        for k in (f"features.{i}.{leaf}", f"{i}.{leaf}"):
            if k in vgg:
                return vgg[k]
        raise KeyError(f"vgg16 checkpoint missing features.{i}.{leaf}")

    stages = []
    for idxs in _VGG16_STAGES:
        stages.append([
            {"w": jnp.asarray(vkey(i, "weight"), jnp.float32),
             "b": jnp.asarray(vkey(i, "bias"), jnp.float32)}
            for i in idxs])

    lin = _as_numpy_state(lin_path)
    heads = []
    for s in range(5):
        for k in (f"lin{s}.model.1.weight", f"lin.{s}.model.1.weight"):
            if k in lin:
                heads.append(jnp.asarray(lin[k], jnp.float32))
                break
        else:
            raise KeyError(f"linear-head checkpoint missing lin{s}")
    return {"stages": stages, "heads": heads}


def _conv(x, w, b):
    # x (1, C, H, W), w OIHW -> SAME padding conv + bias. HIGHEST precision:
    # the protocol metric must match the reference's f32 torch convs on
    # every backend (TPU default conv is a bf16 pass; see metrics_image.ssim
    # for the failure mode that motivated pinning metric precision).
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NCHW", "OIHW",
                                                        "NCHW"),
                                     precision=jax.lax.Precision.HIGHEST)
    return y + b[None, :, None, None]


def _vgg_features(params, x):
    """x (1, 3, H, W) already scaled -> list of 5 stage activations."""
    feats = []
    for si, stage in enumerate(params["stages"]):
        for li, layer in enumerate(stage):
            x = jax.nn.relu(_conv(x, layer["w"], layer["b"]))
        feats.append(x)
        if si < 4:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f ** 2, axis=1, keepdims=True))
    return f / (norm + eps)


def lpips(params: dict, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) images in [0, 1] -> scalar LPIPS distance.

    Protocol quirk, reproduced deliberately: the reference feeds [0, 1]
    images straight into its in-tree LPIPS with NO [-1, 1] rescale
    (``eval.py:201-206`` -> ``lpipsPyTorch/modules/lpips.py:30`` z-scores
    the raw input). Standard LPIPS usage rescales first; matching the
    reference's published numbers requires matching its convention.
    """
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(im):
        im = im[None]                        # (1, 3, H, W), [0, 1] as-is
        return (im - shift) / scale

    f1 = _vgg_features(params, prep(img1))
    f2 = _vgg_features(params, prep(img2))
    total = jnp.zeros(())
    for a, b, head in zip(f1, f2, params["heads"]):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        val = _conv(diff, head, jnp.zeros(head.shape[0]))
        total = total + jnp.mean(val, axis=(2, 3))[0, 0]
    return total


def default_weight_paths():
    vgg = os.environ.get("COPENERF_LPIPS_VGG")
    lin = os.environ.get("COPENERF_LPIPS_LIN")
    cache = os.path.expanduser("~/.cache/copenerf_tpu/lpips")
    if vgg is None:
        for name in ("vgg16.pth", "vgg16.npz"):
            p = os.path.join(cache, name)
            if os.path.isfile(p):
                vgg = p
                break
    if lin is None:
        for name in ("vgg.pth", "lin_vgg.pth", "vgg.npz"):
            p = os.path.join(cache, name)
            if os.path.isfile(p):
                lin = p
                break
    return vgg, lin


def lpips_fn_jax():
    """Jitted (img1, img2) -> float callable, or None if no weights found."""
    vgg, lin = default_weight_paths()
    if vgg is None or lin is None:
        return None
    params = load_weights(vgg, lin)
    fn = jax.jit(lambda a, b: lpips(params, a, b))

    def compute(img1, img2):
        return float(fn(jnp.asarray(img1, jnp.float32),
                        jnp.asarray(img2, jnp.float32)))

    return compute
