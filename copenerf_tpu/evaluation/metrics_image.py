"""Image metrics: PSNR, SSIM (CF3DGS-compatible), LPIPS (optional).

PSNR/SSIM mirror ``/root/reference/co3d_metric.py`` (stated copied from
NVlabs/CF-3DGS for comparability): per-image mean over an 11x11 Gaussian
window (sigma 1.5), same-padding conv. LPIPS requires pretrained VGG weights;
in this zero-egress environment it is attempted through the optional
``lpips`` torch package and skipped cleanly when unavailable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) images in [0, 1] -> scalar PSNR (co3d_metric.py:14-16)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """(C, H, W) -> scalar mean SSIM with per-channel Gaussian filtering and
    zero same-padding (co3d_metric.py:18-48).

    The window convs MUST run at HIGHEST precision: on TPU the default
    conv is a bf16 pass, and the moment cancellation E[x^2] - E[x]^2 in
    ~3 significant digits produces NEGATIVE window variances -> SSIM
    escapes [0, 1] entirely (observed 1.10, and 0.46-at-PSNR-35 in the
    round-3 e2e — on-device garbage, not image structure; CPU and HIGHEST
    agree at 0.96 on the same render). Metric cost is negligible, protocol
    exactness is not optional.
    """
    window = jnp.asarray(_gaussian_window(window_size))

    def conv(img):
        # (C, H, W), window (k, k); depthwise conv with SAME zero padding.
        return jax.vmap(lambda ch: jax.lax.conv_general_dilated(
            ch[None, None], window[None, None], (1, 1), "SAME",
            precision=jax.lax.Precision.HIGHEST)[0, 0])(img)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1 = conv(img1 * img1) - mu1_sq
    sigma2 = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2))
    return jnp.mean(ssim_map)


def lpips_fn(verbose: bool = True):
    """Return a callable (img1, img2) -> float LPIPS(vgg), or None when no
    pretrained backbone is available (zero-egress environment).

    Resolution order: the native JAX implementation with user-provided
    weights (see ``lpips_jax.default_weight_paths``), then the optional
    ``lpips`` torch package. Failures are REPORTED, never silently
    swallowed: a metric missing from the protocol triple must be visible.
    """
    import warnings

    def report(msg):
        if verbose:
            warnings.warn(f"LPIPS unavailable: {msg}", stacklevel=2)

    try:
        from .lpips_jax import default_weight_paths, lpips_fn_jax

        fn = lpips_fn_jax()
        if fn is not None:
            return fn
        vgg, lin = default_weight_paths()
        report(
            "no VGG16/linear-head weights found "
            f"(vgg={vgg!r}, lin={lin!r}); set COPENERF_LPIPS_VGG / "
            "COPENERF_LPIPS_LIN or place them under "
            "~/.cache/copenerf_tpu/lpips/")
    except Exception as exc:  # weight files present but unreadable
        report(f"native implementation failed to load weights: {exc!r}")
    try:
        import lpips as lpips_lib
        import torch

        net = lpips_lib.LPIPS(net="vgg")

        def compute(img1, img2):
            # No [-1, 1] rescale: the reference protocol feeds [0, 1]
            # images straight into the scaling layer (eval.py:201-206).
            a = torch.from_numpy(np.asarray(img1, np.float32))[None]
            b = torch.from_numpy(np.asarray(img2, np.float32))[None]
            with torch.no_grad():
                return float(net(a, b))

        return compute
    except ImportError:
        pass  # optional package; the native-path warning above stands
    except Exception as exc:
        report(f"torch lpips package failed: {exc!r}")
    return None
