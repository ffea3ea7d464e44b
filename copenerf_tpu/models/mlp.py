"""Weight-normalized linear layers as param pytrees.

The reference wraps every field-network ``nn.Linear`` in
``nn.utils.weight_norm`` (``/root/reference/model/neus_fields.py:135-138,
261-264, 339-340``), storing ``weight_v`` (out, in) and ``weight_g`` (out, 1)
with the effective weight ``W = g * v / ||v||_row``.

Here a layer is a dict ``{"v": (in, out), "g": (out,), "b": (out,)}`` — the
``(in, out)`` layout feeds ``x @ W`` directly (the natural MXU orientation).
``g``/``v`` semantics are identical, so torch checkpoints map over by a single
transpose (see ``torch_io.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Params = dict


def make_linear(key, d_in: int, d_out: int, weight_norm: bool = True,
                init: str = "torch_default", *, mean: float = 0.0,
                std: float | None = None, bias_const: float | None = None,
                zero_in_cols=None, normal_in_cols=None) -> Params:
    """Create one linear layer's params.

    init modes:
      "torch_default": W ~ U(-1/sqrt(in), 1/sqrt(in)), b ~ same (nn.Linear default).
      "normal": W ~ N(mean, std), bias = bias_const (or 0).
    ``zero_in_cols``: slice of *input* dims whose weights start at zero
    (geometric-init PE masking). ``normal_in_cols``: slice of input dims drawn
    N(0, std) when the rest are zeroed.
    """
    kw, kb = jax.random.split(key)
    if init == "torch_default":
        bound = 1.0 / np.sqrt(d_in)
        w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)
        b = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    elif init == "normal":
        w = mean + std * jax.random.normal(kw, (d_in, d_out), jnp.float32)
        b = jnp.full((d_out,), 0.0 if bias_const is None else bias_const,
                     jnp.float32)
        if zero_in_cols is not None:
            mask = np.ones((d_in, 1), np.float32)
            mask[zero_in_cols] = 0.0
            w = w * jnp.asarray(mask)
    else:
        raise ValueError(init)

    if not weight_norm:
        return {"w": w, "b": b}
    g = jnp.linalg.norm(w, axis=0)  # per-output-column norm (torch row norm)
    return {"v": w, "g": g, "b": b}


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "v" in p:
        v = p["v"]
        # Effective weight: g * v / ||v|| with the norm over the input axis.
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (p["g"][None, :] / norm)
    else:
        w = p["w"]
    return x @ w + p["b"]


def effective_weight(p: Params) -> jnp.ndarray:
    """Materialize the (in, out) effective weight of a layer."""
    if "v" in p:
        norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        return p["v"] * (p["g"][None, :] / norm)
    return p["w"]


def softplus(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Numerically-stable softplus with beta (torch nn.Softplus semantics:
    reverts to identity for beta*x > 20)."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)
