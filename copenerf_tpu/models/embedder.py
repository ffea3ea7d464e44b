"""NeRF positional encoding.

Output layout matches the reference embedder
(``/root/reference/model/neus_embedder.py:6-51``): for multires ``m`` and
``d``-dim input, the encoding is

    [x, sin(x * 2^0), cos(x * 2^0), ..., sin(x * 2^(m-1)), cos(x * 2^(m-1))]

i.e. the raw input followed by per-frequency sin/cos blocks (frequency-major,
sin before cos), giving ``d * (1 + 2m)`` output channels.

Implemented as a single fused broadcast + sin/cos + reshape so XLA lowers it to
one elementwise fusion instead of 2m separate ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def embed_dim(multires: int, input_dims: int) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode ``x`` of shape (..., d) -> (..., d * (1 + 2 * multires)).

    Frequencies are log-sampled: 2^0 .. 2^(multires-1).
    """
    if multires <= 0:
        return x
    d = x.shape[-1]
    freqs = np.asarray([2.0 ** k for k in range(multires)], dtype=np.float32)
    # (..., m, d): each frequency scales the full input vector.
    xf = x[..., None, :] * jnp.asarray(freqs)[:, None]
    s = jnp.sin(xf)
    c = jnp.cos(xf)
    # Interleave sin/cos per frequency: (..., m, 2, d) -> (..., 2*m*d).
    sc = jnp.stack([s, c], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * d)
    return jnp.concatenate([x, sc], axis=-1)
