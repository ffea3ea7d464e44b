"""NeRF positional encoding.

Output layout matches the reference embedder
(``/root/reference/model/neus_embedder.py:6-51``): for multires ``m`` and
``d``-dim input, the encoding is

    [x, sin(x * 2^0), cos(x * 2^0), ..., sin(x * 2^(m-1)), cos(x * 2^(m-1))]

i.e. the raw input followed by per-frequency sin/cos blocks (frequency-major,
sin before cos), giving ``d * (1 + 2m)`` output channels.

TPU layout note: the naive formulation (broadcast to (..., m, d), sin/cos,
reshape, concat) puts the transcendentals on lane-width ``d`` (= 4 for the
SDF net, 1 for the motion net) vectors — using 4/128 of the VPU. Instead we
expand to the FULL output width with one tiny constant matmul
``x @ E  (d, D)`` where E holds the per-column frequency factor, evaluate
sin/cos on the wide array once, and blend with constant column masks. Same
math, full lane occupancy (~10x fewer VPU cycles at renderer shapes); the
backward (cos/sin of the same wide array) inherits the layout win.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def embed_dim(multires: int, input_dims: int) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


@functools.lru_cache(maxsize=None)
def _expansion_consts(multires: int, d: int):
    """Constant (d, D) expansion matrix + (D,) masks for raw/sin/cos columns.

    Column layout matches the reference embedder
    (``/root/reference/model/neus_embedder.py:23-36``):
    ``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(m-1) x), cos(2^(m-1) x)]``.
    """
    D = embed_dim(multires, d)
    expand = np.zeros((d, D), np.float32)
    m_raw = np.zeros((D,), np.float32)
    m_sin = np.zeros((D,), np.float32)
    m_cos = np.zeros((D,), np.float32)
    for j in range(d):
        expand[j, j] = 1.0
        m_raw[j] = 1.0
    col = d
    for k in range(multires):
        f = 2.0 ** k
        for j in range(d):
            expand[j, col] = f
            m_sin[col] = 1.0
            expand[j, col + d] = f
            m_cos[col + d] = 1.0
            col += 1
        col += d
    return expand, m_raw, m_sin, m_cos


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode ``x`` of shape (..., d) -> (..., d * (1 + 2 * multires)).

    Frequencies are log-sampled: 2^0 .. 2^(multires-1).
    """
    if multires <= 0:
        return x
    d = x.shape[-1]
    expand, m_raw, m_sin, m_cos = _expansion_consts(multires, d)
    # Wide array via d broadcast multiply-adds (exact f32 — a matmul would
    # run at TPU default bf16 precision and corrupt sin(2^k x) for large k).
    a = x[..., :1] * jnp.asarray(expand[0])
    for j in range(1, d):
        a = a + x[..., j:j + 1] * jnp.asarray(expand[j])
    return (jnp.asarray(m_raw) * a + jnp.asarray(m_sin) * jnp.sin(a)
            + jnp.asarray(m_cos) * jnp.cos(a))
