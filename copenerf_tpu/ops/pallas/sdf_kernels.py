"""Fused Pallas TPU kernels for the SDF field: forward, forward+input-grad,
and a hand-derived full backward (double-backprop) under ``jax.custom_vjp``.

Why: the SDF MLP (9 weight-normed linears, 256 wide) is the hot path of the
renderer (reference ``model/neus_renderer.py:352-357`` queries it 3x per
sample including ``gradient()`` autograd-in-forward). Under XLA each linear
round-trips (N, 256) activations through HBM, capping the chain at ~30 TF/s;
fusing all layers into one kernel keeps activations in VMEM and runs the
matmuls at bf16 MXU rates (~80 TF/s measured), with f32 accumulation.

Three entry points (built per SDFConfig, cached):

  * ``fwd_value(Ws, bs, x)    -> sdf (N,)``       — no AD; for the no-grad
    importance-sampling sweeps (reference wraps them in torch.no_grad).
  * ``fwd_out(Ws, bs, x)      -> out (N, d_out)`` — custom_vjp, first-order
    backward kernel (standard backprop); for e.g. the sdf-consistency loss.
  * ``fwd_outgrad(Ws, bs, x)  -> (out (N, d_out), grad (N, d_in))`` —
    custom_vjp whose backward kernel implements the SECOND-ORDER math: the
    cotangent of ``grad`` (eikonal / sdf-flow / color-net uses) is pushed
    through the gradient computation graph (double backprop), hand-derived
    and validated against ``jax.vjp`` of the reference formulation.
    ``grad``'s dependence on ``x`` is severed, matching the reference's
    ``pts_time.detach()`` before ``autograd.grad`` (neus_renderer.py:356).

The backward runs a two-channel down-sweep: channel A carries the value-path
cotangent (reaches ``x_bar``); channel B carries the double-backprop
injections (their flow to ``x`` is severed, but their weight/bias gradients
are kept). Weight/bias gradients are accumulated across the (sequential)
grid in VMEM-resident f32 output blocks.

Weights enter as EFFECTIVE weights (weight-norm materialized by the caller
in XLA — a negligible (in, out) op); autodiff from ``W_bar`` to the
``v``/``g`` weight-norm parameters happens outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

INV_SQRT2 = float(1.0 / np.sqrt(2.0))
DEFAULT_TILE = 256


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Static layer geometry derived from an SDFConfig
# ---------------------------------------------------------------------------

class _Geom:
    def __init__(self, cfg):
        dims = cfg.dims
        self.n_lin = len(dims) - 1
        self.d_in = cfg.d_in
        self.d0 = dims[0]
        self.d_out = dims[-1]
        self.scale = float(cfg.scale)
        self.multires = int(cfg.multires)
        self.freqs = [2.0 ** k for k in range(self.multires)]
        self.skip = set(cfg.skip_in)
        self.in_dims, self.out_dims = [], []
        for l in range(self.n_lin):
            od = dims[l + 1] - dims[0] if (l + 1) in self.skip else dims[l + 1]
            self.in_dims.append(dims[l])
            self.out_dims.append(od)
        # Wide-PE constants (full-lane sin/cos; see models/embedder.py).
        d, D = self.d_in, self.d0
        expand = np.zeros((d, D), np.float32)
        m_raw = np.zeros((1, D), np.float32)
        m_sin = np.zeros((1, D), np.float32)
        m_cos = np.zeros((1, D), np.float32)
        for j in range(d):
            expand[j, j] = 1.0
            m_raw[0, j] = 1.0
        col = d
        for f in self.freqs:
            for j in range(d):
                expand[j, col] = f
                m_sin[0, col] = 1.0
                expand[j, col + d] = f
                m_cos[0, col + d] = 1.0
                col += 1
            col += d
        self.expand, self.m_raw, self.m_sin, self.m_cos = (
            expand, m_raw, m_sin, m_cos)
        # Single packed constant input for kernels (Pallas forbids captured
        # array constants): rows [0:d]=expand, d=m_raw, d+1=m_sin, d+2=m_cos.
        self.pe_consts = np.concatenate([expand, m_raw, m_sin, m_cos], 0)


def _pe_parts(xs, pec, geom: _Geom):
    """Return (e, jwide): the embedding and the per-column jacobian factor
    de/da — everything at full lane width, sin/cos evaluated once. ``pec``
    is the packed constants value (see _Geom.pe_consts)."""
    if geom.multires <= 0:
        return xs, jnp.ones_like(xs)
    d = geom.d_in
    a = xs[:, :1] * pec[0]
    for j in range(1, d):
        a = a + xs[:, j:j + 1] * pec[j]
    sin_a = jnp.sin(a)
    cos_a = jnp.cos(a)
    m_raw, m_sin, m_cos = pec[d:d + 1], pec[d + 1:d + 2], pec[d + 2:d + 3]
    e = m_raw * a + m_sin * sin_a + m_cos * cos_a
    jwide = m_raw + m_sin * cos_a - m_cos * sin_a
    return e, jwide


def _pe_jac_T(jwide, ee, pec, geom: _Geom):
    """J_pe^T @ ee per row: wide elementwise product, then the constant
    expansion matrix collapses D -> d_in on the MXU."""
    if geom.multires <= 0:
        return ee * jwide
    return jax.lax.dot_general(
        (ee * jwide).astype(jnp.float32), pec[:geom.d_in],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _pe_jac(jwide, gbar, pec, geom: _Geom):
    """J_pe @ gbar: expand a d_in cotangent to the wide layout."""
    if geom.multires <= 0:
        return gbar * jwide
    wide = jax.lax.dot_general(
        gbar.astype(jnp.float32), pec[:geom.d_in],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return wide * jwide


def _softplus100(z):
    bz = 100.0 * z
    return jnp.where(bz > 20.0, z, jax.nn.softplus(bz) / 100.0)


def _sig100(z):
    return jax.nn.sigmoid(100.0 * z)


def _sig_softplus100(z):
    """(sigmoid(100 z), softplus(100 z)/100) from ONE shared exp.

    The activation chain is the VPU-bound part of the fused kernels
    (README "Speed of light"); computing sigmoid and softplus separately
    costs two exps + one log per element. Stable shared form:
    with u = -|100 z| (so exp(u) <= 1 never overflows),
      sigmoid(100 z)      = z > 0 ?  1/(1+e^u)  :  e^u/(1+e^u)
      softplus(100 z)/100 = max(z, 0) + log1p(e^u)/100
    — one exp + one log1p, equal to the separate forms to f32 rounding.
    """
    eu = jnp.exp(-jnp.abs(100.0 * z))
    inv = 1.0 / (1.0 + eu)
    sig = jnp.where(z > 0, inv, eu * inv)
    sp = jnp.maximum(z, 0.0) + jnp.log1p(eu) * 0.01
    return sig, sp


# Kernel matmul input dtype. f32 + DEFAULT precision is the sweet spot on
# v5e: measured as fast as bf16 single-pass inside kernels AND bit-identical
# to XLA's default f32 matmuls — bf16 inputs are ~1e-2 off on the SDF value,
# which the sharpened NeuS alpha (|error| * inv_s ~ O(1)) cannot tolerate
# (training stalls; verified empirically). bf16 remains available for
# experiments via this knob.
_COMPUTE_DTYPE = jnp.float32


def _bf(x):
    return x.astype(_COMPUTE_DTYPE)


def _prec():
    # DEFAULT everywhere: HIGHEST forces a slow multi-pass (6x) and is
    # rejected outright for bf16 inputs by the TPU kernel compiler.
    return jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jax.lax.dot_general(_bf(a), _bf(b), (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec())


def _dot_t(a, w):
    """a @ w^T with low-precision inputs, f32 accumulation."""
    return jax.lax.dot_general(_bf(a), _bf(w), (((a.ndim - 1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec())


def _outer_acc(p, q):
    """(T, in)^T @ (T, out) -> (in, out) f32."""
    return jax.lax.dot_general(_bf(p), _bf(q), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec())


# ---------------------------------------------------------------------------
# Kernel bodies (shared forward/grad-sweep helpers, traced per tile)
# ---------------------------------------------------------------------------

def _forward_tile(x, pec, w_refs, b_refs, geom: _Geom, keep: bool,
                  value_only: bool = False, keep_ts: bool | None = None):
    """Forward over one tile. Returns (z_last, saved) where saved is
    (jwide, e, ts, sigs); sigs populated when ``keep``, ts when ``keep_ts``
    (defaults to ``keep``; forward-only kernels need sigs for the gradient
    sweep but never ts — not saving them frees VMEM). With ``value_only``
    the last layer multiplies only W_last[:, :1] (SDF head)."""
    if keep_ts is None:
        keep_ts = keep
    xs = x * geom.scale
    e, jwide = _pe_parts(xs, pec, geom)
    h = e
    ts, sigs = [], []
    for l in range(geom.n_lin):
        t = (jnp.concatenate([h, e], axis=-1) * INV_SQRT2
             if l in geom.skip else h)
        if keep_ts:
            ts.append(t)
        w_l, b_l = w_refs[l][:], b_refs[l][:]
        if value_only and l == geom.n_lin - 1:
            w_l, b_l = w_l[:, :1], b_l[:, :1]
        z = _dot(t, w_l) + b_l
        if l < geom.n_lin - 1:
            s, h = _sig_softplus100(z)
            if keep:
                sigs.append(s)
        else:
            h = z
    return h, (jwide, e, ts, sigs)


def _grad_sweep_tile(w_refs, sigs, geom: _Geom, n_rows: int, keep: bool):
    """Input-gradient reverse sweep. Returns (ee, rs, qs)."""
    n = geom.n_lin
    r = jnp.broadcast_to(
        jnp.transpose(w_refs[n - 1][:, 0:1]).astype(jnp.float32),
        (n_rows, geom.in_dims[n - 1]))
    rs = {n - 1: r}
    qs = {}
    ee_skip = None
    for l in range(n - 2, -1, -1):
        q = rs[l + 1] * sigs[l]
        if keep:
            qs[l] = q
        p = _dot_t(q, w_refs[l][:])
        if l in geom.skip:
            rs[l] = p[:, :geom.out_dims[l - 1]] * INV_SQRT2
            ee_skip = p[:, geom.out_dims[l - 1]:] * INV_SQRT2
        else:
            rs[l] = p
    ee = rs[0] if ee_skip is None else rs[0] + ee_skip
    return ee, rs, qs


# ---------------------------------------------------------------------------
# pallas_call builders
# ---------------------------------------------------------------------------

def _common_specs(geom: _Geom, tile: int, Ws, bs, pl, pltpu):
    in_specs = [pl.BlockSpec((tile, geom.d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(geom.pe_consts.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in Ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


@functools.lru_cache(maxsize=32)
def _build(cfg, tile: int, interpret: bool):
    """Build the three fused callables for one SDFConfig."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geom = _Geom(cfg)
    n = geom.n_lin

    # ---------------- forward (value-only) ----------------
    def value_kernel(*refs):
        x_ref, pec_ref = refs[0], refs[1]
        w_refs = refs[2:2 + n]
        b_refs = refs[2 + n:2 + 2 * n]
        out_ref = refs[-1]
        z, _ = _forward_tile(x_ref[:], pec_ref[:], w_refs, b_refs, geom,
                             keep=False)
        out_ref[:] = z[:, :1] / geom.scale

    # ---------------- forward (full output [+ grad] / value-only) --------
    def make_fwd_kernel(with_grad: bool, value_only: bool = False):
        def kernel(*refs):
            x_ref, pec_ref = refs[0], refs[1]
            w_refs = refs[2:2 + n]
            b_refs = refs[2 + n:2 + 2 * n]
            if with_grad:
                out_ref, grad_ref = refs[-2], refs[-1]
            else:
                out_ref = refs[-1]
            pec = pec_ref[:]
            z, (jwide, e, ts, sigs) = _forward_tile(
                x_ref[:], pec, w_refs, b_refs, geom, keep=with_grad,
                value_only=value_only, keep_ts=False)
            if value_only:
                out_ref[:] = z / geom.scale
            else:
                out_ref[:] = jnp.concatenate(
                    [z[:, :1] / geom.scale, z[:, 1:]], axis=-1)
            if with_grad:
                ee, _, _ = _grad_sweep_tile(w_refs, sigs, geom,
                                            x_ref.shape[0], keep=False)
                grad_ref[:] = _pe_jac_T(jwide, ee, pec, geom)
        return kernel

    # ---------------- backward ----------------
    def make_bwd_kernel(second_order: bool, value_only: bool = False):
        """Inputs: x, O_bar[, G_bar], Ws, bs.
        Outputs: x_bar, W_bar x n, b_bar x n (accumulated across grid).
        With ``value_only``, O_bar is (T, 1) (SDF head only): the last layer's
        sweeps use W_last[:, :1] and its weight/bias grads are zero-padded to
        the full (in, d_out)/(1, d_out) blocks."""
        assert not (second_order and value_only)

        def kernel(*refs):
            x_ref = refs[0]
            pec_ref = refs[1]
            obar_ref = refs[2]
            off = 3
            if second_order:
                gbar_ref = refs[3]
                off = 4
            w_refs = refs[off:off + n]
            b_refs = refs[off + n:off + 2 * n]
            outs = refs[off + 2 * n:]
            xbar_ref = outs[0]
            wbar_refs = outs[1:1 + n]
            bbar_refs = outs[1 + n:1 + 2 * n]

            i = pl.program_id(0)
            n_rows = x_ref.shape[0]
            pec = pec_ref[:]

            z_last, (jwide, e, ts, sigs) = _forward_tile(
                x_ref[:], pec, w_refs, b_refs, geom, keep=True,
                value_only=value_only)

            wb = [None] * n
            bb = [None] * n

            z_hat_B = [None] * (n - 1)
            if second_order:
                # keep=False: q_l == rs[l+1]*sigs[l] is recomputed in the
                # up-sweep instead of held live (VMEM headroom).
                ee, rs, _ = _grad_sweep_tile(w_refs, sigs, geom, n_rows,
                                             keep=False)
                ee_hat = _pe_jac(jwide, gbar_ref[:], pec, geom)
                r_hat = ee_hat
                for l in range(0, n - 1):
                    if l in geom.skip:
                        p_hat = jnp.concatenate(
                            [r_hat * INV_SQRT2, ee_hat * INV_SQRT2], axis=-1)
                    else:
                        p_hat = r_hat
                    q_hat = _dot(p_hat, w_refs[l][:])
                    wb[l] = _outer_acc(p_hat, rs[l + 1] * sigs[l])
                    r_hat = q_hat * sigs[l]
                    z_hat_B[l] = ((q_hat * rs[l + 1]) * 100.0 * sigs[l]
                                  * (1.0 - sigs[l]))
                # r_{n-1} = broadcast of W_last[:, 0]
                wlast_col0_bar = jnp.sum(r_hat, axis=0)[:, None]  # (in, 1)

            # combined value sweep: channel A (-> x_bar) + channel B
            if value_only:
                scale_vec = jnp.full((1, 1), 1.0 / geom.scale, jnp.float32)
            else:
                scale_vec = jnp.concatenate(
                    [jnp.full((1, 1), 1.0 / geom.scale, jnp.float32),
                     jnp.ones((1, geom.d_out - 1), jnp.float32)], axis=-1)
            z_A = obar_ref[:] * scale_vec
            z_B = jnp.zeros_like(z_A) if second_order else None
            e_hat = jnp.zeros_like(e)
            for l in range(n - 1, -1, -1):
                w_l = w_refs[l][:]
                if value_only and l == n - 1:
                    w_l = w_l[:, :1]
                z_tot = z_A + z_B if second_order else z_A
                contrib = _outer_acc(ts[l], z_tot)
                wb[l] = contrib if wb[l] is None else wb[l] + contrib
                bb[l] = jnp.sum(z_tot, axis=0)[None, :]
                if second_order:
                    # One (2T, d) dot for both channels instead of two.
                    t_st = _dot_t(jnp.concatenate([z_A, z_B], axis=0), w_l)
                    tA, tB = t_st[:n_rows], t_st[n_rows:]
                else:
                    tA, tB = _dot_t(z_A, w_l), None
                if l in geom.skip:
                    od = geom.out_dims[l - 1]
                    e_hat = e_hat + tA[:, od:] * INV_SQRT2
                    hA = tA[:, :od] * INV_SQRT2
                    hB = tB[:, :od] * INV_SQRT2 if second_order else None
                else:
                    hA, hB = tA, tB
                if l > 0:
                    z_A = hA * sigs[l - 1]
                    if second_order:
                        z_B = hB * sigs[l - 1] + z_hat_B[l - 1]
                else:
                    e_hat = e_hat + hA
            xbar_ref[:] = _pe_jac_T(jwide, e_hat, pec, geom) * geom.scale

            if second_order:
                pad = jnp.zeros(
                    (geom.in_dims[n - 1], geom.d_out - 1), jnp.float32)
                wb[n - 1] = wb[n - 1] + jnp.concatenate(
                    [wlast_col0_bar, pad], axis=-1)
            if value_only:
                wb[n - 1] = jnp.concatenate(
                    [wb[n - 1], jnp.zeros((geom.in_dims[n - 1],
                                           geom.d_out - 1), jnp.float32)],
                    axis=-1)
                bb[n - 1] = jnp.concatenate(
                    [bb[n - 1], jnp.zeros((1, geom.d_out - 1), jnp.float32)],
                    axis=-1)

            for l in range(n):
                @pl.when(i == 0)
                def _(l=l):
                    wbar_refs[l][:] = wb[l]
                    bbar_refs[l][:] = bb[l]

                @pl.when(i > 0)
                def _(l=l):
                    wbar_refs[l][:] += wb[l]
                    bbar_refs[l][:] += bb[l]
        return kernel

    def call_value(Ws, bs, x):
        grid = (x.shape[0] // tile,)
        in_specs = _common_specs(geom, tile, Ws, bs, pl, pltpu)
        return pl.pallas_call(
            value_kernel, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(x, jnp.asarray(geom.pe_consts), *Ws, *bs)[:, 0]

    def call_fwd(Ws, bs, x, with_grad: bool, value_only: bool = False):
        grid = (x.shape[0] // tile,)
        d_o = 1 if value_only else geom.d_out
        in_specs = _common_specs(geom, tile, Ws, bs, pl, pltpu)
        out_specs = [pl.BlockSpec((tile, d_o), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((x.shape[0], d_o), jnp.float32)]
        if with_grad:
            out_specs.append(pl.BlockSpec((tile, geom.d_in), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((x.shape[0], geom.d_in),
                                                  jnp.float32))
        return pl.pallas_call(
            make_fwd_kernel(with_grad, value_only), grid=grid,
            in_specs=in_specs,
            out_specs=out_specs if with_grad else out_specs[0],
            out_shape=out_shape if with_grad else out_shape[0],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(x, jnp.asarray(geom.pe_consts), *Ws, *bs)

    def call_bwd(Ws, bs, x, obar, gbar, second_order: bool,
                 value_only: bool = False):
        grid = (x.shape[0] // tile,)
        d_o = 1 if value_only else geom.d_out
        in_specs = [pl.BlockSpec((tile, geom.d_in), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(geom.pe_consts.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, d_o), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        args = [x, jnp.asarray(geom.pe_consts), obar]
        if second_order:
            in_specs.append(pl.BlockSpec((tile, geom.d_in), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
            args.append(gbar)
        for w in Ws:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out_specs = [pl.BlockSpec((tile, geom.d_in), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((x.shape[0], geom.d_in),
                                          jnp.float32)]
        for w in Ws:
            out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        for b in bs:
            out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        outs = pl.pallas_call(
            make_bwd_kernel(second_order, value_only), grid=grid,
            in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # Tiles past 256 peak just above the 16 MB scoped default
                # (e.g. 16.9 MB at 512); raise the cap as in
                # rendercore_kernels so the tile can be swept.
                vmem_limit_bytes=32 * 1024 * 1024),
        )(*args, *Ws, *bs)
        x_bar = outs[0]
        w_bars = list(outs[1:1 + n])
        b_bars = list(outs[1 + n:1 + 2 * n])  # (1, out) blocks, match primal
        return x_bar, w_bars, b_bars

    return geom, call_value, call_fwd, call_bwd


def _pad_rows(x, tile):
    flat = x.reshape(-1, x.shape[-1])
    n = flat.shape[0]
    pad = (-n) % tile
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, flat.shape[-1]), flat.dtype)], axis=0)
    return flat, n


def _prep(params, n_lin):
    """Materialize effective weights in f32 (the op's AD boundary stays f32;
    the kernels cast to bf16 at each dot)."""
    Ws, bs = [], []
    from ...models.mlp import effective_weight
    for l in range(n_lin):
        Ws.append(effective_weight(params[f"lin{l}"]))
        bs.append(params[f"lin{l}"]["b"][None, :])
    return tuple(Ws), tuple(bs)


# ---------------------------------------------------------------------------
# Public API (per-config cached, custom_vjp wrapped)
# ---------------------------------------------------------------------------

class FusedOps(NamedTuple):
    """The fused SDF callables for one SDFConfig. All take ``(params, x)``
    with ``x`` of shape (..., d_in):
      value      -> sdf (...,)                  [no AD — stop-grad regions]
      out        -> out (..., d_out)            [first-order custom bwd]
      outgrad    -> (out (..., d_out), grad (..., d_in))  [second-order bwd;
                    grad's x-dependence severed]
      value_diff -> sdf (...,)                  [first-order custom bwd that
                    never touches the 256-d feature head: last-layer matmuls
                    and sweeps use W_last[:, :1] only — ~30% fewer FLOPs than
                    ``out`` for value-only losses (sdf-consistency)]
    """
    value: Any
    out: Any
    outgrad: Any
    value_diff: Any


def get_fused_ops(cfg, tile: int = DEFAULT_TILE,
                  interpret: bool | None = None) -> "FusedOps":
    """Uncached wrapper: resolve ``interpret=None`` against the CURRENT
    backend on every call (tests flip ``jax_platforms`` mid-process), then
    key the cached builder on the resolved mode."""
    if interpret is None:
        interpret = not is_tpu_backend()
    return _get_fused_ops(cfg, tile, interpret)


@functools.lru_cache(maxsize=32)
def _get_fused_ops(cfg, tile: int, interpret: bool) -> "FusedOps":
    geom, call_value, call_fwd, call_bwd = _build(cfg, tile, interpret)
    n = geom.n_lin

    def value_fn(params, x):
        # No AD through this kernel: sever params AND inputs (callers use it
        # strictly inside no-grad regions, reference torch.no_grad :493).
        Ws, bs = _prep(jax.lax.stop_gradient(params), n)
        flat, nrows = _pad_rows(jax.lax.stop_gradient(x), tile)
        out = call_value(Ws, bs, flat)[:nrows]
        return out.reshape(x.shape[:-1])

    # ----- first-order op on (Ws, bs, x) -----
    @jax.custom_vjp
    def _out_op(Ws, bs, flat):
        return call_fwd(Ws, bs, flat, with_grad=False)

    def _out_fwd(Ws, bs, flat):
        return call_fwd(Ws, bs, flat, with_grad=False), (Ws, bs, flat)

    def _out_bwd(res, obar):
        Ws, bs, flat = res
        x_bar, w_bars, b_bars = call_bwd(Ws, bs, flat, obar, None,
                                         second_order=False)
        return tuple(w_bars), tuple(b_bars), x_bar

    _out_op.defvjp(_out_fwd, _out_bwd)

    def out_fn(params, x):
        Ws, bs = _prep(params, n)
        flat, nrows = _pad_rows(x, tile)
        out = _out_op(Ws, bs, flat)[:nrows]
        return out.reshape(x.shape[:-1] + (geom.d_out,))

    # ----- second-order op -----
    @jax.custom_vjp
    def _outgrad_op(Ws, bs, flat):
        return call_fwd(Ws, bs, flat, with_grad=True)

    def _outgrad_fwd(Ws, bs, flat):
        return call_fwd(Ws, bs, flat, with_grad=True), (Ws, bs, flat)

    def _outgrad_bwd(res, cots):
        Ws, bs, flat = res
        obar, gbar = cots
        x_bar, w_bars, b_bars = call_bwd(Ws, bs, flat, obar, gbar,
                                         second_order=True)
        return tuple(w_bars), tuple(b_bars), x_bar

    _outgrad_op.defvjp(_outgrad_fwd, _outgrad_bwd)

    def outgrad_fn(params, x):
        Ws, bs = _prep(params, n)
        flat, nrows = _pad_rows(x, tile)
        out, grad = _outgrad_op(Ws, bs, flat)
        out = out[:nrows].reshape(x.shape[:-1] + (geom.d_out,))
        grad = grad[:nrows].reshape(x.shape[:-1] + (geom.d_in,))
        return out, grad

    # ----- value-only first-order op -----
    @jax.custom_vjp
    def _valdiff_op(Ws, bs, flat):
        return call_fwd(Ws, bs, flat, with_grad=False, value_only=True)

    def _valdiff_fwd(Ws, bs, flat):
        return (call_fwd(Ws, bs, flat, with_grad=False, value_only=True),
                (Ws, bs, flat))

    def _valdiff_bwd(res, obar):
        Ws, bs, flat = res
        x_bar, w_bars, b_bars = call_bwd(Ws, bs, flat, obar, None,
                                         second_order=False, value_only=True)
        return tuple(w_bars), tuple(b_bars), x_bar

    _valdiff_op.defvjp(_valdiff_fwd, _valdiff_bwd)

    def value_diff_fn(params, x):
        Ws, bs = _prep(params, n)
        flat, nrows = _pad_rows(x, tile)
        out = _valdiff_op(Ws, bs, flat)[:nrows, 0]
        return out.reshape(x.shape[:-1])

    return FusedOps(value_fn, out_fn, outgrad_fn, value_diff_fn)
