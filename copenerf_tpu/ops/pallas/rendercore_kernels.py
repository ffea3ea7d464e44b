"""Fully fused render-core field query: SDF forward + input gradient +
IDR color MLP as ONE Pallas TPU op with a composed second-order backward.

Why: with the SDF kernel fused but the color net left to XLA, the train
step spends ~6 ms (of ~31) in the color chain, and the 256-wide SDF
feature round-trips HBM between the two ops (131k x 256 x 4 B each way).
A standalone fused color kernel was measured net-negative inside the full
step: its custom call severed XLA's fusions with the surrounding graph
(models/fields.py color_apply note). Fusing color INTO the render-core
kernel removes that boundary altogether — the feature vector never leaves
VMEM, and the color cotangents enter the same backward kernel that already
runs the SDF's hand-derived double-backprop.

Replaces the reference's hot sequence (``model/neus_renderer.py:352-358``:
sdf_network forward, autograd-in-forward ``gradient()``, color forward)
with one kernel; reference gradient-flow semantics are preserved:

  * ``grad``'s dependence on ``x`` is severed (reference detaches pts_time
    before ``autograd.grad``, neus_renderer.py:356) — its cotangent (from
    eikonal/sdf-flow losses AND from the color net's gradient input) flows
    into weight gradients through the second-order channel only;
  * the color net's pts_time/view-dir inputs are NOT severed — their
    cotangents reach ``x_bar``/``dirs_bar`` (pose gradients in eval-time
    optimization);
  * the SDF value path keeps full x-dependence (channel A).

Scope: ``color.mode == 'idr'`` with ``use_negative_ray_vector == False``
(the reference's default and only exercised configuration); other modes
fall back to the composed ops in ``models.fields``.

Forward outputs per point: sdf (N, 1), grad (N, d_in), color (N, 3).
The (N, 256) feature is internal; the backward recomputes all activations
in VMEM (rematerialization — cheaper than spilling them to HBM).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .color_kernels import _ColorGeom, _color_forward_tile, _prep_color
from .sdf_kernels import (INV_SQRT2, _dot, _dot_t, _forward_tile, _Geom,
                          _grad_sweep_tile, _outer_acc, _pad_rows, _pe_jac,
                          _pe_jac_T, _prep, is_tpu_backend)

# Round-4 v5e sweep with shared-exp activations
# (benchmarks/micro_rendercore.py, fwd+bwd ms at 131k pts):
# fwd tile 128 -> 15.06, 256 -> 14.66, 384 -> 14.59, 512 -> 14.52 (best;
# needs the fwd VMEM cap raised past the 16 MB scoped default).
DEFAULT_TILE_FWD = 512
# The backward holds both nets' weights + weight-grad accumulators + the
# recomputed activation stacks in VMEM (vmem_limit_bytes raised past the
# 16 MB scoped default). Earlier bwd sweep: tile 128 -> 17.5, 256 -> 15.8,
# 384 -> 15.4, 512 -> 14.9 (split outgrad+XLA-color: ~19.5).
DEFAULT_TILE_BWD = 512


@functools.lru_cache(maxsize=8)
def _build(sdf_cfg, color_cfg, tile_fwd: int, tile_bwd: int,
           interpret: bool, with_cons: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sg = _Geom(sdf_cfg)
    cg = _ColorGeom(color_cfg)
    ns, nc = sg.n_lin, cg.n_lin
    assert cg.d_pts == sg.d_in and cg.d_grad == sg.d_in

    def _value_only_bwd(y, swbar, pes, ws, bs_):
        """First-order value-only backward at the world-transformed points
        (the sdf-consistency re-query), sharing the VMEM-resident weights:
        forward (value head only) + channel-A down-sweep. Returns
        (sdf_w (T, 1), y_bar, wb_add[ns] (last entry (in, 1)), bb_add[ns]
        (last entry (1, 1)))."""
        z_w, (jwide_w, e_w, ts_w, sigs_w) = _forward_tile(
            y, pes, ws, bs_, sg, keep=True, value_only=True)
        z_A = swbar * (1.0 / sg.scale)
        e_hat = jnp.zeros_like(e_w)
        wb_add = [None] * ns
        bb_add = [None] * ns
        for l in range(ns - 1, -1, -1):
            w_l = ws[l][:]
            if l == ns - 1:
                w_l = w_l[:, :1]
            wb_add[l] = _outer_acc(ts_w[l], z_A)
            bb_add[l] = jnp.sum(z_A, axis=0)[None, :]
            tA = _dot_t(z_A, w_l)
            if l in sg.skip:
                od = sg.out_dims[l - 1]
                e_hat = e_hat + tA[:, od:] * INV_SQRT2
                hA = tA[:, :od] * INV_SQRT2
            else:
                hA = tA
            if l > 0:
                z_A = hA * sigs_w[l - 1]
            else:
                e_hat = e_hat + hA
        y_bar = _pe_jac_T(jwide_w, e_hat, pes, sg) * sg.scale
        return z_w / sg.scale, y_bar, wb_add, bb_add

    # ---------------- forward ----------------
    def fwd_kernel(*refs):
        x_ref, d_ref, pes_ref, pev_ref = refs[:4]
        off = 4
        y_ref = None
        if with_cons:
            y_ref = refs[4]
            off = 5
        ws = refs[off:off + ns]
        bs_ = refs[off + ns:off + 2 * ns]
        wc = refs[off + 2 * ns:off + 2 * ns + nc]
        bc = refs[off + 2 * ns + nc:off + 2 * ns + 2 * nc]
        if with_cons:
            sdf_ref, grad_ref, col_ref, sdfw_ref = refs[-4:]
        else:
            sdf_ref, grad_ref, col_ref = refs[-3:]

        pes = pes_ref[:]
        z, (jwide, _, _, sigs) = _forward_tile(
            x_ref[:], pes, ws, bs_, sg, keep=True, keep_ts=False)
        sdf_ref[:] = z[:, :1] / sg.scale
        feat = z[:, 1:]
        ee, _, _ = _grad_sweep_tile(ws, sigs, sg, x_ref.shape[0],
                                    keep=False)
        grad = _pe_jac_T(jwide, ee, pes, sg)
        grad_ref[:] = grad
        c, _ = _color_forward_tile(x_ref[:], d_ref[:], grad, feat,
                                   pev_ref[:], wc, bc, cg, keep=False)
        col_ref[:] = c
        if with_cons:
            z_w, _ = _forward_tile(y_ref[:], pes, ws, bs_, sg, keep=False,
                                   value_only=True)
            sdfw_ref[:] = z_w / sg.scale

    # ---------------- backward ----------------
    def bwd_kernel(*refs):
        (x_ref, d_ref, pes_ref, pev_ref, sbar_ref, gbar_ref,
         cbar_ref) = refs[:7]
        off = 7
        y_ref = swbar_ref = None
        if with_cons:
            y_ref, swbar_ref = refs[7], refs[8]
            off = 9
        ws = refs[off:off + ns]
        bs_ = refs[off + ns:off + 2 * ns]
        wc = refs[off + 2 * ns:off + 2 * ns + nc]
        bc = refs[off + 2 * ns + nc:off + 2 * ns + 2 * nc]
        outs = refs[off + 2 * ns + 2 * nc:]
        k = 0
        xbar_ref, dbar_ref = outs[0], outs[1]
        k = 2
        ybar_ref = None
        if with_cons:
            ybar_ref = outs[2]
            k = 3
        wbar_s = outs[k:k + ns]
        bbar_s = outs[k + ns:k + 2 * ns]
        wbar_c = outs[k + 2 * ns:k + 2 * ns + nc]
        bbar_c = outs[k + 2 * ns + nc:k + 2 * ns + 2 * nc]

        i = pl.program_id(0)
        n_rows = x_ref.shape[0]
        pes = pes_ref[:]
        pev = pev_ref[:]

        # Recompute SDF forward + gradient sweep (activations in VMEM).
        z_last, (jwide, e, ts, sigs) = _forward_tile(
            x_ref[:], pes, ws, bs_, sg, keep=True)
        feat = z_last[:, 1:]
        # keep=False: q_l is recomputed as rs[l+1]*sigs[l] in the up-sweep
        # below instead of being held live (saves ~2 MB VMEM at tile 256,
        # the difference between fitting and a scoped-vmem OOM here).
        ee, rs, _ = _grad_sweep_tile(ws, sigs, sg, n_rows, keep=False)
        grad = _pe_jac_T(jwide, ee, pes, sg)

        # Color forward (keep) + first-order color backward.
        c, (jw_d, ins, _) = _color_forward_tile(
            x_ref[:], d_ref[:], grad, feat, pev, wc, bc, cg, keep=True)
        zbar = (cbar_ref[:] * c * (1.0 - c) if cg.squeeze_out
                else cbar_ref[:])
        wbc = [None] * nc
        bbc = [None] * nc
        for l in range(nc - 1, -1, -1):
            wbc[l] = _outer_acc(ins[l], zbar)
            bbc[l] = jnp.sum(zbar, axis=0)[None, :]
            tbar = _dot_t(zbar, wc[l][:])
            if l > 0:
                zbar = tbar * (ins[l] > 0)
        h0_bar = tbar
        x_bar_color = h0_bar[:, :cg.o_dirs]
        dbar_ref[:] = _pe_jac_T(jw_d, h0_bar[:, cg.o_dirs:cg.o_grad], pev,
                                cg.vgeom)
        grad_bar_color = h0_bar[:, cg.o_grad:cg.o_feat]
        feat_bar = h0_bar[:, cg.o_feat:]

        # SDF second-order machinery (as sdf_kernels.make_bwd_kernel with
        # second_order=True): channel B seeded by the TOTAL grad cotangent
        # (external gbar + the color net's), channel A by [sdf_bar, feat_bar].
        gbar_total = gbar_ref[:] + grad_bar_color
        wb = [None] * ns
        bb = [None] * ns
        z_hat_B = [None] * (ns - 1)
        ee_hat = _pe_jac(jwide, gbar_total, pes, sg)
        r_hat = ee_hat
        for l in range(0, ns - 1):
            if l in sg.skip:
                p_hat = jnp.concatenate(
                    [r_hat * INV_SQRT2, ee_hat * INV_SQRT2], axis=-1)
            else:
                p_hat = r_hat
            q_hat = _dot(p_hat, ws[l][:])
            wb[l] = _outer_acc(p_hat, rs[l + 1] * sigs[l])
            r_hat = q_hat * sigs[l]
            z_hat_B[l] = ((q_hat * rs[l + 1]) * 100.0 * sigs[l]
                          * (1.0 - sigs[l]))
        wlast_col0_bar = jnp.sum(r_hat, axis=0)[:, None]

        scale_vec = jnp.concatenate(
            [jnp.full((1, 1), 1.0 / sg.scale, jnp.float32),
             jnp.ones((1, sg.d_out - 1), jnp.float32)], axis=-1)
        z_A = jnp.concatenate([sbar_ref[:], feat_bar], axis=-1) * scale_vec
        z_B = jnp.zeros_like(z_A)
        e_hat = jnp.zeros_like(e)
        for l in range(ns - 1, -1, -1):
            w_l = ws[l][:]
            z_tot = z_A + z_B
            contrib = _outer_acc(ts[l], z_tot)
            wb[l] = contrib if wb[l] is None else wb[l] + contrib
            bb[l] = jnp.sum(z_tot, axis=0)[None, :]
            t_st = _dot_t(jnp.concatenate([z_A, z_B], axis=0), w_l)
            tA, tB = t_st[:n_rows], t_st[n_rows:]
            if l in sg.skip:
                od = sg.out_dims[l - 1]
                e_hat = e_hat + tA[:, od:] * INV_SQRT2
                hA = tA[:, :od] * INV_SQRT2
                hB = tB[:, :od] * INV_SQRT2
            else:
                hA, hB = tA, tB
            if l > 0:
                z_A = hA * sigs[l - 1]
                z_B = hB * sigs[l - 1] + z_hat_B[l - 1]
            else:
                e_hat = e_hat + hA
        wb[ns - 1] = wb[ns - 1] + jnp.concatenate(
            [wlast_col0_bar,
             jnp.zeros((sg.in_dims[ns - 1], sg.d_out - 1), jnp.float32)],
            axis=-1)
        xbar_ref[:] = (_pe_jac_T(jwide, e_hat, pes, sg) * sg.scale
                       + x_bar_color)

        if with_cons:
            # Consistency re-query backward, accumulated into the SAME
            # weight-gradient blocks (one accumulation stream, no separate
            # launch or weight reload).
            _, y_bar, wb_add, bb_add = _value_only_bwd(
                y_ref[:], swbar_ref[:], pes, ws, bs_)
            ybar_ref[:] = y_bar
            for l in range(ns - 1):
                wb[l] = wb[l] + wb_add[l]
                bb[l] = bb[l] + bb_add[l]
            pad_w = jnp.zeros((sg.in_dims[ns - 1], sg.d_out - 1),
                              jnp.float32)
            wb[ns - 1] = wb[ns - 1] + jnp.concatenate(
                [wb_add[ns - 1], pad_w], axis=-1)
            bb[ns - 1] = bb[ns - 1] + jnp.concatenate(
                [bb_add[ns - 1], jnp.zeros((1, sg.d_out - 1), jnp.float32)],
                axis=-1)

        for l in range(ns):
            @pl.when(i == 0)
            def _(l=l):
                wbar_s[l][:] = wb[l]
                bbar_s[l][:] = bb[l]

            @pl.when(i > 0)
            def _(l=l):
                wbar_s[l][:] += wb[l]
                bbar_s[l][:] += bb[l]
        for l in range(nc):
            @pl.when(i == 0)
            def _(l=l):
                wbar_c[l][:] = wbc[l]
                bbar_c[l][:] = bbc[l]

            @pl.when(i > 0)
            def _(l=l):
                wbar_c[l][:] += wbc[l]
                bbar_c[l][:] += bbc[l]

    # ---------------- pallas_call wrappers ----------------
    def _row(tile, width):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def call_fwd(Ws, bs, Wc, bc, x, dirs, y=None):
        tile = tile_fwd
        grid = (x.shape[0] // tile,)
        in_specs = [_row(tile, sg.d_in), _row(tile, cg.d_dirs),
                    _full(sg.pe_consts.shape), _full(cg.pe_consts.shape)]
        args = [x, dirs, jnp.asarray(sg.pe_consts),
                jnp.asarray(cg.pe_consts)]
        if with_cons:
            in_specs.append(_row(tile, sg.d_in))
            args.append(y)
        in_specs += ([_full(w.shape) for w in Ws]
                     + [_full(b.shape) for b in bs]
                     + [_full(w.shape) for w in Wc]
                     + [_full(b.shape) for b in bc])
        out_specs = [_row(tile, 1), _row(tile, sg.d_in), _row(tile, 3)]
        out_shape = [jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
                     jax.ShapeDtypeStruct((x.shape[0], sg.d_in),
                                          jnp.float32),
                     jax.ShapeDtypeStruct((x.shape[0], 3), jnp.float32)]
        if with_cons:
            out_specs.append(_row(tile, 1))
            out_shape.append(jax.ShapeDtypeStruct((x.shape[0], 1),
                                                  jnp.float32))
        return pl.pallas_call(
            fwd_kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                # Tile 512 peaks ~16.5 MB — just past the 16 MB scoped
                # default; raise the cap so the fwd tile can be swept too
                # (the cons variant adds one more value-forward stack).
                vmem_limit_bytes=48 * 1024 * 1024),
        )(*args, *Ws, *bs, *Wc, *bc)

    def call_bwd(Ws, bs, Wc, bc, x, dirs, sbar, gbar, cbar,
                 y=None, swbar=None):
        tile = tile_bwd
        grid = (x.shape[0] // tile,)
        in_specs = [_row(tile, sg.d_in), _row(tile, cg.d_dirs),
                    _full(sg.pe_consts.shape), _full(cg.pe_consts.shape),
                    _row(tile, 1), _row(tile, sg.d_in), _row(tile, 3)]
        args = [x, dirs, jnp.asarray(sg.pe_consts),
                jnp.asarray(cg.pe_consts), sbar, gbar, cbar]
        if with_cons:
            in_specs += [_row(tile, sg.d_in), _row(tile, 1)]
            args += [y, swbar]
        in_specs += ([_full(w.shape) for w in Ws]
                     + [_full(b.shape) for b in bs]
                     + [_full(w.shape) for w in Wc]
                     + [_full(b.shape) for b in bc])
        out_specs = [_row(tile, sg.d_in), _row(tile, cg.d_dirs)]
        out_shape = [jax.ShapeDtypeStruct((x.shape[0], sg.d_in),
                                          jnp.float32),
                     jax.ShapeDtypeStruct((x.shape[0], cg.d_dirs),
                                          jnp.float32)]
        if with_cons:
            out_specs.append(_row(tile, sg.d_in))
            out_shape.append(jax.ShapeDtypeStruct((x.shape[0], sg.d_in),
                                                  jnp.float32))
        for w in list(Ws) + list(bs) + list(Wc) + list(bc):
            out_specs.append(_full(w.shape))
            out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        outs = pl.pallas_call(
            bwd_kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # Both nets' weights + grad accumulators + recomputed
                # activation stacks peak ~21 MB at tile 256 — above the
                # conservative 16 MB scoped default but well within the
                # chip's physical VMEM; raise the cap instead of shrinking
                # the tile (256 measured 10% faster than 128). The cons
                # variant adds the value-path ts/sigs stacks (~10 MB at
                # tile 512).
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*args, *Ws, *bs, *Wc, *bc)
        xbar, dbar = outs[0], outs[1]
        k = 2
        ybar = None
        if with_cons:
            ybar = outs[2]
            k = 3
        wbar_s = list(outs[k:k + ns]); k += ns
        bbar_s = list(outs[k:k + ns]); k += ns
        wbar_c = list(outs[k:k + nc]); k += nc
        bbar_c = list(outs[k:k + nc])
        return xbar, dbar, ybar, wbar_s, bbar_s, wbar_c, bbar_c

    return sg, cg, call_fwd, call_bwd


def get_fused_rendercore(sdf_cfg, color_cfg, tile_fwd: int = DEFAULT_TILE_FWD,
                         tile_bwd: int = DEFAULT_TILE_BWD,
                         interpret: bool | None = None):
    """Return ``fn(params_sdf, params_color, x, dirs) ->
    (sdf (...,1), grad (..., d_in), color (..., 3))`` as one fused op.

    Thin uncached wrapper: ``interpret=None`` is resolved against the
    CURRENT backend on every call (tests flip ``jax_platforms``
    mid-process), then the resolved mode keys the cached builder.
    """
    if interpret is None:
        interpret = not is_tpu_backend()
    return _get_fused_rendercore(sdf_cfg, color_cfg, tile_fwd, tile_bwd,
                                 interpret)


@functools.lru_cache(maxsize=8)
def _get_fused_rendercore(sdf_cfg, color_cfg, tile_fwd: int,
                          tile_bwd: int, interpret: bool):
    sg, cg, call_fwd, call_bwd = _build(sdf_cfg, color_cfg, tile_fwd,
                                        tile_bwd, interpret)
    ns, nc = sg.n_lin, cg.n_lin
    tile = max(tile_fwd, tile_bwd)

    @jax.custom_vjp
    def _op(Ws, bs, Wc, bc, x, dirs):
        return call_fwd(Ws, bs, Wc, bc, x, dirs)

    def _fwd(Ws, bs, Wc, bc, x, dirs):
        return call_fwd(Ws, bs, Wc, bc, x, dirs), (Ws, bs, Wc, bc, x, dirs)

    def _bwd(res, cots):
        Ws, bs, Wc, bc, x, dirs = res
        sbar, gbar, cbar = cots
        xbar, dbar, _, wbar_s, bbar_s, wbar_c, bbar_c = call_bwd(
            Ws, bs, Wc, bc, x, dirs, sbar, gbar, cbar)
        return (tuple(wbar_s), tuple(bbar_s), tuple(wbar_c), tuple(bbar_c),
                xbar, dbar)

    _op.defvjp(_fwd, _bwd)

    def fn(params_sdf, params_color, x, dirs):
        Ws, bs = _prep(params_sdf, ns)
        Wc, bc = _prep_color(params_color, nc)
        lead = x.shape[:-1]
        xf, nrows = _pad_rows(x, tile)
        df, _ = _pad_rows(dirs, tile)
        sdf, grad, color = _op(Ws, bs, Wc, bc, xf, df)
        return (sdf[:nrows].reshape(lead + (1,)),
                grad[:nrows].reshape(lead + (sg.d_in,)),
                color[:nrows].reshape(lead + (3,)))

    return fn


def get_fused_rendercore_cons(sdf_cfg, color_cfg,
                              tile_fwd: int = DEFAULT_TILE_FWD,
                              tile_bwd: int = DEFAULT_TILE_BWD,
                              interpret: bool | None = None):
    """Render-core + folded sdf-consistency re-query:
    ``fn(params_sdf, params_color, x, dirs, y) ->
    (sdf (...,1), grad (..., d_in), color (..., 3), sdf_w (...,))``.

    ``y`` is the world-transformed pts_time batch (same rows as ``x``,
    reference train.py:495-505): its value-only SDF query and first-order
    backward run INSIDE the render-core launches, sharing weight residency
    and the weight-gradient accumulation stream — removing the separate
    value-kernel fwd+bwd launch pair that cost ~5.6 ms/step (round-4
    ablation). ``y``'s cotangent flows to ``y_bar`` (pose-chain gradients
    when sdf_consistency_enable_pose_grad).
    """
    if interpret is None:
        interpret = not is_tpu_backend()
    return _get_fused_rendercore_cons(sdf_cfg, color_cfg, tile_fwd,
                                      tile_bwd, interpret)


@functools.lru_cache(maxsize=8)
def _get_fused_rendercore_cons(sdf_cfg, color_cfg, tile_fwd: int,
                               tile_bwd: int, interpret: bool):
    sg, cg, call_fwd, call_bwd = _build(sdf_cfg, color_cfg, tile_fwd,
                                        tile_bwd, interpret, with_cons=True)
    ns, nc = sg.n_lin, cg.n_lin
    tile = max(tile_fwd, tile_bwd)

    @jax.custom_vjp
    def _op(Ws, bs, Wc, bc, x, dirs, y):
        return call_fwd(Ws, bs, Wc, bc, x, dirs, y)

    def _fwd(Ws, bs, Wc, bc, x, dirs, y):
        return (call_fwd(Ws, bs, Wc, bc, x, dirs, y),
                (Ws, bs, Wc, bc, x, dirs, y))

    def _bwd(res, cots):
        Ws, bs, Wc, bc, x, dirs, y = res
        sbar, gbar, cbar, swbar = cots
        xbar, dbar, ybar, wbar_s, bbar_s, wbar_c, bbar_c = call_bwd(
            Ws, bs, Wc, bc, x, dirs, sbar, gbar, cbar, y, swbar)
        return (tuple(wbar_s), tuple(bbar_s), tuple(wbar_c), tuple(bbar_c),
                xbar, dbar, ybar)

    _op.defvjp(_fwd, _bwd)

    def fn(params_sdf, params_color, x, dirs, y):
        Ws, bs = _prep(params_sdf, ns)
        Wc, bc = _prep_color(params_color, nc)
        lead = x.shape[:-1]
        xf, nrows = _pad_rows(x, tile)
        df, _ = _pad_rows(dirs, tile)
        yf, _ = _pad_rows(y, tile)
        sdf, grad, color, sdf_w = _op(Ws, bs, Wc, bc, xf, df, yf)
        return (sdf[:nrows].reshape(lead + (1,)),
                grad[:nrows].reshape(lead + (sg.d_in,)),
                color[:nrows].reshape(lead + (3,)),
                sdf_w[:nrows, 0].reshape(lead))

    return fn
