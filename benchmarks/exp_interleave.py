#!/usr/bin/env python
"""Experiment: does interleaving two row-halves let Mosaic overlap the VPU
activation chain with the MXU matmuls?

The fused render-core kernel is VPU-bound: per 256-wide layer the matmul
(~0.7 us/tile) waits on the beta=100 activation (~2 us/tile, exp+log).
If the Mosaic scheduler can run half A's activation while half B's matmul
executes, a two-half interleave should approach max(VPU, MXU) per layer
instead of the sum. This toy isolates exactly that question on an 8-layer
256-wide softplus MLP before committing to the invasive refactor of the
real kernels.

Usage: python benchmarks/exp_interleave.py [--n 131072] [--tile 512]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_LAYERS = 8
WIDTH = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from copenerf_tpu.utils.compile_cache import enable_compilation_cache
    from copenerf_tpu.utils.profiling import sync

    enable_compilation_cache()

    def act(z):
        eu = jnp.exp(-jnp.abs(100.0 * z))
        return jnp.maximum(z, 0.0) + jnp.log1p(eu) * 0.01

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def plain_kernel(x_ref, *refs):
        ws = refs[:N_LAYERS]
        o_ref = refs[-1]
        h = x_ref[:]
        for l in range(N_LAYERS):
            h = act(dot(h, ws[l][:]))
        o_ref[:] = h

    def split_kernel(x_ref, *refs):
        ws = refs[:N_LAYERS]
        o_ref = refs[-1]
        t = x_ref.shape[0] // 2
        ha, hb = x_ref[:t], x_ref[t:]
        for l in range(N_LAYERS):
            za = dot(ha, ws[l][:])
            zb = dot(hb, ws[l][:])
            ha = act(za)
            hb = act(zb)
        o_ref[:t] = ha
        o_ref[t:] = hb

    # Software-pipelined: half B's layer-l matmul is issued while half A's
    # layer-l activation is still outstanding, and A's l+1 matmul while B's
    # l activation runs.
    def pipe_kernel(x_ref, *refs):
        ws = refs[:N_LAYERS]
        o_ref = refs[-1]
        t = x_ref.shape[0] // 2
        za = dot(x_ref[:t], ws[0][:])
        zb = dot(x_ref[t:], ws[0][:])
        ha = act(za)
        for l in range(1, N_LAYERS):
            za = dot(ha, ws[l][:])   # MXU, overlappable with act(zb) below
            hb = act(zb)             # VPU on the other half
            zb = dot(hb, ws[l][:])   # MXU, overlappable with act(za)
            ha = act(za)
        hb = act(zb)
        o_ref[:t] = ha
        o_ref[t:] = hb

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.n, WIDTH).astype(np.float32) * 0.1)
    ws = [jnp.asarray(rng.randn(WIDTH, WIDTH).astype(np.float32)
                      / np.sqrt(WIDTH)) for _ in range(N_LAYERS)]

    def build(kernel):
        tile = args.tile
        grid = (args.n // tile,)
        in_specs = ([pl.BlockSpec((tile, WIDTH), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
                    + [pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * N_LAYERS)
        out_specs = pl.BlockSpec((tile, WIDTH), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((args.n, WIDTH), jnp.float32))
        return jax.jit(lambda x: f(x, *ws))

    for name, kern in (("plain", plain_kernel), ("split", split_kernel),
                       ("pipe", pipe_kernel)):
        f = build(kern)
        y = f(x)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x)
        sync(y)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:6s}: {ms:7.3f} ms  "
              f"({args.n * N_LAYERS * WIDTH * WIDTH * 2 / ms / 1e9:.1f} "
              f"TF/s)", flush=True)


if __name__ == "__main__":
    main()
