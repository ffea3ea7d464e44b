#!/usr/bin/env python
"""Microbenchmark: combined render-core kernel vs (SDF outgrad kernel +
XLA color) at the train step's point count, fwd+bwd, on the live device.

Usage: python benchmarks/micro_rendercore.py [--tile-bwd 128] [--tile-fwd 256]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-fwd", type=int, default=256)
    ap.add_argument("--tile-bwd", type=int, default=128)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from copenerf_tpu.models import fields as F
    from copenerf_tpu.ops.pallas.rendercore_kernels import \
        get_fused_rendercore
    from copenerf_tpu.ops.pallas.sdf_kernels import get_fused_ops
    from copenerf_tpu.utils.compile_cache import enable_compilation_cache
    from copenerf_tpu.utils.profiling import sync

    enable_compilation_cache()
    scfg = F.SDFConfig()
    ccfg = F.ColorConfig()
    ps = F.sdf_init(jax.random.PRNGKey(0), scfg)
    pc = F.color_init(jax.random.PRNGKey(1), ccfg)
    n = args.n
    x = jax.random.normal(jax.random.PRNGKey(2), (n, 4)) * 0.3
    dirs = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    fused = get_fused_rendercore(scfg, ccfg, tile_fwd=args.tile_fwd,
                                 tile_bwd=args.tile_bwd, interpret=False)
    outgrad = get_fused_ops(scfg).outgrad

    def loss_fused(ps, pc):
        s, g, c = fused(ps, pc, x, dirs)
        return (jnp.mean(jnp.abs(s)) + jnp.mean(g[..., 3] ** 2)
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1) ** 2)
                + jnp.mean(c))

    def loss_split(ps, pc):
        out, g = outgrad(ps, x)
        c = F.color_apply(ccfg, pc, x, g, dirs, out[..., 1:])
        return (jnp.mean(jnp.abs(out[..., :1])) + jnp.mean(g[..., 3] ** 2)
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1) ** 2)
                + jnp.mean(c))

    def time_fn(f):
        jf = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
        (v, gr) = jf(ps, pc)
        sync(v)
        t0 = time.perf_counter()
        last = None
        for _ in range(args.iters):
            last = jf(ps, pc)
        sync(last[0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    ms_split = time_fn(loss_split)
    ms_fused = time_fn(loss_fused)
    print(f"n={n}  split(outgrad+XLA color): {ms_split:8.2f} ms   "
          f"fused rendercore(tf={args.tile_fwd},tb={args.tile_bwd}): "
          f"{ms_fused:8.2f} ms")

    # Consistency re-query: separate value_diff launch pair (round-4 path)
    # vs folded into the render-core launches (round 5).
    from copenerf_tpu.ops.pallas.rendercore_kernels import \
        get_fused_rendercore_cons

    y = x * 0.9 + 0.05
    value_diff = get_fused_ops(scfg, tile=512).value_diff
    fused_cons = get_fused_rendercore_cons(scfg, ccfg,
                                           tile_fwd=args.tile_fwd,
                                           tile_bwd=args.tile_bwd,
                                           interpret=False)

    def loss_sep(ps, pc):
        s, g, c = fused(ps, pc, x, dirs)
        sw = value_diff(ps, y)
        return (jnp.mean(jnp.abs(s)) + jnp.mean(g[..., 3] ** 2)
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1) ** 2)
                + jnp.mean(c) + 0.5 * jnp.mean(jnp.abs(sw - s[..., 0])))

    def loss_cons(ps, pc):
        s, g, c, sw = fused_cons(ps, pc, x, dirs, y)
        return (jnp.mean(jnp.abs(s)) + jnp.mean(g[..., 3] ** 2)
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1) ** 2)
                + jnp.mean(c) + 0.5 * jnp.mean(jnp.abs(sw - s[..., 0])))

    ms_sep = time_fn(loss_sep)
    ms_cons = time_fn(loss_cons)
    print(f"n={n}  rendercore + separate value_diff: {ms_sep:8.2f} ms   "
          f"folded cons kernel: {ms_cons:8.2f} ms")


if __name__ == "__main__":
    main()
