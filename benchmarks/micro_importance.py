#!/usr/bin/env python
"""Decompose the importance-sampling chain's device time.

The step ablation attributes ~4.5 ms to the chain (full - no_importance at
1024 rays), but only ~1 ms of that is value-sweep FLOPs at the kernels'
measured efficiency. This microbenchmark times, as separate jitted
programs on the live device:

  a) the full chain (4 rounds: up_sample -> value query -> cat_z_vals);
  b) the chain with the SDF value queries replaced by an analytic stand-in
     (isolates the non-MLP glue: section alphas, transmittance, inverse
     CDF, bitonic merges);
  c) the 4 value queries alone at the chain's point counts;
  d) the 4 cat_z_vals merges alone.

Usage: python benchmarks/micro_importance.py [--rays 1024]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from copenerf_tpu.models import fields as F
    from copenerf_tpu.ops.sampling import cat_z_vals, up_sample
    from copenerf_tpu.utils.compile_cache import enable_compilation_cache
    from copenerf_tpu.utils.profiling import sync

    enable_compilation_cache()
    scfg = F.SDFConfig()
    params = {"sdf": F.sdf_init(jax.random.PRNGKey(0), scfg)}
    B = args.rays
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1)
    d = rng.randn(B, 3).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z0 = jnp.asarray(np.sort(rng.rand(B, 64).astype(np.float32) * 3 + 0.3,
                             axis=-1))
    t_step = jnp.asarray(0.1, jnp.float32)

    def with_time(pts):
        t = jnp.broadcast_to(t_step, pts.shape[:-1] + (1,))
        return jnp.concatenate([pts, t], axis=-1)

    def real_query(pts_t):
        return F.sdf_value_nograd(scfg, params["sdf"], pts_t)

    def fake_query(pts_t):
        # Analytic sphere SDF: same shape/dtype, ~zero FLOPs.
        return jnp.linalg.norm(pts_t[..., :3], axis=-1) - 1.0

    def chain(query):
        def f(z_vals):
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            sdf = query(with_time(pts))
            for i in range(4):
                new_z = up_sample(rays_o, rays_d, z_vals, sdf, 16,
                                  64.0 * 2 ** i)
                if i == 3:
                    z_vals, sdf, _ = cat_z_vals(z_vals, new_z, sdf, None)
                else:
                    p = (rays_o[:, None, :] +
                         rays_d[:, None, :] * new_z[..., None])
                    new_sdf = query(with_time(p))
                    z_vals, sdf, _ = cat_z_vals(z_vals, new_z, sdf, new_sdf)
            return z_vals, sdf
        return f

    def queries_only(z_vals):
        outs = []
        for n in (64, 16, 16, 16):
            pts = rays_o[:, None, :] + rays_d[:, None, :] * \
                z_vals[..., :n, None]
            outs.append(real_query(with_time(pts)))
        return outs

    def merges_only(z_vals):
        out = []
        sdf = z_vals  # stand-in values, same shape
        for m in (64, 80, 96, 112):
            z, s, _ = cat_z_vals(z_vals[..., :m],
                                 z_vals[..., :16] + 3.0,
                                 sdf[..., :m], sdf[..., :16])
            out.append((z, s))
        return out

    def bench(name, fn, arg):
        jf = jax.jit(fn)
        r = jf(arg)
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = jf(arg)
        sync(jax.tree_util.tree_leaves(r)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:28s}: {ms:7.3f} ms", flush=True)
        return ms

    bench("full chain (real sdf)", chain(real_query), z0)
    bench("chain, analytic sdf (glue)", chain(fake_query), z0)
    bench("4 value queries alone", queries_only, z0)
    bench("4 merges alone", merges_only, z0)


if __name__ == "__main__":
    main()
