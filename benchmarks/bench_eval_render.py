#!/usr/bin/env python
"""Forward (eval/vis) rendering throughput across chunk sizes on the live
device. The combined render-core kernel serves the forward path too, so
the feature tensor no longer hits HBM — re-measure the chunk scaling and
whether 65536-ray chunks now fit.

Usage: python benchmarks/bench_eval_render.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import numpy as np
    import jax

    from copenerf_tpu.config.loader import load_config
    from copenerf_tpu.evaluation.render import ImageRenderer
    from copenerf_tpu.models import configs_from_cfg, init_all_fields
    from copenerf_tpu.ops.renderer import RendererConfig
    from copenerf_tpu.utils.compile_cache import enable_compilation_cache
    from copenerf_tpu.utils.profiling import sync

    enable_compilation_cache()
    cfg = load_config(None)
    fc = configs_from_cfg(cfg)
    rcfg = RendererConfig.from_cfg(cfg)
    params = init_all_fields(jax.random.PRNGKey(0), fc)

    h, w = 540, 960
    fx = fy = 600.0
    cam = np.array([[2 * fx / w, 0, 0, 0], [0, -2 * fy / h, 0, 0],
                    [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    eye = np.eye(4, dtype=np.float32)
    for chunk in (32768,) if os.environ.get('EVAL_BENCH_QUICK') else (8192, 32768, 65536):
        try:
            r = ImageRenderer(fc, rcfg, chunk=chunk)
            t0 = None
            for it in range(3):
                res = r.render_image(params, cam, eye, eye, 0.0, (h, w),
                                     (0.01, 5.0), 1.0)
                if t0 is None:  # first call compiles
                    sync(res["color"].ravel()[0] if hasattr(
                        res["color"], "ravel") else 0.0)
                    t0 = time.perf_counter()
            dt = (time.perf_counter() - t0) / 2
            rays = h * w
            print(f"chunk={chunk:6d}  {rays / dt:10.1f} rays/s  "
                  f"{dt * 1e3:8.1f} ms/frame", flush=True)
        except Exception as exc:
            print(f"chunk={chunk:6d}  FAILED: "
                  f"{str(exc).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
