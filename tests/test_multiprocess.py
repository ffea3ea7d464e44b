"""REAL multi-process execution of the DCN path.

Two subprocesses, 4 virtual CPU devices each, wired by
``jax.distributed.initialize`` into one 8-device global mesh through
``copenerf_tpu.parallel.distributed``; one sharded train step runs SPMD
across both processes and its loss must match the same step on a
single-process 8-device mesh. The worker (tests/_dist_worker.py) is also
runnable standalone — see its docstring."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

import jax

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_loss():
    """Reference value: the same step on this process's 8-device mesh."""
    import test_train_step as T
    from copenerf_tpu.models import init_all_fields
    from copenerf_tpu.parallel.mesh import make_mesh
    from copenerf_tpu.training.step import build_train_step, init_train_state

    mesh = make_mesh(8)
    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(T.FIELD_CFGS, T.RCFG, T._static(stage1=True),
                            mesh=mesh)
    state, metrics = step(state, T._batch(jax.random.PRNGKey(1)),
                          jax.random.PRNGKey(0))
    return float(metrics["loss"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own 4-dev flag
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--out", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        # Skip ONLY when bring-up itself never completed (environment
        # limitation). A hang after successful bring-up is a real
        # distributed regression and must fail loudly.
        if all(os.path.exists(o + ".bringup") for o in outs):
            pytest.fail("2-process step hung AFTER successful "
                        "jax.distributed bring-up — distributed regression")
        pytest.skip("2-process jax.distributed bring-up timed out in this "
                    "environment (worker remains runnable standalone)")

    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    res = [json.load(open(o)) for o in outs]
    assert res[0]["process_count"] == 2
    # Replicated outputs must agree bitwise across processes.
    assert res[0]["loss"] == res[1]["loss"]
    np.testing.assert_array_equal(res[0]["leaf"], res[1]["leaf"])
    # Cross-host shard_to_global sum: process 0 contributes arange(24),
    # process 1 the same + 1000 per element.
    expect = float(np.arange(24).sum() * 2 + 1000.0 * 24)
    assert res[0]["gsum"] == pytest.approx(expect)
    # And the 2-process sharded step equals the single-process 8-device one.
    np.testing.assert_allclose(res[0]["loss"], _single_process_loss(),
                               rtol=2e-4)
