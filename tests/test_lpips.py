"""LPIPS-in-JAX structural tests with synthetic (random) weights.

No pretrained VGG weights exist in this environment, so these tests verify
the architecture (shapes, checkpoint ingestion from both npz and torch
formats, metric properties) rather than golden values."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from copenerf_tpu.evaluation import lpips_jax


_VGG_CONV_SHAPES = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]


def _fake_checkpoints(tmp_path, fmt="npz"):
    rng = np.random.RandomState(0)
    vgg = {}
    for i, c_out, c_in in _VGG_CONV_SHAPES:
        vgg[f"features.{i}.weight"] = rng.randn(
            c_out, c_in, 3, 3).astype(np.float32) * 0.05
        vgg[f"features.{i}.bias"] = np.zeros(c_out, np.float32)
    lin = {}
    for s, ch in enumerate(lpips_jax.STAGE_CHANNELS):
        lin[f"lin{s}.model.1.weight"] = np.abs(
            rng.randn(1, ch, 1, 1).astype(np.float32))
    if fmt == "npz":
        vgg_path = str(tmp_path / "vgg16.npz")
        lin_path = str(tmp_path / "vgg.npz")
        np.savez(vgg_path, **vgg)
        np.savez(lin_path, **lin)
    else:
        import torch

        vgg_path = str(tmp_path / "vgg16.pth")
        lin_path = str(tmp_path / "vgg.pth")
        torch.save({k: torch.from_numpy(v) for k, v in vgg.items()}, vgg_path)
        torch.save({k: torch.from_numpy(v) for k, v in lin.items()}, lin_path)
    return vgg_path, lin_path


@pytest.mark.parametrize("fmt", ["npz", "torch"])
def test_load_and_metric_properties(tmp_path, fmt):
    vgg_path, lin_path = _fake_checkpoints(tmp_path, fmt)
    params = lpips_jax.load_weights(vgg_path, lin_path)
    assert len(params["stages"]) == 5 and len(params["heads"]) == 5

    rng = np.random.RandomState(1)
    a = rng.rand(3, 64, 64).astype(np.float32)
    b = rng.rand(3, 64, 64).astype(np.float32)
    d_aa = float(lpips_jax.lpips(params, a, a))
    d_ab = float(lpips_jax.lpips(params, a, b))
    d_ba = float(lpips_jax.lpips(params, b, a))
    assert abs(d_aa) < 1e-6                 # identity -> 0
    assert d_ab > 1e-4                      # distinct images -> positive
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)   # symmetric


def test_env_var_discovery_and_eval_hook(tmp_path, monkeypatch):
    vgg_path, lin_path = _fake_checkpoints(tmp_path, "npz")
    monkeypatch.setenv("COPENERF_LPIPS_VGG", vgg_path)
    monkeypatch.setenv("COPENERF_LPIPS_LIN", lin_path)
    fn = lpips_jax.lpips_fn_jax()
    assert fn is not None
    rng = np.random.RandomState(2)
    v = fn(rng.rand(3, 32, 32).astype(np.float32),
           rng.rand(3, 32, 32).astype(np.float32))
    assert np.isfinite(v) and v > 0

    from copenerf_tpu.evaluation.metrics_image import lpips_fn

    assert lpips_fn() is not None           # resolution picks the JAX path


def test_missing_weights_resolves_none(monkeypatch):
    monkeypatch.delenv("COPENERF_LPIPS_VGG", raising=False)
    monkeypatch.delenv("COPENERF_LPIPS_LIN", raising=False)
    monkeypatch.setattr(os.path, "expanduser", lambda p: "/nonexistent")
    assert lpips_jax.lpips_fn_jax() is None


def test_missing_weights_warns_loudly(monkeypatch):
    """The eval-facing resolver must REPORT unavailability, not skip
    silently (reference protocol triple is PSNR/SSIM/LPIPS)."""
    monkeypatch.delenv("COPENERF_LPIPS_VGG", raising=False)
    monkeypatch.delenv("COPENERF_LPIPS_LIN", raising=False)
    monkeypatch.setattr(os.path, "expanduser", lambda p: "/nonexistent")
    from copenerf_tpu.evaluation.metrics_image import lpips_fn

    with pytest.warns(UserWarning, match="LPIPS unavailable"):
        assert lpips_fn() is None


def test_export_pack_workflow(tmp_path, monkeypatch):
    """The documented weight-pack command: every accepted source layout
    (torchvision vgg16 + PerceptualSimilarity heads, pip-lpips combined,
    post-rename heads) exports to the canonical npz pack, the evaluator
    discovers it, and the metric matches direct ingestion."""
    import torch

    from copenerf_tpu.evaluation import lpips_export

    vgg_path, lin_path = _fake_checkpoints(tmp_path, "torch")
    vgg_np = {k: v.numpy() for k, v in torch.load(vgg_path).items()}
    lin_np = {k: v.numpy() for k, v in torch.load(lin_path).items()}

    # Source layout 1: torchvision-style vgg + PerceptualSimilarity heads.
    out1 = str(tmp_path / "pack1")
    p_vgg, p_lin = lpips_export.export(vgg=vgg_path, lin=lin_path,
                                       out_dir=out1)
    assert p_vgg.endswith("vgg16.npz") and p_lin.endswith("vgg.npz")

    # Source layout 2: one combined pip-lpips state dict
    # (net.slice{s}.{i}.* + lins.{k}.model.1.weight).
    slice_of = {}
    for s, idxs in enumerate(lpips_jax._VGG16_STAGES, start=1):
        for i in idxs:
            slice_of[i] = s
    combined = {}
    for k, v in vgg_np.items():
        i = int(k.split(".")[1])
        combined[f"net.slice{slice_of[i]}.{i}.{k.split('.')[2]}"] = v
    for s in range(5):
        combined[f"lins.{s}.model.1.weight"] = \
            lin_np[f"lin{s}.model.1.weight"]
    comb_path = str(tmp_path / "lpips_vgg_full.pth")
    torch.save({k: torch.from_numpy(v) for k, v in combined.items()},
               comb_path)
    out2 = str(tmp_path / "pack2")
    lpips_export.export(combined=comb_path, out_dir=out2)

    # Source layout 3: heads in the post-get_state_dict rename ({k}.1.weight).
    renamed = {f"{s}.1.weight": torch.from_numpy(
        lin_np[f"lin{s}.model.1.weight"]) for s in range(5)}
    ren_path = str(tmp_path / "renamed.pth")
    torch.save(renamed, ren_path)
    out3 = str(tmp_path / "pack3")
    lpips_export.main(["--vgg", vgg_path, "--lin", ren_path, "--out", out3])

    # All three packs must produce the identical metric, equal to direct
    # ingestion of the original checkpoints.
    rng = np.random.RandomState(5)
    a = rng.rand(3, 32, 32).astype(np.float32)
    b = rng.rand(3, 32, 32).astype(np.float32)
    direct = float(lpips_jax.lpips(
        lpips_jax.load_weights(vgg_path, lin_path), a, b))
    for out in (out1, out2, out3):
        params = lpips_jax.load_weights(os.path.join(out, "vgg16.npz"),
                                        os.path.join(out, "vgg.npz"))
        np.testing.assert_allclose(
            float(lpips_jax.lpips(params, a, b)), direct, rtol=1e-6)

    # The evaluator's default discovery finds the pack with zero config.
    monkeypatch.delenv("COPENERF_LPIPS_VGG", raising=False)
    monkeypatch.delenv("COPENERF_LPIPS_LIN", raising=False)
    monkeypatch.setattr(lpips_jax.os.path, "expanduser",
                        lambda p: out1 if p.endswith("lpips") else p)
    assert lpips_jax.lpips_fn_jax() is not None


def test_export_rejects_malformed(tmp_path):
    """Wrong shapes / missing keys fail loudly, never write a bad pack."""
    from copenerf_tpu.evaluation import lpips_export

    vgg_path, lin_path = _fake_checkpoints(tmp_path, "npz")
    bad = dict(np.load(vgg_path))
    bad["features.0.weight"] = bad["features.0.weight"][:, :2]  # wrong C_in
    bad_path = str(tmp_path / "bad_vgg.npz")
    np.savez(bad_path, **bad)
    with pytest.raises(ValueError, match="features.0.weight"):
        lpips_export.export(vgg=bad_path, lin=lin_path,
                            out_dir=str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never"))

    incomplete = {k: v for k, v in dict(np.load(lin_path)).items()
                  if "lin4" not in k}
    inc_path = str(tmp_path / "inc_lin.npz")
    np.savez(inc_path, **incomplete)
    with pytest.raises(KeyError, match="lin4"):
        lpips_export.export(vgg=vgg_path, lin=inc_path,
                            out_dir=str(tmp_path / "never"))


@pytest.mark.skipif(not conftest.has_reference(),
                    reason="reference repo not available")
def test_golden_vs_reference_lpips(tmp_path, monkeypatch):
    """Golden numerics vs the reference's in-tree lpipsPyTorch
    (/root/reference/lpipsPyTorch/modules/lpips.py:8-36) with ONE set of
    random VGG16 + linear-head weights loaded into both implementations,
    on the reference protocol's input convention ([0, 1] images, no
    [-1, 1] rescale — eval.py:201-206)."""
    conftest.setup_reference_trainer_env()  # torchvision stub (real vgg16)
    import torch

    # test_metrics_golden stubs lpipsPyTorch.modules.lpips (LPIPS=object)
    # to import co3d_metric without torchvision; if that ran first, evict
    # the stub so the REAL reference module loads here.
    import sys as _sys

    _mod = _sys.modules.get("lpipsPyTorch.modules.lpips")
    if _mod is not None and not hasattr(_mod, "get_state_dict"):
        for _name in [m for m in list(_sys.modules)
                      if m.startswith("lpipsPyTorch")]:
            del _sys.modules[_name]

    from lpipsPyTorch.modules import lpips as ref_lpips_mod

    vgg_path, lin_path = _fake_checkpoints(tmp_path, "npz")
    vgg_np = dict(np.load(vgg_path))
    lin_np = dict(np.load(lin_path))

    # Linear heads in the post-rename key layout get_state_dict produces
    # (utils.py:22-30): 'linS.model.1.weight' -> 'S.1.weight'.
    lin_sd = {f"{s}.1.weight": torch.from_numpy(
        lin_np[f"lin{s}.model.1.weight"]) for s in range(5)}
    monkeypatch.setattr(ref_lpips_mod, "get_state_dict",
                        lambda *a, **k: lin_sd)

    crit = ref_lpips_mod.LPIPS(net_type="vgg")
    conv_sd = {}
    for i, _, _ in _VGG_CONV_SHAPES:
        conv_sd[f"{i}.weight"] = torch.from_numpy(
            vgg_np[f"features.{i}.weight"])
        conv_sd[f"{i}.bias"] = torch.from_numpy(vgg_np[f"features.{i}.bias"])
    crit.net.layers.load_state_dict(conv_sd)

    params = lpips_jax.load_weights(vgg_path, lin_path)

    rng = np.random.RandomState(11)
    for _ in range(3):
        a = rng.rand(3, 40, 56).astype(np.float32)
        b = np.clip(a + rng.randn(3, 40, 56).astype(np.float32) * 0.1,
                    0, 1).astype(np.float32)
        with torch.no_grad():
            ref = float(crit(torch.from_numpy(a), torch.from_numpy(b)))
        ours = float(lpips_jax.lpips(params, a, b))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
