"""Multi-step training-TRAJECTORY parity against the PyTorch reference.

``test_aux_loss_parity.py`` proves the stage-1 objective and gradients at
single-step granularity; this harness proves the trainer MACHINERY over
hundreds of iterations: both real train loops (the reference
``train.Trainer.train`` at ``/root/reference/train.py:333-560`` with its
``Adam`` + ``MultiStepLR`` (:116-123) + warmup (:265-271) + lr-half-drop
(:345-352) + weight-annealing (:251-263) stack, and OUR
``training.trainer.Trainer`` with ``LRState``/``_anneal_weights``) run
N_ITERS iterations from an identical init with identical RNG streams
(injected ``torch.randperm`` patch sampling + ``torch.rand`` stratified
jitter, replayed through the real jitted step via
``StepStatic.inject_sampling``).

The schedule covers, inside the window: lr warmup end (it 30), both
annealing endpoints (its 50/60), an lr HALF-DROP (epoch 12) and two
MultiStepLR milestones (epoch-end 8 and 18) — the exact machinery the
single-step tests cannot see.

Asserted:
  1. schedule scalars per iteration (field lr, motion lr, annealed sdf /
     consistency weights) — EXACT (these are host-side floats; any
     off-by-one in it-vs-epoch indexing fails here loudly);
  2. per-term loss curves at early/mid/late checkpoints — window means
     with tolerances that grow with it (fp32 drift compounds across
     hundreds of chaotic optimization steps on different backends);
  3. parameter drift direction + magnitude at the end of the run
     (cosine of theta_T - theta_0 against the reference, relative norm).
"""

import os
import sys

import numpy as np
import pytest

import conftest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not conftest.has_reference(),
                       reason="reference repo not available"),
]

conftest.add_reference_to_path()
conftest.setup_reference_trainer_env()

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from synthetic_scene import make_scene  # noqa: E402

from copenerf_tpu.models.torch_io import (color_params_from_torch,  # noqa: E402
                                          motion_params_from_torch,
                                          nerf_params_from_torch,
                                          sdf_params_from_torch,
                                          variance_params_from_torch)
from copenerf_tpu.training.step import StepStatic, build_train_step  # noqa: E402
from copenerf_tpu.training.trainer import Trainer  # noqa: E402

N_FRAMES = 12
RES_H, RES_W = 48, 64
N_POINTS = 32
N_TRAIN = 11                      # i_test = [4] at sample_rate 8
N_EPOCHS = 20
N_ITERS = N_EPOCHS * N_TRAIN      # 220
CKPT_ITS = (0, 49, 119, N_ITERS - 1)
WARM_UP_IT = 30
SCHED_START, SCHED_EPOCH = 8, 22  # MultiStepLR milestones 8, 18 (step 10)
LR_DROP_EPOCH = 12
END_SDF_ANNEAL, END_CONS_ANNEAL = 60, 50

_N_SDF_LAYERS = 4
_N_COLOR_LAYERS = 2
_N_MOTION_LAYERS = 2

TINY = {
    "neus_sdf_network": {"d_hidden": 64, "n_layers": 4, "skip_in": [2],
                         "d_out": 33},
    "neus_rendering_network": {"d_feature": 32, "d_hidden": 32,
                               "n_layers": 2},
    "motion_network": {"d_hidden": 32, "n_layers": 2, "skip_in": [1]},
    "neus_nerf": {"D": 2, "W": 32},
    "neus_renderer": {"n_samples": 16, "n_importance": 16,
                      "up_sample_steps": 2},
}

TRAIN_OVERRIDES = {
    "resolution": [RES_H, RES_W],
    "original_resolution": [RES_H, RES_W],
    "vis_resolution": [12, 16],
    "n_training_points": N_POINTS,
    "patch_size": 4,
    "pretrained_sdf_path": None,
    "coarse_to_fine_scheduler": {},
    "scheduling_start": SCHED_START,
    "scheduling_epoch": SCHED_EPOCH,
    "start_query_world_epoch": 10 ** 6,   # stay in stage 1
    "end_smooth_epoch": 10 ** 6,
    "nb_warm_up_it": WARM_UP_IT,
    "lr_drop_half_epoch": [LR_DROP_EPOCH],
    "end_sdf_weight_increase_iteration": END_SDF_ANNEAL,
    "end_consistency_weight_increase_iteration": END_CONS_ANNEAL,
    "checkpoint_every": -1,
    "eval_pose_every": 10 ** 6,
    "print_every": 10 ** 6,
    "depth_bound_update_every_milestones": [0, 0, 0],
}


class _Stop(Exception):
    pass


def _snapshot_nets(trainer):
    return {
        "sdf": {k: v.detach().numpy().copy()
                for k, v in trainer.sdf_network.state_dict().items()},
        "color": {k: v.detach().numpy().copy()
                  for k, v in trainer.color_network.state_dict().items()},
        "motion": {k: v.detach().numpy().copy()
                   for k, v in trainer.motion_network.state_dict().items()},
        "variance": {k: v.detach().numpy().copy()
                     for k, v in
                     trainer.deviation_network.state_dict().items()},
    }


def _ray_idx_from_perm(perm, h, w, patch_size, n_points):
    """Reference get_patch_indices (model/training.py:413-436) given the
    injected randperm."""
    ps = patch_size
    n_patches = n_points // (ps * ps)
    h_adj, w_adj = h - ps + 1, w - ps + 1
    corners = perm[:n_patches]
    rows, cols = corners // w_adj, corners % w_adj
    off = np.arange(ps)
    offsets = (off[None, :] + off[:, None] * w).reshape(-1)
    return ((rows * w + cols)[:, None] + offsets[None, :]).reshape(-1)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traj"))
    base, name = make_scene(root, n_frames=N_FRAMES, h=RES_H, w=RES_W,
                            write_depth=False)
    return root, base, name


def _scene_yaml(root, base, name, out_dir):
    path = os.path.join(root, f"scene_{os.path.basename(out_dir)}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump({
            "dataloading": {
                "path": base, "scene": [name], "resize_factor": None,
                "n_workers": 0, "shuffle": False, "load_gt_depth": False,
                "sample_rate": 8, "crop_size": 0,
            },
            "training": dict(TRAIN_OVERRIDES, out_dir=out_dir),
            **TINY,
        }, f)
    return path


@pytest.fixture(scope="module")
def reference_run(scene):
    """Drive the REAL reference trainer (real backprop, real schedulers)
    for N_ITERS; capture per-it losses + schedule scalars + RNG draws and
    parameter snapshots at CKPT_ITS."""
    root, base, name = scene
    out_dir = os.path.join(root, "ref_out")
    cfg_path = _scene_yaml(root, base, name, out_dir)

    import dataloading as dl
    ref_train = conftest.setup_reference_trainer_env()

    cfg = dl.load_config(cfg_path, "/root/reference/configs/default.yaml")
    torch.manual_seed(0)
    trainer = ref_train.Trainer(cfg)
    trainer.device = "cpu"
    trainer.model.device = "cpu"
    ref_train.cfg = cfg

    init_params = {
        "sdf": sdf_params_from_torch(trainer.sdf_network.state_dict(),
                                     n_layers=_N_SDF_LAYERS),
        "color": color_params_from_torch(
            trainer.color_network.state_dict(), n_layers=_N_COLOR_LAYERS),
        "motion": motion_params_from_torch(
            trainer.motion_network.state_dict(), n_layers=_N_MOTION_LAYERS),
        "variance": variance_params_from_torch(
            trainer.deviation_network.state_dict()),
        "nerf": nerf_params_from_torch(trainer.nerf_outside.state_dict(),
                                       depth=TINY["neus_nerf"]["D"]),
    }

    rand_state = np.random.RandomState(123)
    perm_state = np.random.RandomState(321)
    t_rands, perms, records, ckpts = [], [], [], {}
    orig_rand, orig_randperm = torch.rand, torch.randperm
    n_uniform = TINY["neus_renderer"]["n_samples"]

    def fake_rand(*shape, **kw):
        shp = tuple(shape[0]) if shape and isinstance(
            shape[0], (list, tuple, torch.Size)) else tuple(shape)
        if shp == (N_POINTS, n_uniform):
            arr = rand_state.rand(*shp).astype(np.float32)
            t_rands.append(arr)
            return torch.from_numpy(arr)
        return orig_rand(*shape, **kw)

    def fake_randperm(n, **kw):
        p = perm_state.permutation(n)
        perms.append(p)
        return torch.from_numpy(p)

    orig_backprop = trainer.model.backpropagation

    def recording_backprop(loss_dict, train_motion_network):
        it = len(records)
        rec = {
            "losses": {k: float(v.detach()) for k, v in loss_dict.items()},
            "lr": float(trainer.optimizer.param_groups[0]["lr"]),
            "motion_lr": float(
                trainer.motion_optimizer.param_groups[0]["lr"]),
            "w_sdf": float(trainer.model.sdf_weight),
            "w_cons": float(trainer.model.sdf_consistency_weight),
        }
        orig_backprop(loss_dict, train_motion_network)
        records.append(rec)
        if it in CKPT_ITS:
            ckpts[it] = _snapshot_nets(trainer)
        if it >= N_ITERS - 1:
            raise _Stop

    trainer.model.backpropagation = recording_backprop
    trainer.visualize_log = lambda *a, **k: None

    torch.rand, torch.randperm = fake_rand, fake_randperm
    try:
        with pytest.raises(_Stop):
            trainer.train()
    finally:
        torch.rand, torch.randperm = orig_rand, orig_randperm

    assert len(records) == N_ITERS
    assert len(t_rands) == N_ITERS and len(perms) == N_ITERS
    ray_idxs = [_ray_idx_from_perm(p, RES_H, RES_W, 4, N_POINTS)
                for p in perms]
    # Host copies: the jitted step DONATES its state, so handing these jnp
    # arrays to the trainer would delete them under the fixture's feet.
    init_params = jax.tree_util.tree_map(np.array, init_params)
    return init_params, records, ckpts, ray_idxs, t_rands


class _InjectedTrainer(Trainer):
    """The REAL trainer, with (a) the step consuming the reference's
    recorded ray/jitter streams and (b) per-it metric/param recording.
    Everything else — LRState, annealing, epoch bookkeeping, stage logic —
    is the production code under test."""

    def __init__(self, cfg, init_params, ray_idxs, t_rands):
        self._ray_idxs, self._t_rands = ray_idxs, t_rands
        self.rec, self.param_ckpts = [], {}
        super().__init__(cfg, verbose=False)
        # Identical init: ingest the reference's torch-initialized nets.
        st = self.state
        st["params"].update(jax.tree_util.tree_map(jnp.asarray, init_params))
        from copenerf_tpu.training.step import init_train_state

        self.state = init_train_state(st["params"])

    def _get_step(self, stage1, train_motion):
        key = (self.h, self.w, self.patch_size, stage1, train_motion,
               self.s, "inject")
        if key not in self._steps:
            static = StepStatic(
                h=self.h, w=self.w, patch_size=self.patch_size,
                n_points=self.rays_per_step, stage1=stage1,
                n_images=self.total_nb_images,
                nb_sample_timestep=self.nb_sample_timestep,
                n_ref=self.n_ref, train_motion=train_motion,
                sdf_cons_pose_grad=self.tr[
                    "sdf_consistency_enable_pose_grad"],
                use_flow_rgb=(sum(self.tr["flow_rgb_weight"]) != 0),
                use_sdf_consistency=(
                    sum(self.tr["sdf_consistency_weight"]) != 0),
                smooth_scale=self.s, inject_sampling=True)
            inner = build_train_step(self.field_cfgs, self.rcfg, static,
                                     mesh=self.mesh)

            def wrapped(state, batch, key_, _inner=inner):
                state, metrics = _inner(state, batch, key_)
                self.rec[-1]["losses"] = {
                    k: float(metrics[k]) for k in
                    ("loss", "loss_rgb", "loss_eikonal", "loss_sdf",
                     "loss_flow_rgb", "sdf_consistency_loss",
                     "edge_aware_smoothness_loss", "smoothness_loss",
                     "l2_mean")}
                if self.it in CKPT_ITS:
                    self.param_ckpts[self.it] = jax.tree_util.tree_map(
                        np.asarray, state["params"])
                return state, metrics

            self._steps[key] = wrapped
        return self._steps[key]

    def _make_batch(self, pos, lr, motion_lr):
        b = super()._make_batch(pos, lr, motion_lr)
        it = self.it
        b["ray_idx"] = jnp.asarray(self._ray_idxs[it], jnp.int32)
        b["t_rand"] = jnp.asarray(self._t_rands[it])
        self.rec.append({"lr": lr, "motion_lr": motion_lr,
                         "w_sdf": self.w_sdf, "w_cons": self.w_sdf_cons})
        return b


@pytest.fixture(scope="module")
def our_run(scene, reference_run):
    root, base, name = scene
    init_params, _, _, ray_idxs, t_rands = reference_run
    out_dir = os.path.join(root, "our_out")
    from copenerf_tpu.config.loader import load_config

    cfg = load_config(_scene_yaml(root, base, name, out_dir))
    trainer = _InjectedTrainer(cfg, init_params, ray_idxs, t_rands)
    # The reference loader runs shuffle=False (in-order views); our loop
    # permutes — pin it to the same order for the comparison window.
    orig_perm = np.random.permutation
    np.random.permutation = np.arange
    try:
        trainer.train(max_epochs=N_EPOCHS)
    finally:
        np.random.permutation = orig_perm
    assert len(trainer.rec) >= N_ITERS
    return trainer


def test_schedule_scalars_track_exactly(reference_run, our_run):
    """lr / motion-lr / annealed weights per iteration: EXACT parity of
    the host-side schedule machinery across warmup end (it 30), both
    annealing endpoints (50/60), the epoch-12 half-drop and the epoch-8/18
    MultiStepLR milestones."""
    _, ref_recs, _, _, _ = reference_run
    ours = our_run.rec
    for it in range(N_ITERS):
        r, o = ref_recs[it], ours[it]
        assert o["lr"] == pytest.approx(r["lr"], rel=1e-6), it
        assert o["motion_lr"] == pytest.approx(r["motion_lr"],
                                               rel=1e-6, abs=1e-12), it
        assert o["w_sdf"] == pytest.approx(r["w_sdf"], rel=1e-6), it
        assert o["w_cons"] == pytest.approx(r["w_cons"], rel=1e-6), it
    # The events actually happened inside the window.
    lrs = [r["lr"] for r in ref_recs]
    assert lrs[0] == 0.0 and lrs[WARM_UP_IT - 1] < lrs[WARM_UP_IT + 1] * 2
    drop_it = LR_DROP_EPOCH * N_TRAIN
    assert lrs[drop_it] == pytest.approx(lrs[drop_it - 1] / 2, rel=1e-6)
    # MultiStepLR milestone 8 takes effect from epoch 8's FIRST iteration
    # (scheduler.step() at the end of epoch 7 increments last_epoch to 8).
    m0 = SCHED_START * N_TRAIN
    assert lrs[m0] < lrs[m0 - 1]


def test_loss_curves_track(reference_run, our_run):
    """Per-term loss curves at early/mid/late windows. Tolerances widen
    with it: identical math drifts in fp32 across hundreds of chaotic
    optimization steps; what must NOT happen is systematic divergence."""
    _, ref_recs, _, _, _ = reference_run
    ours = our_run.rec
    windows = [(0, 5, 5e-3), (45, 55, 0.05), (110, 130, 0.15),
               (195, 220, 0.25)]
    for k_ours, k_ref in [("loss", "loss"), ("loss_rgb", "loss_rgb"),
                          ("loss_eikonal", "loss_eikonal"),
                          ("loss_sdf", "loss_sdf"),
                          ("sdf_consistency_loss", "sdf_consistency_loss")]:
        for lo, hi, tol in windows:
            ref_m = np.mean([ref_recs[i]["losses"][k_ref]
                             for i in range(lo, hi)])
            our_m = np.mean([ours[i]["losses"][k_ours]
                             for i in range(lo, hi)])
            assert our_m == pytest.approx(ref_m, rel=tol, abs=1e-4), (
                k_ref, lo, hi, ref_m, our_m)


def test_parameter_drift_tracks(reference_run, our_run):
    """theta_T - theta_0 points the same way and has the same magnitude in
    both implementations at every checkpoint."""
    init_params, _, ref_ckpts, _, _ = reference_run
    ingest = {
        "sdf": lambda sd: sdf_params_from_torch(sd,
                                                n_layers=_N_SDF_LAYERS),
        "color": lambda sd: color_params_from_torch(
            sd, n_layers=_N_COLOR_LAYERS),
        "motion": lambda sd: motion_params_from_torch(
            sd, n_layers=_N_MOTION_LAYERS),
        "variance": variance_params_from_torch,
    }

    def flatten_ours(tree):
        return np.concatenate([np.asarray(leaf, np.float64).ravel()
                               for leaf in jax.tree_util.tree_leaves(tree)])

    for it, ref_sd in ref_ckpts.items():
        if it == 0:
            cos_min, rel_tol = 0.999, 0.02
        elif it < 150:
            cos_min, rel_tol = 0.98, 0.10
        else:
            cos_min, rel_tol = 0.95, 0.20
        for net in ("sdf", "color", "motion", "variance"):
            ref_p = ingest[net](ref_sd[net])
            d_ref = flatten_ours(ref_p) - flatten_ours(init_params[net])
            d_our = (flatten_ours(our_run.param_ckpts[it][net]) -
                     flatten_ours(init_params[net]))
            nr, no = np.linalg.norm(d_ref), np.linalg.norm(d_our)
            if nr == 0.0:
                # Warmup lr is exactly 0 at it=0: the field optimizers take
                # a zero step. Both sides must agree on "frozen".
                assert no == 0.0, (it, net, no)
                continue
            assert no > 0, (it, net)
            cos = float(d_ref @ d_our / (nr * no))
            assert cos > cos_min, (it, net, cos)
            assert abs(no - nr) / nr < rel_tol, (it, net, nr, no)
