"""Training orchestration: the two-stage epoch loop.

Host-side mirror of the reference driver (``/root/reference/train.py`` class
``Trainer``): stage detection and the stage-1 -> stage-2 transition
(:360-399), coarse-to-fine resolution schedule (:273-286, :354-357),
loss-weight annealing (:246-263), lr warmup/drops/MultiStep decay, pose
evaluation (:206-220), visualization + adaptive depth range
(``model/training.py:157-374``), checkpoint/resume (:106-123, :158-167).

All per-iteration compute is the single jitted step from ``step.py``; the
host loop only assembles scalars and indices.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from ..data.fields import get_data_fields
from ..evaluation.metrics_pose import pose_error_report
from ..evaluation.render import ImageRenderer
from ..models.fields import configs_from_cfg, init_all_fields
from ..models.torch_io import load_pretrained_sdf
from ..ops.renderer import RendererConfig
from ..poses.lie import se3_inverse
from ..poses.motion import full_video_w2c
from ..poses.retriever import pose_retriever_all, pose_retriever_init
from .checkpoints import (load_checkpoint, load_pytree, save_checkpoint,
                          save_pytree)
from .logging_utils import ScalarLogger
from .pose_refinement import motion_init_relative_poses, run_pose_refinement
from .schedules import LRState, cos_anneal_ratio, scalar_annealing
from .step import (StepStatic, build_train_step, init_train_state,
                   make_loss_weights)


class Trainer:
    def __init__(self, cfg: dict, verbose: bool = True):
        self.cfg = cfg
        tr = cfg["training"]
        self.tr = tr
        self.verbose = verbose
        self.out_dir = tr["out_dir"]
        os.makedirs(os.path.join(self.out_dir, "models"), exist_ok=True)
        self.render_path = os.path.join(self.out_dir, "rendering")
        os.makedirs(self.render_path, exist_ok=True)

        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        # Multi-host wiring must happen BEFORE any jax computation (the
        # PRNGKey below initializes the runtime; jax.distributed.initialize
        # refuses to run after that). Mesh construction stays below.
        if tr.get("distributed"):
            from ..parallel import distributed as _dist

            _dist.initialize()
            # Fail fast on a broken fabric AND pre-establish the Gloo/ICI
            # collective context before the heavy train-step compile (its
            # absence makes the first collective race Gloo's 30 s address
            # -exchange deadline against per-process compile skew).
            _dist.barrier("trainer-init")
        self.seed = tr["seed"]
        np.random.seed(self.seed)
        self._base_key = jax.random.PRNGKey(self.seed)

        from ..models.fields import set_fused_sdf

        set_fused_sdf(tr.get("fused_kernels", "auto"))
        self.field_cfgs = configs_from_cfg(cfg)
        self.rcfg = RendererConfig.from_cfg(cfg)

        params = init_all_fields(jax.random.PRNGKey(self.seed),
                                 self.field_cfgs)
        sdf_path = tr.get("pretrained_sdf_path")
        if sdf_path and os.path.isfile(sdf_path):
            params["sdf"] = load_pretrained_sdf(
                sdf_path, self.field_cfgs["sdf"].n_layers)
            self._log("Loaded pretrained SDF warm start")

        # Coarse-to-fine schedule {scale: [start, end]}.
        self.coarse_to_fine = dict(tr.get("coarse_to_fine_scheduler") or {})
        if not self.coarse_to_fine:
            self.coarse_to_fine = {1: [0, int(1e10)]}
        self.s = 1

        self.original_resolution = list(tr["original_resolution"])
        self.resolution = list(tr["resolution"])
        self._build_datasets(self.resolution)

        self.total_nb_images = self.train_field.total_nb_images
        self.gt_poses = self.train_field.c2ws.astype(np.float32)

        # World camera anchor (reference train.py:85-91).
        if tr["world_idx"] == "mid":
            wci = self.total_nb_images // 2
        else:
            wci = int(tr["world_idx"])
        while wci not in self.train_field.i_train:
            wci -= 1
        self.world_cam_idx = wci
        self.world_time_step = wci / (self.total_nb_images - 1) * 2.0 - 1.0

        self.state = init_train_state(params)
        self.depth_range = list(cfg["rendering"]["depth_range"])

        # Resume.
        self.epoch_it, self.it = -1, -1
        self.checkpoint_loaded = False
        try:
            state, scalars = load_checkpoint(
                self.out_dir, model_only=tr["load_ckpt_model_only"])
            # Pre-flat-buffer checkpoints: per-leaf Adam moments -> one
            # flat vector per optimizer (bit-identical continuation).
            from .step import migrate_train_state

            state = migrate_train_state(state)
            # npz storage flattens optax NamedTuple states to plain tuples;
            # restore the exact pytree structure from a fresh state.
            fresh = init_train_state(state["params"])
            leaves = jax.tree_util.tree_leaves(state)
            self.state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(fresh), leaves)
            if not tr["load_ckpt_model_only"]:
                self.epoch_it = int(scalars.get("epoch_it", -1))
                self.it = int(scalars.get("it", -1))
                if "depth_range" in scalars:
                    self.depth_range = list(scalars["depth_range"])
            self.checkpoint_loaded = True
            self._log("Checkpoint found ==> continue training")
        except FileNotFoundError:
            self._log("No checkpoint found ==> train from scratch")

        self.lr_state = LRState(tr)
        # One writer per multi-host job: every file artifact (scalars,
        # checkpoints, refine_pose.npz, rendered pngs/npzs) is written by
        # process 0 only — concurrent writers to the shared out_dir can
        # interleave and corrupt files (np.savez is not atomic).
        self.io_primary = jax.process_index() == 0
        self.logger = ScalarLogger(self.out_dir, enabled=self.io_primary)
        from ..utils.profiling import StepTimer

        self.step_timer = StepTimer(
            window=50,
            log_path=os.path.join(self.out_dir, "logs", "throughput.jsonl"))
        # Set to an iteration number to capture one jax profiler trace there
        # (viewable in TensorBoard/Perfetto); new capability over the
        # reference, which has no profiling at all (SURVEY.md §5).
        self.profile_trace_at_it = tr.get("profile_trace_at_it", -1)
        self.anneal_end = cfg["neus_training"]["neus_anneal_end"]

        self.patch_size = tr["patch_size"]
        self.n_ref = len(cfg["dataloading"]["random_ref_interval"])
        self.nb_sample_timestep = tr["nb_sample_timestep"]
        self.start_query_world_epoch = tr["start_query_world_epoch"]
        self.freeze_camera_pose_period = tr["freeze_camera_pose_period"]
        self.end_smooth_epoch = tr["end_smooth_epoch"]
        self.scheduling_start = tr["scheduling_start"]
        self.scheduling_epoch = tr["scheduling_epoch"]
        self.print_every = tr["print_every"]
        self.checkpoint_every = tr["checkpoint_every"]
        self.eval_pose_every = tr["eval_pose_every"]

        # Current loss weights (stage-[0] entries; annealing below mirrors
        # loss_weight_scalar_annealing, train.py:251-263).
        self.w_rgb = tr["rgb_weight"][0]
        self.w_eik = tr["eikonal_weight"][0]
        self.w_sdf = tr["sdf_weight"][0]
        self.w_flow_rgb = tr["flow_rgb_weight"][0]
        self.w_sdf_cons = tr["sdf_consistency_weight"][0]
        self.w_edge = tr["edge_aware_smoothness_weight"][0]
        self.w_smooth = tr["smoothness_weight"][0]

        # Ray-sharding mesh over the visible chips (replaces DataParallel).
        # With training.distributed, the same ('data',) mesh spans every
        # process's chips (ICI in-slice, DCN across hosts) — see
        # parallel/distributed.py.
        # Batched ray count per step: the reference's protocol is 1024
        # (n_training_points); rays_per_step scales it to feed the chip —
        # every loss term is a per-ray mean, so the objective is unchanged
        # in expectation (tested in test_train_step.py).
        self.rays_per_step = int(tr.get("rays_per_step") or
                                 tr["n_training_points"])
        if self.rays_per_step % (self.patch_size ** 2) != 0:
            raise ValueError(
                f"rays_per_step={self.rays_per_step} must be a multiple of "
                f"patch_size^2={self.patch_size ** 2}")
        self.mesh = None
        if tr.get("distributed"):
            from ..parallel import distributed as dist

            dist.initialize()
            self.mesh = dist.global_mesh()
            self._log(f"Distributed: {jax.process_count()} processes, "
                      f"{len(jax.devices())} global devices")
        else:
            n_dev = tr.get("n_devices") or len(jax.devices())
            if n_dev > 1 and self.rays_per_step % n_dev == 0:
                from ..parallel.mesh import make_mesh

                self.mesh = make_mesh(n_dev)
                self._log(f"Sharding rays over {n_dev} devices")
        # Eval/vis rendering: under multi-process training, render on a
        # PROCESS-LOCAL mesh — render_image feeds host-local chunk arrays
        # into its jit, which must not carry multi-host sharding
        # constraints (each process renders independently; only the
        # primary writes artifacts).
        render_mesh = self.mesh
        if self.mesh is not None and jax.process_count() > 1:
            from ..parallel.mesh import make_mesh as _make_mesh

            render_mesh = _make_mesh(devices=jax.local_devices())
        self.image_renderer = ImageRenderer(
            self.field_cfgs, self.rcfg,
            chunk=tr.get("render_chunk", 32768), mesh=render_mesh)
        self._steps = {}
        self.query_in_canonical_space = False
        self.pose_retriever = None  # (params, init_c2w) in stage 2

    # ------------------------------------------------------------------
    def _log(self, msg):
        if self.verbose:
            print(f"[trainer] {msg}")

    def _build_datasets(self, resolution):
        cfg = dict(self.cfg)
        cfg["training"] = dict(self.cfg["training"])
        cfg["training"]["resolution"] = list(resolution)
        self.cfg["training"]["resolution"] = list(resolution)
        self.train_field = get_data_fields(cfg, "train")["img"]
        self.test_field = get_data_fields(cfg, "eval")["img"]
        self.resolution = list(resolution)
        self.h, self.w = int(resolution[0]), int(resolution[1])
        # Device-resident dataset, stored uint8 (4x less HBM/transfer; the
        # step converts per-gather).
        self.images_all_dev = jnp.asarray(
            np.clip(self.train_field.all_imgs * 255.0 + 0.5, 0,
                    255).astype(np.uint8))
        self.K_all_dev = jnp.asarray(self.train_field.K)
        # Precomputed per-train-view ref masks.
        m = self.train_field.N_imgs
        n_ref = len(self.train_field.random_ref_interval)
        self.ref_idxs = np.zeros((m, n_ref), np.int32)
        self.ref_in_list = np.zeros((m, n_ref), np.float32)
        self.ref_valid_flow = np.zeros((m, n_ref), np.float32)
        for pos, target in enumerate(self.train_field.i_train):
            _, idxs, in_list, valid, _ = self.train_field.ref_tensors(
                int(target), n_ref)
            self.ref_idxs[pos] = idxs
            self.ref_in_list[pos] = in_list
            self.ref_valid_flow[pos] = valid

    def _scale_for_epoch(self, epoch):
        for s, interval in self.coarse_to_fine.items():
            if interval[0] <= epoch <= interval[1]:
                return int(s)
        return int(list(self.coarse_to_fine.keys())[-1])

    def _get_step(self, stage1: bool, train_motion: bool):
        key = (self.h, self.w, self.patch_size, stage1, train_motion, self.s)
        if key not in self._steps:
            static = StepStatic(
                h=self.h, w=self.w, patch_size=self.patch_size,
                n_points=self.rays_per_step, stage1=stage1,
                n_images=self.total_nb_images,
                nb_sample_timestep=self.nb_sample_timestep,
                n_ref=self.n_ref, train_motion=train_motion,
                sdf_cons_pose_grad=self.tr["sdf_consistency_enable_pose_grad"],
                use_flow_rgb=(sum(self.tr["flow_rgb_weight"]) != 0),
                use_sdf_consistency=(
                    sum(self.tr["sdf_consistency_weight"]) != 0),
                smooth_scale=self.s)
            self._steps[key] = build_train_step(self.field_cfgs, self.rcfg,
                                                static, mesh=self.mesh)
        return self._steps[key]

    def time_of(self, idx):
        return idx / (self.total_nb_images - 1) * 2.0 - 1.0

    # ------------------------------------------------------------------
    def _anneal_weights(self, it):
        tr = self.tr
        if tr["end_consistency_weight_increase_iteration"] != -1:
            self.w_sdf_cons = scalar_annealing(
                it, 0.0, tr["end_consistency_weight_increase_iteration"],
                tr["sdf_consistency_weight"][0],
                tr["sdf_consistency_weight"][1])
        if tr["end_sdf_weight_increase_iteration"] != -1:
            self.w_sdf = scalar_annealing(
                it, 0.0, tr["end_sdf_weight_increase_iteration"],
                tr["sdf_weight"][0], tr["sdf_weight"][1])

    def _make_batch(self, pos: int, lr: float, motion_lr: float):
        target = int(self.train_field.i_train[pos])
        t = self.time_of(target)
        if self.query_in_canonical_space:
            query_t = self.world_time_step
            if target != self.world_cam_idx and self.pose_retriever:
                params_r, init_c2w = self.pose_retriever
                world_mat = np.asarray(
                    pose_retriever_all(params_r, init_c2w))[pos]
            else:
                world_mat = np.eye(4, dtype=np.float32)
        else:
            query_t = t
            world_mat = np.eye(4, dtype=np.float32)

        return {
            "images_all": self.images_all_dev,
            "K_all": self.K_all_dev,
            "ref_idxs": jnp.asarray(self.ref_idxs[pos]),
            "ref_in_list": jnp.asarray(self.ref_in_list[pos]),
            "ref_valid_flow": jnp.asarray(self.ref_valid_flow[pos]),
            "scale_mat": jnp.eye(4),
            "world_mat": jnp.asarray(world_mat, jnp.float32),
            "query_time_step": jnp.asarray(query_t, jnp.float32),
            "world_time_step": jnp.asarray(self.world_time_step, jnp.float32),
            "image_idx": jnp.asarray(target, jnp.int32),
            "world_cam_idx": jnp.asarray(self.world_cam_idx, jnp.int32),
            "near": jnp.asarray(self.depth_range[0], jnp.float32),
            "far": jnp.asarray(self.depth_range[1], jnp.float32),
            "cos_anneal_ratio": jnp.asarray(
                cos_anneal_ratio(self.it, self.anneal_end), jnp.float32),
            "loss_weights": make_loss_weights(
                self.w_rgb, self.w_eik, self.w_sdf, self.w_flow_rgb,
                self.w_sdf_cons, self.w_edge, self.w_smooth),
            "lr": jnp.asarray(lr, jnp.float32),
            "motion_lr": jnp.asarray(motion_lr, jnp.float32),
        }

    # ------------------------------------------------------------------
    def pose_evaluation(self):
        """Motion-field pose metrics vs GT on the train split
        (reference pose_evaluation, train.py:206-220)."""
        w2c = np.asarray(full_video_w2c(
            self.field_cfgs["motion"], self.state["params"]["motion"],
            self.total_nb_images, self.nb_sample_timestep))
        pred = np.linalg.inv(w2c[self.train_field.i_train])
        aligned, rpe_t, rpe_r, ate = pose_error_report(pred, self.gt_poses)
        self.logger.add_scalar("eval_pose/rpe_trans", rpe_t, self.epoch_it)
        self.logger.add_scalar("eval_pose/rpe_rot", rpe_r, self.epoch_it)
        self.logger.add_scalar("eval_pose/ate", ate, self.epoch_it)
        return aligned, rpe_t, rpe_r, ate

    def render_train_views(self, out_subdir="extraction_stage1"):
        """No-grad render of every train view; depths feed pose refinement
        (reference render_train_views, train.py:288-305)."""
        ddir = os.path.join(self.out_dir, out_subdir, "depths")
        idir = os.path.join(self.out_dir, out_subdir, "images")
        os.makedirs(ddir, exist_ok=True)
        os.makedirs(idir, exist_ok=True)
        depths = []
        car = cos_anneal_ratio(self.it, self.anneal_end)
        params = self.state["params"]
        if jax.process_count() > 1:
            # Localize global-mesh params to host ONCE for the whole loop;
            # render_image's own per-call conversion is then a no-op on
            # numpy leaves (it would otherwise fetch all weights per view).
            params = jax.tree_util.tree_map(np.asarray, params)
        for pos, target in enumerate(self.train_field.i_train):
            target = int(target)
            res = self.image_renderer.render_image(
                params, self.train_field.K[target],
                np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32),
                self.time_of(target), (self.h, self.w), self.depth_range,
                car)
            depth = res["depth"]
            depths.append(depth)
            if self.io_primary:  # all processes need depths; one writes
                np.savez(
                    os.path.join(ddir, f"depth_{str(target).zfill(6)}.npz"),
                    pred=depth)
                self._save_image(
                    os.path.join(idir, f"{str(target).zfill(6)}.png"),
                    res["color"])
        return np.stack(depths)

    @staticmethod
    def _save_image(path, img01):
        import cv2

        img = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, img)

    # ------------------------------------------------------------------
    def stage2_transition(self, epoch_it: int):
        """Switch to canonical-space queries; refine + freeze poses
        (reference train.py:360-399)."""
        self.query_in_canonical_space = True
        self.lr_state.on_epoch_start(epoch_it, stage2_starts_now=True)
        m = len(self.train_field.i_train)

        pred_poses = None
        if self.tr["do_refine_pose"]:
            # Guarded: a resource failure mid-refinement (render OOM, IO)
            # must not abort training at the stage boundary — fall back to
            # the motion-integrated poses (the do_refine_pose=False path),
            # the same information the refinement would have started from.
            # The catch is NARROW (RuntimeError covers XLA OOM; OSError
            # covers IO): programming errors must propagate, not silently
            # degrade final pose/NVS quality.
            try:
                self._log("Rendering train-view depths for pose refinement")
                depths = self.render_train_views()
                init_c2w = None
                if not self.tr["refine_from_scratch"]:
                    init_c2w = motion_init_relative_poses(
                        self.field_cfgs["motion"],
                        self.state["params"]["motion"],
                        self.train_field.i_train, self.total_nb_images,
                        self.nb_sample_timestep)
                self._log("Performing pose refinement")
                pred_poses = run_pose_refinement(
                    self.train_field.imgs, depths,
                    self.train_field.K[self.train_field.i_train][:, :3, :3],
                    init_c2w=init_c2w, lr=self.tr["pose_refine_lr"],
                    epochs=self.tr["pose_refine_epochs"], logger=self.logger,
                    gt_poses=self.gt_poses, pose_error_fn=pose_error_report)
            except (RuntimeError, OSError, MemoryError) as exc:
                self._log(f"WARNING: pose refinement failed ({exc!r}); "
                          "falling back to motion-integrated poses")
                pred_poses = None
        if pred_poses is None:
            w2c = np.asarray(full_video_w2c(
                self.field_cfgs["motion"], self.state["params"]["motion"],
                self.total_nb_images, self.nb_sample_timestep))
            pred_poses = np.linalg.inv(w2c[self.train_field.i_train])

        # Re-anchor on the world camera (train.py:395).
        world_pos = list(self.train_field.i_train).index(self.world_cam_idx)
        pred_poses = (np.linalg.inv(pred_poses) @
                      pred_poses[world_pos][None]).astype(np.float32)
        params_r, init_c2w = pose_retriever_init(m, init_c2w=pred_poses)
        self.pose_retriever = (params_r, init_c2w)
        if self.io_primary:  # every process holds the poses; one writes
            save_pytree(
                os.path.join(self.out_dir, "models", "refine_pose.npz"),
                {"init_c2w": np.asarray(init_c2w)})
        self._log(f"Start querying in canonical space at epoch {epoch_it}")

    def _load_refine_pose(self):
        blob = load_pytree(os.path.join(self.out_dir, "models",
                                        "refine_pose.npz"))
        m = len(self.train_field.i_train)
        params_r, _ = pose_retriever_init(m)
        self.pose_retriever = (params_r, jnp.asarray(blob["init_c2w"]))

    # ------------------------------------------------------------------
    def visualize(self, pos: int, epoch_it: int):
        """Periodic visualization + adaptive depth-range update
        (reference render_visdata, model/training.py:157-374)."""
        target = int(self.train_field.i_train[pos])
        vis_res = self.tr["vis_resolution"]
        if self.query_in_canonical_space and target != self.world_cam_idx:
            query_t = self.world_time_step
            if self.pose_retriever is not None:
                params_r, init_c2w = self.pose_retriever
                world_mat = np.asarray(
                    pose_retriever_all(params_r, init_c2w))[pos]
            else:
                world_mat = np.eye(4, dtype=np.float32)
        else:
            query_t = self.time_of(target)
            world_mat = np.eye(4, dtype=np.float32)

        want_flow = not self.query_in_canonical_space
        res = self.image_renderer.render_image(
            self.state["params"], self.train_field.K[target], world_mat,
            np.eye(4, dtype=np.float32), query_t, vis_res, self.depth_range,
            cos_anneal_ratio(self.it, self.anneal_end), want_pts=want_flow)

        if self.io_primary:  # one writer; the depth-range update below
            # must still run on EVERY process (it feeds near/far).
            out_dir = os.path.join(self.render_path, f"{self.it:04d}_vis")
            os.makedirs(out_dir, exist_ok=True)
            if want_flow:
                try:
                    flow_img = self._flow_visualization(res, target, vis_res)
                    self._save_image(
                        os.path.join(out_dir, f"{target:04d}_flow.png"),
                        flow_img)
                except Exception as e:
                    self._log(f"flow vis failed: {e}")
            disp = 1.0 / np.maximum(res["depth"], 1e-6)
            disp = disp / max(disp.max(), 1e-6)
            self._save_image(os.path.join(out_dir, f"{target:04d}_img.png"),
                             res["color"])
            self._save_image(
                os.path.join(out_dir, f"{target:04d}_disparity.png"), disp)
            normal_img = np.clip(res["normal"] * 0.5 + 0.5, 0, 1)
            self._save_image(
                os.path.join(out_dir, f"{target:04d}_normal.png"), normal_img)
            disp_hw = 1.0 / np.maximum(res["depth_highest"], 1e-6)
            disp_hw = disp_hw / max(disp_hw.max(), 1e-6)
            self._save_image(
                os.path.join(out_dir,
                             f"{target:04d}_disparity_highest_weight.png"),
                disp_hw)

        # Adaptive depth range (model/training.py:339-355).
        depth_bound_lr = 0.0
        for mi, milestone in enumerate(
                self.tr["depth_bound_scheduler_milestones"]):
            if self.it >= milestone:
                depth_bound_lr = self.tr["depth_bound_lr"][mi]
        wz = res["weighted_z"]
        max_depth = float(wz.max()) * 1.1
        self.depth_range[1] = (self.depth_range[1] * (1 - depth_bound_lr) +
                               max_depth * depth_bound_lr)
        self.logger.add_scalar("stats/depth_running_max", self.depth_range[1],
                               self.it)

        # Depth metrics against GT during training (model/training.py:357-372).
        if len(self.train_field.gt_depths) != 0:
            from .depth_metrics import compute_depth_errors

            gt = self.train_field.gt_depths[target]
            names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
            errs = compute_depth_errors(gt, res["depth"])
            for name, val in zip(names, errs):
                self.logger.add_scalar(f"depth_eval/{name}", val, self.it)
        return res

    def _flow_visualization(self, res, target: int, vis_res):
        """Forward optical flow from integrated scene flow
        (reference render_visdata, model/training.py:264-303): advect each
        sample point along the motion field to the last ref frame's time,
        composite with render weights, reproject, color-code."""
        import cv2

        from ..models.fields import motion_apply
        from ..ops.rays import arange_pixels

        h, w = int(vis_res[0]), int(vis_res[1])
        n_sub = self.nb_sample_timestep * self.train_field.random_ref_interval[-1]
        t0 = self.time_of(target)
        t1 = self.time_of(target + self.train_field.random_ref_interval[-1])
        times = np.linspace(t0, t1, n_sub + 1)[:-1].astype(np.float32)
        omega, vel = motion_apply(self.field_cfgs["motion"],
                                  self.state["params"]["motion"],
                                  jnp.asarray(times[:, None]))
        omega = np.asarray(omega)
        vel = np.asarray(vel)
        dt = (t1 - t0) / n_sub

        pts = res["pts_flat"].reshape(-1, 3)          # (h*w*S, 3)
        n_samples = res["weights_flat"].shape[1]
        for k in range(n_sub):
            flow = np.cross(np.broadcast_to(omega[k], pts.shape), pts) + vel[k]
            pts = pts + dt * flow
        weights = res["weights_flat"].reshape(h * w, n_samples, 1)
        pts_sf = (weights * pts.reshape(h * w, n_samples, 3)).sum(1)

        proj = self.train_field.K[target][:3, :3]
        pix = pts_sf @ proj.T
        pix2 = pix[:, :2] / np.where(np.abs(pix[:, 2:]) < 1e-8, 1e-8,
                                     pix[:, 2:])
        _, grid = arange_pixels((h, w))
        flow2d = pix2 - grid
        flow2d[:, 0] *= w / 2.0
        flow2d[:, 1] *= h / 2.0
        flow2d = flow2d.reshape(h, w, 2)

        mag, ang = cv2.cartToPolar(flow2d[..., 0], flow2d[..., 1])
        hsv = np.zeros((h, w, 3), np.uint8)
        hsv[..., 0] = (ang * 180 / np.pi / 2).astype(np.uint8)
        hsv[..., 1] = 255
        hsv[..., 2] = cv2.normalize(mag, None, 0, 255,
                                    cv2.NORM_MINMAX).astype(np.uint8)
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0

    def vis_pose_2d(self, aligned_pred_pose: np.ndarray):
        """XY scatter of predicted vs GT camera centers
        (reference train.py:222-233)."""
        if not self.io_primary:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt
        except Exception:
            return
        fig = plt.figure()
        plt.scatter(aligned_pred_pose[:, 0, -1], aligned_pred_pose[:, 1, -1])
        plt.scatter(self.gt_poses[:, 0, -1], self.gt_poses[:, 1, -1])
        plt.legend(["Pred", "Gt"])
        plt.title(f"Epoch: {self.epoch_it}")
        plt.xlabel("X-axis")
        plt.ylabel("Y-axis")
        vis_dir = os.path.join(self.out_dir, "poses_vis")
        os.makedirs(vis_dir, exist_ok=True)
        plt.savefig(os.path.join(vis_dir, f"{self.epoch_it}.jpg"),
                    bbox_inches="tight")
        plt.close(fig)

    def extract_geometry(self, bound_min=(-1.2, -1.2, -1.2),
                         bound_max=(1.2, 1.2, 1.2), resolution: int = 128,
                         threshold: float = 0.0, time_step: float = None):
        """Marching mesh of the SDF zero level set (reference
        neus_renderer.py:586-591 via mcubes; here the native mesher)."""
        from ..mesher.marching_cubes import extract_geometry as _extract
        from ..models.fields import sdf_value

        t = self.world_time_step if time_step is None else time_step
        params = self.state["params"]["sdf"]
        cfg = self.field_cfgs["sdf"]

        @jax.jit
        def query(pts):
            pts_t = jnp.concatenate(
                [pts, jnp.full_like(pts[:, :1], t)], axis=-1)
            return -sdf_value(cfg, params, pts_t)[:, 0]

        return _extract(bound_min, bound_max, resolution, threshold,
                        lambda p: np.asarray(query(jnp.asarray(p))))

    # ------------------------------------------------------------------
    def prepare_training(self):
        self.current_epoch = self.epoch_it + 1 if self.epoch_it != -1 else 0
        self.query_in_canonical_space = (
            self.current_epoch >= self.start_query_world_epoch)
        s = self._scale_for_epoch(self.current_epoch)
        if s != 1 or self.resolution != [self.original_resolution[0] // s,
                                         self.original_resolution[1] // s]:
            new_res = [self.original_resolution[0] // s,
                       self.original_resolution[1] // s]
            self.s = s
            self._build_datasets(new_res)
        if self.current_epoch > self.end_smooth_epoch:
            self.w_smooth = self.tr["smoothness_weight"][1]
            self.w_edge = self.tr["edge_aware_smoothness_weight"][1]
            self.patch_size = 1
        if self.epoch_it > self.start_query_world_epoch:
            self._log("Loading pre-computed camera poses")
            self._load_refine_pose()
        # Rebuild the group-lr mutation sequence on resume (decays, drops,
        # warmup overwrites, stage-2 reset — order matters, see LRState).
        for e in range(0, self.current_epoch):
            self.lr_state.replay_epoch(
                e, self.train_field.N_imgs,
                stage2_starts_now=(e == self.start_query_world_epoch))
        return self.resolution

    def train(self, max_epochs: int | None = None):
        self.prepare_training()
        self._log(f"Continue at epoch={self.current_epoch}, it={self.it}; "
                  f"resolution={self.resolution}; "
                  f"stage={'2 (world)' if self.query_in_canonical_space else '1 (local)'}")

        end_epoch = self.scheduling_start + self.scheduling_epoch
        if max_epochs is not None:
            end_epoch = min(end_epoch, self.current_epoch + max_epochs)

        update_milestones = [v[0] for v in self.coarse_to_fine.values()]

        for epoch_it in range(self.current_epoch, end_epoch):
            self.epoch_it = epoch_it
            epoch_losses = defaultdict(list)
            self.lr_state.on_epoch_start(
                epoch_it, stage2_starts_now=False)

            if (len(self.coarse_to_fine) >= 2 and
                    epoch_it in update_milestones):
                s = self._scale_for_epoch(epoch_it)
                if s != self.s:
                    self.s = s
                    self._build_datasets(
                        [self.original_resolution[0] // s,
                         self.original_resolution[1] // s])
                    self._log(f"Resolution -> {self.resolution}")

            if epoch_it == self.start_query_world_epoch:
                self.stage2_transition(epoch_it)

            if epoch_it == self.end_smooth_epoch:
                self.w_smooth = self.tr["smoothness_weight"][1]
                self.w_edge = self.tr["edge_aware_smoothness_weight"][1]
                self.patch_size = 1
                self._log(f"epoch {epoch_it}: smoothness off, patch_size=1")

            freeze_pose = (epoch_it >= self.start_query_world_epoch and
                           epoch_it <= (self.start_query_world_epoch +
                                        self.freeze_camera_pose_period))
            stage1 = not self.query_in_canonical_space
            step = self._get_step(stage1, train_motion=not freeze_pose)

            perm = np.random.permutation(self.train_field.N_imgs)
            for pos in perm:
                self.it += 1
                self._anneal_weights(self.it)
                lr, motion_lr = self.lr_state.lrs(self.it)
                batch = self._make_batch(int(pos), lr, motion_lr)
                key = jax.random.fold_in(self._base_key, self.it)
                if self.it == self.profile_trace_at_it:
                    from ..utils.profiling import trace

                    with trace(os.path.join(self.out_dir, "logs", "plugins")):
                        self.state, metrics = step(self.state, batch, key)
                        jax.block_until_ready(metrics["loss"])
                    self._log(f"profiler trace captured at it={self.it}")
                else:
                    self.state, metrics = step(self.state, batch, key)
                self.step_timer.tick()

                for k in ("loss", "loss_rgb", "loss_eikonal", "l2_mean",
                          "loss_sdf", "loss_flow_rgb",
                          "sdf_consistency_loss",
                          "edge_aware_smoothness_loss", "smoothness_loss"):
                    epoch_losses[k].append(metrics[k])

                if self.print_every > 0 and self.it % self.print_every == 0:
                    for k in ("loss", "loss_rgb", "loss_eikonal",
                              "loss_sdf", "loss_flow_rgb",
                              "sdf_consistency_loss"):
                        self.logger.add_scalar(f"loss/{k}",
                                               float(metrics[k]), self.it)
                    for k in ("s_val", "cdf_fine", "weight_sum",
                              "weight_max"):
                        self.logger.add_scalar(f"stats/{k}",
                                               float(metrics[k]), self.it)
                    self.logger.add_scalar("lr/model", lr, self.it)
                    self.logger.add_scalar("lr/motion_net", motion_lr,
                                           self.it)

                visualize_every = 0
                for mi, milestone in enumerate(
                        self.tr["depth_bound_scheduler_milestones"]):
                    if self.it >= milestone:
                        visualize_every = self.tr[
                            "depth_bound_update_every_milestones"][mi]
                if visualize_every > 0 and self.it % visualize_every == 0:
                    try:
                        self.visualize(int(pos), epoch_it)
                    except Exception as e:  # parity: vis failures swallowed
                        self._log(f"visualization failed: {e}")

            if (self.checkpoint_every > 0 and
                    epoch_it % self.checkpoint_every == 0 and epoch_it > 0):
                self.save_checkpoint()

            # One batched transfer for every per-iter scalar kept this epoch
            # (per-scalar float() fetches would round-trip the transport
            # hundreds of times per epoch).
            epoch_losses = jax.device_get(dict(epoch_losses))
            # NaN hard abort (reference model/training.py:532-533 asserts per
            # iteration; checking at the once-per-epoch host fetch keeps the
            # device pipeline free of per-step syncs).
            if not np.all(np.isfinite(epoch_losses["loss"])):
                bad = int(np.flatnonzero(
                    ~np.isfinite(epoch_losses["loss"]))[0])
                raise FloatingPointError(
                    f"non-finite training loss in epoch {epoch_it} "
                    f"(iteration {bad} of the epoch); aborting like the "
                    "reference NaN assert")
            l2_epoch = float(np.mean(epoch_losses["l2_mean"]))
            psnr = float(-10.0 * np.log10(max(l2_epoch, 1e-10)))
            self.logger.add_scalar("stats/psnr", psnr, epoch_it)
            for k, vals in epoch_losses.items():
                self.logger.add_scalar(
                    f"loss_epoch/{k}", float(np.mean(vals)), epoch_it)
            self.step_timer.log(self.it, epoch=epoch_it,
                                rays_per_sec=(self.step_timer.items_per_sec *
                                              self.rays_per_step))

            if (epoch_it % self.eval_pose_every == 0 and
                    not self.query_in_canonical_space):
                try:
                    aligned, _, _, _ = self.pose_evaluation()
                    self.vis_pose_2d(aligned)
                except Exception as e:
                    self._log(f"pose eval failed: {e}")

            self.lr_state.on_epoch_end(epoch_it)
        self.logger.flush()

    def save_checkpoint(self):
        if not self.io_primary:  # one writer per multi-host job
            return
        scalars = {"epoch_it": self.epoch_it, "it": self.it,
                   "depth_range": list(map(float, self.depth_range))}
        save_checkpoint(self.out_dir, self.state, scalars, latest=True)
        save_checkpoint(self.out_dir, self.state, scalars, latest=False,
                        epoch=self.epoch_it)
