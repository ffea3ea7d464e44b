"""Full evaluation stack: test-time pose optimization, novel-view rendering,
NVS/depth/pose metrics, artifact dump.

Mirrors ``/root/reference/eval.py`` (class ``Evaluator``): per-test-view poses
are initialized from the preceding train view's refined pose and optimized by
photometric loss only (:44-93); views are rendered at the canonical world
time step (:95-188); metrics follow the CF3DGS protocol (:190-256).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..poses.lie import make_c2w
from ..poses.retriever import pose_retriever_all, pose_retriever_init
from ..training.checkpoints import load_pytree, save_pytree
from ..training.depth_metrics import compute_depth_errors
from ..training.schedules import MultiStepLR
from ..training.step import make_optimizers, sample_patch_indices
from ..training.trainer import Trainer
from ..ops.rays import rays_from_pixels
from ..ops.renderer import render
from .metrics_image import lpips_fn, psnr, ssim
from .metrics_pose import pose_error_report


class Evaluator(Trainer):
    def __init__(self, cfg: dict, verbose: bool = True):
        super().__init__(cfg, verbose=verbose)
        self._load_refine_pose()  # pose_retriever (train views)
        # Optional injected (ray_idx, t_rand) per-iteration streams for the
        # cross-implementation trajectory-parity harness
        # (tests/test_trajectory_parity_stage2.py); None = sample on device.
        self.eval_inject_streams = None
        # Introspection traces filled by eval_optimization: lr per epoch,
        # per-iteration photometric l2 (fetched once at the end).
        self.eval_lr_trace = []
        self.eval_l2_trace = None

    # ------------------------------------------------------------------
    def eval_optimization(self):
        """Optimize test-view poses by rgb loss (reference eval.py:44-93).
        Cached at models/weights/model_eval_pose.npz."""
        cache = os.path.join(self.out_dir, "models", "weights",
                             "model_eval_pose.npz")
        test_idx = list(self.test_field.i_test)
        i_train = list(self.train_field.i_train)
        train_poses = np.asarray(pose_retriever_all(*self.pose_retriever))
        # The reference indexes i_train.index(ti - 1) directly (eval.py:57),
        # which throws for splits where a test frame is not immediately
        # preceded by a train frame (any sample_rate < 2). Guard: fall back
        # to the nearest train frame (preceding if one exists).
        def init_position(ti):
            if (ti - 1) in i_train:
                return i_train.index(ti - 1)
            preceding = [j for j in i_train if j < ti]
            anchor = preceding[-1] if preceding else min(
                i_train, key=lambda j: abs(j - ti))
            return i_train.index(anchor)

        init_pos = [init_position(ti) for ti in test_idx]
        init_c2w = jnp.asarray(train_poses[init_pos])
        pose_params, _ = pose_retriever_init(len(test_idx), init_c2w)

        if os.path.isfile(cache):
            self._log("Found optimized test poses")
            blob = load_pytree(cache)
            self.pose_retriever_test = (
                {"r": blob["r"], "t": blob["t"]}, jnp.asarray(blob["init"]))
            return

        n_points = self.tr["n_training_points"]
        tx = make_optimizers()
        opt_state = tx.init(pose_params)
        h, w = self.h, self.w
        params = self.state["params"]
        field_cfgs, rcfg = self.field_cfgs, self.rcfg
        test_images = jnp.asarray(self.test_field.imgs)
        test_k = jnp.asarray(self.test_field.K[self.test_field.i_test])

        inject = self.eval_inject_streams is not None

        @jax.jit
        def pose_step(pose_params, opt_state, view, key, lr, near, far,
                      ray_idx_in, t_rand_in):
            def loss_fn(pp):
                world = make_c2w(pp["r"][view], pp["t"][view]) @ init_c2w[view]
                if inject:
                    ray_idx, t_rand = ray_idx_in, t_rand_in
                else:
                    ray_idx = sample_patch_indices(key, h, w, 1, n_points)
                    t_rand = None
                row = (ray_idx // w).astype(jnp.float32)
                col = (ray_idx % w).astype(jnp.float32)
                p_norm = jnp.stack([2 * col / (w - 1) - 1,
                                    2 * row / (h - 1) - 1], -1)
                rgb_gt = test_images[view].reshape(3, h * w)[:, ray_idx].T
                rays_o, rays_d, rays_d_norm = rays_from_pixels(
                    p_norm, test_k[view], world, jnp.eye(4))
                near_v = jnp.full((n_points, 1), 1.0) * near
                far_v = jnp.full((n_points, 1), 1.0) * far
                out = render(field_cfgs, params, rays_o, rays_d, rays_d_norm,
                             jnp.asarray(self.world_time_step), near_v, far_v,
                             rcfg=rcfg, cos_anneal_ratio=1.0, train=True,
                             key=jax.random.fold_in(key, 1), t_rand=t_rand)
                diff = out["color_fine"] - rgb_gt
                loss = jnp.sum(jnp.abs(diff)) / n_points
                return loss, jnp.mean(diff ** 2)

            (loss, l2), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(pose_params)
            updates, opt_state2 = tx.update(grads, opt_state, pose_params)
            pose_params2 = jax.tree_util.tree_map(lambda p, u: p - lr * u,
                                                  pose_params, updates)
            return pose_params2, opt_state2, loss, l2

        num_epoch = int(self.cfg["eval"]["eval_pose_epoch"])
        # Reference eval.py:55-56: MultiStepLR(milestones=range(0, E, E/5),
        # gamma). Milestone 0 fires at scheduler construction, so epoch 0
        # already runs at lr*gamma (torch semantics, see
        # training.schedules.MultiStepLR).
        sched = MultiStepLR(
            float(self.cfg["eval"]["eval_pose_lr"]),
            range(0, num_epoch, max(num_epoch // 5, 1)),
            float(self.cfg["eval"]["eval_pose_scheduler_gamma"]))
        self._log("Optimizing test-view poses")
        it = 0
        self.eval_lr_trace = []
        l2_all = []
        dummy_idx = jnp.zeros((n_points,), jnp.int32)
        dummy_tr = jnp.zeros((n_points, rcfg.n_samples), jnp.float32)
        for epoch in range(num_epoch):
            lr = sched.epoch_lr(epoch)
            self.eval_lr_trace.append(lr)
            l2s = []
            for view in range(len(test_idx)):
                it += 1
                key = jax.random.fold_in(self._base_key, 10_000_000 + it)
                if inject:
                    ridx, trand = self.eval_inject_streams[it - 1]
                    ridx = jnp.asarray(ridx, jnp.int32)
                    trand = jnp.asarray(trand, jnp.float32)
                else:
                    ridx, trand = dummy_idx, dummy_tr
                pose_params, opt_state, loss, l2 = pose_step(
                    pose_params, opt_state, view, key, jnp.asarray(lr),
                    jnp.asarray(self.depth_range[0], jnp.float32),
                    jnp.asarray(self.depth_range[1], jnp.float32),
                    ridx, trand)
                l2s.append(l2)  # device scalar; fetching here would stall
            l2_all.extend(l2s)
            if epoch % 10 == 0:
                # One batched fetch per log line keeps the device pipeline
                # busy the other 10*n_views steps.
                psnr_v = -10 * np.log10(
                    max(np.mean(jax.device_get(l2s)), 1e-10))
                self._log(f"eval pose epoch {epoch}: psnr {psnr_v:.2f}")
        self.eval_l2_trace = np.asarray(jax.device_get(l2_all))
        self.pose_retriever_test = (pose_params, init_c2w)
        save_pytree(cache, {"r": pose_params["r"], "t": pose_params["t"],
                            "init": np.asarray(init_c2w)})

    # ------------------------------------------------------------------
    def render_eval(self):
        """Render every test view at the canonical time (eval.py:95-188)."""
        pose_params, init_c2w = self.pose_retriever_test
        test_poses = np.asarray(pose_retriever_all(pose_params, init_c2w))
        gt_imgs, gt_depths, preds = [], [], []
        params = self.state["params"]
        if jax.process_count() > 1:
            # One host localization for all test views (see
            # trainer.render_train_views); per-call conversion is a no-op
            # on numpy leaves.
            params = jax.tree_util.tree_map(np.asarray, params)
        for pos, target in enumerate(self.test_field.i_test):
            target = int(target)
            res = self.image_renderer.render_image(
                params, self.test_field.K[target],
                test_poses[pos], np.eye(4, dtype=np.float32),
                self.world_time_step, (self.h, self.w), self.depth_range,
                1.0)
            preds.append(res)
            gt_imgs.append(np.transpose(self.test_field.imgs[pos], (1, 2, 0)))
            if len(self.test_field.gt_depths) != 0:
                gt_depths.append(self.test_field.gt_depths[target])
            else:
                gt_depths.append(None)
        return gt_imgs, gt_depths, preds

    # ------------------------------------------------------------------
    def image_eval(self, gt_imgs, preds):
        lpips = lpips_fn()
        psnrs, ssims, lpipss = [], [], []
        for gt, res in zip(gt_imgs, preds):
            pred = jnp.asarray(np.transpose(res["color"], (2, 0, 1)))
            ref = jnp.asarray(np.transpose(gt, (2, 0, 1)))
            psnrs.append(float(psnr(pred, ref)))
            ssims.append(float(ssim(pred, ref)))
            if lpips is not None:
                lpipss.append(lpips(np.asarray(pred), np.asarray(ref)))
        out = {"PSNR": float(np.mean(psnrs)), "SSIM": float(np.mean(ssims))}
        if lpipss:
            out["LPIPS"] = float(np.mean(lpipss))
        else:
            # The reference protocol's metric triple is PSNR/SSIM/LPIPS;
            # degrade LOUDLY, never silently (the missing key must be
            # visible in results.txt and on the console).
            self._log("WARNING: LPIPS unavailable (no VGG weights) — "
                      "results omit the third protocol metric. Provide "
                      "weights via COPENERF_LPIPS_VGG/COPENERF_LPIPS_LIN.")
            # NaN, not a string: numeric consumers (JSON aggregation,
            # float() over results.txt) must not break on a type change.
            out["LPIPS"] = float("nan")
        return out

    def depth_eval(self, gt_depths, preds, min_depth=0.1, max_depth=80.0):
        if all(g is None for g in gt_depths):
            return None
        errors = []
        for gt, res in zip(gt_depths, preds):
            if gt is None:
                continue
            if self.cfg["dataloading"]["crop_size"] != 0:
                gt = gt[6:-6, 8:-8]  # eval.py:229-231 ScanNet crop quirk
            errors.append(compute_depth_errors(
                gt, res["depth"], min_depth, max_depth, clamp_pred=True))
        names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
        return dict(zip(names, np.mean(np.array(errors), axis=0).tolist()))

    def pose_eval(self):
        pred = np.asarray(pose_retriever_all(*self.pose_retriever))
        pred = np.linalg.inv(pred)
        _, rpe_t, rpe_r, ate = pose_error_report(pred, self.gt_poses)
        return {"rpe_trans": rpe_t, "rpe_rot": rpe_r, "ate": ate}

    # ------------------------------------------------------------------
    def eval(self, store_output: bool = True) -> dict:
        self.eval_optimization()
        gt_imgs, gt_depths, preds = self.render_eval()
        result = {}
        result.update(self.image_eval(gt_imgs, preds))
        result.update(self.pose_eval())
        depth_result = self.depth_eval(gt_depths, preds)
        if depth_result is not None:
            result.update(depth_result)
        with open(os.path.join(self.out_dir, "results.txt"), "w") as f:
            for k, v in result.items():
                f.write(f"{k}: {v}\n")
        self._log(f"results: {result}")
        if store_output:
            base = os.path.join(self.out_dir, "extraction")
            for sub in ("images_gt", "images", "depths", "depths_raw",
                        "normal", "disparity_highest_weight"):
                os.makedirs(os.path.join(base, sub), exist_ok=True)
            for pos, target in enumerate(self.test_field.i_test):
                fid = str(int(target)).zfill(6)
                res = preds[pos]
                self._save_image(
                    os.path.join(base, "images_gt", f"{fid}.jpg"),
                    gt_imgs[pos])
                self._save_image(os.path.join(base, "images", f"{fid}.jpg"),
                                 res["color"])
                d = res["depth"]
                self._save_image(os.path.join(base, "depths", f"{fid}.jpg"),
                                 d / max(d.max(), 1e-6))
                np.savez(os.path.join(base, "depths_raw",
                                      f"depth_{fid}.npz"), pred=d)
                self._save_image(
                    os.path.join(base, "normal", f"{fid}.jpg"),
                    np.clip(res["normal"] * 0.5 + 0.5, 0, 1))
                dh = 1.0 / np.maximum(res["depth_highest"], 1e-6)
                self._save_image(
                    os.path.join(base, "disparity_highest_weight",
                                 f"{fid}.jpg"), dh / max(dh.max(), 1e-6))
        return result
