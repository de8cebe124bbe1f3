"""Training orchestration: the full stage-1/stage-2 train loop.

Re-design of the reference ``train/trainer.py:21-239`` for the functional JAX
stack: optax optimizer with a warm-up-cosine schedule, one jitted+sharded
train step (rays over the ``data`` mesh axis, params replicated, gradient
psums inserted by XLA), orbax checkpointing with best-PSNR model selection,
chunked full-image validation, JSONL + tensorboard logging.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nunerf_tpu.config import TRAINER_DEFAULTS, merge_cfg
from nunerf_tpu.data.database import get_database_split, parse_database_name
from nunerf_tpu.data.ray_store import (
    RayStore,
    build_imgs_info,
    construct_nerf_ray_batch,
    construct_ray_batch,
)
from nunerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from nunerf_tpu.train.loss import compute_losses
from nunerf_tpu.train.lr import warm_up_cos_host, warm_up_cos_schedule
from nunerf_tpu.train.metrics import compute_psnr, compute_ssim, dump_validation_images


class Logger:
    """Scalar logging: stdout + JSONL + optional tensorboardX
    (reference train/train_tools.py:97-112)."""

    def __init__(self, log_dir: str, use_tb: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "train_log.jsonl"), "a")
        self.tb = None
        if use_tb:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log(self, scalars: Dict[str, float], step: int, prefix: str = "train"):
        rec = {"step": step, "prefix": prefix}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)


def save_checkpoint(path: str, step: int, params, opt_state, best_para: float):
    """Checkpoint contract mirroring the reference's
    {step, best_para, network_state_dict, optimizer_state_dict}
    (train/trainer.py:218-225), serialized with flax msgpack."""
    from flax import serialization
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {
        "step": step,
        "best_para": best_para,
        "params": jax.device_get(params),
        "opt_state": serialization.to_bytes(jax.device_get(opt_state)),
    }
    import pickle
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, opt_state_template=None):
    import pickle
    from flax import serialization
    with open(path, "rb") as f:
        blob = pickle.load(f)
    opt_state = blob["opt_state"]
    if opt_state_template is not None and isinstance(opt_state, bytes):
        opt_state = serialization.from_bytes(opt_state_template, opt_state)
    return blob["step"], blob["params"], opt_state, blob.get("best_para", 0.0)


class Trainer:
    """End-to-end trainer; covers both stage-1 (``network: shape``) and
    stage-2 (``network: stage2``) configs, both thickness modes
    (run_training.py:16-20 dispatch)."""

    def __init__(self, cfg: Dict[str, Any], n_devices: Optional[int] = None):
        self.cfg = merge_cfg(TRAINER_DEFAULTS, cfg)
        # persistent compilation cache: stage-2 train graphs take minutes to
        # compile on the AOT path; resumed/repeated runs should pay zero
        try:
            cache_dir = self.cfg.get("compilation_cache_dir",
                                     os.path.join("data", ".jax_cache"))
            if cache_dir:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        self.name = self.cfg["name"]
        self.model_dir = os.path.join(self.cfg["model_dir"], self.name)
        os.makedirs(self.model_dir, exist_ok=True)
        self.ckpt_path = os.path.join(self.model_dir, "model.ckpt")
        self.best_ckpt_path = os.path.join(self.model_dir, "model_best.ckpt")
        self.logger = Logger(self.model_dir)

        self.mesh = make_mesh(n_devices)
        self._build_network()
        self._build_dataset()
        self._build_optimizer()
        self._build_train_step()

    # ------------------------------------------------------------------
    def _build_network(self):
        from nunerf_tpu.models import build_renderer
        self.renderer = build_renderer(self.cfg)
        rng = jax.random.PRNGKey(self.cfg["random_seed"])
        self.params = replicate(self.renderer.init_params(rng), self.mesh)

    def _build_dataset(self):
        cfg = self.renderer.cfg
        self.database = parse_database_name(cfg["database_name"], cfg["dataset_dir"])
        # cfg split_type 'test' trains on the eval holdout's complement so a
        # later `eval-images --split test` scores genuinely unseen views
        # (the reference trains against its fixed split the same way)
        self.train_ids, self.test_ids = get_database_split(
            self.database, cfg.get("split_type", "validation"))
        train_info = build_imgs_info(self.database, self.train_ids,
                                     with_mask=True)
        h, w = train_info["imgs"].shape[1:3]
        # compact device store (uint8 pixels + per-image pose/K tables,
        # ~25x smaller than precomputed per-ray float arrays); per-step ray
        # batches are synthesized inside the jitted step (no host traffic)
        if cfg.get("device_ray_synthesis", True):
            from nunerf_tpu.data.device_rays import build_compact_store
            store = build_compact_store(train_info, cfg["is_nerf"],
                                        cfg.get("fixed_camera", False))
            self._sample_rays_mode = "compact"
        else:
            if cfg["is_nerf"]:
                store, h, w = construct_nerf_ray_batch(train_info)
            else:
                store, h, w = construct_ray_batch(
                    train_info, cfg.get("fixed_camera", False))
            self._sample_rays_mode = "precomputed"
        self.device_store = replicate(
            {k: np.asarray(v) for k, v in store.items()}, self.mesh)
        self.train_hw = (h, w)
        self.val_info = build_imgs_info(self.database, self.test_ids,
                                        with_mask=True)

    def _build_optimizer(self):
        lr_cfg = dict(self.cfg.get("lr_cfg") or {})
        lr_cfg.setdefault("end_iter", 300000)
        self.schedule = warm_up_cos_schedule(
            lr=lr_cfg.get("lr", 5e-4), end_warm=lr_cfg.get("end_warm", 5000),
            end_iter=lr_cfg["end_iter"])
        # host twin for logging (tiny device programs are expensive to launch
        # first-time over the remote-compiled tunnel)
        self.schedule_host = warm_up_cos_host(
            lr=lr_cfg.get("lr", 5e-4), end_warm=lr_cfg.get("end_warm", 5000),
            end_iter=lr_cfg["end_iter"])
        adam = optax.adam(learning_rate=self.schedule)
        frozen = getattr(self.renderer, "frozen_keys", ())
        if frozen:
            # stage-2: frozen stage-1 subtree gets a zero transform
            labels = {k: ("frozen" if k in frozen else "train")
                      for k in self.params}
            self.optimizer = optax.multi_transform(
                {"train": adam, "frozen": optax.set_to_zero()}, labels)
        else:
            self.optimizer = adam
        self.opt_state = replicate(self.optimizer.init(self.params), self.mesh)

    def _build_train_step(self):
        renderer, cfg = self.renderer, self.renderer.cfg
        rn = cfg["train_ray_num"]

        # TPU f32 matmuls default to one bf16 pass (measured: param-grad rel
        # err ~5e-3 vs the 6-pass f32 emulation; 'high' = 3 passes cuts that
        # 10x for +14% SDF-path time).  Reference-grade numerics on demand:
        prec = cfg.get("matmul_precision", "default")

        def loss_fn(params, batch, rng, step):
            with jax.default_matmul_precision(prec):
                outputs = renderer.train_outputs(params, batch, rng, step)
                terms = compute_losses(outputs, batch, step, cfg)
            return terms["loss_total"], terms

        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(self.mesh, P("data"))

        compact = getattr(self, "_sample_rays_mode", "compact") == "compact"

        def one_step(params, opt_state, store, rng, step):
            # batch selection on device: zero per-step host->device traffic
            # (crucial for remote/tunneled devices; also removes the input
            # pipeline from the step's critical path on real pods)
            r_sel, r_render = jax.random.split(rng)
            if compact:
                from nunerf_tpu.data.device_rays import num_rays, sample_rays
                idx = jax.random.randint(r_sel, (rn,), 0, num_rays(store))
                batch = sample_rays(store, idx)
            else:
                n = store["rays_o"].shape[0]
                idx = jax.random.randint(r_sel, (rn,), 0, n)
                batch = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, idx, axis=0), store)
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, terms), grads = grad_fn(params, batch, r_render, step)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, terms

        def train_chunk(params, opt_state, store, rng, step0, n_steps):
            # n_steps optimizer steps under one lax.scan: a single dispatch
            # per logging interval (the host loop costs ~3 RPC round trips
            # per call — fatal over a tunneled device, measurable on pods)
            def body(carry, i):
                p, s = carry
                r = jax.random.fold_in(rng, i)
                p, s, terms = one_step(p, s, store, r, step0 + i)
                return (p, s), terms

            (params, opt_state), terms = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_steps))
            mean_terms = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0),
                                                terms)
            return params, opt_state, mean_terms

        self.train_step = jax.jit(one_step, donate_argnums=(0, 1))
        self.train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1),
                                   static_argnums=(5,))

        def render_eval(params, batch, rng, step):
            return renderer.test_outputs(params, batch, rng, step)

        self.render_eval = jax.jit(render_eval)

    # ------------------------------------------------------------------
    def _load_if_exists(self):
        if os.path.exists(self.ckpt_path):
            step, params, opt_state, best = load_checkpoint(
                self.ckpt_path, jax.device_get(self.opt_state))
            self.params = replicate(params, self.mesh)
            self.opt_state = replicate(opt_state, self.mesh)
            print(f"resumed from {self.ckpt_path} at step {step}")
            return step, best
        return 0, 0.0

    def run(self):
        from nunerf_tpu.utils.debug import (check_finite_tree,
                                            debug_nan_enabled,
                                            maybe_enable_debug_nans)
        maybe_enable_debug_nans()
        cfg = self.cfg
        start_step, best_para = self._load_if_exists()
        rng = jax.random.PRNGKey(cfg["random_seed"] + 1)
        t0 = time.time()
        ema: Dict[str, float] = {}

        # scan length is capped separately from the logging cadence: XLA
        # compile time grows superlinearly in the unroll-equivalent graph
        # (measured on the stage-2 step: scan(10) 93 s, scan(100) >40 min)
        # while dispatch amortization saturates around a few seconds of
        # device work per chunk
        chunk = max(1, min(cfg.get("scan_chunk", 25), cfg["train_log_step"],
                           cfg["save_interval"], cfg["val_interval"]))
        step = start_step
        while step < cfg["total_step"]:
            n = min(chunk, cfg["total_step"] - step)
            rng, sub = jax.random.split(rng)
            self.params, self.opt_state, terms = self.train_chunk(
                self.params, self.opt_state, self.device_store, sub,
                jnp.asarray(step, jnp.int32), n)
            step += n

            if step % cfg["train_log_step"] < chunk:
                terms = jax.device_get(terms)
                if debug_nan_enabled():
                    check_finite_tree(terms, "loss_terms")
                scalars = {k: float(np.mean(v)) for k, v in terms.items()}
                scalars["lr"] = float(self.schedule_host(step))
                scalars["rays_per_sec"] = (
                    (step - getattr(self, "_t0_step", start_step))
                    * self.renderer.cfg["train_ray_num"]
                    / max(time.time() - t0, 1e-6)) if step > start_step + n else 0.0
                t0 = time.time()
                self._t0_step = step
                self.logger.log(scalars, step)

            if step % cfg["val_interval"] < chunk and step > start_step:
                rng, sub = jax.random.split(rng)
                key_metric = self.validate(step, sub)
                if key_metric >= best_para:
                    best_para = key_metric
                    save_checkpoint(self.best_ckpt_path, step, self.params,
                                    self.opt_state, best_para)
            if step % cfg["save_interval"] < chunk:
                save_checkpoint(self.ckpt_path, step, self.params,
                                self.opt_state, best_para)

        save_checkpoint(self.ckpt_path, cfg["total_step"], self.params,
                        self.opt_state, best_para)
        return best_para

    # ------------------------------------------------------------------
    def render_image(self, info, step: int, rng):
        """Chunked full-image render of one view's imgs_info.

        Returns (outputs dict incl. gt_rgb, h, w).  Shared by per-step
        validation and the test-split evaluator (train/train_valid.py:19-53,
        dataset/database.py:667-679)."""
        cfg = self.renderer.cfg
        ratio = cfg.get("downsample_ratio", 1.0)
        info = dict(info)
        if cfg.get("test_downsample_ratio", True) and ratio != 1.0:
            import cv2
            imgs, Ks = [], []
            for i in range(info["imgs"].shape[0]):
                h, w = info["imgs"].shape[1:3]
                dh, dw = int(h * ratio), int(w * ratio)
                imgs.append(cv2.resize(info["imgs"][i], (dw, dh),
                                       interpolation=cv2.INTER_LINEAR))
                Ks.append(np.diag([dw / w, dh / h, 1]).astype(np.float32)
                          @ info["Ks"][i])
            info = {**info, "imgs": np.stack(imgs, 0), "Ks": np.stack(Ks, 0),
                    "masks": np.stack([
                        cv2.resize(info["masks"][i], (dw, dh),
                                   interpolation=cv2.INTER_NEAREST)
                        for i in range(info["masks"].shape[0])], 0)}

        if cfg["is_nerf"]:
            batch, h, w = construct_nerf_ray_batch(info)
        else:
            batch, h, w = construct_ray_batch(info, cfg.get("fixed_camera", False))

        trn = cfg["test_ray_num"]
        rn = batch["rays_o"].shape[0]
        # pad to a multiple of chunk for fixed shapes
        pad = (-rn) % trn
        chunks = []
        for i0 in range(0, rn + pad, trn):
            cur = {}
            for k, v in batch.items():
                sl = v[i0:i0 + trn]
                if sl.shape[0] < trn:
                    reps = trn - sl.shape[0]
                    sl = np.concatenate([sl, np.repeat(sl[-1:], reps, 0)], 0)
                cur[k] = sl
            cur = shard_batch(cur, self.mesh)
            out = self.render_eval(self.params, cur, rng,
                                   jnp.asarray(step, jnp.int32))
            chunks.append(jax.device_get(out))

        outputs = {}
        for k in chunks[0]:
            v = np.concatenate([np.atleast_1d(np.asarray(c[k])) for c in chunks], 0)
            outputs[k] = v[:rn]
        outputs["gt_rgb"] = batch["rgbs"]
        return outputs, h, w

    def validate(self, step: int, rng) -> float:
        """Per-step validation on one held-out view (the reference's
        validation split holds out a single image, database.py:667-674)."""
        info = {k: v[:1] for k, v in self.val_info.items()}
        outputs, h, w = self.render_image(info, step, rng)
        gt, pr = outputs["gt_rgb"], outputs["ray_rgb"]
        if "tir_mask" in outputs:
            # stage-2 scores TIR-masked pixels out of both images
            # (reference test_step, renderer_zerothick.py:1248-1250)
            tm = outputs["tir_mask"].reshape(-1, 1)
            gt, pr = gt * tm, pr * tm
        psnr = compute_psnr(gt, pr)
        ssim = compute_ssim(gt.reshape(h, w, 3), pr.reshape(h, w, 3))
        self.logger.log({"psnr": psnr, "ssim": ssim}, step, prefix="val")
        try:
            dump_validation_images(outputs, h, w,
                                   os.path.join("data", "train_vis", self.name),
                                   self.name, step, 0)
        except Exception as e:  # vis failures must not kill training
            print(f"validation dump failed: {e}")
        print(f"[val] step {step} psnr {psnr:.3f} ssim {ssim:.4f}")
        return psnr
