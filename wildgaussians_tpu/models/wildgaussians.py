"""WildGaussians Method implementation (TPU-native).

Implements the NerfBaselines Method protocol (reference method.py:1635-2042)
on top of the fixed-capacity store: the whole train iteration — camera gather,
render (two passes), losses, backward, Adam — is ONE jitted program; the host
loop only schedules densify/prune/reset (each its own jitted fixed-shape
function), logging and checkpoints.
"""
import functools
import logging
import math
import os
import random
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config_yaml, merge_config, config_to_yaml, config_from_yaml_str
from ..cameras import get_cameras_extent
from ..types import (Cameras, Dataset, MethodInfo, ModelInfo, RenderOutput,
                     OptimizeEmbeddingOutput, camera_model_to_int)
from ..ops.knn import mean_knn_dist2
from ..ops.ssim import ssim
from ..utils import convert_image_dtype
from . import gaussian_store as gs
from .appearance import init_mlp
from .renderer import render_internal
from .sky import get_sky_points

logger = logging.getLogger(__name__)


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w, *img.shape[2:]), img.dtype)
    out[:img.shape[0], :img.shape[1]] = img
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def scale_grads(values, scale):
    """Gradient scaling trick (reference method.py:120-123)."""
    return values * scale + jax.lax.stop_gradient(values) * (1 - scale)


def _aot_under_mesh(fn):
    """Under an active mesh, call `fn` through an AOT-compiled executable.

    jax 0.9's C++ dispatch fastpath (which engages on a jit function's THIRD
    call) mis-handles the lifted constants of programs containing the
    gaussian-sharded sort engine's shard_map+all_to_all (IndexError /
    buffer-count mismatches during argument sharding). lower().compile() on
    first call and invoking the executable directly uses the plain
    shard_args path — the one the first two (working) calls take — forever.
    Single-chip (no mesh) keeps the normal jit dispatch untouched.

    WG_NO_AOT=1 bypasses the workaround (plain jit dispatch) — paired
    with tests/test_aot_canary.py: the reduced canary XPASSes on this
    jax build, so the bypass lets CI and on-chip drives check whether
    the FULL trainer programs also survive plain dispatch before the
    workaround is retired."""
    from ..parallel.mesh import current_mesh
    if current_mesh() is None or os.environ.get("WG_NO_AOT", "0") == "1":
        return fn

    compiled = None

    def call(*args):
        nonlocal compiled
        if compiled is None:
            compiled = fn.lower(*args).compile()
        return compiled(*args)
    return call


class WildGaussians:
    """Method protocol implementation (reference types.py:316-406)."""

    def __init__(self, *,
                 checkpoint: Optional[str] = None,
                 train_dataset: Optional[Dataset] = None,
                 config_overrides: Optional[Dict[str, Any]] = None):
        self.checkpoint = checkpoint
        self.step = 0
        self._loaded_step = None
        self.config = Config()

        load_state = None
        if checkpoint is not None:
            if not os.path.exists(checkpoint):
                raise RuntimeError(f"Model directory {checkpoint} does not exist")
            with open(os.path.join(checkpoint, "config.yaml"), encoding="utf8") as f:
                self.config = config_from_yaml_str(f.read())
            steps = sorted(int(x[x.find("-") + 1:x.find(".")])
                           for x in os.listdir(checkpoint) if x.startswith("chkpnt-"))
            self._loaded_step = self.step = steps[-1]
            load_state = np.load(os.path.join(checkpoint, f"chkpnt-{self.step}.npz"),
                                 allow_pickle=True)
        elif config_overrides is not None:
            config_overrides = dict(config_overrides)
            config_file = config_overrides.pop("config", "default.yml")
            config_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       "..", "configs", config_file)
            self.config = load_config_yaml(config_path)
            self.config = merge_config(self.config, config_overrides)

        random.seed(0)
        np.random.seed(0)
        self._np_rng = np.random.default_rng(self.config.seed)
        self._key = jax.random.PRNGKey(self.config.seed)
        self._viewpoint_stack = []
        self.train_cameras: Optional[Cameras] = None
        self.cameras_extent: Optional[float] = None
        self._sky_distance = None
        self._uncertainty = None
        self._overflow_streak = 0
        self._step_cache = {}  # (pad_w, pad_h) -> jitted train step
        self._sat_caches = {}  # (pad_w, pad_h) -> [n_cams, sy, sx] sat maps

        # unsupported-combo guards (reference method.py:976-978)
        assert getattr(self.config, "appearance_model_2D", "disabled") == "disabled", \
            "2D appearance models are not supported"
        assert getattr(self.config, "use_background_model", False) is False, \
            "Background model is not supported"
        assert getattr(self.config, "uncertainty_preserve_sky", False) is False, \
            "Flag uncertainty_preserve_sky is not supported"

        if self.config.uncertainty_mode != "disabled":
            from .uncertainty import UncertaintyModel
            self._uncertainty = UncertaintyModel(self.config)

        if train_dataset is not None:
            self._setup_train(train_dataset, load_state)
        elif load_state is not None:
            self._load_state(load_state)

    # ------------------------------------------------------------------ setup

    def _setup_train(self, train_dataset: Dataset, load_state):
        points3d_xyz = train_dataset["points3D_xyz"]
        points3d_rgb = train_dataset["points3D_rgb"]
        assert points3d_xyz is not None and points3d_rgb is not None
        opacities = 0.1 * np.ones(len(points3d_xyz), np.float32)

        if self.config.num_sky_gaussians:
            skybox, self._sky_distance = get_sky_points(
                self.config.num_sky_gaussians, points3d_xyz, train_dataset["cameras"])
            skycolor = np.array([[237, 247, 252]], np.uint8).repeat(skybox.shape[0], axis=0)
            logger.info("Adding skybox with %d points", skybox.shape[0])
            points3d_xyz = np.concatenate([points3d_xyz, skybox])
            points3d_rgb = np.concatenate([points3d_rgb, skycolor])
            opacities = np.concatenate([opacities, np.ones(skybox.shape[0], np.float32)])

        self.cameras_extent = get_cameras_extent(train_dataset["cameras"])
        self.train_cameras = train_dataset["cameras"]
        images = train_dataset["images"]
        masks = train_dataset.get("masks")

        sizes = np.asarray(self.train_cameras.image_sizes)
        self._pad_w = _round_up(int(sizes[:, 0].max()), 16)
        self._pad_h = _round_up(int(sizes[:, 1].max()), 16)
        # per-camera canvas: pad-to-max (one compiled step) or size buckets
        # (one step program per distinct rounded-up canvas)
        mult = self.config.size_bucket_multiple
        if mult > 0:
            self._pad_wh = [(_round_up(int(s[0]), mult),
                             _round_up(int(s[1]), mult)) for s in sizes]
        else:
            self._pad_wh = [(self._pad_w, self._pad_h)] * len(sizes)
        self._train_images = [
            _pad_to(convert_image_dtype(img, np.float32)[..., :3], bh, bw)
            for img, (bw, bh) in zip(images, self._pad_wh)]
        self._train_masks = None
        if masks is not None:
            self._train_masks = [
                _pad_to(convert_image_dtype(m, np.float32)[..., None], bh, bw)[..., 0]
                for m, (bw, bh) in zip(masks, self._pad_wh)]
        self._pixmask = [
            _pad_to(np.ones((int(s[1]), int(s[0]), 1), np.float32), bh, bw)[..., 0]
            for s, (bw, bh) in zip(sizes, self._pad_wh)]

        # stacked camera tensors for in-jit gather
        self._poses_dev = jnp.asarray(np.stack([np.asarray(c, np.float32) for c in self.train_cameras.poses]))
        self._intr_dev = jnp.asarray(np.asarray(self.train_cameras.intrinsics, np.float32))
        self._sizes_dev = jnp.asarray(sizes.astype(np.float32))

        if load_state is None:
            n = points3d_xyz.shape[0]
            capacity = self.config.initial_capacity or _round_up(
                max(int(n * self.config.capacity_growth_factor), n + 1024), 256)
            from ..ops import knn_native
            if knn_native.available():
                knn_d2 = knn_native.mean_knn_dist2_native(points3d_xyz.astype(np.float32))
            else:
                knn_d2 = np.asarray(mean_knn_dist2(jnp.asarray(points3d_xyz.astype(np.float32))))
            self.params, self.aux = gs.init_params_from_points(
                self.config, points3d_xyz, points3d_rgb, opacities, capacity,
                len(self.train_cameras), knn_d2, self._np_rng)
            if self.config.appearance_enabled:
                self.params["appearance_mlp"] = init_mlp(self._np_rng, self.config)
            if self._uncertainty is not None:
                self.params["uncertainty"] = self._uncertainty.init_params(self._np_rng)
            self.adam = gs.init_adam(self.params)
            self.spatial_lr_scale = float(self.cameras_extent)
        else:
            self._load_state(load_state)

        self._refresh_filter()
        if self._uncertainty is not None:
            self._uncertainty.setup_data(self._train_images)

    def _refresh_filter(self):
        filt = gs.compute_3d_filter(self.params["xyz"], self.aux.alive,
                                    self._poses_dev, self._intr_dev, self._sizes_dev)
        self.aux = self.aux._replace(filter_3D=filt)

    # ------------------------------------------------------------- jitted step

    def _sat_cache_for(self, pad_w: int, pad_h: int):
        """Per-(camera, supertile) saturation-depth cache for one canvas
        bucket, lazily +inf (= no culling until a camera's first visit
        records its exit depths). Cleared on densify/prune/opacity-reset —
        the mechanism is also self-correcting per camera (an over-culled
        walk stops saturating and writes +inf back)."""
        cache = self._sat_caches.get((pad_w, pad_h))
        if cache is None:
            from ..ops.rasterize_pallas import supertile_shape
            from ..ops.rasterize_tiled import make_grid
            sy, sx = supertile_shape(make_grid(pad_w, pad_h, 16))
            cache = jnp.full((len(self.train_cameras), sy, sx), jnp.inf,
                             jnp.float32)
            self._sat_caches[(pad_w, pad_h)] = cache
        return cache

    def _train_step_for(self, pad_w: int, pad_h: int):
        """Jitted train step for one padded-canvas bucket (cached)."""
        cached = self._step_cache.get((pad_w, pad_h))
        if cached is not None:
            return cached
        fn = _aot_under_mesh(self._build_train_step(pad_w, pad_h))
        self._step_cache[(pad_w, pad_h)] = fn
        return fn

    def _use_satcull(self) -> bool:
        """Static: the saturation cull runs only on the single-chip pallas
        sort engine (the sharded engine keeps exact binning for now)."""
        from ..parallel.mesh import current_mesh
        config = self.config
        backend = config.rasterizer_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
        return (getattr(config, "saturation_culling", False)
                and backend == "pallas"
                and getattr(config, "pallas_binning", "sort") == "sort"
                and current_mesh() is None)

    def _build_train_step(self, pad_w: int, pad_h: int):
        config = self.config
        use_abs = config.use_gof_abs_gradient
        lambda_dssim = config.lambda_dssim
        spatial_lr_scale = self.spatial_lr_scale
        use_satcull = self._use_satcull()

        uncertainty = self._uncertainty
        use_unc = uncertainty is not None

        def loss_and_render(params, m2d_hook, abs_hook, aux, camera_id, pose,
                            intr, actual_size, gt, pixmask, mask, iteration,
                            unc_inputs, sat_super):
            gaussians = gs.get_gaussians(params, aux, config)
            embedding = (params["appearance_embeddings"][camera_id]
                         if config.appearance_enabled else None)
            pkg = render_internal(
                gaussians, params, aux.active_sh_degree, aux.alive, config,
                pose, intr, pad_w, pad_h, embedding=embedding,
                kernel_size=config.kernel_size, mean2d_hook=m2d_hook,
                absgrad_hook=abs_hook, actual_size=actual_size,
                sat_super=sat_super)
            image_toned = pkg.render * pixmask[..., None]
            image = pkg.raw_render * pixmask[..., None]
            if mask is not None:
                image = scale_grads(image, mask[..., None])
                image_toned = scale_grads(image_toned, mask[..., None])

            umetrics = {}
            new_bn = None
            uloss = 0.0
            loss_mult = jnp.ones_like(pixmask)
            if use_unc:
                from .uncertainty import resize_valid, resize_to_valid, DINO_SIZE
                (feats_gt, gt336, mask336, pmask24, bn_state, ukey,
                 protect) = unc_inputs
                lb = config.uncertainty_dino_letterbox
                aw, ah = actual_size
                pred336 = resize_valid(jax.lax.stop_gradient(image_toned),
                                       DINO_SIZE, DINO_SIZE, ah, aw,
                                       letterbox=lb)
                uloss, umetrics, lm336, new_bn = uncertainty.compute_loss(
                    params["uncertainty"], bn_state, feats_gt, gt336, pred336,
                    mask336, ukey, train=True, patch_mask=pmask24)
                lm = resize_to_valid(lm336, pad_h, pad_w, ah, aw,
                                     letterbox=lb) * pixmask
                # threshold + warmup (reference method.py:1934-1946)
                lm = (lm > 1.0).astype(jnp.float32)
                ws = config.uncertainty_warmup_start
                wi = config.uncertainty_warmup_iters
                pfrac = jnp.where(iteration < ws, 0.0,
                                  jnp.clip((iteration - ws) / max(wi, 1), 0.0, 1.0)
                                  if wi > 0 else 1.0)
                loss_mult = 1.0 + pfrac * (lm - 1.0)
                if config.uncertainty_center_mult:
                    npixm = jnp.maximum(jnp.sum(pixmask), 1.0)
                    mean_lm = jnp.sum(loss_mult * pixmask) / npixm
                    loss_mult = jnp.clip(loss_mult - (mean_lm - 1), 0, 2)
                if config.uncertainty_scale_grad:
                    image = scale_grads(image, loss_mult[..., None])
                    image_toned = scale_grads(image_toned, loss_mult[..., None])
                    loss_mult = jnp.ones_like(loss_mult)
                loss_mult = jax.lax.stop_gradient(loss_mult)
                # detached during protected iters after opacity reset
                # (reference method.py:1951-1959)
                uloss = jnp.where(protect, jax.lax.stop_gradient(uloss), uloss)

            npix = jnp.sum(pixmask)
            l1_map = jnp.abs(image_toned - gt)
            ssim_map = ssim(image, gt, size_average=False)  # [H,W]
            l1_w = jnp.sum(l1_map * (loss_mult * pixmask)[..., None]) / (npix * 3)
            dssim_w = jnp.sum((1.0 - ssim_map) * loss_mult * pixmask) / npix
            loss = (1.0 - lambda_dssim) * l1_w + lambda_dssim * dssim_w + uloss

            mse = jnp.sum(jnp.square(image_toned - gt) * pixmask[..., None]) / (npix * 3)
            metrics = {
                "loss": loss,
                "l1_loss": jnp.sum(l1_map * pixmask[..., None]) / (npix * 3),
                "ssim": jnp.sum(ssim_map * pixmask) / npix,
                "mse": mse,
                "psnr": -10.0 * jnp.log10(mse),
                **umetrics,
            }
            if mask is not None:
                # masked metrics (reference method.py:1985-1992)
                msum = jnp.maximum(jnp.sum(mask * pixmask), 1.0)
                mse_masked = jnp.sum(jnp.square(image_toned - gt)
                                     * (mask * pixmask)[..., None]) / (msum * 3)
                metrics.update({
                    "mask_percentage": jnp.sum(mask * pixmask) / npix,
                    "ssim_masked": jnp.sum(ssim_map * mask * pixmask) / msum,
                    "mse_masked": mse_masked,
                    "psnr_masked": -10.0 * jnp.log10(mse_masked),
                    "l1_loss_masked": jnp.sum(l1_map * (mask * pixmask)[..., None]) / (msum * 3),
                })
            return loss, (pkg, metrics, new_bn)

        def train_step(params, adam, aux, camera_id, gt, pixmask,
                       mask, iteration, densify_enabled, poses, intrs, sizes,
                       unc_inputs, sat_cache=None):
            # under a mesh, the store lives sharded on the Gaussian axis:
            # constraining inputs AND outputs keeps params/Adam/aux (and all
            # elementwise per-Gaussian work between them) at 1/D memory per
            # device across steps, feeding the sharded sort engine with no
            # resharding (parallel/mesh.shard_store)
            if config.shard_gaussian_store:
                from ..parallel.mesh import shard_store
                ncap = params["xyz"].shape[0]
                params = shard_store(params, ncap)
                adam = shard_store(adam, ncap)
                aux = shard_store(aux, ncap)
            pose = poses[camera_id]
            intr = intrs[camera_id]
            actual_size = (sizes[camera_id, 0], sizes[camera_id, 1])
            n = params["xyz"].shape[0]
            m2d_hook = jnp.zeros((n, 2), jnp.float32)
            abs_hook = jnp.zeros((n, 2), jnp.float32)

            sat_super = sat_cache[camera_id] if use_satcull else None
            grad_fn = jax.grad(loss_and_render, argnums=(0, 1, 2), has_aux=True)
            (gparams, g_m2d, g_abs), (pkg, metrics, new_bn) = grad_fn(
                params, m2d_hook, abs_hook, aux, camera_id, pose, intr,
                actual_size, gt, pixmask, mask, iteration, unc_inputs,
                sat_super)

            # densification stats (reference method.py:1995-1998). The hook
            # gradients are in PIXEL units; the reference CUDA rasterizer
            # accumulates NDC-scaled ones (pixel grad x 0.5*W / 0.5*H,
            # backward.cu:505,590-595) and densify_grad_threshold is
            # calibrated for those units — convert before accumulating.
            # The ABS channel arrives NDC-scaled from the renderer (fused
            # in-kernel by the pallas sort engine; hook pre-scale for the
            # per-axis backends) — summing the channels covers both
            # contracts (rasterize_pallas_multi docstring).
            ndc_fac = jnp.stack([0.5 * actual_size[0], 0.5 * actual_size[1]])
            g_m2d_ndc = g_m2d * ndc_fac[None, :]
            g_abs_ndc = jnp.sum(g_abs, axis=-1)

            def upd(aux):
                return gs.update_densification_stats(aux, g_m2d_ndc, g_abs_ndc,
                                                     pkg.radii, use_abs)
            aux = jax.lax.cond(densify_enabled, upd, lambda a: a, aux)

            lrs = gs.param_learning_rates(config, spatial_lr_scale, iteration)
            wd = None
            if config.appearance_enabled and config.appearance_embedding_regularization:
                wd = {"appearance_embeddings": config.appearance_embedding_regularization}
            new_params, new_adam = gs.adam_update(params, gparams, adam, lrs,
                                                  weight_decay=wd)
            # the reference skips optimizer.step() on the final iteration
            # (method.py:2018 'if iteration < iterations'), so the saved model
            # has no parameter update after the last loss
            do_step = iteration < config.iterations
            params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_step, a, b), new_params, params)
            adam = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_step, a, b), new_adam, adam)
            metrics["num_rendered"] = pkg.num_rendered
            metrics["overflow"] = pkg.overflow
            metrics["send_drops"] = jnp.asarray(pkg.send_drops)
            metrics["max_tiles"] = jnp.asarray(pkg.max_tiles)
            # in-step so the host never issues an extra dispatch for it
            metrics["num_gaussians"] = jnp.sum(aux.alive)
            if use_satcull:
                from ..ops.rasterize_pallas import pool_sat_depth
                from ..ops.rasterize_tiled import make_grid
                new_map = pool_sat_depth(
                    pkg.sat_depth, make_grid(pad_w, pad_h, 16),
                    margin=getattr(config, "saturation_margin", 1.25))
                sat_cache = sat_cache.at[camera_id].set(new_map)
                return params, adam, aux, metrics, new_bn, sat_cache
            return params, adam, aux, metrics, new_bn

        # Pin the OUTPUT shardings of the store explicitly: letting GSPMD
        # pick them makes the (donated) input-sharding signature drift
        # between calls — each drift relowers the program, and jax 0.9's
        # dispatch fastpath mis-executes across those relowers (buffer-count
        # mismatches / IndexError during argument sharding). With pinned
        # out_shardings (and _commit_store_to_mesh pinning the first call's
        # inputs) every step has an identical signature.
        return jax.jit(train_step,
                       donate_argnums=(0, 1, 2, 13) if use_satcull
                       else (0, 1, 2),
                       out_shardings=self._store_out_shardings(
                           n_extra_outputs=3 if use_satcull else 2))

    @functools.cached_property
    def _densify_fn(self):
        config = self.config

        def run(key, params, adam, aux, extent, enable_size_pruning):
            return gs.densify_and_prune(key, params, adam, aux, config,
                                        extent, enable_size_pruning)
        # keep the store sharded across densify (mesh-active trainings);
        # the internal global sorts/cumsums reshard as XLA needs, but the
        # interface layout stays pinned at 1/D per device — see the
        # out_shardings rationale in _build_train_step
        return _aot_under_mesh(jax.jit(
            run, donate_argnums=(1, 2, 3),
            out_shardings=self._store_out_shardings(n_extra_outputs=1)))

    @functools.cached_property
    def _reset_opacity_fn(self):
        config = self.config

        def run(params, adam, aux):
            return gs.reset_opacity(params, adam, aux, config)
        shardings = self._store_out_shardings(n_extra_outputs=0)
        return _aot_under_mesh(jax.jit(
            run, donate_argnums=(0, 1),
            out_shardings=None if shardings is None else shardings[:2]))

    # --------------------------------------------------------------- protocol

    @classmethod
    def install(cls):
        """Method protocol hook (reference types.py:325-330); no-op."""

    @classmethod
    def get_method_info(cls) -> MethodInfo:
        return MethodInfo(
            method_id="wild-gaussians-tpu",
            required_features=frozenset(("color", "points3D_xyz")),
            supported_camera_models=frozenset(("pinhole",)),
        )

    def get_info(self) -> ModelInfo:
        return ModelInfo(
            **self.get_method_info(),
            num_iterations=self.config.iterations,
            loaded_step=self._loaded_step,
        )

    def train_iteration(self, step: int, camera_id: Optional[int] = None):
        assert self.train_cameras is not None, "Method not initialized"
        self.step = step
        iteration = step + 1
        self._commit_store_to_mesh()

        # SH warmup (method.py:1894-1895)
        if iteration % 1000 == 0:
            new_deg = jnp.minimum(self.aux.active_sh_degree + 1, self.config.sh_degree)
            self.aux = self.aux._replace(active_sh_degree=new_deg)

        if camera_id is None:
            # reference shuffle-stack semantics (method.py:1897-1901); for
            # multi-process runs the caller must pass a deterministic pick
            # instead (parallel.multihost.step_camera_id) so hosts agree
            if not self._viewpoint_stack:
                self._viewpoint_stack = list(range(len(self.train_cameras)))
            camera_id = self._viewpoint_stack.pop(
                random.randint(0, len(self._viewpoint_stack) - 1))
        self._last_camera_id = camera_id   # debug-snapshot provenance

        gt = jnp.asarray(self._train_images[camera_id])
        pixmask = jnp.asarray(self._pixmask[camera_id])
        mask = (jnp.asarray(self._train_masks[camera_id])
                if self._train_masks is not None else None)

        unc_inputs = None
        if self._uncertainty is not None:
            from .uncertainty import resize_valid, DINO_SIZE
            aw, ah = [int(x) for x in self.train_cameras.image_sizes[camera_id]]
            gt336, mask336, pmask24 = self._gt336_cached(camera_id, gt, aw, ah)
            feats_gt = self._uncertainty.gt_features(camera_id, gt336)
            self._key, ukey = jax.random.split(self._key)
            # protected iters after opacity reset (reference method.py:1951-1954)
            last_densify = min(iteration, self.config.densify_until_iter - 1)
            last_reset = (last_densify // self.config.opacity_reset_interval
                          ) * self.config.opacity_reset_interval
            protect = iteration < last_reset + self.config.uncertainty_protected_iters
            unc_inputs = (feats_gt, gt336, mask336, pmask24,
                          self._uncertainty.bn_state, ukey, jnp.bool_(protect))

        densify_enabled = iteration < self.config.densify_until_iter
        bw, bh = self._pad_wh[camera_id]
        if self._use_satcull():
            cache = self._sat_cache_for(bw, bh)
            (self.params, self.adam, self.aux, metrics, new_bn,
             new_cache) = self._train_step_for(bw, bh)(
                self.params, self.adam, self.aux, jnp.int32(camera_id), gt,
                pixmask, mask, jnp.float32(iteration),
                jnp.bool_(densify_enabled), self._poses_dev, self._intr_dev,
                self._sizes_dev, unc_inputs, cache)
            self._sat_caches[(bw, bh)] = new_cache
        else:
            self.params, self.adam, self.aux, metrics, new_bn = \
                self._train_step_for(bw, bh)(
                    self.params, self.adam, self.aux, jnp.int32(camera_id),
                    gt, pixmask, mask, jnp.float32(iteration),
                    jnp.bool_(densify_enabled), self._poses_dev,
                    self._intr_dev, self._sizes_dev, unc_inputs)
        if new_bn is not None:
            self._uncertainty.bn_state = new_bn

        # host-side densification scheduling (method.py:1994-2015)
        if densify_enabled:
            if (iteration > self.config.densify_from_iter
                    and iteration % self.config.densification_interval == 0):
                self._key, sub = jax.random.split(self._key)
                self.params, self.adam, self.aux, dstats = self._densify_fn(
                    sub, self.params, self.adam, self.aux,
                    jnp.float32(self.cameras_extent),
                    jnp.bool_(iteration > self.config.opacity_reset_interval))
                self._maybe_grow_capacity(dstats)
                self._refresh_filter()
                self._sat_caches.clear()   # scene changed: re-learn sat maps
            if iteration % self.config.opacity_reset_interval == 0:
                self.params, self.adam = self._reset_opacity_fn(
                    self.params, self.adam, self.aux)
                self._sat_caches.clear()   # opacities reset: nothing saturates
        elif (iteration % 100 == 0 and iteration < self.config.iterations - 100):
            self._refresh_filter()

        # ONE host transfer for the whole metrics dict: per-leaf fetches
        # (a float() loop, or even jax.device_get, which transfers leaves
        # separately) each pay a device round trip — ~8 ms x 9 metrics
        # over the axon relay, profiled at fixture scale. Stack the
        # scalars into one vector on device and fetch once; every metric
        # is integer-exact below 2^24 so the f32 promotion is lossless.
        keys = list(metrics.keys())
        vec = np.asarray(jnp.stack([metrics[k].astype(jnp.float32)
                                    for k in keys]))
        out = {k: float(v) for k, v in zip(keys, vec)}
        out["num_gaussians"] = int(out["num_gaussians"])
        self._maybe_grow_tile_budget(out.get("overflow", 0.0),
                                     out.get("send_drops", 0.0),
                                     out.get("max_tiles", 0.0))
        self.step = step + 1
        return out

    def _store_out_shardings(self, n_extra_outputs: int):
        """(params, adam, aux, *extras) output-sharding pytree for jitted
        store-updating functions, or None without a mesh.

        Under a mesh the interface MUST be pinned either way: left to GSPMD,
        the sharded sort engine's gradient out_specs propagate into the
        returned params and the chosen output shardings drift between
        relowers — and jax 0.9's dispatch fastpath mis-executes donated
        calls across that drift (see config.py: shard_gaussian_store).
        shard_gaussian_store=True pins [capacity, ...] arrays to the
        Gaussian axis (1/D memory); False pins everything replicated."""
        from ..parallel.mesh import current_mesh, TILE_AXIS
        mesh = current_mesh()
        if mesh is None or not self.config.shard_gaussian_store:
            return None
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(mesh, PartitionSpec())
        store_sh = NamedSharding(mesh, PartitionSpec(TILE_AXIS))
        ncap = self.params["xyz"].shape[0]

        def tree_sh(t):
            return jax.tree_util.tree_map(
                lambda a: store_sh
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == ncap
                else repl, t)

        return (tree_sh(self.params), tree_sh(self.adam), tree_sh(self.aux)
                ) + (repl,) * n_extra_outputs

    def _commit_store_to_mesh(self):
        """Eagerly device_put the store onto the active mesh (Gaussian axis).

        The jitted step also CONSTRAINS its outputs this way
        (parallel/mesh.shard_store), but the first step after setup or a
        capacity regrow would otherwise see uncommitted inputs — the
        input-sharding signature churn across donated calls is both a
        recompile and a known jit fastpath hazard. Committing up front keeps
        every step's signature identical."""
        from ..parallel.mesh import current_mesh, TILE_AXIS
        mesh = current_mesh()
        if (mesh is None or not self.config.shard_gaussian_store
                or getattr(self, "_store_on_mesh", None) is mesh):
            return
        from jax.sharding import NamedSharding, PartitionSpec
        ncap = self.params["xyz"].shape[0]
        # EXACTLY the sharding _store_out_shardings pins on outputs — any
        # difference (even the equivalent full-rank spec) changes the input
        # signature between step 0 and step 1, forcing a relower that jax
        # 0.9's dispatch fastpath then mis-executes
        store_sh = NamedSharding(mesh, PartitionSpec(TILE_AXIS))

        def put(tree):
            def one(a):
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == ncap:
                    return jax.device_put(a, store_sh)
                return a
            return jax.tree_util.tree_map(one, tree)

        self.params = put(self.params)
        self.adam = put(self.adam)
        self.aux = jax.tree_util.tree_map(lambda x: x, put(self.aux))
        self._store_on_mesh = mesh

    def _maybe_grow_tile_budget(self, overflow: float, send_drops: float = 0.0,
                                max_tiles: float = 0.0):
        """Auto-bump the per-Gaussian tile budget on persistent truncation.

        Mirrors _maybe_grow_capacity for the rasterizer's fixed duplication
        budget: truncated tile rects silently drop contributions at render
        time (ops/binning.py docstring), so a sustained nonzero overflow
        count triggers a staged recompile with a larger
        max_tiles_per_gaussian (and a deeper big-Gaussian pool).

        Send-cap drops (sharded engine: a skewed scene overfilling one
        (sender, band) all-to-all segment) are adapted SEPARATELY: they are
        fixed by a larger send buffer, not a deeper tile budget, so a
        persistent nonzero send_drops grows pallas_send_beta directly.
        """
        streak = self.__dict__.setdefault("_send_drop_streak", 0)
        self._send_drop_streak = streak + 1 if send_drops > 0 else 0
        if self._send_drop_streak >= 10 and self.config.pallas_send_beta < 16:
            old_beta = self.config.pallas_send_beta
            self.config.pallas_send_beta = old_beta * 1.5
            logger.info(
                "Persistent sharded-engine send drops (%d steps): growing "
                "send_beta %.2f -> %.2f (staged recompile)",
                self._send_drop_streak, old_beta,
                self.config.pallas_send_beta)
            self._send_drop_streak = 0
            self._step_cache.clear()
            self._render_fn.cache_clear()

        tile_overflow = overflow - send_drops
        self._overflow_streak = (self._overflow_streak + 1
                                 if tile_overflow > 0 else 0)
        if self._overflow_streak < 10:
            return
        self._overflow_streak = 0
        # STALL DETECTION (round-4 fix): some scenes have gaussians whose
        # footprints exceed ANY budget — without it the grow loop
        # recompiles every 10 steps FOREVER with ever-larger tables
        # (observed: 54 s -> 137 s recompiles at fixture scale). If the
        # last grow did not shrink the overflow by >= 30%, or the budget
        # hit the hard cap, latch saturated and keep training with the
        # (surfaced) truncation.
        if self.__dict__.get("_tile_budget_saturated", False):
            return
        prev = self.__dict__.get("_overflow_at_last_grow")
        if ((prev is not None and tile_overflow > 0.7 * prev)
                or self.config.max_tiles_per_gaussian >= 128):
            self._tile_budget_saturated = True
            logger.warning(
                "Rasterizer overflow persists at %d after growing the tile "
                "budget to %d (prev overflow %s): budget growth is not "
                "converging — keeping the current budget; truncation stays "
                "visible in the overflow metric",
                int(tile_overflow), self.config.max_tiles_per_gaussian,
                prev)
            return
        self._overflow_at_last_grow = tile_overflow
        old = self.config.max_tiles_per_gaussian
        # grow straight to the scene's observed need (max raw tile rect,
        # reported by the step) instead of 1.5x-stepping through several
        # staged recompiles — each recompile costs tens of seconds
        want = int(max_tiles) if max_tiles else old * 3 // 2
        self.config.max_tiles_per_gaussian = min(max(old * 3 // 2,
                                                     want) + 1, 128)
        self.config.pallas_big_fraction = min(
            self.config.pallas_big_fraction * 1.5, 1.0)
        logger.info(
            "Persistent rasterizer overflow (%d): growing "
            "max_tiles_per_gaussian %d -> %d, big_fraction -> %.3f "
            "(staged recompile)", int(tile_overflow), old,
            self.config.max_tiles_per_gaussian, self.config.pallas_big_fraction)
        self._step_cache.clear()
        self._render_fn.cache_clear()

    def _gt336_cached(self, camera_id, gt, aw, ah):
        """Fixed-size (DINO_SIZE) letterbox of the valid GT region + pixel-
        and patch-level content masks, cached per camera (plain instance
        dict — an lru_cache on a method would pin self and every canvas
        for the process lifetime)."""
        from .uncertainty import resize_valid, content_mask, DINO_SIZE
        cache = self.__dict__.setdefault("_gt336_cache", {})
        if camera_id not in cache:
            lb = self.config.uncertainty_dino_letterbox
            gt336 = resize_valid(gt, DINO_SIZE, DINO_SIZE,
                                 jnp.float32(ah), jnp.float32(aw),
                                 letterbox=lb)
            mask336 = content_mask(DINO_SIZE, DINO_SIZE, jnp.float32(ah),
                                   jnp.float32(aw), lb)
            pmask = content_mask(DINO_SIZE, DINO_SIZE, jnp.float32(ah),
                                 jnp.float32(aw), lb,
                                 granularity=self._uncertainty.dino.patch_size)
            cache[camera_id] = tuple(
                jax.device_get(x) for x in (gt336, mask336, pmask))
        g, m, pm = cache[camera_id]
        return jnp.asarray(g), jnp.asarray(m), jnp.asarray(pm)

    def _maybe_grow_capacity(self, dstats):
        dropped = int(dstats["dropped_for_capacity"])
        n_alive = int(dstats["n_alive"])
        capacity = self.aux.alive.shape[0]
        if dropped > 0 or n_alive > self.config.capacity_high_watermark * capacity:
            new_capacity = _round_up(int(capacity * self.config.capacity_growth_factor) + dropped, 256)
            logger.info("Growing capacity %d -> %d (alive=%d, dropped=%d)",
                        capacity, new_capacity, n_alive, dropped)
            self.params, self.adam, self.aux = gs.grow_capacity(
                self.params, self.adam, self.aux, new_capacity)
            # shapes changed: drop compiled functions and re-commit the
            # (new, uncommitted) store arrays to any active mesh
            self._step_cache.clear()
            self.__dict__.pop("_densify_fn", None)
            self.__dict__.pop("_reset_opacity_fn", None)
            self._store_on_mesh = None
            self._commit_store_to_mesh()

    # ----------------------------------------------------------------- render

    @functools.lru_cache(maxsize=8)
    def _render_fn(self, width: int, height: int, render_depth: bool):
        config = self.config

        def run(params, aux, pose, intr, embedding, actual_size):
            gaussians = gs.get_gaussians(params, aux, config)
            pkg = render_internal(
                gaussians, params, aux.active_sh_degree, aux.alive, config,
                pose, intr, width, height, embedding=embedding,
                kernel_size=config.kernel_size, render_depth=render_depth,
                actual_size=actual_size)
            img = jnp.nan_to_num(jnp.clip(pkg.render, 0.0, 1.0))
            return img, pkg.accumulation, pkg.depth
        return jax.jit(run)

    def get_embedding(self, train_image_id=None):
        if not self.config.appearance_enabled:
            return None
        if train_image_id is not None:
            return self.params["appearance_embeddings"][train_image_id]
        return jnp.zeros_like(self.params["appearance_embeddings"][0])

    def render(self, camera: Cameras, *, options=None, **kwargs) -> RenderOutput:
        del kwargs
        camera = camera.item()
        assert camera.camera_models == camera_model_to_int("pinhole"), "Only pinhole supported"
        render_depth = bool(options and "depth" in options.get("outputs", ()))
        w, h = int(camera.image_sizes[0]), int(camera.image_sizes[1])
        pw, ph = _round_up(w, 16), _round_up(h, 16)
        np_embedding = (options or {}).get("embedding", None)
        embedding = (jnp.asarray(np_embedding) if np_embedding is not None
                     else self.get_embedding(None))
        fn = self._render_fn(pw, ph, render_depth)
        img, acc, depth = fn(self.params, self.aux,
                             jnp.asarray(camera.poses, jnp.float32),
                             jnp.asarray(camera.intrinsics, jnp.float32),
                             embedding,
                             (jnp.float32(w), jnp.float32(h)))
        out: RenderOutput = {
            "color": np.asarray(img)[:h, :w],
            "accumulation": np.asarray(acc)[:h, :w],
        }
        if depth is not None:
            out["depth"] = np.asarray(depth)[:h, :w]
        return out

    # ---------------------------------------------------- embedding optimization

    @functools.cached_property
    def _embed_opt_step(self):
        config = self.config

        def loss_fn(embedding, params, aux, pose, intr, actual_size, gt,
                    pixmask, loss_mult, pw, ph):
            gaussians = gs.get_gaussians(params, aux, config)
            pkg = render_internal(
                gaussians, params, aux.active_sh_degree, aux.alive, config,
                pose, intr, pw, ph, embedding=embedding,
                kernel_size=config.kernel_size, return_raw=False,
                actual_size=actual_size)
            image = pkg.render * pixmask[..., None]
            if loss_mult is not None:
                image = scale_grads(image, loss_mult[..., None])
            npix = jnp.sum(pixmask)
            mse = jnp.sum(jnp.square(image - gt) * pixmask[..., None]) / (npix * 3)
            app_optim_type = config.appearance_optim_type
            if app_optim_type.endswith("-scaled"):
                app_optim_type = app_optim_type[:-7]
            if app_optim_type == "mse":
                loss = mse
            elif app_optim_type == "dssim+l1":
                l1 = jnp.sum(jnp.abs(image - gt) * pixmask[..., None]) / (npix * 3)
                ssim_v = jnp.sum(ssim(image, gt, size_average=False) * pixmask) / npix
                loss = (1.0 - config.lambda_dssim) * l1 + config.lambda_dssim * (1.0 - ssim_v)
            else:
                raise ValueError(f"Unknown appearance optimization type {app_optim_type}")
            return loss, mse

        def step(embedding, mu, nu, t, params, aux, pose, intr, actual_size,
                 gt, pixmask, loss_mult, pw, ph):
            (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                embedding, params, aux, pose, intr, actual_size, gt, pixmask,
                loss_mult, pw, ph)
            lr = config.appearance_embedding_optim_lr
            b1, b2, eps = 0.9, 0.999, 1e-8  # torch.optim.Adam defaults (method.py:1773)
            t = t + 1
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            mhat = mu / (1 - b1 ** t)
            nhat = nu / (1 - b2 ** t)
            embedding = embedding - lr * mhat / (jnp.sqrt(nhat) + eps)
            return embedding, mu, nu, t, loss, mse

        return jax.jit(step, static_argnames=("pw", "ph"))

    def optimize_embedding(self, dataset: Dataset, *,
                           embedding: Optional[np.ndarray] = None) -> OptimizeEmbeddingOutput:
        if not self.config.appearance_enabled:
            raise NotImplementedError("Trying to optimize embedding with appearance_enabled=False")
        camera = dataset["cameras"].item()
        assert camera.camera_models == camera_model_to_int("pinhole")
        w, h = int(camera.image_sizes[0]), int(camera.image_sizes[1])
        pw, ph = _round_up(w, 16), _round_up(h, 16)

        gt_np = convert_image_dtype(dataset["images"][0], np.float32)[..., :3]
        gt = jnp.asarray(_pad_to(gt_np, ph, pw))
        pixmask = jnp.asarray(_pad_to(np.ones((h, w, 1), np.float32), ph, pw)[..., 0])

        loss_mult = None
        if self.config.appearance_optim_type.endswith("-scaled") and self._uncertainty is not None:
            lm = self._uncertainty.loss_mult_for_image(
                self.params["uncertainty"], gt, pixmask,
                jnp.float32(h), jnp.float32(w))
            loss_mult = (lm > 1.0).astype(jnp.float32)
        if dataset.get("masks") is not None:
            m = convert_image_dtype(dataset["masks"][0], np.float32)
            m = jnp.asarray(_pad_to(m[..., None], ph, pw)[..., 0])
            loss_mult = m if loss_mult is None else loss_mult * m

        emb = (jnp.asarray(embedding) if embedding is not None
               else self.get_embedding(None))
        mu = jnp.zeros_like(emb)
        nu = jnp.zeros_like(emb)
        t = jnp.int32(0)
        losses, mses, psnrs = [], [], []
        pose = jnp.asarray(camera.poses, jnp.float32)
        intr = jnp.asarray(camera.intrinsics, jnp.float32)
        actual = (jnp.float32(w), jnp.float32(h))
        for _ in range(self.config.appearance_embedding_optim_iters):
            emb, mu, nu, t, loss, mse = self._embed_opt_step(
                emb, mu, nu, t, self.params, self.aux, pose, intr, actual,
                gt, pixmask, loss_mult, pw, ph)
            losses.append(float(loss))
            mses.append(float(mse))
            psnrs.append(20 * math.log10(1.0) - 10 * math.log10(max(float(mse), 1e-10)))
        return {
            "embedding": np.asarray(emb),
            "metrics": {"psnr": psnrs, "mse": mses, "loss": losses},
        }

    def get_train_embedding(self, index: int) -> Optional[np.ndarray]:
        e = self.get_embedding(index)
        return np.asarray(e) if e is not None else None

    # ------------------------------------------------------------- checkpoints

    def _state_dict(self) -> Dict[str, np.ndarray]:
        flat = {}

        def add(prefix, tree):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            for path, leaf in leaves:
                key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
                flat[key] = np.asarray(leaf)
        add("params/", self.params)
        add("adam/mu/", self.adam.mu)
        add("adam/nu/", self.adam.nu)
        flat["adam/step"] = np.asarray(self.adam.step)
        for f in self.aux._fields:
            flat[f"aux/{f}"] = np.asarray(getattr(self.aux, f))
        flat["spatial_lr_scale"] = np.asarray(self.spatial_lr_scale)
        if self._uncertainty is not None:
            flat["uncertainty_bn/mean"] = np.asarray(self._uncertainty.bn_state["mean"])
            flat["uncertainty_bn/var"] = np.asarray(self._uncertainty.bn_state["var"])
        return flat

    def _load_state(self, npz):
        flat = dict(npz.items()) if hasattr(npz, "items") else dict(npz)

        def tree_from(prefix):
            out = {}
            for k, v in flat.items():
                if not k.startswith(prefix):
                    continue
                parts = k[len(prefix):].split("/")
                d = out
                for p in parts[:-1]:
                    d = d.setdefault(p, {})
                d[parts[-1]] = jnp.asarray(v)
            return out
        self.params = tree_from("params/")
        self.adam = gs.AdamState(mu=tree_from("adam/mu/"), nu=tree_from("adam/nu/"),
                                 step=jnp.asarray(flat["adam/step"]))
        aux_kw = {f: jnp.asarray(flat[f"aux/{f}"]) for f in gs.AuxState._fields}
        self.aux = gs.AuxState(**aux_kw)
        self.spatial_lr_scale = float(flat["spatial_lr_scale"])
        if self._uncertainty is not None and "uncertainty_bn/mean" in flat:
            self._uncertainty.bn_state = {
                "mean": jnp.asarray(flat["uncertainty_bn/mean"]),
                "var": jnp.asarray(flat["uncertainty_bn/var"]),
            }

    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        from ..io.ply import save_ply
        gaussians = gs.get_gaussians(self.params, self.aux, self.config)
        alive = np.asarray(self.aux.alive)
        save_ply(os.path.join(path, "point_cloud.ply"),
                 xyz=np.asarray(self.params["xyz"])[alive],
                 features_dc=np.asarray(self.params["features_dc"])[alive],
                 opacities=np.asarray(gaussians["opacities"])[alive],
                 scales=np.asarray(gaussians["scales"])[alive],
                 rotations=np.asarray(self.params["rotations"])[alive])
        state = self._state_dict()
        ckpt_path = os.path.join(path, f"chkpnt-{self.step}.npz")
        np.savez(ckpt_path, **state)
        with open(os.path.join(path, "config.yaml"), "w", encoding="utf8") as f:
            f.write(config_to_yaml(self.config))
        import hashlib
        sha = hashlib.sha256()
        for k in sorted(state):
            sha.update(k.encode())
            sha.update(state[k].tobytes())
        with open(ckpt_path + ".sha256", "w", encoding="utf8") as f:
            f.write(sha.hexdigest())
