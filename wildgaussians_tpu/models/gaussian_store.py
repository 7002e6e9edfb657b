"""Fixed-capacity Gaussian parameter store + Adam + densification, all jit-safe.

TPU-native redesign of the reference GaussianModel (method.py:903-1477). The
reference reallocates tensors and performs optimizer-state surgery on every
densify/prune (method.py:1280-1468); under XLA that would recompile every
interval. Here the store is a padded capacity-C pytree with an `alive` mask:

  - densify (clone/split) = masked scatter of new points into free slots
  - prune = clearing alive bits
  - Adam moment zeroing for touched slots = the same slot scatter
  - capacity growth = a host-side repad (rare, staged recompile)

Parameter tree keys mirror the reference param groups (method.py:1029-1053)
so per-group learning rates and checkpoint conversion map 1:1.
"""
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.gaussians import apply_3d_filter, quat_to_rotmat


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics (reference method.py:927)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class AuxState(NamedTuple):
    """Non-differentiable per-Gaussian buffers (reference method.py:943-955)."""
    alive: jnp.ndarray                    # [C] bool
    filter_3D: jnp.ndarray                # [C,1]
    max_radii2D: jnp.ndarray              # [C]
    xyz_grad: jnp.ndarray                 # [C,1] accumulated |grad_xy|
    xyz_gradient_accum_abs: jnp.ndarray   # [C,1]
    xyz_gradient_accum_abs_max: jnp.ndarray  # [C,1]
    denom: jnp.ndarray                    # [C,1]
    active_sh_degree: jnp.ndarray         # [] int32


class AdamState(NamedTuple):
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    step: jnp.ndarray  # [] int32 (shared across groups, like torch param-group step)


def init_aux(capacity: int) -> AuxState:
    # NOTE: each field gets its own fresh buffer — shared zeros would alias
    # and break jit buffer donation.
    def z1():
        return jnp.zeros((capacity, 1), jnp.float32)
    return AuxState(
        alive=jnp.zeros((capacity,), bool),
        filter_3D=z1(),
        max_radii2D=jnp.zeros((capacity,), jnp.float32),
        xyz_grad=z1(),
        xyz_gradient_accum_abs=z1(),
        xyz_gradient_accum_abs_max=z1(),
        denom=z1(),
        active_sh_degree=jnp.zeros((), jnp.int32),
    )


def init_adam(params: Dict[str, jnp.ndarray]) -> AdamState:
    return AdamState(mu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def param_learning_rates(config: Config, spatial_lr_scale: float, step):
    """Per-group LR tree; `step` is the 1-indexed iteration (traced ok).

    Mirrors _setup_optimizers + update_learning_rate (method.py:1029-1053,
    1203-1210) and the Plenoxels exponential schedule (method.py:551-584;
    lr_delay_steps=0 there, so the delay branch never fires).
    """
    t = jnp.clip(step / config.position_lr_max_steps, 0.0, 1.0)
    lr_init = config.position_lr_init * spatial_lr_scale
    lr_final = config.position_lr_final * spatial_lr_scale
    xyz_lr = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
    lrs = {
        "xyz": xyz_lr,
        "features_dc": config.feature_lr,
        "opacities": config.opacity_lr,
        "scales": config.scaling_lr,
        "rotations": config.rotation_lr,
    }
    if config.sh_degree > 0:
        lrs["features_rest"] = config.feature_lr / 20.0
    if config.appearance_enabled:
        lrs["appearance_embeddings"] = config.appearance_embedding_lr
        lrs["embeddings"] = config.embedding_lr
        lrs["appearance_mlp"] = config.appearance_mlp_lr
    if config.uncertainty_mode != "disabled":
        lrs["uncertainty"] = config.uncertainty_lr
    return lrs


def adam_update(params, grads, state: AdamState, lrs,
                b1=0.9, b2=0.999, eps=1e-15, weight_decay=None):
    """Hand-rolled Adam matching torch.optim.Adam(eps=1e-15)
    (reference method.py:1049). `lrs` maps top-level keys to scalar LRs;
    nested subtrees (e.g. the appearance MLP) share their key's LR.
    """
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        lr = lrs[k]
        def upd(p, g, mu, nu):
            if weight_decay and weight_decay.get(k, 0.0):
                g = g + weight_decay[k] * p
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * jnp.square(g)
            update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return p - lr * update, mu, nu
        out = jax.tree_util.tree_map(upd, params[k], grads[k],
                                     state.mu[k], state.nu[k])
        # tree_map over tuples: unzip
        new_params[k] = jax.tree_util.tree_map(lambda t: t[0], out,
                                               is_leaf=lambda t: isinstance(t, tuple))
        new_mu[k] = jax.tree_util.tree_map(lambda t: t[1], out,
                                           is_leaf=lambda t: isinstance(t, tuple))
        new_nu[k] = jax.tree_util.tree_map(lambda t: t[2], out,
                                           is_leaf=lambda t: isinstance(t, tuple))
    return new_params, AdamState(new_mu, new_nu, step)


def init_params_from_points(config: Config, xyz: np.ndarray, colors_u8: np.ndarray,
                            opacities: Optional[np.ndarray], capacity: int,
                            num_images: int, knn_dist2: np.ndarray,
                            rng: np.random.Generator) -> Tuple[dict, AuxState]:
    """Build the padded parameter tree from a COLMAP point cloud.

    Mirrors initialize_from_points3D (method.py:991-1027): scales from
    log(sqrt(3-NN mean dist^2)), identity rotations, 0.1 opacity (logit),
    raw-RGB DC features, Fourier per-Gaussian embeddings.
    """
    n = xyz.shape[0]
    assert n <= capacity, f"{n} points > capacity {capacity}"

    # Shuffle the initial points across the store (seeded): slot order is
    # semantically irrelevant single-chip, but the sharded sort engine
    # partitions the store into CONTIGUOUS per-device blocks — COLMAP files
    # are spatially ordered and the sky points arrive appended at the end,
    # so without a shuffle one shard owns all the big-footprint Gaussians
    # and its per-shard big pool (and send caps) saturate first.
    perm = rng.permutation(n)
    xyz = xyz[perm]
    colors_u8 = colors_u8[perm]
    knn_dist2 = np.asarray(knn_dist2)[perm]
    if opacities is not None:
        opacities = np.asarray(opacities)[perm]

    def pad(x, width):
        out = np.zeros((capacity, width), np.float32)
        out[:n] = x
        return jnp.asarray(out)

    if opacities is None:
        opacities = 0.1 * np.ones(n, np.float32)
    op_logit = np.log(opacities / (1 - opacities)).astype(np.float32)[:, None]
    d2 = np.clip(knn_dist2, 1e-7, None)
    log_scales = np.repeat(np.log(np.sqrt(d2))[:, None], 3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0

    params = {
        "xyz": pad(xyz.astype(np.float32), 3),
        "features_dc": pad(colors_u8.astype(np.float32) / 255.0, 3),
        "scales": pad(log_scales, 3),
        "rotations": pad(rots, 4),
        "opacities": pad(op_logit, 1),
    }
    if config.sh_degree > 0:
        params["features_rest"] = jnp.zeros(
            (capacity, ((config.sh_degree + 1) ** 2 - 1) * 3), jnp.float32)
    if config.appearance_enabled:
        emb = fourier_features(xyz.astype(np.float32),
                               num_features=config.appearance_n_fourier_freqs)
        emb = emb + rng.normal(0, 0.0001, emb.shape).astype(np.float32)
        if not config.appearance_init_fourier:
            emb = rng.normal(0, 0.01, emb.shape).astype(np.float32)
        params["embeddings"] = pad(emb, emb.shape[1])
        params["appearance_embeddings"] = jnp.asarray(
            rng.normal(0, 0.01, (num_images, config.appearance_embedding_dim)).astype(np.float32))

    aux = init_aux(capacity)
    aux = aux._replace(alive=jnp.arange(capacity) < n)
    return params, aux


def fourier_features(xyz: np.ndarray, num_features: int = 3) -> np.ndarray:
    """Per-Gaussian Fourier position features (reference method.py:862-871)."""
    xyz = xyz - xyz.mean(axis=0, keepdims=True)
    q = np.quantile(np.abs(xyz), 0.97, axis=0)
    xyz = xyz / q * 0.5 + 0.5
    freqs = np.repeat(2 ** np.linspace(0, num_features - 1, num_features,
                                       dtype=np.float32), 2)
    offsets = np.array([0, 0.5 * math.pi] * num_features, np.float32)
    feat = xyz[..., None] * freqs[None, None] * 2 * math.pi + offsets[None, None]
    return np.sin(feat).reshape(xyz.shape[0], -1).astype(np.float32)


def get_gaussians(params: dict, aux: AuxState, config: Config):
    """Activated Gaussians with the 3D filter fused (method.py:1060-1086)."""
    rotations = l2_normalize(params["rotations"])
    features = params["features_dc"]
    if "features_rest" in params:
        features = jnp.concatenate([features, params["features_rest"]], axis=-1)
    raw_scales = jnp.exp(params["scales"])
    raw_opacities = jax.nn.sigmoid(params["opacities"])
    scales, opacities = apply_3d_filter(raw_scales, raw_opacities, aux.filter_3D)
    return {
        "xyz": params["xyz"],
        "opacities": opacities,
        "scales": scales,
        "rotations": rotations,
        "features": features,
    }


def _masked_quantile(values: jnp.ndarray, mask: jnp.ndarray, q: jnp.ndarray):
    """torch.quantile (linear interpolation) over values[mask]."""
    v = jnp.where(mask, values, jnp.inf)
    v = jnp.sort(v)
    n = jnp.sum(mask)
    pos = jnp.clip(q, 0.0, 1.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    vlo = v[jnp.clip(lo, 0, values.shape[0] - 1)]
    vhi = v[jnp.clip(hi, 0, values.shape[0] - 1)]
    out = vlo + (pos - lo.astype(jnp.float32)) * (vhi - vlo)
    return jnp.where(n > 0, out, jnp.inf)


def _free_slot_table(alive: jnp.ndarray):
    """slot index of the r-th free slot, for r in [0, n_free)."""
    c = alive.shape[0]
    free = ~alive
    rank = jnp.cumsum(free) - 1
    table = jnp.full((c,), c, jnp.int32).at[
        jnp.where(free, rank, c)].set(jnp.arange(c, dtype=jnp.int32), mode="drop")
    return table, jnp.sum(free)


def densify_and_prune(key, params: dict, adam: AdamState, aux: AuxState,
                      config: Config, extent: float, enable_size_pruning,
                      min_opacity: float = 0.005):
    """Clone + split + prune on the fixed-capacity store.

    Semantics mirror densify_and_prune (method.py:1420-1468):
      clone: grad-selected AND max(scale) <= percent_dense*extent — copies raw
             params into a free slot (method.py:1393-1418)
      split: grad-selected AND max(scale) > percent_dense*extent — two children
             sampled from the parent gaussian with scales/(0.8*2); child A
             overwrites the parent slot, child B takes a free slot
             (method.py:1348-1391)
      prune: activated opacity < min_opacity, plus max(scale) > 0.1*extent when
             size pruning is on (method.py:1445-1465)
    Adam moments of every written slot are zeroed (the reference zeroes
    moments for appended rows, method.py:1323-1328).
    Returns (params, adam, aux, stats dict).
    """
    c = aux.alive.shape[0]
    alive = aux.alive
    denom = jnp.maximum(aux.denom, 1e-12)
    grads = jnp.nan_to_num(aux.xyz_grad / denom)[:, 0]
    sel = grads >= config.densify_grad_threshold
    if config.use_gof_abs_gradient:
        ratio = jnp.sum(sel & alive) / jnp.maximum(jnp.sum(alive), 1)
        grads_abs = jnp.nan_to_num(aux.xyz_gradient_accum_abs / denom)[:, 0]
        q_thresh = _masked_quantile(grads_abs, alive, 1.0 - ratio)
        sel = sel | (grads_abs >= q_thresh)
    sel = sel & alive

    scales_act = jnp.exp(params["scales"])
    max_scale = jnp.max(scales_act, axis=1)
    clone_sel = sel & (max_scale <= config.percent_dense * extent)
    split_sel = sel & (max_scale > config.percent_dense * extent)

    table, n_free = _free_slot_table(alive)
    n_clone = jnp.sum(clone_sel)
    clone_rank = jnp.cumsum(clone_sel) - 1
    split_rank = n_clone + jnp.cumsum(split_sel) - 1

    def target_of(rank, mask):
        ok = mask & (rank < n_free)
        slot = table[jnp.clip(rank, 0, c - 1)]
        return jnp.where(ok, slot, c), ok  # c = dropped by scatter

    clone_tgt, clone_ok = target_of(clone_rank, clone_sel)
    split_tgt, split_ok = target_of(split_rank, split_sel)

    # split children: sample offsets in the parent frame
    stds = scales_act
    eps_a = jax.random.normal(key, (c, 3)) * stds
    eps_b = jax.random.normal(jax.random.fold_in(key, 1), (c, 3)) * stds
    rots_mat = quat_to_rotmat(l2_normalize(params["rotations"]))
    off_a = jnp.einsum("nij,nj->ni", rots_mat, eps_a)
    off_b = jnp.einsum("nij,nj->ni", rots_mat, eps_b)
    split_scales = jnp.log(scales_act / (0.8 * 2))

    new_params = {}
    # per-Gaussian parameter arrays only (skip module subtrees like the
    # appearance MLP / uncertainty head and the per-image embeddings)
    per_point = [k for k, v in params.items()
                 if k != "appearance_embeddings"
                 and hasattr(v, "ndim") and v.ndim == 2 and v.shape[0] == c]
    for k in per_point:
        p = params[k]
        # clones copy raw parameters (invalid targets are slot c -> dropped)
        p = p.at[clone_tgt].set(params[k], mode="drop")
        if k == "xyz":
            child_a = params["xyz"] + off_a
            child_b = params["xyz"] + off_b
        elif k == "scales":
            child_a = child_b = split_scales
        else:
            child_a = child_b = params[k]
        p = p.at[split_tgt].set(child_b, mode="drop")
        # child A overwrites the parent slot
        p = jnp.where((split_sel & split_ok)[:, None], child_a, p)
        new_params[k] = p
    for k in params:
        if k not in new_params:  # non-per-point subtrees pass through
            new_params[k] = params[k]

    alive = aux.alive
    alive = alive.at[clone_tgt].set(True, mode="drop")
    alive = alive.at[split_tgt].set(True, mode="drop")

    # zero Adam moments on touched slots (clone target, split target, parent)
    touched = jnp.zeros((c,), bool)
    touched = touched.at[clone_tgt].set(True, mode="drop")
    touched = touched.at[split_tgt].set(True, mode="drop")
    touched = touched | (split_sel & split_ok)
    mu, nu = dict(adam.mu), dict(adam.nu)
    for k in per_point:
        mask = touched[:, None] if params[k].ndim > 1 else touched
        mu[k] = jnp.where(mask, 0.0, adam.mu[k])
        nu[k] = jnp.where(mask, 0.0, adam.nu[k])

    # prune on the post-densification state
    opacity_act = jax.nn.sigmoid(new_params["opacities"])[:, 0]
    new_max_scale = jnp.max(jnp.exp(new_params["scales"]), axis=1)
    prune = opacity_act < min_opacity
    prune = jnp.where(enable_size_pruning,
                      prune | (new_max_scale > 0.1 * extent), prune)
    alive_after = alive & ~prune

    # reset densification stats/buffers (fresh accumulation window; the
    # reference keeps accumulating but rows are re-created on append — new
    # slots must start at zero, and stats of moved parents are stale)
    z1 = jnp.zeros((c, 1), jnp.float32)
    aux_new = aux._replace(
        alive=alive_after,
        xyz_grad=jnp.where(touched[:, None], 0.0, aux.xyz_grad),
        xyz_gradient_accum_abs=jnp.where(touched[:, None], 0.0, aux.xyz_gradient_accum_abs),
        xyz_gradient_accum_abs_max=jnp.where(touched[:, None], 0.0, aux.xyz_gradient_accum_abs_max),
        denom=jnp.where(touched[:, None], 0.0, aux.denom),
        max_radii2D=jnp.where(touched, 0.0, aux.max_radii2D),
        filter_3D=jnp.where(touched[:, None], 0.0, aux.filter_3D),
    )
    stats = {
        "clones": jnp.sum(clone_ok & clone_sel),
        "splits": jnp.sum(split_ok & split_sel),
        "pruned": jnp.sum(alive & prune),
        "dropped_for_capacity": jnp.sum(clone_sel & ~clone_ok) + jnp.sum(split_sel & ~split_ok),
        "n_alive": jnp.sum(alive_after),
    }
    return new_params, AdamState(mu, nu, adam.step), aux_new, stats


def reset_opacity(params: dict, adam: AdamState, aux: AuxState, config: Config):
    """Opacity reset considering the 3D filter (method.py:1249-1278)."""
    g = get_gaussians(params, aux, config)
    op = g["opacities"]
    op_new = jnp.minimum(op, 0.01)
    s2 = jnp.square(g["scales"])
    det1 = jnp.prod(s2, axis=1)
    s2f = s2 + jnp.square(aux.filter_3D)
    det2 = jnp.prod(s2f, axis=1)
    coef = jnp.sqrt(det1 / jnp.maximum(det2, 1e-30))
    op_new = op_new / jnp.maximum(coef[:, None], 1e-12)
    op_new = jnp.clip(op_new, 1e-6, 1 - 1e-6)
    logits = jnp.log(op_new / (1 - op_new))
    params = dict(params)
    params["opacities"] = logits
    mu = dict(adam.mu)
    nu = dict(adam.nu)
    mu["opacities"] = jnp.zeros_like(mu["opacities"])
    nu["opacities"] = jnp.zeros_like(nu["opacities"])
    return params, AdamState(mu, nu, adam.step)


def compute_3d_filter(xyz: jnp.ndarray, alive: jnp.ndarray,
                      poses: jnp.ndarray, intrinsics: jnp.ndarray,
                      image_sizes: jnp.ndarray) -> jnp.ndarray:
    """Mip-splatting 3D filter from nearest-camera distance
    (method.py:1139-1190). poses [M,3,4] c2w; image_sizes [M,2] float."""
    c = xyz.shape[0]

    def per_cam(carry, cam):
        distance, valid_points = carry
        pose, intr, size = cam
        pose4 = jnp.concatenate([pose, jnp.array([[0., 0, 0, 1]], pose.dtype)], 0)
        w2c = jnp.linalg.inv(pose4)
        R = w2c[:3, :3]
        T = w2c[:3, 3]
        xyz_cam = (xyz[:, None, :] * R[None]).sum(-1) + T[None]
        z = xyz_cam[:, 2]
        valid_depth = z > 0.2
        zc = jnp.maximum(z, 0.001)
        fx, fy = intr[0], intr[1]
        w, h = size[0], size[1]
        x = xyz_cam[:, 0] / zc * fx + w / 2.0
        y = xyz_cam[:, 1] / zc * fy + h / 2.0
        in_screen = (x >= -0.15 * w) & (x <= 1.15 * w) & (y >= -0.15 * h) & (y <= 1.15 * h)
        valid = valid_depth & in_screen & alive
        distance = jnp.where(valid, jnp.minimum(distance, zc), distance)
        return (distance, valid_points | valid), None

    init = (jnp.full((c,), 1e5, jnp.float32), jnp.zeros((c,), bool))
    (distance, valid_points), _ = jax.lax.scan(per_cam, init, (poses, intrinsics, image_sizes))
    focal = jnp.max(intrinsics[:, 0])
    max_valid = jnp.max(jnp.where(valid_points, distance, -jnp.inf))
    max_valid = jnp.where(jnp.isfinite(max_valid), max_valid, 1e5)
    distance = jnp.where(valid_points, distance, max_valid)
    return (distance / focal * (0.2 ** 0.5))[:, None]


def update_densification_stats(aux: AuxState, mean2d_grad: jnp.ndarray,
                               absgrad: jnp.ndarray, radii: jnp.ndarray,
                               use_abs: bool) -> AuxState:
    """add_densification_stats + max_radii2D tracking (method.py:1470-1477,
    1996-1998). mean2d_grad [C,2] signed; absgrad [C]. Both must already be
    in the reference's NDC-scaled units (pixel grads x 0.5*W / 0.5*H,
    backward.cu:505,590-595) — densify_grad_threshold assumes them."""
    vis = radii > 0
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1, keepdims=True)
    aux = aux._replace(
        xyz_grad=aux.xyz_grad + jnp.where(vis[:, None], gnorm, 0.0),
        denom=aux.denom + jnp.where(vis[:, None], 1.0, 0.0),
        max_radii2D=jnp.where(vis, jnp.maximum(aux.max_radii2D, radii.astype(jnp.float32)),
                              aux.max_radii2D),
    )
    if use_abs:
        a = absgrad[:, None]
        aux = aux._replace(
            xyz_gradient_accum_abs=aux.xyz_gradient_accum_abs + jnp.where(vis[:, None], a, 0.0),
            xyz_gradient_accum_abs_max=jnp.where(
                vis[:, None], jnp.maximum(aux.xyz_gradient_accum_abs_max, a),
                aux.xyz_gradient_accum_abs_max),
        )
    return aux


def grow_capacity(params: dict, adam: AdamState, aux: AuxState,
                  new_capacity: int):
    """Host-side repad to a larger capacity (one recompile per growth)."""
    c = aux.alive.shape[0]
    assert new_capacity > c
    pad = new_capacity - c

    def padded(x):
        # pad exactly the per-Gaussian leaves: capacity-length leading axis.
        # Non-Gaussian entries (appearance MLP/embedding dicts, uncertainty
        # head, scalars) pass through — matching on shape rather than a
        # name list keeps nested param trees (appearance_mlp etc.) safe.
        if getattr(x, "ndim", 0) == 0 or x.shape[0] != c:
            return x
        return jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)

    def padded_tree(tree):
        # appearance_embeddings is [num_images, D]: excluded by NAME (it
        # must never be padded even if num_images == capacity)
        return {k: (v if k == "appearance_embeddings"
                    else jax.tree_util.tree_map(padded, v))
                for k, v in tree.items()}

    params = padded_tree(params)
    adam = AdamState(mu=padded_tree(adam.mu), nu=padded_tree(adam.nu),
                     step=adam.step)
    aux = AuxState(*[padded(x) if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c else x
                     for x in aux])
    return params, adam, aux
