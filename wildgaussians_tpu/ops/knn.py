"""Mean squared distance to the 3 nearest neighbors (init-time statistic).

TPU-native equivalent of simple-knn's distCUDA2 (simple_knn.cu:185-221, used
once per run at method.py:1001-1002 to seed initial scales). The CUDA version
Morton-sorts and does a windowed + box-rejection search; here we Morton-sort
with lax.sort and scan a +/-W sorted window — same spatial-locality idea,
expressed as fixed-shape vectorized ops. Exactness is not required (it only
seeds log-scales); window 48 gives near-exact results on real point clouds.
"""
import functools

import jax
import jax.numpy as jnp


def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits over 30 (Morton encoding), uint32."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """10-bit-per-axis Morton codes (cf. coord2Morton, simple_knn.cu:45-70)."""
    mn = points.min(axis=0)
    mx = points.max(axis=0)
    rel = (points - mn) / jnp.maximum(mx - mn, 1e-12)
    q = jnp.clip((rel * 1023.0), 0, 1023).astype(jnp.uint32)
    return (_expand_bits_10(q[:, 0])
            | (_expand_bits_10(q[:, 1]) << 1)
            | (_expand_bits_10(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("window", "k"))
def mean_knn_dist2(points: jnp.ndarray, window: int = 48, k: int = 3) -> jnp.ndarray:
    """[N,3] -> [N] mean of squared distances to the k nearest neighbors,
    searched within a +/-window band of the Morton order."""
    n = points.shape[0]
    codes = morton_codes(points)
    _, order = jax.lax.sort((codes, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    sorted_pts = points[order]

    offsets = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])

    def best_for(i):
        raw = i + offsets
        idx = jnp.clip(raw, 0, n - 1)
        cand = sorted_pts[idx]
        d2 = jnp.sum((cand - sorted_pts[i]) ** 2, axis=-1)
        # boundary-clipped slots duplicate real candidates -> exclude them
        d2 = jnp.where((idx == i) | (raw != idx), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top)

    out_sorted = jax.lax.map(best_for, jnp.arange(n, dtype=jnp.int32),
                             batch_size=4096)
    out = jnp.zeros((n,), points.dtype).at[order].set(out_sorted)
    return out
