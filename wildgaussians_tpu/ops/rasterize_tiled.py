"""Tiled differentiable rasterizer: pure-XLA forward + hand-derived backward.

The production TPU formulation (SURVEY.md sections 2.3, 5): alpha compositing
is associative in (log T, premultiplied color) form, so each tile's
depth-sorted Gaussian list is processed in fixed-size chunks where

    l_k      = log(1 - alpha_k)                   (0 for skipped Gaussians)
    S_k      = prefix_sum(l)                       -> per-chunk cumsum
    T_k      = T_in * exp(S_{k-1})                 (exclusive transmittance)
    contrib  = alpha >= 1/255 & power <= 0 & T_in*exp(S_k) >= 1e-4 & ~done
    color   += (alpha * T_k * contrib)^T @ colors  -> MXU matmul

which reproduces the reference CUDA sequential loop exactly (forward.cu:
346-384 skip/cap/early-stop semantics; the stop test is monotone in k so the
sticky `done` flag only needs chunk granularity). The backward pass
(custom_vjp) re-runs the forward recurrence and forms the suffix-color dot
products from the saved output, accumulating per-Gaussian gradients with
deterministic scatter-adds — the TPU answer to the reference's atomicAdd
backward (backward.cu:435-606). The extra GOF |grad| densification channel
(backward.cu:593-595) is returned as the cotangent of a zero `absgrad_hook`
input.

Pixels are vectorized 256-wide per tile (8x128-friendly), Gaussians chunked;
tiles are processed in batches under lax.scan with a lax.while_loop over
chunks that exits early once every pixel in the batch saturates.
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
_HIGH = jax.lax.Precision.HIGHEST


class TileGrid(NamedTuple):
    width: int
    height: int
    tile_size: int
    grid_x: int
    grid_y: int

    @property
    def num_tiles(self):
        return self.grid_x * self.grid_y

    @property
    def pixels_per_tile(self):
        return self.tile_size * self.tile_size


def make_grid(width: int, height: int, tile_size: int = 16) -> TileGrid:
    return TileGrid(width, height, tile_size,
                    (width + tile_size - 1) // tile_size,
                    (height + tile_size - 1) // tile_size)


def _tile_pixel_coords(grid: TileGrid, tile_ids: jnp.ndarray):
    """Pixel centers for a batch of tiles: [B, P] x/y (float)."""
    ts = grid.tile_size
    oy = (tile_ids // grid.grid_x) * ts
    ox = (tile_ids % grid.grid_x) * ts
    ii = jnp.arange(ts * ts, dtype=jnp.int32)
    iy = ii // ts
    ix = ii % ts
    px = ox[:, None] + ix[None, :]
    py = oy[:, None] + iy[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _chunk_alpha(xy, con, op, em, px, py):
    """Per-chunk alpha and validity. Shapes: xy [B,K,2], con [B,K,3], op [B,K],
    em [B,K] entry mask, px/py [B,P]. Returns alpha, use [B,K,P]."""
    dx = xy[..., 0][:, :, None] - px[:, None, :]
    dy = xy[..., 1][:, :, None] - py[:, None, :]
    a = con[..., 0][:, :, None]
    b = con[..., 1][:, :, None]
    c = con[..., 2][:, :, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[:, :, None] * jnp.exp(power))
    use = em[:, :, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return alpha, use, dx, dy


def _gather_chunk(mean2d, conic, opacity, colors, sorted_gidx, starts, counts, c, K):
    """Gather chunk c of each tile's entry list. Returns attrs + mask [B,K]."""
    R = sorted_gidx.shape[0]
    offs = c * K + jnp.arange(K, dtype=jnp.int32)[None, :]
    e = starts[:, None] + offs
    em = offs < counts[:, None]
    g = sorted_gidx[jnp.clip(e, 0, R - 1)]
    return mean2d[g], conic[g], opacity[g], colors[g], em, g


def _blend_fwd_batch(mean2d, conic, opacity, colors, sorted_gidx,
                     starts, counts, px, py, K):
    """Forward compositing for one batch of tiles. Returns C [B,P,3], T [B,P]."""
    B, P = px.shape
    max_chunks = jax.lax.div(jnp.max(counts) + (K - 1), K)

    def cond(state):
        c, _C, _T, done = state
        return (c < max_chunks) & ~jnp.all(done)

    def body(state):
        c, C, T, done = state
        xy, con, op, col, em, _g = _gather_chunk(
            mean2d, conic, opacity, colors, sorted_gidx, starts, counts, c, K)
        alpha, use, _dx, _dy = _chunk_alpha(xy, con, op, em, px, py)
        l = jnp.where(use, jnp.log1p(-jnp.where(use, alpha, 0.0)), 0.0)
        S = jnp.cumsum(l, axis=1)
        T_at = T[:, None, :] * jnp.exp(S - l)
        alive = T[:, None, :] * jnp.exp(S) >= T_EPS
        contrib = use & alive & ~done[:, None, :]
        w = jnp.where(contrib, alpha * T_at, 0.0)
        C = C + jnp.einsum("bkp,bkc->bpc", w, col, precision=_HIGH)
        T = T * jnp.exp(jnp.sum(jnp.where(contrib, l, 0.0), axis=1))
        done = done | jnp.any(~alive & use, axis=1)
        return c + 1, C, T, done

    init = (jnp.int32(0),
            jnp.zeros((B, P, 3), jnp.float32),
            jnp.ones((B, P), jnp.float32),
            jnp.zeros((B, P), bool))
    _, C, T, _ = jax.lax.while_loop(cond, body, init)
    return C, T


def _blend_bwd_batch(mean2d, conic, opacity, colors, sorted_gidx,
                     starts, counts, px, py, K,
                     out_nobg, final_T, gC, gT_eff,
                     grads):
    """Backward for one tile batch; accumulates into `grads` pytree.

    gC: [B,P,3] cotangent of the (pre-background) color.
    gT_eff: [B,P] combined cotangent of final_T: g_finalT + dot(gC, bg).
    """
    B, P = px.shape
    max_chunks = jax.lax.div(jnp.max(counts) + (K - 1), K)
    out_dot_g = jnp.einsum("bpc,bpc->bp", out_nobg, gC, precision=_HIGH)

    def cond(state):
        c = state[0]
        return (c < max_chunks) & ~jnp.all(state[3])

    def body(state):
        c, T, acc_dot, done, grads = state
        (dmean2d, dconic, dopacity, dcolors, dabs) = grads
        xy, con, op, col, em, g = _gather_chunk(
            mean2d, conic, opacity, colors, sorted_gidx, starts, counts, c, K)
        alpha, use, dx, dy = _chunk_alpha(xy, con, op, em, px, py)
        l = jnp.where(use, jnp.log1p(-jnp.where(use, alpha, 0.0)), 0.0)
        S = jnp.cumsum(l, axis=1)
        T_at = T[:, None, :] * jnp.exp(S - l)
        alive = T[:, None, :] * jnp.exp(S) >= T_EPS
        contrib = use & alive & ~done[:, None, :]
        w = jnp.where(contrib, alpha * T_at, 0.0)          # [B,K,P]

        # c_k . g_p  -> [B,K,P] (the only cross term; an MXU matmul)
        cg = jnp.einsum("bkc,bpc->bkp", col, gC, precision=_HIGH)
        # prefix-inclusive sum of w*cg along k, offset by previous chunks
        wcg = w * cg
        prefix = jnp.cumsum(wcg, axis=1) + acc_dot[:, None, :]
        suffix = out_dot_g[:, None, :] - prefix            # sum_{j>k} w_j c_j . g
        one_m_a = jnp.where(use, 1.0 - alpha, 1.0)
        dalpha = jnp.where(
            contrib,
            T_at * cg - (suffix + gT_eff[:, None, :] * final_T[:, None, :]) / one_m_a,
            0.0)

        # d color: w^T @ g
        dcol_e = jnp.einsum("bkp,bpc->bkc", w, gC, precision=_HIGH)  # [B,K,3]

        capped = alpha >= ALPHA_MAX  # alpha was min'd: equality <=> cap active
        dalpha_eff = jnp.where(capped, 0.0, dalpha)
        # alpha = op * exp(power):  dop = e^p dalpha; dpower = alpha * dalpha
        epow = jnp.where(use, alpha / jnp.where(use, op[:, :, None], 1.0), 0.0)
        dop_e = jnp.sum(dalpha_eff * epow, axis=2)          # [B,K]
        dpower = dalpha_eff * alpha

        A = con[..., 0][:, :, None]
        Bc = con[..., 1][:, :, None]
        Cc = con[..., 2][:, :, None]
        dmx_pix = dpower * (-(A * dx + Bc * dy))            # [B,K,P]
        dmy_pix = dpower * (-(Cc * dy + Bc * dx))
        dmx = jnp.sum(dmx_pix, axis=2)
        dmy = jnp.sum(dmy_pix, axis=2)
        # separate |dx| / |dy| channels: the caller applies the reference's
        # per-axis NDC factors (0.5*W vs 0.5*H, backward.cu:593-595)
        dabs_e = jnp.stack([jnp.sum(jnp.abs(dmx_pix), axis=2),
                            jnp.sum(jnp.abs(dmy_pix), axis=2)], axis=-1)
        da = jnp.sum(dpower * (-0.5 * dx * dx), axis=2)
        db = jnp.sum(dpower * (-dx * dy), axis=2)
        dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=2)

        gm = jnp.where(em, g, mean2d.shape[0])  # out-of-range -> dropped by scatter
        dmean2d = dmean2d.at[gm].add(jnp.stack([dmx, dmy], -1), mode="drop")
        dconic = dconic.at[gm].add(jnp.stack([da, db, dc], -1), mode="drop")
        dopacity = dopacity.at[gm].add(dop_e, mode="drop")
        dcolors = dcolors.at[gm].add(jnp.where(em[..., None], dcol_e, 0.0), mode="drop")
        dabs = dabs.at[gm].add(jnp.where(em[..., None], dabs_e, 0.0), mode="drop")

        T = T * jnp.exp(jnp.sum(jnp.where(contrib, l, 0.0), axis=1))
        acc_dot = acc_dot + jnp.sum(wcg, axis=1)
        done = done | jnp.any(~alive & use, axis=1)
        return c + 1, T, acc_dot, done, (dmean2d, dconic, dopacity, dcolors, dabs)

    init = (jnp.int32(0), jnp.ones((B, P), jnp.float32),
            jnp.zeros((B, P), jnp.float32), jnp.zeros((B, P), bool), grads)
    _, _, _, _, grads = jax.lax.while_loop(cond, body, init)
    return grads


@functools.lru_cache(maxsize=32)
def _make_tile_blend(grid: TileGrid, K: int, batch_tiles: int):
    """Build the custom-vjp tile blend for a static grid/chunking config."""
    T_tiles = grid.num_tiles
    B = batch_tiles
    n_batches = (T_tiles + B - 1) // B
    T_pad = n_batches * B
    P = grid.pixels_per_tile

    def _padded_tiles():
        ids = np.arange(T_pad, dtype=np.int32)
        return np.minimum(ids, T_tiles - 1)  # clamp padding to a real tile

    tile_ids_np = _padded_tiles()

    def forward(mean2d, conic, opacity, colors, absgrad_hook,
                sorted_gidx, tile_starts, tile_counts, bg):
        del absgrad_hook
        tile_ids = jnp.asarray(tile_ids_np).reshape(n_batches, B)
        # zero out padded duplicate-tiles so they do no work
        pad_mask = (jnp.arange(T_pad, dtype=jnp.int32) < T_tiles).reshape(n_batches, B)
        counts_all = tile_counts[tile_ids] * pad_mask
        starts_all = tile_starts[tile_ids]

        def batch(_, inp):
            t_ids, starts, counts = inp
            px, py = _tile_pixel_coords(grid, t_ids)
            from ..parallel.mesh import shard_tiles
            px, py = shard_tiles(px), shard_tiles(py)
            C, T = _blend_fwd_batch(mean2d, conic, opacity, colors,
                                    sorted_gidx, starts, counts, px, py, K)
            return None, (shard_tiles(C), shard_tiles(T))

        _, (C, T) = jax.lax.scan(batch, None, (tile_ids, starts_all, counts_all))
        C = C.reshape(T_pad, P, 3)[:T_tiles]
        T = T.reshape(T_pad, P)[:T_tiles]
        C = C + T[..., None] * bg[None, None, :]
        return C, T

    @jax.custom_vjp
    def tile_blend(mean2d, conic, opacity, colors, absgrad_hook,
                   sorted_gidx, tile_starts, tile_counts, bg):
        return forward(mean2d, conic, opacity, colors, absgrad_hook,
                       sorted_gidx, tile_starts, tile_counts, bg)

    def fwd(mean2d, conic, opacity, colors, absgrad_hook,
            sorted_gidx, tile_starts, tile_counts, bg):
        C, T = forward(mean2d, conic, opacity, colors, absgrad_hook,
                       sorted_gidx, tile_starts, tile_counts, bg)
        res = (mean2d, conic, opacity, colors, sorted_gidx, tile_starts,
               tile_counts, bg, C, T)
        return (C, T), res

    def bwd(res, cot):
        (mean2d, conic, opacity, colors, sorted_gidx, tile_starts,
         tile_counts, bg, C_out, final_T) = res
        gC, gT = cot
        n = mean2d.shape[0]
        out_nobg = C_out - final_T[..., None] * bg[None, None, :]
        # combined final_T cotangent: direct + background path
        gT_eff = gT + jnp.einsum("tpc,c->tp", gC, bg, precision=_HIGH)

        tile_ids = jnp.asarray(tile_ids_np).reshape(n_batches, B)
        pad_mask = (jnp.arange(T_pad, dtype=jnp.int32) < T_tiles).reshape(n_batches, B)
        counts_all = tile_counts[tile_ids] * pad_mask
        starts_all = tile_starts[tile_ids]

        def pad_t(x, fill=0.0):
            pad = T_pad - T_tiles
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)], axis=0)

        out_b = pad_t(out_nobg).reshape(n_batches, B, P, 3)
        fT_b = pad_t(final_T, 1.0).reshape(n_batches, B, P)
        gC_b = pad_t(gC).reshape(n_batches, B, P, 3)
        gT_b = pad_t(gT_eff).reshape(n_batches, B, P)

        grads0 = (jnp.zeros((n, 2), jnp.float32), jnp.zeros((n, 3), jnp.float32),
                  jnp.zeros((n,), jnp.float32), jnp.zeros((n, 3), jnp.float32),
                  jnp.zeros((n, 2), jnp.float32))

        def batch(grads, inp):
            t_ids, starts, counts, onb, fT, gc, gt = inp
            px, py = _tile_pixel_coords(grid, t_ids)
            from ..parallel.mesh import shard_tiles
            px, py = shard_tiles(px), shard_tiles(py)
            grads = _blend_bwd_batch(mean2d, conic, opacity, colors, sorted_gidx,
                                     starts, counts, px, py, K,
                                     onb, fT, gc, gt, grads)
            return grads, None

        grads, _ = jax.lax.scan(
            batch, grads0,
            (tile_ids, starts_all, counts_all, out_b, fT_b, gC_b, gT_b))
        dmean2d, dconic, dopacity, dcolors, dabs = grads
        dbg = jnp.einsum("tpc,tp->c", gC, final_T, precision=_HIGH)
        zi = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dopacity, dcolors, dabs,
                zi(sorted_gidx), zi(tile_starts), zi(tile_counts), dbg)

    tile_blend.defvjp(fwd, bwd)
    return tile_blend


def tiles_to_image(tiles: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """[T, P(, C)] -> [H, W(, C)] crop."""
    ts = grid.tile_size
    ch = tiles.shape[2:]
    x = tiles.reshape(grid.grid_y, grid.grid_x, ts, ts, *ch)
    x = jnp.moveaxis(x, 2, 1).reshape(grid.grid_y * ts, grid.grid_x * ts, *ch)
    return x[:grid.height, :grid.width]


def image_to_tiles(img: jnp.ndarray, grid: TileGrid, fill=0.0) -> jnp.ndarray:
    """[H, W(, C)] -> [T, P(, C)] with padding."""
    ts = grid.tile_size
    ch = img.shape[2:]
    ph, pw = grid.grid_y * ts, grid.grid_x * ts
    img = jnp.pad(img, ((0, ph - img.shape[0]), (0, pw - img.shape[1]))
                  + ((0, 0),) * len(ch), constant_values=fill)
    x = img.reshape(grid.grid_y, ts, grid.grid_x, ts, *ch)
    x = jnp.moveaxis(x, 1, 2).reshape(grid.num_tiles, ts * ts, *ch)
    return x


def rasterize_tiled(mean2d, conic, opacity, colors, absgrad_hook,
                    sorted_gidx, tile_starts, tile_counts, bg,
                    *, grid: TileGrid, chunk: int = 256, batch_tiles: int = 64):
    """Blend pre-binned Gaussians into an image.

    Returns (color [H,W,3] with background, final_T [H,W]).
    Gradients: mean2d, conic, opacity, colors, bg; `absgrad_hook` ([N,2]
    zeros) receives the GOF absolute-gradient channels (sum|d/dx|, sum|d/dy|)
    as its cotangent.
    """
    blend = _make_tile_blend(grid, chunk, batch_tiles)
    C, T = blend(mean2d, conic, opacity, colors, absgrad_hook,
                 sorted_gidx, tile_starts, tile_counts, bg)
    return tiles_to_image(C, grid), tiles_to_image(T, grid)
