"""Pallas TPU tile-blend kernels (production fast path).

Same math as rasterize_tiled.py (prefix sums in log-transmittance space), but
the per-chunk working set lives in VMEM instead of round-tripping HBM:

  - grid = one program per 16x16 tile; per-tile entry (start, count) via
    scalar prefetch, contiguous dynamic-slice DMA of the depth-sorted entry
    table (the analogue of the CUDA kernel's cooperative shared-memory
    staging, forward.cu:316-343)
  - layout: pixels (256) ride the sublane axis, chunk Gaussians (K=256) the
    lane axis, so the entry-table DMA slices are lane-aligned; the inclusive
    prefix-sum of log(1-alpha) along the chunk is an upper-triangular matmul
    on the MXU, and color accumulation a [P,K]x[K,3] matmul
  - per-tile early exit (T < 1e-4 everywhere) via a while loop over chunks
  - backward: per-entry gradients written contiguously (no atomics; each
    sorted entry belongs to exactly one tile), then reduced to per-Gaussian
    values — replacing backward.cu's atomicAdd

Two binning strategies feed these kernels:
  - "partition" (production, _make_partition_blend_vjp): depth presort +
    stable radix partitions from ops/partition.py; the backward un-permutes
    per-entry gradients with the exact inverse partition.
  - "sort" (_make_pallas_blend_vjp, kept for A/B): one wide lax.sort with
    attributes as payloads; the backward re-sorts gradients by slot index.

Entry table layouts (f32-typed; u32 rows ride as bit patterns):
  - packed (sort path, pack16=True, production): row 0 = f16 pair
    (x_rel, y_rel) wrt the entry's tile origin, rows 1-3 conic f32, then per
    color pass two f16-pair rows (r,g) and (b, opacity|unused). f16 keeps
    relative precision, which matches conic's 1/sigma^2 scaling: blend-power
    error stays ~1e-3 across footprint sizes, and the sort moves 8 rows
    instead of 11.
  - unpacked (pack16=False exact-parity mode; partition/gather paths, with
    optional leading key rows): x, y, conic_a, conic_b, conic_c, opacity,
    then r, g, b per color pass.
Slot layout is CELL-MAJOR: tier-1 slot (cell j, gaussian g) = j * n + g, so
payload expansion is a leading-axis broadcast (no relayout) and the backward
slot reduction reshape is layout-free.
Per-entry gradient values (f16-pair rows, sequential):
dmx, dmy, da, db, dc, dop, dabsx, dabsy, then r,g,b per color pass.
Multi-pass rendering is FUSED (round 3): one kernel traversal blends and
back-propagates every color pass (raw / appearance-toned / depth share the
alpha/transmittance recurrence; final_T is shared). Forward output is
packed [T, 256, OW]: pass-i colors at cols [3i:3i+3], final_T at col
3*n_passes (OW = 4*n_passes rounded up to 8).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_tiled import (ALPHA_MAX, ALPHA_MIN, T_EPS, TileGrid,
                              tiles_to_image)

P_PIX = 256  # 16x16 tile
ATTR_W = 16
GRAD_W = 8   # backward grad rows when packed in-kernel (6 used + pad)
_HIGH = jax.lax.Precision.HIGHEST

# Experiment knob (WG_TRIU_BF16=1): run the in-kernel prefix matmuls with
# bf16 operands (1 MXU pass) instead of f32. Measures how much of the
# kernel time is MXU passes; NOT a production default — bf16 log-space
# prefixes cost ~0.4% relative error on transmittance.
import os as _os
_TRIU_BF16 = _os.environ.get("WG_TRIU_BF16", "0") == "1"
# Experiment knob (WG_MXU_POWER=1): evaluate the forward quadratic as a
# [P,6]x[6,K] pixel-basis power matmul instead of the elementwise VPU
# dx/dy chain. MEASURED WORSE on v5e (198.6 vs 182.8 ms/step at bench
# scale): the per-chunk [6,K] coefficient concat + 6-pass HIGHEST matmul
# costs more than the ~10 fused VPU ops it removes. Kept off as a recorded
# negative result (round 3).
_MXU_POWER = _os.environ.get("WG_MXU_POWER", "0") == "1"
# Entry-DMA pipeline depth (round-4 roofline experiment): per-chunk compute
# (~256 entries x 256 px of VPU work) is close to the [8-16, 256] DMA's
# latency, so a 2-deep pipeline stalls on every other chunk; 4-deep keeps
# the DMA engine ahead. VMEM cost: NBUF x table_w x K x 4 B (~32 KB).
_NBUF = max(int(_os.environ.get("WG_NBUF", "4")), 2)
# Backward banded-parallel grid (round 4, VERDICT r3 #8): number of
# independent tile bands the bwd kernel's OUTER grid dim exposes to
# megacore scheduling. 1 = historical fully-sequential grid. Free on
# 1-TensorCore v5e; megacore v4/v5p parts get 2 by default via platform
# detection (round 5, VERDICT r4 weak #6 — an env-only default would
# silently leave megacore half idle). WG_BWD_BANDS overrides either way.
# Correctness is mesh/interpret-tested
# (test_rasterize_pallas.py::test_bwd_banded_*).
_MEGACORE_KINDS = ("v4", "v5p")


def _bwd_bands() -> int:
    env = _os.environ.get("WG_BWD_BANDS")
    if env is not None:
        return max(int(env), 1)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 1
    return 2 if any(k in kind for k in _MEGACORE_KINDS) else 1


def _prefix_dot(l, triu):
    if _TRIU_BF16:
        return jax.lax.dot(l.astype(jnp.bfloat16), triu.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    return jnp.dot(l, triu, preferred_element_type=jnp.float32)


def _f16_bits(x):
    """f32 -> f16 bit pattern (low 16 of a u32), round-to-nearest-even,
    subnormals preserved, overflow saturated to f16 max.

    Pure 32-bit integer ops: XLA TPU lowers 16-bit dtype conversions to
    per-row relayout loops (~0.8 ms per 1.5M-row at bench scale, measured);
    this fuses into neighbouring elementwise work instead.

    Subnormal support is load-bearing: the backward un-sort packs per-ENTRY
    gradients, whose magnitudes routinely sit in f16's subnormal range
    [2^-24, 2^-14); flushing them loses up to 25% of a summed per-Gaussian
    gradient (measured on the FD-gradcheck scene). For |x| <= 2^-14 the f16
    encoding is exactly round(|x| * 2^24), which also covers the
    subnormal->normal boundary."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (b >> 16) & jnp.uint32(0x8000)
    absb = b & jnp.uint32(0x7FFFFFFF)
    lsb = (absb >> 13) & jnp.uint32(1)
    r = absb + jnp.uint32(0xFFF) + lsb
    exp = r >> 23
    h = ((r - jnp.uint32(112 << 23)) >> 13) & jnp.uint32(0x7FFF)
    sub = jax.lax.round(
        jax.lax.abs(x) * 16777216.0,
        jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.uint32)
    h = jnp.where(exp < 113, sub,
                  jnp.where(exp > 142, jnp.uint32(0x7BFF), h))
    return sign | h


def _pack2_f16(hi, lo):
    """Pack two f32 rows into one u32 row of f16 pairs (XLA level)."""
    return (_f16_bits(hi) << 16) | _f16_bits(lo)


def _f16_bits_k(x):
    """_f16_bits for INSIDE kernels: same encoding, Mosaic-safe ops.

    Differences from the XLA version: the subnormal round is
    floor(|x|*2^24 + 0.5) (round-half-up; Mosaic has no round-to-even
    primitive — the <=2^-25 tie difference is far below the grad-sum noise
    floor), |x| is clamped before the f32->int convert so every lane's
    convert is in-range, and the int cast goes through s32 (u32 converts
    are less uniformly supported in Mosaic)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (b >> 16) & jnp.uint32(0x8000)
    absb = b & jnp.uint32(0x7FFFFFFF)
    lsb = (absb >> 13) & jnp.uint32(1)
    r = absb + jnp.uint32(0xFFF) + lsb
    exp = r >> 23
    h = ((r - jnp.uint32(112 << 23)) >> 13) & jnp.uint32(0x7FFF)
    xa = jnp.minimum(jnp.abs(x), 2.0 ** -14)
    sub = jnp.floor(xa * 16777216.0 + 0.5).astype(jnp.int32).astype(jnp.uint32)
    h = jnp.where(exp < 113, sub,
                  jnp.where(exp > 142, jnp.uint32(0x7BFF), h))
    return sign | h


def _pack2_f16_k(hi, lo):
    """In-kernel f16-pair pack; result bitcast to f32 for f32 buffers."""
    word = (_f16_bits_k(hi) << 16) | _f16_bits_k(lo)
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _f16_bits_to_f32(h):
    """Decode f16 bits (low 16 of a u32 vector) to f32 inside a kernel.

    Mosaic has no 16-bit vector bitcasts, so widen manually: f32 exponent =
    f16 exponent + 112. Subnormals decode exactly as mant * 2^-24 (see
    _f16_bits for why they matter); inf/nan bit patterns decode to large
    finite floats (harmless: they only occur on masked lanes)."""
    sign = (h & jnp.uint32(0x8000)) << 16
    expmant = h & jnp.uint32(0x7FFF)
    bits = sign | ((expmant + jnp.uint32(112 << 10)) << 13)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    # s32->f32 convert (expmant < 2^15 so the signed cast is exact); u32
    # converts are less uniformly supported in Mosaic
    sub = expmant.astype(jnp.int32).astype(jnp.float32) * (2.0 ** -24)
    sub = jnp.where(sign > 0, -sub, sub)
    return jnp.where(expmant < jnp.uint32(0x0400), sub, val)


def _unpack_row(entries, r):
    """Split packed row r of an f32-typed table into (hi, lo) f32 rows."""
    w = jax.lax.bitcast_convert_type(entries[r:r + 1, :], jnp.uint32)
    return _f16_bits_to_f32(w >> 16), _f16_bits_to_f32(w & jnp.uint32(0xFFFF))


# rgb10 color packing (pack-v2 fwd layout, round 4): one u32 row carries a
# whole RGB triple at 10-bit fixed point over [-0.5, 1.5) (step 1/512,
# max rounding error ~1e-3 — the same order as the f16 color rows it
# replaces at 1.0). Cuts the fwd sort payload from 2 rows/color-pass to 1:
# the flat lax.sort's measured marginal is ~5.5 ms per consumed u32 row at
# bench scale (tools/profiles/probe_sortdesign.py), the single biggest
# per-row lever left after round 3. Callers must deliver colors in
# [-0.5, 1.5) — raw/toned SH colors are clamped there by construction
# (renderer caps features at 1.0); the depth pass normalizes by its max
# (models/renderer.py) since compositing is linear in color.
_RGB10_LO = -0.5
_RGB10_SCALE = 512.0


def _pack_rgb10(r, g, b):
    """XLA-side [-0.5,1.5) -> u32 (r | g<<10 | b<<20), saturating."""
    def enc(c):
        q = jnp.clip(jax.lax.round((c - _RGB10_LO) * _RGB10_SCALE,
                                   jax.lax.RoundingMethod.TO_NEAREST_EVEN),
                     0.0, 1023.0)
        return q.astype(jnp.int32).astype(jnp.uint32)
    return enc(r) | (enc(g) << 10) | (enc(b) << 20)


def _unpack_rgb10(entries, r):
    """Kernel-side decode of an rgb10 row -> [3, K] f32 colors."""
    w = jax.lax.bitcast_convert_type(entries[r:r + 1, :], jnp.uint32)

    def dec(shift):
        q = ((w >> shift) & jnp.uint32(1023)).astype(jnp.int32)
        return q.astype(jnp.float32) * (1.0 / _RGB10_SCALE) + _RGB10_LO
    return jnp.concatenate([dec(0), dec(10), dec(20)], axis=0)


def _triu(K):
    """Upper-triangular ones [K,K]: l @ triu = inclusive prefix along lanes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (rows <= cols).astype(jnp.float32)


def _pixel_coords(grid: TileGrid, t, *, local=False):
    """Pixel coordinates of tile t — absolute, or tile-local when the entry
    table stores tile-relative means (packed layout)."""
    ts = grid.tile_size
    ii = jax.lax.broadcasted_iota(jnp.int32, (P_PIX, 1), 0)
    if local:
        return (ii % ts).astype(jnp.float32), (ii // ts).astype(jnp.float32)
    ox = (t % grid.grid_x) * ts
    oy = (t // grid.grid_x) * ts
    px = (ox + ii % ts).astype(jnp.float32)
    py = (oy + ii // ts).astype(jnp.float32)
    return px, py


def _chunk_fwd_math(entries, px, py, em, t_carry, stopped_f, triu, a0=0,
                    packed=False, pix_basis=None, need_dxdy=True):
    """Forward recurrence for one chunk. entries [ATTR_W, K]; returns [P,K]
    tensors + per-pixel [P,1] carries. `stopped_f` is a 0/1 float mask
    (Mosaic cannot carry i1 vectors through scf.while). `a0` is the row of
    the first geometry attribute (1 for partition-built tables whose row 0
    is the sort key). With `packed`, the table is the f16-pair layout (see
    _sort_entries): row 0 = (x_rel, y_rel) wrt the tile origin (px/py must
    then be tile-local), rows 1-3 conic f32, row 5 lo half = opacity.

    With `pix_basis` ([P,6] = [1,px,py,px^2,px*py,py^2]) the quadratic
    power(p,k) = -0.5*ca*dx^2 - cb*dx*dy - 0.5*cc*dy^2 is evaluated as ONE
    [P,6]x[6,K] MXU matmul of per-entry polynomial coefficients against the
    shared pixel basis, replacing the ~10 [P,K] VPU ops of the dx/dy chain
    (the kernels are VPU-bound; transcendentals + this chain dominate).
    Tile-LOCAL coords keep every expansion term < ~2.5e3 so the f32
    residual at power ~ 0 is < ~1e-4; `use` therefore accepts
    power <= POWER_EPS and exp() clamps to 0 — the same measure-zero
    boundary forward.cu:356's `power > 0 -> skip` rides. `need_dxdy=False`
    skips materializing dx/dy (forward kernel; the backward needs them for
    the per-pixel |grad| channels)."""
    if packed:
        # pack-v2 rows: 0 = (x_rel, y_rel); 1 = (ca, cc) — the diagonal
        # conic terms are positive with f16-friendly range (1e-4..11 =
        # 1/sigma^2 over 0.3..100 px footprints; 5e-4 rel error ~ the xy
        # f16 budget); 2 = (cb, op) — cb's f16 relative error enters power
        # through the SAME |cb dx dy| term budget as ca/cc's (round-4
        # parity drive: on-chip fwd max vs tiled unchanged at ~8e-3);
        # 3+i = rgb10 per color pass
        x, y = _unpack_row(entries, 0)
        ca, cc = _unpack_row(entries, 1)
        cb, op = _unpack_row(entries, 2)
    else:
        x = entries[a0:a0 + 1, :]
        y = entries[a0 + 1:a0 + 2, :]
        ca = entries[a0 + 2:a0 + 3, :]
        cb = entries[a0 + 3:a0 + 4, :]
        cc = entries[a0 + 4:a0 + 5, :]
        op = entries[a0 + 5:a0 + 6, :]
    if pix_basis is not None:
        # coefficients of power as a polynomial in (px, py), [6,K]
        coef = jnp.concatenate(
            [-0.5 * ca * x * x - cb * x * y - 0.5 * cc * y * y,
             ca * x + cb * y,
             cb * x + cc * y,
             -0.5 * ca,
             -cb,
             -0.5 * cc], axis=0)
        power = jax.lax.dot_general(pix_basis, coef, (((1,), (0,)), ((), ())),
                                    precision=_HIGH,
                                    preferred_element_type=jnp.float32)
        e = jnp.exp(jnp.minimum(power, 0.0))
        dx = x - px if need_dxdy else None
        dy = y - py if need_dxdy else None
    else:
        dx = x - px                     # [P,K]
        dy = y - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        e = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * e)
    power_eps = 1e-4 if pix_basis is not None else 0.0
    use = em & (power <= power_eps) & (alpha >= ALPHA_MIN)
    l = jnp.where(use, jnp.log1p(-jnp.where(use, alpha, 0.0)), 0.0)
    S = _prefix_dot(l, triu)   # inclusive
    # exclusive transmittance via exp(S)/(1-alpha): one [P,K] exp + a
    # reciprocal instead of two exps (transcendentals dominate the VPU cost
    # here); rinv is reused by the backward's dalpha chain, saving its
    # divide
    t_inc = t_carry * jnp.exp(S)
    rinv = 1.0 / jnp.where(use, 1.0 - alpha, 1.0)
    t_at = t_inc * rinv
    alive = t_inc >= T_EPS
    contrib = use & alive & (stopped_f < 0.5)
    w = jnp.where(contrib, alpha * t_at, 0.0)
    new_t = t_carry * jnp.exp(
        jnp.sum(jnp.where(contrib, l, 0.0), axis=1, keepdims=True))
    new_stopped = jnp.maximum(
        stopped_f,
        jnp.max(jnp.where(use & jnp.logical_not(alive), 1.0, 0.0),
                axis=1, keepdims=True))
    # pix_basis boundary band (ADVICE r3): `use` accepts power <= 1e-4 but
    # e clamps the exp at power = 0, so lanes in (0, 1e-4] have ZERO local
    # d(e)/d(power) — the backward must gate dpower there to match
    dpower_gate = (jnp.where(power > 0.0, 0.0, 1.0)
                   if pix_basis is not None else None)
    return dict(dx=dx, dy=dy, x=x, y=y, alpha=alpha, e=e, use=use, l=l,
                t_at=t_at, rinv=rinv, contrib=contrib, w=w, new_t=new_t,
                new_stopped=new_stopped, dpower_gate=dpower_gate)


def _chunk_dma(entries_hbm, ebuf, sem, start, c, K, slot):
    off = pl.multiple_of(start + c * K, 128)
    return pltpu.make_async_copy(
        entries_hbm.at[:, pl.ds(off, K)], ebuf.at[slot], sem.at[slot])


def _read_colors(entries, col0, packed):
    if not packed:
        return entries[col0:col0 + 3, :]
    return _unpack_rgb10(entries, col0)                          # [3,K]


def _out_width(n_passes: int) -> int:
    """Fused fwd/bwd pack width: 3 color cols per pass + per-pass scalar
    col (final_T / gt_eff), 8-aligned. n_passes=1 keeps the historical
    [.., 8] layout (color 0:3, T at 3)."""
    return max(((4 * n_passes + 7) // 8) * 8, 8)


def _grad_rows(n_passes: int) -> int:
    """Real packed-gradient values: 7 geo (dmx,dmy,dca,dcb,dcc,dop + ONE
    fused NDC-abs channel — round 4 folded the reference's two |dx|/|dy|
    axes into sx*|dx|+sy*|dy| in-kernel, backward.cu:593-595 semantics,
    saving a u32 row of un-sort traffic) + 3 colors per pass."""
    return 7 + 3 * n_passes


def _grad_width(n_passes: int) -> int:
    """Fused in-kernel-packed gradient rows as f16 pairs, 8-aligned
    (Mosaic sublane alignment for the DMA blocks)."""
    used = (_grad_rows(n_passes) + 1) // 2
    return max(((used + 7) // 8) * 8, 8)


def _fwd_kernel(tbase_ref, ndc_ref, starts_ref, counts_ref, entries_hbm, out_pack,
                ebuf, sem,
                *, grid: TileGrid, K: int, col0s: tuple = (6,), a0: int = 0,
                packed: bool = False, planar_out: bool = False):
    """Fused multi-pass tile blend: ALL color passes (raw / appearance-toned
    / depth, reference method.py:1573-1631) share ONE traversal — the
    alpha/transmittance recurrence (the expensive VPU part) is computed
    once, each extra pass adds one color read + one [P,K]x[K,3] matmul.
    Output layout: pass i colors at cols [3i:3i+3], final_T at col
    3*n_passes (shared across passes — identical geometry)."""
    np_ = len(col0s)
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    gt = t + tbase_ref[0]      # global tile id (sharded: shard-local t)
    # tile ranges are NOT aligned; DMA from the 128-aligned floor and mask the
    # foreign head/tail entries (they belong to neighbouring tiles)
    astart = (start // 128) * 128
    shift = start - astart
    px, py = _pixel_coords(grid, gt, local=packed)
    triu = _triu(K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n_chunks = pl.cdiv(shift + count, K)
    # pixel basis for the MXU power matmul (packed tables: tile-local coords)
    pix_basis = jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py],
        axis=1) if (packed and _MXU_POWER) else None

    for j in range(_NBUF - 1):
        @pl.when(j < n_chunks)
        def _(j=j):
            _chunk_dma(entries_hbm, ebuf, sem, astart, j, K, j % _NBUF).start()

    def cond(state):
        # Early exit when EVERY pixel has latched `stopped` (its T crossed
        # below T_EPS), mirroring forward.cu:367-372's
        # __syncthreads_count(done). NOT `max(t_carry) < T_EPS`: the
        # crossing entry is excluded from the product (alive gates on
        # post-T), so per-pixel T freezes just ABOVE T_EPS and a
        # t_carry-based test can never fire (round-5 finding — the exit
        # had been structurally dead in both kernels).
        c, _color, _t_carry, stopped = state
        return (c < n_chunks) & (jnp.min(stopped) < 0.5)

    def body(state):
        c, color, t_carry, stopped = state
        slot = jax.lax.rem(c, _NBUF)
        _chunk_dma(entries_hbm, ebuf, sem, astart, c, K, slot).wait()

        @pl.when(c + _NBUF - 1 < n_chunks)
        def _():
            nxt = c + _NBUF - 1
            _chunk_dma(entries_hbm, ebuf, sem, astart, nxt, K,
                       jax.lax.rem(nxt, _NBUF)).start()

        entries = ebuf[slot]
        pos = c * K + kidx - shift
        em = (pos >= 0) & (pos < count)
        st = _chunk_fwd_math(entries, px, py, em, t_carry, stopped, triu, a0,
                             packed, pix_basis, need_dxdy=False)
        color = color + jnp.concatenate(
            [jax.lax.dot_general(
                st["w"], _read_colors(entries, c0, packed),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [P,3]
             for c0 in col0s], axis=1)                           # [P,3*np]
        return c + 1, color, st["new_t"], st["new_stopped"]

    init = (jnp.int32(0),
            jnp.zeros((P_PIX, 3 * np_), jnp.float32),
            jnp.ones((P_PIX, 1), jnp.float32),
            jnp.zeros((P_PIX, 1), jnp.float32))
    c_fin, color, t_carry, stopped_fin = jax.lax.while_loop(cond, body, init)

    # drain the prefetches left outstanding by an early exit (up to
    # _NBUF - 1 chunks ahead were started)
    for j in range(_NBUF - 1):
        @pl.when(c_fin + j < n_chunks)
        def _(j=j):
            _chunk_dma(entries_hbm, ebuf, sem, astart, c_fin + j, K,
                       jax.lax.rem(c_fin + j, _NBUF)).wait()

    ow = _out_width(np_)
    # saturation telemetry in the free column 3*np+1 (cols [0,3np) =
    # colors, 3np = final_T): the chunk index where the early exit fired,
    # or -1 if the tile never saturated. The caller maps it to a per-tile
    # saturation DEPTH via the sorted key row and feeds the next step's
    # pre-sort cull (round 5, VERDICT r4 weak #1: early exit cannot shrink
    # the sorts — this breadcrumb lets the binning drop what the walk
    # would never reach).
    saturated = jnp.min(stopped_fin) > 0.5
    satv = jnp.where(saturated, c_fin.astype(jnp.float32), -1.0)
    pack = jnp.concatenate(
        [color, t_carry,
         jnp.broadcast_to(satv.reshape(1, 1), (P_PIX, 1)),
         jnp.zeros((P_PIX, ow - 3 * np_ - 2), jnp.float32)], axis=1)
    if planar_out:
        # channel-major [OW, P] block of a [T, OW, P] array: downstream
        # XLA then works on lane-256 rows instead of a lane-8 minor dim
        # (the [T, P, OW] layout costs ~4 ms of relayout per 0.92 Mpix
        # frame in the static viewer path — measured round 4)
        out_pack[0, :, :] = pack.T
    else:
        out_pack[0, :, :] = pack


def _bwd_kernel_banded(tbase_ref, ndc_ref, starts_ref, counts_ref,
                       entries_hbm, cot_pack, fwd_pack, egrad_init_hbm,
                       egrad_hbm, stage_ref, ebuf, gbuf, hbuf, sem, sem2,
                       sem3, **kw):
    del egrad_init_hbm   # zero base aliased INTO egrad_hbm by the caller
    return _bwd_kernel_impl(tbase_ref, ndc_ref, starts_ref, counts_ref,
                            entries_hbm, cot_pack, fwd_pack, egrad_hbm,
                            stage_ref, ebuf, gbuf, hbuf, sem, sem2, sem3,
                            **kw)


def _bwd_kernel(tbase_ref, ndc_ref, starts_ref, counts_ref, entries_hbm,
                cot_pack, fwd_pack, egrad_hbm, ebuf, gbuf, hbuf, sem, sem2,
                sem3, **kw):
    return _bwd_kernel_impl(tbase_ref, ndc_ref, starts_ref, counts_ref,
                            entries_hbm, cot_pack, fwd_pack, egrad_hbm,
                            None, ebuf, gbuf, hbuf, sem, sem2, sem3, **kw)


def _bwd_kernel_impl(tbase_ref, ndc_ref, starts_ref, counts_ref, entries_hbm,
                     cot_pack, fwd_pack, egrad_hbm, stage_ref, ebuf, gbuf,
                     hbuf, sem, sem2, sem3,
                     *, grid: TileGrid, K: int, col0s: tuple = (6,),
                     a0: int = 0,
                     packed: bool = False, grad_packed: bool = False,
                     bands: int = 1, t_band: int = 0):
    """Fused multi-pass backward: one traversal recomputes the forward
    recurrence ONCE; per pass only the color contraction / prefix / dcol
    differ, and their dalpha contributions are linear so they sum into a
    single gradient chain. cot/fwd packs use the _fwd_kernel layout (pass-i
    cols [3i:3i+3]; col 3*np = per-pass gt_eff in cot, shared final_T in
    fwd ... cot gt_eff of pass i sits at col 3*np + i)."""
    np_ = len(col0s)
    if bands > 1:
        # Banded-parallel grid (round 4): megacore cores each walk a
        # CONTIGUOUS tile band sequentially. egrad is ZERO-INITIALIZED
        # (input/output aliasing in the caller), and each band's writes
        # that would CROSS into the next band's 128-aligned head region
        # (at most two 256-chunks, at lattice offsets na-128 and na, na =
        # floor128(next band's first start)) are em-MASKED into a
        # band-private [GW, 512] stage window instead of egrad. Because
        # every egrad/stage write is em-masked per entry and the base is
        # zeros, the caller's pass 2 is ONE unconditional dynamic-slice
        # ADD of each stage window at na-128 — no boundary arithmetic.
        b = pl.program_id(0)
        i = pl.program_id(1)
        t = b * t_band + i
        next_na = (starts_ref[jnp.minimum(b + 1, bands - 1) * t_band]
                   // 128) * 128
    else:
        b = jnp.int32(0)
        i = t = pl.program_id(0)
        next_na = jnp.int32(0)
    start = starts_ref[t]
    count = counts_ref[t]
    gt = t + tbase_ref[0]      # global tile id (sharded: shard-local t)
    astart = (start // 128) * 128
    shift = start - astart
    px, py = _pixel_coords(grid, gt, local=packed)
    triu = _triu(K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n_chunks = pl.cdiv(shift + count, K)

    def _staged(c):
        if bands == 1:
            return jnp.bool_(False)
        return (b < bands - 1) & (astart + (c + 1) * K > next_na)

    if bands > 1:
        @pl.when(i == 0)
        def _():
            stage_ref[0, :, :] = jnp.zeros_like(stage_ref[0])
    # pixel-basis for the packed-mode moment matmul (see grad block below)
    pix_basis = jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1)

    for j in range(_NBUF - 1):
        @pl.when(j < n_chunks)
        def _(j=j):
            _chunk_dma(entries_hbm, ebuf, sem, astart, j, K, j % _NBUF).start()

    @pl.when(n_chunks > 0)
    def _():
        # head block may hold the previous tile's tail gradients (written
        # earlier; the within-band grid is sequential): fetch them for the
        # chunk-0 merge. A STAGED chunk 0 must not merge egrad content
        # (it would duplicate direct writes through the pass-2 add).
        @pl.when((shift > 0) & jnp.logical_not(_staged(0)))
        def _():
            pltpu.make_async_copy(
                egrad_hbm.at[:, pl.ds(pl.multiple_of(astart, 128), K)],
                hbuf, sem3).start()

    gcs = [cot_pack[0, :, 3 * i:3 * i + 3] for i in range(np_)]  # [P,3] each
    gt_effs = [cot_pack[0, :, 3 * np_ + i:3 * np_ + i + 1]
               for i in range(np_)]                              # [P,1] each
    final_t = fwd_pack[0, :, 3 * np_:3 * np_ + 1]                # shared
    gte_sum = gt_effs[0]
    for ge in gt_effs[1:]:
        gte_sum = gte_sum + ge
    # per-pass total of out_nobg . gc (suffix base)
    out_dot_gs = [jnp.sum(fwd_pack[0, :, 3 * i:3 * i + 3] * gcs[i],
                          axis=1, keepdims=True) for i in range(np_)]

    def cond(state):
        # all-pixels-stopped exit, identical to the forward kernel's (the
        # skipped tail's gradients are exactly zero: contrib=0 for stopped
        # pixels) — see _fwd_kernel.cond for why t_carry can never test
        # below T_EPS
        c, _t_carry, _acc, stopped = state
        return (c < n_chunks) & (jnp.min(stopped) < 0.5)

    def body(state):
        c, t_carry, acc_dot, stopped = state
        slot = jax.lax.rem(c, _NBUF)
        _chunk_dma(entries_hbm, ebuf, sem, astart, c, K, slot).wait()

        @pl.when(c + _NBUF - 1 < n_chunks)
        def _():
            nxt = c + _NBUF - 1
            _chunk_dma(entries_hbm, ebuf, sem, astart, nxt, K,
                       jax.lax.rem(nxt, _NBUF)).start()

        entries = ebuf[slot]
        pos = c * K + kidx - shift
        em = (pos >= 0) & (pos < count)
        st = _chunk_fwd_math(entries, px, py, em, t_carry, stopped, triu, a0,
                             packed,
                             pix_basis if (packed and _MXU_POWER) else None)
        dx, dy, alpha, use, w = st["dx"], st["dy"], st["alpha"], st["use"], st["w"]

        # per-pass color contractions; their dalpha contributions are
        # linear, so only the SUMS feed the (expensive) shared grad chain
        cg_sum = None          # sum_i gc_i . col_i            [P,K]
        sfx_sum = None         # sum_i (out_dot_g_i - prefix_i) [P,K]
        dcols = []             # per-pass [3,K]
        acc_new = []
        for i in range(np_):
            col = _read_colors(entries, col0s[i], packed)            # [3,K]
            cg = jnp.dot(gcs[i], col, preferred_element_type=jnp.float32)
            wcg = w * cg
            prefix = _prefix_dot(wcg, triu) + acc_dot[:, i:i + 1]
            sfx = out_dot_gs[i] - prefix
            cg_sum = cg if cg_sum is None else cg_sum + cg
            sfx_sum = sfx if sfx_sum is None else sfx_sum + sfx
            dcols.append(jax.lax.dot_general(
                gcs[i], w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            acc_new.append(acc_dot[:, i:i + 1]
                           + jnp.sum(wcg, axis=1, keepdims=True))
        dalpha = jnp.where(
            st["contrib"],
            st["t_at"] * cg_sum
            - (sfx_sum + gte_sum * final_t) * st["rinv"],
            0.0)
        dalpha_eff = jnp.where(alpha >= ALPHA_MAX, 0.0, dalpha)
        if packed:
            ca, cc = _unpack_row(entries, 1)
            cb, op = _unpack_row(entries, 2)
        else:
            op = entries[a0 + 5:a0 + 6, :]
            ca = entries[a0 + 2:a0 + 3, :]
            cb = entries[a0 + 3:a0 + 4, :]
            cc = entries[a0 + 4:a0 + 5, :]
        dpower = dalpha_eff * alpha
        if st["dpower_gate"] is not None:
            dpower = dpower * st["dpower_gate"]
        dmx_pix = dpower * (-(ca * dx + cb * dy))
        dmy_pix = dpower * (-(cc * dy + cb * dx))
        if not packed:
            # dL/dop: alpha = min(cap, op*e) so d(alpha)/d(op) = e;
            # dalpha_eff is already zero outside `contrib` and where the cap
            # binds, and real conics are PSD so e = exp(power) <= 1
            dop = jnp.sum(dalpha_eff * st["e"], axis=0, keepdims=True)

        if packed:
            # mean/conic grads via PIXEL-BASIS MOMENTS on the MXU: with
            # B = [1,px,py,px^2,px*py,py^2] [P,6], M = B^T @ dpower gives
            # sum_p dpower*dx^m*dy^n by binomial expansion around the entry
            # center — one matmul replaces 5 [P,K] elementwise chains + 5
            # sublane tree-reductions. Tile-LOCAL coords (|px|<16, |x| <=
            # rect diagonal) keep the expansion cancellation-free in f32.
            M = jax.lax.dot_general(pix_basis, dpower,
                                    (((0,), (0,)), ((), ())),
                                    precision=_HIGH,
                                    preferred_element_type=jnp.float32)
            m1, mx, my = M[0:1, :], M[1:2, :], M[2:3, :]
            mxx, mxy, myy = M[3:4, :], M[4:5, :], M[5:6, :]
            # dop from the zeroth moment: dpower = dalpha_eff*alpha and on
            # every lane where dalpha_eff != 0 the cap doesn't bind, so
            # alpha = op*e there and sum_p dalpha_eff*e = m1/op exactly
            # (op is per-entry, constant over p; op=0 lanes carry no grad)
            dop = jnp.where(op > 0.0, m1 / jnp.where(op > 0.0, op, 1.0), 0.0)
            x, y = st["x"], st["y"]
            sx = x * m1 - mx                          # sum dpower*dx
            sy = y * m1 - my
            sxx = x * x * m1 - 2.0 * x * mx + mxx     # sum dpower*dx^2
            sxy = x * y * m1 - x * my - y * mx + mxy
            syy = y * y * m1 - 2.0 * y * my + myy
            dmx = -(ca * sx + cb * sy)
            dmy = -(cc * sy + cb * sx)
            dca = -0.5 * sxx
            dcb = -sxy
            dcc = -0.5 * syy
        else:
            dmx = jnp.sum(dmx_pix, axis=0, keepdims=True)
            dmy = jnp.sum(dmy_pix, axis=0, keepdims=True)
            dca = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            dcb = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
            dcc = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)

        dabsx = jnp.sum(jnp.abs(dmx_pix), axis=0, keepdims=True)
        dabsy = jnp.sum(jnp.abs(dmy_pix), axis=0, keepdims=True)
        if grad_packed:
            # pack the per-entry gradients to f16 pairs IN-KERNEL: halves
            # the grad write-back DMA and hands the backward un-sort its
            # payload rows ready-made. The downstream precision is
            # identical — the un-sort f16-packed these at the XLA level
            # historically. SEQUENTIAL pair layout over the value list
            # [dmx,dmy,dca,dcb,dcc,dop,dabs, r_0,g_0,b_0, r_1,...].
            # dabs fuses the reference's GOF abs-gradient channel
            # (backward.cu:593-595) WITH its NDC factors (0.5*W, 0.5*H —
            # traced scalars riding scalar-prefetch rows 1-2): one u32
            # un-sort row instead of two per-axis ones (~5.5 ms/row at
            # bench scale, probe_sortdesign).
            sx_ndc = ndc_ref[0]
            sy_ndc = ndc_ref[1]
            dabs = sx_ndc * dabsx + sy_ndc * dabsy
            vals = [dmx, dmy, dca, dcb, dcc, dop, dabs]
            for dc in dcols:
                vals += [dc[0:1], dc[1:2], dc[2:3]]
            if len(vals) % 2:
                vals.append(jnp.zeros_like(dop))
            gw = _grad_width(np_)
            g = jnp.concatenate(
                [_pack2_f16_k(vals[2 * i], vals[2 * i + 1])
                 for i in range(len(vals) // 2)]
                + [jnp.zeros((gw - len(vals) // 2, K), jnp.float32)],
                axis=0)
        else:
            assert np_ == 1, "unpacked grads are single-pass only"
            g = jnp.concatenate([
                dmx, dmy, dca, dcb, dcc,
                dop,
                dcols[0],
                dabsx,
                dabsy,
                jnp.zeros((ATTR_W - 11, K), jnp.float32),
            ], axis=0)
        off = pl.multiple_of(astart + c * K, 128)
        gslot = jax.lax.rem(c, 2)
        # wait for the previous grad writeback using this slot (c-2;
        # staged chunks start no DMA, so their slot has nothing pending)
        @pl.when((c >= 2) & jnp.logical_not(_staged(c - 2)))
        def _():
            pltpu.make_async_copy(
                gbuf.at[gslot],
                egrad_hbm.at[:, pl.ds(pl.multiple_of(astart + (c - 2) * K, 128), K)],
                sem2.at[gslot]).wait()
        gbuf[gslot] = jnp.where(em, g, 0.0)
        # chunk 0: merge-preserve the previous tile's tail entries
        @pl.when((c == 0) & (shift > 0) & jnp.logical_not(_staged(0)))
        def _():
            pltpu.make_async_copy(
                egrad_hbm.at[:, pl.ds(pl.multiple_of(astart, 128), K)],
                hbuf, sem3).wait()
            gbuf[gslot] = jnp.where(em, g, hbuf[:, :])
        if bands > 1:
            @pl.when(_staged(c))
            def _():
                # cumulative em-masked merge into the band's crossing
                # window (base wb = max(na-128, 0), mirrored by pass 2)
                wb = jnp.maximum(next_na - 128, 0)
                soff = pl.multiple_of(
                    jnp.clip(astart + c * K - wb, 0, 128), 128)
                cur = stage_ref[0, :, pl.ds(soff, K)]
                stage_ref[0, :, pl.ds(soff, K)] = jnp.where(em, g, cur)
        @pl.when(jnp.logical_not(_staged(c)))
        def _():
            pltpu.make_async_copy(gbuf.at[gslot],
                                  egrad_hbm.at[:, pl.ds(off, K)],
                                  sem2.at[gslot]).start()

        return (c + 1, st["new_t"], jnp.concatenate(acc_new, axis=1),
                st["new_stopped"])

    init = (jnp.int32(0), jnp.ones((P_PIX, 1), jnp.float32),
            jnp.zeros((P_PIX, np_), jnp.float32),
            jnp.zeros((P_PIX, 1), jnp.float32))
    c_fin, _, _, _ = jax.lax.while_loop(cond, body, init)

    # drain: the early-exit prefetch and the last (up to two) grad writebacks.
    # NOTE: must use `astart` (the offset the prefetch was STARTED with, line
    # ~192) — the wait amount happens to be offset-independent today, but a
    # descriptor built from a different offset would break if the copy shape
    # ever depended on it.
    for j in range(_NBUF - 1):
        @pl.when(c_fin + j < n_chunks)
        def _(j=j):
            _chunk_dma(entries_hbm, ebuf, sem, astart, c_fin + j, K,
                       jax.lax.rem(c_fin + j, _NBUF)).wait()

    def _drain_grad(ci):
        @pl.when((ci >= 0) & jnp.logical_not(_staged(ci)))
        def _():
            pltpu.make_async_copy(
                gbuf.at[jax.lax.rem(ci, 2)],
                egrad_hbm.at[:, pl.ds(pl.multiple_of(astart + ci * K, 128), K)],
                sem2.at[jax.lax.rem(ci, 2)]).wait()
    _drain_grad(c_fin - 2)
    _drain_grad(c_fin - 1)

    # early exit leaves chunks [c_fin, n_chunks) unwritten: their true grads
    # are zero (transmittance saturated) — write zeros so no garbage reaches
    # the reduction. c_fin >= 1 always (T starts at 1 >= eps), so these
    # chunks never cover the head-merge block.
    @pl.when(c_fin < n_chunks)
    def _():
        gbuf[0] = jnp.zeros_like(gbuf[0])

        def zbody(c, _):
            @pl.when(jnp.logical_not(_staged(c)))
            def _():
                copy = pltpu.make_async_copy(
                    gbuf.at[0],
                    egrad_hbm.at[:, pl.ds(pl.multiple_of(astart + c * K, 128), K)],
                    sem2.at[0])
                copy.start()
                copy.wait()
            return 0
        jax.lax.fori_loop(c_fin, n_chunks, zbody, 0)


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are CPU-testable."""
    return jax.default_backend() != "tpu"


def _tier2_merge(sums, big_list, bigs, n):
    """Merge tier-2 per-Gaussian gradient sums into the dense [nr, n] rows.

    XLA's batched scatter (index vector shared across rows) costs ~12.5 ms
    at m_cap = 240k — 52 ns/index of per-index bookkeeping — and round-3
    A/Bs could not beat it at the XLA level (transpose relayouts, padded
    slice scatters, searchsorted+gather merges all >= it; see git
    history). Round 4 replaces it on TPU with a Pallas kernel that
    exploits big_list being SORTED ASCENDING AND UNIQUE (it is built by a
    1-row sort): grid over 2048-lane blocks of the dense output; each
    block DMA-fetches its big_list segment (bounds via one tiny XLA
    searchsorted) and PLACES the values with a [SEG, 2048] one-hot f32
    matmul on the MXU — ~15 GF total at bench scale, <1 ms vs 12.5.
    Interpret mode (CPU tests) and small pools keep the XLA scatter."""
    if _interpret() or big_list.shape[0] < 4096:
        return sums.at[:, jnp.minimum(big_list, n)].add(
            jnp.where(big_list < n, bigs, 0.0), mode="drop")
    return sums + _tier2_dense_pallas(big_list, bigs, n)


_T2_L = 2048        # dense lanes per program
_T2_SEG = 1024      # big-entry chunk per matmul round (1-D i32 HBM
                    # arrays tile at (1024): slices must align to it)


def _tier2_dense_pallas(big_list, bigs, n):
    """[nr, n] dense rows holding bigs placed at big_list (sorted unique;
    entries >= n ignored). See _tier2_merge."""
    nr, m_cap = bigs.shape
    nr_pad = _round_up(nr, 8)
    m_pad = _round_up(m_cap, _T2_SEG) + _T2_SEG
    B = (n + _T2_L - 1) // _T2_L
    bl = jnp.concatenate(
        [big_list.astype(jnp.int32),
         jnp.full((m_pad - m_cap,), n, jnp.int32)])
    bg = jnp.concatenate(
        [bigs, jnp.zeros((nr_pad - nr, m_cap), bigs.dtype)])
    bg = jnp.concatenate(
        [bg, jnp.zeros((nr_pad, m_pad - m_cap), bigs.dtype)], axis=1)
    # per-block segment bounds: block b owns gaussians [b*L, (b+1)*L)
    bounds = jnp.arange(B + 1, dtype=jnp.int32) * _T2_L
    seg = jnp.searchsorted(bl, jnp.minimum(bounds, n),
                           side="left").astype(jnp.int32)
    call = _make_tier2_call(nr_pad, m_pad, B)
    dense = call(seg, bl, bg)
    return dense[:nr, :n]


@functools.lru_cache(maxsize=16)
def _make_tier2_call(nr_pad: int, m_pad: int, B: int):
    L, SEG = _T2_L, _T2_SEG

    def kern(seg_ref, bl_hbm, bigs_hbm, out_ref, blbuf, bbuf, sem):
        b = pl.program_id(0)
        base = b * L
        lo = seg_ref[b]
        hi = seg_ref[b + 1]
        afloor = pl.multiple_of((lo // SEG) * SEG, SEG)
        nchunks = pl.cdiv(hi - afloor, SEG)
        out_ref[:, :] = jnp.zeros((nr_pad, L), jnp.float32)
        # one-hot built [L, SEG] so the segment indices stay in LANE form
        # ([1, SEG] row — a (SEG,) -> (SEG, 1) column reshape would be a
        # sublane relayout Mosaic handles poorly)
        lane_col = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        srow = jax.lax.broadcasted_iota(jnp.int32, (1, SEG), 1)

        def body(c, _):
            st = pl.multiple_of(afloor + c * SEG, SEG)
            cp1 = pltpu.make_async_copy(bl_hbm.at[pl.ds(st, SEG)],
                                        blbuf, sem.at[0])
            cp2 = pltpu.make_async_copy(bigs_hbm.at[:, pl.ds(st, SEG)],
                                        bbuf, sem.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            gpos = st + srow                    # global big-list position
            idx = blbuf[:].reshape(1, SEG) - base
            valid = (gpos >= lo) & (gpos < hi) & (idx >= 0) & (idx < L)
            onehot = jnp.where(valid & (idx == lane_col), 1.0, 0.0)
            out_ref[:, :] += jax.lax.dot_general(
                bbuf[:, :], onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((nr_pad, L), lambda b, *_: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((SEG,), jnp.int32),
                pltpu.VMEM((nr_pad, SEG), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nr_pad, B * _T2_L), jnp.float32),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )


@functools.lru_cache(maxsize=64)
def _make_pallas_calls(grid: TileGrid, K: int, R_pad: int,
                       table_w: int = ATTR_W, col0=6, a0: int = 0,
                       T_prog: int = 0, packed: bool = False,
                       grad_packed: bool = False, bwd_bands: int = 1):
    """col0 is an int (single pass, historical) or a tuple of per-pass
    color-column offsets: a tuple builds FUSED multi-pass kernels (one
    traversal blends / back-propagates every pass)."""
    col0s = (col0,) if isinstance(col0, int) else tuple(col0)
    np_ = len(col0s)
    OW = _out_width(np_)
    T_tiles = T_prog or grid.num_tiles   # programs (= tiles this call blends)
    interpret = _interpret()

    # dimension_semantics: the FORWARD grid is "parallel" (megacore splits
    # the tile range across cores): each program writes only its own
    # out_pack block and the entry table is read-only, so there is no
    # cross-program hazard. The BACKWARD grid MUST stay sequential
    # ("arbitrary") — its cross-tile head-merge (see _bwd_kernel chunk-0
    # path) reads gradients the PREVIOUS tile wrote to the shared
    # 128-aligned head block; annotating "parallel" would silently race
    # that merge (redesign needed: per-tile private head blocks + a
    # second-pass block reduction).
    GW = _grad_width(np_) if grad_packed else ATTR_W
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, grid=grid, K=K, col0s=col0s, a0=a0,
                          packed=packed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[pl.BlockSpec((1, P_PIX, OW), lambda i, *_: (i, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((_NBUF, table_w, K), jnp.float32),
                pltpu.SemaphoreType.DMA((_NBUF,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((T_tiles, P_PIX, OW), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )

    scratch = [
        pltpu.VMEM((_NBUF, table_w, K), jnp.float32),
        pltpu.VMEM((2, GW, K), jnp.float32),
        pltpu.VMEM((GW, K), jnp.float32),
        pltpu.SemaphoreType.DMA((_NBUF,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]
    if bwd_bands > 1:
        # banded-parallel backward (round 4): outer grid dim = bands
        # (megacore cores), inner sequential within the band; the
        # band-boundary blocks come back through the `stage` output and
        # the caller's pass-2 merge (see _bwd_kernel_impl).
        assert T_tiles % bwd_bands == 0, (T_tiles, bwd_bands)
        T_b = T_tiles // bwd_bands
        SW = 512   # stage window: [na-128, na+384) per band boundary
        bwd_call = pl.pallas_call(
            functools.partial(_bwd_kernel_banded, grid=grid, K=K,
                              col0s=col0s, a0=a0, packed=packed,
                              grad_packed=grad_packed, bands=bwd_bands,
                              t_band=T_b),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(bwd_bands, T_b),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec((1, P_PIX, OW),
                                 lambda b, i, *_: (b * T_b + i, 0, 0)),
                    pl.BlockSpec((1, P_PIX, OW),
                                 lambda b, i, *_: (b * T_b + i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.HBM),   # zeros base
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec((1, GW, SW), lambda b, i, *_: (b, 0, 0)),
                ],
                scratch_shapes=scratch,
            ),
            out_shape=[jax.ShapeDtypeStruct((GW, R_pad), jnp.float32),
                       jax.ShapeDtypeStruct((bwd_bands, GW, SW),
                                            jnp.float32)],
            # the zeros input (operand indices INCLUDE the 4
            # scalar-prefetch args: entries=4, cot=5, fwd=6, zeros=7)
            # becomes the egrad base: unwritten regions stay ZERO, which
            # is what makes the caller's pass-2 a pure add
            input_output_aliases={7: 0},
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )
        return fwd_call, bwd_call
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, grid=grid, K=K, col0s=col0s, a0=a0,
                          packed=packed, grad_packed=grad_packed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),                    # entries
                pl.BlockSpec((1, P_PIX, OW), lambda i, *_: (i, 0, 0)),   # cot
                pl.BlockSpec((1, P_PIX, OW), lambda i, *_: (i, 0, 0)),   # fwd out
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            scratch_shapes=scratch,
        ),
        out_shape=[jax.ShapeDtypeStruct((GW, R_pad), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    return fwd_call, bwd_call


def _quantized_keys(tile_flat, depth, dup_valid, n, d_max, num_tiles):
    """Fused u32 sort key [tile | truncated positive-f32 depth bits]."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    dpos = jnp.maximum(depth, 0.0)
    dbits = jax.lax.bitcast_convert_type(dpos, jnp.uint32) >> (31 - depth_bits)
    dq = jnp.minimum(dbits, jnp.uint32((1 << depth_bits) - 1))
    key = ((tile_flat.reshape(-1).astype(jnp.uint32) << depth_bits)
           | jnp.broadcast_to(dq[:, None], (n, d_max)).reshape(-1))
    return jnp.where(dup_valid.reshape(-1), key, jnp.uint32(0xFFFFFFFF)), depth_bits


def _tile_of_cell(rmin, rw, j, grid_x: int):
    """Tile id of a Gaussian's j-th (static) rect cell. rmin [m,2]; rw [m]."""
    jj = jnp.int32(j)
    ty = rmin[:, 1] + jj // rw
    tx = rmin[:, 0] + jj % rw
    return (ty * grid_x + tx).astype(jnp.int32)


def _cull_threshold(opacity):
    """Corner-cull threshold on the conic quadratic: an entry is visible in
    a tile iff opac * exp(-q_min/2) >= 1/255, i.e. q_min <= this value."""
    return 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * (1.0 / ALPHA_MIN))


def _cell_visible(tile_m, mean_m2, con_m, thr_m, grid: TileGrid):
    """EXACT tile-corner culling: True iff the min over the tile's pixel box
    of the conic quadratic q(d) satisfies q_min <= thr (alpha can reach the
    kernels' 1/255 floor somewhere in the tile). q_min over a box is at the
    center (if inside) or on an edge, where the free coordinate minimizes to
    clamp(-b*dx/c). The continuous box min lower-bounds every pixel sample,
    so no visible entry is ever culled."""
    ts = float(grid.tile_size)
    a_, b_, c_ = con_m[:, 0], con_m[:, 1], con_m[:, 2]
    ox = (tile_m % grid.grid_x).astype(jnp.float32) * ts
    oy = (tile_m // grid.grid_x).astype(jnp.float32) * ts
    dxh = mean_m2[:, 0] - ox
    dxl = dxh - (ts - 1.0)
    dyh = mean_m2[:, 1] - oy
    dyl = dyh - (ts - 1.0)

    def q_of(dx, dy):
        return a_ * dx * dx + 2.0 * b_ * dx * dy + c_ * dy * dy

    inside = (dxl <= 0.0) & (dxh >= 0.0) & (dyl <= 0.0) & (dyh >= 0.0)
    q = jnp.where(inside, 0.0, jnp.inf)
    for dx in (dxl, dxh):
        dy = jnp.clip(-b_ * dx / jnp.maximum(c_, 1e-12), dyl, dyh)
        q = jnp.minimum(q, q_of(dx, dy))
    for dy in (dyl, dyh):
        dx = jnp.clip(-b_ * dy / jnp.maximum(a_, 1e-12), dxl, dxh)
        q = jnp.minimum(q, q_of(dx, dy))
    return q <= thr_m


def visible_cell_counts(mean2d, conic, opacity, rect_min, rect_max,
                        tiles_touched, valid, grid: TileGrid, d_max: int,
                        sat_super=None, depth=None):
    """Per-Gaussian count of corner-cull-surviving rect cells (first d_max).

    Mirrors the sort engine's select_cells accumulation exactly (same ops in
    the same order) so XLA CSE merges it with the binning computation when
    both live in one jitted program — e.g. the cull-aware overflow metric
    (ops/rasterize.overflow_count) rides along for free. When the binning
    runs with a saturation map, pass the same (sat_super, depth) so the
    mirror stays exact."""
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    thr = _cull_threshold(opacity)
    corners = _cell_sat_corners(rect_min, rect_w, tiles_touched, sat_super)
    prefix = jnp.zeros((valid.shape[0],), jnp.int32)
    for j in range(d_max):
        tj = _tile_of_cell(rect_min, rect_w, j, grid.grid_x)
        vj = ((j < tiles_touched) & valid
              & _cell_visible(tj, mean2d, conic, thr, grid))
        if corners is not None:
            vj = vj & _cell_sat_keep(tj, depth, corners, grid)
        prefix = prefix + vj.astype(jnp.int32)
    return prefix


SUPERTILE_F = 4   # tiles per supertile edge for the saturation-cull map


def supertile_shape(grid: TileGrid):
    """(sy, sx) of the saturation-depth supertile map for `grid`."""
    f = SUPERTILE_F
    return ((grid.grid_y + f - 1) // f, (grid.grid_x + f - 1) // f)


def pool_sat_depth(sat_depth, grid: TileGrid, margin: float = 1.25):
    """Per-tile saturation depths [T] -> conservative supertile map
    [sy, sx] for the NEXT step's pre-sort cull.

    A cell may only be culled if it is beyond saturation at EVERY tile its
    supertile covers, so the pool takes the MAX over member tiles (any
    unsaturated tile = +inf poisons its supertile — conservative by
    construction). `margin` widens the kept band: the recorded depth is
    the exit point of a walk on the PREVIOUS step's (already-culled)
    stream, and the scene moves between steps."""
    f = SUPERTILE_F
    sy, sx = supertile_shape(grid)
    m = jnp.full((sy * f, sx * f), jnp.inf, jnp.float32)
    m = m.at[:grid.grid_y, :grid.grid_x].set(
        sat_depth.reshape(grid.grid_y, grid.grid_x))
    # edge padding rows/cols are +inf -> never enable culling there
    return (m.reshape(sy, f, sx, f).max(axis=(1, 3))
            * jnp.float32(margin))


def _cell_sat_corners(rmin, rw, tt, sat_super):
    """Per-Gaussian corner-supertile ids + thresholds for the per-cell
    saturation cull. Returns (ids [(cy,cx)x4], thrs [m]x4, or None).

    The rect's 4 corner supertiles are looked up with ONE-HOT sums (a
    jnp.take gather is latency-bound at ~7 ns/index — dead at n*4 lookups;
    the [m, S] one-hot broadcast fuses on the VPU). Cells whose supertile
    is not one of the corners (rect spanning >2 supertiles per axis) fall
    back to +inf = never culled — conservative, and rare (d_max-bounded
    rects are a few tiles wide)."""
    if sat_super is None:
        return None
    f = SUPERTILE_F
    sy, sx = sat_super.shape
    rh = jnp.maximum((tt + rw - 1) // jnp.maximum(rw, 1), 1)
    c0x = rmin[:, 0] // f
    c1x = (rmin[:, 0] + rw - 1) // f
    c0y = rmin[:, 1] // f
    c1y = (rmin[:, 1] + rh - 1) // f
    flat = sat_super.reshape(-1)
    sidx = jnp.arange(sy * sx, dtype=jnp.int32)
    out = []
    for cy, cx in ((c0y, c0x), (c0y, c1x), (c1y, c0x), (c1y, c1x)):
        sid = jnp.clip(cy * sx + cx, 0, sy * sx - 1)
        thr = jnp.sum(jnp.where(sid[:, None] == sidx[None, :],
                                flat[None, :], 0.0), axis=1)
        out.append((cy, cx, thr))
    return out


def _cell_sat_keep(tj, depth_m, corners, grid: TileGrid):
    """keep-mask for cells at tile `tj` under the saturation cull: True
    unless the cell's depth is beyond the matched corner threshold."""
    if corners is None:
        return True
    f = SUPERTILE_F
    sjx = (tj % grid.grid_x) // f
    sjy = (tj // grid.grid_x) // f
    thr = jnp.float32(-jnp.inf)
    matched = False
    for cy, cx, t in corners:
        m = (sjx == cx) & (sjy == cy)
        thr = jnp.maximum(thr, jnp.where(m, t, -jnp.inf))
        matched = m | matched
    thr = jnp.where(matched, thr, jnp.inf)
    return depth_m < thr


def _cull_pack_entries(grid: TileGrid, d1: int, d_max: int, m_cap: int,
                       pack16: bool, n_passes: int, depth_bits: int,
                       mean2d, conic, opacity, colors_stack, depth,
                       rect_min, rect_max, tiles_touched, valid,
                       sat_super=None):
    """Corner-cull + visible-cell compaction + payload packing, shared by the
    single-chip and Gaussian-sharded sort engines.

    Returns (key_all, payload_rows, big_list) in SLOT order (cell-major:
    slot (j, g) = j*n + g); the caller appends the flat-iota row and runs the
    wide lax.sort. pack16 rows (pack-v2): (x_rel, y_rel) | (ca, cc) |
    (cb, op) | rgb10 per pass; else plain f32 attributes (exact-parity
    mode).

    Every per-slot row is built as a CONCAT of per-cell 1-D [n] pieces —
    never as a [d, n] 2-D array: a [d, n] -> [d*n] reshape is a
    T(8,128) -> T(1024) relayout that XLA lowers to a d-iteration copy loop
    (~0.75 ms per row at bench scale, measured), while the concat of fused
    1-D pieces is a single flat write.

    Tier split: every Gaussian owns the first d1 slots for its first d1
    corner-cull-surviving rect cells; Gaussians with more visible cells
    claim one of m_cap deep rows covering cells [d1, d_max). All tier-2
    columns (select geometry + payload attributes) are fetched with ONE
    row-shared batched gather: single-row [m_cap] gathers are latency-bound
    (~6.6 ns/elem measured at 240k) while a gather whose index vector is
    shared across rows streams ~0.7 ns/elem, and the [rows, n] stack fuses
    into its elementwise producers (no relayout pass) — the same trick as
    the backward's batched tier-2 merge scatter.
    """
    n = valid.shape[0]
    d2_extra = d_max - d1
    ts = float(grid.tile_size)
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    cull_thr = _cull_threshold(opacity)

    def quantized_key(tile_m, depth_m, dup_m):
        dpos = jnp.maximum(depth_m, 0.0)
        dbits = (jax.lax.bitcast_convert_type(dpos, jnp.uint32)
                 >> (31 - depth_bits))
        dq = jnp.minimum(dbits, jnp.uint32((1 << depth_bits) - 1))
        key = (tile_m.astype(jnp.uint32) << depth_bits) | dq
        return jnp.where(dup_m, key, jnp.uint32(0xFFFFFFFF))

    def packed_xy(tile_m, mean_m2):
        # f16 (x_rel, y_rel) wrt each entry's own tile origin: f16's
        # relative precision matches conic's 1/sigma^2 scaling, so the
        # blend-power error stays ~1e-3 across footprint sizes
        ox = (tile_m % grid.grid_x).astype(jnp.float32) * ts
        oy = (tile_m // grid.grid_x).astype(jnp.float32) * ts
        return _pack2_f16(mean_m2[:, 0] - ox, mean_m2[:, 1] - oy)

    # Visible-cell COMPACTION: enumerate ALL d_max rect cells, keep only
    # the corner-cull survivors (exact culling — a culled entry can never
    # pass the in-kernel `alpha >= ALPHA_MIN` test, forward.cu:356
    # semantics), and pack them to the front of each Gaussian's slots.
    def select_cells(rmin, rw, tt, vald, mean_m2, con_m, thr_m, depth_m,
                     d_lo, d_hi):
        """Tiles of the visible cells packed to slots [d_lo, d_hi)."""
        m = rw.shape[0]
        corners = _cell_sat_corners(rmin, rw, tt, sat_super)
        prefix = jnp.zeros((m,), jnp.int32)
        sel = [jnp.zeros((m,), jnp.int32) for _ in range(d_hi - d_lo)]
        for j in range(d_max):
            tj = _tile_of_cell(rmin, rw, j, grid.grid_x)
            vj = ((j < tt) & vald
                  & _cell_visible(tj, mean_m2, con_m, thr_m, grid))
            if corners is not None:
                # saturation cull: drop cells the blend walk would never
                # reach (previous-step per-tile exit depths, pooled by
                # pool_sat_depth) — the lever that actually shrinks the
                # binning work on converged scenes, where the kernels'
                # early exit fires but the sorts still pay full R
                vj = vj & _cell_sat_keep(tj, depth_m, corners, grid)
            for jo in range(d_lo, d_hi):
                sel[jo - d_lo] = jnp.where(
                    vj & (prefix == jo), tj, sel[jo - d_lo])
            prefix = prefix + vj.astype(jnp.int32)
        return sel, prefix   # prefix = total visible-cell count

    # full-n payload attribute rows. Tier 1 repeats them d1 times directly;
    # tier 2 reads them through the batched gather. pack16 rows (pack-v2):
    # (ca,cc) | (cb,op) | rgb10 per color pass — every flat-sort payload
    # row costs ~5.5 ms at bench scale (probe_sortdesign), so the fwd
    # table is 3 rows + 1/pass instead of round-3's 4 + 2/pass.
    if pack16:
        attr_rows = [_pack2_f16(conic[:, 0], conic[:, 2]),
                     _pack2_f16(conic[:, 1], opacity)]
        for i in range(n_passes):
            attr_rows.append(_pack_rgb10(colors_stack[i, :, 0],
                                         colors_stack[i, :, 1],
                                         colors_stack[i, :, 2]))
    else:
        attr_rows = [mean2d[:, 0], mean2d[:, 1], conic[:, 0],
                     conic[:, 1], conic[:, 2], opacity]
        for i in range(n_passes):
            attr_rows += [colors_stack[i, :, 0], colors_stack[i, :, 1],
                          colors_stack[i, :, 2]]

    # tier 1: first d1 VISIBLE cells of every Gaussian
    key_parts, xy_parts = [], []
    sel1, vis_count = select_cells(rect_min, rect_w, tiles_touched,
                                   valid, mean2d, conic, cull_thr, depth,
                                   0, d1)
    for jo in range(d1):
        key_parts.append(quantized_key(sel1[jo], depth, jo < vis_count))
        if pack16:
            xy_parts.append(packed_xy(sel1[jo], mean2d))

    # tier 2: visible cells [d1, d_max) for Gaussians with many of them
    attr_rows_b = []
    if m_cap > 0:
        is_big = (vis_count > d1) & valid
        # first m_cap big-Gaussian indices, packed ascending, via ONE
        # 1-row sort — ~3x cheaper than the equivalent rank-scatter
        # (8.8 ms measured at 1.5M); overflow beyond m_cap drops the
        # HIGHEST indices, same as the rank < m_cap cutoff did
        bkey = jnp.where(is_big, jnp.arange(n, dtype=jnp.int32),
                         jnp.int32(0x7FFFFFFF))
        big_list = jnp.minimum(jax.lax.sort(bkey, is_stable=False)[:m_cap], n)
        bvalid = big_list < n
        bl = jnp.minimum(big_list, n - 1)
        u32 = jnp.uint32
        geo_cols = [rect_min[:, 0], rect_min[:, 1], rect_w,
                    tiles_touched, mean2d[:, 0], mean2d[:, 1],
                    conic[:, 0], conic[:, 1], conic[:, 2],
                    cull_thr, depth]
        all_cols = geo_cols + attr_rows
        stackn = jnp.stack(
            [c if c.dtype == u32 else jax.lax.bitcast_convert_type(c, u32)
             for c in all_cols])
        gb = stackn[:, bl]   # the ONE row-shared tier-2 gather

        def back(i):
            ref = all_cols[i]
            if ref.dtype == u32:
                return gb[i]
            return jax.lax.bitcast_convert_type(gb[i], ref.dtype)

        rmin_b = jnp.stack([back(0), back(1)], axis=-1)
        mean_b = jnp.stack([back(4), back(5)], axis=-1)
        conic_b = jnp.stack([back(6), back(7), back(8)], axis=-1)
        depth_b = back(10)
        attr_rows_b = [back(len(geo_cols) + i)
                       for i in range(len(attr_rows))]
        sel2, vis_b = select_cells(rmin_b, back(2), back(3), bvalid,
                                   mean_b, conic_b, back(9), depth_b,
                                   d1, d_max)
        for j2 in range(d1, d_max):
            key_parts.append(
                quantized_key(sel2[j2 - d1], depth_b, j2 < vis_b))
            if pack16:
                xy_parts.append(packed_xy(sel2[j2 - d1], mean_b))
    else:
        big_list = jnp.zeros((0,), jnp.int32)
    key_all = jnp.concatenate(key_parts)

    def attr(i):
        # d1 contiguous repeats (single flat concat write, no relayout)
        parts = [attr_rows[i]] * d1
        if m_cap > 0:
            parts += [attr_rows_b[i]] * d2_extra
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    payload = [attr(i) for i in range(len(attr_rows))]
    if pack16:
        payload = [jnp.concatenate(xy_parts)] + payload
    return key_all, payload, big_list


def _sort_engine_sizes(grid: TileGrid, K: int, n: int, d_max: int,
                       n_passes: int, d_small: int, big_fraction: float,
                       pack16: bool):
    """Derived static sizes shared by the sort engine's vjp factory and the
    static (sort-once, blend-many) renderer."""
    d1 = min(d_small, d_max)
    d2_extra = d_max - d1
    # min(..., n): the big_list builder slices sort(bkey)[:m_cap] of an
    # n-length array, so m_cap > n would silently shrink the tier-2 pieces
    # and desync them from the R computed here (caught by the r3 verify
    # drive's 3-gaussian scene)
    m_cap = min(max(int(n * big_fraction), 8), n) if d2_extra > 0 else 0
    R = n * d1 + m_cap * d2_extra
    R_pad = ((R + K - 1) // K) * K + 2 * K
    if pack16:
        # pack-v2: xy | (ca,cc) | (cb,op) | rgb10 per pass
        table_w = ((3 + n_passes + 7) // 8) * 8
        col0s = [3 + i for i in range(n_passes)]
    else:
        table_w = ((6 + 3 * n_passes + 7) // 8) * 8
        col0s = [6 + 3 * i for i in range(n_passes)]
    tile_bits = max(int(grid.num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    return d1, d2_extra, m_cap, R, R_pad, table_w, col0s, depth_bits


def _build_sorted_table(grid: TileGrid, K: int, n: int, d_max: int,
                        n_passes: int, d_small: int, big_fraction: float,
                        pack16: bool, mean2d, conic, opacity, colors_stack,
                        depth, rect_min, rect_max, tiles_touched, valid,
                        sat_super=None):
    """Corner-cull + compaction + ONE wide payload sort -> the kernels'
    entry table. Returns (table, sorted_flat, tile_starts, tile_counts,
    big_list, sorted_key). Shared by the training vjp and the static
    renderer. sorted_key feeds the saturation-depth readback (the key's
    low bits are truncated positive-f32 depth)."""
    (d1, _d2, m_cap, R, R_pad, table_w, _col0s,
     depth_bits) = _sort_engine_sizes(grid, K, n, d_max, n_passes, d_small,
                                      big_fraction, pack16)
    T_tiles = grid.num_tiles
    key_all, payload, big_list = _cull_pack_entries(
        grid, d1, d_max, m_cap, pack16, n_passes, depth_bits,
        mean2d, conic, opacity, colors_stack, depth, rect_min,
        rect_max, tiles_touched, valid, sat_super=sat_super)
    flat = jnp.arange(R, dtype=jnp.int32)
    # flat IS the iota tiebreaker a stable 1-key sort would add internally:
    # 2-key unstable is ordering-identical ((key, flat) unique) and saves
    # that internal u32 row of sort traffic
    ops = jax.lax.sort((key_all, flat, *payload), num_keys=2,
                       is_stable=False)
    sorted_key, sorted_flat = ops[0], ops[1]

    def as_f32(row):
        if row.dtype == jnp.uint32:
            return jax.lax.bitcast_convert_type(row, jnp.float32)
        return row
    rows = [as_f32(o)[None, :] for o in ops[2:]]
    pad_rows = table_w - len(rows)
    if pad_rows:
        rows = rows + [jnp.zeros((pad_rows, R), jnp.float32)]
    table = jnp.concatenate(rows, axis=0)
    table = jnp.concatenate(
        [table, jnp.zeros((table_w, R_pad - R), jnp.float32)], axis=1)

    bounds = (jnp.arange(T_tiles + 1, dtype=jnp.uint32)
              << jnp.uint32(depth_bits))
    tile_starts = jnp.searchsorted(sorted_key, bounds,
                                   side="left").astype(jnp.int32)
    tile_counts = tile_starts[1:] - tile_starts[:-1]
    big_list_out = big_list if m_cap > 0 else jnp.zeros((0,), jnp.int32)
    return (table, sorted_flat, tile_starts, tile_counts, big_list_out,
            sorted_key)


def sat_depth_from_pack(pack, sorted_key, tile_starts, tile_counts,
                        grid: TileGrid, K: int, n_passes: int,
                        depth_bits: int, planar: bool = False):
    """Per-tile saturation depth [T] from the fwd kernel's telemetry column.

    pack col 3*np+1 carries the early-exit chunk index (-1 = tile never
    saturated). The exit position maps through the sorted key row to a
    depth (the key's low bits are the top bits of the positive-f32 depth —
    a lower bound; pool_sat_depth's margin covers the truncation).
    Unsaturated or empty tiles read +inf = never cull."""
    T_tiles = grid.num_tiles
    col = 3 * n_passes + 1
    satv = (pack[:, col, 0] if planar else pack[:, 0, col]).astype(jnp.int32)
    starts = tile_starts[:T_tiles]
    astart = (starts // 128) * 128
    last = jnp.maximum(starts + tile_counts - 1, starts)
    pos = jnp.clip(astart + satv * K, starts, last)
    key_at = sorted_key[pos]                       # [T] gather (tiny)
    mask = jnp.uint32((1 << depth_bits) - 1)
    dep = jax.lax.bitcast_convert_type(
        (key_at & mask) << (31 - depth_bits), jnp.float32)
    return jnp.where((satv >= 0) & (tile_counts > 0), dep, jnp.inf)


@functools.lru_cache(maxsize=8)
def _make_static_fwd_call(grid: TileGrid, K: int, R_pad: int, table_w: int,
                          col0s, packed: bool):
    """Fwd blend with PLANAR [OW, T, P] output for the static viewer path
    (lane dim = P = 256 instead of OW = 8; see _fwd_kernel planar_out)."""
    np_ = len(col0s)
    OW = _out_width(np_)
    T_tiles = grid.num_tiles
    interpret = _interpret()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid=grid, K=K, col0s=col0s, a0=0,
                          packed=packed, planar_out=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[pl.BlockSpec((1, OW, P_PIX), lambda i, *_: (i, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((_NBUF, table_w, K), jnp.float32),
                pltpu.SemaphoreType.DMA((_NBUF,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((T_tiles, OW, P_PIX), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=8)
def _make_static_renderer(grid: TileGrid, K: int, n: int, d_max: int,
                          n_passes: int = 1, d_small: int = 4,
                          big_fraction: float = 0.16, pack16: bool = True):
    """Sort-once / blend-many fast path for inference on a static scene.

    3DGS viewers hit >100 fps by amortizing binning: the sorted entry table
    only changes when the camera or the Gaussians move, so a viewer can
    re-blend (e.g. for appearance embedding changes, tone edits, or
    multi-pass outputs) without paying the sort. Returns (bin_fn, blend_fn):
      bin_fn(mean2d, conic, opacity, colors_stack, depth, rect_min,
             rect_max, tiles_touched, valid) -> (table, starts, counts)
      blend_fn(table, starts, counts, bg) -> [n_passes, H', W', 4] packed
        tiles (color 0:3, final_T 3) in TILE layout; use tiles_to_image.
    Forward-only (no vjp). Cf. reference README.md:27 real-time claim.
    """
    (_d1, _d2, _m_cap, _R, R_pad, table_w, col0s,
     _depth_bits) = _sort_engine_sizes(grid, K, n, d_max, n_passes, d_small,
                                       big_fraction, pack16)
    call = _make_static_fwd_call(grid, K, R_pad, table_w, tuple(col0s),
                                 pack16)

    def bin_fn(mean2d, conic, opacity, colors_stack, depth, rect_min,
               rect_max, tiles_touched, valid, sat_super=None):
        table, _flat, starts, counts, _big, _key = _build_sorted_table(
            grid, K, n, d_max, n_passes, d_small, big_fraction, pack16,
            mean2d, conic, opacity, colors_stack, depth, rect_min,
            rect_max, tiles_touched, valid, sat_super=sat_super)
        return table, starts, counts

    def blend_fn(table, starts, counts, bg):
        """Returns PLANAR [n_passes, 4, T, P] (color 0:3, final_T at 3)."""
        zb = jnp.zeros((1,), jnp.int32)
        (pack,) = call(zb, jnp.ones((2,), jnp.float32), starts, counts,
                       table)                           # [T, OW, P]
        final_t = pack[:, 3 * n_passes]                 # [T, P]
        return jnp.stack(
            [jnp.concatenate(
                [jnp.moveaxis(pack[:, 3 * i:3 * i + 3], 1, 0)
                 + final_t[None] * bg[:, None, None],
                 final_t[None]], 0)
             for i in range(n_passes)])

    return bin_fn, blend_fn


@functools.lru_cache(maxsize=32)
def _make_pallas_blend_vjp(grid: TileGrid, K: int, n: int, d_max: int,
                           n_passes: int = 1, d_small: int = 4,
                           big_fraction: float = 0.16, pack16: bool = True):
    """Sort-centric pallas rasterizer (v2), multi-pass capable.

    Binning, chunk-alignment, and attribute packing all ride ONE wide
    lax.sort: per-Gaussian attributes travel as sort payloads (a 9-payload
    sort costs ~2.5x a bare sort — an order of magnitude cheaper than
    per-attribute XLA gathers, which run at ~80M elem/s on TPU), and a static
    pool of (K-1) padding entries per tile keyed to each tile's end makes
    every tile segment a multiple of K — so segments come out of the sort
    chunk-aligned with no repacking. Multiple color sets (raw / appearance-
    toned / depth, reference method.py:1573-1631) share the single sorted
    geometry as extra payload rows, so a full WildGaussians train step pays
    for one sort. The backward un-sorts the per-entry gradients by original
    flat index (another wide sort) and reduces the dense [N, D] slot matrix —
    no large scatters anywhere.
    """
    T_tiles = grid.num_tiles
    # two-tier duplication slots: every Gaussian owns d1 cheap slots; the few
    # with larger tile rects (sky Gaussians etc.) claim one of m_cap deep
    # slot rows covering rect cells [d1, d_max). Cuts sort size 1.5-5x vs a
    # flat [n, d_max] slot matrix (measured p50 tiles/gaussian ~3-5, long
    # tail up to hundreds for sky points).
    # (sizes shared with the static renderer: kernels read/write whole
    # [*, K] blocks from the 128-aligned floor of each tile's start, so
    # R_pad pads generously past the end; Mosaic requires the sublane dim
    # of DMA-sliced HBM arrays 8-aligned, hence table_w round-up. Packed
    # table rows: xy(1) + conic(3) + 2 per color pass; unpacked parity
    # mode: xy(2) + conic(3) + op(1) + 3 per pass.)
    (d1, d2_extra, m_cap, R, R_pad, table_w, col0s,
     depth_bits) = _sort_engine_sizes(grid, K, n, d_max, n_passes, d_small,
                                      big_fraction, pack16)
    slots1 = n * d1
    nb = _bwd_bands()
    bands = nb if nb > 1 and grid.num_tiles % nb == 0 else 1
    calls = _make_pallas_calls(grid, K, R_pad, table_w, tuple(col0s),
                               packed=pack16, grad_packed=True,
                               bwd_bands=bands)

    def _sort_entries(mean2d, conic, opacity, colors_stack, depth, rect_min,
                      rect_max, tiles_touched, valid, sat_super):
        # CELL-MAJOR slot layout (tier-1 slot (j, g) -> j * n + g), exact
        # corner culling (26% of bench entries cull) and visible-cell
        # compaction (p86 <= 4 visible cells lets d_small shrink below the
        # raw-rect p90 of 6; slots and the cost of both wide sorts scale
        # with d_small * n) — see _cull_pack_entries / _build_sorted_table
        return _build_sorted_table(
            grid, K, n, d_max, n_passes, d_small, big_fraction, pack16,
            mean2d, conic, opacity, colors_stack, depth, rect_min,
            rect_max, tiles_touched, valid, sat_super=sat_super)

    def forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                rect_max, tiles_touched, valid, bg, ndc_scale, sat_super):
        (table, sorted_flat, tile_starts, tile_counts, big_list,
         sorted_key) = _sort_entries(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid, sat_super)
        zb = jnp.zeros((1,), jnp.int32)
        # ONE fused kernel run blends every pass (final_T is shared — the
        # passes have identical geometry); ndc_scale rides the f32
        # scalar-prefetch row (the bwd kernel's fused dabs factors)
        (pack,) = calls[0](zb, jnp.asarray(ndc_scale, jnp.float32),
                           tile_starts, tile_counts, table)
        final_t = pack[:, :, 3 * n_passes]
        C = jnp.stack(
            [pack[:, :, 3 * i:3 * i + 3]
             + final_t[..., None] * bg[None, None, :]
             for i in range(n_passes)])
        T = jnp.broadcast_to(final_t[None], (n_passes,) + final_t.shape)
        sat_depth = sat_depth_from_pack(pack, sorted_key, tile_starts,
                                        tile_counts, grid, K, n_passes,
                                        depth_bits)
        return C, T, sat_depth, pack, table, sorted_flat, tile_starts, \
            tile_counts, big_list

    @jax.custom_vjp
    def blend(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
              depth, rect_min, rect_max, tiles_touched, valid, ndc_scale,
              sat_super):
        del absgrad_hook
        out = forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                      rect_max, tiles_touched, valid, bg, ndc_scale,
                      sat_super)
        return out[0], out[1], out[2]

    def fwd(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
            depth, rect_min, rect_max, tiles_touched, valid, ndc_scale,
            sat_super):
        del absgrad_hook
        (C, T, sat_depth, pack, table, sorted_flat, tile_starts, tile_counts,
         big_list) = forward(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid, bg, ndc_scale, sat_super)
        return (C, T, sat_depth), (table, sorted_flat, tile_starts,
                                   tile_counts, big_list, bg, pack,
                                   ndc_scale)

    def bwd(res, cot):
        (table, sorted_flat, tile_starts, tile_counts, big_list, bg,
         fwd_pack, ndc_scale) = res
        gC, gT, _gsat = cot   # [np,T,P,3], [np,T,P], [T] (sat: no grad)

        # the forward kernel's raw pack IS the bwd kernel's fwd_pack layout
        # (pass-i colors at [3i:3i+3], shared final_T at [3np], zero tail) —
        # saved in residuals verbatim, nothing to rebuild here
        ft = fwd_pack[:, :, 3 * n_passes]
        # cot pack: pass-i cotangent colors at [3i:3i+3], per-pass gt_eff
        # at [3np+i]
        gt_effs = [gT[i] + jnp.einsum("tpc,c->tp", gC[i], bg,
                                      precision=_HIGH)
                   for i in range(n_passes)]
        ow = _out_width(n_passes)
        cot_pack = jnp.concatenate(
            [gC[i] for i in range(n_passes)]
            + [ge[..., None] for ge in gt_effs]
            + [jnp.zeros((T_tiles, P_PIX, ow - 4 * n_passes), jnp.float32)],
            axis=-1)
        if bands > 1:
            gw = _grad_width(n_passes)
            zeros_base = jnp.zeros((gw, R_pad), jnp.float32)
            eg, stage = calls[1](jnp.zeros((1,), jnp.int32),
                                 jnp.asarray(ndc_scale, jnp.float32),
                                 tile_starts, tile_counts, table, cot_pack,
                                 fwd_pack, zeros_base)
            # pass 2: add each band's crossing window back (pure add over
            # the zero-initialized base; see _bwd_kernel_impl)
            T_b = T_tiles // bands
            for bb in range(1, bands):
                na = (tile_starts[bb * T_b] // 128) * 128
                off = jnp.maximum(na - 128, 0)
                win = jax.lax.dynamic_slice(eg, (0, off), (gw, 512))
                # rows hold f16-PAIR BIT PATTERNS in f32 lanes: merge in
                # the integer domain (disjoint em-masks -> one side is
                # all-zero bits, so OR is exact; an f32 add would FLUSH
                # subnormal-looking patterns to zero)
                u32 = jnp.uint32
                merged = jax.lax.bitcast_convert_type(
                    jax.lax.bitcast_convert_type(win, u32)
                    | jax.lax.bitcast_convert_type(stage[bb - 1], u32),
                    jnp.float32)
                eg = jax.lax.dynamic_update_slice(eg, merged, (0, off))
        else:
            (eg,) = calls[1](jnp.zeros((1,), jnp.int32),
                             jnp.asarray(ndc_scale, jnp.float32), tile_starts,
                             tile_counts, table, cot_pack, fwd_pack)
        dbg = jnp.einsum("itpc,tp->c", gC, ft, precision=_HIGH)

        # eg rows arrive f16-PAIR-packed from the fused kernel: sequential
        # pairs over [dmx,dmy,dca,dcb,dcc,dop,dabs, r_i,g_i,b_i ...]
        n_rows = _grad_rows(n_passes)   # real grad values
        n_packed = (n_rows + 1) // 2
        # rows beyond the covered region were never written by the kernels
        covered = jnp.arange(R, dtype=jnp.int32) < tile_starts[T_tiles]
        packed = [jnp.where(covered,
                            jax.lax.bitcast_convert_type(eg[j, :R],
                                                         jnp.uint32),
                            jnp.uint32(0))
                  for j in range(n_packed)]
        # sorted_flat is a PERMUTATION (unique keys): is_stable=False is
        # result-identical and saves the iota tiebreaker row XLA appends to
        # stable payload sorts — one less u32 row of sort traffic. (A/B
        # measured r3: stable here is 202.2 ms/step vs 190.0 unstable, so
        # the naive marginal-cost-per-row arithmetic from key-only
        # microbenches does NOT transfer; keep unstable.)
        unsorted_packed = jax.lax.sort((sorted_flat, *packed), num_keys=1,
                                       is_stable=False)

        def _unpack(i):
            word = unsorted_packed[1 + i // 2]
            half = (word >> 16) if i % 2 == 0 else (word & jnp.uint32(0xFFFF))
            return _f16_bits_to_f32(half)

        def slot_base(i):
            # cell-major slots: per-gaussian totals are sums of d 1-D SLICES
            # of the row — one fused elementwise pass; a [d*m] -> [d, m]
            # reshape-then-reduce would relayout T(1024) -> T(8,128) first
            # (~1.6 ms per row at bench scale, measured)
            row = _unpack(i)
            out = row[0:n]
            for j in range(1, d1):
                out = out + row[j * n:(j + 1) * n]
            return out

        def slot_big(i):
            row = _unpack(i)
            big = row[slots1:slots1 + m_cap]
            for j2 in range(1, d2_extra):
                big = big + row[slots1 + j2 * m_cap:
                                slots1 + (j2 + 1) * m_cap]
            return big

        sums = jnp.stack([slot_base(i) for i in range(n_rows)])   # [nr, n]
        if m_cap > 0:
            sums = _tier2_merge(sums, big_list,
                                jnp.stack([slot_big(i)
                                           for i in range(n_rows)]), n)
        dmean2d = sums[0:2].T
        dconic = sums[2:5].T
        dop = sums[5]
        # ONE fused NDC-abs channel (channel 1 zero keeps the [N,2] hook
        # contract; callers consume g_abs.sum(-1))
        dabs = jnp.stack([sums[6], jnp.zeros_like(sums[6])], axis=-1)
        dcolors = jnp.stack(
            [sums[7 + 3 * i:10 + 3 * i].T for i in range(n_passes)])
        # non-differentiated geometry inputs: f32 depth gets a zero cotangent
        # (sort order is discrete), int/bool inputs get float0
        d_depth = jnp.zeros((n,), jnp.float32)
        zi = lambda shape: np.zeros(shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dop, dcolors, dabs, dbg,
                d_depth, zi((n, 2)), zi((n, 2)), zi((n,)), zi((n,)),
                jnp.zeros((2,), jnp.float32),
                jnp.zeros(supertile_shape(grid), jnp.float32))

    blend.defvjp(fwd, bwd)
    return blend


@functools.lru_cache(maxsize=32)
def _make_sharded_sort_blend_vjp(grid: TileGrid, K: int, n: int, d_max: int,
                                 n_passes: int = 1, d_small: int = 4,
                                 big_fraction: float = 0.16,
                                 mesh=None, mesh_axis: str = "tiles",
                                 pack16: bool = True, send_beta: float = 2.0,
                                 grads_sharded: bool = False,
                                 stream_merge: bool = True):
    """Gaussian-sharded sort engine (v5): the production binning under a mesh.

    The TPU-native analogue of multi-GPU Gaussian splatting: Gaussians are
    sharded across the mesh axis (parameters, preprocess, binning and the
    gradient reduction all scale 1/D in memory and FLOPs — the >HBM-count
    tensor-parallel path), tiles are sharded for blending, and the two meet
    in ONE static-shape all-to-all over ICI:

      1. each device corner-culls + compacts + locally lax.sorts the entries
         of its n/D Gaussians by the same [tile | depth] key as the
         single-chip engine — after which the entries destined for each
         device's tile band are CONTIGUOUS segments (searchsorted on band
         boundary keys);
      2. the segments are packed into a [D, C] static-cap send buffer
         (C = send_beta * R_loc / D, 128-aligned; segments beyond C are
         dropped and the overflow is visible in the cull-aware metric only
         as quality, so send_beta defaults to 2x the balanced load) and
         exchanged with a tiled lax.all_to_all — riding ICI, no host;
      3. the receiver merges its D sorted sub-streams with one local sort
         (1/D-scale) and blends its tile band with the unmodified kernels.

    The backward runs the band kernels, un-sorts per-entry gradients back to
    receive order, reverses the all-to-all, and restores the sender's slot
    order with one merge sort against an explicit complement stream (slots
    whose entries were never sent carry zero gradient), so per-Gaussian
    gradient reduction happens entirely on the owning shard — Gaussian
    gradients are never replicated and need NO psum; only the bg-color
    gradient crosses devices. Single-chip order is reproduced exactly
    whenever the quantized keys are unique (stable sorts end-to-end).

    vs the replicated-binning partition path: binning work scales 1/D and
    the sort engine's measured 2.8x single-chip advantage is kept.

    Caveat: the big-Gaussian pool is per shard (m_cap = n_loc *
    big_fraction), so a shard owning far more than its share of big
    Gaussians truncates earlier than the single-chip pool would — the store
    packs alive slots contiguously, making this visible on tiny scenes.
    Densification scatters new Gaussians across capacity, so converged
    scenes distribute evenly; persistent truncation still surfaces through
    the overflow metric and the trainer's big_fraction auto-grow.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as SP

    T_tiles = grid.num_tiles
    D = int(mesh.shape[mesh_axis])
    assert n % D == 0, (n, D)
    n_loc = n // D
    d1 = min(d_small, d_max)
    d2_extra = d_max - d1
    m_cap = (min(max(int(n_loc * big_fraction), 8), n_loc)
             if d2_extra > 0 else 0)
    slots1 = n_loc * d1
    slots2 = m_cap * d2_extra
    R_loc = slots1 + slots2
    T_shpad = _round_up(T_tiles, D)
    T_band = T_shpad // D
    tile_bits = max(int(T_shpad + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    C = min(_round_up(R_loc, 128),
            _round_up(max(int(R_loc * send_beta / D), 2 * K), 128))
    RB = D * C                       # receive-table entries per device
    # round-5 D-stream merge (ops/bitonic.py): the receiver merges its D
    # pre-sorted streams through a bitonic merge network with recorded
    # swap bits instead of re-sorting RB entries from scratch; the
    # backward replays the network in reverse (exact inverse) instead of
    # a second un-sort. Streams pad to pow2 for the network.
    from wildgaussians_tpu.ops import bitonic
    C2 = bitonic._pow2ceil(C)
    D2 = bitonic._pow2ceil(D)
    RB_eff = D2 * C2 if stream_merge else RB
    RB_pad = _round_up(RB_eff, K) + 2 * K
    ts = float(grid.tile_size)

    if pack16:
        table_w = _round_up(3 + n_passes, 8)       # pack-v2 layout
        col0s = [3 + i for i in range(n_passes)]
    else:
        table_w = _round_up(6 + 3 * n_passes, 8)
        col0s = [6 + 3 * i for i in range(n_passes)]
    calls = _make_pallas_calls(grid, K, RB_pad, table_w, tuple(col0s), 0,
                               T_band, packed=pack16, grad_packed=True)

    SENT = jnp.uint32(0xFFFFFFFF)

    def _local_entries(mean2d, conic, opacity, colors_stack, depth, rect_min,
                       rect_max, tiles_touched, valid):
        """Single-chip _sort_entries logic on the local Gaussian shard:
        corner-cull + visible-cell compaction + ONE wide payload sort."""
        key_all, payload, big_list = _cull_pack_entries(
            grid, d1, d_max, m_cap, pack16, n_passes, depth_bits,
            mean2d, conic, opacity, colors_stack, depth, rect_min,
            rect_max, tiles_touched, valid)
        flat = jnp.arange(R_loc, dtype=jnp.int32)
        ops = jax.lax.sort((key_all, flat, *payload), num_keys=1)
        return ops[0], ops[1], list(ops[2:]), big_list

    def _as_u32(row):
        if row.dtype == jnp.uint32:
            return row
        return jax.lax.bitcast_convert_type(row, jnp.uint32)

    def _send(rows_u32, seg):
        """Pack band segments of locally-sorted rows into [nr, D*C] send
        buffers (chunk b = my entries for band b) and exchange. Row 0 must
        be the key row (masked to the sentinel beyond each segment)."""
        nr = len(rows_u32)
        idx = jnp.arange(C, dtype=jnp.int32)
        chunks = []
        for b in range(D):
            lo = seg[b]
            live = (lo + idx) < seg[b + 1]
            per_row = []
            for r, row in enumerate(rows_u32):
                padded = jnp.concatenate(
                    [row, jnp.full((C,), SENT if r == 0 else jnp.uint32(0),
                                   jnp.uint32)])
                piece = jax.lax.dynamic_slice(padded, (lo,), (C,))
                if r == 0:
                    piece = jnp.where(live, piece, SENT)
                per_row.append(piece)
            chunks.append(per_row)
        send = jnp.stack(
            [jnp.concatenate([chunks[b][r] for b in range(D)])
             for r in range(nr)])                              # [nr, D*C]
        return jax.lax.all_to_all(send, mesh_axis, split_axis=1,
                                  concat_axis=1, tiled=True)

    def sfwd(mean2d, conic, opacity, colors_stack, depth, rect_min,
             rect_max, tiles_touched, valid, bg, ndc_scale):
        skey, sflat, payload, big_list = _local_entries(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid)
        band_bounds = (jnp.arange(D + 1, dtype=jnp.uint32)
                       * jnp.uint32(T_band)) << jnp.uint32(depth_bits)
        seg = jnp.searchsorted(skey, band_bounds,
                               side="left").astype(jnp.int32)
        recv = _send([skey] + [_as_u32(p) for p in payload], seg)

        if stream_merge:
            padded, _, _ = bitonic.pad_streams(recv, D, C, SENT)
            rkey, mrows, route = bitonic.bitonic_merge(
                padded[0], padded[1:], D2)
            rows = [jax.lax.bitcast_convert_type(mrows[i], jnp.float32)[
                None, :] for i in range(len(payload))]
        else:
            ridx = jnp.arange(RB, dtype=jnp.int32)
            rops = jax.lax.sort(
                (recv[0], ridx,
                 *[recv[1 + i] for i in range(len(payload))]), num_keys=1)
            rkey, route = rops[0], rops[1]
            rows = [jax.lax.bitcast_convert_type(o, jnp.float32)[None, :]
                    for o in rops[2:]]
        pad_rows = table_w - len(rows)
        if pad_rows:
            rows = rows + [jnp.zeros((pad_rows, RB_eff), jnp.float32)]
        table = jnp.concatenate(rows, axis=0)
        table = jnp.concatenate(
            [table, jnp.zeros((table_w, RB_pad - RB_eff), jnp.float32)],
            axis=1)

        my_t0 = jax.lax.axis_index(mesh_axis).astype(jnp.uint32) * T_band
        bounds = ((my_t0 + jnp.arange(T_band + 1, dtype=jnp.uint32))
                  << jnp.uint32(depth_bits))
        starts = jnp.searchsorted(rkey, bounds, side="left").astype(jnp.int32)
        counts = starts[1:] - starts[:-1]

        tb = (my_t0.astype(jnp.int32))[None]
        # ONE fused kernel run blends every pass
        (pack_stack,) = calls[0](tb, jnp.asarray(ndc_scale, jnp.float32),
                                 starts, counts, table)
        # [T_band, P_PIX, OW]: pass-i colors at [3i:3i+3], T at [3*np]
        # send-cap accounting (NO silent caps): entries beyond C in any
        # (sender, band) segment were dropped from the exchange
        seg_sizes = seg[1:] - seg[:-1]
        send_drops = jax.lax.psum(
            jnp.sum(jnp.maximum(seg_sizes - C, 0)), mesh_axis)
        res = (table[None], route[None], seg[None], sflat[None],
               big_list[None], starts[None])
        return (pack_stack, send_drops) + res

    def sbwd(table, route, seg, sflat, big_list, starts, pack_stack,
             gC, gT, bg, ndc_scale):
        (table, route, seg, sflat, big_list, starts) = (
            table[0], route[0], seg[0], sflat[0], big_list[0],
            starts[0])
        counts = starts[1:] - starts[:-1]
        my_t0 = jax.lax.axis_index(mesh_axis).astype(jnp.int32) * T_band
        tb = my_t0[None]

        final_t = pack_stack[:, :, 3 * n_passes]    # shared across passes
        gt_effs = [gT[i] + jnp.einsum("tpc,c->tp", gC[i], bg,
                                      precision=_HIGH)
                   for i in range(n_passes)]
        ow = _out_width(n_passes)
        cot_pack = jnp.concatenate(
            [gC[i] for i in range(n_passes)]
            + [ge[..., None] for ge in gt_effs]
            + [jnp.zeros((T_band, P_PIX, ow - 4 * n_passes), jnp.float32)],
            axis=-1)
        # the fused fwd pack already holds background-free colors per pass
        # + shared T, exactly the layout the fused bwd kernel reads
        (eg,) = calls[1](tb, jnp.asarray(ndc_scale, jnp.float32),
                         starts, counts, table, cot_pack, pack_stack)
        dbg = jnp.einsum("itpc,tp->c", gC, final_t, precision=_HIGH)
        dbg = jax.lax.psum(dbg, mesh_axis)

        n_rows = _grad_rows(n_passes)
        n_packed = (n_rows + 1) // 2
        covered = jnp.arange(RB_eff, dtype=jnp.int32) < starts[T_band]
        packed = [jnp.where(covered,
                            jax.lax.bitcast_convert_type(eg[j, :RB_eff],
                                                         jnp.uint32),
                            jnp.uint32(0))
                  for j in range(n_packed)]

        # receive order <- band-sorted order, then reverse the all-to-all:
        # chunk b of `back` = gradients of the entries I sent to band b,
        # in my send order (positions seg[b] + i of my local sort)
        if stream_merge:
            # replay the recorded merge network in reverse: exact inverse
            # routing at compare-free select cost, no second RB sort
            un_rows = bitonic.replay_inverse(route, jnp.stack(packed), D2)
            un_rows = bitonic.unpad_streams(un_rows, D, C, C2, D2)
        else:
            # route is the receive iota permutation (unique keys):
            # unstable sort is result-identical, one payload row cheaper
            un = jax.lax.sort((route, *packed), num_keys=1,
                              is_stable=False)
            un_rows = jnp.stack(un[1:])
        back = jax.lax.all_to_all(un_rows, mesh_axis,
                                  split_axis=1, concat_axis=1, tiled=True)

        # slot restore, round 4 ("copy-restore", tools/scaling_model.py):
        # chunk b of `back` holds grads for my local-sort positions
        # [seg[b], seg[b]+len_b) IN ORDER, so restoring local-sort order
        # is D masked dynamic-slice writes (forward order: each chunk's
        # zero-masked cap tail is overwritten by the next chunk's run;
        # positions never sent — cap drops, key-invalid tail — keep the
        # zero base). One R_loc un-sort by sflat then yields slot order,
        # replacing round 2/3's 2*R_loc complement-stream merge sort
        # (the single biggest term in the projected multi-chip scaling
        # deficit).
        idx = jnp.arange(C, dtype=jnp.int32)
        restored = jnp.zeros((back.shape[0], R_loc + C), jnp.uint32)
        for b in range(D):
            live = idx < (seg[b + 1] - seg[b])
            piece = jnp.where(live[None, :], back[:, b * C:(b + 1) * C], 0)
            restored = jax.lax.dynamic_update_slice(
                restored, piece, (0, seg[b]))
        restored = restored[:, :R_loc]
        # sflat is a permutation of [0, R_loc) (the local sort's payload
        # iota): unstable 1-key sort restores dense slot order
        merged = jax.lax.sort(
            (sflat, *[restored[r] for r in range(restored.shape[0])]),
            num_keys=1, is_stable=False)

        def _unpack(i):
            word = merged[1 + i // 2][:R_loc]
            half = (word >> 16) if i % 2 == 0 else (word & jnp.uint32(0xFFFF))
            return _f16_bits_to_f32(half)

        n_rows = _grad_rows(n_passes)

        def slot_base(i):
            row = _unpack(i)
            out = row[0:n_loc]
            for j in range(1, d1):
                out = out + row[j * n_loc:(j + 1) * n_loc]
            return out

        def slot_big(i):
            row = _unpack(i)
            big = row[slots1:slots1 + m_cap]
            for j2 in range(1, d2_extra):
                big = big + row[slots1 + j2 * m_cap:
                                slots1 + (j2 + 1) * m_cap]
            return big

        sums = jnp.stack([slot_base(i) for i in range(n_rows)])
        if m_cap > 0:
            sums = _tier2_merge(sums, big_list,
                                jnp.stack([slot_big(i)
                                           for i in range(n_rows)]), n_loc)
        dmean2d = sums[0:2].T
        dconic = sums[2:5].T
        dop = sums[5]
        dabs = jnp.stack([sums[6], jnp.zeros_like(sums[6])], axis=-1)
        dcolors = jnp.stack(
            [sums[7 + 3 * i:10 + 3 * i].T for i in range(n_passes)])
        return dmean2d, dconic, dop, dcolors, dabs, dbg

    gspec = SP(mesh_axis)                       # [n, ...] gaussian-sharded
    gspec2 = SP(mesh_axis, None)
    cspec = SP(None, mesh_axis, None)
    res_spec = tuple(SP(mesh_axis) for _ in range(6))

    fwd_sharded = shard_map(
        sfwd, mesh=mesh,
        in_specs=(gspec2, gspec2, gspec, cspec, gspec, gspec2, gspec2,
                  gspec, gspec, SP(), SP()),
        # fused pack: [T_shpad, P, OW] with tile bands on axis 0
        out_specs=(SP(mesh_axis), SP()) + res_spec, check_vma=False)

    bwd_sharded = shard_map(
        sbwd, mesh=mesh,
        in_specs=res_spec + (SP(mesh_axis),
                             SP(None, mesh_axis), SP(None, mesh_axis), SP(),
                             SP()),
        out_specs=(gspec2, gspec2, gspec, SP(None, mesh_axis, None),
                   gspec2, SP()), check_vma=False)

    def _pad_gT(x):
        pad = T_shpad - T_tiles
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:1] + (pad,) + x.shape[2:], x.dtype)],
            axis=1)

    def forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                rect_max, tiles_touched, valid, bg, ndc_scale):
        outs = fwd_sharded(mean2d, conic, opacity, colors_stack, depth,
                           rect_min, rect_max, tiles_touched, valid, bg,
                           ndc_scale)
        pack, send_drops, res = outs[0], outs[1], outs[2:]
        # fused pack [T_shpad, P, OW]: pass-i colors at [3i:3i+3], shared T
        ft = pack[:T_tiles, :, 3 * n_passes]
        C_out = jnp.stack(
            [pack[:T_tiles, :, 3 * i:3 * i + 3]
             + ft[..., None] * bg[None, None, :]
             for i in range(n_passes)])
        final_t = jnp.broadcast_to(ft[None], (n_passes,) + ft.shape)
        return C_out, final_t, send_drops, pack, res

    @jax.custom_vjp
    def blend(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
              depth, rect_min, rect_max, tiles_touched, valid, ndc_scale):
        del absgrad_hook
        C_out, final_t, send_drops, _, _ = forward(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid, bg, ndc_scale)
        return C_out, final_t, send_drops

    def fwd(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
            depth, rect_min, rect_max, tiles_touched, valid, ndc_scale):
        del absgrad_hook
        C_out, final_t, send_drops, pack_stack, res = forward(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid, bg, ndc_scale)
        return (C_out, final_t, send_drops), (pack_stack, res, bg, ndc_scale)

    def bwd(resids, cot):
        pack_stack, res, bg, ndc_scale = resids
        gC, gT, _g_drops = cot             # [np,T,P,3], [np,T,P], []
        dmean2d, dconic, dop, dcolors, dabs, dbg = bwd_sharded(
            *res, pack_stack, _pad_gT(gC), _pad_gT(gT), bg, ndc_scale)
        if not grads_sharded:
            # hand back REPLICATED Gaussian grads (the partition engine's
            # psum contract): callers keeping a replicated store would
            # otherwise inherit our shard-owned out_specs through GSPMD
            # propagation, and the resulting output-sharding drift across
            # steps trips jax 0.9's dispatch fastpath on donated jits.
            # Shard-owned grads (no all-gather) are the
            # config.shard_gaussian_store mode.
            from jax.sharding import NamedSharding, PartitionSpec
            repl = lambda x: jax.lax.with_sharding_constraint(  # noqa: E731
                x, NamedSharding(mesh, PartitionSpec()))
            dmean2d, dconic, dop, dcolors, dabs = map(
                repl, (dmean2d, dconic, dop, dcolors, dabs))
        d_depth = jnp.zeros((n,), jnp.float32)
        zi = lambda shape: np.zeros(shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dop, dcolors, dabs, dbg,
                d_depth, zi((n, 2)), zi((n, 2)), zi((n,)), zi((n,)),
                jnp.zeros((2,), jnp.float32))

    blend.defvjp(fwd, bwd)
    return blend


PRESORT_NB = (1 << 24) - 1   # depth keyspace: positive-f32 bit patterns >> 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=32)
def _make_partition_blend_vjp(grid: TileGrid, K: int, n: int, d_max: int,
                              n_passes: int = 1, d_small: int = 4,
                              big_fraction: float = 0.16,
                              mesh=None, mesh_axis: str = "tiles"):
    """Partition-centric pallas rasterizer (v3).

    Replaces the two wide lax.sort calls of the sort-centric design (~110 ms
    each at bench scale) with the radix partition engine (ops/partition.py):

      1. Gaussians are stably presorted ONCE by monotone positive-f32 depth
         bits (n-sized, 6 radix passes) — full 24-bit depth order, finer
         than the old quantized sort keys.
      2. Duplication into tile cells happens in rank-major slot order, so
         the global entry order is depth-major (rank-major).
      3. When the two-tier slot pool is active, tier-2 entries sit after
         all tier-1 entries in slot order, so a stable tile partition alone
         would place them out of depth order within a tile. A chain of
         stable LSB-first partitions by RANK (key row 0) first merges the
         two rank-sorted tiers into one rank-major stream; the tile
         partition (key row 1, tile ids shifted +1 so invalid entries and
         rank-pass holes pool in a dead bucket 0) then yields tile segments
         that are exactly depth-sorted — the same order as the reference's
         64-bit [tile | depth] CUB radix sort (rasterizer_impl.cu:303-311).
         With d_max <= d_small there is no tier 2 and the rank passes are
         skipped entirely.

    The backward inverts each step exactly instead of re-sorting: per-entry
    gradients return to slot order through the inverse tile (and rank)
    partitions, are reduced per rank (tier sums), and the inverse presort
    restores the original Gaussian order.
    """
    from .partition import (PartitionMeta, radix_partition,
                            radix_unpartition, bucket_ranges, num_passes)

    T_tiles = grid.num_tiles
    E = 256
    B = 16
    d1 = min(d_small, d_max)
    d2_extra = d_max - d1
    # min(..., n): the big_list builder slices sort(bkey)[:m_cap] of an
    # n-length array, so m_cap > n would silently shrink the tier-2 pieces
    # and desync them from the R computed here (caught by the r3 verify
    # drive's 3-gaussian scene)
    m_cap = min(max(int(n * big_fraction), 8), n) if d2_extra > 0 else 0
    tiered = m_cap > 0
    n_pad = _round_up(n, E)
    L1 = num_passes(PRESORT_NB, B)
    n1 = n_pad + L1 * B * E                 # rank-space size (incl. holes)
    slots1 = n1 * d1
    slots2 = m_cap * d2_extra
    R0 = _round_up(slots1 + slots2, E)
    L_A = num_passes(n1, B) if tiered else 0
    R_A = R0 + L_A * B * E                  # after the rank-merge chain
    tile_nb = T_tiles + 1 if tiered else T_tiles
    L2 = num_passes(tile_nb, B)
    TAIL = _round_up(2 * K, E)
    R_L = R_A + L2 * B * E + TAIL           # final entry-table width

    nkey = 2 if tiered else 1               # leading key rows of dup table
    pres_rows_used = 12 + 3 * n_passes      # key,6 geo,colors,rect3,tt,valid
    pres_w = _round_up(pres_rows_used, 8)
    table_w = _round_up(nkey + 6 + 3 * n_passes, 8)
    grows_used = 8 + 3 * n_passes           # geo6 + absx/absy + colors
    grows = _round_up(grows_used, 8)
    rm = 7 + 3 * n_passes                   # first rect row in presort table

    # tile-sharding over a device mesh: each device blends (and back-props)
    # a contiguous tile range; binning stays replicated (per-device entry
    # tables over a Gaussian shard + all-to-all exchange is the next step)
    D = int(mesh.shape[mesh_axis]) if mesh is not None else 1
    T_shpad = _round_up(T_tiles, D)
    T_local = T_shpad // D
    calls = [_make_pallas_calls(grid, K, R_L, table_w, nkey + 6 + 3 * i,
                                nkey, T_local if D > 1 else 0)
             for i in range(n_passes)]
    interpret = _interpret()

    def pres_meta(bases, keys):
        return PartitionMeta(E=E, B=B, L=L1, R0=n_pad,
                             num_buckets=PRESORT_NB, keyspace=B ** L1,
                             bases=bases, saved_keys=keys)

    def rank_meta(bases, keys):
        return PartitionMeta(E=E, B=B, L=L_A, R0=R0, num_buckets=n1,
                             keyspace=B ** L_A, bases=bases, saved_keys=keys)

    def tile_meta(bases, keys):
        return PartitionMeta(E=E, B=B, L=L2, R0=R_A, num_buckets=tile_nb,
                             keyspace=B ** L2, bases=bases, saved_keys=keys)

    def depth_key(depth, valid):
        dpos = jnp.maximum(depth, 0.0)
        bits = jax.lax.bitcast_convert_type(dpos, jnp.uint32) >> 8
        key = jnp.minimum(bits, jnp.uint32(PRESORT_NB - 1)).astype(jnp.float32)
        return jnp.where(valid, key, float(PRESORT_NB))

    def pad_n(col):
        return jnp.concatenate(
            [col.astype(jnp.float32), jnp.zeros((n_pad - n,), jnp.float32)])

    def forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                rect_max, tiles_touched, valid, bg):
        rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
        rows = [pad_n(depth_key(depth, valid)),
                pad_n(mean2d[:, 0]), pad_n(mean2d[:, 1]),
                pad_n(conic[:, 0]), pad_n(conic[:, 1]), pad_n(conic[:, 2]),
                pad_n(opacity)]
        for i in range(n_passes):
            rows += [pad_n(colors_stack[i, :, 0]),
                     pad_n(colors_stack[i, :, 1]),
                     pad_n(colors_stack[i, :, 2])]
        rows += [pad_n(rect_min[:, 0]), pad_n(rect_min[:, 1]),
                 pad_n(rect_w), pad_n(jnp.minimum(tiles_touched, d_max)),
                 pad_n(valid)]
        while len(rows) < pres_w:
            rows.append(jnp.zeros((n_pad,), jnp.float32))
        ptab = jnp.stack(rows)
        psorted, pmeta = radix_partition(ptab, PRESORT_NB, B=B, E=E,
                                         interpret=interpret)

        # rank-space columns (presort holes carry valid=0 payloads)
        rminx = psorted[rm].astype(jnp.int32)
        rminy = psorted[rm + 1].astype(jnp.int32)
        rw = jnp.maximum(psorted[rm + 2].astype(jnp.int32), 1)
        tt_r = psorted[rm + 3].astype(jnp.int32)
        valid_r = psorted[rm + 4] > 0.5

        def tile_of_cell(rx, ry, w, cell):
            ty = ry[:, None] + cell // w[:, None]
            tx = rx[:, None] + cell % w[:, None]
            return (ty * grid.grid_x + tx).astype(jnp.float32)

        cells1 = jnp.arange(d1, dtype=jnp.int32)[None, :]
        tile1 = tile_of_cell(rminx, rminy, rw, cells1)
        dup1 = (cells1 < tt_r[:, None]) & valid_r[:, None]
        if tiered:
            tkey_parts = [jnp.where(dup1, tile1 + 1.0, 0.0).reshape(-1)]
            ranks1 = jnp.broadcast_to(
                jnp.arange(n1, dtype=jnp.float32)[:, None], (n1, d1))
            rkey_parts = [jnp.where(dup1, ranks1, float(n1)).reshape(-1)]
        else:
            tkey_parts = [jnp.where(dup1, tile1, float(T_tiles)).reshape(-1)]
            rkey_parts = None

        if tiered:
            is_big = (tt_r > d1) & valid_r
            brank = jnp.cumsum(is_big) - 1
            ok = is_big & (brank < m_cap)
            big_list = jnp.full((m_cap,), n1, jnp.int32).at[
                jnp.where(ok, brank, m_cap)].set(
                    jnp.arange(n1, dtype=jnp.int32), mode="drop")
            bvalid = big_list < n1
            blc = jnp.minimum(big_list, n1 - 1)
            cells2 = d1 + jnp.arange(d2_extra, dtype=jnp.int32)[None, :]
            tile2 = tile_of_cell(rminx[blc], rminy[blc], rw[blc], cells2)
            dup2 = (cells2 < tt_r[blc][:, None]) & bvalid[:, None]
            tkey_parts.append(
                jnp.where(dup2, tile2 + 1.0, 0.0).reshape(-1))
            ranks2 = jnp.broadcast_to(blc[:, None].astype(jnp.float32),
                                      (m_cap, d2_extra))
            rkey_parts.append(
                jnp.where(dup2, ranks2, float(n1)).reshape(-1))
        else:
            big_list = jnp.zeros((0,), jnp.int32)
            blc = None

        pad_tail = R0 - (slots1 + slots2)
        if pad_tail:
            fillv = 0.0 if tiered else float(T_tiles)
            tkey_parts.append(jnp.full((pad_tail,), fillv, jnp.float32))
            if tiered:
                rkey_parts.append(jnp.full((pad_tail,), float(n1),
                                           jnp.float32))

        def cat(parts):
            return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        def attr(row_idx):
            col = psorted[row_idx]
            parts = [jnp.broadcast_to(col[:, None], (n1, d1)).reshape(-1)]
            if tiered:
                parts.append(jnp.broadcast_to(
                    col[blc][:, None], (m_cap, d2_extra)).reshape(-1))
            if pad_tail:
                parts.append(jnp.zeros((pad_tail,), jnp.float32))
            return cat(parts)

        trows = ([cat(rkey_parts)] if tiered else []) + [cat(tkey_parts)]
        trows += [attr(j) for j in range(1, 7 + 3 * n_passes)]
        while len(trows) < table_w:
            trows.append(jnp.zeros((R0,), jnp.float32))
        dtab = jnp.stack(trows)

        if tiered:
            # merge the two rank-sorted tiers into one rank-major stream,
            # then group by tile (stability preserves rank = depth order)
            asorted, ameta = radix_partition(dtab, n1, B=B, E=E, key_row=0,
                                             interpret=interpret)
            tsorted, tmeta = radix_partition(asorted, tile_nb, B=B, E=E,
                                             key_row=1, tail_pad=TAIL,
                                             interpret=interpret)
            starts_all, counts_all = bucket_ranges(tmeta)
            starts, counts = starts_all[1:], counts_all[1:]
            ares = (ameta.bases, ameta.saved_keys)
        else:
            tsorted, tmeta = radix_partition(dtab, tile_nb, B=B, E=E,
                                             key_row=0, tail_pad=TAIL,
                                             interpret=interpret)
            starts, counts = bucket_ranges(tmeta)
            ares = ((), ())

        Cs, Ts = [], []
        if D > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as SP
            real_end = starts[T_tiles - 1] + counts[T_tiles - 1]
            pad = T_shpad - T_tiles
            starts_p = jnp.concatenate(
                [starts, jnp.full((pad,), 1, jnp.int32) * real_end])
            counts_p = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)])
            tbase = jnp.arange(D, dtype=jnp.int32) * T_local
            for i in range(n_passes):
                def sfwd(tb, st, ct, tab, i=i):
                    (pack,) = calls[i][0](tb, jnp.ones((2,), jnp.float32), st, ct, tab)
                    return pack
                pack = shard_map(
                    sfwd, mesh=mesh,
                    in_specs=(SP(mesh_axis), SP(mesh_axis), SP(mesh_axis),
                              SP()),
                    out_specs=SP(mesh_axis), check_vma=False)(
                        tbase, starts_p, counts_p, tsorted)[:T_tiles]
                final_t = pack[:, :, 3]
                Cs.append(pack[:, :, 0:3]
                          + final_t[..., None] * bg[None, None, :])
                Ts.append(final_t)
        else:
            zb = jnp.zeros((1,), jnp.int32)
            for i in range(n_passes):
                (pack,) = calls[i][0](zb, jnp.ones((2,), jnp.float32), starts, counts, tsorted)
                final_t = pack[:, :, 3]
                Cs.append(pack[:, :, 0:3]
                          + final_t[..., None] * bg[None, None, :])
                Ts.append(final_t)
        return (jnp.stack(Cs), jnp.stack(Ts), tsorted, starts, counts,
                big_list, pmeta, ares, tmeta)

    @jax.custom_vjp
    def blend(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
              depth, rect_min, rect_max, tiles_touched, valid):
        del absgrad_hook
        out = forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                      rect_max, tiles_touched, valid, bg)
        return out[0], out[1]

    def fwd(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
            depth, rect_min, rect_max, tiles_touched, valid):
        del absgrad_hook
        (C, T, tsorted, starts, counts, big_list, pmeta, ares, tmeta) = \
            forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                    rect_max, tiles_touched, valid, bg)
        res = (tsorted, starts, counts, big_list, pmeta.bases,
               pmeta.saved_keys, ares, tmeta.bases, tmeta.saved_keys,
               bg, C, T)
        return (C, T), res

    def _build_gtab(eg_list):
        geo_rows = None
        color_rows = []
        for eg in eg_list:
            g_geo = jnp.concatenate([eg[0:6], eg[9:11]], axis=0)
            geo_rows = g_geo if geo_rows is None else geo_rows + g_geo
            color_rows.append(eg[6:9])
        rows = [geo_rows[j] for j in range(8)]
        for cr in color_rows:
            rows += [cr[0], cr[1], cr[2]]
        while len(rows) < grows:
            rows.append(jnp.zeros((R_L,), jnp.float32))
        return jnp.stack(rows)

    def _reduce_rank(gtab, tmeta, ares_in, big_list):
        """Partitioned-order grad table -> per-rank sums [grows, n1]."""
        slotg = radix_unpartition(gtab, tmeta, interpret=interpret)
        if tiered:
            ameta = rank_meta(ares_in[0], ares_in[1])
            slotg = radix_unpartition(slotg, ameta, interpret=interpret)

        def rank_sum(j):
            row = slotg[j]
            out = row[:slots1].reshape(n1, d1).sum(axis=1)
            if tiered:
                big = row[slots1:slots1 + slots2].reshape(
                    m_cap, d2_extra).sum(axis=1)
                out = out.at[big_list].add(
                    jnp.where(big_list < n1, big, 0.0), mode="drop")
            return out

        rrows = [rank_sum(j) for j in range(grows_used)]
        while len(rrows) < grows:
            rrows.append(jnp.zeros((n1,), jnp.float32))
        return jnp.stack(rrows)

    def bwd(res, cot):
        (tsorted, starts, counts, big_list, pbases, pkeys, ares, tbases,
         tkeys, bg, C_out, final_t) = res
        pmeta = pres_meta(pbases, pkeys)
        gC, gT = cot

        cot_packs, fwd_packs = [], []
        dbg = jnp.zeros((3,), jnp.float32)
        for i in range(n_passes):
            out_nobg = C_out[i] - final_t[i][..., None] * bg[None, None, :]
            gt_eff = gT[i] + jnp.einsum("tpc,c->tp", gC[i], bg,
                                        precision=_HIGH)
            cot_packs.append(jnp.concatenate(
                [gC[i], gt_eff[..., None],
                 jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1))
            fwd_packs.append(jnp.concatenate(
                [out_nobg, final_t[i][..., None],
                 jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1))
            dbg = dbg + jnp.einsum("tpc,tp->c", gC[i], final_t[i],
                                   precision=_HIGH)

        real_end = starts[T_tiles - 1] + counts[T_tiles - 1]
        if D > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as SP
            pad = T_shpad - T_tiles
            starts_p = jnp.concatenate(
                [starts, jnp.full((pad,), 1, jnp.int32) * real_end])
            counts_p = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)])
            tbase = jnp.arange(D, dtype=jnp.int32) * T_local
            cps = jnp.stack([jnp.concatenate(
                [c, jnp.zeros((pad, P_PIX, 8), jnp.float32)]) for c in
                cot_packs])
            fps = jnp.stack([jnp.concatenate(
                [f, jnp.zeros((pad, P_PIX, 8), jnp.float32)]) for f in
                fwd_packs])

            def sbwd(tb, st, ct, tab, cp, fp, tmb, tmk, amb, amk, bl):
                eg_list = []
                for i in range(n_passes):
                    (eg,) = calls[i][1](tb, jnp.ones((2,), jnp.float32), st, ct, tab, cp[i], fp[i])
                    eg_list.append(eg)
                gtab = _build_gtab(eg_list)
                # each shard keeps only its own tiles' entry gradients; the
                # rest of its egrad buffer is garbage (incl. the head-merge
                # block shared with the neighbouring shard's boundary tile)
                lo = st[0]
                hi = st[T_local - 1] + ct[T_local - 1]
                pos = jnp.arange(R_L, dtype=jnp.int32)
                live = (pos >= lo) & (pos < hi)
                gtab = jnp.where(live[None, :], gtab, 0.0)
                rtab = _reduce_rank(gtab, tile_meta(tmb, tmk), (amb, amk), bl)
                return jax.lax.psum(rtab, mesh_axis)

            spec_tree = lambda t: jax.tree_util.tree_map(lambda _: SP(), t)  # noqa: E731
            amb, amk = ares if tiered else ((), ())
            rtab = shard_map(
                sbwd, mesh=mesh,
                in_specs=(SP(mesh_axis), SP(mesh_axis), SP(mesh_axis), SP(),
                          SP(None, mesh_axis), SP(None, mesh_axis),
                          spec_tree(tbases), spec_tree(tkeys),
                          spec_tree(amb), spec_tree(amk), SP()),
                out_specs=SP(), check_vma=False)(
                    tbase, starts_p, counts_p, tsorted, cps, fps,
                    tbases, tkeys, amb, amk, big_list)
        else:
            zb = jnp.zeros((1,), jnp.int32)
            eg_list = []
            for i in range(n_passes):
                (eg,) = calls[i][1](zb, jnp.ones((2,), jnp.float32),
                                    starts, counts, tsorted,
                                    cot_packs[i], fwd_packs[i])
                eg_list.append(eg)
            gtab = _build_gtab(eg_list)
            # zero everything outside the real tile segments: the dead
            # bucket 0 (invalid entries + rank-pass holes) and the sentinel
            # tail are never written by the blend backward, and the
            # inverse's exact matmuls must not see NaN garbage there
            pos = jnp.arange(R_L, dtype=jnp.int32)
            live = pos < real_end
            if tiered:
                live = live & (pos >= starts[0])
            gtab = jnp.where(live[None, :], gtab, 0.0)
            rtab = _reduce_rank(gtab, tile_meta(tbases, tkeys), ares,
                                big_list)

        orig = radix_unpartition(rtab, pmeta, interpret=interpret)[:, :n]

        dmean2d = jnp.stack([orig[0], orig[1]], axis=1)
        dconic = jnp.stack([orig[2], orig[3], orig[4]], axis=1)
        dop = orig[5]
        dabs = jnp.stack([orig[6], orig[7]], axis=1)
        dcolors = jnp.stack(
            [jnp.stack([orig[8 + 3 * i + c] for c in range(3)], axis=1)
             for i in range(n_passes)])
        d_depth = jnp.zeros((n,), jnp.float32)
        zi = lambda shape: np.zeros(shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dop, dcolors, dabs, dbg,
                d_depth, zi((n, 2)), zi((n, 2)), zi((n,)), zi((n,)))

    blend.defvjp(fwd, bwd)
    return blend


@functools.lru_cache(maxsize=32)
def _make_gather_blend_vjp(grid: TileGrid, K: int, n: int, d_max: int,
                           n_passes: int = 1, d_small: int = 4,
                           big_fraction: float = 0.16):
    """Sort-2 + gather binning (v4, the CUDA-shaped pipeline).

    One [tile | depth] key sort carries ONLY the slot index; the entry
    table materializes via an XLA row-gather of the per-Gaussian attribute
    matrix, and the backward reduces per-entry gradients with one batched
    scatter-add by Gaussian id — no payload-laden sort and no un-sort.
    This is exactly the reference CUDA decomposition (radix-sort keys +
    per-entry fetch + atomicAdd, rasterizer_impl.cu:303-311,
    backward.cu:568-603) expressed with XLA's sort/gather/scatter.
    """
    T_tiles = grid.num_tiles
    d1 = min(d_small, d_max)
    d2_extra = d_max - d1
    # min(..., n): the big_list builder slices sort(bkey)[:m_cap] of an
    # n-length array, so m_cap > n would silently shrink the tier-2 pieces
    # and desync them from the R computed here (caught by the r3 verify
    # drive's 3-gaussian scene)
    m_cap = min(max(int(n * big_fraction), 8), n) if d2_extra > 0 else 0
    slots1 = n * d1
    slots2 = m_cap * d2_extra
    R = slots1 + slots2
    R_pad = ((R + K - 1) // K) * K + 2 * K
    table_w = ((6 + 3 * n_passes + 7) // 8) * 8
    calls = [_make_pallas_calls(grid, K, R_pad, table_w, 6 + 3 * i)
             for i in range(n_passes)]

    def _bin(mean2d, conic, opacity, colors_stack, depth, rect_min,
             rect_max, tiles_touched, valid):
        rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)

        def tile_of_cell(rmin, rw, cell):
            ty = rmin[:, 1:2] + cell // rw[:, None]
            tx = rmin[:, 0:1] + cell % rw[:, None]
            return (ty * grid.grid_x + tx).astype(jnp.int32)

        cells1 = jnp.arange(d1, dtype=jnp.int32)[None, :]
        tile1 = tile_of_cell(rect_min, rect_w, cells1)
        dup1 = (cells1 < tiles_touched[:, None]) & valid[:, None]
        key1, depth_bits = _quantized_keys(tile1, depth, dup1, n, d1, T_tiles)
        keys = [key1]
        if m_cap > 0:
            is_big = (tiles_touched > d1) & valid
            rank = jnp.cumsum(is_big) - 1
            ok = is_big & (rank < m_cap)
            big_list = jnp.full((m_cap,), n, jnp.int32).at[
                jnp.where(ok, rank, m_cap)].set(
                    jnp.arange(n, dtype=jnp.int32), mode="drop")
            bl = jnp.minimum(big_list, n - 1)
            cells2 = d1 + jnp.arange(d2_extra, dtype=jnp.int32)[None, :]
            tile2 = tile_of_cell(rect_min[bl], rect_w[bl], cells2)
            dup2 = (cells2 < tiles_touched[bl][:, None]) & (big_list < n)[:, None]
            key2, _db = _quantized_keys(tile2, depth[bl], dup2, m_cap,
                                        d2_extra, T_tiles)
            keys.append(key2)
        else:
            big_list = jnp.zeros((0,), jnp.int32)
        key_all = jnp.concatenate(keys) if len(keys) > 1 else keys[0]

        flat = jnp.arange(R, dtype=jnp.int32)
        sorted_key, sorted_flat = jax.lax.sort((key_all, flat), num_keys=1)

        # entry -> Gaussian id, then one row-gather builds the whole table
        if m_cap > 0:
            t2row = jnp.clip((sorted_flat - slots1) // d2_extra, 0, m_cap - 1)
            gid = jnp.where(sorted_flat < slots1, sorted_flat // d1,
                            big_list[t2row])
        else:
            gid = sorted_flat // d1
        gid = jnp.minimum(gid, n)          # invalid slots -> zero column
        acols = [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1],
                 conic[:, 2], opacity]
        for i in range(n_passes):
            acols += [colors_stack[i, :, 0], colors_stack[i, :, 1],
                      colors_stack[i, :, 2]]
        A = jnp.stack([jnp.concatenate([c, jnp.zeros((1,), jnp.float32)])
                       for c in acols])                       # [w, n+1]
        table = A[:, gid]                                    # [w, R] gather
        table = jnp.concatenate(
            [table, jnp.zeros((table_w - table.shape[0], R), jnp.float32)],
            axis=0)
        table = jnp.concatenate(
            [table, jnp.zeros((table_w, R_pad - R), jnp.float32)], axis=1)

        bounds = (jnp.arange(T_tiles + 1, dtype=jnp.uint32)
                  << jnp.uint32(depth_bits))
        starts = jnp.searchsorted(sorted_key, bounds,
                                  side="left").astype(jnp.int32)
        counts = starts[1:] - starts[:-1]
        return table, gid, starts, counts

    def forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                rect_max, tiles_touched, valid, bg):
        table, gid, starts, counts = _bin(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid)
        zb = jnp.zeros((1,), jnp.int32)
        Cs, Ts = [], []
        for i in range(n_passes):
            (pack,) = calls[i][0](zb, jnp.ones((2,), jnp.float32), starts, counts, table)
            final_t = pack[:, :, 3]
            Cs.append(pack[:, :, 0:3] + final_t[..., None] * bg[None, None, :])
            Ts.append(final_t)
        return jnp.stack(Cs), jnp.stack(Ts), table, gid, starts, counts

    @jax.custom_vjp
    def blend(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
              depth, rect_min, rect_max, tiles_touched, valid):
        del absgrad_hook
        out = forward(mean2d, conic, opacity, colors_stack, depth, rect_min,
                      rect_max, tiles_touched, valid, bg)
        return out[0], out[1]

    def fwd(mean2d, conic, opacity, colors_stack, absgrad_hook, bg,
            depth, rect_min, rect_max, tiles_touched, valid):
        del absgrad_hook
        C, T, table, gid, starts, counts = forward(
            mean2d, conic, opacity, colors_stack, depth, rect_min, rect_max,
            tiles_touched, valid, bg)
        return (C, T), (table, gid, starts, counts, bg, C, T)

    def bwd(res, cot):
        table, gid, starts, counts, bg, C_out, final_t = res
        gC, gT = cot

        geo_rows = None
        color_rows = []
        dbg = jnp.zeros((3,), jnp.float32)
        for i in range(n_passes):
            out_nobg = C_out[i] - final_t[i][..., None] * bg[None, None, :]
            gt_eff = gT[i] + jnp.einsum("tpc,c->tp", gC[i], bg,
                                        precision=_HIGH)
            cot_pack = jnp.concatenate(
                [gC[i], gt_eff[..., None],
                 jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1)
            fwd_pack = jnp.concatenate(
                [out_nobg, final_t[i][..., None],
                 jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1)
            (eg,) = calls[i][1](jnp.zeros((1,), jnp.int32),
                                jnp.ones((2,), jnp.float32), starts, counts,
                                table, cot_pack, fwd_pack)
            g_geo = jnp.concatenate([eg[0:6, :R], eg[9:11, :R]], axis=0)
            geo_rows = g_geo if geo_rows is None else geo_rows + g_geo
            color_rows.append(eg[6:9, :R])
            dbg = dbg + jnp.einsum("tpc,tp->c", gC[i], final_t[i],
                                   precision=_HIGH)

        rows = [geo_rows[j] for j in range(8)]
        for cr in color_rows:
            rows += [cr[0], cr[1], cr[2]]
        gtab = jnp.stack(rows)                               # [8+3np, R]
        covered = (jnp.arange(R, dtype=jnp.int32) < starts[T_tiles])[None, :]
        gtab = jnp.where(covered, gtab, 0.0)
        # one batched deterministic scatter-add replaces backward.cu's
        # per-Gaussian atomicAdd (backward.cu:568-603)
        acc = jnp.zeros((gtab.shape[0], n + 1), jnp.float32
                        ).at[:, gid].add(gtab)[:, :n]

        dmean2d = jnp.stack([acc[0], acc[1]], axis=1)
        dconic = jnp.stack([acc[2], acc[3], acc[4]], axis=1)
        dop = acc[5]
        dabs = jnp.stack([acc[6], acc[7]], axis=1)
        dcolors = jnp.stack(
            [jnp.stack([acc[8 + 3 * i + c] for c in range(3)], axis=1)
             for i in range(n_passes)])
        d_depth = jnp.zeros((n,), jnp.float32)
        zi = lambda shape: np.zeros(shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dop, dcolors, dabs, dbg,
                d_depth, zi((n, 2)), zi((n, 2)), zi((n,)), zi((n,)))

    blend.defvjp(fwd, bwd)
    return blend


def rasterize_pallas_multi(mean2d, conic, opacity, colors_list, absgrad_hook,
                           pre_depth, pre_rect_min, pre_rect_max,
                           pre_tiles_touched, pre_valid, bg, *,
                           grid: TileGrid, chunk: int = 256,
                           max_tiles_per_gaussian: int = 16,
                           d_small: int = 4, big_fraction: float = 0.16,
                           binning: str = "sort", mesh=None,
                           mesh_axis: str = "tiles", pack16: bool = True,
                           grads_sharded: bool = False,
                           return_aux: bool = False,
                           send_beta: float = 2.0,
                           stream_merge: bool = True,
                           ndc_scale=None, sat_super=None):
    """Render several color sets over one shared sorted geometry.

    sat_super: optional [sy, sx] per-supertile saturation-depth map (see
    pool_sat_depth) enabling the pre-sort saturation cull on the
    single-chip sort engine; with return_aux the per-tile exit depths come
    back as aux["sat_depth"] to feed the next step's map. None disables
    both (identical results by construction).

    Returns list of (color [H,W,3], final_T [H,W]) per color set.
    binning: "sort" (single wide lax.sort — the production engine,
    single-chip AND sharded), "partition" (radix partition engine; under a
    mesh it replicates binning and shards only the kernels), or "gather"
    (the CUDA-shaped pipeline, kept for A/B). Under a mesh the sort engine
    shards Gaussians across devices and exchanges binned entries with one
    all-to-all (_make_sharded_sort_blend_vjp).

    pack16 color contract (pack-v2): color sets are quantized to 10-bit
    fixed point over [-0.5, 1.5) in the entry table — raw/toned SH colors
    live there by construction; wider-range sets (the depth pass) must be
    normalized by the caller (compositing is linear in color, so scaling
    commutes with the blend; see models/renderer.py).

    ndc_scale: optional traced (sx, sy) = (0.5*W, 0.5*H) NDC factors for
    the fused abs-gradient channel (reference backward.cu:593-595). The
    absgrad_hook cotangent is [N,2] with channel 0 = sx*sum|dx| +
    sy*sum|dy| and channel 1 = 0 for the sort engines; the
    partition/gather engines return per-axis pixel-unit channels
    pre-multiplied by ndc_scale. Either way callers consume
    g_abs.sum(-1). Default (1, 1).
    """
    n = mean2d.shape[0]
    ndc = (jnp.ones((2,), jnp.float32) if ndc_scale is None
           else jnp.asarray(ndc_scale, jnp.float32).reshape(2))
    # pack-v2 rgb10 rows encode [-0.5, 1.5): SH colors can EXCEED 1.5
    # (evaluated SH sums several basis terms even with per-coefficient
    # caps), so each color pass is auto-normalized by a stop-gradient
    # per-pass scale s >= 1 OUTSIDE the custom_vjp (compositing is linear
    # in color: out = s * blend(c/s, bg/s); JAX AD handles the chain, the
    # engines see in-range colors). s == 1 whenever colors already fit.
    color_scales = None
    if pack16 and binning == "sort":
        color_scales = [jax.lax.stop_gradient(jnp.maximum(
            1.0, (jnp.max(c) + 1e-6) * (1.0 / 1.49)))
            for c in colors_list]
        colors_list = [c / s for c, s in zip(colors_list, color_scales)]
    if mesh is not None and binning == "gather":
        binning = "sort"        # gather has no sharded path
    if mesh is not None and binning == "sort":
        D = int(mesh.shape[mesh_axis])
        if n % D:
            raise ValueError(
                f"sharded sort engine needs n ({n}) divisible by the mesh "
                f"axis ({D}); pad the Gaussian capacity")
        blend = _make_sharded_sort_blend_vjp(
            grid, chunk, n, max_tiles_per_gaussian, len(colors_list),
            d_small, big_fraction, mesh, mesh_axis, pack16,
            send_beta=send_beta, grads_sharded=grads_sharded,
            stream_merge=stream_merge)
    elif binning == "partition":
        # the partition/gather engines bin raw rect cells (no corner-cull
        # compaction), so they need the raw-rect slot budget: the default
        # d_small=4 is calibrated for the sort path's visible-cell
        # histogram (p86 <= 4), not the raw one (p90 = 6)
        blend = _make_partition_blend_vjp(
            grid, chunk, n, max_tiles_per_gaussian, len(colors_list),
            max(d_small, 6), big_fraction, mesh,
            mesh_axis if mesh is not None else "tiles")
    elif binning == "gather":
        blend = _make_gather_blend_vjp(grid, chunk, n, max_tiles_per_gaussian,
                                       len(colors_list), max(d_small, 6),
                                       big_fraction)
    else:
        blend = _make_pallas_blend_vjp(grid, chunk, n, max_tiles_per_gaussian,
                                       len(colors_list), d_small,
                                       big_fraction, pack16)
    stack = jnp.stack(colors_list)
    sat_depth = None
    if binning == "sort":
        # bg rides INSIDE blend as pack + T*bg: feed bg/s per pass and
        # rescale the outputs so out_i = s_i*pack_i + T*bg exactly.
        # The per-pass bg is folded below; blend itself gets bg=0 when
        # scaling is active and the T*bg term is re-added scaled.
        eff_bg = jnp.zeros_like(bg) if color_scales is not None else bg
        if mesh is None:
            sat_in = (jnp.full(supertile_shape(grid), jnp.inf, jnp.float32)
                      if sat_super is None else sat_super)
            out = blend(mean2d, conic, opacity, stack, absgrad_hook,
                        eff_bg, pre_depth, pre_rect_min, pre_rect_max,
                        jnp.minimum(pre_tiles_touched,
                                    max_tiles_per_gaussian),
                        pre_valid, ndc, sat_in)
            sat_depth = out[2]
            out = out[:2]
        else:
            out = blend(mean2d, conic, opacity, stack, absgrad_hook,
                        eff_bg, pre_depth, pre_rect_min, pre_rect_max,
                        jnp.minimum(pre_tiles_touched,
                                    max_tiles_per_gaussian),
                        pre_valid, ndc)
    else:
        # per-axis engines: pre-scaling the (zero) hook scales its
        # cotangent by ndc (d/dh f(h*s) = s * f'(h*s); forward unchanged)
        out = blend(mean2d, conic, opacity, stack,
                    absgrad_hook * ndc[None, :], bg,
                    pre_depth, pre_rect_min, pre_rect_max,
                    jnp.minimum(pre_tiles_touched, max_tiles_per_gaussian),
                    pre_valid)
    # the sharded engine also reports its send-cap drop count (no silent
    # caps); single-chip engines never truncate the exchange
    C_t, T_t = out[0], out[1]
    send_drops = out[2] if len(out) > 2 else jnp.int32(0)
    if color_scales is not None:
        # undo the per-pass normalization and re-add the background term
        # (blend ran with bg=0): out_i = s_i*pack_i + T*bg
        C_t = jnp.stack([C_t[i] * color_scales[i]
                         + T_t[i][..., None] * bg[None, None, :]
                         for i in range(len(colors_list))])
    images = [(tiles_to_image(C_t[i], grid), tiles_to_image(T_t[i], grid))
              for i in range(len(colors_list))]
    if return_aux:
        aux = {"send_drops": send_drops}
        if sat_depth is not None:
            aux["sat_depth"] = sat_depth
        return images, aux
    return images


def rasterize_pallas(mean2d, conic, opacity, colors, absgrad_hook,
                     pre_depth, pre_rect_min, pre_rect_max, pre_tiles_touched,
                     pre_valid, bg, *, grid: TileGrid, chunk: int = 256,
                     max_tiles_per_gaussian: int = 16,
                     d_small: int = 4, big_fraction: float = 0.16,
                     binning: str = "sort", pack16: bool = True,
                     ndc_scale=None):
    """Single-pass wrapper around rasterize_pallas_multi."""
    (out,) = rasterize_pallas_multi(
        mean2d, conic, opacity, [colors], absgrad_hook, pre_depth,
        pre_rect_min, pre_rect_max, pre_tiles_touched, pre_valid, bg,
        grid=grid, chunk=chunk, max_tiles_per_gaussian=max_tiles_per_gaussian,
        d_small=d_small, big_fraction=big_fraction, binning=binning,
        pack16=pack16, ndc_scale=ndc_scale)
    return out
