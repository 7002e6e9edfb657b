"""Bitonic D-stream merge network with recorded swap bits.

The sharded sort engine (rasterize_pallas._make_sharded_sort_blend_vjp)
receives D already-sorted [tile|depth] streams from the all-to-all and —
through round 4 — re-sorted the concatenated RB = D*C table from scratch
each way (fwd receiver merge + bwd un-sort). Those two full-width
`lax.sort`s are the dominant term in the projected multi-chip scaling
deficit (tools/scaling_model.py: 56% vs the >=80% target at D=8).

This module replaces both with a MERGE network that exploits the streams
being pre-sorted (the work `lax.sort` cannot skip):

  * forward: a Batcher bitonic merge tree — log2(D) pairwise levels, each
    one flip-stage (compare a[i] vs b[L-1-i] across the two ascending
    runs) followed by log2(L) plain strided compare-exchange stages.
    Total stages = log2(D)*log2(C) + O(log^2 D), vs the full sort's
    log^2(RB)/2 — and every stage is a data-independent elementwise
    select, so a Pallas implementation runs at HBM bandwidth with all
    strides below the block size fused into one VMEM pass (the lever the
    flat `lax.sort` fundamentally lacks; see tools/profiles/DESIGN_SORT.md).
  * every stage records one swap bit per pair, packed into u32 words
    ([n_words, N]); `replay_inverse` applies the recorded stages in
    reverse, routing per-entry BACKWARD gradients from merged order back
    to receive order exactly — no second sort, no index payload row.
  * ties: compare is lexicographic on (key, source-position), which makes
    the merge EQUAL to the engine's stable `lax.sort` for every input
    (stable sort with concat-order input == tiebreak by source index),
    so the sharded parity tests stay bit-green even on tied keys.

Displaces the device-wide CUB radix re-sort of the reference's
multi-GPU-style binning (diff-gaussian-rasterization
rasterizer_impl.cu:303-311) with merge reuse CUDA never attempts.

Pure-JAX network here (runs everywhere, incl. the CPU-mesh tests and the
driver dryrun); the Pallas pass kernels ride the same static stage spec
(see ops/bitonic_pallas.py).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Stage(NamedTuple):
    kind: str       # "flip" | "stride"
    length: int     # flip: run length L (pairs span 2L); stride: stride s
    bit: int        # global stage index (bit position = bit % 32)


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 0) if x > 1 else 1


def merge_stages(n_streams: int, stream_len: int):
    """Static stage spec for merging `n_streams` ascending runs of
    `stream_len` (both powers of two) into one ascending run."""
    assert n_streams & (n_streams - 1) == 0, n_streams
    assert stream_len & (stream_len - 1) == 0, stream_len
    stages, bit = [], 0
    run = stream_len
    while run < n_streams * stream_len:
        stages.append(Stage("flip", run, bit)); bit += 1
        s = run // 2
        while s >= 1:
            stages.append(Stage("stride", s, bit)); bit += 1
            s //= 2
        run *= 2
    return stages


def n_bit_words(n_streams: int, stream_len: int) -> int:
    st = merge_stages(n_streams, stream_len)
    return (len(st) + 31) // 32 if st else 0


def _pairs(x, stage: Stage):
    """View flat [..., N] as compare-exchange pairs (lo, hi) for `stage`.
    Returns (lo, hi, restore) where restore(lo, hi) rebuilds flat."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    if stage.kind == "flip":
        L = stage.length
        v = x.reshape(lead + (n // (2 * L), 2, L))
        lo, hi = v[..., 0, :], v[..., 1, ::-1]

        def restore(lo, hi):
            return jnp.stack([lo, hi[..., ::-1]], axis=-2).reshape(
                lead + (n,))
    else:
        s = stage.length
        v = x.reshape(lead + (n // (2 * s), 2, s))
        lo, hi = v[..., 0, :], v[..., 1, :]

        def restore(lo, hi):
            return jnp.stack([lo, hi], axis=-2).reshape(lead + (n,))
    return lo, hi, restore


@partial(jax.jit, static_argnames=("n_streams",))
def bitonic_merge(key, rows, n_streams: int):
    """Merge `n_streams` equal-length ascending (by key, u32) runs.

    key:  [N] u32, N = n_streams * stream_len (both powers of two);
          each run ascending (pad runs with 0xFFFFFFFF to reach pow2).
    rows: [nr, N] u32 payload rows, permuted along with the key.
    Returns (key_sorted [N], rows_sorted [nr, N], bits [n_words, N]).

    Exactly equal to `lax.sort((key, iota, *rows), num_keys=1)` (stable)
    for every input: ties break by source position.
    """
    N = key.shape[-1]
    stream_len = N // n_streams
    stages = merge_stages(n_streams, stream_len)
    idx = jnp.arange(N, dtype=jnp.uint32)
    bits = [jnp.zeros((N,), jnp.uint32)
            for _ in range(n_bit_words(n_streams, stream_len))]
    for st in stages:
        k_lo, k_hi, rk = _pairs(key, st)
        i_lo, i_hi, ri = _pairs(idx, st)
        swap = (k_lo > k_hi) | ((k_lo == k_hi) & (i_lo > i_hi))
        key = rk(jnp.where(swap, k_hi, k_lo), jnp.where(swap, k_lo, k_hi))
        idx = ri(jnp.where(swap, i_hi, i_lo), jnp.where(swap, i_lo, i_hi))
        w = st.bit // 32
        b_lo, b_hi, rb = _pairs(bits[w], st)
        bit = jnp.where(swap, jnp.uint32(1) << jnp.uint32(st.bit % 32),
                        jnp.uint32(0))
        # bit lives at the LOW position of each pair; replay re-derives
        # the pairing from the same static spec (other stages' bits in
        # this word sit at their own pairings' low positions — preserved)
        bits[w] = rb(b_lo | bit, b_hi)
        r_lo, r_hi, rr = _pairs(rows, st)
        rows = rr(jnp.where(swap[None], r_hi, r_lo),
                  jnp.where(swap[None], r_lo, r_hi))
    return key, rows, jnp.stack(bits) if bits else jnp.zeros(
        (0, N), jnp.uint32)


@partial(jax.jit, static_argnames=("n_streams",))
def replay_forward(bits, rows, n_streams: int):
    """Apply the recorded merge permutation to fresh rows (receive order
    -> merged order) without comparing keys."""
    return _replay(bits, rows, n_streams, reverse=False)


@partial(jax.jit, static_argnames=("n_streams",))
def replay_inverse(bits, rows, n_streams: int):
    """Route rows aligned to MERGED positions back to their original
    (receive-order) positions: apply the recorded stages in reverse.
    Each stage is an involution on positions, so reversing the stage
    order inverts the whole network."""
    return _replay(bits, rows, n_streams, reverse=True)


def _replay(bits, rows, n_streams: int, *, reverse: bool):
    N = rows.shape[-1]
    stages = merge_stages(n_streams, N // n_streams)
    for st in (reversed(stages) if reverse else stages):
        b_lo, _, _ = _pairs(bits[st.bit // 32], st)
        swap = (b_lo >> jnp.uint32(st.bit % 32)) & jnp.uint32(1)
        swap = swap.astype(bool)
        r_lo, r_hi, rr = _pairs(rows, st)
        rows = rr(jnp.where(swap[None], r_hi, r_lo),
                  jnp.where(swap[None], r_lo, r_hi))
    return rows


def pad_streams(rows_u32, n_streams: int, stream_len: int, fill_key):
    """[nr, D*C] stream-concatenated rows -> [nr, D2*C2] with each stream
    tail-padded to C2 = pow2ceil(C) (row 0 padded with `fill_key`, the
    rest with 0) and the stream count padded to D2 = pow2ceil(D) with
    all-`fill_key` streams. Returns (padded, C2, D2)."""
    nr = rows_u32.shape[0]
    C, D = stream_len, n_streams
    C2, D2 = _pow2ceil(C), _pow2ceil(D)
    v = rows_u32.reshape(nr, D, C)
    fills = jnp.concatenate(
        [jnp.full((1, D, C2 - C), fill_key, jnp.uint32),
         jnp.zeros((nr - 1, D, C2 - C), jnp.uint32)]) if C2 > C else None
    if fills is not None:
        v = jnp.concatenate([v, fills], axis=-1)
    if D2 > D:
        tail = jnp.concatenate(
            [jnp.full((1, D2 - D, C2), fill_key, jnp.uint32),
             jnp.zeros((nr - 1, D2 - D, C2), jnp.uint32)], axis=0)
        v = jnp.concatenate([v, tail], axis=1)
    return v.reshape(nr, D2 * C2), C2, D2


def unpad_streams(rows_u32, n_streams: int, stream_len: int, C2: int,
                  D2: int):
    """Inverse of pad_streams on receive-order rows: [nr, D2*C2] ->
    [nr, D*C] (drop per-stream pad tails + pad streams)."""
    nr = rows_u32.shape[0]
    v = rows_u32.reshape(nr, D2, C2)[:, :n_streams, :stream_len]
    return v.reshape(nr, n_streams * stream_len)
