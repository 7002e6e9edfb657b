"""Pallas TPU stable radix partition/sort engine.

TPU-native replacement for the wide `lax.sort` calls of the rasterization
pipeline (the reference uses CUB radix sort, rasterizer_impl.cu:303-311).
XLA's TPU sort of a ~10M-entry, 11-payload table costs ~110 ms on a v5e;
this engine does the same stable reorder in a handful of linear passes.

Design (LSB-first stable radix, digits of B=16):

  - The data is an f32 table [rows, R]; row 0 carries the integer sort key
    (exactly representable in f32, key < 2^24). Payload rows ride along.
  - Each pass partitions the whole array into B buckets by one digit,
    stably, with a sequential-grid Pallas kernel:
      * chunks of E=256 entries are DMA'd to VMEM (double-buffered)
      * an in-chunk stable grouping permutation by digit: ranks come from
        an inclusive-prefix matmul over the 0/1 digit mask, applied with an
        exact one-hot matmul on the MXU (0/1 x f32 products with a single
        nonzero term per output are exact at HIGHEST precision)
      * each bucket's run is appended to a per-bucket VMEM ring [rows, 2E]
        with dynamic lane rolls; full E-blocks flush to HBM via async DMA.
        All HBM writes are E-aligned: bucket bases are rounded up to E, so
        flush cursors stay aligned by construction.
  - Bucket regions are padded: each region tail gap is filled with sentinel
    entries (key = keyspace-1, zero payload). Gaps add exactly B*E entries
    per pass, keeping every shape static. Sentinels carry max digits, so
    they migrate to the tail of later passes; the final layout is all real
    entries in stable key order (contiguous per key) with sentinel-filled
    gaps only between the last pass's B digit groups, plus a sentinel tail.
  - The inverse (gradient un-permutation) replays passes in reverse: for
    each original-order chunk the digits are recomputed from the saved
    pass-input key row, the needed entries are pulled from the B bucket
    streams (aligned E-block reads into per-bucket read rings), assembled,
    and un-permuted with the transposed one-hot matmul. Hole entries from
    earlier passes are reconstructed in place and drop out pass by pass;
    their payloads are moved but never mixed arithmetically with real
    entries (masked selects keep them out of the matmuls' live lanes).

Used for both the per-Gaussian depth presort (key = monotone positive-f32
depth bits) and the per-entry tile partition (key = tile id); together they
replace the reference's 64-bit [tile | depth] radix sort.
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis, *, interpret):
    """Dynamic circular roll; pltpu.roll on TPU, jnp.roll when interpreted."""
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift, axis=axis)


class PartitionMeta(NamedTuple):
    """Static + traced context shared by partition and unpartition."""
    E: int
    B: int
    L: int                      # number of passes
    R0: int                     # input length
    num_buckets: int
    keyspace: int               # B**L; sentinel key = keyspace - 1
    bases: tuple                # per pass: [B+1] i32 aligned bucket bases
    saved_keys: tuple           # per pass: [R_p] f32 key row of pass input


def num_passes(num_buckets: int, B: int = 16) -> int:
    """Passes needed; key keyspace-1 is reserved for sentinel/hole entries."""
    L = 1
    while B ** L < num_buckets + 1:
        L += 1
    return L


def _digit_counts(keys, p: int, B: int):
    """[B] i32 digit-p histogram of `keys` (f32 exact integers)."""
    scale = 1.0 / float(B ** p)
    d = jnp.floor(keys * scale)
    d = d - jnp.floor(d / B) * B
    oneh = d[:, None] == jnp.arange(B, dtype=keys.dtype)[None, :]
    return jnp.sum(oneh, axis=0, dtype=jnp.int32)


def _aligned_bases(counts, E: int):
    """[B+1] i32 exclusive prefix of roundup-to-E region sizes."""
    sizes = ((counts + (E - 1)) // E) * E
    return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(sizes).astype(jnp.int32)])


def histogram(keys, num_buckets: int):
    """[num_buckets] i32 histogram of f32 integer keys via a factorized
    one-hot matmul (0/1 bf16 products are exact; f32 accumulation)."""
    F1 = 64
    F2 = (num_buckets + F1 - 1) // F1
    k = keys
    hi = jnp.floor(k / F2)
    lo = k - hi * F2
    oh_hi = (hi[:, None] == jnp.arange(F1, dtype=k.dtype)[None, :]
             ).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(F2, dtype=k.dtype)[None, :]
             ).astype(jnp.bfloat16)
    h2 = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return h2.reshape(-1)[:num_buckets].astype(jnp.int32)


# --------------------------------------------------------------------------
# in-chunk permutation (shared by forward and inverse kernels)
# --------------------------------------------------------------------------

def chunk_perm(keys_1E, p: int, B: int, E: int):
    """Stable grouping permutation of one chunk by digit p of its keys.

    keys_1E: [1, E] f32 integer keys. Returns (P_row [E, E] f32 one-hot with
    P_row[j, lane] = [rank(lane) == j], counts, runs: python lists of B
    scalar f32 per-bucket counts and exclusive run starts).
    """
    scale = 1.0 / float(B ** p)
    d = jnp.floor(keys_1E * scale)
    d = d - jnp.floor(d * (1.0 / B)) * B                      # [1, E]
    # NOTE: Mosaic only supports integer iota; cast afterwards
    iota_be = jax.lax.broadcasted_iota(jnp.int32, (B, E), 0).astype(jnp.float32)
    M = (iota_be == d).astype(jnp.float32)                    # [B, E]
    rr = jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)
    triu = (rr <= cc).astype(jnp.float32)
    prefix = jax.lax.dot_general(M, triu, (((1,), (0,)), ((), ())),
                                 precision=_HIGH,
                                 preferred_element_type=jnp.float32)  # [B,E]
    counts, runs = [], []
    run = jnp.float32(0.0)
    for b in range(B):
        cb = jnp.sum(M[b])
        counts.append(cb)
        runs.append(run)
        run = run + cb
    rank = jnp.zeros((1, E), jnp.float32)
    for b in range(B):
        rank = rank + M[b:b + 1] * (runs[b] + prefix[b:b + 1] - 1.0)
    iota_ee = jax.lax.broadcasted_iota(jnp.int32, (E, E), 0).astype(jnp.float32)
    P_row = (iota_ee == rank).astype(jnp.float32)             # [j, lane]
    return P_row, counts, runs


def _apply_perm(data, P_row):
    """grouped[r, j] = data[r, lane with rank==j] — exact 0/1 matmul."""
    return jax.lax.dot_general(data, P_row, (((1,), (1,)), ((), ())),
                               precision=_HIGH,
                               preferred_element_type=jnp.float32)


def _apply_perm_inv(grouped, P_row):
    """orig[r, lane] = grouped[r, rank(lane)] — transposed contraction."""
    return jax.lax.dot_general(grouped, P_row, (((1,), (0,)), ((), ())),
                               precision=_HIGH,
                               preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# forward pass kernel
# --------------------------------------------------------------------------

def _pass_kernel(bases_ref, in_hbm, out_hbm,
                 ibuf, isem, stage, fbuf, fsem,
                 fill_s, rbase_s, cursor_s, oflag_s,
                 *, rows, E, B, p, R_out, n_chunks, CPB, sentinel, interpret,
                 tail_blocks, key_row=0):
    pid = pl.program_id(0)
    n_super = pl.num_programs(0)
    E2 = 2 * E

    def in_dma(c, slot):
        off = pl.multiple_of(c * E, 128)
        return pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(off, E)], ibuf.at[slot], isem.at[slot])

    @pl.when(pid == 0)
    def _():
        for b in range(B):
            fill_s[b] = 0
            rbase_s[b] = 0
            cursor_s[b] = bases_ref[b]
            oflag_s[b] = 0
        in_dma(0, 0).start()

    def body(j, _):
        c = pid * CPB + j

        @pl.when(c < n_chunks)
        def _():
            slot = jax.lax.rem(c, 2)
            in_dma(c, slot).wait()

            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma(c + 1, 1 - slot).start()

            chunk = ibuf[slot]                                # [rows, E]
            # fast path: a pure-sentinel chunk (the slot-padding pool after
            # pass 0 concentrates into one long run) carries no payload that
            # is ever read back — skip the permutation and ring entirely and
            # emit a sentinel block at the bucket-(B-1) cursor
            all_sent = jnp.min(chunk[key_row, :]) >= float(sentinel)
            fast = all_sent & (fill_s[B - 1] == 0)

            @pl.when(fast)
            def _():
                @pl.when(oflag_s[B - 1] == 1)
                def _():
                    pltpu.make_async_copy(
                        fbuf.at[B - 1],
                        out_hbm.at[:, pl.ds(
                            pl.multiple_of(cursor_s[B - 1] - E, 128), E)],
                        fsem.at[B - 1]).wait()
                rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, E), 0)
                fbuf[B - 1] = jnp.where(rowi == key_row, float(sentinel), 0.0)
                pltpu.make_async_copy(
                    fbuf.at[B - 1],
                    out_hbm.at[:, pl.ds(
                        pl.multiple_of(cursor_s[B - 1], 128), E)],
                    fsem.at[B - 1]).start()
                oflag_s[B - 1] = 1
                cursor_s[B - 1] = cursor_s[B - 1] + E

            @pl.when(jnp.logical_not(fast))
            def _():
                process_chunk(chunk)
        return 0

    def process_chunk(chunk):
        P_row, counts, runs = chunk_perm(
            chunk[key_row:key_row + 1, :], p, B, E)
        grouped = _apply_perm(chunk, P_row)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, E2), 1)

        for b in range(B):
            cb = counts[b].astype(jnp.int32)

            @pl.when(cb > 0)
            def _(b=b, cb=cb):
                run_b = runs[b].astype(jnp.int32)
                fill = fill_s[b]
                rbase = rbase_s[b]
                # ONE fused roll: entry at grouped lane run_b+i lands at
                # ring lane (pos+i) mod 2E (cand duplicates grouped, so
                # (lane - sh) mod 2E always reads grouped[(..) mod E])
                cand = jnp.concatenate([grouped, grouped], axis=1)
                pos = jax.lax.rem(rbase + fill, E2)
                sh = jax.lax.rem(pos - run_b + E2, E2)
                placed = _roll(cand, sh, axis=1, interpret=interpret)
                rel = jax.lax.rem(lane2 - pos + E2, E2)
                stage[b] = jnp.where(rel < cb, placed, stage[b])
                new_fill = fill + cb
                fill_s[b] = new_fill

                @pl.when(new_fill >= E)
                def _():
                    @pl.when(oflag_s[b] == 1)
                    def _():
                        pltpu.make_async_copy(
                            fbuf.at[b],
                            out_hbm.at[:, pl.ds(
                                pl.multiple_of(cursor_s[b] - E, 128), E)],
                            fsem.at[b]).wait()
                    front = _roll(stage[b],
                                  jax.lax.rem(E2 - rbase, E2), axis=1,
                                  interpret=interpret)[:, :E]
                    fbuf[b] = front
                    cur = pl.multiple_of(cursor_s[b], 128)
                    pltpu.make_async_copy(
                        fbuf.at[b], out_hbm.at[:, pl.ds(cur, E)],
                        fsem.at[b]).start()
                    oflag_s[b] = 1
                    cursor_s[b] = cur + E
                    rbase_s[b] = jax.lax.rem(rbase + E, E2)
                    fill_s[b] = new_fill - E

    jax.lax.fori_loop(0, CPB, body, 0)

    @pl.when(pid == n_super - 1)
    def _():
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
        for b in range(B):
            @pl.when(oflag_s[b] == 1)
            def _(b=b):
                pltpu.make_async_copy(
                    fbuf.at[b],
                    out_hbm.at[:, pl.ds(
                        pl.multiple_of(cursor_s[b] - E, 128), E)],
                    fsem.at[b]).wait()
                oflag_s[b] = 0

            @pl.when(fill_s[b] > 0)
            def _(b=b):
                fill = fill_s[b]
                front = _roll(stage[b],
                              jax.lax.rem(E2 - rbase_s[b], E2), axis=1,
                              interpret=interpret)[:, :E]
                mask = lane1 < fill
                rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, E), 0)
                sent_fill = jnp.where(rowi == key_row, float(sentinel), 0.0)
                fbuf[b] = jnp.where(mask, front, sent_fill)
                copy = pltpu.make_async_copy(
                    fbuf.at[b],
                    out_hbm.at[:, pl.ds(pl.multiple_of(cursor_s[b], 128), E)],
                    fsem.at[b])
                copy.start()
                copy.wait()
        # sentinel-fill the tail [bases[B], R_out)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, E), 0)
        fbuf[0] = jnp.where(rowi == key_row, float(sentinel), 0.0)

        def tail(i, cur):
            @pl.when(cur < R_out)
            def _():
                copy = pltpu.make_async_copy(
                    fbuf.at[0],
                    out_hbm.at[:, pl.ds(pl.multiple_of(cur, 128), E)],
                    fsem.at[0])
                copy.start()
                copy.wait()
            return cur + E

        jax.lax.fori_loop(0, tail_blocks, tail, bases_ref[B])


@functools.lru_cache(maxsize=64)
def _make_pass_call(rows, R_in, R_out, E, B, p, sentinel, CPB, interpret,
                    key_row=0):
    n_chunks = R_in // E
    n_super = (n_chunks + CPB - 1) // CPB
    tail_blocks = (R_out - (R_in + (B - 1) * E)) // E + B  # upper bound
    return pl.pallas_call(
        functools.partial(_pass_kernel, rows=rows, E=E, B=B, p=p,
                          R_out=R_out, n_chunks=n_chunks, CPB=CPB,
                          sentinel=sentinel, interpret=interpret,
                          tail_blocks=tail_blocks, key_row=key_row),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_super,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            scratch_shapes=[
                pltpu.VMEM((2, rows, E), jnp.float32),       # ibuf
                pltpu.SemaphoreType.DMA((2,)),               # isem
                pltpu.VMEM((B, rows, 2 * E), jnp.float32),   # stage rings
                pltpu.VMEM((B, rows, E), jnp.float32),       # flush bufs
                pltpu.SemaphoreType.DMA((B,)),               # fsem
                pltpu.SMEM((B,), jnp.int32),                 # fill
                pltpu.SMEM((B,), jnp.int32),                 # rbase
                pltpu.SMEM((B,), jnp.int32),                 # cursor
                pltpu.SMEM((B,), jnp.int32),                 # outstanding
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((rows, R_out), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# inverse pass kernel
# --------------------------------------------------------------------------

def _inv_pass_kernel(bases_ref, keys_hbm, gin_hbm, gout_hbm,
                     kbuf, ksem, rstage, rbuf, rsem, abuf, obuf, osem,
                     avail_s, rbase_s, cursor_s, inflight_s,
                     *, grows, E, B, p, n_chunks, CPB, sentinel, interpret):
    pid = pl.program_id(0)
    n_super = pl.num_programs(0)
    E2 = 2 * E

    def refill_dma(b, cur):
        off = pl.multiple_of(cur, 128)
        return pltpu.make_async_copy(
            gin_hbm.at[:, pl.ds(off, E)], rbuf.at[b], rsem.at[b])

    def keys_dma(sp, slot):
        off = pl.multiple_of(sp * CPB, 8)
        return pltpu.make_async_copy(
            keys_hbm.at[pl.ds(off, CPB), :], kbuf.at[slot],
            ksem.at[slot])

    @pl.when(pid == 0)
    def _():
        for b in range(B):
            avail_s[b] = 0
            rbase_s[b] = 0
            cursor_s[b] = bases_ref[b]
            inflight_s[b] = 0

            @pl.when(bases_ref[b] < bases_ref[b + 1])
            def _(b=b):
                refill_dma(b, bases_ref[b]).start()
                inflight_s[b] = 1
        keys_dma(0, 0).start()

    kslot = jax.lax.rem(pid, 2)
    keys_dma(pid, kslot).wait()

    @pl.when(pid + 1 < n_super)
    def _():
        keys_dma(pid + 1, 1 - kslot).start()

    def body(j, _):
        c = pid * CPB + j

        @pl.when(c < n_chunks)
        def _():
            kc = kbuf[kslot, pl.ds(j, 1), :]                   # [1, E]
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, E2), 1)

            def ensure(b, need):
                @pl.when(avail_s[b] < need)
                def _():
                    refill_dma(b, cursor_s[b]).wait()
                    rb = rbase_s[b]
                    av = avail_s[b]
                    pos = jax.lax.rem(rb + av, E2)
                    cand = jnp.concatenate([rbuf[b], rbuf[b]], axis=1)
                    placed = _roll(cand, pos, axis=1, interpret=interpret)
                    rel = jax.lax.rem(lane2 - pos + E2, E2)
                    rstage[b] = jnp.where(rel < E, placed, rstage[b])
                    avail_s[b] = av + E
                    cur = cursor_s[b] + E
                    cursor_s[b] = cur
                    inflight_s[b] = 0

                    @pl.when(cur < bases_ref[b + 1])
                    def _():
                        refill_dma(b, cur).start()
                        inflight_s[b] = 1

            # fast path: a pure-hole chunk's values are never consumed —
            # advance the bucket-(B-1) stream positionally, skip assembly
            # and un-permute, and emit zeros (hole gradients must read as
            # zero downstream: the final pass feeds per-slot sums, and NaN
            # would poison later passes' exact one-hot matmuls via 0*NaN)
            all_sent = jnp.min(kc) >= float(sentinel)

            @pl.when(all_sent)
            def _():
                ensure(B - 1, E)
                rbase_s[B - 1] = jax.lax.rem(rbase_s[B - 1] + E, E2)
                avail_s[B - 1] = avail_s[B - 1] - E
                write_chunk(c, jnp.zeros((grows, E), jnp.float32))

            @pl.when(jnp.logical_not(all_sent))
            def _():
                process_chunk(c, kc, ensure)
        return 0

    def write_chunk(c, out_chunk):
        oslot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(
                obuf.at[oslot],
                gout_hbm.at[:, pl.ds(pl.multiple_of((c - 2) * E, 128), E)],
                osem.at[oslot]).wait()
        obuf[oslot] = out_chunk
        pltpu.make_async_copy(
            obuf.at[oslot],
            gout_hbm.at[:, pl.ds(pl.multiple_of(c * E, 128), E)],
            osem.at[oslot]).start()

    def process_chunk(c, kc, ensure):
        P_row, counts, runs = chunk_perm(kc, p, B, E)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
        abuf[...] = jnp.zeros((grows, E), jnp.float32)

        for b in range(B):
            cb = counts[b].astype(jnp.int32)

            @pl.when(cb > 0)
            def _(b=b, cb=cb):
                ensure(b, cb)
                rb = rbase_s[b]
                run_b = runs[b].astype(jnp.int32)
                # ONE fused roll: ring lane (rb+i) mod 2E lands at assembly
                # lane run_b+i
                sh = jax.lax.rem(run_b - rb + E2, E2)
                placed = _roll(rstage[b], sh, axis=1,
                               interpret=interpret)[:, :E]
                rel = jax.lax.rem(lane1 - run_b + E, E)
                abuf[...] = jnp.where(rel < cb, placed, abuf[...])
                rbase_s[b] = jax.lax.rem(rb + cb, E2)
                avail_s[b] = avail_s[b] - cb

        # zero hole lanes BEFORE the un-permute: their pulled values may be
        # garbage (mixed chunks select earlier passes' hole entries) and
        # 0 * NaN would poison the exact matmul
        gk = _apply_perm(kc, P_row)                    # [1, E] grouped keys
        cleaned = jnp.where(gk >= float(sentinel), 0.0, abuf[...])
        write_chunk(c, _apply_perm_inv(cleaned, P_row))

    jax.lax.fori_loop(0, CPB, body, 0)

    @pl.when(pid == n_super - 1)
    def _():
        def drain_out(ci):
            @pl.when(ci >= 0)
            def _():
                pltpu.make_async_copy(
                    obuf.at[jax.lax.rem(ci, 2)],
                    gout_hbm.at[:, pl.ds(pl.multiple_of(ci * E, 128), E)],
                    osem.at[jax.lax.rem(ci, 2)]).wait()
        drain_out(n_chunks - 2)
        drain_out(n_chunks - 1)
        for b in range(B):
            @pl.when(inflight_s[b] == 1)
            def _(b=b):
                refill_dma(b, cursor_s[b]).wait()


@functools.lru_cache(maxsize=64)
def _make_inv_pass_call(grows, R_in, R_out, E, B, p, CPB, sentinel,
                        interpret):
    n_chunks = R_in // E
    n_super = (n_chunks + CPB - 1) // CPB
    return pl.pallas_call(
        functools.partial(_inv_pass_kernel, grows=grows, E=E, B=B, p=p,
                          n_chunks=n_chunks, CPB=CPB, sentinel=sentinel,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_super,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),   # keys
                      pl.BlockSpec(memory_space=pltpu.HBM)],  # gin
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            scratch_shapes=[
                pltpu.VMEM((2, CPB, E), jnp.float32),         # kbuf
                pltpu.SemaphoreType.DMA((2,)),                # ksem
                pltpu.VMEM((B, grows, 2 * E), jnp.float32),   # read rings
                pltpu.VMEM((B, grows, E), jnp.float32),       # refill bufs
                pltpu.SemaphoreType.DMA((B,)),                # rsem
                pltpu.VMEM((grows, E), jnp.float32),          # assembly
                pltpu.VMEM((2, grows, E), jnp.float32),       # obuf
                pltpu.SemaphoreType.DMA((2,)),                # osem
                pltpu.SMEM((B,), jnp.int32),                  # avail
                pltpu.SMEM((B,), jnp.int32),                  # rbase
                pltpu.SMEM((B,), jnp.int32),                  # cursor
                pltpu.SMEM((B,), jnp.int32),                  # inflight
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((grows, R_in), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# XLA orchestration
# --------------------------------------------------------------------------

def radix_partition(table, num_buckets: int, *, B: int = 16, E: int = 256,
                    CPB: int = 8, tail_pad: int = 0, key_row: int = 0,
                    interpret=None):
    """Stably partition table columns by the integer key in row 0.

    table: [rows, R] f32, rows % 8 == 0, R % E == 0, finite values. Keys in
    row 0 must be exact integers; any key >= num_buckets marks an invalid
    entry and is remapped to the sentinel (sorted to the very end).

    Returns (out [rows, R + L*B*E + tail_pad], meta). Bucket k's entries sit
    at [starts[k], starts[k] + counts[k]) of `out` (see bucket_ranges);
    other positions hold sentinel entries with zero payloads. `tail_pad`
    (multiple of E) adds extra guaranteed-sentinel margin after the last
    pass for consumers that read past segment ends.
    """
    if interpret is None:
        interpret = default_interpret()
    rows, R0 = table.shape
    assert rows % 8 == 0 and R0 % E == 0 and tail_pad % E == 0, \
        (rows, R0, E, tail_pad)
    L = num_passes(num_buckets, B)
    keyspace = B ** L
    assert keyspace <= (1 << 24), "keys must stay exact in f32"
    sentinel = keyspace - 1

    keys = table[key_row]
    keys = jnp.where(keys >= num_buckets, float(sentinel), keys)
    cur = table.at[key_row].set(keys)

    bases_list, saved = [], []
    R = R0
    for p in range(L):
        k = cur[key_row]
        counts = _digit_counts(k, p, B)
        bases = _aligned_bases(counts, E)
        saved.append(k)
        bases_list.append(bases)
        R_out = R + B * E + (tail_pad if p == L - 1 else 0)
        call = _make_pass_call(rows, R, R_out, E, B, p, sentinel, CPB,
                               interpret, key_row)
        (cur,) = call(bases, cur)
        R = R_out

    meta = PartitionMeta(E=E, B=B, L=L, R0=R0, num_buckets=num_buckets,
                         keyspace=keyspace, bases=tuple(bases_list),
                         saved_keys=tuple(saved))
    return cur, meta


def bucket_ranges(meta: PartitionMeta):
    """Per-bucket (starts [num_buckets] i32, counts [num_buckets] i32) in
    the FINAL partitioned layout (accounts for the aligned gaps between the
    last pass's digit groups)."""
    B, E, L = meta.B, meta.E, meta.L
    hist = histogram(meta.saved_keys[0], meta.num_buckets)
    group_w = B ** (L - 1)
    nb = meta.num_buckets
    pad = (-nb) % group_w
    hist_p = jnp.concatenate([hist, jnp.zeros((pad,), hist.dtype)])
    h2 = hist_p.reshape(-1, group_w)              # [<=B, group_w]
    offs = jnp.cumsum(h2, axis=1) - h2            # exclusive, within group
    last_bases = meta.bases[L - 1]                # [B+1]
    starts = last_bases[:h2.shape[0], None] + offs
    return starts.reshape(-1)[:nb].astype(jnp.int32), hist


def radix_unpartition(gtable, meta: PartitionMeta, *, CPB: int = 8,
                      interpret=None):
    """Invert the permutation of radix_partition for a gradient table.

    gtable: [grows, R_L] f32 aligned with the partitioned layout (garbage
    allowed at sentinel positions as long as it is finite or masked — see
    module docstring). Returns [grows, R0] in the original entry order.
    """
    if interpret is None:
        interpret = default_interpret()
    grows, R_L = gtable.shape
    assert grows % 8 == 0
    B, E, L = meta.B, meta.E, meta.L
    # tail_pad margin beyond R0 + L*B*E is permitted and never read
    assert R_L >= meta.R0 + L * B * E, (R_L, meta.R0, L, B, E)

    cur = gtable
    for p in reversed(range(L)):
        keys = meta.saved_keys[p]
        R_in = keys.shape[0]
        n_chunks = R_in // E
        n_super = (n_chunks + CPB - 1) // CPB
        kmat = keys.reshape(n_chunks, E)
        pad_rows = n_super * CPB - n_chunks
        if pad_rows:
            kmat = jnp.concatenate(
                [kmat, jnp.zeros((pad_rows, E), kmat.dtype)], axis=0)
        call = _make_inv_pass_call(grows, R_in, R_in + B * E, E, B, p, CPB,
                                   meta.keyspace - 1, interpret)
        (cur,) = call(meta.bases[p], kmat, cur)
    return cur
