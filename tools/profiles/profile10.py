"""Round-2c: timing for batched-sort regroup feasibility.

SUPERSEDED by profile11.py (round 3), which fixes three defects flagged by
the round-2 advisor and this header records for posterity:
  - rank_via_matmul used bfloat16 one-hots/cumsums: bf16 cannot represent
    integer ranks > 256 exactly, so its ranks are WRONG (timing-only) and
    underestimate a correct f32 implementation (profile11 uses f32 and a
    scan so only one [CH, NB] one-hot is live, instead of an ~11 GB
    [Rc, 1024, 256] intermediate that OOMs at R = 7.44M);
  - the scatter benchmark used a uniformly random permutation; bucketed
    regroup positions are piecewise-monotone, which profile11 also times
    (measured: monotone ~= random — the scatter wall is index processing).

Original comparison (at bench scale R ~ 7.44M):
  - flat wide sort, current fwd payload count (key + 8 payload rows)
  - flat wide sort, current bwd payload count (key + 4 rows)
  - batched [C, E] sorts of the same total elements, same payloads
  - the regroup primitives a static-cap bucketing would need:
      histogram over 2^b buckets, scatter of rows to bucketed positions
"""
import time
import numpy as np


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    R = 7_440_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32))

    def rows(k):
        return [jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32))
                for _ in range(k)]

    p8 = rows(8)
    s_f8 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1)[0])
    s_f8u = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1,
                                               is_stable=False)[0])
    s_f4u = jax.jit(lambda k, *p: jax.lax.sort((k, *p[:4]), num_keys=1,
                                               is_stable=False)[0])
    print(f"flat sort 1k+8p stable  : {timeit(s_f8, key, *p8):7.1f} ms", flush=True)
    print(f"flat sort 1k+8p unstable: {timeit(s_f8u, key, *p8):7.1f} ms", flush=True)
    print(f"flat sort 1k+4p unstable: {timeit(s_f4u, key, *p8):7.1f} ms", flush=True)

    # batched variants: same total elements
    for C in (64, 256, 1024):
        E = R // C
        kb = key[: C * E].reshape(C, E)
        pb = [r[: C * E].reshape(C, E) for r in p8]
        b8 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=1,
                                                num_keys=1)[0])
        b4 = jax.jit(lambda k, *p: jax.lax.sort((k, *p[:4]), dimension=1,
                                                num_keys=1, is_stable=False)[0])
        print(f"batched[{C:4d},{E:6d}] 1k+8p: {timeit(b8, kb, *pb):7.1f} ms"
              f"   1k+4p unstable: {timeit(b4, kb, *pb):7.1f} ms", flush=True)

    # regroup primitives --------------------------------------------------
    B = 256
    bucket = (key >> jnp.uint32(24)).astype(jnp.int32)  # top-8-bit bucket
    hist = jax.jit(lambda b: jnp.zeros((256,), jnp.int32).at[b].add(1))
    print(f"histogram 256 buckets   : {timeit(hist, bucket):7.1f} ms", flush=True)

    # bucketed scatter: pos = offset[bucket] + rank_in_bucket. rank needs a
    # stable partition; approximate its cost with a segmented cumsum via
    # one-hot matmul in f32 chunks (the partition engine's grouping op)
    def rank_via_matmul(b):
        # [R] -> chunk into [R/1024, 1024]; one-hot [1024, 256]; cumsum over
        # chunks via scan of per-chunk totals
        Rc = b.shape[0] // 1024
        bc = b.reshape(Rc, 1024)
        oh = jax.nn.one_hot(bc, 256, dtype=jnp.bfloat16)        # [Rc,1024,256]
        within = jnp.cumsum(oh, axis=1) - oh                     # rank in chunk
        totals = oh.sum(axis=1)                                  # [Rc,256]
        base = jnp.cumsum(totals, axis=0) - totals               # excl prefix
        r = within + base[:, None, :]
        rk = jnp.take_along_axis(r, bc[..., None], axis=-1)[..., 0]
        return rk.reshape(-1).astype(jnp.int32)
    rank_j = jax.jit(rank_via_matmul)
    print(f"rank-in-bucket (matmul) : {timeit(rank_j, bucket):7.1f} ms", flush=True)

    # scatter 8 rows to computed positions (one shared index, batched rows)
    pos = jnp.asarray(rng.permutation(R).astype(np.int32))
    mat = jnp.stack(p8)  # [8, R]
    scat = jax.jit(lambda m, i: jnp.zeros((8, R), jnp.uint32).at[:, i].set(m))
    print(f"scatter-set 8 rows      : {timeit(scat, mat, pos):7.1f} ms", flush=True)
    gat = jax.jit(lambda m, i: m[:, i])
    print(f"gather 8 rows           : {timeit(gat, mat, pos):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
