"""Pin down why the in-pipeline sort costs 109ms when standalone is 0.2ms."""
import time

import numpy as np


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 1_500_000
    d1, d2x, m_cap = 6, 4, 187_500
    R = n * d1 + m_cap * d2x  # 9.75M

    tile = rng.integers(0, 3601, R, dtype=np.uint32)
    depth = rng.integers(0, 1 << 20, R, dtype=np.uint32)
    key_np = (tile << 20) | depth
    flat = jnp.arange(R, dtype=jnp.int32)
    pay = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(9)]
    key = jnp.asarray(key_np)

    s_11 = jax.jit(lambda k, f, *p: jax.lax.sort((k, f, *p), num_keys=1))
    print(f"E structured-key 11-row: {timeit(s_11, key, flat, *pay):.1f} ms", flush=True)

    mask = rng.random(R) < 0.35
    key3_np = key_np.copy()
    key3_np[mask] = 0xFFFFFFFF
    key3 = jnp.asarray(key3_np)
    print(f"F 35%-sentinel 11-row  : {timeit(s_11, key3, flat, *pay):.1f} ms", flush=True)

    # G: payloads built in-jit by broadcast+reshape (tier1+tier2 concat), and
    # outputs consumed into a [16, R] table like _sort_entries does.
    cols = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(9)]
    bl = jnp.asarray(rng.integers(0, n, m_cap).astype(np.int32))

    def pipeline_like(k, bl, *cols):
        def attr(col):
            t1 = jnp.broadcast_to(col[:, None], (n, d1)).reshape(-1)
            t2 = jnp.broadcast_to(col[bl][:, None], (m_cap, d2x)).reshape(-1)
            return jnp.concatenate([t1, t2])
        payload = [attr(c) for c in cols]
        fl = jnp.arange(R, dtype=jnp.int32)
        ops = jax.lax.sort((k, fl, *payload), num_keys=1)
        rows = [o[None, :] for o in ops[2:]] + [jnp.zeros((7, R), jnp.float32)]
        table = jnp.concatenate(rows, axis=0)
        table = jnp.concatenate([table, jnp.zeros((16, 512), jnp.float32)], axis=1)
        starts = jnp.searchsorted(ops[0], jnp.arange(3602, dtype=jnp.uint32) << 20).astype(jnp.int32)
        return table, ops[1], starts

    g = jax.jit(pipeline_like)
    print(f"G pipeline-like build+sort+table: {timeit(g, key3, bl, *cols):.1f} ms", flush=True)

    # H: same but sort first, then build table via where/covered like bwd unsort
    def unsort_like(sf, *grows):
        covered = jnp.arange(R, dtype=jnp.int32) < 7_000_000
        ops = jax.lax.sort((sf,) + tuple(jnp.where(covered, r, 0.0) for r in grows), num_keys=1)
        outs = []
        for i in range(10):
            row = ops[1 + i]
            outs.append(row[:n * d1].reshape(n, d1).sum(axis=1))
        return outs

    sf = jnp.asarray(rng.permutation(R).astype(np.int32))
    grows = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(10)]
    u = jax.jit(unsort_like)
    print(f"H unsort-like (i32 key,10 rows): {timeit(u, sf, *grows):.1f} ms", flush=True)

    # I: u32 vs i32 key cost
    s_i32 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1))
    print(f"I i32-key 10-row        : {timeit(s_i32, sf, *grows):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
