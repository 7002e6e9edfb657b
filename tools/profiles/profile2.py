"""Micro-bench: why is in-pipeline sort 109ms but standalone sort ~0.1ms?"""
import time

import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    import jax
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
    R = 9_750_000
    n = 1_500_000

    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    flat = jnp.arange(R, dtype=jnp.int32)
    pay = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(9)]

    s_bare = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    print(f"A bare u32 sort [{R}]: {timeit(s_bare, key):.1f} ms", flush=True)

    s_11 = jax.jit(lambda k, f, *p: jax.lax.sort((k, f, *p), num_keys=1))
    print(f"B 11-row sort       : {timeit(s_11, key, flat, *pay):.1f} ms", flush=True)

    # C: sort whose payloads are broadcasts materialized IN the same jit
    def sort_with_broadcast(k, cols):
        pays = [jnp.broadcast_to(c[:, None], (n, 6)).reshape(-1)[:R] for c in cols]
        fl = jnp.arange(R, dtype=jnp.int32)
        return jax.lax.sort((k, fl, *pays), num_keys=1)
    cols = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(9)]
    s_c = jax.jit(sort_with_broadcast)
    print(f"C sort w/ in-jit broadcast payloads: {timeit(s_c, key, cols):.1f} ms", flush=True)

    # D: sort then USE all outputs (consume like the pipeline: concat to table)
    def sort_and_use(k, f, *p):
        ops = jax.lax.sort((k, f, *p), num_keys=1)
        table = jnp.stack(ops[2:], axis=0)
        starts = jnp.searchsorted(ops[0], jnp.arange(4096, dtype=jnp.uint32) << 20)
        return table, ops[1], starts
    s_d = jax.jit(sort_and_use)
    print(f"D sort + table/searchsorted: {timeit(s_d, key, flat, *pay):.1f} ms", flush=True)

    # E: key with realistic structure (tile|depth, mostly-sorted-ish? no, random tiles)
    tile = rng.integers(0, 3601, R, dtype=np.uint32)
    depth = rng.integers(0, 1 << 20, R, dtype=np.uint32)
    key2 = jnp.asarray((tile << 20) | depth)
    print(f"E structured-key 11-row: {timeit(s_11, key2, flat, *pay):.1f} ms", flush=True)

    # F: many invalid sentinel keys (like dup_valid=False -> 0xFFFFFFFF)
    mask = rng.random(R) < 0.35
    key3 = np.asarray((tile << 20) | depth)
    key3[mask] = 0xFFFFFFFF
    key3 = jnp.asarray(key3)
    print(f"F 35%-sentinel 11-row : {timeit(s_11, key3, flat, *pay):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
