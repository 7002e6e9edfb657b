"""Calibrated micro-bench: vary inputs per call to defeat any relay dedup."""
import time

import numpy as np


def timeit_varied(fn, make_args, iters=4):
    import jax
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    times = []
    for i in range(1, iters + 1):
        args = make_args(i)
        jax.block_until_ready(args)
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

    key0 = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    flat = jnp.arange(R, dtype=jnp.int32)
    pay = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(9)]

    vary = jax.jit(lambda k, i: k ^ i)

    s_bare = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    print(f"A bare u32 sort varied [{R}]: "
          f"{timeit_varied(s_bare, lambda i: (vary(key0, jnp.uint32(i)),)):.1f} ms", flush=True)

    s_2 = jax.jit(lambda k, f: jax.lax.sort((k, f), num_keys=1))
    print(f"B 2-row sort varied: "
          f"{timeit_varied(s_2, lambda i: (vary(key0, jnp.uint32(i)), flat)):.1f} ms", flush=True)

    s_11 = jax.jit(lambda k, f, *p: jax.lax.sort((k, f, *p), num_keys=1))
    print(f"C 11-row sort varied: "
          f"{timeit_varied(s_11, lambda i: (vary(key0, jnp.uint32(i)), flat, *pay)):.1f} ms", flush=True)

    # sanity: same-input repeat (dedup suspicion)
    print(f"C' 11-row sort SAME input: "
          f"{timeit_varied(s_11, lambda i: (key0, flat, *pay)):.1f} ms", flush=True)

    sn = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1))
    keyn = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    payn = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(13)]
    print(f"D n=1.5M 14-row sort varied: "
          f"{timeit_varied(sn, lambda i: (vary(keyn, jnp.uint32(i)), *payn)):.1f} ms", flush=True)

    # gather / scatter calibration (varied indices)
    idx0 = jnp.asarray(rng.permutation(R).astype(np.int32))
    g1 = jax.jit(lambda x, i: x[i])
    mk = lambda i: (pay[0], jnp.roll(idx0, i))
    print(f"E gather 1 row varied: {timeit_varied(g1, mk):.1f} ms", flush=True)

    mat = jnp.stack(pay[:8])
    g8 = jax.jit(lambda x, i: x[:, i])
    print(f"F gather 8-row axis1 varied: "
          f"{timeit_varied(g8, lambda i: (mat, jnp.roll(idx0, i))):.1f} ms", flush=True)

    sc = jax.jit(lambda x, i: jnp.zeros((R,), jnp.float32).at[i].add(x))
    print(f"G scatter-add 1 row varied: {timeit_varied(sc, mk):.1f} ms", flush=True)

    # gather n-sized rows [n] -> [R] (tier-1 style duplication via gather)
    gn = jax.jit(lambda c, i: c[i])
    gidx = jnp.asarray((rng.integers(0, n, R)).astype(np.int32))
    print(f"H gather n->R 1 row varied: "
          f"{timeit_varied(gn, lambda i: (jnp.asarray(rng.random(n, dtype=np.float32)), gidx)):.1f} ms", flush=True)

    # I broadcast+reshape duplication (the current attr() pattern)
    d1 = 6
    br = jax.jit(lambda c: jnp.broadcast_to(c[:, None], (n, d1)).reshape(-1))
    print(f"I broadcast-reshape [n,6]->[9M]: "
          f"{timeit_varied(br, lambda i: (jnp.asarray(rng.random(n, dtype=np.float32)),)):.1f} ms", flush=True)

    # J repeat-based duplication
    rp = jax.jit(lambda c: jnp.repeat(c, d1))
    print(f"J repeat n x6: "
          f"{timeit_varied(rp, lambda i: (jnp.asarray(rng.random(n, dtype=np.float32)),)):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
