"""Measure lax.sort shapes on the chip: global 1-D vs batched 2-D rows.

Hypothesis: a batched sort [C, E] (each row VMEM-sized) avoids the HBM
merge passes of one giant [R] sort, so a chunked sort + k-way regroup
pipeline could beat the current 85 ms global sort. This measures the
raw sort component costs via profiler traces (wall-clock over the axon
relay is bogus for micro-timings — trace only).
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    R = 9_750_000
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32))
    pay = [jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32))
           for _ in range(7)]

    C, E = 384, 25600           # C*E ~ 9.83M
    keys2 = jnp.asarray(rng.integers(0, 2**32, (C, E), dtype=np.uint64).astype(np.uint32))
    pay2 = [jnp.asarray(rng.integers(0, 2**32, (C, E), dtype=np.uint64).astype(np.uint32))
            for _ in range(7)]

    @jax.jit
    def s_global_2(k, p0):
        return jax.lax.sort((k, p0), num_keys=1)[0]

    @jax.jit
    def s_global_8(k, *p):
        return jax.lax.sort((k, *p), num_keys=1)[0]

    @jax.jit
    def s_batched_2(k, p0):
        return jax.lax.sort((k, p0), dimension=1, num_keys=1)[0]

    @jax.jit
    def s_batched_8(k, *p):
        return jax.lax.sort((k, *p), dimension=1, num_keys=1)[0]

    runs = [
        ("global_2row", lambda: s_global_2(keys, pay[0])),
        ("global_8row", lambda: s_global_8(keys, *pay)),
        ("batched_2row", lambda: s_batched_2(keys2, pay2[0])),
        ("batched_8row", lambda: s_batched_8(keys2, *pay2)),
    ]
    for name, fn in runs:
        jax.block_until_ready(fn())   # compile
    with jax.profiler.trace("/tmp/sort_trace"):
        for name, fn in runs:
            for _ in range(3):
                out = fn()
            jax.block_until_ready(out)
    for name, fn in runs:
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms (wall, "
              "approximate)", flush=True)
    print("trace in /tmp/sort_trace", flush=True)


if __name__ == "__main__":
    main()
