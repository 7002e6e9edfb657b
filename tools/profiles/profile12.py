"""Live-payload sort costs (profile11's sort numbers were key-only: unused
payload outputs get DCE'd). Chained timing; ALL sort outputs are xor-folded
into the next iteration's key, so every payload row is live.

Decision data for: payload-row marginal cost, stable-vs-unstable with
payloads, batched-vs-flat with payloads, and the n-scale depth-presort
candidate (partition-engine ROI).
"""
import time

import numpy as np

REPS = 6
PRIME = 2654435761


def timeit_chain(make_step, x0, iters=3):
    import jax

    def chained(x):
        for _ in range(REPS):
            x = make_step(x)
        return x
    fn = jax.jit(chained)
    out = fn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * REPS) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    R = 7_440_000
    rng = np.random.default_rng(0)

    def mku(shape):
        return jnp.asarray(
            rng.integers(0, 2**32, shape, dtype=np.uint64).astype(np.uint32))

    key = mku(R)
    p8 = [mku(R) for _ in range(8)]
    PR = jnp.uint32(PRIME)

    def fold(outs):
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return acc * PR

    print(f"fold-only baseline 8 rows: "
          f"{timeit_chain(lambda k: fold([k, *p8]), key):7.2f} ms",
          flush=True)

    for rows in (0, 1, 2, 4, 6, 8):
        pays = p8[:rows]

        def step(k, pays=pays):
            return fold(jax.lax.sort((k, *pays), num_keys=1))
        print(f"flat stable   key+{rows}p LIVE: "
              f"{timeit_chain(step, key):7.2f} ms", flush=True)

    for rows in (4, 6):
        pays = p8[:rows]

        def stepu(k, pays=pays):
            return fold(jax.lax.sort((k, *pays), num_keys=1,
                                     is_stable=False))
        print(f"flat UNstable key+{rows}p LIVE: "
              f"{timeit_chain(stepu, key):7.2f} ms", flush=True)

    # 2-key unstable (unique 64-bit key split in two u32 rows) vs 1-key
    # stable: same ordering guarantee when row1 is a tiebreaker
    def step2k(k):
        return fold(jax.lax.sort((k, p8[0], *p8[1:6]), num_keys=2,
                                 is_stable=False))
    print(f"flat 2-key UNstable +5p LIVE: {timeit_chain(step2k, key):7.2f} ms",
          flush=True)

    for C in (1024, 4096):
        E = R // C
        kb = key[: C * E].reshape(C, E)
        pb = [r[: C * E].reshape(C, E) for r in p8[:6]]

        def stepb(k, pb=pb):
            return fold(jax.lax.sort((k, *pb), dimension=1, num_keys=1))

        def stepbu(k, pb=pb):
            return fold(jax.lax.sort((k, *pb), dimension=1, num_keys=1,
                                     is_stable=False))
        print(f"batched[{C:5d},{E:7d}] key+6p LIVE stable: "
              f"{timeit_chain(stepb, kb):7.2f} ms  unstable: "
              f"{timeit_chain(stepbu, kb):7.2f} ms", flush=True)

    # n-scale depth presort candidate: 1.5M entries, key + 12 payload rows
    n = 1_500_000
    kn = mku(n)
    pn = [mku(n) for _ in range(12)]

    def stepn(k):
        return fold(jax.lax.sort((k, *pn), num_keys=1))
    print(f"n-scale stable key+12p LIVE (1.5M): "
          f"{timeit_chain(stepn, kn):7.2f} ms", flush=True)

    def stepn2(k):
        return fold(jax.lax.sort((k, *pn[:2]), num_keys=1))
    print(f"n-scale stable key+2p  LIVE (1.5M): "
          f"{timeit_chain(stepn2, kn):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
