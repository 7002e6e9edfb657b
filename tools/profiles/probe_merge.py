"""Round-5 probe: bitonic D-stream merge network vs the flat lax.sort it
replaces in the sharded receiver (VERDICT r4 next #1).

Scale mirrors the D=8 / send_beta=1.1 receive table from
tools/scaling_model.py: C2 = 131072 entries/stream, RB2 = 1,048,576,
fwd payload = 4 rows (+ key), bwd replay = 4 packed grad rows.

Timing: chained in-jit repetition (probe_sortdesign.timeit_chain) with
every output XOR-folded into the chain so nothing DCEs.
"""
import sys
import time

import numpy as np

REPS = 6


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

    sys.path.insert(0, ".")
    from wildgaussians_tpu.ops import bitonic

    D, C2 = 8, 131072
    N = D * C2
    NROWS = 4
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 30, (D, C2), dtype=np.uint32),
                   axis=1).reshape(-1)
    rows = rng.integers(0, 1 << 32, (NROWS, N), dtype=np.uint32)
    k0, r0 = jnp.asarray(keys), jnp.asarray(rows)

    def resort_streams(k):
        # keep each stream sorted while data-chaining: per-stream sort of
        # the mutated key row (cost excluded via control measurement)
        return jnp.sort(k.reshape(D, C2), axis=1).reshape(-1)

    def step_sort(state):
        k, r = state
        iota = jnp.arange(N, dtype=jnp.uint32)
        out = jax.lax.sort((k, iota, *r), num_keys=1)
        k2 = resort_streams(out[0] ^ jnp.uint32(1))
        return k2, jnp.stack(out[2:])

    def step_merge(state):
        k, r = state
        mk, mr, bits = bitonic.bitonic_merge(k, r, D)
        mr = mr ^ bits[:1]          # consume bits
        k2 = resort_streams(mk ^ jnp.uint32(1))
        return k2, mr[:NROWS]

    def step_control(state):
        k, r = state
        k2 = resort_streams(k ^ jnp.uint32(1))
        return k2, r ^ k2[None]

    t_control = timeit_chain(step_control, (k0, r0))
    t_sort = timeit_chain(step_sort, (k0, r0))
    t_merge = timeit_chain(step_merge, (k0, r0))

    # replay on 4 rows (the bwd un-sort replacement)
    _, _, bits0 = jax.jit(bitonic.bitonic_merge, static_argnames="n_streams")(
        k0, r0, n_streams=D)

    def step_replay(r):
        out = bitonic.replay_inverse(bits0, r, D)
        return out ^ jnp.uint32(1)

    def step_unsort(state):
        perm, r = state
        out = jax.lax.sort((perm, *r), num_keys=1, is_stable=False)
        return perm ^ jnp.uint32(0), jnp.stack(out[1:]) ^ jnp.uint32(1)

    t_replay = timeit_chain(step_replay, r0)
    perm0 = jnp.asarray(rng.permutation(N).astype(np.int32))
    t_unsort = timeit_chain(step_unsort, (perm0, r0))

    print(f"control (per-stream resort + xor): {t_control:.2f} ms")
    print(f"flat stable lax.sort key+iota+{NROWS}r: {t_sort:.2f} ms "
          f"(net {t_sort - t_control:.2f})")
    print(f"bitonic_merge key+{NROWS}r+bits:       {t_merge:.2f} ms "
          f"(net {t_merge - t_control:.2f})")
    print(f"replay_inverse {NROWS}r:               {t_replay:.2f} ms")
    print(f"unstable un-sort perm+{NROWS}r:        {t_unsort:.2f} ms")


if __name__ == "__main__":
    main()
