"""Trace-measured XLA gather/scatter/sort costs at bench scale.

Wall-clock micro-timings are unreliable over the axon relay; this builds one
jit program exercising each primitive and reads per-op times from the
profiler trace.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    R = 9_750_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(R).astype(np.int32))
    table = jnp.asarray(rng.random((16, R), dtype=np.float32))
    vals = jnp.asarray(rng.random((R,), dtype=np.float32))
    gidx = jnp.asarray(rng.integers(0, 1_500_000, R).astype(np.int32))

    def prog(key, idx, table, vals, gidx):
        outs = {}
        # A: 2-row sort (key + index)
        sk, sf = jax.lax.sort((key, idx), num_keys=1)
        outs["sorted_flat_sum"] = jnp.sum(sf)
        # B: row-gather of a [16, R] table by 11M indices (axis 1)
        gat = table[:, sf]
        outs["gather_sum"] = jnp.sum(gat)
        # C: 1-row gather
        outs["gather1_sum"] = jnp.sum(vals[sf])
        # D: scatter-add into n-sized bins (the backward segment reduction)
        binned = jnp.zeros((1_500_000,), jnp.float32).at[gidx].add(vals)
        outs["scatter_sum"] = jnp.sum(binned)
        # E: 16-row scatter-add (grad table reduction)
        binned16 = jnp.zeros((16, 1_500_000), jnp.float32).at[:, gidx].add(table)
        outs["scatter16_sum"] = jnp.sum(binned16)
        # F: full 11-row sort for comparison
        ops = jax.lax.sort((key, idx) + tuple(table[i] for i in range(9)),
                           num_keys=1)
        outs["sort11_sum"] = jnp.sum(ops[3])
        return outs

    f = jax.jit(prog)
    out = f(key, idx, table, vals, gidx)
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/gs_trace"):
        for _ in range(2):
            out = f(key, idx, table, vals, gidx)
        jax.block_until_ready(out)
    print("done", {k: float(v) for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
