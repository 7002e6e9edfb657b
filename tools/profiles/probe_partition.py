"""Per-pass cost of the Pallas radix-partition engine vs B (buckets/pass)
and E (chunk size), at bench scale, after the round-3 fast paths.

Round-2 recorded ~12.5 ns/entry/pass at B=16, E=256 (~93 ms per 7.44M-entry
pass), dominated by per-bucket ring appends (~150 ns/busy bucket/chunk) and
~1 us fixed per-chunk cost. Bigger E amortizes both; this probe checks how
far that goes, and what the exact-inverse pass costs under the same config.
A 12-bit tile partition needs: B=16 -> 3 passes, B=64 -> 2 passes.
To beat lax.sort the engine needs fwd passes totalling < ~28 ms (36.1 ms
sort minus the n-sized depth presort it adds) and inverse passes < 41.6 ms.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from wildgaussians_tpu.ops.partition import (radix_partition,
                                             radix_unpartition)


def main():
    R = int(os.environ.get("R", 7_440_384))   # divisible by 1024
    rows = 8
    rng = np.random.default_rng(0)

    for num_buckets, B, E, CPB in [
            (16, 16, 256, 8),
            (16, 16, 1024, 8),
            (64, 64, 512, 8),
            (64, 64, 1024, 8),
            (64, 64, 2048, 4),
            (4096, 64, 1024, 8),   # 2-pass full 12-bit tile partition
    ]:
        if R % E:
            Ruse = (R // E) * E
        else:
            Ruse = R
        keys = rng.integers(0, num_buckets, Ruse).astype(np.float32)
        payload = rng.uniform(size=(rows - 1, Ruse)).astype(np.float32)
        table = jnp.asarray(np.concatenate([keys[None], payload]))

        REP = 4

        def chain_fwd(t):
            # defeat the axon relay dedup AND DCE the profile11 way: each
            # rep consumes the previous rep's output (keys re-derived from
            # a payload row), and the TIMING LOOP feeds each call's output
            # table back as the next call's input
            for _ in range(REP):
                out = radix_partition(t, num_buckets, B=B, E=E, CPB=CPB)[0]
                nk = jnp.floor(out[1, :t.shape[1]] * num_buckets)
                nk = jnp.clip(nk, 0, num_buckets - 1)
                t = out[:, :t.shape[1]].at[0].set(nk)
            return t

        fwd = jax.jit(chain_fwd)
        try:
            tbl = fwd(table)
            jax.block_until_ready(tbl)
        except Exception as e:  # noqa: BLE001
            print(f"B={B} E={E} nb={num_buckets}: FWD FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        t0 = time.perf_counter()
        for i in range(3):
            tbl = fwd(tbl)
        jax.block_until_ready(tbl)
        ms = (time.perf_counter() - t0) / 3 / REP * 1e3
        import math
        L = max(1, math.ceil(math.log(num_buckets, B)))
        print(f"nb={num_buckets} B={B} E={E} CPB={CPB}: fwd {ms:.1f} ms "
              f"({L} pass(es), {ms/L/Ruse*1e6:.2f} ns/entry/pass)",
              flush=True)

        # inverse at the same config
        def run_inv(t):
            for _ in range(REP):
                part, meta = radix_partition(t, num_buckets, B=B, E=E,
                                             CPB=CPB)
                g = radix_unpartition(part, meta, CPB=CPB)
                nk = jnp.clip(jnp.floor(g[1, :t.shape[1]] * num_buckets),
                              0, num_buckets - 1)
                t = g[:, :t.shape[1]].at[0].set(nk)
            return t
        inv = jax.jit(run_inv)
        try:
            tbl2 = inv(table)
            jax.block_until_ready(tbl2)
            t0 = time.perf_counter()
            for i in range(3):
                tbl2 = inv(tbl2)
            jax.block_until_ready(tbl2)
            ms2 = (time.perf_counter() - t0) / 3 / REP * 1e3 - ms
            print(f"      inverse-only ~{ms2:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"      INV FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
