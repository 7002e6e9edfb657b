"""Round-4 sort-wall design campaign (VERDICT r3 #1).

Measures, on the real chip, every primitive a counting-scatter /
sample-sort redesign of the 78 ms lax.sort pair would be built from.

Timing technique: chained in-jit repetition (profile11) — the axon relay
reads ~0 wall ms for single dispatches; REPS data-chained reps inside one
jit make elision impossible. ms = dispatch / REPS.

CRITICAL correction discovered by this probe's first run: lax.sort's
UNUSED payload outputs are DCE'd by XLA — a chain that only consumes
out[0] measures a key-only sort no matter how many payload rows ride.
Every payload measurement below XOR-folds ALL outputs into the chain
(and the xor-fold overhead is measured separately as a control).
"""
import sys
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 7_440_000
    rng = np.random.default_rng(0)
    PR = jnp.uint32(PRIME)

    def mku(shape, dtype=np.uint32):
        hi = np.iinfo(dtype).max
        return jnp.asarray(rng.integers(0, hi, shape, dtype=np.int64).astype(dtype))

    def xorfold(outs):
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o.astype(acc.dtype)
        return acc

    key = mku(R)
    print(f"mix-only (subtract): {timeit_chain(lambda k: k * PR, key):6.2f} ms",
          flush=True)

    # xor-fold control: cost of folding `rows` extra arrays into the chain
    for rows in (2, 6):
        pays = [mku(R) for _ in range(rows)]
        ms = timeit_chain(lambda k, pays=pays: xorfold([k * PR] + pays), key)
        print(f"xorfold control +{rows} rows: {ms:6.2f} ms", flush=True)

    # --- 1. flat scaling (key-only) --------------------------------------
    for r in (930_000, 7_440_000):
        k0 = mku(r)
        ms = timeit_chain(lambda k: jax.lax.sort(k, is_stable=False) * PR, k0)
        print(f"flat unstable key-only R={r:>9,}: {ms:6.2f} ms", flush=True)

    # --- 2. payload marginals, ALL outputs consumed ----------------------
    for nk, stable, rows, dt in ((1, False, 2, np.uint32),
                                 (1, False, 6, np.uint32),
                                 (2, False, 6, np.uint32),
                                 (1, True, 6, np.uint32),
                                 (1, False, 6, np.uint16),
                                 (2, False, 4, np.uint32),
                                 (2, False, 8, np.uint32)):
        pays = [mku(R, dt) for _ in range(rows)]

        def step(k, pays=pays, nk=nk, stable=stable):
            ins = (k, *pays) if nk == 1 else (k, k * PR, *pays[1:])
            out = jax.lax.sort(ins, num_keys=nk, is_stable=stable)
            return xorfold(out)
        ms = timeit_chain(step, key)
        print(f"flat {'stable' if stable else 'unstable'} nk={nk} "
              f"key+{rows}x{np.dtype(dt).name} (consumed): {ms:6.2f} ms",
              flush=True)

    # --- 3. batched chunk sorts, consumed --------------------------------
    for K in (2048, 16384):
        C = R // K
        kb = mku((C, K))
        for rows in (0, 6):
            pays = [mku((C, K)) for _ in range(rows)]

            def step(k, pays=pays):
                out = jax.lax.sort((k, *pays), num_keys=1, is_stable=False)
                return xorfold(out)
            ms = timeit_chain(step, kb)
            print(f"batched [{C},{K}] key+{rows}p consumed: {ms:6.2f} ms",
                  flush=True)

    # --- 4. final bucket sorts [E, L] consumed ---------------------------
    for E, L in ((32, 291_000), (256, 36_500), (1024, 9_088)):
        Lp = ((L + 127) // 128) * 128
        kb = mku((E, Lp))
        pays = [mku((E, Lp)) for _ in range(6)]

        def step(k, pays=pays):
            out = jax.lax.sort((k, *pays), num_keys=1, is_stable=False)
            return xorfold(out)
        ms = timeit_chain(step, kb)
        print(f"bucket [{E},{Lp}] key+6p consumed: {ms:6.2f} ms", flush=True)

    # --- 5. Pallas DMA run-scatter ---------------------------------------
    # src [W, C*K+K]; per (c, e) one strided DMA of [W, RUN] from a dynamic
    # in-chunk offset to dst[:, e, c*RUN:(c+1)*RUN]. Measures issue rate.
    # W=8: Mosaic requires dim-0 slices tiling-aligned (8 for i32).
    # NOTE (finding): lane-dim HBM slice offsets must be 128-ALIGNED
    # (Mosaic "tile index divisible by tiling (128)") — exact-offset run
    # scatters are therefore impossible; runs quantize to 128 entries.
    # This probe measures the ALIGNED-run issue rate (the design's best
    # case); RUN must be a multiple of 128.
    W = 8

    def dma_probe(C, K, E, RUN):
        src = mku((W, C * K + K))
        starts = (np.arange(C)[:, None] * K
                  + np.arange(E)[None, :] * RUN).astype(np.int32).ravel()
        starts = jnp.asarray(starts)

        def kern(starts_ref, src_ref, dst_ref, sem):
            c = pl.program_id(0)

            def mkdma(e):
                st = pl.multiple_of(starts_ref[c * E + e], 128)
                return pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(st, RUN)],
                    dst_ref.at[:, e, pl.ds(pl.multiple_of(c * RUN, 128), RUN)],
                    sem.at[e])
            for e in range(E):
                mkdma(e).start()
            for e in range(E):
                mkdma(e).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((E,))],
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, E, C * RUN), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def step(s):
            out = call(starts, s)
            return s + out[0, :1, :1]
        ms = timeit_chain(step, src)
        nd = C * E
        bytes_mv = W * C * E * RUN * 4 * 2
        print(f"dma-scatter C={C} E={E} RUN={RUN} ({nd} DMAs, "
              f"{bytes_mv/1e6:.0f} MB r+w): {ms:6.2f} ms "
              f"({ms*1e6/nd:.2f} us/DMA incl BW)", flush=True)

    dma_probe(C=8, K=929_792, E=1, RUN=929_792)   # pure-BW control
    dma_probe(C=454, K=16384, E=8, RUN=2048)
    dma_probe(C=454, K=16384, E=32, RUN=512)
    dma_probe(C=1816, K=4096, E=32, RUN=128)
    dma_probe(C=3632, K=2048, E=64, RUN=32)


if __name__ == "__main__":
    sys.exit(main())
