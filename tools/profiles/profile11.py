"""Round-3 decision bench: where do the 189.5 ms go, and which binning
rebuild wins?

Wall-timing single dispatches over the axon relay reads ~0 ms regardless
of salting (round-2's profile4/profile6 hit the same wall), so every
primitive here is timed as ONE jit that repeats the op REPS times with a
data dependency between repeats (next key = this output * knuth-prime),
making elision/dedup impossible; reported ms = dispatch_time / REPS, with
a ~0.1 ms/rep perturb pass included.

Measures, at the CURRENT bench scale (R = 7.44M entries, n = 1.5M):
  1. flat lax.sort vs batched [C, E] lax.sort at the production payload
     counts (fwd: key + 6 rows stable; bwd: key + 6 rows unstable);
  2. sort cost scaling with payload rows (key+0 ... key+8);
  3. regroup primitives for a bucket-then-batched-sort scheme:
     histogram, rank-in-bucket (f32 one-hot matmul, scan-chunked),
     row-shared batched scatter/gather with random AND piecewise-monotone
     (bucket-grouped) index patterns [ADVICE r2: monotone case matters];
  4. pipeline slices: full step / forward-only (timed the bench.py way —
     those DO register real wall time since the program is big).
"""
import sys
import time

import numpy as np

REPS = 8
PRIME = 2654435761  # knuth multiplicative hash, odd -> bijective mod 2^32


def timeit_chain(make_step, x0, iters=3):
    """Time jit(x -> make_step applied REPS times, data-chained); ms/rep.

    make_step: u32 array -> u32 array of the same shape (the measured op
    plus a cheap mix so the next rep's input differs).
    """
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
    return (time.perf_counter() - t0) / (iters * REPS) * 1e3  # ms


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
    p6 = p8[:6]
    PR = jnp.uint32(PRIME)

    # the baseline mix pass (so it can be subtracted mentally): k*PRIME
    print(f"mix-only pass (subtract): "
          f"{timeit_chain(lambda k: k * PR, key):7.2f} ms", flush=True)

    # --- 1/2: flat vs batched, payload scaling ---------------------------
    for rows in (0, 1, 2, 4, 6, 8):
        pays = p8[:rows]

        def step(k, pays=pays):
            out = jax.lax.sort((k, *pays), num_keys=1)
            return out[0] * PR
        print(f"flat stable   key+{rows}p: "
              f"{timeit_chain(step, key):7.2f} ms", flush=True)

    def step_u(k):
        out = jax.lax.sort((k, *p6), num_keys=1, is_stable=False)
        return out[0] * PR
    print(f"flat UNstable key+6p: {timeit_chain(step_u, key):7.2f} ms",
          flush=True)

    for C in (64, 256, 1024, 4096):
        E = R // C
        kb = key[: C * E].reshape(C, E)
        pb = [r[: C * E].reshape(C, E) for r in p6]

        def stepb(k, pb=pb):
            out = jax.lax.sort((k, *pb), dimension=1, num_keys=1)
            return out[0] * PR

        def stepbu(k, pb=pb):
            out = jax.lax.sort((k, *pb), dimension=1, num_keys=1,
                               is_stable=False)
            return out[0] * PR
        print(f"batched[{C:5d},{E:7d}] key+6p stable: "
              f"{timeit_chain(stepb, kb):7.2f} ms  unstable: "
              f"{timeit_chain(stepbu, kb):7.2f} ms", flush=True)

    # --- 3: regroup primitives -------------------------------------------
    for NB in (256, 1024, 4096):
        sh = int(np.log2(NB))

        def steph(k, sh=sh, NB=NB):
            b = (k >> jnp.uint32(32 - sh)).astype(jnp.int32)
            h = jnp.zeros((NB,), jnp.int32).at[b].add(1)
            return k * PR + h[0].astype(jnp.uint32)
        print(f"histogram {NB:5d} buckets: "
              f"{timeit_chain(steph, key):7.2f} ms", flush=True)

    # rank-in-bucket via f32 one-hot matmul, scan over chunks (ADVICE fix:
    # f32 exactness + one live [CH, NB] one-hot per step)
    NB = 256
    CH = 8192
    Rpad = (R // CH) * CH

    def steprank(k):
        b = (k[:Rpad] >> jnp.uint32(24)).astype(jnp.int32)
        bc = b.reshape(Rpad // CH, CH)

        def srow(base, row):
            oh = jax.nn.one_hot(row, NB, dtype=jnp.float32)   # [CH, NB]
            within = jnp.cumsum(oh, axis=0) - oh
            rk = (jnp.take_along_axis(within + base[None, :],
                                      row[:, None], axis=1)[:, 0])
            return base + oh.sum(axis=0), rk
        base0 = jnp.zeros((NB,), jnp.float32)
        _totals, ranks = jax.lax.scan(srow, base0, bc)
        r = ranks.reshape(-1).astype(jnp.uint32)
        return k * PR + jnp.concatenate([r, jnp.zeros((R - Rpad,),
                                                      jnp.uint32)])
    print(f"rank-in-bucket f32 scan : {timeit_chain(steprank, key):7.2f} ms",
          flush=True)

    # row-shared scatter/gather, random vs piecewise-monotone index.
    # mat is [6, R]; chain feeds the op's output back as next input.
    perm = rng.permutation(R).astype(np.int32)
    mono = np.concatenate(
        [np.sort(a) for a in np.array_split(perm, 256)]).astype(np.int32)
    mat = jnp.stack(p6)  # [6, R]
    for name, idx_np in (("random", perm), ("monotone256", mono)):
        idx = jnp.asarray(idx_np)

        def stepsc(m, idx=idx):
            return jnp.zeros((6, R), jnp.uint32).at[:, idx].set(m) * PR

        def stepga(m, idx=idx):
            return m[:, idx] * PR

        def stepg1(v, idx=idx):
            return v[idx] * PR

        def steps1(v, idx=idx):
            return jnp.zeros((R,), jnp.uint32).at[idx].set(v) * PR
        print(f"{name:12s} scatter6: {timeit_chain(stepsc, mat):7.2f}  "
              f"gather6: {timeit_chain(stepga, mat):7.2f}  "
              f"gather1: {timeit_chain(stepg1, p6[0]):7.2f}  "
              f"scatter1: {timeit_chain(steps1, p6[0]):7.2f} ms", flush=True)

    if "--pipeline" not in sys.argv:
        return

    # --- 4: current pipeline slices (bench.py-style timing) ---------------
    from wildgaussians_tpu.types import new_cameras
    from wildgaussians_tpu.cameras import make_camera_params
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    n = 1_500_000
    width, height = 1280, 720
    f = width / 1.4
    cam = new_cameras(
        poses=np.eye(4, dtype=np.float32)[:3][None],
        intrinsics=np.array([[f, f, width / 2, height / 2]], np.float32),
        camera_models=np.zeros((1,), np.int32),
        distortion_parameters=np.zeros((1, 6), np.float32),
        image_sizes=np.array([[width, height]], np.int32))
    params, w, h = make_camera_params(cam)
    z = rng.uniform(3.0, 30.0, n).astype(np.float32)
    xy_extent = z[:, None] * np.array(
        [width / (2 * f), height / (2 * f)], np.float32)
    xyz = np.concatenate([
        rng.uniform(-1, 1, (n, 2)).astype(np.float32) * xy_extent,
        z[:, None]], -1)
    px_size = z / f
    scales = (px_size[:, None]
              * rng.uniform(0.8, 4.0, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.4, 0.99, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    args = tuple(map(jnp.asarray, (xyz, scales, q, opac, colors)))

    def loss_fn(xyz, scales, rots, opac, colors):
        out = rasterize_gaussians(
            xyz, scales, rots, opac, colors, params, w, h,
            kernel_size=0.1, backend="pallas", max_tiles_per_gaussian=10,
            d_small=4)
        return (jnp.mean(jnp.abs(out.color - target)),
                (out.num_rendered, out.overflow))

    def timeit_plain(fn, *a, iters=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))
    print(f"full fwd+bwd step : {timeit_plain(step, *args):7.1f} ms",
          flush=True)
    fwd = jax.jit(lambda *a: loss_fn(*a)[0])
    print(f"forward only      : {timeit_plain(fwd, *args):7.1f} ms",
          flush=True)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/r3_trace"):
            for _ in range(3):
                out = step(*args)
            jax.block_until_ready(out)
        print("trace written to /tmp/r3_trace", flush=True)


if __name__ == "__main__":
    main()
