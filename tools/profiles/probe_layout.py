"""Measure XLA TPU minor-dim lane-padding cost at bench shapes.

The trace shows pack/loss buffers like f32[3600,256,8]{2,1,0:T(8,128)} and
f32[3600,256,3]{2,1,0:T(8,128)}: a minor dim of 8 (or 3) tiled to 128
lanes implies 16x (42x) physical inflation. This probe times identical
elementwise+reduce work with the small axis minor vs lane-major to see
what the padding actually costs on chip.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, iters=20):
    g = jax.jit(f)
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)

    for shape_bad, shape_good, perm in [
            ((3600, 256, 8), (3600, 8, 256), (0, 2, 1)),
            ((3600, 256, 3), (3600, 3, 256), (0, 2, 1)),
            ((720, 1280, 3), (3, 720, 1280), (2, 0, 1)),
    ]:
        a = jnp.asarray(rng.uniform(size=shape_bad).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=shape_bad).astype(np.float32))
        at = jnp.transpose(a, perm)
        bt = jnp.transpose(b, perm)
        f = lambda x, y: jnp.sum(jnp.abs(x * 1.7 - y))          # noqa: E731
        ms_bad = timeit(f, a, b)
        ms_good = timeit(f, at, bt)
        print(f"{shape_bad}: minor-last {ms_bad:.3f} ms   "
              f"lane-major {ms_good:.3f} ms   ratio {ms_bad/ms_good:.1f}x",
              flush=True)

    # the actual bench loss chain: mean |c - t| on an image
    for sh, pm in [((720, 1280, 3), (2, 0, 1))]:
        c = jnp.asarray(rng.uniform(size=sh).astype(np.float32))
        t = jnp.asarray(rng.uniform(size=sh).astype(np.float32))
        loss = lambda x, y: jnp.mean(jnp.abs(x - y))             # noqa: E731
        g_bad = timeit(lambda x, y: jax.grad(loss)(x, y), c, t)
        ct, tt = jnp.transpose(c, pm), jnp.transpose(t, pm)
        g_good = timeit(lambda x, y: jax.grad(loss)(x, y), ct, tt)
        print(f"L1+grad {sh}: HWC {g_bad:.3f} ms   CHW {g_good:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
