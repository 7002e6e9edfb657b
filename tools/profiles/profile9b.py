"""Per-variant traces for sort shape comparison."""
import numpy as np

def main():
    import jax, jax.numpy as jnp
    R = 9_750_000
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32))
    p1 = [jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint64).astype(np.uint32)) for _ in range(7)]
    C, E = 384, 25600
    k2 = jnp.asarray(rng.integers(0, 2**32, (C, E), dtype=np.uint64).astype(np.uint32))
    p2 = [jnp.asarray(rng.integers(0, 2**32, (C, E), dtype=np.uint64).astype(np.uint32)) for _ in range(7)]
    C3, E3 = 96, 102400
    k3 = jnp.asarray(rng.integers(0, 2**32, (C3, E3), dtype=np.uint64).astype(np.uint32))
    p3 = [jnp.asarray(rng.integers(0, 2**32, (C3, E3), dtype=np.uint64).astype(np.uint32)) for _ in range(7)]

    variants = {
        "g2": jax.jit(lambda k, p0: jax.lax.sort((k, p0), num_keys=1)[0]),
        "g8": jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1)[0]),
        "b2": jax.jit(lambda k, p0: jax.lax.sort((k, p0), dimension=1, num_keys=1)[0]),
        "b8": jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=1, num_keys=1)[0]),
        "c2": jax.jit(lambda k, p0: jax.lax.sort((k, p0), dimension=1, num_keys=1)[0]),
        "c8": jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=1, num_keys=1)[0]),
    }
    args = {"g2": (k1, p1[:1]), "g8": (k1, p1), "b2": (k2, p2[:1]),
            "b8": (k2, p2), "c2": (k3, p3[:1]), "c8": (k3, p3)}
    for name, fn in variants.items():
        a = args[name]
        jax.block_until_ready(fn(a[0], *a[1]))
        with jax.profiler.trace(f"/tmp/sort_trace_{name}"):
            for _ in range(3):
                out = fn(a[0], *a[1])
            jax.block_until_ready(out)
        print(name, "traced", flush=True)

if __name__ == "__main__":
    main()
