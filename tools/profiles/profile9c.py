"""Sort shape comparison, all outputs live (no DCE)."""
import numpy as np

def main():
    import jax, jax.numpy as jnp
    R = 9_750_000
    rng = np.random.default_rng(0)
    def mk(shape):
        return jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint64).astype(np.uint32))
    k1 = mk(R); p1 = [mk(R) for _ in range(7)]
    C, E = 384, 25600
    k2 = mk((C, E)); p2 = [mk((C, E)) for _ in range(7)]

    # keep every output live by xor-reducing them into one array
    def live(outs):
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return acc

    variants = {
        "g8": (jax.jit(lambda k, *p: live(jax.lax.sort((k, *p), num_keys=1))), (k1, p1)),
        "b8": (jax.jit(lambda k, *p: live(jax.lax.sort((k, *p), dimension=1, num_keys=1))), (k2, p2)),
        "g4": (jax.jit(lambda k, *p: live(jax.lax.sort((k, *p[:3]), num_keys=1))), (k1, p1)),
        "b4": (jax.jit(lambda k, *p: live(jax.lax.sort((k, *p[:3]), dimension=1, num_keys=1))), (k2, p2)),
    }
    for name, (fn, a) in variants.items():
        jax.block_until_ready(fn(a[0], *a[1]))
        with jax.profiler.trace(f"/tmp/sort_trace2_{name}"):
            for _ in range(3):
                out = fn(a[0], *a[1])
            jax.block_until_ready(out)
        print(name, "traced", flush=True)

if __name__ == "__main__":
    main()
