"""Bitonic D-stream merge network: exact equality with the stable sort
it replaces, and exact inversion via the recorded swap bits."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgaussians_tpu.ops import bitonic


def _streams(rng, D, C, nr, ties=False):
    hi = 50 if ties else 1 << 30
    keys = rng.integers(0, hi, size=(D, C), dtype=np.uint32)
    keys = np.sort(keys, axis=1)
    # mask a random tail of each stream to the sentinel (mirrors the
    # engine's beyond-segment masking)
    for d in range(D):
        cut = rng.integers(C // 2, C + 1)
        keys[d, cut:] = 0xFFFFFFFF
    rows = rng.integers(0, 1 << 32, size=(nr, D * C), dtype=np.uint32)
    return jnp.asarray(keys.reshape(-1)), jnp.asarray(rows)


@pytest.mark.parametrize("D,C,ties", [(2, 8, False), (4, 64, False),
                                      (8, 128, False), (8, 128, True),
                                      (16, 32, True)])
def test_merge_equals_stable_sort(D, C, ties):
    rng = np.random.default_rng(7 * D + C + ties)
    key, rows = _streams(rng, D, C, nr=3, ties=ties)
    mk, mrows, bits = bitonic.bitonic_merge(key, rows, D)
    iota = jnp.arange(D * C, dtype=jnp.uint32)
    ref = jax.lax.sort((key, iota, *rows), num_keys=1)
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(ref[0]))
    for i in range(rows.shape[0]):
        np.testing.assert_array_equal(np.asarray(mrows[i]),
                                      np.asarray(ref[2 + i]))


@pytest.mark.parametrize("D,C", [(2, 8), (8, 128), (4, 256)])
def test_replay_inverse_roundtrip(D, C):
    rng = np.random.default_rng(D + C)
    key, rows = _streams(rng, D, C, nr=2, ties=True)
    _, _, bits = bitonic.bitonic_merge(key, rows, D)
    fresh = jnp.asarray(
        rng.integers(0, 1 << 32, size=(4, D * C), dtype=np.uint32))
    fwd = bitonic.replay_forward(bits, fresh, D)
    back = bitonic.replay_inverse(bits, fwd, D)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(fresh))
    # forward replay reproduces the merge permutation itself
    mk, mrows, _ = bitonic.bitonic_merge(key, fresh[:2], D)
    np.testing.assert_array_equal(
        np.asarray(bitonic.replay_forward(bits, fresh[:2], D)),
        np.asarray(mrows))


def test_pad_unpad_roundtrip():
    rng = np.random.default_rng(0)
    D, C = 3, 100
    rows = jnp.asarray(
        rng.integers(0, 1 << 32, size=(5, D * C), dtype=np.uint32))
    padded, C2, D2 = bitonic.pad_streams(rows, D, C,
                                         jnp.uint32(0xFFFFFFFF))
    assert (C2, D2) == (128, 4)
    back = bitonic.unpad_streams(padded, D, C, C2, D2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(rows))
    # padded key row: each stream ascending incl. the sentinel tail
    k = np.asarray(padded[0]).reshape(D2, C2)
    ks = np.sort(np.asarray(rows[0]).reshape(D, C), axis=1)
    padded2, _, _ = bitonic.pad_streams(
        jnp.asarray(ks.reshape(1, -1)), D, C, jnp.uint32(0xFFFFFFFF))
    k2 = np.asarray(padded2[0]).reshape(D2, C2)
    assert (np.diff(k2.astype(np.int64), axis=1) >= 0).all()


def test_merge_after_padding_matches_unpadded_sort():
    """End-to-end: non-pow2 stream length + count, padded, merged; the
    real entries come out exactly as the stable sort of the unpadded
    concat (sentinel-keyed pads all land at the tail or tie with real
    sentinel entries, which carry no payload semantics)."""
    rng = np.random.default_rng(3)
    D, C = 3, 100
    keys = np.sort(rng.integers(0, 1 << 20, size=(D, C), dtype=np.uint32),
                   axis=1)
    rows = rng.integers(0, 1 << 32, size=(2, D * C), dtype=np.uint32)
    stack = jnp.asarray(
        np.concatenate([keys.reshape(1, -1), rows], axis=0))
    padded, C2, D2 = bitonic.pad_streams(stack, D, C,
                                         jnp.uint32(0xFFFFFFFF))
    mk, mrows, _ = bitonic.bitonic_merge(padded[0], padded[1:], D2)
    iota = jnp.arange(D * C, dtype=jnp.uint32)
    ref = jax.lax.sort((jnp.asarray(keys.reshape(-1)), iota,
                        *jnp.asarray(rows)), num_keys=1)
    n = D * C
    np.testing.assert_array_equal(np.asarray(mk[:n]), np.asarray(ref[0]))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(mrows[i, :n]),
                                      np.asarray(ref[2 + i]))
