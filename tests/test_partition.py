"""Radix partition engine vs numpy stable sort (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.ops.partition import (
    radix_partition, radix_unpartition, bucket_ranges, num_passes)


def _make_table(rng, R, num_buckets, rows=8, invalid_frac=0.2):
    keys = rng.integers(0, num_buckets, R).astype(np.float32)
    inv = rng.random(R) < invalid_frac
    keys[inv] = num_buckets + rng.integers(0, 5, inv.sum())
    table = np.zeros((rows, R), np.float32)
    table[0] = keys
    table[1] = np.arange(R, dtype=np.float32)          # original index
    for r in range(2, rows):
        table[r] = rng.random(R).astype(np.float32) * 10 - 5
    return table


def _np_reference(table, num_buckets):
    """Stable-sorted columns per bucket, invalids dropped."""
    keys = table[0].astype(np.int64)
    out = {}
    for k in range(num_buckets):
        idx = np.nonzero(keys == k)[0]                 # ascending = stable
        out[k] = table[:, idx]
    return out


@pytest.mark.parametrize("num_buckets,B,E,R", [
    (13, 4, 32, 256),          # L=2 at B=4
    (37, 4, 32, 512),          # L=3
    (300, 16, 64, 1024),       # L=2 at B=16
    (3601, 16, 128, 2048),     # bench-like bucket count
])
def test_partition_matches_numpy(rng, num_buckets, B, E, R):
    table = _make_table(rng, R, num_buckets)
    out, meta = radix_partition(jnp.asarray(table), num_buckets, B=B, E=E,
                                interpret=True)
    out = np.asarray(out)
    starts, counts = bucket_ranges(meta)
    starts, counts = np.asarray(starts), np.asarray(counts)
    ref = _np_reference(table, num_buckets)

    total = 0
    for k in range(num_buckets):
        seg = out[:, starts[k]:starts[k] + counts[k]]
        assert seg.shape[1] == ref[k].shape[1], f"bucket {k} count"
        np.testing.assert_array_equal(seg, ref[k], err_msg=f"bucket {k}")
        total += counts[k]
    # every non-bucket position is a sentinel with zero payload
    covered = np.zeros(out.shape[1], bool)
    for k in range(num_buckets):
        covered[starts[k]:starts[k] + counts[k]] = True
    sent = float(meta.keyspace - 1)
    assert (out[0, ~covered] == sent).all()
    n_valid = int((table[0] < num_buckets).sum())
    assert total == n_valid


def test_partition_edge_cases(rng):
    num_buckets, B, E = 5, 4, 32
    # all entries one bucket; bucket count exactly a multiple of E
    table = np.zeros((8, 2 * E), np.float32)
    table[0] = 3.0
    table[1] = np.arange(2 * E)
    out, meta = radix_partition(jnp.asarray(table), num_buckets, B=B, E=E,
                                interpret=True)
    starts, counts = map(np.asarray, bucket_ranges(meta))
    assert counts[3] == 2 * E and counts[[0, 1, 2, 4]].sum() == 0
    seg = np.asarray(out)[:, starts[3]:starts[3] + 2 * E]
    np.testing.assert_array_equal(seg[1], np.arange(2 * E))

    # empty input region: all invalid
    table[0] = num_buckets + 7
    out, meta = radix_partition(jnp.asarray(table), num_buckets, B=B, E=E,
                                interpret=True)
    _, counts = bucket_ranges(meta)
    assert int(np.asarray(counts).sum()) == 0


@pytest.mark.parametrize("num_buckets,B,E,R", [
    (13, 4, 32, 256),
    (300, 16, 64, 1024),
])
def test_unpartition_roundtrip(rng, num_buckets, B, E, R):
    table = _make_table(rng, R, num_buckets, rows=8, invalid_frac=0.15)
    out, meta = radix_partition(jnp.asarray(table), num_buckets, B=B, E=E,
                                interpret=True)
    out = np.asarray(out)
    # build a "gradient" table keyed off each entry's original index row;
    # sentinel positions get NaN to prove they never contaminate real lanes
    grows = 8
    g = np.full((grows, out.shape[1]), np.nan, np.float32)
    real = out[0] < meta.num_buckets
    for r in range(grows):
        g[r, real] = out[1, real] * (r + 1) + 0.25
    back = np.asarray(radix_unpartition(jnp.asarray(np.nan_to_num(g, nan=0.0)),
                                        meta, interpret=True))
    assert back.shape == (grows, R)
    expect = np.stack([table[1] * (r + 1) + 0.25 for r in range(grows)])
    # only positions whose entries were valid carry meaningful grads
    valid = table[0] < num_buckets
    np.testing.assert_array_equal(back[:, valid], expect[:, valid])


def test_num_passes():
    assert num_passes(15, 16) == 1
    assert num_passes(16, 16) == 2   # key 15 reserved for sentinel
    assert num_passes(3601, 16) == 3
    assert num_passes(4095, 16) == 3
    assert num_passes(4096, 16) == 4
