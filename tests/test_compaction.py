"""Prefix-scan compaction tests (the real unit test the reference's
PrefixSum() harness (main.cpp:144-170) only eyeballed)."""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.ops.compaction import (
    compact_indices,
    exclusive_scan,
    inclusive_scan,
    scatter_back,
)


def test_inclusive_scan_matches_cumsum():
    rng = np.random.default_rng(0)
    # 1024 elements — the workgroup size of prefix_sum.comp:3
    x = rng.integers(0, 100, size=1024).astype(np.int32)
    got = np.asarray(inclusive_scan(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_exclusive_scan():
    x = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
    np.testing.assert_array_equal(np.asarray(exclusive_scan(x)), [0, 3, 4, 8, 9])


def test_compact_indices_is_permutation():
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=1000) < 0.3
    perm, count = compact_indices(jnp.asarray(mask))
    perm = np.asarray(perm)
    assert int(count) == mask.sum()
    assert sorted(perm.tolist()) == list(range(1000))
    # first `count` slots are exactly the live indices, in order
    np.testing.assert_array_equal(perm[: int(count)], np.nonzero(mask)[0])


def test_scatter_back_roundtrip():
    rng = np.random.default_rng(2)
    mask = rng.uniform(size=257) < 0.5
    x = rng.normal(size=(257, 3)).astype(np.float32)
    perm, _ = compact_indices(jnp.asarray(mask))
    gathered = jnp.asarray(x)[perm]
    restored = scatter_back(gathered, perm)
    np.testing.assert_array_equal(np.asarray(restored), x)


def test_all_and_none_live():
    for mask in (np.ones(64, bool), np.zeros(64, bool)):
        perm, count = compact_indices(jnp.asarray(mask))
        assert int(count) == mask.sum()
        assert sorted(np.asarray(perm).tolist()) == list(range(64))


def test_sort_live_first_is_keyed_permutation():
    from pnraytracing_tpu.ops.compaction import sort_live_first

    rng = np.random.default_rng(3)
    mask = rng.random(256) < 0.4
    key = rng.integers(0, 512, 256).astype(np.uint32)
    perm, count = sort_live_first(jnp.asarray(mask), jnp.asarray(key))
    perm = np.asarray(perm)
    assert sorted(perm.tolist()) == list(range(256))  # permutation
    assert int(count) == mask.sum()
    # live lanes first, sorted by key; dead lanes after, sorted by key
    m_s, k_s = mask[perm], key[perm]
    assert m_s[: mask.sum()].all() and not m_s[mask.sum():].any()
    assert (np.diff(k_s[: mask.sum()].astype(np.int64)) >= 0).all()


def test_coherence_key_in_range_and_groups_octants():
    from pnraytracing_tpu.ops.compaction import coherence_key

    rng = np.random.default_rng(5)
    n = rng.standard_normal((128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    pos = rng.random((128, 3)).astype(np.float32) * 4 - 2
    lo = jnp.asarray([-2.0, -2.0, -2.0])
    inv = jnp.asarray([0.25, 0.25, 0.25])
    key = np.asarray(coherence_key(jnp.asarray(n), jnp.asarray(pos), lo, inv))
    assert (key < (1 << 15)).all()
    # most-significant bits are the normal octant
    oct_ = (n[:, 0] > 0) * 4 + (n[:, 1] > 0) * 2 + (n[:, 2] > 0)
    np.testing.assert_array_equal(key >> 12, oct_.astype(np.uint32))


def test_treelet_entry_key_pallas_matches_xla():
    """The Mosaic key kernel and the XLA broadcast form must agree on
    the binning (identical arithmetic; ties may break differently, so a
    tiny disagreement fraction is tolerated)."""
    import numpy as np

    from pnraytracing_tpu.ops.compaction import (
        treelet_entry_key,
        treelet_entry_key_pallas,
    )

    rng = np.random.default_rng(11)
    k = 37
    lo = rng.uniform(-4, 2, size=(k, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.2, 2.0, size=(k, 3)).astype(np.float32)
    treelets = jnp.asarray(np.concatenate([lo, hi], axis=1))
    n = 1024
    o = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    kx = np.asarray(treelet_entry_key(o, d, treelets))
    kp = np.asarray(treelet_entry_key_pallas(o, d, treelets,
                                             tile_size=128))
    agree = (kx == kp).mean()
    assert agree > 0.99, f"only {agree:.3%} of keys agree"
