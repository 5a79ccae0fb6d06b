"""Sharded classify (parallel/mesh.py) must agree exactly with the
single-chip kernel on an 8-virtual-device CPU mesh: prefix-aligned
index shards + psum over "ip" merge partial results losslessly
(integer counts; float scores are sums of disjoint shard contributions
per (read, taxon) cell up to addition order)."""

import numpy as np
import pytest


def _toy(seed=0, n=4096, num_species=16):
    rng = np.random.default_rng(seed)
    letters = rng.integers(1, 27, size=(n, 12))
    limb0 = np.zeros(n, np.int32)
    limb1 = np.zeros(n, np.int32)
    for j in range(6):
        limb0 |= (letters[:, j].astype(np.int32) << (5 * (5 - j)))
        limb1 |= (letters[:, 6 + j].astype(np.int32) << (5 * (5 - j)))
    limbs = np.stack([limb0, limb1], axis=1)
    taxids = rng.integers(1, num_species + 1, size=n).astype(np.uint32)
    order = np.lexsort((taxids, limb1, limb0))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(n, bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) | (taxids[1:] != taxids[:-1])
    return limbs[keep], taxids[keep], num_species


@pytest.mark.parametrize("dp,ip", [(2, 4), (1, 8), (4, 2)])
def test_sharded_classify_matches_single_chip(dp, ip):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, run_classify
    from kasa_tpu.parallel.mesh import ShardedIndex, make_sharded_classifier

    if len(jax.devices()) < dp * ip:
        pytest.skip("needs 8 virtual devices")

    limbs, taxids, num_species = _toy()
    tax_to_row = {t: t for t in range(num_species + 1)}
    S = num_species + 1

    rng = np.random.default_rng(1)
    m_per_dp, r_per_dp = 512, 64
    m = dp * m_per_dp
    pick = rng.integers(0, len(taxids), size=m)
    q = limbs[pick].copy()
    q[m // 2:, 1] ^= rng.integers(1, 31, size=m - m // 2).astype(np.int32) << 5
    rid = rng.integers(0, r_per_dp, size=m).astype(np.int32)

    # single-chip result per dp slice (reads are numbered within a slice)
    dev = DeviceIndex(limbs, taxids, tax_to_row, 12, 7, 12, S)
    tabs = StackedTables.build(dev)
    ref_scores = np.zeros((dp, r_per_dp, S), np.float32)
    ref_call = np.zeros((6, S), np.float32)
    ref_cuniq = np.zeros((6, S), np.int64)
    for d in range(dp):
        sl = slice(d * m_per_dp, (d + 1) * m_per_dp)
        out = run_classify(tabs, q[sl], rid[sl], r_per_dp)
        ref_scores[d] = np.asarray(out[0])
        ref_call += np.asarray(out[1])
        ref_cuniq += np.asarray(out[2])

    mesh = Mesh(np.asarray(jax.devices()[:dp * ip]).reshape(dp, ip),
                ("dp", "ip"))
    si = ShardedIndex.build(limbs, taxids, tax_to_row, 12, 7, 12, S,
                            num_shards=ip)
    run, _ = make_sharded_classifier(si, mesh, r_per_dp, m_per_dp)
    scores, call, cuniq, ovf = run(
        jnp.asarray(q.reshape(dp, m_per_dp, 2)),
        jnp.asarray(rid.reshape(dp, m_per_dp)),
        jnp.ones((dp, m_per_dp), bool))

    assert int(jnp.sum(ovf)) == 0
    np.testing.assert_array_equal(
        np.asarray(cuniq).sum(axis=0), ref_cuniq)
    np.testing.assert_allclose(
        np.asarray(call).sum(axis=0), ref_call, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)


def test_uniform_layout_matches_scatter_path():
    """kmers_per_read > 0 replaces every scatter with one-hot
    reductions; results must match the general path exactly (integer
    counts) / to float tolerance (scores)."""
    import jax.numpy as jnp
    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, classify_batch

    limbs, taxids, num_species = _toy(seed=3)
    S = num_species + 1
    tax_to_row = {t: t for t in range(S)}
    dev = DeviceIndex(limbs, taxids, tax_to_row, 12, 7, 12, S)
    t = StackedTables.build(dev)

    rng = np.random.default_rng(5)
    kpr, R = 64, 32
    m = kpr * R
    pick = rng.integers(0, len(taxids), size=m)
    q = limbs[pick].copy()
    q[m // 3:, 1] ^= rng.integers(1, 31, size=m - m // 3).astype(np.int32) << 5
    rid = (np.arange(m) // kpr).astype(np.int32)
    valid = rng.random(m) < 0.9

    args = (t.idx_limbs, t.grp_id, t.grp_start, t.d_tax, t.masks, t.weights,
            t.run_start, t.run_end, t.prefix_tbl, t.idx_tax,
            jnp.asarray(q), jnp.asarray(rid), jnp.asarray(valid))
    kw = dict(num_steps=t.num_steps, sub_steps=t.sub_steps, min_k=t.min_k,
              max_k=t.max_k, highest_k=t.highest_k, num_species=t.num_species,
              num_reads=R, cap=16)
    s0, ca0, cu0, ov0 = classify_batch(*args, **kw)
    s1, ca1, cu1, ov1 = classify_batch(*args, **kw, kmers_per_read=kpr)

    assert int(ov0) == int(ov1)
    np.testing.assert_array_equal(np.asarray(cu0), np.asarray(cu1))
    np.testing.assert_allclose(np.asarray(ca0), np.asarray(ca1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_run_scan_path_matches_scatter_path():
    """run_scan_w = max_run resolves every k-level from one W-wide run
    scan; results must match the general path (and are exact: T is
    never capped)."""
    import jax.numpy as jnp
    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, classify_batch

    limbs, taxids, num_species = _toy(seed=11, n=2048)
    S = num_species + 1
    tax_to_row = {t: t for t in range(S)}
    dev = DeviceIndex(limbs, taxids, tax_to_row, 12, 7, 12, S)
    t = StackedTables.build(dev)

    rng = np.random.default_rng(13)
    kpr, R = 32, 64
    m = kpr * R
    pick = rng.integers(0, len(taxids), size=m)
    q = limbs[pick].copy()
    q[m // 3:, 1] ^= rng.integers(1, 31, size=m - m // 3).astype(np.int32) << 5
    rid = (np.arange(m) // kpr).astype(np.int32)
    valid = rng.random(m) < 0.9

    args = (t.idx_limbs, t.grp_id, t.grp_start, t.d_tax, t.masks, t.weights,
            t.run_start, t.run_end, t.prefix_tbl, t.idx_tax,
            jnp.asarray(q), jnp.asarray(rid), jnp.asarray(valid))
    kw = dict(num_steps=t.num_steps, sub_steps=t.sub_steps, min_k=t.min_k,
              max_k=t.max_k, highest_k=t.highest_k, num_species=t.num_species,
              num_reads=R, cap=16)
    s0, ca0, cu0, _ = classify_batch(*args, **kw, kmers_per_read=kpr)
    s1, ca1, cu1, ov1 = classify_batch(*args, **kw, kmers_per_read=kpr,
                                       run_scan_w=t.max_run)
    assert int(ov1) == 0
    np.testing.assert_array_equal(np.asarray(cu0), np.asarray(cu1))
    np.testing.assert_allclose(np.asarray(ca0), np.asarray(ca1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_routed_classifier_agrees_with_broadcast():
    """Host-side prefix routing (each device sees only its shard's
    queries) must reproduce the broadcast+psum results bitwise for the
    integer counts, on a larger-than-toy shard count (ip=8)."""
    import numpy as np
    import jax.numpy as jnp
    from kasa_tpu.parallel.dist import make_identify_mesh
    from kasa_tpu.parallel.mesh import (ShardedIndex, make_routed_classifier,
                                        make_sharded_classifier,
                                        route_queries)
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from __graft_entry__ import _toy_index, _toy_queries

    mesh = make_identify_mesh(ip=8, dp=1)
    limbs, taxids, ns = _toy_index(num_entries=4096)
    tax_to_row = {t: t for t in range(ns + 1)}
    si = ShardedIndex.build(limbs, taxids, tax_to_row, 12, 7, 12, ns + 1,
                            num_shards=8)
    m, r_per_dp = 1024, 128
    q, rid, valid = _toy_queries(limbs, m=m)
    rid = rid % r_per_dp

    run_b, _ = make_sharded_classifier(si, mesh, r_per_dp, m)
    sb, cab, cub, _ = run_b(jnp.asarray(q[None]), jnp.asarray(rid[None]),
                            jnp.asarray(valid[None]))

    qr, rr, vr, dropped = route_queries(si, q, rid, valid, dp=1, m_cap=m)
    assert dropped == 0
    run_r, _ = make_routed_classifier(si, mesh, r_per_dp, m)
    sr, car, cur, _ = run_r(jnp.asarray(qr), jnp.asarray(rr), jnp.asarray(vr))

    assert np.array_equal(np.asarray(cur), np.asarray(cub))
    np.testing.assert_allclose(np.asarray(car), np.asarray(cab), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sb),
                               rtol=2e-5, atol=1e-4)
