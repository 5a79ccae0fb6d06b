"""Turbo kernel on 128-bit (5-limb, k <= 25) indices: the r5 limb-
generic search/slots path must reproduce intended-semantics scoring
for the 20..25 k-range (reference: packedPairs.hpp:132-136 stores
these as uint128; our limbs stay int32 lanes), including the host
overflow contract."""

import numpy as np

S = 1024
MIN_K, MAX_K, HK = 20, 25, 25
NUM_K = MAX_K - MIN_K + 1
L = 5


def _pyint_keys(limbs):
    out = []
    for row in limbs:
        v = 0
        for x in row:
            v = (v << 30) | int(x)
        out.append(v)
    return out


def _index128(n=20_000, seed=7, heavy_ts=(2, 3, 5, 9, 30, 200)):
    rng = np.random.default_rng(seed)
    letters = rng.integers(1, 27, size=(n, 25), dtype=np.int32)
    letters[:, 0] = rng.integers(1, 5, size=n)
    limbs = np.zeros((n, L), np.int32)
    for j in range(25):
        i, jj = divmod(j, 6)
        limbs[:, i] |= letters[:, j] << (5 * (5 - jj))
    taxids = rng.integers(1, S, size=n).astype(np.uint32)
    extra_l, extra_t = [], []
    hot = []
    for T in heavy_ts:
        kl = limbs[rng.integers(0, n)]
        hot.append(kl.copy())
        taxa = rng.choice(np.arange(1, S), size=T,
                          replace=False).astype(np.uint32)
        extra_l.append(np.repeat(kl[None, :], T, axis=0))
        extra_t.append(taxa)
    limbs = np.concatenate([limbs] + extra_l)
    taxids = np.concatenate([taxids] + extra_t)
    order = np.lexsort(tuple(limbs[:, i] for i in range(L - 1, -1, -1))
                       + (taxids,))
    # lexsort keys are last-significant-first: rebuild properly
    order = np.lexsort((taxids,) + tuple(
        limbs[:, i] for i in range(L - 1, -1, -1)))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(len(taxids), bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) \
        | (taxids[1:] != taxids[:-1])
    return limbs[keep], taxids[keep], np.array(hot)


def _oracle(limbs, taxids, q, R, kpr):
    from kasa_tpu.core import kmer
    scores = np.zeros((R, S), np.float64)
    counts_all = np.zeros((NUM_K, S), np.float64)
    counts_unique = np.zeros((NUM_K, S), np.int64)
    rid = np.arange(len(q)) // kpr
    for ki, k in enumerate(range(MAX_K, MIN_K - 1, -1)):
        mask = kmer.prefix_masks(HK, k).astype(np.int32)
        ip = _pyint_keys(limbs & mask)
        qp = _pyint_keys(q & mask)
        import bisect
        w = (k * k) / 625.0
        for i, v in enumerate(qp):
            lo = bisect.bisect_left(ip, v)
            hi = bisect.bisect_right(ip, v)
            if lo < hi:
                taxa = np.unique(taxids[lo:hi].astype(np.int64))
                T = len(taxa)
                scores[rid[i], taxa] += w / T
                counts_all[ki, taxa] += 1.0 / T
                if T == 1:
                    counts_unique[ki, taxa] += 1
    return scores, counts_all, counts_unique


def test_turbo128_matches_oracle():
    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.turbo import (TurboTables, turbo_classify,
                                      host_classify_read,
                                      turbo_supported)
    import jax.numpy as jnp

    limbs, taxids, hot = _index128()
    rng = np.random.default_rng(3)
    R, kpr = 32, 16
    m = R * kpr
    pick = rng.integers(0, len(taxids), size=m)
    q = limbs[pick].copy()
    miss = rng.random(m) < 0.3
    q[miss, 4] ^= (rng.integers(1, 31, size=int(miss.sum()))
                   .astype(np.int32) << 25)
    for i, kl in enumerate(hot):        # plant every tier incl. T=200
        q[i * kpr] = kl

    tax_to_row = {t: t for t in range(S)}
    dev = DeviceIndex(limbs, taxids, tax_to_row, HK, MIN_K, MAX_K, S)
    assert turbo_supported(dev.n, L, MIN_K, MAX_K, S)
    tt = TurboTables.build(dev)
    out = turbo_classify(
        tt.keys2, tt.rowdat, tt.router, tt.sub2, tt.grp2, tt.d_tax4,
        tt.weights, tt.masks2, tt.hotmask, tt.t_hot, jnp.asarray(q),
        tt.num_steps, MIN_K, MAX_K, HK, S, R, kpr)
    ht, hk, hc, ca, cu, ofc, ofl = [np.asarray(o) for o in out]
    ca = ca.astype(np.float64)
    cu64 = cu.astype(np.int64)
    lists = {}
    for r in range(R):
        if ofl[r]:
            sc, ca2, cu2 = host_classify_read(tt, q[r * kpr:(r + 1) * kpr])
            if ofc[r]:
                ca += ca2
                cu64 += cu2
            lists[r] = sorted(sc.items())
        else:
            lists[r] = [(int(ht[r, i]), float(hk[r, i]))
                        for i in range(hc[r])]

    oscores, oca, ocu = _oracle(limbs, taxids, q, R, kpr)
    np.testing.assert_allclose(ca, oca, rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(cu64, ocu)
    for r in range(R):
        want = {t: v for t, v in enumerate(oscores[r]) if v > 0}
        got = dict(lists[r])
        assert set(got) == set(want), f"read {r} taxa differ"
        for t, v in want.items():
            np.testing.assert_allclose(got[t], v, rtol=2e-4, atol=1e-3)
