"""128-bit (L=5 limb) fast-path correctness: the jitted device kernel's
multi-limb masked search + scoring must match an intended-semantics
oracle at highest_k=25 (VERDICT round 1 item 8).  The parity oracle for
CLI output is match/walk128.py (which reproduces the reference's
uint64-truncated-comparator bug); the fast path implements the clean
right-shift-per-k semantics (Compare.hpp:865-874 without the
std::function truncation), so the oracle here is a from-scratch
python/numpy group model over full 125-bit keys."""

import numpy as np
import pytest

HIGHEST_K = 25
L = 5   # ceil(25 / 6) int32 limbs


def _pack(letters: np.ndarray) -> np.ndarray:
    """(n, 25) letters 1..26 -> (n, 5) int32 limbs, top-aligned per limb
    (core/kmer.py layout: letter j of limb i at bit 5*(5 - j))."""
    n = letters.shape[0]
    limbs = np.zeros((n, L), np.int32)
    for pos in range(HIGHEST_K):
        i, j = divmod(pos, 6)
        limbs[:, i] |= letters[:, pos] << (5 * (5 - j))
    return limbs


def _index_128(n=30_000, num_species=64, heavy_groups=6, heavy_t=(20, 60),
               seed=11):
    rng = np.random.default_rng(seed)
    letters = rng.integers(1, 27, size=(n, HIGHEST_K), dtype=np.int32)
    # skewed first letters -> long limb0 runs, like a real index
    letters[:, 0] = rng.integers(1, 4, size=n)
    limbs = _pack(letters)
    taxids = rng.integers(1, num_species + 1, size=n).astype(np.uint32)

    extra_l, extra_t = [], []
    for _ in range(heavy_groups):
        T = int(rng.integers(*heavy_t))
        kl = limbs[rng.integers(0, n)]
        taxa = rng.choice(np.arange(1, num_species + 1), size=T,
                          replace=False).astype(np.uint32)
        extra_l.append(np.repeat(kl[None, :], T, axis=0))
        extra_t.append(taxa)
    limbs = np.concatenate([limbs] + extra_l)
    taxids = np.concatenate([taxids] + extra_t)

    order = np.lexsort((taxids,) + tuple(limbs[:, i] for i in range(L - 1, -1, -1)))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(len(taxids), bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) | (taxids[1:] != taxids[:-1])
    return limbs[keep], taxids[keep], num_species


def _queries_128(limbs, m, kmers_per_read, seed=13):
    rng = np.random.default_rng(seed)
    pick = rng.integers(0, len(limbs), size=m)
    q = limbs[pick].copy()
    # ~30% perturbed in a random limb -> partial-prefix hits at some k
    miss = rng.random(m) < 0.3
    mi = np.nonzero(miss)[0]
    limb_pick = rng.integers(0, L, size=len(mi))
    q[mi, limb_pick] ^= (rng.integers(1, 31, size=len(mi))
                         .astype(np.int32) << 5)
    rid = (np.arange(m) // kmers_per_read).astype(np.int32)
    return q, rid


def _keys_full(limbs) -> list:
    """Full 125-bit keys as python ints (arbitrary precision oracle)."""
    from kasa_tpu.core import kmer
    hi, lo = kmer.limbs_to_u128_parts(limbs)
    return [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]


def _oracle_128(limbs, taxids, q, rid, num_reads, S, min_k, max_k):
    """score[r][t] += w(k)/|T_g| per (matched query, group taxon);
    counts_all[ki][t] += 1/|T_g|; counts_unique when |T_g| == 1.
    Matching at k = full-key right shift by 5*(25-k) equality."""
    ikeys = _keys_full(limbs)
    qkeys = _keys_full(q)
    num_k = max_k - min_k + 1
    scores = np.zeros((num_reads, S), np.float64)
    counts_all = np.zeros((num_k, S), np.float64)
    counts_unique = np.zeros((num_k, S), np.uint64)
    ia = np.array(ikeys, dtype=object)
    for ki in range(num_k):
        k = max_k - ki
        sh = 5 * (HIGHEST_K - k)
        ip = ia >> sh
        qp = [x >> sh for x in qkeys]
        lo_i = np.searchsorted(ip, qp, "left")
        hi_i = np.searchsorted(ip, qp, "right")
        w = (k * k) / 625.0
        for i in range(len(qp)):
            if lo_i[i] < hi_i[i]:
                taxa = np.unique(taxids[lo_i[i]:hi_i[i]].astype(np.int64))
                scores[rid[i], taxa] += w / len(taxa)
                counts_all[ki, taxa] += 1.0 / len(taxa)
                if len(taxa) == 1:
                    counts_unique[ki, taxa] += 1
    return scores, counts_all, counts_unique


@pytest.mark.parametrize("min_k,max_k", [(7, 12), (20, 25)])
def test_kernel_L5_matches_oracle(min_k, max_k):
    """classify_batch with 5 limbs (full masked per-level search) vs the
    python oracle over true 125-bit keys, at both low-k (masks touch
    only limbs 0-1) and high-k (masks span all 5 limbs)."""
    import jax.numpy as jnp
    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, classify_batch

    limbs, taxids, ns = _index_128()
    S = ns + 1
    kpr = 32
    q, rid = _queries_128(limbs, m=2048, kmers_per_read=kpr)
    num_reads = 2048 // kpr
    exp_scores, exp_all, exp_unique = _oracle_128(
        limbs, taxids, q, rid, num_reads, S, min_k, max_k)

    tax_to_row = {t: t for t in range(S)}
    dev = DeviceIndex(limbs, taxids, tax_to_row, HIGHEST_K, min_k, max_k, S)
    t = StackedTables.build(dev)
    res = classify_batch(
        t.idx_limbs, t.grp_id, t.grp_start, t.d_tax, t.masks, t.weights,
        t.run_start, t.run_end, t.prefix_tbl, t.idx_tax,
        jnp.asarray(q), jnp.asarray(rid), jnp.ones(len(rid), bool),
        t.num_steps, t.sub_steps, min_k, max_k, HIGHEST_K,
        S, num_reads, cap=8, kmers_per_read=kpr, dense_scores=True)
    scores, counts_all, counts_unique, tail = [np.asarray(x) for x in res]
    assert np.array_equal(counts_unique.astype(np.uint64), exp_unique)
    np.testing.assert_allclose(counts_all, exp_all, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(scores[:num_reads], exp_scores,
                               rtol=2e-4, atol=1e-3)
    assert int(tail) > 0, "heavy groups must exercise the tail loop"


def test_engine_L5_end_to_end():
    """TpuEngine (bucketed batches) on a 128-bit index agrees with the
    oracle -- the engine path the CLI uses for --engine tpu."""
    from kasa_tpu.match.engine import TpuEngine

    limbs, taxids, ns = _index_128(n=12_000, heavy_groups=3)
    S = ns + 1
    kpr = 17    # deliberately not a multiple of 16
    m = kpr * 40
    q, rid = _queries_128(limbs, m=m, kmers_per_read=kpr, seed=29)
    num_reads = m // kpr
    exp_scores, exp_all, exp_unique = _oracle_128(
        limbs, taxids, q, rid, num_reads, S, 20, 25)

    tax_to_row = {t: t for t in range(S)}
    eng = TpuEngine(limbs, taxids, tax_to_row, HIGHEST_K, 20, 25, S)
    res = eng.classify(q, rid, num_reads)
    assert np.array_equal(res.counts_unique, exp_unique)
    np.testing.assert_allclose(res.counts_all, exp_all, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(res.scores, exp_scores, rtol=2e-4, atol=1e-3)
