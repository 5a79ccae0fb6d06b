"""Turbo classify kernel -- gather-minimal device path for identify.

Replaces the reference's per-thread merge-join (Compare.hpp:679-1069)
with a design built around measured TPU primitive costs: random
gathers/scatters issue at ~75M elements/s on this hardware regardless
of table size or locality, while row-gathers amortize (a (N,8) int32
row costs ~1.6x a single element) and VMEM-local per-row sorts run at
GB/s.  The kernel therefore:

  * does ONE full-key (two 30-bit limbs, lexicographic) lower_bound
    per query -- a dense 22-bit router gather plus a few residual
    probes -- and decides EVERY k level from it: the level-k group
    [a,b) of a query pins lower_bound(full key) into [a,b], so a
    nonempty group shows the k-prefix at pos or pos-1 (see
    match/device.py fullkey notes; holds for any k with 5k >= router
    bits, and the pos-1 row is read unconstrained so bucket
    boundaries cannot hide a prefix match);
  * fetches per-entry data as ONE (N,8) int32 row [limb0, limb1, tax,
    Tpack, previous-entry x4] -- the predecessor entry rides along,
    halving the row-gather passes;
  * packs per-entry per-level distinct-taxa counts (clamped to 31,
    5 bits each) into the Tpack word, so the overwhelmingly common
    T == 1 case needs NO group-table gathers at all: the group's
    single taxon is the matched entry's own taxon;
  * aggregates scores WITHOUT large scatters: slots (taxon, 1/T
    credit) are laid out read-major and reduced by per-read VMEM
    sorts + segment scans into compact per-read (tax, ksum) hit
    lists -- exactly what the output ranker consumes (native sparse
    writer, native/writer.cpp kasa_rank_format_sparse);
  * expands multi-taxa groups (T >= 2) through tiered, budgeted
    d_tax row-gathers (4 taxa per row); reads exceeding the static
    budgets (T > 64, > 84 multi windows, > CW distinct pairs) raise a
    per-read overflow flag and are recomputed exactly on the host
    (match semantics: Compare.hpp:516-597 caps nothing; neither do we).

Scoring semantics match match/join.py (split credit w(k)/T, '^'
validity, per-k prefix groups); bit-exact reference parity stays with
match/exact.py.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmer
from .join import DeviceIndex, weight

ROUTER_BITS = 22            # dense router over the top bits of limb0
LIMB_BITS = 30              # 6 letters x 5 bits per limb

# multi-taxa expansion tiers: (slots, taxa capacity) -- heaviest groups
# first (the workspace is sorted by descending clamped T)
TIER3_SLOTS, TIER3_CAP = 4, 64
TIER2_SLOTS, TIER2_CAP = 16, 16
TIER1_SLOTS, TIER1_CAP = 64, 4
MULTI_SLOTS = TIER1_SLOTS + TIER2_SLOTS + TIER3_SLOTS
EX_COLS = (TIER1_SLOTS * TIER1_CAP + TIER2_SLOTS * TIER2_CAP
           + TIER3_SLOTS * TIER3_CAP)

CW = 160                    # compact (tax, k) runs kept per read
WOUT = 48                   # distinct taxa emitted per read
I32_MAX = np.int32(2**31 - 1)


def _num_steps(n: int) -> int:
    s = 1
    while (1 << s) < n + 1:
        s += 1
    return s


@dataclass
class TurboTables:
    """Device-side tables for the turbo kernel (built on host)."""
    keys2: jax.Array        # (N, 2) int32 sorted (limb0, limb1)
    rowdat: jax.Array       # (N, 8) int32 [l0, l1, tax, tpack, prev x4]
    router: jax.Array       # (2^ROUTER_BITS, 2) int32 [lo, hi]
    grp2: jax.Array         # (numK * N, 2) int32 [T, d_tax4 row]
    d_tax4: jax.Array       # (DR, 4) int32 padded distinct-taxa rows
    weights: jax.Array      # (numK,) float32 w(k), row ki <-> k=maxK-ki
    masks2: jax.Array       # (numK, 2) int32 prefix masks
    num_steps: int
    min_k: int
    max_k: int
    highest_k: int
    num_species: int
    n: int
    # host data for the exact overflow fallback
    host_key64: np.ndarray
    host_grp_start: list
    host_d_tax: list
    host_grp_id: list       # (N,) int32 per level (refs into DeviceIndex)
    host_masks64: np.ndarray

    @classmethod
    def supported(cls, dev: DeviceIndex) -> bool:
        return turbo_supported(dev.n, dev.num_limbs, dev.min_k, dev.max_k,
                               dev.num_species)

    @classmethod
    def build(cls, dev: DeviceIndex) -> "TurboTables":
        tables = [dev.tables[dev.max_k - ki]
                  for ki in range(dev.max_k - dev.min_k + 1)]
        return cls._build(dev.idx_limbs_np, dev.tax_rows, tables,
                          dev.highest_k, dev.min_k, dev.max_k,
                          dev.num_species)

    @classmethod
    def build_from_arrays(cls, limbs: np.ndarray, tax_rows: np.ndarray,
                          highest_k: int, min_k: int, max_k: int,
                          num_species: int) -> "TurboTables":
        """Build without a DeviceIndex (no device upload of the raw
        limb array, no dict mapping): the turbo path's loader."""
        from .join import build_group_table
        tables = [build_group_table(limbs, tax_rows, highest_k, max_k - ki)
                  for ki in range(max_k - min_k + 1)]
        return cls._build(limbs, tax_rows, tables, highest_k, min_k,
                          max_k, num_species)

    @classmethod
    def _build(cls, limbs, tax_rows, tables, highest_k, min_k, max_k,
               num_species) -> "TurboTables":
        n = len(tax_rows)
        num_k = max_k - min_k + 1
        key64 = (limbs[:, 0].astype(np.int64) << LIMB_BITS) \
            | limbs[:, 1].astype(np.int64)
        tax = tax_rows.astype(np.int32)

        # per-level T per entry (clamped) + flat grp table + d_tax4
        tpack = np.zeros(n, np.int32)
        grp2 = np.zeros((num_k * n, 2), np.int32)
        d_tax4_parts = [np.zeros((1, 4), np.int32)]   # row 0 reserved
        row_next = 1
        masks2 = np.zeros((num_k, 2), np.int32)
        masks64 = np.zeros(num_k, np.int64)
        for ki in range(num_k):
            t = tables[ki]
            masks2[ki] = t.mask
            masks64[ki] = (np.int64(t.mask[0]) << LIMB_BITS) \
                | np.int64(t.mask[1])
            sizes = np.diff(t.grp_start).astype(np.int64)   # (G,)
            T_entry = sizes[t.grp_id]                        # (N,)
            tpack |= (np.minimum(T_entry, 31) << (5 * ki)).astype(np.int32)
            multi = sizes >= 2
            rows_per = np.where(multi, (sizes + 3) // 4, 0)
            row_base = np.zeros(len(sizes) + 1, np.int64)
            np.cumsum(rows_per, out=row_base[1:])
            total_rows = int(row_base[-1])
            grp_row = np.where(multi, row_next + row_base[:-1], 0)
            grp2[ki * n:(ki + 1) * n, 0] = np.minimum(T_entry, I32_MAX)
            grp2[ki * n:(ki + 1) * n, 1] = grp_row[t.grp_id]
            if total_rows:
                buf = np.zeros(total_rows * 4, np.int32)
                sizes32 = np.diff(t.grp_start)
                pair_grp = np.repeat(np.arange(len(sizes32)), sizes32)
                within = np.arange(len(t.d_tax)) - t.grp_start[pair_grp]
                sel = multi[pair_grp]
                dst = row_base[pair_grp[sel]] * 4 + within[sel]
                buf[dst] = t.d_tax[sel]
                d_tax4_parts.append(buf.reshape(-1, 4))
                row_next += total_rows
        d_tax4 = np.concatenate(d_tax4_parts, axis=0)

        rowdat = np.empty((n, 8), np.int32)
        rowdat[:, 0], rowdat[:, 1] = limbs[:, 0], limbs[:, 1]
        rowdat[:, 2], rowdat[:, 3] = tax, tpack
        rowdat[1:, 4:8] = rowdat[:-1, 0:4]
        rowdat[0, 4:6] = -1     # sentinel prev key: all ones never matches
        rowdat[0, 6:8] = 0

        buckets = limbs[:, 0] >> (LIMB_BITS - ROUTER_BITS)
        edges = np.searchsorted(
            buckets, np.arange((1 << ROUTER_BITS) + 1)).astype(np.int32)
        router = np.stack([edges[:-1], edges[1:]], axis=1)
        max_bucket = int(np.diff(edges).max()) if n else 1

        w = np.array([weight(max_k - ki) for ki in range(num_k)],
                     np.float32)
        return cls(
            jnp.asarray(np.ascontiguousarray(limbs)), jnp.asarray(rowdat),
            jnp.asarray(router), jnp.asarray(grp2), jnp.asarray(d_tax4),
            jnp.asarray(w), jnp.asarray(masks2),
            _num_steps(max_bucket), min_k, max_k, highest_k,
            num_species, n,
            key64,
            [t.grp_start for t in tables],
            [t.d_tax for t in tables],
            [t.grp_id for t in tables],
            masks64)


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "min_k", "max_k", "highest_k",
                     "num_species", "num_reads", "kmers_per_read"))
def turbo_classify(keys2, rowdat, router, grp2, d_tax4, weights, masks2,
                   q_limbs, num_steps, min_k, max_k, highest_k,
                   num_species, num_reads, kmers_per_read):
    """-> (hit_tax (R, WOUT) i32, hit_ksum (R, WOUT) f32,
           hit_cnt (R,) i32, counts_all (numK, S) f32,
           counts_unique (numK, S) i32, oflow_counts (R,) bool,
           oflow_lists (R,) bool).

    oflow_counts: the read exceeded an expansion budget; its count
    contributions were ZEROED on device and the host must recompute the
    whole read (counts + hits).  oflow_lists: counts are exact but the
    hit list was truncated (> WOUT distinct taxa); the host recomputes
    only the list.

    q_limbs: (M, 2) int32 in uniform read-major layout (query row m
    belongs to read m // kmers_per_read); phantom windows self-mask via
    their '^' letters."""
    n = keys2.shape[0]
    M = q_limbs.shape[0]
    num_k = max_k - min_k + 1
    R = num_reads
    kpr = kmers_per_read
    assert M == R * kpr

    qh = q_limbs[:, 0]
    ql = q_limbs[:, 1]

    # ---- '^' validity cum over letter positions minK-1..maxK-1
    def letter(pos):
        i, j = divmod(pos, kmer.LETTERS_PER_LIMB)
        shift = kmer.BITS_PER_LETTER * (kmer.LETTERS_PER_LIMB - 1 - j)
        return (q_limbs[:, i] >> shift) & 31
    ok = jnp.ones((M,), bool)
    cum_ok_by_k = []
    for pos in range(min_k - 1, max_k):
        ok = ok & (letter(pos) != 30)
        cum_ok_by_k.append(ok)
    cum_ok = [cum_ok_by_k[max_k - min_k - ki] for ki in range(num_k)]

    # ---- search: router + residual lower_bound on the (l0, l1) key
    bucket = qh >> (LIMB_BITS - ROUTER_BITS)
    rr = router[bucket]                       # (M, 2)
    lo, hi = rr[:, 0], rr[:, 1]

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        kk = keys2[jnp.minimum(mid, n - 1)]
        less = (kk[:, 0] < qh) | ((kk[:, 0] == qh) & (kk[:, 1] < ql))
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)
    lo, _ = jax.lax.fori_loop(0, num_steps, body, (lo, hi))
    pos = lo
    pos_c = jnp.minimum(pos, n - 1)
    at_n = pos >= n

    row = rowdat[pos_c]                       # (M, 8)
    # when pos == n the "at" columns of row n-1 are the predecessor
    at_cols = row[:, 0:4]
    pv_cols = jnp.where(at_n[:, None], row[:, 0:4], row[:, 4:8])
    prev = jnp.maximum(pos - 1, 0)
    prev_ok = pos > 0

    # ---- per-level slots (T1 direct; multi via workspace)
    skeys, scs = [], []
    mkeys, mpays = [], []
    for ki in range(num_k):
        mh, ml = masks2[ki, 0], masks2[ki, 1]
        qmh, qml = qh & mh, ql & ml
        hit_at = ~at_n & ((at_cols[:, 0] & mh) == qmh) \
            & ((at_cols[:, 1] & ml) == qml)
        hit_pv = prev_ok & ((pv_cols[:, 0] & mh) == qmh) \
            & ((pv_cols[:, 1] & ml) == qml)
        matched = (hit_at | hit_pv) & cum_ok[ki]
        tax = jnp.where(hit_pv, pv_cols[:, 2], at_cols[:, 2])
        tp = jnp.where(hit_pv, pv_cols[:, 3], at_cols[:, 3])
        tc = (tp >> (5 * ki)) & 31
        psel = jnp.where(hit_pv, jnp.where(at_n, n - 1, prev), pos_c)
        t1 = matched & (tc == 1)
        multi = matched & (tc >= 2)
        skeys.append(jnp.where(t1, tax * 8 + ki, I32_MAX))
        scs.append(jnp.where(t1, 1.0, 0.0).astype(jnp.float32))
        # multi workspace: sort key = descending clamped T
        mkeys.append(jnp.where(multi, 31 - tc, jnp.int32(64)))
        mpays.append(psel * 8 + ki)

    # (R, kpr * numK) read-major slot matrices
    def rm(cols, dtype):
        a = jnp.stack(cols, axis=1)           # (M, numK)
        return a.reshape(R, kpr * num_k).astype(dtype)
    skey = rm(skeys, jnp.int32)
    sc = rm(scs, jnp.float32)
    mkey = rm(mkeys, jnp.int32)
    mpay = rm(mpays, jnp.int32)

    multi_cnt = jnp.sum((mkey < 64), axis=1)

    # ---- multi workspace: heaviest groups first, tiered expansion
    mkey_s, mpay_s = jax.lax.sort((mkey, mpay), dimension=1, num_keys=1)
    if mkey_s.shape[1] < MULTI_SLOTS:   # fewer slots than the workspace
        pad = MULTI_SLOTS - mkey_s.shape[1]
        mkey_s = jnp.concatenate(
            [mkey_s, jnp.full((R, pad), 64, jnp.int32)], axis=1)
        mpay_s = jnp.concatenate(
            [mpay_s, jnp.zeros((R, pad), jnp.int32)], axis=1)
    ws_key = mkey_s[:, :MULTI_SLOTS]
    ws_pay = mpay_s[:, :MULTI_SLOTS]
    ws_valid = ws_key < 64
    ws_ki = ws_pay & 7
    ws_pos = ws_pay >> 3
    flat = ws_ki * n + ws_pos
    grow = grp2[jnp.where(ws_valid, flat, 0)]     # (R, MS, 2)
    Tx = jnp.where(ws_valid, grow[:, :, 0], 0)
    row0 = grow[:, :, 1]
    cx = jnp.where(ws_valid & (Tx > 0), 1.0 / Tx.astype(jnp.float32), 0.0)

    ex_keys, ex_cs = [], []
    iota4 = jnp.arange(4, dtype=jnp.int32)
    col = 0
    dr = d_tax4.shape[0]
    for slots, cap in ((TIER3_SLOTS, TIER3_CAP),
                       (TIER2_SLOTS, TIER2_CAP),
                       (TIER1_SLOTS, TIER1_CAP)):
        sl = slice(col, col + slots)
        col += slots
        for r4 in range(cap // 4):
            rows = jnp.minimum(row0[:, sl] + r4, dr - 1)      # (R, slots)
            taxa = d_tax4[rows]                               # (R, slots, 4)
            within = r4 * 4 + iota4                           # (4,)
            okx = ws_valid[:, sl, None] & (within[None, None, :]
                                           < Tx[:, sl, None])
            key = jnp.where(okx, taxa * 8 + ws_ki[:, sl, None], I32_MAX)
            cval = jnp.where(okx, cx[:, sl, None], 0.0)
            ex_keys.append(key.reshape(R, slots * 4))
            ex_cs.append(cval.reshape(R, slots * 4))

    # overflow: budgets exceeded -> exact host recompute of the read
    tmax3 = jnp.max(jnp.where(ws_valid[:, :TIER3_SLOTS],
                              Tx[:, :TIER3_SLOTS], 0), axis=1)
    tc_s = jnp.where(ws_valid, 31 - ws_key, 0)    # clamped T, sorted desc
    t2max = jnp.max(tc_s[:, TIER3_SLOTS:TIER3_SLOTS + TIER2_SLOTS], axis=1)
    t1max = jnp.max(tc_s[:, TIER3_SLOTS + TIER2_SLOTS:], axis=1)
    oflow_counts = ((multi_cnt > MULTI_SLOTS) | (tmax3 > TIER3_CAP)
                    | (t2max > TIER2_CAP) | (t1max > TIER1_CAP))

    # ---- one read-major sort over T1 + expanded slots
    allk = jnp.concatenate([skey] + ex_keys, axis=1)
    allc = jnp.concatenate([sc] + ex_cs, axis=1)
    sk, sv = jax.lax.sort((allk, allc), dimension=1, num_keys=1)

    valid = sk != I32_MAX
    nxt = jnp.concatenate([sk[:, 1:], jnp.full((R, 1), I32_MAX, jnp.int32)],
                          axis=1)
    run_end = (sk != nxt) & valid
    csum = jnp.cumsum(sv, axis=1)
    prv = jnp.concatenate([jnp.full((R, 1), -1, jnp.int32), sk[:, :-1]],
                          axis=1)
    run_start = (sk != prv)
    base = jnp.where(run_start, csum - sv, -jnp.inf)
    base = jax.lax.cummax(base, axis=1)
    # unique occurrences: credit c == 1 exactly iff T == 1
    uv = (sv == 1.0).astype(jnp.float32)
    ucsum = jnp.cumsum(uv, axis=1)
    ubase = jnp.where(run_start, ucsum - uv, -jnp.inf)
    ubase = jax.lax.cummax(ubase, axis=1)
    run_c = jnp.where(run_end, csum - base, 0.0)      # sum of 1/T credits
    run_u = jnp.where(run_end, ucsum - ubase, 0.0)    # unique count

    # compact runs to CW columns
    ckey = jnp.where(run_end, sk, I32_MAX)
    ck, cc, cu = jax.lax.sort((ckey, run_c, run_u), dimension=1, num_keys=1)
    runs_per_read = jnp.sum(run_end, axis=1)
    oflow_counts = oflow_counts | (runs_per_read > CW)
    ck, cc, cu = ck[:, :CW], cc[:, :CW], cu[:, :CW]
    # overflowed reads are recomputed whole on host: zero their count
    # contributions so the recompute does not double-add
    keep = ~oflow_counts
    cc = jnp.where(keep[:, None], cc, 0.0)
    cu = jnp.where(keep[:, None], cu, 0.0)
    cvalid = ck != I32_MAX
    cki = jnp.where(cvalid, ck & 7, 0)
    ctax = jnp.where(cvalid, ck >> 3, 0)

    cell = jnp.where(cvalid, cki * num_species + ctax,
                     num_k * num_species)
    flat_ca = jnp.zeros((num_k * num_species + 1,), jnp.float32)
    flat_cu = jnp.zeros((num_k * num_species + 1,), jnp.float32)
    flat_ca = flat_ca.at[cell.reshape(-1)].add(cc.reshape(-1))
    flat_cu = flat_cu.at[cell.reshape(-1)].add(cu.reshape(-1))
    counts_all = flat_ca[:num_k * num_species].reshape(num_k, num_species)
    counts_unique = flat_cu[:num_k * num_species].reshape(
        num_k, num_species).astype(jnp.int32)

    # ---- per-read (tax, ksum) lists: fold k levels within each tax
    ks = jnp.where(cvalid, weights[cki] * cc, 0.0)
    tkey = jnp.where(cvalid, ctax, I32_MAX)
    tnxt = jnp.concatenate([tkey[:, 1:],
                            jnp.full((R, 1), I32_MAX, jnp.int32)], axis=1)
    t_end = (tkey != tnxt) & cvalid
    t_prv = jnp.concatenate([jnp.full((R, 1), -1, jnp.int32),
                             tkey[:, :-1]], axis=1)
    t_start = (tkey != t_prv)
    tcsum = jnp.cumsum(ks, axis=1)
    tbase = jnp.where(t_start, tcsum - ks, -jnp.inf)
    tbase = jax.lax.cummax(tbase, axis=1)
    tax_sum = jnp.where(t_end, tcsum - tbase, 0.0)
    okey = jnp.where(t_end, tkey, I32_MAX)
    ok2, osum = jax.lax.sort((okey, tax_sum), dimension=1, num_keys=1)
    ntax = jnp.sum(t_end, axis=1)
    oflow_lists = oflow_counts | (ntax > WOUT)
    hit_tax = ok2[:, :WOUT]
    hit_ksum = osum[:, :WOUT]
    hit_cnt = jnp.minimum(ntax, WOUT).astype(jnp.int32)

    return (hit_tax, hit_ksum, hit_cnt, counts_all, counts_unique,
            oflow_counts, oflow_lists)


def host_classify_read(tables: TurboTables, q_limbs: np.ndarray):
    """Exact scoring of ONE read's windows on host (overflow fallback).

    Mirrors the kernel's pos/prev full-key logic in numpy with the
    unpadded CSR taxa lists (no tier budgets).  Returns
    (hits dict tax -> ksum float32, counts_all (numK, S) f64 add,
    counts_unique (numK, S) int add)."""
    num_k = tables.max_k - tables.min_k + 1
    S = tables.num_species
    key64 = tables.host_key64
    n = len(key64)
    q64 = (q_limbs[:, 0].astype(np.int64) << LIMB_BITS) \
        | q_limbs[:, 1].astype(np.int64)
    pos = np.searchsorted(key64, q64)
    pos_c = np.minimum(pos, n - 1)
    prev = np.maximum(pos - 1, 0)

    def letter(p):
        i, j = divmod(p, kmer.LETTERS_PER_LIMB)
        shift = kmer.BITS_PER_LETTER * (kmer.LETTERS_PER_LIMB - 1 - j)
        return (q_limbs[:, i] >> shift) & 31
    ok = np.ones(len(q64), bool)
    cum = {}
    for p in range(tables.min_k - 1, tables.max_k):
        ok = ok & (letter(p) != 30)
        cum[p + 1] = ok.copy()

    counts_all = np.zeros((num_k, S), np.float64)
    counts_unique = np.zeros((num_k, S), np.int64)
    scores: dict[int, np.float32] = {}
    for ki in range(num_k):
        k = tables.max_k - ki
        mask = tables.host_masks64[ki]
        qm = q64 & mask
        hit_at = (pos < n) & ((key64[pos_c] & mask) == qm)
        hit_pv = (pos > 0) & ((key64[prev] & mask) == qm)
        matched = (hit_at | hit_pv) & cum[k]
        psel = np.where(hit_pv, prev, pos_c)
        gs = tables.host_grp_start[ki]
        dt = tables.host_d_tax[ki]
        for m in np.nonzero(matched)[0]:
            g = tables.host_grp_id[ki][psel[m]]
            taxa = dt[gs[g]:gs[g + 1]]
            T = len(taxa)
            if T == 0:
                continue
            c = np.float32(1.0) / np.float32(T)
            w = weight(k)
            for t in taxa:
                counts_all[ki, t] += 1.0 / T
                if T == 1:
                    counts_unique[ki, t] += 1
                scores[int(t)] = np.float32(
                    scores.get(int(t), np.float32(0.0))
                    + np.float32(w * c))
    return scores, counts_all, counts_unique


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "min_k", "max_k", "highest_k",
                     "num_species", "num_reads", "protein", "one_frame",
                     "lines_per_read", "w_per_line"))
def fused_turbo(keys2, rowdat, router, grp2, d_tax4, weights, masks2,
                byte_mat, lut,
                num_steps, min_k, max_k, highest_k, num_species,
                num_reads, protein, one_frame, lines_per_read, w_per_line):
    """(rows, maxlen) uint8 -> turbo_classify outputs, one XLA program
    (same windowing as match/fast.py fused_classify)."""
    from ..core.encode import dna_to_aa_codes, encode_windows

    rows, maxlen = byte_mat.shape
    stride = 1 if protein else 3
    flat = jnp.concatenate([
        byte_mat.reshape(-1),
        jnp.zeros((stride * highest_k,), byte_mat.dtype)])
    aa = dna_to_aa_codes(flat, lut, protein=protein)
    win = encode_windows(aa, highest_k, stride)
    win = win[:rows * maxlen].reshape(rows, maxlen, -1)
    if one_frame and not protein:
        win = win[:, ::3]
    q = win[:, :w_per_line].reshape(rows * w_per_line, -1)
    kpr = w_per_line * lines_per_read
    return turbo_classify(
        keys2, rowdat, router, grp2, d_tax4, weights, masks2,
        q, num_steps, min_k, max_k, highest_k, num_species,
        num_reads, kpr)


def read_windows_np(mat_rows: np.ndarray, lut_np: np.ndarray,
                    highest_k: int, protein: bool, one_frame: bool,
                    w_per_line: int) -> np.ndarray:
    """Host twin of the fused windowing for ONE read's padded line(s)
    (overflow fallback).  mat_rows: (lpr, maxlen) uint8."""
    from ..core.encode import dna_to_aa_codes_np, encode_windows_np
    stride = 1 if protein else 3
    outs = []
    for line in mat_rows:
        buf = np.concatenate([line, np.zeros(stride * highest_k, np.uint8)])
        aa = dna_to_aa_codes_np(buf, lut_np, protein=protein)
        win = encode_windows_np(aa, highest_k, stride)
        if one_frame and not protein:
            win = win[::3]
        outs.append(win[:w_per_line])
    return np.concatenate(outs, axis=0)


def turbo_supported(n: int, num_limbs: int, min_k: int, max_k: int,
                    num_species: int) -> bool:
    """Cheap precondition check (no DeviceIndex needed)."""
    num_k = max_k - min_k + 1
    return (n > 0 and num_limbs == 2 and num_k <= 6
            and min_k * 5 >= ROUTER_BITS
            and num_species < (1 << 24)
            and num_k * n < (1 << 31)
            and n < (1 << 28))


_CACHE_VERSION = 1
_TT_RAM_CACHE: dict = {}


def save_turbo(tt: TurboTables, path: str):
    """Persist the derived tables (everything except keys2 == limbs,
    which the caller already holds) as an uncompressed npz sidecar."""
    payload = dict(
        version=np.int64(_CACHE_VERSION),
        rowdat=np.asarray(tt.rowdat), router=np.asarray(tt.router),
        grp2=np.asarray(tt.grp2), d_tax4=np.asarray(tt.d_tax4),
        weights=np.asarray(tt.weights), masks2=np.asarray(tt.masks2),
        masks64=tt.host_masks64,
        params=np.array([tt.num_steps, tt.min_k, tt.max_k, tt.highest_k,
                         tt.num_species, tt.n], np.int64))
    for i in range(tt.max_k - tt.min_k + 1):
        payload[f"gs{i}"] = tt.host_grp_start[i]
        payload[f"dt{i}"] = tt.host_d_tax[i]
        payload[f"gi{i}"] = tt.host_grp_id[i]
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)


def load_turbo(path: str, limbs: np.ndarray) -> TurboTables | None:
    try:
        z = np.load(path)
        if int(z["version"]) != _CACHE_VERSION:
            return None
        num_steps, min_k, max_k, highest_k, S, n = [
            int(v) for v in z["params"]]
        if n != len(limbs):
            return None
        num_k = max_k - min_k + 1
        key64 = (limbs[:, 0].astype(np.int64) << LIMB_BITS) \
            | limbs[:, 1].astype(np.int64)
        return TurboTables(
            jnp.asarray(np.ascontiguousarray(limbs)),
            jnp.asarray(z["rowdat"]), jnp.asarray(z["router"]),
            jnp.asarray(z["grp2"]), jnp.asarray(z["d_tax4"]),
            jnp.asarray(z["weights"]), jnp.asarray(z["masks2"]),
            num_steps, min_k, max_k, highest_k, S, n,
            key64,
            [z[f"gs{i}"] for i in range(num_k)],
            [z[f"dt{i}"] for i in range(num_k)],
            [z[f"gi{i}"] for i in range(num_k)],
            z["masks64"])
    except Exception:
        return None


def load_or_build_turbo(index_path: str, limbs: np.ndarray,
                        tax_rows: np.ndarray, highest_k: int, min_k: int,
                        max_k: int, num_species: int) -> TurboTables:
    """Process + disk cached turbo tables for an on-disk index.

    The derived tables are an artifact-family extension (like the
    reference's trie, which is also derived from the sorted array and
    persisted, Trie.hpp:366): built once, reused by every identify run
    over the same index."""
    key = None
    try:
        key = (os.path.abspath(index_path), os.path.getmtime(index_path),
               min_k, max_k, num_species)
    except OSError:
        pass
    if key is not None and key in _TT_RAM_CACHE:
        return _TT_RAM_CACHE[key]
    tt = None
    cache_path = f"{index_path}.turbo_{min_k}_{max_k}.npz"
    fresh = (os.path.exists(cache_path)
             and os.path.getmtime(cache_path) >= os.path.getmtime(index_path))
    if key is not None and fresh:
        tt = load_turbo(cache_path, limbs)
    if tt is None:
        tt = TurboTables.build_from_arrays(limbs, tax_rows, highest_k,
                                           min_k, max_k, num_species)
        if key is not None:
            try:
                save_turbo(tt, cache_path)
            except OSError:
                pass
    if key is not None:
        _TT_RAM_CACHE.clear()   # device memory: hold one index at a time
        _TT_RAM_CACHE[key] = tt
    return tt
