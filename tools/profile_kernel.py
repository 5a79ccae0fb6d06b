#!/usr/bin/env python3
"""Phase-level profiling of the device classify kernel on the real TPU.

Times standalone jitted programs for each phase of classify_batch
(match/device.py) so the optimization target is measured, not guessed:

  p0      limb0 prefix-table gather + residual binary search
  p1      per-k limb1 searches within the limb0 run (6 levels)
  gtab    group-id/T gathers per level
  score-d dense one-hot scoring (base tile, S given)
  score-s flat scatter scoring
  full    classify_batch end to end (run-scan off)
  fullrs  classify_batch with run-scan (only if max_run small)

Each timing uses the bench's scan-over-stacked-batches trick: one
dispatch + one readback for T batches, minus a trivial-call baseline.

Usage: python tools/profile_kernel.py [entries_log2=23] [S=64] [reads=4032]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

KMERS_PER_READ = 130
TIMED = 4


def timeit(fn, *args):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_synthetic_index
    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, classify_batch

    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reads = int(sys.argv[3]) if len(sys.argv) > 3 else 4032

    float(jnp.zeros(()) + 1.0)   # tunnel warm-up

    import os
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f".bench_tables_v2_{1 << n_log2}_{S}.npz")
    array_fields = ("idx_limbs", "grp_id", "grp_start", "d_tax", "masks",
                    "weights", "run_start", "run_end", "prefix_tbl", "idx_tax")
    scalar_fields = ("min_k", "max_k", "highest_k", "num_steps", "sub_steps",
                     "num_species", "max_run")
    if os.path.exists(cache):
        z = np.load(cache)
        t = StackedTables(**{f: jnp.asarray(z[f]) for f in array_fields},
                          **{f: int(z[f]) for f in scalar_fields})
    else:
        limbs, taxids = build_synthetic_index(1 << n_log2, S)
        dev = DeviceIndex(limbs, taxids, {i: i for i in range(S + 1)},
                          12, 7, 12, S + 1)
        t = StackedTables.build(dev)
        np.savez(cache,
                 **{f: np.asarray(getattr(t, f)) for f in array_fields},
                 **{f: getattr(t, f) for f in scalar_fields})
    print(f"# index {1 << n_log2} entries, S={S}, max_run={t.max_run}",
          file=sys.stderr)

    limbs_np = np.asarray(t.idx_limbs)
    m = reads * KMERS_PER_READ
    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        pick = r.integers(0, len(limbs_np), size=m)
        q = limbs_np[pick].copy()
        miss = r.random(m) < 0.3
        q[miss, 1] ^= (r.integers(1, 31, size=int(miss.sum()))
                       .astype(np.int32) << 5)
        rid = (np.arange(m) // KMERS_PER_READ).astype(np.int32)
        return q, rid

    qs = np.stack([batch(s)[0] for s in range(TIMED)])
    rids = np.stack([batch(s)[1] for s in range(TIMED)])
    valids = np.ones((TIMED, m), bool)
    qs_d, rids_d, valids_d = (jnp.asarray(qs), jnp.asarray(rids),
                              jnp.asarray(valids))

    tabs = (t.idx_limbs, t.grp_id, t.grp_start, t.d_tax, t.masks, t.weights,
            t.run_start, t.run_end, t.prefix_tbl, t.idx_tax)

    trivial = jax.jit(lambda x: x * 2 + 1)
    float(trivial(jnp.float32(1.0)))
    t0 = time.perf_counter(); float(trivial(jnp.float32(2.0)))
    t_base = time.perf_counter() - t0

    num_k = t.max_k - t.min_k + 1
    n = t.idx_limbs.shape[0]

    def scan_over(fn):
        @jax.jit
        def run(tabs, qs, rids, valids):
            def body(c, b):
                return c + fn(tabs, b[0], b[1], b[2]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), (qs, rids, valids))
            return acc
        return run

    results = {}

    def measure(name, fn):
        run = scan_over(fn)
        dt = timeit(run, tabs, qs_d, rids_d, valids_d) - t_base
        per = dt / TIMED
        results[name] = per
        print(f"{name:8s} {per * 1e3:8.2f} ms/batch "
              f"({reads / per:9.0f} reads/s)", flush=True)

    # ---- p0: limb0 phase only
    def p0(tabs, q_limbs, read_ids, q_valid):
        idx_limbs, _, _, _, _, _, run_start, run_end, prefix_tbl, _ = tabs
        idx0 = idx_limbs[:, 0]
        q0 = q_limbs[:, 0]
        bucket = q0 >> (30 - 20)
        lo = prefix_tbl[bucket]
        hi = prefix_tbl[bucket + 1]
        def body0(_, carry):
            lo, hi = carry
            mid = (lo + hi) >> 1
            less = idx0[mid] < q0
            return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)
        lo, hi = jax.lax.fori_loop(0, t.num_steps, body0, (lo, hi))
        lo0c = jnp.minimum(lo, n - 1)
        matched0 = (lo < n) & (idx0[lo0c] == q0) & q_valid
        ra = jnp.where(matched0, run_start[lo0c], 0)
        rb = jnp.where(matched0, run_end[lo0c], 0)
        return (ra + rb).sum().astype(jnp.float32)
    measure("p0", p0)

    # ---- p0 + per-k limb1 searches
    def p1(tabs, q_limbs, read_ids, q_valid):
        idx_limbs, _, _, _, masks, _, run_start, run_end, prefix_tbl, _ = tabs
        idx0 = idx_limbs[:, 0]
        idx1 = idx_limbs[:, 1]
        q0 = q_limbs[:, 0]
        bucket = q0 >> (30 - 20)
        lo = prefix_tbl[bucket]
        hi = prefix_tbl[bucket + 1]
        def body0(_, carry):
            lo, hi = carry
            mid = (lo + hi) >> 1
            less = idx0[mid] < q0
            return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)
        lo, hi = jax.lax.fori_loop(0, t.num_steps, body0, (lo, hi))
        lo0c = jnp.minimum(lo, n - 1)
        matched0 = (lo < n) & (idx0[lo0c] == q0) & q_valid
        ra = jnp.where(matched0, run_start[lo0c], 0)
        rb = jnp.where(matched0, run_end[lo0c], 0)
        acc = jnp.float32(0)
        for ki in range(num_k):
            m1 = masks[ki][1]
            q1 = q_limbs[:, 1] & m1
            slo, shi = ra, rb
            def body1(_, carry):
                slo, shi = carry
                mid = (slo + shi) >> 1
                less = (idx1[jnp.minimum(mid, n - 1)] & m1) < q1
                return jnp.where(less, mid + 1, slo), jnp.where(less, shi, mid)
            slo, shi = jax.lax.fori_loop(0, t.sub_steps, body1, (slo, shi))
            lo_c = jnp.minimum(slo, n - 1)
            hit = matched0 & (slo < rb) & ((idx1[lo_c] & m1) == q1)
            acc = acc + hit.sum().astype(jnp.float32)
        return acc
    measure("p1", p1)

    # ---- full kernel, scatter scoring
    def full_scatter(tabs, q, rid, valid):
        out = classify_batch(*tabs, q, rid, valid, t.num_steps, t.sub_steps,
                             t.min_k, t.max_k, t.highest_k, t.num_species,
                             reads, 8, kmers_per_read=KMERS_PER_READ,
                             run_scan_w=0, dense_scores=False)
        return out[0].sum() + out[1].sum()
    measure("full-s", full_scatter)

    # ---- full kernel, dense scoring
    def full_dense(tabs, q, rid, valid):
        out = classify_batch(*tabs, q, rid, valid, t.num_steps, t.sub_steps,
                             t.min_k, t.max_k, t.highest_k, t.num_species,
                             reads, 8, kmers_per_read=KMERS_PER_READ,
                             run_scan_w=0, dense_scores=True)
        return out[0].sum() + out[1].sum()
    measure("full-d", full_dense)

    # ---- run-scan variant if applicable
    if t.max_run <= 16:
        def full_rs(tabs, q, rid, valid):
            out = classify_batch(*tabs, q, rid, valid, t.num_steps,
                                 t.sub_steps, t.min_k, t.max_k, t.highest_k,
                                 t.num_species, reads, 8,
                                 kmers_per_read=KMERS_PER_READ,
                                 run_scan_w=t.max_run, dense_scores=True)
            return out[0].sum() + out[1].sum()
        measure("full-rs", full_rs)

    print("# deltas: p1-p0 = per-k searches, full-s - p1 = scoring+tables",
          file=sys.stderr)


if __name__ == "__main__":
    main()
