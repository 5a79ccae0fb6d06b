#!/usr/bin/env python3
"""Benchmark: device classify throughput (reads/sec/chip).

Workload: k in [7,12] multi-k exact matching (the reference's default
identify mode) against a 16M-entry 64-bit index, reads of 150 bp
(130 k-mer windows each incl. the false-k-mer marker).  Measures the
fully-jitted device kernel (sort -> 6x fixed-iteration lexicographic
binary search -> split-credit score scatter), i.e. the work the
reference does in compareWithDatabase + sortInput (Compare.hpp:679-1448).

Baseline: reference kASA binary (single thread, -m 2, in-RAM toy-scale
index) measured on this host via a 10k/110k read pair to cancel
startup: see BASELINE.md "measured" section.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

# Reference binary on THIS host: 10M-entry index loaded in RAM (-r),
# single thread, 150bp reads; (510k-10k reads)/(94.08-11.39 s) -- see
# BASELINE.md "measured" section.
CPU_BASELINE_READS_PER_SEC = 6047.0

KMERS_PER_READ = 130          # 150 bp + 15 marker chars -> 130 windows
INDEX_ENTRIES = 1 << 23       # 8M (bounded by driver wall-clock budget)
BATCH_READS = 4032            # uniform-layout batch: reads x windows
NUM_SPECIES = 64
WARMUP_BATCHES = 1
TIMED_BATCHES = 4


def build_synthetic_index(n, num_species, seed=7):
    rng = np.random.default_rng(seed)
    letters = rng.integers(1, 27, size=(n, 12), dtype=np.int32)
    limb0 = np.zeros(n, np.int32)
    limb1 = np.zeros(n, np.int32)
    for j in range(6):
        limb0 |= letters[:, j] << (5 * (5 - j))
        limb1 |= letters[:, 6 + j] << (5 * (5 - j))
    limbs = np.stack([limb0, limb1], axis=1)
    taxids = rng.integers(1, num_species + 1, size=n).astype(np.uint32)
    order = np.lexsort((taxids, limb1, limb0))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(n, bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) | (taxids[1:] != taxids[:-1])
    return limbs[keep], taxids[keep]


def main():
    import jax
    import jax.numpy as jnp

    from kasa_tpu.match.join import DeviceIndex
    from kasa_tpu.match.device import StackedTables, classify_batch

    # The axon tunnel has a one-time per-process warm-up: the FIRST
    # device->host fetch can take several hundred seconds regardless of
    # payload (subsequent fetches are ~30 ms).  Pay it on a trivial op
    # up front so it doesn't pollute the timed region.
    t0 = time.perf_counter()
    float(jnp.zeros(()) + 1.0)
    print(f"# tunnel warm-up fetch: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Host-side table construction takes minutes on this (slow) host
    # CPU, so the built tables are cached on disk; the cache key is the
    # workload constants in the filename.
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_tables_v2_{INDEX_ENTRIES}_{NUM_SPECIES}.npz")
    array_fields = ("idx_limbs", "grp_id", "grp_start", "d_tax", "masks",
                    "weights", "run_start", "run_end", "prefix_tbl", "idx_tax")
    scalar_fields = ("min_k", "max_k", "highest_k", "num_steps", "sub_steps",
                     "num_species", "max_run")
    t0 = time.perf_counter()
    if os.path.exists(cache):
        z = np.load(cache)
        tables = StackedTables(
            **{f: jnp.asarray(z[f]) for f in array_fields},
            **{f: int(z[f]) for f in scalar_fields})
        print(f"# tables loaded from cache: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    else:
        limbs, taxids = build_synthetic_index(INDEX_ENTRIES, NUM_SPECIES)
        tax_to_row = {t: t for t in range(NUM_SPECIES + 1)}
        dev = DeviceIndex(limbs, taxids, tax_to_row, 12, 7, 12, NUM_SPECIES + 1)
        tables = StackedTables.build(dev)
        np.savez(cache,
                 **{f: np.asarray(getattr(tables, f)) for f in array_fields},
                 **{f: getattr(tables, f) for f in scalar_fields})
        print(f"# tables built + cached: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    limbs = np.asarray(tables.idx_limbs)
    taxids = np.zeros(len(limbs), np.uint32)  # only len() is used below

    m = BATCH_READS * KMERS_PER_READ
    num_reads = BATCH_READS

    def make_batch(seed):
        r = np.random.default_rng(seed)
        pick = r.integers(0, len(taxids), size=m)
        q = limbs[pick].copy()
        miss = r.random(m) < 0.3            # ~30% of k-mers miss
        q[miss, 1] ^= (r.integers(1, 31, size=int(miss.sum()))
                       .astype(np.int32) << 5)
        rid = (np.arange(m) // KMERS_PER_READ).astype(np.int32)
        valid = np.ones(m, bool)
        return q, rid, valid

    # scan over stacked batches INSIDE one jit call: one tunnel dispatch
    # + one readback for the whole timed region, so the (highly
    # variable) tunnel round-trip latency cannot pollute the measurement.
    # The index tables are explicit jit ARGUMENTS (a closure capture
    # would be serialized into the remote-compile request, which the
    # axon tunnel rejects with HTTP 413 above a few MB).
    table_args = (tables.idx_limbs, tables.grp_id, tables.grp_start,
                  tables.d_tax, tables.masks, tables.weights,
                  tables.run_start, tables.run_end, tables.prefix_tbl,
                  tables.idx_tax)
    # exact (cap-free) run-scan path when the longest limb0 run is small
    scan_w = tables.max_run if tables.max_run <= 16 else 0
    print(f"# max_run={tables.max_run} -> run_scan_w={scan_w}",
          file=sys.stderr)

    @jax.jit
    def run_batches(tabs, qs, rids, valids):
        def body(carry, b):
            out = classify_batch(
                *tabs, b[0], b[1], b[2],
                tables.num_steps, tables.sub_steps, tables.min_k,
                tables.max_k, tables.highest_k, tables.num_species,
                num_reads, 8, kmers_per_read=KMERS_PER_READ,
                run_scan_w=scan_w)
            return carry + out[0].sum() + out[1].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (qs, rids, valids))
        return acc

    def stack(seeds):
        bs = [make_batch(s) for s in seeds]
        return (jnp.asarray(np.stack([b[0] for b in bs])),
                jnp.asarray(np.stack([b[1] for b in bs])),
                jnp.asarray(np.stack([b[2] for b in bs])))

    # One compiled shape only (each remote compile costs minutes over
    # the tunnel).  The fixed dispatch+readback overhead is calibrated
    # with a trivial jitted call and subtracted.
    big = stack(range(200, 200 + TIMED_BATCHES))
    trivial = jax.jit(lambda x: x * 2.0 + 1.0)
    t0 = time.perf_counter()
    float(trivial(jnp.float32(3.0)))
    float(run_batches(table_args, *big))
    print(f"# compile + warm-up: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    float(trivial(jnp.float32(4.0)))
    t_trivial = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_batches(table_args, *big))
    t_big = time.perf_counter() - t0
    per_batch = max((t_big - t_trivial) / TIMED_BATCHES, 1e-9)
    print(f"# t_trivial={t_trivial:.3f}s t_big={t_big:.3f}s "
          f"per_batch={per_batch * 1e3:.1f}ms", file=sys.stderr)

    reads_per_sec = (m / KMERS_PER_READ) / per_batch
    print(json.dumps({
        "metric": "identify_reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s (150bp, k=7..12, 8M-entry index)",
        "vs_baseline": round(reads_per_sec / CPU_BASELINE_READS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
