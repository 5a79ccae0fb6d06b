#!/usr/bin/env python3
"""128-bit (k <= 25) identify benchmark, ours vs the reference binary
(VERDICT r4 missing #1 / next #5: the reference runs the same
classifier architecture for uint128 keys, packedPairs.hpp:132-136,
just slower -- "no native 128-bit ints", README.md:45; round 5 made
the turbo kernel limb-generic so 128-bit rides the fast path too).

Reuses the bench corpus genomes/reads (bench_corpus.py) and builds a
second, 128-bit index family (k = 20..25, 5-limb keys, 20 B reference
records) that BOTH systems read -- the artifact formats are
byte-compatible (tests/test_device_128.py, golden exampleIndex128).

Protocol mirrors bench.py: startup-cancelled (small, big) pairs,
median of N >= 3 trials both sides.  Prints one JSON dict.
"""

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench_corpus

IDX128 = os.path.join(bench_corpus.DIR, "benchIndex128")
TMP = "/tmp/kasa_bench128_tmp"
REF_BIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".golden_kASA")
TRIALS = int(os.environ.get("KASA_BENCH_TRIALS", 3))
MIN_K, MAX_K, HK = 20, 25, 25


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_index128(c):
    from kasa_tpu.index import artifacts
    from kasa_tpu.index.build import compute_frequencies
    from kasa_tpu.index.content import read_content_file
    if os.path.exists(IDX128 + "_info.txt"):
        with open(os.path.join(bench_corpus.DIR,
                               "idx128_meta.json")) as fh:
            return json.load(fh)["n_entries"]
    log("# building 128-bit index (k <= 25) from the bench genomes ...")
    from kasa_tpu.core.encode import (build_codon_code_lut,
                                      dna_to_aa_codes_np,
                                      encode_windows_np)
    rng = np.random.default_rng(bench_corpus.SEED)
    genomes = bench_corpus._gen_genomes(rng)
    lut = build_codon_code_lut()
    all_l, all_t = [], []
    t0 = time.time()
    for g, dna in enumerate(genomes):
        aa = dna_to_aa_codes_np(dna, lut)
        win = encode_windows_np(aa, HK, 3)
        w = len(dna) - 3 * HK + 1
        all_l.append(win[:w])
        all_t.append(np.full(w, g + 1, np.uint32))
    limbs = np.concatenate(all_l)
    taxids = np.concatenate(all_t)
    order = np.lexsort((taxids,) + tuple(
        limbs[:, i] for i in range(limbs.shape[1] - 1, -1, -1)))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(len(taxids), bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) \
        | (taxids[1:] != taxids[:-1])
    limbs = np.ascontiguousarray(limbs[keep])
    taxids = taxids[keep]
    artifacts.write_index(IDX128, limbs, taxids, HK)
    pref, cnts = artifacts.trie_from_sorted_prefixes(limbs[:, 0])
    artifacts.write_trie(IDX128, pref, cnts)
    entries = read_content_file(bench_corpus.INDEX + "_content.txt")
    freq = compute_frequencies(limbs, taxids, entries, MAX_K, 1)
    artifacts.write_frequency_file(IDX128, entries, freq)
    log(f"# 128-bit index: {len(taxids):,} entries ({time.time()-t0:.0f}s)")
    with open(os.path.join(bench_corpus.DIR, "idx128_meta.json"),
              "w") as fh:
        json.dump({"n_entries": int(len(taxids))}, fh)
    return len(taxids)


def _median_rate(pairs, c):
    rates = [(c["reads_n"] - c["small_n"]) / (tb - ts)
             for ts, tb in pairs]
    return statistics.median(rates), rates


def ref_side(c):
    cache = os.path.join(bench_corpus.DIR, "ref128_baseline.json")
    if os.path.exists(cache):
        return json.load(open(cache))
    os.makedirs(TMP, exist_ok=True)

    def run(reads, tag, xidx):
        cmd = [REF_BIN, "identify",
               "-c", bench_corpus.INDEX + "_content.txt",
               "-d", IDX128, "-i", reads,
               "-q", os.path.join(TMP, f"ref_{tag}.json"),
               "-p", os.path.join(TMP, f"ref_{tag}.csv"),
               "-k", str(MAX_K), str(MIN_K),
               "-n", "1", "-m", "8", "-r", "-t", TMP + "/",
               "-x", str(xidx)]
        t0 = time.perf_counter()
        r = subprocess.run(cmd, capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            raise RuntimeError(f"ref 128 failed: {r.stderr[-400:]!r}")
        return dt

    pairs = []
    for t in range(TRIALS):
        ts = run(c["reads_small"], f"s{t}", 60 + t)
        tb = run(c["reads"], f"b{t}", 65 + t)
        pairs.append((ts, tb))
        log(f"# ref128 trial {t}: {ts:.1f}s/{c['small_n']}, "
            f"{tb:.1f}s/{c['reads_n']}")
    med, rates = _median_rate(pairs, c)
    out = {"ref_reads_per_sec": round(med, 1),
           "ref_trials": [round(r, 1) for r in rates]}
    json.dump(out, open(cache, "w"))
    return out


def ours_side(c):
    import contextlib
    from kasa_tpu.config import Config
    from kasa_tpu.match.pipeline import identify
    from kasa_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    float(jnp.zeros(()) + 1.0)

    def run(reads, tag):
        cfg = Config()
        cfg.engine = "tpu"
        cfg.content_file = bench_corpus.INDEX + "_content.txt"
        cfg.lower_k, cfg.higher_k = MIN_K, MAX_K
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sys.stderr):
            identify(cfg, index_path=IDX128, input_path=reads,
                     out_file=os.path.join(TMP, f"tpu_{tag}.json"),
                     profile_file=None)
        return time.perf_counter() - t0

    os.makedirs(TMP, exist_ok=True)
    t0 = time.perf_counter()
    run(c["warm"], "warm")
    cold = time.perf_counter() - t0
    log(f"# ours128 warm-up: {cold:.1f}s")
    pairs = []
    for t in range(TRIALS):
        ts = run(c["reads_small"], f"s{t}")
        tb = run(c["reads"], f"b{t}")
        pairs.append((ts, tb))
        log(f"# ours128 trial {t}: {ts:.1f}s/{c['small_n']}, "
            f"{tb:.1f}s/{c['reads_n']} -> "
            f"{(c['reads_n']-c['small_n'])/(tb-ts):,.0f} reads/s")
    med, rates = _median_rate(pairs, c)
    return {"reads_per_sec": round(med, 1),
            "trials": [round(r, 1) for r in rates],
            "cold_start_s": round(cold, 1)}


def main():
    c = bench_corpus.ensure_corpus(log=log)
    n128 = ensure_index128(c)
    ref = ref_side(c)
    ours = ours_side(c)
    print(json.dumps({
        "metric": "identify128_e2e_reads_per_sec_per_chip",
        "value": ours["reads_per_sec"],
        "unit": (f"reads/s median of {TRIALS} (150bp, k=20..25 128-bit"
                 f" keys, {n128:,}-entry {c['num_species']}-species "
                 "index, vs reference binary -r single-thread)"),
        "vs_baseline": round(ours["reads_per_sec"]
                             / ref["ref_reads_per_sec"], 2),
        "trials": ours["trials"],
        "cold_start_s": ours["cold_start_s"],
        "ref_reads_per_sec": ref["ref_reads_per_sec"],
        "ref_trials": ref["ref_trials"],
        "index_entries": n128,
    }, indent=1))


if __name__ == "__main__":
    main()
