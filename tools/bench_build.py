#!/usr/bin/env python3
"""Index-build benchmark: GB of fasta -> full artifact family, ours vs
the reference binary on the SAME input (VERDICT r2 #4: the "index
build GB/s" north star had no measurement at all).

Writes the bench corpus's genomes as a fasta (one record per species,
accession SYN<i> mapped by the content file), then times:
  * kasa_tpu.index.build.build_index (host encode + device sort path)
  * `.golden_kASA build -n <threads>` on the same fasta/content

Prints one JSON dict; stderr carries progress.  --big generates a
~1 GB / 10,000-species corpus instead of the default 33 MB one.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def write_fasta(path, genomes, log=log):
    t0 = time.time()
    with open(path, "wb") as fh:
        for i, g in enumerate(genomes):
            fh.write(b">SYN%d.1 synthetic species %d\n" % (i + 1, i + 1))
            for j in range(0, len(g), 80):
                fh.write(g[j:j + 80].tobytes())
                fh.write(b"\n")
    log(f"# fasta written: {os.path.getsize(path)/1e9:.3f} GB "
        f"({time.time()-t0:.0f}s)")


def big_corpus(dirp, num_species=10_000, genome_len=100_000, seed=7):
    """~1 GB fasta, 10k species; cached."""
    import bench_corpus
    from kasa_tpu.index.content import ContentEntry, write_content_file
    os.makedirs(dirp, exist_ok=True)
    fasta = os.path.join(dirp, "big.fasta")
    content = os.path.join(dirp, "big_content.txt")
    if not (os.path.exists(fasta) and os.path.exists(content)):
        rng = np.random.default_rng(seed)
        dna = np.frombuffer(b"ACGT", np.uint8)
        log(f"# generating {num_species} x {genome_len} bp genomes ...")
        t0 = time.time()
        with open(fasta, "wb") as fh:
            for i in range(num_species):
                g = dna[rng.integers(0, 4, size=genome_len)]
                fh.write(b">SYN%d.1 synthetic species %d\n" % (i + 1, i + 1))
                for j in range(0, genome_len, 80):
                    fh.write(g[j:j + 80].tobytes())
                    fh.write(b"\n")
        entries = [ContentEntry(name=f"Synthetic species {i}",
                                taxid=str(i), lowest_taxids=[str(i)],
                                accessions=[f"SYN{i}.1"])
                   for i in range(1, num_species + 1)]
        write_content_file(content, entries)
        log(f"# big corpus written ({time.time()-t0:.0f}s)")
    return fasta, content


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="~1 GB, 10k-species corpus")
    ap.add_argument("--threads", type=int, default=4,
                    help="reference build threads (-n)")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--mem-gb", type=int, default=8)
    args = ap.parse_args()

    import bench_corpus
    res = {}

    if args.big:
        fasta, content = big_corpus(
            os.path.join(bench_corpus.DIR, "big"))
    else:
        from kasa_tpu.index.content import ContentEntry, write_content_file
        c = bench_corpus.ensure_corpus(log=log)
        fasta = os.path.join(bench_corpus.DIR, "genomes.fasta")
        content = os.path.join(bench_corpus.DIR, "build_content.txt")
        if not (os.path.exists(fasta) and os.path.exists(content)):
            rng = np.random.default_rng(bench_corpus.SEED)
            genomes = bench_corpus._gen_genomes(rng)
            write_fasta(fasta, genomes)
            entries = [ContentEntry(name=f"Synthetic species {i}",
                                    taxid=str(i), lowest_taxids=[str(i)],
                                    accessions=[f"SYN{i}.1"])
                       for i in range(1, bench_corpus.NUM_SPECIES + 1)]
            write_content_file(content, entries)
    gb = os.path.getsize(fasta) / 1e9
    res["fasta_gb"] = round(gb, 3)

    # ---- ours
    from kasa_tpu.index.build import build_index
    out = os.path.join(bench_corpus.DIR, "build_bench_idx")
    t0 = time.time()
    limbs, taxids = build_index(
        fasta, content, out, highest_k=12, lowest_k=7,
        temp_dir=bench_corpus.DIR, verbose=False)
    ours_s = time.time() - t0
    res["ours_build_s"] = round(ours_s, 1)
    res["ours_gb_per_s"] = round(gb / ours_s, 4)
    res["index_entries"] = int(len(taxids))
    log(f"# kasa_tpu build: {ours_s:.1f}s -> {gb/ours_s:.4f} GB/s "
        f"({len(taxids):,} entries)")

    # ---- reference
    if not args.skip_ref:
        ref = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".golden_kASA")
        tmp = os.path.join(bench_corpus.DIR, "ref_build_tmp")
        os.makedirs(tmp, exist_ok=True)
        cmd = [ref, "build", "-c", content, "-i", fasta,
               "-d", os.path.join(tmp, "refIdx"),
               "-n", str(args.threads), "-m", str(args.mem_gb),
               "-t", tmp + "/", "-x", "91", "-k", "12", "7"]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True)
        ref_s = time.time() - t0
        if r.returncode != 0:
            log(f"# reference build FAILED: {r.stderr[-300:]!r}")
            res["ref_build_s"] = None
        else:
            res["ref_build_s"] = round(ref_s, 1)
            res["ref_gb_per_s"] = round(gb / ref_s, 4)
            res["speedup_vs_ref"] = round(ref_s / ours_s, 2)
            log(f"# reference build (-n {args.threads}): {ref_s:.1f}s "
                f"-> {gb/ref_s:.4f} GB/s; ours is "
                f"{ref_s/ours_s:.2f}x")

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
