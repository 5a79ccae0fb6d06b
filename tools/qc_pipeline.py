#!/usr/bin/env python3
"""One-command QC pipeline (the reference's example/snakefile.smk as a
single script): generateCF -> build -> identify -> shrink(+identify) ->
update(+identify) -> delete -> merge -> getFrequency/trie/redundancy ->
paired-end -> filter -> translate, all through the CLI mode dispatch on
the fixture corpus, with `cmp`-style byte checks against the golden
artifacts where the reference binary's outputs are pinned.

Usage: python tools/qc_pipeline.py [workdir]
Exit 0 = every stage ran and every golden comparison matched.
"""

import filecmp
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "fixtures")
GOLD = os.path.join(REPO, "tests", "golden")
TAXONOMY = "/root/reference/example/taxonomy"

PASSED = []
FAILED = []


def cli(*args):
    from kasa_tpu.cli import main
    rc = main(["kasa_tpu", *map(str, args)])
    if rc not in (0, None):
        raise RuntimeError(f"mode {args[0]} rc={rc}")


def check(name, ours, golden=None):
    if golden is not None and not filecmp.cmp(ours, golden, shallow=False):
        FAILED.append(name)
        print(f"FAIL  {name}: {ours} differs from {golden}")
    else:
        PASSED.append(name)
        print(f"ok    {name}")


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="kasa_qc_")
    os.makedirs(work, exist_ok=True)
    idx = os.path.join(work, "qcIndex")
    content = os.path.join(work, "qc_content.txt")

    # 1. generateCF (needs the reference taxonomy mount)
    if os.path.isdir(TAXONOMY):
        cli("generateCF", "-i", f"{FIX}/example.fasta", "-c", content,
            "-f", f"{TAXONOMY}/acc2tax/acc2Tax.txt", "-y", TAXONOMY,
            "-u", "species")
        check("generateCF", content, f"{GOLD}/exampleIndex_content.txt")
    else:
        shutil.copy(f"{GOLD}/exampleIndex_content.txt", content)
        print("skip  generateCF (taxonomy not mounted); using golden")

    # 2. build
    cli("build", "-i", f"{FIX}/example.fasta", "-d", idx, "-c", content,
        "-t", work, "-n", "2")
    for suf in ("", "_info.txt", "_trie", "_trie.txt", "_f.txt"):
        check(f"build{suf or ' raw'}", idx + suf,
              f"{GOLD}/exampleIndex{suf}")

    # 3. identify (exact = byte parity; tpu = fast engine smoke)
    out = os.path.join(work, "qc_reads.json")
    prof = os.path.join(work, "qc_profile.csv")
    cli("identify", "-d", idx, "-c", content, "-i", f"{FIX}/reads.fastq",
        "-q", out, "-p", prof, "--engine", "exact")
    check("identify json", out, f"{GOLD}/reads_identify.json")
    check("identify profile", prof, f"{GOLD}/reads_profile.csv")
    cli("identify", "-d", idx, "-c", content, "-i", f"{FIX}/reads.fastq",
        "-q", out + ".tpu", "-p", prof + ".tpu", "--engine", "tpu")
    check("identify tpu-engine (ran)", out + ".tpu")

    # 4. shrink -s 2 (halving) + identify on the halved index
    half = os.path.join(work, "qcIndex_s")
    cli("shrink", "-d", idx, "-o", half, "-s", "2", "-c", content)
    check("shrink half raw", half, f"{GOLD}/exampleIndex_s")
    cli("identify", "-d", half, "-c", content,
        "-i", f"{FIX}/reads.fastq", "-q", os.path.join(work, "h.json"),
        "-p", os.path.join(work, "h.csv"), "--engine", "exact")
    check("identify halved", os.path.join(work, "h.json"),
          f"{GOLD}/reads_half.json")

    # the artifact family convention puts the content file next to
    # the index (update/merge locate it as <index>_content.txt)
    shutil.copy(content, idx + "_content.txt")

    # 5. update + delete
    if os.path.isdir(TAXONOMY):
        upd = os.path.join(work, "qcIndex_u")
        cli("update", "-d", idx, "-o", upd,
            "-i", f"{FIX}/example2.fasta",
            "-f", f"{TAXONOMY}/acc2tax/acc2Tax.txt", "-y", TAXONOMY,
            "-u", "species", "-t", work)
        check("update raw", upd, f"{GOLD}/exampleIndex_u")
    else:
        print("skip  update (taxonomy not mounted)")
    dele = os.path.join(work, "qcIndex_del")
    cli("delete", "-d", idx, "-o", dele, "-c", content,
        "-l", f"{GOLD}/delnodes_test.dmp", "-t", work)
    check("delete raw", dele, f"{GOLD}/exampleIndex_del")

    # 6. merge two indices
    mrg = os.path.join(work, "qcIndex_m")
    cli("merge", "-o", mrg, "--firstIndex", idx,
        "--secondIndex", f"{GOLD}/index2",
        "-c1", content, "-c2", f"{GOLD}/index2_content.txt", "-t", work)
    check("merge raw", mrg, f"{GOLD}/index_merged")

    # 7. regenerate frequency + trie, compare to build-time artifacts
    freq_bak = os.path.join(work, "f_backup.txt")
    shutil.copy(idx + "_f.txt", freq_bak)
    os.remove(idx + "_f.txt")
    cli("getFrequency", "-d", idx, "-c", content, "-t", work)
    check("getFrequency", idx + "_f.txt", freq_bak)
    trie_bak = os.path.join(work, "trie_backup")
    shutil.copy(idx + "_trie", trie_bak)
    os.remove(idx + "_trie")
    cli("trie", "-d", idx, "-t", work)
    check("trie rebuild", idx + "_trie", trie_bak)
    cli("redundancy", "-d", idx, "-c", content)
    check("redundancy (ran)", idx)

    # 8. paired-end + filter + translate
    cli("identify", "-d", idx, "-c", content,
        "-1", f"{FIX}/reads_1.fastq", "-2", f"{FIX}/reads_2.fastq",
        "-q", os.path.join(work, "p.json"),
        "-p", os.path.join(work, "p.csv"), "--engine", "exact")
    check("paired-end", os.path.join(work, "p.json"),
          f"{GOLD}/reads_paired.json")
    cli("identify", "-d", idx, "-c", content, "-i", f"{FIX}/reads.fastq",
        "-q", os.path.join(work, "f.json"), "--engine", "exact",
        "--filter", os.path.join(work, "clean"),
        os.path.join(work, "contam"))
    check("filter clean", os.path.join(work, "clean.fastq"),
          f"{GOLD}/filt_clean.fastq")
    cli("translate", "-i", f"{FIX}/reads.fastq",
        "-o", os.path.join(work, "tr.fastq"))
    check("translate", os.path.join(work, "tr.fastq"),
          f"{GOLD}/reads_translated.fastq")

    print(f"\nQC pipeline: {len(PASSED)} ok, {len(FAILED)} failed "
          f"(workdir {work})")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
