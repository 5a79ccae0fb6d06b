"""Long-read chunking byte parity against the reference binary, run live
on deterministically generated giant contigs (too big to commit as
goldens).

Covers the streaming machinery of Read.hpp:372-609 (info pre-scan),
Read.hpp:678-760 (chunk split + 3k-1 overhang), Read.hpp:1054-1232
(mid-read batch boundaries) and Compare.hpp:2342-2426 (vSavedScores
partial-score carry across batches):

  * a ~5M-char contig splits into multiple ~100MB-of-k-mer chunk lines
    inside one batch;
  * a ~40M-char contig under -m 2 --six spans three batches, so the
    saved-score merge runs twice for one read, followed by normal reads
    that must keep byte-identical numbering.
"""

import filecmp
import pathlib
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
FIXTURES = REPO / "fixtures"
BIN = REPO / ".golden_kASA"

pytestmark = pytest.mark.skipif(
    not (BIN.exists() and (GOLDEN / "exampleIndex").exists()),
    reason="golden binary or index missing")


def _genome_seq() -> str:
    seq = []
    for line in (FIXTURES / "example.fasta").read_text().splitlines():
        if not line.startswith(">"):
            seq.append(line)
    return "".join(seq)


def make_giant_fasta(path: pathlib.Path, total_chars: int, seed: int = 0,
                     trailing_reads: int = 0):
    """One giant contig: random ACGT with real-genome slices spliced in
    every few kb (so every chunk of it actually hits the toy index),
    then a few normal-sized reads to check post-carry numbering."""
    rng = np.random.default_rng(seed)
    genome = _genome_seq()
    acgt = np.frombuffer(b"ACGT", np.uint8)
    out = []
    made = 0
    gpos = 0
    while made < total_chars:
        rnd = acgt[rng.integers(0, 4, size=3000)].tobytes().decode()
        real = genome[gpos % len(genome):gpos % len(genome) + 600]
        gpos += 600
        out.append(rnd)
        out.append(real)
        made += len(rnd) + len(real)
    contig = "".join(out)[:total_chars]
    with open(path, "w") as fh:
        fh.write(">giant synthetic contig\n")
        for i in range(0, len(contig), 80):
            fh.write(contig[i:i + 80] + "\n")
        for r in range(trailing_reads):
            start = (r * 1357) % (len(genome) - 300)
            fh.write(f">trail_{r} after the giant one\n")
            fh.write(genome[start:start + 240] + "\n")


def run_reference(inp, out_json, out_prof, tmp, callidx, extra=()):
    subprocess.run(
        [str(BIN), "identify",
         "-c", str(GOLDEN / "exampleIndex_content.txt"),
         "-d", str(GOLDEN / "exampleIndex"),
         "-i", str(inp), "-q", str(out_json), "-p", str(out_prof),
         "-n", "1", "-m", "2", "-t", str(tmp), "-x", str(callidx), *extra],
        check=True, capture_output=True, cwd=str(tmp))


def run_ours(inp, out_json, out_prof, six=False):
    from kasa_tpu.config import Config
    from kasa_tpu.match.pipeline import identify

    cfg = Config()
    cfg.content_file = str(GOLDEN / "exampleIndex_content.txt")
    cfg.memory_avail = 2 * 1024 ** 3
    cfg.threads = 1
    cfg.six_frames = six
    identify(cfg, index_path=str(GOLDEN / "exampleIndex"),
             input_path=str(inp), out_file=str(out_json),
             profile_file=str(out_prof))


def _diff_head(a, b):
    la = pathlib.Path(a).read_bytes()
    lb = pathlib.Path(b).read_bytes()
    for i, (x, y) in enumerate(zip(la, lb)):
        if x != y:
            return (f"first diff at byte {i}: "
                    f"{la[max(0, i - 60):i + 60]!r} vs "
                    f"{lb[max(0, i - 60):i + 60]!r}")
    return f"sizes differ: {len(la)} vs {len(lb)}"


def test_multi_chunk_single_batch_parity(tmp_path):
    """~5M chars with --six: >1 chunk line per read (the ~100MB-of-k-mer
    split, Read.hpp:438), everything still inside one batch."""
    inp = tmp_path / "chunky.fasta"
    make_giant_fasta(inp, 5_000_000, seed=1, trailing_reads=2)
    exp_j, exp_p = tmp_path / "exp.json", tmp_path / "exp.csv"
    got_j, got_p = tmp_path / "got.json", tmp_path / "got.csv"
    run_reference(inp, exp_j, exp_p, tmp_path, 91, extra=("--six",))
    run_ours(inp, got_j, got_p, six=True)
    assert filecmp.cmp(got_j, exp_j, shallow=False), _diff_head(got_j, exp_j)
    assert filecmp.cmp(got_p, exp_p, shallow=False), _diff_head(got_p, exp_p)


def test_mid_read_batch_split_parity(tmp_path):
    """~40M chars with --six under -m 2: the contig spans three batches,
    partial scores merge across two batch boundaries (vSavedScores),
    trailing reads keep correct numbers."""
    inp = tmp_path / "giant.fasta"
    make_giant_fasta(inp, 40_000_000, seed=2, trailing_reads=3)
    exp_j, exp_p = tmp_path / "exp.json", tmp_path / "exp.csv"
    got_j, got_p = tmp_path / "got.json", tmp_path / "got.csv"
    run_reference(inp, exp_j, exp_p, tmp_path, 92, extra=("--six",))
    run_ours(inp, got_j, got_p, six=True)
    assert filecmp.cmp(got_j, exp_j, shallow=False), _diff_head(got_j, exp_j)
    assert filecmp.cmp(got_p, exp_p, shallow=False), _diff_head(got_p, exp_p)
