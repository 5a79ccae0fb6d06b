"""Parity tests for the kasa_tpu.tools package: each tool's output is
byte-compared against the corresponding reference script run on the
same inputs (the scripts are plain Python; reference scripts/)."""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
FIXTURES = REPO / "fixtures"
REF_SCRIPTS = pathlib.Path("/root/reference/scripts")
TAXONOMY = pathlib.Path("/root/reference/example/taxonomy")

pytestmark = pytest.mark.skipif(
    not REF_SCRIPTS.is_dir(), reason="reference scripts not mounted")


def run_ref(script, *args):
    subprocess.run([sys.executable, str(REF_SCRIPTS / script), *args],
                   check=True, capture_output=True)


def run_tool(tool, *args):
    from kasa_tpu.tools.__main__ import main
    assert main([tool, *args]) == 0


def assert_same(a: pathlib.Path, b: pathlib.Path):
    assert a.read_bytes() == b.read_bytes()


@pytest.mark.parametrize("tool,script,inp", [
    ("jsonToFrequencies", "jsonToFrequencies.py", "reads_identify.json"),
    ("jsonToFrequenciesTopOnly", "jsonToFrequenciesTopOnly.py",
     "reads_identify.json"),
    ("jsonLToFrequencies", "jsonLToFrequencies.py", "reads_identify.jsonl"),
    ("jsonLToFrequenciesTopOnly", "jsonLToFrequenciesTopOnly.py",
     "reads_identify.jsonl"),
    ("tsvToFrequencies", "tsvToFrequencies.py", "reads_identify.tsv"),
])
def test_frequencies_parity(tmp_path, tool, script, inp):
    ours, theirs = tmp_path / "ours.tsv", tmp_path / "theirs.tsv"
    run_tool(tool, "-i", str(GOLDEN / inp), "-o", str(ours))
    run_ref(script, "-i", str(GOLDEN / inp), "-o", str(theirs))
    assert_same(ours, theirs)


def test_frequencies_threshold(tmp_path):
    ours, theirs = tmp_path / "ours.tsv", tmp_path / "theirs.tsv"
    run_tool("jsonToFrequencies", "-i", str(GOLDEN / "reads_identify.json"),
             "-o", str(ours), "-t", "0.5")
    run_ref("jsonToFrequencies.py", "-i", str(GOLDEN / "reads_identify.json"),
            "-o", str(theirs), "-t", "0.5")
    assert_same(ours, theirs)


@pytest.fixture(scope="module")
def taxdumps():
    if not TAXONOMY.is_dir():
        pytest.skip("reference taxonomy not mounted")
    return str(TAXONOMY / "nodes.dmp"), str(TAXONOMY / "names.dmp")


def test_sum_freqs_on_tax_lvl(tmp_path, taxdumps):
    nodes, names = taxdumps
    freqs = tmp_path / "freqs.tsv"
    run_tool("jsonToFrequencies", "-i", str(GOLDEN / "reads_identify.json"),
             "-o", str(freqs))
    ours, theirs = tmp_path / "ours.tsv", tmp_path / "theirs.tsv"
    run_tool("sumFreqsOnTaxLvl", "-i", str(freqs), "-n", nodes, "-m", names,
             "-r", "genus", "-o", str(ours))
    run_ref("sumFreqsOnTaxLvl.py", "-i", str(freqs), "-n", nodes, "-m", names,
            "-r", "genus", "-o", str(theirs))
    assert_same(ours, theirs)


@pytest.mark.parametrize("u", ["n", "u", "o"])
def test_csv_to_cami(tmp_path, taxdumps, u):
    nodes, names = taxdumps
    ours, theirs = tmp_path / "ours.cami", tmp_path / "theirs.cami"
    args = ["-i", str(GOLDEN / "reads_profile.csv"), "-n", nodes, "-m", names,
            "-k", "12", "-u", u]
    run_tool("csvToCAMI", *args, "-o", str(ours))
    run_ref("csvToCAMI.py", *args, "-o", str(theirs))
    assert_same(ours, theirs)


def test_freqs_to_cami_and_krona(tmp_path, taxdumps):
    nodes, names = taxdumps
    freqs = tmp_path / "freqs.tsv"
    run_tool("jsonToFrequencies", "-i", str(GOLDEN / "reads_identify.json"),
             "-o", str(freqs))
    ours, theirs = tmp_path / "ours.cami", tmp_path / "theirs.cami"
    run_tool("freqsToCAMI", "-i", str(freqs), "-n", nodes, "-m", names,
             "-o", str(ours))
    run_ref("freqsToCAMI.py", "-i", str(freqs), "-n", nodes, "-m", names,
            "-o", str(theirs))
    assert_same(ours, theirs)
    ours_k, theirs_k = tmp_path / "ours.krona", tmp_path / "theirs.krona"
    run_tool("camiToKrona", "-i", str(ours), "-o", str(ours_k))
    run_ref("camiToKrona.py", "-i", str(theirs), "-o", str(theirs_k))
    assert_same(ours_k, theirs_k)


def test_json_to_cami_bin(tmp_path):
    ours, theirs = tmp_path / "ours.bin", tmp_path / "theirs.bin"
    run_tool("jsonToCAMIBin", "-i", str(GOLDEN / "reads_identify.json"),
             "-o", str(ours))
    run_ref("jsonToCAMIBin.py", "-i", str(GOLDEN / "reads_identify.json"),
            "-o", str(theirs))
    assert_same(ours, theirs)


def test_json_to_jsonl(tmp_path):
    ours, theirs = tmp_path / "ours.jsonl", tmp_path / "theirs.jsonl"
    run_tool("jsonToJsonL", str(GOLDEN / "reads_identify.json"), str(ours))
    run_ref("jsonToJsonL.py", str(GOLDEN / "reads_identify.json"), str(theirs))
    assert_same(ours, theirs)


def test_get_not_identified(tmp_path):
    fastq = str(FIXTURES / "reads.fastq")
    ours, theirs = tmp_path / "ours.fq", tmp_path / "theirs.fq"
    run_tool("getNotIdentifiedJson", "-i", str(GOLDEN / "reads_identify.json"),
             "-f", fastq, "-o", str(ours), "-t", "0.9")
    run_ref("getNotIdentifiedJson.py", "-i", str(GOLDEN / "reads_identify.json"),
            "-f", fastq, "-o", str(theirs), "-t", "0.9")
    assert_same(ours, theirs)
    run_tool("getNotIdentifiedJsonL", "-i",
             str(GOLDEN / "reads_identify.jsonl"),
             "-f", fastq, "-o", str(ours), "-t", "0.9")
    run_ref("getNotIdentifiedJsonL.py", "-i",
            str(GOLDEN / "reads_identify.jsonl"),
            "-f", fastq, "-o", str(theirs), "-t", "0.9")
    assert_same(ours, theirs)


def test_get_reads_for_taxon(tmp_path):
    import json
    with open(GOLDEN / "reads_identify.json") as fh:
        reads = json.load(fh)
    taxid = next(r["Top hits"][0]["tax ID"] for r in reads if r["Top hits"])
    fastq = str(FIXTURES / "reads.fastq")
    ours, theirs = tmp_path / "ours.fq", tmp_path / "theirs.fq"
    run_tool("getReadsForTaxonFromJsonl", "-i",
             str(GOLDEN / "reads_identify.jsonl"), "-f", fastq,
             "-o", str(ours), "-t", taxid)
    run_ref("getReadsForTaxonFromJsonl.py", "-i",
            str(GOLDEN / "reads_identify.jsonl"), "-f", fastq,
            "-o", str(theirs), "-t", taxid)
    assert_same(ours, theirs)


def test_reconstruct_dna_roundtrip():
    import numpy as np
    from kasa_tpu.tools.reconstruct import reconstruct, translate_frames
    rng = np.random.default_rng(0)
    for length in (3, 10, 37, 120):
        dna = "".join("ACGT"[i] for i in rng.integers(0, 4, size=length))
        frames = translate_frames(dna)
        result = reconstruct(frames)
        # all but the final codon's tail is fully determined; the tail
        # is ambiguous only within that codon's synonym class, so the
        # reconstruction must re-translate to the identical frames
        assert result[:length - 2] == dna[:length - 2]
        assert translate_frames(result) == frames
