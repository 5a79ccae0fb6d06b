"""Byte parity for the secondary modes (update/delete/merge/shrink/
protein/128-bit build, halved & protein identify) against reference-
binary goldens."""

import filecmp
import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
FIXTURES = REPO / "fixtures"
TAXONOMY = pathlib.Path("/root/reference/example/taxonomy")

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "exampleIndex_s").exists(),
    reason="secondary-mode goldens not generated")

ARTIFACTS = ("", "_info.txt", "_trie", "_trie.txt", "_f.txt")


def _check(ours, golden, suffixes=ARTIFACTS):
    for s in suffixes:
        assert filecmp.cmp(str(ours) + s, str(golden) + s, shallow=False), \
            f"artifact {s or 'index'} differs"


def _cfg(**kw):
    from kasa_tpu.config import Config
    cfg = Config()
    cfg.content_file = str(GOLDEN / "exampleIndex_content.txt")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_shrink_half(tmp_path):
    from kasa_tpu.index.shrink import shrink_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "s"), shrink_strategy=2)
    shrink_index(cfg)
    _check(tmp_path / "s", GOLDEN / "exampleIndex_s")


def test_shrink_every_nth(tmp_path):
    from kasa_tpu.index.shrink import shrink_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "g"), shrink_strategy=1,
               shrink_percentage=50.0)
    shrink_index(cfg)
    _check(tmp_path / "g", GOLDEN / "exampleIndex_g50")


def test_shrink_entropy(tmp_path):
    from kasa_tpu.index.shrink import shrink_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "e"), shrink_strategy=3)
    shrink_index(cfg)
    _check(tmp_path / "e", GOLDEN / "exampleIndex_ent")


def test_identify_halved(tmp_path):
    from kasa_tpu.match.pipeline import identify
    cfg = _cfg()
    identify(cfg, index_path=str(GOLDEN / "exampleIndex_s"),
             input_path=str(FIXTURES / "reads.fastq"),
             out_file=str(tmp_path / "h.json"),
             profile_file=str(tmp_path / "h.csv"))
    assert filecmp.cmp(tmp_path / "h.json", GOLDEN / "reads_half.json", shallow=False)
    assert filecmp.cmp(tmp_path / "h.csv", GOLDEN / "reads_half_profile.csv", shallow=False)


def test_delete(tmp_path):
    from kasa_tpu.index.update import delete_from_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "d"),
               delnodes_file=str(GOLDEN / "delnodes_test.dmp"))
    delete_from_index(cfg)
    _check(tmp_path / "d", GOLDEN / "exampleIndex_del")


def test_update(tmp_path):
    if not TAXONOMY.exists():
        pytest.skip("reference taxonomy not mounted")
    from kasa_tpu.index.update import update_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "u"),
               input=str(FIXTURES / "example2.fasta"),
               acc_to_tax_files=str(TAXONOMY / "acc2tax/acc2Tax.txt"),
               taxonomy_path=str(TAXONOMY), tax_level="species")
    cfg.content_file = ""
    update_index(cfg)
    _check(tmp_path / "u", GOLDEN / "exampleIndex_u",
           ARTIFACTS + ("_content.txt",))


def test_merge(tmp_path):
    from kasa_tpu.index.update import merge_indices
    cfg = _cfg(first_old_index=str(GOLDEN / "exampleIndex"),
               second_old_index=str(GOLDEN / "index2"),
               db_out=str(tmp_path / "m"),
               content_file1=str(GOLDEN / "exampleIndex_content.txt"),
               content_file2=str(GOLDEN / "index2_content.txt"))
    cfg.content_file = ""
    merge_indices(cfg)
    # the reference writes NO _info.txt for merged indices and an
    # all-zero frequency file (Read.hpp:3180-3243 quirk)
    _check(tmp_path / "m", GOLDEN / "index_merged",
           ("", "_trie", "_trie.txt", "_f.txt", "_content.txt"))
    assert not os.path.exists(str(tmp_path / "m") + "_info.txt")


def test_build_protein(tmp_path):
    from kasa_tpu.index.build import build_index
    build_index(str(FIXTURES / "protein.fasta"),
                str(GOLDEN / "protIndex_content.txt"),
                str(tmp_path / "p"), protein=True)
    _check(tmp_path / "p", GOLDEN / "protIndex")


def test_identify_protein(tmp_path):
    from kasa_tpu.match.pipeline import identify
    cfg = _cfg(translated=True)
    cfg.content_file = str(GOLDEN / "protIndex_content.txt")
    identify(cfg, index_path=str(GOLDEN / "protIndex"),
             input_path=str(FIXTURES / "protein_reads.fasta"),
             out_file=str(tmp_path / "pr.json"),
             profile_file=str(tmp_path / "pr.csv"))
    assert filecmp.cmp(tmp_path / "pr.json", GOLDEN / "prot_reads.json", shallow=False)
    assert filecmp.cmp(tmp_path / "pr.csv", GOLDEN / "prot_reads_profile.csv", shallow=False)


def test_build_sloppy(tmp_path):
    """-j build: index file == _taxOnly (u16 dense rows, the reference
    copies it over the index, Read.hpp:3134-3151), trie from the
    sloppy-encoded k-mers, original-size _info.txt, and NO _f.txt."""
    if not (GOLDEN / "exampleIndexSloppy").exists():
        pytest.skip("sloppy goldens missing")
    from kasa_tpu.index.build import build_index
    build_index(str(FIXTURES / "example.fasta"),
                str(GOLDEN / "exampleIndex_content.txt"),
                str(tmp_path / "j"), sloppy=True)
    _check(tmp_path / "j", GOLDEN / "exampleIndexSloppy",
           suffixes=("", "_taxOnly", "_info.txt", "_trie", "_trie.txt"))
    assert not os.path.exists(str(tmp_path / "j") + "_f.txt")


def test_build_128(tmp_path):
    from kasa_tpu.index.build import build_index
    build_index(str(FIXTURES / "example.fasta"),
                str(GOLDEN / "exampleIndex_content.txt"),
                str(tmp_path / "i128"), highest_k=25)
    _check(tmp_path / "i128", GOLDEN / "exampleIndex128")


def test_cli_redundancy(capsys):
    from kasa_tpu.cli import main
    rc = main(["kasa_tpu", "redundancy", "-d", str(GOLDEN / "exampleIndex"),
               "-c", str(GOLDEN / "exampleIndex_content.txt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "99% of the k-mers" in out


def test_cli_get_frequency_and_trie(tmp_path):
    import shutil
    from kasa_tpu.cli import main
    for s in ("", "_info.txt", "_content.txt", "_trie", "_trie.txt", "_f.txt"):
        shutil.copyfile(str(GOLDEN / "exampleIndex") + s, str(tmp_path / "idx") + s)
    os.remove(str(tmp_path / "idx") + "_f.txt")
    rc = main(["kasa_tpu", "getFrequency", "-d", str(tmp_path / "idx"),
               "-c", str(GOLDEN / "exampleIndex_content.txt")])
    assert rc == 0
    assert filecmp.cmp(str(tmp_path / "idx") + "_f.txt",
                       str(GOLDEN / "exampleIndex") + "_f.txt", shallow=False)
    os.remove(str(tmp_path / "idx") + "_trie")
    rc = main(["kasa_tpu", "trie", "-d", str(tmp_path / "idx")])
    assert rc == 0
    assert filecmp.cmp(str(tmp_path / "idx") + "_trie",
                       str(GOLDEN / "exampleIndex") + "_trie", shallow=False)


def test_identify_128(tmp_path):
    """128-bit identify via the walk-emulation compat engine, which
    reproduces the reference's uint64-truncated comparator
    (Compare.hpp:700) bit-for-bit."""
    if not (GOLDEN / "reads_128.json").exists():
        pytest.skip("128-bit goldens missing")
    from kasa_tpu.match.pipeline import identify
    cfg = _cfg(higher_k=25, lower_k=12)
    identify(cfg, index_path=str(GOLDEN / "exampleIndex128"),
             input_path=str(FIXTURES / "reads.fastq"),
             out_file=str(tmp_path / "r.json"),
             profile_file=str(tmp_path / "r.csv"))
    assert filecmp.cmp(tmp_path / "r.json", GOLDEN / "reads_128.json", shallow=False)
    assert filecmp.cmp(tmp_path / "r.csv", GOLDEN / "reads_128_profile.csv", shallow=False)


@pytest.mark.skipif(not (GOLDEN / "transformed").exists(),
                    reason="transform goldens not generated")
def test_transform(tmp_path):
    from kasa_tpu.index.aux_modes import transform_index
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "t"))
    transform_index(cfg)
    _check(tmp_path / "t", GOLDEN / "transformed",
           suffixes=("", "_2", "_counts.txt", "_info.txt"))


@pytest.mark.skipif(not (GOLDEN / "fuckedIndex").exists(),
                    reason="fuckit goldens not generated")
def test_fuckit(tmp_path):
    from kasa_tpu.index.aux_modes import fuckit_reencode
    cfg = _cfg(index_file=str(GOLDEN / "exampleIndex"),
               db_out=str(tmp_path / "f"))
    fuckit_reencode(cfg)
    _check(tmp_path / "f", GOLDEN / "fuckedIndex",
           suffixes=("", "_info.txt", "_f.txt", "_trie", "_trie.txt"))


def test_check_content_file(tmp_path):
    """checkContentFile: duplicate non-dummy taxid rows merge (union of
    species IDs and accessions), duplicate dummy rows drop, clean files
    round-trip (checkIfContentFileIsCorrupted, Utilities.hpp:926)."""
    from kasa_tpu.config import Config
    from kasa_tpu.index.aux_modes import check_content_file

    src = tmp_path / "broken_content.txt"
    src.write_text(
        "Alpha\t11\t11;12\tACC1;ACC2\n"
        "Beta\t22\t22\tACC3\n"
        "Alpha dup\t11\t13;12\tACC2;ACC4\n"
        "EWAN_dummy\t22\t22\tACC9\n")
    dst = tmp_path / "fixed_content.txt"
    cfg = Config()
    cfg.content_file1 = str(src)
    cfg.content_file2 = str(dst)
    merged = check_content_file(cfg)
    assert merged == 1
    lines = dst.read_text().splitlines()
    assert lines == [
        "Alpha\t11\t11;12;13\tACC1;ACC2;ACC4",
        "Beta\t22\t22\tACC3"]

    # clean file: no merges, byte-identical round trip
    clean = tmp_path / "clean.txt"
    clean.write_text("Alpha\t11\t11\tACC1\nBeta\t22\t22\tACC2\n")
    out2 = tmp_path / "clean_out.txt"
    cfg2 = Config()
    cfg2.content_file1 = str(clean)
    cfg2.content_file2 = str(out2)
    assert check_content_file(cfg2) == 0
    assert out2.read_text() == clean.read_text()

    # taxid-as-string (5-column) files keep the line-index column,
    # merged rows take the latest duplicate's index
    s5 = tmp_path / "str_content.txt"
    s5.write_text("Alpha\tA1\t1\tACC1\t7\nAlpha2\tA1\t2\tACC2\t9\n")
    d5 = tmp_path / "str_out.txt"
    cfg3 = Config()
    cfg3.content_file1 = str(s5)
    cfg3.content_file2 = str(d5)
    assert check_content_file(cfg3) == 1
    assert d5.read_text() == "Alpha\tA1\t1;2\tACC1;ACC2\t9\n"
