"""Golden parity tests: byte-compare our artifacts against outputs of the
reference kASA binary (pre-generated into tests/golden by
tools/make_golden.sh)."""

import filecmp
import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
FIXTURES = REPO / "fixtures"
TAXONOMY = pathlib.Path("/root/reference/example/taxonomy")

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "exampleIndex").exists(), reason="golden outputs not generated"
)


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return tmp_path_factory.mktemp("idx")


def test_generate_content_file(outdir):
    if not TAXONOMY.exists():
        pytest.skip("reference taxonomy not mounted")
    from kasa_tpu.index.content import generate_content_file

    out = outdir / "content.txt"
    generate_content_file(
        str(FIXTURES / "example.fasta"), str(out),
        acc2tax_path=str(TAXONOMY / "acc2tax/acc2Tax.txt"),
        taxonomy_path=str(TAXONOMY),
        tax_level="species",
    )
    assert filecmp.cmp(out, GOLDEN / "exampleIndex_content.txt", shallow=False)


def test_generate_content_file_chunked(outdir):
    """Memory-bounded generateCF (per-chunk temp files + merge chain,
    GenerateContentFile.hpp:23-303) must produce the same file as the
    unchunked path."""
    if not TAXONOMY.exists():
        pytest.skip("reference taxonomy not mounted")
    from kasa_tpu.index.content import generate_content_file

    out = outdir / "content_chunked.txt"
    # ~200 B/accession heuristic -> bound of 3 accessions per chunk
    generate_content_file(
        str(FIXTURES / "example.fasta"), str(out),
        acc2tax_path=str(TAXONOMY / "acc2tax/acc2Tax.txt"),
        taxonomy_path=str(TAXONOMY),
        tax_level="species",
        memory_bound=1,
    )
    assert filecmp.cmp(out, GOLDEN / "exampleIndex_content.txt",
                       shallow=False)


@pytest.fixture(scope="module")
def built_index(outdir):
    from kasa_tpu.index.build import build_index

    out = outdir / "exampleIndex"
    limbs, tax = build_index(
        str(FIXTURES / "example.fasta"),
        str(GOLDEN / "exampleIndex_content.txt"),
        str(out),
    )
    return out, limbs, tax


@pytest.mark.parametrize("suffix", ["", "_info.txt", "_trie", "_trie.txt", "_f.txt"])
def test_build_artifacts_byte_identical(built_index, suffix):
    out, _, _ = built_index
    assert filecmp.cmp(str(out) + suffix, str(GOLDEN / "exampleIndex") + suffix,
                       shallow=False), f"artifact {suffix or 'index'} differs"


def test_index_roundtrip(built_index):
    import numpy as np

    from kasa_tpu.index import artifacts

    out, limbs, tax = built_index
    rl, rt, hk, itype = artifacts.read_index(str(out))
    assert hk == 12 and itype == artifacts.INDEX_TYPE_64
    assert np.array_equal(rl, limbs)
    assert np.array_equal(rt, tax)


def test_build_spill_path_parity(tmp_path):
    """A tiny soft limit forces accumulate->spill->K-way merge; the
    artifacts must stay byte-identical (Build.hpp:305-596 path)."""
    from kasa_tpu.index.build import build_index

    out = tmp_path / "spillIndex"
    build_index(str(FIXTURES / "example.fasta"),
                str(GOLDEN / "exampleIndex_content.txt"), str(out),
                soft_limit=10000, temp_dir=str(tmp_path))
    for suffix in ("", "_info.txt", "_trie", "_trie.txt", "_f.txt"):
        assert filecmp.cmp(str(out) + suffix,
                           str(GOLDEN / "exampleIndex") + suffix,
                           shallow=False), f"spill artifact {suffix or 'index'}"


def test_build_continue_from_spills(tmp_path):
    """--continue: resume an interrupted build from its spilled temp
    runs (main.cpp:329-331; Read.hpp:3102-3110)."""
    from kasa_tpu.index.build import KmerAccumulator, build_index

    # phase 1: a build that spills everything, then "crashes" before the
    # merge -- emulated by monkeypatched finalize that leaves spills on disk
    spill_dir = tmp_path / "spills"
    spill_dir.mkdir()
    orig_finalize = KmerAccumulator.finalize

    def fake_finalize(self):
        self._spill()
        raise KeyboardInterrupt

    KmerAccumulator.finalize = fake_finalize
    try:
        import pytest as _pytest
        with _pytest.raises(KeyboardInterrupt):
            build_index(str(FIXTURES / "example.fasta"),
                        str(GOLDEN / "exampleIndex_content.txt"),
                        str(tmp_path / "dead"),
                        soft_limit=10000, temp_dir=str(spill_dir))
    finally:
        KmerAccumulator.finalize = orig_finalize

    # phase 2: resume; artifacts must equal the golden family
    out = tmp_path / "resumedIndex"
    build_index(str(FIXTURES / "example.fasta"),
                str(GOLDEN / "exampleIndex_content.txt"), str(out),
                temp_dir=str(spill_dir), continue_build=True)
    for suffix in ("", "_info.txt", "_trie", "_trie.txt", "_f.txt"):
        assert filecmp.cmp(str(out) + suffix,
                           str(GOLDEN / "exampleIndex") + suffix,
                           shallow=False), f"resumed artifact {suffix or 'index'}"
