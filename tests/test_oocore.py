"""Out-of-core (tiered) identify: streaming limb0-run-aligned index
chunks must reproduce the fully-resident engine exactly (VERDICT round
1 item 4; reference disk-backed index Compare.hpp:182-318)."""

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
FIXTURES = REPO / "fixtures"

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "exampleIndex").exists(), reason="golden index missing")


def _setup():
    from kasa_tpu.index import artifacts
    from kasa_tpu.match.pipeline import load_content_for_identify

    limbs, taxids, hk, itype = artifacts.read_index(str(GOLDEN / "exampleIndex"))
    content = load_content_for_identify(str(GOLDEN / "exampleIndex_content.txt"))
    return limbs, taxids, content


def test_plan_chunks_run_aligned():
    from kasa_tpu.index import artifacts
    from kasa_tpu.match.oocore import plan_chunks

    path = str(GOLDEN / "exampleIndex")
    _prefixes, counts = artifacts.read_trie(path)
    run_starts = set(np.cumsum([0] + [int(c) for c in counts]).tolist())
    chunks = plan_chunks(path, 2000)
    n, _ = artifacts.read_info(path)
    assert chunks[0][0] == 0 and chunks[-1][1] == n
    assert len(chunks) > 2
    for a, b in chunks:
        assert a in run_starts and b in run_starts
        assert a < b


def test_tiered_classify_equals_resident(tmp_path):
    from kasa_tpu.match.engine import TpuEngine
    from kasa_tpu.match.oocore import TieredIndex

    limbs, taxids, content = _setup()
    S = content.num_species
    rng = np.random.default_rng(5)
    m = 4096
    pick = rng.integers(0, len(limbs), size=m)
    q = limbs[pick].copy()
    miss = rng.random(m) < 0.3
    q[miss, 1] ^= (rng.integers(1, 31, size=int(miss.sum()))
                   .astype(np.int32) << 5)
    rid = rng.integers(0, 64, size=m).astype(np.int32)

    eng = TpuEngine(limbs, taxids, content.tax_to_idx, 12, 7, 12, S)
    full = eng.classify(q, rid, 64)

    tiered = TieredIndex(str(GOLDEN / "exampleIndex"), content.tax_to_idx,
                         7, 12, S, chunk_entries=3000,
                         cache_dir=str(tmp_path / "cache"))
    assert len(tiered.chunks) > 3
    part = tiered.classify(q, rid, 64)

    assert np.array_equal(part.counts_unique, full.counts_unique)
    np.testing.assert_allclose(part.counts_all, full.counts_all, rtol=1e-6)
    np.testing.assert_allclose(part.scores, full.scores, rtol=2e-5, atol=1e-4)


def test_identify_tiered_under_memory_budget(tmp_path):
    """engine=tpu with a memory budget smaller than the device tables:
    the pipeline must stream chunks and still agree with the exact
    engine's output."""
    import json
    from kasa_tpu.config import Config
    from kasa_tpu.match.pipeline import identify

    outs = {}
    for tag, mem in (("resident", 2 << 30), ("tiered", 1 << 20)):
        cfg = Config()
        cfg.content_file = str(GOLDEN / "exampleIndex_content.txt")
        cfg.engine = "tpu"
        cfg.memory_avail = mem
        o = tmp_path / f"{tag}.json"
        identify(cfg, index_path=str(GOLDEN / "exampleIndex"),
                 input_path=str(FIXTURES / "reads.fastq"), out_file=str(o))
        outs[tag] = json.load(open(o))
    assert len(outs["resident"]) == len(outs["tiered"])
    for a, b in zip(outs["resident"], outs["tiered"]):
        ha = {h["tax ID"] for h in a["Top hits"] + a["Further hits"]}
        hb = {h["tax ID"] for h in b["Top hits"] + b["Further hits"]}
        assert ha == hb
