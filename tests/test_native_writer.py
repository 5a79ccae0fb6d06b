"""Native rank+format (native/writer.cpp) must produce byte-identical
output to the Python parity path (match/score.py rank_read +
host/output.py ReadResultWriter) for the same score matrices -- that is
what licenses the fast engine to use it."""

import io

import numpy as np
import pytest

from kasa_tpu.native import get_lib, NativeRanker


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _python_output(scores, names, lengths, idx_to_tax, organisms, freqs,
                   fmt, start, min_k=7, max_k=12, highest_k=12,
                   protein=False, num_frames=3, threshold=0.0, beasts=3,
                   coherence=None):
    from kasa_tpu.match.score import rank_read
    from kasa_tpu.host.output import ReadResultWriter

    fh = io.StringIO()
    w = ReadResultWriter(fh, fmt, num_of_beasts=beasts,
                         coherence=coherence is not None)
    header_len = len(fh.getvalue())   # file header ("[\n" / tsv #header)
                                      # is written by the caller, not the
                                      # per-batch formatter
    for r in range(scores.shape[0]):
        hits = rank_read(scores[r], int(lengths[r]), freqs, min_k, max_k,
                         highest_k, protein, num_frames, threshold, beasts)
        w.write_read(start + r, names[r], int(lengths[r]), hits,
                     idx_to_tax, organisms,
                     coherence_val=(float(coherence[r])
                                    if coherence is not None else 0.0))
    # no close(): batch-level comparison, the json ]\n footer is written
    # by the caller once per file in both paths
    return fh.getvalue()[header_len:].encode("latin-1")


def _batch(S=37, R=64, seed=0, sparse=0.9):
    rng = np.random.default_rng(seed)
    scores = rng.random((R, S), np.float32).astype(np.float32) * 40
    scores[rng.random((R, S)) < sparse] = 0.0
    scores[:, 0] = 0.0
    scores[5] = 0.0          # a read with no hits
    # equal k-mer scores in one read (exercises the distinct-score
    # counting in the further-hits loop)
    scores[7, 3] = scores[7, 9] = 7.25
    names = [f"read_{i} descr " for i in range(R)]
    lengths = rng.integers(20, 5000, R).astype(np.uint32)
    lengths[11] = 9          # short read: wraparound best-score path
    idx_to_tax = [0] + [int(x) for x in rng.integers(1, 10 ** 7, S - 1)]
    organisms = ["non_unique"] + [f"Species number {i}" for i in range(1, S)]
    freqs = rng.integers(1, 10 ** 6, S).astype(np.uint64)
    freqs[4] = 0             # zero frequency: log2(0) -> -inf -> -0.0
    return scores, names, lengths, idx_to_tax, organisms, freqs


@pytest.mark.parametrize("fmt", ["json", "jsonl", "tsv", "kraken"])
def test_native_writer_matches_python(fmt):
    scores, names, lengths, idx_to_tax, organisms, freqs = _batch()
    exp = _python_output(scores, names, lengths, idx_to_tax, organisms,
                         freqs, fmt, start=0)
    r = NativeRanker(idx_to_tax, organisms, freqs, 7, 12, 12, False, 3,
                     0.0, 3, fmt, coherence_on=False)
    got, _ = r.format(scores, names, lengths, 0)
    assert got == exp


def test_native_writer_offsets_and_coherence():
    scores, names, lengths, idx_to_tax, organisms, freqs = _batch(seed=3)
    coh = (np.random.default_rng(4).random(len(names)) * 30).astype(np.float32)
    exp = _python_output(scores, names, lengths, idx_to_tax, organisms,
                         freqs, "json", start=1234, coherence=coh)
    r = NativeRanker(idx_to_tax, organisms, freqs, 7, 12, 12, False, 3,
                     0.0, 3, "json", coherence_on=True)
    got, _ = r.format(scores, names, lengths, 1234, coherence=coh)
    assert got == exp


def test_native_writer_threshold_and_beasts():
    scores, names, lengths, idx_to_tax, organisms, freqs = _batch(seed=7,
                                                                  sparse=0.5)
    exp = _python_output(scores, names, lengths, idx_to_tax, organisms,
                         freqs, "tsv", start=0, threshold=0.4, beasts=5)
    r = NativeRanker(idx_to_tax, organisms, freqs, 7, 12, 12, False, 3,
                     0.4, 5, "tsv", coherence_on=False)
    got, _ = r.format(scores, names, lengths, 0)
    assert got == exp


def test_native_filter_flags_match_python_rule():
    from kasa_tpu.match.score import rank_read

    scores, names, lengths, idx_to_tax, organisms, freqs = _batch(seed=9,
                                                                  sparse=0.6)
    et = 0.5
    r = NativeRanker(idx_to_tax, organisms, freqs, 7, 12, 12, False, 3,
                     0.0, 3, "json", coherence_on=False, filter_on=True,
                     error_threshold=et)
    _, flags = r.format(scores, names, lengths, 0)
    for i in range(scores.shape[0]):
        hits = rank_read(scores[i], int(lengths[i]), freqs, 7, 12, 12,
                         False, 3, 0.0, 3)
        exp = bool(hits.spec_idx) and \
            float(np.float32(hits.best_score - max(hits.kmer_scores))
                  / np.float32(hits.best_score)) < et
        assert bool(flags[i]) == exp, i


def test_cpp_dtoa_fuzz_matches_python():
    """The C++ Grisu2 port must agree with host/dtoa.py (which is
    fuzz-verified against the reference binary) on a broad sample."""
    import ctypes
    from kasa_tpu.host.dtoa import dtoa

    lib = get_lib()
    # fuzz through the writer: a 1-species kraken line per value puts
    # dtoa output directly in the text
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.random(300).astype(np.float32).astype(np.float64) * 50,
        10.0 ** rng.uniform(-25, 25, 300) * rng.random(300),
        np.array([1.0, 0.5, 1e-7, 123456789.0, 3.0000000000000004]),
    ])
    S = 2
    r = NativeRanker([0, 1], ["non_unique", "x"], np.array([5, 5], np.uint64),
                     7, 12, 12, False, 3, -1e30, 3, "kraken",
                     coherence_on=False)
    for v in vals:
        f32 = np.float32(v)
        if not np.isfinite(f32) or f32 <= 0:
            continue
        scores = np.array([[0.0, f32]], np.float32)
        got, _ = r.format(scores, ["n "], np.array([1000], np.uint32), 0)
        emitted = got.decode().split("\t")[4].split(":")[1].split(" ")[0]
        assert emitted == dtoa(float(f32)), (v, emitted, dtoa(float(f32)))
