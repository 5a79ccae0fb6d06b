"""Per-read scoring: best score, relative score, hit ranking.

Replicates Compare.hpp:1452-1520 including the reference's unsigned
integer wraparound quirks for short reads (size_t / uint32 arithmetic
before float conversion).
"""

from __future__ import annotations

import math

import numpy as np

from .join import weight

_U64 = 1 << 64
_U32 = 1 << 32


def calculate_best_score(read_len: int, min_k: int, max_k: int,
                         protein: bool, num_frames: int) -> np.float32:
    """calculateBestScore (Compare.hpp:1452-1480): float32 accumulation
    over i = minK..maxK; the (len - 3i + 1) term is size_t arithmetic
    and wraps for short reads."""
    best = np.float32(0)
    for i in range(min_k, max_k + 1):
        w = weight(i)
        if protein:
            n = (read_len - i + 1) % _U64
        elif num_frames == 1:
            n = (read_len // 3 - i + 1) % _U64
        elif num_frames == 6:
            n = (2 * ((read_len - i * 3 + 1) % _U64)) % _U64
        else:
            n = (read_len - i * 3 + 1) % _U64
        # C: (size_t)n * (float)w -> float32 multiply of float32(n)
        best = np.float32(best + np.float32(np.float32(n) * w))
    return best


def relative_score(kmer_score: np.float32, read_len: int, freq_max_k: int,
                   highest_k: int, protein: bool) -> float:
    """Compare.hpp:1506-1511.  The length term is uint32 arithmetic
    (wraps for reads shorter than 3*highestK-1) converted to double."""
    if protein:
        term = (read_len - highest_k + 1) % _U32
    else:
        term = (read_len - highest_k * 3 + 1) % _U32
    x = freq_max_k * float(term)
    if x > 0:
        denom = 1.0 + math.log2(x)
    elif x == 0:
        denom = float("-inf")  # C log2(0) = -inf -> relScore = -0.0
    else:
        denom = float("nan")
    return float(kmer_score) / denom


class ReadHits:
    """Threshold-filtered, ranked hits of one read."""

    __slots__ = ("spec_idx", "kmer_scores", "rel_scores", "top_hit_count", "best_score")

    def __init__(self, spec_idx, kmer_scores, rel_scores, top_hit_count, best_score):
        self.spec_idx = spec_idx
        self.kmer_scores = kmer_scores
        self.rel_scores = rel_scores
        self.top_hit_count = top_hit_count
        self.best_score = best_score


def rank_read(score_row: np.ndarray, read_len: int, freqs_max_k: np.ndarray,
              min_k: int, max_k: int, highest_k: int, protein: bool,
              num_frames: int, threshold: float, num_of_beasts: int) -> ReadHits:
    """score_row: (S,) float32 (index 0 unused).  freqs_max_k: (S,)
    frequency at the user's maxK per species row."""
    best = calculate_best_score(read_len, min_k, max_k, protein, num_frames)
    hit_idx = np.nonzero(score_row[1:] > 0.0)[0] + 1
    spec, ksc, rsc = [], [], []
    for i in hit_idx:
        k = score_row[i]
        r = relative_score(k, read_len, int(freqs_max_k[i]), highest_k, protein)
        if r >= threshold:
            spec.append(int(i))
            ksc.append(np.float32(k))
            rsc.append(r)
    if not spec:
        return ReadHits([], [], [], 0, best)
    order = sorted(range(len(spec)), key=lambda j: -rsc[j])
    spec = [spec[j] for j in order]
    ksc = [ksc[j] for j in order]
    rsc = [rsc[j] for j in order]
    max_k_score = max(ksc)
    top = 1
    for i in range(1, len(spec)):
        if i >= num_of_beasts:
            break
        if np.float32(ksc[i]) / np.float32(max_k_score) > np.float32(0.8):
            top += 1
        else:
            break
    return ReadHits(spec, ksc, rsc, top, best)
