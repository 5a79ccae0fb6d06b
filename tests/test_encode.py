import numpy as np
import pytest

from kasa_tpu.core import kmer
from kasa_tpu.core.alphabet import (
    build_codon_lut,
    build_codon_code_lut,
    build_revcomp_lut,
    build_sanitize_lut,
    triplet_index,
    codes_to_aa_string,
)
from kasa_tpu.core.encode import Encoder, aas_code_lut


def translate_py(dna: str, lut=None) -> str:
    """Naive triplet-wise translation (reference dnaToAminoacid)."""
    lut = build_codon_lut() if lut is None else lut
    out = []
    for i in range(0, len(dna) - 2, 3):
        out.append(chr(lut[triplet_index(ord(dna[i]), ord(dna[i + 1]), ord(dna[i + 2]))]))
    return "".join(out)


class TestAlphabet:
    def test_known_codons(self):
        assert translate_py("ATG") == "M"
        assert translate_py("TAA") == "["
        assert translate_py("TAG") == "["
        assert translate_py("TGA") == "]"
        assert translate_py("TGG") == "W"
        assert translate_py("AAA") == "K"
        assert translate_py("GGG") == "G"
        assert translate_py("TTT") == "F"

    def test_x_and_z(self):
        assert translate_py("AXA") == "^"
        assert translate_py("XAA") == "^"
        assert translate_py("AAX") == "^"
        assert translate_py("AZA") == "_"
        assert translate_py("XZX") == "_"  # Z wins over X

    def test_lowercase(self):
        assert translate_py("atg") == "M"
        assert translate_py("acgt"[:3]) == translate_py("ACGT"[:3])

    def test_revcomp(self):
        lut = build_revcomp_lut()
        seq = np.frombuffer(b"ACGTXZ", dtype=np.uint8)
        rc = lut[seq][::-1]
        assert rc.tobytes() == b"ZXACGT"

    def test_sanitize(self):
        lut = build_sanitize_lut()
        s = np.frombuffer(b"ACGTNRYacgt-", dtype=np.uint8)
        assert lut[s].tobytes() == b"ACGTZZZacgtZ"


class TestKmerLimbs:
    def test_string_roundtrip(self):
        s = "KASAFRAMEWRK"
        limbs = kmer.string_to_limbs(s, 12)
        assert kmer.limbs_to_string(limbs, 12) == s

    def test_u64_roundtrip_matches_reference_packing(self):
        # reference packing: 5 bits/letter, first letter highest
        s = "MKVL^_AB[]CD"
        limbs = kmer.string_to_limbs(s, 12)
        u = kmer.limbs_to_u64(limbs)
        ref = 0
        for ch in s:
            ref = (ref << 5) | (ord(ch) & 31)
        assert int(u) == ref
        back = kmer.u64_to_limbs(np.array([u]))[0]
        assert np.array_equal(back, limbs)

    def test_u128_roundtrip(self):
        s = "MKVL^_ABCDEFGHIKLMNPQRSTV"  # 25 letters
        limbs = kmer.string_to_limbs(s, 25)
        hi, lo = kmer.limbs_to_u128_parts(limbs[None, :])
        ref = 0
        for ch in s:
            ref = (ref << 5) | (ord(ch) & 31)
        assert (int(hi[0]) << 64 | int(lo[0])) == ref
        back = kmer.u128_parts_to_limbs(hi, lo)[0]
        assert np.array_equal(back, limbs)

    def test_prefix_masks(self):
        m = kmer.prefix_masks(12, 7)
        limbs = kmer.string_to_limbs("ABCDEFGHIJKL", 12)
        masked = limbs & m
        assert kmer.limbs_to_string(masked, 12) == "ABCDEFG@@@@@"

    def test_order_equivalence(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1 << 60, size=200, dtype=np.uint64)
        limbs = kmer.u64_to_limbs(vals)
        order_u64 = np.argsort(vals, kind="stable")
        order_limbs = np.lexsort((limbs[:, 1], limbs[:, 0]))
        assert np.array_equal(vals[order_u64], vals[order_limbs])


class TestEncoder:
    def _windows_py(self, dna: str, highest_k: int = 12):
        """All 3*highestK-char windows translated, as strings."""
        span = 3 * highest_k
        return [translate_py(dna[p:p + span]) for p in range(len(dna) - span + 1)]

    def test_encode_dna_windows(self):
        rng = np.random.default_rng(1)
        dna = "".join(rng.choice(list("ACGTXZ"), size=100))
        enc = Encoder()
        buf = np.frombuffer(dna.encode(), dtype=np.uint8)
        limbs = np.asarray(enc.encode_dna_buffer(buf, 12))
        expect = self._windows_py(dna)
        assert limbs.shape == (len(expect), 2)
        for i, s in enumerate(expect):
            assert kmer.limbs_to_string(limbs[i], 12) == s, f"window {i}"

    def test_encode_protein_windows(self):
        prot = "MKVLYAGHERDSTW"
        enc = Encoder()
        buf = np.frombuffer(prot.encode(), dtype=np.uint8)
        limbs = np.asarray(enc.encode_protein_buffer(buf, 12))
        assert limbs.shape == (3, 2)
        assert kmer.limbs_to_string(limbs[0], 12) == prot[:12]
        assert kmer.limbs_to_string(limbs[1], 12) == prot[1:13]

    def test_encode_128bit_windows(self):
        rng = np.random.default_rng(2)
        dna = "".join(rng.choice(list("ACGT"), size=120))
        enc = Encoder()
        buf = np.frombuffer(dna.encode(), dtype=np.uint8)
        limbs = np.asarray(enc.encode_dna_buffer(buf, 25))
        span = 75
        expect = [translate_py(dna[p:p + span]) for p in range(len(dna) - span + 1)]
        assert limbs.shape == (len(expect), 5)
        for i, s in enumerate(expect):
            assert kmer.limbs_to_string(limbs[i], 25) == s

    def test_sloppy_reduce(self):
        # spot-check against the pair table semantics
        lut = aas_code_lut()
        s = "ABCDEFGHIJKL"
        limbs = kmer.string_to_limbs(s, 12)[None, :]
        enc = Encoder(sloppy=True)
        import jax.numpy as jnp

        from kasa_tpu.core.encode import sloppy_reduce

        red = np.asarray(sloppy_reduce(jnp.asarray(limbs), enc.aas_lut))[0]
        expect = []
        for p in range(6):
            a, b = ord(s[2 * p]) & 31, ord(s[2 * p + 1]) & 31
            expect.append(lut[(a << 5) | b])
        got = [int(kmer.letter_at(red, p, 12)) for p in range(6)]
        assert got == [int(e) for e in expect]
        assert int(red[1]) == 0
