"""Tiered turbo identify (match/tiered.py): with -m forcing chunked
streaming, the CLI fast path must agree with the resident turbo run --
identical unique counts, close non-unique counts, same per-read taxa.
The corpus plants a T=80 (> TMAX=64) conserved gene so the
deterministic host-ADD overflow contract is exercised, plus T~20
groups that stay fully on device."""

import json
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

NUM_SPECIES = 120
GENOME_LEN = 400
READ_LEN = 100
NUM_READS = 600


def synth_corpus_big_groups(tmp_path, seed=19):
    from kasa_tpu.core.encode import (build_codon_code_lut,
                                      dna_to_aa_codes_np,
                                      encode_windows_np)
    from kasa_tpu.index import artifacts
    from kasa_tpu.index.build import compute_frequencies
    from kasa_tpu.index.content import ContentEntry, write_content_file

    rng = np.random.default_rng(seed)
    dna4 = np.frombuffer(b"ACGT", np.uint8)
    gene_big = rng.integers(0, 4, size=90)    # 80 carriers > TMAX
    gene_mid = rng.integers(0, 4, size=90)    # ~24 carriers
    genomes = []
    for g in range(NUM_SPECIES):
        d = rng.integers(0, 4, size=GENOME_LEN)
        if g < 80:
            off = int(rng.integers(0, GENOME_LEN - 90))
            d[off:off + 90] = gene_big
        if g % 5 == 0:
            off = int(rng.integers(0, GENOME_LEN - 90))
            d[off:off + 90] = gene_mid
        genomes.append(dna4[d])

    lut = build_codon_code_lut()
    all_l, all_t = [], []
    for g, dna in enumerate(genomes):
        aa = dna_to_aa_codes_np(dna, lut)
        win = encode_windows_np(aa, 12, 3)[:len(dna) - 36 + 1]
        all_l.append(win)
        all_t.append(np.full(len(win), g + 1, np.uint32))
    limbs = np.concatenate(all_l)
    taxids = np.concatenate(all_t)
    order = np.lexsort((taxids, limbs[:, 1], limbs[:, 0]))
    limbs, taxids = limbs[order], taxids[order]
    keep = np.ones(len(taxids), bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) \
        | (taxids[1:] != taxids[:-1])
    limbs = np.ascontiguousarray(limbs[keep])
    taxids = taxids[keep]

    idx = str(tmp_path / "tierIndex")
    entries = [ContentEntry(name=f"Tier species {i}", taxid=str(i),
                            lowest_taxids=[str(i)],
                            accessions=[f"TS{i}"])
               for i in range(1, NUM_SPECIES + 1)]
    write_content_file(idx + "_content.txt", entries)
    artifacts.write_index(idx, limbs, taxids, 12)
    pref, cnts = artifacts.trie_from_sorted_prefixes(limbs[:, 0])
    artifacts.write_trie(idx, pref, cnts)
    freq = compute_frequencies(limbs, taxids, entries, 12, 1)
    artifacts.write_frequency_file(idx, entries, freq)

    fq = tmp_path / "tier_reads.fastq"
    with open(fq, "wb") as fh:
        gsel = rng.integers(0, NUM_SPECIES, size=NUM_READS)
        for i in range(NUM_READS):
            g = genomes[gsel[i]]
            off = int(rng.integers(0, len(g) - READ_LEN))
            r = g[off:off + READ_LEN]
            fh.write(b"@tr_%d src%d\n" % (i, gsel[i] + 1))
            fh.write(r.tobytes())
            fh.write(b"\n+\n" + b"I" * READ_LEN + b"\n")
    return idx, str(fq), len(taxids)


def test_tiered_cli_agrees_with_resident(tmp_path, monkeypatch):
    from kasa_tpu.config import Config
    from kasa_tpu.match.pipeline import identify
    from kasa_tpu.match.fast import bytes_per_entry_resident

    # single-device strategies only (the auto-mesh would otherwise
    # activate on the 8 virtual CPU devices)
    monkeypatch.setenv("KASA_MESH_DP", "1")
    monkeypatch.setenv("KASA_MESH_IP", "1")

    idx, fq, n = synth_corpus_big_groups(tmp_path)

    def run(tag, mem=None):
        cfg = Config()
        cfg.engine = "tpu"
        cfg.content_file = idx + "_content.txt"
        cfg.num_of_beasts = 100
        if mem:
            cfg.memory_avail = mem
        o = str(tmp_path / f"{tag}.json")
        ca, cu, r, k = identify(cfg, index_path=idx, input_path=fq,
                                out_file=o, profile_file=None)
        return ca, cu, r, k, json.load(open(o))

    ca1, cu1, r1, k1, out1 = run("resident")
    # budget small enough for several chunks, large enough for > 2^16
    # entries per chunk floor not to dominate
    budget = bytes_per_entry_resident(6) * n // 4
    ca2, cu2, r2, k2, out2 = run("tiered", mem=int(budget / 0.8))

    assert (r1, k1) == (r2, k2)
    np.testing.assert_array_equal(cu1, cu2)
    np.testing.assert_allclose(ca1, ca2, rtol=2e-5, atol=2e-3)

    big_reads = 0
    for ra, rb in zip(out1, out2):
        ha = {h["tax ID"]: h for h in ra["Top hits"] + ra["Further hits"]}
        hb = {h["tax ID"]: h for h in rb["Top hits"] + rb["Further hits"]}
        assert set(ha) == set(hb), f"read {ra['Read number']}"
        if len(ha) > 64:
            big_reads += 1
        for t, h in ha.items():
            np.testing.assert_allclose(float(h["k-mer Score"]),
                                       float(hb[t]["k-mer Score"]),
                                       rtol=2e-4, atol=2e-4)
    assert big_reads > 5, "corpus should exercise the T>TMAX host-ADD"


def test_tiered_kernel_matches_oracle(tmp_path, monkeypatch):
    """Kernel-level check against the brute-force oracle from
    test_turbo: device counts must equal the oracle MINUS the big
    (T > TMAX) groups, which host_ranges_classify(t_min=TMAX) must
    supply exactly."""
    import jax.numpy as jnp
    from test_turbo import _index_with_tiers, _oracle, S as TS
    from kasa_tpu.match.tiered import (
        TieredTurboDispatch, TMAX, host_ranges_classify,
        window_vbits_np)
    from kasa_tpu.index import artifacts

    limbs, taxids, hot = _index_with_tiers(n=30_000,
                                           heavy_ts=(3, 30, 60, 90, 200))
    idx = str(tmp_path / "kIdx")
    artifacts.write_index(idx, limbs, taxids, 12)

    tax_rows = taxids.astype(np.int32)   # identity mapping
    disp = TieredTurboDispatch(idx, limbs, tax_rows, 12, 7, 12, TS,
                               chunk_entries=7000,
                               cache_dir=str(tmp_path / "cache"))
    assert len(disp.chunks) >= 4

    rng = np.random.default_rng(2)
    R, kpr = 64, 36
    m = R * kpr
    pick = rng.integers(0, len(taxids), size=m)
    q = limbs[pick].copy()
    miss = rng.random(m) < 0.3
    q[miss, 1] ^= (rng.integers(1, 31, size=int(miss.sum()))
                   .astype(np.int32) << 5)
    for i, kl in enumerate(hot):
        q[i * kpr + 3] = kl

    # drive the dispatch through a fake "byte matrix" is awkward; call
    # the pass/finish machinery directly on the encoded windows
    from kasa_tpu.match.tiered import (tiered_chunk_pass, tiered_finish,
                                       chunk_cuts, PASS_CAP, I32_MAX,
                                       TIERED_FIELDS)
    vb = window_vbits_np(q, 7, 12)
    pos0 = np.arange(m, dtype=np.int32)
    order = np.lexsort((q[:, 1], q[:, 0]))
    q_s = jnp.asarray(np.ascontiguousarray(q[order]))
    vb_s = jnp.asarray(vb[order])
    ps_s = jnp.asarray(pos0[order])
    # pad sorted arrays so PASS_CAP slices exist
    pad = max(PASS_CAP - m, 0)
    if pad:
        q_s = jnp.concatenate(
            [q_s, jnp.full((pad, 2), np.int32(2**31 - 1))])
        vb_s = jnp.concatenate([vb_s, jnp.zeros((pad,), jnp.int32)])
        ps_s = jnp.concatenate(
            [ps_s, jnp.full((pad,), m, jnp.int32)])
    cuts = np.asarray(chunk_cuts(q_s[:m], disp.chunk_limb0))

    num_k = 6
    skey_buf = jnp.full((m + 1, num_k), I32_MAX, jnp.int32)
    sflat = jnp.zeros((R * TS + 1,), jnp.float32)
    cflat = jnp.zeros((num_k * TS + 1,), jnp.float32)
    big = jnp.zeros((R + 1,), jnp.int32)
    ends = list(cuts[1:]) + [m]
    for ci in range(len(disp.chunks)):
        lo, hi = int(cuts[ci]), int(ends[ci])
        if hi <= lo:
            continue
        z = np.load(disp._chunk_file(ci))
        tabs = tuple(jnp.asarray(z[f]) for f in TIERED_FIELDS)
        for off in range(lo, hi, PASS_CAP):
            skey_buf, sflat, cflat, big = tiered_chunk_pass(
                *tabs, disp.weights, q_s, vb_s, ps_s,
                off, min(off + PASS_CAP, hi),
                skey_buf, sflat, cflat, big,
                disp.num_steps, disp.msteps, 7, 12, 12, TS, kpr)
    acc_ca = jnp.zeros((num_k, TS), jnp.float32)
    acc_cu = jnp.zeros((num_k, TS), jnp.int32)
    packed, ht, hk, ca_d, cu_d = tiered_finish(
        skey_buf, sflat, cflat, big, disp.weights, acc_ca, acc_cu,
        7, 12, TS, R, kpr, 16 * R)
    packed = np.asarray(packed)
    ca = np.asarray(ca_d).astype(np.float64)
    cu = np.asarray(cu_d).astype(np.int64)

    # host ADD of the big groups per flagged read
    flags = packed[R:2 * R]
    assert (flags & 1).any(), "T>TMAX groups should flag reads"
    for r in np.nonzero(flags & 1)[0]:
        qr = q[r * kpr:(r + 1) * kpr]
        _sc, ca2, cu2 = host_ranges_classify(
            disp.key64, disp.tax_rows, qr, window_vbits_np(qr, 7, 12),
            7, 12, 12, TS, t_min=TMAX)
        ca += ca2
        cu += cu2

    exp_scores, exp_ca, exp_cu = _oracle(limbs, taxids, q, R, kpr)
    np.testing.assert_allclose(ca, exp_ca, rtol=2e-5, atol=2e-3)
    np.testing.assert_array_equal(cu, exp_cu)

    # full per-read lists: rebuild flagged, decode the rest
    hc = packed[:R]
    ht = np.asarray(ht)
    hk = np.asarray(hk)
    for r in range(R):
        exp_taxa = np.nonzero(exp_scores[r])[0]
        if flags[r]:
            sc = host_ranges_classify(
                disp.key64, disp.tax_rows, q[r * kpr:(r + 1) * kpr],
                window_vbits_np(q[r * kpr:(r + 1) * kpr], 7, 12),
                7, 12, 12, TS, t_min=0)[0]
            got = np.array(sorted(sc), dtype=np.int64)
        else:
            got = ht[r, :hc[r]].astype(np.int64)
        np.testing.assert_array_equal(got, exp_taxa)
