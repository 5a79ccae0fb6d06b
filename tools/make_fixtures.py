#!/usr/bin/env python3
"""Deterministically synthesize the toy dataset for tests/benchmarks.

The reference repo's example fasta files (example/work/db/example.fasta,
16S_NCBI.fasta) are missing from this mount (.MISSING_LARGE_BLOBS), so we
generate replacement genomes whose accession headers resolve through the
*real* example taxonomy (example/taxonomy/{acc2tax,names.dmp,nodes.dmp})
that is present.  Reads are sampled from those genomes (with mutations),
plus some random-background reads, single- and paired-end, fasta+fastq.

All outputs are byte-deterministic (seeded RNG) so golden outputs from
the reference binary stay valid.
"""

import argparse
import gzip
import os
import random

# accession.version -> taxid pairs present in example/taxonomy/acc2tax/acc2Tax.txt
GENOMES = [
    ("CP023965.1", "Proteus vulgaris strain FDAARGOS_366 chromosome", 6000),
    ("NR_136469.1", "Aquicella siphonis strain SGAB673", 3200),
    ("NR_136468.1", "Desulfallas thermosapovorans strain DSM 6562", 2800),
    ("NR_136467.1", "Fontisphaera persica strain BSA-5", 2600),
    ("NR_147730.1", "Casimicrobium huifangae strain ZY16", 2400),
    ("NR_136458.1", "Tengunoibacter tsumagoiensis strain Dai-27", 2200),
    ("NR_136457.1", "Mariniblastus fucicola strain FC18", 2000),
    ("NR_147743.1", "Desertihabitans aurantiacus strain CPCC 204711", 1800),
]
# entries with no accession -> dummy taxids (EWAN_ path in generateCF)
DUMMIES = [
    ("synthetic_contig_without_accession", 1500),
]


def rand_dna(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def wrap(seq, width=70):
    return "\n".join(seq[i:i + width] for i in range(0, len(seq), width))


def make_db(outdir):
    rng = random.Random(0xA5A)
    genomes = {}
    lines = []
    for acc, desc, n in GENOMES:
        seq = rand_dna(rng, n)
        genomes[acc] = seq
        lines.append(f">{acc} {desc}")
        lines.append(wrap(seq))
    for name, n in DUMMIES:
        seq = rand_dna(rng, n)
        genomes[name] = seq
        lines.append(f">{name}")
        lines.append(wrap(seq))
    with open(os.path.join(outdir, "example.fasta"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    # second DB for update/merge tests: a couple of extra accessions
    rng2 = random.Random(0xB5B)
    extra = [
        ("NR_136451.1", "Tertiimonas flava strain NSW-38", 2000),
        ("NR_136450.1", "Aquisphaera insulae strain TBA1", 1900),
    ]
    lines = []
    for acc, desc, n in extra:
        seq = rand_dna(rng2, n)
        genomes[acc] = seq
        lines.append(f">{acc} {desc}")
        lines.append(wrap(seq))
    with open(os.path.join(outdir, "example2.fasta"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return genomes


def mutate(rng, s, rate=0.02):
    out = []
    for c in s:
        r = rng.random()
        if r < rate:
            out.append(rng.choice("ACGT"))
        elif r < rate + 0.002:
            out.append("N")
        else:
            out.append(c)
    return "".join(out)


def make_reads(outdir, genomes):
    rng = random.Random(0xC0FFEE)
    accs = [a for a, _, _ in GENOMES]
    reads = []
    for i in range(300):
        if i % 10 == 9:
            seq = rand_dna(rng, rng.randrange(80, 160))
            src = "random"
        else:
            acc = rng.choice(accs)
            g = genomes[acc]
            ln = rng.randrange(80, min(220, len(g)))
            start = rng.randrange(0, len(g) - ln)
            seq = mutate(rng, g[start:start + ln])
            if rng.random() < 0.3:  # some reverse-complement reads
                comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
                seq = "".join(comp[c] for c in reversed(seq))
            src = acc
        reads.append((f"read_{i}_{src}", seq))

    with open(os.path.join(outdir, "reads.fastq"), "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(os.path.join(outdir, "reads.fasta"), "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    with gzip.open(os.path.join(outdir, "reads.fastq.gz"), "wt", compresslevel=6) as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")

    # a tiny input with multi-line fasta reads + very short reads (padding path)
    with open(os.path.join(outdir, "edge.fasta"), "w") as fh:
        fh.write(">tiny1\nACGT\n")
        fh.write(">longsplit\n" + wrap(genomes[accs[0]][:400], 50) + "\n")
        fh.write(">withN\nACGTNNNNACGTACGTACGTACGTACGTNACGTACGTACGTACGTACG\n")

    # paired-end: mates from the same genome region
    rng = random.Random(0xD00D)
    p1, p2 = [], []
    for i in range(120):
        acc = rng.choice(accs)
        g = genomes[acc]
        ln = 100
        start = rng.randrange(0, len(g) - 300)
        frag = g[start:start + 260]
        m1 = mutate(rng, frag[:ln])
        comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
        m2 = "".join(comp[c] for c in reversed(mutate(rng, frag[-ln:])))
        p1.append((f"pair_{i}/1", m1))
        p2.append((f"pair_{i}/2", m2))
    with open(os.path.join(outdir, "reads_1.fastq"), "w") as fh:
        for name, seq in p1:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(os.path.join(outdir, "reads_2.fastq"), "w") as fh:
        for name, seq in p2:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def make_protein(outdir):
    rng = random.Random(0xFEED)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    lines = []
    for acc, desc, n in GENOMES[:4]:
        seq = "".join(rng.choice(aas) for _ in range(n // 4))
        lines.append(f">{acc} {desc} [protein]")
        lines.append(wrap(seq))
    with open(os.path.join(outdir, "protein.fasta"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # protein reads
    reads = []
    for i in range(60):
        seq = "".join(rng.choice(aas) for _ in range(rng.randrange(25, 60)))
        reads.append((f"prot_read_{i}", seq))
    with open(os.path.join(outdir, "protein_reads.fasta"), "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "..", "fixtures"))
    args = ap.parse_args()
    outdir = os.path.abspath(args.outdir)
    os.makedirs(outdir, exist_ok=True)
    genomes = make_db(outdir)
    make_reads(outdir, genomes)
    make_protein(outdir)
    print(f"fixtures written to {outdir}")


if __name__ == "__main__":
    main()
