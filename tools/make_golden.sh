#!/bin/bash
# Generate golden outputs from the reference kASA binary (prebuilt
# binaries/kASA_linux from the reference repo, copied to .golden_kASA).
# These are the parity targets for the TPU framework's tests.
set -e
cd "$(dirname "$0")/.."
BIN=./.golden_kASA
TAX=/root/reference/example/taxonomy
G=tests/golden
TMP=/tmp/kasa_tmp
mkdir -p $G $TMP

run() { "$BIN" "$@" > /dev/null 2>&1; }

# content file + index
run generateCF -c $G/exampleIndex_content.txt -i fixtures/example.fasta \
    -f $TAX/acc2tax/acc2Tax.txt -y $TAX/ -u species -n 1 -m 2 -t $TMP/ -x 1
run build -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/example.fasta \
    -n 1 -m 2 -t $TMP/ -x 2

# second index (for update/merge)
run generateCF -c $G/index2_content.txt -i fixtures/example2.fasta \
    -f $TAX/acc2tax/acc2Tax.txt -y $TAX/ -u species -n 1 -m 2 -t $TMP/ -x 11
run build -c $G/index2_content.txt -d $G/index2 -i fixtures/example2.fasta \
    -n 1 -m 2 -t $TMP/ -x 12

# identify: default k [7,12], json + profile
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_identify.json -p $G/reads_profile.csv -n 1 -m 2 -t $TMP/ -x 3
# tsv + jsonl + kraken
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_identify.tsv -p $G/reads_profile_tsv.csv --tsv -n 1 -m 2 -t $TMP/ -x 4
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_identify.jsonl --jsonl -n 1 -m 2 -t $TMP/ -x 5
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_identify.ktsv --kraken -n 1 -m 2 -t $TMP/ -x 6
# single k
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_k12.json -p $G/reads_k12_profile.csv -k 12 12 -n 1 -m 2 -t $TMP/ -x 7
# six frames
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_six.json -p $G/reads_six_profile.csv --six -n 1 -m 2 -t $TMP/ -x 8
# one frame
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_one.json -p $G/reads_one_profile.csv --one -n 1 -m 2 -t $TMP/ -x 9
# unique (-e)
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_unique.json -p $G/reads_unique_profile.csv -e -n 1 -m 2 -t $TMP/ -x 10
# fasta input
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fasta \
    -q $G/reads_fasta.json -p $G/reads_fasta_profile.csv -n 1 -m 2 -t $TMP/ -x 13
# gzipped input
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq.gz \
    -q $G/reads_gz.json -n 1 -m 2 -t $TMP/ -x 14
# paired-end
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex \
    -1 fixtures/reads_1.fastq -2 fixtures/reads_2.fastq \
    -q $G/reads_paired.json -p $G/reads_paired_profile.csv -n 1 -m 2 -t $TMP/ -x 15
# edge cases (tiny/multiline/N reads)
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/edge.fasta \
    -q $G/edge.json -p $G/edge_profile.csv -n 1 -m 2 -t $TMP/ -x 16
# coverage
run identify -c $G/exampleIndex_content.txt -d $G/exampleIndex -i fixtures/reads.fastq \
    -q $G/reads_cov.json -p $G/reads_cov_profile.csv --coverage -n 1 -m 2 -t $TMP/ -x 17
# translate mode
run translate -i fixtures/reads.fastq -o $G/reads_translated.fastq -n 1 -m 2 -t $TMP/ -x 18

echo "golden outputs in $G:"
ls $G

# dev modes: transform (CSR re-encoding) + fuckit (spaced-seed re-encoding)
run transform -d $G/exampleIndex -o $G/transformed -n 1 -m 2 -t $TMP/ -x 30
run fuckit -c $G/exampleIndex_content.txt -d $G/exampleIndex -o $G/fuckedIndex \
    -n 1 -m 2 -t $TMP/fk -x 31

# --visualize debug output (stdout minus OUT: lines), single read
head -4 fixtures/reads.fastq > fixtures/one_read.fastq
"$BIN" identify -c $G/exampleIndex_content.txt -d $G/exampleIndex \
    -i fixtures/one_read.fastq -q /dev/null --visualize -n 1 -m 2 -t $TMP/ -x 32 \
    2>/dev/null | grep -v "^OUT:" > $G/visualize_one_read.txt
