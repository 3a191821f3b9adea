#!/bin/bash
# The stamps metagenome walkthrough, khmer_tpu edition: count ->
# abundance histograms -> digital normalization -> partitioning ->
# error correction -> per-partition analysis. Mirrors the reference
# examples/stamps pipeline stage for stage on the same data.
set -e
set -x

SCRIPTS=../../scripts
SANDBOX=../../sandbox
DATA=../../data

python $SCRIPTS/load-into-counting.py -x 1e8 -k 20 stamps-reads.ct \
    $DATA/stamps-reads.fa.gz
python $SCRIPTS/abundance-dist.py stamps-reads.ct \
    $DATA/stamps-reads.fa.gz stamps-reads.hist
python $SCRIPTS/normalize-by-median.py -k 20 -C 10 -x 1e8 \
    $DATA/stamps-reads.fa.gz --savegraph stamps-dn.ct
python $SCRIPTS/abundance-dist.py stamps-dn.ct stamps-reads.fa.gz.keep \
    stamps-dn.hist
python $SCRIPTS/do-partition.py -k 32 -x 1e8 -s 1e4 -T 8 stamps-part \
    $DATA/stamps-reads.fa.gz
python $SANDBOX/error-correct-pass2.py --trusted-cov 10 stamps-dn.ct \
    $DATA/stamps-reads.fa.gz
python $SCRIPTS/load-into-counting.py -x 1e8 -k 20 stamps-corr.ct \
    stamps-reads.fa.gz.corr
python $SCRIPTS/abundance-dist.py stamps-corr.ct stamps-reads.fa.gz.corr \
    stamps-corr.hist
python $SCRIPTS/extract-partitions.py stamps-part stamps-reads.fa.gz.part
python $SCRIPTS/extract-partitions.py -X 1 stamps-part \
    stamps-reads.fa.gz.part
python $SCRIPTS/load-into-counting.py -x 1e8 -k 20 stamps-part.g0.ct \
    stamps-part.group0000.fa
python $SCRIPTS/load-into-counting.py -x 1e8 -k 20 stamps-part.g1.ct \
    stamps-part.group0001.fa
python $SCRIPTS/abundance-dist.py stamps-part.g0.ct \
    stamps-part.group0000.fa stamps-part.g0.hist
python $SCRIPTS/abundance-dist.py stamps-part.g1.ct \
    stamps-part.group0001.fa stamps-part.g1.hist
python $SCRIPTS/filter-abund.py stamps-dn.ct stamps-reads.fa.gz.keep
python $SCRIPTS/normalize-by-median.py -x 1e8 -k 20 -C 10 \
    stamps-reads.fa.gz.keep.abundfilt --savegraph stamps-dn3.ct
python $SCRIPTS/abundance-dist.py stamps-dn3.ct \
    stamps-reads.fa.gz.keep.abundfilt.keep stamps-dn3.hist
