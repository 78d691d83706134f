#!/usr/bin/env bash
# Fetch the prepared HDF5 medium-scale GNN benchmarking datasets (PATTERN, CLUSTER,
# MNIST, CIFAR10, TSP, ZINC, ZINC-full) — same Zenodo record the reference uses
# (reference: download_medium_scale_datasets.sh:1-7, zenodo record 5500978).
set -euo pipefail
URL="https://zenodo.org/record/5500978/files/datasets.tar.gz?download=1"
echo "Downloading datasets.tar.gz ..."
curl -L "$URL" -o datasets.tar.gz
echo "Extracting ..."
tar -xvf datasets.tar.gz
echo "Done. Datasets under ./datasets/<NAME>/<NAME>.h5"
