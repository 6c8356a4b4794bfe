#!/usr/bin/env bash
# Smoke run — the reference's scripts/doit.sh / run_this.sh role: one CCD and
# one ALS training with golden validation on a small synthetic set.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m cuda_recommender_tpu.cli.train --dataset synthetic:m=6040,n=3706,nnz=900000 \
    -k 10 -t 5 -l 0.05 -OMP
python -m cuda_recommender_tpu.cli.train --dataset synthetic:m=6040,n=3706,nnz=900000 \
    -ALS -k 5 -t 5 -l 0.05 -OMP
