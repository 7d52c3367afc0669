#!/usr/bin/env bash
# Full replication driver (reference run_all.sh).
set -e
cd "$(dirname "$0")"
bash create_data.sh
bash fig3.sh
bash run_dim.sh
bash run_noise_level.sh
bash fig6.sh
bash fig7.sh
bash fig9.sh
