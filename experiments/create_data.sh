#!/usr/bin/env bash
# Build all seed-666 cohorts (replaces generated_data/*.py + create_data.sh).
set -e
cd "$(dirname "$0")/.."
python -m hybridode.cli.create_data --which all --out data/
