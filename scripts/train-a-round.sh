#!/usr/bin/env bash
# One training round, resuming from human-labelled query files under
# --dir_checkpoints (reference scripts/train-a-round.sh).
cd "$(dirname "$0")/.." && python3 train.py "$@"
