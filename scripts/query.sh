#!/usr/bin/env bash
# Standalone acquisition from a trained checkpoint (reference scripts/query.sh).
cd "$(dirname "$0")/.." && python3 query.py "$@"
