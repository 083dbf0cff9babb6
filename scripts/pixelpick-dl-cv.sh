#!/usr/bin/env bash
# Canonical CamVid benchmark (reference scripts/pixelpick-dl-cv.sh):
# DeepLabv3+ MobileNetV2, margin sampling, 10 px/img per round.
cd "$(dirname "$0")/.." && python3 main_al.py --dataset_name 'cv' --n_pixels_by_us 10 -qs "margin_sampling" "$@"
