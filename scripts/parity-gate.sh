#!/usr/bin/env bash
# Accuracy parity gate: CamVid MobileNetV2, margin sampling, 20 px/img
# -> 50.8 +/- 0.2 mIoU (reference README.md:63; BASELINE.md CamVid table).
#
# Runs the moment real data + pretrained weights are available:
#   CAMVID=/path/to/camvid ./scripts/parity-gate.sh          # full gate
#   CAMVID=... SEEDS="0 1 2 3 4" ./scripts/parity-gate.sh    # 5-seed protocol
#
# Expects under $CAMVID: train/ trainannot/ val/ valannot/ (SegNet-CamVid
# layout, 367 train / 233 val masks 0..10 + 11=void, 360x480 — the layout
# datasets/camvid.py:27-32 reads). Pretrained MobileNetV2 ImageNet weights
# are fetched+converted automatically (egress-gated; pre-place the .pth in
# ~/.cache/pixelpick_tpu/ when offline — see models/convert.py).
#
# The gate defaults to the REFERENCE schedule: f32, batch 4 (args.py:109),
# ~92 optimizer steps/epoch — the full reference optimization trajectory,
# so a miss can only implicate the framework, never the batch size.
#
# MEGA=1 runs the SAME schedule as a megabatch scan (--batch_size 48
# --micro_batch_size 4, engine/trainer.py:make_microbatch_train_step):
# twelve sequential bs-4 Adam updates per dispatch — update-for-update the
# bs4 trajectory (bit-equal modulo XLA reassociation,
# tests/test_train_step.py; campaign curve inside the bs4 seed band,
# scripts/bs_equivalence.py arm bs48_micro4_megabatch) at a fraction of
# the dispatch overhead. This is the recommended way to run the gate on
# the tunnelled single-chip stack.
#
# FAST=1 is the post-gate THROUGHPUT config (bf16, one bs-48 update/step
# + ghost BN): NOT trajectory-faithful (PARITY.md, BS_EQUIV_r04) — use for
# speed once the gate has passed. An explicit GATE_ARGS beats both.
# Budget: 20 px = 2 rounds of 10 px.
set -euo pipefail
cd "$(dirname "$0")/.."

CAMVID="${CAMVID:-/datasets/camvid}"
SEEDS="${SEEDS:-0}"
TARGET="${TARGET:-50.8}"
TOL="${TOL:-0.2}"
CKPT_DIR="${CKPT_DIR:-./checkpoints}"
FAST_ARGS="--precision bf16 --batch_size 48 --bn_group_size 4 --device_augment"
MEGA_ARGS="--batch_size 48 --micro_batch_size 4 --device_augment"
if [ -n "${FAST:-}" ]; then
  GATE_ARGS="${GATE_ARGS:-$FAST_ARGS}"
elif [ -n "${MEGA:-}" ]; then
  GATE_ARGS="${GATE_ARGS:-$MEGA_ARGS}"
else
  GATE_ARGS="${GATE_ARGS:---batch_size 4}"
fi

if [ ! -d "$CAMVID/train" ] || [ ! -d "$CAMVID/trainannot" ]; then
  echo "parity-gate: CamVid not found at $CAMVID (need train/ trainannot/" \
       "val/ valannot/). Set CAMVID=/path/to/camvid." >&2
  exit 2
fi

MNV2="$CKPT_DIR/mobilenet_v2_imagenet.ckpt"
if [ ! -f "$MNV2" ]; then
  mkdir -p "$CKPT_DIR"
  python -m pixelpick_tpu.models.convert --fetch mobilenet_v2 "$MNV2"
fi

mious=()
for seed in $SEEDS; do
  echo "=== parity run, seed $seed ==="
  python main_al.py --dataset_name cv --dir_datasets "$(dirname "$CAMVID")" \
    --n_pixels_by_us 10 --max_budget 20 -qs margin_sampling \
    --seed "$seed" --pretrained_ckpt "$MNV2" \
    --dir_root . $GATE_ARGS
  # best val mIoU of the final round (the 20-px model) from its log
  last_log=$(ls -d "$CKPT_DIR"/cv_deeplab_margin_sampling_10_*"${seed}"*/1_query/log_val.txt | tail -1)
  miou=$(python - "$last_log" <<'EOF'
import sys
rows = [l.split(",") for l in open(sys.argv[1]) if not l.startswith("epoch")]
print(max(float(r[1]) for r in rows) * 100)
EOF
  )
  echo "seed $seed: best mIoU $miou"
  mious+=("$miou")
done

python - "$TARGET" "$TOL" "${mious[@]}" <<'EOF'
import sys
target, tol = float(sys.argv[1]), float(sys.argv[2])
vals = [float(v) for v in sys.argv[3:]]
mean = sum(vals) / len(vals)
print(f"parity gate: mean mIoU {mean:.2f} over {len(vals)} seed(s); "
      f"target {target} +/- {tol}")
if mean < target - tol:
    print("PARITY GATE FAILED")
    sys.exit(1)
print("PARITY GATE PASSED")
EOF
