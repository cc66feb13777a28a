#!/usr/bin/env bash
# Round-3 artifact packaging: export the chosen stage checkpoint per
# family to an HF-style dir in artifacts/, then emit + numerically gate
# its ONNX deployment artifact (pure-numpy evaluator when onnxruntime is
# absent — convert/onnx_eval.py).
#
#   bash tools/package_r3.sh r3_4x_gan   mewzoom-tpu-4x-ctrl
#   bash tools/package_r3.sh r3_unet_polish mewzoom-tpu-2x-unet bfloat16
set -euo pipefail
cd "$(dirname "$0")/.."

CK="${1:?trainer checkpoint name under checkpoints/}"
NAME="${2:?artifact dir name under artifacts/}"
DTYPE="${3:-float32}"   # bfloat16 halves the flagship artifact

python -m ultrazoom_tpu.tools.export \
  --checkpoint_path "checkpoints/$CK" \
  --output_path "artifacts/$NAME" --dtype "$DTYPE"
python -m ultrazoom_tpu.tools.export_onnx \
  --model_path "artifacts/$NAME" --out "artifacts/$NAME/model.onnx" \
  --reference_src /root/reference
echo "packaged artifacts/$NAME from checkpoints/$CK ($DTYPE)"
