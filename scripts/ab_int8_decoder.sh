#!/usr/bin/env bash
# Round-4 chip A/B: int8-through DECODER gate (build_int8_package
# decoder='int8') vs the default bf16 decoder, on both classic-stem
# BiSeNet bodies at their serving protocols.
#
# Usage: bash scripts/ab_int8_decoder.sh [outfile]
set -u
OUT="${1:-/tmp/ab_int8_dec.log}"
: > "$OUT"
run() {
  exp="$1"; size="$2"; shift 2
  for arm in "" "--int8-decoder"; do
    echo "=== $exp $size int8-through $arm ===" | tee -a "$OUT"
    timeout 1800 python -m torchseg_tpu.tools.speed -e "$exp" \
      --input-size "$size" --chain 300 --reps 3 --int8-through $arm 2>&1 \
      | grep -E "ms/iter|FPS|fps|Error|error" | tee -a "$OUT"
  done
}
run cityscapes.bisenet.R18.speed 1x1024x2048x3
run cityscapes.bisenet.X39.speed 1x768x1536x3
echo "DONE" | tee -a "$OUT"
