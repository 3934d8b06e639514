#!/usr/bin/env bash
# Round-4 chip A/B: fused upsample+loss gate (ops/losses.FUSED_UPSAMPLE_LOSS)
# across every training config family, at the one-chip A/B protocol
# (bs2, the experiment's training crop, bf16, 10-step chain).
#
# Usage: bash scripts/ab_fused_loss.sh [outfile]
# Writes one "<exp> <arm> <ms/step>" line per run; transcribe into
# docs/DESIGN.md's A/B table.
set -u
OUT="${1:-/tmp/ab_fused.log}"
: > "$OUT"
run() {
  exp="$1"; shift
  for arm in --no-fused-loss --fused-loss; do
    echo "=== $exp $arm $* ===" | tee -a "$OUT"
    timeout 900 python -m torchseg_tpu.tools.train_speed -e "$exp" \
      --batch-size 2 --bf16 --steps 10 --reps 3 $arm "$@" 2>&1 \
      | grep -E "ms/step|compile|Error|error" | tee -a "$OUT"
  done
}
run cityscapes.bisenet.R18
run cityscapes.bisenet.R101
run cityscapes.bisenet.X39
run cityscapes.dfn.R101_v1c
run voc.dfn.R101_v1c
run voc.fcn32s.R101_v1c
run ade.pspnet.R101_v1c
run ade.psanet.R101_v1c
echo "DONE" | tee -a "$OUT"
