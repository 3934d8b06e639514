#!/usr/bin/env bash
# Re-run fused-loss A/B arms that are missing a "ms/step" result in the
# sweep log (compile timeouts under host contention).  Longer timeout, one
# at a time; the persistent compile cache makes repeated attempts cheap.
#
# Usage: bash scripts/ab_fill_gaps.sh [sweep_log] [outfile]
set -u
LOG="${1:-/tmp/ab_fused.log}"
OUT="${2:-/tmp/ab_fused_fill.log}"
: > "$OUT"
EXPS="cityscapes.bisenet.R18 cityscapes.bisenet.R101 cityscapes.bisenet.X39 \
cityscapes.dfn.R101_v1c voc.dfn.R101_v1c voc.fcn32s.R101_v1c \
ade.pspnet.R101_v1c ade.psanet.R101_v1c"
for exp in $EXPS; do
  for arm in --no-fused-loss --fused-loss; do
    # already measured? (result line follows the header somewhere in LOG)
    if awk -v e="=== $exp $arm" '
        index($0, e) {inarm=1; next}
        /^===/ {inarm=0}
        inarm && /ms\/step/ {found=1}
        END {exit !found}' "$LOG" 2>/dev/null; then
      echo "have: $exp $arm" | tee -a "$OUT"
      continue
    fi
    echo "=== $exp $arm ===" | tee -a "$OUT"
    timeout 2400 python -m torchseg_tpu.tools.train_speed -e "$exp" \
      --batch-size 2 --bf16 --steps 10 --reps 3 $arm 2>&1 \
      | grep -E "ms/step|compile|Error|error" | tee -a "$OUT"
  done
done
echo "DONE" | tee -a "$OUT"
