#!/usr/bin/env bash
# One-shot day-1 runbook drill (REPRODUCE.md §1-§6): generates a fake
# on-disk Cityscapes, then runs the REAL CLI surface end to end —
# manifests -> short train -> resume -> ss + msf eval (+ prediction dump
# + submission remap) -> int8 recalibration on the val images with an
# argmax-agreement report.  When real data lands, the same commands run
# unchanged with the real roots (drop the drill-size overrides).
#
# Runs anywhere (defaults to the 8-device virtual CPU mesh so it cannot
# be blocked by a TPU-tunnel outage; set DRILL_TPU=1 to run the compute
# legs on the attached chip).  ~5-10 min on a small CPU host.
#
# Usage: scripts/runbook_drill.sh [workdir]
set -euo pipefail

WORK="${1:-$(mktemp -d /tmp/torchseg_drill.XXXX)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
EXP=cityscapes.bisenet.R18
HW=128   # fake image height (width 2x)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
cd "$REPO"

run_py() {  # run a python block on the drill backend (CPU mesh by default)
  JAX_PLATFORMS= python - "$@" <<PY
import os, sys
import jax
if not os.environ.get("DRILL_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
$(cat)
PY
}

echo "== drill workdir: $WORK =="

echo "== 0. generate fake Cityscapes (official on-disk layout) =="
python - "$WORK" "$HW" <<'PY'
import sys
from pathlib import Path

import cv2
import numpy as np

work, hw = Path(sys.argv[1]), int(sys.argv[2])
root = work / "cityscapes"
for split, n, seed in (("train", 8, 0), ("val", 4, 1)):
    rng = np.random.default_rng(seed)
    img_dir = root / "leftImg8bit" / split / "faketown"
    gt_dir = root / "gtFine" / split / "faketown"
    img_dir.mkdir(parents=True, exist_ok=True)
    gt_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        stem = f"faketown_{i:06d}_000019"
        img = rng.integers(0, 255, (hw, 2 * hw, 3)).astype(np.uint8)
        gt = rng.integers(0, 19, (hw, 2 * hw)).astype(np.uint8)
        gt[:4, :4] = 255  # ignore region
        assert cv2.imwrite(str(img_dir / f"{stem}_leftImg8bit.png"), img)
        assert cv2.imwrite(
            str(gt_dir / f"{stem}_gtFine_labelTrainIds.png"), gt)
print(f"fake cityscapes at {root}")
PY
ROOT="$WORK/cityscapes"

echo "== 1. manifests (torchseg-manifest) =="
python -m torchseg_tpu.tools.make_manifest cityscapes "$ROOT" \
    --split train --out "$WORK/cs_train.txt"
python -m torchseg_tpu.tools.make_manifest cityscapes "$ROOT" \
    --split val --out "$WORK/cs_val.txt"
head -2 "$WORK/cs_train.txt"

echo "== 2. short train (torchseg-train) =="
run_py <<PY2
from torchseg_tpu.train import main
main(["-e", "$EXP", "--img-root", "$ROOT",
      "--train-source", "$WORK/cs_train.txt",
      "--epochs", "1", "--iters", "2", "--batch-size", "8",
      "--crop", "64", "64", "--num-workers", "2",
      "--log-dir", "$WORK/log"])
PY2
test -L "$WORK/log/$EXP/snapshot/epoch-last.ckpt"

echo "== 2b. resume from the checkpoint (-c, one more epoch) =="
run_py <<PY2B
from torchseg_tpu.train import main
main(["-e", "$EXP", "--img-root", "$ROOT",
      "--train-source", "$WORK/cs_train.txt",
      "-c", "$WORK/log/$EXP/snapshot/epoch-last.ckpt",
      "--epochs", "2", "--iters", "2", "--batch-size", "8",
      "--crop", "64", "64", "--num-workers", "2",
      "--log-dir", "$WORK/log"])
PY2B

echo "== 3. ss eval + prediction dump + submission remap (torchseg-eval) =="
run_py <<PY3
from torchseg_tpu.eval import main
main(["-e", "$EXP", "--img-root", "$ROOT",
      "--eval-source", "$WORK/cs_val.txt",
      "--snapshot-dir", "$WORK/log/$EXP/snapshot", "--epochs", "last",
      "--eval-crop", "$HW", "--eval-base", "$HW",
      "-p", "$WORK/preds", "--submit", "$WORK/submit",
      "--log-dir", "$WORK/log"])
PY3
ls "$WORK"/preds | head -2
ls "$WORK"/submit | head -2
test -L "$WORK/log/$EXP/val_last.log"

echo "== 4. msf eval (multi-scale + flip) =="
run_py <<PY4
from torchseg_tpu.eval import main
main(["-e", "$EXP", "--img-root", "$ROOT",
      "--eval-source", "$WORK/cs_val.txt",
      "--snapshot-dir", "$WORK/log/$EXP/snapshot", "--epochs", "last",
      "--eval-crop", "$HW", "--eval-base", "$HW", "--msf",
      "--log-dir", "$WORK/log"])
PY4

echo "== 5. int8 recalibration on the val images + agreement =="
run_py <<PY5
import glob

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from torchseg_tpu.deploy.int8_serve import (
    build_int8_serving_for_experiment,
)
from torchseg_tpu.engine.checkpoint import restore_checkpoint
from torchseg_tpu.engine.trainer import TrainState
from torchseg_tpu.experiments.registry import build_model, get_experiment

cfg = get_experiment("$EXP")
model = build_model(cfg, axis_name=None, dtype=jnp.bfloat16)
rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
template = TrainState.create(
    model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True))
state, _, _ = restore_checkpoint(
    "$WORK/log/$EXP/snapshot/epoch-last.ckpt", template)
variables = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    {"params": state.params, "batch_stats": state.batch_stats})

val = sorted(glob.glob("$ROOT/leftImg8bit/val/*/*.png"))
imgs = [cv2.imread(p)[:, :, ::-1][None] for p in val]  # BGR->RGB, NHWC
infer, run_pkg, prepare, _ = build_int8_serving_for_experiment(
    cfg, model, variables, calib_images=imgs)

# bf16 reference arm on the same weights
@jax.jit
def bf16_infer(v, x):
    return jnp.argmax(model.apply(v, x, train=False), -1)

mean = np.asarray(cfg.image_mean, np.float32)
std = np.asarray(cfg.image_std, np.float32)
agrees = []
for u in imgs:
    p_i8 = np.asarray(infer(run_pkg, jnp.asarray(prepare(u))))
    xn = jnp.asarray((u.astype(np.float32) / 255 - mean) / std,
                     jnp.bfloat16)
    p_bf = np.asarray(bf16_infer(variables, xn))
    agrees.append((p_i8 == p_bf).mean())
agree = float(np.mean(agrees))
print(f"int8-through vs bf16 argmax agreement on {len(imgs)} val imgs: "
      f"{agree:.4f}")
assert agree > 0.9, agree
PY5

echo "== drill complete: $WORK =="
