"""REAL 2-process multi-host validation on the CPU backend: two OS processes
join through jax.distributed.initialize (gloo over localhost), build one
global 4-device mesh, and run the actual Trainer / shard_batch / Evaluator /
gather_metrics paths — the machinery a TPU pod uses, minus the ICI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md


def test_two_process_training_and_eval_gather():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "9733"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        payload = [l for l in out.splitlines() if l.startswith("{")]
        assert payload, (out, err[-1000:])
        outs.append(json.loads(payload[-1]))

    a, b = sorted(outs, key=lambda d: d["pid"])
    # the pmean'd loss is identical on both processes, and training learns
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=1e-6)
    assert a["losses"][-1] < a["losses"][0]
    # eval sharding: each process saw only part of the 6-image dataset,
    # the allgather-merged accumulator covers all of it
    n_pix = 6 * 8 * 8
    assert a["local_pixels"] + b["local_pixels"] == n_pix
    assert 0 < a["local_pixels"] < n_pix
    assert a["merged_pixels"] == b["merged_pixels"] == n_pix

    # dp2 x sp2 leg (GSPMD SpatialTrainer over the cross-process mesh):
    # both processes agree on every loss and the loss decreases
    np.testing.assert_allclose(a["sp_losses"], b["sp_losses"], rtol=1e-6)
    assert len(a["sp_losses"]) >= 4
    assert a["sp_losses"][-1] < a["sp_losses"][0]
