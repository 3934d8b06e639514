"""Tools tests: stats table + XLA FLOPs totals, and the speed harness on a
tiny model (CPU)."""

import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from torchseg_tpu.tools.stats import model_stats
from torchseg_tpu.tools.speed import compute_speed
from torchseg_tpu.ops.blocks import ConvBnRelu


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(8, 3, 1, 1, name="c1")(x, train)
        return nn.Conv(4, (1, 1), name="out")(x)


def test_model_stats():
    table, totals = model_stats(Tiny(), (1, 16, 16, 3))
    assert "c1" in table
    # conv 3x3x3x8 + bn(2*8) + conv 1x1x8x4 + bias 4
    assert totals["params"] == 216 + 16 + 32 + 4
    assert totals["flops"] > 0


def test_compute_speed_runs():
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                           train=True)
    res = compute_speed(model, variables, (1, 16, 16, 3), chain=4, reps=1)
    assert res["fps"] > 0


def test_speed_deploy_guard_rejects_non_bisenet():
    """--deploy requires the classic-stem BiSeNet param layout; anything
    else must exit with an actionable message, not a KeyError."""

    from torchseg_tpu.tools.speed import main as speed_main

    with pytest.raises(SystemExit, match="classic-stem BiSeNet"):
        speed_main(["-e", "ade.pspnet.R50_v1c", "--input-size", "1x64x64x3",
                    "--chain", "1", "--reps", "1", "--deploy"])


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_collect_op_times_cpu_fallback():
    """The per-op runtime report (the reference stat tool's duration table,
    reporter.py:22-93) must work on the CPU backend too: thunk events stand
    in for the TPU's 'XLA Ops' line."""
    from torchseg_tpu.tools.profile import collect_op_times, top_ops_table

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=True)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.zeros((1, 32, 32, 3))
    _, ops = collect_op_times(fwd, variables, x, runs=2)
    assert ops, "no op events parsed from the xplane"
    assert any("conv" in nm for nm in ops), sorted(ops)
    table = top_ops_table(ops, n=5)
    assert "ms" in table and "%" in table
    # formatted rows: at most 5 + header + total
    assert len(table.splitlines()) <= 7


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_speed_summary_prints_op_table(capsys):
    """eval --summary path: params/FLOPs AND the top-op table."""
    from torchseg_tpu.tools.speed import main as speed_main

    speed_main(["-e", "cityscapes.bisenet.R18.speed",
                "--input-size", "1x64x128x3", "--chain", "2", "--reps", "1"])
    speed_main(["-e", "cityscapes.bisenet.R18.speed", "--summary",
                "--input-size", "1x64x128x3", "--chain", "2", "--reps", "1"])
    out = capsys.readouterr().out
    assert "total params" in out
    assert "top ops @" in out
    assert "conv" in out


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_train_speed_memory_only(capsys):
    """--memory-only compiles the train step AOT and reports XLA's
    per-device memory analysis without executing."""
    from torchseg_tpu.tools.train_speed import main

    res = main(["-e", "cityscapes.bisenet.R18", "--crop", "64", "64",
                "--batch-size", "8", "--steps", "1", "--memory-only"])
    mem = res["memory"]
    assert mem["temp_size_in_bytes"] > 0
    assert mem["argument_size_in_bytes"] > 0
    assert "high-water" in capsys.readouterr().out


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_roofline_forward_and_train(capsys):
    """Roofline analysis lowers both graphs and reports positive FLOPs,
    bytes, and speed-of-light bounds."""
    from torchseg_tpu.tools.roofline import main

    res = main(["-e", "cityscapes.bisenet.R18.speed",
                "--input-size", "1x64x128x3", "--measured-ms", "1.0"])
    assert res["flops"] > 0 and res["bytes"] > 0
    assert res["sol_ms"] > 0 and 0 < res["sol_fraction"] < 1
    out = capsys.readouterr().out
    assert "speed-of-light" in out and "roofline" in out

    res_t = main(["-e", "cityscapes.bisenet.R18", "--train",
                  "--batch-size", "1", "--crop", "64", "64"])
    assert res_t["flops"] > res["flops"]  # bwd ~2x fwd even at tiny crop
