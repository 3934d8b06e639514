"""BatchNorm parity with torch.nn.BatchNorm2d, plus SyncBN equivalence:
stats synced across an 8-device mesh must equal single-device global BN."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import torch
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from torchseg_tpu.ops.norm import BatchNorm


def _torch_bn_step(x_nhwc, n_steps=3, momentum=0.1, eps=1e-5):
    bn = torch.nn.BatchNorm2d(x_nhwc.shape[-1], eps=eps, momentum=momentum)
    bn.train()
    outs = []
    for _ in range(n_steps):
        xt = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
        outs.append(bn(xt).permute(0, 2, 3, 1).detach().numpy())
    bn.eval()
    xt = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    eval_out = bn(xt).permute(0, 2, 3, 1).detach().numpy()
    return outs, eval_out, bn.running_mean.numpy(), bn.running_var.numpy()


def test_train_eval_matches_torch():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(4, 6, 6, 8)) * 2 + 1).astype(np.float32)

    bn = BatchNorm(momentum=0.1, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    params, stats = variables["params"], variables["batch_stats"]

    train_outs = []
    for _ in range(3):
        out, updated = bn.apply(
            {"params": params, "batch_stats": stats},
            x,
            use_running_average=False,
            mutable=["batch_stats"],
        )
        stats = updated["batch_stats"]
        train_outs.append(np.asarray(out))
    eval_out = np.asarray(
        bn.apply(
            {"params": params, "batch_stats": stats},
            x,
            use_running_average=True,
        )
    )

    t_outs, t_eval, t_mean, t_var = _torch_bn_step(x)
    for got, want in zip(train_outs, t_outs):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(stats["mean"], t_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"], t_var, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(eval_out, t_eval, rtol=1e-4, atol=1e-4)


def test_syncbn_equals_global_bn():
    """BN with axis_name inside shard_map over 8 devices == BN over the full
    batch on one device (the legacy SyncBN spec, syncbn.py:42-52)."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must force 8 host devices"
    mesh = Mesh(np.array(devices[:8]), ("data",))

    rng = np.random.default_rng(1)
    x = (rng.normal(size=(16, 4, 4, 8)) * 3 - 1).astype(np.float32)

    sync_bn = BatchNorm(momentum=0.1, axis_name="data")
    variables = sync_bn.init(
        jax.random.PRNGKey(0), x[:2], use_running_average=False
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
    )
    def sharded_apply(variables, xs):
        out, upd = sync_bn.apply(
            variables, xs, use_running_average=False, mutable=["batch_stats"]
        )
        return out, upd["batch_stats"]

    out_sync, stats_sync = jax.jit(sharded_apply)(variables, x)

    plain_bn = BatchNorm(momentum=0.1)
    out_ref, upd_ref = plain_bn.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )

    np.testing.assert_allclose(
        np.asarray(out_sync), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sync["mean"]),
        np.asarray(upd_ref["batch_stats"]["mean"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stats_sync["var"]),
        np.asarray(upd_ref["batch_stats"]["var"]),
        rtol=1e-4,
        atol=1e-6,
    )
