"""Loss parity tests against torch oracles implementing the documented
reference semantics (SURVEY.md §2.1 loss rows)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from torchseg_tpu.ops.losses import (
    cross_entropy_with_ignore,
    prob_ohem_cross_entropy,
    sigmoid_focal_loss_border,
    CITYSCAPES_CLASS_WEIGHTS,
)


def _rand_scores_labels(rng, b=2, h=8, w=8, c=5, ignore=255, frac_ignore=0.2):
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w))
    mask = rng.random(size=(b, h, w)) < frac_ignore
    labels = np.where(mask, ignore, labels).astype(np.int32)
    return scores, labels


def test_ce_matches_torch():
    rng = np.random.default_rng(0)
    scores, labels = _rand_scores_labels(rng)
    got = float(cross_entropy_with_ignore(scores, labels, 255))
    want = F.cross_entropy(
        torch.from_numpy(scores).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=255,
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_ce_weighted_matches_torch():
    rng = np.random.default_rng(1)
    scores, labels = _rand_scores_labels(rng, c=19)
    got = float(
        cross_entropy_with_ignore(
            scores, labels, 255, class_weights=CITYSCAPES_CLASS_WEIGHTS
        )
    )
    want = F.cross_entropy(
        torch.from_numpy(scores).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        weight=torch.from_numpy(CITYSCAPES_CLASS_WEIGHTS),
        ignore_index=255,
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_ce_negative_ignore_label():
    # ADE uses ignore_label = -1 (labels shifted by -1 in the loader)
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(2, 4, 4, 150)).astype(np.float32)
    labels = rng.integers(-1, 150, size=(2, 4, 4)).astype(np.int32)
    got = float(cross_entropy_with_ignore(scores, labels, -1))
    want = F.cross_entropy(
        torch.from_numpy(scores).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=-1,
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def _ohem_torch_oracle(scores, labels, ignore, thresh, min_kept):
    """Independent torch implementation of the OHEM spec from SURVEY.md:
    keep pixels whose GT-class prob <= max(thresh, kth-smallest prob)."""
    pred = torch.from_numpy(scores).permute(0, 3, 1, 2)
    target = torch.from_numpy(labels).long()
    b, c, h, w = pred.shape
    tflat = target.view(-1)
    valid = tflat.ne(ignore)
    num_valid = valid.sum().item()
    tsafe = tflat * valid.long()
    prob = F.softmax(pred, dim=1).permute(1, 0, 2, 3).reshape(c, -1)
    if min_kept > num_valid:
        pass  # no filtering
    elif num_valid > 0:
        prob = prob.masked_fill(~valid, 1.0)
        gt_prob = prob[tsafe, torch.arange(len(tsafe))]
        threshold = thresh
        if min_kept > 0:
            _, index = torch.sort(gt_prob)
            threshold_index = index[min(len(index), min_kept) - 1]
            if gt_prob[threshold_index] > thresh:
                threshold = gt_prob[threshold_index].item()
            kept = gt_prob.le(threshold)
            tsafe = tsafe * kept.long()
            valid = valid * kept
    tfinal = tsafe.masked_fill(~valid, ignore).view(b, h, w)
    return F.cross_entropy(pred, tfinal, ignore_index=ignore).item()


@pytest.mark.parametrize("min_kept", [0, 8, 50, 100000])
@pytest.mark.parametrize("thresh", [0.3, 0.7])
def test_ohem_matches_oracle(min_kept, thresh):
    rng = np.random.default_rng(min_kept + int(thresh * 10))
    scores, labels = _rand_scores_labels(rng, b=2, h=8, w=8, c=7)
    got = float(
        prob_ohem_cross_entropy(
            scores, labels, 255, thresh=thresh, min_kept=min_kept
        )
    )
    want = _ohem_torch_oracle(scores, labels, 255, thresh, min_kept)
    assert got == pytest.approx(want, rel=1e-4)


def test_ohem_all_ignored_is_finite():
    scores = np.zeros((1, 4, 4, 3), np.float32)
    labels = np.full((1, 4, 4), 255, np.int32)
    got = float(prob_ohem_cross_entropy(scores, labels, 255, min_kept=4))
    assert np.isfinite(got)


def _focal_torch_oracle(pred, target, ignore, gamma, alpha):
    """Torch implementation of the reference formula (loss_opr.py:14-45)."""
    pred_t = torch.from_numpy(pred).permute(0, 3, 1, 2)
    target_t = torch.from_numpy(target)
    b, _, h, w = pred_t.shape
    p = pred_t.reshape(b, -1, 1)
    s = p.sigmoid()
    t = target_t.view(b, -1).float()
    mask = t.ne(ignore).float()
    t = mask * t
    onehot = t.view(b, -1, 1)
    max_val = (-s).clamp(min=0)
    pos = (1 - s) ** gamma * (s - s * onehot)
    neg = s**gamma * (max_val + ((-max_val).exp() + (-s - max_val).exp()).log())
    loss = -(alpha * pos + (1 - alpha) * neg).sum(dim=-1) * mask
    return loss.mean().item()


def test_focal_matches_oracle():
    rng = np.random.default_rng(5)
    pred = rng.normal(size=(2, 8, 8, 1)).astype(np.float32) * 3
    target = rng.integers(0, 2, size=(2, 8, 8))
    target = np.where(rng.random(size=target.shape) < 0.3, 255, target).astype(
        np.int32
    )
    got = float(sigmoid_focal_loss_border(pred, target, 255))
    want = _focal_torch_oracle(pred, target, 255, 2.0, 0.25)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_ohem_histogram_threshold_close_to_exact():
    import jax.numpy as jnp
    from torchseg_tpu.ops.losses import _kth_smallest_histogram

    rng = np.random.default_rng(9)
    vals = rng.random(100000).astype(np.float32)
    for k in (1, 100, 50000, 99999):
        approx = float(_kth_smallest_histogram(jnp.asarray(vals), k))
        exact = float(np.sort(vals)[k - 1])
        assert exact <= approx <= exact + 1e-5, (k, exact, approx)
        # at least k values fall under the approx threshold
        assert (vals <= approx).sum() >= k


def test_ohem_approx_matches_exact_loss():
    rng = np.random.default_rng(10)
    scores, labels = _rand_scores_labels(rng, b=2, h=16, w=16, c=7)
    exact = float(
        prob_ohem_cross_entropy(scores, labels, 255, thresh=0.7, min_kept=64)
    )
    approx = float(
        prob_ohem_cross_entropy(
            scores, labels, 255, thresh=0.7, min_kept=64,
            approx_threshold=True,
        )
    )
    assert approx == pytest.approx(exact, rel=2e-2)


def test_registry_loss_builders_cover_variants():
    """Loss builders: weighted OHEM knob and the FCN lr-world-scale flag."""
    import dataclasses
    import jax.numpy as jnp
    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        get_experiment,
    )

    cfg = get_experiment("cityscapes.bisenet.R18")
    cfg = dataclasses.replace(cfg, image_height=8, image_width=8,
                              batch_size=2, ohem_use_weight=True)
    loss_fn = build_loss_fn(cfg, num_shards=1)
    rng = np.random.default_rng(0)
    outs = {k: jnp.asarray(rng.normal(size=(2, 8, 8, 19)).astype(np.float32))
            for k in ("aux0", "aux1", "main")}
    batch = {"label": jnp.asarray(
        rng.integers(0, 19, size=(2, 8, 8)).astype(np.int32))}
    weighted = float(loss_fn(outs, batch))
    cfg2 = dataclasses.replace(cfg, ohem_use_weight=False)
    unweighted = float(build_loss_fn(cfg2, num_shards=1)(outs, batch))
    assert np.isfinite(weighted) and np.isfinite(unweighted)
    assert weighted != unweighted  # class weights change the loss

    fcn = get_experiment("voc.fcn32s.R101_v1c")
    assert fcn.lr_scale_by_world and fcn.business_lr_mult == 1.0


def test_dfn_border_ignore_label_config_driven():
    """border_ignore_label must reach the focal loss: remapping the aux
    labels' ignore value and the config together must give the same loss,
    while changing only the config must not."""
    import dataclasses
    import jax.numpy as jnp
    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        get_experiment,
    )

    cfg = get_experiment("cityscapes.dfn.R101_v1c")
    cfg = dataclasses.replace(cfg, image_height=8, image_width=8, batch_size=2)
    rng = np.random.default_rng(1)
    outs = {
        "smooth": [jnp.asarray(
            rng.normal(size=(2, 8, 8, 19)).astype(np.float32))
            for _ in range(4)],
        "border": [jnp.asarray(
            rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
            for _ in range(4)],
    }
    aux = rng.integers(0, 2, size=(2, 8, 8)).astype(np.int32)
    aux[0, :2] = 255  # ignored border pixels under the default convention
    label = rng.integers(0, 19, size=(2, 8, 8)).astype(np.int32)
    base = float(build_loss_fn(cfg, 1)(
        outs, {"label": jnp.asarray(label), "aux_label": jnp.asarray(aux)}
    ))

    # same data with ignore spelled as 7: must match once configured ...
    aux7 = np.where(aux == 255, 7, aux)
    cfg7 = dataclasses.replace(cfg, border_ignore_label=7)
    got = float(build_loss_fn(cfg7, 1)(
        outs, {"label": jnp.asarray(label), "aux_label": jnp.asarray(aux7)}
    ))
    assert got == pytest.approx(base, rel=1e-6)
    # ... and differ when the config still says 255 (7 treated as a class)
    mismatched = float(build_loss_fn(cfg, 1)(
        outs, {"label": jnp.asarray(label), "aux_label": jnp.asarray(aux7)}
    ))
    assert mismatched != pytest.approx(base, rel=1e-6)


def test_losses_lower_gather_free():
    """Perf regression guard: XLA lowers (N, C) row-gathers to a kCustom
    dynamic-gather that cost 29 ms/head on v5e (docs/DESIGN.md round 2).
    The losses must lower without any gather primitive."""
    import jax
    import jax.numpy as jnp

    def _prims(jaxpr, acc):
        for eqn in jaxpr.eqns:
            acc.add(eqn.primitive.name)
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    _prims(p.jaxpr, acc)
                if isinstance(p, (list, tuple)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            _prims(q.jaxpr, acc)
        return acc

    scores = jnp.zeros((2, 8, 8, 19), jnp.float32)
    labels = jnp.zeros((2, 8, 8), jnp.int32)
    for fn in (
        lambda s, l: cross_entropy_with_ignore(s, l, 255),
        lambda s, l: cross_entropy_with_ignore(
            s, l, 255, class_weights=CITYSCAPES_CLASS_WEIGHTS),
        lambda s, l: prob_ohem_cross_entropy(s, l, 255, min_kept=16),
    ):
        prims = _prims(jax.make_jaxpr(fn)(scores, labels).jaxpr, set())
        assert "gather" not in prims, sorted(prims)


def test_kth_smallest_radix_exact():
    """The radix select must return EXACTLY sorted[k-1] (bit-identical) —
    including duplicates, zeros, and k at both ends."""
    import jax.numpy as jnp

    from torchseg_tpu.ops.losses import _kth_smallest_radix

    rng = np.random.default_rng(0)
    for n, k in [(1000, 1), (1000, 500), (1000, 1000), (4096, 137),
                 (100000, 31337)]:
        v = rng.random(n).astype(np.float32)
        v[::7] = 0.0           # duplicates at zero
        v[::11] = v[3]         # repeated value
        want = np.sort(v)[k - 1]
        got = float(_kth_smallest_radix(jnp.asarray(v), k))
        assert np.float32(got) == np.float32(want), (n, k, got, want)


def test_fused_upsampled_ohem_matches_materialized():
    """prob_ohem_cross_entropy_upsampled == prob_ohem_cross_entropy of the
    materialized upsample (the BiSeNetHead train path) — loss AND gradient,
    with and without class weights, at x8 and at a non-128-divisible H."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.ops.losses import (
        CITYSCAPES_CLASS_WEIGHTS,
        prob_ohem_cross_entropy,
        prob_ohem_cross_entropy_upsampled,
    )
    from torchseg_tpu.ops.resize import upsample_by_scale

    rng = np.random.default_rng(0)
    for h, w, scale, weights in (
        (16, 16, 8, None),
        (16, 16, 8, CITYSCAPES_CLASS_WEIGHTS),
        (3, 5, 8, None),  # H=24 exercises the divisor search (rt=24)
        (8, 8, 2, CITYSCAPES_CLASS_WEIGHTS),
    ):
        scores = jnp.asarray(
            rng.normal(size=(2, h, w, 19)).astype(np.float32))
        labels = rng.integers(0, 19, (2, h * scale, w * scale))
        labels[0, :4] = 255  # ignore stripes
        labels = jnp.asarray(labels.astype(np.int32))
        kw = dict(ignore_label=255, thresh=0.7, min_kept=64,
                  class_weights=weights)

        def ref(s):
            return prob_ohem_cross_entropy(
                upsample_by_scale(s, scale, dtype=jnp.float32), labels, **kw)

        def fused(s):
            return prob_ohem_cross_entropy_upsampled(
                s, labels, scale, **kw)

        l_ref, g_ref = jax.value_and_grad(ref)(scores)
        l_fused, g_fused = jax.value_and_grad(fused)(scores)
        np.testing.assert_allclose(float(l_fused), float(l_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


def test_fused_upsampled_ohem_scale1_passthrough():
    import jax.numpy as jnp

    from torchseg_tpu.ops.losses import (
        prob_ohem_cross_entropy,
        prob_ohem_cross_entropy_upsampled,
    )

    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(1, 16, 16, 19)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, (1, 16, 16)).astype(np.int32))
    a = prob_ohem_cross_entropy_upsampled(scores, labels, 1, 255,
                                          min_kept=32)
    b = prob_ohem_cross_entropy(scores, labels, 255, min_kept=32)
    assert float(a) == float(b)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_fused_head_loss_registry_equivalence(monkeypatch):
    """With the FUSED_UPSAMPLE_LOSS gate flipped, build_model+build_loss_fn
    produce the same loss and the same parameter gradients as the
    materialized-head path on a real BiSeNet (identical params: the head
    scale is not a parameter)."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )
    from torchseg_tpu.ops import losses as losses_mod

    cfg = get_experiment("cityscapes.bisenet.R18")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, (1, 64, 64)).astype(np.int32))
    batch = {"image": x, "label": labels}

    results = {}
    for flag in (False, True):
        monkeypatch.setattr(losses_mod, "FUSED_UPSAMPLE_LOSS", flag)
        model = build_model(cfg, axis_name=None)
        loss_fn = build_loss_fn(cfg, num_shards=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=True)

        def loss_of(params):
            outs, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return loss_fn(outs, batch)

        results[flag] = jax.value_and_grad(loss_of)(variables["params"])

    (l0, g0), (l1, g1) = results[False], results[True]
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_upsampled_ce_matches_materialized():
    """cross_entropy_with_ignore_upsampled == cross_entropy_with_ignore of
    the materialized upsample — loss AND gradient — including the PSP/PSA
    pre_log_softmax (double-softmax) quirk and class weights."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.ops.losses import (
        CITYSCAPES_CLASS_WEIGHTS,
        cross_entropy_with_ignore,
        cross_entropy_with_ignore_upsampled,
    )
    from torchseg_tpu.ops.resize import upsample_by_scale

    rng = np.random.default_rng(3)
    for h, w, scale, pre_ls, weights in (
        (6, 6, 8, True, None),      # PSP/PSA protocol (quirk on)
        (4, 8, 32, False, None),    # FCN main
        (8, 16, 16, False, None),   # FCN aux
        (3, 5, 4, False, CITYSCAPES_CLASS_WEIGHTS[:7]),  # DFN-ish + weights
    ):
        c = 7 if weights is not None else 11
        scores = jnp.asarray(
            rng.normal(size=(2, h, w, c)).astype(np.float32))
        labels = rng.integers(0, c, (2, h * scale, w * scale))
        labels[1, -3:] = 255
        labels = jnp.asarray(labels.astype(np.int32))

        def ref(s):
            up = upsample_by_scale(s, scale, dtype=jnp.float32)
            if pre_ls:
                up = jax.nn.log_softmax(up, axis=-1)
            return cross_entropy_with_ignore(up, labels, 255,
                                             class_weights=weights)

        def fused(s):
            return cross_entropy_with_ignore_upsampled(
                s, labels, scale, 255, class_weights=weights,
                pre_log_softmax=pre_ls)

        l_ref, g_ref = jax.value_and_grad(ref)(scores)
        l_fused, g_fused = jax.value_and_grad(fused)(scores)
        np.testing.assert_allclose(float(l_fused), float(l_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_fused_ce_registry_equivalence_pspnet(monkeypatch):
    """Gate flipped, PSPNet-R50 (ce loss, pre_log_softmax quirk): same loss
    and parameter gradients as the materialized in-model upsample path."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )
    from torchseg_tpu.ops import losses as losses_mod

    cfg = get_experiment("ade.pspnet.R50_v1c")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 150, (1, 48, 48)).astype(np.int32))
    batch = {"image": x, "label": labels}

    results = {}
    for flag in (False, True):
        monkeypatch.setattr(losses_mod, "FUSED_UPSAMPLE_LOSS", flag)
        model = build_model(cfg, axis_name=None)
        loss_fn = build_loss_fn(cfg, num_shards=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=True)

        def loss_of(params):
            outs, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return loss_fn(outs, batch)

        results[flag] = jax.value_and_grad(loss_of)(variables["params"])

    (l0, g0), (l1, g1) = results[False], results[True]
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_fused_dfn_registry_equivalence(monkeypatch):
    """Gate flipped, DFN (4 smooth heads x32/x16/x8/x4 + border focal):
    same loss and parameter gradients as the materialized path."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )
    from torchseg_tpu.ops import losses as losses_mod

    cfg = get_experiment("cityscapes.dfn.R101_v1c")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, (1, 64, 64)).astype(np.int32))
    aux = jnp.asarray(rng.integers(0, 2, (1, 64, 64)).astype(np.int32))
    batch = {"image": x, "label": labels, "aux_label": aux}

    results = {}
    for flag in (False, True):
        monkeypatch.setattr(losses_mod, "FUSED_UPSAMPLE_LOSS", flag)
        model = build_model(cfg, axis_name=None)
        loss_fn = build_loss_fn(cfg, num_shards=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=True)

        def loss_of(params):
            outs, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return loss_fn(outs, batch)

        results[flag] = jax.value_and_grad(loss_of)(variables["params"])

    (l0, g0), (l1, g1) = results[False], results[True]
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
