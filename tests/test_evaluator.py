"""Evaluator mechanics tests with deterministic pixelwise stand-in models:
the crop-grid assembly, pad/unpad margins, flip TTA combination, and the
multi-scale sum must reproduce pixelwise-computable results."""

import numpy as np
import jax.numpy as jnp
import pytest

from torchseg_tpu.engine.evaluator import Evaluator
from torchseg_tpu.data.base import SyntheticDataset

MEAN = np.zeros(3, np.float32)
STD = np.ones(3, np.float32)


def _pixelwise_apply(variables, x):
    """scores per pixel: c0 = gray, c1 = -gray, c2 = 0.2 (constant)."""
    gray = jnp.mean(x, axis=-1)
    return jnp.stack([gray, -gray, jnp.full_like(gray, 0.2)], axis=-1)


def _pixelwise_argmax(img):
    gray = normalize_gray(img)
    scores = np.stack([gray, -gray, np.full_like(gray, 0.2)], axis=-1)
    return scores.argmax(-1)


def normalize_gray(img):
    return (img.astype(np.float32) / 255.0).mean(-1)


def test_whole_eval_pixelwise():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    pred = ev.whole_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_whole_eval_with_padding_margins():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    pred = ev.whole_eval(img, output_size=(30, 40), input_size=(48, 48))
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_sliding_eval_small_image_single_crop():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (20, 28, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, multi_scales=[1.0], crop_size=32
    )
    pred = ev.sliding_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_sliding_eval_crop_grid():
    """Image larger than crop: overlapping-sum assembly must preserve the
    pixelwise argmax (positive exp-scores scale by coverage count only)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (50, 90, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, multi_scales=[1.0],
        crop_size=32, stride_rate=5 / 6, max_batch=4,
    )
    pred = ev.sliding_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_flip_tta_formula():
    """For a position-dependent model, flip TTA must equal
    exp(f(x) + flip(f(flip(x))))."""

    def positional_apply(variables, x):
        b, h, w, _ = x.shape
        col = jnp.tile(
            jnp.arange(w, dtype=jnp.float32)[None, None, :, None], (b, h, 1, 2)
        )
        # class 0 prefers left, class 1 prefers right
        return jnp.stack([-col[..., 0], col[..., 1] - w + 1], axis=-1)

    img = np.zeros((4, 6, 3), np.uint8)
    ev = Evaluator(positional_apply, {}, 2, MEAN, STD, is_flip=True)
    score = ev._forward(
        ev.process_image(img)[None].astype(np.float32)
    )[0]
    # manual: f(x)[c0] = -col ; flipped input col' = w-1-col =>
    # f(flip x)[c0] = -col, flip back => -(w-1-col)
    col = np.arange(6, dtype=np.float32)[None, :].repeat(4, 0)
    want_c0 = np.exp(-col + -(5 - col))
    np.testing.assert_allclose(score[..., 0], want_c0, rtol=1e-5)


def test_multi_scale_runs():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD,
        multi_scales=[0.5, 1.0, 1.5], crop_size=48,
    )
    pred = ev.sliding_eval(img)
    assert pred.shape == (40, 60)
    # multi-scale of a pixelwise model still matches on most pixels
    agree = (pred == _pixelwise_argmax(img)).mean()
    assert agree > 0.9


def test_run_dataset_whole():
    ds = SyntheticDataset(num_items=4, image_hw=(24, 24), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    acc = ev.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    assert acc.hist.sum() == 4 * 24 * 24
    iou, miou, _, acc_pix = acc.scores()
    assert iou.shape == (3,)


def test_multidevice_eval_matches_single():
    import jax

    ds = SyntheticDataset(num_items=6, image_hw=(24, 24), num_classes=3)
    ev1 = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    acc1 = ev1.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    evn = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, devices=jax.devices()[:4]
    )
    accn = evn.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    np.testing.assert_array_equal(acc1.hist, accn.hist)
    assert acc1.labeled == accn.labeled and acc1.correct == accn.correct


def test_device_score_resize_matches_cv2():
    """jax.image.resize 'linear' (used for on-device score resize) must match
    cv2.INTER_LINEAR (the reference's score resize, evaluator.py:249-253)."""
    import cv2
    import jax

    rng = np.random.default_rng(11)
    score = rng.normal(size=(13, 17, 5)).astype(np.float32)
    want = cv2.resize(score, (40, 30), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(
        jax.image.resize(jnp.asarray(score), (30, 40, 5), method="linear")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_run_dataset_saves_predictions(tmp_path):
    import os

    ds = SyntheticDataset(num_items=2, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    ev.run_dataset(ds, mode="whole", save_pred_dir=str(tmp_path),
                   process_index=0, process_count=1)
    files = sorted(os.listdir(tmp_path))
    assert files == ["0.png", "1.png"]
    import cv2

    pred = cv2.imread(str(tmp_path / "0.png"), cv2.IMREAD_GRAYSCALE)
    assert pred.shape == (16, 16)


def _jax_linear_resize(score, hw):
    import jax

    return np.asarray(
        jax.image.resize(jnp.asarray(score), (*hw, score.shape[2]),
                         method="linear")
    )


def test_grid_branch_pad_semantics_match_reference():
    """In the sliding GRID branch the reference pads the RAW image with 0
    BEFORE normalizing each crop (evaluator.py:213-215 + process_image), so
    the network sees (0-mean)/std in the pad margins.  Pin scale_process
    against a numpy oracle of the reference math with a nonzero mean."""
    import math

    from torchseg_tpu.data.transforms import pad_image_to_shape

    mean = np.full(3, 0.5, np.float32)
    std = np.full(3, 0.25, np.float32)
    rng = np.random.default_rng(7)
    # long side 90 > crop 64 -> grid branch; rows 40 < 64 -> pad margins
    img = rng.integers(0, 255, (40, 90, 3)).astype(np.uint8)
    crop, stride_rate = 64, 5 / 6

    ev = Evaluator(
        _pixelwise_apply, {}, 3, mean, std,
        multi_scales=[1.0], crop_size=crop, stride_rate=stride_rate,
    )
    got = ev.scale_process(img, img.shape[:2], crop, stride_rate)

    # ---- oracle: reference scale_process (grid branch) ----
    stride = int(math.ceil(crop * stride_rate))
    img_pad, margin = pad_image_to_shape(img, crop, 0)  # RAW 0-pad
    pr, pc = img_pad.shape[:2]
    canvas = np.zeros((pr, pc, 3), np.float32)
    for gy in range(int(math.ceil((pr - crop) / stride)) + 1):
        for gx in range(int(math.ceil((pc - crop) / stride)) + 1):
            ey = min(gy * stride + crop, pr)
            ex = min(gx * stride + crop, pc)
            sy, sx = ey - crop, ex - crop
            sub = img_pad[sy:ey, sx:ex].astype(np.float32)
            norm = (sub / 255.0 - mean) / std
            score = np.asarray(_pixelwise_apply({}, jnp.asarray(norm[None])))[0]
            canvas[sy:ey, sx:ex] += np.exp(score)
    canvas = canvas[margin[0]: pr - margin[1], margin[2]: pc - margin[3]]
    want = _jax_linear_resize(canvas, img.shape[:2])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_grid_chunking_invariance():
    """max_batch chunking (with padded duplicate slots) must not change the
    assembled scores."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (70, 150, 3)).astype(np.uint8)
    preds = []
    for mb in (1, 3, 16):
        ev = Evaluator(
            _pixelwise_apply, {}, 3, MEAN, STD, multi_scales=[1.0],
            crop_size=32, max_batch=mb, is_flip=True,
        )
        preds.append(
            ev.scale_process(img, img.shape[:2], 32, 5 / 6)
        )
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(preds[0], preds[2], rtol=1e-5, atol=1e-5)


class _NamedSynth(SyntheticDataset):
    """Synthetic items with Cityscapes-style file names."""

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["fn"] = f"frankfurt_0000{index}_000294_leftImg8bit"
        return item


def test_submit_writes_remapped_pngs(tmp_path):
    import cv2

    from torchseg_tpu.data.cityscapes import Cityscapes

    ds = _NamedSynth(num_items=2, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    ev.run_dataset(
        ds, mode="whole", process_index=0, process_count=1,
        submit_dir=str(tmp_path), transform_label=Cityscapes.transform_label,
    )
    import os

    files = sorted(os.listdir(tmp_path))
    # rename convention drops the trailing part (cityscapes.py:42-44)
    assert files == ["frankfurt_00000_000294.png", "frankfurt_00001_000294.png"]
    out = cv2.imread(str(tmp_path / files[0]), cv2.IMREAD_GRAYSCALE)
    # train ids {0,1,2} -> official label ids {7, 8, 11}
    assert set(np.unique(out)) <= {7, 8, 11}


def test_show_image_dir_writes_composites(tmp_path):
    import cv2

    ds = _NamedSynth(num_items=1, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    colors = [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    ev.run_dataset(
        ds, mode="whole", process_index=0, process_count=1,
        show_image=str(tmp_path), class_colors=colors, background=255,
    )
    import os

    files = os.listdir(tmp_path)
    assert files == ["frankfurt_00000_000294_leftImg8bit_comp.png"]
    comp = cv2.imread(str(tmp_path / files[0]))
    # [img | sep | gt | sep | pred] horizontally: 3*16 + 2*3 columns
    assert comp.shape == (16, 3 * 16 + 2 * 3, 3)


def test_msf_protocol_matches_reference_oracle():
    """Full msf protocol (scales + flip + pad margins + score resize + sum +
    argmax) against a numpy transcription of the reference evaluator loop
    (evaluator.py:186-275) with a nonzero-mean normalize."""
    import math

    import cv2
    import jax

    from torchseg_tpu.data.transforms import pad_image_to_shape

    mean = np.array([0.4, 0.5, 0.6], np.float32)
    std = np.array([0.25, 0.3, 0.2], np.float32)

    def apply_fn(variables, x):
        # position+value dependent, flip-sensitive model
        gray = jnp.mean(x, axis=-1)
        col = jnp.broadcast_to(
            jnp.linspace(-1.0, 1.0, x.shape[2])[None, None, :], gray.shape
        )
        return jnp.stack([gray + col, -gray, col * 0 + 0.1], axis=-1)

    rng = np.random.default_rng(21)
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    crop, stride_rate, scales = 32, 5 / 6, [0.5, 1.0, 1.5]

    ev = Evaluator(apply_fn, {}, 3, mean, std, multi_scales=scales,
                   is_flip=True, crop_size=crop, stride_rate=stride_rate)
    got = ev.sliding_eval(img)

    # ---- numpy oracle of the reference msf loop ----
    def net(norm_img):
        s = np.asarray(apply_fn({}, jnp.asarray(norm_img[None])))[0]
        sf = np.asarray(
            apply_fn({}, jnp.asarray(norm_img[:, ::-1][None]))
        )[0][:, ::-1]
        return np.exp(s + sf)

    def process(sub):  # normalize then pad (reference process_image)
        p = (sub.astype(np.float32) / 255.0 - mean) / std
        p, m = pad_image_to_shape(p, crop, 0)
        return p, m

    total = np.zeros((*img.shape[:2], 3), np.float32)
    for s in scales:
        im_s = cv2.resize(img, None, fx=s, fy=s,
                          interpolation=cv2.INTER_LINEAR)
        long_size = max(im_s.shape[:2])
        if long_size <= crop:
            p, m = process(im_s)
            score = net(p)
            score = score[m[0]: score.shape[0] - m[1],
                          m[2]: score.shape[1] - m[3]]
        else:
            stride = int(math.ceil(crop * stride_rate))
            img_pad, margin = pad_image_to_shape(im_s, crop, 0)  # RAW pad
            pr, pc = img_pad.shape[:2]
            canvas = np.zeros((pr, pc, 3), np.float32)
            for gy in range(int(math.ceil((pr - crop) / stride)) + 1):
                for gx in range(int(math.ceil((pc - crop) / stride)) + 1):
                    ey = min(gy * stride + crop, pr)
                    ex = min(gx * stride + crop, pc)
                    sy, sx = ey - crop, ex - crop
                    p, _ = process(img_pad[sy:ey, sx:ex])
                    canvas[sy:ey, sx:ex] += net(p)
            score = canvas[margin[0]: pr - margin[1],
                           margin[2]: pc - margin[3]]
        total += np.asarray(
            jax.image.resize(jnp.asarray(score),
                             (*img.shape[:2], 3), method="linear")
        )
    want = total.argmax(-1)
    agree = (got == want).mean()
    assert agree == 1.0, agree



def test_multidevice_eval_forwards_submit_and_show(tmp_path):
    """--submit/--show-image must work through the per-device worker path
    (they were silently dropped before the round-2 review)."""
    import jax as _jax

    from torchseg_tpu.data.cityscapes import Cityscapes

    ds = _NamedSynth(num_items=4, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD,
                   devices=_jax.devices()[:2], max_batch=4)
    ev.run_dataset(
        ds, mode="whole", process_index=0, process_count=1,
        submit_dir=str(tmp_path / "sub"),
        transform_label=Cityscapes.transform_label,
        show_image=str(tmp_path / "show"),
        class_colors=[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        background=255,
    )
    import os

    assert len(os.listdir(tmp_path / "sub")) == 4
    assert len(os.listdir(tmp_path / "show")) == 4


def test_show_image_with_downsampled_labels(tmp_path):
    """Speed-protocol composites (gt/8 comparisons) must not crash on the
    image/pred shape mismatch — the image is resized to the pred grid."""
    ds = _NamedSynth(num_items=1, image_hw=(32, 32), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    ev.run_dataset(
        ds, mode="whole", process_index=0, process_count=1,
        gt_down_sampling=4, resize_to=(32, 32),
        show_image=str(tmp_path),
        class_colors=[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        background=255,
    )
    import cv2
    import os

    files = os.listdir(tmp_path)
    assert len(files) == 1
    comp = cv2.imread(str(tmp_path / files[0]))
    # pred grid is 8x8: [img | sep | gt | sep | pred] = 3*8 + 2*3 cols
    assert comp.shape == (8, 3 * 8 + 2 * 3, 3)


def test_shard_crops_matches_single_device():
    """The crop grid sharded over a 4-device mesh (psum-merged canvases)
    must produce the same sliding prediction as the single-device path —
    the 'long-context' eval parallelism (SURVEY §5)."""
    import jax as _jax

    rng = np.random.default_rng(31)
    img = rng.integers(0, 255, (70, 150, 3)).astype(np.uint8)
    kwargs = dict(multi_scales=[1.0, 1.5], crop_size=32, stride_rate=5 / 6,
                  is_flip=True)
    ev1 = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD, **kwargs)
    evs = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD,
                    devices=_jax.devices()[:4], shard_crops=True, **kwargs)
    p1 = ev1.sliding_eval(img)
    ps = evs.sliding_eval(img)
    assert (p1 == ps).mean() > 0.999  # fp-order ties only


def test_prefetch_failure_is_loud():
    """The single-device lookahead thread must re-raise dataset errors in
    the consumer, not hang or truncate the dataset silently."""

    class Broken:
        def __len__(self):
            return 3

        def __getitem__(self, idx):
            if idx == 1:
                raise OSError("corrupt png")
            return {"image": np.zeros((16, 16, 3), np.uint8),
                    "label": np.zeros((16, 16), np.int32), "fn": str(idx),
                    "n": 3}

    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        ev.run_dataset(Broken(), mode="whole", process_index=0,
                       process_count=1)


def test_sliding_eval_scaled_imgs_equivalence():
    """Prefetch-computed per-scale resizes must give the identical
    prediction as the inline resize path."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD,
                   multi_scales=[0.75, 1.0, 1.25], crop_size=32)
    import cv2

    scaled = [cv2.resize(img, None, fx=s, fy=s,
                         interpolation=cv2.INTER_LINEAR)
              for s in ev.multi_scales]
    np.testing.assert_array_equal(
        ev.sliding_eval(img), ev.sliding_eval(img, scaled_imgs=scaled))


def test_multidevice_rejects_window_show_image():
    """cv2 GUI calls from per-device worker threads crash or deadlock —
    the multi-device path must refuse show_image='window' loudly."""
    import jax as _jax

    ds = _NamedSynth(num_items=2, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD,
                   devices=_jax.devices()[:2])
    with pytest.raises(ValueError, match="thread-safe"):
        ev.run_dataset(ds, mode="whole", process_index=0, process_count=1,
                       show_image="window",
                       class_colors=[[255, 0, 0]] * 3, background=255)


def test_shard_crops_sees_reassigned_variables():
    """The epoch sweep (eval.py evaluate_checkpoint) reuses one Evaluator
    across checkpoints by reassigning ev.variables.  The sharded grid fn
    must trace variables as a jit argument — a closure would bake the FIRST
    checkpoint's weights into the compiled executable and silently evaluate
    every later epoch with them (round-2 advisor finding, high)."""
    import jax as _jax

    def biased_apply(variables, x):
        gray = jnp.mean(x, axis=-1) + variables["bias"]
        return jnp.stack([gray, -gray, jnp.full_like(gray, 0.2)], axis=-1)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (70, 150, 3)).astype(np.uint8)
    kwargs = dict(multi_scales=[1.0], crop_size=32, stride_rate=5 / 6)
    ev = Evaluator(biased_apply, {"bias": jnp.float32(0.0)}, 3, MEAN, STD,
                   devices=_jax.devices()[:4], shard_crops=True, **kwargs)
    p_zero = ev.sliding_eval(img)
    # a large positive bias pushes every pixel's class-0 score above the
    # constant class-2 score: prediction must become all-zeros
    ev.variables = {"bias": jnp.float32(100.0)}
    p_bias = ev.sliding_eval(img)
    assert not np.array_equal(p_zero, p_bias)
    assert (p_bias == 0).all()


def test_multidevice_worker_failure_is_loud():
    """A crashed per-device worker must raise, not silently report a
    partial-dataset mIoU (observed as a flaky AssertionError in the
    multichip dryrun before this guard)."""
    import jax as _jax

    calls = {"n": 0}

    def flaky_apply(variables, x):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("worker boom")
        return _pixelwise_apply(variables, x)

    ds = SyntheticDataset(num_items=4, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(flaky_apply, {}, 3, MEAN, STD, devices=_jax.devices()[:2])
    with pytest.raises(RuntimeError, match="worker boom"):
        ev.run_dataset(ds, mode="whole", process_index=0, process_count=1)


def test_speed_protocol_matches_reference_oracle():
    """End-to-end speed-variant protocol (resize_to + gt//8 + whole_eval at
    label resolution) against a numpy transcription of the reference speed
    eval loop (model/bisenet/cityscapes.bisenet.R18.speed/eval.py:26-45 +
    whole_eval evaluator.py:164-183): input cv2-resized INTER_LINEAR, label
    cv2-resized INTER_NEAREST to (H//8, W//8), one forward, score resized
    linearly to the label grid, argmax, hist."""
    import cv2
    import jax

    from torchseg_tpu.ops.metrics import hist_info

    mean = np.array([0.4, 0.5, 0.6], np.float32)
    std = np.array([0.25, 0.3, 0.2], np.float32)

    def apply_fn(variables, x):
        gray = jnp.mean(x, axis=-1)
        col = jnp.broadcast_to(
            jnp.linspace(-1.0, 1.0, x.shape[2])[None, None, :], gray.shape
        )
        return jnp.stack([gray + col, -gray, col * 0 + 0.1], axis=-1)

    h, w = 64, 128
    ds = _NamedSynth(num_items=3, image_hw=(57, 101), num_classes=3)
    ev = Evaluator(apply_fn, {}, 3, mean, std)
    acc = ev.run_dataset(
        ds, mode="whole", process_index=0, process_count=1,
        gt_down_sampling=8, resize_to=(h, w),
    )

    # ---- numpy oracle of the reference speed-protocol loop ----
    hist = np.zeros((3, 3), np.int64)
    labeled = correct = 0
    for i in range(len(ds)):
        item = ds[i]
        img = cv2.resize(item["image"], (w, h),
                         interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(item["label"].astype(np.int32),
                           (w // 8, h // 8),
                           interpolation=cv2.INTER_NEAREST)
        norm = (img.astype(np.float32) / 255.0 - mean) / std
        score = np.exp(
            np.asarray(apply_fn({}, jnp.asarray(norm[None])))[0]
        )
        # reference resizes the score map to output_size with
        # cv2.INTER_LINEAR; jax.image 'linear' shares the half-pixel
        # convention (see _finish_fn docstring)
        score = np.asarray(jax.image.resize(
            jnp.asarray(score), (h // 8, w // 8, 3), method="linear"))
        pred = score.argmax(-1)
        hi, la, co = hist_info(3, pred, label)
        hist += hi
        labeled += int(la)
        correct += int(co)

    np.testing.assert_array_equal(acc.hist, hist)
    assert acc.labeled == labeled and acc.correct == correct


class _AdeRawSynth(SyntheticDataset):
    """ADE-style raw items: labels 1-based (0 = unlabeled), Cityscapes-style
    names; the protocol shifts them by -1 at eval time."""

    def __getitem__(self, index):
        item = super().__getitem__(index)
        rng = np.random.default_rng(7000 + index)
        item["label"] = rng.integers(
            0, self.num_classes + 1, size=item["label"].shape
        ).astype(np.float32)  # ADE gt is read as float32 (ade.py:20-24)
        item["fn"] = f"ADE_val_0000000{index}"
        return item


def test_ade_offset_protocol_matches_reference_oracle():
    """The ADE leg — raw 1-based labels shifted by -1 at eval time
    (reference model/pspnet/ade.pspnet.R50_v1c/eval.py:28 `label = label-1`)
    with the sliding protocol; unlabeled (-1 after shift) pixels must drop
    out of the histogram exactly as hist_info's (gt >= 0) mask does."""
    from torchseg_tpu.ops.metrics import hist_info

    ds = _AdeRawSynth(num_items=3, image_hw=(24, 30), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD,
                   multi_scales=[1.0], crop_size=32)
    acc = ev.run_dataset(
        ds, mode="sliding", process_index=0, process_count=1,
        label_offset=-1,
    )

    hist = np.zeros((3, 3), np.int64)
    labeled = correct = 0
    for i in range(len(ds)):
        item = ds[i]
        label = item["label"].astype(np.int64) - 1
        pred = _pixelwise_argmax(item["image"])
        hi, la, co = hist_info(3, pred, label)
        hist += hi
        labeled += int(la)
        correct += int(co)
    assert (np.asarray([ds[i]["label"] for i in range(3)]) == 0).any(), \
        "fixture must contain unlabeled pixels"
    np.testing.assert_array_equal(acc.hist, hist)
    assert acc.labeled == labeled and acc.correct == correct


def test_eval_dtype_bf16_arm_runs_and_agrees():
    """--eval-dtype bf16 (eval.py/make_evaluator): same weights, bf16
    compute — the protocol must run end to end and argmax-agree with the
    f32 arm on nearly all pixels (measured chip bound: docs/MODEL_ZOO.md
    "bf16 eval arm")."""
    import dataclasses

    import jax

    from torchseg_tpu.eval import make_evaluator
    from torchseg_tpu.experiments.registry import (
        build_model,
        get_experiment,
    )

    cfg = dataclasses.replace(
        get_experiment("cityscapes.bisenet.R18"),
        num_classes=4, eval_crop_size=32, eval_scale_array=(1.0,),
    )
    model = build_model(cfg, axis_name=None)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), train=True)
    ds = SyntheticDataset(num_items=2, image_hw=(48, 64), num_classes=4)

    preds = {}
    for dt in ("f32", "bf16"):
        ev = make_evaluator(cfg, variables, eval_dtype=dt)
        acc = ev.run_dataset(ds, mode="sliding")
        assert np.isfinite(acc.scores()[1])
        preds[dt] = np.stack(
            [ev.sliding_eval(ds[i]["image"]) for i in range(len(ds))])
    agree = (preds["f32"] == preds["bf16"]).mean()
    assert agree > 0.95, agree
