"""Toy end-to-end learning demo: train BiSeNet-X39 from scratch on a
procedurally generated shapes dataset and watch mIoU climb well above chance.

This is the in-repo substitute for the reference's "reproduce the model-zoo
table" integration test (SURVEY.md §4) in an environment without the real
datasets: the data has learnable structure (background / filled circle /
filled rectangle, colored with class-correlated hues + noise), so a working
train stack must separate the classes.

Run (TPU or CPU):
  python -m examples.toy_train --steps 120 --crop 64
"""

import argparse
import dataclasses

import numpy as np


class ShapesDataset:
    """3-class synthetic segmentation: bg=0, circle=1, rectangle=2."""

    num_classes = 3

    def __init__(self, num_items: int, hw=(64, 64), preprocess=None, seed=0):
        self.num_items = num_items
        self.hw = hw
        self.preprocess = preprocess
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return self.num_items

    def reshuffle(self, seed):
        pass

    def make(self, index):
        import cv2

        rng = np.random.default_rng(1000 + index)
        h, w = self.hw
        img = rng.integers(0, 60, (h, w, 3)).astype(np.uint8)
        gt = np.zeros((h, w), np.uint8)
        # circle (class 1): reddish
        c = (int(rng.integers(10, w - 10)), int(rng.integers(10, h - 10)))
        r = int(rng.integers(6, max(h, w) // 4))
        cv2.circle(img, c, r, (200, 60, 60), -1)
        cv2.circle(gt, c, r, 1, -1)
        # rectangle (class 2): greenish
        x0, y0 = int(rng.integers(0, w - 16)), int(rng.integers(0, h - 16))
        x1, y1 = x0 + int(rng.integers(8, 16)), y0 + int(rng.integers(8, 16))
        cv2.rectangle(img, (x0, y0), (x1, y1), (60, 200, 60), -1)
        cv2.rectangle(gt, (x0, y0), (x1, y1), 2, -1)
        img = np.clip(
            img.astype(np.int16) + rng.integers(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        return img, gt

    def __getitem__(self, index):
        img, gt = self.make(index)
        extra = None
        if self.preprocess is not None:
            img, gt, extra = self.preprocess(self._rng, img, gt)
        out = dict(image=np.ascontiguousarray(img),
                   label=np.ascontiguousarray(gt),
                   fn=str(index), n=self.num_items)
        if extra:
            out.update(extra)
        return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--device-augment", action="store_true",
                   help="host only generates raw images; mirror/scale/crop/"
                        "normalize run on the TPU (data/device_augment.py)")
    p.add_argument("-e", "--experiment", default=None,
                   help="exercise a registry experiment's full train stack "
                        "(model + loss + preprocess, e.g. "
                        "ade.pspnet.R50_v1c, cityscapes.dfn.R101_v1c) at "
                        "toy scale instead of the default BiSeNet-X39 demo")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from torchseg_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()  # family re-runs skip the minutes-long compile

    from torchseg_tpu import models
    from torchseg_tpu.data.loader import TrainLoader
    from torchseg_tpu.data.preprocess import SegTrainPre
    from torchseg_tpu.engine.evaluator import Evaluator
    from torchseg_tpu.engine.lr_policy import PolyLR
    from torchseg_tpu.engine.optim import make_lr_mult_tree, make_wd_tree
    from torchseg_tpu.engine.trainer import Trainer, make_data_mesh
    from torchseg_tpu.ops.losses import prob_ohem_cross_entropy

    mesh = make_data_mesh()
    n_dev = mesh.devices.size
    bs = args.batch_size - args.batch_size % n_dev or n_dev

    mean, std = np.zeros(3, np.float32), np.ones(3, np.float32)
    gt_down = 1
    if args.experiment:
        # registry path: the experiment's own model family, loss setup
        # (OHEM / CE+aux / DFN dual-branch focal) and preprocess pipeline
        # (incl. DFN's Canny border aux labels), shrunk to toy scale —
        # convergence evidence for every family without real datasets
        from torchseg_tpu.experiments.registry import (
            build_loss_fn,
            build_model,
            build_preprocess,
            get_experiment,
        )

        cfg = dataclasses.replace(
            get_experiment(args.experiment),
            num_classes=3,
            image_height=args.crop, image_width=args.crop,
            batch_size=bs, ignore_label=255,
            image_mean=tuple(mean), image_std=tuple(std),
            train_scale_array=(0.75, 1.0, 1.25),
        )
        if "psanet" in cfg.model:
            # keep the exact PSA path (H*W == att_channels) at toy scale
            kw = dict(cfg.model_kwargs)
            kw["att_channels"] = (args.crop // 8) ** 2
            cfg = dataclasses.replace(cfg, model_kwargs=kw)
        gt_down = cfg.gt_down_sampling
        if args.device_augment:
            raise SystemExit("--device-augment is the X39 demo path; "
                             "use it without -e")
        pre = build_preprocess(cfg)
        model = build_model(cfg, axis_name="data")
        loss_fn = build_loss_fn(cfg, num_shards=n_dev)
        lr_policy = PolyLR(cfg.lr, cfg.lr_power, args.steps)
        momentum, lr_mult, wd = cfg.momentum, cfg.business_lr_mult, \
            cfg.weight_decay
        device_aug = None
    else:
        device_aug = None
        if args.device_augment:
            from torchseg_tpu.data.device_augment import make_device_augment

            pre = None  # host ships raw uint8; the TPU augments
            device_aug = make_device_augment(
                (args.crop, args.crop), (0.75, 1.0, 1.25), mean, std
            )
        else:
            pre = SegTrainPre(mean, std, args.crop,
                              train_scale_array=(0.75, 1, 1.25))

        model = models.bisenet_x39(num_classes=3)
        min_kept = bs // n_dev * args.crop * args.crop // 16

        def loss_fn(outs, batch):
            total = 0.0
            for key in ("aux0", "aux1", "main"):
                total = total + prob_ohem_cross_entropy(
                    outs[key], batch["label"], 255, thresh=0.7,
                    min_kept=min_kept
                )
            return total

        lr_policy = PolyLR(5e-2, 0.9, args.steps)
        momentum, lr_mult, wd = 0.9, 10.0, 5e-4

    label_offset = 0
    if args.experiment and cfg.preprocess == "ade":
        # ADE convention: raw labels are 1-based (0 = unlabeled); the
        # preprocess/eval shift by -1 (reference ade dataloader.py:28-31)
        label_offset = -1

        class _AdeShapes(ShapesDataset):
            def make(self, index):
                img, gt = super().make(index)
                return img, gt + 1

        ds_cls = _AdeShapes
    else:
        ds_cls = ShapesDataset
    train_ds = ds_cls(bs * args.steps, (args.crop, args.crop), pre)
    val_ds = ds_cls(16, (args.crop, args.crop), None, seed=99)

    trainer = Trainer(model, loss_fn, lr_policy,
                      sgd_momentum=momentum, mesh=mesh)
    loader = TrainLoader(train_ds, bs, num_workers=4)
    loader.set_epoch(0)
    it = iter(loader)

    def to_batch(raw, key):
        b = {k: jnp.asarray(v) for k, v in raw.items()
             if isinstance(v, np.ndarray)}
        if device_aug is not None:
            img, lab = device_aug(key, b["image"], b["label"])
            b = {"image": img, "label": lab}
        return b

    batch0 = to_batch(next(it), jax.random.PRNGKey(42))
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    trainer.configure_groups(
        make_lr_mult_tree(state.params, lr_mult),
        make_wd_tree(state.params, wd),
    )

    def evaluate(state):
        ev = Evaluator(
            lambda v, x: model.apply(v, x, train=False),
            {"params": state.params, "batch_stats": state.batch_stats},
            3, mean, std,
        )
        acc = ev.run_dataset(val_ds, mode="whole",
                             process_index=0, process_count=1,
                             gt_down_sampling=gt_down,
                             label_offset=label_offset)
        return acc.scores()[1]

    miou0 = evaluate(state)
    print(f"step 0: val mIoU {miou0 * 100:.1f}% (chance ~ low)")

    step = 0
    rng = jax.random.PRNGKey(1)
    batch = batch0
    while step < args.steps:
        rng, k, ka = jax.random.split(rng, 3)
        state, loss, lr = trainer.train_step(state, batch, k)
        step += 1
        if step % 20 == 0 or step == args.steps:
            print(f"step {step}: loss {float(loss):.3f} lr {float(lr):.2e}")
        try:
            nxt = next(it)
        except StopIteration:
            break
        batch = to_batch(nxt, ka)

    miou1 = evaluate(state)
    print(f"final: val mIoU {miou1 * 100:.1f}%  (start {miou0 * 100:.1f}%)")
    return miou0, miou1


if __name__ == "__main__":
    main()
