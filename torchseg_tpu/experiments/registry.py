"""Experiment registry — the declarative equivalent of the reference's 12
``model/<family>/<dataset>.<net>.<backbone>`` directories, with every
hyperparameter transcribed from the per-experiment config.py / train.py
(SURVEY.md §2.2 table).

Each experiment bundles: model factory, dataset class, train hyperparameters,
loss wiring (CE / OHEM / DFN focal), preprocess pipeline, and the eval
protocol.  ``build_*`` helpers construct the runtime objects.
"""

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

from .. import models
from ..data import ADE, CamVid, Cityscapes, PascalContext, VOC
from ..data.preprocess import ADETrainPre, DFNTrainPre, SegTrainPre
from ..ops import losses as _losses
from ..ops.losses import (
    CITYSCAPES_CLASS_WEIGHTS,
    cross_entropy_with_ignore,
    cross_entropy_with_ignore_upsampled,
    prob_ohem_cross_entropy,
    prob_ohem_cross_entropy_upsampled,
    sigmoid_focal_loss_border,
)
from ..ops.norm import BatchNorm

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# quirk preserved: FCN's config has std blue channel 0.224 (not 0.225)
FCN_STD = (0.229, 0.224, 0.224)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: str                       # models.MODEL_REGISTRY key
    dataset: str                     # cityscapes | voc | ade
    num_classes: int
    ignore_label: int
    # image / preprocess
    image_mean: Tuple[float, ...] = IMAGENET_MEAN
    image_std: Tuple[float, ...] = IMAGENET_STD
    image_height: int = 512
    image_width: int = 512
    train_scale_array: Optional[Sequence[float]] = None
    preprocess: str = "seg"          # seg | ade | dfn
    gt_down_sampling: int = 1        # train-label downsampling (speed variants)
    # train
    lr: float = 1e-2
    lr_power: float = 0.9
    momentum: float = 0.9
    weight_decay: float = 1e-4
    batch_size: int = 16             # global batch
    nepochs: int = 80
    niters_per_epoch: int = 1000
    business_lr_mult: float = 10.0
    lr_scale_by_world: bool = False  # FCN: base_lr * world_size
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    # loss
    loss: str = "ce"                 # ce | ohem | dfn
    ohem_thresh: float = 0.7
    ohem_min_kept_divisor: int = 16  # min_kept = b*H*W / (div * gds^2)
    aux_loss_ratio: float = 0.5      # fcn 0.5 / psp+psa 0.4
    dfn_alpha: float = 0.1
    # the border branch's focal-loss ignore label; the reference hardcodes
    # 255 in both DFN train.py:52 — kept configurable for extensions
    border_ignore_label: int = 255
    # eval protocol
    eval_scale_array: Sequence[float] = (1.0,)
    # the msf protocol scales (config.py comments next to eval_scale_array)
    eval_ms_scale_array: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)
    eval_flip: bool = False
    eval_base_size: int = 512
    eval_crop_size: int = 512
    eval_stride_rate: float = 2 / 3
    eval_mode: str = "sliding"       # sliding | whole
    eval_gt_down_sampling: int = 1
    eval_resize_to: Optional[Tuple[int, int]] = None  # speed: (768, 1536)
    eval_label_offset: int = 0       # ADE: -1
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    # memory/perf knobs
    remat: bool = False          # jax.checkpoint backbone blocks
    ohem_approx: bool = False    # histogram OHEM threshold (vs exact sort)
    ohem_use_weight: bool = False  # Cityscapes 19-class weights (loss_opr.py:57)
    # bookkeeping
    snapshot_iter: int = 50
    pretrained: Optional[str] = None


_CITY = dict(
    dataset="cityscapes", num_classes=19, ignore_label=255,
    image_height=1024, image_width=1024,
    train_scale_array=(0.75, 1, 1.25, 1.5, 1.75, 2.0),
    lr=1e-2, weight_decay=5e-4, batch_size=16, niters_per_epoch=1000,
    eval_scale_array=(1.0,), eval_flip=False,
    eval_base_size=1024, eval_crop_size=1024, eval_stride_rate=5 / 6,
)

_ADE = dict(
    dataset="ade", num_classes=150, ignore_label=-1,
    image_height=480, image_width=480,
    train_scale_array=(0.5, 0.75, 1, 1.5, 1.75, 2),
    preprocess="ade",
    lr=1e-2, weight_decay=1e-4, batch_size=16,
    nepochs=120, niters_per_epoch=1262,  # ceil(20210 // 16)
    loss="ce", aux_loss_ratio=0.4,
    eval_scale_array=(1.0,), eval_flip=False,
    eval_ms_scale_array=(0.5, 0.75, 1.0, 1.5, 1.75),
    eval_base_size=480, eval_crop_size=480, eval_stride_rate=2 / 3,
    eval_label_offset=-1,
)

EXPERIMENTS = {}


def _register(cfg: ExperimentConfig):
    EXPERIMENTS[cfg.name] = cfg
    return cfg


# --- FCN (reference model/fcn/voc.fcn32s.R101_v1c) ------------------------
_register(ExperimentConfig(
    name="voc.fcn32s.R101_v1c",
    model="fcn32s_r101", dataset="voc", num_classes=21, ignore_label=255,
    image_std=FCN_STD,
    image_height=512, image_width=512,
    train_scale_array=(0.5, 0.75, 1, 1.5, 1.75, 2),
    lr=1e-2, weight_decay=1e-4, batch_size=32, nepochs=60,
    niters_per_epoch=330,  # ceil(10582 // 32)
    business_lr_mult=1.0, lr_scale_by_world=True,
    loss="ce", aux_loss_ratio=0.5,
    eval_base_size=512, eval_crop_size=512, eval_stride_rate=2 / 3,
))

# --- PSPNet / PSANet on ADE ------------------------------------------------
_register(ExperimentConfig(name="ade.pspnet.R50_v1c", model="pspnet_r50", **_ADE))
_register(ExperimentConfig(name="ade.pspnet.R101_v1c", model="pspnet_r101", **_ADE))
_register(ExperimentConfig(name="ade.psanet.R50_v1c", model="psanet_r50", **_ADE))
_register(ExperimentConfig(name="ade.psanet.R101_v1c", model="psanet_r101", **_ADE))

# --- BiSeNet on Cityscapes -------------------------------------------------
_register(ExperimentConfig(
    name="cityscapes.bisenet.R18", model="bisenet_r18", loss="ohem",
    nepochs=80, **_CITY,
))
_register(ExperimentConfig(
    name="cityscapes.bisenet.R101", model="bisenet_r101", loss="ohem",
    nepochs=80, **_CITY,
))
_register(ExperimentConfig(
    name="cityscapes.bisenet.X39", model="bisenet_x39", loss="ohem",
    nepochs=140, **_CITY,
))
_speed = dict(_CITY)
_speed.update(
    image_height=768, image_width=1536, eval_stride_rate=2 / 3,
    eval_base_size=768, eval_crop_size=768,
)
_register(ExperimentConfig(
    name="cityscapes.bisenet.R18.speed", model="bisenet_r18", loss="ohem",
    nepochs=80, gt_down_sampling=8, eval_mode="whole",
    eval_gt_down_sampling=8, eval_resize_to=(768, 1536),
    model_kwargs={"speed": True}, **_speed,
))
_x39speed = dict(_speed)
_x39speed.update(train_scale_array=(0.5, 0.75, 1, 1.25, 1.5, 1.75))
_register(ExperimentConfig(
    name="cityscapes.bisenet.X39.speed", model="bisenet_x39", loss="ohem",
    nepochs=140, gt_down_sampling=8, eval_mode="whole",
    eval_gt_down_sampling=8, eval_resize_to=(768, 1536),
    model_kwargs={"speed": True}, **_x39speed,
))

# --- DFN ---------------------------------------------------------------
_dfn_city = dict(_CITY)
_dfn_city.update(
    image_height=800, image_width=800, lr=7e-4, weight_decay=1e-4,
    train_scale_array=(0.5, 0.75, 1, 1.5, 1.75, 2.0),
    eval_base_size=800, eval_crop_size=800, eval_stride_rate=2 / 3,
)
_register(ExperimentConfig(
    name="cityscapes.dfn.R101_v1c", model="dfn_r101", loss="dfn",
    preprocess="dfn", nepochs=80, **_dfn_city,
))
_register(ExperimentConfig(
    name="voc.dfn.R101_v1c", model="dfn_r101", dataset="voc",
    num_classes=21, ignore_label=255, loss="dfn", preprocess="dfn",
    image_height=512, image_width=512,
    train_scale_array=(0.5, 0.75, 1, 1.5, 1.75, 2.0),
    lr=8e-4, weight_decay=1e-5, batch_size=32, nepochs=120,
    niters_per_epoch=330,
    eval_base_size=512, eval_crop_size=512, eval_stride_rate=2 / 3,
))

# --- extensions beyond the reference code (its README claims CamVid and
# PASCAL-Context support but ships neither; SURVEY.md preamble) -------------
_register(ExperimentConfig(
    name="camvid.bisenet.R18", model="bisenet_r18", dataset="camvid",
    num_classes=11, ignore_label=255, loss="ohem",
    image_height=720, image_width=960,
    train_scale_array=(0.75, 1, 1.25, 1.5, 1.75, 2.0),
    lr=1e-2, weight_decay=5e-4, batch_size=16, nepochs=80,
    niters_per_epoch=23,  # ceil(367 / 16)
    eval_mode="whole", eval_resize_to=(720, 960),
    eval_base_size=720, eval_crop_size=720,
))
_register(ExperimentConfig(
    name="pcontext.pspnet.R101_v1c", model="pspnet_r101", dataset="pcontext",
    num_classes=59, ignore_label=-1, preprocess="ade",
    image_height=480, image_width=480,
    train_scale_array=(0.5, 0.75, 1, 1.5, 1.75, 2),
    lr=1e-2, weight_decay=1e-4, batch_size=16, nepochs=120,
    niters_per_epoch=312,  # ceil(4998 / 16)
    loss="ce", aux_loss_ratio=0.4,
    eval_base_size=480, eval_crop_size=480, eval_stride_rate=2 / 3,
    eval_label_offset=-1,
))

DATASETS = {
    "cityscapes": Cityscapes,
    "voc": VOC,
    "ade": ADE,
    "camvid": CamVid,
    "pcontext": PascalContext,
}


def get_experiment(name: str) -> ExperimentConfig:
    return EXPERIMENTS[name]


def _use_fused_head_loss(cfg: ExperimentConfig) -> bool:
    """Upsample-then-loss experiments train with raw heads + the fused
    upsample+loss when the chip-measured gate says so (ops/losses.py):
    forced ON/OFF by the A/B arms, else the per-family measured defaults
    (FUSED_UPSAMPLE_LOSS_MODELS, docs/DESIGN.md)."""
    eligible = (
        (cfg.loss == "ohem" and cfg.model.startswith("bisenet"))
        or (cfg.loss == "ce"
            and cfg.model.startswith(("pspnet", "psanet", "fcn")))
        or cfg.loss == "dfn"
    )
    if not eligible:
        return False
    if _losses.FUSED_UPSAMPLE_LOSS is not None:
        return bool(_losses.FUSED_UPSAMPLE_LOSS)
    return cfg.model.startswith(tuple(_losses.FUSED_UPSAMPLE_LOSS_MODELS))


def _bisenet_head_scales(cfg: ExperimentConfig) -> Tuple[int, int, int]:
    """Train-head upsample factors (the BiSeNet variant table,
    models/bisenet.py:9-15)."""
    return (2, 1, 1) if cfg.model_kwargs.get("speed") else (16, 8, 8)


def build_model(cfg: ExperimentConfig, axis_name: Optional[str] = "data",
                dtype=None):
    """Instantiate the Flax model with SyncBN bound to the mesh axis."""
    norm = functools.partial(
        BatchNorm,
        momentum=cfg.bn_momentum,
        epsilon=cfg.bn_eps,
        axis_name=axis_name,
    )
    factory = models.MODEL_REGISTRY[cfg.model]
    kwargs = dict(cfg.model_kwargs)
    if _use_fused_head_loss(cfg):
        kwargs["train_raw_logits"] = True
    return factory(num_classes=cfg.num_classes, norm=norm, dtype=dtype,
                   remat=cfg.remat, **kwargs)


def build_preprocess(cfg: ExperimentConfig):
    crop = (cfg.image_height, cfg.image_width)
    if cfg.preprocess == "ade":
        return ADETrainPre(cfg.image_mean, cfg.image_std, crop,
                           cfg.train_scale_array)
    if cfg.preprocess == "dfn":
        return DFNTrainPre(cfg.image_mean, cfg.image_std, crop,
                           cfg.train_scale_array)
    return SegTrainPre(cfg.image_mean, cfg.image_std, crop,
                       cfg.train_scale_array,
                       gt_down_sampling=cfg.gt_down_sampling)


def build_loss_fn(cfg: ExperimentConfig, num_shards: int = 1):
    """Per-shard loss (outputs, batch) -> scalar, matching the reference's
    per-process criterion semantics (OHEM min_kept uses the per-GPU batch,
    model/bisenet/*/train.py:48-52)."""
    ignore = cfg.ignore_label

    if cfg.loss == "ce":
        ratio = cfg.aux_loss_ratio

        if _use_fused_head_loss(cfg):
            # raw heads (build_model sets train_raw_logits); the loss owns
            # the upsample, row-tiled.  pre_log_softmax reproduces the
            # PSP/PSA in-network log_softmax quirk (models/pspnet.py).
            pre_ls = cfg.model.startswith(("pspnet", "psanet"))
            main_scale, aux_scale = ((32, 16) if cfg.model.startswith("fcn")
                                     else (8, 8))

            def loss_fn(outs, batch):
                loss = cross_entropy_with_ignore_upsampled(
                    outs["main"], batch["label"], main_scale, ignore,
                    pre_log_softmax=pre_ls)
                if "aux" in outs:
                    loss = loss + ratio * cross_entropy_with_ignore_upsampled(
                        outs["aux"], batch["label"], aux_scale, ignore,
                        pre_log_softmax=pre_ls)
                return loss

            return loss_fn

        def loss_fn(outs, batch):
            loss = cross_entropy_with_ignore(outs["main"], batch["label"], ignore)
            if "aux" in outs:
                loss = loss + ratio * cross_entropy_with_ignore(
                    outs["aux"], batch["label"], ignore
                )
            return loss

        return loss_fn

    if cfg.loss == "ohem":
        local_b = max(cfg.batch_size // num_shards, 1)
        h = cfg.image_height // cfg.gt_down_sampling
        w = cfg.image_width // cfg.gt_down_sampling
        min_kept = int(local_b * h * w // cfg.ohem_min_kept_divisor)
        thresh = cfg.ohem_thresh

        approx = cfg.ohem_approx
        weights = CITYSCAPES_CLASS_WEIGHTS if cfg.ohem_use_weight else None

        if _use_fused_head_loss(cfg):
            # the model emits raw heads (build_model sets train_raw_logits);
            # the loss owns the x-scale upsample, row-tiled
            scales = _bisenet_head_scales(cfg)

            def loss_fn(outs, batch):
                label = batch["label"]
                total = 0.0
                for key, scale in zip(("aux0", "aux1", "main"), scales):
                    total = total + prob_ohem_cross_entropy_upsampled(
                        outs[key], label, scale, ignore, thresh=thresh,
                        min_kept=min_kept, class_weights=weights,
                        approx_threshold=approx,
                    )
                return total

            return loss_fn

        def loss_fn(outs, batch):
            label = batch["label"]
            total = 0.0
            for key in ("aux0", "aux1", "main"):
                total = total + prob_ohem_cross_entropy(
                    outs[key], label, ignore, thresh=thresh,
                    min_kept=min_kept, class_weights=weights,
                    approx_threshold=approx,
                )
            return total

        return loss_fn

    if cfg.loss == "dfn":
        alpha = cfg.dfn_alpha
        border_ignore = cfg.border_ignore_label
        fused = _use_fused_head_loss(cfg)

        def loss_fn(outs, batch):
            label = batch["label"]
            aux_label = batch["aux_label"]
            loss = 0.0
            for i, s in enumerate(outs["smooth"]):
                if fused:
                    # raw smooth heads; scales 32/16/8/4 (models/dfn.py
                    # smooth_head{i}); border branch stays materialized
                    # (1-channel x4 — tiny)
                    loss = loss + cross_entropy_with_ignore_upsampled(
                        s, label, 2 ** (5 - i), ignore)
                else:
                    loss = loss + cross_entropy_with_ignore(s, label, ignore)
            aux = 0.0
            for b in outs["border"]:
                aux = aux + sigmoid_focal_loss_border(b, aux_label,
                                                      border_ignore)
            return loss + alpha * aux

        return loss_fn

    raise ValueError(f"unknown loss {cfg.loss}")
