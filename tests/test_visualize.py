"""Visualization and misc utils."""

import numpy as np

from torchseg_tpu.utils.visualize import show_img, show_prediction, print_iou
from torchseg_tpu.utils.misc import parse_devices
from torchseg_tpu.data.cityscapes import Cityscapes


def test_show_prediction_and_composite():
    colors = Cityscapes.get_class_colors()
    img = np.zeros((8, 8, 3), np.uint8)
    pred = np.zeros((8, 8), np.int64)
    pred[4:] = 1
    over = show_prediction(colors, -1, img, pred)
    assert over.shape == (8, 8, 3)
    comp = show_img(colors, -1, img, pred, pred)
    assert comp.shape == (8, 8 * 3 + 6, 3)


def test_print_iou_table():
    iu = np.array([0.5, 0.75])
    s = print_iou(iu, 0.9, ["road", "car"], show_no_back=True)
    assert "road" in s and "mean_IU 62.500%" in s


def test_parse_devices():
    import jax
    assert parse_devices("0-3") == [0, 1, 2, 3]
    assert parse_devices("0,2,5") == [0, 2, 5]
    assert parse_devices("*") == list(range(len(jax.devices())))


def test_parse_epochs(tmp_path):
    from torchseg_tpu.eval import parse_epochs

    for e in (3, 5, 7):
        (tmp_path / f"epoch-{e}.ckpt").write_bytes(b"x")
    (tmp_path / "epoch-last.ckpt").write_bytes(b"x")
    assert parse_epochs("5", str(tmp_path)) == [str(tmp_path / "epoch-5.ckpt")]
    assert parse_epochs("3-7", str(tmp_path)) == [
        str(tmp_path / f"epoch-{e}.ckpt") for e in (3, 5, 7)
    ]
    assert parse_epochs("5-", str(tmp_path)) == [
        str(tmp_path / f"epoch-{e}.ckpt") for e in (5, 7)
    ]
    assert parse_epochs("last", str(tmp_path)) == [
        str(tmp_path / "epoch-last.ckpt")
    ]
