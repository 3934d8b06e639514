"""ADE20K dataset (150 classes) — reference furnace/datasets/ade/ade.py.

ADE labels are 1-based on disk; train/eval pipelines shift by -1 so valid
classes are 0..149 and unlabeled becomes -1 (the ignore label), matching the
reference loaders (model/pspnet/ade.pspnet.R50_v1c/dataloader.py:31,
eval.py:28).  Class colors follow the standard ADE palette convention: a
deterministic list is generated here instead of loading color150.mat.
"""

import colorsys

import cv2
import numpy as np

from .base import ManifestDataset

# Standard ADE20K-SceneParsing class names (public dataset metadata).
ADE_CLASS_NAMES = [
    'wall', 'building, edifice', 'sky', 'floor, flooring', 'tree', 'ceiling',
    'road, route', 'bed ', 'windowpane, window ', 'grass', 'cabinet',
    'sidewalk, pavement',
    'person, individual, someone, somebody, mortal, soul', 'earth, ground',
    'door, double door', 'table', 'mountain, mount',
    'plant, flora, plant life', 'curtain, drape, drapery, mantle, pall',
    'chair', 'car, auto, automobile, machine, motorcar', 'water',
    'painting, picture', 'sofa, couch, lounge', 'shelf', 'house', 'sea',
    'mirror', 'rug, carpet, carpeting', 'field', 'armchair', 'seat',
    'fence, fencing', 'desk', 'rock, stone', 'wardrobe, closet, press',
    'lamp', 'bathtub, bathing tub, bath, tub', 'railing, rail', 'cushion',
    'base, pedestal, stand', 'box', 'column, pillar', 'signboard, sign',
    'chest of drawers, chest, bureau, dresser', 'counter', 'sand', 'sink',
    'skyscraper', 'fireplace, hearth, open fireplace',
    'refrigerator, icebox', 'grandstand, covered stand', 'path',
    'stairs, steps', 'runway', 'case, display case, showcase, vitrine',
    'pool table, billiard table, snooker table', 'pillow',
    'screen door, screen', 'stairway, staircase', 'river', 'bridge, span',
    'bookcase', 'blind, screen', 'coffee table, cocktail table',
    'toilet, can, commode, crapper, pot, potty, stool, throne', 'flower',
    'book', 'hill', 'bench', 'countertop',
    'stove, kitchen stove, range, kitchen range, cooking stove',
    'palm, palm tree', 'kitchen island',
    'computer, computing machine, computing device, data processor, electronic computer, information processing system',
    'swivel chair', 'boat', 'bar', 'arcade machine',
    'hovel, hut, hutch, shack, shanty',
    'bus, autobus, coach, charabanc, double-decker, jitney, motorbus, motorcoach, omnibus, passenger vehicle',
    'towel', 'light, light source', 'truck, motortruck', 'tower',
    'chandelier, pendant, pendent', 'awning, sunshade, sunblind',
    'streetlight, street lamp', 'booth, cubicle, stall, kiosk',
    'television receiver, television, television set, tv, tv set, idiot box, boob tube, telly, goggle box',
    'airplane, aeroplane, plane', 'dirt track',
    'apparel, wearing apparel, dress, clothes', 'pole', 'land, ground, soil',
    'bannister, banister, balustrade, balusters, handrail',
    'escalator, moving staircase, moving stairway',
    'ottoman, pouf, pouffe, puff, hassock', 'bottle',
    'buffet, counter, sideboard',
    'poster, posting, placard, notice, bill, card', 'stage', 'van', 'ship',
    'fountain',
    'conveyer belt, conveyor belt, conveyer, conveyor, transporter',
    'canopy', 'washer, automatic washer, washing machine', 'plaything, toy',
    'swimming pool, swimming bath, natatorium', 'stool', 'barrel, cask',
    'basket, handbasket', 'waterfall, falls', 'tent, collapsible shelter',
    'bag', 'minibike, motorbike', 'cradle', 'oven', 'ball',
    'food, solid food', 'step, stair', 'tank, storage tank',
    'trade name, brand name, brand, marque', 'microwave, microwave oven',
    'pot, flowerpot', 'animal, animate being, beast, brute, creature, fauna',
    'bicycle, bike, wheel, cycle ', 'lake',
    'dishwasher, dish washer, dishwashing machine',
    'screen, silver screen, projection screen', 'blanket, cover',
    'sculpture', 'hood, exhaust hood', 'sconce', 'vase',
    'traffic light, traffic signal, stoplight', 'tray',
    'ashcan, trash can, garbage can, wastebin, ash bin, ash-bin, ashbin, dustbin, trash barrel, trash bin',
    'fan', 'pier, wharf, wharfage, dock', 'crt screen', 'plate',
    'monitor, monitoring device', 'bulletin board, notice board', 'shower',
    'radiator', 'glass, drinking glass', 'clock', 'flag',
]


def _ade_colors(n=150):
    colors = [[0, 0, 0]]  # background/unlabeled first (ade.py:40-41)
    for i in range(n):
        h = (i * 0.6180339887498949) % 1.0
        s = 0.55 + 0.45 * ((i * 7) % 3) / 2.0
        v = 0.65 + 0.35 * ((i * 11) % 5) / 4.0
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        colors.append([int(r * 255), int(g * 255), int(b * 255)])
    return colors


class ADE(ManifestDataset):
    num_classes = 150
    ignore_label = -1

    def _fetch_data(self, img_path, gt_path, dtype=np.float32):
        # gt read as float32 (reference ade.py:20-24)
        img = self._open_image(img_path)
        gt = self._open_image(gt_path, cv2.IMREAD_GRAYSCALE, dtype=dtype)
        return img, gt

    @staticmethod
    def _process_item_names(item: str):
        # ADE manifests hold only the image name; gt path is derived
        # (reference ade.py:26-32)
        item = item.strip()
        return item, item.split(".")[0] + ".png"

    @classmethod
    def get_class_colors(cls):
        return _ade_colors(cls.num_classes)

    @classmethod
    def get_class_names(cls):
        return list(ADE_CLASS_NAMES)
