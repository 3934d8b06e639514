from .base import ManifestDataset, SyntheticDataset
from .cityscapes import Cityscapes
from .voc import VOC
from .ade import ADE
from .preprocess import SegTrainPre, ADETrainPre, DFNTrainPre
from .loader import TrainLoader
