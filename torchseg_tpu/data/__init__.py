from .base import ManifestDataset, SyntheticDataset
from .cityscapes import Cityscapes
from .voc import VOC
from .ade import ADE
from .camvid import CamVid
from .pascal_context import PascalContext
from .preprocess import SegTrainPre, ADETrainPre, DFNTrainPre
from .loader import TrainLoader
