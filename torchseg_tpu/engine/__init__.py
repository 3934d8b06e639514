from .lr_policy import PolyLR, MultiStageLR, LinearIncreaseLR
from .optim import sgd_init, sgd_update, make_lr_mult_tree, make_wd_tree
from .trainer import TrainState, Trainer
from .checkpoint import save_checkpoint, restore_checkpoint, link_last
from .logger import get_logger
