"""torchseg_tpu — a TPU-native semantic segmentation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of TorchSeg
(yu-changqian/TorchSeg): ResNet-v1c / Xception39 backbones; FCN-32s, BiSeNet
(incl. real-time variants), PSPNet, PSANet and DFN heads; OHEM cross entropy
and sigmoid focal losses; cross-replica batch norm via mesh collectives; a
shard_map data-parallel trainer; and a batched sliding-window multi-scale+flip
evaluator.

Layout is NHWC (TPU-native); the compute path is pure JAX/XLA with Pallas
kernels for the hot fused ops.
"""

__version__ = "0.1.0"
