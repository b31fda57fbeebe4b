from simclr_tpu.models.resnet import Bottleneck, ResNetEncoder, SupervisedResNet
from simclr_tpu.models.simclr import ProjectionHead, SimCLR, SimCLRFineTune
from simclr_tpu.models.mine import MineNet

__all__ = [
    "Bottleneck",
    "ResNetEncoder",
    "SupervisedResNet",
    "ProjectionHead",
    "SimCLR",
    "SimCLRFineTune",
    "MineNet",
]
