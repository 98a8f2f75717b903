from .layers import ABN, conv, global_avg_pool
from .resnet import (IdentityResidualBlock, ResNet, ResidualBlock,
                     make_backbone)
from .deeplab import DeeplabV3
from .nonlocal_block import NonLocalBlock2D
from .pretrained import convert_torch_body, load_pretrained_body
from .segmentation import (
    IncrementalSegmentationModel,
    SegmentationModel,
    att_map,
    init_new_classifier,
    make_model,
    merge_old_params,
    resize_bilinear,
    trainable_mask,
)

__all__ = [
    "ABN", "conv", "global_avg_pool", "ResNet", "ResidualBlock",
    "IdentityResidualBlock",
    "make_backbone", "DeeplabV3", "NonLocalBlock2D", "convert_torch_body",
    "load_pretrained_body", "IncrementalSegmentationModel",
    "SegmentationModel", "att_map", "init_new_classifier", "make_model",
    "merge_old_params", "resize_bilinear", "trainable_mask",
]
