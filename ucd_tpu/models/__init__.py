from .layers import ABN, conv, global_avg_pool
from .resnet import ResNet, ResidualBlock, make_backbone
from .deeplab import DeeplabV3
from .segmentation import (
    IncrementalSegmentationModel,
    att_map,
    init_new_classifier,
    make_model,
    merge_old_params,
    resize_bilinear,
    trainable_mask,
)

__all__ = [
    "ABN", "conv", "global_avg_pool", "ResNet", "ResidualBlock",
    "make_backbone", "DeeplabV3", "IncrementalSegmentationModel", "att_map",
    "init_new_classifier", "make_model", "merge_old_params", "resize_bilinear",
    "trainable_mask",
]
