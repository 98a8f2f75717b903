from . import transforms
from .datasets import (
    AdeSegmentation,
    CitySegmentation,
    CityscapesSegmentationDomain,
    LearnableSynthetic,
    SyntheticSegmentation,
    VOCSegmentation,
    make_incremental_dataset,
)
from .incremental import (
    Subset,
    ade_remap_lut,
    build_remap_lut,
    city_remap_lut,
    filter_images,
    voc_remap_lut,
)
from .loader import DataLoader, split_train_val
from .native import has_native, normalize_image, pil_resize_pair, remap_labels

__all__ = [
    "transforms", "AdeSegmentation", "CitySegmentation",
    "CityscapesSegmentationDomain", "LearnableSynthetic",
    "SyntheticSegmentation", "VOCSegmentation",
    "make_incremental_dataset", "Subset", "ade_remap_lut", "build_remap_lut",
    "city_remap_lut", "filter_images", "voc_remap_lut", "DataLoader",
    "split_train_val", "has_native", "normalize_image", "pil_resize_pair",
    "remap_labels",
]
