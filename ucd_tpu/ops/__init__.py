from . import losses
from .contrastive import (
    ContrastiveBatch,
    build_contrastive_batch,
    compact_batch,
    downsample_labels,
    pixel_contrastive_loss,
    ucd_contrastive_loss,
)

__all__ = [
    "losses", "ContrastiveBatch", "build_contrastive_batch", "compact_batch",
    "downsample_labels", "pixel_contrastive_loss", "ucd_contrastive_loss",
]
