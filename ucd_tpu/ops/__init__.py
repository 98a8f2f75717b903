from . import losses, regularizers
from .assignment import shoot_infs, sinkhorn_knopp
from .contrastive import (
    ContrastiveBatch,
    build_contrastive_batch,
    compact_batch,
    downsample_labels,
    pixel_contrastive_loss,
    ucd_contrastive_loss,
)
from .contrastive_v1 import pixel_con_loss_v1, sup_con_loss
from .fused_eval import fused_argmax, fused_argmax_dense
from .fused_loss import fused_ce_kd, fused_ce_kd_dense
from .pallas_contrastive import pixel_contrastive_loss_pallas

__all__ = [
    "losses", "regularizers", "shoot_infs", "sinkhorn_knopp",
    "ContrastiveBatch", "build_contrastive_batch", "compact_batch",
    "downsample_labels", "pixel_contrastive_loss", "ucd_contrastive_loss",
    "pixel_con_loss_v1", "sup_con_loss",
    "pixel_contrastive_loss_pallas", "fused_ce_kd", "fused_ce_kd_dense",
    "fused_argmax", "fused_argmax_dense",
]
