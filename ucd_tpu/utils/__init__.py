from .viz import (
    Denormalize,
    Label2Color,
    ade_cmap,
    attention_map,
    cityscapes_cmap,
    color_map,
    compose_sample_png,
    voc_cmap,
)
from .reporting import aggregate_csv, format_report, write_step_csv

__all__ = [
    "Denormalize", "Label2Color", "ade_cmap", "attention_map",
    "cityscapes_cmap", "color_map", "compose_sample_png", "voc_cmap",
    "aggregate_csv", "format_report", "write_step_csv",
]
