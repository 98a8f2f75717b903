"""Streaming segmentation metrics: device-side confusion matrix.

Rebuild of `StreamSegMetrics` (/root/reference/metrics/stream_metrics.py:34-137).
The reference accumulates a numpy confusion matrix per rank and reduces it to
rank 0 with torch.distributed; here the per-batch histogram is computed inside
the jitted eval step (`confusion_matrix_update`) so under SPMD sharding the
bincount reduces across devices automatically, and the host only ever sees the
already-global matrix. Result computation (`results_from_confusion`) matches
the reference's Overall/Mean Acc, FreqW Acc, Mean IoU and per-class
breakdowns, including the "X" placeholder for absent classes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def confusion_matrix_update(hist: jnp.ndarray, labels: jnp.ndarray,
                            preds: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """hist += bincount(n*true + pred) over valid pixels
    (reference metrics/stream_metrics.py:65-71). jit-safe."""
    valid = (labels >= 0) & (labels < n_classes)
    idx = jnp.where(valid, labels * n_classes + preds, 0)
    counts = jnp.bincount(idx.reshape(-1),
                          weights=valid.reshape(-1).astype(jnp.float32),
                          length=n_classes * n_classes)
    return hist + counts.reshape(n_classes, n_classes)


def empty_confusion(n_classes: int) -> jnp.ndarray:
    return jnp.zeros((n_classes, n_classes), jnp.float32)


def results_from_confusion(hist: np.ndarray, total_samples: int = 0) -> dict:
    """Reference metrics/stream_metrics.py:73-106."""
    EPS = 1e-6
    hist = np.asarray(hist, np.float64)
    gt_sum = hist.sum(axis=1)
    mask = gt_sum != 0
    diag = np.diag(hist)

    acc = diag.sum() / max(hist.sum(), EPS)
    acc_cls_c = diag / (gt_sum + EPS)
    acc_cls = np.mean(acc_cls_c[mask]) if mask.any() else 0.0
    iu = diag / (gt_sum + hist.sum(axis=0) - diag + EPS)
    mean_iu = np.mean(iu[mask]) if mask.any() else 0.0
    freq = gt_sum / max(hist.sum(), EPS)
    fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    n = hist.shape[0]
    cls_iu = {i: (iu[i] if mask[i] else "X") for i in range(n)}
    cls_acc = {i: (acc_cls_c[i] if mask[i] else "X") for i in range(n)}
    return {
        "Total samples": total_samples,
        "Overall Acc": acc,
        "Mean Acc": acc_cls,
        "FreqW Acc": fwavacc,
        "Mean IoU": mean_iu,
        "Class IoU": cls_iu,
        "Class Acc": cls_acc,
    }


def results_to_str(results: dict) -> str:
    """reference metrics/stream_metrics.py:49-63."""
    out = "\n"
    for k, v in results.items():
        if k not in ("Class IoU", "Class Acc", "Confusion Matrix"):
            out += f"{k}: {v:f}\n" if isinstance(v, float) else f"{k}: {v}\n"
    out += "Class IoU:\n"
    for k, v in results["Class IoU"].items():
        out += f"\tclass {k}: {v}\n"
    out += "Class Acc:\n"
    for k, v in results["Class Acc"].items():
        out += f"\tclass {k}: {v}\n"
    return out


class AverageMeter:
    """Keyed running means (reference metrics/stream_metrics.py:140-165)."""

    def __init__(self):
        self.book: dict = {}

    def reset_all(self):
        self.book.clear()

    def reset(self, key):
        if key in self.book:
            self.book[key] = [0, 0]

    def update(self, key, val):
        rec = self.book.setdefault(key, [0, 0])
        rec[0] += val
        rec[1] += 1

    def get_results(self, key):
        rec = self.book[key]
        return rec[0] / rec[1]


def confusion_matrix_figure(hist: np.ndarray, save_path: str = None):
    """Row-normalized confusion-matrix heatmap (reference
    metrics/stream_metrics.py:124-137 `confusion_matrix_to_fig` /
    `save_conf_matrix`). Returns the matplotlib figure; saves a PNG when
    `save_path` is given. Lazily imports matplotlib (Agg backend) so
    headless TPU hosts work."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hist = np.asarray(hist, np.float64)
    cm = hist / (hist.sum(axis=1, keepdims=True) + 1e-6)
    fig, ax = plt.subplots()
    im = ax.imshow(cm, interpolation="nearest", cmap=plt.cm.viridis)
    ax.figure.colorbar(im, ax=ax)
    ax.set(title="Confusion Matrix", ylabel="True label",
           xlabel="Predicted label")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path)
        plt.close(fig)
    return fig
