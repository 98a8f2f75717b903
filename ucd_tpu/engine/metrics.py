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
import jax
import jax.numpy as jnp


def confusion_matrix_update(hist: jnp.ndarray, labels: jnp.ndarray,
                            preds: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """hist[i, j] += #pixels with (true == i, pred == j), valid pixels only
    (reference metrics/stream_metrics.py:65-71). jit-safe.

    TPU formulation: NOT a bincount — jnp.bincount lowers to a scatter-add
    over every pixel, which serializes on TPU (measured 36.6 ms/step at
    batch 16@512², 52%% of eval device time, round-5 trace). Instead the
    update is a chunked one-hot contraction on the MXU:
    hist += onehot(labels·valid)ᵀ @ onehot(preds), scanned over pixel
    chunks so the transient one-hots stay bounded (~60 MB at ADE's 151
    classes). bf16 one-hots with f32 accumulation are exact: every product
    is 0/1 and per-chunk counts stay far below 2²⁴. The running hist is
    int32 (exact to 2³¹ — an f32 hist silently drops +1s past 2²⁴, which a
    full-size VOC val sweep exceeds on the background diagonal)."""
    l = labels.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    valid = (l >= 0) & (l < n_classes)
    n = l.shape[0]
    chunk = min(262144, -(-n // 8) * 8)
    k = -(-n // chunk)
    pad = k * chunk - n
    if pad:
        l = jnp.pad(l, (0, pad))
        p = jnp.pad(p, (0, pad))
        valid = jnp.pad(valid, (0, pad))  # padded pixels are invalid
    ids = jnp.arange(n_classes, dtype=jnp.int32)

    def chunk_counts(li, pi, vi):
        a = ((li[:, None] == ids) & vi[:, None]).astype(jnp.bfloat16)
        b = (pi[:, None] == ids).astype(jnp.bfloat16)
        c = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return c.astype(jnp.int32)

    if k == 1:
        return hist + chunk_counts(l, p, valid)

    def body(h, xs):
        return h + chunk_counts(*xs), None

    shaped = (l.reshape(k, chunk), p.reshape(k, chunk),
              valid.reshape(k, chunk))
    out, _ = jax.lax.scan(body, hist.astype(jnp.int32), shaped)
    return out


def empty_confusion(n_classes: int) -> jnp.ndarray:
    return jnp.zeros((n_classes, n_classes), jnp.int32)


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
