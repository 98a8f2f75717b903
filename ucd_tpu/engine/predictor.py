"""Batched inference / serving entry.

The reference's eval path is tangled into test.py; this module provides a
standalone jitted predictor with optional test-time augmentation, giving the
reference's `--fusion-mode {mean,voting,max}` flag (argparser.py:134-135,
threaded into the model at segmentation_module.py but unused by any entry
point) a concrete semantics:

  mean   — average class probabilities over TTA views
  max    — elementwise max of probabilities over views
  voting — majority vote of per-view argmax predictions
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.segmentation import resize_bilinear
from ..ops import fused_eval as FE


class Predictor:
    def __init__(self, model, variables, fusion_mode: str = "mean",
                 flip: bool = False, scales: Sequence[float] = (1.0,),
                 fused: bool = True):
        assert fusion_mode in ("mean", "voting", "max")
        self.model = model
        # pin the weights on device ONCE: an npz-loaded tree (load_inference)
        # is host numpy, and passing numpy into a jitted call re-uploads the
        # ENTIRE model every dispatch — measured as multi-second serve
        # batches on the tunneled harness (~100 MB of params per call) and
        # a real PCIe tax on any host. No-op for already-resident arrays.
        self.variables = jax.device_put(variables)
        self.fusion_mode = fusion_mode
        self.flip = flip
        # normalize a bare float/int to a 1-view pyramid
        self.scales = ((float(scales),) if isinstance(scales, (int, float))
                       else tuple(float(s) for s in scales))
        self.fused = fused
        self._fwd = jax.jit(self._forward)
        self._fwd_labels = jax.jit(self._labels_only)

    def _forward(self, variables, images):
        if images.dtype == jnp.uint8:
            # normalize BEFORE the multi-scale pyramid: resize_bilinear
            # would otherwise hand the model f32 raw-RGB views that skip
            # the model's own uint8 normalization path
            from ..models.segmentation import normalize_uint8
            images = normalize_uint8(images)
        n_views_logits = []
        h, w = images.shape[1], images.shape[2]
        for s in self.scales:
            sh, sw = int(round(h * s)), int(round(w * s))
            x = images if s == 1.0 else resize_bilinear(images, (sh, sw))
            views = [x]
            if self.flip:
                views.append(x[:, :, ::-1, :])
            for i, v in enumerate(views):
                logits, _ = self.model.apply(variables, v, train=False)
                if i == 1:
                    logits = logits[:, :, ::-1, :]
                if logits.shape[1] != h:
                    logits = resize_bilinear(logits, (h, w))
                n_views_logits.append(logits.astype(jnp.float32))

        probs = [jax.nn.softmax(l, axis=-1) for l in n_views_logits]
        if self.fusion_mode == "mean":
            fused = sum(probs) / len(probs)
            return jnp.argmax(fused, axis=-1), fused
        if self.fusion_mode == "max":
            fused = probs[0]
            for p in probs[1:]:
                fused = jnp.maximum(fused, p)
            return jnp.argmax(fused, axis=-1), fused
        # voting: majority over per-view argmax
        n_classes = n_views_logits[0].shape[-1]
        votes = sum(jax.nn.one_hot(jnp.argmax(p, axis=-1), n_classes)
                    for p in probs)
        return jnp.argmax(votes, axis=-1), votes / len(probs)

    def _labels_only(self, variables, images):
        """Argmax-only deployment path. With a single view every fusion
        mode reduces to argmax(logits), so the fused upsample+argmax kernel
        (ops/fused_eval.py) applies and the full-res logits are never
        materialized; when the kernel doesn't cover the shape, the
        already-computed full-res logits are argmaxed directly (one model
        apply either way). TTA configurations take the full fusion.

        Class-id maps leave the device as uint8 (every supported dataset
        has <= 256 classes): 4x less device->host traffic than int32 —
        on tunneled/serving hosts the prediction fetch is a first-order
        cost (round-5 bench: the predict CLI is transfer-bound)."""
        if self.scales == (1.0,) and not self.flip:
            outputs, feats = self.model.apply(variables, images, train=False)
            if self.fused and FE.supported(feats["sem"].shape,
                                           images.shape[1:3]):
                preds = FE.fused_argmax(feats["sem"], images.shape[1:3])
            else:
                preds = jnp.argmax(outputs, axis=-1)
        else:
            preds, _ = self._forward(variables, images)
        return preds.astype(jnp.uint8)

    def predict_labels(self, images):
        """(B,H,W) uint8 class-id predictions only — the serving fast path
        (the full-res probability tensor is neither returned nor
        materialized for single-view configurations)."""
        return self._fwd_labels(self.variables, images)

    def __call__(self, images):
        """images: (B,H,W,3) normalized float32. Returns (preds, fused)."""
        return self._fwd(self.variables, images)
