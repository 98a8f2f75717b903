"""Headline benchmark: UCD incremental-training step throughput on one chip.

Measures the full hot loop of the reference (train.py:76-151): frozen donor
forward + new-model forward + UnbiasedCE + UCD contrastive + UnbiasedKD +
backward + SGD update, DeepLab-v3/ResNet-101 @ 512^2, bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput (BASELINE.md). We use an
estimated 25 images/s/GPU for the PyTorch+apex(O0, fp32) reference on A100
(DeepLab-v3 R101 512^2 training, batch 12/GPU) as the per-chip comparison
denominator; BASELINE.md records the ≥3x per-chip target.
"""

import json
import os
import sys
import time

import numpy as np

A100_REF_IMG_PER_S = 25.0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the minutes-long
    # XLA compile through the TPU tunnel
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ucd_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ucd_tpu import config
    from ucd_tpu.engine import build_train_state, make_train_step
    from ucd_tpu.models import make_model

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    backbone = os.environ.get("BENCH_BACKBONE", "resnet101")

    cfg = config.make_config(
        dataset="voc", task="15-5s", step=1, method="UCD",
        backbone=backbone, crop_size=size, batch_size=batch,
        dtype="bfloat16",
        contrastive_capacity=int(os.environ.get("BENCH_CON_CAP", "0")),
        use_pallas_contrastive=os.environ.get("BENCH_PALLAS", "1") == "1",
        bf16_upsample=os.environ.get("BENCH_BF16_UP", "1") == "1",
        bf16_norm=os.environ.get("BENCH_BF16_NORM", "0") == "1",
    )
    cfg0 = config.make_config(dataset="voc", task="15-5s", step=0,
                              backbone=backbone, crop_size=size,
                              dtype="bfloat16")

    model = make_model(cfg)
    model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])

    state0, _ = build_train_state(cfg0, model_old, jax.random.key(0),
                                  total_iters=100,
                                  input_shape=(1, size, size, 3))
    prev = {"params": state0.params, "batch_stats": state0.batch_stats}
    state, old_vars = build_train_state(cfg, model, jax.random.key(1),
                                        total_iters=100,
                                        prev_model_state=prev,
                                        input_shape=(1, size, size, 3))
    del state0

    rng = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(rng.randn(batch, size, size, 3),
                             jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.tot_classes, size=(batch, size, size)),
            jnp.int32),
    }

    # NOTE: no buffer donation — the axon TPU backend miscompiles donated
    # step>0 graphs (INVALID_ARGUMENT); costs one extra param copy in HBM
    train_step = jax.jit(make_train_step(cfg, model, model_old,
                                         total_iters=100))

    # compile + warmup (value fetch, not just block_until_ready: on the
    # tunneled backend only a concrete transfer forces the chain)
    state, m = train_step(state, batch_data, old_vars)
    float(m["loss_tot"])
    state, m = train_step(state, batch_data, old_vars)
    float(m["loss_tot"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, batch_data, old_vars)
    loss = float(m["loss_tot"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    img_per_s = batch * steps / dt
    print(json.dumps({
        "metric": "ucd_train_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "images/s",
        "vs_baseline": round(img_per_s / A100_REF_IMG_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
