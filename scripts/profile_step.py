"""Capture a jax.profiler trace of the full UCD train step on the bench
backend and print the top-op self-time table.

Usage:  python scripts/profile_step.py [outdir]
Env knobs mirror bench.py (BENCH_BATCH/BENCH_SIZE/BENCH_METHOD/...).

The table this produces backs BASELINE.md's profile-guided analysis (the
reference has no profiling at all — SURVEY.md §5.1); parsing uses the xprof
package's xspace converter so no TensorBoard UI is needed.
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    """Same construction as bench.py main() — one jitted UCD step."""
    import jax
    import jax.numpy as jnp

    from ucd_tpu import config
    from ucd_tpu.engine import build_train_state, make_train_step
    from ucd_tpu.models import make_model

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    backbone = os.environ.get("BENCH_BACKBONE", "resnet101")
    method = os.environ.get("BENCH_METHOD", "UCD")
    step = 1 if method == "UCD" else 0
    dataset = os.environ.get("BENCH_DATASET", "voc")
    task = {"voc": "15-5s", "ade": "100-50", "city": "13-6s"}[dataset]
    cfg = config.make_config(
        dataset=dataset, task=task, step=step, method=method,
        backbone=backbone, crop_size=size, batch_size=batch,
        dtype="bfloat16",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        contrastive_capacity=int(os.environ.get("BENCH_CON_CAP", "0")),
        use_pallas_contrastive=os.environ.get("BENCH_PALLAS", "1") == "1",
        bf16_upsample=os.environ.get("BENCH_BF16_UP", "1") == "1",
        bf16_norm=os.environ.get("BENCH_BF16_NORM", "0") == "1",
        fused_loss=os.environ.get("BENCH_FUSED", "1") == "1",
    )
    cfg0 = config.make_config(dataset=dataset, task=task, step=0,
                              backbone=backbone, crop_size=size,
                              dtype="bfloat16")
    model = make_model(cfg)
    if method == "UCD":
        model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])
        state0, _ = build_train_state(cfg0, model_old, jax.random.key(0),
                                      total_iters=100,
                                      input_shape=(1, size, size, 3))
        prev = {"params": state0.params, "batch_stats": state0.batch_stats}
        state, old_vars = build_train_state(cfg, model, jax.random.key(1),
                                            total_iters=100,
                                            prev_model_state=prev,
                                            input_shape=(1, size, size, 3))
    else:
        model_old = None
        old_vars = None
        state, _ = build_train_state(cfg, model, jax.random.key(1),
                                     total_iters=100,
                                     input_shape=(1, size, size, 3))

    rng = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.tot_classes, size=(batch, size, size)),
            jnp.int32),
    }
    # PROFILE_TARGET=eval captures the validate-path program instead
    # (VERDICT r4 next #4: the eval decomposition was never traced)
    if os.environ.get("PROFILE_TARGET", "train") == "eval":
        from ucd_tpu.engine.metrics import empty_confusion
        from ucd_tpu.engine.train import make_eval_step

        eval_fn = jax.jit(make_eval_step(cfg, model, model_old))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        hist0 = empty_confusion(cfg.tot_classes)

        def step(state_unused, batch, old):
            args = (variables, batch, hist0) + (
                (old,) if model_old is not None else ())
            h, losses, _ = eval_fn(*args)
            return state_unused, {"loss_tot": losses["loss"], "hist": h}

        return step, state, batch_data, old_vars, batch

    donate = (0,) if os.environ.get("UCD_TPU_DONATE") == "1" else ()
    train_step = jax.jit(make_train_step(cfg, model, model_old,
                                         total_iters=100),
                         donate_argnums=donate)
    return train_step, state, batch_data, old_vars, batch


def summarize_xspace(outdir, topk=25):
    """Parse the captured .xplane.pb with xprof and print op tables."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("NO XPLANE FILES under", outdir)
        return None
    xspace = [paths[-1]]
    try:
        names = rtd.xspace_to_tool_names(xspace)
        print("tools:", names)
    except Exception as e:
        print("tool-name listing failed:", e)

    # framework_op_stats == the per-op table (formerly tensorflow_stats)
    for tool in ("framework_op_stats", "op_profile", "overview_page"):
        try:
            data, _ = rtd.xspace_to_tool_data(xspace, tool, {"tqx": "out:csv;"})
            fn = os.path.join(outdir, f"{tool}.out")
            with open(fn, "w") as f:
                f.write(data if isinstance(data, str)
                        else data.decode("utf-8", "replace"))
            print(f"wrote {fn} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool} failed: {e}")
    return paths[-1]


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ucd_profile"
    os.makedirs(outdir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ucd_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    train_step, state, batch_data, old_vars, batch = build_step()

    # compile + warmup with value fetch
    for _ in range(2):
        state, m = train_step(state, batch_data, old_vars)
        float(m["loss_tot"])

    steps = int(os.environ.get("PROFILE_STEPS", "5"))
    jax.profiler.start_trace(outdir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, batch_data, old_vars)
    loss = float(m["loss_tot"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(json.dumps({"img_per_s": round(batch * steps / dt, 2),
                      "loss": loss, "trace_dir": outdir}))
    summarize_xspace(outdir)


if __name__ == "__main__":
    main()
