"""Six-step 15-5s retention curve through the REAL CLI (VERDICT r2 item 5).

`run-task` executes all 6 steps of VOC 15-5s in one process — restore from
the previous step's checkpoint, grow the classifier, MiB imprinting, donor
chain, regularizer carry — on the learnable color-coded synthetic task
(--synthetic_learnable), for UCD and for plain FT. The aggregate report
(reference average_csv.py semantics) must show UCD retaining the first-15
classes better than FT, which forgets catastrophically.

This exercises the exact end-user journey of the reference
(/root/reference/README.md:62-65: one torch.distributed.launch per step +
average_csv.py) end-to-end in one command, with metrics asserted.
"""

import csv
import json
import os

import pytest

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

N_IMAGES = 48
EPOCHS = 25


def _run_task(tmp_path, method):
    from ucd_tpu.cli import main

    logdir = str(tmp_path / f"logs_{method}")
    rc = main([
        "run-task", "--dataset", "voc", "--task", "15-5s", "--step", "0",
        "--method", method, "--backbone", "resnet50", "--crop_size", "64",
        "--output_stride", "8", "--batch_size", "8",
        "--epochs", str(EPOCHS), "--lr", "0.1", "--overlap",
        "--dtype", "float32", "--no_pretrained",
        "--synthetic_learnable", str(N_IMAGES),
        "--no_pallas", "--contrastive_capacity", "256",
        "--logdir", logdir,
        "--ckpt_dir", str(tmp_path / f"ckpt_{method}"),
    ])
    assert rc == 0
    csv_path = os.path.join(logdir, "15-5s-voc", "Experiment", "results.csv")
    assert os.path.exists(csv_path)
    return csv_path


def _per_step_breakdown(csv_path):
    """[(step, old_1_15, new_16_20, all)] per CSV row, 'X' -> absent."""
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    out = []
    for row in rows[1:]:
        step = int(row[0])
        vals = row[1:]

        def mean(sl):
            nums = [float(v) for v in sl
                    if v not in ("X", "") and v is not None]
            return sum(nums) / len(nums) if nums else float("nan")

        out.append((step, mean(vals[1:16]), mean(vals[16:21]), mean(vals)))
    return out


def test_six_step_15_5s_ucd_beats_ft(tmp_path):
    ucd_csv = _run_task(tmp_path, "UCD")
    ft_csv = _run_task(tmp_path, "FT")

    ucd = _per_step_breakdown(ucd_csv)
    ft = _per_step_breakdown(ft_csv)
    print("step |        UCD old/new/all        |        FT old/new/all")
    for (s, uo, un, ua), (_, fo, fn_, fa) in zip(ucd, ft):
        print(f"  {s}  | {uo:.3f} / {un:.3f} / {ua:.3f} | "
              f"{fo:.3f} / {fn_:.3f} / {fa:.3f}")

    assert [r[0] for r in ucd] == list(range(6))
    assert [r[0] for r in ft] == list(range(6))

    # step 0 must actually learn the first 15 classes (same config for both)
    assert ucd[0][1] > 0.3, f"step 0 didn't learn: {ucd[0]}"

    # final step: UCD retains the first-15 classes; FT forgets them.
    ucd_final_old, ft_final_old = ucd[-1][1], ft[-1][1]
    assert ucd_final_old > ft_final_old + 0.05, (
        f"UCD old-class retention {ucd_final_old:.3f} does not beat "
        f"FT {ft_final_old:.3f}")
    # all-step average over the old classes: UCD above FT as well
    ucd_avg_old = sum(r[1] for r in ucd[1:]) / 5
    ft_avg_old = sum(r[1] for r in ft[1:]) / 5
    assert ucd_avg_old > ft_avg_old, (ucd_avg_old, ft_avg_old)

    # machine-readable datum for BASELINE.md
    print("RETENTION " + json.dumps({
        "ucd": [(r[0], round(r[1], 4), round(r[2], 4), round(r[3], 4))
                for r in ucd],
        "ft": [(r[0], round(r[1], 4), round(r[2], 4), round(r[3], 4))
               for r in ft]}))
