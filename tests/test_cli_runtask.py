"""CLI driver end-to-end: `run-task` runs every step of an incremental task
in one process (train -> ckpt -> next step picks it up -> aggregate report),
on synthetic data. Exercises cli.main exactly as a user would
(reference workflow: one torch.distributed.launch per step + average_csv)."""

import json
import os

import pytest

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow


def test_run_task_two_steps(tmp_path, capsys):
    from ucd_tpu.cli import main

    rc = main([
        "run-task", "--dataset", "voc", "--task", "19-1", "--step", "0",
        "--method", "LWF", "--backbone", "resnet50", "--crop_size", "32",
        "--batch_size", "4", "--epochs", "1", "--lr", "0.01",
        "--dtype", "float32", "--no_pretrained", "--synthetic", "10",
        "--logdir", str(tmp_path / "logs"),
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # one JSON result line per step
    step_lines = [json.loads(l) for l in out.splitlines()
                  if l.startswith("{") and "mean_iou" in l]
    assert [s["step"] for s in step_lines] == [0, 1]
    # both step checkpoints exist
    assert os.path.exists(str(tmp_path / "ckpt" / "19-1-voc_Experiment_0"))
    assert os.path.exists(str(tmp_path / "ckpt" / "19-1-voc_Experiment_1"))
    # aggregate report (average_csv.py equivalent) printed
    assert "Final mIoU" in out
    csv_path = str(tmp_path / "logs" / "19-1-voc" / "Experiment" /
                   "results.csv")
    assert os.path.exists(csv_path)
