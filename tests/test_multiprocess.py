"""Real multi-process execution: 2 CPU processes with
jax.distributed.initialize (gloo collectives), each feeding its per-process
shard through the real Experiment loop, must produce the same loss and the
same trained params as the single-process run.

This is the TPU-native analog of the reference's 2-GPU NCCL launch
(/root/reference/run.py:117-124, README.md:62-65) — VERDICT.md round-2
missing item #1.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                        "--xla_cpu_multi_thread_eigen=false")
    env["OMP_NUM_THREADS"] = "1"
    return env


def _launch(args, env):
    return subprocess.Popen([sys.executable, WORKER] + [str(a) for a in args],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_two_process_matches_single_process(tmp_path):
    env = _scrubbed_env()
    port = _free_port()
    out2 = tmp_path / "two"
    out1 = tmp_path / "one"
    out2.mkdir(), out1.mkdir()

    # 2-process run (4 global devices = 2 local x 2 processes)
    procs = [_launch([pid, 2, port, out2], env) for pid in (0, 1)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    # single-process reference, same config/seeds/data
    p1 = _launch([0, 1, port, out1], env)
    log1 = p1.communicate(timeout=900)[0]
    assert p1.returncode == 0, f"single-proc worker failed:\n{log1[-4000:]}"

    r0 = json.loads((out2 / "p0.json").read_text())
    r1 = json.loads((out2 / "p1.json").read_text())
    rs = json.loads((out1 / "p0.json").read_text())

    assert r0["process_count"] == 2 and r0["n_devices"] == 4
    # both processes observe the same SPMD-reduced loss
    assert abs(r0["loss_tot"] - r1["loss_tot"]) < 1e-6
    # and it equals the single-process run on the same global batch
    assert abs(r0["loss_tot"] - rs["loss_tot"]) < 1e-4, (r0, rs)
    # one optimizer step produced the same params (grad allreduce == full
    # batch gradient) and eval metrics agree
    assert abs(r0["cls0_sum"] - rs["cls0_sum"]) < 1e-4
    assert abs(r0["val_miou"] - rs["val_miou"]) < 1e-5
    # the all-process orbax save on the shared ckpt dir completed (a
    # rank-0-only save deadlocks in orbax's sync_global_processes barrier)
    # and the checkpoint restores
    assert r0["ckpt_ok"] and r1["ckpt_ok"] and rs["ckpt_ok"]
    # crop_val=False is refused with a clear error under process_count>1
    assert r0["crop_val_guard"] and r1["crop_val_guard"]
    # eval sample count is the GLOBAL count (4 val images), not the local
    # shard's, in both topologies
    assert r0["val_total_samples"] == rs["val_total_samples"] == 4, (r0, rs)
