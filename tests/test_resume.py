"""Elastic recovery: kill a training run mid-flight, resume, continue
bit-identically.

Closes SURVEY §5's failure-recovery promise end-to-end: a run is SIGKILLed
right after it writes its update-2 checkpoint, restarted with ``--resume`` in
a fresh process, and every post-resume metric (loss, reward, entropy, ...)
must equal the uninterrupted run's bit-for-bit — the checkpoint captures the
complete system state (params, optimizer, env batch, PRNG key, update index),
so the continuation is the same pure function of the same inputs.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

_ARGS = [
    "--envs", "32", "--size", "6", "--max-steps", "16",
    "--rollout-steps", "8", "--hidden", "16", "--seed", "3",
    "--log-every", "1", "--ckpt-every", "2",
]
# timing/rate fields legitimately differ between runs
_VOLATILE = {"env_steps_per_s", "wall_s"}


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _metrics(lines):
    out = {}
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        rec = json.loads(line)
        if "update" in rec and "loss" in rec:
            out[rec["update"]] = {
                k: v for k, v in rec.items() if k not in _VOLATILE
            }
    return out


def _run(ckpt_dir, updates, resume=False):
    cmd = [sys.executable, "-m", "gym_craftingworld_tpu.train.run",
           *_ARGS, "--updates", str(updates), "--ckpt-dir", ckpt_dir]
    if resume:
        cmd.append("--resume")
    res = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    return _metrics(res.stdout.splitlines())


def test_killed_run_resumes_bit_identically(tmp_path):
    dir_a = str(tmp_path / "uninterrupted")
    dir_b = str(tmp_path / "killed")

    # Uninterrupted 4-update run (checkpoints at 2 and 4, unused).
    full = _run(dir_a, updates=4)
    assert set(full) == {0, 1, 2, 3}

    # Second run: SIGKILL the moment the update-2 checkpoint lands.
    cmd = [sys.executable, "-m", "gym_craftingworld_tpu.train.run",
           *_ARGS, "--updates", str(4), "--ckpt-dir", dir_b]
    proc = subprocess.Popen(cmd, env=_env(), stdout=subprocess.PIPE,
                            text=True)
    pre_kill = []
    deadline = time.time() + 600
    try:
        for line in proc.stdout:
            pre_kill.append(line)
            if '"checkpoint"' in line and "step_2" in line:
                os.kill(proc.pid, signal.SIGKILL)
                break
            assert time.time() < deadline, "no checkpoint before deadline"
        else:
            pytest.fail(f"run ended without checkpointing: {pre_kill}")
    finally:
        proc.wait(timeout=60)

    pre = _metrics(pre_kill)
    assert set(pre) >= {0, 1}
    # pre-kill updates already match the uninterrupted run (same seed)
    for u in (0, 1):
        assert pre[u] == full[u]

    # Fresh process, --resume: must continue at update 2 and reproduce the
    # uninterrupted run's metrics exactly.
    resumed = _run(dir_b, updates=4, resume=True)
    assert set(resumed) == {2, 3}, resumed.keys()
    for u in (2, 3):
        assert resumed[u] == full[u], (
            f"update {u} diverged after resume:\n{resumed[u]}\nvs\n{full[u]}"
        )
