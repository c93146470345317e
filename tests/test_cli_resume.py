"""End-to-end CLI kill/resume (spark-submit surface).

Engine-level resume is covered by test_checkpoint.py; this drives the
actual process boundary: run the CLI with --checkpoint-dir, SIGKILL the
driver once a mid-run durable manifest exists, rerun with --resume, and
require the resumed output to equal an uninterrupted run bit-for-bit.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import duckdb


def _cli(args: list[str], env: dict, timeout: int = 600):
    return subprocess.run(
        [sys.executable, "-m", "graphlite_spark.cli", *args],
        capture_output=True, text=True, env=env, timeout=timeout,
    )


def _labels(path: str) -> list[tuple]:
    con = duckdb.connect()
    return con.execute(
        f"SELECT id, value FROM read_parquet('{path}/*.parquet') ORDER BY id"
    ).fetchall()


def test_cli_kill_and_resume(tmp_path):
    env = {**os.environ, "PYTHONPATH": "/root/repo", "SPARK_GRAFT_CPUS": "4"}
    events = "/root/testdata/sf0.001/events.parquet"
    iters = "12"
    out_ref = str(tmp_path / "out_ref")
    out_res = str(tmp_path / "out_resumed")

    # uninterrupted reference run (own checkpoint dir, same run config)
    ref = _cli(
        ["lpa", "--events", events, "--iterations", iters,
         "--output", out_ref, "--checkpoint-dir", str(tmp_path / "ck_ref"),
         "--checkpoint-every", "2", "--run-id", "r"],
        env,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_line = json.loads(ref.stdout.strip().splitlines()[-1])

    # run again, SIGKILL the whole process group once the superstep-4
    # manifest is durably published
    ck = tmp_path / "ck"
    marker = ck / "r" / "superstep=000004" / "manifest.json"
    proc = subprocess.Popen(
        [sys.executable, "-m", "graphlite_spark.cli",
         "lpa", "--events", events, "--iterations", iters,
         "--output", out_res, "--checkpoint-dir", str(ck),
         "--checkpoint-every", "2", "--run-id", "r"],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 420
    while time.time() < deadline and not marker.exists():
        if proc.poll() is not None:
            break
        time.sleep(0.25)
    assert proc.poll() is None, (
        "CLI run finished before the kill point — raise --iterations"
    )
    assert marker.exists(), "superstep-4 checkpoint never appeared"
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()

    # resume from the latest complete manifest and finish the run
    res = _cli(
        ["lpa", "--events", events, "--iterations", iters,
         "--output", out_res, "--checkpoint-dir", str(ck),
         "--checkpoint-every", "2", "--run-id", "r", "--resume"],
        env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    res_line = json.loads(res.stdout.strip().splitlines()[-1])
    assert res_line["supersteps"] == ref_line["supersteps"]
    assert _labels(out_res) == _labels(out_ref)
