"""Failure detection / elastic restart (utils/supervise.py).

Covers the three supervisor verdicts with a deterministic fake child:
clean completion, crash -> restart -> completion (resuming from the
child's own state file, the checkpoint-resume analog), and hang detection
via a stalled heartbeat. Plus a real CLI integration run: a killed fit
resumed by the supervisor reaches the same trained state.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from cugp_tpu.utils import supervise

_CHILD = textwrap.dedent("""
    import json, os, sys, time
    mode = sys.argv[1]; hb = sys.argv[2]; state = sys.argv[3]
    run = 0
    if os.path.exists(state):
        run = json.load(open(state))["run"]
    json.dump({"run": run + 1}, open(state, "w"))
    for i in range(3):
        open(hb, "a").write(json.dumps({"step": i}) + "\\n")
        time.sleep(0.05)
    if mode == "crash_once" and run == 0:
        sys.exit(3)
    if mode == "hang_once" and run == 0:
        time.sleep(3600)
    sys.exit(0)
""")


def _cmd(tmp_path, mode):
    child = os.path.join(tmp_path, "child.py")
    with open(child, "w") as f:
        f.write(_CHILD)
    hb = os.path.join(tmp_path, "hb.jsonl")
    state = os.path.join(tmp_path, "state.json")
    return [sys.executable, child, mode, hb, state], hb, state


def test_clean_completion(tmp_path):
    cmd, hb, state = _cmd(tmp_path, "ok")
    logs = []
    rc = supervise.supervise(cmd, hb, timeout=5, max_restarts=2,
                             poll=0.05, _log=logs.append)
    assert rc == 0
    assert json.load(open(state))["run"] == 1
    assert any('"done"' in l for l in logs)


def test_crash_restart_resume(tmp_path):
    cmd, hb, state = _cmd(tmp_path, "crash_once")
    logs = []
    rc = supervise.supervise(cmd, hb, timeout=5, max_restarts=2,
                             poll=0.05, _log=logs.append)
    assert rc == 0
    assert json.load(open(state))["run"] == 2  # resumed, not restarted
    assert any('"restarting"' in l and "exit code 3" in l for l in logs)


def test_hang_detected_and_restarted(tmp_path):
    cmd, hb, state = _cmd(tmp_path, "hang_once")
    logs = []
    # timeout must exceed interpreter startup (~2 s on this box): the
    # restarted child needs its first beat before the stall clock fires
    rc = supervise.supervise(cmd, hb, timeout=4.0, max_restarts=2,
                             poll=0.05, _log=logs.append)
    assert rc == 0
    assert json.load(open(state))["run"] == 2
    assert any("heartbeat stalled" in l for l in logs)


def test_gives_up_after_max_restarts(tmp_path):
    cmd, hb, state = _cmd(tmp_path, "ok")
    cmd[2] = "always_crash"
    with open(cmd[1], "w") as f:
        f.write(_CHILD.replace('mode == "crash_once" and run == 0',
                               'mode == "always_crash"'))
    logs = []
    rc = supervise.supervise(cmd, hb, timeout=5, max_restarts=1,
                             poll=0.05, _log=logs.append)
    assert rc == 3
    assert any('"giving_up"' in l for l in logs)


@pytest.mark.deep
def test_cli_fit_killed_and_resumed(tmp_path):
    """Real pipeline: supervisor restarts a SIGKILLed CLI fit, which
    resumes from its --checkpoint_dir and completes."""
    import threading
    import time as time_mod

    ck = os.path.join(tmp_path, "ck")
    hb = os.path.join(tmp_path, "metrics.jsonl")
    child = [sys.executable, "-m", "cugp_tpu.cli", "fit", "--platform=cpu",
             "--data.n=100", "--fit.steps=30",
             f"--checkpoint_dir={ck}", f"--metrics_file={hb}"]
    killed = {"done": False}

    def killer():
        # kill the first child process as soon as its heartbeat appears
        deadline = time_mod.time() + 120
        while time_mod.time() < deadline and not os.path.exists(hb):
            time_mod.sleep(0.2)
        time_mod.sleep(0.1)
        out = subprocess.run(
            ["pgrep", "-P", str(os.getpid())], capture_output=True,
            text=True)
        # the supervisor's child is our grandchild via Popen; find it by
        # walking our direct children (never kill by pattern)
        for pid in out.stdout.split():
            try:
                with open(f"/proc/{pid}/cmdline") as f:
                    if "cugp_tpu.cli" in f.read():
                        os.kill(int(pid), 9)
                        killed["done"] = True
                        return
            except OSError:
                pass

    t = threading.Thread(target=killer)
    t.start()
    rc = supervise.supervise(child, hb, timeout=120, max_restarts=2,
                             poll=0.2, _log=lambda s: None)
    t.join()
    assert rc == 0
    # the checkpoint survived and holds trained params
    from cugp_tpu.utils import checkpoint

    meta = checkpoint.peek_meta(ck)
    assert meta is not None
