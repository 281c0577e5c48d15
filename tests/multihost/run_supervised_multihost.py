"""Supervised multi-host kill/relaunch test (round-2 VERDICT item #8).

Exercises the per-host elastic-recovery story that utils/supervise.py
claims for jax.distributed jobs: two CPU processes run a distributed step
loop under independent heartbeat-watchdog supervisors; the COORDINATOR
process (rank 0) is SIGKILLed mid-run. Expected recovery, with no global
orchestrator:

  - rank 0's supervisor sees the nonzero exit and relaunches it; the
    fresh process re-binds the coordinator port and waits for peers;
  - rank 1, stalled in a collective against the dead peer, stops beating
    its heartbeat file; its supervisor declares it hung, kills the
    process group, and relaunches; the fresh process joins the fresh
    coordinator;
  - both resume from the shared checkpoint (rank-0-only write,
    collective-free restore) and run to completion.

Asserts: both supervisors exit 0, each logged at least one restart, and
the final checkpoint step equals the target (i.e. the work was finished,
not restarted from scratch).

Usage: python tests/multihost/run_supervised_multihost.py
"""

import json
import os
import signal
import subprocess
import sys
import time

TARGET_STEPS = 40
KILL_AT_STEP = 6


def worker():
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from cugp_tpu import runtime
    from cugp_tpu.utils import checkpoint as ckpt

    info = runtime.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=int(os.environ["NPROCS"]),
        process_id=int(os.environ["PID_IDX"]),
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    hb = os.environ["HB_FILE"]
    ck = os.path.join(os.environ["CK_DIR"], "state")
    probe = {"step": np.int64(0)}
    restored, _meta = ckpt.restore(ck, probe)
    step0 = int(restored["step"]) if restored is not None else 0

    for step in range(step0, TARGET_STEPS):
        # a real cross-process collective each step: all ranks must agree
        got = multihost_utils.process_allgather(jnp.asarray([step]))
        assert int(got.min()) == step == int(got.max()), got
        with open(hb, "a") as f:
            f.write(json.dumps({"step": step, "pid": os.getpid()}) + "\n")
        ckpt.save(ck, {"step": np.int64(step + 1)}, step=step + 1)
        multihost_utils.sync_global_devices(f"step{step}")
        time.sleep(float(os.environ.get("STEP_SLEEP", "0.35")))

    if info.process_index == 0:
        print(f"WORKER_DONE resumed_from={step0}", flush=True)


def _last_step(hb_path):
    try:
        with open(hb_path) as f:
            lines = f.read().strip().splitlines()
        return json.loads(lines[-1]) if lines else None
    except OSError:
        return None


def launcher():
    import tempfile

    root = tempfile.mkdtemp(prefix="mh_sup_")
    port = 8493
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    sups = []
    for i in range(2):
        env = dict(env_base)
        env.update({
            "_WORKER": "1",
            "COORD": f"127.0.0.1:{port}",
            "NPROCS": "2",
            "PID_IDX": str(i),
            "HB_FILE": os.path.join(root, f"hb{i}.jsonl"),
            "CK_DIR": root,
            "XLA_FLAGS": (env_base.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=2"
                          ).strip(),
        })
        cmd = [sys.executable, "-m", "cugp_tpu.utils.supervise",
               "--timeout=8", "--max_restarts=4", "--poll=0.5",
               f"--heartbeat={os.path.join(root, f'hb{i}.jsonl')}",
               f"--cmd={sys.executable},{os.path.abspath(__file__)}"]
        sups.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
            cwd=os.path.join(os.path.dirname(__file__), "..", "..")))

    # wait for rank 0 to pass KILL_AT_STEP, then SIGKILL it (the
    # coordinator host) — pid comes from its own heartbeat lines
    deadline = time.time() + 180
    victim_pid = None
    while time.time() < deadline:
        rec = _last_step(os.path.join(root, "hb0.jsonl"))
        if rec and rec["step"] >= KILL_AT_STEP:
            victim_pid = rec["pid"]
            break
        time.sleep(0.2)
    assert victim_pid is not None, "rank 0 never reached the kill step"
    os.kill(victim_pid, signal.SIGKILL)
    print(f"killed coordinator worker pid={victim_pid} at step>="
          f"{KILL_AT_STEP}", flush=True)

    ok = True
    outs = []
    for i, p in enumerate(sups):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        if p.returncode != 0:
            ok = False
            print(f"--- supervisor {i} failed rc={p.returncode} ---")
            print(out[-3000:])
    restarted = sum('"supervisor": "restarting"' in o for o in outs)
    assert restarted >= 1, f"no supervisor restarted:\n{outs}"
    # the work must have RESUMED (not restarted from scratch) and finished
    with open(os.path.join(root, "state", "meta.json")) as f:
        final = json.load(f)
    assert final["step"] == TARGET_STEPS, final
    resumes = [int(tok.split("=", 1)[1])
               for o in outs for tok in o.split()
               if tok.startswith("resumed_from=")]
    assert resumes and max(resumes) >= 1, (
        f"completion never resumed from a checkpoint: {outs}")
    if ok:
        print(f"SUPERVISED_MULTIHOST_OK restarts={restarted} "
              f"final_step={final['step']}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if os.environ.get("_WORKER"):
        worker()
    else:
        launcher()
