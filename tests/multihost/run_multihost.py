"""Multi-host smoke test: N CPU processes over DCN (SURVEY.md section 4).

Launches itself `--procs` times with distinct process ids against a local
coordinator, builds a global mesh, and runs one psum + one sharded LML to
exercise the jax.distributed bootstrap without TPU hardware.

Usage: python tests/multihost/run_multihost.py            # launcher
       (workers are spawned internally with _WORKER=1)
"""

import os
import subprocess
import sys


def worker():
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cugp_tpu import runtime

    info = runtime.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=int(os.environ["NPROCS"]),
        process_id=int(os.environ["PID_IDX"]),
    )
    assert info.process_count == int(os.environ["NPROCS"]), info

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cugp_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(dp=1)
    n = 128

    import numpy as np
    from cugp_tpu.data import synthetic
    from cugp_tpu.parallel import gspmd
    from cugp_tpu.ops import kernels as kops

    X_np, y_np, _ = synthetic.sinusoid_1d(n=n, seed=0)
    X = jax.make_array_from_callback(
        (n, 1), NamedSharding(mesh, P(("dp", "r"), None)),
        lambda idx: np.asarray(X_np, np.float32)[idx])
    y = jax.make_array_from_callback(
        (n,), NamedSharding(mesh, P(("dp", "r"))),
        lambda idx: np.asarray(y_np, np.float32)[idx])
    params = kops.init_params(d=1)
    val = jax.jit(
        lambda p, X, y: gspmd.lml_sharded(p, X, y, mesh))(params, X, y)
    v = float(val)
    assert v == v, "nan lml"
    if info.process_index == 0:
        print(f"MULTIHOST_OK procs={info.process_count} "
              f"devices={info.global_devices} lml={v:.3f}")


def launcher(procs=2):
    port = 8476
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    procs_list = []
    for i in range(procs):
        env = dict(env_base)
        env.update({
            "_WORKER": "1",
            "COORD": f"127.0.0.1:{port}",
            "NPROCS": str(procs),
            "PID_IDX": str(i),
        })
        procs_list.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        ))
    ok = True
    for i, p in enumerate(procs_list):
        out, _ = p.communicate(timeout=300)
        if p.returncode != 0:
            ok = False
            print(f"--- worker {i} failed (rc={p.returncode}) ---")
            print(out[-3000:])
        elif "MULTIHOST_OK" in out:
            print(out.strip().splitlines()[-1])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if os.environ.get("_WORKER"):
        worker()
    else:
        launcher(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
