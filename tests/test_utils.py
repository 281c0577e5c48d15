"""Checkpoint, config, profiling utilities."""

import os

import jax.numpy as jnp
import numpy as np

from cugp_tpu.utils import checkpoint, config as config_lib, profiling


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"a": jnp.arange(4.0), "b": jnp.ones((2, 3))},
        "step_size": jnp.asarray(0.1),
    }
    path = os.path.join(tmp_path, "ckpt")
    checkpoint.save(path, tree, step=42, extra_json={"note": "hi"})
    restored, meta = checkpoint.restore(path, tree)
    assert meta["step"] == 42
    assert meta["extra"]["note"] == "hi"
    np.testing.assert_array_equal(restored["params"]["a"],
                                  np.asarray(tree["params"]["a"]))
    np.testing.assert_array_equal(restored["params"]["b"],
                                  np.asarray(tree["params"]["b"]))


def test_checkpoint_restore_missing(tmp_path):
    tree = {"x": jnp.zeros(3)}
    restored, meta = checkpoint.restore(os.path.join(tmp_path, "nope"), tree)
    assert restored is None and meta is None


def test_checkpoint_atomic_overwrite(tmp_path):
    path = os.path.join(tmp_path, "ckpt")
    checkpoint.save(path, {"x": jnp.zeros(2)}, step=1)
    checkpoint.save(path, {"x": jnp.ones(2)}, step=2)
    restored, meta = checkpoint.restore(path, {"x": jnp.zeros(2)})
    assert meta["step"] == 2
    np.testing.assert_array_equal(restored["x"], np.ones(2))


def test_config_overrides():
    cfg, rest = config_lib.parse_overrides(
        ["--model.kind=matern32", "--data.n=4096", "--fit.learning_rate=0.01",
         "--mesh.dp=2"])
    assert cfg.model.kind == "matern32"
    assert cfg.data.n == 4096
    assert abs(cfg.fit.learning_rate - 0.01) < 1e-12
    assert cfg.mesh.dp == 2
    assert rest == []


def test_config_unknown_field():
    import pytest

    with pytest.raises((KeyError, AttributeError)):
        config_lib.parse_overrides(["--model.bogus=1"])


def test_flop_models():
    assert profiling.chol_flops(100) == 100**3 / 3
    assert profiling.cov_flops(10, 20, 3) == 1200
    assert profiling.gflops(1e9, 1.0) == 1.0


def test_cost_analysis_runs():
    import jax

    costs = profiling.cost_analysis(lambda x: x @ x, jnp.ones((64, 64)))
    assert costs is None or isinstance(costs, dict)


def test_metrics_logger_roundtrip(tmp_path):
    from cugp_tpu.utils import metrics

    path = os.path.join(tmp_path, "m.jsonl")
    with metrics.MetricsLogger(path) as m:
        m.log_series("loss", [3.0, 2.0, 1.0])
        m.log(event="done", lml=1.25)
    recs = metrics.read_metrics(path)
    assert len(recs) == 4
    assert recs[0]["loss"] == 3.0 and recs[0]["step"] == 0
    assert recs[-1]["event"] == "done"
