"""Sampler chain-state checkpoint/resume (SURVEY.md section 5 row
"checkpoint/resume"; VERDICT round 1, next-round #7).

Segments compose exactly (fixed post-warmup eps/inv_mass, keys derived
from the draw counter), so an interrupted run resumed from its checkpoint
must produce the SAME draws as an uninterrupted one.
"""

import os

import jax
import numpy as np
import pytest

from cugp_tpu.data import synthetic
from cugp_tpu.inference import sampling
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def data():
    X, y, _ = synthetic.sinusoid_1d(n=64, noise_std=0.1, seed=0)
    import jax.numpy as jnp

    return (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            kops.init_params(d=1, lengthscale=0.8, noise_var=0.05))


def _run(data, ckpt_dir, num_samples, **kw):
    X, y, init = data
    return sampling.sample_hyperparams_checkpointed(
        init, X, y, checkpoint_dir=ckpt_dir, checkpoint_every=8,
        num_samples=num_samples, num_chains=4, num_warmup=16,
        sampler="hmc", n_leapfrog=8, key=jax.random.key(3), **kw)


@pytest.mark.deep
def test_resume_reproduces_uninterrupted_run(data, tmp_path):
    # uninterrupted 24 draws
    full = _run(data, os.path.join(tmp_path, "full"), 24)
    assert not full["resumed"] and full["draws_done"] == 24

    # "killed" after 8 draws, then resumed to 24
    part_dir = os.path.join(tmp_path, "part")
    part = _run(data, part_dir, 8)
    assert part["draws_done"] == 8
    resumed = _run(data, part_dir, 24)
    assert resumed["resumed"] and resumed["draws_done"] == 24

    np.testing.assert_allclose(np.asarray(resumed["samples_flat"]),
                               np.asarray(full["samples_flat"]),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(resumed["accept_rate"]) - float(full["accept_rate"])) \
        < 1e-4


def test_checkpoint_persists_chain_state(data, tmp_path):
    from cugp_tpu.utils import checkpoint

    d = os.path.join(tmp_path, "state")
    _run(data, d, 8)
    meta = checkpoint.peek_meta(d)
    assert meta["step"] == 8
    assert meta["extra"]["sampler"] == "hmc"


@pytest.mark.deep
def test_cli_sample_checkpoint_resume(tmp_path, capsys):
    from cugp_tpu.cli.__main__ import main

    ckpt = os.path.join(tmp_path, "cli_sample_ckpt")
    args = ["sample", "--data.n=64", "--sample.num_chains=2",
            "--sample.num_warmup=8", "--sample.sampler=hmc",
            "--sample.checkpoint_every=4", f"--checkpoint_dir={ckpt}"]
    rc = main(args + ["--sample.num_samples=8"])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert '"resumed": false' in out1
    rc = main(args + ["--sample.num_samples=16"])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert '"resumed": true' in out2
    assert '"draws_done": 16' in out2


@pytest.mark.deep
def test_checkpointed_chain_block_resume_equality(data, tmp_path):
    """chain_block pass-through (config.SampleConfig.chain_block -> CLI ->
    sampling): the blocked single-program layout checkpoints and resumes
    to the SAME draws as its own uninterrupted run. (Equality to the
    full-width vmap layout is NOT expected over multiple transitions —
    XLA reassociates reductions differently per layout and HMC is
    chaotic; see hmc.blocked_chains. test_samplers.py pins single-step
    layout equivalence.)"""
    full = _run(data, os.path.join(tmp_path, "blk_full"), 24, chain_block=2)
    assert full["draws_done"] == 24

    part_dir = os.path.join(tmp_path, "blk_part")
    part = _run(data, part_dir, 8, chain_block=2)
    assert part["draws_done"] == 8
    resumed = _run(data, part_dir, 24, chain_block=2)
    assert resumed["resumed"] and resumed["draws_done"] == 24
    np.testing.assert_allclose(np.asarray(resumed["samples_flat"]),
                               np.asarray(full["samples_flat"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.deep
def test_old_7_leaf_checkpoint_migrates(data, tmp_path):
    """Checkpoints written before logp/grad entered the format (7 leaves)
    must still resume: peek_meta detects the old shape and logp/grad are
    recomputed (ADVICE round 3, medium). Resume is statistically exact but
    not guaranteed bitwise vs an uninterrupted run, so only shape/progress
    and sane continuation are asserted."""
    from cugp_tpu.utils import checkpoint

    d = os.path.join(tmp_path, "legacy")
    part = _run(data, d, 8)
    assert part["draws_done"] == 8

    # rewrite the checkpoint in the OLD format: drop logp/grad
    probe_keys = ["q", "logp", "grad", "eps", "inv_mass", "key_data",
                  "samples", "accept_sum"]
    tree, meta = checkpoint.restore(
        d, {k: np.zeros(0) for k in probe_keys})
    old_tree = {k: v for k, v in tree.items() if k not in ("logp", "grad")}
    checkpoint.save(d, old_tree, step=meta["step"], extra_json=meta["extra"])
    assert checkpoint.peek_meta(d)["num_leaves"] == 6

    resumed = _run(data, d, 24)
    assert resumed["resumed"] and resumed["draws_done"] == 24
    qs = np.asarray(resumed["samples_flat"])
    assert qs.shape[0] == 24 and np.isfinite(qs).all()
    assert 0.2 < float(resumed["accept_rate"]) <= 1.0


def test_iterative_engine_resume_equality(data, tmp_path):
    """engine="iterative" under the checkpointed scheduler (round-4
    VERDICT missing #2: the crash-robust schedule COMPOSED with the
    matrix-free engine): resume is bitwise-exact, preconditioner factors
    ride the checkpoint, and per-segment CG diagnostics are returned."""
    kw = dict(engine="iterative", block=64, cg_tol=1e-6, cg_max_iters=300,
              num_probes=8, num_steps=16, precond_rank=8)
    full = _run(data, str(tmp_path / "a"), 24, **kw)
    part = _run(data, str(tmp_path / "b"), 8, **kw)
    resumed = _run(data, str(tmp_path / "b"), 24, **kw)
    assert resumed["resumed"]
    np.testing.assert_array_equal(np.asarray(resumed["samples_flat"]),
                                  np.asarray(full["samples_flat"]))
    assert len(full["cg_iters_per_segment"]) == 3


def test_engine_mismatch_rejected(data, tmp_path):
    """Resuming a dense-engine checkpoint with engine=iterative (or vice
    versa) targets a DIFFERENT density — must refuse, not silently mix."""
    _run(data, str(tmp_path / "c"), 8)
    with pytest.raises(ValueError, match="engine"):
        _run(data, str(tmp_path / "c"), 16, engine="iterative", block=64,
             precond_rank=8)


@pytest.mark.deep
def test_cli_sample_iterative_checkpoint(tmp_path, capsys):
    """--sample.engine=iterative composes with --checkpoint_dir from the
    CLI (the round-4 lockout is gone)."""
    import json

    from cugp_tpu.cli.__main__ import main

    ckpt = os.path.join(tmp_path, "it_sample")
    args = ["sample", "--data.n=96", "--sample.engine=iterative",
            "--sample.sampler=hmc", "--sample.num_samples=8",
            "--sample.num_warmup=8", "--sample.num_chains=2",
            "--sample.checkpoint_every=4", "--sample.num_probes=4",
            "--sample.precond_rank=8", f"--checkpoint_dir={ckpt}"]
    assert main(args) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["draws_done"] == 8
    assert os.path.exists(os.path.join(ckpt, "meta.json"))
