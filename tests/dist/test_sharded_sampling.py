"""Chain-sharded NUTS/HMC with psum adaptation on faked devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.dist


@pytest.fixture(scope="module")
def mesh_dp():
    return mesh_lib.make_mesh(8, dp=4)  # dp=4, r=2, c=1


@pytest.mark.deep
def test_sharded_nuts_runs_and_adapts_identically(mesh_dp):
    from cugp_tpu.parallel import sharded_sampling
    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops

    X, y, _ = synthetic.sinusoid_1d(n=64, noise_std=0.2, seed=0)
    init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)
    out = sharded_sampling.sample_hyperparams_sharded(
        init, jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
        mesh_dp, sampler="nuts", num_chains=8, num_samples=40, num_warmup=60,
        max_tree_depth=5, key=jax.random.key(1))
    s = out["samples"]["log_lengthscale"]
    assert s.shape == (40, 8, 1)
    assert np.all(np.isfinite(np.asarray(s)))
    # psum-reduced adaptation => identical step size on every chip
    eps = np.asarray(out["eps_per_chip"])
    assert eps.shape == (4,)
    # psum reduction order may differ per rank at the last bit; identical
    # to float32 resolution is the guarantee that matters
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)
    inv_mass = np.asarray(out["inv_mass_per_chip"])
    np.testing.assert_allclose(
        inv_mass, np.broadcast_to(inv_mass[0], inv_mass.shape), rtol=1e-6)
    assert 0.2 < float(out["accept_rate"]) <= 1.0


@pytest.mark.deep
def test_sharded_hmc_runs(mesh_dp):
    from cugp_tpu.parallel import sharded_sampling
    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops

    X, y, _ = synthetic.sinusoid_1d(n=48, noise_std=0.2, seed=1)
    init = kops.init_params(d=1)
    out = sharded_sampling.sample_hyperparams_sharded(
        init, jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
        mesh_dp, sampler="hmc", num_chains=8, num_samples=30, num_warmup=40,
        key=jax.random.key(2))
    assert out["samples"]["log_noise_var"].shape == (30, 8)
    eps = np.asarray(out["eps_per_chip"])
    np.testing.assert_allclose(eps, eps[0], rtol=0, atol=0)


def test_sharded_rejects_bad_chain_count(mesh_dp):
    from cugp_tpu.parallel import sharded_sampling
    from cugp_tpu.ops import kernels as kops

    with pytest.raises(ValueError):
        sharded_sampling.sample_hyperparams_sharded(
            kops.init_params(d=1), jnp.zeros((8, 1)), jnp.zeros(8), mesh_dp,
            num_chains=5)


@pytest.mark.deep
def test_large_n_distributed_sampling(mesh_dp):
    """Config-5 shape: NUTS where each LML is GSPMD-sharded (tiny sizes)."""
    from cugp_tpu.parallel import sharded_sampling
    from cugp_tpu.parallel import mesh as mesh_lib
    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops

    mesh = mesh_lib.make_mesh(8, dp=1)  # all chips in the ('r','c') grid
    X, y, _ = synthetic.sinusoid_1d(n=128, noise_std=0.2, seed=0)
    out = sharded_sampling.sample_hyperparams_large_n(
        kops.init_params(d=1, lengthscale=0.8, noise_var=0.05),
        jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32), mesh,
        chunk=64, num_chains=2, num_samples=16, num_warmup=24,
        max_tree_depth=4, key=jax.random.key(0))
    s = np.asarray(out["samples"]["log_noise_var"])
    assert s.shape == (16, 2)
    assert np.all(np.isfinite(s))
