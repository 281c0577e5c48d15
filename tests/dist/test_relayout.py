"""Ulysses-analog layout transitions (parallel/relayout.py) on 8 faked
CPU devices: row-sharded <-> 2D all_to_all resharding, and the
config-5-shaped pipeline ring-covariance -> relayout -> distributed
Cholesky (SURVEY.md section 2.1, Ulysses row; VERDICT round 1 missing #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.parallel import mesh as mesh_lib
from cugp_tpu.parallel import relayout

pytestmark = pytest.mark.dist


@pytest.fixture(scope="module")
def mesh2d():
    return mesh_lib.make_mesh(8, dp=1)  # r=4, c=2


def test_row_to_2d_roundtrip(mesh2d, rng):
    n = 256
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    a2d = relayout.row_to_2d(a, mesh2d)
    np.testing.assert_array_equal(np.asarray(a2d), np.asarray(a))
    back = relayout.two_d_to_row(a2d, mesh2d)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_row_to_2d_shardings(mesh2d, rng):
    """The output really is 2D-sharded (each chip holds an (n/R, n/C) tile)."""
    n = 256
    R, C = mesh2d.shape["r"], mesh2d.shape["c"]
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    a2d = relayout.row_to_2d(a, mesh2d)
    shard_shapes = {s.data.shape for s in a2d.addressable_shards}
    assert shard_shapes == {(n // R, n // C)}


def test_row_to_2d_rejects_bad_shapes(mesh2d):
    with pytest.raises(ValueError):
        relayout.row_to_2d(jnp.zeros((100, 100)), mesh2d)


def test_relayout_collective_is_all_to_all(mesh2d, rng):
    """The transition lowers to all-to-all — not all-gather/all-reduce."""
    n = 256
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    txt = jax.jit(lambda a: relayout.row_to_2d(a, mesh2d)).lower(
        a).compile().as_text()
    assert txt.count("all-to-all") > 0
    assert txt.count("all-gather") == 0
    assert txt.count("all-reduce") == 0


def test_config5_pipeline_ring_relayout_cholesky(mesh2d, rng):
    """Ring covariance (row-sharded over ALL chips) -> explicit all_to_all
    relayout -> chunked distributed Cholesky == single-device pipeline."""
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.parallel import ring, distributed_chol

    n, d = 256, 2
    X = jnp.asarray(rng.uniform(-2, 2, size=(n, d)), jnp.float32)
    p = kops.init_params(d=d, lengthscale=1.2, noise_var=0.05)

    # ring build over the combined ('r','c') axis: every chip holds an
    # n/(R*C)-row band of K with full columns (the SP layout)
    K_rows = ring.ring_train_covariance(p, X, mesh2d, kind="rbf",
                                        jitter=1e-6, axis=("r", "c"))
    K_2d = relayout.row_to_2d(K_rows, mesh2d)
    L = jax.jit(lambda K: distributed_chol.distributed_cholesky(
        K, mesh2d, chunk=128))(K_2d)

    K_ref = kops.train_covariance_xla(p, X, kind="rbf", jitter=1e-6)
    L_ref = jnp.linalg.cholesky(K_ref)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.deep
def test_to_block_cyclic_matches_permutation(mesh2d, rng):
    """Scheduled exchange == the global permutation, on divisible AND
    non-divisible (padded-exchange) block counts."""
    from cugp_tpu.parallel import block_cyclic

    R, C = mesh2d.shape["r"], mesh2d.shape["c"]
    for block, n in [(32, 256), (16, 256), (32, 384)]:
        nb = n // block
        a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        got = relayout.to_block_cyclic(a, mesh2d, block)
        rp = np.asarray(block_cyclic.cyclic_permutation(nb, R, block))
        cp = np.asarray(block_cyclic.cyclic_permutation(nb, C, block))
        want = np.asarray(a)[rp][:, cp]
        np.testing.assert_array_equal(np.asarray(got), want)
        back = relayout.from_block_cyclic(got, mesh2d, block)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_block_cyclic_relayout_collectives(mesh2d, rng):
    """The cyclic transition lowers to all-to-alls (2: one per mesh axis)
    with no all-gather/all-reduce and no global gather-of-the-matrix."""
    n, block = 256, 32
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    txt = jax.jit(lambda a: relayout.to_block_cyclic(a, mesh2d, block)
                  ).lower(a).compile().as_text()
    assert txt.count("all-to-all") > 0
    assert txt.count("all-gather") == 0
    assert txt.count("all-reduce") == 0


@pytest.mark.deep
def test_block_cyclic_cholesky_uses_scheduled_relayout(mesh2d, rng):
    """block_cyclic_cholesky(relayout='all_to_all') == 'gather' == scipy,
    and its HLO carries the all_to_all layout transition."""
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.parallel import block_cyclic

    n, d, block = 256, 2, 32
    X = jnp.asarray(rng.uniform(-2, 2, size=(n, d)), jnp.float32)
    p = kops.init_params(d=d, lengthscale=1.2, noise_var=0.05)
    K = kops.train_covariance_xla(p, X, kind="rbf", jitter=1e-6)

    L_sched = block_cyclic.block_cyclic_cholesky(K, mesh2d, block=block)
    L_gather = block_cyclic.block_cyclic_cholesky(K, mesh2d, block=block,
                                                  relayout="gather")
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L_sched), np.asarray(L_gather),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(L_sched), np.asarray(L_ref),
                               rtol=1e-4, atol=1e-5)

    txt = jax.jit(lambda K: block_cyclic.block_cyclic_cholesky(
        K, mesh2d, block=block)).lower(K).compile().as_text()
    assert txt.count("all-to-all") > 0
