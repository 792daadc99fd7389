"""Differential tests for the scatter-free RPE adjoint (ops/rpe.py).

Model: the reference RPE (/root/reference/models/layers/
octformer_layers.py:144-174) — table gather per axis, summed. The
custom VJP must match plain autodiff through the gather exactly
(both compute the same mathematical adjoint; fp32 end to end here).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.ops.rpe import rpe_bias, rpe_bias_reference


def _mk(seed, B=2, W=3, K=16, H=4, bnd=12, P=32):
    rng = np.random.default_rng(seed)
    tab = jnp.asarray(rng.normal(0, 0.5, (H, 3 * (2 * bnd + 1))),
                      jnp.float32)
    xyz = jnp.asarray(rng.integers(0, P, (B, W, K, 3)), jnp.int32)
    # random cotangent to probe the full Jacobian
    ct = jnp.asarray(rng.normal(0, 1, (B, W, H, K, K)), jnp.float32)
    return tab, xyz, ct


@pytest.mark.parametrize("bnd,P", [(12, 32), (40, 16), (7, 8)])
def test_rpe_bias_forward_matches_reference(bnd, P):
    tab, xyz, _ = _mk(0, bnd=bnd, P=P)
    got = rpe_bias(tab, xyz, bnd, P)
    want = rpe_bias_reference(tab, xyz, bnd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)


@pytest.mark.parametrize("bnd,P", [(12, 32), (40, 16), (7, 8)])
def test_rpe_table_grad_matches_autodiff(bnd, P):
    tab, xyz, ct = _mk(1, bnd=bnd, P=P)

    def loss_custom(t):
        return jnp.sum(rpe_bias(t, xyz, bnd, P) * ct)

    def loss_auto(t):
        return jnp.sum(rpe_bias_reference(t, xyz, bnd) * ct)

    g_custom = jax.grad(loss_custom)(tab)
    g_auto = jax.grad(loss_auto)(tab)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-5)


def test_rpe_grad_under_jit_and_duplicate_coords():
    # Duplicate / zero coords (padding nodes all decode to voxel 0) must
    # accumulate into the same table rows exactly like autodiff.
    bnd, P = 10, 16
    tab, xyz, ct = _mk(2, B=1, W=2, K=8, H=2, bnd=bnd, P=P)
    xyz = xyz.at[0, 0].set(0)  # a whole window of identical coords

    g_custom = jax.jit(jax.grad(
        lambda t: jnp.sum(rpe_bias(t, xyz, bnd, P) * ct)))(tab)
    g_auto = jax.grad(
        lambda t: jnp.sum(rpe_bias_reference(t, xyz, bnd) * ct))(tab)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-5)


def test_rpe_bwd_hlo_has_no_scatter():
    bnd, P = 12, 32
    tab, xyz, ct = _mk(3, bnd=bnd, P=P)
    f = jax.grad(lambda t: jnp.sum(rpe_bias(t, xyz, bnd, P) * ct))
    hlo = jax.jit(f).lower(tab).as_text()
    assert "scatter" not in hlo, "custom adjoint must not emit scatters"
