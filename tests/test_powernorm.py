"""Differential tests: PowerNorm vs the reference MaskPowerNorm
(/root/reference/models/layers/mask_powernorm.py), loaded directly from
the reference tree (torch CPU). Covers train forward (masked batch var,
warmup), running_phi update sequence, eval forward (running_phi path),
group scaling, and the approximate custom backward at ema_gz = 0 (where
the reference's backward is state-free and must match exactly)."""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hotformerloc_tpu.models.layers import PowerNorm

REF_PATH = "/root/reference/models/layers/mask_powernorm.py"


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_mpn", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _data(seed, B=3, N=16, C=8, n_valid=(16, 11, 5)):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1.5, (B, N, C)).astype(np.float32)
    valid = np.zeros((B, N), dtype=bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True
    return x, valid


def _ref_forward(ref_mod, x, valid, train=True, group_num=1, steps=1,
                 xs_seq=None):
    """Run the reference module; returns (last y (B,N,C), module)."""
    C = x.shape[-1]
    m = ref_mod.MaskPowerNorm(C, group_num=group_num)
    m.train(train)
    seq = xs_seq if xs_seq is not None else [x] * steps
    for xi in seq:
        t = torch.from_numpy(np.swapaxes(xi, 0, 1).copy())   # (T, B, C)
        pad = torch.from_numpy(~valid)                        # (B, T)
        y = m(t, pad_mask=pad)
    return np.swapaxes(y.detach().numpy(), 0, 1), m


def _ours(x, valid, train=True, group_num=1, xs_seq=None, variables=None):
    C = x.shape[-1]
    pn = PowerNorm(C, group_num=group_num)
    if variables is None:
        variables = pn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(valid),
                            use_running_average=not train)
    seq = xs_seq if xs_seq is not None else [x]
    for xi in seq:
        y, mut = pn.apply(variables, jnp.asarray(xi), jnp.asarray(valid),
                          use_running_average=not train,
                          mutable=["batch_stats"])
        variables = {**variables, **mut}
    return np.asarray(y), variables


@pytest.mark.parametrize("group_num", [1, 4])
def test_train_forward_matches_reference(ref_mod, group_num):
    x, valid = _data(0)
    want, _ = _ref_forward(ref_mod, x, valid, group_num=group_num)
    got, _ = _ours(x, valid, group_num=group_num)
    # padding rows are never consumed downstream; compare valid rows
    np.testing.assert_allclose(got[valid], want[valid],
                               rtol=1e-5, atol=1e-5)


def test_running_phi_update_sequence(ref_mod):
    x, valid = _data(1)
    rng = np.random.default_rng(2)
    seq = [x + rng.normal(0, 0.3, x.shape).astype(np.float32)
           for _ in range(3)]
    want, m = _ref_forward(ref_mod, x, valid, steps=3, xs_seq=seq)
    got, variables = _ours(x, valid, xs_seq=seq)
    np.testing.assert_allclose(got[valid], want[valid],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["PowerNorm_0"]["running_phi"]
                   if "PowerNorm_0" in variables["batch_stats"]
                   else variables["batch_stats"]["running_phi"]),
        m.running_phi.numpy().reshape(-1), rtol=1e-5, atol=1e-6)


def test_eval_forward_matches_reference(ref_mod):
    x, valid = _data(3)
    # advance state with 2 train steps, then eval
    seq = [x, x * 0.7]
    _, m = _ref_forward(ref_mod, x, valid, steps=2, xs_seq=seq)
    _, variables = _ours(x, valid, xs_seq=seq)
    m.eval()
    t = torch.from_numpy(np.swapaxes(x, 0, 1).copy())
    want = np.swapaxes(m(t, pad_mask=torch.from_numpy(~valid))
                       .detach().numpy(), 0, 1)
    pn = PowerNorm(x.shape[-1])
    got = np.asarray(pn.apply(variables, jnp.asarray(x),
                              jnp.asarray(valid),
                              use_running_average=True))
    np.testing.assert_allclose(got[valid], want[valid],
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_reference_at_step1(ref_mod):
    # At ema_gz = 0 the reference PowerFunction backward is state-free:
    # gx = dy*weight / sqrt(batch_var + eps) (through GroupScaling by
    # plain autodiff), dweight = sum(dy*z), dbias = sum(dy).
    x, valid = _data(4)
    rng = np.random.default_rng(5)
    r = rng.normal(0, 1, x.shape).astype(np.float32)
    r[~valid] = 0.0

    C = x.shape[-1]
    m = ref_mod.MaskPowerNorm(C)
    m.train(True)
    t = torch.from_numpy(np.swapaxes(x, 0, 1).copy()).requires_grad_(True)
    y = m(t, pad_mask=torch.from_numpy(~valid))
    loss = (y * torch.from_numpy(np.swapaxes(r, 0, 1).copy())).sum()
    loss.backward()
    want_dx = np.swapaxes(t.grad.numpy(), 0, 1)
    want_dw = m.weight.grad.numpy()
    want_db = m.bias.grad.numpy()

    pn = PowerNorm(C)
    variables = pn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(valid), use_running_average=False)

    def loss_fn(params, xi):
        out, _ = pn.apply({**variables, "params": params}, xi,
                          jnp.asarray(valid), use_running_average=False,
                          mutable=["batch_stats"])
        return jnp.sum(out * jnp.asarray(r))

    (dp, dx) = jax.grad(loss_fn, argnums=(0, 1))(
        variables["params"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx)[valid], want_dx[valid],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp["scale"]), want_dw,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp["bias"]), want_db,
                               rtol=1e-4, atol=1e-5)
