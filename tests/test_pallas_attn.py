"""Fused window-attention Pallas kernel: interpret-mode differential
tests against the plain XLA formulation (same math as
models/attention.WindowAttention), including the packed-windows layout
(pack > 1: block-diagonal mask, sentinel coords)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.ops.pallas.window_attn import fused_window_attention


def xla_reference(q, k, v, xyz, mask, table, H, G, pos_bnd, use_rpe):
    BW, T, C = q.shape
    hd = C // H
    qh = q.reshape(BW, T, H, hd)
    kh = k.reshape(BW, T, H, hd)
    vh = v.reshape(BW, T, H, hd)
    logits = jnp.einsum("wthd,wshd->whts", qh, kh) * hd**-0.5
    if use_rpe:
        num = 2 * pos_bnd + 1
        c = xyz  # (BW, 3, K)
        bias = 0
        for a in range(3):
            d = c[:, a, :, None] - c[:, a, None, :]
            idx = jnp.clip(d, -pos_bnd, pos_bnd) + pos_bnd + a * num
            bias = bias + jnp.take(table, idx, axis=0)  # (BW, K, K, H)
        bias = jnp.moveaxis(bias, 3, 1)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (G, 0), (G, 0)))
        logits = logits + bias
    logits = logits + jnp.where(mask > 0, 0.0, -1e9)[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("whts,wshd->wthd", attn, vh)
    return out.reshape(BW, T, C)


def make_inputs(rng, BW=8, T=17, C=32, K=16, pos_bnd=12, H=4):
    q = rng.standard_normal((BW, T, C)).astype(np.float32)
    k = rng.standard_normal((BW, T, C)).astype(np.float32)
    v = rng.standard_normal((BW, T, C)).astype(np.float32)
    xyz = rng.integers(0, 32, (BW, 3, K)).astype(np.int32)
    mask = np.ones((BW, T), dtype=np.int32)
    mask[1, 10:] = 0
    mask[3, :] = 0
    table = (rng.standard_normal((3 * (2 * pos_bnd + 1), H)) * 0.1) \
        .astype(np.float32)
    return tuple(jnp.asarray(x) for x in (q, k, v, xyz, mask, table))


def full_xyz(xyz, G):
    """(BW, 3, K) coords -> (BW, 3, T) with sentinel -1 relay slots."""
    BW = xyz.shape[0]
    if G == 0:
        return xyz
    sent = jnp.full((BW, 3, G), -1, jnp.int32)
    return jnp.concatenate([sent, xyz], axis=2)


def pack_args(pack, *arrs):
    """Fold ``pack`` consecutive windows into one row block.
    3D (BW, T, C) and mask (BW, T) reshape directly; xyz (BW, 3, T)
    needs the axis swap the model caller does."""
    out = []
    for a in arrs:
        BW = a.shape[0]
        if a.ndim == 3 and a.shape[1] == 3 and a.dtype == jnp.int32:
            T = a.shape[2]
            a = (a.reshape(BW // pack, pack, 3, T)
                 .swapaxes(1, 2).reshape(BW // pack, 3, pack * T))
        elif a.ndim == 3:
            a = a.reshape(BW // pack, pack * a.shape[1], a.shape[2])
        else:
            a = a.reshape(BW // pack, pack * a.shape[1])
        out.append(a)
    return out


class TestFusedAttention:
    @pytest.mark.parametrize("use_rpe,G,pack",
                             [(True, 1, 1), (True, 0, 1), (False, 1, 1),
                              (True, 1, 2), (True, 0, 4), (False, 0, 2)])
    def test_forward_matches_xla(self, use_rpe, G, pack):
        rng = np.random.default_rng(0)
        K, H, pos_bnd = 16, 4, 12
        T = K + G
        q, k, v, xyz, mask, table = make_inputs(rng, T=T, K=K,
                                                pos_bnd=pos_bnd, H=H)
        # pack == 1 passes node-only coords (kernel G-pads the bias);
        # pack > 1 uses the sentinel full-T layout (window_attn.py doc)
        xyz_f = full_xyz(xyz, G) if pack > 1 else xyz
        qp, kp, vp, xp, mp = pack_args(pack, q, k, v, xyz_f, mask)
        out = fused_window_attention(qp, kp, vp, xp, mp, table, H, pack,
                                     pos_bnd, use_rpe, 8 // pack, True)
        out = out.reshape(8, T, 32)
        ref = xla_reference(q, k, v, xyz, mask, table, H, G, pos_bnd,
                            use_rpe)
        valid = np.asarray(mask) > 0
        np.testing.assert_allclose(np.asarray(out)[valid],
                                   np.asarray(ref)[valid],
                                   rtol=2e-4, atol=2e-5)
        # invalid-query rows are exactly zeroed by the kernel
        assert np.all(np.asarray(out)[~valid] == 0.0)

    @pytest.mark.parametrize("pack", [1, 2])
    def test_backward_matches_xla(self, pack):
        rng = np.random.default_rng(1)
        K, G, H, pos_bnd = 16, 1, 4, 12
        T = K + G
        q, k, v, xyz, mask, table = make_inputs(rng, T=T, K=K,
                                                pos_bnd=pos_bnd, H=H)
        cot = jnp.asarray(rng.standard_normal((8, T, 32)).astype(np.float32))
        # zero cotangent on padded slots (the packed kernel zeroes those
        # output rows, so nonzero cotangents there would differ by
        # construction; the model's masked consumers guarantee this)
        cot = cot * jnp.asarray(mask)[:, :, None].astype(jnp.float32)
        xyz_f = full_xyz(xyz, G) if pack > 1 else xyz

        def f_fused(q, k, v, table):
            qp, kp, vp, xp, mp = pack_args(pack, q, k, v, xyz_f, mask)
            return jnp.vdot(fused_window_attention(
                qp, kp, vp, xp, mp, table, H, pack, pos_bnd, True,
                8 // pack, True).reshape(8, T, 32), cot)

        def f_ref(q, k, v, table):
            return jnp.vdot(xla_reference(q, k, v, xyz, mask, table, H, G,
                                          pos_bnd, True), cot)

        gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
        names = ["dq", "dk", "dv", "dtable"]
        for a, b, n in zip(gf, gr, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5, err_msg=n)


class TestModelIntegration:
    @pytest.mark.slow
    def test_model_pallas_matches_xla(self):
        """Full tiny model: identical params, pallas vs XLA descriptors."""
        import dataclasses
        from hotformerloc_tpu.models.config import tiny_test_config
        from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
        # Force the baseline onto the XLA einsum path: the config default
        # is use_pallas_attn=True, so tiny_test_config() alone would
        # compare the Pallas path against itself (round-3 ADVICE).
        cfg_x = tiny_test_config(use_pallas_attn=False)
        cfg_p = dataclasses.replace(cfg_x, use_pallas_attn=True)
        m_x, m_p = HOTFormerLoc(cfg_x), HOTFormerLoc(cfg_p)
        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.uniform(-1, 1, (2, cfg_x.num_points, 3))
                          .astype(np.float32))
        mask = jnp.ones(pts.shape[:2], bool)
        params = m_x.init(jax.random.PRNGKey(0), pts, mask)
        gx = np.asarray(m_x.apply(params, pts, mask)["global"])
        gp = np.asarray(m_p.apply(params, pts, mask)["global"])
        np.testing.assert_allclose(gx, gp, rtol=1e-3, atol=1e-4)
