"""GRU parity vs torch.nn.GRU with identical weights, plus cell/scan
consistency for the generation path."""

import numpy as np
import pytest

import jax.numpy as jnp

from msnv_tpu.ops.gru import gru_init, gru_apply, gru_cell

import jax

torch = pytest.importorskip("torch")


def make_pair(n_layers, in_dim, hidden, seed=0):
    """Build a torch GRU and a matching params list for our GRU."""
    torch.manual_seed(seed)
    tg = torch.nn.GRU(input_size=in_dim, hidden_size=hidden,
                      num_layers=n_layers, batch_first=True)
    params = []
    for layer in range(n_layers):
        params.append({
            "w_ih": jnp.asarray(getattr(tg, f"weight_ih_l{layer}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(tg, f"weight_hh_l{layer}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(tg, f"bias_ih_l{layer}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(tg, f"bias_hh_l{layer}").detach().numpy()),
        })
    return tg, params


@pytest.mark.parametrize("n_layers,in_dim,hidden,T,B",
                         [(1, 8, 16, 5, 3), (2, 16, 16, 13, 4)])
def test_gru_matches_torch(n_layers, in_dim, hidden, T, B):
    tg, params = make_pair(n_layers, in_dim, hidden)
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, in_dim).astype(np.float32)
    h0 = rng.randn(n_layers, B, hidden).astype(np.float32)

    with torch.no_grad():
        ty, th = tg(torch.from_numpy(x), torch.from_numpy(h0))

    y, h = gru_apply(params, jnp.asarray(x), jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), th.numpy(), atol=2e-5)


def test_gru_cell_matches_scan():
    _, params = make_pair(2, 12, 12, seed=3)
    rng = np.random.RandomState(2)
    B, T = 2, 7
    x = jnp.asarray(rng.randn(B, T, 12).astype(np.float32))
    h0 = jnp.asarray(rng.randn(2, B, 12).astype(np.float32))

    y_scan, h_scan = gru_apply(params, x, h0)

    h = h0
    ys = []
    for t in range(T):
        y, h = gru_cell(params, x[:, t], h)
        ys.append(y)
    y_loop = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_scan), atol=1e-5)


def test_gru_init_stats():
    # lecun chunks have bound sqrt(3/fan_in); orthogonal chunk is orthogonal.
    key = jax.random.PRNGKey(0)
    params = gru_init(key, 1, 64, 64)
    w_hh = np.asarray(params[0]["w_hh"])
    n_chunk = w_hh[128:192]  # third gate chunk: orthogonal
    np.testing.assert_allclose(n_chunk @ n_chunk.T, np.eye(64), atol=1e-4)
    bound = np.sqrt(3 / 64)
    assert np.abs(w_hh[:128]).max() <= bound + 1e-6
    assert np.abs(np.asarray(params[0]["w_ih"])).max() <= bound + 1e-6
    assert np.asarray(params[0]["b_ih"]).sum() == 0


@pytest.mark.parametrize("n_layers,T,B,H,din",
                         [(1, 7, 3, 16, 16), (2, 13, 4, 32, 24),
                          (3, 9, 2, 16, 16)])
def test_wavefront_matches_xla(n_layers, T, B, H, din):
    """gru_impl='wavefront' (diagonal all-layer scan) is numerics-identical
    to the layer-by-layer sweep, forward and backward."""
    key = jax.random.PRNGKey(n_layers * 100 + T)
    params = gru_init(key, n_layers, din, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, din))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (n_layers, B, H))

    y1, h1 = gru_apply(params, x, h0, impl="xla")
    y2, h2 = gru_apply(params, x, h0, impl="wavefront")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)

    def loss(p, impl):
        y, h = gru_apply(p, x, h0, impl=impl)
        return jnp.sum(y ** 2) + jnp.sum(h ** 2)

    g1 = jax.grad(lambda p: loss(p, "xla"))(params)
    g2 = jax.grad(lambda p: loss(p, "wavefront"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
