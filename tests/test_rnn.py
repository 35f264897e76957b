"""RNN/GRU/LSTM scan cells: numeric parity vs torch cuDNN-semantics RNNs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.ops.rnn import import_torch_rnn, init_rnn_params, rnn_forward

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("kind", ["GRU", "LSTM", "RNN"])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_torch_parity(kind, num_layers):
    T, B, I, H = 5, 3, 16, 8
    torch.manual_seed(0)
    mod = {
        "GRU": torch.nn.GRU,
        "LSTM": torch.nn.LSTM,
        "RNN": lambda *a, **k: torch.nn.RNN(*a, nonlinearity="relu", **k),
    }[kind](I, H, num_layers=num_layers)
    x = torch.randn(T, B, I)
    with torch.no_grad():
        out_t, hidden_t = mod(x)
    if kind == "LSTM":
        hidden_t = hidden_t[0]

    state = {k: v.detach().numpy() for k, v in mod.state_dict().items()}
    params = import_torch_rnn(state, num_layers=num_layers)
    out_j, hidden_j = rnn_forward(params, jnp.asarray(x.numpy()), kind)

    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hidden_j), hidden_t.numpy(), atol=1e-5)


def test_init_shapes():
    key = jax.random.PRNGKey(0)
    p = init_rnn_params(key, "GRU", 2048, 512, num_layers=1)
    assert p["layers"][0]["w_ih"].shape == (2048, 3 * 512)
    assert p["layers"][0]["w_hh"].shape == (512, 3 * 512)
    # orthogonal recurrent init: W_hh^T W_hh over each gate block ≈ I-ish;
    # check full-matrix orthogonality of the torch-shaped [3H, H] matrix.
    w = np.asarray(p["layers"][0]["w_hh"]).T  # [3H, H]
    gram = w.T @ w
    np.testing.assert_allclose(gram, np.eye(512), atol=1e-4)


def test_jit_and_grad():
    key = jax.random.PRNGKey(1)
    p = init_rnn_params(key, "GRU", 16, 8)
    x = jax.random.normal(key, (5, 2, 16))

    @jax.jit
    def loss(params, x):
        out, _ = rnn_forward(params, x, "GRU")
        return jnp.sum(out**2)

    g = jax.grad(loss)(p, x)
    assert jnp.isfinite(loss(p, x))
    assert all(jnp.all(jnp.isfinite(v)) for v in jax.tree.leaves(g))
