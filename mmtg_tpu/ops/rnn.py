"""Recurrent cells as pure `lax.scan` functions with torch-exact numerics.

The reference's image/text channels are cuDNN ``nn.RNN/LSTM/GRU`` modules
(reference ``model.py:41-59``). On TPU the sequence length is 5, so a
`lax.scan` over time with one fused gate matmul per step is already
MXU-friendly; XLA unrolls and fuses it. Gate ordering and bias layout match
torch so reference checkpoints import losslessly:

  * GRU gates stacked [r, z, n] (torch ``weight_ih_l{k}``: ``[3H, in]``);
    ``n = tanh(Wx + b_in + r * (Uh + b_hn))`` — note torch applies the
    *hidden* bias inside the reset gate product.
  * LSTM gates stacked [i, f, g, o]; ``c' = f·c + i·g``, ``h' = o·tanh(c')``.
  * RNN(relu): ``h' = relu(Wx + b_ih + Uh + b_hh)``.

Params are plain dicts of arrays (jit/optax-safe — no static metadata in
the pytree); weights are kept transposed (``[in, gates*H]``) so the scan
body is a single ``x @ W`` per step.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

LayerParams = Dict[str, jnp.ndarray]
Params = Dict[str, List[LayerParams]]


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _orthogonal(key, rows: int, cols: int, dtype):
    """torch ``init.orthogonal_`` on a ``[rows, cols]`` matrix, returned
    transposed to our ``[cols, rows]`` compute layout."""
    n, m = max(rows, cols), min(rows, cols)
    a = jax.random.normal(key, (n, m), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    q = q[:rows, :cols] if rows >= cols else q.T[:rows, :cols]
    return q.T.astype(dtype)  # [cols, rows]


def init_rnn_params(
    key: jax.Array,
    kind: str,
    input_dim: int,
    hidden_dim: int,
    num_layers: int = 1,
    dtype=jnp.float32,
) -> Params:
    """torch-default init (U(-1/√H, 1/√H)) with the reference's layer-0
    overrides: Xavier-normal on ``w_ih``, orthogonal on ``w_hh``
    (reference ``model.py:83-88``)."""
    gates = {"RNN": 1, "GRU": 3, "LSTM": 4}[kind]
    bound = 1.0 / math.sqrt(hidden_dim)
    layers = []
    for layer in range(num_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        in_dim = input_dim if layer == 0 else hidden_dim
        if layer == 0:
            # Xavier-normal over the torch-shaped [gates*H, in] matrix.
            std = math.sqrt(2.0 / (gates * hidden_dim + in_dim))
            w_ih = std * jax.random.normal(k1, (in_dim, gates * hidden_dim), dtype)
            w_hh = _orthogonal(k2, gates * hidden_dim, hidden_dim, dtype)
        else:
            w_ih = _uniform(k1, (in_dim, gates * hidden_dim), bound, dtype)
            w_hh = _uniform(k2, (hidden_dim, gates * hidden_dim), bound, dtype)
        layers.append(
            {
                "w_ih": w_ih,
                "w_hh": w_hh,
                "b_ih": _uniform(k3, (gates * hidden_dim,), bound, dtype),
                "b_hh": _uniform(k4, (gates * hidden_dim,), bound, dtype),
            }
        )
    return {"layers": layers}


def rnn_forward(
    params: Params,
    x: jnp.ndarray,
    kind: str,
    dropout_rate: float = 0.0,
    dropout_key=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a (multi-layer) recurrent stack.

    Args:
      x: ``[T, B, input_dim]`` (seq-first, like torch non-batch-first).
      kind: 'RNN' | 'GRU' | 'LSTM' (static).
    Returns:
      (outputs ``[T, B, H]``, final hidden ``[num_layers, B, H]``).
    Inter-layer dropout only (torch semantics: applied between layers when
    ``num_layers > 1``; the reference's single-layer GRUs see none).
    """
    layers = params["layers"]
    _, B, _ = x.shape
    finals = []
    out = x
    for li, lp in enumerate(layers):
        H = lp["w_hh"].shape[0]
        w_hh, b_hh = lp["w_hh"], lp["b_hh"]
        # One big input projection for the whole sequence → MXU-friendly.
        x_proj = out @ lp["w_ih"] + lp["b_ih"]  # [T, B, gates*H]

        if kind == "GRU":

            def body(h, xp, w=w_hh, b=b_hh):
                xr, xz, xn = jnp.split(xp, 3, axis=-1)
                hr, hz, hn = jnp.split(h @ w + b, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h_last, ys = jax.lax.scan(body, jnp.zeros((B, H), x.dtype), x_proj)
        elif kind == "LSTM":

            def body(carry, xp, w=w_hh, b=b_hh):
                h, c = carry
                i, f, g, o = jnp.split(xp + h @ w + b, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            c0 = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
            (h_last, _), ys = jax.lax.scan(body, c0, x_proj)
        elif kind == "RNN":

            def body(h, xp, w=w_hh, b=b_hh):
                h_new = jax.nn.relu(xp + h @ w + b)
                return h_new, h_new

            h_last, ys = jax.lax.scan(body, jnp.zeros((B, H), x.dtype), x_proj)
        else:
            raise ValueError(f"unknown rnn kind: {kind}")

        finals.append(h_last)
        out = ys
        if dropout_rate > 0.0 and dropout_key is not None and li < len(layers) - 1:
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)

    return out, jnp.stack(finals)


def import_torch_rnn(state: Dict[str, "object"], num_layers: int) -> Params:
    """Convert torch ``nn.RNN/GRU/LSTM`` tensors (as numpy) to our layout."""
    import numpy as np

    layers = []
    for k in range(num_layers):
        layers.append(
            {
                "w_ih": jnp.asarray(np.asarray(state[f"weight_ih_l{k}"]).T),
                "w_hh": jnp.asarray(np.asarray(state[f"weight_hh_l{k}"]).T),
                "b_ih": jnp.asarray(np.asarray(state[f"bias_ih_l{k}"])),
                "b_hh": jnp.asarray(np.asarray(state[f"bias_hh_l{k}"])),
            }
        )
    return {"layers": layers}
