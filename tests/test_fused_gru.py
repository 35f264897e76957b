"""Fused GRU Pallas kernel vs the scan implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.ops.fused_gru import fused_gru
from mmtg_tpu.ops.rnn import init_rnn_params, rnn_forward


@pytest.mark.parametrize("B", [4, 8, 30])
def test_matches_scan_gru(B):
    T, I, H = 5, 64, 32
    p = init_rnn_params(jax.random.PRNGKey(0), "GRU", I, H)["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, I))
    ref, _ = rnn_forward({"layers": [p]}, x, "GRU")
    out = fused_gru(
        x, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"], block_b=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16():
    T, B, I, H = 5, 8, 64, 32
    p = init_rnn_params(jax.random.PRNGKey(2), "GRU", I, H, dtype=jnp.bfloat16)[
        "layers"
    ][0]
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, I), jnp.bfloat16)
    ref, _ = rnn_forward({"layers": [p]}, x, "GRU")
    out = fused_gru(
        x, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
