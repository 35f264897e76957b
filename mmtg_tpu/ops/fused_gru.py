"""Pallas TPU kernel: fused GRU over the 5-step experience sequence.

The encoder's image/text channels are single-layer GRUs over T=5 steps
(reference ``model.py:47-49``). The `lax.scan` version issues one small
matmul + gate block per step with HBM round-trips for ``h`` between them;
this kernel keeps the hidden state in VMEM across all T steps and fuses
the recurrent matmul (MXU) with the gate nonlinearities (VPU) in one
program per batch block.

The input projection ``x @ W_ih + b_ih`` (the big [T·B, in]×[in, 3H]
matmul) stays OUTSIDE the kernel — XLA already runs it as one fused MXU
op; only the sequential recurrence benefits from fusion.

Numerics match :func:`mmtg_tpu.ops.rnn.rnn_forward` (torch gate order
[r, z, n], hidden bias inside the reset product) — see
tests/test_fused_gru.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_hh_ref, b_hh_ref, out_ref, h_scratch, *, T: int, H: int):
    """xp_ref: [T, bB, 3H] (input projection + input bias, precomputed);
    w_hh_ref: [H, 3H]; b_hh_ref: [1, 3H]; out_ref: [T, bB, H]."""
    h_scratch[:] = jnp.zeros_like(h_scratch)
    w = w_hh_ref[:]
    b = b_hh_ref[:]

    def step(t, _):
        h = h_scratch[:]
        hp = (
            jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        xp = xp_ref[t].astype(jnp.float32)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_scratch[:] = h_new
        out_ref[t] = h_new.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_gru(
    x: jnp.ndarray,  # [T, B, input_dim]
    w_ih: jnp.ndarray,  # [input_dim, 3H]
    w_hh: jnp.ndarray,  # [H, 3H]
    b_ih: jnp.ndarray,  # [3H]
    b_hh: jnp.ndarray,  # [3H]
    block_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-layer GRU forward; returns outputs ``[T, B, H]``."""
    import math

    T, B, _ = x.shape
    H = w_hh.shape[0]
    # Mosaic needs the sublane (batch-block) dim divisible by 8: pad B up
    # (pad rows compute garbage, sliced off below), then pick a block that
    # divides it.
    pad_b = (-B) % 8
    if pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, 0)))
    Bp = B + pad_b
    if Bp % block_b != 0:
        block_b = math.gcd(Bp, block_b)
    x_proj = (x @ w_ih + b_ih).astype(jnp.float32)  # [T, Bp, 3H], one MXU op

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec(
                (T, block_b, 3 * H), lambda b: (0, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, block_b, H), lambda b: (0, b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, H=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
        interpret=interpret,
    )(x_proj, w_hh.astype(jnp.float32), b_hh.reshape(1, -1).astype(jnp.float32))
    return out[:, :B] if pad_b else out
