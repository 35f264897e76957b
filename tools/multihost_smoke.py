#!/usr/bin/env python
"""Multi-process (``--multihost``) smoke: one REAL distributed train step.

Executes the exact init path ``mmtg_tpu.train --multihost`` takes
(``train.initialize_multihost``) across N coordinator-connected processes
of 4 virtual CPU devices each, then runs one full MMTG train step over a
global ``(N*4, 1)`` data-parallel mesh — the gradient all-reduce spans
processes, which is the thing a single-process dryrun cannot certify
(VERDICT r03 "What's missing" #3). On a real pod the same code path
auto-detects the TPU topology instead of the env triple.

Spawned per-process by tests/test_multihost.py; runnable by hand:

  for i in 0 1; do
    JAX_COORDINATOR_ADDRESS=localhost:9911 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=$i JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/multihost_smoke.py &
  done; wait
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from mmtg_tpu.train import initialize_multihost

    # the path under test: the exact call `--multihost` makes
    initialize_multihost()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from mmtg_tpu.configs import (
        ChannelConfig,
        DataConfig,
        GPT2Config,
        ModelConfig,
        TrainConfig,
    )
    from mmtg_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from mmtg_tpu.train import create_train_state, make_train_step

    n_proc = jax.process_count()
    pid = jax.process_index()
    want = int(os.environ["JAX_NUM_PROCESSES"])
    assert n_proc == want, f"process_count {n_proc} != {want}"
    assert jax.local_device_count() == 4, jax.local_device_count()
    n_global = len(jax.devices())
    assert n_global == 4 * n_proc, f"{n_global} global devices"

    mesh = make_mesh((n_global, 1))
    lift = lambda tree, spec: multihost_utils.host_local_array_to_global_array(
        tree, mesh, spec
    )

    # --- cross-process collective sanity: a known global reduction -----
    rows = np.arange(n_global, dtype=np.float32)
    x = lift(rows[pid * 4 : (pid + 1) * 4], P(DATA_AXIS))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    expect = float(rows.sum())
    got = float(total)
    assert got == expect, f"global sum {got} != {expect}"

    # --- one full distributed train step (same tiny-but-fully-wired
    # model as __graft_entry__.dryrun_multichip) ------------------------
    mcfg = ModelConfig(
        topic=ChannelConfig(input_dim=64, hidden_dim=32, type="MLP"),
        image=ChannelConfig(input_dim=64, hidden_dim=32),
        text=ChannelConfig(input_dim=64, hidden_dim=32),
        self_att_hidden_size=32,
        self_att_heads=4,
        mm_att_out_dim=64,
        gpt2=GPT2Config(
            vocab_size=256, n_positions=256, n_embd=64, n_layer=2, n_head=4
        ),
    )
    dcfg = DataConfig(wenlan_emb_size=64)
    tcfg = TrainConfig(lr=1e-3, alpha=0.2)

    import __graft_entry__ as g

    rng = np.random.default_rng(0)  # same seed every process
    B = n_global
    batch = {k: np.asarray(v)
             for k, v in g._make_batch(B, dcfg, mcfg.gpt2.vocab_size, rng).items()}
    batch["sample_mask"] = np.ones((B,), np.float32)
    const_np = {
        "wenlan_table": rng.standard_normal(
            (mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)
        ).astype(np.float32)
    }

    with mesh:
        state, tx = create_train_state(
            jax.random.PRNGKey(0), mcfg, tcfg, warmup_steps=2, total_steps=10
        )
        # every process initialized identical host values (same seed);
        # lift them to replicated GLOBAL arrays, and each process feeds
        # its 4-row slice of the global batch
        state = jax.tree.map(
            lambda t: lift(np.asarray(t), P()), state,
        )
        const = lift(const_np, P())
        local = {k: v[pid * 4 : (pid + 1) * 4] for k, v in batch.items()}
        sb = lift(local, P(DATA_AXIS))

        train_step = make_train_step(mcfg, dcfg, tcfg, tx)
        state, metrics = train_step(state, const, sb, np.int32(2))
        loss = float(jax.block_until_ready(metrics["total"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(f"multihost smoke OK pid={pid}/{n_proc}: global devices="
          f"{n_global} loss={loss:.4f} step={int(state.step)}", flush=True)


if __name__ == "__main__":
    main()
