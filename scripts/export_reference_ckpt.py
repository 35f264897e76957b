"""Export an Orbax train checkpoint to the reference's .pth format.

A user who trained with mmtg_tpu can hand the result straight back to the
reference PyTorch code (its loader: reference ``generate.py:188-192``):

  python scripts/export_reference_ckpt.py \
      --ckpt /path/to/save_path/orbax --out mmtg_ckpt.pth

The written file is ``{'model': module.-prefixed state_dict, 'args': {},
'model_cfgs': {}}`` — the exact shape reference ``train.py:212-213``
saves. Round-trip + torch-side logits parity are tested in
tests/test_checkpoint_export.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint dir (save_path/orbax or "
                        "save_path/orbax_best)")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--model_config_json", default="",
                   help="GPT-2 config JSON if the model was non-default")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mmtg_tpu.checkpoint import restore_train_state, save_reference_checkpoint
    from mmtg_tpu.configs import GPT2Config, ModelConfig
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.train import TrainState

    if args.model_config_json:
        mcfg = ModelConfig(gpt2=GPT2Config.from_json_file(args.model_config_json))
    else:
        mcfg = ModelConfig()
    template_params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    # opt/rng slots are restored by tree structure; only params are exported
    import jax.numpy as jnp

    template = TrainState(
        template_params, None, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0)
    )
    # restore with a params-only template first; fall back to a full-state
    # template when the checkpoint carries optimizer state
    try:
        state, step = restore_train_state(args.ckpt, template)
    except Exception:
        from mmtg_tpu.train import create_train_state
        from mmtg_tpu.configs import TrainConfig

        full, _ = create_train_state(
            jax.random.PRNGKey(0), mcfg, TrainConfig(), 1, 10,
            params=template_params,
        )
        state, step = restore_train_state(args.ckpt, full)
    if step < 0:
        raise SystemExit(f"no checkpoint found under {args.ckpt}")
    save_reference_checkpoint(args.out, state.params, mcfg)
    print(f"exported step-{step} params to {args.out}")


if __name__ == "__main__":
    main()
