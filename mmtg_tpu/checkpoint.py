"""Checkpointing: Orbax train-state save/resume + reference ``.pth`` import.

The reference saves model-only dicts ``{'model': state_dict, 'args', 'model_cfgs'}``
(``train.py:212-213``) and cannot resume optimizer state. Here full train
state (params + optimizer + step + PRNG key) round-trips through Orbax —
a strict capability superset (SURVEY.md §5 "Checkpoint / resume").

``import_reference_state_dict`` maps the reference's parameter names
(``MMTG`` module tree, ``model.py:330-354``; optionally ``module.``-prefixed
by ``nn.DataParallel``, ``generate.py:192``) onto our pytree, transposing
torch ``nn.Linear`` weights ([out,in] → [in,out]) and stacking the per-layer
GPT-2 tensors. This is the bridge for bit-faithful logits parity against
reference checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import ModelConfig
from mmtg_tpu.models.gpt2 import import_hf_gpt2
from mmtg_tpu.ops.rnn import import_torch_rnn


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def strip_prefix(state: Dict[str, Any], prefix: str = "module.") -> Dict[str, Any]:
    """Drop the ``nn.DataParallel`` wrapper prefix (``generate.py:192``)."""
    if any(k.startswith(prefix) for k in state):
        return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in state.items()}
    return state


def _linear(state, name):
    return {"w": jnp.asarray(_np(state[f"{name}.weight"]).T),
            "b": jnp.asarray(_np(state[f"{name}.bias"]))}


def _ln(state, name):
    return {"g": jnp.asarray(_np(state[f"{name}.weight"])),
            "b": jnp.asarray(_np(state[f"{name}.bias"]))}


def import_reference_state_dict(state: Dict[str, Any], mcfg: ModelConfig) -> Dict:
    """Reference ``MMTG.state_dict()`` → our parameter pytree.

    Key layout per reference ``model.py``: ``encoder.topic_fc``,
    ``encoder.rnns_image/rnns_text`` (``:39-59``), ``ln_layer1/2/3``
    (``:337-339``), ``{img,text}_inner_atten_layer.{query,key,value}``
    (``:111-113``), ``mm_atten_layer.att_matrices.{i}`` + ``out_linear``
    (``:176-179``), ``decoder.projector_layer1/2`` (``:216-218``),
    ``decoder.gpt2.*`` (HF GPT2LMHeadModel).
    """
    state = strip_prefix(state)

    def rnn(prefix, num_layers):
        sub = {
            k[len(prefix) + 1:]: _np(v)
            for k, v in state.items()
            if k.startswith(prefix + ".")
        }
        return import_torch_rnn(sub, num_layers=num_layers)

    def alpha(prefix):
        return {
            "query": _linear(state, f"{prefix}.query"),
            "key": _linear(state, f"{prefix}.key"),
            "value": _linear(state, f"{prefix}.value"),
        }

    T = mcfg.seq_len
    att_w = jnp.stack(
        [jnp.asarray(_np(state[f"mm_atten_layer.att_matrices.{i}.weight"]).T) for i in range(T)]
    )
    att_b = jnp.stack(
        [jnp.asarray(_np(state[f"mm_atten_layer.att_matrices.{i}.bias"])) for i in range(T)]
    )
    gpt2_state = {
        k[len("decoder.gpt2."):]: v
        for k, v in state.items()
        if k.startswith("decoder.gpt2.")
    }
    return {
        "encoder": {
            "topic_fc": _linear(state, "encoder.topic_fc"),
            "image": rnn("encoder.rnns_image", mcfg.image.num_layers),
            "text": rnn("encoder.rnns_text", mcfg.text.num_layers),
        },
        "ln_topic": _ln(state, "ln_layer1"),
        "ln_image": _ln(state, "ln_layer2"),
        "ln_text": _ln(state, "ln_layer3"),
        "alpha_img": alpha("img_inner_atten_layer"),
        "alpha_text": alpha("text_inner_atten_layer"),
        "beta": {
            "att_w": att_w,
            "att_b": att_b,
            "out": _linear(state, "mm_atten_layer.out_linear"),
        },
        "projector1": _linear(state, "decoder.projector_layer1"),
        "projector2": _linear(state, "decoder.projector_layer2"),
        "gpt2": import_hf_gpt2(gpt2_state, mcfg.gpt2),
    }


def load_reference_checkpoint(path: str, mcfg: ModelConfig) -> Dict:
    """Load a reference ``.pth`` (``{'model': state_dict, ...}`` or a bare
    state dict / ``{'state_dict': ...}`` wrapper, ``model.py:348-353``)."""
    import torch  # optional dependency, fenced to the import tool

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return import_reference_state_dict(raw, mcfg)


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints
# ---------------------------------------------------------------------------


def save_train_state(ckpt_dir: str, step: int, state: Any, keep: int = 5) -> None:
    """Save a full train-state pytree under ``ckpt_dir/step``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def restore_train_state(ckpt_dir: str, template: Any, step: Optional[int] = None) -> tuple:
    """Restore (state, step); ``step=None`` → latest. Returns
    ``(template, -1)`` when no checkpoint exists (fresh start)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    if not os.path.isdir(path):
        return template, -1
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return template, -1
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return restored, step
