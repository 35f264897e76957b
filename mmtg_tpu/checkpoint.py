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
# Reference .pth EXPORT (the inverse bridge: our pytree → reference format)
# ---------------------------------------------------------------------------


def export_reference_state_dict(params: Dict, mcfg: ModelConfig) -> Dict[str, Any]:
    """Our parameter pytree → a reference ``MMTG.state_dict()``-shaped
    dict of torch tensors (inverse of :func:`import_reference_state_dict`,
    loadable by the reference model / our torch oracle with only the HF
    attention mask buffers regenerated). Lets a user trained on this
    framework move a checkpoint BACK to the reference PyTorch code.
    """
    import torch  # optional dependency, fenced to the export tool

    def t(x):
        return torch.from_numpy(np.asarray(jax.device_get(x)).copy())

    out: Dict[str, Any] = {}

    def put_linear(name, p):
        out[f"{name}.weight"] = t(p["w"]).T.contiguous()
        out[f"{name}.bias"] = t(p["b"])

    def put_ln(name, p):
        out[f"{name}.weight"] = t(p["g"])
        out[f"{name}.bias"] = t(p["b"])

    def put_rnn(prefix, p):
        for k, layer in enumerate(p["layers"]):
            out[f"{prefix}.weight_ih_l{k}"] = t(layer["w_ih"]).T.contiguous()
            out[f"{prefix}.weight_hh_l{k}"] = t(layer["w_hh"]).T.contiguous()
            out[f"{prefix}.bias_ih_l{k}"] = t(layer["b_ih"])
            out[f"{prefix}.bias_hh_l{k}"] = t(layer["b_hh"])

    put_linear("encoder.topic_fc", params["encoder"]["topic_fc"])
    put_rnn("encoder.rnns_image", params["encoder"]["image"])
    put_rnn("encoder.rnns_text", params["encoder"]["text"])
    put_ln("ln_layer1", params["ln_topic"])
    put_ln("ln_layer2", params["ln_image"])
    put_ln("ln_layer3", params["ln_text"])
    for pre, key in (
        ("img_inner_atten_layer", "alpha_img"),
        ("text_inner_atten_layer", "alpha_text"),
    ):
        for sub in ("query", "key", "value"):
            put_linear(f"{pre}.{sub}", params[key][sub])
    for i in range(mcfg.seq_len):
        out[f"mm_atten_layer.att_matrices.{i}.weight"] = (
            t(params["beta"]["att_w"][i]).T.contiguous()
        )
        out[f"mm_atten_layer.att_matrices.{i}.bias"] = t(params["beta"]["att_b"][i])
    put_linear("mm_atten_layer.out_linear", params["beta"]["out"])
    put_linear("decoder.projector_layer1", params["projector1"])
    put_linear("decoder.projector_layer2", params["projector2"])

    # GPT-2 (inverse of models.gpt2.import_hf_gpt2): HF Conv1D weights are
    # [in, out] like ours — unstack the layer axis, no transposes.
    g = params["gpt2"]
    out["decoder.gpt2.transformer.wte.weight"] = t(g["wte"])
    out["decoder.gpt2.transformer.wpe.weight"] = t(g["wpe"])
    out["decoder.gpt2.lm_head.weight"] = t(g["wte"])  # weight-tied head
    names = {
        "ln1_g": "ln_1.weight", "ln1_b": "ln_1.bias",
        "attn_w": "attn.c_attn.weight", "attn_b": "attn.c_attn.bias",
        "attn_proj_w": "attn.c_proj.weight", "attn_proj_b": "attn.c_proj.bias",
        "ln2_g": "ln_2.weight", "ln2_b": "ln_2.bias",
        "mlp_fc_w": "mlp.c_fc.weight", "mlp_fc_b": "mlp.c_fc.bias",
        "mlp_proj_w": "mlp.c_proj.weight", "mlp_proj_b": "mlp.c_proj.bias",
    }
    for ours, theirs in names.items():
        stacked = g["h"][ours]
        for i in range(mcfg.gpt2.n_layer):
            out[f"decoder.gpt2.transformer.h.{i}.{theirs}"] = t(stacked[i])
    out["decoder.gpt2.transformer.ln_f.weight"] = t(g["lnf_g"])
    out["decoder.gpt2.transformer.ln_f.bias"] = t(g["lnf_b"])
    return out


def save_reference_checkpoint(path: str, params: Dict, mcfg: ModelConfig) -> None:
    """Write a reference-format ``.pth``: ``{'model': state_dict, 'args',
    'model_cfgs'}`` with the ``nn.DataParallel`` ``module.`` prefix the
    reference's loader strips (``generate.py:188-192``,
    ``train.py:212-213``)."""
    import torch

    sd = export_reference_state_dict(params, mcfg)
    torch.save(
        {
            "model": {f"module.{k}": v for k, v in sd.items()},
            "args": {},
            "model_cfgs": {},
        },
        path,
    )


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
