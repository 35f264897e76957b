"""Run the reference's OWN PyTorch code (``/root/reference/src/model.py``)
as a parity oracle — no reconstruction in the loop.

``mmtg_tpu/oracle.py`` re-creates the reference computation with torch/HF
primitives; a reconstruction can share a misreading with the implementation
it checks. This module closes that loop: it imports the mounted reference
source verbatim, stubs exactly its three offline-hostile I/O points, loads
an ``export_reference_state_dict`` checkpoint into the real ``MMTG`` class
(``model.py:330-400``), and exposes its forward for logits diffing.

The three stubs (I/O only — zero computation is replaced):

1. ``GPT2LMHeadModel.from_pretrained("uer/gpt2-chinese-cluecorpussmall")``
   (``model.py:219``) downloads from the HF hub; there is no network
   egress here, and every downloaded weight is immediately overwritten by
   ``load_state_dict`` anyway (phase-1 ckpt at ``model.py:345-354``, full
   ckpt at ``generate.py:188-192``). Stub: construct ``GPT2LMHeadModel``
   from a config instead.
2. ``GPT2Config.from_json_file("config/model_config.json")``
   (``model.py:214``) reads a cwd-relative path. Stub: return the config
   object directly (the real JSON for full-size runs, a shrunken one for
   the in-suite test).
3. ``pickle.load(open("./vocab/token_id2emb_dict.pkl"))`` (``model.py:215``)
   needs the unreleased 109 MB WenLan side-table. Stub: a dict built from
   the same ``[V, 2048]`` table our side uses, so both frameworks embed
   tokens from identical vectors.

Hard reference constraints a config must satisfy to run its code at all
(all hardcoded in ``model.py``): ``out_linear → 2048`` (``:179``),
projector ``2048→512→768`` (``:216-218``), alpha-prior table built for
``range(5)`` steps (``:117``). So even the "tiny" in-suite config keeps
``wenlan_emb_size=2048``, ``mm_att_out_dim=2048``, ``n_embd=768``,
``seq_len=5`` and shrinks only vocab / layer count / channel widths.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from typing import Any, Dict, Tuple

import numpy as np

from mmtg_tpu.configs import DataConfig, GPT2Config, ModelConfig

REFERENCE_SRC = "/root/reference/src"

_MODULE_CACHE: Dict[str, Any] = {}


def reference_available(src_dir: str = REFERENCE_SRC) -> bool:
    """True when the mounted reference source and torch are importable."""
    if not os.path.exists(os.path.join(src_dir, "model.py")):
        return False
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except Exception:
        return False
    return True


def load_reference_module(src_dir: str = REFERENCE_SRC):
    """Import the reference ``model.py`` verbatim under a private name.

    ``model.py`` does ``from configs import data_config`` at import time
    (``model.py:21``), so ``src_dir`` goes on ``sys.path`` only for the
    duration of the import; the ``configs`` entry it leaves in
    ``sys.modules`` is renamed away so nothing in this process can later
    shadow-import the reference's flat modules by accident.
    """
    if src_dir in _MODULE_CACHE:
        return _MODULE_CACHE[src_dir]
    spec = importlib.util.spec_from_file_location(
        "mmtg_reference_model", os.path.join(src_dir, "model.py")
    )
    module = importlib.util.module_from_spec(spec)
    had_configs = "configs" in sys.modules
    prior_configs = sys.modules.get("configs")
    sys.path.insert(0, src_dir)
    try:
        spec.loader.exec_module(module)
    finally:
        sys.path.remove(src_dir)
        ref_configs = sys.modules.pop("configs", None)
        if had_configs:
            sys.modules["configs"] = prior_configs
        if ref_configs is not None:
            sys.modules["mmtg_reference_configs"] = ref_configs
    _MODULE_CACHE[src_dir] = module
    return module


def reference_model_cfgs(mcfg: ModelConfig) -> Dict[str, Any]:
    """Our ``ModelConfig`` → the reference's ``model_cfgs`` dict
    (key layout: reference ``configs.py:14-41``)."""
    def chan(c):
        return {
            "type": c.type,
            "input_dim": c.input_dim,
            "hidden_dim": c.hidden_dim,
            "num_layers": c.num_layers,
        }

    return {
        "seq_len": mcfg.seq_len,
        "topic": {
            "input_dim": mcfg.topic.input_dim,
            "hidden_dim": mcfg.topic.hidden_dim,
        },
        "image": chan(mcfg.image),
        "text": chan(mcfg.text),
        "SELF_ATT": {
            "hidden_size": mcfg.self_att_hidden_size,
            "attention_heads": mcfg.self_att_heads,
        },
        "MM_ATT": {"attention_dim": mcfg.mm_att_dim},
        "GPT2_PATH": mcfg.gpt2_path,
        "dropout": mcfg.dropout,
    }


def hf_gpt2_config(gcfg: GPT2Config):
    """Our ``GPT2Config`` → an HF ``transformers.GPT2Config`` with the
    fields the reference JSON pins (``config/model_config.json:1-10``)."""
    import transformers

    return transformers.GPT2Config(
        vocab_size=gcfg.vocab_size,
        n_positions=gcfg.n_positions,
        n_embd=gcfg.n_embd,
        n_layer=gcfg.n_layer,
        n_head=gcfg.n_head,
        layer_norm_epsilon=gcfg.layer_norm_epsilon,
        initializer_range=gcfg.initializer_range,
        resid_pdrop=gcfg.resid_pdrop,
        embd_pdrop=gcfg.embd_pdrop,
        attn_pdrop=gcfg.attn_pdrop,
        activation_function="gelu_new",
    )


def build_reference_mmtg(
    mcfg: ModelConfig,
    dcfg: DataConfig,
    wenlan_table: np.ndarray,
    train_branch: bool = True,
    src_dir: str = REFERENCE_SRC,
):
    """Instantiate the reference's real ``MMTG`` class offline.

    Constructs with ``train_flag=False`` to skip the phase-1
    ``torch.load(model_cfgs['GPT2_PATH'])`` (``model.py:345-354``), then
    sets the ``train_flag`` attribute so ``forward`` takes the requested
    branch (it is plain instance state, read only at ``model.py:397``).
    Returns the model in ``eval()`` mode (dropout off, matching our
    ``deterministic=True`` forwards).
    """
    ref = load_reference_module(src_dir)
    cfg = hf_gpt2_config(mcfg.gpt2)
    table = {
        int(i): np.asarray(wenlan_table[i], dtype=np.float32).tolist()
        for i in range(len(wenlan_table))
    }

    import transformers

    class _OfflineGPT2LMHeadModel:
        @staticmethod
        def from_pretrained(name, **kw):
            return transformers.GPT2LMHeadModel(cfg)

    class _StaticGPT2Config:
        @staticmethod
        def from_json_file(path):
            return cfg

    saved = (
        ref.GPT2LMHeadModel,
        ref.GPT2Config,
        ref.GPT2_Decoder.load_token_id2emb,
    )
    ref.GPT2LMHeadModel = _OfflineGPT2LMHeadModel
    ref.GPT2Config = _StaticGPT2Config
    ref.GPT2_Decoder.load_token_id2emb = lambda self, path: table
    try:
        model = ref.MMTG(
            reference_model_cfgs(mcfg), dcfg, mcfg.gpt2.vocab_size,
            train_flag=False,
        )
    finally:
        (
            ref.GPT2LMHeadModel,
            ref.GPT2Config,
            ref.GPT2_Decoder.load_token_id2emb,
        ) = saved
    model.train_flag = bool(train_branch)
    model.eval()
    return model


def load_params_into_reference(model, params: Dict, mcfg: ModelConfig):
    """Load our pytree into the real reference class via
    ``export_reference_state_dict``; raise if anything but regenerable HF
    attention-mask buffers fails to map."""
    from mmtg_tpu.checkpoint import export_reference_state_dict

    sd = export_reference_state_dict(params, mcfg)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    missing = [
        k for k in missing
        if not k.endswith((".attn.bias", ".attn.masked_bias"))
    ]
    if missing or unexpected:
        raise ValueError(
            f"state-dict mismatch vs reference model.py: "
            f"missing={missing[:5]} unexpected={list(unexpected)[:5]}"
        )
    return model


def reference_forward(
    model, batch: Dict[str, np.ndarray], targets: np.ndarray | None = None
) -> Tuple[np.ndarray, float, float]:
    """Run ``MMTG.forward`` (``model.py:356-400``) on a numpy batch.

    ``targets`` overrides ``batch['targets']`` (the decode-prefix case the
    sampler feeds at ``generate.py:117-124``). Returns
    ``(logits [B, prompt+T, V], kl, hf_lm_loss)`` as numpy/floats.
    """
    import torch

    tb = {}
    for k, v in batch.items():
        if k == "sample_mask":
            continue
        v = np.asarray(v)
        tb[k] = torch.from_numpy(
            v.astype(np.float32) if v.dtype.kind == "f" else v.astype(np.int64)
        )
    if targets is not None:
        tb["targets"] = torch.from_numpy(np.asarray(targets).astype(np.int64))
    with torch.no_grad():
        loss, kl, logits = model(tb)
    return (
        logits.numpy(),
        float(kl),
        float(loss) if loss is not None and loss.dim() == 0 else float("nan"),
    )
