"""mmtg_tpu — a TPU-native JAX framework with the capabilities of MMTG.

MMTG ("Multi-Modal Experience Inspired AI Creation", Cao et al., ACM MM 2022)
turns a sequence of multi-modal experiences — a topic plus five interleaved
image/text WenLan embeddings — into ten lines of generated lyrics.

This package is a ground-up TPU-first rebuild (JAX / XLA / Pallas / pjit),
not a port: parameters are plain pytrees, every forward is a pure jittable
function, generation is a KV-cached `lax.scan` decode with fused batched
top-k/top-p sampling, and scaling happens through `jax.sharding` meshes.

Reference behavior citations use ``/root/reference`` file:line coordinates
(e.g. ``model.py:330-400``) so parity can be audited.
"""

__version__ = "0.1.0"

from mmtg_tpu.configs import (  # noqa: F401
    DataConfig,
    GPT2Config,
    ModelConfig,
    TrainConfig,
    GenerateConfig,
)
