"""unigen_tpu: a TPU-native (JAX/XLA/Pallas/pjit) unified multimodal LLM framework.

Re-designed from scratch with the capabilities of apple/ml-unigen (see SURVEY.md):
image understanding (SigLIP vision tower + Qwen2.5 backbone) and image generation
(MAGViTv2 discrete tokens + MaskGIT masked-token parallel decoding), plus CoT-V
Best-of-N test-time scaling.

The compute path is functional JAX: models are pure ``init``/``apply`` functions over
parameter pytrees, samplers are single jitted ``lax.scan`` loops, and parallelism is
expressed as shardings over a ``jax.sharding.Mesh`` (DP/FSDP/TP) instead of the
reference's Accelerate/DeepSpeed stack.
"""

__version__ = "0.1.0"
