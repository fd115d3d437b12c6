"""Config-driven construction of tokenizers, models, pipelines and trainers.

This is the glue the reference spreads across its entry points
(reference: training/train.py:150-260, evaluation/inference_unigen_cot.py:56-143):
resolve checkpoint aliases, load or initialize each model, size the unified
vocabulary from the tokenizer, and wire the prompting engine.

Every loader degrades gracefully to random initialization when a checkpoint path
is absent (``synthetic=True`` runs end-to-end with no weights on disk), so smoke
tests and benchmarks don't require the original checkpoints.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from .models import magvit, siglip, unigen
from .models.builder import get_vision_tower_config
from .pipeline import UniGenPipeline
from .prompting import UniPrompting
from .utils.checkpoint_registry import real_checkpoint
from .utils.configuration import Config
from .utils.logging import get_logger

logger = get_logger(__name__)


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when a sitecustomize overrode jax.config.

    The ambient TPU environment forces ``jax_platforms`` after env parsing; entry
    scripts call this before any backend initialization so ``JAX_PLATFORMS=cpu``
    smoke runs actually stay on CPU.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            logger.warning("backend already initialized; JAX_PLATFORMS not applied")


TRAIN_SPECIAL_TOKENS = ("<|soi|>", "<|eoi|>", "<|sov|>", "<|eov|>", "<|t2i|>",
                        "<|mmu|>", "<|t2v|>", "<|v2v|>", "<|lvg|>")


def _is_native_checkpoint(path: str) -> bool:
    """True when ``path`` holds our persistence-format checkpoint ('/'-joined
    pytree paths in safetensors, utils/persistence.py) rather than a
    reference/HF torch layout ('.'-separated module names). Lets every loader
    accept either format, so checkpoints converted once by
    scripts/import_weights.py reload without re-running the torch key mapping."""
    import glob as _glob
    files = _glob.glob(os.path.join(path, "*.safetensors"))
    if not files:
        return False
    from safetensors import safe_open
    with safe_open(files[0], framework="numpy") as f:
        for k in f.keys():
            return "/" in k
    return False


def _load_native(path: str, init_fn, template_key: int):
    """Load a native checkpoint against the abstract init structure (no
    memory spent materializing a random template)."""
    from .utils.persistence import from_pretrained
    template = jax.eval_shape(init_fn, jax.random.key(template_key))
    return from_pretrained(path, template)[0]


class FallbackTokenizer:
    """Deterministic byte-level tokenizer used when no Qwen tokenizer is on disk.

    Mirrors the HF fast-tokenizer surface UniPrompting needs. Base ids 0..255 are
    bytes; Qwen special markers and added tokens get ids from 151643 up, matching
    the real Qwen2.5 id neighborhood so vocab layout stays realistic.
    """

    BASE = {"<|endoftext|>": 151643, "<|im_start|>": 151644, "<|im_end|>": 151645,
            "<|vision_start|>": 151652, "<|vision_end|>": 151653}

    def __init__(self):
        self.specials = dict(self.BASE)
        self.next_id = 151665
        self.pad_token_id = 151643
        self.eos_token_id = 151645
        self.vocab_size = 151643

    def add_tokens(self, tokens):
        for t in tokens:
            if t not in self.specials:
                self.specials[t] = self.next_id
                self.next_id += 1

    def convert_tokens_to_ids(self, tokens):
        return [self.specials.get(t, 0) for t in tokens]

    def __len__(self):
        return self.next_id

    def _encode(self, text: str):
        ids, i = [], 0
        specials = sorted(self.specials, key=len, reverse=True)
        while i < len(text):
            for s in specials:
                if text.startswith(s, i):
                    ids.append(self.specials[s])
                    i += len(s)
                    break
            else:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def __call__(self, texts, **kw):
        if isinstance(texts, str):
            return {"input_ids": self._encode(texts)}
        return {"input_ids": [self._encode(t) for t in texts]}

    def decode(self, ids, **kw):
        rev = {v: k for k, v in self.specials.items()}
        out, buf = [], []
        for i in ids:
            if i < 256:
                buf.append(i)
            else:
                if buf:
                    out.append(bytes(buf).decode("utf-8", "replace"))
                    buf = []
                out.append(rev.get(int(i), ""))
        if buf:
            out.append(bytes(buf).decode("utf-8", "replace"))
        return "".join(out)


def load_tokenizer(config: Config):
    path = real_checkpoint(config.model.unigen.llm_model_path,
                           config.model.get("ckpt_base_path", ""))
    if os.path.isdir(path):
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            path, model_max_length=config.model.unigen.get("model_max_length", 32768),
            padding_side="right")
    logger.warning(f"tokenizer not found at {path}; using byte-level fallback")
    return FallbackTokenizer()


def build_prompting(config: Config, tokenizer) -> UniPrompting:
    max_len_mode = config.model.get("max_len_mode", "text")
    max_seq_len = (config.dataset.preprocessing.max_seq_length
                   + config.model.unigen.num_vq_tokens + 3
                   if max_len_mode == "text"
                   else config.model.unigen.get("model_max_length", 32768))
    return UniPrompting(
        tokenizer, special_tokens=TRAIN_SPECIAL_TOKENS, max_seq_len=max_seq_len,
        ignore_id=-100,
        cond_dropout_prob=config.training.get("cond_dropout_prob", 0.1),
        enable_reuse_tk=config.model.get("enable_reuse_tk", False),
        task_token_first=config.model.get("task_token_first", True))


def build_unigen_config(config: Config, prompting: UniPrompting, dtype=None
                        ) -> unigen.UniGenConfig:
    """The UniGenConfig a run's YAML + tokenizer imply (no weights touched)."""
    import jax.numpy as jnp
    mcfg = config.model.unigen
    text_vocab_len = len(prompting.text_tokenizer)
    vocab = text_vocab_len + mcfg.codebook_size + 1
    # optional size overrides (smoke tests / scaled-down runs)
    llm_kw = dict(vocab_size=vocab, dtype=dtype or jnp.bfloat16,
                  rope_theta=mcfg.get("rope_theta", 1e6) or 1e6)
    for k in ("hidden_size", "intermediate_size", "num_hidden_layers",
              "num_attention_heads", "num_key_value_heads", "head_dim"):
        if mcfg.get(k) is not None:
            llm_kw[k] = int(mcfg[k])
    llm_cfg = unigen.Qwen2Config(**llm_kw)
    return unigen.UniGenConfig(
        llm=llm_cfg, vocab_size=vocab,
        llm_vocab_size=prompting.text_tokenizer.vocab_size,
        text_vocab_len=text_vocab_len,
        codebook_size=mcfg.codebook_size, num_vq_tokens=mcfg.num_vq_tokens,
        w_und_encoder=mcfg.get("w_und_encoder", False),
        mm_input_dim=mcfg.get("mm_input_dim", 1152),
        und_proj_depth=mcfg.get("und_proj_depth", 2),
        gen_proj_depth=mcfg.get("gen_proj_depth", 0),
        use_gen_dim=mcfg.get("use_gen_dim", False),
        gen_input_dim=mcfg.get("gen_input_dim", 16))


def build_unigen(config: Config, prompting: UniPrompting, dtype=None
                 ) -> Tuple[Any, unigen.UniGenConfig]:
    cfg = build_unigen_config(config, prompting, dtype)
    mcfg = config.model.unigen
    path = mcfg.get("pretrained_model_path", "")
    if path:
        resolved = os.path.join(path, "unwrapped_model") \
            if os.path.isdir(os.path.join(path, "unwrapped_model")) else path
        if os.path.isdir(resolved):
            logger.info(f"loading UniGen weights from {resolved}")
            if _is_native_checkpoint(resolved):
                return _load_native(resolved, lambda k: unigen.init(k, cfg), 0), cfg
            from .utils.hf_import import import_unigen
            return import_unigen(resolved, cfg), cfg
        logger.warning(f"UniGen checkpoint missing at {path}; random init")
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    return params, cfg


def build_vq(config: Config, dtype=None) -> Tuple[Any, magvit.MagvitConfig]:
    import jax.numpy as jnp
    # optional size overrides from model.vq_model (smoke tests / scaled-down runs,
    # same idea as the LLM overrides in build_unigen_config)
    vcfg = config.model.get("vq_model", {})
    kw = {}
    for k in ("ch", "enc_ch_mult", "enc_num_res_blocks", "dec_ch_mult",
              "dec_num_res_blocks", "attn_resolutions", "resolution",
              "z_channels"):
        v = vcfg.get(k)
        if v is not None:
            kw[k] = tuple(v) if isinstance(v, (list, tuple)) else int(v)
    cfg = magvit.MagvitConfig(dtype=dtype or jnp.bfloat16, **kw)
    path = real_checkpoint(config.model.vq_model.get("vq_model_name", "magvitv2"),
                           config.model.get("ckpt_base_path", ""))
    if os.path.isdir(path):
        logger.info(f"loading MAGViTv2 weights from {path}")
        if _is_native_checkpoint(path):
            return _load_native(path, lambda k: magvit.init(k, cfg), 1), cfg
        from .utils.hf_import import import_magvit
        return import_magvit(path, cfg), cfg
    logger.warning(f"MAGViTv2 checkpoint missing at {path}; random init")
    return jax.jit(lambda k: magvit.init(k, cfg))(jax.random.key(1)), cfg


def build_vision_tower(config: Config, dtype=None):
    vt = config.model.get("vision_tower", {})
    name = vt.get("name")
    if not name:
        return None, None
    import dataclasses

    import jax.numpy as jnp
    mod, cfg = get_vision_tower_config(name)
    if dtype is not None:
        cfg = dataclasses.replace(cfg, dtype=dtype)
    # optional size overrides (smoke tests / scaled-down runs)
    overrides = {k: int(vt[k]) for k in
                 ("hidden_size", "intermediate_size", "num_hidden_layers",
                  "num_attention_heads", "image_size", "patch_size")
                 if vt.get(k) is not None and hasattr(cfg, k)}
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    path = real_checkpoint(name, config.model.get("ckpt_base_path", ""))
    if os.path.isdir(path):
        logger.info(f"loading vision tower weights from {path}")
        if _is_native_checkpoint(path):
            return _load_native(path, lambda k: mod.init(k, cfg), 2), cfg
        from .utils.hf_import import load_state_dict
        return mod.convert_hf_state_dict(load_state_dict(path), cfg), cfg
    logger.warning(f"vision tower checkpoint missing at {path}; random init")
    return jax.jit(lambda k: mod.init(k, cfg))(jax.random.key(2)), cfg


def build_pipeline(config: Config, dtype=None) -> UniGenPipeline:
    tokenizer = load_tokenizer(config)
    prompting = build_prompting(config, tokenizer)
    params, cfg = build_unigen(config, prompting, dtype)
    vq_params, vq_cfg = build_vq(config, dtype)
    vs_params, vs_cfg = build_vision_tower(config, dtype)
    # model.quantization=int8 puts the whole inference path on the W8A8 MXU
    # lane: backbone + both heads + the SigLIP tower (the measured lmms
    # bottleneck, BENCH.md). Quality-gated in tests/test_quantization.py;
    # real-weights score gate in docs/WEIGHTS.md §6.
    if str(config.model.get("quantization", "")).lower() == "int8":
        from .models import siglip
        from .ops.quantization import quantize_siglip_params, quantize_unigen_params
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        if vs_params is not None and isinstance(vs_cfg, siglip.SiglipConfig):
            vs_params = jax.jit(quantize_siglip_params)(vs_params)
            logger.info("backbone + heads + SigLIP tower quantized to int8 W8A8")
        else:
            logger.info("backbone + heads quantized to int8 W8A8")
    return UniGenPipeline(params, cfg, vq_params, vq_cfg, prompting,
                          vision_params=vs_params, vision_cfg=vs_cfg)
