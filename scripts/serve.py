#!/usr/bin/env python
"""Production serving entry point: continuous-batching HTTP server.

The reference has no serving runtime (its closest analog is the batch-1
lmms-eval loop, reference third_party/lmms/models/unigen.py:259-430); this
stands up the TPU-native engine (unigen_tpu/serving/) behind HTTP.

Usage:
  python scripts/serve.py config=configs/unigen_1_5b/unigen_sft.yaml \
      serving.port=8000 serving.slots=32 serving.max_len=1024 \
      [serving.int8=true] [serving.quantized_cache=true] [serving.chunk=8]

Then:
  curl -s localhost:8000/v1/generate -d '{"prompt": "What is a TPU?"}'
  curl -s localhost:8000/healthz

Prompts are wrapped in the Qwen ChatML template (the layout UniPrompting uses
for mmu text turns); pass {"raw": true} in the request body to skip it.
Generation stops at <|im_end|> or ``serving.max_new_tokens``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unigen_tpu import launch  # noqa: E402

launch.apply_platform_env()


class ChatTokenizer:
    """encode/decode shim for the HTTP server: ChatML-wraps user prompts."""

    def __init__(self, tokenizer, raw: bool = False):
        self._tok = tokenizer
        self.raw = raw

    def encode(self, text: str):
        if not self.raw:
            text = (f"<|im_start|>user\n{text}<|im_end|>\n"
                    f"<|im_start|>assistant\n")
        return self.encode_raw(text)

    def encode_raw(self, text: str):
        """No ChatML wrapping — the OpenAI chat route assembles its own.
        Subscript access works for HF BatchEncoding AND the byte-level
        FallbackTokenizer's plain dict (attribute access does not)."""
        return list(self._tok(text, add_special_tokens=False)["input_ids"])

    def decode(self, ids):
        return self._tok.decode(ids, skip_special_tokens=True)


def main() -> int:
    from unigen_tpu.serving import ServingEngine
    from unigen_tpu.serving.server import ServingHTTPServer
    from unigen_tpu.utils.configuration import initialize_config
    from unigen_tpu.utils.logging import get_logger

    logger = get_logger("serve")
    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides
                     if o.startswith("config=")), None)
    config = initialize_config(cfg_path, overrides)
    s = config.get("serving", {})

    pipeline = launch.build_pipeline(config)
    params, cfg = pipeline.params, pipeline.cfg
    already_int8 = "lm_head_q" in params["llm"]  # model.quantization=int8 path
    if bool(s.get("int8", False)) and not already_int8:
        import jax

        from unigen_tpu.ops.quantization import quantize_unigen_params
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        logger.info("backbone + lm_head quantized to int8 W8A8")

    decode_params = None
    if bool(s.get("int4_decode", False)):
        # mixed precision: prefill on `params`, HBM-bound decode chunks on the
        # W4A8 tree (measured +20% decode tok/s at batch 32; prefill would
        # LOSE from the unpack overhead, so it stays int8/bf16)
        if already_int8:
            raise SystemExit(
                "serving.int4_decode needs float source kernels: use "
                "serving.int8=true (quantizes at serve time) instead of "
                "model.quantization=int8 (bakes int8 into the build)")
        import jax

        from unigen_tpu.ops.int4 import quantize_unigen_params_int4
        decode_params = jax.jit(
            lambda p: quantize_unigen_params_int4(p, cfg))(pipeline.params)
        logger.info("decode chunks on int4 W4A8 weights (serving.int4_decode)")

    tok = ChatTokenizer(pipeline.prompting.text_tokenizer,
                        raw=bool(s.get("raw", False)))
    im_end = pipeline.prompting.sptids_dict["<|im_end|>"]
    engine = ServingEngine(
        params, cfg,
        slots=int(s.get("slots", 8)),
        max_len=int(s.get("max_len", 1024)),
        buckets=tuple(s.get("buckets", (128, 256, 512))),
        chunk=int(s.get("chunk", 8)),
        top_k=(int(s["top_k"]) if s.get("top_k") is not None else None),
        quantized_cache=bool(s.get("quantized_cache", False)),
        speculate_k=int(s.get("speculate_k", 0)),
        pad_id=pipeline.prompting.pad_id,
        decode_params=decode_params)

    image_engine = None
    if bool(s.get("images", False)):
        from unigen_tpu.serving import ImageServingEngine
        image_engine = ImageServingEngine(
            pipeline,
            batch=int(s.get("image_batch", 6)),   # measured chip peak, BENCH.md
            guidance_scale=float(s.get("guidance_scale", 6.0)),
            timesteps=int(s.get("timesteps", 50)))
        logger.info("image serving enabled (batch=%d)", image_engine.batch)

    server = ServingHTTPServer(
        engine, host=str(s.get("host", "0.0.0.0")), port=int(s.get("port", 8000)),
        tokenizer=tok,
        default_max_new_tokens=int(s.get("max_new_tokens", 256)),
        default_eot_token=int(im_end),   # stop templated chats at <|im_end|>
        image_engine=image_engine)
    server.start()
    logger.info("serving on %s:%s (slots=%d, max_len=%d)", server.host,
                server.port, engine.slots, engine.max_len)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.close()
        engine.close()
        if image_engine is not None:
            image_engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
