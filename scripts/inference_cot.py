#!/usr/bin/env python
"""CoT-V Best-of-N test-time scaling (the reference's
evaluation/inference_unigen_cot.py): generate N candidates per prompt,
self-verify with yes/no VQA, keep the top-k.

Usage:
  python scripts/inference_cot.py config=... inference.metadata_file=prompts.jsonl \
      inference.output_dir=out inference.n_samples=20 inference.mmu_prompt_style=rule
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.evaluation.cot import run_cot
    from unigen_tpu.evaluation.geneval import load_metadata_jsonl, save_png
    from unigen_tpu.pipeline import pixels_to_uint8
    from unigen_tpu.utils.configuration import initialize_config

    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)
    inf = config.get("inference", {})

    pipeline = launch.build_pipeline(config)
    metadata = load_metadata_jsonl(inf["metadata_file"])
    prompts = [m.get("prompt", m.get("text")) for m in metadata]
    results = run_cot(
        pipeline, prompts, jax.random.key(inf.get("seed", 0)),
        n_samples=inf.get("n_samples", 20), topk=inf.get("topk", 4),
        guidance_scale=config.training.get("guidance_scale", 6.0),
        timesteps=inf.get("generation_timesteps", 50),
        eval_text_len=inf.get("eval_text_len", 128),
        style=inf.get("mmu_prompt_style", "rule"),
        use_vision_tower=config.model.unigen.get("w_und_encoder", False))

    out = inf["output_dir"]
    import json
    for idx, res in enumerate(results):
        d = os.path.join(out, f"{idx:05}", "samples")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(out, f"{idx:05}", "metadata.jsonl"), "w") as f:
            json.dump({"prompt": res["prompt"]}, f)
        imgs = pixels_to_uint8(res["selected"])
        for i in range(imgs.shape[0]):
            save_png(imgs[i], os.path.join(d, f"{i:05}.png"))
    print(f"wrote top-k selections for {len(results)} prompts to {out}")


if __name__ == "__main__":
    main()
