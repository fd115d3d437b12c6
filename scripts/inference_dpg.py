#!/usr/bin/env python
"""DPG-bench generation (the reference's evaluation/inference_dpg.py): one 2x2
grid PNG per prompt.

Usage:
  python scripts/inference_dpg.py config=... inference.prompts_file=dpg.jsonl \
      inference.output_dir=out
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.evaluation.dpg import run_dpg
    from unigen_tpu.utils.configuration import initialize_config

    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)
    inf = config.get("inference", {})

    with open(inf["prompts_file"]) as f:
        prompts = [json.loads(l) for l in f if l.strip()]
    pipeline = launch.build_pipeline(config)
    written = run_dpg(
        pipeline, prompts, inf["output_dir"], jax.random.key(inf.get("seed", 0)),
        n_samples=inf.get("n_samples", 4),
        guidance_scale=config.training.get("guidance_scale", 6.0),
        timesteps=inf.get("generation_timesteps", 50),
        eval_text_len=inf.get("eval_text_len", 256))
    print(f"wrote {len(written)} grids to {inf['output_dir']}")


if __name__ == "__main__":
    main()
