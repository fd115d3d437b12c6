#!/usr/bin/env python
"""GenEval image generation (the reference's evaluation/inference_geneval.py).

Usage:
  python scripts/inference_geneval.py config=configs/unigen_1_5b/unigen_pt1.yaml \
      inference.metadata_file=prompts.jsonl inference.output_dir=out \
      inference.n_samples=4 training.guidance_scale=6
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.evaluation.geneval import load_metadata_jsonl, run_geneval
    from unigen_tpu.utils.configuration import initialize_config

    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)
    inf = config.get("inference", {})

    pipeline = launch.build_pipeline(config)
    metadata = load_metadata_jsonl(inf["metadata_file"])
    written = run_geneval(
        pipeline, metadata, inf["output_dir"], jax.random.key(inf.get("seed", 0)),
        n_samples=inf.get("n_samples", 4),
        guidance_scale=config.training.get("guidance_scale", 6.0),
        timesteps=inf.get("generation_timesteps", 50),
        eval_text_len=inf.get("eval_text_len", 128),
        mode=config.model.get("t2i_gen_mode", "mask"))
    print(f"wrote {len(written)} prompt dirs to {inf['output_dir']}")


if __name__ == "__main__":
    main()
