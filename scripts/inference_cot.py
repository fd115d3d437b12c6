#!/usr/bin/env python
"""CoT-V Best-of-N test-time scaling (the reference's
evaluation/inference_unigen_cot.py): generate N candidates per prompt,
self-verify with yes/no VQA, keep the top-k.

Prompts shard across hosts; rating tables are all-gathered before selection
(reference :310-316, :417-427). Output layout matches the reference so the
GenEval/DPG scorers consume it unchanged (run_evaluation.sh:205-237):

  <outdir>/t2i_samples_step{T}_scale{G}/<idx:05>/samples/*.png   all N candidates
  <outdir>/t2i_samples_step{T}_scale{G}_selected_prompt_{style}/ top-k per prompt
  <outdir>/rating_table_{style}.jsonl, rating_stats_{style}.jsonl (process 0)

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
    import json

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

    # optional DPG-style per-prompt question file (reference :297-304)
    questions_map = None
    if inf.get("question_file"):
        questions_map = {}
        for row in load_metadata_jsonl(inf["question_file"]):
            questions_map[row.get("prompt", row.get("text"))] = row["questions"]

    style = inf.get("mmu_prompt_style", "rule")
    timesteps = inf.get("generation_timesteps", 50)
    guidance = config.training.get("guidance_scale", 6.0)
    results, rating_table, stats = run_cot(
        pipeline, prompts, jax.random.key(inf.get("seed", 0)),
        n_samples=inf.get("n_samples", 20), topk=inf.get("topk", 4),
        guidance_scale=guidance, timesteps=timesteps,
        eval_text_len=inf.get("eval_text_len", 128), style=style,
        use_vision_tower=config.model.unigen.get("w_und_encoder", False),
        max_new_tokens=config.model.get("max_new_tokens", 128),
        questions_map=questions_map)

    out = inf["output_dir"]
    all_dir = os.path.join(out, f"t2i_samples_step{timesteps}_scale{guidance:g}")
    sel_dir = all_dir + f"_selected_prompt_{style}"
    for res in results:
        idx, md = res["index"], metadata[res["index"]]
        for base, imgs in ((all_dir, pixels_to_uint8(res["candidates"])),
                           (sel_dir, pixels_to_uint8(res["selected"]))):
            d = os.path.join(base, f"{idx:05}", "samples")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(base, f"{idx:05}", "metadata.jsonl"), "w") as f:
                json.dump(md, f)
            for i in range(imgs.shape[0]):
                save_png(imgs[i], os.path.join(d, f"{i:05}.png"))

    if jax.process_index() == 0:
        with open(os.path.join(out, f"rating_table_{style}.jsonl"), "w") as f:
            for row in rating_table:
                f.write(json.dumps(row) + "\n")
        with open(os.path.join(out, f"rating_stats_{style}.jsonl"), "w") as f:
            for row in stats:
                f.write(json.dumps(row) + "\n")
    print(f"wrote {len(results)} prompts (all candidates + top-k selections) to {out}")


if __name__ == "__main__":
    main()
