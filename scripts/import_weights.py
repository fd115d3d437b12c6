#!/usr/bin/env python
"""One-time conversion of reference (torch) checkpoints to our portable format.

The weights-arrival runbook (docs/WEIGHTS.md): when trained reference
checkpoints land, run this once per stage to convert the torch key layout
(reference models/modeling_utils.py:257-401 save format) into our
'/'-joined-pytree safetensors (utils/persistence.py). Every launch.py loader
auto-detects the converted format, so all entry points (train, inference_*,
lmms) work from the converted dirs with no further flags.

Usage:
  python scripts/import_weights.py config=configs/unigen_1_5b/unigen_pt2.yaml \
      unigen_src=/ckpts/unigen-1.5b [magvit_src=/ckpts/magvitv2] \
      [vision_src=/ckpts/siglip2] out=/ckpts/converted

Each *_src is optional; whatever is given is converted to <out>/<component>.
``unigen_src`` may point at either the checkpoint root (an ``unwrapped_model/``
subdir is resolved automatically, reference train.py:1105-1118 layout) or the
unwrapped dir itself.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert(config, unigen_src=None, magvit_src=None, vision_src=None, out="converted"):
    """Returns {component: output_dir} for everything converted."""
    from unigen_tpu import launch
    from unigen_tpu.models import magvit as MV
    from unigen_tpu.models.builder import get_vision_tower_config
    from unigen_tpu.utils import hf_import as HI
    from unigen_tpu.utils.persistence import save_pretrained

    written = {}
    if unigen_src:
        tokenizer = launch.load_tokenizer(config)
        prompting = launch.build_prompting(config, tokenizer)
        # the target UniGenConfig this run's YAML + tokenizer imply (no weights)
        cfg = launch.build_unigen_config(config, prompting)
        resolved = os.path.join(unigen_src, "unwrapped_model") \
            if os.path.isdir(os.path.join(unigen_src, "unwrapped_model")) else unigen_src
        params = HI.import_unigen(resolved, cfg)
        dst = os.path.join(out, "unigen")
        save_pretrained(params, dst, config=cfg)
        written["unigen"] = dst
    if magvit_src:
        cfg = MV.MagvitConfig()
        params = HI.import_magvit(magvit_src, cfg)
        dst = os.path.join(out, "magvitv2")
        save_pretrained(params, dst, config=cfg)
        written["magvitv2"] = dst
    if vision_src:
        name = config.model.get("vision_tower", {}).get("name", "siglip")
        mod, cfg = get_vision_tower_config(name)
        params = mod.convert_hf_state_dict(HI.load_state_dict(vision_src), cfg)
        dst = os.path.join(out, name)
        save_pretrained(params, dst, config=cfg)
        written[name] = dst
    return written


def main():
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.utils.configuration import initialize_config

    overrides = sys.argv[1:]
    kw = dict(o.split("=", 1) for o in overrides if "=" in o)
    config = initialize_config(kw.get("config"),
                               [o for o in overrides
                                if not o.split("=", 1)[0].endswith("_src")
                                and not o.startswith("out=")])
    written = convert(config,
                      unigen_src=kw.get("unigen_src"),
                      magvit_src=kw.get("magvit_src"),
                      vision_src=kw.get("vision_src"),
                      out=kw.get("out", "converted"))
    if not written:
        print("nothing to convert: pass unigen_src= / magvit_src= / vision_src=",
              file=sys.stderr)
        sys.exit(2)
    for comp, dst in written.items():
        print(f"converted {comp} -> {dst}")


if __name__ == "__main__":
    main()
