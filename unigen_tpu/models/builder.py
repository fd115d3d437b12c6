"""Vision-tower dispatch by name (reference: models/multimodal_encoder/builder.py:9-15)."""
from __future__ import annotations

from . import siglip


def get_vision_tower_config(vision_tower_name: str):
    """Name-based dispatch: 'siglip2'+'naflex' -> SigLIP2-NaFlex, 'siglip' -> SigLIP.

    Returns (module, config); the module exposes init/forward/convert_hf_state_dict.
    """
    name = vision_tower_name.lower()
    if "siglip2" in name and "naflex" in name:
        from . import siglip2
        return siglip2, siglip2.Siglip2Config.naflex()
    if "siglip" in name:
        return siglip, siglip.SiglipConfig.so400m()
    raise ValueError(f"Unknown vision tower: {vision_tower_name}")
