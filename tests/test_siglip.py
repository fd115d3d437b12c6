"""SigLIP tower parity vs HuggingFace SiglipVisionModel (torch CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import siglip as SG

TINY = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=14)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(attn_implementation="eager", **TINY)
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = SG.SiglipConfig(drop_last_layer=True, **TINY)
    params = SG.convert_hf_state_dict(sd, cfg)
    return hf, cfg, params


def test_tower_output_matches_hf_truncated_encoder(hf_pair):
    """Our tower output == HF hidden state after (num_layers - 1) encoder layers
    (the reference deletes the last layer and takes hidden_states[-1])."""
    import torch
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(px.transpose(0, 3, 1, 2)), output_hidden_states=True)
    # hidden_states[0] = embeddings, [i] = after layer i; drop-last -> index n-1
    ref = out.hidden_states[cfg.num_hidden_layers - 1].numpy()
    ours = np.asarray(SG.forward(params, cfg, jnp.asarray(px)))
    assert ours.shape == ref.shape == (2, 4, TINY["hidden_size"])
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_so400m_shapes_abstract():
    cfg = SG.SiglipConfig.so400m()
    assert cfg.num_patches == 729
    params_shape = jax.eval_shape(lambda k: SG.init(k, cfg), jax.random.key(0))
    out = jax.eval_shape(lambda p, x: SG.forward(p, cfg, x), params_shape,
                         jax.ShapeDtypeStruct((1, 384, 384, 3), jnp.float32))
    assert out.shape == (1, 729, 1152)


def test_registry_dispatch():
    from unigen_tpu.models.builder import get_vision_tower_config
    from unigen_tpu.models.registry import MODEL_REGISTRY
    mod, cfg = get_vision_tower_config("siglip-so400m-patch14-384")
    assert cfg.hidden_size == 1152
    m, c = MODEL_REGISTRY.get("magvitv2")
    assert c.codebook_size == 8192
    with pytest.raises(ValueError):
        get_vision_tower_config("clip-vit")
