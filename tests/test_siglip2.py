"""SigLIP2-NaFlex tests: HF parity for embeddings+encoder, patchify, padding mask."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import siglip2 as SG2

TINY = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_patches=16, patch_size=4)


def test_patchify_roundtrip():
    img = np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    patches, (h, w) = SG2.patchify(img, 4)
    assert (h, w) == (2, 2) and patches.shape == (4, 48)
    # first patch is the top-left 4x4 block
    np.testing.assert_array_equal(patches[0].reshape(4, 4, 3), img[:4, :4])


def test_resize_positional_embeddings_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(16, 32)).astype(np.float32)  # 4x4 grid
    shapes = np.array([[2, 3], [4, 4]])
    ours = SG2.resize_positional_embeddings(pos, shapes, max_length=16)
    grid = torch.tensor(pos.reshape(4, 4, 32)).permute(2, 0, 1).unsqueeze(0)
    for i, (h, w) in enumerate([(2, 3), (4, 4)]):
        ref = F.interpolate(grid, size=(h, w), mode="bilinear", align_corners=False,
                            antialias=True)
        ref = ref.reshape(32, h * w).T.numpy()
        np.testing.assert_allclose(ours[i, :h * w], ref, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(ours[i, h * w:], ref[0:1].repeat(16 - h * w, 0),
                                   atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    try:
        from transformers import Siglip2VisionConfig, Siglip2VisionModel
    except ImportError:
        pytest.skip("transformers without siglip2")
    hf_cfg = Siglip2VisionConfig(num_channels=3, attn_implementation="eager", **TINY)
    torch.manual_seed(0)
    hf = Siglip2VisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = SG2.Siglip2Config(drop_last_layer=True, **TINY)
    params = SG2.convert_hf_state_dict(sd, cfg)
    return hf, cfg, params


def test_naflex_tower_matches_hf(hf_pair):
    import torch
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    # two images: 2x3 and 4x4 patches, padded to 16
    maxn = 16
    pix = rng.normal(size=(2, maxn, cfg.patch_dim)).astype(np.float32)
    mask = np.zeros((2, maxn), np.int32)
    mask[0, :6] = 1
    mask[1, :16] = 1
    shapes = np.array([[2, 3], [4, 4]])
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pix),
                 pixel_attention_mask=torch.tensor(mask),
                 spatial_shapes=torch.tensor(shapes), output_hidden_states=True)
    ref = out.hidden_states[cfg.num_hidden_layers - 1].numpy()
    ours = np.asarray(SG2.forward(params, cfg, jnp.asarray(pix), jnp.asarray(mask),
                                  shapes))
    # compare only valid (non-pad) positions
    for i in range(2):
        n = int(mask[i].sum())
        np.testing.assert_allclose(ours[i, :n], ref[i, :n], atol=3e-4, rtol=1e-3)


def test_builder_dispatches_naflex():
    from unigen_tpu.models.builder import get_vision_tower_config
    mod, cfg = get_vision_tower_config("siglip2-so400m-naflex")
    assert cfg.num_patches == 256
