"""Golden tests for the omni attention masks vs the reference mask builders."""
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.ops import masks as M

from _reference import load_reference_module

PAD, SOI, EOI = 900, 901, 902


@pytest.fixture(scope="module")
def ref_prompting():
    return load_reference_module("training/prompting_utils.py", "ref_prompting")


def _t2i_like_batch():
    # [pad pad text text soi img img img eoi] and a no-pad row
    row0 = [PAD, PAD, 5, 6, SOI, 10, 11, 12, EOI]
    row1 = [3, 4, 5, 6, SOI, 10, 11, 12, EOI]
    return np.array([row0, row1], dtype=np.int64)


@pytest.mark.parametrize("rm_pad", [False, True])
def test_predict_next_mask_matches_reference(ref_prompting, rm_pad):
    import torch
    seq = _t2i_like_batch()
    theirs = ref_prompting.create_attention_mask_predict_next(
        torch.tensor(seq), pad_id=PAD, soi_id=SOI, eoi_id=EOI,
        rm_pad_in_image=rm_pad, return_inverse_mask=False).numpy().astype(bool)
    ours = np.asarray(M.create_attention_mask_predict_next(
        jnp.asarray(seq), pad_id=PAD, soi_id=SOI, eoi_id=EOI, rm_pad_in_image=rm_pad))
    np.testing.assert_array_equal(ours, theirs)


def test_mmu_mask_matches_reference(ref_prompting):
    import torch
    # mmu layout: [im_start mmu soi img img img eoi text text]
    seq = np.array([[7, 8, SOI, 10, 11, 12, EOI, 20, 21],
                    [7, 8, SOI, 13, 14, 15, EOI, 22, 23]], dtype=np.int64)
    theirs = ref_prompting.create_attention_mask_for_mmu(
        torch.tensor(seq), eoi_id=EOI, return_inverse_mask=False).numpy().astype(bool)
    ours = np.asarray(M.create_attention_mask_for_mmu(jnp.asarray(seq), eoi_id=EOI))
    np.testing.assert_array_equal(ours, theirs)


def test_mmu_vit_mask_matches_reference(ref_prompting):
    import torch
    b, l = 2, 20
    seq = torch.zeros((b, l, 4))
    theirs = ref_prompting.create_attention_mask_for_mmu_vit(
        seq, return_inverse_mask=False, system_prompt_len=3, num_images=1,
        num_tokens=6).numpy().astype(bool)
    ours = np.asarray(M.create_attention_mask_for_mmu_vit(
        b, l, system_prompt_len=3, num_images=1, num_tokens=6))
    np.testing.assert_array_equal(ours, theirs)
    # ragged spatial_shapes path
    shapes = np.array([[2, 3], [3, 3]], dtype=np.int64)
    theirs = ref_prompting.create_attention_mask_for_mmu_vit(
        seq, return_inverse_mask=False, prefix_length=4,
        num_tokens=torch.tensor(shapes)).numpy().astype(bool)
    ours = np.asarray(M.create_attention_mask_for_mmu_vit(
        b, l, prefix_length=4, num_tokens=jnp.asarray(shapes)))
    np.testing.assert_array_equal(ours, theirs)


def test_attn_meta_matches_dense_t2i():
    """The kernel-side metadata must reproduce the dense omni mask on non-pad rows."""
    seq = jnp.asarray(_t2i_like_batch())
    meta = M.t2i_attn_meta(seq, PAD, SOI, EOI)
    dense = M.create_attention_mask_predict_next(seq, PAD, SOI, EOI, rm_pad_in_image=True)
    vis = meta.visibility()
    # Rows/cols involving pads differ by design (meta removes pad rows entirely);
    # compare on non-pad query rows only.
    nonpad = ~np.asarray(meta.pad)
    ours, ref = np.asarray(vis), np.asarray(dense)
    for b in range(seq.shape[0]):
        np.testing.assert_array_equal(ours[b, 0][nonpad[b]], ref[b, 0][nonpad[b]])


def test_attn_meta_mmu():
    seq = jnp.asarray([[7, 8, SOI, 10, 11, 12, EOI, 20, 21]])
    meta = M.mmu_attn_meta(seq, PAD, SOI, EOI)
    dense = M.create_attention_mask_for_mmu(seq, eoi_id=EOI)
    np.testing.assert_array_equal(np.asarray(meta.visibility()), np.asarray(dense))


def test_causal_mask_from_attention():
    att = jnp.asarray([[1, 1, 1, 0, 0]])
    m = np.asarray(M.causal_mask_from_attention(att))[0, 0]
    assert m[2, 0] and m[2, 2] and not m[1, 2] and not m[3, 3] and not m[4, 0]


def test_to_additive():
    m = jnp.asarray([[True, False]])
    a = np.asarray(M.to_additive(m))
    assert a[0, 0] == 0.0 and a[0, 1] < -1e30


def test_predict_next_mask_multi_segment(ref_prompting):
    """Two image segments per row (multi-image mmu layouts)."""
    import torch
    seq = np.array([[5, SOI, 10, 11, EOI, 6, SOI, 12, 13, EOI, 7]], dtype=np.int64)
    theirs = ref_prompting.create_attention_mask_predict_next(
        torch.tensor(seq), pad_id=PAD, soi_id=SOI, eoi_id=EOI,
        return_inverse_mask=False).numpy().astype(bool)
    ours = np.asarray(M.create_attention_mask_predict_next(
        jnp.asarray(seq), pad_id=PAD, soi_id=SOI, eoi_id=EOI))
    np.testing.assert_array_equal(ours, theirs)
