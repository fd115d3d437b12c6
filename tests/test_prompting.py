"""Golden parity: UniPrompting vs the reference UniversalPromptingQwen2.

Both engines are driven by the same mock tokenizer, so every layout decision
(padding side, special-token placement, label masking, eos scans) is compared
token-for-token without needing Qwen tokenizer weights.
"""
import numpy as np
import pytest

from unigen_tpu.prompting import UniPrompting

from _reference import load_reference_module


class MockTokenizer:
    """Minimal HF-style tokenizer: chars -> ord ids, multi-char specials -> own ids."""

    BASE_SPECIALS = {"<|im_start|>": 500, "<|im_end|>": 501, "[PAD]": 502,
                     "<|vision_start|>": 503, "<|vision_end|>": 504}

    def __init__(self):
        self.specials = dict(self.BASE_SPECIALS)
        self.next_id = 600
        self.pad_token_id = 502
        self.eos_token_id = 501
        self.vocab_size = 500
        self.model_max_length = 10 ** 6

    def add_tokens(self, tokens):
        for t in tokens:
            if t not in self.specials:
                self.specials[t] = self.next_id
                self.next_id += 1

    def convert_tokens_to_ids(self, tokens):
        return [self.specials.get(t, 0) for t in tokens]

    def __len__(self):
        return self.next_id

    def _encode_one(self, text):
        ids, i = [], 0
        # longest-match specials first
        specials = sorted(self.specials, key=len, reverse=True)
        while i < len(text):
            for s in specials:
                if text.startswith(s, i):
                    ids.append(self.specials[s])
                    i += len(s)
                    break
            else:
                ids.append(min(ord(text[i]), 499))
                i += 1
        return ids

    def __call__(self, texts, truncation=False, **kw):
        class Enc(dict):
            @property
            def input_ids(self):
                return self["input_ids"]
        if isinstance(texts, str):
            return Enc(input_ids=self._encode_one(texts))
        return Enc(input_ids=[self._encode_one(t) for t in texts])


SPECIALS = ("<|soi|>", "<|eoi|>", "<|sov|>", "<|eov|>", "<|t2i|>",
            "<|mmu|>", "<|t2v|>", "<|v2v|>", "<|lvg|>")


@pytest.fixture(scope="module")
def engines():
    ref_mod = load_reference_module("training/prompting_utils.py", "ref_prompting_engine")
    ref = ref_mod.UniversalPromptingQwen2(
        MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
        cond_dropout_prob=0.0, task_token_first=False)
    ours = UniPrompting(
        MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
        cond_dropout_prob=0.0, task_token_first=False)
    assert ours.sptids_dict == {k: int(v) for k, v in ref.sptids_dict.items()}
    return ref, ours


def _img(b=2, n=8, offset=700):
    rng = np.random.default_rng(0)
    return rng.integers(offset, offset + 50, size=(b, n))


def test_t2i_prompt_parity(engines):
    import torch
    ref, ours = engines
    texts = ["a red cat", "dog"]
    img = _img()
    labels = img + 1
    r_ids, r_mask, r_lab = ref((texts, torch.tensor(img), torch.tensor(labels)), "t2i")
    o_ids, o_mask, o_lab = ours((texts, img, labels), "t2i")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_mask, r_mask.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())


def test_t2i_gen_prompt_parity(engines):
    import torch
    ref, ours = engines
    texts = ["blue bird flying", "x"]
    img = _img()
    for max_len in (None, 20):
        inp = (texts, torch.tensor(img)) if max_len is None else (texts, torch.tensor(img), max_len)
        r_ids, r_mask = ref(inp, "t2i_gen")
        o_inp = (texts, img) if max_len is None else (texts, img, max_len)
        o_ids, o_mask = ours(o_inp, "t2i_gen")
        np.testing.assert_array_equal(o_ids, r_ids.numpy())
        np.testing.assert_array_equal(o_mask, r_mask.numpy())


def test_t2i_gen_truncation_parity(engines):
    import torch
    ref, ours = engines
    long_text = "a" * 100  # forces the truncation branch
    img = _img(b=1)
    r_ids, r_mask = ref(([long_text], torch.tensor(img)), "t2i_gen")
    o_ids, o_mask = ours(([long_text], img), "t2i_gen")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_mask, r_mask.numpy())


def test_lm_prompt_parity(engines):
    import torch
    ref, ours = engines
    texts = ["hello world", "k" * 80]  # second one exceeds max_seq_len
    r_ids, r_mask, r_lab = ref((texts, 32), "lm")
    o_ids, o_mask, o_lab = ours((texts, 32), "lm")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_mask, r_mask.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())


def test_mmu_prompt_parity(engines):
    import torch
    ref, ours = engines
    texts = ["what is this?", "describe"]
    img = _img()
    r_ids, r_mask, r_lab = ref((torch.tensor(img), texts), "mmu")
    o_ids, o_mask, o_lab = ours((img, texts), "mmu")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_mask, r_mask.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())


def test_mmu_conv_parity_discrete(engines):
    import torch
    ref, ours = engines
    img = _img(b=2, n=6)
    rng = np.random.default_rng(3)
    conv = rng.integers(10, 90, size=(2, 12))
    conv[0, 7] = 501  # eos inside row 0
    conv[1, :] = np.where(conv[1] == 501, 99, conv[1])  # no eos in row 1
    r_ids, r_mask, r_lab = ref((torch.tensor(img), torch.tensor(conv), None, None), "mmu_conv")
    o_ids, o_mask, o_lab = ours((img, conv, None, None), "mmu_conv")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_mask, r_mask.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())


def test_mmu_conv_parity_with_system(engines):
    import torch
    ref, ours = engines
    img = _img(b=2, n=6)
    rng = np.random.default_rng(4)
    conv = rng.integers(10, 90, size=(2, 10))
    conv[:, -1] = 501
    system = rng.integers(10, 90, size=(2, 5))
    r = ref((torch.tensor(img), torch.tensor(conv), torch.tensor(conv), torch.tensor(system)),
            "mmu_conv")
    o = ours((img, conv, conv, system), "mmu_conv")
    for a, b in zip(o, r):
        np.testing.assert_array_equal(a, b.numpy())


def test_mmu_embed_parity(engines):
    import torch
    ref, ours = engines
    embeds = np.zeros((2, 6, 4), np.float32)  # uniform-length continuous images
    texts = ["what<|im_end|>\n<|im_start|>assistant\nanswer<|im_end|>",
             "why<|im_end|>\n<|im_start|>assistant\nyes<|im_end|>"]
    r = ref((torch.tensor(embeds), texts), "mmu_emb")
    o = ours((embeds, texts), "mmu_emb")
    for a, b in zip(o, r):
        np.testing.assert_array_equal(a, b.numpy())


def test_lm_conv_parity(engines):
    import torch
    ref, ours = engines
    rng = np.random.default_rng(5)
    ids = rng.integers(10, 90, size=(3, 64))
    ids[0, 20] = 501
    ids[1, 63] = 501
    # row 2: no eos
    ids[2] = np.where(ids[2] == 501, 99, ids[2])
    r_mask, r_pos = ref(torch.tensor(ids), "lm_conv")
    o_mask, o_pos = ours(ids, "lm_conv")
    np.testing.assert_array_equal(o_mask, r_mask.numpy())
    np.testing.assert_array_equal(o_pos, r_pos.numpy())


def test_task_token_first_variant(engines):
    import torch
    ref_mod = load_reference_module("training/prompting_utils.py", "ref_prompting_engine2")
    ref = ref_mod.UniversalPromptingQwen2(
        MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
        cond_dropout_prob=0.0, task_token_first=True)
    ours = UniPrompting(MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
                        cond_dropout_prob=0.0, task_token_first=True)
    img = _img()
    r_ids, _, _ = ref((torch.tensor(img), ["q1", "q2"]), "mmu")
    o_ids, _, _ = ours((img, ["q1", "q2"]), "mmu")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())


def test_reuse_tk_maps_vision_tokens():
    ours = UniPrompting(MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
                        enable_reuse_tk=True)
    assert ours.sptids_dict["<|soi|>"] == 503
    assert ours.sptids_dict["<|eoi|>"] == 504


def test_cond_dropout():
    rng = np.random.default_rng(1)
    ours = UniPrompting(MockTokenizer(), special_tokens=SPECIALS, max_seq_len=64,
                        cond_dropout_prob=1.0, rng=rng)
    img = _img(b=1)
    ids, _, _ = ours((["some long caption text"], img, img), "t2i")
    ids_empty, _, _ = ours(([""], img, img), "t2i")
    np.testing.assert_array_equal(ids, ids_empty)  # all text dropped


# ---------------------------------------------------------------------------
# Legacy (Llama/Phi-era) UniversalPrompting engine incl. video tasks
# (reference training/prompting_utils.py:426-973). The reference's attention
# masks there are mis-sized (computed after padding, :471-473, :553-563), so
# parity asserts on input_ids/labels; masks are checked for shape-consistency.
# ---------------------------------------------------------------------------

class LegacyMockTokenizer(MockTokenizer):
    """Adds the bos token + HF str-form convert_tokens_to_ids the legacy
    engine's __init__ uses (prompting_utils.py:434-441)."""

    def __init__(self):
        super().__init__()
        self.specials["<|bos|>"] = 505
        self.bos_token_id = 505

    def add_special_tokens(self, d):
        if "pad_token" in d:
            self.specials.setdefault(d["pad_token"], self.pad_token_id)

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self.specials.get(tokens, 0)
        return [self.specials.get(t, 0) for t in tokens]


@pytest.fixture(scope="module")
def legacy_engines():
    from unigen_tpu.prompting import UniPromptingLegacy
    ref_mod = load_reference_module("training/prompting_utils.py", "ref_prompting_legacy")
    ref = ref_mod.UniversalPrompting(
        LegacyMockTokenizer(), special_tokens=SPECIALS, max_text_len=12,
        max_seq_len=64, cond_dropout_prob=0.0)
    ours = UniPromptingLegacy(
        LegacyMockTokenizer(), special_tokens=SPECIALS, max_text_len=12,
        max_seq_len=64, cond_dropout_prob=0.0)
    assert {k: int(v) for k, v in ref.sptids_dict.items()} == ours.sptids_dict
    return ref, ours


def test_legacy_t2i_prompt_parity(legacy_engines):
    import torch
    ref, ours = legacy_engines
    texts = ["a red cat", "dog"]
    img = _img()
    labels = img + 1
    r_ids, _, r_lab = ref((texts, torch.tensor(img), torch.tensor(labels)), "t2i")
    o_ids, o_mask, o_lab = ours((texts, img, labels), "t2i")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())
    assert o_mask.shape == o_ids.shape  # the fixed (aligned) masks


def test_legacy_t2v_and_lvg_supervise_text(legacy_engines):
    """t2v/lvg label the text positions too (reference :663-669, :755-761) and
    t2v uses the <|sov|>/<|eov|> video markers."""
    import torch
    ref, ours = legacy_engines
    texts = ["a video of rain", "x"]
    vid = _img()
    labels = vid + 1
    for task in ("t2v", "lvg"):
        r_ids, _, r_lab = ref((texts, torch.tensor(vid), torch.tensor(labels)), task)
        o_ids, o_mask, o_lab = ours((texts, vid, labels), task)
        np.testing.assert_array_equal(o_ids, r_ids.numpy())
        np.testing.assert_array_equal(o_lab, r_lab.numpy())
        assert o_mask.shape == o_ids.shape
    assert ours.sptids_dict["<|sov|>"] in ours((texts, vid, labels), "t2v")[0]


def test_legacy_gen_prompts_parity(legacy_engines):
    import torch
    ref, ours = legacy_engines
    texts = ["blue bird", "y"]
    img = _img()
    r_ids, _ = ref((texts, torch.tensor(img)), "t2i_gen")
    o_ids, _ = ours((texts, img), "t2i_gen")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    r_ids, _ = ref((texts, torch.tensor(img)), "t2v_gen")
    o_ids, _ = ours((texts, img), "t2v_gen")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    r_ids, _ = ref((texts, torch.tensor(img)), "lvg_gen")
    o_ids, _ = ours((texts, img), "lvg_gen")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())


def test_legacy_t2i_gen_negative_max_len(legacy_engines):
    """max_len < 0 sizes the pad to the longest caption (+3) (reference :512-514)."""
    import torch
    ref, ours = legacy_engines
    texts = ["longer caption here", "s"]
    img = _img()
    r_ids, _ = ref((texts, torch.tensor(img), -1), "t2i_gen")
    o_ids, _ = ours((texts, img, -1), "t2i_gen")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())


def test_legacy_lm_and_mmu_parity(legacy_engines):
    import torch
    ref, ours = legacy_engines
    texts = ["some document text", "tiny"]
    r_ids, _, r_lab = ref((texts, 16), "lm")
    o_ids, o_mask, o_lab = ours((texts, 16), "lm")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())

    img = _img()
    r_ids, _, r_lab = ref((torch.tensor(img), ["what is it?", "hm"]), "mmu")
    o_ids, o_mask, o_lab = ours((img, ["what is it?", "hm"]), "mmu")
    np.testing.assert_array_equal(o_ids, r_ids.numpy())
    np.testing.assert_array_equal(o_lab, r_lab.numpy())
    assert o_mask.shape == o_ids.shape


def test_legacy_mmu_conv_parity(legacy_engines):
    import torch
    ref, ours = legacy_engines
    img = _img(b=2, n=6)
    rng = np.random.default_rng(4)
    conv = rng.integers(10, 90, size=(2, 10))
    system = rng.integers(10, 90, size=(2, 4))
    # discrete tokens, with and without a system prompt
    for sys_ids in (None, system):
        ts = None if sys_ids is None else torch.tensor(sys_ids)
        r_ids, r_none, r_lab = ref((torch.tensor(img), torch.tensor(conv),
                                    torch.tensor(conv), ts), "mmu_conv")
        o_ids, o_none, o_lab = ours((img, conv, conv, sys_ids), "mmu_conv")
        np.testing.assert_array_equal(o_ids, r_ids.numpy())
        np.testing.assert_array_equal(o_lab, r_lab.numpy())
    # continuous embeddings -> (part1, part2, None, labels)
    embeds = np.zeros((2, 6, 4), np.float32)
    r = ref((torch.tensor(embeds), torch.tensor(conv), torch.tensor(conv), None),
            "mmu_conv")
    o = ours((embeds, conv, conv, None), "mmu_conv")
    np.testing.assert_array_equal(o[0], r[0].numpy())
    np.testing.assert_array_equal(o[1], r[1].numpy())
    np.testing.assert_array_equal(o[3], r[3].numpy())


def test_legacy_mmu_embed():
    """The reference's mmu_embed crashes on its own [B,N] ignore-block bug
    (prompting_utils.py:886) — assert the fixed layout directly."""
    from unigen_tpu.prompting import UniPromptingLegacy
    tok = LegacyMockTokenizer()
    ours = UniPromptingLegacy(tok, special_tokens=SPECIALS, max_text_len=12,
                              max_seq_len=64, cond_dropout_prob=0.0)
    embeds = np.zeros((2, 6, 4), np.float32)
    prefix, suffix, _, labels = ours((embeds, ["hello", "y"]), "mmu_emb")
    assert prefix.shape == (2, 2)
    assert prefix[0, 0] == ours.sptids_dict["<|mmu|>"]
    assert prefix[0, 1] == ours.sptids_dict["<|soi|>"]
    assert suffix[0, 0] == ours.sptids_dict["<|eoi|>"]
    # labels ignore prefix+image+eoi, supervise text (pads -> ignore)
    assert (labels[:, :6 + 3] == -100).all()
    assert (labels[0, 9:] != 0).any()


def test_legacy_t2i_plus_lm(legacy_engines):
    import torch
    ref, ours = legacy_engines
    texts = ["img caption", "more caption", "pure text", "another doc"]
    img = _img(b=2)
    labels = img + 1

    class _Cfg:
        class training:
            batch_size = 2
    r = ref((texts, torch.tensor(img), torch.tensor(labels), 16), "t2i_plus_lm",
            config=_Cfg)
    o = ours((texts, img, labels, 16), "t2i_plus_lm", config=2)
    np.testing.assert_array_equal(o[0][0], r[0][0].numpy())  # t2i ids
    np.testing.assert_array_equal(o[0][2], r[0][2].numpy())  # t2i labels
    np.testing.assert_array_equal(o[1][0], r[1][0].numpy())  # lm ids
    np.testing.assert_array_equal(o[1][2], r[1][2].numpy())  # lm labels
