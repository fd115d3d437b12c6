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
