"""High-level inference pipeline: prompts -> images, images -> answers.

Wires prompting + backbone + samplers + MAGViT decode into the user-facing calls
the reference exposes through its evaluation scripts
(reference: evaluation/inference_geneval.py:148-292, inference_unigen_cot.py:278-428,
third_party/lmms/models/unigen.py:259-430).

All device work goes through module-level jitted functions whose static arguments
are the frozen configs and protocol constants — one compile per (shape, protocol),
reused across every batch of an evaluation run. Host work is only string/tokenizer
assembly. CoT-V keeps candidates on-device end-to-end: generate -> decode ->
re-encode for rating without a PNG round trip (SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .generation import mmu_generate, t2i_generate, t2i_generate_ar
from .models import magvit, siglip, unigen
from .ops import masks as M
from .ops import sampling as S
from .prompting import UniPrompting

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg", "pad_id", "soi_id", "eoi_id",
                                   "guidance_scale", "timesteps", "temperature",
                                   "mask_schedule", "mode"))
def _generate_codes(params, cfg, ids, uncond_ids, key, *, pad_id, soi_id, eoi_id,
                    guidance_scale, timesteps, temperature, mask_schedule, mode):
    both = jnp.concatenate([ids, uncond_ids], axis=0)
    attn = M.create_attention_mask_predict_next(
        both, pad_id=pad_id, soi_id=soi_id, eoi_id=eoi_id, rm_pad_in_image=True)
    if mode == "ar":
        att1d = (both != pad_id).astype(jnp.int32)
        return t2i_generate_ar(params, cfg, key, ids, uncond_ids, att1d,
                               guidance_scale=guidance_scale, temperature=temperature)
    if guidance_scale <= 1:
        attn = attn[: ids.shape[0]]
    return t2i_generate(params, cfg, key, ids, attn, uncond_input_ids=uncond_ids,
                        temperature=temperature, timesteps=timesteps,
                        guidance_scale=guidance_scale,
                        noise_schedule=S.get_mask_schedule(mask_schedule),
                        pad_id=pad_id)


@partial(jax.jit, static_argnames=("cfg", "vq_cfg"))
def _decode_codes(vq_params, cfg, vq_cfg, codes):
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    return magvit.decode_code(vq_params, vq_cfg, codes)


@partial(jax.jit, static_argnames=("vq_cfg",))
def _encode_pixels(vq_params, vq_cfg, pixels):
    return magvit.get_code(vq_params, vq_cfg, pixels)


@partial(jax.jit, static_argnames=("cfg", "eoi_id", "eos_id", "max_new_tokens",
                                   "temperature", "top_k", "quantized_cache"))
def _mmu_decode(params, cfg, ids, prompt_len, key, *, eoi_id, eos_id,
                max_new_tokens, temperature, top_k, quantized_cache=False):
    attn = M.create_attention_mask_for_mmu(ids, eoi_id=eoi_id)
    keep = jnp.arange(ids.shape[1])[None] < prompt_len[:, None]
    attn = attn & keep[:, None, None, :] & keep[:, None, :, None]
    return mmu_generate(params, cfg, key, input_ids=ids, attention_mask=attn,
                        prompt_len=prompt_len, max_new_tokens=max_new_tokens,
                        temperature=temperature, top_k=top_k, eot_token=eos_id,
                        quantized_cache=quantized_cache)


@partial(jax.jit, static_argnames=("cfg", "sys_len", "eos_id", "max_new_tokens",
                                   "temperature", "top_k", "quantized_cache"))
def _mmu_vit_decode(params, cfg, part1, part2, img_embeds, prompt_len, key, *,
                    sys_len, eos_id, max_new_tokens, temperature, top_k,
                    quantized_cache=False):
    e1 = unigen.embed_tokens(params, part1)
    e2 = unigen.embed_tokens(params, part2)
    embeds = jnp.concatenate([e1, img_embeds.astype(e1.dtype), e2], axis=1)
    b, l, _ = embeds.shape
    attn = M.create_attention_mask_for_mmu_vit(
        b, l, system_prompt_len=sys_len, num_tokens=img_embeds.shape[1],
        prefix_length=part1.shape[1])
    keep = jnp.arange(l)[None] < prompt_len[:, None]
    attn = attn & keep[:, None, None, :] & keep[:, None, :, None]
    return mmu_generate(params, cfg, key, input_embeddings=embeds,
                        attention_mask=attn, prompt_len=prompt_len,
                        max_new_tokens=max_new_tokens, temperature=temperature,
                        top_k=top_k, eot_token=eos_id,
                        quantized_cache=quantized_cache)


@partial(jax.jit, static_argnames=("cfg", "sys_len"))
def _mmu_vit_score(params, cfg, part1, part2c, img_embeds, cont_mask, valid_len,
                   *, sys_len):
    """Log-likelihood of the continuation tokens inside ``part2c``.

    ``part2c`` [B, L2] = the mmu_conv part2 ids with the continuation ids
    appended, right-padded to a bucketed length; ``cont_mask`` [B, L2] marks
    the continuation positions; ``valid_len`` [B] is the real (unpadded)
    length of each row of ``part2c``. Pad slots are excluded from attention
    (same keep-trimming as ``_mmu_vit_decode``) and from the scored sum, so
    bucketing lengths to a few static shapes never changes the result.

    Returns (sum log p(cont | prompt) [B], greedy-match flag [B]) — the
    lmms-eval ``loglikelihood`` contract. One forward, no sampling."""
    from .models import qwen2
    e1 = unigen.embed_tokens(params, part1)
    e2 = unigen.embed_tokens(params, part2c)
    embeds = jnp.concatenate([e1, img_embeds.astype(e1.dtype), e2], axis=1)
    b, l, _ = embeds.shape
    l2 = part2c.shape[1]
    off = l - l2                                    # start of part2c in the splice
    attn = M.create_attention_mask_for_mmu_vit(
        b, l, system_prompt_len=sys_len, num_tokens=img_embeds.shape[1],
        prefix_length=part1.shape[1])
    keep = jnp.arange(l)[None] < (off + valid_len)[:, None]
    attn = attn & keep[:, None, None, :] & keep[:, None, :, None]
    hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds,
                              mask=attn)
    # hidden at position p predicts token p+1: part2c[:, j] is predicted from
    # splice position off+j-1
    logits = qwen2.logits(params["llm"], cfg.llm,
                          hidden[:, off - 1:l - 1]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, part2c[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(logits, axis=-1) == part2c
    return (jnp.where(cont_mask, tok_lp, 0.0).sum(axis=-1),
            jnp.where(cont_mask, greedy, True).all(axis=-1))


@partial(jax.jit, static_argnames=("sys_len",))
def _mmu_vit_inputs(params, part1, part2, img_embeds, prompt_len, *, sys_len):
    """Spliced embeddings + omni attention mask for ONE understanding request —
    the exact construction ``_mmu_vit_decode`` performs before ``mmu_generate``,
    returned instead of consumed so the serving engine can admit the request
    into a continuous batch (``ServingEngine.submit_embeds``). Pad slots beyond
    ``prompt_len`` are masked out of attention, so bucketing part2 lengths never
    changes the result."""
    e1 = unigen.embed_tokens(params, part1)
    e2 = unigen.embed_tokens(params, part2)
    embeds = jnp.concatenate([e1, img_embeds.astype(e1.dtype), e2], axis=1)
    b, l, _ = embeds.shape
    attn = M.create_attention_mask_for_mmu_vit(
        b, l, system_prompt_len=sys_len, num_tokens=img_embeds.shape[1],
        prefix_length=part1.shape[1])
    keep = jnp.arange(l)[None] < prompt_len[:, None]
    attn = attn & keep[:, None, None, :] & keep[:, None, :, None]
    return embeds, attn


@partial(jax.jit, static_argnames=("vision_cfg",))
def _vision_forward(vision_params, vision_cfg, pixels):
    if jnp.issubdtype(pixels.dtype, jnp.integer):
        # uint8 pixels normalized ON DEVICE with the same fp32 op sequence as
        # siglip_preprocess (/255, -0.5, /0.5) — bit-identical to the host
        # float path, but the host->device transfer ships 1 byte/pixel instead
        # of 4 (the relay link moves ~40MB/s: a [16,384,384,3] fp32 batch costs
        # ~700ms of wall time per understand() call, uint8 ~300ms — measured).
        pixels = (pixels.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return siglip.forward(vision_params, vision_cfg, pixels)


@partial(jax.jit, static_argnames=())
def _mm_project(params, feats):
    return unigen.mm_project(params, feats)


@dataclasses.dataclass
class UniGenPipeline:
    params: Any
    cfg: unigen.UniGenConfig
    vq_params: Any
    vq_cfg: magvit.MagvitConfig
    prompting: UniPrompting
    vision_params: Optional[Any] = None
    vision_cfg: Optional[siglip.SiglipConfig] = None
    quantized_cache: bool = False   # int8 KV cache for understanding decode

    # ------------------------------------------------------------------ t2i --

    def generate_images(
        self,
        prompts: Sequence[str],
        key: Array,
        *,
        guidance_scale: float = 6.0,
        timesteps: int = 50,
        temperature: float = 1.0,
        max_text_len: int = 128,
        mask_schedule: str = "cosine",
        mode: str = "mask",
        return_codes: bool = False,
    ):
        """prompts -> pixels in [-1, 1], [B, H, W, 3] (GenEval protocol defaults:
        guidance 6, 50 steps — reference scripts/run_evaluation.sh:122-131)."""
        n = self.cfg.num_vq_tokens
        sp = self.prompting.sptids_dict
        mask_img = np.full((len(prompts), n), self.cfg.mask_token_id, np.int64)
        ids, _ = self.prompting((list(prompts), mask_img, max_text_len), "t2i_gen")
        uncond_ids, _ = self.prompting(([""] * len(prompts), mask_img, max_text_len),
                                       "t2i_gen")
        codes = _generate_codes(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(uncond_ids), key,
            pad_id=self.prompting.pad_id, soi_id=sp["<|soi|>"], eoi_id=sp["<|eoi|>"],
            guidance_scale=guidance_scale, timesteps=timesteps,
            temperature=temperature, mask_schedule=mask_schedule, mode=mode)
        if return_codes:
            return codes
        return self.decode_codes(codes)

    def decode_codes(self, codes: Array) -> Array:
        """Codebook ids -> pixels in [-1, 1] (reference clamps before decoding,
        inference_geneval.py:266)."""
        return _decode_codes(self.vq_params, self.cfg, self.vq_cfg, codes)

    def encode_pixels(self, pixels: Array) -> Array:
        return _encode_pixels(self.vq_params, self.vq_cfg, pixels)

    # ------------------------------------------------------------------ mmu --

    def understand_discrete(
        self,
        pixels: Array,
        questions: Sequence[str],
        key: Array,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
    ) -> Array:
        """VQA over discrete VQ tokens (reference 'mmu' task path, train.py:681-700).

        Returns [B, max_new_tokens] generated token ids.
        """
        codes = np.asarray(self.encode_pixels(pixels)) + self.cfg.text_vocab_len
        ids, att, _ = self.prompting((codes, list(questions)), "mmu")
        prompt_len = att.sum(axis=1)
        return _mmu_decode(self.params, self.cfg, jnp.asarray(ids),
                           jnp.asarray(prompt_len), key,
                           eoi_id=self.prompting.sptids_dict["<|eoi|>"],
                           eos_id=self.prompting.eos_token_id,
                           max_new_tokens=max_new_tokens, temperature=temperature,
                           top_k=top_k, quantized_cache=self.quantized_cache)

    def _vqa_question_ids(self, question: str) -> np.ndarray:
        """Tokenized full chat template for one VQA question. mmu_conv consumes
        the leading <|im_start|> via input_ids[:, 1:] (the reference feeds
        conv.get_prompt() the same way, lmms unigen.py:340) — so the template
        MUST carry the '<|im_start|>user\\n' prefix or the first question
        token is silently dropped (regression: tests/test_pipeline.py)."""
        return np.asarray(self.prompting._tokenize(
            f"<|im_start|>user\n{question}<|im_end|>\n<|im_start|>assistant\n")[0],
            np.int64)

    def _image_embeds(self, pixels: Array) -> Array:
        """Vision tower + MM projector (SigLIP fixed-res or SigLIP2-NaFlex)."""
        assert self.vision_params is not None, "pipeline built without a vision tower"
        from .models import siglip2
        if isinstance(self.vision_cfg, siglip2.Siglip2Config):
            # NaFlex path: patchify each image at its native aspect, pad to the
            # batch max (reference lmms adapter NaFlex branch, :406-409)
            patches, shapes = [], []
            for img in np.asarray(pixels):
                pt, hw = siglip2.patchify(img, self.vision_cfg.patch_size)
                patches.append(pt)
                shapes.append(hw)
            maxn = max(p.shape[0] for p in patches)
            pix = np.zeros((len(patches), maxn, patches[0].shape[-1]), np.float32)
            att = np.zeros((len(patches), maxn), np.int32)
            for i, pt in enumerate(patches):
                pix[i, :pt.shape[0]] = pt
                att[i, :pt.shape[0]] = 1
            feats = siglip2.forward(self.vision_params, self.vision_cfg,
                                    jnp.asarray(pix), jnp.asarray(att),
                                    np.asarray(shapes))
        else:
            feats = _vision_forward(self.vision_params, self.vision_cfg, pixels)
        return _mm_project(self.params, feats)

    def score_continuations(
        self,
        pixels: Array,
        questions: Sequence[str],
        continuations: Sequence[np.ndarray],
        *,
        system_prompt_ids: Optional[np.ndarray] = None,
        length_bucket: int = 64,
    ) -> List[tuple]:
        """Batched ``score_continuation``: B (image, question, continuation)
        triples in ONE scored forward. Question+continuation tails are
        right-padded to the batch max then bucketed, so mixed lengths share a
        compiled program; pad slots are excluded from attention and the sum
        (same guarantees as the single-request path, which this reproduces
        request-for-request — tested)."""
        img_embeds = self._image_embeds(pixels)
        b, p, _ = img_embeds.shape
        q_ids = [self._vqa_question_ids(q) for q in questions]
        maxq = max(len(q) for q in q_ids)
        q_arr = np.full((b, maxq), self.prompting.pad_id, np.int64)
        for i, q in enumerate(q_ids):
            q_arr[i, :len(q)] = q
        part1, part2, _, _ = self.prompting((np.zeros((b, p, 1)), q_arr, None,
                                             system_prompt_ids), "mmu_conv")
        # per-row real part2 length: 1 (eoi) + question tokens minus the
        # consumed leading im_start (mmu_conv uses input_ids[:, 1:])
        l2_real_q = np.asarray([len(q) for q in q_ids])
        conts = [np.asarray(c, np.int64).reshape(-1) for c in continuations]
        l2_real = l2_real_q + np.asarray([len(c) for c in conts])
        l2 = -(-int(l2_real.max()) // length_bucket) * length_bucket
        part2c = np.full((b, l2), self.prompting.pad_id, np.int64)
        cont_mask = np.zeros((b, l2), bool)
        for i in range(b):
            part2c[i, :l2_real_q[i]] = part2[i, :l2_real_q[i]]
            part2c[i, l2_real_q[i]:l2_real[i]] = conts[i]
            cont_mask[i, l2_real_q[i]:l2_real[i]] = True
        lp, greedy = _mmu_vit_score(
            self.params, self.cfg, jnp.asarray(part1), jnp.asarray(part2c),
            img_embeds, jnp.asarray(cont_mask),
            jnp.asarray(l2_real, jnp.int32),
            sys_len=0 if system_prompt_ids is None else system_prompt_ids.shape[1])
        return [(float(lp[i]), bool(greedy[i])) for i in range(b)]

    def score_continuation(
        self,
        pixels: Array,
        question: str,
        continuation_ids: np.ndarray,
        *,
        system_prompt_ids: Optional[np.ndarray] = None,
        length_bucket: int = 64,
    ) -> tuple:
        """Sum log-likelihood (and greedy-match flag) of a tokenized
        continuation after the VQA prompt — the lmms-eval ``loglikelihood``
        contract (one request; the adapter loops). One scored forward, no
        sampling. The question+continuation tail is right-padded to a multiple
        of ``length_bucket`` so a varied-length task compiles one program per
        bucket instead of one per (question-length, continuation-length) pair;
        pad slots are masked out of attention and the scored sum.
        """
        img_embeds = self._image_embeds(pixels)
        b, p, _ = img_embeds.shape
        q_arr = self._vqa_question_ids(question)[None]
        part1, part2, _, _ = self.prompting((np.zeros((b, p, 1)), q_arr, None,
                                             system_prompt_ids), "mmu_conv")
        cont = np.asarray(continuation_ids, np.int64).reshape(-1)
        l2_real = part2.shape[1] + cont.shape[0]
        l2 = -(-l2_real // length_bucket) * length_bucket
        part2c = np.full((b, l2), self.prompting.pad_id, np.int64)
        cont_mask = np.zeros((b, l2), bool)
        part2c[:, :part2.shape[1]] = part2
        part2c[:, part2.shape[1]:l2_real] = cont
        cont_mask[:, part2.shape[1]:l2_real] = True
        lp, greedy = _mmu_vit_score(
            self.params, self.cfg, jnp.asarray(part1), jnp.asarray(part2c),
            img_embeds, jnp.asarray(cont_mask),
            jnp.full((b,), l2_real, jnp.int32),
            sys_len=0 if system_prompt_ids is None else system_prompt_ids.shape[1])
        return float(lp[0]), bool(greedy[0])

    def vqa_serving_inputs(
        self,
        pixels: Array,
        questions: Sequence[str],
        *,
        system_prompt_ids: Optional[np.ndarray] = None,
        l2_bucket: int = 64,
    ) -> List[tuple]:
        """Per-request (embeds, attn_mask, prompt_len, lookup_ids) tuples for
        the continuous-batching engine — ``ServingEngine.submit_embeds``
        consumes the first three directly; ``lookup_ids`` carries the known
        text token ids at their splice positions (zeros over the image span)
        to seed speculative drafting. Same splice/mask construction as
        ``understand`` (the lmms generate_until protocol); the question tail
        is right-padded to a multiple of ``l2_bucket`` so the engine compiles
        one admit program per bucketed splice length instead of one per
        question length."""
        img_embeds = self._image_embeds(pixels)
        _, p, _ = img_embeds.shape
        sys_len = 0 if system_prompt_ids is None else system_prompt_ids.shape[1]
        out = []
        for i, q in enumerate(questions):
            q_arr = self._vqa_question_ids(q)[None]
            part1, part2, _, _ = self.prompting((np.zeros((1, p, 1)), q_arr, None,
                                                 system_prompt_ids), "mmu_conv")
            l2 = part2.shape[1]
            l2b = -(-l2 // l2_bucket) * l2_bucket
            part2p = np.full((1, l2b), self.prompting.pad_id, np.int64)
            part2p[0, :l2] = part2[0]
            plen = part1.shape[1] + p + l2
            embeds, attn = _mmu_vit_inputs(
                self.params, jnp.asarray(part1), jnp.asarray(part2p),
                img_embeds[i:i + 1], jnp.asarray([plen], jnp.int32),
                sys_len=sys_len)
            lookup = np.concatenate(
                [part1[0], np.zeros((p,), np.int64), part2[0]]).astype(np.int32)
            # embeds/attn stay DEVICE-resident: np.asarray here would block the
            # submitter on the tower forward and round-trip [1, L, D] through
            # host memory per request, serializing vision prefill against the
            # engine's decode chunks. Returning the jax.Arrays lets async
            # dispatch pipeline tower forwards of waiting requests behind
            # in-flight decode (ServingEngine.submit_embeds admits them
            # without a host sync).
            out.append((embeds, attn, plen, lookup))
        return out

    def understand(
        self,
        pixels: Array,
        questions: Sequence[str],
        key: Array,
        *,
        system_prompt_ids: Optional[np.ndarray] = None,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
    ) -> Array:
        """VQA through the continuous SigLIP path (reference: lmms adapter
        generate_until, third_party/lmms/models/unigen.py:259-430).

        ``pixels``: [B, 384, 384, 3] normalized with mean=std=0.5.
        """
        img_embeds = self._image_embeds(pixels)
        b, p, _ = img_embeds.shape

        q_ids = [self._vqa_question_ids(q) for q in questions]
        maxq = max(len(q) for q in q_ids)
        q_arr = np.full((b, maxq), self.prompting.pad_id, np.int64)
        for i, q in enumerate(q_ids):
            q_arr[i, :len(q)] = q
        part1, part2, _, _ = self.prompting((np.zeros((b, p, 1)), q_arr, None,
                                             system_prompt_ids), "mmu_conv")
        q_lens = np.asarray([len(q) for q in q_ids])
        prompt_len = part1.shape[1] + p + 1 + (q_lens - 1)  # part1 + img + eoi + text
        return _mmu_vit_decode(
            self.params, self.cfg, jnp.asarray(part1), jnp.asarray(part2), img_embeds,
            jnp.asarray(prompt_len), key,
            sys_len=0 if system_prompt_ids is None else system_prompt_ids.shape[1],
            eos_id=self.prompting.eos_token_id, max_new_tokens=max_new_tokens,
            temperature=temperature, top_k=top_k,
            quantized_cache=self.quantized_cache)

    # ------------------------------------------------------------- text-only --

    def generate_text(
        self,
        prompts: Sequence[str],
        key: Array,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
    ) -> List[str]:
        """Plain text-only generation with the unified backbone (BASELINE.md
        config #2; the reference's HF generate passthrough, unigen.py:583-588)."""
        from .generation import generate_text as _gen
        tok_ids = [self.prompting._tokenize(
            f"<|im_start|>user\n{p}<|im_end|>\n<|im_start|>assistant\n")[0]
            for p in prompts]
        maxlen = max(len(t) for t in tok_ids)
        ids = np.full((len(prompts), maxlen), self.prompting.pad_id, np.int64)
        for i, t in enumerate(tok_ids):
            ids[i, :len(t)] = t
        out = _gen(self.params, self.cfg, key, jnp.asarray(ids),
                   prompt_len=jnp.asarray([len(t) for t in tok_ids]),
                   max_new_tokens=max_new_tokens, temperature=temperature,
                   top_k=top_k, eot_token=self.prompting.eos_token_id)
        return self.decode_text(out)

    # ------------------------------------------------------------- decoding --

    def decode_text(self, token_ids: Array) -> List[str]:
        """Token ids -> strings, trimmed at eos."""
        out = []
        ids = np.asarray(token_ids)
        for row in ids:
            stop = np.flatnonzero(row == self.prompting.eos_token_id)
            row = row[: stop[0]] if len(stop) else row
            out.append(self.prompting.text_tokenizer.decode(list(row)))
        return out


def pixels_to_uint8(pixels: Array) -> np.ndarray:
    """[-1,1] floats -> uint8 HWC images (reference save path,
    inference_geneval.py:268-276). uint8 input passes through unchanged."""
    arr = np.asarray(pixels)
    if arr.dtype == np.uint8:
        return arr
    x = np.clip((arr.astype(np.float32) + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255.0).round().astype(np.uint8)
