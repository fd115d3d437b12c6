"""Understanding-benchmark adapter (lmms-eval style).

Counterpart of the reference's lmms-eval model plugin
(reference: third_party/lmms/models/unigen.py:44-444): implements the
``generate_until`` protocol used by MMMU/GQA/POPE/AI2D/etc. — build the
mmu_conv embedding splice with an optional system prompt, run the prefix-LM
cached decode, trim at stop sequences. Multi-image requests follow the
reference's 'concat' (horizontal paste) or 'first' modes (:292-324), and n_grid
tiling is available through the SFT tiling helper.

When the lmms-eval package is installed, ``register()`` exposes this class under
the model name "unigen_tpu"; without it the adapter is driven directly:

    adapter = UniGenLmmsAdapter(pipeline)
    answers = adapter.generate_until(requests)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..data.transform import siglip_preprocess
from ..pipeline import UniGenPipeline

QWEN_SYSTEM_PROMPT = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"


def concat_images_horizontal(images: Sequence) -> Any:
    """Paste images side by side (reference multi-image 'concat' mode, :292-316)."""
    from PIL import Image
    ims = [im if isinstance(im, Image.Image) else Image.fromarray(np.asarray(im))
           for im in images]
    h = max(im.height for im in ims)
    w = sum(im.width for im in ims)
    canvas = Image.new("RGB", (w, h))
    x = 0
    for im in ims:
        canvas.paste(im, (x, 0))
        x += im.width
    return canvas


@dataclasses.dataclass
class UniGenLmmsAdapter:
    pipeline: UniGenPipeline
    multi_image_mode: str = "concat"       # 'concat' | 'first'
    max_new_tokens: int = 512
    use_system_prompt: bool = True
    seed: int = 0
    batch_size: int = 8                    # device batch for generate_until
    serving: bool = False                  # continuous batching via ServingEngine
    serving_slots: int = 16
    # int pins every decode chunk; a sequence enables the engine's ADAPTIVE
    # schedule (device-side per-row stop makes long chunks safe — engine.py)
    serving_chunk: Any = 8
    serving_quantized_cache: bool = False
    serving_speculate_k: int = 0           # prompt-lookup speculative decode
    request_timeout: float = 3600.0
    last_stats: Optional[List[Any]] = None  # EngineStats per serving engine run
    last_latency: Optional[Dict[str, float]] = None  # ttft/itl percentiles (s)

    def _prepare_image(self, images) -> np.ndarray:
        if isinstance(images, (list, tuple)):
            if len(images) == 0:
                raise ValueError("request without images")
            if len(images) > 1 and self.multi_image_mode == "concat":
                images = concat_images_horizontal(images)
            else:
                images = images[0]
        from ..models import siglip2
        vcfg = self.pipeline.vision_cfg
        if isinstance(vcfg, siglip2.Siglip2Config):
            # NaFlex tower: aspect-preserving resize within the patch budget;
            # the pipeline patchifies per request (no fixed image_size exists)
            from ..data.transform import naflex_resize
            return naflex_resize(images, vcfg.patch_size, vcfg.num_patches)
        # uint8: the pipeline normalizes integer pixels on device with the
        # same fp32 ops (bit-equal), and the batch transfer is 4x smaller —
        # the host->device link is the measured bottleneck of generate_until
        return siglip_preprocess(images, vcfg.image_size, as_uint8=True)

    def _raw_dims(self, images) -> Tuple[int, int]:
        """(width, height) the request presents to the preprocessor — from PIL
        headers / array shapes only, no pixel decode or resize."""
        from PIL import Image
        if isinstance(images, (list, tuple)):
            if len(images) == 0:
                raise ValueError("request without images")
            if len(images) > 1 and self.multi_image_mode == "concat":
                dims = [self._raw_dims(im) for im in images]
                return sum(w for w, _ in dims), max(h for _, h in dims)
            images = images[0]
        if isinstance(images, Image.Image):
            return images.size
        arr = np.asarray(images)
        return arr.shape[1], arr.shape[0]

    def _prepared_shape(self, images) -> tuple:
        """Predicted self._prepare_image(images).shape, computed without
        materializing the float32 pixels (keeps generate_until's grouping pass
        O(#requests) in header reads, not O(#requests) in full-size tensors)."""
        from ..models import siglip2
        vcfg = self.pipeline.vision_cfg
        if isinstance(vcfg, siglip2.Siglip2Config):
            from ..data.transform import naflex_target_dims
            w, h = self._raw_dims(images)
            th, tw = naflex_target_dims(w, h, vcfg.patch_size, vcfg.num_patches)
            return (th, tw, 3)
        return (vcfg.image_size, vcfg.image_size, 3)

    def _num_patches(self, images) -> int:
        """Vision-token count the splice will contain, from image headers only
        (drives the serving path's bucket precompute — no pixel decode)."""
        from ..models import siglip2
        vcfg = self.pipeline.vision_cfg
        if isinstance(vcfg, siglip2.Siglip2Config):
            th, tw, _ = self._prepared_shape(images)
            return (th // vcfg.patch_size) * (tw // vcfg.patch_size)
        return (vcfg.image_size // vcfg.patch_size) ** 2

    def _gen_key(self, gen_kwargs: Dict) -> tuple:
        """Device-program bucket for one request: everything that forces a
        distinct compiled decode (stop strings are host-side and excluded)."""
        return (int(gen_kwargs.get("max_new_tokens", self.max_new_tokens)),
                float(gen_kwargs.get("temperature", 0.0) or 0.0),
                gen_kwargs.get("top_k"))

    def generate_until(self, requests: List[Tuple[str, Dict, Any]]) -> List[str]:
        """requests: [(context, gen_kwargs, images)] -> generated strings.

        gen_kwargs honors 'max_new_tokens', 'temperature', 'top_k' and 'until'
        stop strings (reference generate_until kwargs handling, :330-430).

        Requests are grouped by their decode parameters and run in device
        batches of ``batch_size`` through the batched prefix-LM decode —
        the reference adapter loops at batch 1 (:259-430), which strands most
        of the chip; batching recovers the serving-table throughput
        (BENCH.md VQA decode section) with unchanged per-request outputs.
        Output order always matches request order.

        With ``serving=True`` the requests run through the continuous-batching
        ``ServingEngine`` instead: a freed slot is refilled immediately, so a
        mixed-budget task never waits on its slowest wave (the static path runs
        every batch at its longest request).
        """
        if self.serving:
            return self._generate_until_serving(requests)
        out: List[Optional[str]] = [None] * len(requests)
        key = jax.random.key(self.seed)
        sys_ids = None
        if self.use_system_prompt:
            sys_ids = np.asarray(
                [self.pipeline.prompting._tokenize(QWEN_SYSTEM_PROMPT)[0]])

        # group by decode params AND predicted pixel shape (NaFlex resize is
        # aspect-dependent, so mixed aspects land in separate sub-batches);
        # the shape is derived from image headers so the grouping pass never
        # holds more than one chunk of float32 pixels in host memory
        groups: Dict[tuple, List[int]] = {}
        for i, (_, gen_kwargs, images) in enumerate(requests):
            groups.setdefault(self._gen_key(gen_kwargs)
                              + (self._prepared_shape(images),), []).append(i)

        def flush(pending):
            chunk, toks = pending
            texts = self.pipeline.decode_text(toks)[:len(chunk)]
            for i, text in zip(chunk, texts):
                for stop in requests[i][1].get("until", []) or []:
                    if stop and stop in text:
                        text = text.split(stop)[0]
                out[i] = text

        # one-deep pipeline: chunk i+1's host work (image resize, tokenize) and
        # its pixel transfer + dispatch happen BEFORE chunk i's tokens are
        # fetched, so they overlap chunk i's device decode — decode_text's
        # np.asarray is the only sync point. Outputs unchanged (pure
        # reordering; the per-chunk RNG split order is preserved).
        pending = None
        for (max_new, temperature, top_k, _shape), idxs in groups.items():
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                key, sub = jax.random.split(key)
                pixels = np.stack([self._prepare_image(requests[i][2])
                                   for i in chunk])
                contexts = [requests[i][0] for i in chunk]
                # pad the final partial chunk up to batch_size by repeating the
                # last request: every chunk reuses the one compiled batch shape
                # instead of paying a fresh multi-minute decode compile per
                # distinct remainder size (padded outputs are discarded)
                if len(chunk) < self.batch_size:
                    n_pad = self.batch_size - len(chunk)
                    pixels = np.concatenate(
                        [pixels, np.repeat(pixels[-1:], n_pad, axis=0)])
                    contexts = contexts + [contexts[-1]] * n_pad
                toks = self.pipeline.understand(
                    pixels, contexts, sub,
                    system_prompt_ids=sys_ids,
                    max_new_tokens=max_new,
                    temperature=temperature,
                    top_k=top_k)
                if pending is not None:
                    flush(pending)
                pending = (chunk, toks)
        if pending is not None:
            flush(pending)
        return out

    def _generate_until_serving(self, requests) -> List[str]:
        """generate_until over the continuous-batching engine.

        Vision prefill stays in device chunks of ``batch_size`` (host memory
        O(chunk), as the static path), but every request then enters one
        shared-slot decode: per-request max_new_tokens/temperature ride the
        engine's per-row parameters, so short answers free their slot for the
        next request instead of idling until the wave's longest budget drains.
        Bucket precompute is header-reads only — splice length = system + 3
        head tokens + vision patches + bucketed question tail (pipeline
        ``vqa_serving_inputs`` builds the actual inputs per chunk).
        """
        from ..serving import ServingEngine

        if not requests:
            return []
        pipe = self.pipeline
        eos = pipe.prompting.eos_token_id
        sys_ids = None
        if self.use_system_prompt:
            sys_ids = np.asarray(
                [pipe.prompting._tokenize(QWEN_SYSTEM_PROMPT)[0]])
        sys_len = 0 if sys_ids is None else sys_ids.shape[1]
        l2_bucket = 64

        metas = []  # (splice_len, max_new, temperature, top_k) per request
        for context, gen_kwargs, images in requests:
            q_len = len(pipe._vqa_question_ids(context))
            l2b = -(-q_len // l2_bucket) * l2_bucket
            splice = sys_len + 3 + self._num_patches(images) + l2b
            metas.append((splice,
                          int(gen_kwargs.get("max_new_tokens",
                                             self.max_new_tokens)),
                          float(gen_kwargs.get("temperature", 0.0) or 0.0),
                          gen_kwargs.get("top_k")))
        buckets = sorted({m[0] for m in metas})
        max_len = max(m[0] + m[1] for m in metas) + self.serving_speculate_k

        out: List[Optional[str]] = [None] * len(requests)
        by_topk: Dict[Any, List[int]] = {}  # top_k is engine-static
        for i, m in enumerate(metas):
            by_topk.setdefault(m[3], []).append(i)
        self.last_stats = []
        for top_k, idxs in by_topk.items():
            results: Dict[int, List[int]] = {}
            with ServingEngine(pipe.params, pipe.cfg, slots=self.serving_slots,
                               max_len=max_len, buckets=buckets,
                               chunk=self.serving_chunk, top_k=top_k,
                               quantized_cache=self.serving_quantized_cache,
                               speculate_k=self.serving_speculate_k,
                               seed=self.seed,
                               # every admission-group size compiles up front:
                               # a mid-run variant compile stalls the whole
                               # scheduler (engine._precompile)
                               precompile=[("emb", b, pipe.cfg.llm.hidden_size)
                                           for b in buckets]) as eng:
                futs: Dict[int, Any] = {}
                shape_groups: Dict[tuple, List[int]] = {}
                for i in idxs:
                    shape_groups.setdefault(
                        self._prepared_shape(requests[i][2]), []).append(i)
                for sidx in shape_groups.values():
                    for start in range(0, len(sidx), self.batch_size):
                        chunk = sidx[start:start + self.batch_size]
                        pixels = np.stack([self._prepare_image(requests[i][2])
                                           for i in chunk])
                        trips = pipe.vqa_serving_inputs(
                            pixels, [requests[i][0] for i in chunk],
                            system_prompt_ids=sys_ids, l2_bucket=l2_bucket)
                        for i, (emb, attn, plen, lookup) in zip(chunk, trips):
                            futs[i] = eng.submit_embeds(
                                emb, attn, plen, max_new_tokens=metas[i][1],
                                temperature=metas[i][2], eot_token=eos,
                                lookup_ids=lookup)
                results = {i: f.result(timeout=self.request_timeout)
                           for i, f in futs.items()}
                self.last_stats.append(eng.stats)
                self._record_latency(futs.values())
            for i, toks in results.items():
                text = pipe.decode_text(np.asarray([toks], np.int64))[0]
                for stop in requests[i][1].get("until", []) or []:
                    if stop and stop in text:
                        text = text.split(stop)[0]
                out[i] = text
        return out

    def _record_latency(self, futures) -> None:
        """Aggregate client-observed TTFT / inter-token-latency percentiles
        over one engine run (the BENCH.md serving latency table's source)."""
        ttft = sorted(f.ttft for f in futures if f.ttft is not None)
        itl = sorted(f.itl for f in futures if f.itl is not None)
        pct = lambda xs, q: xs[min(len(xs) - 1, int(q * (len(xs) - 1)))] if xs else float("nan")
        self.last_latency = {
            "ttft_p50_s": pct(ttft, 0.50), "ttft_p99_s": pct(ttft, 0.99),
            "itl_p50_s": pct(itl, 0.50), "itl_p99_s": pct(itl, 0.99),
            "n": len(ttft)}

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """[(context, continuation, images)] -> [(sum logprob, is_greedy)].

        Not exercised by the reference's task suite (generate_until-only
        benchmarks, reference :209-214) but part of the lmms-eval model
        protocol. Requests are grouped by predicted pixel shape and scored in
        device batches of ``batch_size`` (one forward per batch,
        pipeline.score_continuations); the final partial chunk pads by
        repeating the last request so every chunk reuses one compiled shape.
        Results equal the request-at-a-time path (tested); order preserved."""
        out: List[Optional[Tuple[float, bool]]] = [None] * len(requests)
        sys_ids = None
        if self.use_system_prompt:
            sys_ids = np.asarray(
                [self.pipeline.prompting._tokenize(QWEN_SYSTEM_PROMPT)[0]])
        shape_groups: Dict[tuple, List[int]] = {}
        for i, (_, _, images) in enumerate(requests):
            shape_groups.setdefault(self._prepared_shape(images), []).append(i)
        for sidx in shape_groups.values():
            for start in range(0, len(sidx), self.batch_size):
                chunk = sidx[start:start + self.batch_size]
                full = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
                pixels = np.stack([self._prepare_image(requests[i][2])
                                   for i in full])
                conts = [np.asarray(
                    self.pipeline.prompting._tokenize(requests[i][1])[0],
                    np.int64) for i in full]
                scored = self.pipeline.score_continuations(
                    pixels, [requests[i][0] for i in full], conts,
                    system_prompt_ids=sys_ids)
                for i, s in zip(chunk, scored[:len(chunk)]):
                    out[i] = s
        return out


def register(name: str = "unigen_tpu"):
    """Register with lmms-eval when available (reference @register_model, :44)."""
    try:
        from lmms_eval.api.registry import register_model
    except ImportError:
        return None
    return register_model(name)(UniGenLmmsAdapter)
