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
        return siglip_preprocess(images, vcfg.image_size)

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
        """
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
                texts = self.pipeline.decode_text(toks)[:len(chunk)]
                for i, text in zip(chunk, texts):
                    for stop in requests[i][1].get("until", []) or []:
                        if stop and stop in text:
                            text = text.split(stop)[0]
                    out[i] = text
        return out

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """[(context, continuation, images)] -> [(sum logprob, is_greedy)].

        Not exercised by the reference's task suite (generate_until-only
        benchmarks, reference :209-214) but part of the lmms-eval model
        protocol: each request runs one scored forward through the mmu_vit
        splice (pipeline.score_continuation)."""
        out: List[Tuple[float, bool]] = []
        sys_ids = None
        if self.use_system_prompt:
            sys_ids = np.asarray(
                [self.pipeline.prompting._tokenize(QWEN_SYSTEM_PROMPT)[0]])
        for context, continuation, images in requests:
            pixels = self._prepare_image(images)[None]
            cont_ids = np.asarray(
                self.pipeline.prompting._tokenize(continuation)[0], np.int64)
            out.append(self.pipeline.score_continuation(
                pixels, context, cont_ids, system_prompt_ids=sys_ids))
        return out


def register(name: str = "unigen_tpu"):
    """Register with lmms-eval when available (reference @register_model, :44)."""
    try:
        from lmms_eval.api.registry import register_model
    except ImportError:
        return None
    return register_model(name)(UniGenLmmsAdapter)
