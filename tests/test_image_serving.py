"""Microbatching image-serving tests.

The image engine must reproduce ``pipeline.generate_images`` outputs
request-for-request: a full microbatch equals the direct batch call, and a
partial batch's real rows are unchanged by the empty-prompt padding (row
independence of the sampler's elementwise noise). The reference has no image
serving at all (its sampler runs only inside inference_geneval.py)."""
import base64
import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from unigen_tpu.models import magvit as MV
from unigen_tpu.models import unigen as U
from unigen_tpu.pipeline import UniGenPipeline
from unigen_tpu.prompting import UniPrompting
from unigen_tpu.serving import ImageServingEngine, ServingEngine
from unigen_tpu.serving.server import ServingHTTPServer

from test_prompting import MockTokenizer, SPECIALS

PROTOCOL = dict(guidance_scale=2.0, timesteps=3, temperature=1.0,
                max_text_len=8)


@pytest.fixture(scope="module")
def pipe():
    tok = MockTokenizer()
    prompting = UniPrompting(tok, special_tokens=SPECIALS, max_seq_len=64,
                             cond_dropout_prob=0.0)
    cfg = U.UniGenConfig.tiny(text_vocab_len=len(tok))
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    return UniGenPipeline(U.init(jax.random.key(0), cfg), cfg,
                          MV.init(jax.random.key(1), vq_cfg), vq_cfg, prompting)


def _direct(pipe, prompts, batch_index=0, seed=0):
    from unigen_tpu.pipeline import pixels_to_uint8
    key = jax.random.fold_in(jax.random.key(seed), batch_index)
    return pixels_to_uint8(pipe.generate_images(list(prompts), key, **PROTOCOL))


def test_full_batch_matches_direct_call(pipe):
    prompts = ["a red cat", "a dog", "blue sky"]
    with ImageServingEngine(pipe, batch=3, max_wait_s=5.0, **PROTOCOL) as eng:
        futs = [eng.submit(p) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
    want = _direct(pipe, prompts)
    for g, w in zip(got, want):
        assert g.dtype == np.uint8 and np.array_equal(g, w)


def test_partial_batch_pads_without_changing_rows(pipe):
    """2 requests into a batch-4 engine: real rows equal the direct padded
    call's rows — the pad prompts never leak into real outputs."""
    prompts = ["a green cube", "the moon"]
    with ImageServingEngine(pipe, batch=4, max_wait_s=2.0, **PROTOCOL) as eng:
        futs = [eng.submit(p) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
    want = _direct(pipe, prompts + ["", ""])
    for g, w in zip(got, want[:2]):
        assert np.array_equal(g, w)


def test_successive_batches_use_distinct_keys(pipe):
    """Same prompt in two microbatches -> different images (key folds the
    batch counter), and resubmitting from a fresh engine reproduces batch 0."""
    with ImageServingEngine(pipe, batch=1, max_wait_s=0.01, **PROTOCOL) as eng:
        a = eng.submit("a red cat").result(timeout=300)
        b = eng.submit("a red cat").result(timeout=300)
    assert not np.array_equal(a, b)
    with ImageServingEngine(pipe, batch=1, max_wait_s=0.01, **PROTOCOL) as eng:
        a2 = eng.submit("a red cat").result(timeout=300)
    assert np.array_equal(a, a2)


def test_failed_engine_rejects_submissions(pipe):
    """A batch exception fails the in-flight futures AND closes the engine —
    later submissions must raise immediately instead of returning futures no
    thread will ever resolve."""
    import dataclasses
    broken = dataclasses.replace(pipe)

    def boom(*a, **k):
        raise RuntimeError("synthetic sampler failure")

    broken.generate_images = boom
    eng = ImageServingEngine(broken, batch=2, max_wait_s=0.01, **PROTOCOL)
    fut = eng.submit("a red cat")
    with pytest.raises(RuntimeError, match="synthetic sampler failure"):
        fut.result(timeout=60)
    deadline = 60
    import time
    while not eng._closing and deadline > 0:   # scheduler sets it as it dies
        time.sleep(0.05)
        deadline -= 0.05
    with pytest.raises(RuntimeError):
        eng.submit("late")


def test_closed_engine_rejects_submissions(pipe):
    eng = ImageServingEngine(pipe, batch=2, max_wait_s=0.01, **PROTOCOL)
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit("late")


def test_http_images_endpoint(pipe):
    """POST /v1/images returns a base64 PNG that decodes to the direct call's
    pixels; /healthz still works; text engine absent routes still 404."""
    from PIL import Image
    cfg, params = pipe.cfg, pipe.params
    text_eng = ServingEngine(params, cfg, slots=2, max_len=32, buckets=(16,))
    with ImageServingEngine(pipe, batch=1, max_wait_s=0.01, **PROTOCOL) as ieng:
        with ServingHTTPServer(text_eng, image_engine=ieng) as srv:
            url = f"http://{srv.host}:{srv.port}"
            req = urllib.request.Request(
                url + "/v1/images",
                data=json.dumps({"prompt": "a red cat"}).encode(),
                headers={"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req, timeout=300).read())
            arr = np.asarray(Image.open(
                io.BytesIO(base64.b64decode(out["image_png"]))))
            assert arr.shape == (out["height"], out["width"], 3)
            assert np.array_equal(arr, _direct(pipe, ["a red cat"])[0])
            # missing prompt -> 400
            breq = urllib.request.Request(url + "/v1/images", data=b"{}",
                                          headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(breq, timeout=60)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    text_eng.close()


def test_images_route_without_engine_is_400(pipe):
    text_eng = ServingEngine(pipe.params, pipe.cfg, slots=2, max_len=32,
                             buckets=(16,))
    with ServingHTTPServer(text_eng) as srv:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/images",
            data=json.dumps({"prompt": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    text_eng.close()
