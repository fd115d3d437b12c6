"""End-to-end smokes of the training ENTRY POINTS as subprocesses.

The reference ships train/train_w_clip_vit/train_dpo as directly-launched
scripts (reference: training/*.py __main__); these tests run this repo's
counterparts the same way a user would — config YAML + dotted overrides,
synthetic data, random-init models at toy widths (configs/tiny/smoke_*.yaml)
— and assert the full wiring works: config parsing -> launch builders (with
the vq/vision-tower size overrides) -> prompting -> train loop -> metrics
JSONL -> checkpoint on disk.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_script(script, config, out_dir, extra=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script),
         f"config={config}", f"experiment.output_dir={out_dir}", *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    return r


def _assert_trained(out_dir, min_steps=2):
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path), os.listdir(out_dir)
    rows = [json.loads(l) for l in open(metrics_path)]
    assert len(rows) >= 1
    assert all("loss" in r for r in rows)
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint")]
    assert ckpts, os.listdir(out_dir)


@pytest.mark.slow
def test_train_entry_smoke(tmp_path):
    out = str(tmp_path / "pt2")
    _run_script("train.py", "configs/tiny/smoke_pt2.yaml", out)
    _assert_trained(out)


@pytest.mark.slow
def test_train_sft_entry_smoke(tmp_path):
    out = str(tmp_path / "sft")
    r = _run_script("train_sft.py", "configs/tiny/smoke_sft.yaml", out)
    # the script resolves the fused-vs-separate step mode from the first batch
    assert "common_length" in r.stderr + r.stdout
    _assert_trained(out)


@pytest.mark.slow
def test_train_sft_lora_entry_smoke(tmp_path):
    """LoRA SFT end-to-end (beyond-reference, training/lora.py): adapters on
    the backbone, adapter-only optimizer, merged-base export at the end."""
    out = str(tmp_path / "sft_lora")
    r = _run_script("train_sft.py", "configs/tiny/smoke_sft.yaml", out,
                    extra=("model.lora.rank=4", "model.lora.alpha=8",
                           "model.lora.merge_on_save=true"))
    log = r.stderr + r.stdout
    assert "LoRA rank 4" in log
    assert "merged LoRA adapters" in log
    _assert_trained(out)
    # the exported unwrapped weights are merged (no adapter leaves), while the
    # trainer state keeps them (resume continues adapter training) — list tree
    # paths via the public Orbax metadata API (not internal _METADATA files)
    import jax
    import orbax.checkpoint as ocp

    def _tree_paths(sub):
        ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
        with ocp.StandardCheckpointer() as ck:
            md = ck.metadata(os.path.abspath(os.path.join(out, ckpts[-1], sub)))
        leaves = jax.tree_util.tree_leaves_with_path(md.item_metadata)
        return ["/".join(str(getattr(p, "key", p)) for p in path)
                for path, _ in leaves]

    unwrapped_paths = _tree_paths("unwrapped_model")
    state_paths = _tree_paths("state")
    assert any("mlp" in p for p in unwrapped_paths)
    assert not any("lora_" in p for p in unwrapped_paths)
    assert any("lora_" in p for p in state_paths)


@pytest.mark.slow
def test_train_dpo_entry_smoke_and_resume(tmp_path):
    out = str(tmp_path / "dpo")
    _run_script("train_dpo.py", "configs/tiny/smoke_dpo.yaml", out)
    _assert_trained(out)
    # relaunch with a higher step budget: must resume from checkpoint-2 (the
    # reference scripts' resume-from-latest behavior, train_dpo.py:322+) and
    # end at checkpoint-4
    r = _run_script("train_dpo.py", "configs/tiny/smoke_dpo.yaml", out,
                    extra=("training.max_train_steps=4",
                           "experiment.resume_from_checkpoint=latest"))
    assert "resuming from checkpoint" in (r.stderr + r.stdout)
    assert os.path.isdir(os.path.join(out, "checkpoint-4")), os.listdir(out)


@pytest.mark.slow
def test_train_cotv_post_sft_entry_smoke(tmp_path):
    """The CoT-V post-SFT stage = the SFT entry with mmu-only batches
    (reference configs/unigen_1_5b/unigen_cotv_post_sft.yaml: batch 0 t2i +
    0 lm + 8 mmu); the fused common-length mode must stand down."""
    out = str(tmp_path / "cotv")
    r = _run_script("train_sft.py", "configs/tiny/smoke_sft.yaml", out,
                    extra=("training.batch_size_t2i=0",
                           "training.batch_size_lm=0"))
    assert "common_length=None" in (r.stderr + r.stdout)
    _assert_trained(out)


@pytest.mark.slow
def test_train_sft_entry_resume(tmp_path):
    out = str(tmp_path / "sft")
    _run_script("train_sft.py", "configs/tiny/smoke_sft.yaml", out)
    r = _run_script("train_sft.py", "configs/tiny/smoke_sft.yaml", out,
                    extra=("training.max_train_steps=4",
                           "experiment.resume_from_checkpoint=latest"))
    assert "resuming from checkpoint" in (r.stderr + r.stdout)
    assert os.path.isdir(os.path.join(out, "checkpoint-4")), os.listdir(out)


@pytest.mark.slow
def test_serve_entry_smoke(tmp_path):
    """scripts/serve.py as a subprocess: config -> pipeline -> engine ->
    HTTP. Drives /healthz, a templated /v1/generate (eot defaulting), and
    the OpenAI chat route with the byte-level fallback tokenizer."""
    import json as _json
    import random
    import time
    import urllib.request

    port = random.randint(20000, 40000)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "config=configs/tiny/smoke_pt2.yaml",
         f"experiment.output_dir={tmp_path}",
         "serving.host=127.0.0.1", f"serving.port={port}",
         "serving.slots=2", "serving.max_len=96",
         "serving.buckets=[64]", "serving.max_new_tokens=4"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    url = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 420
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                break
            try:
                with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
                    up = _json.loads(r.read())["status"] == "ok"
                    break
            except OSError:
                time.sleep(2)
        assert up and proc.poll() is None, (
            f"server never came up: {proc.poll()}\n"
            f"{proc.stderr.read()[-4000:] if proc.poll() is not None else ''}")

        req = urllib.request.Request(
            url + "/v1/generate",
            data=_json.dumps({"prompt": "hi", "max_new_tokens": 3}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=420).read())
        assert len(out["tokens"]) <= 3 and "text" in out

        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=_json.dumps({"messages": [{"role": "user", "content": "hi"}],
                              "max_tokens": 3}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=420).read())
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["role"] == "assistant"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
def test_bench_lmms_tiny_smoke():
    """`python bench.py lmms tiny` — the lmms end-to-end bench's control flow
    (PIL -> preprocess -> tower -> splice -> serving engine -> detokenize) on
    toy shapes, CPU-forced. Asserts the one-line JSON contract holds."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "lmms", "tiny"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"bench lmms tiny failed:\n{r.stderr[-4000:]}"
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["unit"] == "tokens/sec/chip" and row["value"] > 0
    assert row["sweep"] and row["config"]["quant"] == "int8"
