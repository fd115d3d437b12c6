"""Auxiliary subsystem tests: persistence, diagnostics, retry, EMA, DPO data,
dataflows, config system."""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.data import dataflows as DF
from unigen_tpu.data.dpo_data import DPODataset, apply_sampling
from unigen_tpu.training.diagnostics import masked_token_diagnostics
from unigen_tpu.training.ema import EMAConfig, ema_init, ema_update
from unigen_tpu.utils import persistence as P
from unigen_tpu.utils.configuration import flatten_config, initialize_config
from unigen_tpu.utils.retry import backoff_on


def test_persistence_roundtrip_sharded(tmp_path):
    from unigen_tpu.models import qwen2 as Q
    cfg = Q.Qwen2Config.tiny(vocab_size=128)
    params = Q.init(jax.random.key(0), cfg)
    out = str(tmp_path / "model")
    P.save_pretrained(params, out, config=cfg, max_shard_bytes=200_000)
    files = os.listdir(out)
    assert "config.json" in files
    assert any("of-" in f for f in files)  # sharded
    assert any(f.endswith("index.json") for f in files)
    loaded, cfg_json = P.from_pretrained(out, params)
    import chex
    chex.assert_trees_all_close(loaded, params)
    assert cfg_json["vocab_size"] == 128


def test_persistence_single_file(tmp_path):
    params = {"a": {"w": jnp.ones((4, 4))}, "b": [jnp.zeros((2,))]}
    out = str(tmp_path / "m")
    P.save_pretrained(params, out)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    loaded, _ = P.from_pretrained(out, params)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["w"]), np.ones((4, 4)))


def test_masked_token_diagnostics():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, size=(4, 8)))
    labels = labels.at[0, :4].set(-100)
    mask_prob = jnp.asarray([0.05, 0.55, 0.55, 0.95])
    d = masked_token_diagnostics(logits, labels, mask_prob, num_buckets=10)
    assert d["bucket_tokens"].shape == (10,)
    assert float(d["bucket_tokens"][0]) == 4.0  # sample 0: 4 unmasked labels
    assert float(d["bucket_tokens"][5]) == 16.0
    assert np.isfinite(np.asarray(d["bucket_ce"])).all()


def test_ema_update_moves_toward_params():
    params = {"w": jnp.zeros((3,))}
    target = {"w": jnp.ones((3,))}
    cfg = EMAConfig(decay=0.9, use_ema_warmup=False)
    state = ema_init(params)
    for _ in range(20):
        state = ema_update(cfg, state, target)
    assert 0.5 < float(state.params["w"][0]) <= 1.0


def test_backoff_on_retries():
    calls = {"n": 0}

    @backoff_on((ValueError,), max_tries=3, base_delay=0.01)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("boom")
        return 42

    assert flaky() == 42
    assert calls["n"] == 3

    @backoff_on((ValueError,), max_tries=2, base_delay=0.01)
    def always_fails():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        always_fails()


def test_dpo_dataset(tmp_path):
    from PIL import Image
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    for name, color in [("c.png", (250, 0, 0)), ("r.png", (0, 250, 0))]:
        Image.new("RGB", (20, 20), color).save(tmp_path / "imgs" / name)
    data = [{"prompt": f"p{i}", "chosen": "c.png", "rejected": "r.png"}
            for i in range(6)]
    jp = str(tmp_path / "pairs.json")
    with open(jp, "w") as f:
        json.dump(data, f)
    ds = DPODataset([jp], str(tmp_path / "imgs"), per_device_batch_size=2,
                    resolution=16, sampling_strategy="first",
                    sampling_number=["50%"])
    assert len(ds) == 3
    batch = next(iter(ds))
    assert batch["batch_chosen_image"].shape == (2, 16, 16, 3)
    assert len(batch["batch_prompt_list"]) == 2
    # chosen is reddish, rejected greenish after ±1 normalize
    assert batch["batch_chosen_image"][0, 8, 8, 0] > 0.8
    assert batch["batch_rejected_image"][0, 8, 8, 1] > 0.8


def test_apply_sampling():
    import random
    items = [{"i": i} for i in range(10)]
    assert len(apply_sampling(items, "first", "30%", random.Random(0))) == 3
    assert apply_sampling(items, "end", "2", random.Random(0))[-1]["i"] == 9
    assert len(apply_sampling(items, "random", "4", random.Random(0))) == 4


def test_dataflow_question_synthesis():
    prompt = DF.question_prompt("The image shows a red cat on a mat")
    assert "red cat on a mat" in prompt
    assert "The image shows" not in prompt.split("description: ")[1].split(" into")[0]
    qs = DF.parse_questions("Is there a cat?; Is the cat red?; ; garbage")
    assert qs == ["Is there a cat?", "Is the cat red?", "garbage?"]
    table = DF.build_question_table(
        [{"id": "x", "prompt": "a red cat"}],
        generate=lambda p: "Is there a cat?; Is the cat red?")
    assert table[0]["questions"] == ["Is there a cat?", "Is the cat red?"]


def test_dataflow_pseudo_labels_and_pairs():
    rows = DF.pseudo_label_images(
        ["img1"], [["Is there a cat?", "Is it red?"]],
        answer=lambda img, q: "Yes" if "cat" in q else "no idea")
    assert rows[0][0]["answer"] == "yes" and rows[0][1]["answer"] == "no"
    pairs = DF.select_preference_pairs([
        {"image": "a.png", "score": 1.0}, {"image": "b.png", "score": 0.2}])
    assert pairs[0]["chosen"] == "a.png" and pairs[0]["rejected"] == "b.png"
    assert DF.select_preference_pairs([{"image": "a", "score": 0.5},
                                       {"image": "b", "score": 0.5}]) == []


def test_config_system(tmp_path):
    p = str(tmp_path / "c.yaml")
    with open(p, "w") as f:
        f.write("a:\n  b: 1\n  lr: 2.0e-4\nc: ${a.lr}\n")
    cfg = initialize_config(p, ["a.b=5", "d.e=hello", "config=ignored"])
    assert cfg.a.b == 5
    assert cfg.c == 2e-4  # interpolation
    assert cfg.d.e == "hello"
    flat = flatten_config(cfg)
    assert flat["a.b"] == 5 and flat["d.e"] == "hello"
    assert cfg.get("missing", 7) == 7


def test_visualize_predictions_and_grid(tmp_path):
    from unigen_tpu.models import magvit as MV
    from unigen_tpu.models import unigen as U
    from unigen_tpu.training.visualization import save_image_grid, visualize_predictions

    cfg = U.UniGenConfig.tiny()
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    rng = np.random.default_rng(0)
    b, n, L = 2, cfg.num_vq_tokens, 26
    px = jnp.asarray(rng.normal(size=(b, 8, 8, 3)), jnp.float32)
    ids = rng.integers(3, 100, size=(b, L))
    ids[:, -n - 2] = 1
    ids[:, -n - 1:-1] = cfg.mask_token_id
    ids[:, -1] = 2
    trip = visualize_predictions(params, cfg, vq_params, vq_cfg, px,
                                 jnp.asarray(ids), pad_id=0, soi_id=1, eoi_id=2)
    assert trip.shape == (b, 8, 24, 3) and trip.dtype == np.uint8
    out = str(tmp_path / "grid.png")
    save_image_grid(trip, out, cols=1)
    from PIL import Image
    assert Image.open(out).size == (24, 16)


def test_multihost_single_host_identity():
    from unigen_tpu.utils.multihost import broadcast_object, gather_objects, sync_hosts
    assert gather_objects({"a": 1}) == [{"a": 1}]
    assert broadcast_object([1, 2]) == [1, 2]
    sync_hosts()  # no-op single host


def test_profiling_trace_writes(tmp_path):
    from unigen_tpu.utils import profiling as PR
    d = str(tmp_path / "trace")
    with PR.trace(d):
        with PR.annotate("test-region"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"


def test_run_evaluation_cot_carveout_and_skips(tmp_path):
    """Scorer harness plumbing: the cot-gen suite builds the no-TTS baseline
    carve-out (first 4 candidates per instance, reference run_evaluation.sh:
    222-238) and degrades to visible SKIPs when judges are absent."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "evalout"
    all_dir = out / "t2i_samples_step50_scale6"
    sel_dir = out / "t2i_samples_step50_scale6_selected_prompt_rule"
    for inst in ("00000", "00001"):
        for base, n in ((all_dir, 6), (sel_dir, 4)):
            d = base / inst / "samples"
            d.mkdir(parents=True)
            (base / inst / "metadata.jsonl").write_text('{"prompt": "a cup"}')
            for i in range(n):
                (d / f"{i:05}.png").write_bytes(b"png")
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_evaluation.sh"),
         "cot-gen", "cfg.yaml", "meta.jsonl", str(out)],
        env=dict(os.environ, SKIP_GENERATION="1"),
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    # carve-out built: 4 of the 6 candidates per instance
    origin = out / "t2i_samples_step50_scale6_origin"
    for inst in ("00000", "00001"):
        files = sorted(os.listdir(origin / inst / "samples"))
        assert files == [f"{i:05}.png" for i in range(4)]
        assert (origin / inst / "metadata.jsonl").exists()
    # scorers degraded loudly, once per selected dir + once for the carve-out
    assert r.stderr.count("SKIP") >= 2


def test_run_evaluation_dpgbench_fake_judge(tmp_path):
    """Full generate→score→report control flow of the dpgbench suite with a
    fake mPLUG judge (VERDICT r2 item 7): a stand-in compute_dpg_bench.py
    receives the reference's exact scorer arguments (run_evaluation.sh:168-176
    analog: image root, csv, res path, resolution 256, pic-num 4, mplug) and
    its score file lands where the suite promises."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "evalout"
    (out / "dpg_bench_step50_scale6").mkdir(parents=True)
    dpg = tmp_path / "fake_dpg"
    dpg.mkdir()
    (dpg / "dpg_bench.csv").write_text("item_id,text\n0,a cup\n")
    (dpg / "compute_dpg_bench.py").write_text(
        "import argparse, json, sys\n"
        "p = argparse.ArgumentParser()\n"
        "for a in ('--image-root-path', '--csv', '--res-path', '--vqa-model'):\n"
        "    p.add_argument(a)\n"
        "p.add_argument('--resolution', type=int)\n"
        "p.add_argument('--pic-num', type=int)\n"
        "ns = p.parse_args()\n"
        "assert ns.resolution == 256 and ns.pic_num == 4 and ns.vqa_model == 'mplug'\n"
        "open(ns.res_path, 'w').write(json.dumps({'dpg_score': 0.83}))\n")
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_evaluation.sh"),
         "dpgbench", "cfg.yaml", "prompts.txt", str(out)],
        env=dict(os.environ, SKIP_GENERATION="1", DPG_ROOT=str(dpg)),
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    res = out / "dpg_bench_score.txt"
    assert res.exists() and "0.83" in res.read_text()
    assert "SKIP" not in r.stderr


def test_run_evaluation_geneval_fake_judge(tmp_path):
    """geneval suite with fake detector + summarizer: evaluate_images.py writes
    results.jsonl, summary_scores.py output is tee'd to the score log
    (reference run_evaluation.sh:136-142 flow, judged end-to-end)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "evalout"
    (out / "t2i_samples_step50_scale6").mkdir(parents=True)
    ge = tmp_path / "fake_geneval"
    (ge / "evaluation").mkdir(parents=True)
    (ge / "evaluation" / "evaluate_images.py").write_text(
        "import argparse, json\n"
        "p = argparse.ArgumentParser()\n"
        "p.add_argument('dir'); p.add_argument('--outfile'); p.add_argument('--model-path')\n"
        "ns = p.parse_args()\n"
        "open(ns.outfile, 'w').write(json.dumps({'correct': True}) + '\\n')\n")
    (ge / "evaluation" / "summary_scores.py").write_text(
        "import sys\nprint('Overall score: 0.71 from', sys.argv[1])\n")
    fake_mods = tmp_path / "fake_mods"
    (fake_mods / "mmdet").mkdir(parents=True)
    (fake_mods / "mmdet" / "__init__.py").write_text("")
    env = dict(os.environ, SKIP_GENERATION="1", GENEVAL_ROOT=str(ge),
               PYTHONPATH=str(fake_mods) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_evaluation.sh"),
         "geneval", "cfg.yaml", "meta.jsonl", str(out)],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert (out / "t2i_samples_step50_scale6" / "results.jsonl").exists()
    log = out / "geneval_score.log"
    assert log.exists() and "Overall score: 0.71" in log.read_text()
    assert "SKIP" not in r.stderr


def test_run_evaluation_lmms_fake_module(tmp_path):
    """lmms suite with a fake lmms_eval module on PYTHONPATH: the harness must
    invoke `python -m lmms_eval` with our registered model, the task list, and
    the comma-joined model_args, and the run's output must land under
    OUT/lmms_eval (reference run_evaluation.sh:95-109 flow)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "evalout"
    fake_mods = tmp_path / "fake_mods"
    pkg = fake_mods / "lmms_eval"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "__main__.py").write_text(
        "import argparse, json, os\n"
        "p = argparse.ArgumentParser()\n"
        "for a in ('--model', '--model_args', '--tasks', '--batch_size', '--output_path'):\n"
        "    p.add_argument(a)\n"
        "p.add_argument('--log_samples', action='store_true')\n"
        "ns = p.parse_args()\n"
        "assert ns.model == 'unigen_tpu' and ns.log_samples\n"
        "assert ns.model_args == 'config=cfg.yaml,ckpt=path'\n"
        "assert ns.tasks == 'pope,mme'\n"
        "os.makedirs(ns.output_path, exist_ok=True)\n"
        "open(os.path.join(ns.output_path, 'results.json'), 'w').write(\n"
        "    json.dumps({'results': {'pope': {'acc': 0.5}}}))\n")
    env = dict(os.environ,
               PYTHONPATH=str(fake_mods) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_evaluation.sh"),
         "lmms", "cfg.yaml", "pope,mme", str(out), "ckpt=path"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr + r.stdout
    res = out / "lmms_eval" / "results.json"
    assert res.exists() and "pope" in res.read_text()


def test_setup_eval_degrades_offline():
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["bash", os.path.join(repo, "scripts", "setup_eval.sh")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "done" in r.stdout
