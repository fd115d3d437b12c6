"""Checkpoint interop tests: sharded safetensors round trip, vocab resize, SFT step."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import qwen2 as Q
from unigen_tpu.models import siglip as SG
from unigen_tpu.models import unigen as U
from unigen_tpu.utils import hf_import as HI


def test_load_sharded_safetensors(tmp_path):
    from safetensors.numpy import save_file
    a = {"w1": np.ones((2, 2), np.float32)}
    b = {"w2": np.zeros((3,), np.float32)}
    save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))
    index = {"weight_map": {"w1": "model-00001-of-00002.safetensors",
                            "w2": "model-00002-of-00002.safetensors"}}
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump(index, f)
    sd = HI.load_state_dict(str(tmp_path))
    assert set(sd) == {"w1", "w2"}


def test_resize_embedding():
    w = np.arange(12, dtype=np.float32).reshape(4, 3)
    up = HI.resize_embedding(w, 6)
    assert up.shape == (6, 3)
    np.testing.assert_allclose(up[4], w.mean(0))
    np.testing.assert_array_equal(HI.resize_embedding(w, 2), w[:2])


def test_import_unigen_with_vocab_resize():
    """Torch UniGen-layout state dict (smaller vocab) -> our params, logits work."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    small_vocab = 480
    hf_cfg = HFConfig(vocab_size=small_vocab, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16, rope_theta=1e4,
                      tie_word_embeddings=True, attn_implementation="eager")
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg)
    sd = {f"llm.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}
    # add a 2-layer mm projector like the reference SFT checkpoints
    sd["mm_projector.0.weight"] = np.ones((64, 24), np.float32).T
    sd["mm_projector.0.bias"] = np.zeros((64,), np.float32)
    sd["mm_projector.2.weight"] = np.eye(64, dtype=np.float32)
    sd["mm_projector.2.bias"] = np.zeros((64,), np.float32)

    cfg = U.UniGenConfig.tiny(w_und_encoder=True, mm_input_dim=24,
                              text_vocab_len=small_vocab + 8, codebook_size=32)
    params = HI.import_unigen(sd, cfg)
    assert params["llm"]["embed"]["weight"].shape == (cfg.vocab_size, 64)
    assert len(params["mm_projector"]) == 2
    # resized rows are the mean of the original table
    orig = hf.state_dict()["model.embed_tokens.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["llm"]["embed"]["weight"][small_vocab]),
                               orig.mean(0), rtol=1e-3, atol=1e-5)
    # forward works with the imported params
    h, _ = Q.forward(params["llm"], cfg.llm, input_ids=jnp.asarray([[1, 2, 3]]))
    assert np.isfinite(np.asarray(h)).all()


def test_import_weights_runbook_dryrun(tmp_path):
    """Weights-arrival runbook end-to-end on a synthetic SHARDED reference
    checkpoint (docs/WEIGHTS.md; VERDICT r2 item 9): scripts/import_weights.py
    converts the torch layout to our portable format, and launch.build_unigen
    auto-detects + reloads the converted dir bit-identically to a direct
    import."""
    torch = pytest.importorskip("torch")
    import sys
    from safetensors.numpy import save_file
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    from unigen_tpu import launch
    from unigen_tpu.utils.configuration import Config

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import import_weights as IW

    hf_cfg = HFConfig(vocab_size=480, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16, rope_theta=1e4,
                      tie_word_embeddings=True, attn_implementation="eager")
    torch.manual_seed(0)
    sd = {f"llm.{k}": v.detach().numpy()
          for k, v in Qwen2ForCausalLM(hf_cfg).state_dict().items()}
    # shard into several files + index like a real multi-file checkpoint
    src = tmp_path / "ref_ckpt" / "unwrapped_model"
    src.mkdir(parents=True)
    keys = sorted(sd)
    nsh = 3
    weight_map = {}
    for i in range(nsh):
        name = f"model-{i + 1:05d}-of-{nsh:05d}.safetensors"
        shard = {k: sd[k] for k in keys[i::nsh]}
        save_file(shard, str(src / name))
        weight_map.update({k: name for k in shard})
    with open(src / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)

    config = Config.wrap({
        "model": {"max_len_mode": "text",
                  "unigen": {"llm_model_path": "does-not-exist",
                             "pretrained_model_path": "",
                             "codebook_size": 32, "num_vq_tokens": 16,
                             "hidden_size": 64, "intermediate_size": 128,
                             "num_hidden_layers": 2, "num_attention_heads": 4,
                             "num_key_value_heads": 2, "head_dim": 16,
                             "rope_theta": 1e4}},
        "dataset": {"preprocessing": {"max_seq_length": 32}},
        "training": {"cond_dropout_prob": 0.0},
    })
    out = str(tmp_path / "converted")
    written = IW.convert(config, unigen_src=str(tmp_path / "ref_ckpt"), out=out)
    assert set(written) == {"unigen"}
    conv_dir = written["unigen"]
    assert os.path.exists(os.path.join(conv_dir, "config.json"))

    # the exact swap the runbook documents: point pretrained_model_path at the
    # converted dir and rebuild — the native format is auto-detected
    tokenizer = launch.load_tokenizer(config)
    prompting = launch.build_prompting(config, tokenizer)
    config.model.unigen.pretrained_model_path = conv_dir
    params, cfg = launch.build_unigen(config, prompting)

    direct = HI.import_unigen(sd, cfg)
    import chex
    chex.assert_trees_all_close(params, direct)
    # and the loaded model runs
    h, _ = Q.forward(params["llm"], cfg.llm, input_ids=jnp.asarray([[1, 2, 3]]))
    assert np.isfinite(np.asarray(h)).all()


def _sft_fixture():
    """Tiny three-task SFT setup shared by the step tests."""
    from unigen_tpu.models import magvit as MV

    cfg = U.UniGenConfig.tiny(w_und_encoder=True, mm_input_dim=32)
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    vs_cfg = SG.SiglipConfig.tiny(image_size=28, patch_size=14, hidden_size=32)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    vs_params = SG.init(jax.random.key(2), vs_cfg)

    b, n, L = 2, cfg.num_vq_tokens, 28
    rng = np.random.default_rng(0)
    t2i_template = rng.integers(3, 100, size=(b, L))
    t2i_template[:, -n - 2] = 1
    t2i_template[:, -n - 1:-1] = 0
    t2i_template[:, -1] = 2
    # real prompting emits soi/eoi LABELS outside the scored VQ-block slice
    # (prompting.py::t2i_prompt) — keep them in the fixture so any loss path
    # that scores beyond the slice diverges visibly
    t2i_labels = np.full((b, L), -100)
    t2i_labels[:, -n - 2] = 1
    t2i_labels[:, -1] = 2
    p = vs_cfg.num_patches  # 4 patches at 28px/14
    part1 = rng.integers(3, 100, size=(b, 3))
    part2 = rng.integers(3, 100, size=(b, 8))
    labels = np.full((b, 3 + p + 8), -100)
    labels[:, -4:] = rng.integers(3, 100, size=(b, 4))
    batch = {
        "t2i_template": jnp.asarray(t2i_template),
        "t2i_labels": jnp.asarray(t2i_labels, dtype=jnp.int32),
        "t2i_pixels": jnp.asarray(rng.normal(size=(b, 8, 8, 3)), jnp.float32),
        "lm_ids": jnp.asarray(rng.integers(3, 100, size=(b, L))),
        "lm_labels": jnp.asarray(rng.integers(3, 100, size=(b, L))),
        "mmu_part1": jnp.asarray(part1),
        "mmu_part2": jnp.asarray(part2),
        "mmu_labels": jnp.asarray(labels),
        "mmu_pixels": jnp.asarray(rng.normal(size=(b, 28, 28, 3)), jnp.float32),
        "mmu_prompt_len": jnp.asarray([3 + p + 8, 3 + p + 6]),
    }
    return cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch


def test_sft_step_runs():
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    b = 2
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 1e-3, schedule,
                        lr_mapper={"mm_projector": 2.0},
                        tunable_parts=["mm_projector", "llm"])
    tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b)
    step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
    state = init_train_state(params, tx)
    state, metrics = step(state, vq_params, vs_params, batch, jax.random.key(0))
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu"):
        assert np.isfinite(float(metrics[k])), k


def test_sft_memory_efficient_loss_matches_dense():
    """The chunked-CE SFT step (default; no [B, L, 160k] logits tensor) computes
    the same losses and gradients as the dense path on all three tasks."""
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    b = 2
    schedule = LRS.get_scheduler("constant")
    results = {}
    for eff in (True, False):
        tx = make_optimizer(params, 1e-3, schedule)
        tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b,
                             memory_efficient_loss=eff)
        step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
        state = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
        _, metrics = step(state, vq_params, vs_params, batch, jax.random.key(0))
        results[eff] = {k: float(v) for k, v in metrics.items()}
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu", "grad_norm"):
        np.testing.assert_allclose(results[True][k], results[False][k],
                                   rtol=2e-5, err_msg=k)


def test_sft_split_dispatch_matches_fused():
    """make_sft_grad_fns (three separately-jitted programs, the single-chip
    memory path) computes the same step as the fused make_sft_train_step."""
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import (SFTStepConfig, make_sft_grad_fns,
                                         make_sft_train_step)
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    b = 2
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 1e-3, schedule)
    tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b)
    key = jax.random.key(3)

    fused = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
    state_f = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
    state_f, m_f = fused(state_f, vq_params, vs_params, batch, key)

    grad_tl, grad_mmu, apply_grads = make_sft_grad_fns(
        cfg, vq_cfg, vs_cfg, tx, tcfg)
    state_s = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
    g1, aux1 = jax.jit(grad_tl)(state_s.params, vq_params, batch, key)
    g2, aux2 = jax.jit(grad_mmu)(state_s.params, vs_params, batch)
    state_s, m_s = jax.jit(apply_grads, donate_argnums=(0, 1, 2))(
        state_s, g1, g2, aux1, aux2)

    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu", "grad_norm",
              "avg_masking_rate"):
        np.testing.assert_allclose(float(m_s[k]), float(m_f[k]), rtol=1e-6,
                                   err_msg=k)
    import chex
    # cross-program fp32 reduction reassociation: ~1e-10 absolute
    chex.assert_trees_all_close(state_s.params, state_f.params,
                                rtol=1e-5, atol=1e-8)
    assert int(state_s.step) == int(state_f.step) == 1


@pytest.mark.parametrize("pack", [False, True])
def test_sft_common_length_matches_separate(pack):
    """Both fused common-length SFT modes — left-padded rows (pack=False) and
    sequence-packed rows (pack=True, 2 segments/row here) — compute the same
    losses and step as the separate per-length calls."""
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    b = 2
    p = vs_cfg.num_patches
    # lengthen the mmu conversation so the mmu splice (= common_length) covers
    # TWO 28-token t2i/lm segments per row, like the flagship's 1344-vs-387
    rng = np.random.default_rng(1)
    part2_len = 50
    mmu_len = 3 + p + part2_len
    assert mmu_len >= 2 * batch["t2i_template"].shape[1]
    labels = np.full((b, mmu_len), -100)
    labels[:, -6:] = rng.integers(3, 100, size=(b, 6))
    batch = dict(batch,
                 mmu_part2=jnp.asarray(rng.integers(3, 100, size=(b, part2_len))),
                 mmu_labels=jnp.asarray(labels),
                 mmu_prompt_len=jnp.asarray([mmu_len, mmu_len - 2]))
    schedule = LRS.get_scheduler("constant")
    results = {}
    for common in (mmu_len, None):
        tx = make_optimizer(params, 1e-3, schedule)
        tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b,
                             common_length=common, pack_rows=pack)
        step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
        state = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
        state, metrics = step(state, vq_params, vs_params, batch, jax.random.key(5))
        results[common] = ({k: float(v) for k, v in metrics.items()}, state.params)
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu", "grad_norm",
              "avg_masking_rate"):
        np.testing.assert_allclose(results[mmu_len][0][k], results[None][0][k],
                                   rtol=2e-5, err_msg=k)
    import chex
    chex.assert_trees_all_close(results[mmu_len][1], results[None][1],
                                rtol=1e-4, atol=1e-7)


def test_sft_packed_partial_row_matches_separate():
    """An odd t2i count leaves the last packed row partially filled (empty
    slots are all-masked); losses must still equal the separate-call step."""
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    n, L = cfg.num_vq_tokens, 28
    rng = np.random.default_rng(2)
    bt, bm = 3, 2
    p = vs_cfg.num_patches
    part2_len = 50
    mmu_len = 3 + p + part2_len          # 57 -> 2 segments of 28 per row
    t2i_template = rng.integers(3, 100, size=(bt, L))
    t2i_template[:, -n - 2] = 1
    t2i_template[:, -n - 1:-1] = 0
    t2i_template[:, -1] = 2
    t2i_labels = np.full((bt, L), -100)
    t2i_labels[:, -n - 2] = 1
    t2i_labels[:, -1] = 2
    mmu_labels = np.full((bm, mmu_len), -100)
    mmu_labels[:, -6:] = rng.integers(3, 100, size=(bm, 6))
    batch = {
        "t2i_template": jnp.asarray(t2i_template),
        "t2i_labels": jnp.asarray(t2i_labels, dtype=jnp.int32),
        "t2i_pixels": jnp.asarray(rng.normal(size=(bt, 8, 8, 3)), jnp.float32),
        "mmu_part1": jnp.asarray(rng.integers(3, 100, size=(bm, 3))),
        "mmu_part2": jnp.asarray(rng.integers(3, 100, size=(bm, part2_len))),
        "mmu_labels": jnp.asarray(mmu_labels),
        "mmu_pixels": jnp.asarray(rng.normal(size=(bm, 28, 28, 3)), jnp.float32),
        "mmu_prompt_len": jnp.full((bm,), mmu_len),
    }
    schedule = LRS.get_scheduler("constant")
    results = {}
    for common in (mmu_len, None):
        tx = make_optimizer(params, 1e-3, schedule)
        tcfg = SFTStepConfig(batch_size_t2i=bt, batch_size_lm=0,
                             batch_size_mmu=bm, common_length=common)
        step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
        state = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
        _, metrics = step(state, vq_params, vs_params, batch, jax.random.key(9))
        results[common] = {k: float(v) for k, v in metrics.items()}
    for k in ("loss", "loss_t2i", "loss_mmu", "grad_norm"):
        np.testing.assert_allclose(results[mmu_len][k], results[None][k],
                                   rtol=2e-5, err_msg=k)


def test_grid_tiles():
    from unigen_tpu.training.sft import grid_tiles
    px = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    tiles = grid_tiles(px, n_grid=2, tile_size=4)
    assert tiles.shape == (2, 5, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(tiles[:, 1]), np.asarray(px[:, :4, :4]))
    np.testing.assert_array_equal(np.asarray(tiles[:, 4]), np.asarray(px[:, 4:, 4:]))


@pytest.mark.parametrize("mode", ["separate", "fused", "packed"])
def test_sft_flash_attention_matches_dense(mode):
    """use_flash_attention=True (AttnMeta through the omni-mask kernel path;
    on CPU the numerically-matching XLA visibility() form) computes the same
    losses and updated params as the dense-mask step, in all three SFT
    dispatch modes — including the sequence-packed rows whose block-diagonal
    masks become per-token segment ids (ops/masks.py::AttnMeta.seg)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    cfg, vq_cfg, vs_cfg, params, vq_params, vs_params, batch = _sft_fixture()
    b = 2
    rng = np.random.default_rng(11)
    if mode != "separate":
        # stretch the mmu splice to cover two t2i/lm segments (387-vs-1344 analog)
        p = vs_cfg.num_patches
        part2_len = 50
        mmu_len = 3 + p + part2_len
        labels = np.full((b, mmu_len), -100)
        labels[:, -6:] = rng.integers(3, 100, size=(b, 6))
        batch = dict(batch,
                     mmu_part2=jnp.asarray(rng.integers(3, 100, size=(b, part2_len))),
                     mmu_labels=jnp.asarray(labels),
                     mmu_prompt_len=jnp.asarray([mmu_len, mmu_len - 2]))
        common = mmu_len
    else:
        common = None
    schedule = LRS.get_scheduler("constant")
    results = {}
    for flash in (False, True):
        tx = make_optimizer(params, 1e-3, schedule)
        tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b,
                             common_length=common, pack_rows=(mode == "packed"),
                             use_flash_attention=flash)
        step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
        state = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
        state, metrics = step(state, vq_params, vs_params, batch,
                              jax.random.key(5))
        results[flash] = ({k: float(v) for k, v in metrics.items()}, state.params)
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu", "grad_norm",
              "avg_masking_rate"):
        np.testing.assert_allclose(results[True][0][k], results[False][0][k],
                                   rtol=2e-5, err_msg=k)
    import chex
    chex.assert_trees_all_close(results[True][1], results[False][1],
                                rtol=1e-4, atol=1e-7)
