"""Train-step tests: loss decreases, sharded multichip step, schedules, optimizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unigen_tpu.models import magvit as MV
from unigen_tpu.models import unigen as U
from unigen_tpu.parallel import make_mesh, partition_unigen, partition_batch, shard_params
from unigen_tpu.parallel.partition import partition_magvit
from unigen_tpu.training import lr_schedules as LRS
from unigen_tpu.training.optimizer import make_optimizer, decay_mask, trainable_mask
from unigen_tpu.training.train_step import (TrainStepConfig, init_train_state,
                                            make_train_step)


def _tiny_setup(bt=2, bl=2, bm=2, accum=1):
    cfg = U.UniGenConfig.tiny()
    vq_cfg = MV.MagvitConfig.tiny(z_channels=5)
    # tiny: 16px -> 8x8=64 codes; but cfg.num_vq_tokens=16 -> use 8px images? use
    # resolution 8 -> 4x4 = 16 codes with 2 levels. set resolution accordingly.
    vq_cfg = MV.MagvitConfig.tiny(z_channels=5, resolution=8)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    n, L = cfg.num_vq_tokens, 28
    rng = np.random.default_rng(0)

    def mk_batch(b_mult=1):
        bt_, bl_, bm_ = bt * b_mult, bl * b_mult, bm * b_mult
        t2i_template = rng.integers(3, 100, size=(bt_, L))
        t2i_template[:, -n - 2] = 1  # soi
        t2i_template[:, -1] = 2      # eoi
        t2i_template[:, -n - 1:-1] = 0
        t2i_labels = np.full((bt_, L), -100)
        mmu_template = rng.integers(3, 100, size=(bm_, L))
        mmu_template[:, 2] = 1
        mmu_template[:, 3 + n] = 2
        mmu_template[:, 3:3 + n] = 0
        mmu_labels = np.where(rng.random((bm_, L)) < 0.5, rng.integers(3, 100, (bm_, L)), -100)
        mmu_labels[:, :4 + n] = -100
        lm_ids = rng.integers(3, 100, size=(bl_, L))
        lm_labels = lm_ids.copy()
        return {
            "t2i_template": jnp.asarray(t2i_template),
            "t2i_labels": jnp.asarray(t2i_labels),
            "t2i_pixels": jnp.asarray(rng.normal(size=(bt_, 8, 8, 3)), jnp.float32),
            "lm_ids": jnp.asarray(lm_ids), "lm_labels": jnp.asarray(lm_labels),
            "mmu_template": jnp.asarray(mmu_template),
            "mmu_labels": jnp.asarray(mmu_labels),
            "mmu_pixels": jnp.asarray(rng.normal(size=(bm_, 8, 8, 3)), jnp.float32),
        }

    schedule = LRS.get_scheduler("cosine", num_warmup_steps=2, num_training_steps=50)
    tx = make_optimizer(params, 1e-3, schedule, max_grad_norm=1.0)
    tcfg = TrainStepConfig(batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
                           grad_accum_steps=accum, max_grad_norm=1.0)
    step_fn = make_train_step(cfg, vq_cfg, tx, tcfg)
    return cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn


def test_lr_schedules_match_reference_formulas():
    ref = pytest.importorskip("torch")  # noqa: F841 (formula check is standalone)
    import math
    s = LRS.get_scheduler("cosine", num_warmup_steps=10, num_training_steps=100,
                          min_scale=0.1)
    assert abs(float(s(5)) - 0.5) < 1e-6                       # warmup
    prog = (55 - 10) / 90
    want = max(0.1, 0.1 + 0.5 * 0.9 * (1 + math.cos(math.pi * prog)))
    assert abs(float(s(55)) - want) < 1e-6
    lin = LRS.get_scheduler("linear", num_warmup_steps=0, num_training_steps=100)
    assert abs(float(lin(50)) - 0.5) < 1e-6
    poly = LRS.get_scheduler("polynomial", num_warmup_steps=0, num_training_steps=10,
                             lr_init=1e-3, lr_end=1e-7)
    assert float(poly(20)) == pytest.approx(1e-7 / 1e-3)
    with pytest.raises(ValueError):
        LRS.get_scheduler("cosine")


def test_decay_and_trainable_masks():
    cfg = U.UniGenConfig.tiny(w_und_encoder=True)
    params = U.init(jax.random.key(0), cfg)
    dm = decay_mask(params)
    assert dm["llm"]["embed"]["weight"] is False
    assert dm["llm"]["final_ln"]["scale"] is False
    assert dm["llm"]["layers"]["attn"]["q"]["kernel"] is True
    assert dm["llm"]["layers"]["attn"]["q"]["bias"] is False
    tm = trainable_mask(params, ["mm_projector"])
    assert tm["mm_projector"][0]["kernel"] is True
    assert tm["llm"]["embed"]["weight"] is False


def test_train_step_loss_decreases():
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup()
    state = init_train_state(params, tx)
    batch = mk_batch()
    losses = []
    jit_step = jax.jit(step_fn)
    for i in range(6):
        state, metrics = jit_step(state, vq_params, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_grad_accum_equivalence():
    """accum=2 over a doubled batch must equal the mean of two half-batches."""
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup(accum=1)
    _, _, _, _, _, tx2, tcfg2, step2 = _tiny_setup(accum=2)
    state = init_train_state(params, tx)
    batch2 = mk_batch(b_mult=2)
    s2, m2 = jax.jit(step2)(state, vq_params, batch2, jax.random.key(0))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 1


def test_sharded_train_step_runs_on_mesh(eight_devices):
    """Full DP×TP train step over the 8-virtual-device mesh (data=4, model=2)."""
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup(
        bt=4, bl=4, bm=4)
    mesh = make_mesh(data=4, fsdp=1, model=2)
    pspecs = partition_unigen(params)
    params_sharded = shard_params(params, pspecs, mesh)
    vq_sharded = shard_params(vq_params, partition_magvit(vq_params), mesh)
    state = init_train_state(params_sharded, tx)
    batch = mk_batch()
    batch = {k: jax.device_put(v, NamedSharding(mesh, partition_batch(v.ndim)))
             for k, v in batch.items()}
    with jax.set_mesh(mesh):
        state, metrics = jax.jit(step_fn)(state, vq_sharded, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # params keep their shardings through the update
    q_sharding = state.params["llm"]["layers"]["attn"]["q"]["kernel"].sharding
    assert "model" in str(q_sharding.spec)


def test_sharded_sft_step_runs_on_mesh(eight_devices):
    """DP×TP SFT step (SigLIP tower + three tasks) over the 8-virtual-device
    mesh — the scale-out topology for the reference's train_w_clip_vit stage."""
    from unigen_tpu.models import siglip as SG
    from unigen_tpu.parallel.partition import partition_siglip
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step

    cfg = U.UniGenConfig.tiny(w_und_encoder=True, mm_input_dim=32)
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    vs_cfg = SG.SiglipConfig.tiny(image_size=28, patch_size=14, hidden_size=32)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    vs_params = SG.init(jax.random.key(2), vs_cfg)
    b, n, L = 4, cfg.num_vq_tokens, 28
    rng = np.random.default_rng(0)
    t2i_template = rng.integers(3, 100, size=(b, L))
    t2i_template[:, -n - 2] = 1
    t2i_template[:, -n - 1:-1] = 0
    t2i_template[:, -1] = 2
    p = vs_cfg.num_patches
    labels = np.full((b, 3 + p + 8), -100)
    labels[:, -4:] = rng.integers(3, 100, size=(b, 4))
    batch = {
        "t2i_template": jnp.asarray(t2i_template),
        "t2i_labels": jnp.full((b, L), -100, jnp.int32),
        "t2i_pixels": jnp.asarray(rng.normal(size=(b, 8, 8, 3)), jnp.float32),
        "lm_ids": jnp.asarray(rng.integers(3, 100, size=(b, L))),
        "lm_labels": jnp.asarray(rng.integers(3, 100, size=(b, L))),
        "mmu_part1": jnp.asarray(rng.integers(3, 100, size=(b, 3))),
        "mmu_part2": jnp.asarray(rng.integers(3, 100, size=(b, 8))),
        "mmu_labels": jnp.asarray(labels),
        "mmu_pixels": jnp.asarray(rng.normal(size=(b, 28, 28, 3)), jnp.float32),
        "mmu_prompt_len": jnp.full((b,), 3 + p + 8),
    }
    mesh = make_mesh(data=4, fsdp=1, model=2)
    params_sharded = shard_params(params, partition_unigen(params), mesh)
    vq_sharded = shard_params(vq_params, partition_magvit(vq_params), mesh)
    vs_sharded = shard_params(vs_params, partition_siglip(vs_params), mesh)
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 1e-3, schedule,
                        tunable_parts=["mm_projector", "llm"])
    tcfg = SFTStepConfig(batch_size_t2i=b, batch_size_lm=b, batch_size_mmu=b)
    step = make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg)
    state = init_train_state(params_sharded, tx)
    batch = {k: jax.device_put(v, NamedSharding(mesh, partition_batch(v.ndim)))
             for k, v in batch.items()}
    with jax.set_mesh(mesh):
        state, metrics = jax.jit(step)(state, vq_sharded, vs_sharded, batch,
                                       jax.random.key(0))
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu"):
        assert np.isfinite(float(metrics[k])), k
    q_sharding = state.params["llm"]["layers"]["attn"]["q"]["kernel"].sharding
    assert "model" in str(q_sharding.spec)


def test_sharded_dpo_step_runs_on_mesh(eight_devices):
    """DP×TP DPO step (policy + frozen reference) over the 8-virtual-device
    mesh — the scale-out topology for the reference's train_dpo stage."""
    from unigen_tpu.training.dpo import DPOConfig, make_dpo_step

    cfg = U.UniGenConfig.tiny()
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    n, L, b = cfg.num_vq_tokens, 28, 4
    rng = np.random.default_rng(0)
    template = rng.integers(3, 100, size=(b, L))
    template[:, -n - 2] = 1
    template[:, -n - 1:-1] = 0
    template[:, -1] = 2
    batch = {
        "template": jnp.asarray(template),
        "labels": jnp.full((b, L), -100, jnp.int32),
        "chosen_pixels": jnp.asarray(rng.normal(size=(b, 8, 8, 3)), jnp.float32),
        "rejected_pixels": jnp.asarray(rng.normal(size=(b, 8, 8, 3)), jnp.float32),
    }
    mesh = make_mesh(data=4, fsdp=1, model=2)
    pspecs = partition_unigen(params)
    params_sharded = shard_params(params, pspecs, mesh)
    ref_sharded = shard_params(params, pspecs, mesh)
    vq_sharded = shard_params(vq_params, partition_magvit(vq_params), mesh)
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 5e-4, schedule, max_grad_norm=1.0)
    step = make_dpo_step(cfg, vq_cfg, tx, DPOConfig(beta=0.1))
    state = init_train_state(params_sharded, tx)
    batch = {k: jax.device_put(v, NamedSharding(mesh, partition_batch(v.ndim)))
             for k, v in batch.items()}
    with jax.set_mesh(mesh):
        state, metrics = jax.jit(step)(state, ref_sharded, vq_sharded, batch,
                                       jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    q_sharding = state.params["llm"]["layers"]["attn"]["q"]["kernel"].sharding
    assert "model" in str(q_sharding.spec)


def test_checkpoint_roundtrip(tmp_path):
    from unigen_tpu.utils import checkpoint as CK
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup()
    state = init_train_state(params, tx)
    out = str(tmp_path / "run")
    CK.save_checkpoint(state, out, step=10, total_limit=2,
                       unwrapped_params=state.params)
    CK.save_checkpoint(state, out, step=20, total_limit=2)
    CK.save_checkpoint(state, out, step=30, total_limit=2)
    import os
    dirs = sorted(os.listdir(out))
    assert "checkpoint-10" not in dirs and len(dirs) == 2  # rotated
    latest = CK.latest_checkpoint(out)
    assert CK.resume_step(latest) == 30
    restored = CK.restore_checkpoint(latest, state)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(restored.params, state.params)
    assert int(restored.step) == int(state.step)


def test_checkpoint_cross_mesh_restore(tmp_path, eight_devices):
    """Save a TrainState sharded over a (2,2,2) mesh; restore bitwise onto a
    (4,2,1) mesh and onto ONE device, then take one more step.

    This is the scenario the reference cannot handle — it stops evaluation
    under FSDP "to avoid unsharding problems" (reference train.py:846). Orbax
    checkpoints are sharding-agnostic: the restore target's shardings decide
    the layout, so mesh topology can change across save/restore.
    """
    from jax.sharding import SingleDeviceSharding
    from unigen_tpu.parallel.partition import add_fsdp
    from unigen_tpu.utils import checkpoint as CK

    # batch divisible by both meshes' (data x fsdp) = 4 and 8
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup(
        bt=8, bl=8, bm=8)

    def sharded_state(mesh):
        specs = add_fsdp(partition_unigen(params), params)
        state = init_train_state(shard_params(params, specs, mesh), tx)
        # optimizer scalars (e.g. schedule count) are born uncommitted on one
        # device; pin them to the mesh so the restore target is homogeneous
        return jax.tree_util.tree_map(
            lambda x: x if isinstance(x.sharding, NamedSharding)
            else jax.device_put(x, NamedSharding(mesh, P())), state)

    mesh_a = make_mesh(data=2, fsdp=2, model=2)
    state = sharded_state(mesh_a)
    batch = mk_batch()
    with jax.set_mesh(mesh_a):
        state, _ = jax.jit(step_fn)(state, vq_params, batch, jax.random.key(0))
    want = jax.tree_util.tree_map(np.asarray, state)
    out = str(tmp_path / "run")
    CK.save_checkpoint(state, out, step=1)
    latest = CK.latest_checkpoint(out)

    def assert_bitwise(restored):
        got = jax.tree_util.tree_map(np.asarray, restored)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), want, got)

    # (2,2,2) -> (4,2,1): different axis sizes, different per-leaf layouts
    mesh_b = make_mesh(data=4, fsdp=2, model=1)
    target_b = sharded_state(mesh_b)
    restored_b = CK.restore_checkpoint(latest, target_b)
    assert_bitwise(restored_b)
    q = restored_b.params["llm"]["layers"]["attn"]["q"]["kernel"]
    assert q.sharding.mesh.shape["fsdp"] == 2  # actually restored SHARDED

    # (2,2,2) -> one device (the reference's broken unshard-for-eval path)
    dev = jax.devices()[0]
    target_1 = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=SingleDeviceSharding(dev)),
        state)
    restored_1 = CK.restore_checkpoint(latest, target_1)
    assert_bitwise(restored_1)
    assert all(d == dev for leaf in jax.tree_util.tree_leaves(restored_1.params)
               for d in leaf.devices())

    # the restored cross-mesh state is USABLE: one more step on mesh B
    batch_b = {k: jax.device_put(v, NamedSharding(mesh_b, partition_batch(v.ndim)))
               for k, v in batch.items()}
    with jax.set_mesh(mesh_b):
        state2, metrics = jax.jit(step_fn)(restored_b, vq_params, batch_b,
                                           jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 2


def test_flash_attention_train_step_matches_dense():
    """The fused 3-task step under AttnMeta+kernel == dense-mask step (losses)."""
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup()
    from unigen_tpu.training.train_step import make_train_step
    import dataclasses
    tcfg_flash = dataclasses.replace(tcfg, use_flash_attention=True)
    step_flash = jax.jit(make_train_step(cfg, vq_cfg, tx, tcfg_flash))
    step_dense = jax.jit(step_fn)
    state = init_train_state(params, tx)
    batch = mk_batch()
    _, m_dense = step_dense(state, vq_params, batch, jax.random.key(7))
    _, m_flash = step_flash(state, vq_params, batch, jax.random.key(7))
    for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu"):
        np.testing.assert_allclose(float(m_dense[k]), float(m_flash[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_t2i_generation_on_mesh(eight_devices):
    """Data-parallel image generation: batch sharded over 8 devices, one jit."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from unigen_tpu.generation import t2i_generate
    from unigen_tpu.ops import masks as M
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    mesh = make_mesh(data=8, fsdp=1, model=1)
    params_sharded = shard_params(params, partition_unigen(params), mesh)
    rng = np.random.default_rng(0)
    n, b = cfg.num_vq_tokens, 8
    text = rng.integers(3, 100, size=(b, 6))
    ids = np.concatenate([text, np.full((b, 1), 1),
                          np.full((b, n), cfg.mask_token_id),
                          np.full((b, 1), 2)], axis=1)
    ids = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(("data",))))
    mask = M.create_attention_mask_predict_next(ids, 0, 1, 2, rm_pad_in_image=True)

    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, i, m, k: t2i_generate(
            p, cfg, k, i, m, timesteps=2, reuse_prefix_cache=True, pad_id=0))(
            params_sharded, ids, mask, jax.random.key(0))
    a = np.asarray(out)
    assert a.shape == (b, n)
    assert (a >= 0).all() and (a < cfg.codebook_size).all()


def test_tensor_parallel_t2i_matches_unsharded(eight_devices):
    """TP serving: Megatron column/row-sharded params (model=2) through the
    full prefix-cached sampler must reproduce the unsharded tokens — GSPMD
    inserts the collectives; the sampler code is unchanged."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from unigen_tpu.generation import t2i_generate
    from unigen_tpu.ops import masks as M
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    n, b = cfg.num_vq_tokens, 4
    text = rng.integers(3, 100, size=(b, 6))
    ids = jnp.asarray(np.concatenate([text, np.full((b, 1), 1),
                                      np.full((b, n), cfg.mask_token_id),
                                      np.full((b, 1), 2)], axis=1))
    mask = M.create_attention_mask_predict_next(ids, 0, 1, 2, rm_pad_in_image=True)

    def run(p, i, m, k):
        return t2i_generate(p, cfg, k, i, m, timesteps=3, reuse_prefix_cache=True,
                            pad_id=0)

    ref = np.asarray(jax.jit(run)(params, ids, mask, jax.random.key(0)))

    mesh = make_mesh(data=4, fsdp=1, model=2)
    specs = partition_unigen(params)
    params_tp = shard_params(params, specs, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P(("data",))))
    with jax.set_mesh(mesh):
        out = jax.jit(run)(params_tp, ids_s, mask, jax.random.key(0))
    got = np.asarray(out)
    agree = (ref == got).mean()
    # sharded matmul partial-sum order can flip borderline draws; require
    # near-total agreement (exact on this seed)
    assert agree >= 0.95, f"TP sampler agreement {agree:.2f}"


def test_fsdp_param_sharding_train_step(eight_devices):
    """ZeRO-style: params/optimizer state sharded on the fsdp axis via add_fsdp."""
    from unigen_tpu.parallel.partition import add_fsdp, sanitize_specs
    cfg, vq_cfg, params, vq_params, mk_batch, tx, tcfg, step_fn = _tiny_setup(
        bt=4, bl=4, bm=4)
    mesh = make_mesh(data=2, fsdp=2, model=2)
    specs = add_fsdp(partition_unigen(params), params, min_size=1024)
    # at least one large leaf picked up the fsdp axis
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: "fsdp" in str(s), specs))
    assert any(flat)
    params_sharded = shard_params(params, specs, mesh)
    vq_sharded = shard_params(vq_params, partition_magvit(vq_params), mesh)
    state = init_train_state(params_sharded, tx)
    # optimizer moments inherit the param shardings
    mu_embed = jax.tree_util.tree_leaves(state.opt_state)[0]
    batch = mk_batch()
    batch = {k: jax.device_put(v, NamedSharding(mesh, partition_batch(v.ndim)))
             for k, v in batch.items()}
    with jax.set_mesh(mesh):
        state, metrics = jax.jit(step_fn)(state, vq_sharded, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    emb_spec = str(state.params["llm"]["embed"]["weight"].sharding.spec)
    assert "fsdp" in emb_spec or "model" in emb_spec
