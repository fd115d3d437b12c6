"""DPO step tests: logps semantics vs torch oracle, preference learning direction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import magvit as MV
from unigen_tpu.models import unigen as U
from unigen_tpu.training import lr_schedules as LRS
from unigen_tpu.training.dpo import DPOConfig, get_batch_logps, make_dpo_step
from unigen_tpu.training.optimizer import make_optimizer
from unigen_tpu.training.train_step import init_train_state


def test_get_batch_logps_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    b, l, v, n = 3, 24, 40, 16
    logits = rng.normal(size=(b, l, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, l))
    labels[:, -n - 1:-1][rng.random((b, n)) < 0.5] = -100

    def ref(logits_t, labels_t, mode):
        logits_t = logits_t[:, -(n + 1):-1]
        labels_t = labels_t[:, -(n + 1):-1].clone()
        mask = labels_t != -100
        labels_t[labels_t == -100] = 0
        if mode == "ar":
            pt = torch.gather(logits_t[:, :-1].log_softmax(-1), 2,
                              labels_t[:, 1:].unsqueeze(2)).squeeze(2)
            mask = mask[:, 1:]
        else:
            pt = torch.gather(logits_t.log_softmax(-1), 2,
                              labels_t.unsqueeze(2)).squeeze(2)
        return (pt * mask).sum(-1)

    for mode in ("mask", "ar"):
        want = ref(torch.tensor(logits), torch.tensor(labels), mode).numpy()
        got = np.asarray(get_batch_logps(jnp.asarray(logits), jnp.asarray(labels),
                                         num_vq_tokens=n, t2i_gen_mode=mode))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _dpo_fixture():
    cfg = U.UniGenConfig.tiny()
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    ref_params = jax.tree_util.tree_map(jnp.copy, params)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    n, L, b = cfg.num_vq_tokens, 28, 2
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
    return cfg, vq_cfg, params, ref_params, vq_params, batch


@pytest.mark.parametrize("mode", ["mask", "ar"])
def test_dpo_memory_efficient_logps_match_dense(mode):
    """Chunked VQ-block logps (default; no [2B, L, 160k] logits tensor) give the
    same DPO loss, rewards, and gradients as the dense head in both gen modes."""
    cfg, vq_cfg, params, ref_params, vq_params, batch = _dpo_fixture()
    schedule = LRS.get_scheduler("constant")
    results = {}
    for eff in (True, False):
        tx = make_optimizer(params, 5e-4, schedule, max_grad_norm=1.0)
        dcfg = DPOConfig(beta=0.1, t2i_gen_mode=mode, average_log_prob=True,
                         memory_efficient_logps=eff)
        step = jax.jit(make_dpo_step(cfg, vq_cfg, tx, dcfg))
        state = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
        _, metrics = step(state, ref_params, vq_params, batch, jax.random.key(7))
        results[eff] = {k: float(v) for k, v in metrics.items()}
    for k in ("loss", "policy_chosen_logps", "policy_rejected_logps",
              "reward_accuracy", "grad_norm"):
        np.testing.assert_allclose(results[True][k], results[False][k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_dpo_precomputed_ref_matches_online():
    """precomputed_ref mode (reference logps computed ahead by make_ref_logps_fn;
    the frozen reference never resident during the step — the flagship
    single-chip memory shape) follows the online path exactly for the same key."""
    from unigen_tpu.training.dpo import make_ref_logps_fn

    cfg, vq_cfg, params, ref_params, vq_params, batch = _dpo_fixture()
    schedule = LRS.get_scheduler("constant")
    key = jax.random.key(11)

    tx = make_optimizer(params, 5e-4, schedule, max_grad_norm=1.0)
    online = jax.jit(make_dpo_step(cfg, vq_cfg, tx, DPOConfig(beta=0.1)))
    state_o = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
    state_o, m_o = online(state_o, ref_params, vq_params, batch, key)

    dcfg = DPOConfig(beta=0.1, precomputed_ref=True)
    ref_fn = jax.jit(make_ref_logps_fn(cfg, vq_cfg, dcfg))
    refs = ref_fn(ref_params, vq_params, batch, key)
    pre = jax.jit(make_dpo_step(cfg, vq_cfg, tx, dcfg))
    state_p = init_train_state(jax.tree_util.tree_map(jnp.copy, params), tx)
    state_p, m_p = pre(state_p, None, vq_params, dict(batch, **refs), key)

    for k in ("loss", "reward_accuracy", "policy_chosen_logps",
              "policy_rejected_logps", "grad_norm"):
        np.testing.assert_allclose(float(m_p[k]), float(m_o[k]), rtol=1e-5,
                                   atol=1e-7, err_msg=k)
    import chex
    chex.assert_trees_all_close(state_p.params, state_o.params,
                                rtol=1e-5, atol=1e-8)


def test_dpo_step_learns_preference():
    cfg = U.UniGenConfig.tiny()
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    ref_params = jax.tree_util.tree_map(jnp.copy, params)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    n, L, b = cfg.num_vq_tokens, 28, 2
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
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 5e-4, schedule, max_grad_norm=1.0)
    dcfg = DPOConfig(beta=0.1)
    step = jax.jit(make_dpo_step(cfg, vq_cfg, tx, dcfg))
    state = init_train_state(params, tx)
    losses = []
    for i in range(5):
        state, metrics = step(state, ref_params, vq_params, batch, jax.random.key(42))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # with a frozen reference and fixed masking key, DPO pushes loss below log(2)... start
    assert losses[-1] < losses[0]
    assert float(metrics["reward_accuracy"]) >= 0.5
