"""Network shape/semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.models import splendor_net as N


def _setup(n=2):
    env_cfg = E.SplendorConfig(num_players=n)
    net_cfg = A.net_config_for(env_cfg)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    return env_cfg, net_cfg, params, bs


def test_forward_shapes_and_masking():
    env_cfg, net_cfg, params, bs = _setup()
    B = 4
    boards = jax.random.normal(jax.random.PRNGKey(1), (B, net_cfg.nb_vect, 7))
    valids = np.zeros((B, 409), bool)
    valids[:, [0, 5, 30, 408]] = True
    probs, v, log_sd = jax.jit(
        lambda p, b, va: N.apply_inference(net_cfg, p, bs, b, va)
    )(params, boards, jnp.asarray(valids))
    probs, v, log_sd = map(np.asarray, (probs, v, log_sd))
    assert probs.shape == (B, 409) and v.shape == (B, 2)
    assert log_sd.shape == (B, 2, 31)
    # invalid actions get ~zero probability; valid ones sum to 1
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
    assert probs[~valids].max() < 1e-8
    assert (np.abs(v) <= 1).all()
    np.testing.assert_allclose(np.exp(log_sd).sum(-1), 1.0, atol=1e-4)


def test_param_count_reasonable():
    _, net_cfg, params, _ = _setup()
    n = N.count_params(params)
    # reference model is ~300k params; ours should be same order
    assert 100_000 < n < 2_000_000, n


def test_train_step_reduces_loss():
    from alphazero_tpu.train import trainer as TR
    env_cfg, net_cfg, params, bs = _setup()
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    tcfg = TR.TrainConfig(batch_size=16, epochs=1, augment=False)
    step = TR.make_train_step(env_cfg, net_cfg, tcfg)

    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    boards = jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys)
    valids = jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0))(boards)
    pi = jnp.where(valids, 1.0, 0.0)
    pi = pi / pi.sum(-1, keepdims=True)
    batch = {
        "boards": boards,
        "pi": pi,
        "winner": jnp.tile(jnp.array([1.0, -1.0]), (B, 1)),
        "scdiff": jnp.zeros((B, 2), jnp.int8),
        "valids": valids,
    }
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jnp.float32(3e-3),
                              jnp.float32(10.0), jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_symmetry_preserves_semantics():
    """A symmetric transform of (state, pi, valids) must keep pi mass and the
    valid count, and stay a legal state (valid_moves consistent with perm)."""
    from alphazero_tpu.games.splendor import symmetry as SYM
    env_cfg, net_cfg, params, bs = _setup()
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    boards = jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys)
    valids = jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0))(boards)
    pi = jnp.where(valids, 1.0, 0.0)
    pi = pi / pi.sum(-1, keepdims=True)
    sym = SYM.batched_random_symmetry(env_cfg)
    b2, p2, v2 = sym(jax.random.PRNGKey(3), boards, pi, valids)
    b2, p2, v2 = map(np.asarray, (b2, p2, v2))
    np.testing.assert_allclose(p2.sum(1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valids).sum(1), v2.sum(1))
    # permuted states are still legal: recomputed masks match permuted masks
    v_re = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(jnp.asarray(b2)))
    np.testing.assert_array_equal(v_re, v2)
