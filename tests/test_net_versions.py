"""nn_version registry: selectable architectures + cross-version warm-start
transfer (reference -V flag, SplendorNNet.py:69, SplendorNNet_prev*.py, and
transfer_weights:161-169)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.utils import checkpoint as CKPT


@pytest.fixture(scope="module")
def cfg1():
    return A.net_config_for(E.SplendorConfig(num_players=2))


def _forward_ok(net_cfg):
    params, stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    boards = jnp.zeros((3, net_cfg.nb_vect, 7), jnp.float32)
    valids = jnp.zeros((3, net_cfg.action_size), bool).at[:, :5].set(True)
    pi, v, log_sd = N.apply_inference(net_cfg, params, stats, boards, valids)
    pi, v, log_sd = map(np.asarray, (pi, v, log_sd))
    assert pi.shape == (3, net_cfg.action_size)
    assert (pi[~np.asarray(valids)] < 1e-6).all()     # mask respected
    np.testing.assert_allclose(pi.sum(1), 1.0, atol=1e-5)
    assert v.shape == (3, net_cfg.num_players) and (np.abs(v) <= 1).all()
    assert log_sd.shape == (3, net_cfg.num_scdiffs, net_cfg.scdiff_size)
    return params


def test_v2_forward_and_train(cfg1):
    cfg2 = dataclasses.replace(cfg1, nn_version=2)
    params = _forward_ok(cfg2)
    assert N.count_params(params) > 0
    # train-mode apply mutates batch stats
    p, s = N.init_params(cfg2, jax.random.PRNGKey(1))
    boards = jnp.ones((4, cfg2.nb_vect, 7), jnp.float32)
    valids = jnp.ones((4, cfg2.action_size), bool)
    (log_pi, v, log_sd), new_s = N.apply_train(cfg2, p, s, boards, valids,
                                               jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(log_pi)).all()
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.array_equal(a, b), s, new_s)
    assert any(jax.tree_util.tree_leaves(changed))


def test_version_0_and_1_share_reference_stack(cfg1):
    cfg0 = dataclasses.replace(cfg1, nn_version=0)
    p0, _ = N.init_params(cfg0, jax.random.PRNGKey(0))
    p1, _ = N.init_params(cfg1, jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)


def test_unknown_version_raises(cfg1):
    with pytest.raises(ValueError, match="nn_version"):
        N.build_net(dataclasses.replace(cfg1, nn_version=99))


def test_cross_version_transfer(cfg1):
    """v1 -> v2 warm start: overlapping leaf slices carry over (reference
    load_not_strict partial transfer, GenericNNetWrapper.py:215-242)."""
    cfg2 = dataclasses.replace(cfg1, nn_version=2)
    p1, _ = N.init_params(cfg1, jax.random.PRNGKey(0))
    p2, _ = N.init_params(cfg2, jax.random.PRNGKey(1))
    merged = CKPT.transfer_partial(p1, p2)
    # the first trunk layer exists in both; its overlapping slice must equal v1
    k1 = np.asarray(p1["Dense_0"]["kernel"])
    km = np.asarray(merged["Dense_0"]["kernel"])
    sl = tuple(slice(0, min(a, b)) for a, b in zip(k1.shape, km.shape))
    np.testing.assert_array_equal(km[sl], k1[sl])
    # v2-only leaves are untouched v2 init
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(p2)


def test_action_space_growth_transfer(cfg1):
    """406-era PI head grows to 409 (reference transfer_weights,
    SplendorNNet.py:161-169): shared columns carry over."""
    cfg406 = dataclasses.replace(cfg1, action_size=406)
    p406, _ = N.init_params(cfg406, jax.random.PRNGKey(0))
    p409, _ = N.init_params(cfg1, jax.random.PRNGKey(1))
    merged = CKPT.transfer_partial(p406, p409)
    k_old = np.asarray(p406["Dense_7"]["kernel"])      # PI output layer
    k_new = np.asarray(merged["Dense_7"]["kernel"])
    np.testing.assert_array_equal(k_new[:, :406], k_old)
    assert k_new.shape[1] == 409
