"""bfloat16 compute path: same parameter tree as float32 (checkpoints are
interchangeable), float32 outputs, and close numerics."""

import dataclasses

import jax
import numpy as np

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.models import splendor_net as N


def _setup(nn_version):
    env_cfg = E.SplendorConfig(num_players=2)
    f32 = A.net_config_for(env_cfg, nn_version=nn_version)
    bf16 = dataclasses.replace(f32, dtype="bfloat16")
    params, bs = N.init_params(f32, jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    boards = jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys)\
        .astype(jax.numpy.float32)
    valids = jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0))(
        boards.astype(jax.numpy.int8))
    return f32, bf16, params, bs, boards, valids


def test_bf16_matches_f32_and_shares_params():
    for version in (1, 2):
        f32, bf16, params, bs, boards, valids = _setup(version)

        # identical parameter trees: a bf16 net loads f32 checkpoints as-is
        p16, _ = N.init_params(bf16, jax.random.PRNGKey(0))
        s32 = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), params)
        s16 = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), p16)
        assert s32 == s16

        pi32, v32, _ = N.apply_inference(f32, params, bs, boards, valids)
        pi16, v16, _ = N.apply_inference(bf16, params, bs, boards, valids)
        assert pi16.dtype == jax.numpy.float32
        assert v16.dtype == jax.numpy.float32
        # bf16 has ~3 decimal digits; the trunk is shallow so outputs stay
        # close and the policy ordering is essentially preserved
        np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                                   atol=0.15)
        l1 = np.abs(np.asarray(pi16) - np.asarray(pi32)).sum(-1)
        assert float(l1.max()) < 0.35, float(l1.max())
        agree = (np.asarray(pi16).argmax(-1)
                 == np.asarray(pi32).argmax(-1)).mean()
        assert agree >= 0.8, agree
