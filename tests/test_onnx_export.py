"""ONNX export parity: emit the dependency-free .onnx, re-parse it with the
independent mini reader, execute it in numpy, and compare against the JAX
forward (reference artifact contract: chkpt_to_onnx.py:31-41)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.compat.onnx_export import export_onnx
from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.models import splendor_net as N
from tests import onnx_mini


def _boards_valids(env_cfg, n=16, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    states = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
    valids = jax.jit(jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0)))(states)
    return (np.asarray(states, np.float32), np.asarray(valids, bool))


@pytest.mark.parametrize("nn_version", [1, 2])
def test_onnx_roundtrip_matches_jax(tmp_path, nn_version):
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, nn_version=nn_version)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(3))
    path = str(tmp_path / "model.onnx")
    export_onnx(net_cfg, params, bs, path)

    model = onnx_mini.load_model(path)
    assert model["opset"] == 13
    assert model["inputs"] == ["board", "valid_actions"]
    assert model["outputs"] == ["pi", "v", "scdiffs"]

    boards, valids = _boards_valids(env_cfg)
    net = N.build_net(net_cfg)
    log_pi, v, log_sd = net.apply(
        {"params": params, "batch_stats": bs},
        jnp.asarray(boards), jnp.asarray(valids), False)

    pi_o, v_o, sd_o = onnx_mini.run_model(
        model, {"board": boards, "valid_actions": valids})
    # tolerances cover accumulation-order drift between XLA and numpy
    # matmuls on ~+-5-scale logits (wider at nn_version=2's 256 trunk)
    np.testing.assert_allclose(pi_o, np.asarray(log_pi), atol=1e-3)
    np.testing.assert_allclose(v_o, np.asarray(v), atol=1e-4)
    np.testing.assert_allclose(sd_o, np.asarray(log_sd), atol=1e-3)
    # masked actions carry (log-)probability ~ -inf scale, valid ones don't
    assert (pi_o[~valids] < -1e6).all()


def test_onnx_export_cli(tmp_path):
    """cli/export.py --format onnx end-to-end from a saved checkpoint."""
    from alphazero_tpu.cli import export as EX
    from alphazero_tpu.utils import checkpoint as CKPT

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    CKPT.save_checkpoint(str(tmp_path), "best.pt", params=params,
                         batch_stats=bs,
                         meta={"num_players": 2, "nn_version": 1})
    out = str(tmp_path / "model.onnx")
    rc = EX.main([str(tmp_path / "best.pt"), "-o", out, "--format", "onnx"])
    assert rc == 0
    model = onnx_mini.load_model(out)
    assert model["outputs"] == ["pi", "v", "scdiffs"]
    boards, valids = _boards_valids(env_cfg, n=4)
    pi_o, _, _ = onnx_mini.run_model(
        model, {"board": boards, "valid_actions": valids})
    assert np.isfinite(pi_o[valids]).all()
