"""True multi-process jax.distributed test (SURVEY §4: multi-host tests on
CPU meshes): two OS processes, 4 virtual devices each, one 8-device global
mesh, host-local example exchange + GSPMD-sharded train step.  Numerics must
match the single-process 8-device run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = {**os.environ, "PYTHONPATH": ROOT,
           "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
         str(port), "2", str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-2000:]

    results = [json.load(open(o)) for o in outs]
    assert all(r["procs"] == 2 and r["devices"] == 8 for r in results)
    # both processes computed the same global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-5)

    # single-process 8-device reference for the same batch/params
    ref = _single_process_loss()
    assert results[0]["loss"] == pytest.approx(ref, abs=1e-4), \
        (results, ref)


def _single_process_loss():
    import jax
    import jax.numpy as jnp
    from alphazero_tpu.parallel import mesh as MP
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.train import trainer as TR

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    mesh = MP.make_mesh(8)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    state = MP.replicate(mesh, state)

    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states_all = np.asarray(jax.vmap(
        lambda k: E.initial_state(env_cfg, k))(keys))
    valids_all = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(states_all))
    pi_all = (valids_all / np.maximum(
        valids_all.sum(-1, keepdims=True), 1)).astype(np.float32)
    batch = MP.shard_batch(mesh, {
        "boards": jnp.asarray(states_all),
        "pi": jnp.asarray(pi_all),
        "winner": jnp.tile(jnp.array([1.0, -1.0], jnp.float32), (B, 1)),
        "scdiff": jnp.zeros((B, 2), jnp.int8),
        "valids": jnp.asarray(valids_all),
    })
    train_cfg = TR.TrainConfig(batch_size=B, epochs=1, augment=False)
    step = MP.make_sharded_train_step(env_cfg, net_cfg, train_cfg, mesh)
    _, metrics = step(state, batch, jnp.float32(1e-3), jnp.float32(10.0),
                      MP.replicate(mesh, jax.random.PRNGKey(2)))
    return float(metrics["loss"])
