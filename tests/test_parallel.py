"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the SPMD path of BASELINE configs 4-5: sharded self-play stepping,
sharded training step numerics vs single-device, and the host-local <->
global array plumbing used for multi-host example exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.parallel import distributed as D
from alphazero_tpu.parallel import mesh as MP
from alphazero_tpu.train import trainer as TR

ENV_CFG = E.SplendorConfig(num_players=2)


def _batch_states(b, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), b)
    return jax.vmap(lambda k: E.initial_state(ENV_CFG, k))(keys)


def test_pod_mesh_covers_all_devices():
    mesh = D.make_pod_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    mesh2 = D.make_2d_mesh()
    assert mesh2.devices.shape == (1, 8)   # 1 process in tests


def test_host_local_global_roundtrip():
    mesh = D.make_pod_mesh()
    local = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "y": np.ones((16,), np.int8)}
    glob = D.host_local_to_global(mesh, local)
    assert glob["x"].shape == (16, 2)
    assert glob["x"].sharding.spec == jax.sharding.PartitionSpec("env")
    back = D.global_to_host_local(glob)
    np.testing.assert_array_equal(back["x"], local["x"])
    np.testing.assert_array_equal(back["y"], local["y"])
    # single-process no-ops
    assert D.is_primary()
    D.sync_hosts()
    t = D.replicate_from_host0({"a": np.ones(3)})
    np.testing.assert_array_equal(t["a"], np.ones(3))


def test_sharded_selfplay_step_matches_local():
    mesh = D.make_pod_mesh()
    B = 16
    states = _batch_states(B)
    valids = jax.vmap(lambda s: E.valid_moves(ENV_CFG, s, 0))(states)
    actions = jnp.argmax(valids, axis=-1).astype(jnp.int32)
    uniforms = jax.random.uniform(jax.random.PRNGKey(1), (B, 2))

    step = MP.make_sharded_selfplay_step(ENV_CFG, mesh)
    s_sh, n_sh = step(MP.shard_batch(mesh, states),
                      MP.shard_batch(mesh, actions),
                      MP.shard_batch(mesh, uniforms))

    ref_s, ref_n = jax.vmap(
        lambda s, a, u: E.step(ENV_CFG, s, a, 0, u, False)
    )(states, actions, uniforms)
    np.testing.assert_array_equal(np.asarray(s_sh), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(n_sh), np.asarray(ref_n))


def test_sharded_train_step_matches_single_device():
    net_cfg = A.net_config_for(ENV_CFG)
    tcfg = TR.TrainConfig(batch_size=16, epochs=1, augment=False)
    mesh = D.make_pod_mesh()
    B = 16

    states = np.asarray(_batch_states(B))
    valids = np.asarray(jax.vmap(
        lambda s: E.valid_moves(ENV_CFG, jnp.asarray(s), 0))(states))
    pi = valids.astype(np.float32)
    pi /= np.maximum(pi.sum(-1, keepdims=True), 1)
    batch = {"boards": states, "pi": pi,
             "winner": np.tile([1.0, -1.0], (B, 1)).astype(np.float32),
             "scdiff": np.zeros((B, 2), np.int8), "valids": valids}

    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(3)

    state0 = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    ref_step = TR.make_train_step(ENV_CFG, net_cfg, tcfg)
    ref_state, ref_metrics = ref_step(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state0),
        {k: jnp.asarray(v) for k, v in batch.items()}, lr, jnp.float32(10.0),
        key)

    sh_step = MP.make_sharded_train_step(ENV_CFG, net_cfg, tcfg, mesh)
    glob = D.host_local_to_global(mesh, batch)
    sh_state, sh_metrics = sh_step(
        MP.replicate(mesh, jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), state0)),
        glob, MP.replicate(mesh, lr), MP.replicate(mesh, jnp.float32(10.0)),
        MP.replicate(mesh, key))

    assert np.isfinite(float(sh_metrics["loss"]))
    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    l_ref = jax.tree_util.tree_leaves(ref_state.params)
    l_sh = jax.tree_util.tree_leaves(sh_state.params)
    for a, b in zip(l_ref, l_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_2d_mesh_train_step_compiles():
    """(host, env) mesh: batch sharded over both axes jointly still trains."""
    net_cfg = A.net_config_for(ENV_CFG)
    tcfg = TR.TrainConfig(batch_size=16, epochs=1, augment=False)
    mesh = D.make_2d_mesh()
    B = 16
    states = np.asarray(_batch_states(B))
    valids = np.asarray(jax.vmap(
        lambda s: E.valid_moves(ENV_CFG, jnp.asarray(s), 0))(states))
    pi = valids.astype(np.float32)
    pi /= np.maximum(pi.sum(-1, keepdims=True), 1)
    batch = {"boards": states, "pi": pi,
             "winner": np.tile([1.0, -1.0], (B, 1)).astype(np.float32),
             "scdiff": np.zeros((B, 2), np.int8), "valids": valids}

    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(mesh, P(("host", "env")))
    repl = NamedSharding(mesh, P())
    base = TR.make_train_step(ENV_CFG, net_cfg, tcfg)
    step = jax.jit(base, in_shardings=(
        repl, {k: data for k in batch}, repl, repl, repl), donate_argnums=(0,))
    state0 = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    glob = {k: jax.device_put(jnp.asarray(v), data) for k, v in batch.items()}
    st, metrics = step(jax.device_put(state0, repl), glob,
                       jax.device_put(jnp.float32(1e-3), repl),
                       jax.device_put(jnp.float32(10.0), repl),
                       jax.device_put(jax.random.PRNGKey(3), repl))
    assert np.isfinite(float(metrics["loss"]))
