"""Worker for the 2-process jax.distributed test (run via subprocess).

Usage: python multiproc_worker.py <coordinator_port> <num_procs> <pid> <out>

Each process owns 4 virtual CPU devices (global mesh = 8), contributes its
host-local half of a deterministic batch via host_local_to_global, runs the
GSPMD-sharded train step, and writes the loss + a broadcast/barrier probe to
<out> as JSON."""

import json
import os
import sys


def main():
    port, nprocs, pid, out = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    # distributed init must precede ANY backend use — including the jnp
    # constants some game modules lift at import time
    from alphazero_tpu.parallel import distributed as D
    assert D.initialize(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import numpy as np
    import jax.numpy as jnp
    from alphazero_tpu.parallel import mesh as MP
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.train import trainer as TR

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    mesh = D.make_pod_mesh()

    # identical params everywhere, exercised via the host-0 broadcast
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    state = state._replace(params=D.replicate_from_host0(state.params))
    state = MP.replicate(mesh, state)

    # deterministic global batch; this process contributes rows
    # [pid*B/2, (pid+1)*B/2) — the host-local example-exchange path
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states_all = np.asarray(jax.vmap(
        lambda k: E.initial_state(env_cfg, k))(keys))
    valids_all = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(states_all))
    pi_all = (valids_all / np.maximum(
        valids_all.sum(-1, keepdims=True), 1)).astype(np.float32)
    full = {
        "boards": states_all,
        "pi": pi_all,
        "winner": np.tile(np.array([1.0, -1.0], np.float32), (B, 1)),
        "scdiff": np.zeros((B, 2), np.int8),
        "valids": valids_all,
    }
    lo, hi = pid * B // nprocs, (pid + 1) * B // nprocs
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = D.host_local_to_global(mesh, local)

    train_cfg = TR.TrainConfig(batch_size=B, epochs=1, augment=False)
    step = MP.make_sharded_train_step(env_cfg, net_cfg, train_cfg, mesh)
    new_state, metrics = step(state, batch, jnp.float32(1e-3),
                              jnp.float32(10.0),
                              MP.replicate(mesh, jax.random.PRNGKey(2)))
    loss = float(metrics["loss"])

    # round-trip the sharded batch back to host-local and check our shard
    back = D.global_to_host_local({"boards": batch["boards"]})
    np.testing.assert_array_equal(back["boards"], local["boards"])

    D.sync_hosts("done")
    with open(out, "w") as f:
        json.dump({"pid": pid, "loss": loss,
                   "procs": jax.process_count(),
                   "devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
