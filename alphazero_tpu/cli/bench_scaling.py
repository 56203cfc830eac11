"""Env-steps/s scaling benchmark over the device mesh (BASELINE config 5).

Measures the vectorized Splendor step throughput on 1 device vs all visible
devices (per-host), reporting scaling efficiency.  On a multi-host pod run
it under `jax.distributed` (alphazero_tpu.parallel.distributed.initialize);
each process reports its own shard throughput and process 0 prints the
global aggregate.

Usage:
    python -m alphazero_tpu.cli.bench_scaling [--batch-per-device 4096]
    # CPU demonstration of the sharding path:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m alphazero_tpu.cli.bench_scaling --steps 50
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..games.splendor import env as E
from ..parallel import distributed as D
from ..parallel import mesh as MP


def _throughput(env_cfg, mesh, batch, steps, seed=0):
    """Steps a [batch] board shard `steps` times inside one jitted scan."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(mesh, P("env"))

    def one(s, u):
        s2, _ = E.step(env_cfg, s, jnp.argmax(
            E.valid_moves(env_cfg, s, 0)).astype(jnp.int32), 0, u, False)
        return s2

    def run(states, keys):
        def body(s, k):
            u = jax.random.uniform(k, (states.shape[0], 2))
            return jax.vmap(one)(s, u), None
        return jax.lax.scan(body, states, keys)[0]

    run_j = jax.jit(run, in_shardings=(data, None), out_shardings=data)

    keys0 = jax.random.split(jax.random.PRNGKey(seed), batch)
    states = jax.device_put(
        jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys0), data)
    loop_keys = jax.random.split(jax.random.PRNGKey(seed + 1), steps)

    out = run_j(states, loop_keys)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_j(out, loop_keys)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--players", type=int, default=2)
    ap.add_argument("--distributed", action="store_true")
    args = ap.parse_args(argv)

    if args.distributed:
        D.initialize()
    env_cfg = E.SplendorConfig(num_players=args.players)

    import numpy as np
    from jax.sharding import Mesh
    one_dev = Mesh(np.array(jax.local_devices()[:1]), ("env",))
    full = D.make_pod_mesh()
    n = full.devices.size

    t1 = _throughput(env_cfg, one_dev, args.batch_per_device, args.steps)
    tn = _throughput(env_cfg, full, args.batch_per_device * n, args.steps)

    if D.is_primary():
        print(json.dumps({
            "metric": "env_steps_per_s",
            "devices": n,
            "one_device": round(t1, 1),
            "all_devices": round(tn, 1),
            "scaling_efficiency": round(tn / (t1 * n), 3),
        }))


if __name__ == "__main__":
    main()
