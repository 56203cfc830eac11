"""Device-mesh sharding for self-play and learning.

The reference is single-process by design (README.md:112-115 rejects
multiprocessing).  The TPU framework scales instead via SPMD: a ``Mesh`` over
ICI with logical axes

    'env'  — self-play environments / replay batch (data parallel)

Self-play states, MCTS trees and training minibatches shard over 'env';
parameters are replicated.  Gradient reduction is expressed by jit + sharding
annotations (GSPMD inserts the psum over ICI).  Multi-host extends the same
mesh via jax.distributed (axes spanning DCN) without code changes here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..games.splendor import env as E
from ..models import splendor_net as N
from ..train import trainer as TR


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "env"):
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_train_step(env_cfg: E.SplendorConfig, net_cfg: N.NetConfig,
                            train_cfg: TR.TrainConfig, mesh: Mesh,
                            axis: str = "env"):
    """The full training step jitted over the mesh: batch sharded on ``axis``,
    replicated params, automatic psum of gradients by GSPMD."""
    base_step = TR.make_train_step(env_cfg, net_cfg, train_cfg)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    batch_sh = {k: data for k in ("boards", "pi", "winner", "scdiff", "valids")}
    # sharding pytree prefixes: replicated train state / lr / vl-weight /
    # key, sharded batch
    return jax.jit(
        base_step,
        in_shardings=(repl, batch_sh, repl, repl, repl),
        donate_argnums=(0,),
    )


def make_sharded_selfplay_step(env_cfg: E.SplendorConfig, mesh: Mesh,
                               axis: str = "env"):
    """One env-sharded vectorized step: [B] boards distributed over the mesh."""
    data = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def step_batch(states, actions, uniforms):
        return jax.vmap(
            lambda s, a, u: E.step(env_cfg, s, a, 0, u, False)
        )(states, actions, uniforms)

    return jax.jit(step_batch,
                   in_shardings=(data, data, data),
                   out_shardings=(data, data))


def make_sharded_valid_fn(env_cfg: E.SplendorConfig, mesh: Mesh,
                          axis: str = "env"):
    data = NamedSharding(mesh, P(axis))
    return jax.jit(jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0)),
                   in_shardings=(data,), out_shardings=data)
