"""Three-head Splendor network (policy / value / score-diff) in Flax.

Faithful re-implementation of the reference architecture
(SplendorNNet.py:56-159: global-pooling MLP trunk, masked log-softmax policy,
per-player tanh value, 31-bin score-diff distribution) as a JAX module, so
reference checkpoints can be weight-converted and parity-checked.  Inference
and training both run fully on device; there is no ONNX detour — batched
jitted forwards replace the reference's ORT session
(GenericNNetWrapper.py:283-324).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

LOW_VALUE = -1e8


@dataclasses.dataclass(frozen=True)
class NetConfig:
    nb_vect: int                 # rows of the observation (56 for 2 players)
    vect_dim: int = 7
    action_size: int = 409
    num_players: int = 2
    max_score_diff: int = 15
    dropout: float = 0.3
    nn_version: int = 1
    width: int = 128
    # computation dtype for the trunk matmuls ("float32" | "bfloat16");
    # params stay float32, heads/log-softmax always compute in float32.
    # bfloat16 halves HBM traffic per forward on TPU — intended for the
    # inference path (search leaf evals), not the train step.
    dtype: str = "float32"

    @property
    def num_scdiffs(self) -> int:
        return {2: 2, 3: 3, 4: 4}[self.num_players]

    @property
    def scdiff_size(self) -> int:
        return 2 * self.max_score_diff + 1


class DenseAndPartialGPool(nn.Module):
    """Split features: pool some groups (max+avg), dense the rest
    (reference SplendorNNet.py:6-28)."""
    output_length: int
    nb_groups: int
    nb_items: int
    use_bn: bool
    bn_axis: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, C, L)
        pool_len = self.nb_groups * self.nb_items
        dense_out = self.output_length - 2 * self.nb_groups
        g = x[..., :pool_len].reshape(*x.shape[:-1], self.nb_groups, self.nb_items)
        maxp = g.max(-1)
        avgp = g.mean(-1)
        d = nn.Dense(dense_out, dtype=self.dtype,
                     kernel_init=nn.initializers.kaiming_uniform())(
            x[..., pool_len:])
        if self.use_bn:
            d = nn.BatchNorm(use_running_average=not train, axis=self.bn_axis,
                             dtype=self.dtype)(d)
        d = nn.relu(d)
        return jnp.concatenate([maxp, avgp, d], axis=-1)


class FlattenAndPartialGPool(nn.Module):
    """Pool the first channels of the first features across the channel dim,
    flatten everything (reference SplendorNNet.py:31-53)."""
    length_to_pool: int
    nb_channels_to_pool: int

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L) -> (B, 1, F)
        b = x.shape[0]
        xb, xe = x[:, :, :self.length_to_pool], x[:, :, self.length_to_pool:]
        first = xb[:, :self.nb_channels_to_pool, :]
        last = xb[:, self.nb_channels_to_pool:, :]
        maxp = first.max(axis=1)
        avgp = first.mean(axis=1)
        out = jnp.concatenate(
            [maxp, avgp, last.reshape(b, -1), xe.reshape(b, -1)], axis=-1)
        return out[:, None, :]


class SplendorNet(nn.Module):
    """Trunk + PI/V/SDIFF heads (reference SplendorNNet.py:56-159)."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, boards, valid_actions, train: bool = False):
        """boards: (B, nb_vect, 7) float; valid_actions: (B, A) bool.
        Returns (log_pi (B,A), v (B,n), log_sdiff (B, num_scdiffs, 31))."""
        c = self.cfg
        w = c.width
        dt = jnp.dtype(c.dtype)
        kinit = nn.initializers.kaiming_uniform()
        drop = lambda y: nn.Dropout(c.dropout, deterministic=not train)(y)  # noqa: E731

        x = jnp.swapaxes(boards, -1, -2).astype(dt)  # (B, 7, nb_vect)
        x = nn.Dense(w, dtype=dt, kernel_init=kinit)(x)
        x = nn.BatchNorm(use_running_average=not train, axis=1, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x))

        x = drop(DenseAndPartialGPool(w, nb_groups=4, nb_items=8, use_bn=True,
                                      dtype=dt)(x, train))
        x = drop(nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x)))
        x = FlattenAndPartialGPool(length_to_pool=w // 2, nb_channels_to_pool=5)(x)

        x = drop(nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x)))
        x = drop(DenseAndPartialGPool(w, nb_groups=4, nb_items=4, use_bn=True,
                                      dtype=dt)(x, train))
        y = nn.Dense(w, dtype=dt, kernel_init=kinit)(x)
        y = nn.BatchNorm(use_running_average=not train, axis=1, dtype=dt)(y)
        x = nn.relu(y)
        x = nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x))
        x = drop(x)
        x = drop(DenseAndPartialGPool(w, nb_groups=4, nb_items=4, use_bn=True,
                                      dtype=dt)(x, train))

        x = x[:, 0, :].astype(jnp.float32)           # (B, w); f32 heads
        pi_h = nn.Dense(w, kernel_init=kinit)(x)     # Dense_6
        pi = nn.Dense(c.action_size, kernel_init=kinit)(pi_h)   # Dense_7
        v_h = nn.Dense(w, kernel_init=kinit)(x)      # Dense_8
        v = nn.Dense(c.num_players, kernel_init=kinit)(v_h)     # Dense_9
        sd_h = nn.Dense(w, kernel_init=kinit)(x)     # Dense_10
        sd = nn.Dense(c.num_scdiffs * c.scdiff_size,
                      kernel_init=kinit)(sd_h)       # Dense_11

        pi = jnp.where(valid_actions, pi, LOW_VALUE)
        log_pi = jax.nn.log_softmax(pi, axis=-1)
        value = jnp.tanh(v)
        log_sdiff = jax.nn.log_softmax(
            sd.reshape(-1, c.num_scdiffs, c.scdiff_size), axis=-1)
        return log_pi, value, log_sdiff


class SplendorNetV2(nn.Module):
    """TPU-optimized variant (nn_version=2): same three-head interface, wider
    trunk with pre-activation residual MLP blocks after the flatten.  This is
    this framework's own forward step on the version ladder; versions 0/1
    are the reference's retained architectures (SplendorNNet_prev_prev.py /
    SplendorNNet.py — their layer stacks are identical, the eras differ by
    action-space size, handled here by ``cfg.action_size``)."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, boards, valid_actions, train: bool = False):
        c = self.cfg
        w = max(c.width, 256)
        dt = jnp.dtype(c.dtype)
        kinit = nn.initializers.kaiming_uniform()
        drop = lambda y: nn.Dropout(c.dropout, deterministic=not train)(y)  # noqa: E731

        x = jnp.swapaxes(boards, -1, -2).astype(dt)  # (B, 7, nb_vect)
        x = nn.Dense(w, dtype=dt, kernel_init=kinit)(x)
        x = nn.BatchNorm(use_running_average=not train, axis=1, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x))
        x = drop(DenseAndPartialGPool(w, nb_groups=4, nb_items=8,
                                      use_bn=True, dtype=dt)(x, train))
        x = FlattenAndPartialGPool(length_to_pool=w // 2,
                                   nb_channels_to_pool=5)(x)
        x = x[:, 0, :]
        x = nn.relu(nn.Dense(w, dtype=dt, kernel_init=kinit)(x))
        for _ in range(2):                          # residual MLP blocks
            h = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
            h = nn.relu(h)
            h = nn.Dense(w, dtype=dt, kernel_init=kinit)(h)
            h = nn.relu(h)
            h = drop(nn.Dense(w, dtype=dt, kernel_init=kinit)(h))
            x = x + h
        x = x.astype(jnp.float32)                    # f32 heads

        pi_h = nn.Dense(w, kernel_init=kinit)(x)
        pi = nn.Dense(c.action_size, kernel_init=kinit)(pi_h)
        v_h = nn.Dense(w, kernel_init=kinit)(x)
        v = nn.Dense(c.num_players, kernel_init=kinit)(v_h)
        sd_h = nn.Dense(w, kernel_init=kinit)(x)
        sd = nn.Dense(c.num_scdiffs * c.scdiff_size, kernel_init=kinit)(sd_h)

        pi = jnp.where(valid_actions, pi, LOW_VALUE)
        log_pi = jax.nn.log_softmax(pi, axis=-1)
        value = jnp.tanh(v)
        log_sdiff = jax.nn.log_softmax(
            sd.reshape(-1, c.num_scdiffs, c.scdiff_size), axis=-1)
        return log_pi, value, log_sdiff


# nn_version registry (reference keeps _prev/_prev_prev architectures
# selectable via -V for warm starts and comparison, SplendorNNet.py:69,
# main.py:126).  Versions 0 and 1 share the reference layer stack — the eras
# differ by action-space size (366/406/409), which lives in cfg.action_size
# and is bridged by utils.checkpoint.transfer_partial /
# compat.torch_import.load_as_bundle.
NET_VERSIONS = {0: SplendorNet, 1: SplendorNet, 2: SplendorNetV2}


def build_net(cfg: NetConfig) -> nn.Module:
    try:
        return NET_VERSIONS[cfg.nn_version](cfg)
    except KeyError:
        raise ValueError(
            f"unknown nn_version {cfg.nn_version}; "
            f"registered: {sorted(NET_VERSIONS)}") from None


def init_params(cfg: NetConfig, key: jax.Array):
    """Returns (params, batch_stats)."""
    net = build_net(cfg)
    boards = jnp.zeros((2, cfg.nb_vect, cfg.vect_dim), jnp.float32)
    valids = jnp.ones((2, cfg.action_size), jnp.bool_)
    variables = net.init({"params": key, "dropout": key}, boards, valids, False)
    return variables["params"], variables.get("batch_stats", {})


def apply_inference(cfg: NetConfig, params, batch_stats, boards, valid_actions):
    """Eval-mode forward. boards (B, nb_vect, 7) float32, valids (B, A) bool.
    Returns (pi probs, v, log_sdiff)."""
    net = build_net(cfg)
    log_pi, v, log_sd = net.apply(
        {"params": params, "batch_stats": batch_stats},
        boards, valid_actions, False)
    return jnp.exp(log_pi), v, log_sd


def apply_train(cfg: NetConfig, params, batch_stats, boards, valid_actions,
                dropout_key):
    """Train-mode forward; returns ((log_pi, v, log_sdiff), new_batch_stats)."""
    net = build_net(cfg)
    out, mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        boards, valid_actions, True,
        rngs={"dropout": dropout_key}, mutable=["batch_stats"])
    return out, mutated["batch_stats"]


def count_params(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
