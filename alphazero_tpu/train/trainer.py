"""Jitted training step: Adam + one-cycle LR, symmetry augmentation on device.

Mirrors the reference train loop semantics (GenericNNetWrapper.py:43-139):
random minibatches over the replay history, 4-term loss, Adam with a fresh
OneCycle schedule per train() call (optimizer moments persist across calls).
The whole step — augmentation, forward, backward, update — is one donated jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..games.splendor import env as E
from ..games.splendor import symmetry as SYM
from ..models import splendor_net as N
from . import losses as L


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learn_rate: float = 3e-4
    vl_weight: float = 10.0
    batch_size: int = 32
    epochs: int = 2
    augment: bool = True
    # fraction of the replay buffer held out for validation-loss tracking
    # (reference GenericNNetWrapper.py:108-137; 0 = off)
    val_split: float = 0.0
    max_val_examples: int = 4096


def init_train_state(net_cfg: N.NetConfig, key) -> TrainState:
    params, batch_stats = N.init_params(net_cfg, key)
    tx = optax.scale_by_adam()
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))


def reset_opt_state(state: TrainState) -> TrainState:
    """Fresh Adam moments for the current params.  Used by the NaN-rollback
    guard: after a non-finite loss the moments themselves are non-finite, so
    restoring params alone would diverge again on the next step."""
    tx = optax.scale_by_adam()
    return state._replace(opt_state=tx.init(state.params))


def _make_step_body(env_cfg: E.SplendorConfig, net_cfg: N.NetConfig,
                    cfg: TrainConfig):
    tx = optax.scale_by_adam()
    sym_fn = SYM.batched_random_symmetry(env_cfg) if cfg.augment else None

    def train_step(state: TrainState, batch, lr, vlw, key):
        # ``vlw`` is the value-loss weight as a TRACED scalar so a warmup
        # schedule (4P value-collapse mitigation) never retriggers a compile
        k_sym, k_drop = jax.random.split(key)
        boards, pi_t, valids = batch["boards"], batch["pi"], batch["valids"]
        if cfg.augment:
            boards, pi_t, valids = sym_fn(k_sym, boards, pi_t, valids)
        boards = boards.astype(jnp.float32)
        pi_t = pi_t.astype(jnp.float32)
        targets = {
            "pi": pi_t,
            "v": batch["winner"].astype(jnp.float32),
            "scdiff": L.scdiff_targets(batch["scdiff"].astype(jnp.int32),
                                       net_cfg.num_scdiffs,
                                       net_cfg.max_score_diff),
        }

        def loss_fn(params):
            outputs, new_bs = N.apply_train(net_cfg, params, state.batch_stats,
                                            boards, valids, k_drop)
            loss, metrics = L.total_loss(outputs, targets, vlw)
            return loss, (new_bs, metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, state.params, updates)
        return TrainState(new_params, new_bs, new_opt, state.step + 1), metrics

    return train_step


def make_train_step(env_cfg: E.SplendorConfig, net_cfg: N.NetConfig,
                    cfg: TrainConfig):
    return jax.jit(_make_step_body(env_cfg, net_cfg, cfg), donate_argnums=(0,))


def make_train_chunk(env_cfg: E.SplendorConfig, net_cfg: N.NetConfig,
                     cfg: TrainConfig, mesh=None, axis: str = "env"):
    """K minibatch updates fused into ONE jit via lax.scan.

    Each dispatch over the device tunnel costs ~25 ms; the reference's loop of
    per-minibatch torch steps (GenericNNetWrapper.py:66-99) maps poorly to
    that, so the TPU path stacks K sampled minibatches to (K, B, ...) host-side
    and scans the update body on device.  With a mesh, the batch axis (axis 1)
    shards over 'env' and GSPMD psums the grads exactly as the single-step
    path does.  Returns ``chunk(state, batches, lrs, key) -> (state, metrics)``
    with metrics averaged over the K steps."""
    body = _make_step_body(env_cfg, net_cfg, cfg)

    def chunk(state: TrainState, batches, lrs, vlw, key):
        keys = jax.random.split(key, lrs.shape[0])

        def scan_body(st, x):
            b, lr, k = x
            return body(st, b, lr, vlw, k)

        state, ms = jax.lax.scan(scan_body, state, (batches, lrs, keys))
        return state, jax.tree_util.tree_map(lambda x: jnp.mean(x), ms)

    if mesh is None:
        return jax.jit(chunk, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, axis))
    batch_sh = {k: data for k in ("boards", "pi", "winner", "scdiff", "valids")}
    return jax.jit(chunk, in_shardings=(repl, batch_sh, repl, repl, repl),
                   donate_argnums=(0,))


def make_eval_step(env_cfg: E.SplendorConfig, net_cfg: N.NetConfig,
                   cfg: TrainConfig):
    """Deterministic forward + loss on a held-out batch (no dropout, running
    batch-norm statistics, no update) — the validation probe of the reference
    train loop (GenericNNetWrapper.py:119-137)."""
    def eval_step(state: TrainState, batch):
        boards = batch["boards"].astype(jnp.float32)
        valids = batch["valids"]
        targets = {
            "pi": batch["pi"].astype(jnp.float32),
            "v": batch["winner"].astype(jnp.float32),
            "scdiff": L.scdiff_targets(batch["scdiff"].astype(jnp.int32),
                                       net_cfg.num_scdiffs,
                                       net_cfg.max_score_diff),
        }
        net = N.build_net(net_cfg)
        outputs = net.apply({"params": state.params,
                             "batch_stats": state.batch_stats},
                            boards, valids, False)
        _, metrics = L.total_loss(outputs, targets, cfg.vl_weight)
        return metrics

    return jax.jit(eval_step)


def onecycle_lr(step: int, total_steps: int, peak: float,
                pct_start: float = 0.3, div_factor: float = 25.0,
                final_div_factor: float = 1e4) -> float:
    """Host-side OneCycleLR with cosine annealing (torch defaults, matching
    the reference's scheduler at GenericNNetWrapper.py:54)."""
    total_steps = max(total_steps, 2)
    initial = peak / div_factor
    final = initial / final_div_factor
    up = max(int(pct_start * total_steps) - 1, 1)
    if step <= up:
        t = step / up
        return initial + (peak - initial) * 0.5 * (1 - np.cos(np.pi * t))
    t = min((step - up) / max(total_steps - up - 1, 1), 1.0)
    return final + (peak - final) * 0.5 * (1 + np.cos(np.pi * t))


def fit(train_state: TrainState, train_step_fn, replay, cfg: TrainConfig,
        rng: np.random.Generator, key, surprise_weight: bool = False,
        log_every: int = 0, eval_step_fn=None, on_epoch_end=None,
        train_chunk_fn=None, chunk_steps: int = 64, vl_scale: float = 1.0):
    """Run epochs x batches over the replay buffer (reference
    GenericNNetWrapper.train).  Returns (train_state, last metrics).

    With ``cfg.val_split`` > 0 and an ``eval_step_fn`` (make_eval_step), a
    random slice of the replay buffer is held out of training and its loss is
    reported per epoch as ``val_*`` metrics.  ``on_epoch_end(epoch,
    train_state, metrics)`` hooks the reference's intermediary checkpoints
    (GenericNNetWrapper.py:108-137)."""
    n = len(replay)
    allowed = None
    val_batch = None
    if cfg.val_split > 0 and eval_step_fn is not None and n >= 4:
        perm = rng.permutation(n)
        val_n = min(max(int(n * cfg.val_split), 1), cfg.max_val_examples,
                    n - 1)
        val_ids, allowed = perm[:val_n], perm[val_n:]
        val_batch = {k: jnp.asarray(v)
                     for k, v in replay.gather(np.sort(val_ids)).items()}
    pool = n if allowed is None else len(allowed)
    batch_count = max(pool // cfg.batch_size, 1)
    if train_chunk_fn is not None:
        # fused path: round each epoch to whole chunks so every dispatch has
        # a static (chunk_steps, batch_size, ...) shape — one compilation
        # regardless of how the replay pool grows between iterations
        chunks_per_epoch = max(int(round(batch_count / chunk_steps)), 1)
        batch_count = chunks_per_epoch * chunk_steps
    total = cfg.epochs * batch_count
    metrics = {}
    step_i = 0
    # effective value-loss weight this fit() call (vl_scale implements the
    # per-iteration warmup against N>2 value-head collapse)
    vlw = jnp.float32(cfg.vl_weight * vl_scale)
    for epoch in range(cfg.epochs):
        if train_chunk_fn is not None:
            for _ in range(chunks_per_epoch):
                batch_np = replay.sample(cfg.batch_size * chunk_steps, rng,
                                         surprise_weight=surprise_weight,
                                         allowed=allowed)
                batches = {
                    k: jnp.asarray(v.reshape((chunk_steps, cfg.batch_size)
                                             + v.shape[1:]))
                    for k, v in batch_np.items()}
                lrs = jnp.asarray(
                    [onecycle_lr(step_i + j, total, cfg.learn_rate)
                     for j in range(chunk_steps)], jnp.float32)
                key, sub = jax.random.split(key)
                train_state, metrics = train_chunk_fn(train_state, batches,
                                                      lrs, vlw, sub)
                step_i += chunk_steps
                if log_every and step_i % log_every < chunk_steps:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(f"  train step {step_i}/{total} "
                          f"loss={m['loss']:.4f} pi={m['pi']:.4f} "
                          f"v={m['v']:.4f}")
        else:
            for _ in range(batch_count):
                batch_np = replay.sample(cfg.batch_size, rng,
                                         surprise_weight=surprise_weight,
                                         allowed=allowed)
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                lr = onecycle_lr(step_i, total, cfg.learn_rate)
                key, sub = jax.random.split(key)
                train_state, metrics = train_step_fn(train_state, batch,
                                                     jnp.float32(lr), vlw,
                                                     sub)
                step_i += 1
                if log_every and step_i % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(f"  train step {step_i}/{total} "
                          f"loss={m['loss']:.4f} pi={m['pi']:.4f} "
                          f"v={m['v']:.4f}")
        metrics = {k: float(v) for k, v in metrics.items()}
        if val_batch is not None:
            vm = eval_step_fn(train_state, val_batch)
            metrics.update({f"val_{k}": float(v) for k, v in vm.items()})
        if on_epoch_end is not None:
            on_epoch_end(epoch, train_state, metrics)
    return train_state, metrics
