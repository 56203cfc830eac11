"""Round-5 training-dynamics levers: gate_mode="always" (no-rollback
acceptance, breaking the N>2 gate deadlock observed in runs/r8_3p iters
27-52 and runs/r10_4p) and the value-loss-weight warmup against the N>2
value-head collapse (vl_weight enters the jitted step as a traced scalar).
Reference gate semantics anchor: Coach.py:152-162."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.train import trainer as TR
from alphazero_tpu.train.coach import Coach, CoachConfig, completed_iterations


def _tiny_cfg(tmp_path, **kw):
    base = dict(num_players=2, num_iters=1, games_per_iter=4,
                selfplay_batch=4, num_sims=8, ratio_full=2, prob_full=0.5,
                arena_games=4, gate_num_sims=6, epochs=1, batch_size=8,
                train_chunk_steps=0, checkpoint_dir=str(tmp_path), seed=1)
    base.update(kw)
    return CoachConfig(**base)


def test_gate_mode_always_accepts_and_keeps_trained_params(tmp_path):
    cfg = _tiny_cfg(tmp_path, gate_mode="always",
                    update_threshold=1.01)   # bar impossible to clear
    coach = Coach(cfg)
    before = jax.tree_util.tree_map(np.asarray, coach.train_state.params)
    seen = {}

    def cb(it, sp, metrics, gate, accept):
        seen["accept"] = accept

    coach.learn(on_iteration=cb)
    # always-mode: accepted even though the bar is unclearable, best.pt
    # written, and the trained (not rolled-back) params are live
    assert seen["accept"]
    assert os.path.exists(tmp_path / "best.pt")
    after = jax.tree_util.tree_map(np.asarray, coach.train_state.params)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(before),
                 jax.tree_util.tree_leaves(after))]
    assert max(diffs) > 0, "params should NOT have been rolled back"

    # the metrics record still carries the raw bar verdict
    rec = [json.loads(line) for line in
           open(tmp_path / "metrics.jsonl") if line.strip()][-1]
    assert rec["accepted"] is True
    assert rec["gate_mode"] == "always"
    assert rec["gate_passed_bar"] is False


def test_gate_mode_threshold_rolls_back(tmp_path):
    cfg = _tiny_cfg(tmp_path, gate_mode="threshold", update_threshold=1.01)
    coach = Coach(cfg)
    before = jax.tree_util.tree_map(np.asarray, coach.train_state.params)
    coach.learn()
    after = jax.tree_util.tree_map(np.asarray, coach.train_state.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)  # rolled back to pre-train


def test_vl_warmup_scales_value_loss(tmp_path):
    # two fits from identical state/batches: vl_scale=0.1 must produce a
    # smaller total loss contribution than vl_scale=1.0 (same v MSE, scaled
    # weight), and metrics must record the scale
    cfg = _tiny_cfg(tmp_path, vl_warmup_iters=10)
    coach = Coach(cfg)
    sp = coach.self_play_iteration()
    assert sp["examples"] > 0
    m1 = coach.train_iteration(it=1)     # scale = 1/10
    assert m1["vl_scale"] == 0.1
    m10 = coach.train_iteration(it=10)   # scale = 1.0
    assert m10["vl_scale"] == 1.0
    assert "v_out_std" in m1 and "v_out_absmean" in m1


def test_traced_vl_weight_changes_loss_without_recompile():
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    tcfg = TR.TrainConfig(batch_size=4, epochs=1, augment=False)
    step = TR.make_train_step(env_cfg, net_cfg, tcfg)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    boards = jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys)
    valids = jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0))(boards)
    pi = valids.astype(np.float32)
    pi = pi / pi.sum(-1, keepdims=True)
    batch = {"boards": np.asarray(boards), "pi": np.asarray(pi),
             "winner": np.tile([1.0, -1.0], (B, 1)).astype(np.float32),
             "scdiff": np.zeros((B, 2), np.int8), "valids": np.asarray(valids)}

    def loss_at(vlw):
        st = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
        _, m = step(st, {k: jnp.asarray(v) for k, v in batch.items()},
                    jnp.float32(1e-3), jnp.float32(vlw),
                    jax.random.PRNGKey(2))
        return float(m["loss"]), float(m["v"])

    l_hi, v_hi = loss_at(10.0)
    l_lo, v_lo = loss_at(0.5)
    assert abs(v_hi - v_lo) < 1e-6          # same v MSE either way
    np.testing.assert_allclose(l_hi - l_lo, 9.5 * v_hi, rtol=1e-4)


def test_completed_iterations_tolerates_malformed_lines(tmp_path):
    path = tmp_path / "metrics.jsonl"
    path.write_text('{"iter": 3}\n'
                    '{"iter": null}\n'
                    '[1, 2]\n'
                    '"just a string"\n'
                    '{"iter": {"nested": 1}}\n'
                    '{"iter": 5}\n'
                    'not json at all\n')
    assert completed_iterations(str(tmp_path)) == 5
    from alphazero_tpu.cli.train_resilient import completed_iters
    assert completed_iters(str(tmp_path)) == 5
