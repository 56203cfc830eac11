"""Learning smoke: the full pipeline (self-play -> replay -> trainer) makes
the network learn real search targets.

Full statistical learning curves (rising arena winrate vs random/greedy over
training iterations) need TPU-scale self-play and live in docs/LEARNING.md
with the committed run artifacts; this test asserts the learning MECHANISM
deterministically at CPU scale: training on one iteration of genuine
self-play examples (a) monotonically drives the policy loss down across
epochs and (b) teaches the value head to predict game outcomes the untrained
net knows nothing about — the distillation step at the heart of the
reference loop (Coach.py:102-162, GenericNNetWrapper.py:43-139)."""

import jax
import numpy as np

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.train import selfplay as SP
from alphazero_tpu.train import trainer as TR
from alphazero_tpu.train.replay import ReplayBuffer


def test_policy_distillation_on_selfplay_data():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, width=64, dropout=0.0)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))

    sp_cfg = SP.SelfPlayConfig(batch_size=16, num_sims=32, ratio_full=4,
                               prob_full=0.5, temp_threshold=8,
                               forced_playouts=True)
    eng = SP.SelfPlayEngine(env_cfg, A.make_eval_fn(net_cfg), sp_cfg)
    it, stats = eng.run_games((params, bs), jax.random.PRNGKey(1),
                              np.random.default_rng(0))
    assert stats["examples"] > 300

    # stored policy targets must sit entirely on valid actions
    pi = np.asarray(it.pi, np.float32)
    valids = np.asarray(it.valids)
    assert float((pi * ~valids).sum()) < 1e-4

    replay = ReplayBuffer(history=1)
    replay.add_iteration(it)

    train_cfg = TR.TrainConfig(learn_rate=1e-3, batch_size=64, epochs=24,
                               augment=True)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(2))
    step = TR.make_train_step(env_cfg, net_cfg, train_cfg)

    epoch_pi = []
    state, _ = TR.fit(state, step, replay, train_cfg,
                      np.random.default_rng(1), jax.random.PRNGKey(3),
                      on_epoch_end=lambda e, st, m: epoch_pi.append(m["pi"]))

    # (a) the policy loss falls substantially over training
    assert epoch_pi[-1] < epoch_pi[0] * 0.8, epoch_pi

    # (b) the value head learned to predict outcomes.  Evaluate with batch
    # statistics (train-mode forward, dropout 0): at this step count the
    # BatchNorm running averages have not converged, so inference-mode
    # outputs would test the wrong thing.
    boards = jax.numpy.asarray(np.asarray(it.boards, np.float32)[:256])
    v_mask = jax.numpy.asarray(valids[:256])
    winner = np.asarray(it.winner, np.float32)[:256]

    def value_corr(p, b_stats):
        (_, val, _), _ = N.apply_train(net_cfg, p, b_stats, boards, v_mask,
                                       jax.random.PRNGKey(0))
        return float((np.asarray(val) * winner).mean())

    corr_trained = value_corr(state.params, state.batch_stats)
    corr_untrained = value_corr(params, bs)
    assert corr_trained > 0.5, (corr_trained, corr_untrained)
    assert corr_trained > corr_untrained + 0.3, (corr_trained, corr_untrained)
