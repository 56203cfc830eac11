"""Reference-checkpoint import: load genbu.pt and verify the JAX forward
matches an independently reconstructed torch forward on the same inputs
(BASELINE config 2's network-parity gate)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alphazero_tpu.games.splendor import env as E  # noqa: E402
from alphazero_tpu.games.splendor import adapter as A  # noqa: E402
from alphazero_tpu.models import splendor_net as N  # noqa: E402
from alphazero_tpu.compat import torch_import as TI  # noqa: E402

GENBU = "/root/reference/genbu.pt"


def _build_torch_model(sd):
    """Minimal torch reconstruction of the reference architecture
    (SplendorNNet.py:56-159) sized from the state_dict, for parity only."""
    import torch.nn as nn
    import torch.nn.functional as F

    nb_vect = sd["dense2d_1.0.weight"].shape[1]
    action_size = sd["output_layers_PI.1.weight"].shape[0]
    num_players = sd["output_layers_V.1.weight"].shape[0]
    sdiff_out = sd["output_layers_SDIFF.1.weight"].shape[0]

    class GPool(nn.Module):
        def __init__(self, length, out_len, groups, items, bn_ch):
            super().__init__()
            self.g, self.i = groups, items
            self.dense_in = length - groups * items
            self.dense_part = nn.Sequential(
                nn.Linear(self.dense_in, out_len - 2 * groups),
                nn.BatchNorm1d(bn_ch))
            self.maxpool = nn.MaxPool1d(items)
            self.avgpool = nn.AvgPool1d(items)

        def forward(self, x):
            gs = x.split([self.i] * self.g + [self.dense_in], -1)
            mx = [self.maxpool(y) for y in gs[:-1]]
            av = [self.avgpool(y) for y in gs[:-1]]
            d = F.relu(self.dense_part(gs[-1]))
            return torch.cat(mx + av + [d], -1)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.dense2d_1 = nn.Sequential(
                nn.Linear(nb_vect, 128), nn.BatchNorm1d(7), nn.ReLU(),
                nn.Linear(128, 128), nn.ReLU())
            self.partialgpool_1 = GPool(128, 128, 4, 8, 7)
            self.dense2d_3 = nn.Sequential(nn.Linear(128, 128), nn.ReLU())
            self.dense1d_4 = nn.Sequential(
                nn.Linear(64 * 4 + 64 * 7, 128), nn.ReLU())
            self.partialgpool_4 = GPool(128, 128, 4, 4, 1)
            self.dense1d_5 = nn.Sequential(
                nn.Linear(128, 128), nn.BatchNorm1d(1), nn.ReLU(),
                nn.Linear(128, 128), nn.ReLU())
            self.partialgpool_5 = GPool(128, 128, 4, 4, 1)
            self.output_layers_PI = nn.Sequential(
                nn.Linear(128, 128), nn.Linear(128, action_size))
            self.output_layers_V = nn.Sequential(
                nn.Linear(128, 128), nn.Linear(128, num_players))
            self.output_layers_SDIFF = nn.Sequential(
                nn.Linear(128, 128), nn.Linear(128, sdiff_out))

        def forward(self, x, valid):
            x = x.transpose(-1, -2)
            x = self.dense2d_1(x)
            x = self.partialgpool_1(x)
            x = self.dense2d_3(x)
            # FlattenAndPartialGPool(64, 5)
            xb, xe = x[:, :, :64], x[:, :, 64:]
            first, last = xb[:, :5, :], xb[:, 5:, :]
            mx = first.max(dim=1).values
            av = first.mean(dim=1)
            x = torch.cat([mx, av, last.flatten(1), xe.flatten(1)], 1)
            x = x.unsqueeze(1)
            x = self.dense1d_4(x)
            x = self.partialgpool_4(x)
            x = self.dense1d_5(x)
            x = self.partialgpool_5(x)
            x = x[:, 0, :]
            pi = self.output_layers_PI(x)
            v = self.output_layers_V(x)
            sd_ = self.output_layers_SDIFF(x)
            pi = torch.where(valid, pi, torch.tensor(-1e8))
            return (F.log_softmax(pi, dim=1), torch.tanh(v), sd_)

    m = Model()
    missing = m.load_state_dict(
        {k: v for k, v in sd.items() if k != "lowvalue"}, strict=False)
    assert not missing.missing_keys, missing.missing_keys
    m.eval()
    return m, nb_vect, action_size


@pytest.fixture(scope="module")
def loaded():
    ck = TI.torch_load_tolerant(GENBU)
    return ck


def test_checkpoint_meta(loaded):
    assert loaded["numPlayers"] == 2
    assert "numMCTSSims" in loaded


def test_forward_parity_vs_torch(loaded):
    sd = loaded["state_dict"]
    tmodel, nb_vect, ref_actions = _build_torch_model(sd)

    env_cfg = E.SplendorConfig(num_players=2)
    assert env_cfg.rows == nb_vect
    net_cfg = A.net_config_for(env_cfg)
    params, stats, meta = TI.load_as_bundle(GENBU, net_cfg)

    # real board inputs
    B = 6
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    boards = np.asarray(jax.vmap(lambda k: E.initial_state(env_cfg, k))(keys),
                        np.float32)
    valids409 = np.asarray(
        jax.vmap(lambda s: E.valid_moves(env_cfg, jnp.asarray(s, jnp.int8), 0)
                 )(jnp.asarray(boards, jnp.int8)))

    # torch model works in the 406 space: map valids (405 moves + pass)
    valids406 = np.zeros((B, ref_actions), bool)
    valids406[:, :405] = valids409[:, :405]
    valids406[:, 405] = valids409[:, 408]

    with torch.no_grad():
        t_logpi, t_v, _ = tmodel(torch.from_numpy(boards),
                                 torch.from_numpy(valids406))
    j_probs, j_v, _ = N.apply_inference(net_cfg, params, stats,
                                        jnp.asarray(boards),
                                        jnp.asarray(valids409))
    j_probs, j_v = np.asarray(j_probs), np.asarray(j_v)
    t_probs = np.exp(t_logpi.numpy())

    np.testing.assert_allclose(j_v, t_v.numpy(), atol=2e-4)
    np.testing.assert_allclose(j_probs[:, :405], t_probs[:, :405], atol=2e-4)
    np.testing.assert_allclose(j_probs[:, 408], t_probs[:, 405], atol=2e-4)
    # noble-select logits are untrained but masked invalid anyway
    assert j_probs[:, 405:408].max() < 1e-6
