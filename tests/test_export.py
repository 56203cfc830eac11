"""Export/reload roundtrip for the StableHLO serving artifact (cli/export.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_export_roundtrip(tmp_path):
    from alphazero_tpu.cli import export as X
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.utils import checkpoint as CKPT

    env_cfg = E.SplendorConfig()
    net_cfg = A.net_config_for(env_cfg)
    params, stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    CKPT.save_checkpoint(str(tmp_path), "m.pt",
                         params=params, batch_stats=stats)

    out = str(tmp_path / "m.stablehlo")
    blob = X.export_checkpoint(str(tmp_path / "m.pt"), out,
                               platforms=("cpu",))
    assert len(blob) > 1000

    fn = X.load_exported(out)
    state = E.initial_state_jit(env_cfg, jax.random.PRNGKey(1))
    valid = E.valid_moves_jit(env_cfg, state, 0)
    for B in (1, 4):   # symbolic batch dim
        boards = jnp.repeat(state.astype(jnp.float32)[None], B, 0)
        valids = jnp.repeat(valid[None], B, 0)
        probs, v, sd = fn(boards, valids)
        ref_p, ref_v, ref_sd = N.apply_inference(net_cfg, params, stats,
                                                 boards, valids)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_p),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   rtol=1e-5, atol=1e-6)


def test_native_replay_core_roundtrip():
    """C++ replay core (native/replay_core.cpp) vs the zlib/numpy fallback."""
    import numpy as np
    from alphazero_tpu.utils import native

    data = np.random.default_rng(0).integers(0, 127, 10_000,
                                             dtype=np.int8).tobytes()
    c = native.compress(data, level=1)
    assert native.decompress(c, len(data)) == data
    if native.have_native():
        import zlib
        assert zlib.decompress(c) == data    # wire-format compatible
    ids = native.sample_uniform(1000, 64, seed=7)
    assert ids.shape == (64,) and ids.max() < 1000
    w = np.random.default_rng(1).random(1000).astype(np.float32)
    ids2 = native.sample_weighted(w, 64, seed=7)
    assert ids2.shape == (64,) and ids2.max() < 1000
