"""Checkpoint -> serialized inference artifact.

TPU-native replacement for the reference's ONNX export path
(chkpt_to_onnx.py:20-41, GenericNNetWrapper.py:283-324): instead of detouring
through ONNX Runtime for low-latency inference, the jitted forward pass is
serialized with ``jax.export`` (StableHLO) with a symbolic batch dimension,
so any JAX runtime (CPU/GPU/TPU) can reload and run it without the Python
model definition.

    python -m alphazero_tpu.cli.export temp/best.pt -o best.stablehlo
    python -m alphazero_tpu.cli.export temp/best.pt --check   # roundtrip test
"""

from __future__ import annotations

import argparse
import os


def export_checkpoint(checkpoint_path: str, out_path: str | None = None,
                      num_players: int = 2, batch: str | int = "b",
                      platforms=("cpu", "tpu")) -> bytes:
    """Serialize the checkpoint's inference fn; returns the bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..games.splendor import adapter as A
    from ..games.splendor import env as E
    from ..models import splendor_net as N
    from ..utils import checkpoint as CKPT

    ckpt = CKPT.load_checkpoint(os.path.dirname(checkpoint_path) or ".",
                                os.path.basename(checkpoint_path))
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"])
    env_cfg = E.SplendorConfig(num_players=num_players)
    net_cfg = A.net_config_for(env_cfg)

    def infer(boards, valids):
        probs, v, sd = N.apply_inference(net_cfg, params, stats, boards, valids)
        return probs, v, sd

    if isinstance(batch, str):
        (bdim,) = jexport.symbolic_shape(batch)
    else:
        bdim = batch
    R, C = env_cfg.observation_shape
    args = (jax.ShapeDtypeStruct((bdim, R, C), jnp.float32),
            jax.ShapeDtypeStruct((bdim, env_cfg.num_actions), jnp.bool_))
    exported = jexport.export(jax.jit(infer), platforms=list(platforms))(*args)
    blob = exported.serialize()
    if out_path:
        with open(out_path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path: str):
    """Reload a serialized artifact; returns ``fn(boards, valids)``."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("--numPlayers", "-np", type=int, default=2)
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare against the live net")
    args = p.parse_args(argv)

    out = args.out or (os.path.splitext(args.checkpoint)[0] + ".stablehlo")
    blob = export_checkpoint(args.checkpoint, out, args.numPlayers,
                             platforms=tuple(args.platforms.split(",")))
    print(f"wrote {out} ({len(blob)} bytes)")

    if args.check:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..games.splendor import env as E

        env_cfg = E.SplendorConfig(num_players=args.numPlayers)
        fn = load_exported(out)
        state = E.initial_state_jit(env_cfg, jax.random.PRNGKey(0))
        valid = E.valid_moves_jit(env_cfg, state, 0)
        probs, v, _ = fn(state.astype(jnp.float32)[None], valid[None])
        assert np.isfinite(np.asarray(probs)).all()
        print(f"roundtrip ok: value={np.asarray(v)[0].round(3).tolist()}")


if __name__ == "__main__":
    main()
