"""Checkpoint -> serialized inference artifact (StableHLO or ONNX).

Two formats:
- ``--format stablehlo`` (default): the TPU-native path — the jitted forward
  is serialized with ``jax.export`` (symbolic batch dimension), so any JAX
  runtime (CPU/GPU/TPU) reloads and runs it without the Python model.
- ``--format onnx``: the reference-ecosystem artifact
  (chkpt_to_onnx.py:20-41: inputs board/valid_actions, outputs
  pi/v/scdiffs, dynamic batch) for ORT consumers, emitted by the
  dependency-free writer in compat/onnx_export.py.

    python -m alphazero_tpu.cli.export temp/best.pt -o best.stablehlo
    python -m alphazero_tpu.cli.export temp/best.pt --format onnx -o best.onnx
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


def export_onnx_checkpoint(checkpoint_path: str, out_path: str,
                           num_players: int = 2,
                           nn_version: int | None = None) -> str:
    """ONNX-format export (reference chkpt_to_onnx.py contract)."""
    from ..compat.onnx_export import export_onnx
    from ..games.splendor import adapter as A
    from ..games.splendor import env as E
    from ..utils import checkpoint as CKPT

    ckpt = CKPT.load_checkpoint(os.path.dirname(checkpoint_path) or ".",
                                os.path.basename(checkpoint_path))
    meta = ckpt.get("meta", {})
    env_cfg = E.SplendorConfig(
        num_players=meta.get("num_players", num_players))
    net_cfg = A.net_config_for(
        env_cfg, nn_version=(nn_version if nn_version is not None
                             else meta.get("nn_version", 1)))
    return export_onnx(net_cfg, ckpt["params"], ckpt["batch_stats"], out_path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("--numPlayers", "-np", type=int, default=2)
    p.add_argument("--format", choices=("stablehlo", "onnx"),
                   default="stablehlo")
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare against the live net")
    args = p.parse_args(argv)

    if args.format == "onnx":
        out = args.out or (os.path.splitext(args.checkpoint)[0] + ".onnx")
        export_onnx_checkpoint(args.checkpoint, out, args.numPlayers)
        print(f"wrote {out} ({os.path.getsize(out)} bytes)")
        return 0

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
