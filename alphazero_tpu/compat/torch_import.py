"""Import reference PyTorch checkpoints into the JAX network.

The reference saves ``{'state_dict': ..., 'full_model': <pickled nn.Module>,
**training_args}`` (GenericNNetWrapper.py:185-198).  Unpickling the
full_model requires the reference's class definitions; we stub any
non-torch class with a generic placeholder so the tensors in ``state_dict``
load cleanly, then map them onto the Flax parameter tree of
models.splendor_net.SplendorNet.
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np


class _Stub:
    """Placeholder for unpicklable (reference-only) classes."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state


def torch_load_tolerant(path: str) -> dict:
    """torch.load that substitutes stubs for missing classes."""
    import torch

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    class _PickleModule:
        Unpickler = TolerantUnpickler

        @staticmethod
        def load(f, **kw):
            kw.pop("encoding", None)
            return TolerantUnpickler(f).load()

        @staticmethod
        def loads(b, **kw):
            return TolerantUnpickler(io.BytesIO(b)).load()

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleModule)


# torch state_dict key -> (flax path, kind)
# kinds: 'linear_w' (transpose), 'linear_b', 'bn_scale', 'bn_bias',
#        'bn_mean', 'bn_var'
def _mapping() -> list[tuple[str, tuple[str, ...], str]]:
    m: list[tuple[str, tuple[str, ...], str]] = []

    def linear(tk, fk):
        m.append((tk + ".weight", fk + ("kernel",), "linear_w"))
        m.append((tk + ".bias", fk + ("bias",), "linear_b"))

    def bn(tk, fk):
        m.append((tk + ".weight", fk + ("scale",), "bn"))
        m.append((tk + ".bias", fk + ("bias",), "bn"))
        m.append((tk + ".running_mean", fk + ("mean",), "bn_stat"))
        m.append((tk + ".running_var", fk + ("var",), "bn_stat"))

    linear("dense2d_1.0", ("Dense_0",))
    bn("dense2d_1.1", ("BatchNorm_0",))
    linear("dense2d_1.3", ("Dense_1",))
    linear("partialgpool_1.dense_part.0", ("DenseAndPartialGPool_0", "Dense_0"))
    bn("partialgpool_1.dense_part.1", ("DenseAndPartialGPool_0", "BatchNorm_0"))
    linear("dense2d_3.0", ("Dense_2",))
    linear("dense1d_4.0", ("Dense_3",))
    linear("partialgpool_4.dense_part.0", ("DenseAndPartialGPool_1", "Dense_0"))
    bn("partialgpool_4.dense_part.1", ("DenseAndPartialGPool_1", "BatchNorm_0"))
    linear("dense1d_5.0", ("Dense_4",))
    bn("dense1d_5.1", ("BatchNorm_1",))
    linear("dense1d_5.3", ("Dense_5",))
    linear("partialgpool_5.dense_part.0", ("DenseAndPartialGPool_2", "Dense_0"))
    bn("partialgpool_5.dense_part.1", ("DenseAndPartialGPool_2", "BatchNorm_0"))
    linear("output_layers_PI.0", ("Dense_6",))
    linear("output_layers_PI.1", ("Dense_7",))
    linear("output_layers_V.0", ("Dense_8",))
    linear("output_layers_V.1", ("Dense_9",))
    linear("output_layers_SDIFF.0", ("Dense_10",))
    linear("output_layers_SDIFF.1", ("Dense_11",))
    return m


def _set_path(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_reference_checkpoint(path: str, net_cfg) -> tuple[dict, dict, dict]:
    """Returns (params, batch_stats, meta) for models.splendor_net.SplendorNet.

    Mapped weights must match the target shapes exactly except the PI output
    layer, which is min-size sliced to support the reference's action-space
    growth checkpoints (SplendorNNet.py:161-169)."""
    ckpt = torch_load_tolerant(path)
    sd = ckpt["state_dict"]
    params: dict = {}
    stats: dict = {}
    for tkey, fpath, kind in _mapping():
        if tkey not in sd:
            raise KeyError(f"missing torch key {tkey}")
        w = np.asarray(sd[tkey].detach().numpy(), np.float32)
        if kind == "linear_w":
            w = w.T
        if kind == "bn_stat":
            _set_path(stats, ("BatchNorm_0",) * 0 + fpath, w)
        else:
            _set_path(params, fpath, w)
    # batch_stats live under the same module paths
    meta = {k: v for k, v in ckpt.items()
            if k not in ("state_dict", "full_model")}
    return params, stats, meta


def load_as_bundle(path: str, net_cfg):
    """Load a reference .pt and return (params, batch_stats) matching
    init_params' structure, padding/truncating the PI head if action sizes
    differ."""
    import jax
    import jax.numpy as jnp
    from ..models import splendor_net as N

    ref_params, ref_stats, meta = import_reference_checkpoint(path, net_cfg)
    tgt_params, tgt_stats = N.init_params(net_cfg, jax.random.PRNGKey(0))

    def merge(tgt, src):
        out = {}
        for k, v in tgt.items():
            if k not in src:
                out[k] = v
                continue
            s = src[k]
            if isinstance(v, dict):
                out[k] = merge(v, s)
            else:
                tv = np.asarray(v)
                sv = np.asarray(s)
                if sv.shape == tv.shape:
                    out[k] = jnp.asarray(sv)
                elif 406 in sv.shape and 409 in tv.shape:
                    # 406-era PI head: actions 0-404 + pass at 405.  In the
                    # 409 space pass moved to 408 (405-407 = noble select).
                    buf = tv.copy()
                    if sv.ndim == 1:
                        buf[:405] = sv[:405]
                        buf[408] = sv[405]
                    else:                       # kernel (in, out)
                        buf[:, :405] = sv[:, :405]
                        buf[:, 408] = sv[:, 405]
                    out[k] = jnp.asarray(buf)
                else:
                    buf = tv.copy()
                    sl = tuple(slice(0, min(a, b))
                               for a, b in zip(sv.shape, tv.shape))
                    buf[sl] = sv[sl]
                    out[k] = jnp.asarray(buf)
        return out

    params = merge(jax.tree_util.tree_map(np.asarray, tgt_params), ref_params)
    stats = merge(jax.tree_util.tree_map(np.asarray, tgt_stats), ref_stats)
    return params, stats, meta
