"""Checkpoint I/O with embedded training settings.

Mirrors the reference's checkpoint richness (GenericNNetWrapper.py:185-260,
Coach.py:144-162): rolling best/temp files, per-iteration snapshots, training
args embedded (`additional_keys`), and a shape-sliced partial weight transfer
for cross-architecture warm starts."""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(folder: str, filename: str, *, params, batch_stats,
                    opt_state=None, meta: dict | None = None):
    os.makedirs(folder, exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "meta": meta or {},
        "format": "alphazero_tpu.v1",
    }
    path = os.path.join(folder, filename)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(folder: str, filename: str) -> dict:
    path = os.path.join(folder, filename)
    with open(path, "rb") as f:
        return pickle.load(f)


def _shapes_match(loaded_params, target_params) -> bool:
    try:
        la = jax.tree_util.tree_leaves(loaded_params)
        ta = jax.tree_util.tree_leaves(target_params)
        return (len(la) == len(ta)
                and all(np.shape(a) == np.shape(b) for a, b in zip(la, ta)))
    except Exception:
        return False


def load_network(folder: str, filename: str, target_params=None,
                 fallback: bool = True) -> dict:
    """Robust checkpoint load chain (reference load_network,
    GenericNNetWrapper.py:215-260): strict load when every leaf shape matches
    the target -> shape-sliced partial transfer across architectures -> with
    ``fallback``, sibling checkpoints (temp.pt / best.pt / newest
    checkpoint_N.pt) when the requested file is missing or unreadable.
    Pass ``fallback=False`` for user-requested resumes, where silently
    loading a different network would hide a typoed path.

    Returns the checkpoint dict with ``params`` already reconciled against
    ``target_params`` (when given) and a ``load_mode`` key in
    {"strict", "partial"} plus ``load_source`` (the file actually used)."""
    import logging
    log = logging.getLogger(__name__)

    candidates = [filename]
    if fallback:
        for alt in ("temp.pt", "best.pt"):
            if alt != filename:
                candidates.append(alt)
        try:
            iters = sorted(
                (f for f in os.listdir(folder)
                 if f.startswith("checkpoint_") and f.endswith(".pt")),
                key=lambda f: -int("".join(filter(str.isdigit, f)) or 0))
            candidates.extend(f for f in iters if f not in candidates)
        except OSError:
            pass

    last_err = None
    for cand in candidates:
        path = os.path.join(folder, cand)
        if not os.path.exists(path):
            continue
        try:
            ckpt = load_checkpoint(folder, cand)
        except Exception as e:          # corrupt/truncated file: keep walking
            log.warning("checkpoint %s unreadable (%s); trying next", path, e)
            last_err = e
            continue
        if cand != filename:
            log.warning("requested checkpoint %s unavailable; loaded %s",
                        filename, cand)
        if target_params is None or _shapes_match(ckpt["params"],
                                                  target_params):
            ckpt["load_mode"] = "strict"
        else:
            log.warning("architecture mismatch: shape-sliced partial weight "
                        "transfer (reference GenericNNetWrapper.py:215-242)")
            ckpt["params"] = transfer_partial(ckpt["params"], target_params)
            ckpt["load_mode"] = "partial"
        ckpt["load_source"] = cand
        return ckpt
    raise FileNotFoundError(
        f"no loadable checkpoint in {folder!r} "
        f"(tried {candidates!r})") from last_err


def transfer_partial(loaded_params, target_params):
    """Min-shape sliced copy per leaf: grow/shrink architectures while keeping
    overlapping weights (reference load_not_strict,
    GenericNNetWrapper.py:215-242)."""
    l_paths = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_flatten_with_path(loaded_params)[0]}

    def merge(path, tgt):
        key = jax.tree_util.keystr(path)
        if key not in l_paths:
            return tgt
        src = np.asarray(l_paths[key])
        tgt_np = np.asarray(tgt)
        if src.shape == tgt_np.shape:
            return src.astype(tgt_np.dtype)
        if src.ndim != tgt_np.ndim:
            return tgt
        out = tgt_np.copy()
        slices = tuple(slice(0, min(a, b)) for a, b in zip(src.shape, out.shape))
        out[slices] = src[slices]
        return out

    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    merged = [merge(p, v) for p, v in flat]
    return jax.tree_util.tree_unflatten(treedef, merged)


def save_settings(folder: str, settings: dict):
    """settings.txt snapshot + diff support (reference main.py:53-80).

    ``settings.json`` always holds the CURRENT settings; when a resume
    changes them, the superseded version is preserved as ``settings_vN.json``
    (monotone N) so a multi-segment run stays auditable — nothing is
    silently overwritten.  Identical re-saves (the common crash-restart
    case) write nothing new."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, "settings.json")
    new_text = json.dumps(settings, indent=2, default=str)
    if os.path.exists(path):
        with open(path) as f:
            old_text = f.read()
        if old_text == new_text:
            return
        n = 1
        while os.path.exists(os.path.join(folder, f"settings_v{n}.json")):
            n += 1
        os.replace(path, os.path.join(folder, f"settings_v{n}.json"))
    with open(path, "w") as f:
        f.write(new_text)


def compare_settings(folder: str, settings: dict,
                     ignore=("checkpoint_dir", "num_iters", "load_from")) -> dict:
    path = os.path.join(folder, "settings.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        prev = json.load(f)
    diff = {}
    for k in set(prev) | set(settings):
        if k in ignore:
            continue
        a, b = prev.get(k), settings.get(k)
        if json.dumps(a, default=str) != json.dumps(b, default=str):
            diff[k] = (a, b)
    return diff


def save_code_snapshot(folder: str):
    """Record exactly what code produced a run (reference main.py:54-56 backs
    up *.py into the checkpoint dir; here: git revision + working-tree diff,
    falling back to an archive of the package when not in a git checkout)."""
    import subprocess
    os.makedirs(folder, exist_ok=True)
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        rev = subprocess.run(["git", "-C", pkg_root, "rev-parse", "HEAD"],
                             capture_output=True, text=True, check=True,
                             timeout=10).stdout.strip()
        diff = subprocess.run(["git", "-C", pkg_root, "diff", "HEAD"],
                              capture_output=True, text=True, check=True,
                              timeout=30).stdout
        with open(os.path.join(folder, "code_snapshot.txt"), "w") as f:
            f.write(f"revision: {rev}\n")
            if diff:
                f.write("--- uncommitted diff ---\n")
                f.write(diff)
        return
    except Exception:
        pass
    import tarfile
    pkg = os.path.join(pkg_root, "alphazero_tpu")
    with tarfile.open(os.path.join(folder, "code_snapshot.tar.gz"),
                      "w:gz") as tar:
        tar.add(pkg, arcname="alphazero_tpu",
                filter=lambda ti: None if "__pycache__" in ti.name else ti)
