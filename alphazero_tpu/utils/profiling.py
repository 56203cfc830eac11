"""Structured tracing/profiling (reference uses cProfile dumps,
main.py:82-100 / pit.py:205-221; here: jax.profiler + xprof op stats).

    with profiling.trace("./jax-trace"):
        run_one_iteration()
    profiling.print_top_ops("./jax-trace")
"""

from __future__ import annotations

import contextlib
import glob
import logging

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(trace_dir: str):
    """Capture a device trace viewable in xprof/tensorboard-profile."""
    with jax.profiler.trace(trace_dir):
        yield
    log.info("trace written to %s", trace_dir)


def top_ops(trace_dir: str, n: int = 20):
    """Top device ops by total self-time from the newest trace in
    ``trace_dir``: list of (total_us, occurrences, op_type, name).
    Requires the ``xprof`` package (present in the dev image); returns []
    with a warning otherwise."""
    try:
        import json

        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        log.warning("xprof not available — open the trace in tensorboard")
        return []
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        log.warning("no .xplane.pb under %s", trace_dir)
        return []
    data, _ = rtd.xspace_to_tool_data([files[-1]], "framework_op_stats",
                                      {"tqx": "out:json"})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    rows = obj[0]["rows"] if isinstance(obj, list) else obj["rows"]
    out = []
    for r in rows:
        c = r["c"]
        if c[1]["v"] == "Device":
            out.append((c[5]["v"], int(c[4]["v"]), c[2]["v"], c[3]["v"]))
    out.sort(reverse=True)
    return out[:n]


def print_top_ops(trace_dir: str, n: int = 20):
    ops = top_ops(trace_dir, n)
    if ops:
        print(f"{'total_us':>12} {'count':>7}  type / op")
    for tot, occ, typ, name in ops:
        print(f"{tot:>12,.0f} {occ:>7}  {typ:<22} {name[:90]}")
