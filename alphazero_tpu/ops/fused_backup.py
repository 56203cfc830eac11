"""Pallas TPU kernel: fused MCTS backup into the stats array.

Computes, in ONE pass over ``stats [B, M, 4, A]`` (lane order PVALID, CHILD,
EN, EW — see search/mcts.py):

    stats[b, path_p[b,s], EN, path_a[b,s]] += w[b, s, 0]   (visit increments)
    stats[b, path_p[b,s], EW, path_a[b,s]] += w[b, s, 1]   (value backups)
    stats[b, parent[b],  CHILD, action[b]] += child_val[b] (fresh-child install)
    stats[b, slot[b], PVALID, :]           += pv_row[b]    (expanded prior row)

The XLA fallback (mcts._backprop_fused) materializes the one-hot operands,
the [B, M, 4, A] delta, and the sum in HBM — ~1.7 GB of traffic per
simulation at B=1024, S=64, A=409.  This kernel streams stats tiles through
VMEM (in+out ~872 MB), builds the one-hots in VMEM from the path indices,
and runs the [S, M]^T x [S, A] contraction per board tile on the MXU in
bfloat16 (counts <= S and |values| <= 1 are exact / well-conditioned there;
accumulation is f32).

Grid: one program per tile of TB boards; stats blocks are aliased
input->output so the pipeline is a pure read-modify-write stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane indices — keep in sync with search/mcts.py
_PVALID, _CHILD, _EN, _EW = 0, 1, 2, 3


def _kernel(slot_ref, path_p_ref, path_a_ref, w_ref, child_p_ref,
            child_a_ref, child_v_ref, pv_ref, stats_ref, out_ref):
    TB, M, _, A = stats_ref.shape
    S1 = path_p_ref.shape[1]
    mmt = jnp.bfloat16

    pp = path_p_ref[:]                                   # [TB, S1] i32
    pa = path_a_ref[:]                                   # [TB, S1] i32
    w = w_ref[:]                                         # [TB, S1, 2] f32

    # one-hots in VMEM (drop sentinel: pp == M compares false everywhere).
    # Broadcasts that insert a minor dim must stay 32-bit on Mosaic, so all
    # shaping happens in f32 with a final cast to bf16 for the MXU.
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (TB, S1, M), 2)
    onehot_p = (iota_m == pp[:, :, None]).astype(jnp.float32)  # [TB, S1, M]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (TB, S1, A), 2)
    onehot_a = (iota_a == pa[:, :, None]).astype(jnp.float32)  # [TB, S1, A]

    # [TB*2, S1, A]: per-lane scaled action one-hots (Mosaic matmul allows
    # at most one batch dim, so (board, lane) fold into one)
    va = (onehot_a[:, None, :, :] * jnp.transpose(
        w, (0, 2, 1))[:, :, :, None]).reshape(TB * 2, S1, A).astype(mmt)
    lhs = jnp.broadcast_to(onehot_p[:, None], (TB, 2, S1, M))\
        .reshape(TB * 2, S1, M).astype(mmt)
    delta = jax.lax.dot_general(
        lhs, va,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(TB, 2, M, A)

    # per-lane ref writes (static lane index — no scatter)
    out_ref[:, :, _PVALID, :] = stats_ref[:, :, _PVALID, :]
    out_ref[:, :, _CHILD, :] = stats_ref[:, :, _CHILD, :]
    out_ref[:, :, _EN, :] = stats_ref[:, :, _EN, :] + delta[:, 0]
    out_ref[:, :, _EW, :] = stats_ref[:, :, _EW, :] + delta[:, 1]

    # expanded node's prior row (per-board slot once trees are reused across
    # moves) + fresh-child install: masked full-row RMW per board (the
    # minor/lane dim cannot take an unaligned dynamic index on Mosaic)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
    for b in range(TB):
        sl = slot_ref[b, 0]
        prow = out_ref[b, pl.ds(sl, 1), _PVALID, :]          # [1, A]
        out_ref[b, pl.ds(sl, 1), _PVALID, :] = prow + pv_ref[b][None, :]

        cp = child_p_ref[b, 0]
        ca = child_a_ref[b, 0]
        cv = child_v_ref[b, 0]

        @pl.when(cv != 0.0)
        def _():
            row = out_ref[b, pl.ds(cp, 1), _CHILD, :]        # [1, A]
            hit = (iota_row == ca).astype(jnp.float32)
            out_ref[b, pl.ds(cp, 1), _CHILD, :] = row + hit * cv


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def fused_backup(stats, path_p, path_a, w, child_p, child_a, child_v,
                 pv_row, slot, tile_b: int = 8, interpret: bool = False):
    """stats' = stats + path/edge/child/prior-row updates (see module doc).

    stats    [B, M, 4, A] f32 (donated / aliased to the output)
    path_p   [B, S1] i32 — node per level, M = drop sentinel
    path_a   [B, S1] i32 — action per level
    w        [B, S1, 2] f32 — (EN increment, EW value) per level
    child_p  [B] i32, child_a [B] i32, child_v [B] f32 — fresh-child install
             (child_v == 0 -> skip)
    pv_row   [B, A] f32 — added to stats[b, slot[b], PVALID, :]
    slot     [B] i32 — per-board expanded-node id
    """
    B, M, L, A = stats.shape
    assert L == 4 and B % tile_b == 0
    grid = (B // tile_b,)

    def ix_b(i):
        return (i, 0)

    def ix_b3(i):
        return (i, 0, 0)

    def ix_stats(i):
        return (i, 0, 0, 0)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1), ix_b, memory_space=pltpu.SMEM),  # slot
            pl.BlockSpec((tile_b, path_p.shape[1]), ix_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, path_a.shape[1]), ix_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, w.shape[1], 2), ix_b3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), ix_b, memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, 1), ix_b, memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, 1), ix_b, memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, A), ix_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, M, 4, A), ix_stats,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, M, 4, A), ix_stats,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(stats.shape, stats.dtype),
        input_output_aliases={8: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(slot, jnp.int32), (B,))[:, None],
      path_p, path_a, w,
      child_p[:, None], child_a[:, None], child_v[:, None], pv_row, stats)
