"""Regression lock for the bf16 child-pointer corruption (root cause of the
runs/r3-r4 "root counts for a different state" TPU corruption).

``_backprop_fused`` computes the N/W backup as a bf16 one-hot einsum on TPU
(``_mm_dtype``).  The sign-packed child-pointer install value ``±slot``
(negative iff terminal; round 5 — previously ``slot + 0.5*term``) must NOT
pass through that einsum whole: bfloat16 has a 7-bit mantissa, so above 256
it cannot represent odd integers (257.0 -> 256.0 == a pointer to the WRONG
node).  Any tree with capacity > 256 nodes — e.g. num_sims >= 256, or tree
reuse at num_sims >= 128 (M = 2S+1) — silently followed corrupt pointers
during descent, crediting visits/values to unrelated states.

These tests force ``_mm_dtype`` to bfloat16 (as on TPU) on the CPU backend
and drive ``_backprop_fused`` directly at large slot ids: installs must be
bit-exact.  The CPU dot thunk cannot execute BF16xBF16=F32, so the test
shims ``einsum`` to upcast its operands to f32 — the same exact-accumulate
semantics the TPU MXU provides for exactly-representable bf16 inputs; every
``.astype(bfloat16)`` cast (the actual corruption mechanism) still happens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.search import mcts as M


class _JnpBf16Shim:
    """Proxy for jax.numpy whose einsum upcasts array operands to float32."""

    def __getattr__(self, name):
        return getattr(jnp, name)

    @staticmethod
    def einsum(*args, **kwargs):
        kwargs.pop("preferred_element_type", None)
        args = tuple(a.astype(jnp.float32)
                     if isinstance(a, jax.Array) and a.dtype == jnp.bfloat16
                     else a for a in args)
        return jnp.einsum(*args, preferred_element_type=jnp.float32,
                          **kwargs)


@pytest.fixture
def bf16_tpu_semantics(monkeypatch):
    monkeypatch.setattr(M, "_mm_dtype", lambda: jnp.bfloat16)
    monkeypatch.setattr(M, "jnp", _JnpBf16Shim())


@pytest.mark.parametrize("slot,term", [(255, True), (256, True), (257, False),
                                       (511, False), (300, True)])
def test_child_pointer_install_exact_large_tree(bf16_tpu_semantics, slot,
                                                term):
    B, Mcap, A, P = 2, 600, 9, 2
    A2 = A + 2
    tree = M.Tree(
        states=jnp.zeros((B, Mcap, 3, 7), jnp.int8),
        stats=jnp.zeros((B, Mcap, 4, A2), jnp.float32)
             .at[:, :, M._PVALID, :A].set(-1.0),
        parent=jnp.zeros((B, Mcap), jnp.int32),
    )
    S = 4                                     # path-buffer width
    path_p = jnp.full((B, S), Mcap, jnp.int32)
    path_a = jnp.zeros((B, S), jnp.int32)
    path_r = jnp.zeros((B, S), jnp.int32)
    depth = jnp.zeros((B,), jnp.int32)
    parent = jnp.array([3, 7], jnp.int32)
    action = jnp.array([2, 5], jnp.int32)
    slot_b = jnp.array([slot, slot], jnp.int32)
    fresh = jnp.ones((B,), bool)
    child_term = jnp.array([term, term])
    out = M._backprop_fused(
        tree, path_p, path_a, path_r, depth,
        value_vec=jnp.zeros((B, P)), leaf_rot=jnp.zeros((B,), jnp.int32),
        parent=parent, action=action, fresh=fresh, slot_b=slot_b,
        pvalid_new=jnp.full((B, A), -1.0), child_term=child_term,
        child_rot=jnp.ones((B,), jnp.int32),
        leaf_init_v=jnp.zeros((B,)), term_vec=jnp.zeros((B, P)))
    want = -slot if term else slot              # sign-packed pointer
    got = np.asarray(out.stats)[np.arange(B), parent, M._CHILD, action]
    np.testing.assert_array_equal(got, np.full(B, want, np.float32))


def test_backup_counts_exact_at_deep_slots(bf16_tpu_semantics):
    """Edge/node visit increments stay exact (+1.0 per level) under the bf16
    einsum even at high path levels — the 0/1 weights and the f32
    accumulation (preferred_element_type) guarantee it."""
    B, Mcap, A, P = 1, 300, 5, 2
    A2 = A + 2
    tree = M.Tree(
        states=jnp.zeros((B, Mcap, 3, 7), jnp.int8),
        stats=jnp.zeros((B, Mcap, 4, A2), jnp.float32)
             .at[:, :, M._PVALID, :A].set(-1.0),
        parent=jnp.zeros((B, Mcap), jnp.int32),
    )
    S = 3
    path_p = jnp.array([[0, 259, 297]], jnp.int32)   # node ids > 256
    path_a = jnp.array([[1, 2, 3]], jnp.int32)
    path_r = jnp.zeros((B, S), jnp.int32)
    depth = jnp.array([3], jnp.int32)
    out = M._backprop_fused(
        tree, path_p, path_a, path_r, depth,
        value_vec=jnp.full((B, P), 0.5), leaf_rot=jnp.zeros((B,), jnp.int32),
        parent=jnp.array([297], jnp.int32), action=jnp.array([3], jnp.int32),
        fresh=jnp.ones((B,), bool), slot_b=jnp.array([298], jnp.int32),
        pvalid_new=jnp.full((B, A), -1.0),
        child_term=jnp.zeros((B,), bool),
        child_rot=jnp.zeros((B,), jnp.int32),
        leaf_init_v=jnp.zeros((B,)), term_vec=jnp.zeros((B, P)))
    s = np.asarray(out.stats)[0]
    for node, a in [(0, 1), (259, 2), (297, 3)]:
        assert s[node, M._EN, a] == 1.0        # edge N
        assert s[node, M._EN, A] == 1.0        # node Ns (two-hot column)
    assert s[297, M._CHILD, 3] == 298.0        # exact install
