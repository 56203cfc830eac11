"""alphazero_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX/XLA/pjit re-design with the capabilities of
kuboyoo/alphazero-general-ori (a heavily optimized Splendor AlphaZero fork):

- ``games.splendor``   fixed-shape, purely functional Splendor environment
                       (vmap-able over thousands of boards; chance nodes via
                       injected uniforms so search can collapse them).
- ``models``           three-head policy/value/score-diff network (Flax).
- ``search``           batched array-based MCTS (PUCT, FPU, Dirichlet noise,
                       playout-cap randomization, forced playouts + pruning).
- ``train``            self-play -> replay -> train -> arena-gate loop.
- ``eval``             arena match runner, baseline agents, Glicko-2 ratings.
- ``parallel``         device-mesh sharding (pjit / NamedSharding) for
                       env-sharded self-play and data-parallel learning.
"""

__version__ = "0.1.0"
