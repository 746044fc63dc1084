"""ldpc_decoders_tpu — a TPU-native LDPC decoding and Monte-Carlo channel
simulation framework (JAX / XLA / Pallas / pjit).

Capability-equivalent to the reference research codebase
``thadikari/ldpc_decoders`` (numpy/scipy, one codeword at a time on CPU),
re-designed TPU-first:

- parity-check matrices compile to static edge-index gather tables
  (:mod:`ldpc_decoders_tpu.ops.graph`), so belief propagation runs as batched
  fixed-shape tensor programs over thousands of codewords at once;
- channel sampling, LLR initialisation, syndrome checks and early termination
  all run in-graph under ``jit`` with explicit ``jax.random`` keys;
- the ADMM decoder's parity-polytope Euclidean projection is a batched
  fixed-degree kernel (:mod:`ldpc_decoders_tpu.ops.projection`);
- multi-chip scaling uses a ``jax.sharding.Mesh`` with codeword batches
  sharded over devices and error tallies combined with ``psum``
  (:mod:`ldpc_decoders_tpu.parallel`).

Reference parity map (file:line cites point into the reference repo):
see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"

from ldpc_decoders_tpu.codes import Code, get_code, get_code_names  # noqa: F401
