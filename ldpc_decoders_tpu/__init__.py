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


def _enable_persistent_compile_cache() -> None:
    """Point jax at an on-disk compilation cache (measured: a fresh
    process re-running the benched fused-MSA program drops 24 s -> 10 s
    end-to-end; every campaign/CLI/bench process otherwise re-pays its
    ~15-150 s of TPU compiles). Respects an explicit user setting
    (``JAX_COMPILATION_CACHE_DIR`` env or prior ``jax.config`` update);
    opt out entirely with ``LDPC_TPU_XLA_CACHE=""``. The cache location
    defaults to ``~/.cache/ldpc_decoders_tpu/xla`` and jax's writer is
    concurrency-safe (atomic temp + rename), so parallel campaign
    processes can share it."""
    import os

    loc = os.environ.get("LDPC_TPU_XLA_CACHE")
    if loc == "" or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        path = loc or os.path.join(
            os.path.expanduser("~"), ".cache", "ldpc_decoders_tpu", "xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from ldpc_decoders_tpu.codes import Code, get_code, get_code_names  # noqa: F401
