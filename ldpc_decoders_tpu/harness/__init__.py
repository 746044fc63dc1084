"""Monte-Carlo experiment harness: sweep runner, adaptive termination,
result persistence and logging (reference L4, src/main.py:10-51 +
utils.py Saver/loggers)."""

from ldpc_decoders_tpu.harness.runner import (  # noqa: F401
    MonteCarloRunner,
    RunConfig,
    run_rotating_members,
)
from ldpc_decoders_tpu.harness.saver import Saver  # noqa: F401
