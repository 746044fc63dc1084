"""Margulis def_cases artifacts (reference simulations.py:64-72 MAR runs
`exc_def_cases('margulis')` besides the ADMM sweeps): BEC SPA / BSC
MSA+SPA / biAWGN MSA+SPA at cap 10, min_wec 100. No committed reference
goldens exist for these; budgets bound the deep tails."""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(format="%(asctime)s|%(name)s|%(message)s",
                    level=logging.INFO)

import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices(), flush=True)
x = jnp.ones((128, 128))
print("health:", float((x @ x).sum()), "%.1f s" % (time.time() - t0),
      flush=True)

from ldpc_decoders_tpu.campaign import def_cases
from ldpc_decoders_tpu.harness import MonteCarloRunner

data_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "data")

for cfg in def_cases("margulis"):
    t1 = time.time()
    cfg.batch = 2048
    cfg.max_words = 300_000
    cfg.log_freq = 30
    cfg.data_dir = data_dir
    MonteCarloRunner(cfg).run()
    print("MARDEF %s %s done in %.1f s"
          % (cfg.channel, cfg.decoder, time.time() - t1), flush=True)
print("ALL_DONE", flush=True)
