"""Driver for the golden-scale LT artifact (500 sims, k=10000/n=12000).

CPU backend forced via jax.config (env-var selection is overridden by
the site PJRT plugin). Run:  python scripts/lt_golden_run.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from ldpc_decoders_tpu.fountain import lt

if __name__ == "__main__":
    lt.main(["10000", "12000", "0.01", "0.5", "500",
             "--data_dir", "artifacts/data", "--seed", "7", "--batch", "50"])
