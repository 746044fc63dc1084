"""Margulis(2640,1320) ADMM artifacts at the goldens' configuration.

The reference's committed margulis ADMM goldens
(``{bec,bsc,biawgn}-margulis-ADMM-1-3.0-1e-05.json``, oldest Saver
vintage: decoder-codeword-mu-eps) ran UNLIMITED iterations — determined
empirically: our max_iter=0 (run-to-convergence) reproduces both probe
anchors (bsc p=0.07: 0.270 vs golden 0.275; p=0.06: 0.0068 vs 0.0084)
while caps 10/30/100 are far off (1.0 / 0.53 / 0.020 at p=0.06).
Matches the reference's READ_ADMM.txt --max-iter=-1 usage.

Deep-tail points are budget-capped (max_words) — the goldens' deepest
(bsc p=0.05: WER 1e-5 over 606k words) gets a 400k-word budget here.

iter_cap=8000 is LOAD-BEARING at the waterfall points: margulis ADMM
words can converge after thousands of iterations, and the default 2000
safety bound scores them as errors (bec eps=0.4 WER doubles to 0.0158;
the 48c743e artifacts were generated at 8000 but the setting was never
recorded here — round 4 restores it).
"""
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
print("health matmul:", float((x @ x).sum()), "%.1f s" % (time.time() - t0),
      flush=True)

from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig

data_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "data")

CASES = [
    ("bsc", [.1, .09, .08, .07, .06, .05], 400_000),
    ("biawgn", [.5, .75, 1., 1.25, 1.5, 1.75, 2., 2.25, 2.5], 400_000),
    ("bec", [.5, .475, .45, .425, .4, .375], 200_000),
]
for channel, params, mw in CASES:
    t1 = time.time()
    cfg = RunConfig(channel, "margulis", "ADMM", params, codeword=1,
                    max_iter=0, min_wec=100, batch=2048, log_freq=30,
                    max_words=mw, data_dir=data_dir, iter_cap=8000)
    MonteCarloRunner(cfg).run()
    print("MAR ADMM %s done in %.1f s" % (channel, time.time() - t1),
          flush=True)
print("ALL_DONE", flush=True)
