"""Regenerate the remaining Margulis(2640,1320) ADMM goldens: BEC and
biAWGN sweeps (reference simulations.py:63-72; committed goldens
{bec,biawgn}-margulis-ADMM-1-3.0-1e-05.json). BSC was produced in
round 1. max_words bounds the deep-tail points to roughly the goldens'
own budget (bec stops at eps=.375 after 183k words, biawgn at 2.5 dB
after 378k)."""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(format="%(asctime)s|%(name)s|%(message)s", level=logging.INFO)

from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig

_BEC = [.5, .475, .45, .425, .4, .375]
_AWGN = [.5, .75, 1., 1.25, 1.5, 1.75, 2., 2.25, 2.5]

data_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "data")
t00 = time.time()
for channel, params in [("bec", _BEC), ("biawgn", _AWGN)]:
    t0 = time.time()
    cfg = RunConfig(channel, "margulis", "ADMM", params, codeword=1,
                    max_iter=100, min_wec=100, batch=1024, log_freq=30,
                    max_words=600_000, data_dir=data_dir)
    MonteCarloRunner(cfg).run()
    print("CASE %s margulis ADMM done in %.1f s"
          % (channel, time.time() - t0), flush=True)
print("TOTAL WALL %.1f s" % (time.time() - t00), flush=True)
