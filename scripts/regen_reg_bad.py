"""Regenerate the REG_BAD iteration-cap grids (reference
simulations.py:74-77): every committed golden
``{channel}-1200_3_6_ldpc-{SPA,MSA}-<cap>-*.json`` cap variant, via
CapSweepRunner -- ONE decode pass per (channel, decoder) sweep tallies
every cap simultaneously, where the reference ran 40 cluster jobs.

Cap grids mirror the goldens exactly (bsc MSA has the odd
{60,90}-cap members and no converge run; the others are
{0,1,2,3,6,10,40,100} with 0 = run-to-convergence).
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(format="%(asctime)s|%(name)s|%(message)s", level=logging.INFO)

from ldpc_decoders_tpu.harness import RunConfig
from ldpc_decoders_tpu.harness.cap_sweep import CapSweepRunner

_BEC = [.5, .475, .45, .425, .4, .375, .35, .34, .33, .325, .32, .31, .3]
_BSC_MSA = [.081, .0751, .071, .0651, .061, .0551, .051, .0451, .041,
            .0351, .031, .0251, .021, .0151, .01]
_AWGN_MSA = [.5, .75, 1., 1.25, 1.5, 1.75, 2., 2.2, 2.3, 2.4, 2.5, 2.6,
             2.7, 2.8, 2.9, 3.0]
_AWGN_SPA = [.5, .75, 1., 1.25, 1.5, 1.75, 2., 2.25, 2.5, 2.75, 3.]
_BSC_SPA = [.1, .09, .08, .07, .06, .05, .04]
FULL = [0, 1, 2, 3, 6, 10, 40, 100]

CASES = [
    ("bec", "SPA", 0, _BEC, FULL),
    ("bsc", "SPA", 0, _BSC_SPA, FULL),
    ("bsc", "MSA", 1, _BSC_MSA, [1, 2, 3, 6, 10, 40, 60, 90, 100]),
    ("biawgn", "SPA", 0, _AWGN_SPA, FULL),
    ("biawgn", "MSA", 1, _AWGN_MSA, FULL),
]

data_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "data")
t00 = time.time()
for channel, dec, cw, params, caps in CASES:
    t0 = time.time()
    cfg = RunConfig(channel, "1200_3_6_ldpc", dec, params, codeword=cw,
                    min_wec=100, batch=2048, log_freq=30,
                    max_words=2_000_000, data_dir=data_dir)
    CapSweepRunner(cfg, caps).run()
    print("CASE %s %s done in %.1f s" % (channel, dec, time.time() - t0),
          flush=True)
print("TOTAL WALL %.1f s" % (time.time() - t00), flush=True)
