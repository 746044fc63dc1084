"""Regenerate every LLR-SPA artifact under inf_policy="reference".

The SPA decoder now reproduces the reference's float64 inf/NaN cascade
(see decoders/bp.py), which shifts SPA curves materially at low noise /
high caps. Affected committed artifacts (all codeword=0 except HMG):
  - REG ensemble members:  bsc/biawgn SPA cap 10
  - IREG ensemble members: bsc/biawgn SPA cap 100
  - flagship 1200_3_6_ldpc bsc/biawgn SPA cap sweeps {0,1,2,3,6,10,40,100}
  - HMG Hamming(7,4) bsc/biawgn SPA cap 10 (codeword=1, min_wec=300)
BEC artifacts use the ternary SPA (policy-independent) and stay.
Finishes by re-dumping the ensemble-average summary JSONs.
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

from ldpc_decoders_tpu.harness import RunConfig
from ldpc_decoders_tpu.harness.cap_sweep import CapSweepRunner
from ldpc_decoders_tpu.harness.runner import MonteCarloRunner, \
    run_rotating_members

_AWGN_SPA = [.5, .75, 1., 1.25, 1.5, 1.75, 2., 2.25, 2.5, 2.75, 3.]
_BSC_SPA = [.1, .09, .08, .07, .06, .05, .04]
FULL = [0, 1, 2, 3, 6, 10, 40, 100]
REG = [f"1200_3_6_rand_ldpc_{i}" for i in range(1, 11)]
IREG = [f"1200_rho_x5_rand_ldpc_{i}" for i in range(1, 11)]

data_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "data")
t00 = time.time()

# 1) ensemble member sets (rotating-member: one compile per case).
for members, channel, params, mi in [
        (REG, "bsc", _BSC_SPA, 10),
        (REG, "biawgn", _AWGN_SPA, 10),
        (IREG, "bsc", _BSC_SPA, 100),
        (IREG, "biawgn", _AWGN_SPA, 100)]:
    t1 = time.time()
    cfg = RunConfig(channel, members[0], "SPA", params, codeword=0,
                    max_iter=mi, min_wec=100, batch=4096, log_freq=30,
                    max_words=1_500_000, data_dir=data_dir)
    run_rotating_members(cfg, members)
    print("MEMBERS %s %s mi=%d done in %.1f s"
          % (members[0][:12], channel, mi, time.time() - t1), flush=True)

# 2) flagship cap sweeps.
for channel, params in [("bsc", _BSC_SPA), ("biawgn", _AWGN_SPA)]:
    t1 = time.time()
    cfg = RunConfig(channel, "1200_3_6_ldpc", "SPA", params, codeword=0,
                    min_wec=100, batch=2048, log_freq=30,
                    max_words=2_000_000, data_dir=data_dir)
    CapSweepRunner(cfg, FULL).run()
    print("CAPSWEEP %s SPA done in %.1f s" % (channel, time.time() - t1),
          flush=True)

# 3) HMG Hamming SPA (codeword=1: the cascade decides bit 0, which is
#    now sometimes WRONG — exactly like the reference).
for channel, params in [
        ("bsc", [.5, .4, .3, .2, .1, .08, .06, .04, .02, .25, .15, .01,
                 .008, .006, .004, .002]),
        ("biawgn", [2 + .5 * i for i in range(11)])]:
    t1 = time.time()
    cfg = RunConfig(channel, "7_4_hamming", "SPA", params, codeword=1,
                    max_iter=10, min_wec=300, batch=8192, log_freq=30,
                    max_words=3_000_000, data_dir=data_dir)
    MonteCarloRunner(cfg).run()
    print("HMG %s SPA done in %.1f s" % (channel, time.time() - t1),
          flush=True)

# 4) refresh ensemble-average summaries.
from ldpc_decoders_tpu.viz.ens_average import dump_average
for channel, prefix, dec in [
        ("bec", "1200_3_6_rand_ldpc", "SPA"),
        ("bsc", "1200_3_6_rand_ldpc", "SPA"),
        ("bsc", "1200_3_6_rand_ldpc", "MSA"),
        ("biawgn", "1200_3_6_rand_ldpc", "SPA"),
        ("biawgn", "1200_3_6_rand_ldpc", "MSA"),
        ("bec", "1200_rho_x5_rand_ldpc", "SPA"),
        ("bsc", "1200_rho_x5_rand_ldpc", "SPA"),
        ("bsc", "1200_rho_x5_rand_ldpc", "MSA"),
        ("biawgn", "1200_rho_x5_rand_ldpc", "SPA"),
        ("biawgn", "1200_rho_x5_rand_ldpc", "MSA")]:
    print("AVG", dump_average(data_dir, channel, prefix, dec), flush=True)

print("TOTAL WALL %.1f s" % (time.time() - t00), flush=True)
print("ALL_DONE", flush=True)
