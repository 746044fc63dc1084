"""Regenerate IREG_ENS artifacts: all 10 vendored irregular members
(1200_rho_x5_rand_ldpc_*), BEC SPA, codeword=0, max_iter=100, min_wec=100
-- the exact configuration of the reference's committed member goldens
(data/output/bec-1200_rho_x5_rand_ldpc_*-SPA-0-100.json). One compiled
chunk, members rotated through it (runner.rotate_member)."""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(format="%(asctime)s|%(name)s|%(message)s", level=logging.INFO)

from ldpc_decoders_tpu.harness import RunConfig
from ldpc_decoders_tpu.harness.runner import run_rotating_members

EPS = [.5, .475, .45, .425, .4, .375, .35, .34, .33, .325, .32, .31, .3]
members = [f"1200_rho_x5_rand_ldpc_{i}" for i in range(1, 11)]
data_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "data")
cfg = RunConfig("bec", members[0], "SPA", EPS, codeword=0, max_iter=100,
                min_wec=100, batch=4096, log_freq=30, data_dir=data_dir)
t0 = time.time()
res = run_rotating_members(cfg, members)
print("TOTAL WALL %.1f s" % (time.time() - t0), flush=True)
for m, r in res.items():
    print(m, {p: round(v["wer"], 4) for p, v in r.items()}, flush=True)
