"""Round-5 probe: can a larger TPU batch push golden-scale LT peeling
past the 4-core host (4.5 s/sim) without a dedicated Pallas kernel?
HEAD already measures 4.93 s/sim at batch 8 (lt_tpu_envelope.json) —
the batch axis amortizes the per-segment dispatch + gather latency, and
unlike the host (which loses beyond batch 8 to cache pressure) the chip
has HBM headroom: the [B, E] planes at k=10000 are ~8.5 MB per batch
row group.

Run (background, generous timeout):
    python scripts/lt_batch_probe.py [--batches 16 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="*", type=int, default=[16, 32])
    ap.add_argument("--seg", type=int, default=64)
    ap.add_argument("--k", type=int, default=10000)
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import wait_for_backend
    wait_for_backend()

    import numpy as np

    from ldpc_decoders_tpu.fountain.lt import LTSimulator

    lines = []
    for batch in args.batches:
        # Pinned to the sparse engine: this probe documents the sorted-
        # edge formulation's batch-scaling collapse (its ledger predates
        # the dense engine, which "auto" now selects on TPU).
        sim = LTSimulator(args.k, args.n, 0.01, 0.5, seg_iters=args.seg,
                          engine="sparse")
        rng = np.random.default_rng(0)
        res, _, _ = sim.run(rng, batch)        # compile + warm
        t0 = time.time()
        res, _, _ = sim.run(rng, batch)
        dt = time.time() - t0
        vals = [int(r) for r in res]
        line = {"k": args.k, "batch": batch, "seg_iters": args.seg,
                "warm_wall_s": round(dt, 1),
                "s_per_sim": round(dt / batch, 2),
                "mean": float(np.mean(vals))}
        lines.append(line)
        print(json.dumps(line), flush=True)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
