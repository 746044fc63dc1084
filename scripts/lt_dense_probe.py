"""Round-5 probe: golden-scale LT peeling through the dense MXU engine
(fountain/lt.py engine="dense" — per-sim 0/1 int8 G, peel rounds as two
batched int8 matmuls, zero dynamic gathers).

Context (ledgers): the sparse sorted-edge engine measures 4.93 s/sim on
the chip at batch 8 (lt_tpu_envelope.json) and collapses at batch 32
(36.9 s/sim, lt_batch_probe_r5.jsonl) — lane-axis dynamic gathers. The
4-core host does 4.5 s/sim. A golden-scale sim is ~700 peel rounds; the
dense engine's round is ~240 MB/sim of HBM matmul traffic, so the
roofline sits around 0.2-0.3 s/sim.

Run on the real chip (background, generous timeout):
    python scripts/lt_dense_probe.py --out artifacts/data/lt_dense_probe_r5.jsonl
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
    ap.add_argument("--batches", nargs="*", type=int, default=[8, 16])
    ap.add_argument("--seg", type=int, default=64)
    ap.add_argument("--k", type=int, default=10000)
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--c", type=float, default=0.01)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import wait_for_backend
    wait_for_backend()

    import numpy as np

    from ldpc_decoders_tpu.fountain.lt import LTSimulator

    lines = []
    for batch in args.batches:
        sim = LTSimulator(args.k, args.n, args.c, 0.5, seg_iters=args.seg,
                          engine="dense")
        rng = np.random.default_rng(0)
        t0 = time.time()
        res, _, _ = sim.run(rng, batch)        # compile + warm
        cold = time.time() - t0
        # Timed run separates host sampling from device peel: the CLI
        # overlaps sampling with the previous batch's decode, so the
        # steady-state rate is max(sample, decode), not their sum.
        tables = sim.sample_batch(rng, batch)
        t0 = time.time()
        res, _, _ = map(np.asarray, sim.simulate(tables))
        dt = time.time() - t0
        vals = [int(r) for r in res]
        line = {"k": args.k, "c": args.c, "batch": batch,
                "seg_iters": args.seg, "engine": "dense",
                "cold_wall_s": round(cold, 1),
                "warm_decode_wall_s": round(dt, 1),
                "s_per_sim_decode": round(dt / batch, 3),
                "mean": float(np.mean(vals))}
        lines.append(line)
        print(json.dumps(line), flush=True)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
