"""Round-5 diagnostic for the margulis ADMM cap-bound point (VERDICT r4
item 6): at BSC p=0.07 the factored fused kernel measured only 1.2x the
gather route (206 vs 175 w/s) where neighbors get 1.7-3.3x.

Measures, per route and operating point:
- warm decode throughput (2 timed runs after 2 warmups);
- the per-word executed-iteration distribution (quantiles + cap rate);
- the per-block(32) max-iteration mean — the block-granular early-exit
  cost the fused kernel actually pays vs the per-word oracle.

Run (background, generous timeout):
    python scripts/mar_admm_probe.py [--points 0.06 0.07] [--batch 2048]
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
    ap.add_argument("--points", nargs="*", type=float, default=[0.06, 0.07])
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--cap", type=int, default=2000)
    ap.add_argument("--routes", nargs="*", default=["pallas", "gather"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldpc_decoders_tpu.channels import bsc
    from ldpc_decoders_tpu.codes import get_code
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    code = get_code("margulis")
    B = args.batch
    x = jnp.ones((B, code.get_n()), jnp.int32)
    lines = []
    for p in args.points:
        key = jax.random.PRNGKey(42)
        y = bsc.send(key, x, p)
        llr = bsc.llr(y, p)
        for route in args.routes:
            # route "pallas+sort" = fused kernel with probe-and-sort;
            # "pallas" = fused kernel alone; "gather" = XLA route.
            perm, _, sort = route.partition("+")
            dec = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=0,
                              iter_cap=args.cap, perm=perm,
                              presort="on" if sort else "off")
            fn = jax.jit(dec.decode)
            for _ in range(2):              # compile + first-run slowness
                xh, it = fn(llr)
                jax.block_until_ready(xh)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                xh, it = fn(llr)
                jax.block_until_ready(xh)
                times.append(time.perf_counter() - t0)
            it = np.asarray(it)
            wec = int((np.asarray(xh) != 1).any(axis=1).sum())
            blocks = it.reshape(-1, 32)
            q = np.percentile(it, [50, 90, 99]).tolist()
            line = {
                "p": p, "route": route, "batch": B, "cap": args.cap,
                "wps": round(B / min(times), 1),
                "wall_s": [round(t, 2) for t in times],
                "wec": wec,
                "it_mean": round(float(it.mean()), 1),
                "it_q50_90_99": [round(v, 1) for v in q],
                "cap_rate": round(float((it >= args.cap).mean()), 4),
                "blockmax_mean": round(float(blocks.max(axis=1).mean()), 1),
            }
            lines.append(line)
            print(json.dumps(line), flush=True)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
