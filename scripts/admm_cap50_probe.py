"""Round-5 probe: can the flagship cap-50 ADMM recover block-max early
exit via a RESIDUAL-ranked presort? (docs/SCALING.md ADMM roofline
measured cheap *BP/channel* proxies recovering ~nothing of the 1.74x
oracle-sort bound and short-cap requeues netting negative; an ADMM
self-probe ranked by its own residual is the one untested key — the
margulis presort ranks by probe ITERATION COUNT, which separates
nothing at cap 50 where P(it <= 15) = 0.001.)

Method: on the flagship operating point (LDPC(1200,3,6), biAWGN 3 dB,
cap 50, batch 8192) compute each word's true iteration count (XLA
route, reference semantics), then replay fixed-depth unmasked ADMM
iterations capturing the convergence residual max(d1, d2) at probe
depths 4/8/12/16 (same updates as decoders/admm.py decode body,
admm.py:42-69 reference). For each key: mean over 64-word blocks of the
block max under that ordering — the fused kernel's early-exit granule —
and the NET factor vs unsorted after paying the probe depth.

Decision rule: implement kernel-side residual output only if some depth
nets >= 1.15x. Ledger: artifacts/data/admm_cap50_probe_r5.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--snr", type=float, default=3.0)
    ap.add_argument("--cap", type=int, default=50)
    ap.add_argument("--depths", nargs="*", type=int, default=[4, 8, 12, 16])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.batch % 64:
        ap.error("--batch must be a multiple of 64 (the fused kernel's "
                 "early-exit block, which block_max_mean mirrors)")

    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ldpc_decoders_tpu.channels import biawgn
    from ldpc_decoders_tpu.codes import get_code
    from ldpc_decoders_tpu.ops.projection import project_parity_polytope

    code = get_code("1200_3_6_ldpc")
    dec = biawgn.DECODERS["ADMM"](code, max_iter=args.cap, mu=3.0,
                                  eps=1e-5, allow_pseudo=False,
                                  iter_cap=args.cap)
    inner = dec.dec  # default XLA route: we need the loop internals

    key = jax.random.PRNGKey(7)
    k1, _ = jax.random.split(key)
    x = jnp.ones((args.batch, code.get_n()), jnp.int32)
    y = biawgn.send(k1, x, args.snr)
    llr = biawgn.llr(y, args.snr)

    _, iters = jax.jit(inner.decode)(llr.astype(jnp.float32))
    iters = np.asarray(iters)

    # Fixed-depth unmasked replay capturing max(d1, d2) at each depth —
    # the same update equations as ADMMDecoder.decode's body.
    graph = inner.graph
    cmask = graph.chk_mask
    var_deg = graph.var_deg.astype(jnp.float32)
    z0 = jnp.where(cmask, 0.5, 0.0)
    depths = sorted(args.depths)

    @jax.jit
    def residuals(gamma):
        B = gamma.shape[0]
        z = jnp.broadcast_to(z0, (B,) + z0.shape)
        lam = jnp.zeros_like(z)
        outs = []
        for it in range(1, depths[-1] + 1):
            xv = jnp.clip(
                (inner._sum_per_var(z - lam / inner.mu) - gamma / inner.mu)
                / var_deg, 0.0, 1.0)
            x_e = inner._broadcast_var(xv)
            z_new = project_parity_polytope(x_e + lam / inner.mu,
                                            mask=cmask)
            lam = lam + inner.mu * (x_e - z_new)
            d1 = ((x_e - z_new) ** 2).sum((-1, -2))
            d2 = ((z - z_new) ** 2).sum((-1, -2))
            z = z_new
            if it in depths:
                outs.append(jnp.maximum(d1, d2))
        return jnp.stack(outs)                       # [len(depths), B]

    res = np.asarray(residuals(llr.astype(jnp.float32)))

    def block_max_mean(order):
        blocks = iters[order].reshape(-1, 64)
        return float(blocks.max(axis=1).mean())

    unsorted = block_max_mean(np.arange(args.batch))
    oracle = block_max_mean(np.argsort(iters, kind="stable"))
    lines = []
    base = {"probe": "admm_cap50_presort", "batch": args.batch,
            "snr": args.snr, "cap": args.cap,
            "per_word_mean": round(float(iters.mean()), 2),
            "unsorted_block_max_mean": round(unsorted, 2),
            "oracle_block_max_mean": round(oracle, 2),
            "oracle_net": round(unsorted / oracle, 3)}
    print(json.dumps(base), flush=True)
    lines.append(base)
    for d, r in zip(depths, res):
        m = block_max_mean(np.argsort(r, kind="stable")[::-1])
        # Spearman: ranks of residual (ascending) vs ranks of iters
        # (ascending) — positive means larger residual predicts more
        # iterations.
        rho = float(np.corrcoef(np.argsort(np.argsort(r)),
                                np.argsort(np.argsort(iters)))[0, 1])
        line = {"probe": "admm_cap50_presort", "depth": d,
                "sorted_block_max_mean": round(m, 2),
                "rank_corr_vs_iters": round(rho, 3),
                "net_factor": round(unsorted / (m + d), 3)}
        print(json.dumps(line), flush=True)
        lines.append(line)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
