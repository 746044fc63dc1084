"""LT tail-noise spot check (PARITY.md "LT golden-scale tail question").

Samples generator graphs with the REFERENCE's exact RNG stream
(np.random.seed(sid); weights via np.random.choice; column supports via
np.random.shuffle — replicated sparsely: shuffling a 0/1 column of
weight w gives the identical support the reference's dense
tri_u-column shuffle produces, luby.py:11-26, without its ~1.8 GB of
dense intermediates) and decodes them through our peeler (per-sim
exactly equal to the reference's, tests/test_lt.py). Fresh seeds
(100000+) so the sample is independent of the golden's (sims 0..2749).

Reports mean / std / P(num_sym >= 10800) for comparison against the
golden's 110/2750 and our artifact's 153/2750.

Run:  python scripts/lt_tail_check.py [--sims N] [--c 0.03]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def ref_stream_graph(sid: int, omega: np.ndarray, k: int, n: int):
    """(edge_sym, edge_var) drawn with the reference's exact RNG stream
    for seed ``sid`` (luby.py:41-45 + 11-26): seed, weights, then one
    shuffle per column, in column order."""
    np.random.seed(sid)
    weights = np.random.choice(np.arange(1, k + 1), n, p=omega)
    sym, var = [], []
    col = np.zeros(k, dtype=int)
    for j, w in enumerate(weights):
        col[:] = 0
        col[:w] = 1
        np.random.shuffle(col)
        rows = np.nonzero(col)[0]
        sym.append(np.full(rows.size, j, np.int32))
        var.append(rows.astype(np.int32))
    return np.concatenate(sym), np.concatenate(var)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--c", type=float, default=0.03)
    ap.add_argument("--k", type=int, default=10000)
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed0", type=int, default=100000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ldpc_decoders_tpu.fountain.lt import LTSimulator, robust_soliton

    k, n = args.k, args.n
    omega = robust_soliton(k, args.c, 0.5)  # bit-identical to reference
    sim = LTSimulator(k, n, args.c, 0.5)
    e_pad = sim.e_pad

    results = []
    t0 = time.time()
    for start in range(0, args.sims, args.batch):
        sids = range(args.seed0 + start,
                     args.seed0 + min(start + args.batch, args.sims))
        tabs = {key: [] for key in ("edge_sym", "edge_var", "indptr_sym",
                                    "perm_var", "indptr_var")}
        msgs = []
        for sid in sids:
            s_, v_ = ref_stream_graph(sid, omega, k, n)
            t = s_.size
            es = np.full(e_pad, n, np.int32)
            ev = np.full(e_pad, k, np.int32)
            es[:t] = s_
            ev[:t] = v_
            ips = np.zeros(n + 2, np.int32)
            np.cumsum(np.bincount(es, minlength=n + 1), out=ips[1:])
            pv = np.argsort(ev, kind="stable").astype(np.int32)
            ipv = np.zeros(k + 2, np.int32)
            np.cumsum(np.bincount(ev, minlength=k + 1), out=ipv[1:])
            for key, val in zip(tabs, (es, ev, ips, pv, ipv)):
                tabs[key].append(val)
            msgs.append(np.random.choice(a=[0, 1], size=k))  # ref stream
        batched = {key: jnp.asarray(np.stack(v)) for key, v in tabs.items()}
        batched["msg"] = jnp.asarray(np.stack(msgs).astype(np.int32))
        res, _, _ = sim.simulate(batched)
        results.extend(int(v) for v in np.asarray(res))
        done = len(results)
        arr = np.array(results, float)
        print(f"{done}/{args.sims} mean={arr.mean():.1f} std={arr.std():.1f}"
              f" tail>=10800: {(arr >= 10800).sum()}"
              f" ({time.time() - t0:.0f}s)", flush=True)

    arr = np.array(results, float)
    line = {"metric": "lt_tail_check_ref_sampler",
            "c": args.c, "sims": len(results),
            "mean": round(float(arr.mean()), 1),
            "std": round(float(arr.std()), 1),
            "tail_ge_10800": int((arr >= 10800).sum()),
            "tail_rate": round(float((arr >= 10800).mean()), 4)}
    # Comparison columns from the goldens/artifacts themselves (the
    # tail threshold 10800 only singles out rare sims at c=0.03; at
    # c=0.1 the bulk of the distribution sits above it — the mean/std
    # rows carry the comparison there).
    for tag, path in (
            ("golden", "/root/reference/data/output"),
            ("artifact", os.path.join(os.path.dirname(__file__), "..",
                                      "artifacts", "data"))):
        f = os.path.join(path, f"luby-{k}-{n}-{args.c}-0.5.json")
        try:
            ref = np.asarray(json.load(open(f))["arr"], float)
            line[f"{tag}_mean"] = round(float(ref.mean()), 1)
            line[f"{tag}_tail_rate"] = round(float((ref >= 10800).mean()),
                                             4)
        except OSError:
            pass
    print(json.dumps(line))
    if args.out:
        with open(args.out, "a") as fp:
            fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
