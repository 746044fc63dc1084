"""Round-5 probe: dense LT engine storage/layout variants vs the int8
single-copy baseline (~0.67 ms/sim/round measured, vs an int8 HBM
roofline of ~0.25-0.3). Suspects: XLA upcasting the int8 G before the
MXU (per-iteration conversion = extra traffic) and/or a per-iteration
transpose for the pass that contracts G's leading non-batch dim.

Variants (all bit-identical in result — integer counts stay exact):
  A: baseline — int8 G [B, n, k], both contractions on the same array;
  B: bf16-resident G (f32 accumulation; 2x bytes but no conversion);
  C: int8, TWO layouts — G [B, n, k] and G^T [B, k, n], each pass
     contracting the trailing dim (no transposes possible).

NOTE: seg_generic replays the PRE-fusion body (stuck-jumps as separate
rounds — the engine as it stood when this probe ran); the production
_segment_dense has since fused jumps into the resolve round, so its
round counts are lower. The probe's conclusions are about STORAGE
(int8 native: B measures exactly 2x A; no hidden transposes: C == A) —
all three variants share the same round structure, so that comparison
is unaffected.

Run on the real chip:
    python scripts/lt_dense_layout_probe.py --out artifacts/data/lt_dense_probe_r5.jsonl
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=10000)
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ldpc_decoders_tpu.fountain import lt as ltm

    def seg_generic(self, g, s0, opd=jnp.int8, acc=jnp.int32):
        n = self.n
        sym_idx = jnp.arange(n, dtype=jnp.int32)
        two_layouts = isinstance(g, tuple)
        if two_layouts:
            g_sv, g_vs = g
        else:
            g_sv = g

        def body(s):
            prefix = sym_idx < s.m[:, None]
            success = ~((s.deg > 0) & prefix).any(-1)
            ripple = (s.deg == 1) & prefix
            has_ripple = ripple.any(-1)
            r2 = jnp.stack([ripple, ripple & (s.rcv > 0)], 1).astype(opd)
            if two_layouts:
                kv = lax.dot_general(
                    g_vs, r2, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=acc)          # [B, k, 2]
                kv = jnp.moveaxis(kv, -1, 1)
            else:
                kv = lax.dot_general(
                    r2, g_sv, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=acc)          # [B, 2, k]
            kv = kv.astype(jnp.int32) if acc != jnp.int32 else kv
            unres = ~s.resolved
            cnt = jnp.where(unres, kv[:, 0], 0)
            newly = cnt > 0
            est = jnp.where(newly, (kv[:, 1] > 0).astype(jnp.int32), s.est)
            resolved = s.resolved | newly
            n2 = jnp.stack([newly, newly & (est > 0)], -1).astype(opd)
            sv = lax.dot_general(g_sv, n2, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=acc)
            sv = sv.astype(jnp.int32) if acc != jnp.int32 else sv
            deg = s.deg - sv[..., 0]
            rcv = (s.rcv + sv[..., 1]) % 2
            grow = ~s.done & ~success & ~has_ripple
            nxt = jnp.min(jnp.where((s.deg == 1) & ~prefix, sym_idx, n),
                          axis=-1)
            m = jnp.where(grow & (nxt < n), nxt + 1, s.m)
            fail = grow & (nxt >= n)
            act = ~s.done
            act2 = act[:, None]
            return ltm._DenseState(
                resolved=jnp.where(act2, resolved, s.resolved),
                deg=jnp.where(act2, deg, s.deg),
                est=jnp.where(act2, est, s.est),
                rcv=jnp.where(act2, rcv, s.rcv),
                m=jnp.where(act, m, s.m),
                done=s.done | (act & (success | fail)),
                result=jnp.where(act & success, s.m, s.result),
                it=s.it + 1,
            )

        def cond(s):
            return (s.it < 4 * self.seg_iters) & ~s.done.all()

        final = lax.while_loop(cond, body, s0)
        return final._replace(it=jnp.zeros((), jnp.int32))

    variants = {
        "A_int8": dict(opd=jnp.int8, acc=jnp.int32, layout="one"),
        "B_bf16": dict(opd=jnp.bfloat16, acc=jnp.float32, layout="one"),
        "C_int8_two_layouts": dict(opd=jnp.int8, acc=jnp.int32,
                                   layout="two"),
    }
    rng = np.random.default_rng(0)
    base = ltm.LTSimulator(args.k, args.n, 0.01, 0.5, engine="dense")
    tables = base.sample_batch(rng, args.batch)
    ref = None
    lines = []
    for name, cfg in variants.items():
        sim = ltm.LTSimulator(args.k, args.n, 0.01, 0.5, engine="dense")

        def seg(g, s0, _cfg=cfg, _sim=sim):
            return seg_generic(_sim, g, s0, opd=_cfg["opd"],
                               acc=_cfg["acc"])

        def init(tb, _cfg=cfg, _sim=sim):
            g, s = ltm.LTSimulator._init_dense(_sim, tb)
            if _cfg["opd"] == jnp.bfloat16:
                g = g.astype(jnp.bfloat16)
            if _cfg["layout"] == "two":
                g = (g, jnp.swapaxes(g, 1, 2))
            return g, s

        sim._init_d = jax.jit(init)
        sim._seg_d = jax.jit(seg)
        res, _, _ = map(np.asarray, sim.simulate(tables))  # compile+warm
        t0 = time.time()
        res, _, _ = map(np.asarray, sim.simulate(tables))
        dt = time.time() - t0
        if ref is None:
            ref = res
        assert (res == ref).all(), (name, res, ref)
        line = {"probe": "lt_dense_layout", "variant": name,
                "k": args.k, "batch": args.batch,
                "warm_decode_wall_s": round(dt, 2),
                "s_per_sim_decode": round(dt / args.batch, 3),
                "mean": float(np.mean(res))}
        lines.append(line)
        print(json.dumps(line), flush=True)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
