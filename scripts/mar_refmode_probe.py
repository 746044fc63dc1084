"""Round-5 chip probe: does the STAGED factored refmode-SPA kernel
(ops/pallas_bp._spa_ref_kernel body_fac) compile and beat the XLA route
at margulis scale? (VERDICT r4 stretch item 7: the round-4 SSA-list
refmode class machinery exceeded scoped vmem even at block 16.)

Also covers the bf16 variant and checks decision/iteration agreement
against the XLA refmode decoder on the same LLRs.

Run (background, generous timeout):
    python scripts/mar_refmode_probe.py [--batch 2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--p", type=float, default=0.05)
    ap.add_argument("--max-iter", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldpc_decoders_tpu.channels import bsc
    from ldpc_decoders_tpu.codes import get_code
    from ldpc_decoders_tpu.decoders.bp import BPDecoder

    code = get_code("margulis")
    B = args.batch
    x = jnp.zeros((B, code.get_n()), jnp.int32)
    key = jax.random.PRNGKey(7)
    y = bsc.send(key, x, args.p)
    llr = bsc.llr(y, args.p)

    lines = []

    def bench(label, dec):
        try:
            fn = jax.jit(dec.decode)
            for _ in range(2):
                xh, it = fn(llr)
                jax.block_until_ready(xh)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                xh, it = fn(llr)
                jax.block_until_ready(xh)
                times.append(time.perf_counter() - t0)
            line = {"label": label, "ok": True, "batch": B, "p": args.p,
                    "max_iter": args.max_iter,
                    "wps": round(B / min(times), 1),
                    "wec": int((np.asarray(xh) != 0).any(axis=1).sum()),
                    "it_mean": round(float(np.asarray(it).mean()), 2)}
        except Exception as e:  # noqa: BLE001 - record the failure mode
            traceback.print_exc()
            line = {"label": label, "ok": False,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
        lines.append(line)
        print(json.dumps(line), flush=True)

    mk = lambda **kw: BPDecoder(code.graph, "SPA", max_iter=args.max_iter,
                                inf_policy="reference", **kw)
    bench("xla_incidence_f32", mk(msg_dtype=jnp.float32))
    bench("fac_exact_f32", mk(msg_dtype=jnp.float32, perm="pallas"))
    bench("xla_incidence_bf16", mk(msg_dtype=jnp.bfloat16))
    bench("fac_bf16", mk(msg_dtype=jnp.bfloat16, perm="pallas"))

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
