"""Breadth benchmark: single-chip throughput for every jit decoder family
(MSA, SPA, BEC-SPA, ADMM, ML) on its benchmark configuration, one JSON
line per decoder — so regressions in the non-headline decoders are
visible, not just the headline MSA number bench.py reports.

Configurations mirror the reference's campaign workloads
(simulations.py:64-77 REG sweeps for BP on LDPC(1200,3,6);
simulations.py:52-61 HMG for ML; ADMM on the flagship code at its
artifact operating point).

Usage:  python scripts/bench_all.py [--reps N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_chunk(chunk, reps: int, depth: int = 4):
    """Pipelined steady-state timing of an async one-dispatch chunk fn
    (same discipline as bench.py and the campaign harness: warmup
    excluded, ONE packed tally vector fetched per chunk, the host copy
    started at dispatch time — see runner._start_host_copy)."""
    import numpy as np

    def dispatch(i):
        t = chunk(i)
        try:
            t.copy_to_host_async()
        except Exception:  # noqa: BLE001 - pure optimization
            pass
        return t

    chunk(0).block_until_ready()
    t0 = time.perf_counter()
    wec = 0
    pending = []
    for i in range(reps):
        pending.append(dispatch(i + 1))
        if len(pending) >= depth:
            wec += int(np.asarray(pending.pop(0))[0])
    for t in pending:
        wec += int(np.asarray(t)[0])
    return time.perf_counter() - t0, wec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--out", default=None,
                    help="also append JSON lines to this file")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of decoder names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_code
    from ldpc_decoders_tpu import get_code
    from ldpc_decoders_tpu.channels import bec, biawgn
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
    from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder
    from ldpc_decoders_tpu.decoders.bp import BPDecoder
    from ldpc_decoders_tpu.decoders.ml import MLBiAWGN

    code = _flagship_code()
    hamming = get_code("7_4_hamming")
    base_key = jax.random.PRNGKey(0)
    specs = []

    def bp_spec(name, variant, desc_extra="", batch=16384, **kw):
        # 16384 saturates the incidence matmuls for MSA (bench.py sweep:
        # 267k -> 381k cw/s); SPA's larger per-word state (phi planes)
        # spills there and measures faster at 8192.
        dec = BPDecoder(code.graph, variant, max_iter=10,
                        msg_dtype=jnp.bfloat16, **kw)
        x = jnp.zeros((batch, code.get_n()), jnp.int32)

        @jax.jit
        def chunk(i, snr_db=3.0):
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
            y = biawgn.send(k1, x, snr_db)
            x_hat, _ = dec.decode(biawgn.llr(y, snr_db), k2)
            errs = (x_hat != x).sum(axis=-1)
            return jnp.stack([(errs > 0).sum(), errs.sum()])

        return (name,
                f"{variant} it<=10 LDPC(1200,3,6) biAWGN 3dB bf16"
                + desc_extra, batch, chunk)

    specs.append(bp_spec("msa", "MSA", " pallas-fused", perm="pallas"))
    specs.append(bp_spec("msa_xla", "MSA", " incidence"))
    # SPA default = the reference's inf/NaN-cascade semantics (golden
    # parity); "saturate" is the clean fast policy (docs/SCALING.md).
    specs.append(bp_spec("spa", "SPA", " refmode pallas",
                         perm="pallas"))
    specs.append(bp_spec("spa_xla", "SPA", " refmode incidence",
                         batch=8192))
    specs.append(bp_spec("spa_saturate", "SPA", " saturate pallas",
                         perm="pallas", inf_policy="saturate"))

    def becspa_spec(name="bec_spa", **kw):
        dec = BECSPADecoder(code.graph, max_iter=10, **kw)
        batch = 16384
        x = jnp.zeros((batch, code.get_n()), jnp.int32)

        @jax.jit
        def chunk(i, eps=0.3):
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
            y = bec.send(k1, x, eps)
            x_hat, _ = dec.decode(y, k2)
            errs = (x_hat != x).sum(axis=-1)
            return jnp.stack([(errs > 0).sum(), errs.sum()])

        return (name, "ternary SPA it<=10 LDPC(1200,3,6) BEC eps=.3 "
                + (kw.get("perm") or "auto"), batch, chunk)

    specs.append(becspa_spec(perm="pallas"))
    specs.append(becspa_spec("bec_spa_gather", perm="gather"))

    def admm_spec(name="admm", **kw):
        dec = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=50, **kw)
        batch = 2048
        x = jnp.zeros((batch, code.get_n()), jnp.int32)

        @jax.jit
        def chunk(i, snr_db=3.0):
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
            y = biawgn.send(k1, x, snr_db)
            x_hat, _ = dec.decode(biawgn.llr(y, snr_db), k2)
            errs = (x_hat != x).sum(axis=-1)
            return jnp.stack([(errs > 0).sum(), errs.sum()])

        return (name, "ADMM it<=50 LDPC(1200,3,6) biAWGN 3dB "
                + (kw.get("perm") or "gather"), batch, chunk)

    specs.append(admm_spec("admm", perm="pallas"))
    specs.append(admm_spec("admm_xla"))

    def ml_spec():
        dec = MLBiAWGN(hamming)
        batch = 65536
        x = jnp.zeros((batch, hamming.get_n()), jnp.int32)

        @jax.jit
        def chunk(i, snr_db=3.0):
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
            y = biawgn.send(k1, x, snr_db)
            x_hat = dec.decode(y, snr_db, k2)
            errs = (x_hat != x).sum(axis=-1)
            return jnp.stack([(errs > 0).sum(), errs.sum()])

        return ("ml", "ML codebook Hamming(7,4) biAWGN 3dB", batch, chunk)

    specs.append(ml_spec())

    lines = []
    for name, desc, batch, chunk in specs:
        if args.only and name not in args.only:
            continue
        dt, wec = bench_chunk(chunk, args.reps)
        cw_per_s = args.reps * batch / dt
        line = {"metric": f"decoded_codewords_per_sec_1chip_{name}",
                "config": desc, "value": round(cw_per_s, 1),
                "unit": "codewords/s", "wec": wec}
        lines.append(line)
        print(json.dumps(line), flush=True)

    if args.out:
        with open(args.out, "a") as fp:
            for line in lines:
                fp.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
