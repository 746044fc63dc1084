"""Round-5 diagnostic: where does the campaign harness lose half the
kernel's steady-state rate? (VERDICT r4 item 1: 635k chunk rate vs ~330k
through MonteCarloRunner at the identical batch.)

Runs the flagship biAWGN MSA bf16 batch-16384 point three ways and prints
per-section timings:

  A. raw bench.py-style chunk pipeline (the 635k shape)
  B. MonteCarloRunner with LoopProfiler on (the ~330k shape)
  C. bisect variants of A toward B, one feature at a time:
     C1 = A + second blocking transfer per consume (int(w) AND int(b))
     C2 = A + extra iters[B] int32 output on the chunk
     C3 = A + traced param + key-arg dispatch signature (runner-style)
     C4 = all of the above (should reproduce B's rate)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import wait_for_backend

wait_for_backend()

from ldpc_decoders_tpu.channels import biawgn
from ldpc_decoders_tpu.codes import get_code
from ldpc_decoders_tpu.decoders.bp import BPDecoder

code = get_code("1200_3_6_ldpc")
dec = BPDecoder(code.graph, "MSA", max_iter=10,
                msg_dtype=jnp.bfloat16, perm="pallas")
BATCH = 16384
N = code.get_n()
x = jnp.zeros((BATCH, N), jnp.int32)
base_key = jax.random.PRNGKey(0)
REPS, DEPTH = 30, 4


def pipeline_rate(chunk_fn, consume_fn, label, reps=REPS, depth=DEPTH):
    # warmup/compile
    out = chunk_fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    pending = []
    acc = 0
    t_dispatch = t_consume = 0.0
    for i in range(reps):
        td = time.perf_counter()
        pending.append(chunk_fn(i + 1))
        t_dispatch += time.perf_counter() - td
        if len(pending) >= depth:
            tc = time.perf_counter()
            acc += consume_fn(pending.pop(0))
            t_consume += time.perf_counter() - tc
    for p in pending:
        acc += consume_fn(p)
    dt = time.perf_counter() - t0
    rate = reps * BATCH / dt
    print(f"{label:28s} {rate:10.0f} cw/s   wall={dt*1e3:7.1f}ms "
          f"dispatch={t_dispatch*1e3:6.1f}ms consume={t_consume*1e3:7.1f}ms",
          flush=True)
    return rate


snr = 3.0

# ---- A: bench.py shape: 2 scalar outputs, 1 blocking transfer ---------
@jax.jit
def chunk_a(i):
    k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
    y = biawgn.send(k1, x, snr)
    x_hat, _ = dec.decode(biawgn.llr(y, snr), k2)
    errs = (x_hat != x).sum(axis=-1)
    return (errs > 0).sum(), errs.sum()


pipeline_rate(chunk_a, lambda p: int(p[0]), "A bench-style")

# ---- C1: + second blocking transfer ------------------------------------
pipeline_rate(chunk_a, lambda p: int(p[0]) + int(p[1]), "C1 +int(b)")

# ---- C2: + iters[B] output ---------------------------------------------
@jax.jit
def chunk_c2(i):
    k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
    y = biawgn.send(k1, x, snr)
    x_hat, iters = dec.decode(biawgn.llr(y, snr), k2)
    errs = (x_hat != x).sum(axis=-1)
    return (errs > 0).sum(), errs.sum(), jnp.asarray(iters, jnp.int32)


pipeline_rate(chunk_c2, lambda p: int(p[0]), "C2 +iters out")

# ---- C3: runner-style traced args (key array, traced float param) -----
@jax.jit
def chunk_c3(key, i, param):
    kx, kc, kd = jax.random.split(jax.random.fold_in(key, i), 3)
    xx = jnp.full((BATCH, N), 1, jnp.int32)  # codeword=1 path
    y = biawgn.send(kc, xx, param)
    x_hat, _ = dec.decode(biawgn.llr(y, param), kd)
    errs = (x_hat != xx.astype(x_hat.dtype)).sum(axis=-1)
    return (errs > 0).sum(), errs.sum()


pipeline_rate(lambda i: chunk_c3(base_key, i, snr), lambda p: int(p[0]),
              "C3 traced args")

# ---- C4: all three ------------------------------------------------------
@jax.jit
def chunk_c4(key, i, param):
    kx, kc, kd = jax.random.split(jax.random.fold_in(key, i), 3)
    xx = jnp.full((BATCH, N), 1, jnp.int32)
    y = biawgn.send(kc, xx, param)
    x_hat, iters = dec.decode(biawgn.llr(y, param), kd)
    errs = (x_hat != xx.astype(x_hat.dtype)).sum(axis=-1)
    return (errs > 0).sum(), errs.sum(), jnp.asarray(iters, jnp.int32)


pipeline_rate(lambda i: chunk_c4(base_key, i, snr),
              lambda p: int(p[0]) + int(p[1]), "C4 all")

# ---- D: the fix — packed single-vector tallies + async host copy ------
@jax.jit
def chunk_d(key, i, param):
    kx, kc, kd = jax.random.split(jax.random.fold_in(key, i), 3)
    xx = jnp.full((BATCH, N), 1, jnp.int32)
    y = biawgn.send(kc, xx, param)
    x_hat, iters = dec.decode(biawgn.llr(y, param), kd)
    errs = (x_hat != xx.astype(x_hat.dtype)).sum(axis=-1)
    return jnp.stack([(errs > 0).sum(), errs.sum()]), \
        jnp.asarray(iters, jnp.int32)


def dispatch_d(i):
    out = chunk_d(base_key, i, param=snr)
    try:
        out[0].copy_to_host_async()
    except Exception:
        pass
    return out


import numpy as np

pipeline_rate(dispatch_d,
              lambda p: int(np.asarray(p[0])[0]) + int(np.asarray(p[0])[1]),
              "D packed+async")

# ---- B: the actual runner with profile on ------------------------------
import logging

logging.basicConfig(level=logging.INFO)
from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig

cfg = RunConfig(channel="biawgn", code="1200_3_6_ldpc", decoder="MSA",
                params=[3.0], codeword=1, batch=BATCH,
                msg_dtype="bfloat16", min_wec=10 ** 9,
                max_words=REPS * BATCH, log_freq=1e9, profile=True)
runner = MonteCarloRunner(cfg)
t0 = time.time()
res = runner.run()[3.0]
wall = time.time() - t0
print(f"B MonteCarloRunner           {res['words_per_sec']:10.0f} cw/s "
      f"wall={wall:6.2f}s tot={res['tot']}", flush=True)
