"""Measure closed-over-constant vs traced-argument decoder tables on TPU.

Decides whether the rotating-member harness path (tables as traced args,
one compile for a whole ensemble) pays a per-chunk cost vs baking the
tables into the program as constants (one compile per member). Also
times the G-stacked joint ensemble program for the same workload.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.channels import CHANNELS
from ldpc_decoders_tpu.codes import get_code

B = 8192


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / n


def main():
    code = get_code("1200_3_6_rand_ldpc_1")
    key = jax.random.PRNGKey(0)

    for channel, name, kw, param in [
        ("bec", "SPA", {}, 0.35),
        ("biawgn", "MSA", {"msg_dtype": jnp.bfloat16}, 3.0),
    ]:
        mod = CHANNELS[channel]
        dec = mod.DECODERS[name](code, max_iter=10, **kw)
        x = jnp.zeros((B, code.get_n()), jnp.int32)
        y = mod.send(key, x, param)

        closure = jax.jit(lambda yy: dec.decode(yy, param, None))
        t_c = timeit(closure, y)
        print(f"{channel}/{name} closure-constants: {t_c*1e3:.1f} ms "
              f"-> {B/t_c:,.0f} w/s", flush=True)

        traced = jax.jit(lambda tt, yy: dec.decode_tables(tt, yy, param,
                                                          None))
        t_t = timeit(traced, dec.tables, y)
        print(f"{channel}/{name} traced-tables:     {t_t*1e3:.1f} ms "
              f"-> {B/t_t:,.0f} w/s", flush=True)


if __name__ == "__main__":
    main()
