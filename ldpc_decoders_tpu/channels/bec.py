"""Binary erasure channel + its decoder family.

Reference parity: src/bec.py. Erasures are encoded as symbol 2
(bec.py:15-18). SPA/MSA use the ternary-message erasure SPA
(bec.py:70-125, MSA aliased to SPA); LP/ADMM get "safe infinity" LLRs
+-1e8 for known symbols and 0 for erasures (bec.py:39-46); ML picks
uniformly among codewords compatible with the non-erased positions
(bec.py:21-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder
from ldpc_decoders_tpu.decoders.ml import MLBEC

SAFE_INF = 1e8
_LLR_TABLE = jnp.array([SAFE_INF, -SAFE_INF, 0.0])  # indexed by y in {0,1,2}


def send(key, x: jnp.ndarray, p) -> jnp.ndarray:
    """Erase each symbol w.p. p. x [B, n] in {0,1} -> y [B, n] in {0,1,2}."""
    erase = jax.random.bernoulli(key, p, x.shape)
    return jnp.where(erase, 2, x.astype(jnp.int32))


def llr(y: jnp.ndarray, p=None) -> jnp.ndarray:
    return _LLR_TABLE[y.astype(jnp.int32)]


class _TernarySPA:
    def __init__(self, code, **kw):
        self.dec = BECSPADecoder(code.graph, **kw)
        self.id_keys = self.dec.id_keys

    def decode(self, y, p, key):
        x_hat, iters = self.dec.decode(y, key)
        return x_hat, {"iters": iters}

    # Member-table passthroughs for the rotating-ensemble harness path.
    @property
    def tables(self):
        return self.dec.tables

    def member_tables(self, graph, **kw):
        return self.dec.member_tables(graph, **kw)

    def decode_tables(self, t, y, p, key):
        x_hat, iters = self.dec.decode_tables(t, y, key)
        return x_hat, {"iters": iters}


SPA = _TernarySPA
MSA = _TernarySPA  # reference aliases MSA = SPA on the BEC (bec.py:125)


class _MLWrapped:
    id_keys: list = []

    def __init__(self, code, **kw):
        self.dec = MLBEC(code)

    def decode(self, y, p, key):
        return self.dec.decode(y, p, key), {}


ML = _MLWrapped


def LP(code, **kw):
    from ldpc_decoders_tpu.decoders.lp import LPDecoder

    class _Host:
        host_only = True
        id_keys = None

        def __init__(self):
            self.dec = LPDecoder(code.graph, **kw)
            self.id_keys = self.dec.id_keys

        def decode(self, y, p, key):
            import numpy as np
            gamma = np.asarray(llr(jnp.asarray(y)))
            return self.dec.decode_batch(gamma), {}

    return _Host()


def ADMM(code, **kw):
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    class _Jit:
        def __init__(self):
            self.dec = ADMMDecoder(code.graph, **kw)
            self.id_keys = self.dec.id_keys

        def decode(self, y, p, key):
            x_hat, iters = self.dec.decode(llr(y), key)
            return x_hat, {"iters": iters}

    return _Jit()


def ADMMA(code, **kw):
    from ldpc_decoders_tpu.decoders.admma import ADMMADecoder

    class _Jit:
        def __init__(self):
            self.dec = ADMMADecoder(code.graph, **kw)
            self.id_keys = self.dec.id_keys

        def decode(self, y, p, key):
            x_hat, iters = self.dec.decode(llr(y), key)
            return x_hat, {"iters": iters}

    return _Jit()


DECODERS = {"ML": ML, "SPA": SPA, "MSA": MSA, "LP": LP,
            "ADMM": ADMM, "ADMMA": ADMMA}
