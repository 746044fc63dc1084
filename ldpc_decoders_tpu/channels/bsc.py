"""Binary symmetric channel + its decoder family.

Reference parity: src/bsc.py. Channel flips each bit independently with
probability p (bsc.py:15-16); LLR adapter llr = log((1-p)/p) * (1-2y)
(bsc.py:19-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.decoders.bp import BPDecoder
from ldpc_decoders_tpu.decoders.ml import MLBSC


def send(key, x: jnp.ndarray, p) -> jnp.ndarray:
    """Flip each bit w.p. p. x [B, n] in {0,1} -> y [B, n] in {0,1}."""
    flips = jax.random.bernoulli(key, p, x.shape)
    return (x + flips.astype(x.dtype)) % 2


def llr(y: jnp.ndarray, p) -> jnp.ndarray:
    base = jnp.log1p(-p) - jnp.log(p)
    return base * (1.0 - 2.0 * y.astype(jnp.float32))


class _LLRWrapped:
    """Adapts an LLR-domain decoder to channel symbols."""

    def __init__(self, dec):
        self.dec = dec
        self.id_keys = dec.id_keys

    def decode(self, y, p, key):
        x_hat, iters = self.dec.decode(llr(y, p), key)
        return x_hat, {"iters": iters}

    # Member-table passthroughs (present iff the inner decoder supports
    # them): the harness's rotating-ensemble path feeds another member's
    # tables as traced arguments through one compiled chunk.
    @property
    def tables(self):
        return self.dec.tables

    def member_tables(self, graph, **kw):
        return self.dec.member_tables(graph, **kw)

    def decode_tables(self, t, y, p, key):
        x_hat, iters = self.dec.decode_tables(t, llr(y, p), key)
        return x_hat, {"iters": iters}


def SPA(code, **kw):
    return _LLRWrapped(BPDecoder(code.graph, "SPA", **kw))


def MSA(code, **kw):
    return _LLRWrapped(BPDecoder(code.graph, "MSA", **kw))


class _MLWrapped:
    id_keys: list = []

    def __init__(self, code, **kw):
        self.dec = MLBSC(code)

    def decode(self, y, p, key):
        return self.dec.decode(y, p, key), {}


ML = _MLWrapped


def LP(code, **kw):
    from ldpc_decoders_tpu.decoders.lp import LPDecoder
    return _HostLLRWrapped(LPDecoder(code.graph, **kw))


def ADMM(code, **kw):
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
    return _LLRWrapped(ADMMDecoder(code.graph, **kw))


def ADMMA(code, **kw):
    from ldpc_decoders_tpu.decoders.admma import ADMMADecoder
    return _LLRWrapped(ADMMADecoder(code.graph, **kw))


class _HostLLRWrapped:
    """Adapts a host-side (non-jit) LLR decoder, e.g. LP via scipy."""

    host_only = True

    def __init__(self, dec):
        self.dec = dec
        self.id_keys = dec.id_keys

    def decode(self, y, p, key):
        import numpy as np
        gamma = np.asarray(llr(jnp.asarray(y), p))
        return self.dec.decode_batch(gamma), {}


DECODERS = {"ML": ML, "SPA": SPA, "MSA": MSA, "LP": LP,
            "ADMM": ADMM, "ADMMA": ADMMA}
