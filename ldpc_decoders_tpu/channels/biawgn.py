"""Binary-input AWGN channel + its decoder family.

Reference parity: src/biawgn.py. BPSK maps bits {0,1} to {-1,+1}; the
channel parameter is SNR in dB with noise_var = 10^(-snr/10)
(biawgn.py:10-18); LLR = -2y/noise_var (biawgn.py:26-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.channels.bsc import _HostLLRWrapped, _LLRWrapped
from ldpc_decoders_tpu.decoders.bp import BPDecoder
from ldpc_decoders_tpu.decoders.ml import MLBiAWGN


def noise_var(snr_db):
    return 10.0 ** (-snr_db / 10.0)


def send(key, x: jnp.ndarray, snr_db) -> jnp.ndarray:
    """x [B, n] in {0,1} -> y [B, n] real."""
    std = jnp.sqrt(noise_var(snr_db))
    noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
    return (2.0 * x.astype(jnp.float32) - 1.0) + std * noise


def llr(y: jnp.ndarray, snr_db) -> jnp.ndarray:
    return -2.0 * y / noise_var(snr_db)


class _AWGNLLRWrapped(_LLRWrapped):
    def decode(self, y, snr_db, key):
        x_hat, iters = self.dec.decode(llr(y, snr_db), key)
        return x_hat, {"iters": iters}

    def decode_tables(self, t, y, snr_db, key):
        x_hat, iters = self.dec.decode_tables(t, llr(y, snr_db), key)
        return x_hat, {"iters": iters}


class _AWGNHostLLRWrapped(_HostLLRWrapped):
    def decode(self, y, snr_db, key):
        import numpy as np
        gamma = np.asarray(llr(jnp.asarray(y), snr_db))
        return self.dec.decode_batch(gamma), {}


# check_init=False: the reference initializes x_hat to the real-valued y
# (bpa.py:19), which never satisfies the syndrome, so biAWGN BP always
# runs at least one iteration — unlike bit-input channels where the
# iteration-0 syndrome exit is behavior-identical.
def SPA(code, **kw):
    return _AWGNLLRWrapped(BPDecoder(code.graph, "SPA", check_init=False,
                                     **kw))


def MSA(code, **kw):
    return _AWGNLLRWrapped(BPDecoder(code.graph, "MSA", check_init=False,
                                     **kw))


class _MLWrapped:
    id_keys: list = []

    def __init__(self, code, **kw):
        self.dec = MLBiAWGN(code)

    def decode(self, y, snr_db, key):
        return self.dec.decode(y, snr_db, key), {}


ML = _MLWrapped


def LP(code, **kw):
    from ldpc_decoders_tpu.decoders.lp import LPDecoder
    return _AWGNHostLLRWrapped(LPDecoder(code.graph, **kw))


def ADMM(code, **kw):
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
    return _AWGNLLRWrapped(ADMMDecoder(code.graph, **kw))


def ADMMA(code, **kw):
    from ldpc_decoders_tpu.decoders.admma import ADMMADecoder
    return _AWGNLLRWrapped(ADMMADecoder(code.graph, **kw))


DECODERS = {"ML": ML, "SPA": SPA, "MSA": MSA, "LP": LP,
            "ADMM": ADMM, "ADMMA": ADMMA}
