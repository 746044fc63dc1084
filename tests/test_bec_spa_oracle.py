"""BECSPADecoder word-exactness vs a float numpy transcription of the
reference's ternary erasure SPA (src/bec.py:70-122).

Why: at cap-bound waterfall params the WER is hypersensitive to
iteration semantics (measured on 1200_3_6_rand_ldpc_1 at eps=0.375:
WER 0.53 at cap 10 vs 0.36 at cap 11), so statistical agreement alone
cannot distinguish a faithful decoder from an off-by-one. Word-exact
agreement with the transcription proves the algorithm; the one known
golden discrepancy (reference REG ensemble summary at eps=0.375, whose
oldest-vintage files match NEITHER cap 10 nor cap 11 of the current
reference algorithm) is therefore a reference code-vintage artifact,
not a decoder deviation — see test_ens_average's carve-out.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.codes import get_code
from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder
from tests.ref_semantics_oracle import decode_bec_ref


def _word_exact(code_name, eps, cap, B, seed=11):
    code = get_code(code_name)
    V = code.get_n()
    rng = np.random.default_rng(seed)
    y = np.where(rng.random((B, V)) < eps, 2, 0).astype(np.int32)

    dec = BECSPADecoder(code.graph, max_iter=cap)
    xj = np.asarray(jax.jit(dec.decode)(jnp.asarray(y))[0])
    for b in range(B):
        xr = decode_bec_ref(code.parity_mtx, y[b], cap)
        assert (xr == xj[b]).all(), (b, np.where(xr != xj[b]))


def test_bec_spa_word_exact_small():
    _word_exact("12_3_4_ldpc", 0.4, 10, 256)


def test_bec_spa_word_exact_waterfall_center():
    # The cap-hypersensitive point itself: eps=0.375, cap 10.
    _word_exact("1200_3_6_rand_ldpc_1", 0.375, 10, 64)


def test_bec_spa_word_exact_unbounded():
    _word_exact("12_3_4_ldpc", 0.35, 200, 256)
