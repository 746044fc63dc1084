"""BPDecoder(inf_policy="reference"): element-level agreement with the
float64 reference-semantics oracle, across all three permutation routes.

Why this exists: the reference SPA's float64 inf/NaN dynamics
(bpa.py:31-75) are load-bearing for its committed golden curves — on
codeword=0 runs the NaN-poison cascade zeroes stuck words, suppressing
the error floor up to ~15x at low noise (measured: IREG member 3, BSC
p=0.05, cap 100 — golden WER 0.0144, reference-semantics 0.0159, clean
saturating decoder 0.247). MSA (no transcendental saturation at these
iteration counts) and the ternary BEC SPA are immune, which is exactly
the member-golden agreement pattern observed before the fix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.codes import get_code
from ldpc_decoders_tpu.decoders.bp import (BPDecoder, INF_S, NAN_S,
                                           spa_check_rows_ref)
from tests.ref_semantics_oracle import decode_spa_ref


def _agreement(code_name, p, cap, B, perm, seed=3):
    code = get_code(code_name)
    V = code.get_n()
    rng = np.random.default_rng(seed)
    flips = rng.random((B, V)) < p
    llr = (1 - 2 * flips.astype(np.float64)) * np.log((1 - p) / p)

    x_oracle = decode_spa_ref(code.parity_mtx, llr, cap)
    dec = BPDecoder(code.graph, "SPA", max_iter=cap, perm=perm,
                    inf_policy="reference")
    x_hat, _ = jax.jit(dec.decode)(jnp.asarray(llr, jnp.float32))
    x_hat = np.asarray(x_hat)
    word = ((x_hat != 0).any(1) == (x_oracle != 0).any(1)).mean()
    bits = (x_hat == x_oracle).mean()
    return word, bits


@pytest.mark.parametrize("perm", ["incidence", "matmul", "gather"])
def test_ref_policy_matches_oracle_small(perm):
    """Builtin (12, 3, 4) code deep into the cascade regime: low p and
    cap 50 means most non-converged words saturate and poison."""
    word, bits = _agreement("12_3_4_ldpc", 0.06, 50, 512, perm)
    assert word == 1.0, word
    assert bits >= 0.9995, bits


def test_ref_policy_matches_oracle_irregular():
    """Irregular ensemble member (the worst observed deviation before
    the fix) at the golden's operating point."""
    word, bits = _agreement("1200_rho_x5_rand_ldpc_3", 0.05, 100, 96,
                            "gather")
    assert word == 1.0, word
    assert bits >= 0.9995, bits


def test_ref_check_rows_classes():
    """Unit semantics of the sentinel check update: inf iff all
    leave-one-out factors saturated; NaN input poisons the whole row."""
    mask = jnp.ones((1, 1, 4), bool)
    # all others saturated -> +inf out (sign parity of the two -sat).
    rows = jnp.asarray([[[2.0, 50.0, -INF_S, -40.0]]], jnp.float32)
    out = np.asarray(spa_check_rows_ref(rows, mask))[0, 0]
    assert out[0] == INF_S                      # two negatives -> +inf
    assert abs(out[1]) < 3 and out[1] > 0       # sees the finite 2.0
    # one NaN input -> whole row NaN.
    rows = jnp.asarray([[[2.0, NAN_S, 5.0, -3.0]]], jnp.float32)
    out = np.asarray(spa_check_rows_ref(rows, mask))
    assert (out == NAN_S).all()
    # finite unsaturated inputs -> plain SPA magnitudes, no sentinels.
    rows = jnp.asarray([[[2.0, 1.0, 5.0, -3.0]]], jnp.float32)
    out = np.asarray(spa_check_rows_ref(rows, mask))
    assert (np.abs(out) < 10).all()


def test_saturate_policy_unchanged():
    """inf_policy='saturate' stays the clean decoder: no sentinels ever
    appear and WER on an easy point is sane."""
    code = get_code("12_3_4_ldpc")
    dec = BPDecoder(code.graph, "SPA", max_iter=50, inf_policy="saturate")
    rng = np.random.default_rng(0)
    flips = rng.random((256, code.get_n())) < 0.02
    llr = (1 - 2 * flips.astype(np.float32)) * 3.9
    x_hat, _ = jax.jit(dec.decode)(jnp.asarray(llr))
    assert (np.asarray(x_hat) != 0).any(1).mean() < 0.2
