"""Ensemble BP: the stacked/vmapped decode must match per-member
BPDecoder decoding bit-exactly (same compiled math, one compilation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_decoders_tpu.codes.code import Code
from ldpc_decoders_tpu.codes.ensembles import rand_reg_ldpc
from ldpc_decoders_tpu.decoders.bp import BPDecoder
from ldpc_decoders_tpu.decoders.bp_ensemble import EnsembleBPDecoder


@pytest.fixture(scope="module")
def ensemble():
    rng = np.random.default_rng(7)
    return [Code(None, rand_reg_ldpc(120, 3, 6, rng)) for _ in range(4)]


@pytest.mark.parametrize("variant", ["SPA", "MSA"])
def test_matches_per_member_decode(ensemble, variant):
    G, B, V = len(ensemble), 32, 120
    dec = EnsembleBPDecoder([c.graph for c in ensemble], variant,
                            max_iter=10)
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (G, B, V)) * 2.0 + 1.0
    x_ens, it_ens = dec.decode(llr)
    for g, code in enumerate(ensemble):
        single = BPDecoder(code.graph, variant, max_iter=10, perm="matmul")
        x_one, it_one = single.decode(llr[g])
        np.testing.assert_array_equal(np.asarray(x_ens[g]),
                                      np.asarray(x_one))
        np.testing.assert_array_equal(np.asarray(it_ens[g]),
                                      np.asarray(it_one))


def test_rejects_mixed_shapes(ensemble):
    from ldpc_decoders_tpu import get_code
    with pytest.raises(ValueError):
        EnsembleBPDecoder([ensemble[0].graph, get_code("7_4_hamming").graph])


def test_decodes_noiseless(ensemble):
    dec = EnsembleBPDecoder([c.graph for c in ensemble], "MSA", max_iter=5)
    llr = jnp.full((len(ensemble), 8, 120), 4.0)
    x_hat, iters = dec.decode(llr)
    assert (np.asarray(x_hat) == 0).all()
    assert (np.asarray(iters) == 0).all()
