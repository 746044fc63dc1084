"""ADMM + LP decoder tests, following the reference's oracle strategy
(SURVEY.md section 4): fixed decodable instances, LP-vs-ADMM agreement
(reference bsc.py:93-99), and exhaustive Hamming error-pattern grids
(reference bsc.py:116-129)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_decoders_tpu import get_code
from ldpc_decoders_tpu.channels import bsc
from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
from ldpc_decoders_tpu.decoders.lp import LPDecoder


@pytest.fixture(scope="module")
def hamming():
    return get_code("7_4_hamming")


def test_admm_reaches_lp_optimum(hamming):
    """On every 1-bit corruption of every Hamming(7,4) codeword, the ADMM
    fixed point attains the same LP objective as the exact LP solve.

    Exact-recovery cannot be asserted here: single-error patterns sit on
    degenerate ties between the codeword and fractional pseudo-codewords
    (that is what the reference's test_find_pcws explores, bsc.py:101-114,
    and why its exhaustive grid only *prints* LP results, bsc.py:116-129).
    Objective equality is the true invariant shared by both solvers."""
    cb = hamming.cb
    n = hamming.get_n()
    ys = []
    for cw in cb:
        for i in range(n):
            y = cw.copy()
            y[i] ^= 1
            ys.append(y)
    ys = np.array(ys)

    gamma = np.asarray(bsc.llr(jnp.asarray(ys), 0.05))
    lp_out = LPDecoder(hamming.graph, allow_pseudo=True).decode_batch(gamma)
    dec = ADMMDecoder(hamming.graph, mu=3.0, eps=1e-5, max_iter=-1,
                      allow_pseudo=True)
    x_hat, iters = jax.jit(dec.decode)(jnp.asarray(gamma))
    cost_admm = (np.asarray(x_hat) * gamma).sum(axis=1)
    cost_lp = (lp_out * gamma).sum(axis=1)
    np.testing.assert_allclose(cost_admm, cost_lp, atol=2e-3)
    assert (np.asarray(iters) >= 1).all()


def test_lp_decodes_codewords_and_known_instance(hamming):
    """Noiseless receipt has a unique LP optimum at the codeword (gamma is
    minimized coordinate-wise there), so exact recovery is guaranteed;
    plus the reference's hand-picked decodable single-error instance
    (bsc.py:83-89: x=[1,0,0,1,1,0,0], y flips bit 2 at p=0.1)."""
    dec = LPDecoder(hamming.graph)
    gamma = np.asarray(bsc.llr(jnp.asarray(hamming.cb), 0.1))
    np.testing.assert_array_equal(dec.decode_batch(gamma), hamming.cb)

    x = np.array([1, 0, 0, 1, 1, 0, 0])
    y = np.array([1, 0, 1, 1, 1, 0, 0])
    gamma1 = np.asarray(bsc.llr(jnp.asarray(y[None, :]), 0.1))
    np.testing.assert_array_equal(dec.decode_batch(gamma1)[0], x)


def test_lp_vs_admm_agreement(hamming):
    """ADMM solves the same LP; with tight eps and no iteration cap the
    hard decisions should agree on almost all random-LLR instances
    (reference bsc.py:93-99)."""
    rng = np.random.default_rng(0)
    gamma = rng.normal(0.0, 2.0, (64, hamming.get_n()))
    lp_out = LPDecoder(hamming.graph, allow_pseudo=True).decode_batch(gamma)
    admm = ADMMDecoder(hamming.graph, eps=1e-6, max_iter=-1, iter_cap=3000,
                       allow_pseudo=True)
    admm_out, _ = jax.jit(admm.decode)(jnp.asarray(gamma, jnp.float32))
    cost_admm = (np.asarray(admm_out) * gamma).sum(axis=1)
    cost_lp = (lp_out * gamma).sum(axis=1)
    np.testing.assert_allclose(cost_admm, cost_lp, atol=5e-3)


def test_lp_vertex_path_matches_linprog_oracle(hamming):
    """The Qhull vertex-enumeration fast path equals the per-word scipy
    solve: identical decisions on continuous gammas (unique optimum a.s.)
    and identical LP optima on tie-heavy discrete gammas."""
    dec = LPDecoder(hamming.graph)
    assert dec.vertices is not None and len(dec.vertices) >= 16
    # Every codeword is a polytope vertex.
    for cw in hamming.cb:
        assert (np.abs(dec.vertices - cw).sum(axis=1) < 1e-9).any()

    rng = np.random.default_rng(2)
    g_cont = rng.normal(0.0, 3.0, (200, 7))
    np.testing.assert_array_equal(dec._decode_batch_vertices(g_cont),
                                  dec._decode_batch_linprog(g_cont))

    c = np.log(0.94 / 0.06)
    g_disc = rng.choice([-c, c], size=(200, 7))
    frac = LPDecoder(hamming.graph, allow_pseudo=True)
    ov = (frac._decode_batch_vertices(g_disc) * g_disc).sum(axis=1)
    ol = (frac._decode_batch_linprog(g_disc) * g_disc).sum(axis=1)
    np.testing.assert_allclose(ov, ol, atol=1e-6)


def test_lp_linprog_fallback_degree2(tmp_path):
    """Codes with degree-2 checks (4_2_test) have no strict polytope
    interior at 0.5; LPDecoder must fall back to linprog and still
    decode the codebook noiselessly."""
    code = get_code("4_2_test")
    dec = LPDecoder(code.graph)
    assert dec.vertices is None
    gamma = np.asarray(bsc.llr(jnp.asarray(code.cb), 0.1))
    np.testing.assert_array_equal(dec.decode_batch(gamma), code.cb)


def test_admm_converged_iota_stats(hamming):
    """Iteration counts follow the reference's histogram convention:
    a word already representable converges quickly; counts are >= 0 and
    below the cap for decodable words."""
    cb = jnp.asarray(hamming.cb)
    gamma = np.asarray(bsc.llr(cb, 0.05))
    dec = ADMMDecoder(hamming.graph, max_iter=200)
    x_hat, iters = jax.jit(dec.decode)(jnp.asarray(gamma))
    np.testing.assert_array_equal(np.asarray(x_hat), hamming.cb)
    assert (np.asarray(iters) < 200).all()


def test_admm_allow_pseudo_fractional(hamming):
    """allow_pseudo keeps fractional coordinates (pseudo-codewords stay
    fractional and tally as bit errors — reference math_utils.py:28-34)."""
    rng = np.random.default_rng(1)
    gamma = rng.normal(0.0, 1.0, (32, hamming.get_n())).astype(np.float32)
    dec = ADMMDecoder(hamming.graph, max_iter=-1, allow_pseudo=True)
    x_hat, _ = jax.jit(dec.decode)(jnp.asarray(gamma))
    x_hat = np.asarray(x_hat)
    assert x_hat.dtype.kind == "f"
    assert ((x_hat >= 0) & (x_hat <= 1)).all()


def test_find_pcws_tool(hamming):
    """Pseudo-codeword search (reference bsc.py:101-114 test_find_pcws):
    jittered LLRs around y=[0,1,0,1,1,0,1] (one flip from the codeword
    [0,1,0,0,1,0,1]) must surface fractional pseudo-codewords of the
    fundamental polytope, batched in one decode instead of 1000 scipy
    solves."""
    from ldpc_decoders_tpu.decoders.pcw import find_pcws

    x = np.array([0, 1, 0, 0, 1, 0, 1])
    y = np.array([0, 1, 0, 1, 1, 0, 1])
    lp_pcws = find_pcws(hamming, y, decoder="LP", tries=256, seed=0,
                        exclude=x[None, :])
    assert lp_pcws.shape[0] >= 1
    frac = (lp_pcws > 1e-3) & (lp_pcws < 1 - 1e-3)
    assert frac.any(), "expected fractional pseudo-codeword coordinates"
    # Every returned point lies in the fundamental polytope: check-local
    # LP constraints hold (within tolerance).
    dec = LPDecoder(hamming.graph, allow_pseudo=True)
    for z in lp_pcws:
        assert (dec.a_ub @ z <= dec.b_ub + 1e-6).all()
        assert (z >= -1e-9).all() and (z <= 1 + 1e-9).all()
    # Mutual distinctness under the reference's tol.
    for i in range(len(lp_pcws)):
        for j in range(i + 1, len(lp_pcws)):
            assert np.max(np.abs(lp_pcws[i] - lp_pcws[j])) > 1e-3

    admm_pcws = find_pcws(hamming, y, decoder="ADMM", tries=256, seed=0,
                          exclude=x[None, :])
    assert admm_pcws.shape[0] >= 1
