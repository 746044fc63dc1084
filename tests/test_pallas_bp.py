"""Fused Pallas MSA kernel vs the XLA incidence route.

On the chip the two produced bit-identical decisions AND iteration
counts over 16384 words at 3 dB (and identical steady-state error
tallies over 20 chunks), at 532k vs 378k cw/s. These CPU tests run the
kernel through the Pallas interpreter on small batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_decoders_tpu.channels import biawgn
from ldpc_decoders_tpu.codes import get_code
from ldpc_decoders_tpu.decoders.bp import BPDecoder
from ldpc_decoders_tpu.ops.pallas_bp import msa_decode_pallas, slot_tables


@pytest.fixture(scope="module")
def code():
    return get_code("1200_3_6_ldpc")


def test_pallas_matches_incidence(code):
    B = 256
    key = jax.random.PRNGKey(7)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 3.0)
    llr = biawgn.llr(y, 3.0)

    ref = BPDecoder(code.graph, "MSA", max_iter=10,
                    msg_dtype=jnp.bfloat16, check_init=False,
                    perm="incidence")
    xr, ir = jax.jit(ref.decode)(llr)

    a_tab, h_tab = slot_tables(code.graph)
    xp, ip = msa_decode_pallas(a_tab, h_tab, llr.astype(jnp.float32),
                               max_iter=10, check_init=False,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ip))


def test_pallas_check_init_pre_exit(code):
    # Bit-input-style LLRs whose hard decision is already a codeword
    # must exit with zero iterations when check_init=True.
    B = 128
    llr = jnp.full((B, code.get_n()), 4.0, jnp.float32)  # all-zero cw
    a_tab, h_tab = slot_tables(code.graph)
    x, it = msa_decode_pallas(a_tab, h_tab, llr, max_iter=10,
                              check_init=True, interpret=True)
    assert (np.asarray(x) == 0).all()
    assert (np.asarray(it) == 0).all()


def test_pallas_guards():
    irr = get_code("1200_rho_x5_rand_ldpc_1")
    with pytest.raises(ValueError):
        slot_tables(irr.graph)  # padded slots -> refuse
    reg = get_code("1200_3_6_ldpc")
    with pytest.raises(ValueError):
        # Kernels exist for bf16 (fast) and f32 (exact) messages only.
        BPDecoder(reg.graph, "SPA", perm="pallas",
                  msg_dtype=jnp.float16)


def test_pallas_bec_spa_bit_equal(code):
    """Ternary dynamics are integer-exact, so the fused BEC kernel must
    be bit-equal to BECSPADecoder — decisions and iteration counts."""
    from ldpc_decoders_tpu.channels import bec
    from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder

    B = 256
    key = jax.random.PRNGKey(3)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = bec.send(key, xw, 0.4)

    ref = BECSPADecoder(code.graph, max_iter=10)
    xr, ir = jax.jit(ref.decode)(y)
    pal = BECSPADecoder(code.graph, max_iter=10, perm="pallas")
    xp, ip = pal.decode(y)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ip))


def test_pallas_bec_spa_stopping_set(code):
    """A word caught in a stopping set must freeze with erasures left
    (bec.py:120 semantics) — identical on both routes."""
    from ldpc_decoders_tpu.channels import bec
    from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder

    B = 256
    key = jax.random.PRNGKey(9)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = bec.send(key, xw, 0.45)      # above threshold: stopping sets

    ref = BECSPADecoder(code.graph, max_iter=200)
    xr, ir = jax.jit(ref.decode)(y)
    pal = BECSPADecoder(code.graph, max_iter=200, perm="pallas")
    xp, ip = pal.decode(y)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ip))
    assert (np.asarray(xp) == 2).any(), "expected surviving erasures"


def test_pallas_spa_saturate_matches_incidence(code):
    """Saturate-policy SPA kernel vs the XLA incidence route: same
    prefix/suffix fold ordering in the check node, so decisions should
    agree except at f32 marginal-sum knife edges."""
    B = 256
    key = jax.random.PRNGKey(11)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 3.0)
    llr = biawgn.llr(y, 3.0)

    ref = BPDecoder(code.graph, "SPA", max_iter=10,
                    msg_dtype=jnp.bfloat16, check_init=False,
                    perm="incidence", inf_policy="saturate")
    xr, ir = jax.jit(ref.decode)(llr)
    pal = BPDecoder(code.graph, "SPA", max_iter=10,
                    msg_dtype=jnp.bfloat16, check_init=False,
                    perm="pallas", inf_policy="saturate")
    xp, ip = pal.decode(llr)
    assert (np.asarray(xr) == np.asarray(xp)).mean() >= 0.9999
    wr = (np.asarray(xr) != 0).any(1)
    wp = (np.asarray(xp) != 0).any(1)
    assert (wr == wp).mean() >= 0.99


def test_pallas_spa_refmode_matches_incidence(code):
    """Reference-inf-policy SPA kernel vs the XLA refmode route, at a
    low crossover on the BSC where the inf/NaN cascade is active (the
    regime the policy exists for)."""
    from ldpc_decoders_tpu.channels import bsc

    B = 256
    key = jax.random.PRNGKey(5)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = bsc.send(key, xw, 0.05)
    llr = bsc.llr(y, 0.05)

    ref = BPDecoder(code.graph, "SPA", max_iter=30,
                    msg_dtype=jnp.bfloat16, perm="incidence",
                    inf_policy="reference")
    xr, ir = jax.jit(ref.decode)(llr)
    pal = BPDecoder(code.graph, "SPA", max_iter=30,
                    msg_dtype=jnp.bfloat16, perm="pallas",
                    inf_policy="reference")
    xp, ip = pal.decode(llr)
    assert (np.asarray(xr) == np.asarray(xp)).mean() >= 0.999
    wr = (np.asarray(xr) != 0).any(1)
    wp = (np.asarray(xp) != 0).any(1)
    assert (wr == wp).mean() >= 0.99


def test_pallas_admm_matches_xla(code):
    """Fused ADMM kernel vs the XLA gather route: f32-fidelity hi/lo
    split dots keep the trajectories aligned — decisions and iteration
    counts must agree except at knife-edge convergence boundaries."""
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    B = 128
    key = jax.random.PRNGKey(13)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 3.0)
    llr = biawgn.llr(y, 3.0)

    ref = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=30)
    xr, ir = jax.jit(ref.decode)(llr)
    pal = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=30,
                      perm="pallas")
    xp, ip = pal.decode(llr)
    assert (np.asarray(xr) == np.asarray(xp)).mean() >= 0.999
    assert (np.asarray(ir) == np.asarray(ip)).mean() >= 0.95


def test_pallas_vmem_guard():
    """Auto-select must not pick the pallas route for codes whose
    resident tables exceed VMEM (margulis A table ~42 MB)."""
    from ldpc_decoders_tpu.ops.pallas_bp import tables_fit_vmem

    assert tables_fit_vmem(get_code("1200_3_6_ldpc").graph)
    assert not tables_fit_vmem(get_code("margulis").graph)


def test_pallas_msa_exact_f32_matches_incidence_bsc(code):
    """exact_f32 kernel vs XLA incidence float32 (Precision.HIGHEST) on
    the tie-structured BSC workload where bf16 messages are known-unsafe
    (WER curve shifts ~10 sigma). The 3-term split hops reconstruct
    every f32 value exactly; the only remaining freedom is the
    per-variable SUMMATION ORDER of the marginal (slot-major in the
    kernel vs check-major in the incidence dot), which flips the odd
    tie at deep-tie operating points. That jitter is inherent to f32 on
    this workload — the repo's own XLA routes (gather/matmul vs
    incidence) show the same few-per-thousand divergence at p=0.02
    (tests/test_decoders_oracle.py::test_bp_f32_routes_tie_jitter_bound)
    — so the bar here is the one those routes hold each other to:
    decisions equal on >=99% of words, iteration counts on >=97%."""
    from ldpc_decoders_tpu.channels import bsc

    B = 256
    key = jax.random.PRNGKey(11)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    for p in (0.02, 0.06):
        y = bsc.send(jax.random.fold_in(key, int(p * 1000)), xw, p)
        llr = bsc.llr(y, p)

        ref = BPDecoder(code.graph, "MSA", max_iter=10,
                        msg_dtype=jnp.float32, check_init=False,
                        perm="incidence")
        xr, ir = jax.jit(ref.decode)(llr)

        a_tab, h_tab = slot_tables(code.graph)
        xp, ip = msa_decode_pallas(a_tab, h_tab,
                                   llr.astype(jnp.float32),
                                   max_iter=10, check_init=False,
                                   interpret=True, exact_f32=True)
        dec_mism = int((np.asarray(xr) != np.asarray(xp))
                       .any(axis=1).sum())
        assert dec_mism <= 0.01 * B, (p, dec_mism)
        it_mism = int((np.asarray(ir) != np.asarray(ip)).sum())
        assert it_mism <= 0.03 * B, (p, it_mism)
        assert int(np.abs(np.asarray(ir) - np.asarray(ip)).max()) <= 3


def test_pallas_msa_exact_f32_decoder_route(code):
    """BPDecoder(perm='pallas', msg_dtype=float32) routes MSA to the
    exact kernel and matches the f32 incidence route on biAWGN too."""
    B = 192
    key = jax.random.PRNGKey(13)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 2.0)
    llr = biawgn.llr(y, 2.0)
    dp = BPDecoder(code.graph, "MSA", max_iter=10,
                   msg_dtype=jnp.float32, check_init=False, perm="pallas")
    dx = BPDecoder(code.graph, "MSA", max_iter=10,
                   msg_dtype=jnp.float32, check_init=False,
                   perm="incidence")
    xp, ip = jax.jit(dp.decode)(llr)
    xr, ir = jax.jit(dx.decode)(llr)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ip))


def test_pallas_spa_exact_f32_kernels_bsc(code):
    """Exact-f32 SPA kernels (saturate + reference policy) vs their XLA
    f32 incidence routes on the BSC. In the interpreter the transcendental
    (_phi) implementations coincide with the XLA routes', so agreement
    should be at least as tight as the bf16 kernels' statistical bar."""
    from ldpc_decoders_tpu.channels import bsc

    B = 128
    key = jax.random.PRNGKey(5)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = bsc.send(key, xw, 0.05)
    llr = bsc.llr(y, 0.05)

    for policy in ("saturate", "reference"):
        ref = BPDecoder(code.graph, "SPA", max_iter=20,
                        msg_dtype=jnp.float32, perm="incidence",
                        inf_policy=policy)
        xr, ir = jax.jit(ref.decode)(llr)
        pal = BPDecoder(code.graph, "SPA", max_iter=20,
                        msg_dtype=jnp.float32, perm="pallas",
                        inf_policy=policy)
        xp, ip = pal.decode(llr)
        bit_agree = (np.asarray(xr) == np.asarray(xp)).mean()
        word_r = (np.asarray(xr) != 0).any(1)
        word_p = (np.asarray(xp) != 0).any(1)
        assert bit_agree >= 0.999, (policy, bit_agree)
        assert (word_r == word_p).mean() >= 0.99, policy


def test_pallas_admm_factored_bit_equal_dense(code):
    """Digit-factorized hops vs dense one-hot hops on the same graph:
    the group mask only zeroes terms the dense contraction also zeroes,
    in the same contraction order, so factored ADMM must be BIT-equal
    to the dense kernel — decisions and iteration counts."""
    from ldpc_decoders_tpu.ops.pallas_bp import (
        admm_decode_pallas,
        admm_decode_pallas_factored,
        slot_tables_factored,
    )

    B = 64
    key = jax.random.PRNGKey(17)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 3.0)
    llr = biawgn.llr(y, 3.0).astype(jnp.float32)

    a_tab, _ = slot_tables(code.graph)
    l_tab, m_tab, _ = slot_tables_factored(code.graph)
    kw = dict(mu=3.0, eps=1e-5, max_iter=30, n_edge=code.graph.n_edge,
              var_deg=3, interpret=True)
    xd, it_d = admm_decode_pallas(a_tab, llr, **kw)
    xf, it_f = admm_decode_pallas_factored(l_tab, m_tab, code.get_n(),
                                           llr, **kw)
    np.testing.assert_array_equal(np.asarray(xd), np.asarray(xf))
    np.testing.assert_array_equal(np.asarray(it_d), np.asarray(it_f))


def test_pallas_admm_factored_margulis_matches_xla():
    """Margulis (dense tables ~42 MB, VMEM-ineligible) through the
    factored fused kernel vs the XLA gather route — same trajectory
    bar as the dense kernel test."""
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
    from ldpc_decoders_tpu.ops.pallas_bp import factored_tables_fit_vmem

    mar = get_code("margulis")
    assert factored_tables_fit_vmem(mar.graph)
    B = 16
    key = jax.random.PRNGKey(19)
    xw = jnp.zeros((B, mar.get_n()), jnp.int32)
    y = biawgn.send(key, xw, 3.0)
    llr = biawgn.llr(y, 3.0)

    ref = ADMMDecoder(mar.graph, mu=3.0, eps=1e-5, max_iter=20)
    xr, ir = jax.jit(ref.decode)(llr)
    pal = ADMMDecoder(mar.graph, mu=3.0, eps=1e-5, max_iter=20,
                      perm="pallas")
    assert pal._pallas_a is None and pal._pallas_lm is not None
    xp, ip = pal.decode(llr)
    assert (np.asarray(xr) == np.asarray(xp)).mean() >= 0.999
    assert (np.asarray(ir) == np.asarray(ip)).mean() >= 0.9


def test_pallas_bp_factored_margulis_matches_xla():
    """Margulis BP through the digit-factorized fused kernels vs the
    XLA routes: MSA (exact-f32) decisions and iteration counts must be
    bit-equal modulo float-sum grouping (same bar as the dense kernel);
    the ternary BEC kernel is integer-exact, so strictly bit-equal."""
    from ldpc_decoders_tpu.channels import bec, bsc
    from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder

    mar = get_code("margulis")
    B = 8
    key = jax.random.PRNGKey(23)
    xw = jnp.ones((B, mar.get_n()), jnp.int32)
    y = bsc.send(key, xw, 0.05)
    llr = bsc.llr(y, 0.05)

    pal = BPDecoder(mar.graph, "MSA", max_iter=5, perm="pallas",
                    msg_dtype=jnp.float32)
    assert pal._pallas_fac
    xp, ip = pal.decode(llr)
    ref = BPDecoder(mar.graph, "MSA", max_iter=5)
    xr, ir = ref.decode(llr)
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ir))

    yb = bec.send(key, xw, 0.4)
    palb = BECSPADecoder(mar.graph, max_iter=5, perm="pallas")
    assert palb._pallas_fac
    xpb, ipb = palb.decode(yb)
    xrb, irb = BECSPADecoder(mar.graph, max_iter=5).decode(yb)
    np.testing.assert_array_equal(np.asarray(xpb), np.asarray(xrb))
    np.testing.assert_array_equal(np.asarray(ipb), np.asarray(irb))


@pytest.mark.parametrize("policy", ["saturate", "reference"])
def test_pallas_spa_factored_margulis(policy):
    """Factored SPA kernels (both inf policies) on margulis vs the XLA
    refmode/saturate decoders."""
    from ldpc_decoders_tpu.channels import bsc

    mar = get_code("margulis")
    B = 8
    key = jax.random.PRNGKey(29)
    xw = jnp.zeros((B, mar.get_n()), jnp.int32)
    y = bsc.send(key, xw, 0.05)
    llr = bsc.llr(y, 0.05)

    pal = BPDecoder(mar.graph, "SPA", max_iter=4, perm="pallas",
                    msg_dtype=jnp.float32, inf_policy=policy)
    assert pal._pallas_fac
    xp, ip = pal.decode(llr)
    ref = BPDecoder(mar.graph, "SPA", max_iter=4, inf_policy=policy)
    xr, ir = ref.decode(llr)
    mism = (np.asarray(xp) != np.asarray(xr)).any(axis=1).sum()
    assert mism == 0, f"{mism} words differ"
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ir))


def test_pallas_bp_factored_multi_cap_matches_per_cap():
    """Factored multi-cap snapshots == separate factored decodes."""
    from ldpc_decoders_tpu.channels import bsc

    mar = get_code("margulis")
    caps = [1, 2, 4]
    key = jax.random.PRNGKey(31)
    xw = jnp.ones((4, mar.get_n()), jnp.int32)
    llr = bsc.llr(bsc.send(key, xw, 0.06), 0.06)
    dec = BPDecoder(mar.graph, "MSA", max_iter=caps[-1], perm="pallas",
                    msg_dtype=jnp.float32)
    xs, its = dec.decode_multi_cap(llr, caps)
    for k, cap in enumerate(caps):
        d1 = BPDecoder(mar.graph, "MSA", max_iter=cap, perm="pallas",
                       msg_dtype=jnp.float32)
        xr, ir = d1.decode(llr)
        np.testing.assert_array_equal(np.asarray(xs[k]), np.asarray(xr))
        np.testing.assert_array_equal(np.asarray(its[k]), np.asarray(ir))


def test_pallas_admm_bec_convergence_matches_gather(code):
    """BEC ADMM pins the LOSSLESS hop requirement: the convergence test
    compares ||x_e - z||^2 against eps^2 = 1e-10 per edge, so even the
    ~2^-17 relative residue of a 2-term hi/lo split floors the distance
    at the threshold scale and visibly shifts the waterfall (chip-found:
    margulis eps=0.4 WER 0.0131 vs golden 0.0080). With the 3-term
    split the fused route must track the gather route's decisions AND
    iteration counts on erasure LLRs."""
    from ldpc_decoders_tpu.channels import bec
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    B = 32
    key = jax.random.PRNGKey(41)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    y = bec.send(key, xw, 0.35)
    # BEC LLR adapter: erasure -> 0, known -> +-1e8 (ref bec.py:41-42).
    llr = jnp.where(y == 2, 0.0, jnp.where(y == 0, 1e8, -1e8))

    ref = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=50)
    xr, ir = jax.jit(ref.decode)(llr)
    pal = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=50,
                      perm="pallas")
    xp, ip = pal.decode(llr)
    assert (np.asarray(xr) == np.asarray(xp)).mean() >= 0.999
    assert (np.asarray(ir) == np.asarray(ip)).mean() >= 0.9


def test_pallas_admm_presort_bit_identical(code):
    """Probe-and-sort (cap-bound throughput fix, scripts/mar_admm_probe)
    is a pure permutation: outputs must be BIT-identical to the unsorted
    fused decode — per-word trajectories are independent of block
    grouping, and the sort/unsort round-trips exactly."""
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    B = 96  # not a block multiple: exercises the pad+sort interaction
    key = jax.random.PRNGKey(17)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    llr = biawgn.llr(biawgn.send(key, xw, 2.0), 2.0)

    off = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=40,
                      perm="pallas", presort="off")
    on = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=40,
                     perm="pallas", presort="on")
    xo, io_ = off.decode(llr)
    xn, in_ = on.decode(llr)
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(xn))
    np.testing.assert_array_equal(np.asarray(io_), np.asarray(in_))
    # auto: engages only at deep caps (the probe must be small vs the
    # tail), so the flagship cap-50 campaigns are untouched.
    assert not ADMMDecoder(code.graph, max_iter=50,
                           perm="pallas")._presort_active()
    assert ADMMDecoder(code.graph, max_iter=0, iter_cap=2000,
                       perm="pallas")._presort_active()


def test_pallas_admm_presort_auto_gate_bit_identical(code):
    """The 'auto' mini-probe gate (lax.cond between sorted and plain
    paths) is throughput-only: outputs identical to presort='off'."""
    from ldpc_decoders_tpu.decoders.admm import ADMMDecoder

    B = 64
    key = jax.random.PRNGKey(23)
    xw = jnp.zeros((B, code.get_n()), jnp.int32)
    llr = biawgn.llr(biawgn.send(key, xw, 2.0), 2.0)

    auto = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=0,
                       iter_cap=1200, perm="pallas")
    assert auto._presort_active()
    off = ADMMDecoder(code.graph, mu=3.0, eps=1e-5, max_iter=0,
                      iter_cap=1200, perm="pallas", presort="off")
    xa, ia = auto.decode(llr)
    xo, io_ = off.decode(llr)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(xo))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(io_))
