"""Density-evolution and irregular-design tests against textbook anchors:
the (3,6)-regular BEC BP threshold is ~0.4294 (Modern Coding Theory), and
a rate-1/2 lambda optimized for rho(x)=x^5 must close most of the gap to
the eps=0.5 capacity (reference ldpc.py solves the same LP)."""

import numpy as np
import pytest

from ldpc_decoders_tpu.design import (
    Dist,
    gen_rand_irg_ldpc,
    rate_from_polys,
    reg_pol,
    solve_dist,
    solve_eps_bp,
)
from ldpc_decoders_tpu.design.density_evolution import sample_irregular_parity


def test_36_regular_threshold():
    # lambda(x)=x^2, rho(x)=x^5.
    eps = solve_eps_bp(reg_pol(2), reg_pol(5))
    assert abs(eps - 0.4294) < 2e-3, eps


def test_rate_formula():
    assert abs(rate_from_polys(reg_pol(2), reg_pol(5)) - 0.5) < 1e-12


def test_solve_dist_rate_and_threshold():
    d = solve_dist("rho5", 0.5, reg_pol(5))
    assert abs(d.rate - 0.5) < 1e-3
    # Optimized irregular threshold beats (3,6)-regular's 0.4294 and
    # cannot exceed capacity 0.5. Reference's l_max=8 optimum is 0.4810
    # (ldpc.py:160, MCT p.115); l_max=40 should do at least as well.
    assert 0.45 < d.thresh < 0.5, d.thresh
    # lambda is a probability vector over edge degrees.
    assert abs(sum(d.lambda_p) - 1.0) < 1e-6
    assert all(c >= -1e-9 for c in d.lambda_p)


def test_sample_irregular_parity_structure():
    d = solve_dist("rho5", 0.5, reg_pol(5))
    rng = np.random.default_rng(0)
    H = sample_irregular_parity(rng, d, num_var=1200)
    # All checks have degree <= 6 (double edges cancel), most exactly 6.
    chk_deg = H.sum(axis=1)
    assert chk_deg.max() <= 6
    assert (chk_deg == 6).mean() > 0.9
    # Rate close to design: m/n ~ 0.5.
    assert abs(1.0 - H.shape[0] / H.shape[1] - 0.5) < 0.03
    # Variable degrees >= 2 mostly; a degree-2 variable whose two sockets
    # hit the same check cancels to 0 (same as the reference's
    # double-edge removal, ldpc.py:189) — rare.
    var_deg = H.sum(axis=0)
    assert (var_deg >= 1).mean() > 0.99
    assert (var_deg >= 2).mean() > 0.95


def test_gen_rand_irg_ldpc_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("FILE_CODES_DIR", str(tmp_path))
    names = gen_rand_irg_ldpc(2, 600, 5, 0.5, seed=1, dir_path=str(tmp_path))
    assert names == ["600_rho_x5_rand_ldpc_1", "600_rho_x5_rand_ldpc_2"]
    from ldpc_decoders_tpu.codes.code import get_code
    code = get_code(names[0])
    assert code.get_n() == 600
    # The sampled code must actually decode on the BEC below threshold.
    import jax
    import jax.numpy as jnp
    from ldpc_decoders_tpu.channels import bec
    dec = bec.DECODERS["SPA"](code, max_iter=50)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((64, 600), jnp.int32)
    y = bec.send(key, x, 0.3)   # well below eps_BP ~ 0.48
    x_hat, _ = dec.decode(y, 0.3, key)
    # Short irregular samples keep a few low-degree variables (same as
    # the reference generator), so WER is dominated by those; BER is the
    # right below-threshold check.
    ber = (np.asarray(x_hat) != 0).mean()
    assert ber < 0.01, ber
