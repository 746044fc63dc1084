"""Parity-polytope projection: JAX kernel vs native C++ oracle vs an exact
optimality certificate.

The certificate: z* is the Euclidean projection of v onto a convex set K
iff <v - z*, w - z*> <= 0 for every w in K; for a polytope it suffices to
check all vertices (here: even-weight binary vectors). This validates both
implementations independently of each other (reference relied on three
hand-checked vectors, exact.py:63-87).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_decoders_tpu import native
from ldpc_decoders_tpu.ops.projection import (
    project_check_rows,
    project_parity_polytope,
)
from ldpc_decoders_tpu.utils.math import binary_vectors


def even_vertices(d: int) -> np.ndarray:
    vs = binary_vectors(d)
    return vs[vs.sum(axis=1) % 2 == 0]


def assert_is_projection(v: np.ndarray, z: np.ndarray, tol=5e-5):
    verts = even_vertices(v.shape[-1]).astype(np.float64)
    # z inside PP_d (up to tol): representable only via the certificate —
    # the variational inequality at every vertex.
    gaps = (verts - z) @ (v - z)
    assert gaps.max() <= tol * max(1.0, np.abs(v).max()), gaps.max()


@pytest.mark.parametrize("d", [2, 3, 4, 6, 7, 8])
def test_matches_native_oracle(d):
    rng = np.random.default_rng(0)
    v = np.concatenate([
        rng.normal(0, 1, (200, d)),
        rng.normal(0.5, 3, (200, d)),
        rng.normal(0, 30, (50, d)),
    ])
    ours = np.asarray(project_parity_polytope(v.astype(np.float32)))
    oracle = native.proj_rows(v)
    np.testing.assert_allclose(ours, oracle, atol=2e-4)


@pytest.mark.parametrize("d", [3, 4, 6, 8])
def test_optimality_certificate(d):
    rng = np.random.default_rng(1)
    v = rng.normal(0.3, 2.0, (300, d))
    ours = np.asarray(project_parity_polytope(v.astype(np.float32)))
    oracle = native.proj_rows(v)
    for i in range(v.shape[0]):
        assert_is_projection(v[i], oracle[i], tol=1e-9)
        assert_is_projection(v[i], ours[i], tol=5e-4)


def test_edge_cases():
    # All-negative -> zero vector (reference projection.cpp:41-46).
    np.testing.assert_allclose(
        np.asarray(project_parity_polytope(
            np.float32([[-3.0, -0.1, -7.0, -2.0]]))), 0.0)
    # All > 1, even length -> all-ones (projection.cpp:47-52).
    np.testing.assert_allclose(
        np.asarray(project_parity_polytope(
            np.float32([[2.0, 1.5, 9.0, 1.1]]))), 1.0)
    # All > 1, odd length -> face of the polytope, one coordinate pulled in.
    v = np.float64([[2.0, 1.5, 9.0]])
    ours = np.asarray(project_parity_polytope(v.astype(np.float32)))[0]
    assert_is_projection(v[0], native.proj_rows(v)[0], tol=1e-9)
    np.testing.assert_allclose(ours, native.proj_rows(v)[0], atol=2e-4)
    # Already inside the polytope -> identity.
    inside = np.float32([[0.5, 0.5, 0.5, 0.5]])
    np.testing.assert_allclose(
        np.asarray(project_parity_polytope(inside)), inside, atol=1e-6)


def test_padding_matches_unpadded():
    """A masked pad slot must not perturb the real coordinates."""
    rng = np.random.default_rng(2)
    d, pad = 5, 3
    v = rng.normal(0.4, 2.0, (100, d)).astype(np.float32)
    direct = np.asarray(project_parity_polytope(v))
    vp = np.concatenate([v, np.zeros((100, pad), np.float32)], axis=1)
    mask = np.concatenate([np.ones((100, d), bool), np.zeros((100, pad), bool)],
                          axis=1)
    padded = np.asarray(project_parity_polytope(vp, mask=mask))
    np.testing.assert_allclose(padded[:, :d], direct, atol=1e-5)
    np.testing.assert_allclose(padded[:, d:], 0.0)


def test_project_check_rows_mixed_degrees():
    """Per-check projection on a code with non-uniform check degrees
    matches the native CSR path (reference proj_csr, exact.py:47-52)."""
    from ldpc_decoders_tpu import get_code

    code = get_code("4_2_test")  # degrees 2, 3, 2
    g = code.graph
    rng = np.random.default_rng(3)
    v = rng.normal(0.5, 1.5, (8, g.n_edge))
    ours = np.asarray(project_check_rows(g, v.astype(np.float32)))

    indptr = np.concatenate([[0], np.cumsum(np.asarray(g.chk_deg))]).astype(
        np.int32)
    for b in range(v.shape[0]):
        oracle = native.proj_csr(indptr, v[b])
        np.testing.assert_allclose(ours[b], oracle, atol=2e-4)


def test_ties_and_duplicates():
    """Rank-based splitting must handle exactly-equal coordinates (the
    pairwise-rank tie-break mirrors a stable descending sort)."""
    vs = [
        np.float64([0.7, 0.7, 0.7, 0.7]),
        np.float64([1.2, 1.2, -0.3, -0.3]),
        np.float64([0.5, 0.5, 0.5]),
        np.float64([2.0, 2.0, 2.0]),
        np.float64([-1.0, -1.0, 0.2, 0.2, 0.9]),
    ]
    for v in vs:
        row = v[None, :]
        ours = np.asarray(project_parity_polytope(
            jnp.asarray(row, jnp.float32)))[0]
        oracle = native.proj_rows(row)[0]
        assert_is_projection(v, ours, tol=5e-4)
        np.testing.assert_allclose(ours, oracle, atol=3e-4)
