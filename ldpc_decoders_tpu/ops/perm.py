"""One-hot matrices that turn Tanner-graph data movement into MXU work.

Layout permutations, per-node aggregations and the syndrome check are all
sparse 0/1 linear maps over the padded layouts; materializing them as
dense one-hot matrices and multiplying on the MXU measures ~1.8x the
index-gather path on a v5e for codes whose E^2 matrices fit comfortably
(bit-identical results — each output row has exactly one, or per-node
degree-many, unit coefficients). Decoders auto-select this route below
``MATMUL_PERM_MAX_EDGES`` edges and fall back to gathers beyond it.
"""

from __future__ import annotations

import numpy as np

# Budget for the two dense permutation matrices, measured in PADDED slots
# (n_chk*max_chk_deg / n_var*max_var_deg — what actually sizes the
# matrices; for irregular codes the padded layout is 2-3x n_edge, so
# gating on raw edge count would silently pick an oversized matmul route).
# At 8192 slots the matrices are ~260 MB bf16 / ~520 MB f32 — comfortable
# on 16 GB HBM; gathers take over beyond it.
MATMUL_PERM_MAX_EDGES = 8192
# The incidence route's matrices are [C*Dc, V] — avg-var-degree times
# smaller than the E x E permutations — so it stays affordable further
# out (margulis: 2 x 84 MB f32 vs 2 x 1 GB for E x E).
INCIDENCE_MAX_SLOTS = 16384


def padded_slots(graph) -> int:
    return max(graph.n_chk * graph.max_chk_deg,
               graph.n_var * graph.max_var_deg)


def use_matmul(graph) -> bool:
    return padded_slots(graph) <= MATMUL_PERM_MAX_EDGES


def use_incidence(graph) -> bool:
    return padded_slots(graph) <= INCIDENCE_MAX_SLOTS


def perm_chk_to_var(graph) -> np.ndarray:
    """[C*Dc, V*Dv] one-hot: chk-layout flat -> var-layout flat."""
    nc = graph.n_chk * graph.max_chk_deg
    nv = graph.n_var * graph.max_var_deg
    vfc = np.asarray(graph.var_slot_from_chk)
    P = np.zeros((nc, nv), np.float32)
    real = vfc < nc
    P[vfc[real], np.nonzero(real)[0]] = 1.0
    return P


def perm_var_to_chk(graph) -> np.ndarray:
    """[V*Dv, C*Dc] one-hot: var-layout flat -> chk-layout flat."""
    nc = graph.n_chk * graph.max_chk_deg
    nv = graph.n_var * graph.max_var_deg
    cfv = np.asarray(graph.chk_slot_from_var)
    P = np.zeros((nv, nc), np.float32)
    real = cfv < nv
    P[cfv[real], np.nonzero(real)[0]] = 1.0
    return P


def var_sum_matrix(graph) -> np.ndarray:
    """[C*Dc, V]: sums chk-layout edge values per variable (pads drop)."""
    nc = graph.n_chk * graph.max_chk_deg
    S = np.zeros((nc, graph.n_var), np.float32)
    S[np.asarray(graph.edge_in_chk), np.asarray(graph.edge_var)] = 1.0
    return S


def var_broadcast_matrix(graph) -> np.ndarray:
    """[V, C*Dc]: broadcasts a per-variable value onto its chk-layout
    edge slots (transpose of var_sum_matrix)."""
    return var_sum_matrix(graph).T.copy()


def parity_matrix_t(graph) -> np.ndarray:
    """[V, C] dense H^T for the MXU syndrome check."""
    H = np.zeros((graph.n_chk, graph.n_var), np.float32)
    H[np.asarray(graph.edge_chk), np.asarray(graph.edge_var)] = 1.0
    return H.T.copy()
