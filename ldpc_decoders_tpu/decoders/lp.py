"""Feldman LP decoding (host-side).

Capability parity with reference src/lp.py. The LP relaxation has
2^(deg-1) forbidden-set constraints per check (lp.py:13-28), exponential
in check degree, so like the reference it is practical only for short
codes (Hamming scale — reference README.md:6 restricts LP/ML likewise).
It therefore stays a host-side scipy solve rather than an on-device
kernel; the batched polytope machinery for long codes is the ADMM decoder.

Constraint system: for every check c and every odd-cardinality subset S of
its neighborhood N(c):  sum_{i in S} x_i - sum_{i in N(c)\\S} x_i <= |S|-1,
with 0 <= x <= 1; objective min gamma.x (gamma = channel LLRs).
"""

from __future__ import annotations

import numpy as np

from ldpc_decoders_tpu.utils.math import binary_vectors, pseudo_to_cw


def build_constraints(parity_mtx: np.ndarray) -> tuple:
    """Stack the odd-subset constraints for all checks: (A_ub, b_ub)."""
    H = np.asarray(parity_mtx)
    blocks, bounds = [], []
    for row in H:
        nbr = np.flatnonzero(row)
        subsets = binary_vectors(nbr.size)
        odd = subsets[subsets.sum(axis=1) % 2 == 1]
        block = np.zeros((odd.shape[0], H.shape[1]), dtype=np.int64)
        block[:, nbr] = 2 * odd - 1
        blocks.append(block)
        bounds.append(odd.sum(axis=1) - 1)
    return np.concatenate(blocks, axis=0), np.concatenate(bounds, axis=0)


class LPDecoder:
    """Host-side Feldman LP decoder over a compiled Tanner graph."""

    id_keys = ["max_iter", "allow_pseudo"]
    host_only = True

    def __init__(self, graph, max_iter: int = 10, allow_pseudo: bool = False,
                 **_):
        import numpy as np  # noqa: F811 (kept local-importable for clarity)

        self.graph = graph
        self.max_iter = int(max_iter)
        self.allow_pseudo = bool(allow_pseudo)
        H = np.zeros((graph.n_chk, graph.n_var), dtype=np.int64)
        H[np.asarray(graph.edge_chk), np.asarray(graph.edge_var)] = 1
        self.a_ub, self.b_ub = build_constraints(H)

    def decode_one(self, gamma: np.ndarray) -> np.ndarray:
        from scipy.optimize import linprog

        res = linprog(gamma, A_ub=self.a_ub, b_ub=self.b_ub, bounds=(0, 1),
                      method="highs")
        return pseudo_to_cw(res.x, self.allow_pseudo, eps=1e-4)

    def decode_batch(self, gammas: np.ndarray) -> np.ndarray:
        return np.stack([self.decode_one(g) for g in np.asarray(gammas)])
