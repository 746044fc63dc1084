"""LT fountain-code tests: the batched incremental peeling simulator is
cross-checked against an independent host-side restart-based peeling
decoder (peeling is confluent, so the minimal successful prefix must
match exactly, sim by sim)."""

import numpy as np
import pytest

from ldpc_decoders_tpu.fountain import LTSimulator, ideal_soliton, robust_soliton


def host_min_symbols(edge_sym, edge_var, msg, k, n):
    """Restart peeling per prefix (shape of reference luby.py:52-88,
    re-derived independently): smallest m in [k, n] whose prefix decodes;
    n on failure."""
    cols = [[] for _ in range(n)]
    for s, v in zip(edge_sym, edge_var):
        if s < n:
            cols[s].append(v)
    snt = [int(np.bitwise_xor.reduce(msg[c]) if c else 0) for c in cols]

    def peel(m):
        work = [set(cols[j]) for j in range(m)]
        rcv = [snt[j] for j in range(m)]
        while True:
            ripple = [j for j in range(m) if len(work[j]) == 1]
            if not ripple:
                return all(len(w) == 0 for w in work)
            v = next(iter(work[ripple[0]]))
            val = rcv[ripple[0]]
            for j in range(m):
                if v in work[j]:
                    work[j].remove(v)
                    rcv[j] ^= val

    for m in range(k, n + 1):
        if peel(m):
            return m
    return n


def test_soliton_distributions():
    k = 100
    rho = ideal_soliton(k)
    assert abs(rho.sum() - 1.0) < 1e-12
    mu = robust_soliton(k, 0.1, 0.5)
    assert abs(mu.sum() - 1.0) < 1e-12
    assert (mu >= 0).all()
    # Robust soliton has its spike at ceil(k/R).
    R = 0.1 * np.sqrt(k) * np.log(k / 0.5)
    spike = int(np.ceil(k / R))
    assert mu[spike - 1] > mu[spike]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_restart_peeling(seed):
    k, n = 30, 70
    sim = LTSimulator(k, n, c=0.1, delta=0.5, seg_iters=17)  # force resume
    rng = np.random.default_rng(seed)
    tables = sim.sample_batch(rng, batch=16)
    res, est, resolved = sim.simulate(tables)
    res = np.asarray(res)
    for b in range(16):
        expect = host_min_symbols(np.asarray(tables["edge_sym"][b]),
                                  np.asarray(tables["edge_var"][b]),
                                  np.asarray(tables["msg"][b]), k, n)
        assert res[b] == expect, (b, res[b], expect)


def test_recovered_bits_are_correct():
    k, n = 40, 100
    sim = LTSimulator(k, n, c=0.1, delta=0.5)
    rng = np.random.default_rng(3)
    tables = sim.sample_batch(rng, 8)
    res, est, resolved = sim.simulate(tables)
    est, resolved, msg = map(np.asarray, (est, resolved, tables["msg"]))
    assert resolved.any()
    np.testing.assert_array_equal(est[resolved], msg[resolved])


def test_statistics_plausible():
    """Overhead statistics: mean symbols needed is a bit above k and far
    below n for a working robust-soliton code."""
    k, n = 100, 220
    sim = LTSimulator(k, n, c=0.1, delta=0.5)
    rng = np.random.default_rng(4)
    res, _, _ = sim.run(rng, 64)
    assert k <= res.min() and res.mean() < 1.6 * k, (res.mean(), res.max())
