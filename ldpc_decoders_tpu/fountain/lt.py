"""LT fountain codes: robust-soliton sampling + batched incremental
peeling simulation.

Capability parity with reference src/luby.py, which measures how many
received symbols an LT code needs before the peeling (ripple) decoder
succeeds (MacKay Fig 50.4; reference README.md:65-68).

TPU re-design, two inversions of the reference:

1. The reference re-runs the peeling decoder from scratch for every
   prefix length num_sym = k..n (luby.py:52-68) — O(n) restarts. Peeling
   is *confluent* (the residual fixpoint is unique regardless of removal
   order), so the minimal successful prefix can be found with ONE
   incremental process: peel to a fixpoint, and only when stuck activate
   the next symbol. This is both the physical fountain process and
   decidedly cheaper.
2. The reference fans sims out over a multiprocessing.Pool
   (luby.py:153-180) one graph at a time through scipy CSC surgery; here
   a whole batch of sims runs inside one ``lax.while_loop`` over padded
   edge tables ([B, E] static shapes, per-sim done masks), with
   ``segment_sum`` scatter-adds as the peeling primitive. Degrees are
   soliton-distributed (a heavy spike near k/R), so the fixed-width
   gather layout used for LDPC graphs would waste 100x memory here —
   segment reductions are the right TPU shape for this graph family.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ----------------------------------------------------------------------
# Degree distributions (reference luby.py:91-126)
# ----------------------------------------------------------------------

def ideal_soliton(k: int) -> np.ndarray:
    """rho(1) = 1/k, rho(d) = 1/(d(d-1)) for d = 2..k."""
    rho = np.zeros(k)
    rho[0] = 1.0 / k
    d = np.arange(2, k + 1)
    rho[d - 1] = 1.0 / (d * (d - 1.0))
    return rho


def robust_soliton(k: int, c: float, delta: float) -> np.ndarray:
    """Normalized rho + tau with spike at ceil(k/R), R = c*sqrt(k)*ln(k/d)."""
    rho = ideal_soliton(k)
    tau = np.zeros(k)
    R = c * np.sqrt(k) * np.log(k / delta)
    spike = int(np.ceil(k / R))
    d = np.arange(1, spike - 1 + 1)
    tau[d - 1] = R / (k * d)
    tau[spike - 1] = np.log(R / delta) * R / k
    mu = rho + tau
    return mu / mu.sum()


# ----------------------------------------------------------------------
# Generator sampling (host): distinct column supports, soliton weights
# ----------------------------------------------------------------------

def sample_edges(rng: np.random.Generator, omega: np.ndarray, k: int, n: int,
                 e_pad: int):
    """One sim's edge table: (edge_sym [E_pad], edge_var [E_pad], n_edges).

    Column j gets weight w_j ~ omega and a uniformly random w_j-subset of
    the k message bits (reference luby.py:11-26 builds this by shuffling
    dense exact-weight columns; sampling supports directly is equivalent
    and O(sum w) instead of O(k*n)). Padding uses symbol index n, which
    never activates (the prefix is always <= n symbols).
    """
    weights = rng.choice(np.arange(1, k + 1), size=n, p=omega)
    total = int(weights.sum())
    if total > e_pad:
        raise ValueError(f"edge budget {e_pad} < sampled {total}; "
                         "raise e_pad")
    sym = np.repeat(np.arange(n, dtype=np.int32), weights)
    var = np.empty(total, dtype=np.int32)
    pos = 0
    for w in weights:
        var[pos:pos + w] = rng.choice(k, size=w, replace=False)
        pos += w
    edge_sym = np.full(e_pad, n, dtype=np.int32)
    edge_var = np.zeros(e_pad, dtype=np.int32)
    edge_sym[:total] = sym
    edge_var[:total] = var
    return edge_sym, edge_var, total


def default_e_pad(omega: np.ndarray, n: int) -> int:
    d = np.arange(1, omega.size + 1)
    mean = float(omega @ d)
    var = float(omega @ (d - mean) ** 2)
    return int(n * mean + 8.0 * np.sqrt(n * var) + 64)


# ----------------------------------------------------------------------
# Batched incremental peeling under jit
# ----------------------------------------------------------------------

class _State(NamedTuple):
    resolved: jnp.ndarray  # [B, k] bool
    est: jnp.ndarray       # [B, k] int32 recovered bits
    rcv: jnp.ndarray       # [B, n] int32 current symbol values
    m: jnp.ndarray         # [B] int32 active prefix length
    done: jnp.ndarray      # [B] bool
    result: jnp.ndarray    # [B] int32 symbols needed (n on failure)
    it: jnp.ndarray        # scalar int32


@dataclasses.dataclass
class LTSimulator:
    """Batched LT simulation: minimal number of received symbols for a
    successful peeling decode, per sim."""

    k: int
    n: int
    c: float
    delta: float
    e_pad: Optional[int] = None

    def __post_init__(self):
        self.omega = robust_soliton(self.k, self.c, self.delta)
        if self.e_pad is None:
            self.e_pad = default_e_pad(self.omega, self.n)
        self._sim = jax.jit(self._simulate)

    # -- host sampling --------------------------------------------------
    def sample_batch(self, rng: np.random.Generator, batch: int):
        tables = [sample_edges(rng, self.omega, self.k, self.n, self.e_pad)
                  for _ in range(batch)]
        edge_sym = np.stack([t[0] for t in tables])
        edge_var = np.stack([t[1] for t in tables])
        msg = rng.integers(0, 2, size=(batch, self.k)).astype(np.int32)
        return jnp.asarray(edge_sym), jnp.asarray(edge_var), jnp.asarray(msg)

    # -- device decode ----------------------------------------------------
    def _simulate(self, edge_sym, edge_var, msg):
        k, n = self.k, self.n
        B = msg.shape[0]
        valid = edge_sym < n  # [B, E] pad slots use symbol n

        seg_n = jax.vmap(
            lambda data, seg: jax.ops.segment_sum(data, seg, num_segments=n + 1))
        seg_k_max = jax.vmap(
            lambda data, seg: jax.ops.segment_max(data, seg, num_segments=k))

        take_b = jax.vmap(jnp.take)  # per-sim gather

        snt = (seg_n(msg_bits := take_b(msg, edge_var), edge_sym)
               [:, :n] % 2).astype(jnp.int32)

        state = _State(
            resolved=jnp.zeros((B, k), bool),
            est=jnp.zeros((B, k), jnp.int32),
            rcv=snt,
            m=jnp.full((B,), k, jnp.int32),
            done=jnp.zeros((B,), bool),
            result=jnp.full((B,), n, jnp.int32),
            it=jnp.zeros((), jnp.int32),
        )

        sym_idx = jnp.arange(n, dtype=jnp.int32)

        def body(s: _State):
            in_prefix = valid & (edge_sym < s.m[:, None])
            var_resolved = take_b(s.resolved, edge_var)
            edge_active = in_prefix & ~var_resolved               # [B, E]

            # Success first: a fixpoint with no active edges decodes at m.
            success = ~edge_active.any(-1)

            # Degrees over ALL symbols (prefix and future): the prefix part
            # drives the ripple; the future part drives the stuck-jump.
            deg_all = seg_n((valid & ~var_resolved).astype(jnp.int32),
                            edge_sym)[:, :n]
            ripple = (deg_all == 1) & (sym_idx < s.m[:, None])    # [B, n]
            has_ripple = ripple.any(-1)

            # Resolve: each active edge whose symbol is in the ripple
            # carries that symbol's residual value to its variable.
            resolve_edge = edge_active & take_b(ripple, edge_sym)
            carried = jnp.where(resolve_edge, take_b(s.rcv, edge_sym), -1)
            newval = seg_k_max(carried, edge_var)                 # [B, k]
            newly = newval >= 0
            est = jnp.where(newly, newval, s.est)
            resolved = s.resolved | newly

            # XOR each newly-resolved bit into EVERY symbol containing it
            # (also symbols beyond the prefix: they arrive pre-reduced).
            xor_edge = valid & take_b(newly, edge_var)
            contrib = seg_n((xor_edge * take_b(est, edge_var)).astype(
                jnp.int32), edge_sym)[:, :n]
            rcv = (s.rcv + contrib) % 2

            # No ripple and not successful: jump the prefix forward. A
            # stuck fixpoint cannot be cured by symbols of unresolved
            # degree != 1 (they only ADD active edges), so the minimal
            # successful prefix extends exactly to the first future symbol
            # with current degree 1 — activating the ones in between one
            # at a time (reference luby.py:52-70) provably yields the same
            # num_sym; the jump removes O(n-k) loop iterations. No such
            # symbol: failure with result = n (like the reference).
            grow = ~s.done & ~success & ~has_ripple
            nxt = jnp.min(jnp.where((deg_all == 1)
                                    & (sym_idx >= s.m[:, None]),
                                    sym_idx, n), axis=-1)         # [B]
            m = jnp.where(grow & (nxt < n), nxt + 1, s.m)
            fail = grow & (nxt >= n)

            act = ~s.done
            act2 = act[:, None]
            return _State(
                resolved=jnp.where(act2, resolved, s.resolved),
                est=jnp.where(act2, est, s.est),
                rcv=jnp.where(act2, rcv, s.rcv),
                m=jnp.where(act, m, s.m),
                done=s.done | (act & (success | fail)),
                result=jnp.where(act & success, s.m, s.result),
                it=s.it + 1,
            )

        def cond(s: _State):
            # Every iteration peels a round or activates a symbol, so the
            # process terminates within n - k + k + n rounds; cap at 4n.
            return (s.it < 4 * n) & ~s.done.all()

        final = lax.while_loop(cond, body, state)
        return final.result, final.est, final.resolved

    # -- public API -------------------------------------------------------
    def run(self, rng: np.random.Generator, batch: int):
        """Returns (num_symbols [B], est [B,k], resolved [B,k])."""
        edge_sym, edge_var, msg = self.sample_batch(rng, batch)
        res, est, resolved = self._sim(edge_sym, edge_var, msg)
        return np.asarray(res), np.asarray(est), np.asarray(resolved)


# ----------------------------------------------------------------------
# CLI (reference luby.py:142-180): python -m ldpc_decoders_tpu.fountain.lt
# ----------------------------------------------------------------------

def main(argv=None):
    import argparse
    import logging

    from ldpc_decoders_tpu.harness.saver import Saver
    from ldpc_decoders_tpu.utils.file import resolve_data_dir_os

    p = argparse.ArgumentParser(description="LT fountain-code simulation")
    p.add_argument("k", type=int)
    p.add_argument("n", type=int)
    p.add_argument("c", type=float)
    p.add_argument("delta", type=float)
    p.add_argument("count", type=int)
    p.add_argument("--batch", type=int, default=64,
                   help="sims per compiled device batch "
                        "(replaces the reference --pool)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir",
                   default=resolve_data_dir_os("decoders") + "/data")
    p.add_argument("--console", action="store_true")
    args = p.parse_args(argv)

    logging.basicConfig(format="%(name)s|%(message)s", level=logging.INFO)
    id_keys = ["k", "n", "c", "delta"]
    id_val = [str(vars(args)[key]) for key in id_keys]
    saver = Saver(args.data_dir, list(zip(["type"] + id_keys,
                                          ["luby"] + id_val)))
    log = logging.getLogger(".".join(id_val))

    sim = LTSimulator(args.k, args.n, args.c, args.delta)
    rng = np.random.default_rng(args.seed)
    arr = []
    while len(arr) < args.count:
        res, _, _ = sim.run(rng, min(args.batch, args.count - len(arr)))
        arr.extend(int(r) for r in res)
        log.info("sims=%d mean=%.1f std=%.1f", len(arr),
                 float(np.mean(arr)), float(np.std(arr)))
        saver.add_all({"arr": arr})
    log.info("Finished all!")


if __name__ == "__main__":
    main()
