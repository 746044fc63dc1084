"""Fused Pallas MSA decoder: the whole BP loop in one kernel.

The XLA incidence route (decoders/bp.py) round-trips every message
tensor through HBM each iteration: v2c read/write + two one-hot matmuls
+ syndrome, ~700 MB of traffic per iteration at batch 16384. This
kernel keeps the entire decode loop VMEM-resident per batch tile: the
one-hot tables load once and stay on-chip, messages live in a bf16
scratch, and HBM sees only the LLR tile in and the decisions out.

Layout: messages are Dc per-slot planes [bs, C] (slot d of check c =
edge (c, d)), so the check-node two-min/sign fold is an unrolled
elementwise pass over Dc planes (VPU, no gathers) and each variable-
side hop is Dc small one-hot matmuls against resident tables:

  A[d]  [C, V] one-hot: slot-d edge of check c -> its variable
  marg  = llr + sum_d  c2v[d] @ A[d]          (edges -> variables)
  edge  = marg @ A[d]^T  per d                (variables -> edges)
  H     [V, C] parity incidence for the syndrome check

Scope: fully regular graphs (every check degree == Dc). Five kernel
families live here — MSA, SPA (saturate and reference inf-policies),
ternary BEC SPA, and ADMM — each in bf16-message and exact-float32
variants where applicable, each with a multi-cap snapshot mode
(``caps=``: one decode, decisions recorded at every iteration cap) and
a digit-factorized table mode (``fac=``: margulis-scale graphs whose
dense one-hots exceed VMEM). Semantics match the XLA decoders:
syndrome pre-check via ``check_init``, per-word done freeze, iteration
counts; equivalence is pinned per-kernel in tests/test_pallas_bp.py
(bit-equality where the arithmetic is exact, the cross-route f32
sum-order jitter bar elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_decoders_tpu.ops.graph import TannerGraph

MSA_DEG1_GUARD = 1e30  # mirrors decoders/bp.py (degree-1 checks only)


def tables_fit_vmem(graph: TannerGraph, budget_bytes: int = 11_000_000):
    """Whether the resident one-hot tables (A [Dc, C, V] + H [V, C],
    bfloat16) leave room in the ~16 MB VMEM for the message scratch and
    live planes. The flagship (1200,3,6) is ~10 MB and fits; margulis
    (2640,1320) is ~42 MB and must stay on the XLA routes."""
    g = graph
    a_bytes = g.max_chk_deg * g.n_chk * g.n_var * 2
    h_bytes = g.n_var * g.n_chk * 2
    return a_bytes + h_bytes <= budget_bytes


def slot_tables(graph: TannerGraph):
    """(A [Dc, C, V] bf16 one-hot slot->variable, H [V, C] bf16)."""
    g = graph
    if not (bool(np.asarray(g.chk_mask).all())
            and bool(np.asarray(g.var_mask).all())):
        raise ValueError("pallas route requires a fully regular graph "
                         "(no padded slots)")
    C, V, Dc = g.n_chk, g.n_var, g.max_chk_deg
    # edge_var indexed by check-layout slot order (c major, d minor).
    edge_var = np.asarray(g.edge_var)
    chk_edge = np.asarray(g.chk_edge).reshape(C, Dc)
    a = np.zeros((Dc, C, V), np.float32)
    h = np.zeros((V, C), np.float32)
    for d in range(Dc):
        v_of_c = edge_var[chk_edge[:, d]]
        a[d, np.arange(C), v_of_c] = 1.0
        h[v_of_c, np.arange(C)] = 1.0
    return jnp.asarray(a, jnp.bfloat16), jnp.asarray(h, jnp.bfloat16)


def factored_tables_fit_vmem(graph: TannerGraph,
                             budget_bytes: int = 11_000_000,
                             lane: int = 128) -> bool:
    """Whether the digit-factorized tables (``slot_tables_factored``)
    fit: L [Dc, C, lane] bf16 + M [Dc, H, C] f32 — V/lane-fold smaller
    than the dense [Dc, C, V] one-hots (margulis: ~2.7 MB vs ~42 MB)."""
    g = graph
    n_grp = -(-g.n_var // lane)
    l_bytes = g.max_chk_deg * g.n_chk * lane * 2
    m_bytes = g.max_chk_deg * n_grp * g.n_chk * 2
    return l_bytes + m_bytes <= budget_bytes


def slot_tables_factored(graph: TannerGraph, lane: int = 128):
    """Digit-factorized one-hot slot tables for graphs whose dense
    [Dc, C, V] one-hots exceed VMEM (margulis 2640x1320 is ~42 MB).

    Write each slot-d edge's variable index as v = lane*h + l. Then the
    dense one-hot hop val [bs,C] @ A_d [C,V] factorizes per group h:

      scatter:  out[:, lane*h:lane*(h+1)] = (val * M_d[h]) @ L_d
      gather:   out = sum_h (x[:, lane*h:lane*(h+1)] @ L_d^T) * M_d[h]

    with L_d[c, l] one-hot on the low digit and M_d[h, c] the 0/1 group
    mask — IDENTICAL MXU FLOPs (H matmuls of lane-wide tiles replace one
    V-wide matmul) and bit-identical f32 results (the group mask only
    zeroes terms the dense contraction also zeroes, in the same
    contraction order), at lane/V the table footprint.

    Returns (L [Dc, C, lane] bf16, M [Dc, H, 1, C] bf16, v_pad) with
    v_pad = H * lane; callers pad the variable axis to v_pad (pad
    variables touch no check, so they are inert). M carries a unit
    sublane axis so an in-kernel M[d, h] slice is 2-D [1, C] — Mosaic
    mishandles bare 1-D lane vectors."""
    g = graph
    if not (bool(np.asarray(g.chk_mask).all())
            and bool(np.asarray(g.var_mask).all())):
        raise ValueError("pallas route requires a fully regular graph "
                         "(no padded slots)")
    C, V, Dc = g.n_chk, g.n_var, g.max_chk_deg
    n_grp = -(-V // lane)
    edge_var = np.asarray(g.edge_var)
    chk_edge = np.asarray(g.chk_edge).reshape(C, Dc)
    lo = np.zeros((Dc, C, lane), np.float32)
    grp = np.zeros((Dc, n_grp, C), np.float32)
    for d in range(Dc):
        v_of_c = edge_var[chk_edge[:, d]]
        lo[d, np.arange(C), v_of_c % lane] = 1.0
        grp[d, v_of_c // lane, np.arange(C)] = 1.0
    # M is 0/1: bf16 is exact and halves its footprint (the factored
    # ADMM kernel sits within ~100 KB of the 16 MB scoped-vmem limit).
    return (jnp.asarray(lo, jnp.bfloat16),
            jnp.asarray(grp[:, :, None, :], jnp.bfloat16), n_grp * lane)


def _bounded_loop(max_iter, body, carry, done_idx):
    """fori_loop with early exit: iterate ``body(it, carry)`` until
    ``max_iter`` or the done plane ``carry[done_idx]`` (float 0/1,
    [bs, C]-shaped) is all ones. Every kernel's body is a no-op for
    finished words (active masks gate all writes), so exiting the moment
    the whole block converges is result-identical — and at low-WER
    operating points, where most words decode in a few iterations, it
    removes the bulk of the fixed-cap work. Returns (t, carry) where t
    is the number of iterations actually run (the early-exit point)."""
    def cond(c):
        return (c[0] < max_iter) & (jnp.min(c[1][done_idx]) < 0.5)

    def wbody(c):
        return (c[0] + 1, body(c[0], c[1]))

    return jax.lax.while_loop(
        cond, wbody, (jnp.zeros((), jnp.int32), carry))


def _onehot_dot(val, a, *, transposed, exact):
    """f32 ``val`` against a bf16 ONE-HOT table, f32 accumulation.

    ``exact=False``: one bf16 dot (input rounded to bf16 — the fast
    route for bf16-message kernels, where val is bf16-valued anyway).

    ``exact=True``: 3-term bf16 split. Every output element of a
    one-hot product selects exactly one input element, so the result is
    s1 + s2 + s3 where val = s1 + s2 + s3 is the split. The split is
    lossless for float32: s1 = bf16(val) leaves a residual with <= 16
    significand bits (Sterbenz-exact subtraction), s2 = bf16(r1) leaves
    <= 8 bits, which s3 = bf16(r2) represents exactly. The explicit
    (d1 + d2) + d3 sum then reconstructs val exactly because every
    partial sum is representable ((s1+s2) spans <= 17 bits; the total
    IS the original float32). Cost: 3 MXU passes instead of 1 — the
    manual analogue of lax.Precision.HIGH, valid here only because the
    table is one-hot (no cross products)."""
    f32 = jnp.float32
    dn = ((((1,), (1,)) if transposed else ((1,), (0,))), ((), ()))

    def one(x):
        return jax.lax.dot_general(x, a, dimension_numbers=dn,
                                   preferred_element_type=f32)

    if not exact:
        return one(val.astype(jnp.bfloat16))
    s1 = val.astype(jnp.bfloat16)
    r1 = val - s1.astype(f32)
    s2 = r1.astype(jnp.bfloat16)
    s3 = (r1 - s2.astype(f32)).astype(jnp.bfloat16)
    return (one(s1) + one(s2)) + one(s3)


def _bp_table_ops(t1_ref, t2_ref, *, Dc, exact_f32, fac, gacc=None,
                  vacc=None):
    """(hop, scatter01, syndrome_ok) over either table format.

    Dense (``fac=False``): t1 = A [Dc, C, V] one-hots, t2 = H [V, C].
    Factored (``fac=True``): t1 = L [Dc, C, lane], t2 = M [Dc, H, 1, C]
    (bf16 0/1 masks — exact multipliers)
    (``slot_tables_factored``) — for graphs whose dense tables exceed
    VMEM. Hops are bit-identical across formats (the group mask only
    zeroes terms the dense contraction also zeroes, in order); the
    syndrome becomes the sum of the Dc slot gathers of x (exact 0/1
    arithmetic), replacing the [V, C] H dot.

    ``scatter01`` is the single-pass bf16 scatter for 0/1 indicator
    planes (exact in bf16) used by the refmode SPA class sums."""
    f32 = jnp.float32
    if not fac:
        def hop(val, d, transposed):
            return _onehot_dot(val, t1_ref[d], transposed=transposed,
                               exact=exact_f32)

        def scatter_sum(val_of, exact=None):
            acc = None
            for d in range(Dc):
                r = _onehot_dot(val_of(d), t1_ref[d], transposed=False,
                                exact=exact_f32 if exact is None
                                else exact)
                acc = r if acc is None else acc + r
            return acc

        def scatter01(ind, d):
            return jnp.dot(ind.astype(jnp.bfloat16), t1_ref[d],
                           preferred_element_type=f32)

        def syndrome_ok(xf):
            """[bs, V] bits -> [bs, 1] float 0/1. Only ever BROADCAST
            from this narrow shape — Mosaic rejects relayouts of
            lane-width-1 vectors carried across loop iterations, so the
            loop carries full-width done masks instead."""
            s = jnp.dot(xf.astype(jnp.bfloat16), t2_ref[:],
                        preferred_element_type=f32)
            bad = (s.astype(jnp.int32) % 2).sum(axis=-1, keepdims=True)
            return (bad == 0).astype(f32)

        return hop, scatter_sum, scatter01, syndrome_ok

    n_grp = t2_ref.shape[1]
    lane = t1_ref.shape[2]

    def one(x, d, transposed, exact):
        return _onehot_dot(x, t1_ref[d], transposed=transposed,
                           exact=exact)

    def gather(val, d, exact):
        if gacc is None:          # interpreter / small-graph path
            acc = None
            for h in range(n_grp):
                g = one(val[:, h * lane:(h + 1) * lane], d, True, exact) \
                    * t2_ref[d, h]
                acc = g if acc is None else acc + g
            return acc
        # Accumulate through a scratch slot: the SSA accumulation chain
        # leaves all n_grp group products live on the Mosaic stack at
        # once (chip-measured: the gather families alone put the MSA
        # kernel 5 MB over scoped vmem at margulis scale); a real VMEM
        # store per group forces one-group liveness.
        for h in range(n_grp):
            g = one(val[:, h * lane:(h + 1) * lane], d, True, exact) \
                * t2_ref[d, h]
            gacc[:] = g if h == 0 else gacc[:] + g
        return gacc[:]

    def hop(val, d, transposed):
        if transposed:
            return gather(val, d, exact_f32)
        return jnp.concatenate(
            [one(val * t2_ref[d, h], d, False, exact_f32)
             for h in range(n_grp)], axis=-1)

    def scatter_sum(val_of, exact=None):
        """sum_d scatter_d(val_of(d)), computed GROUP-MAJOR: each
        128-lane output group accumulates across all Dc slots before
        the next group starts. Element-wise this is the same terms in
        the same d order as sum-of-full-scatters, but only [bs, lane]
        temporaries are ever live — summing Dc full concat-scatters
        keeps Dc * n_grp group products on the Mosaic stack at once
        and blows scoped vmem at margulis scale (chip-measured 21 MB
        at block 32)."""
        ex = exact_f32 if exact is None else exact
        if vacc is None:
            outs = []
            for h in range(n_grp):
                acc = None
                for d in range(Dc):
                    g = one(val_of(d) * t2_ref[d, h], d, False, ex)
                    acc = g if acc is None else acc + g
                outs.append(acc)
            return jnp.concatenate(outs, axis=-1)
        # Store each group's accumulated result straight into the [bs, V]
        # scratch: like ``gacc`` for gathers, the real VMEM store per
        # group releases the masked-product temporaries — kernels that
        # need SEVERAL scatters per iteration (the refmode SPA's class
        # sums) otherwise stack n_grp x Dc masked [bs, C] planes per
        # scatter and blow scoped vmem at margulis scale.
        for h in range(n_grp):
            acc = None
            for d in range(Dc):
                g = one(val_of(d) * t2_ref[d, h], d, False, ex)
                acc = g if acc is None else acc + g
            vacc[:, h * lane:(h + 1) * lane] = acc
        return vacc[:]

    def scatter01(ind, d):
        return jnp.concatenate(
            [one(ind * t2_ref[d, h], d, False, False)
             for h in range(n_grp)], axis=-1)

    def syndrome_ok(xf):
        s = None
        for d in range(Dc):
            g = gather(xf, d, False)         # 0/1 gathers: exact in bf16
            s = g if s is None else s + g
        bad = (s.astype(jnp.int32) % 2).sum(axis=-1, keepdims=True)
        return (bad == 0).astype(f32)

    return hop, scatter_sum, scatter01, syndrome_ok


def _snap_write(x_out, caps, it, x_hat):
    """Multi-cap: plane k is written ONCE, in the body iteration that
    completes caps[k] iterations (0-based ``it`` == caps[k]-1). A
    scalar-predicated regional write (pl.when lowers to a branch) — no
    per-iteration read-modify-select traffic. ``_snap_fill`` covers the
    planes an early-exited loop never reached."""
    xi = x_hat.astype(jnp.int32)
    for k, cap in enumerate(caps):
        @pl.when(it == cap - 1)
        def _(k=k):
            x_out[k] = xi


def _snap_fill(x_out, caps, t, x_hat):
    """Post-loop: the loop exited after t < caps[k] iterations for the
    trailing planes (whole block converged early) — x_hat is frozen from
    t on, so the final state IS the cap-k decision (bit-exact with
    ``decode`` at iter_cap=caps[k], whose loop also ends at t)."""
    xi = x_hat.astype(jnp.int32)
    for k, cap in enumerate(caps):
        @pl.when(t < cap)
        def _(k=k):
            x_out[k] = xi


def _kernel(llr_ref, a_ref, h_ref, x_out, it_out, v2c, c2v_sc, gacc, *,
            Dc, C, V, max_iter, check_init, exact_f32=False, caps=None,
            fac=False):
    f32 = jnp.float32
    llr = llr_ref[:].astype(f32)                     # [bs, V]
    bs = llr.shape[0]
    msg_dt = f32 if exact_f32 else jnp.bfloat16
    hop, scatter_sum, _, syndrome_ok = _bp_table_ops(
        a_ref, h_ref, Dc=Dc, exact_f32=exact_f32, fac=fac, gacc=gacc)

    x0 = (llr < 0).astype(f32)

    # init: priors on every edge slot. zero_c/zero_v are DATA-DEPENDENT
    # zeros: Mosaic gives constant loop-carry inits a lane-replicated
    # layout and then rejects the relayout when the body produces a
    # regular vector ("replicated in destination but not in source").
    zero_c = None
    for d in range(Dc):
        ed = hop(llr, d, transposed=True)            # [bs, C]
        v2c[d] = ed.astype(msg_dt)
        if d == 0:
            zero_c = ed * 0.0
    zero_v = x0 * 0.0
    if check_init:
        ok0 = syndrome_ok(x0)                        # [bs, 1]
        done_v0 = jnp.maximum(zero_v, ok0)
        done_c0 = jnp.maximum(zero_c, ok0)
    else:
        done_v0 = zero_v
        done_c0 = zero_c

    def body(it, carry):
        x_hat, done_v, done_c, iters_c = carry

        # -- check node: leave-one-out two-min + sign parity (unrolled).
        # v2c planes read on demand; c2v stages through VMEM scratch on
        # the factored route (Dc-long SSA plane lists blow the
        # scoped-vmem budget at margulis scale — chip-bisected, see
        # _admm_core) and stays an SSA list on the dense one (the
        # scratch round-trip measurably slows the multi-cap variant).
        # Values are identical — only the storage changes.
        if fac:
            def put_c2v(d, v):
                c2v_sc[d] = v

            def get_c2v(d):
                return c2v_sc[d][:]
        else:
            c2v_buf = [None] * Dc

            def put_c2v(d, v):
                c2v_buf[d] = v

            def get_c2v(d):
                return c2v_buf[d]

        big = jnp.asarray(MSA_DEG1_GUARD, f32)
        m1 = jnp.full((bs, C), big, f32)
        m2 = jnp.full((bs, C), big, f32)
        am = jnp.zeros((bs, C), jnp.int32)
        nneg = jnp.zeros((bs, C), jnp.int32)
        for d in range(Dc):
            p = v2c[d][:].astype(f32)
            mag = jnp.abs(p)
            lt = mag < m1
            m2 = jnp.where(lt, m1, jnp.minimum(m2, mag))
            m1 = jnp.where(lt, mag, m1)
            am = jnp.where(lt, d, am)
            nneg = nneg + (p < 0).astype(jnp.int32)

        # -- variable node: marginal via Dc one-hot dots. Sum the edge
        # contributions FIRST and add the prior last — the same
        # association as the XLA incidence route's llr + (flat @ a_sum)
        # (only the within-sum order differs: slot-major here vs
        # check-major in the single dot).
        for d in range(Dc):
            p = v2c[d][:].astype(f32)
            excl = nneg - (p < 0).astype(jnp.int32)
            sgn = (1 - 2 * (excl % 2)).astype(f32)
            ext = jnp.where(am == d, m2, m1)
            put_c2v(d, jnp.minimum(ext, big) * sgn)
        marg = llr + scatter_sum(get_c2v)

        x_new = (marg < 0).astype(f32)
        active_v = done_v == 0.0                     # [bs, V]
        active_c = done_c == 0.0                     # [bs, C]
        x_hat = jnp.where(active_v, x_new, x_hat)
        for d in range(Dc):
            ed = hop(marg, d, transposed=True)       # [bs, C]
            nv = (ed - get_c2v(d)).astype(msg_dt)
            v2c[d] = jnp.where(active_c, nv, v2c[d][:])
        iters_c = iters_c + active_c.astype(f32)
        ok = syndrome_ok(x_hat)                      # [bs, 1]
        done_v = jnp.maximum(done_v, ok)             # broadcast over V
        done_c = jnp.maximum(done_c, ok)
        if caps is not None:
            _snap_write(x_out, caps, it, x_hat)
        return x_hat, done_v, done_c, iters_c

    t, (x_hat, _, _, iters_c) = _bounded_loop(
        max_iter, body, (x0, done_v0, done_c0, zero_c), done_idx=2)
    if caps is None:
        x_out[:] = x_hat.astype(jnp.int32)
    else:
        _snap_fill(x_out, caps, t, x_hat)
    it_out[:] = iters_c[:, 0:1].astype(jnp.int32)


def _bp_pad_v(vals, fac, t1, t2, fill):
    """Factored mode: pad the variable axis to H * lane (pad variables
    touch no check — inert). Returns (padded, v_pad)."""
    if not fac:
        return vals, vals.shape[1]
    v_pad = t2.shape[1] * t1.shape[2]
    B0, V0 = vals.shape
    if V0 < v_pad:
        vals = jnp.concatenate(
            [vals, jnp.full((B0, v_pad - V0), fill, vals.dtype)], axis=1)
    return vals, v_pad


def _launch_bp(kern, batched, t1, t2, *, block, scratches,
               interpret, caps=None):
    """Shared pallas_call plumbing for the four BP kernels: pad the batch
    to a block multiple, wire the (llr/y, tables) input specs, and shape
    the decision output — [B, V] single-cap, [K, B, V] when ``caps``
    snapshot planes are requested. Tables are dense (A, H) or factored
    (L, M) — specs derive from their shapes. Returns (x_hat, iters [B]);
    factored-mode V padding is the caller's job (``_bp_pad_v``)."""
    Dc, C = t1.shape[0], t1.shape[1]
    V = batched.shape[1]
    B0 = batched.shape[0]
    if B0 % block:
        pad = block - B0 % block
        batched = jnp.concatenate(
            [batched, jnp.zeros((pad, V), batched.dtype)], axis=0)
    B = batched.shape[0]
    if caps is None:
        x_spec = pl.BlockSpec((block, V), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        x_shape = jax.ShapeDtypeStruct((B, V), jnp.int32)
    else:
        K = len(caps)
        x_spec = pl.BlockSpec((K, block, V), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        x_shape = jax.ShapeDtypeStruct((K, B, V), jnp.int32)
    x_hat, iters = pl.pallas_call(
        kern,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t1.shape, lambda i, n=t1.ndim: (0,) * n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t2.shape, lambda i, n=t2.ndim: (0,) * n,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            x_spec,
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            x_shape,
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=list(scratches),
        interpret=interpret,
    )(batched, t1, t2)
    if caps is None:
        return x_hat[:B0], iters[:B0, 0]
    return x_hat[:, :B0], iters[:B0, 0]


def msa_decode_pallas(a_tab, h_tab, llr, *, max_iter: int,
                      check_init: bool, block: int = 128,
                      interpret: bool = False, exact_f32: bool = False,
                      caps=None, fac: bool = False):
    """llr [B, V] -> (x_hat [B, V] int32, iters [B] int32).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests); on the chip the 10-iteration loop stays VMEM-resident and
    measures 532k cw/s vs the XLA incidence route's 378k at batch 16384
    (bit-identical decisions and iteration counts).

    ``exact_f32=True`` keeps the message scratch in float32 and runs
    every one-hot hop as a 3-term bf16 split (see ``_onehot_dot``) —
    exact float32 message dynamics for tie-structured workloads (BSC)
    that must NOT be bf16-quantized, at ~2x the scratch footprint and
    3x the MXU passes of the bf16 kernel (block 64 keeps it under
    VMEM with the flagship tables).

    ``caps``: static ascending iteration caps — decode once to
    max_iter (= caps[-1]) and snapshot the decisions at every cap
    (``decode_multi_cap`` semantics); returns (x_hats [K, B, V],
    iters [B]). The K int32 snapshot planes cost VMEM, so the block
    shrinks accordingly."""
    if caps is not None:
        assert int(max_iter) == int(caps[-1])
        # Chip-probed at the REG_BAD shapes (K=7, grid over batch 2048):
        # block 64 fits VMEM for both message dtypes and is ~2x block 32
        # (MXU tile utilization); 128 exceeds VMEM with the K int32
        # snapshot planes.
        block = min(block, 64)
    elif exact_f32:
        block = min(block, 64)
    V0 = llr.shape[1]
    llr, _ = _bp_pad_v(llr.astype(jnp.float32), fac, a_tab, h_tab, 1.0)
    if fac:
        block = min(block, 32)
    kern = functools.partial(_kernel, Dc=a_tab.shape[0], C=a_tab.shape[1],
                             V=llr.shape[1], max_iter=int(max_iter),
                             check_init=bool(check_init),
                             exact_f32=bool(exact_f32), caps=caps, fac=fac)
    Dc_, C_ = a_tab.shape[0], a_tab.shape[1]
    scr = [pltpu.VMEM((Dc_, block, C_),
                      jnp.float32 if exact_f32 else jnp.bfloat16),
           # staged c2v (factored route only; dense keeps SSA lists)
           pltpu.VMEM((Dc_, block, C_) if fac else (1, 1, 1),
                      jnp.float32),
           pltpu.VMEM((block, C_), jnp.float32)]        # gather acc
    x, iters = _launch_bp(kern, llr, a_tab, h_tab, block=block,
                          scratches=scr, interpret=interpret, caps=caps)
    return x[..., :V0], iters


def _bec_kernel(y_ref, a_ref, h_ref, x_out, it_out, v2c, c2v_sc, gacc, *,
                Dc, C, V, max_iter, caps=None, fac=False):
    """Ternary erasure SPA, whole loop VMEM-resident (reference
    src/bec.py:70-122 semantics: echo / single-unknown parity resolve /
    stopping-set exit). All values are small integers, so every dot
    against the bf16 one-hot tables is exact and the kernel is
    bit-equal to BECSPADecoder (tested)."""
    f32 = jnp.float32
    y = y_ref[:].astype(f32)                         # [bs, V] in {0,1,2}
    # All values are small integers: every hop is exact in single-pass
    # bf16 (exact_f32 never needed).
    hop, scatter_sum, _, _ = _bp_table_ops(a_ref, h_ref, Dc=Dc,
                                           exact_f32=False, fac=fac,
                                           gacc=gacc)
    # symbol -> message {-1,+1,0}; keep x_hat as the marginal SIGN.
    priors = jnp.where(y == 2.0, 0.0, 2.0 * y - 1.0)
    x0 = priors

    zero_c = None
    for d in range(Dc):
        ed = hop(priors, d, transposed=True)         # [bs, C]
        v2c[d] = ed.astype(jnp.bfloat16)
        if d == 0:
            zero_c = ed * 0.0
    zero_v = x0 * 0.0

    def n_erased(xs):                                # [bs, V] signs -> [bs,1]
        return (xs == 0.0).astype(f32).sum(axis=-1, keepdims=True)

    done_v0 = jnp.maximum(zero_v, (n_erased(x0) == 0.0).astype(f32))
    done_c0 = jnp.maximum(zero_c, (n_erased(x0) == 0.0).astype(f32))

    def to_sym(xs):
        # sign {-1, 0, +1} -> symbol {0, 2, 1}
        return jnp.where(xs < 0.0, 0, jnp.where(xs > 0.0, 1, 2))

    def body(it, carry):
        x_hat, done_v, done_c, iters_c = carry

        # v2c planes read on demand; c2v stages through scratch on the
        # factored route (margulis live-range budget — see the MSA
        # kernel) and stays an SSA list on the dense one (faster, fits).
        if fac:
            def put_c2v(d, v):
                c2v_sc[d] = v.astype(jnp.bfloat16)  # {-1,0,+1}: exact

            def get_c2v(d):
                return c2v_sc[d][:].astype(f32)
        else:
            c2v_buf = [None] * Dc

            def put_c2v(d, v):
                c2v_buf[d] = v

            def get_c2v(d):
                return c2v_buf[d]

        unknowns = zero_c
        ones = zero_c
        for d in range(Dc):
            p = v2c[d][:].astype(f32)
            unknowns = unknowns + (p == 0.0).astype(f32)
            ones = ones + (p > 0.0).astype(f32)
        parity = 2.0 * (ones.astype(jnp.int32) % 2).astype(f32) - 1.0

        for d in range(Dc):
            p = v2c[d][:].astype(f32)
            known = jnp.abs(p)
            put_c2v(d, jnp.where(unknowns == 0.0, p,
                                 jnp.where(unknowns == 1.0,
                                           (1.0 - known) * parity, 0.0)))
        # small-int arithmetic: the group-major sum is exact regardless
        # of association.
        marg = priors + scatter_sum(get_c2v)

        x_new = jnp.sign(marg)
        active_v = done_v == 0.0
        active_c = done_c == 0.0
        # stopping set: hard decisions unchanged (bec.py:120).
        same = ((x_new == x_hat).astype(f32).sum(axis=-1, keepdims=True)
                == float(V)).astype(f32)
        x_hat = jnp.where(active_v, x_new, x_hat)
        for d in range(Dc):
            ed = hop(marg, d, transposed=True)       # [bs, C]
            nv = jnp.sign(ed - get_c2v(d)).astype(jnp.bfloat16)
            v2c[d] = jnp.where(active_c, nv, v2c[d][:])
        iters_c = iters_c + active_c
        fin = jnp.maximum((n_erased(x_hat) == 0.0).astype(f32), same)
        done_v = jnp.maximum(done_v, fin)
        done_c = jnp.maximum(done_c, fin)
        if caps is not None:
            _snap_write(x_out, caps, it, to_sym(x_hat))
        return x_hat, done_v, done_c, iters_c

    t, (x_hat, _, _, iters_c) = _bounded_loop(
        max_iter, body, (x0, done_v0, done_c0, zero_c), done_idx=2)
    if caps is None:
        x_out[:] = to_sym(x_hat).astype(jnp.int32)
    else:
        _snap_fill(x_out, caps, t, to_sym(x_hat))
    it_out[:] = iters_c[:, 0:1].astype(jnp.int32)


def bec_spa_decode_pallas(a_tab, h_tab, y, *, max_iter: int,
                          block: int = 128, interpret: bool = False,
                          caps=None, fac: bool = False):
    """y [B, V] symbols {0,1,2} -> (x_hat [B, V] int32, iters [B]).
    ``caps``: snapshot planes, see ``msa_decode_pallas``."""
    if caps is not None:
        assert int(max_iter) == int(caps[-1])
        block = min(block, 64)
    V0 = y.shape[1]
    y, _ = _bp_pad_v(y.astype(jnp.int32), fac, a_tab, h_tab, 0)
    if fac:
        block = min(block, 32)
    kern = functools.partial(_bec_kernel, Dc=a_tab.shape[0],
                             C=a_tab.shape[1], V=y.shape[1],
                             max_iter=int(max_iter), caps=caps, fac=fac)
    Dc_, C_ = a_tab.shape[0], a_tab.shape[1]
    scr = [pltpu.VMEM((Dc_, block, C_), jnp.bfloat16),
           # staged c2v (factored route only; dense keeps SSA lists)
           pltpu.VMEM((Dc_, block, C_) if fac else (1, 1, 1),
                      jnp.bfloat16),
           pltpu.VMEM((block, C_), jnp.float32)]        # gather acc
    x, iters = _launch_bp(kern, y, a_tab, h_tab,
                          block=block, scratches=scr,
                          interpret=interpret, caps=caps)
    return x[..., :V0], iters


# float32 phi-domain ladder, mirrored from decoders/bp.py.
_PHI_EPS = 6.27e-17
_LLR_CLIP = 38.0


def _phi(x):
    """Gallager phi, float32-stable (same piecewise form as
    decoders/bp.py:phi — series below 0.1, exp/log1p above)."""
    small = x < 0.1
    ex = jnp.exp(-x)
    big = jnp.log1p(ex) - jnp.log1p(-jnp.where(small, 0.5, ex))
    ser = jnp.log(2.0 / jnp.where(small, x, 1.0)) + x * x / 12.0
    return jnp.where(small, ser, big)


def _spa_kernel(llr_ref, a_ref, h_ref, x_out, it_out, v2c, stage, gacc,
                *, Dc, C, V, max_iter, check_init, exact_f32=False,
                caps=None, fac=False):
    """SPA (inf_policy='saturate'), whole loop VMEM-resident. Same
    structure as the MSA kernel; the check node is the phi-domain
    leave-one-out computed with the same prefix/suffix fold ordering as
    ops/graph.exclusive_sum. ``exact_f32``: f32 scratch + split hops
    (see ``_onehot_dot``)."""
    f32 = jnp.float32
    llr = llr_ref[:].astype(f32)
    bs = llr.shape[0]
    msg_dt = f32 if exact_f32 else jnp.bfloat16
    hop, _, _, syndrome_ok = _bp_table_ops(
        a_ref, h_ref, Dc=Dc, exact_f32=exact_f32, fac=fac, gacc=gacc)
    del stage  # SSA lists fit the dense flagship; staging unused here

    x0 = (llr < 0).astype(f32)
    zero_c = None
    for d in range(Dc):
        ed = hop(llr, d, transposed=True)
        v2c[d] = ed.astype(msg_dt)
        if d == 0:
            zero_c = ed * 0.0
    zero_v = x0 * 0.0
    if check_init:
        ok0 = syndrome_ok(x0)
        done_v0 = jnp.maximum(zero_v, ok0)
        done_c0 = jnp.maximum(zero_c, ok0)
    else:
        done_v0 = zero_v
        done_c0 = zero_c

    def body(it, carry):
        x_hat, done_v, done_c, iters_c = carry
        planes = [v2c[d][:].astype(f32) for d in range(Dc)]

        ph = [_phi(jnp.clip(jnp.abs(p), _PHI_EPS, _LLR_CLIP))
              for p in planes]
        neg = [(p < 0).astype(jnp.int32) for p in planes]
        # leave-one-out via prefix/suffix folds (exclusive_sum ordering).
        pre_ph, pre_ng = [zero_c], [jnp.zeros_like(neg[0])]
        for d in range(Dc - 1):
            pre_ph.append(pre_ph[-1] + ph[d])
            pre_ng.append(pre_ng[-1] + neg[d])
        suf_ph, suf_ng = [zero_c], [jnp.zeros_like(neg[0])]
        for d in range(Dc - 1, 0, -1):
            suf_ph.insert(0, suf_ph[0] + ph[d])
            suf_ng.insert(0, suf_ng[0] + neg[d])

        # Edge contributions first, prior last (XLA route association).
        msum = None
        c2v = []
        for d in range(Dc):
            excl_ph = pre_ph[d] + suf_ph[d]
            excl_ng = pre_ng[d] + suf_ng[d]
            ext = _phi(jnp.maximum(excl_ph, _PHI_EPS))
            sgn = (1 - 2 * (excl_ng % 2)).astype(f32)
            cd = ext * sgn
            c2v.append(cd)
            hd = hop(cd, d, transposed=False)
            msum = hd if msum is None else msum + hd
        marg = llr + msum

        x_new = (marg < 0).astype(f32)
        active_v = done_v == 0.0
        active_c = done_c == 0.0
        x_hat = jnp.where(active_v, x_new, x_hat)
        for d in range(Dc):
            ed = hop(marg, d, transposed=True)
            nv = (ed - c2v[d]).astype(msg_dt)
            v2c[d] = jnp.where(active_c, nv, v2c[d][:])
        iters_c = iters_c + active_c.astype(f32)
        ok = syndrome_ok(x_hat)
        done_v = jnp.maximum(done_v, ok)
        done_c = jnp.maximum(done_c, ok)
        if caps is not None:
            _snap_write(x_out, caps, it, x_hat)
        return x_hat, done_v, done_c, iters_c

    t, (x_hat, _, _, iters_c) = _bounded_loop(
        max_iter, body, (x0, done_v0, done_c0, zero_c), done_idx=2)
    if caps is None:
        x_out[:] = x_hat.astype(jnp.int32)
    else:
        _snap_fill(x_out, caps, t, x_hat)
    it_out[:] = iters_c[:, 0:1].astype(jnp.int32)


def spa_decode_pallas(a_tab, h_tab, llr, *, max_iter: int,
                      check_init: bool, block: int = 128,
                      interpret: bool = False, exact_f32: bool = False,
                      caps=None, fac: bool = False):
    """Saturate-policy SPA: llr [B, V] -> (x_hat, iters).
    ``caps``: snapshot planes, see ``msa_decode_pallas``."""
    if caps is not None:
        assert int(max_iter) == int(caps[-1])
        block = min(block, 64)     # see msa_decode_pallas
    elif exact_f32:
        block = min(block, 64)
    V0 = llr.shape[1]
    llr, _ = _bp_pad_v(llr.astype(jnp.float32), fac, a_tab, h_tab, 1.0)
    if fac:
        block = min(block, 32)
    kern = functools.partial(_spa_kernel, Dc=a_tab.shape[0],
                             C=a_tab.shape[1], V=llr.shape[1],
                             max_iter=int(max_iter),
                             check_init=bool(check_init),
                             exact_f32=bool(exact_f32), caps=caps, fac=fac)
    Dc_, C_ = a_tab.shape[0], a_tab.shape[1]
    scr = [pltpu.VMEM((Dc_, block, C_),
                      jnp.float32 if exact_f32 else jnp.bfloat16),
           # unused placeholder (an earlier staged-prefix variant
           # regressed the dense flagship's VMEM fit; SSA lists are the
           # chip-proven form for both SPA kernels)
           pltpu.VMEM((1, 1, 1, 1), jnp.float32),
           pltpu.VMEM((block, C_), jnp.float32)]        # gather acc
    x, iters = _launch_bp(kern, llr, a_tab, h_tab, block=block,
                          scratches=scr, interpret=interpret, caps=caps)
    return x[..., :V0], iters


# Sentinel bands, mirrored from decoders/bp.py (bfloat16-robust).
_INF_S = 1e9
_NAN_S = 2e9
_INF_MIN = 5e8
_NAN_MIN = 1.5e9


def _spa_ref_kernel(llr_ref, a_ref, h_ref, x_out, it_out, v2c, stage,
                    gacc, vacc, *, Dc, C, V, max_iter, check_init,
                    exact_f32=False, caps=None, fac=False):
    """SPA with the reference's float64 inf/NaN cascade (inf_policy=
    'reference'), sentinel-encoded, whole loop VMEM-resident. Plane
    translation of decoders/bp.spa_check_rows_ref + _spa_ref_step for
    fully regular graphs (no pad masks; row degree == Dc).

    ``exact_f32``: float32 message scratch + 3-term-split value hops
    (see ``_onehot_dot``) for tie-structured f32 workloads (BSC). The
    0/1 indicator dots stay single-pass — they are exact in bf16 — and
    the sentinel encodings (+-1e9, 2e9) reconstruct exactly through the
    split."""
    f32 = jnp.float32
    llr = llr_ref[:].astype(f32)
    bs = llr.shape[0]
    msg_dt = f32 if exact_f32 else jnp.bfloat16
    hop, scatter_sum, scatter01, syndrome_ok = _bp_table_ops(
        a_ref, h_ref, Dc=Dc, exact_f32=exact_f32, fac=fac, gacc=gacc,
        vacc=vacc if fac else None)
    if not fac:
        del stage  # SSA lists fit the dense flagship; staging unused

    x0 = (llr < 0).astype(f32)
    zero_c = None
    for d in range(Dc):
        ed = hop(llr, d, transposed=True)
        v2c[d] = ed.astype(msg_dt)
        if d == 0:
            zero_c = ed * 0.0
    zero_v = x0 * 0.0
    if check_init:
        ok0 = syndrome_ok(x0)
        done_v0 = jnp.maximum(zero_v, ok0)
        done_c0 = jnp.maximum(zero_c, ok0)
    else:
        done_v0 = zero_v
        done_c0 = zero_c

    def _msg_classes(p):
        """Per-slot class decomposition of a v2c message plane
        (spa_check_rows_ref): (nan, ph, code) with code = sat + 8*neg —
        both are small counts, so one f32 plane carries them exactly
        (sums over Dc <= 8 slots stay integer-exact; mod/floor-8
        unpacking is exact). Recomputed on demand from the v2c scratch
        in the staged body — identical values at one-use live ranges."""
        nan = p > _NAN_MIN
        pinf = (p > _INF_MIN) & ~nan
        ninf = p < -_INF_MIN
        fin = ~(nan | pinf | ninf)
        mag = jnp.abs(p)
        sat = (pinf | ninf | (fin & (mag >= _LLR_CLIP))).astype(f32)
        live = fin & (mag < _LLR_CLIP)
        ph = jnp.where(live, _phi(jnp.clip(mag, _PHI_EPS, _LLR_CLIP)), 0.0)
        neg = ((fin & (p < 0)) | ninf).astype(f32)
        return nan, ph, sat + 8.0 * neg

    def _c2v_classes(p):
        """(cn, cp, cm, finv) of a c2v plane (_spa_ref_step)."""
        cn = p > _NAN_MIN
        cp = (p > _INF_MIN) & ~cn
        cm = p < -_INF_MIN
        finv = jnp.where(cn | cp | cm, 0.0, p)
        return cn, cp, cm, finv

    def body_fac(it, carry):
        """Staged twin of ``body`` for the factored (margulis-scale)
        route: the Dc-long SSA plane lists of the dense body (~20 per
        slot across the class machinery) blow Mosaic's scoped-vmem
        budget even at block 16, so prefix sums and c2v planes stage
        through VMEM scratch and every class plane is recomputed at its
        use site. Same values in the same float association (prefix +
        suffix accumulation order unchanged; classes are deterministic
        elementwise) — bit-identical to the dense body."""
        x_hat, done_v, done_c, iters_c = carry

        # -- check node: prefix pass stages the running (ph, code) sums
        # BEFORE folding in slot d (= exclusive prefix) plus the per-slot
        # (ph, code) planes themselves, then a reverse pass adds the
        # running suffix (reading the staged per-slot planes — no class
        # recompute temporaries) and emits c2v into scratch.
        pre_ph = zero_c
        pre_code = zero_c
        nan_row = None
        for d in range(Dc):
            stage[0, d] = pre_ph
            stage[1, d] = pre_code
            nan, ph, codep = _msg_classes(v2c[d][:].astype(f32))
            stage[3, d] = ph
            stage[4, d] = codep
            nan_row = nan if d == 0 else (nan_row | nan)
            pre_ph = pre_ph + ph
            pre_code = pre_code + codep
        suf_ph = zero_c
        suf_code = zero_c
        for d in range(Dc - 1, -1, -1):
            excl_ph = stage[0, d][:] + suf_ph
            excl_code = stage[1, d][:] + suf_code
            n_sat = jnp.mod(excl_code, 8.0)
            excl_ng = jnp.floor(excl_code * 0.125)
            sgn = 1.0 - 2.0 * jnp.mod(excl_ng, 2.0)
            val = _phi(jnp.maximum(excl_ph, _PHI_EPS)) * sgn
            out = jnp.where(n_sat == float(Dc - 1), sgn * _INF_S, val)
            stage[2, d] = jnp.where(nan_row, _NAN_S, out)
            suf_ph = suf_ph + stage[3, d][:]
            suf_code = suf_code + stage[4, d][:]

        # -- variable node: class-aware sums, group-major scatters
        # writing through the vacc scratch (one live group at a time).
        # finv and the packed class indicator stage into the (now dead)
        # prefix-sum slots so every scatter read is a pure scratch load;
        # the two 0/1 indicator scatters pack base-8 into ONE plane
        # ((cp|cn) + 8*(cm|cn): values {0,1,8,9} are bf16-exact, sums
        # over Dc <= 8 slots unpack exactly via mod/floor).
        for d in range(Dc):
            c2v_d = stage[2, d][:]
            stage[0, d] = _c2v_classes(c2v_d)[3]
            stage[1, d] = ((c2v_d > _INF_MIN).astype(f32)
                           + 8.0 * ((c2v_d < -_INF_MIN)
                                    | (c2v_d > _NAN_MIN)).astype(f32))
        fin_sum = llr + scatter_sum(lambda d: stage[0, d][:])
        n_code = scatter_sum(lambda d: stage[1, d][:], exact=False)
        n_p = jnp.mod(n_code, 8.0)
        n_n = jnp.floor(n_code * 0.125)

        is_nan = (n_p > 0.5) & (n_n > 0.5)
        is_p = ~is_nan & (n_p > 0.5)
        is_n = ~is_nan & (n_n > 0.5)
        x_new = jnp.where(is_n, 1.0,
                          jnp.where(is_nan | is_p, 0.0,
                                    (fin_sum < 0).astype(f32)))
        marg_enc = jnp.where(is_nan, _NAN_S,
                             jnp.where(is_p, _INF_S,
                                       jnp.where(is_n, -_INF_S, fin_sum)))

        active_v = done_v == 0.0
        active_c = done_c == 0.0
        x_hat = jnp.where(active_v, x_new, x_hat)
        for d in range(Dc):
            ed = hop(marg_enc, d, transposed=True)
            c2v_d = stage[2, d][:]
            cp_d = (c2v_d > _INF_MIN) & ~(c2v_d > _NAN_MIN)
            cm_d = c2v_d < -_INF_MIN
            finv_d = stage[0, d][:]
            em_nan = ed > _NAN_MIN
            em_p = (ed > _INF_MIN) & ~em_nan
            em_n = ed < -_INF_MIN
            nv = jnp.where(em_p, jnp.where(cp_d, _NAN_S, _INF_S),
                           ed - finv_d)
            nv = jnp.where(em_n, jnp.where(cm_d, _NAN_S, -_INF_S), nv)
            nv = jnp.where(em_nan, _NAN_S, nv)
            v2c[d] = jnp.where(active_c, nv.astype(msg_dt), v2c[d][:])
        iters_c = iters_c + active_c.astype(f32)
        ok = syndrome_ok(x_hat)
        done_v = jnp.maximum(done_v, ok)
        done_c = jnp.maximum(done_c, ok)
        if caps is not None:
            _snap_write(x_out, caps, it, x_hat)
        return x_hat, done_v, done_c, iters_c

    def body(it, carry):
        x_hat, done_v, done_c, iters_c = carry
        m = [v2c[d][:].astype(f32) for d in range(Dc)]

        # -- check node (spa_check_rows_ref, regular: every slot real).
        nan_i = [p > _NAN_MIN for p in m]
        pinf_i = [(p > _INF_MIN) & ~n for p, n in zip(m, nan_i)]
        ninf_i = [p < -_INF_MIN for p in m]
        fin_i = [~(a | b | c) for a, b, c in zip(nan_i, pinf_i, ninf_i)]
        mag = [jnp.abs(p) for p in m]
        sat = [(a | b | (f & (g >= _LLR_CLIP))).astype(jnp.int32)
               for a, b, f, g in zip(pinf_i, ninf_i, fin_i, mag)]
        live = [f & (g < _LLR_CLIP) for f, g in zip(fin_i, mag)]
        ph = [jnp.where(l, _phi(jnp.clip(g, _PHI_EPS, _LLR_CLIP)), 0.0)
              for l, g in zip(live, mag)]
        neg = [((f & (p < 0)) | n).astype(jnp.int32)
               for f, p, n in zip(fin_i, m, ninf_i)]
        nan_row = nan_i[0]
        for d in range(1, Dc):
            nan_row = nan_row | nan_i[d]

        pre_ph, pre_sat, pre_ng = [zero_c], [sat[0] * 0], [neg[0] * 0]
        for d in range(Dc - 1):
            pre_ph.append(pre_ph[-1] + ph[d])
            pre_sat.append(pre_sat[-1] + sat[d])
            pre_ng.append(pre_ng[-1] + neg[d])
        suf_ph, suf_sat, suf_ng = [zero_c], [sat[0] * 0], [neg[0] * 0]
        for d in range(Dc - 1, 0, -1):
            suf_ph.insert(0, suf_ph[0] + ph[d])
            suf_sat.insert(0, suf_sat[0] + sat[d])
            suf_ng.insert(0, suf_ng[0] + neg[d])

        c2v = []
        for d in range(Dc):
            excl_ph = pre_ph[d] + suf_ph[d]
            n_sat = pre_sat[d] + suf_sat[d]
            excl_ng = pre_ng[d] + suf_ng[d]
            sgn = (1 - 2 * (excl_ng % 2)).astype(f32)
            val = _phi(jnp.maximum(excl_ph, _PHI_EPS)) * sgn
            out = jnp.where(n_sat == Dc - 1, sgn * _INF_S, val)
            c2v.append(jnp.where(nan_row, _NAN_S, out))

        # -- variable node (_spa_ref_step): class-aware sums.
        cn = [p > _NAN_MIN for p in c2v]
        cp = [(p > _INF_MIN) & ~n for p, n in zip(c2v, cn)]
        cm = [p < -_INF_MIN for p in c2v]
        finv = [jnp.where(a | b | c, 0.0, p)
                for a, b, c, p in zip(cn, cp, cm, c2v)]
        # Edge contributions first, prior last — the XLA refmode route's
        # association (marg_fin = llr + fin_sum, bp.py _spa_ref_step).
        # The two 0/1 class indicators pack base-8 into ONE scatter dot
        # per slot when the variable degree allows (dv < 8: per-variable
        # counts stay < 8 so mod/floor unpack exactly; {0,1,8,9} are
        # bf16-exact) — same trick as the factored body, ~Dc fewer MXU
        # dots per iteration on the var side.
        pack8 = (Dc * C) // V < 8
        fsum = None
        n_p = zero_v
        n_n = zero_v
        n_code = zero_v
        for d in range(Dc):
            fd = hop(finv[d], d, transposed=False)
            fsum = fd if fsum is None else fsum + fd
            if pack8:
                n_code = n_code + scatter01(
                    (cp[d] | cn[d]).astype(f32)
                    + 8.0 * (cm[d] | cn[d]).astype(f32), d)
            else:
                n_p = n_p + scatter01((cp[d] | cn[d]).astype(f32), d)
                n_n = n_n + scatter01((cm[d] | cn[d]).astype(f32), d)
        fin_sum = llr + fsum
        if pack8:
            n_p = jnp.mod(n_code, 8.0)
            n_n = jnp.floor(n_code * 0.125)

        is_nan = (n_p > 0.5) & (n_n > 0.5)
        is_p = ~is_nan & (n_p > 0.5)
        is_n = ~is_nan & (n_n > 0.5)
        x_new = jnp.where(is_n, 1.0,
                          jnp.where(is_nan | is_p, 0.0,
                                    (fin_sum < 0).astype(f32)))
        marg_enc = jnp.where(is_nan, _NAN_S,
                             jnp.where(is_p, _INF_S,
                                       jnp.where(is_n, -_INF_S, fin_sum)))

        active_v = done_v == 0.0
        active_c = done_c == 0.0
        x_hat = jnp.where(active_v, x_new, x_hat)
        for d in range(Dc):
            ed = hop(marg_enc, d, transposed=True)
            em_nan = ed > _NAN_MIN
            em_p = (ed > _INF_MIN) & ~em_nan
            em_n = ed < -_INF_MIN
            nv = jnp.where(em_p, jnp.where(cp[d], _NAN_S, _INF_S),
                           ed - finv[d])
            nv = jnp.where(em_n, jnp.where(cm[d], _NAN_S, -_INF_S), nv)
            nv = jnp.where(em_nan, _NAN_S, nv)
            v2c[d] = jnp.where(active_c, nv.astype(msg_dt),
                               v2c[d][:])
        iters_c = iters_c + active_c.astype(f32)
        ok = syndrome_ok(x_hat)
        done_v = jnp.maximum(done_v, ok)
        done_c = jnp.maximum(done_c, ok)
        if caps is not None:
            _snap_write(x_out, caps, it, x_hat)
        return x_hat, done_v, done_c, iters_c

    t, (x_hat, _, _, iters_c) = _bounded_loop(
        max_iter, body_fac if fac else body,
        (x0, done_v0, done_c0, zero_c), done_idx=2)
    if caps is None:
        x_out[:] = x_hat.astype(jnp.int32)
    else:
        _snap_fill(x_out, caps, t, x_hat)
    it_out[:] = iters_c[:, 0:1].astype(jnp.int32)


def spa_ref_decode_pallas(a_tab, h_tab, llr, *, max_iter: int,
                          check_init: bool, block: int = 64,
                          interpret: bool = False, exact_f32: bool = False,
                          caps=None, fac: bool = False):
    """Reference-inf-policy SPA: llr [B, V] -> (x_hat, iters).

    Default tile 64: the class machinery keeps more live [bs, C]
    planes than the other kernels and block=128 exceeds VMEM.
    ``caps``: snapshot planes, see ``msa_decode_pallas``."""
    if caps is not None:
        assert int(max_iter) == int(caps[-1])
        # Chip-probed: bf16 fits at 64; the exact-f32 class machinery
        # overflows VMEM there and stays at 32 (16 measures the same).
        block = min(block, 64 if not exact_f32 else 32)
    elif exact_f32:
        block = min(block, 32)
    V0 = llr.shape[1]
    llr, _ = _bp_pad_v(llr.astype(jnp.float32), fac, a_tab, h_tab, 1.0)
    if fac:
        # Chip-probed (round 5, margulis): the staged body + vacc store
        # compiles bf16 at block 32; the exact-f32 split temporaries
        # need block 8.
        block = min(block, 8 if exact_f32 else 32)
    kern = functools.partial(_spa_ref_kernel, Dc=a_tab.shape[0],
                             C=a_tab.shape[1], V=llr.shape[1],
                             max_iter=int(max_iter),
                             check_init=bool(check_init),
                             exact_f32=bool(exact_f32), caps=caps, fac=fac)
    Dc_, C_ = a_tab.shape[0], a_tab.shape[1]
    scr = [pltpu.VMEM((Dc_, block, C_),
                      jnp.float32 if exact_f32 else jnp.bfloat16),
           # staged prefix sums, c2v, and per-slot (ph, code) planes
           # (factored route only; the dense flagship keeps its SSA
           # lists — see body_fac)
           pltpu.VMEM((5, Dc_, block, C_) if fac else (1, 1, 1, 1),
                      jnp.float32),
           pltpu.VMEM((block, C_), jnp.float32),        # gather acc
           # scatter accumulator (fac): groups store straight to VMEM
           pltpu.VMEM((block, llr.shape[1]) if fac else (1, 1),
                      jnp.float32)]
    x, iters = _launch_bp(kern, llr, a_tab, h_tab, block=block,
                          scratches=scr, interpret=interpret, caps=caps)
    return x[..., :V0], iters


def _dot_split(val, a, transposed):
    """f32 value against a bf16 one-hot table, LOSSLESS: the 3-term bf16
    split of ``_onehot_dot(exact=True)``. ADMM trajectories are
    precision-sensitive; the earlier 2-term hi/lo split covered only
    ~17 of float32's 24 mantissa bits, and on the BEC (degenerate
    erasure LPs, run-to-convergence) the sub-2^-16 residue accumulated
    into a measurable WER shift vs the exact-f32 XLA gather route
    (margulis eps=0.4: fused 0.0131 vs golden 0.0080). Exactness costs
    a third MXU pass."""
    return _onehot_dot(val, a, transposed=transposed, exact=True)


def _admm_kernel(llr_ref, a_ref, x_out, it_out, z_sc, lam_sc, xe_sc,
                 v_sc, *, Dc, C, V, var_deg, mu, thresh, max_iter):
    """ADMM LP decoding, whole loop VMEM-resident (decoders/admm.py
    semantics, allow_pseudo=False) over the dense [Dc, C, V] one-hot
    tables. The parity-polytope projection is the same sort-free rank +
    candidate-bracket algorithm as ops/projection.py, unrolled over the
    Dc slot planes (no [.., 2D, D] tensor ever materializes — 13
    candidate planes fold elementwise). Regular graphs only (uniform
    var_deg, no padded slots)."""
    def hop(val, d, transposed):
        return _dot_split(val, a_ref[d], transposed)

    _admm_core(llr_ref[:].astype(jnp.float32), hop, x_out, it_out,
               z_sc, lam_sc, xe_sc, v_sc, Dc=Dc, var_deg=var_deg, mu=mu,
               thresh=thresh, max_iter=max_iter)


def _admm_kernel_fac(llr_ref, l_ref, m_ref, x_out, it_out, z_sc, lam_sc,
                     xe_sc, v_sc, *, Dc, C, lane, var_deg, mu, thresh,
                     max_iter):
    """ADMM over digit-factorized tables (``slot_tables_factored``) for
    graphs whose dense one-hots exceed VMEM (margulis): same core, the
    hops run one lane-wide matmul per variable group with 0/1 group
    masks — bit-identical f32 results at ~16x smaller tables. The
    variable axis is pre-padded to H * lane by the wrapper."""
    f32 = jnp.float32
    n_grp = m_ref.shape[1]

    def hop(val, d, transposed):
        if transposed:          # [bs, V_pad] -> [bs, C] (gather)
            acc = None
            for h in range(n_grp):
                g = _dot_split(val[:, h * lane:(h + 1) * lane],
                               l_ref[d], transposed=True) * m_ref[d, h]
                acc = g if acc is None else acc + g
            return acc
        outs = []               # [bs, C] -> [bs, V_pad] (scatter)
        for h in range(n_grp):
            outs.append(_dot_split(val * m_ref[d, h], l_ref[d],
                                   transposed=False))
        return jnp.concatenate(outs, axis=-1)

    _admm_core(llr_ref[:].astype(f32), hop, x_out, it_out,
               z_sc, lam_sc, xe_sc, v_sc, Dc=Dc, var_deg=var_deg, mu=mu,
               thresh=thresh, max_iter=max_iter)


def _admm_core(gamma, hop, x_out, it_out, z_sc, lam_sc, xe_sc, v_sc, *,
               Dc, var_deg, mu, thresh, max_iter):
    f32 = jnp.float32
    inv_mu = 1.0 / mu
    big = jnp.asarray(jnp.inf, f32)

    # init: z = 0.5 everywhere, lam = 0 (data-dependent zeros: Mosaic
    # gives constant loop-carry inits a lane-replicated layout and then
    # rejects the relayout when the body produces a regular vector).
    zero_c = hop(gamma, 0, transposed=True) * 0.0
    for d in range(Dc):
        z_sc[d] = zero_c + 0.5
        lam_sc[d] = zero_c
    zero_v = gamma * 0.0

    def body(_, carry):
        done_v, done_c, updates_c = carry

        # x-update (admm.py:56-57). State is read from scratch ON
        # DEMAND — holding z/lam/x_e/v as Dc-plane SSA lists across the
        # hop loops blows the compiler's live-range budget at margulis
        # scale (chip-bisected: the x_e+v lists alone kill the compile
        # even at block 16); scratch reads keep ranges one use long.
        acc = gamma * (-inv_mu)
        for d in range(Dc):
            acc = acc + hop(z_sc[d][:] - lam_sc[d][:] * inv_mu, d,
                            transposed=False)
        x = jnp.clip(acc / float(var_deg), 0.0, 1.0)

        # z-update: project v = x_e + lam/mu onto PP_Dc per check row.
        for d in range(Dc):
            ed = hop(x, d, transposed=True)
            xe_sc[d] = ed
            v_sc[d] = ed + lam_sc[d][:] * inv_mu

        def v(d):
            return v_sc[d][:]

        # descending rank with index tie-break (projection.py:58-62).
        rank = [zero_c for _ in range(Dc)]
        for d in range(Dc):
            r = zero_c
            for e in range(Dc):
                if e == d:
                    continue
                gt = (v(e) > v(d)) | ((v(e) == v(d)) & (e < d))
                r = r + gt.astype(f32)
            rank[d] = r

        # zc/f are one clip/compare from live state — recomputed at
        # every use instead of kept as Dc-plane lists, and the 13
        # candidate/T(beta) planes fold INCREMENTALLY (two passes over
        # recomputed candidates). Same values in the same fold order as
        # the materialized form (bit-identical beta), at ~24 fewer live
        # [bs, C] planes.
        def zc_of(d):
            return jnp.clip(v(d), 0.0, 1.0)

        s = zero_c
        for d in range(Dc):
            s = s + zc_of(d)
        s = jnp.floor(s)
        r_par = s - jnp.mod(s, 2.0)

        def f_of(d):
            return jnp.where(rank[d] <= r_par, 1.0, -1.0)

        fz = zero_c
        for d in range(Dc):
            fz = fz + f_of(d) * zc_of(d)
        easy = fz <= r_par

        # T at the 2*Dc clamped candidates + beta = 0 (projection.py:71-95).
        def t_of(beta):
            acc_t = zero_c
            for d in range(Dc):
                fd = f_of(d)
                acc_t = acc_t + fd * jnp.clip(v(d) - beta * fd, 0.0, 1.0)
            return acc_t

        def fold_cands(update):
            update(zero_c, fz)                       # beta = 0, T = fz
            for d in range(Dc):
                top = f_of(d) > 0
                for c in (jnp.where(top, v(d) - 1.0, -v(d)),
                          jnp.where(top, v(d), 1.0 - v(d))):
                    c = jnp.maximum(c, 0.0)
                    update(c, t_of(c))

        lo = zero_c
        hi = zero_c + big

        def upd_bracket(c, t):
            nonlocal lo, hi
            lo = jnp.where(t >= r_par, jnp.maximum(lo, c), lo)
            hi = jnp.where(t <= r_par, jnp.minimum(hi, c), hi)

        fold_cands(upd_bracket)
        t_lo = zero_c - big
        t_hi = zero_c + big

        def upd_t(c, t):
            nonlocal t_lo, t_hi
            t_lo = jnp.where(c == lo, jnp.maximum(t_lo, t), t_lo)
            t_hi = jnp.where(c == hi, jnp.minimum(t_hi, t), t_hi)

        fold_cands(upd_t)
        denom = t_lo - t_hi
        beta = jnp.where(denom > 0,
                         lo + (t_lo - r_par) * (hi - lo)
                         / jnp.where(denom > 0, denom, 1.0), lo)

        d1 = zero_c
        d2 = zero_c
        active_c = done_c == 0.0
        for d in range(Dc):
            z_new = jnp.where(easy, zc_of(d),
                              jnp.clip(v(d) - beta * f_of(d), 0.0, 1.0))
            xe_d = xe_sc[d][:]
            z_d = z_sc[d][:]
            d1 = d1 + (xe_d - z_new) ** 2
            d2 = d2 + (z_d - z_new) ** 2
            z_sc[d] = jnp.where(active_c, z_new, z_d)
            lam_sc[d] = jnp.where(active_c,
                                  lam_sc[d][:] + mu * (xe_d - z_new),
                                  lam_sc[d][:])

        # convergence: ||x_e - z||^2 and ||dz||^2 < eps^2 * nnz
        # (admm.py:15-25), per word.
        s1 = d1.sum(axis=-1, keepdims=True)          # [bs, 1]
        s2 = d2.sum(axis=-1, keepdims=True)
        close = ((s1 < thresh) & (s2 < thresh)).astype(f32)
        updates_c = updates_c + active_c.astype(f32)
        # Gate the decision write on the carry's done mask (BEFORE folding
        # in this iteration's `close`) so the converging iteration's
        # x-update lands — matching both the XLA ADMMDecoder (x updated
        # while active, done set afterward) and the reference (admm.py
        # updates x_hat in place before the is_close check).
        active_v = done_v == 0.0
        done_v = jnp.maximum(done_v, close)
        done_c = jnp.maximum(done_c, close)
        x_out[:] = jnp.where(active_v,
                             (x > 0.5).astype(jnp.int32), x_out[:])
        return done_v, done_c, updates_c

    _, (done_v, done_c, updates_c) = _bounded_loop(
        max_iter, body, (zero_v, zero_c, zero_c), done_idx=1)
    # reference histogram convention (admm.py:47-53): converged after k
    # updates -> k-1; cap-stopped -> cap.
    it_out[:] = (updates_c[:, 0:1]
                 - done_c[:, 0:1]).astype(jnp.int32)


def admm_decode_pallas(a_tab, llr, *, mu: float, eps: float,
                       max_iter: int, n_edge: int, var_deg: int,
                       block: int = 64, interpret: bool = False):
    """Fused ADMM (allow_pseudo=False): llr [B, V] -> (x_hat, iters)."""
    Dc, C, V = a_tab.shape
    B0 = llr.shape[0]
    if B0 % block:
        pad = block - B0 % block
        llr = jnp.concatenate(
            [llr, jnp.zeros((pad, V), llr.dtype)], axis=0)
    B = llr.shape[0]
    kern = functools.partial(_admm_kernel, Dc=Dc, C=C, V=V,
                             var_deg=int(var_deg), mu=float(mu),
                             thresh=float(eps) ** 2 * int(n_edge),
                             max_iter=int(max_iter))
    x_hat, iters = pl.pallas_call(
        kern,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, C, V), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dc, block, C), jnp.float32),   # z
            pltpu.VMEM((Dc, block, C), jnp.float32),   # lam
            pltpu.VMEM((Dc, block, C), jnp.float32),   # x_e (staged)
            pltpu.VMEM((Dc, block, C), jnp.float32),   # v (staged)
        ],
        interpret=interpret,
    )(llr.astype(jnp.float32), a_tab)
    return x_hat[:B0], iters[:B0, 0]


def admm_decode_pallas_factored(l_tab, m_tab, v_real, llr, *, mu: float,
                                eps: float, max_iter: int, n_edge: int,
                                var_deg: int, block: int = 32,
                                interpret: bool = False):
    """Fused ADMM over digit-factorized tables (margulis-scale graphs
    whose dense one-hots exceed VMEM): llr [B, V] -> (x_hat, iters).
    The variable axis pads to H * lane in-kernel-shape (pad variables
    touch no check: their x column clips to 0 and is trimmed)."""
    Dc, C, lane = l_tab.shape
    n_grp = m_tab.shape[1]
    v_pad = n_grp * lane
    B0, V0 = llr.shape
    assert V0 == v_real <= v_pad
    llr = jnp.concatenate(
        [llr, jnp.ones((B0, v_pad - V0), llr.dtype)], axis=1)
    if B0 % block:
        pad = block - B0 % block
        llr = jnp.concatenate(
            [llr, jnp.zeros((pad, v_pad), llr.dtype)], axis=0)
    B = llr.shape[0]
    kern = functools.partial(_admm_kernel_fac, Dc=Dc, C=C, lane=lane,
                             var_deg=int(var_deg), mu=float(mu),
                             thresh=float(eps) ** 2 * int(n_edge),
                             max_iter=int(max_iter))
    x_hat, iters = pl.pallas_call(
        kern,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block, v_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, C, lane), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, n_grp, 1, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, v_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, v_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dc, block, C), jnp.float32),   # z
            pltpu.VMEM((Dc, block, C), jnp.float32),   # lam
            pltpu.VMEM((Dc, block, C), jnp.float32),   # x_e (staged)
            pltpu.VMEM((Dc, block, C), jnp.float32),   # v (staged)
        ],
        interpret=interpret,
    )(llr.astype(jnp.float32), l_tab, m_tab)
    return x_hat[:B0, :V0], iters[:B0, 0]
