"""Adaptive Monte-Carlo sweep runner.

TPU re-design of the reference's experiment harness (src/main.py:10-51).
The reference draws ONE codeword per loop iteration through un-compiled
numpy; here each host-loop tick runs a jit-compiled *super-batch chunk*
(sample -> transmit -> decode -> tally, all on device), and the reference's
adaptive ``while wec < min_wec`` termination (main.py:37) becomes a host
loop over chunks. The channel parameter is a traced scalar, so one
compilation serves every sweep point.

Multi-chip: pass a ``jax.sharding.Mesh`` with a ``batch`` axis; the chunk
is then ``shard_map``-ed so each device simulates ``batch/ndev`` codewords
and tallies combine with ``psum`` over ICI — replacing the reference's
shell-level process fan-out + JSON-file merging (run_sims.sh:15-25,
SURVEY.md 2.23).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import OrderedDict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ldpc_decoders_tpu.channels import CHANNELS
from ldpc_decoders_tpu.codes import get_code
from ldpc_decoders_tpu.harness.saver import Saver

ITER_HIST_LEN = 2000  # reference admm.py:36


def _start_host_copy(tallies):
    """Kick off the device->host copy of a chunk's packed tally vector at
    DISPATCH time (it enqueues behind the chunk's compute), so the
    blocking ``np.asarray`` in consume() lands pipeline-depth chunks
    later on already-transferred bytes. Over the remote-tunnel TPU
    backend this removes the fetch RTT from the host critical path
    entirely: 627k -> 684k cw/s measured at the flagship point
    (scripts/profile_harness_r5.py variant D). Best-effort — backends
    without the method just fetch synchronously in consume()."""
    try:
        tallies.copy_to_host_async()
    except Exception:  # noqa: BLE001 - pure optimization, never fatal
        pass
    return tallies


def kernel_policy_ok(cfg: "RunConfig") -> bool:
    """Whether the fused Pallas route is *proven equivalent* for this
    (channel, decoder, precision) — eligibility beyond mere
    compilability:

    - ADMM: kernel is trajectory-identical in f32 (hi/lo split dots,
      tests/test_pallas_bp.py) — always OK;
    - bec: the ternary kernel is bit-equal to the gather route
      (integer dynamics) — always OK;
    - biAWGN BP: bf16-message kernels; bf16 curves are statistically
      validated against the goldens (docs/SCALING.md), so float32
      configs downgrade to the faster bf16 kernel;
    - BSC BP: LLRs are equal multiples of log((1-p)/p) and that tie
      structure is NOT bf16-safe, so float32 configs route to the
      exact-f32 kernel variants (f32 message scratch, 3-term-split
      one-hot hops) — chip-validated at 2.4x/3.1x the XLA routes
      (MSA 271k vs 111k, refmode SPA 140k vs ~45k cw/s) and held to
      the same cross-route f32 tie-jitter bar as the XLA routes
      themselves (docs/SCALING.md "Exact-float32 fused BP kernels");
      explicit bfloat16 still opts into the bf16 kernels.

    Shared by MonteCarloRunner and CapSweepRunner (the cap-sweep grid
    runs the same five BP workloads with snapshot planes).
    """
    if cfg.decoder == "ADMM":
        return not cfg.allow_pseudo
    if cfg.channel == "bec":
        return True
    if jnp.dtype(cfg.msg_dtype) == jnp.bfloat16:
        return True
    if cfg.channel == "biawgn":
        return True
    # BSC ties are only safe through the exact-f32 kernel variants,
    # which decode_tables selects for msg_dtype == float32 precisely
    # (decoders/bp.py). Any other dtype (float64 under x64) would
    # silently quantize through the bf16-message kernel — refuse.
    return (cfg.channel == "bsc"
            and jnp.dtype(cfg.msg_dtype) == jnp.float32)


@dataclasses.dataclass
class RunConfig:
    channel: str
    code: str
    decoder: str
    params: Sequence[float] = (0.1, 0.01)
    codeword: int = 0          # 0 / 1 / -1 = random codebook row
    min_wec: int = 100
    max_iter: int = 10
    mu: float = 3.0
    eps: float = 1e-5
    allow_pseudo: bool = False
    layers: Sequence[int] = (100, 100)
    train: bool = False
    apprx: int = -1
    iter_cap: int = 2000
    batch: int = 4096          # codewords per compiled chunk
    seed: int = 0
    log_freq: float = 5.0
    max_words: Optional[int] = None   # safety cap per sweep point (new)
    data_dir: Optional[str] = None
    cache_dir: Optional[str] = None
    profile: bool = False             # LoopProfiler per-section timings
    # BP message precision: "float32" (default, bit-matches the reference
    # regime) or "bfloat16" (~19% faster on TPU; statistically equivalent
    # curves, validated vs goldens).
    msg_dtype: str = "float32"
    # Chunks dispatched ahead of the host sync point: overlaps host
    # tallying with device decode (the sync stall otherwise dominates —
    # ~1.9x end-to-end on a v5e; remote-tunnel backends profit from a
    # deeper pipeline). 1 = fully synchronous.
    pipeline: int = 4
    # SPA inf handling: "reference" reproduces the float64 inf/NaN
    # cascade the golden curves depend on; "saturate" is the clean,
    # ~2x-faster policy (decoders/bp.py, docs/SCALING.md).
    inf_policy: str = "reference"
    # Adaptive pipeline fill: ramp the dispatch pipeline up from depth 1
    # and cap in-flight chunks by the EXPECTED chunks remaining to
    # min_wec (err/chunk running estimate). Fast sweep points then stop
    # dispatching at the target instead of draining ``pipeline`` surplus
    # chunks (a fixed depth-4 x batch-16384 pipeline decodes up to 64k
    # words past the target at every easy point); deep tails see the
    # full pipeline unchanged. The stopping rule still depends only on
    # already-consumed tallies and every dispatched chunk is consumed,
    # so the min-wec estimator stays unbiased (reference main.py:37
    # semantics).
    adaptive_pipeline: bool = True
    # ADMM probe-and-sort on the fused route ("auto" | "on" | "off"):
    # rank words by a capped probe decode and decode sorted so the
    # block-granular early exit tracks per-word cost — bit-identical
    # outputs; "auto" engages at deep caps (decoders/admm.py).
    presort: str = "auto"
    # Compute-kernel route: "auto" promotes the fused whole-loop Pallas
    # kernels (ops/pallas_bp.py, 1.4-4.3x the XLA routes on a v5e) when
    # the workload is eligible AND proven-equivalent for the channel
    # (see MonteCarloRunner._kernel_policy_ok), with a compile-probe at
    # the real batch shape falling back to the XLA route on any failure.
    # "xla" keeps the XLA routes; "pallas" forces the fused kernel
    # (raising if the workload is ineligible).
    kernel: str = "auto"

    def decoder_kwargs(self) -> dict:
        return dict(max_iter=self.max_iter, mu=self.mu, eps=self.eps,
                    allow_pseudo=self.allow_pseudo, layers=list(self.layers),
                    train=self.train, apprx=self.apprx,
                    iter_cap=self.iter_cap, cache_dir=self.cache_dir,
                    msg_dtype=jnp.dtype(self.msg_dtype),
                    inf_policy=self.inf_policy, presort=self.presort)


class MonteCarloRunner:
    """Runs one (channel, code, decoder) sweep to the target error count."""

    def __init__(self, cfg: RunConfig,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 rotating: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.rotating = bool(rotating)
        self.mod = CHANNELS[cfg.channel]
        self.code = get_code(cfg.code)
        # A mesh with a "code" axis selects model parallelism: parity
        # checks shard over it (EdgeShardedBPDecoder) instead of — or,
        # 2-D, in addition to — the codeword batch. SURVEY.md section 5
        # "long-code edge sharding".
        self.code_sharded = (mesh is not None
                             and "code" in mesh.axis_names)
        if self.code_sharded:
            self.dec = self._build_edge_sharded(mesh)
        else:
            self.dec = self.mod.DECODERS[cfg.decoder](
                self.code, **cfg.decoder_kwargs())
        self.host_only = getattr(self.dec, "host_only", False)
        self.track_hist = getattr(getattr(self.dec, "dec", None),
                                  "track_iter_hist", False)
        # Stateful decoders (ADMMA online training) update host-side
        # parameters in decode(); tracing that inside the chunk jit would
        # leak tracers and silently discard the training, so their chunks
        # dispatch eagerly (the decoder's own inner jit still compiles
        # the hot loop).
        self.stateful = getattr(getattr(self.dec, "dec", None),
                                "stateful", False)
        # Tables-parameterized decoders (BP families) can take their
        # member-specific index/permutation tables as traced ARGUMENTS
        # instead of jit-baked constants: the compiled chunk then serves
        # any same-shape ensemble member (rotate_member). Engaged only
        # when ``rotating`` is requested — a plain single-code run keeps
        # the constants route, which measures ~5% faster on the matmul
        # permutation path (the one-hot tables' layouts specialize at
        # compile time; docs/SCALING.md "Ensemble decode routes").
        self.rotatable = (self.rotating
                          and hasattr(getattr(self.dec, "dec", None),
                                      "member_tables")
                          and not self.host_only and not self.stateful)
        if self.rotating and not self.rotatable:
            raise ValueError(
                f"decoder {cfg.decoder} does not support member rotation")

        # Run identity: same id-key convention as reference main.py:13.
        id_keys = (["channel", "code", "decoder", "codeword", "min_wec"]
                   + list(self.dec.id_keys or []))
        cfg_vars = dataclasses.asdict(cfg)
        self.id_vals = [cfg_vars[k] for k in id_keys]
        self.id_keys = id_keys
        self.log = logging.getLogger(".".join(str(v) for v in self.id_vals))
        # Multi-host: tallies are globally psum-reduced, so every process
        # sees identical results — host 0 is the single Saver writer
        # (replaces the reference's per-Slurm-task JSON files merged on a
        # shared filesystem, run_sims.sh:15-25).
        self.saver = (Saver(cfg.data_dir, list(zip(id_keys, self.id_vals)))
                      if cfg.data_dir and jax.process_index() == 0 else None)

        batch_span = (mesh.shape.get("batch", 1) if mesh is not None
                      else 1)
        if cfg.batch % batch_span:
            raise ValueError("batch must divide evenly over the mesh's "
                             "batch axis")
        if self.stateful and mesh is not None:
            # Functional state threading: replicated params ride the
            # chunk as an argument; grads pmean inside the decoder
            # keep every device's copy identical (synchronous
            # data-parallel training over the global batch).
            self._dec_state = self.dec.dec.get_state()
        self._fallback_dec = None
        self._probe_pending = False
        self._edge_pad = 0
        if cfg.kernel != "xla" and not self.code_sharded:
            self._maybe_upgrade_kernel()
        self._build_chunk()

    # ------------------------------------------------------------------
    def _build_edge_sharded(self, mesh):
        """Model-parallel decoder for a "code"-axis mesh: checks (and
        message memory) shard over the axis, so codes too large for one
        chip Monte-Carlo end-to-end through the normal harness loop."""
        from ldpc_decoders_tpu.parallel.bp_edge_sharded import (
            EdgeShardedBPDecoder,
        )

        cfg = self.cfg
        if cfg.decoder not in ("SPA", "MSA"):
            raise ValueError("code-axis sharding supports the LLR-domain "
                             "BP decoders (SPA/MSA) only")
        if cfg.channel == "bec":
            raise ValueError("code-axis sharding is LLR-domain; the "
                             "ternary BEC SPA does not shard yet")
        batch_axis = "batch" if "batch" in mesh.axis_names else None
        inner = EdgeShardedBPDecoder(
            self.code.parity_mtx, mesh, cfg.decoder,
            max_iter=cfg.max_iter, iter_cap=cfg.iter_cap,
            batch_axis=batch_axis, inf_policy=cfg.inf_policy,
            check_init=(cfg.channel != "biawgn"))
        if cfg.channel == "biawgn":
            from ldpc_decoders_tpu.channels.biawgn import _AWGNLLRWrapped
            return _AWGNLLRWrapped(inner)
        from ldpc_decoders_tpu.channels.bsc import _LLRWrapped
        return _LLRWrapped(inner)

    # ------------------------------------------------------------------
    def _build_chunk(self) -> None:
        if self.code_sharded:
            # The edge-sharded decoder IS the shard_map (tables sharded
            # over the "code" axis, one psum per BP iteration); sampling
            # and tallies stay replicated in a plain jit around it.
            body = self._chunk_body
            self._chunk = jax.jit(lambda *a, **kw: body(*a, **kw))
        elif self.mesh is not None:
            self._chunk = self._build_sharded_chunk(self.mesh)
        elif self.stateful:
            self._chunk = self._chunk_body  # eager; decoder jits inside
        else:
            # NOT jax.jit(self._chunk_body): equal bound methods hash
            # equal, so after a kernel-route fallback the global pjit
            # cache would replay the abandoned route's trace. The fresh
            # closure forces a re-trace that reads the current self.dec.
            body = self._chunk_body
            self._chunk = jax.jit(lambda *a, **kw: body(*a, **kw))

    def _kernel_policy_ok(self) -> bool:
        return kernel_policy_ok(self.cfg)

    def _maybe_upgrade_kernel(self) -> None:
        """Swap the decoder for its fused-Pallas variant when the config
        allows it (cfg.kernel). Under "auto" the swap is provisional: the
        first chunk dispatch compile-probes the kernel at the REAL batch
        shape (Mosaic's VMEM accounting is shape-dependent — a small
        probe passes where the real grid OOMs and vice versa) and any
        failure falls back to the XLA route (run_param)."""
        cfg = self.cfg
        forced = cfg.kernel == "pallas"
        if cfg.decoder not in ("SPA", "MSA", "ADMM"):
            if forced:
                raise ValueError(
                    f"no fused kernel for decoder {cfg.decoder!r}")
            return
        if self.host_only or self.stateful:
            if forced:
                raise ValueError("kernel='pallas' needs a device decoder")
            return
        if not forced:
            try:
                backend = jax.default_backend()
            except Exception:   # backend outage: decide later ops' fate
                return          # elsewhere, keep construction working
            if backend == "cpu":
                return  # interpreter-mode kernels are for tests only
            if cfg.max_iter <= 0 and cfg.decoder != "ADMM":
                return  # BP convergence runs: keep per-call work bounded
                # (ADMM runs-to-convergence are the MAR campaign staple;
                # chip-measured fused chunks stay under the worker
                # watchdog even at the cap-bound BSC points, at ~2x the
                # gather route — see docs/SCALING.md margulis ADMM.)
            if not self._kernel_policy_ok():
                return
            from ldpc_decoders_tpu.ops.pallas_bp import (
                factored_tables_fit_vmem,
                tables_fit_vmem,
            )
            if not tables_fit_vmem(self.code.graph):
                # Digit-factorized fallback: a chip-measured WIN for
                # ADMM (2-9x the gather route with presort), the ternary
                # BEC SPA (1.2x, integer-exact), and — round 5, after
                # the staged body + vacc scatter store — the bf16
                # refmode SPA (35.8k vs 26.9k XLA at margulis, 1.33x;
                # the biAWGN f32 config downgrades to bf16 below, same
                # as the dense kernels). Margulis MSA and exact-f32
                # refmode measured a wash or worse vs the XLA routes
                # (MSA bf16 45k vs 52k; refmode exact-f32 compiles only
                # at block 8 and loses, 8.9k vs 11.2k) and stay on XLA.
                fac_ok = factored_tables_fit_vmem(self.code.graph)
                bf16_refmode_spa = (
                    cfg.decoder == "SPA"
                    and cfg.inf_policy == "reference"
                    and (cfg.channel == "biawgn"
                         or jnp.dtype(cfg.msg_dtype) == jnp.bfloat16))
                if not (fac_ok and (cfg.decoder == "ADMM"
                                    or cfg.channel == "bec"
                                    or bf16_refmode_spa)):
                    return
        kw = cfg.decoder_kwargs()
        kw["perm"] = "pallas"
        if cfg.decoder in ("SPA", "MSA") and cfg.channel != "bec":
            # The BP kernels come in bf16 and exact-f32 variants
            # (3-term split hops for tie-structured f32 workloads —
            # BSC). Auto-promoted biAWGN f32 keeps the historical
            # downgrade to the faster bf16 kernel (statistically
            # validated vs goldens); everything else passes msg_dtype
            # through — float32 selects the exact_f32 kernels.
            if (jnp.dtype(cfg.msg_dtype) != jnp.bfloat16 and not forced
                    and cfg.channel == "biawgn"):
                kw["msg_dtype"] = jnp.bfloat16
        try:
            new_dec = self.mod.DECODERS[cfg.decoder](self.code, **kw)
        except Exception as e:  # irregular graph, unsupported mode, ...
            if forced:
                raise
            self.log.info("pallas kernel ineligible (%s); XLA route", e)
            return
        self._fallback_dec = self.dec
        self.dec = new_dec
        self._probe_pending = not forced

    def _abandon_pallas(self, err: Exception) -> None:
        self.log.warning(
            "pallas kernel route failed at the run shape (%s: %s); "
            "falling back to the XLA route", type(err).__name__, err)
        self.dec = self._fallback_dec
        self._fallback_dec = None
        if self.rotatable:
            # Re-sync the fallback decoder's tables to the current member
            # (rotate_member may have moved on since construction).
            inner = self.dec.dec
            inner.tables = inner.member_tables(self.code.graph,
                                               n_edge_pad=self._edge_pad)
            inner.graph = self.code.graph
        self._build_chunk()

    # ------------------------------------------------------------------
    def rotate_member(self, code_name: str, n_edge_pad: int = 0,
                      seed: Optional[int] = None) -> None:
        """Point this runner at another same-shape ensemble member
        WITHOUT recompiling: the chunk executable reads all member-
        specific data from its traced ``tables`` argument, so swapping
        the inner decoder's tables (+ Saver/logger identity) re-targets
        the compiled program. This is the TPU answer to the reference's
        10-cluster-jobs-per-ensemble-config pattern (simulations.py:79-85)
        — one compile, then every member decodes at full single-code rate
        (the G-stacked joint program measured ~100x slower per word on a
        v5e; docs/SCALING.md "Ensemble decode routes").

        ``n_edge_pad``: common edge-axis length for edge-layout decoders
        (BEC SPA) when members' double-edge cancellation left different
        edge counts. ``seed`` optionally re-seeds the member's sweep.
        """
        if not self.rotatable:
            raise ValueError("decoder does not support member rotation")
        if self.cfg.codeword == -1:
            raise ValueError("random-codeword mode samples a member-"
                             "specific codebook; rotation requires "
                             "codeword 0/1")
        self._edge_pad = int(n_edge_pad)
        self.cfg = dataclasses.replace(
            self.cfg, code=code_name,
            **({"seed": seed} if seed is not None else {}))
        self.code = get_code(code_name)
        inner = self.dec.dec
        inner.tables = inner.member_tables(self.code.graph,
                                           n_edge_pad=n_edge_pad)
        inner.graph = self.code.graph
        cfg_vars = dataclasses.asdict(self.cfg)
        self.id_vals = [cfg_vars[k] for k in self.id_keys]
        self.log = logging.getLogger(
            ".".join(str(v) for v in self.id_vals))
        self.saver = (Saver(self.cfg.data_dir,
                            list(zip(self.id_keys, self.id_vals)))
                      if self.cfg.data_dir and jax.process_index() == 0
                      else None)

    # ------------------------------------------------------------------
    def _sample_x(self, key, batch: int) -> jnp.ndarray:
        n = self.code.get_n()
        if self.cfg.codeword == -1:
            cb = jnp.asarray(self.code.cb, jnp.int32)
            idx = jax.random.randint(key, (batch,), 0, cb.shape[0])
            return cb[idx]
        return jnp.full((batch, n), self.cfg.codeword, jnp.int32)

    def _chunk_body(self, key, i, param, tables=None,
                    batch: Optional[int] = None):
        """One super-batch: returns ONE packed int32 tally vector —
        ``[wec, bec]``, extended with the in-graph iteration histogram
        (length ITER_HIST_LEN) for stats-tracking decoders. ``i`` is the
        chunk counter — key derivation happens inside jit so each chunk
        is a single host->device dispatch. ``tables`` (rotatable
        decoders) carries the member-specific decoder tables as traced
        arguments.

        Packing matters: over a remote-tunnel backend every blocking
        device->host fetch costs a full RTT (~20 ms measured on the axon
        v5e), and while ONE fetch per chunk hides under the dispatch
        pipeline, a second does not — it alone halved campaign
        throughput (627k -> 321k cw/s at the flagship point,
        scripts/profile_harness_r5.py). One packed vector = one fetch."""
        batch = batch or self.cfg.batch
        kx, kc, kd = jax.random.split(jax.random.fold_in(key, i), 3)
        x = self._sample_x(kx, batch)
        y = self.mod.send(kc, x, param)
        if tables is not None:
            x_hat, aux = self.dec.decode_tables(tables, y, param, kd)
        else:
            x_hat, aux = self.dec.decode(y, param, kd)
        errs = (x_hat != x.astype(x_hat.dtype)).sum(axis=-1)
        out = jnp.stack([(errs > 0).sum(), errs.sum()]).astype(jnp.int32)
        if self.track_hist:
            iters = aux.get("iters", jnp.zeros(batch, jnp.int32))
            hist = jnp.bincount(jnp.clip(iters, 0, ITER_HIST_LEN - 1),
                                length=ITER_HIST_LEN).astype(jnp.int32)
            out = jnp.concatenate([out, hist])
        return out

    def _build_sharded_chunk(self, mesh):
        local = self.cfg.batch // mesh.devices.size
        stateful = self.stateful
        rotatable = self.rotatable

        def per_device(key, i, param, *extra):
            dev_key = jax.random.fold_in(key, jax.lax.axis_index("batch"))
            tables = extra[0] if rotatable else None
            state = extra[1:] if rotatable else extra
            if stateful:
                self.dec.dec.begin_pure(state[0], axis_name="batch")
            tallies = self._chunk_body(dev_key, i, param,
                                       tables=tables, batch=local)
            # One psum covers wec, bec AND the in-graph histogram (the
            # packed tally vector is elementwise-additive across devices);
            # the replicated result is addressable on every host.
            summed = jax.lax.psum(tallies, "batch")
            if stateful:
                return summed, self.dec.dec.end_pure()
            return summed

        # Replicated extras: member tables (rotatable) and/or decoder
        # state (stateful); P() broadcasts over every pytree leaf.
        extra_specs = ((P(),) if rotatable else ()) + \
                      ((P(),) if stateful else ())
        # check_vma=False: decode loops carry constants (iteration counters)
        # that jax's varying-axis checker would otherwise reject; every
        # cross-device value we consume is explicitly psum-reduced.
        sharded = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P()) + extra_specs,
            out_specs=(P(), P()) if stateful else P(),
            check_vma=False)
        return jax.jit(sharded)

    # ------------------------------------------------------------------
    def run_param(self, param: float, key) -> OrderedDict:
        cfg = self.cfg
        self._param = param
        param_key = key
        self._param_key = key
        tot = wec = bec = 0
        hist = np.zeros(ITER_HIST_LEN, dtype=np.int64)
        t_start = t_log = time.time()
        # Throughput is measured from after the first chunk lands (jit
        # compile + warmup excluded); counting compile time misreported
        # the first sweep point's words_per_sec by orders of magnitude.
        t_warm = None
        tot_warm = 0

        def status() -> OrderedDict:
            wer = wec / tot if tot else 0.0
            ber = bec / (tot * self.code.get_n()) if tot else 0.0
            vals = OrderedDict([("tot", int(tot)), ("wec", int(wec)),
                                ("wer", float(wer)), ("bec", int(bec)),
                                ("ber", float(ber))])
            if self.track_hist and hist.sum():
                avg = float(hist @ np.arange(ITER_HIST_LEN) / hist.sum())
                vals["dec"] = {"average": avg, "iter": hist.tolist()}
            if t_warm is not None and tot > tot_warm:
                wps = (tot - tot_warm) / (time.time() - t_warm)
            else:
                elapsed = time.time() - t_start
                wps = tot / elapsed if elapsed > 0 else 0.0
            vals["words_per_sec"] = float(wps)
            return vals

        def log_status():
            v = status()
            self.log.info(", ".join(
                f"{k.upper()}:{v[k]}" for k in
                ("tot", "wec", "wer", "bec", "ber", "words_per_sec")))
            if self.saver:
                self.saver.add(param, v)

        if self.host_only:
            decode_chunk = self._host_chunk
        elif self.stateful and self.mesh is not None:
            # Thread the replicated decoder state chunk-to-chunk; the
            # dependency chains dispatches but they stay asynchronous.
            def decode_chunk(i):
                t, self._dec_state = self._chunk(
                    param_key, i, param, self._dec_state)
                return _start_host_copy(t)
        elif self.rotatable:
            # Member tables ride every dispatch as traced arguments, so
            # rotate_member() swaps the decoded code without recompiling.
            def decode_chunk(i):
                return _start_host_copy(
                    self._chunk(param_key, i, param, self.dec.tables))
        else:
            # Returns a device array: dispatch is asynchronous, the sync
            # happens in consume() pipeline-depth slots later.
            def decode_chunk(i):
                return _start_host_copy(self._chunk(param_key, i, param))

        if self._probe_pending:
            # Compile-probe the auto-selected Pallas route at the REAL
            # run shape (chunk index 0 is never reused by the main loop;
            # its tallies are discarded, which is outcome-independent and
            # leaves the estimator unbiased). Any failure — Mosaic VMEM
            # overflow at this grid, compiler rejection, backend quirk —
            # falls back to the proven XLA route.
            self._probe_pending = False
            try:
                jax.block_until_ready(decode_chunk(0))
                self._fallback_dec = None   # release the XLA tables
            except Exception as e:  # noqa: BLE001
                from ldpc_decoders_tpu.utils.backend import (
                    is_transient_backend_error,
                )
                if is_transient_backend_error(e):
                    # Transient TPU worker outage, not kernel
                    # ineligibility — fail loudly instead of silently
                    # downgrading the whole campaign to the XLA route.
                    raise
                self._abandon_pallas(e)

        from collections import deque

        from ldpc_decoders_tpu.utils.profiler import LoopProfiler
        prof = LoopProfiler(self.log, dump_freq=20 if cfg.profile else 0)
        depth = max(1, int(cfg.pipeline)) if not self.host_only else 1
        pending: deque = deque()

        consumed = 0

        def consume():
            # ONE blocking fetch per chunk: the packed tally vector (see
            # _chunk_body). Its host copy was started at dispatch time, so
            # in steady state np.asarray finds the bytes already landed.
            nonlocal tot, wec, bec, hist, t_warm, tot_warm, consumed
            consumed += 1
            arr = np.asarray(pending.popleft(), dtype=np.int64)
            wec += int(arr[0])
            bec += int(arr[1])
            tot += cfg.batch
            if t_warm is None:
                t_warm = time.time()
                tot_warm = tot
            if self.track_hist:
                hist += arr[2:]

        def effective_depth(tick: int) -> int:
            """Pipeline-fill target for this tick (adaptive_pipeline).

            Two caps on cfg.pipeline: a 1-2-4-... ramp (one early sync,
            so a point the first chunk already finishes never builds a
            surplus pipeline), and — once errors have been observed —
            the expected number of chunks remaining to min_wec, so
            dispatch stops when the words already in flight are
            expected to cross the target."""
            if not cfg.adaptive_pipeline:
                return depth
            eff = min(depth, 1 << min(tick - 1, 10))
            if wec > 0 and consumed > 0 and wec < cfg.min_wec:
                exp_remaining = (cfg.min_wec - wec) * consumed / wec
                eff = min(eff, max(1, int(np.ceil(exp_remaining))))
            return eff

        chunk_i = 0
        while wec < cfg.min_wec:
            with prof.start():
                chunk_i += 1
                with prof.tag("dispatch"):
                    pending.append(decode_chunk(chunk_i))
                while len(pending) >= effective_depth(chunk_i):
                    with prof.tag("consume"):
                        consume()
                if time.time() - t_log > cfg.log_freq:
                    t_log = time.time()
                    with prof.tag("log"):
                        log_status()
            if cfg.max_words and tot + cfg.batch * len(pending) >= cfg.max_words:
                self.log.warning("max_words cap hit at %d", tot)
                break
        # Drain in-flight chunks; their inclusion is outcome-independent,
        # so the estimator stays unbiased (chunked min-wec semantics,
        # reference main.py:37 samples until the target is crossed).
        while pending:
            consume()
        # Dispatch accounting for tests/diagnostics: with
        # adaptive_pipeline every dispatched chunk is consumed and easy
        # points stop at (or near) the minimal chunk count.
        self.last_dispatch_stats = {"dispatched": chunk_i,
                                    "consumed": consumed}

        if self.stateful and self.mesh is not None:
            # Land the trained (replicated) params back on the decoder so
            # save()/later sweep points see them.
            self.dec.dec.set_state(self._dec_state)

        log_status()
        return status()

    def _host_chunk(self, i):
        """Host-side decoders (LP): sample on device, decode on host.
        Returns the same packed [wec, bec] tally vector as the device
        chunks so consume() is route-oblivious."""
        param = self._param
        kx, kc, kd = jax.random.split(
            jax.random.fold_in(self._param_key, i), 3)
        x = np.asarray(self._sample_x(kx, self.cfg.batch))
        y = self.mod.send(kc, jnp.asarray(x), param)
        x_hat, _ = self.dec.decode(y, param, kd)
        errs = (np.asarray(x_hat) != x.astype(np.asarray(x_hat).dtype)).sum(-1)
        return np.array([(errs > 0).sum(), errs.sum()], np.int64)

    def run(self) -> dict:
        """Full sweep (reference main.py:22-50). Returns {param: metrics}."""
        key = jax.random.PRNGKey(self.cfg.seed)
        results = {}
        for param in self.cfg.params:
            self.log.info("Starting parameter: %f", param)
            self._param = param
            key, sub = jax.random.split(key)
            results[param] = self.run_param(param, sub)
        self.log.info("Done!")
        return results


def run_rotating_members(cfg: RunConfig, member_names, mesh=None) -> dict:
    """Monte-Carlo a whole same-shape code ensemble, one member at a
    time, through ONE compiled chunk (see
    :meth:`MonteCarloRunner.rotate_member`). Per-member adaptive
    ``min_wec`` termination and per-member result files exactly as the
    reference's independent ensemble jobs produce
    (simulations.py:79-85). Returns ``{member: {param: metrics}}``."""
    e_pad = max(get_code(n).graph.n_edge for n in member_names)
    runner = MonteCarloRunner(
        dataclasses.replace(cfg, code=member_names[0]), mesh=mesh,
        rotating=True)
    results = {}
    for idx, name in enumerate(member_names):
        # Distinct seeds keep members' channel noise independent.
        runner.rotate_member(name, n_edge_pad=e_pad,
                             seed=cfg.seed + idx)
        results[name] = runner.run()
    return results
