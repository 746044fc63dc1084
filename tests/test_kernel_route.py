"""RunConfig.kernel routing: forced Pallas (interpreter on CPU), the
auto-upgrade policy gates, and the compile-probe XLA fallback."""

import os

import jax
import numpy as np
import pytest

from ldpc_decoders_tpu.codes.ensembles import gen_rand_reg_ldpc
from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig


@pytest.fixture(scope="module")
def reg_code_name(tmp_path_factory):
    codes_dir = str(tmp_path_factory.mktemp("codes"))
    os.environ["FILE_CODES_DIR"] = codes_dir
    names = gen_rand_reg_ldpc(1, 128, 3, 6, seed=9, dir_path=codes_dir)
    yield names[0]
    del os.environ["FILE_CODES_DIR"]


def _cfg(name, **kw):
    base = dict(channel="bec", code=name, decoder="SPA", params=[0.35],
                codeword=0, min_wec=30, batch=256, max_iter=10,
                log_freq=1e9)
    base.update(kw)
    return RunConfig(**base)


def test_forced_pallas_matches_xla_bec(reg_code_name):
    """kernel='pallas' routes the runner through the fused kernel (the
    interpreter on CPU); the ternary BEC kernel is bit-equal to the
    gather route, so the Monte-Carlo tallies are IDENTICAL."""
    r_x = MonteCarloRunner(_cfg(reg_code_name, kernel="xla")).run()[0.35]
    r_p = MonteCarloRunner(_cfg(reg_code_name, kernel="pallas")).run()[0.35]
    assert r_p["tot"] == r_x["tot"]
    assert r_p["wec"] == r_x["wec"]
    assert r_p["bec"] == r_x["bec"]


def test_forced_pallas_rejects_ineligible():
    """Hamming(7,4) is irregular (padded slots) — forcing the fused
    kernel must raise the eligibility error, not silently fall back."""
    with pytest.raises(ValueError, match="regular"):
        MonteCarloRunner(_cfg("7_4_hamming", kernel="pallas"))


def test_forced_pallas_f32_keeps_precision(reg_code_name):
    """kernel='pallas' on float32 BSC workloads must NOT silently
    change message precision: the decoder routes to the exact-f32
    kernel variants (float32 scratch, 3-term split hops), keeping f32
    message dynamics for the tie structure."""
    for decoder in ("MSA", "SPA"):
        r = MonteCarloRunner(_cfg(reg_code_name, channel="bsc",
                                  decoder=decoder, codeword=1,
                                  kernel="pallas"))
        assert r.dec.dec.perm == "pallas"
        assert r.dec.dec.msg_dtype == np.float32


def test_auto_stays_xla_on_cpu(reg_code_name):
    """On the CPU backend 'auto' keeps the XLA route (the interpreter
    kernel would be orders of magnitude slower than compiled XLA)."""
    runner = MonteCarloRunner(_cfg(reg_code_name, kernel="auto"))
    assert runner.dec.dec.perm != "pallas"
    assert runner._fallback_dec is None


def test_auto_policy_gates(reg_code_name, monkeypatch):
    """Policy table under a (faked) TPU backend: bec/biawgn upgrade;
    bsc-float32 upgrades to the exact-f32 kernel variants (message
    precision preserved — the tie structure is not bf16-safe); explicit
    bfloat16 opts bsc into the bf16 kernels; biawgn float32 downgrades
    to the validated bf16 kernel. Decoder construction only — no
    dispatch."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    up = MonteCarloRunner(_cfg(reg_code_name, channel="bec"))
    assert up.dec.dec.perm == "pallas" and up._probe_pending
    up = MonteCarloRunner(_cfg(reg_code_name, channel="biawgn",
                               decoder="MSA", codeword=1))
    assert up.dec.dec.perm == "pallas"
    assert up.dec.dec.msg_dtype == jax.numpy.bfloat16
    bsc_f32 = MonteCarloRunner(_cfg(reg_code_name, channel="bsc",
                                    decoder="MSA", codeword=1))
    assert bsc_f32.dec.dec.perm == "pallas"
    assert bsc_f32.dec.dec.msg_dtype == np.float32
    optin = MonteCarloRunner(_cfg(reg_code_name, channel="bsc",
                                  decoder="MSA", codeword=1,
                                  msg_dtype="bfloat16"))
    assert optin.dec.dec.perm == "pallas"
    assert optin.dec.dec.msg_dtype == jax.numpy.bfloat16
    conv = MonteCarloRunner(_cfg(reg_code_name, channel="bec",
                                 max_iter=0))
    assert conv.dec.dec.perm != "pallas"  # unbounded-iteration runs


def test_auto_probe_falls_back_to_xla(reg_code_name, monkeypatch):
    """With the backend faked as TPU on a CPU host, the auto-selected
    kernel engages, the first-chunk compile probe fails (Mosaic cannot
    lower for CPU), and the run transparently completes on XLA with
    correct statistics."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    runner = MonteCarloRunner(_cfg(reg_code_name, channel="bec"))
    assert runner.dec.dec.perm == "pallas"
    res = runner.run()[0.35]
    assert runner.dec.dec.perm != "pallas"      # fell back
    assert runner._fallback_dec is None
    ref = MonteCarloRunner(_cfg(reg_code_name, kernel="xla")).run()[0.35]
    assert res["tot"] == ref["tot"] and res["wec"] == ref["wec"]
