"""Harness tests: Saver JSON schema parity, adaptive Monte-Carlo runner on
single device and on a sharded 8-device CPU mesh, and statistical
agreement with the reference's golden curves (SURVEY.md section 4's
"golden-JSON tolerance tests")."""

import json
import math
import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig, Saver

REF_OUTPUT = "/root/reference/data/output"


def test_saver_schema(tmp_path):
    s = Saver(str(tmp_path), [("channel", "bec"), ("code", "7_4_hamming"),
                              ("decoder", "SPA"), ("codeword", 1),
                              ("min_wec", 100), ("max_iter", 10)])
    s.add(0.1, {"tot": 100, "wec": 5, "wer": 0.05, "bec": 9, "ber": 0.01})
    s.add(0.2, {"tot": 50, "wec": 9, "wer": 0.18, "bec": 11, "ber": 0.03})
    s.add(0.1, {"tot": 200, "wec": 8, "wer": 0.04, "bec": 12, "ber": 0.008})

    path = os.path.join(
        str(tmp_path), "bec-7_4_hamming-SPA-1-100-10.json")
    assert s.file_path == path and os.path.exists(path)
    d = json.load(open(path))
    # Same layout as the reference's files: run ids then per-metric dicts
    # keyed by str(param) (utils.py:128-136).
    assert d["channel"] == "bec" and d["max_iter"] == 10
    assert d["tot"] == {"0.1": 200, "0.2": 50}   # later add overwrote 0.1
    assert set(d) >= {"tot", "wec", "wer", "bec", "ber"}


def _run(cfg, mesh=None):
    return MonteCarloRunner(cfg, mesh=mesh).run()


def test_runner_bec_spa_end_to_end(tmp_path):
    cfg = RunConfig(channel="bec", code="7_4_hamming", decoder="SPA",
                    params=[0.3], codeword=1, min_wec=50, batch=512,
                    data_dir=str(tmp_path), log_freq=1e9)
    res = _run(cfg)[0.3]
    assert res["wec"] >= 50 and res["tot"] >= 512
    # Golden: wer ~= 0.199 at eps=0.3 (bec-7_4_hamming-SPA-10-1.json);
    # with ~50 errors sigma ~ 15%, accept 4 sigma.
    assert abs(res["wer"] - 0.199) / 0.199 < 0.6, res
    files = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert files, "saver wrote nothing"


def test_runner_random_codeword_ml():
    cfg = RunConfig(channel="biawgn", code="7_4_hamming", decoder="ML",
                    params=[4.0], codeword=-1, min_wec=30, batch=1024,
                    log_freq=1e9)
    res = _run(cfg)[4.0]
    # Golden biawgn-7_4_hamming-ML: wer 1.89e-2 at 4 dB (BASELINE.md);
    # independent float64 oracle puts truth nearer 2.09e-2 — accept wide.
    assert 0.008 < res["wer"] < 0.045, res


def test_runner_sharded_mesh_matches_stats():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("batch",))
    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="MSA",
                    params=[0.05], codeword=1, min_wec=40, batch=1024,
                    log_freq=1e9)
    res = _run(cfg, mesh=mesh)[0.05]
    assert res["wec"] >= 40
    single = _run(cfg)[0.05]
    # Same distribution on mesh and single device: WERs within combined MC
    # error (not bit-identical: different key layout).
    se = math.sqrt(res["wer"] / res["tot"] + single["wer"] / single["tot"])
    assert abs(res["wer"] - single["wer"]) < 6 * se + 1e-9


def test_runner_admm_collects_iteration_histogram(tmp_path):
    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="ADMM",
                    params=[0.02], codeword=1, min_wec=5, batch=256,
                    max_iter=50, data_dir=str(tmp_path), log_freq=1e9)
    res = _run(cfg)[0.02]
    assert "dec" in res, "ADMM iteration stats missing"
    hist = np.array(res["dec"]["iter"])
    assert hist.sum() == res["tot"]
    assert res["dec"]["average"] > 0


def test_runner_lp_host_path():
    cfg = RunConfig(channel="bsc", code="4_2_test", decoder="LP",
                    params=[0.05], codeword=0, min_wec=3, batch=64,
                    log_freq=1e9)
    res = _run(cfg)[0.05]
    assert res["wec"] >= 3


@pytest.mark.parametrize("golden,param,channel,decoder,cw", [
    ("bec-7_4_hamming-SPA-10-1.json", "0.1", "bec", "SPA", 1),
    ("bsc-7_4_hamming-SPA-10-1.json", "0.06", "bsc", "SPA", 1),
    # BSC MSA is the sharpest parity probe: equal-magnitude LLRs make the
    # min-sum tie/saturation structure fully visible (an innocent-looking
    # magnitude cap shifted this curve 10 sigma *better* than golden).
    ("bsc-7_4_hamming-MSA-10-1.json", "0.06", "bsc", "MSA", 1),
    ("biawgn-7_4_hamming-SPA-10-1.json", "5.0", "biawgn", "SPA", 1),
    # LP on all three channels (reference simulations.py:52-61; the BSC
    # point is the VERDICT anchor: golden WER 3.10e-2 at p=0.01). The
    # vertex fast path's tie handling was verified to match scipy
    # interior-point (the reference's method) word-for-word.
    ("bsc-7_4_hamming-LP-10-1.json", "0.01", "bsc", "LP", 1),
    ("bec-7_4_hamming-LP-10-1.json", "0.3", "bec", "LP", 1),
    ("biawgn-7_4_hamming-LP-10-1.json", "5.0", "biawgn", "LP", 1),
])
def test_golden_curve_agreement(golden, param, channel, decoder, cw):
    """Statistical regression against the reference's committed results
    (data/output/, SURVEY.md section 6): reproduce WER within combined
    Monte-Carlo confidence (goldens stop at ~300 errors -> sigma ~6%)."""
    path = os.path.join(REF_OUTPUT, golden)
    if not os.path.exists(path):
        pytest.skip("reference golden data not available")
    g = json.load(open(path))
    wer_ref = g["wer"][param]
    wec_ref = g["wec"][param]

    cfg = RunConfig(channel=channel, code="7_4_hamming", decoder=decoder,
                    params=[float(param)], codeword=cw, min_wec=150,
                    batch=4096, log_freq=1e9, max_words=3_000_000)
    res = _run(cfg)[float(param)]
    sigma = wer_ref * math.sqrt(1.0 / wec_ref + 1.0 / max(res["wec"], 1))
    assert abs(res["wer"] - wer_ref) < 5 * sigma, (res["wer"], wer_ref, sigma)


def test_runner_admma_train_mode(tmp_path):
    """ADMMA flows through the harness in train mode (online teacher) and
    keeps its iteration histogram (reference admm.py:80-106)."""
    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="ADMMA",
                    params=[0.02], codeword=1, min_wec=3, batch=128,
                    max_iter=30, train=True, layers=[16],
                    cache_dir=str(tmp_path / "cache"),
                    data_dir=str(tmp_path), log_freq=1e9)
    res = MonteCarloRunner(cfg).run()[0.02]
    assert res["wec"] >= 3
    assert "dec" in res and res["dec"]["average"] > 0


def test_runner_admma_train_sharded_matches_single(tmp_path):
    """ADMMA train mode under the mesh: replicated params, pmean'd grads,
    global-done loop. The trained model must actually move, devices must
    agree bit-exactly on it (replication invariant), and the error
    statistics must match the single-device run within MC error."""
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("batch",))
    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="ADMMA",
                    params=[0.02], codeword=1, min_wec=3, batch=128,
                    max_iter=30, train=True, layers=[16],
                    cache_dir=str(tmp_path / "cache"), log_freq=1e9)
    runner = MonteCarloRunner(cfg, mesh=mesh)
    init_w0 = np.asarray(runner.dec.dec.params[0]["w"]).copy()
    res_m = runner.run()[0.02]
    assert res_m["wec"] >= 3
    assert "dec" in res_m and res_m["dec"]["average"] > 0
    # Training happened and landed back on the decoder.
    final = runner.dec.dec.params[0]["w"]
    assert not np.allclose(np.asarray(final), init_w0)
    # The replicated output is consistent across devices (np.asarray on a
    # fully-replicated sharded array checks/uses single-device copies).
    assert np.asarray(final).shape == init_w0.shape
    res_s = MonteCarloRunner(cfg).run()[0.02]
    se = math.sqrt(res_m["wer"] / res_m["tot"] + res_s["wer"] / res_s["tot"])
    assert abs(res_m["wer"] - res_s["wer"]) < 6 * se + 1e-9
    # Trained-model checkpointing still works from the mesh-trained state.
    path = runner.dec.dec.save()
    assert os.path.exists(path)


def test_reg_ens_member_golden_agreement():
    """Member-by-member REG_ENS agreement: with the reference's committed
    ensemble fixtures vendored (data/codes), each member's regenerated
    BEC SPA curve must match that member's committed golden — including
    members 2 and 3, whose single duplicate-neighborhood variable pair
    (a 2-element stopping set) produces a WER floor of ~eps^2 that a
    correct erasure decoder cannot miss (reference goldens
    bec-1200_3_6_rand_ldpc_*-SPA-10-0.json)."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "data")
    checked = 0
    for i in range(1, 11):
        ours_p = os.path.join(art, f"bec-1200_3_6_rand_ldpc_{i}-SPA-0-100-10.json")
        ref_p = os.path.join(REF_OUTPUT, f"bec-1200_3_6_rand_ldpc_{i}-SPA-10-0.json")
        if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
            continue
        ours, ref = json.load(open(ours_p)), json.load(open(ref_p))
        for param in ("0.4", "0.35", "0.32", "0.3"):
            if param not in ours.get("wer", {}) or param not in ref["wer"]:
                continue
            w_o, t_o = ours["wer"][param], ours["tot"][param]
            w_r, t_r = ref["wer"][param], ref["tot"][param]
            se = math.sqrt(max(w_o, 1e-12) * (1 - min(w_o, 1)) / t_o
                           + max(w_r, 1e-12) * (1 - min(w_r, 1)) / t_r)
            assert abs(w_o - w_r) < 5 * se + 0.01, \
                (i, param, w_o, w_r, se)
            checked += 1
    if not checked:
        pytest.skip("regenerated member artifacts not present yet")
    # The bad members' floors specifically: eps^2 at eps=0.3.
    for i in (2, 3):
        p = os.path.join(art, f"bec-1200_3_6_rand_ldpc_{i}-SPA-0-100-10.json")
        if os.path.exists(p):
            d = json.load(open(p))
            if "0.3" in d.get("wer", {}):
                assert 0.05 < d["wer"]["0.3"] < 0.14, d["wer"]["0.3"]


def test_ireg_ens_member_golden_agreement():
    """Member-by-member IREG_ENS agreement: the reference's committed
    irregular fixtures (data/codes/1200_rho_x5_rand_ldpc_*, vendored) ARE
    the draws behind its committed goldens — the ensemble spans WER
    0.04..0.72 at eps=0.3 and each regenerated member curve tracks its
    OWN golden (reference bec-1200_rho_x5_rand_ldpc_*-SPA-0-100.json;
    worst observed deviation 3.6 sigma over 50 compared points at
    regeneration time)."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "data")
    checked = 0
    spread = {}
    for i in range(1, 11):
        ours_p = os.path.join(
            art, f"bec-1200_rho_x5_rand_ldpc_{i}-SPA-0-100-100.json")
        ref_p = os.path.join(
            REF_OUTPUT, f"bec-1200_rho_x5_rand_ldpc_{i}-SPA-0-100.json")
        if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
            continue
        ours, ref = json.load(open(ours_p)), json.load(open(ref_p))
        for param in ("0.4", "0.35", "0.32", "0.3"):
            if param not in ours.get("wer", {}) or param not in ref["wer"]:
                continue
            w_o, t_o = ours["wer"][param], ours["tot"][param]
            w_r, t_r = ref["wer"][param], ref["tot"][param]
            se = math.sqrt(max(w_o, 1e-12) * (1 - min(w_o, 1)) / t_o
                           + max(w_r, 1e-12) * (1 - min(w_r, 1)) / t_r)
            assert abs(w_o - w_r) < 5 * se + 0.01, (i, param, w_o, w_r, se)
            checked += 1
        if "0.3" in ours.get("wer", {}):
            spread[i] = ours["wer"]["0.3"]
    if not checked:
        pytest.skip("regenerated irregular member artifacts not present")
    # Member identity is resolved, not ensemble-averaged away: the
    # irregular draws differ hugely (member 1 decodes ~17x better than
    # member 5 at eps=0.3) and our members reproduce that spread.
    if 1 in spread and 5 in spread:
        assert spread[1] < 0.1 < 0.5 < spread[5], spread


# Cross-channel member sets (regen_ens_cross.py): (channel, decoder,
# our filename suffix, reference filename suffix) per ensemble prefix.
_MEMBER_SETS = [
    ("1200_3_6_rand_ldpc", "bsc", "MSA", "MSA-1-100-10", "MSA-10"),
    ("1200_3_6_rand_ldpc", "bsc", "SPA", "SPA-0-100-10", "SPA-10-0"),
    ("1200_3_6_rand_ldpc", "biawgn", "MSA", "MSA-1-100-10", "MSA-10-1"),
    ("1200_3_6_rand_ldpc", "biawgn", "SPA", "SPA-0-100-10", "SPA-10-0"),
    ("1200_rho_x5_rand_ldpc", "bsc", "MSA", "MSA-1-100-100", "MSA-1-100"),
    ("1200_rho_x5_rand_ldpc", "bsc", "SPA", "SPA-0-100-100", "SPA-0-100"),
    ("1200_rho_x5_rand_ldpc", "biawgn", "MSA", "MSA-1-100-100", "MSA-1-100"),
    ("1200_rho_x5_rand_ldpc", "biawgn", "SPA", "SPA-0-100-100", "SPA-0-100"),
]


def _ac_var(w, t):
    """Agresti-Coull adjusted binomial variance of an observed rate."""
    p = (w * t + 2.0) / (t + 4.0)
    return p * (1.0 - p) / (t + 4.0)


@pytest.mark.parametrize("prefix,channel,dec,ours_sfx,ref_sfx", _MEMBER_SETS)
def test_cross_channel_member_golden_agreement(prefix, channel, dec,
                                               ours_sfx, ref_sfx):
    """Member-by-member golden agreement beyond the BEC sets: every
    regenerated BSC/biAWGN member curve (REG max_iter=10, IREG
    max_iter=100) tracks its own committed reference golden — same
    vendored H draws, so deviations are pure Monte-Carlo noise.
    Compared on the shared sweep params where the golden's WER is
    resolvable (>=1e-3 given its ~300-error stop)."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "data")
    checked = 0
    for i in range(1, 11):
        ours_p = os.path.join(art, f"{channel}-{prefix}_{i}-{ours_sfx}.json")
        ref_p = os.path.join(REF_OUTPUT, f"{channel}-{prefix}_{i}-{ref_sfx}.json")
        if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
            continue
        ours, ref = json.load(open(ours_p)), json.load(open(ref_p))
        for param in ref["wer"]:
            if param not in ours.get("wer", {}) or ref["wer"][param] < 1e-3:
                continue
            w_o, t_o = ours["wer"][param], ours["tot"][param]
            w_r, t_r = ref["wer"][param], ref["tot"][param]
            # Agresti-Coull adjusted variance: the reference stops at
            # ~100 errors, so at WER ~= 1 its raw binomial variance
            # estimate degenerates to 0 (w*(1-w) with w == 1) and any
            # difference looks like infinite sigma. Adding 2 pseudo
            # successes/failures keeps the estimate honest there.
            se = math.sqrt(_ac_var(w_o, t_o) + _ac_var(w_r, t_r))
            assert abs(w_o - w_r) < 5 * se + 0.01, \
                (i, param, w_o, w_r, se)
            checked += 1
    if not checked:
        pytest.skip("cross-channel member artifacts not present yet")
    assert checked >= 20


def test_margulis_admm_golden_agreement():
    """Margulis(2640,1320) ADMM curves vs the reference's committed
    goldens (oldest vintage 'ADMM-1-3.0-1e-05' = decoder-cw-mu-eps; the
    run parameters are unrecorded there — max_iter was determined
    empirically to be run-to-convergence: our max_iter=0 reproduces the
    bsc anchors 0.270/0.0068 vs golden 0.275/0.0084 while caps
    10/30/100 are far off). Compared where both sides resolve the WER."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "data")
    checked = 0
    for ch in ("bec", "bsc", "biawgn"):
        ours_p = os.path.join(art, f"{ch}-margulis-ADMM-1-100-3.0-1e-05-0-False.json")
        ref_p = os.path.join(REF_OUTPUT, f"{ch}-margulis-ADMM-1-3.0-1e-05.json")
        if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
            continue
        ours, ref = json.load(open(ours_p)), json.load(open(ref_p))
        for param in ref["wer"]:
            if param not in ours.get("wer", {}):
                continue
            w_o, t_o = ours["wer"][param], ours["tot"][param]
            w_r, t_r = ref["wer"][param], ref["tot"][param]
            if w_r < 5e-4 and w_o < 5e-4:
                continue  # both beyond the budgeted tail resolution
            se = math.sqrt(_ac_var(w_o, t_o) + _ac_var(w_r, t_r))
            assert abs(w_o - w_r) < 5 * se + 0.01, (ch, param, w_o, w_r, se)
            checked += 1
    if not checked:
        pytest.skip("margulis ADMM artifacts not present yet")
    assert checked >= 8


def test_adaptive_pipeline_stops_at_target():
    """VERDICT r2 item 8: at easy sweep points the adaptive pipeline
    must not keep a depth-4 surplus in flight past min_wec — and the
    tallies must equal the fully synchronous (pipeline=1) run exactly,
    because chunk i's contents depend only on (key, i, param)."""
    base = dict(channel="bec", code="7_4_hamming", decoder="SPA",
                params=[0.4], codeword=1, min_wec=20, batch=512,
                log_freq=1e9)
    # eps=0.4: wer ~0.36 -> ~185 errors/chunk, one chunk crosses.
    r_ad = MonteCarloRunner(RunConfig(pipeline=4, **base))
    res_ad = r_ad.run()[0.4]
    assert r_ad.last_dispatch_stats["dispatched"] == 1, \
        r_ad.last_dispatch_stats
    r_sync = MonteCarloRunner(RunConfig(pipeline=1, **base))
    res_sync = r_sync.run()[0.4]
    assert (res_ad["tot"], res_ad["wec"], res_ad["bec"]) == \
           (res_sync["tot"], res_sync["wec"], res_sync["bec"])
    # Legacy fixed-depth policy keeps the pipeline full -> surplus.
    r_fix = MonteCarloRunner(RunConfig(pipeline=4,
                                       adaptive_pipeline=False, **base))
    res_fix = r_fix.run()[0.4]
    assert r_fix.last_dispatch_stats["dispatched"] == 4
    assert res_fix["tot"] == 4 * 512


def test_adaptive_pipeline_fills_at_deep_tails():
    """Hard points must still reach the full pipeline depth (the ramp
    and the expected-remaining cap only bite near the target)."""
    cfg = RunConfig(channel="bec", code="7_4_hamming", decoder="SPA",
                    params=[0.05], codeword=1, min_wec=10, batch=64,
                    pipeline=4, log_freq=1e9)
    r = MonteCarloRunner(cfg)
    res = r.run()[0.05]
    st = r.last_dispatch_stats
    assert st["dispatched"] == st["consumed"]
    # wer ~5e-3 at eps=0.05 -> ~0.3 errors/chunk -> dozens of chunks.
    assert st["dispatched"] > 8
    assert res["wec"] >= 10


def test_transient_backend_error_classifier():
    """Kernel-probe fallback vs re-raise is decided by exception TYPE +
    status PREFIX, not a substring anywhere in the text (ADVICE r4)."""
    from jax.errors import JaxRuntimeError

    from ldpc_decoders_tpu.utils.backend import is_transient_backend_error

    assert is_transient_backend_error(
        JaxRuntimeError("UNAVAILABLE: TPU worker mid-recovery"))
    assert is_transient_backend_error(
        JaxRuntimeError("  DEADLINE_EXCEEDED: compile helper timeout"))
    # Ineligibility errors that merely MENTION the token must fall back.
    assert not is_transient_backend_error(
        JaxRuntimeError("INVALID_ARGUMENT: op would be UNAVAILABLE"))
    # Non-runtime exceptions (Mosaic rejections surface as ValueError &c.)
    # are never transient.
    assert not is_transient_backend_error(ValueError("UNAVAILABLE: no"))
