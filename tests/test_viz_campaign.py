"""Viz + campaign tests: plot types render to files from both freshly
generated results and the reference's committed golden JSONs; the case
registry produces the reference's experiment grid."""

import os

import numpy as np
import pytest

from ldpc_decoders_tpu import campaign
from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig
from ldpc_decoders_tpu.viz import graph as vg
from ldpc_decoders_tpu.viz import luby_graph

REF_OUTPUT = "/root/reference/data/output"


def _args(extra, data_dir, plots_dir):
    return vg.setup_parser().parse_args(
        extra + ["--agg", "--save", "--data_dir", data_dir,
                 "--plots_dir", plots_dir])


@pytest.fixture(scope="module")
def results_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("results"))
    for dec, mi in [("SPA", 10), ("MSA", 10)]:
        cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder=dec,
                        params=[0.05, 0.1], codeword=1, min_wec=20,
                        batch=512, max_iter=mi, data_dir=d, log_freq=1e9)
        MonteCarloRunner(cfg).run()
    return d


def test_plot_all_and_filters(results_dir, tmp_path):
    plots = str(tmp_path)
    args = _args(["--and", "bsc", "--file_name", "g1"], results_dir, plots)
    dl = vg.run(args)
    assert len(dl) == 2
    assert os.path.exists(os.path.join(plots, "g1.png"))
    # --or_ filter narrows to one decoder.
    args = _args(["--or_", "MSA", "--file_name", "g2"], results_dir, plots)
    assert len(vg.run(args)) == 1


def test_plot_golden_reference_data(tmp_path):
    if not os.path.isdir(REF_OUTPUT):
        pytest.skip("no reference data")
    plots = str(tmp_path)
    args = _args(["--and", "bec-7_4_hamming", "--error", "wer",
                  "--file_name", "golden"], REF_OUTPUT, plots)
    dl = vg.run(args)
    assert dl and os.path.exists(os.path.join(plots, "golden.png"))


def test_ensemble_plot_golden(tmp_path):
    if not os.path.isdir(REF_OUTPUT):
        pytest.skip("no reference data")
    args = _args(["--and", "bec-1200_3_6_rand_ldpc", "--type", "ensemble",
                  "--file_name", "ens"], REF_OUTPUT, str(tmp_path))
    dl = vg.run(args)
    assert len(dl) >= 10   # 10 ensemble members + an aggregate file
    assert os.path.exists(os.path.join(str(tmp_path), "ens.png"))


def test_hist_iter_plot(tmp_path):
    d = str(tmp_path / "res")
    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="ADMM",
                    params=[0.02], codeword=1, min_wec=3, batch=128,
                    max_iter=50, data_dir=d, log_freq=1e9)
    MonteCarloRunner(cfg).run()
    args = _args(["--type", "hist_iter", "--param", "0.02",
                  "--file_name", "hist"], d, str(tmp_path))
    vg.run(args)
    assert os.path.exists(os.path.join(str(tmp_path), "hist.png"))


def test_luby_hist_plot(tmp_path):
    import json
    d = str(tmp_path)
    data = {"type": "luby", "k": "100", "n": "220", "c": "0.1",
            "delta": "0.5",
            "arr": list(np.random.default_rng(0).integers(100, 220, 500))}
    with open(os.path.join(d, "luby-100-220-0.1-0.5.json"), "w") as f:
        json.dump({k: (v if k != "arr" else [int(x) for x in v])
                   for k, v in data.items()}, f)
    outs = luby_graph.plot_files(d, [0.1], agg=True, plots_dir=d)
    assert outs and os.path.exists(outs[0])


def test_campaign_registry_grid():
    cases = list(campaign.all_cases.get("HMG")())
    # 4 BEC + 5 BSC + 5 biAWGN decoder runs (reference simulations.py:49-61).
    assert len(cases) == 14
    assert {c.channel for c in cases} == {"bec", "bsc", "biawgn"}
    lines = [campaign.to_argv(c) for c in cases]
    assert all("7_4_hamming" in ln and "--min-wec=300" in ln for ln in lines)

    reg = list(campaign.all_cases.get("REG_BAD")())
    # def_cases (5) * (1 default + 7 max-iter variants).
    assert len(reg) == 40
    assert {c.max_iter for c in reg} == {0, 1, 2, 3, 6, 10, 40, 100}


def test_campaign_runs_tiny(tmp_path):
    campaign.all_cases.put("TINY", lambda: iter([
        RunConfig("bec", "7_4_hamming", "SPA", [0.3], codeword=1,
                  min_wec=5, batch=256, log_freq=1e9)]))
    res = campaign.run_campaign(["TINY"], data_dir=str(tmp_path))
    (key, r), = res.items()
    assert r[0.3]["wec"] >= 5
    assert os.listdir(str(tmp_path))


def test_plot_cases_registry(tmp_path):
    """Batch plot cases render against the golden reference data."""
    if not os.path.isdir(REF_OUTPUT):
        pytest.skip("no reference data")
    from ldpc_decoders_tpu.viz import cases
    cases.main(["HMG", "--data_dir", REF_OUTPUT,
                "--plots_dir", str(tmp_path)])
    made = os.listdir(str(tmp_path))
    assert {"HMG__BEC.png", "HMG__BSC.png", "HMG__BIAWGN.png"} <= set(made)


@pytest.fixture(scope="module")
def ensemble_results_dir(tmp_path_factory):
    """Synthesized Saver-schema files covering the full ensemble plot grid
    (wiring test: statistics don't matter, file-name token matching does)."""
    import json
    d = str(tmp_path_factory.mktemp("ens_results"))
    rng = np.random.default_rng(0)
    codes = (["1200_3_6_ldpc"]
             + [f"1200_3_6_rand_ldpc_{i}" for i in (1, 2)]
             + [f"1200_rho_x5_rand_ldpc_{i}" for i in (1, 2)])
    for chl in ("bec", "bsc", "biawgn"):
        for dec in ("SPA", "MSA"):
            for code in codes:
                # real artifact naming: REG members cap 10, IREG members
                # cap 100, flagship code at several caps.
                if code == "1200_3_6_ldpc":
                    mis = (10, 1, 40)
                elif "rho_x5" in code:
                    mis = (100,)
                else:
                    mis = (10,)
                for mi in mis:
                    name = f"{chl}-{code}-{dec}-1-100-{mi}.json"
                    vals = {str(p): float(rng.uniform(1e-4, 1e-1))
                            for p in (0.05, 0.1)}
                    data = {"channel": chl, "code": code, "decoder": dec,
                            "codeword": 1, "min_wec": 100, "max_iter": mi,
                            "tot": {k: 1000 for k in vals},
                            "wec": {k: 10 for k in vals},
                            "wer": vals, "bec": {k: 50 for k in vals},
                            "ber": vals}
                    with open(os.path.join(d, name), "w") as f:
                        json.dump(data, f)
    return d


def test_plot_cases_full_ensemble_grid(ensemble_results_dir, tmp_path):
    """Every reference plot_results case renders: REG_ENS ensemble/compare/
    max_iter + comp_dec, IREG_ENS ensemble + comp_dec, COMP_REG_IREG
    (reference plot_results.py:50-122)."""
    from ldpc_decoders_tpu.viz import cases
    plots = str(tmp_path)
    cases.main(["REG_ENS", "IREG_ENS", "COMP_REG_IREG",
                "--data_dir", ensemble_results_dir, "--plots_dir", plots])
    made = set(os.listdir(plots))
    expected = set()
    for chl, dec in (("bsc", "MSA"), ("biawgn", "MSA"), ("bec", "SPA"),
                     ("bsc", "SPA"), ("biawgn", "SPA")):
        for kind in ("ensemble", "compare", "max_iter"):
            expected.add(f"REG_ENS__{chl}_{dec}_{kind}.png")
        expected.add(f"IREG_ENS__{chl}_{dec}_ensemble.png")
        expected.add(f"COMP_REG_IREG__{chl}_{dec}_compare.png")
    for chl in ("BSC", "BIAWGN"):
        expected.add(f"REG_ENS__{chl}_comp_dec.png")
        expected.add(f"IREG_ENS__{chl}_comp_dec.png")
        expected.add(f"COMP_REG_IREG__{chl.lower()}_comp_dec.png")
    missing = expected - made
    assert not missing, f"cases did not render: {sorted(missing)}"


def test_regex_average_golden_data(tmp_path):
    """regex_average group math against the reference's committed ensemble
    goldens (reference graph.py:82-96)."""
    if not os.path.isdir(REF_OUTPUT):
        pytest.skip("no reference data")
    args = _args(["--and", "bec", "--or_", "1200_3_6_rand_ldpc_",
                  "--type", "regex_average",
                  "--group_regex", "1200_3_6_rand_ldpc_[0-9]+-SPA", "avg",
                  "--file_name", "regavg"], REF_OUTPUT, str(tmp_path))
    dl = vg.run(args)
    assert len(dl) >= 10
    assert os.path.exists(os.path.join(str(tmp_path), "regavg.png"))


def test_profiler_accumulates(caplog):
    import logging
    import time as _t
    from ldpc_decoders_tpu.utils.profiler import LoopProfiler
    log = logging.getLogger("proftest")
    with caplog.at_level(logging.INFO, logger="proftest"):
        prof = LoopProfiler(log, dump_freq=2)
        for _ in range(2):
            with prof.start():
                with prof.tag("work"):
                    _t.sleep(0.001)
    assert any("Summary at[2]" in r.message for r in caplog.records)


def test_ireg_ensemble_case_matches_members(tmp_path):
    """The IREG_ENS ensemble case must actually select the 10 cap-100
    member files: the reference's current plot_results.py filters on
    "10.json", which cannot substring-match its own "-0-100.json" IREG
    files (its committed IREG plot PNGs, showing all 10 curves, predate
    that filter) — our case grid filters on the cap the data has."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "data")
    if not os.path.exists(os.path.join(
            art, "bsc-1200_rho_x5_rand_ldpc_1-SPA-0-100-100.json")):
        pytest.skip("IREG member artifacts not present")
    args = _args(["--and", "bsc-1200_rho_x5_rand_ldpc", "SPA", "100.json",
                  "--type", "ensemble", "--file_name", "ens_irg"],
                 art, str(tmp_path))
    dl = vg.run(args)
    assert len(dl) == 10, [r.get_label() for r in dl]
    assert os.path.exists(os.path.join(str(tmp_path), "ens_irg.png"))
