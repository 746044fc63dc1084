"""Batch plot cases (reference plot_results.py): canned graph.py argument
sets per experiment family, named <CASE>__<plot>. Run with
``python -m ldpc_decoders_tpu.viz.cases HMG --data_dir ... --plots_dir ...``.
"""

from __future__ import annotations

import argparse

from ldpc_decoders_tpu.utils.registry import Registry
from ldpc_decoders_tpu.viz import graph as vg

all_cases = Registry()
reg_case = all_cases.reg


def _run(extra, common, name):
    argv = extra + common + ["--file_name", name, "--agg", "--save"]
    print(">>", " ".join(argv), flush=True)
    vg.run(vg.setup_parser().parse_args(argv))


def _conf(chl, cde):
    return ["--and", f"{chl}-{cde}", "--error", "ber",
            "--legend_format", "decoder", "--title", f"{chl.upper()}, {cde}"]


@reg_case
def HMG(common):
    """Per-channel decoder comparison on Hamming(7,4)
    (reference plot_results.py HMG case)."""
    for chl in ("bec", "bsc", "biawgn"):
        _run(_conf(chl, "7_4_hamming")
             + ["--or_", "ML", "SPA", "MSA", "LP", "ADMM"],
             common, f"HMG__{chl.upper()}")


@reg_case
def MAR(common):
    """Margulis ADMM curves (reference plot_results.py MAR case)."""
    for chl in ("bec", "bsc", "biawgn"):
        _run(["--and", f"{chl}-margulis", "--or_", "ADMM",
              "--error", "wer", "--title", f"{chl.upper()}, margulis"],
             common, f"MAR__{chl.upper()}")


@reg_case
def REG_ENS(common):
    """Ensemble curves + average for the random (1200,3,6) family
    (reference plot_results.py REG_ENS case)."""
    ens = "1200_3_6_rand_ldpc"
    for chl, dec in (("bec", "SPA"), ("bsc", "MSA"), ("biawgn", "MSA")):
        _run(["--and", f"{chl}-{ens}", dec, "--type", "ensemble",
              "--title", f"{chl.upper()}, {dec} decoder, {ens} ensemble"],
             common, f"REG_ENS__{chl}_{dec}_ensemble")


@reg_case
def IREG_ENS(common):
    ens = "1200_rho_x5_rand_ldpc"
    for chl, dec in (("bec", "SPA"), ("biawgn", "MSA")):
        _run(["--and", f"{chl}-{ens}", dec, "--type", "ensemble",
              "--title", f"{chl.upper()}, {dec} decoder, {ens} ensemble"],
             common, f"IREG_ENS__{chl}_{dec}_ensemble")


def main(argv=None):
    p = argparse.ArgumentParser(description="batch result plotting")
    p.add_argument("case", nargs="+", choices=all_cases.keys())
    p.add_argument("--data_dir", default="data")
    p.add_argument("--plots_dir", default="plots")
    args = p.parse_args(argv)
    common = ["--data_dir", args.data_dir, "--plots_dir", args.plots_dir]
    for case in args.case:
        all_cases.get(case)(common)


if __name__ == "__main__":
    main()
