"""LT-code plots (reference src/luby_graph.py): symbol-count histograms
from luby result JSONs, soliton-distribution bars, average-degree curve."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ldpc_decoders_tpu.utils.file import get_data_file_list, load_json


def _plt(agg: bool):
    import matplotlib
    if agg:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_hist(arr, k, n, c, agg=False, out=None):
    plt = _plt(agg)
    plt.figure()
    plt.hist(arr, bins=50)
    plt.autoscale(enable=True, axis="x", tight=True)
    plt.title("c=%g, mean=%g, std_dev=%g, var=%g"
              % (c, np.mean(arr), np.std(arr), np.var(arr)))
    plt.xlim(k, n)
    if out:
        plt.savefig(out, dpi=120)
        print("saved:", out)
    else:
        plt.show()


def plot_soliton(rho, tau, mu, c, cut, agg=False, out=None):
    plt = _plt(agg)
    plt.figure()
    width = 0.32
    avg = lambda dst: dst @ np.arange(1, len(dst) + 1)  # noqa: E731
    for i, (dst, name, clr) in enumerate(
            [(rho, "rho", "r"), (tau, "tau", "b"), (mu, "mu", "y")]):
        plt.bar(np.arange(1, cut + 1) + width * i, dst[:cut], width,
                linewidth=0, color=clr,
                label="%s, avg_deg=%g" % (name, avg(dst)))
    plt.autoscale(enable=True, axis="x", tight=True)
    plt.title("c=%g" % c)
    plt.legend()
    if out:
        plt.savefig(out, dpi=120)
    else:
        plt.show()


def plot_files(data_dir, cs, agg=False, plots_dir=None):
    outs = []
    for file_name in get_data_file_list(data_dir):
        data = load_json(os.path.join(data_dir, file_name))
        if not data or data.get("type") != "luby":
            continue
        if float(data["c"]) in cs:
            out = (os.path.join(plots_dir, file_name + ".png")
                   if plots_dir else None)
            plot_hist(data["arr"], int(data["k"]), int(data["n"]),
                      float(data["c"]), agg=agg, out=out)
            outs.append(out)
    return outs


def main(argv=None):
    p = argparse.ArgumentParser(description="LT result histograms")
    p.add_argument("c", nargs="+", type=float)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--plots_dir", default=None)
    p.add_argument("--agg", action="store_true")
    args = p.parse_args(argv)
    plot_files(args.data_dir, args.c, args.agg, args.plots_dir)


if __name__ == "__main__":
    main()
