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


def plot_avg_deg(ll_c, avg_deg, agg=False, out=None):
    """Average generator degree as a function of the soliton c parameter
    (reference luby.py:109-114, luby_graph.py:28-30)."""
    plt = _plt(agg)
    plt.figure()
    plt.plot(ll_c, avg_deg)
    if out:
        plt.savefig(out, dpi=120)
    else:
        plt.show()


def soliton_case(k, c, delta, cut=103, agg=False, out=None):
    """Render the rho/tau/mu decomposition bars for one (k, c, delta)
    (the reference's get_soliton(plot=True) path, luby.py:117-126)."""
    from ldpc_decoders_tpu.fountain.lt import robust_soliton_parts

    rho, tau, mu = robust_soliton_parts(k, c, delta)
    plot_soliton(rho, tau, mu, c, cut, agg=agg, out=out)


def avg_deg_case(k, delta, agg=False, out=None):
    from ldpc_decoders_tpu.fountain.lt import robust_soliton

    avg = lambda dst: dst @ np.arange(1, len(dst) + 1)  # noqa: E731
    ll = np.linspace(.01, .1, 50)
    plot_avg_deg(ll, [avg(robust_soliton(k, c, delta)) for c in ll],
                 agg=agg, out=out)


def plot_files(data_dir, cs, agg=False, plots_dir=None):
    outs = []
    for file_name in get_data_file_list(data_dir):
        data = load_json(os.path.join(data_dir, file_name))
        if not data or data.get("type") != "luby":
            continue
        if float(data["c"]) in cs:
            # Reference plot naming: luby_<c>.png
            # (/root/reference/data/plots/luby_0.01.png et al.)
            out = (os.path.join(plots_dir, f"luby_{data['c']}.png")
                   if plots_dir else None)
            plot_hist(data["arr"], int(data["k"]), int(data["n"]),
                      float(data["c"]), agg=agg, out=out)
            outs.append(out)
    return outs


def main(argv=None):
    p = argparse.ArgumentParser(description="LT plots")
    sub = p.add_subparsers(dest="mode", required=True)

    ph = sub.add_parser("hist", help="symbol-count histograms")
    ph.add_argument("c", nargs="+", type=float)
    ph.add_argument("--data_dir", default="data")
    ph.add_argument("--plots_dir", default=None)
    ph.add_argument("--agg", action="store_true")

    ps = sub.add_parser("soliton", help="rho/tau/mu decomposition bars")
    ps.add_argument("k", type=int)
    ps.add_argument("c", type=float)
    ps.add_argument("delta", type=float)
    ps.add_argument("--cut", type=int, default=103)
    ps.add_argument("--agg", action="store_true")
    ps.add_argument("--out", default=None)

    pa = sub.add_parser("avg_deg", help="average degree vs c")
    pa.add_argument("k", type=int)
    pa.add_argument("delta", type=float)
    pa.add_argument("--agg", action="store_true")
    pa.add_argument("--out", default=None)

    args = p.parse_args(argv)
    if args.mode == "hist":
        plot_files(args.data_dir, args.c, args.agg, args.plots_dir)
    elif args.mode == "soliton":
        soliton_case(args.k, args.c, args.delta, args.cut,
                     agg=args.agg, out=args.out)
    else:
        avg_deg_case(args.k, args.delta, agg=args.agg, out=args.out)


if __name__ == "__main__":
    main()
