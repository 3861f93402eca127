# Result plotting (host-side matplotlib), gated by
# solver-config display-result == "True" exactly like the reference
# (reference: PyREMOT/solvers/solResultAnalysis.py:307-459,
#  PyREMOT/library/plot.py:36-201).

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    import matplotlib.pyplot as plt

    return plt


def plot_results_steady_state(data_pack) -> None:
    plt = _plt()
    pack = data_pack[0]
    xs = np.asarray(pack["dataXs"])
    ys = np.asarray(pack["dataYs"])
    labels = pack["labelList"]
    n_comp = pack["indexList"][0]

    fig, axes = plt.subplots(1, 2 if ys.shape[0] > n_comp else 1, figsize=(10, 4))
    axes = np.atleast_1d(axes)
    for i in range(n_comp):
        axes[0].plot(xs, ys[i], label=labels[i])
    axes[0].set_xlabel("dimensionless reactor length")
    axes[0].set_ylabel("mole fraction")
    axes[0].legend(fontsize=7)
    if ys.shape[0] > n_comp and len(axes) > 1:
        for j in range(n_comp, ys.shape[0]):
            axes[1].plot(xs, ys[j], label=labels[min(j, len(labels) - 1)])
        axes[1].set_xlabel("dimensionless reactor length")
        axes[1].legend(fontsize=7)
    fig.tight_layout()
    plt.show()


def plot_results_dynamic(res_pack, t_no: int) -> None:
    plt = _plt()
    data_pack = res_pack["dataPack"]
    fig, ax = plt.subplots(figsize=(8, 4))
    for pack in data_pack:
        xs = np.asarray(pack["dataXs"])
        ys = np.asarray(pack["dataYs"])
        n_comp = pack["indexList"][0]
        for i in range(n_comp):
            ax.plot(xs, ys[i], alpha=0.6)
    ax.set_xlabel("dimensionless reactor length")
    ax.set_ylabel("mole fraction")
    fig.tight_layout()
    plt.show()


def plot_xy_series(data_list, x_label, y_label, title=""):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    for item in data_list:
        ax.plot(np.asarray(item["x"]), np.asarray(item["y"]), label=item["leg"])
    ax.set_xlabel(x_label)
    ax.set_ylabel(y_label)
    if title:
        ax.set_title(title)
    ax.legend(fontsize=7)
    fig.tight_layout()
    plt.show()
