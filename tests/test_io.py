# Output layer: save writers round-trip, plot functions render under Agg,
# and the display-result gate actually triggers plotting through rmtExe
# (reference: library/saveResult.py:18-47, solResultAnalysis.py:307-459,
# display gate pbHomoReactor.py:3012-3013).

import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.io import save as io_save


def test_save_text_and_csv_roundtrip(tmp_path):
    data = [[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]]
    p_txt = io_save.save_list_to_text(data, str(tmp_path / "out.txt"))
    lines = open(p_txt).read().strip().splitlines()
    assert len(lines) == 2 and "3.0" in lines[1]

    p_csv = io_save.save_list_to_csv(data, ["a", "b", "c"],
                                     str(tmp_path / "out.csv"))
    rows = open(p_csv).read().strip().splitlines()
    assert rows[0] == "a,b,c"
    back = np.asarray([r.split(",") for r in rows[1:]], dtype=float)
    np.testing.assert_allclose(back, np.asarray(data))


def test_save_result_json_roundtrip(tmp_path):
    import json

    from rmt_tpu import rmtExe

    res = rmtExe(make_model_input(model="N1"))
    path = io_save.save_result_json(res, str(tmp_path / "res.json"))
    loaded = json.load(open(path))
    a = np.asarray(loaded["resModel"][0]["dataYs"])
    b = np.asarray(res["resModel"][0]["dataYs"])
    np.testing.assert_allclose(a, b)


def test_plot_functions_render(monkeypatch, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(1))

    from rmt_tpu.io import plot as io_plot

    xs = np.linspace(0, 1, 11)
    pack = {
        "modelId": "N2",
        "processType": "non-iso-thermal",
        "successStatus": True,
        "dataTime": 0.1,
        "dataXs": xs,
        "dataYs": np.vstack([xs, 1 - xs, 500 + xs]),
        "labelList": ["A", "B", "T"],
        "indexList": [2, 3, 2],
    }
    io_plot.plot_results_steady_state([pack])
    # dynamic plotting draws 2 random slices x (concentration +
    # temperature) figures = 4 shows (reference plotResultsDynamic
    # semantics, solResultAnalysis.py:373-459)
    io_plot.plot_results_dynamic(
        {"computation-time": 1.0, "dataPack": [pack, pack]}, t_no=2
    )
    io_plot.plot_xy_series(
        [{"x": xs, "y": xs**2, "leg": "sq"}], "x", "y", title="t"
    )
    assert len(shown) == 6
    plt.close("all")


def test_plotclass_script_surface(monkeypatch):
    """The reference's notebooks drive plotClass.plots2D / plots2DSub /
    makeLabels directly (PyREMOT/library/plot.py:36-218); the same
    script-level surface must exist here."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(1))

    from rmt_tpu.io.plot import plotClass

    xs = np.linspace(0, 1, 11)
    ys_list = [xs, xs**2, 1 - xs]
    labels = plotClass.makeLabels(["A", "B"], ["T"])
    assert labels == ["A", "B", "T"]

    xy = plotClass.plots2DSetXYList(xs, ys_list)
    assert len(xy) == 3 and xy[1][1] is ys_list[1]
    items = plotClass.plots2DSetDataList(xy, labels)
    assert items[2] == {"x": xs, "y": ys_list[2], "leg": "T"}

    plotClass.plots2D(items, "x", "y", title="t")       # list form
    plotClass.plots2D(items[0], "x", "y")               # single-item form
    plotClass.plots2DSub([items, items[:1]], "x", "y",
                         dataListPoint=[items[:1]])
    plotClass.plot2D(xs, ys_list[0])
    assert len(shown) == 4
    plt.close("all")


def test_display_result_gate_invokes_plot(monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(1))

    from rmt_tpu import rmtExe

    mi = make_model_input(model="N1", display="True")
    rmtExe(mi)
    assert shown, "display-result == 'True' must trigger the plot layer"
    plt.close("all")
