"""Execute the analysis notebooks' code cells end-to-end (the reference
ships analysis_tools/*.ipynb; ours must keep running against the tiny
flow artifacts in outputs/flow)."""

import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run_nb(path, repl=()):
    import matplotlib

    matplotlib.use("Agg")
    nb = json.load(open(path))
    g = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = cell["source"]
        if isinstance(src, list):
            src = "".join(src)
        for a, b in repl:
            src = src.replace(a, b)
        exec(src, g)  # noqa: S102 - intentional notebook execution


@pytest.mark.slow
def test_distribution_notebook_executes():
    _run_nb(os.path.join(ROOT, "notebooks", "distribution.ipynb"))


@pytest.mark.slow
def test_error_plot_notebook_executes():
    flow = os.path.join(ROOT, "outputs", "flow")
    if not os.path.exists(os.path.join(flow, "sensitivity_weight.yaml")):
        pytest.skip("run ./run_flow.sh first (outputs/flow missing)")
    _run_nb(os.path.join(ROOT, "notebooks", "error_plot.ipynb"),
            repl=(("../outputs/flow", flow),))
