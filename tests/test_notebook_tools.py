"""Notebook utility tools (notebook.py) + the prototyping notebook artifact
(reference README.md:148 TODO)."""
import json
import os

import numpy as np
import pytest

from deepcv_tpu.notebook import model_summary, plot_history, show_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOK = os.path.join(REPO, "examples", "prototyping.ipynb")


def test_show_batch_grid_shapes():
    imgs = (np.random.default_rng(0).random((10, 8, 8, 3)) * 255).astype(np.uint8)
    fig = show_batch(imgs, labels=list(range(10)),
                     classes=[f"c{i}" for i in range(10)], n_cols=4)
    # 10 images at 4 columns -> 3 rows of 4 axes
    assert len(fig.axes) == 12
    titles = [a.get_title() for a in fig.axes]
    assert "c0" in titles and "c9" in titles
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_show_batch_normalized_and_gray():
    fig = show_batch(np.random.default_rng(1).standard_normal((4, 8, 8, 1)),
                     mean=[0.5], std=[0.25], n_cols=8)
    assert len(fig.axes) == 4
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_history_panels():
    history = {"train": [{"step": i, "loss": 1.0 / (i + 1)} for i in range(8)],
               "valid": [{"epoch": e, "valid_accuracy": 0.2 + 0.1 * e,
                          "valid_loss": 1.0 - 0.1 * e} for e in range(3)]}
    fig = plot_history(history)
    assert len(fig.axes) == 2
    fig2 = plot_history({"train": history["train"], "valid": []})
    assert len(fig2.axes) == 1
    fig3 = plot_history(history, metrics=["accuracy"])
    assert len(fig3.axes[1].lines) == 1
    import matplotlib.pyplot as plt
    plt.close("all")


def test_model_summary_returns_describe():
    class Toy:
        def describe(self):
            return "toy: 3 params"
    assert model_summary(Toy()) == "toy: 3 params"


def test_prototyping_notebook_valid_and_executed():
    """The shipped notebook must be valid nbformat, its code cells must
    compile, and it ships EXECUTED (every code cell has outputs and no
    error outputs)."""
    nb = json.load(open(NOTEBOOK))
    assert nb["nbformat"] >= 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 5
    for c in code_cells:
        src = "".join(l for l in c["source"]
                      if not l.lstrip().startswith("%"))   # strip magics
        compile(src, "<cell>", "exec")   # syntax-checks against the repo
        assert c.get("execution_count"), "cell not executed"
        for out in c.get("outputs", []):
            assert out.get("output_type") != "error", out
