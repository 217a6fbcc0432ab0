"""Plot-layer unit tests (reference ``thumbPlot`` / per-eclipse plots [R],
SURVEY.md §2 "Results & plots").

The substantive guarantee tested here: NO sampled parameter is silently
dropped from the report.  The global corner caps at 12 dimensions for
readability, but (a) it must say so — warning + on-figure note — and
(b) every variable parameter must appear in some per-node corner (the
CLI raises the per-node cap to 19 > the largest possible node).
"""

import warnings

import numpy as np
import pytest


class TestCornerPlot:
    def test_no_truncation_no_warning(self, tmp_path):
        from lfit_python_tpu.utils.plotting import corner_plot

        flat = np.random.default_rng(0).standard_normal((50, 3))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            corner_plot(flat, ["a", "b", "c"], tmp_path / "c.png")
        assert (tmp_path / "c.png").exists()

    def test_truncation_warns_and_annotates(self, tmp_path):
        from lfit_python_tpu.utils.plotting import corner_plot

        flat = np.random.default_rng(0).standard_normal((50, 15))
        names = [f"p{i}" for i in range(15)]
        with pytest.warns(UserWarning, match=r"12/15"):
            corner_plot(flat, names, tmp_path / "c.png")
        assert (tmp_path / "c.png").exists()

    def test_max_params_raised_covers_node(self, tmp_path):
        """A complex+GP eclipse node has 15 variable params; the CLI's
        per-node cap (19) must show all of them without truncating."""
        from lfit_python_tpu.utils.plotting import corner_plot

        flat = np.random.default_rng(0).standard_normal((30, 15))
        names = [f"p{i}" for i in range(15)]
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            corner_plot(flat, names, tmp_path / "c.png", max_params=19)


class TestNodeCoverage:
    def test_var_groups_cover_every_param(self):
        """The per-node split (var_groups) partitions ALL variable params,
        and no single node exceeds the CLI's per-node corner cap of 19 —
        together these guarantee every sampled parameter appears in some
        untruncated per-node corner of the production report."""
        from lfit_python_tpu.examples import build_model

        model = build_model(
            n_eclipses=10, complex_spot=True, use_gp=True,
            n_points=8, bands=("g", "r")).compile()
        groups = model.var_groups()
        covered = sorted(i for _, idx in groups for i in idx)
        assert covered == list(range(model.n_var))
        assert model.n_var > 12          # the global corner DOES truncate
        assert max(len(idx) for _, idx in groups) <= 19
