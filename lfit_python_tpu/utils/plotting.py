"""Result plots (reference: per-eclipse model plots + ``thumbPlot`` corner
plots from ``mcmc_utils.py``/``mcmcfit.py`` [R], SURVEY.md §2 "Results &
plots").  Pure matplotlib — the ``corner`` package is not assumed."""

from __future__ import annotations

import numpy as np

__all__ = ["plot_eclipse", "corner_plot"]


def plot_eclipse(model, full_vec, eclipse_index=0, config=None, path=None):
    """Data + total model + the four component curves + residuals
    (reference ``Model.plot_data`` [R])."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from ..models.cv import CVConfig, cv_fluxes

    if config is None:
        config = CVConfig(complex_spot=True)
    # One unbatched vector on a small phase grid, evaluated once per
    # figure: pin it to the CPU backend and jit there.  Eager execution
    # on a remote-attached TPU pays a tunnel round trip PER OP (~3.5 min
    # measured for one figure), and jitting on TPU would compile a
    # one-shot scalar program the fit never reuses.  CPU compiles this in
    # seconds and is the parity oracle anyway.  pallas_contacts is pinned
    # off because the Mosaic kernel is TPU-only and the auto heuristic
    # keys off the *default* backend, not the device we pin here.
    config = config._replace(complex_spot=True, pallas_contacts=False)

    k = eclipse_index
    ecl = model.spec.eclipses[k]
    lc = ecl.lightcurve
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cvp = model.cv_params(jax.device_put(jnp.asarray(full_vec), cpu))[k]
        widths = (None if lc.width is None
                  else jax.device_put(jnp.asarray(lc.width), cpu))
        fluxes_fn = jax.jit(lambda p, ph: cv_fluxes(p, ph, widths, config))
        out = fluxes_fn(cvp, jax.device_put(jnp.asarray(lc.phase), cpu))
        out = jax.block_until_ready(out)

    fig, (ax, axr) = plt.subplots(
        2, 1, figsize=(8, 6), sharex=True,
        gridspec_kw={"height_ratios": [3, 1]})
    ax.errorbar(lc.phase, lc.flux, lc.err, fmt=".", ms=3, alpha=0.5,
                color="k", label="data")
    ax.plot(lc.phase, np.asarray(out.total), "r-", lw=1.2, label="total")
    for y, lab, c in [(out.ywd, "WD", "C0"), (out.ydisc, "disc", "C1"),
                      (out.yspot, "spot", "C2"), (out.ysec, "donor", "C3")]:
        ax.plot(lc.phase, np.asarray(y), c, lw=0.8, label=lab)
    ax.set_ylabel("flux")
    ax.legend(fontsize=8, ncol=3)
    ax.set_title(f"eclipse {ecl.name} ({ecl.band})")
    resid = lc.flux - np.asarray(out.total)
    axr.errorbar(lc.phase, resid, lc.err, fmt=".", ms=3, color="k")
    axr.axhline(0, color="r", lw=0.8)
    axr.set_xlabel("orbital phase")
    axr.set_ylabel("residual")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def corner_plot(flat, names, path=None, max_params=12):
    """Corner (pairwise scatter + histogram) plot, reference ``thumbPlot``
    [R].  Caps at ``max_params`` dimensions for readability — but NEVER
    silently: truncation emits a warning and stamps the figure with
    "showing d/D parameters".  The CLI raises the cap for per-node
    corners (every tree node fits in <= 19 params) so the production
    report shows every sampled parameter somewhere; only the global
    corner of a big hierarchical fit truncates, and says so."""
    import warnings

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    flat = np.asarray(flat)
    d = min(flat.shape[1], max_params)
    truncated = flat.shape[1] > d
    if truncated:
        warnings.warn(
            f"corner_plot: showing {d}/{flat.shape[1]} parameters "
            f"({path or 'figure'}); the per-node corner_<label>.png "
            "plots cover the rest", stacklevel=2)
    fig, axes = plt.subplots(d, d, figsize=(2.0 * d, 2.0 * d))
    if truncated:
        fig.suptitle(f"showing {d}/{flat.shape[1]} parameters "
                     "(see per-node corners)", fontsize=10, color="crimson")
    if d == 1:
        axes = np.array([[axes]])
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            if j > i:
                ax.set_visible(False)
                continue
            if i == j:
                ax.hist(flat[:, i], bins=40, color="C0",
                        histtype="stepfilled", alpha=0.7)
            else:
                ax.plot(flat[:, j], flat[:, i], ",", color="k", alpha=0.3)
            if i == d - 1:
                ax.set_xlabel(names[j], fontsize=7)
            else:
                ax.set_xticklabels([])
            if j == 0 and i > 0:
                ax.set_ylabel(names[i], fontsize=7)
            else:
                ax.set_yticklabels([])
            ax.tick_params(labelsize=6)
    fig.tight_layout(pad=0.3)
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig
