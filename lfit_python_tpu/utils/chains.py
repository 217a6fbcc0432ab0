"""Chain output, reading, and convergence diagnostics (L4 utilities).

Reference: ``mcmc_utils.py`` — ``run_mcmc_save`` appending each step to
``chain_prod.txt``, ``readchain``/``flatchain`` readers, Gelman-Rubin
diagnostic, ``thumbPlot`` corner plots (SURVEY.md §2 "MCMC chain utils"
[R]).  The legacy text format is kept for drop-in compatibility:
one row per (step, walker): ``walker_index  par_0 ... par_{D-1}  ln_prob``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "ChainWriter",
    "read_chain",
    "flatchain",
    "gelman_rubin",
    "autocorr_time",
    "rebin",
    "save_arviz",
    "to_arviz",
    "summarize",
]


class ChainWriter:
    """Incremental chain writer (reference ``run_mcmc_save`` [R]).

    Appends rows as steps arrive so a killed run keeps everything written
    so far — the reference's only crash tolerance, preserved here on top of
    the first-class checkpointing in utils/checkpoints.py.
    """

    def __init__(self, path, param_names: Sequence[str], use_native=True,
                 append=False):
        """``append=True`` keeps an existing file's rows (resume): the
        header is only written for a new/empty file, never re-truncating
        samples already on disk."""
        self.path = Path(path)
        self.param_names = list(param_names)
        header = "# walker " + " ".join(self.param_names) + " ln_prob\n"
        if append and self.path.exists() and self.path.stat().st_size:
            existing = self.path.open().readline()
            if existing != header:
                raise ValueError(
                    f"{self.path} exists with a different parameter header; "
                    "refusing to append a mismatched chain")
        else:
            self.path.write_text(header)
        self._fh = self.path.open("a")
        self._use_native = use_native

    def append(self, positions: np.ndarray, log_probs: np.ndarray):
        """positions (n_steps, W, D) or (W, D); log_probs matching."""
        positions = np.atleast_3d(positions)
        if positions.ndim == 2:
            positions = positions[None]
        if log_probs.ndim == 1:
            log_probs = log_probs[None]
        n_steps, W, D = positions.shape
        rows = np.empty((n_steps * W, D + 2))
        rows[:, 0] = np.tile(np.arange(W), n_steps)
        rows[:, 1:-1] = positions.reshape(-1, D)
        rows[:, -1] = log_probs.reshape(-1)
        if self._use_native:
            from ..native import chain_write
            self._fh.flush()
            if chain_write(self.path, rows):
                return
        np.savetxt(self._fh, rows,
                   fmt=["%d"] + ["%.10e"] * (D + 1))
        self._fh.flush()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_chain(path):
    """Read a legacy chain file -> (chain (n_steps, W, D), lnp (n_steps, W),
    param_names). Reference ``readchain`` [R]."""
    path = Path(path)
    with path.open() as fh:
        header = fh.readline()
    names = header.lstrip("#").split()
    assert names[0] == "walker" and names[-1] == "ln_prob"
    names = names[1:-1]
    from ..native import chain_read_rows
    raw = chain_read_rows(path, len(names) + 2)
    if raw is None:
        raw = np.loadtxt(path)
    if raw.ndim == 1:
        raw = raw[None]
    W = int(raw[:, 0].max()) + 1
    n_steps = raw.shape[0] // W
    raw = raw[: n_steps * W]
    chain = raw[:, 1:-1].reshape(n_steps, W, -1)
    lnp = raw[:, -1].reshape(n_steps, W)
    return chain, lnp, names


def flatchain(chain, discard=0, thin=1):
    """(n_steps, W, D) -> (n_samples, D) (reference ``flatchain`` [R])."""
    return np.asarray(chain)[discard::thin].reshape(-1, chain.shape[-1])


def gelman_rubin(chain, discard=0):
    """Split-R-hat per parameter (reference had a G-R diagnostic [R-med]).

    ``chain`` (n_steps, W, D); walkers are treated as independent chains,
    each split in half (Gelman et al. 2013). Values near 1 indicate
    convergence.

    CAVEAT (heuristic, not a strict R-hat): stretch-move walkers are
    *correlated* by construction (each proposal uses another walker), so
    treating them as independent chains understates R-hat.  Use it as a
    progress indicator; for publication-grade convergence claims compare
    independent runs (different seeds) instead.
    """
    x = np.asarray(chain)[discard:]
    n, w, d = x.shape
    half = n // 2
    x = np.concatenate([x[:half], x[half: 2 * half]], axis=1)  # (half, 2w, d)
    n, m, _ = x.shape
    means = x.mean(axis=0)                      # (m, d)
    W = x.var(axis=0, ddof=1).mean(axis=0)      # within-chain
    B = n * means.var(axis=0, ddof=1)           # between-chain
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / np.maximum(W, 1e-300))


def autocorr_time(chain, c=5.0, walker_block=256):
    """Integrated autocorrelation time per parameter (emcee-style
    self-consistent window; used for effective-sample-size reporting).

    FFT-based: O(n log n (W + D)) — the naive np.correlate version was
    O(n^2 W D) and crawled on production chains (1e4 steps x 4096 walkers).

    Walkers are processed in blocks of ``walker_block`` and their
    normalised autocorrelations accumulated: the all-at-once FFT's
    transient footprint is ~26x the f32 chain (f64 staging + two complex
    spectra + the padded inverse), which at 4000 steps x 4096 walkers x
    157 params is >100 GB and OOM-kills the process — the per-block peak
    is the same 26x of a block only, at identical output (the walker
    mean is a linear reduction).
    """
    x = np.asarray(chain)
    n, w, d = x.shape
    # next power of two >= 2n for linear (non-circular) autocorrelation
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.zeros((n, d))
    for b0 in range(0, w, walker_block):
        y = np.asarray(x[:, b0:b0 + walker_block], np.float64)
        y = y - y.mean(axis=0, keepdims=True)       # (n, wb, d)
        fy = np.fft.rfft(y, n=nfft, axis=0)
        fy *= np.conj(fy)
        acf = np.fft.irfft(fy, n=nfft, axis=0)[:n]  # (n, wb, d)
        del fy
        acf /= np.maximum(acf[0], 1e-300)
        f += acf.sum(axis=1)
    f /= w                                          # (n, d) walker-averaged
    taus = np.empty(d)
    for j in range(d):
        taus_cum = 2.0 * np.cumsum(f[:, j]) - 1.0
        window = np.arange(n) < c * taus_cum
        idx = np.argmin(window) if not window.all() else n - 1
        taus[j] = taus_cum[max(idx, 1)]
    return taus


def rebin(phase, flux, err, factor):
    """Rebin a light curve by an integer factor with inverse-variance
    weighting (reference ``mcmc_utils.rebin`` [R]). Trailing remainder
    points are dropped."""
    n = (len(phase) // factor) * factor
    ph = np.asarray(phase)[:n].reshape(-1, factor)
    fl = np.asarray(flux)[:n].reshape(-1, factor)
    er = np.asarray(err)[:n].reshape(-1, factor)
    w = 1.0 / np.maximum(er, 1e-300) ** 2
    wsum = w.sum(axis=1)
    return (ph.mean(axis=1),
            (fl * w).sum(axis=1) / wsum,
            1.0 / np.sqrt(wsum))


def to_arviz(chain, param_names, log_prob=None):
    """Chain -> ``arviz.InferenceData`` if arviz is importable, else a
    plain xarray-style dict {name: (chain=walker, draw) array} (SURVEY.md
    §5.5 "ArviZ-compatible chain output")."""
    x = np.asarray(chain)          # (draw, walker, dim) -> (walker, draw)
    data = {n: x[:, :, i].T for i, n in enumerate(param_names)}
    if log_prob is not None:
        data["ln_prob"] = np.asarray(log_prob).T
    try:
        import arviz

        return arviz.from_dict(posterior=data)
    except Exception:
        return data


def save_arviz(chain, param_names, path, log_prob=None):
    """Persist the chain in ArviZ form: ``<path>.nc`` (netCDF via
    ``InferenceData.to_netcdf``) when arviz is importable, else
    ``<path>.npz`` holding the same named (walker, draw) arrays — either
    way a machine-readable per-parameter chain (SURVEY.md §5.5; VERDICT
    round-2 item 9).  Returns the written Path."""
    from pathlib import Path

    out = to_arviz(chain, param_names, log_prob)
    path = Path(path)
    if isinstance(out, dict):               # arviz absent: npz fallback
        path = path.with_suffix(".npz")
        np.savez_compressed(path, **out)
    else:
        path = path.with_suffix(".nc")
        out.to_netcdf(str(path))
    return path


def summarize(chain, param_names, discard=0, percentiles=(16, 50, 84)):
    """Percentile parameter table (reference's post-fit report [R]).

    Returns a list of dicts: name, median, +err, -err.
    """
    flat = flatchain(chain, discard)
    lo, med, hi = np.percentile(flat, percentiles, axis=0)
    return [
        {
            "name": nm,
            "median": float(m),
            "upper": float(h - m),
            "lower": float(m - l),
        }
        for nm, l, m, h in zip(param_names, lo, med, hi)
    ]
