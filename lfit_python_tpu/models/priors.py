"""Parameter and prior system (L4), vectorised.

Reference: ``mcmc_utils.py`` ``Param``/``Prior`` [R-high] (SURVEY.md §2
"Parameter/prior system") with the five prior families **gauss, gaussPos,
uniform, log_uniform, mod_jeff**.  The reference evaluates ``ln_prob`` one
scalar at a time per Python object; here priors compile to three arrays
(type codes, p1, p2) so a whole parameter vector — and the whole walker
ensemble via vmap — evaluates in one fused XLA op.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["Prior", "Param", "PriorTable", "make_prior_table", "ln_prior_table"]

_PRIOR_CODES = {
    "uniform": 0,
    "log_uniform": 1,
    "gauss": 2,
    "gaussPos": 3,
    "mod_jeff": 4,
}


@dataclass(frozen=True)
class Prior:
    """A 2-parameter prior, reference-compatible spellings.

    uniform(lo, hi); log_uniform(lo, hi); gauss(mean, sigma);
    gaussPos(mean, sigma) [gaussian truncated at 0];
    mod_jeff(knee, hi) [modified Jeffreys, p ~ 1/(x + knee), 0 <= x < hi].
    """
    type: str
    p1: float
    p2: float

    def __post_init__(self):
        if self.type not in _PRIOR_CODES:
            raise ValueError(
                f"unknown prior type {self.type!r}; "
                f"expected one of {sorted(_PRIOR_CODES)}"
            )

    def ln_prob(self, val):
        table = make_prior_table([Param("x", float(val), self, True)])
        return ln_prior_table(jnp.asarray([val], jnp.float64), table)


@dataclass(frozen=True)
class Param:
    """One named model parameter (reference ``mcmc_utils.Param`` [R])."""
    name: str
    start: float
    prior: Prior
    is_var: bool = True
    # walker-ball scatter scale multiplier (reference comp_scat [R-med])
    scatter: float = field(default=1.0, compare=False)


@dataclass(frozen=True)
class PriorTable:
    """Vectorised prior spec for a flat parameter vector."""
    codes: np.ndarray   # (D,) int32 prior-type codes
    p1: np.ndarray      # (D,)
    p2: np.ndarray      # (D,)


def make_prior_table(params: Sequence[Param]) -> PriorTable:
    return PriorTable(
        codes=np.asarray([_PRIOR_CODES[p.prior.type] for p in params], np.int32),
        p1=np.asarray([p.prior.p1 for p in params], np.float64),
        p2=np.asarray([p.prior.p2 for p in params], np.float64),
    )


def ln_prior_table(vals, table: PriorTable):
    """Sum of ln prior probabilities for one flat vector. vmap over walkers.

    Out-of-support values yield -inf. All five families are computed
    branch-free and selected by type code (one fused op for the ensemble).
    """
    v = jnp.asarray(vals)
    codes = jnp.asarray(table.codes)
    p1 = jnp.asarray(table.p1, v.dtype)
    p2 = jnp.asarray(table.p2, v.dtype)
    neg_inf = jnp.asarray(-jnp.inf, v.dtype)

    # NB: every family is evaluated for every row and masked by the final
    # code select, so out-of-domain inputs (negative v under a log, etc.)
    # are VALUE-safe — but their *derivatives* must stay finite too, or
    # the zero cotangent of an unselected row turns into 0/0 = NaN in the
    # VJP and poisons jax.grad of the whole table.  Floors must be
    # representable in the working dtype: 1e-300 underflows to 0.0 in f32,
    # which is exactly how params starting at 0.0 (phi0, yaw) NaN'd the
    # posterior gradient.
    tiny = jnp.asarray(jnp.finfo(v.dtype).tiny, v.dtype)
    one = jnp.asarray(1.0, v.dtype)

    # Each family also carries a hyperparameter-validity mask: every row's
    # (p1, p2) pair feeds ALL five family formulas, so e.g. a uniform
    # prior with hi = 0 puts p2 = 0 into the gauss row's divisor.  A
    # v-DEPENDENT inf in an unselected row (like ((v-p1)/0)**2) meets its
    # zero cotangent as 0*inf = NaN in the VJP — the exact failure that
    # made jax.grad of every GP-flagged posterior NaN (the in-repo GP
    # hyperparameter priors are uniform(lo, 0)).  Degenerate-but-SELECTED
    # hyperparameters (sigma <= 0, empty support, ...) yield -inf.

    # uniform(lo, hi): needs hi > lo
    uni_ok = p2 > p1
    ln_uni = jnp.where(
        uni_ok & (v >= p1) & (v <= p2),
        -jnp.log(jnp.where(uni_ok, p2 - p1, one)), neg_inf)
    # log_uniform(lo, hi): p ~ 1/x on [lo, hi]; needs 0 < lo < hi
    logu_ok = (p1 > 0.0) & (p2 > p1)
    safe_v = jnp.maximum(v, tiny)
    ln_logu = jnp.where(
        logu_ok & (v >= p1) & (v <= p2),
        -jnp.log(safe_v)
        - jnp.log(jnp.log(jnp.where(logu_ok, p2 / jnp.maximum(p1, tiny),
                                    jnp.e))),
        neg_inf)
    # gauss(mean, sigma): needs sigma > 0.  The divisor must be safe even
    # on unselected rows (see mask note above).
    g_ok = p2 > 0.0
    safe_sig = jnp.where(g_ok, p2, one)
    ln_g = jnp.where(
        g_ok,
        -0.5 * ((v - p1) / safe_sig) ** 2
        - jnp.log(safe_sig) - 0.5 * jnp.log(2.0 * jnp.pi),
        neg_inf)
    # gaussPos: gaussian truncated to v >= 0 (renormalisation constant is
    # parameter-independent given (p1, p2), included for correctness)
    from jax.scipy.special import erf
    z = p1 / (jnp.sqrt(2.0) * safe_sig)
    ln_norm_pos = jnp.log(0.5 * (1.0 + erf(z)))
    ln_gp = jnp.where(g_ok & (v >= 0.0), ln_g - ln_norm_pos, neg_inf)
    # mod_jeff(knee, hi): p ~ 1/(v + knee) on [0, hi); needs knee > 0,
    # hi > 0.  In-support rows have v + knee >= knee > 0, so the floor
    # only sanitises the derivative of masked-out rows (v + p1 <= 0 for
    # params whose table row reuses a uniform's negative p1)
    mj_ok = (p1 > 0.0) & (p2 > 0.0)
    ln_mj = jnp.where(
        mj_ok & (v >= 0.0) & (v < p2),
        -jnp.log(jnp.maximum(v + p1, tiny))
        - jnp.log(jnp.log(jnp.where(
            mj_ok, (p2 + p1) / jnp.maximum(p1, tiny), jnp.e))),
        neg_inf)

    stacked = jnp.stack([ln_uni, ln_logu, ln_g, ln_gp, ln_mj], axis=0)
    per_param = jnp.take_along_axis(stacked, codes[None, :], axis=0)[0]
    return jnp.sum(per_param)
