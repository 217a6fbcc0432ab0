"""First-class sampler checkpointing (SURVEY.md §5.3/5.4).

The reference's only crash tolerance is the incrementally-appended chain
text file — sampler state (walker positions, random state) is lost on a
kill, so exact resume is impossible [R].  Here the full sampler state
(positions, log-probs, PRNG key, step counter) is checkpointed every K
steps and a resumed run is *bitwise identical* to an uninterrupted one
(the PRNG key is the entire stochastic state of the on-device sampler).

Handles the untempered :class:`~..sampling.ensemble.EnsembleState`, the
parallel-tempered :class:`~..sampling.pt.PTState` (VERDICT round-1 item
7: PT at feature parity), and the gradient-based
:class:`~..sampling.hmc.HMCState`.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..sampling.ensemble import EnsembleState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_FMT_VERSION = 2


def save_checkpoint(path, state, meta: dict | None = None):
    """Atomic checkpoint write (tmp + rename); EnsembleState, PTState or
    HMCState."""
    import jax

    from ..sampling.hmc import HMCState
    from ..sampling.pt import PTState

    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    fields = {
        "key": np.asarray(jax.random.key_data(state.key)),
        "positions": np.asarray(state.positions),
        "log_prob": np.asarray(
            state.ln_like if isinstance(state, PTState) else state.log_prob),
        "step": np.asarray(state.step),
    }
    kind = "ensemble"
    if isinstance(state, PTState):
        kind = "pt"
        fields["ln_prior"] = np.asarray(state.ln_prior)
        fields["betas"] = np.asarray(state.betas)
    elif isinstance(state, HMCState):
        kind = "hmc"
        fields["grad"] = np.asarray(state.grad)
        fields["step_size"] = np.asarray(state.step_size)
        fields["inv_mass"] = np.asarray(state.inv_mass)
    np.savez(
        tmp,
        version=_FMT_VERSION,
        kind=kind,
        meta=json.dumps(meta or {}),
        **fields,
    )
    # np.savez appends .npz to the tmp name
    tmp_real = tmp if tmp.exists() else tmp.with_suffix(tmp.suffix + ".npz")
    tmp_real.replace(path)
    return path


def load_checkpoint(path):
    """Load a checkpoint -> (EnsembleState | PTState | HMCState, meta)."""
    import jax
    import jax.numpy as jnp

    from ..sampling.hmc import HMCState
    from ..sampling.pt import PTState

    with np.load(Path(path), allow_pickle=False) as z:
        version = int(z["version"])
        if version not in (1, 2):
            raise ValueError(f"unsupported checkpoint version {version}")
        kind = str(z["kind"]) if "kind" in z else "ensemble"
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        if kind == "pt":
            state = PTState(
                key=key,
                positions=jnp.asarray(z["positions"]),
                ln_like=jnp.asarray(z["log_prob"]),
                ln_prior=jnp.asarray(z["ln_prior"]),
                betas=jnp.asarray(z["betas"]),
                step=jnp.asarray(z["step"]),
            )
        elif kind == "hmc":
            state = HMCState(
                key=key,
                positions=jnp.asarray(z["positions"]),
                log_prob=jnp.asarray(z["log_prob"]),
                grad=jnp.asarray(z["grad"]),
                step_size=jnp.asarray(z["step_size"]),
                inv_mass=jnp.asarray(z["inv_mass"]),
                step=jnp.asarray(z["step"]),
            )
        else:
            state = EnsembleState(
                key=key,
                positions=jnp.asarray(z["positions"]),
                log_prob=jnp.asarray(z["log_prob"]),
                step=jnp.asarray(z["step"]),
            )
        meta = json.loads(str(z["meta"]))
    return state, meta


def latest_checkpoint(directory, pattern="checkpoint_*.npz"):
    """Most recent checkpoint file in a directory, or None."""
    files = sorted(Path(directory).glob(pattern))
    return files[-1] if files else None
