"""First-class sampler checkpointing (SURVEY.md §5.3/5.4).

The reference's only crash tolerance is the incrementally-appended chain
text file — sampler state (walker positions, random state) is lost on a
kill, so exact resume is impossible [R].  Here the full sampler state
(positions, log-probs, PRNG key, step counter) is checkpointed every K
steps and a resumed run is *bitwise identical* to an uninterrupted one
(the PRNG key is the entire stochastic state of the on-device sampler).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..sampling.ensemble import EnsembleState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_FMT_VERSION = 1


def save_checkpoint(path, state: EnsembleState, meta: dict | None = None):
    """Atomic checkpoint write (tmp + rename)."""
    import jax

    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez(
        tmp,
        version=_FMT_VERSION,
        key=np.asarray(jax.random.key_data(state.key)),
        positions=np.asarray(state.positions),
        log_prob=np.asarray(state.log_prob),
        step=np.asarray(state.step),
        meta=json.dumps(meta or {}),
    )
    # np.savez appends .npz to the tmp name
    tmp_real = tmp if tmp.exists() else tmp.with_suffix(tmp.suffix + ".npz")
    tmp_real.replace(path)
    return path


def load_checkpoint(path) -> tuple[EnsembleState, dict]:
    """Load a checkpoint -> (EnsembleState, meta)."""
    import jax
    import jax.numpy as jnp

    with np.load(Path(path), allow_pickle=False) as z:
        if int(z["version"]) != _FMT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
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
