"""Checkpoint / resume for long sampling runs.

The reference has no checkpointing (SURVEY.md §5.4 — sampler state is
downstream's problem); for pod-scale NUTS runs it is required.  State saved:
RNG keys, chain positions (+ cached logp/grad), adaptation results
(step size, inverse metric), and the draw count — everything needed to
continue bit-compatibly.

Backend: orbax (the TPU-native checkpoint library; async-safe, sharding-
aware), pytree in / pytree out.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


_checkpointer = None


def _ckptr():
    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Atomically persist a pytree of arrays (jax or numpy)."""
    path = os.path.abspath(path)
    c = _ckptr()
    c.save(path, state, force=True)
    c.wait_until_finished()


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    return _ckptr().restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
