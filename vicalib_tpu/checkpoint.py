"""Solver-state checkpoint / resume.

The reference's persistence is file-level only — cameras.xml out,
-model_files + -has_initial_guess in (SURVEY.md section 5); there is no
mid-solve checkpointing.  This module adds a native full-state checkpoint
(npz + json sidecar): every optimized parameter (CalibState), the stage
machine position, and solver bookkeeping, so a long calibration can resume
exactly where it stopped — plus the cameras.xml path for reference-compatible
resume.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from .solver.problem import CalibState, StageFlags

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: CalibState, flags: StageFlags = None,
                    meta: dict = None):
    """Write state (+ stage flags / metadata) to ``path`` (.npz) and
    ``path + .json``."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    np.savez(path, **arrays)
    side = {"format_version": FORMAT_VERSION,
            "fields": list(state._fields)}
    if flags is not None:
        side["stage_flags"] = dataclasses.asdict(flags)
    if meta:
        side["meta"] = meta
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=1)


def load_checkpoint(path: str, dtype=None):
    """Returns (CalibState, StageFlags-or-None, meta dict)."""
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    side = {}
    jpath = (path if path.endswith(".npz") else path + ".npz") + ".json"
    alt = path + ".json"
    for p in (jpath, alt):
        if os.path.exists(p):
            with open(p) as f:
                side = json.load(f)
            break
    kwargs = {}
    for f in CalibState._fields:
        a = z[f]
        kwargs[f] = jnp.asarray(a, dtype) if dtype is not None else \
            jnp.asarray(a)
    state = CalibState(**kwargs)
    flags = None
    if "stage_flags" in side:
        flags = StageFlags(**side["stage_flags"])
    return state, flags, side.get("meta", {})
