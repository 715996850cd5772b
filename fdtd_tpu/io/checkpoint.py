"""Checkpoint / resume.

The reference's Silo dumps are write-only visualization artifacts
(reference: main.c:550-598); here snapshots double as restart points: the
full staggered state plus the step index round-trips losslessly through an
.npz, and the CLI can resume a long run from the latest checkpoint
(SURVEY section 5, checkpoint/resume row).
"""

from __future__ import annotations

import glob
import os
import re

import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..state import FieldState

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


def save_checkpoint(
    path: str,
    state: FieldState,
    iteration: int,
    t: float,
    power: jnp.ndarray | np.ndarray | None = None,
) -> None:
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    if power is not None:
        arrays["power_acc"] = np.asarray(power)
    tmp = path + ".tmp.npz"
    np.savez(tmp, iteration=np.int64(iteration), t=np.float64(t), **arrays)
    os.replace(tmp, path)


def load_checkpoint(
    path: str, p: Params
) -> tuple[FieldState, int, float, jnp.ndarray | None]:
    with np.load(path) as z:
        arrays = {}
        for name in _FIELDS:
            a = z[name]
            if a.shape != p.padded_shape:
                raise ValueError(
                    f"checkpoint {name} shape {a.shape} != params shape {p.padded_shape}"
                )
            arrays[name] = jnp.asarray(a, dtype=jnp.dtype(p.dtype))
        power = jnp.asarray(z["power_acc"]) if "power_acc" in z else None
        return FieldState(**arrays), int(z["iteration"]), float(z["t"]), power


def latest_checkpoint(out_dir: str) -> str | None:
    # strict ckpt(\d+).npz$ match: excludes partial "*.tmp.npz" files left
    # by a crash mid-save, which would otherwise be picked up and fail to load
    pat = re.compile(r"ckpt(\d+)\.npz$")
    cands = [
        (int(m.group(1)), f)
        for f in glob.glob(os.path.join(out_dir, "ckpt[0-9]*.npz"))
        if (m := pat.search(os.path.basename(f)))
    ]
    return max(cands)[1] if cands else None
