"""TE10 waveguide-port source injection (reference: main.c:712-753).

Computation mode hard-sets, on an a'xb' patch centered in the z=0 wall:

    Ez = sin(2*pi*f*t) * sin(pi * shift_i*dx / a')
    Hx = -(1/Z_te) * sin(2*pi*f*t) * sin(pi * shift_i*dx / a')
    Ex = Hz = 0

The patch integer bounds replicate the reference exactly, including the +-1
index slop: min_j = (int)(min_y/dx) - 1, max_j = (int)(max_y/dx) + 1
(main.c:729-733).  Z_te is derived from *width*/length (main.c:737-739 —
note the reference's validation oracle uses height/length instead; both are
reproduced faithfully, see SURVEY section 2.4 item 5).

All patch geometry is static, so injection is a static-slice ``.at[].set``
inside the jitted step — no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from .constants import CELERITY, EPSILON, MU, PI
from .params import Params
from .state import FieldState


@dataclasses.dataclass(frozen=True)
class SourcePlan:
    """Precomputed static patch geometry and drive constants."""

    i0: int
    i1: int
    j0: int
    j1: int
    frequency: float
    inv_z_te: float
    profile: tuple[float, ...]  # sin(pi * shift_i * dx / a') per i in [i0, i1)
    # drive envelope (extension; reference is CW): "cw" or "gaussian"
    envelope: str = "cw"
    pulse_width: float = 0.0  # gaussian sigma (s)
    pulse_delay: float = 0.0  # gaussian center (s)


def make_source_plan(p: Params) -> SourcePlan:
    cfg = p.source
    aprime, bprime = cfg.aprime, cfg.bprime
    dx = p.spatial_step

    min_y = p.width / 2.0 - aprime / 2.0
    max_y = min_y + aprime
    min_x = p.length / 2.0 - bprime / 2.0
    max_x = min_x + bprime

    j0 = int(min_y / dx) - 1
    j1 = int(max_y / dx) + 1
    i0 = int(min_x / dx) - 1
    i1 = int(max_x / dx) + 1
    if i0 < 0 or j0 < 0 or i1 > p.maxi or j1 > p.maxj:
        raise ValueError(
            f"source patch [{i0}:{i1})x[{j0}:{j1}) exceeds the grid "
            f"({p.maxi}x{p.maxj}); the reference would index out of bounds here"
        )

    f_mnl = 0.5 * CELERITY * math.sqrt((PI / p.width) ** 2 + (PI / p.length) ** 2) / PI
    omega = 2.0 * PI * f_mnl
    z_te = (omega * MU) / math.sqrt(omega**2 * MU * EPSILON - (PI / p.width) ** 2)

    profile = tuple(
        math.sin(PI * (shift_i * dx) / aprime) for shift_i in range(i1 - i0)
    )
    env = getattr(cfg, "envelope", "cw")
    if env not in ("cw", "gaussian"):
        raise ValueError(f"unknown source envelope {env!r}: use cw or gaussian")
    width = delay = 0.0
    if env == "gaussian":
        width = (cfg.pulse_width if cfg.pulse_width is not None
                 else 2.0 / cfg.frequency)
        if width <= 0:
            raise ValueError("source pulse width must be positive")
        delay = cfg.pulse_delay if cfg.pulse_delay is not None else 3.0 * width
    elif cfg.pulse_width is not None or cfg.pulse_delay is not None:
        raise ValueError(
            "source pulse width/delay need envelope='gaussian' "
            "(--source-envelope gaussian)"
        )
    return SourcePlan(i0, i1, j0, j1, cfg.frequency, 1.0 / z_te, profile,
                      envelope=env, pulse_width=width, pulse_delay=delay)


def drive_values(plan: SourcePlan, times) -> "np.ndarray":
    """Host-side per-step drive amplitudes sin(2*pi*f*t) (reference: main.c:748).

    Precomputed in fp64 with libm-grade accuracy: XLA's vectorized fp64 sin
    is only ~1e-8 accurate on some backends, and the source phase is the one
    transcendental that feeds field evolution.  The times are known before
    the scan, so this costs nothing on device.

    With a "gaussian" envelope (extension) the carrier is modulated by
    exp(-(t - delay)^2 / (2 width^2)) — because every backend and every
    sharded composition consumes these host-precomputed amplitudes via
    the scan inputs, the pulsed source works on all of them unchanged.
    """
    import numpy as np

    t = np.asarray(times, dtype=np.float64)
    amp = np.sin((2.0 * PI * plan.frequency) * t)
    if plan.envelope == "gaussian":
        amp = amp * np.exp(
            -((t - plan.pulse_delay) ** 2) / (2.0 * plan.pulse_width**2)
        )
    return amp


def apply_source(plan: SourcePlan, s: FieldState, amp) -> FieldState:
    """Hard-set the source patch; ``amp`` = sin(2*pi*f*t) (traced scalar)."""
    dt = s.ez.dtype
    ni, nj = len(plan.profile), plan.j1 - plan.j0
    amp = jnp.asarray(amp)
    prof = jnp.asarray(plan.profile, dtype=jnp.result_type(amp))
    row = amp * prof  # (ni,), value depends on i only (main.c:748)
    patch = jnp.broadcast_to(row[None, :], (nj, ni))
    zero = jnp.zeros((nj, ni), dtype=dt)

    sl = (0, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
    ez = s.ez.at[sl].set(patch.astype(dt))
    ex = s.ex.at[sl].set(zero)
    hz = s.hz.at[sl].set(zero)
    hx = s.hx.at[sl].set((-plan.inv_z_te * patch).astype(dt))
    return FieldState(ex, s.ey, ez, hx, s.hy, hz)
