"""Batched design sweeps via vmap (BASELINE config #5).

The reference runs one simulation per process.  Here a *batch* of
simulations — e.g. a scan over source frequency or dielectric-load
placement — runs as one vmapped, jitted program: the batch axis becomes a
leading array dimension, XLA vectorizes the whole leapfrog across it, and
(optionally) the batch shards across devices for embarrassingly-parallel
scale-out.

Two sweep axes are supported out of the box:

- ``frequency_sweep``: N source frequencies.  The per-step drive amplitude
  sin(2*pi*f*t) is host-precomputed per frequency ((N, steps) array) and the
  *same* field-update program runs for every member, so this vmaps over the
  scan inputs only.
- ``material_sweep``: N material coefficient sets (e.g. load positions).
  Coefficient arrays gain a leading batch axis; vacuum scalars broadcast.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .constants import PI
from .params import Mode, Params, time_values
from .source import make_source_plan
from .state import FieldState, Materials, update_coefs, zeros
from .step import make_step
from . import diagnostics


@dataclasses.dataclass
class SweepResult:
    states: FieldState  # leading batch axis on every component
    e_energy: jax.Array  # (N,)
    h_energy: jax.Array  # (N,)


def frequency_sweep(
    p: Params,
    frequencies: Sequence[float],
    n_steps: int | None = None,
    backend: str = "xla",
) -> SweepResult:
    """Run one simulation per source frequency, batched with vmap."""
    if p.mode != Mode.COMPUTATION:
        raise ValueError("frequency sweeps require computation mode (a source)")
    freqs = np.asarray(frequencies, dtype=np.float64)
    ts = time_values(p)
    if n_steps is not None:
        ts = ts[:n_steps]
    # per-frequency drive amplitudes, host-precomputed in fp64 like the
    # single-run path (fdtd_tpu.source.drive_values)
    amps = np.sin((2.0 * PI * freqs)[:, None] * ts[None, :])  # (N, steps)

    step = make_step(p, backend=backend)

    def run_one(amp_row):
        s = zeros(p)

        def body(s, x):
            return step(s, x), None

        s, _ = jax.lax.scan(body, s, (jnp.asarray(ts), amp_row))
        return s

    states = jax.jit(jax.vmap(run_one))(jnp.asarray(amps))
    e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
    h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
    return SweepResult(states, e, h)


def material_sweep(
    p: Params,
    materials_list: Sequence[Materials],
    n_steps: int | None = None,
) -> SweepResult:
    """Run one simulation per material configuration, batched with vmap."""
    from .step import scan_inputs

    if any(m is None or m.is_vacuum for m in materials_list):
        raise ValueError("material_sweep requires non-vacuum Materials for every member")
    coefs_list = [update_coefs(p, m) for m in materials_list]
    # stack coefficient arrays along a new batch axis
    stacked = jax.tree.map(lambda *xs: jnp.stack(jnp.broadcast_arrays(*map(jnp.asarray, xs))), *coefs_list)

    ts = time_values(p)
    if n_steps is not None:
        ts = ts[:n_steps]
    xs = scan_inputs(p, ts)

    def run_one(coefs):
        from .state import init_validation

        step = make_step(p, coefs=coefs)
        s = init_validation(p) if p.mode == Mode.VALIDATION else zeros(p)

        def body(s, x):
            return step(s, x), None

        s, _ = jax.lax.scan(body, s, (jnp.asarray(xs[0]), jnp.asarray(xs[1])))
        return s

    states = jax.jit(jax.vmap(run_one))(stacked)
    e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
    h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
    return SweepResult(states, e, h)
