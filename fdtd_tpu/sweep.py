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

Both accept ``mesh=``: a 1-D ``jax.sharding.Mesh`` (axis ``"b"``, see
:func:`batch_mesh`) over which the batch axis shards — each device runs
N/n_devices members with zero cross-device traffic during the scan (the
energy reductions at the end are per-member, so they stay local too).
The reference's analogue is launching one process per parameter point;
here it is one sharded program (BASELINE config #5, "optionally sharded").
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


def batch_mesh(n_devices: int | None = None, devices=None):
    """1-D mesh with axis ``"b"`` for sharding a sweep's batch dimension."""
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            devices = jax.devices("cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("b",))


def _shard_batch(tree, mesh, n: int):
    """device_put every array leaf with its leading batch axis over ``mesh``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    nb = mesh.shape["b"]
    if n % nb:
        raise ValueError(f"sweep size {n} must divide over {nb} mesh devices")

    def put(a):
        a = jnp.asarray(a)
        spec = P("b", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def frequency_sweep(
    p: Params,
    frequencies: Sequence[float],
    n_steps: int | None = None,
    backend: str = "xla",
    mesh=None,
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

    amps_in = jnp.asarray(amps)
    if mesh is not None:
        amps_in = _shard_batch(amps_in, mesh, len(freqs))
    states = jax.jit(jax.vmap(run_one))(amps_in)
    e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
    h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
    return SweepResult(states, e, h)


def material_sweep(
    p: Params,
    materials_list: Sequence[Materials],
    n_steps: int | None = None,
    mesh=None,
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

    if mesh is not None:
        stacked = _shard_batch(stacked, mesh, len(materials_list))
    states = jax.jit(jax.vmap(run_one))(stacked)
    e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
    h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
    return SweepResult(states, e, h)
