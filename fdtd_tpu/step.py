"""The jitted leapfrog step and scan driver.

One step replicates the reference loop body order exactly (reference:
main.c:765-779): [source] -> update_H -> [source] -> update_E.  The source is
applied twice per step in computation mode — an observable quirk of the
reference that is part of field-evolution parity (SURVEY section 2.4 item 4).

The whole step is traced once under ``jax.jit``; multi-step runs use
``lax.scan`` over the per-step time values (precomputed host-side with the
reference's exact fp64 accumulation, see :func:`fdtd_tpu.params.time_values`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from .params import Mode, Params
from .source import SourcePlan, apply_source, make_source_plan
from .state import FieldState, Materials, UpdateCoefs, update_coefs
from .ops import curl
from . import diagnostics


def make_step(
    p: Params,
    materials: Materials | None = None,
    backend: str = "xla",
    coefs: UpdateCoefs | None = None,
) -> Callable[[FieldState, jax.Array], FieldState]:
    """Build the single-step function ``step(state, t) -> state``.

    ``backend``: "xla" (pure-jnp slice ops) or "pallas" (fused TPU kernel,
    vacuum path — see :mod:`fdtd_tpu.ops.pallas_step`).
    """
    if coefs is None:
        coefs = update_coefs(p, materials)
    plan: SourcePlan | None = (
        make_source_plan(p) if p.mode == Mode.COMPUTATION else None
    )
    del materials  # folded into coefs

    if backend == "pallas_fused":
        # stripped-layout two-pass kernels (see ops/pallas_fused.py)
        from .ops import pallas_fused as pf

        return pf.make_fused_step(p, coefs)
    if backend == "pallas":
        from .ops import pallas_step as ps

        update_h, update_e = ps.make_updates(p, coefs)
    elif backend == "xla":
        update_h = lambda s: curl.update_h(p, s, coefs)
        update_e = lambda s: curl.update_e(p, s, coefs)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def step(s: FieldState, x) -> FieldState:
        """One leapfrog step; ``x`` = (t, drive_amp) per :func:`scan_inputs`."""
        _t, amp = x
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = update_h(s)
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = update_e(s)
        return s

    return step


def _huge_state(p: Params) -> bool:
    """True when 2x the stripped state would overflow HBM (scan carries
    double-buffer around aliased pallas calls; see make_chunk_runner)."""
    import os as _os

    from .ops.pallas_temporal import HBM_BUDGET, state_bytes

    limit = int(float(_os.environ.get("FDTD_SCAN_STATE_LIMIT", HBM_BUDGET // 2)))
    return state_bytes(p) > limit


def default_temporal_s_lossy(p: Params, sar: bool) -> int:
    """Steps-per-sweep for the lossy temporal kernel: the largest s whose
    VMEM plan needs at most a 4-way j-tiling (beyond that the halo refetch
    eats the coefficient-streaming win; measured guidance in DESIGN.md)."""
    from .ops.pallas_temporal import plan_nj

    for s in (6, 5, 4, 3):
        nj = plan_nj(p, s, lossy=True, sar=sar)
        if nj is not None and nj <= 4:
            return s
    return 2


def default_temporal_s(p: Params) -> int:
    """Measured sweet spots on v5e (see docs/DESIGN.md kernel table).

    bf16 peaks at s=4 (33.8 Gcells/s at 256^3; s=5 measured slower — the
    deeper halo recompute, not VMEM, binds).  fp32 prefers the largest s
    whose windows still fit full-plane (s=6 -> 22.7 G at 256^3 with the
    slimmed windows; j-tiled s=6/7 lose to full-plane s=5 via the halo
    refetch, measured 17.1-17.4 G), falling back to s=5 when every s
    j-tiles (512^3-class: measured 19.5 G at s=5).
    """
    import jax.numpy as _jnp

    if _jnp.dtype(p.dtype) == _jnp.bfloat16:
        return 4
    from .ops.pallas_temporal import plan_nj

    for s in (6, 5):
        if plan_nj(p, s) == 1:
            return s
    return 5


def scan_inputs(p: Params, times):
    """Per-step scan inputs: (t, drive_amp) arrays for ``lax.scan``.

    Drive amplitudes are precomputed host-side in libm fp64 (see
    :func:`fdtd_tpu.source.drive_values`).
    """
    import numpy as np

    times = np.asarray(times, dtype=np.float64)
    if p.mode == Mode.COMPUTATION:
        from .source import drive_values, make_source_plan as _msp

        amps = drive_values(_msp(p), times)
    else:
        amps = np.zeros_like(times)
    return times, amps


@dataclasses.dataclass(frozen=True)
class RunOutputs:
    state: FieldState
    power_j: jax.Array | None  # accumulated sigma*|E|^2*dt per cell (J/m^3)


def make_chunk_runner(
    p: Params,
    materials: Materials | None = None,
    backend: str = "xla",
    accumulate_power: bool = False,
):
    """Jitted ``run(state, times, power_acc) -> (state, power_acc)``.

    Scans the step over a chunk of time values (typically ``sampling_rate``
    steps between snapshots).  Optionally accumulates dissipated energy
    density for SAR/heating maps (lossy materials only).

    DONATION CONTRACT: for the Pallas backends ("pallas", "pallas_fused",
    "pallas_temporal") the input state is **donated** — its buffers are
    reused in place so steady-state HBM stays at ~1x the state (a 1024^3
    bf16 state is 12.9 GB; an undonated copy cannot exist on a 16 GB chip).
    Pass a fresh ``prep(...)``-built state per ``run`` call and treat it as
    consumed: re-reading it afterwards raises a donated-buffer error.  The
    "xla" path does not donate and keeps ordinary value semantics.
    """
    coefs = update_coefs(p, materials)
    # vacuum has no conductivity: deposition is identically zero.  HOST
    # numpy, never a closed-over jax.Array (HLO-constant compile bloat +
    # the axon-tunnel lowering hazard, r3); the stripped backends read the
    # state-embedded sigma_c instead.
    import numpy as _np

    sigma = (
        _np.asarray(coefs.sigma_cells) if coefs.sigma_cells is not None else 0.0
    )
    dt_step = p.time_step

    lossy = not isinstance(coefs.ca_x, (int, float))

    if backend == "pallas_temporal" and lossy:
        # lossy temporal blocking with optional in-kernel SAR accumulation
        # (ops/pallas_temporal.py lossy kernel family, r3) — the heating
        # workload's fast path.  Odd trailing steps run the two-pass lossy
        # kernel with the per-step jnp SAR increment.
        import os as _os

        from .ops.pallas_temporal import (
            D as _D,
            crop_power_acc,
            embed_power_acc,
            jextend,
            jrestore,
            make_temporal_lossy_pair_step,
        )

        sgrp = (
            int(_os.environ.get("FDTD_TEMPORAL_STEPS", "0"))
            or default_temporal_s_lossy(p, accumulate_power)
        )
        group_step = make_temporal_lossy_pair_step(
            p, coefs, s=sgrp, accumulate_power=accumulate_power
        )
        nj = group_step.nj
        odd_step = make_step(p, coefs=coefs, backend="pallas_fused")
        K, J = p.maxk, p.maxj

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_groups_lossy(s, xs, power_acc=None):
            ts, amps = xs
            n = ts.shape[0]
            n_grp = n // sgrp
            if accumulate_power:
                acc_st = embed_power_acc(p, power_acc, nj)
            if n_grp:
                gts = (
                    ts[: sgrp * n_grp].reshape(n_grp, sgrp),
                    amps[: sgrp * n_grp].reshape(n_grp, sgrp),
                )
                s = jextend(p, s, nj)
                if accumulate_power:
                    def body2(carry, x):
                        return group_step(carry, x), None

                    (s, acc_st), _ = jax.lax.scan(body2, (s, acc_st), gts)
                else:
                    def body(s, x):
                        return group_step(s, x), None

                    s, _ = jax.lax.scan(body, s, gts)
                s = jrestore(p, s, nj)
            if accumulate_power:
                power_acc = crop_power_acc(p, acc_st, nj)
            for r in range(n % sgrp):
                idx = sgrp * n_grp + r
                s = odd_step(s, (ts[idx], amps[idx]))
                if accumulate_power:
                    sg = s.sigma_c[_D : _D + K, :J]
                    inc = diagnostics.power_deposition_stripped(p, s, sg)
                    power_acc = power_acc + (inc * dt_step).astype(power_acc.dtype)
            return s, power_acc

        return run_groups_lossy

    if backend == "pallas_stream":
        # streaming wavefront kernel (ops/pallas_stream.py): s=8 steps per
        # sweep at the traffic floor, zero recompute; optional in-kernel
        # SAR via a rolling accumulator band
        from .ops.pallas_stream import make_stream_pair_step
        from .ops.pallas_temporal import (
            D as _D,
            crop_power_acc,
            embed_power_acc,
            jextend,
            jrestore,
        )

        group_step = make_stream_pair_step(
            p, coefs, accumulate_power=accumulate_power
        )
        odd_step = make_step(p, coefs=coefs, backend="pallas_fused")
        sgrp = group_step.s
        njt = group_step.nj  # j-tiling for 512^3-class grids (r3)
        K, J = p.maxk, p.maxj

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_stream(s, xs, power_acc=None):
            ts, amps = xs
            n = ts.shape[0]
            n_grp = n // sgrp
            if accumulate_power:
                acc_st = embed_power_acc(p, power_acc, njt)
            if n_grp:
                gts = (
                    ts[: sgrp * n_grp].reshape(n_grp, sgrp),
                    amps[: sgrp * n_grp].reshape(n_grp, sgrp),
                )
                s = jextend(p, s, njt)
                if accumulate_power:
                    def body2(carry, x):
                        return group_step(carry, x), None

                    (s, acc_st), _ = jax.lax.scan(body2, (s, acc_st), gts)
                else:
                    def body(s, x):
                        return group_step(s, x), None

                    s, _ = jax.lax.scan(body, s, gts)
                s = jrestore(p, s, njt)
            if accumulate_power:
                power_acc = crop_power_acc(p, acc_st, njt)
            for r in range(n % sgrp):
                idx = sgrp * n_grp + r
                s = odd_step(s, (ts[idx], amps[idx]))
                if accumulate_power:
                    sg = s.sigma_c[_D : _D + K, :J]
                    inc = diagnostics.power_deposition_stripped(p, s, sg)
                    power_acc = power_acc + (inc * dt_step).astype(power_acc.dtype)
            return s, power_acc

        return run_stream

    if backend == "pallas_temporal":
        # two steps per HBM sweep (ops/pallas_temporal.py); odd trailing step
        # falls back to one two-pass step.  Uses the same StrippedState.
        if accumulate_power:
            raise NotImplementedError("power accumulation needs per-step states; use pallas_fused")
        import os as _os

        from .ops.pallas_temporal import (
            jextend,
            jrestore,
            make_temporal_pair_step,
            plan_nj,
        )

        sgrp = int(_os.environ.get("FDTD_TEMPORAL_STEPS", "0")) or default_temporal_s(p)
        group_step = make_temporal_pair_step(p, coefs, s=sgrp)
        nj = group_step.nj  # j-tiling chosen by the VMEM planner
        odd_step = make_step(p, coefs=coefs, backend="pallas_fused")

        # Donating the state halves steady-state HBM for the largest grids
        # (512^3 fp32 temporal needs ~11 GB live: 2x the j-extended pingpong
        # + the restore; an undonated input adds 3.4 GB and OOMs a 16 GB
        # v5e through the tunnel).  Callers pass prep(...)-fresh states.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_groups(s, xs, power_acc=None):
            ts, amps = xs
            n = ts.shape[0]
            n_grp = n // sgrp
            if n_grp:
                gts = (ts[: sgrp * n_grp].reshape(n_grp, sgrp), amps[: sgrp * n_grp].reshape(n_grp, sgrp))
                def body(s, x):
                    return group_step(s, x), None

                # j-extension round-trips once per chunk (two pads/slices of
                # the state), amortized over the whole scan.
                s = jextend(p, s, nj)
                s, _ = jax.lax.scan(body, s, gts)
                s = jrestore(p, s, nj)
            for r in range(n % sgrp):
                idx = sgrp * n_grp + r
                s = odd_step(s, (ts[idx], amps[idx]))
            return s, power_acc

        return run_groups

    step = make_step(p, materials, backend, coefs=coefs)
    _, restore = backend_adapters(p, backend)  # restore is materials-agnostic

    # Stripped-layout states are prep(...)-fresh per run: donate them so the
    # in-kernel aliasing actually runs in place at the HBM level too (a
    # 1024^3 bf16 state is 12.9 GB — an undonated copy cannot exist).  The
    # xla/canonical path keeps caller semantics (tests reuse raw states).
    donate = (0,) if backend in ("pallas", "pallas_fused") else ()

    if donate and _huge_state(p):
        # XLA's copy-insertion around aliased custom-calls in a while/scan
        # body is conservative: the scanned chunk double-buffers the carry
        # and OOMs when 2x the state exceeds HBM (measured at 1024^3 bf16:
        # scan RESOURCE_EXHAUSTED, single donated steps run at 14 Gcells/s).
        # Drive the same donated step from the host instead; dispatch is
        # negligible against a multi-GB-state step's device time.
        @functools.partial(jax.jit, donate_argnums=(0, 1) if accumulate_power else (0,))
        def one(s, acc, t, amp):
            s = step(s, (t, amp))
            if accumulate_power:
                if backend == "pallas_fused":
                    sg = _state_sigma(p, s, sigma)
                    inc = diagnostics.power_deposition_stripped(p, s, sg)
                else:
                    inc = diagnostics.power_deposition(p, restore(s), sigma)
                acc = acc + (inc * dt_step).astype(acc.dtype)
            return s, acc

        def run_host(s, xs, power_acc=None):
            import numpy as _np

            ts, amps = _np.asarray(xs[0]), _np.asarray(xs[1])
            for i in range(ts.shape[0]):
                s, power_acc = one(s, power_acc, ts[i], amps[i])
            return s, power_acc

        return run_host

    @functools.partial(jax.jit, donate_argnums=donate)
    def run(s, xs, power_acc=None):
        def body(carry, x):
            s, acc = carry
            s = step(s, x)
            if accumulate_power:
                # The accumulator stays fp32 whatever the field dtype.  The
                # stripped-layout backends read their E bulks directly —
                # no per-step full layout restore (VERDICT r1 weak #7).
                if backend == "pallas_fused":
                    sg = _state_sigma(p, s, sigma)
                    inc = diagnostics.power_deposition_stripped(p, s, sg)
                else:
                    inc = diagnostics.power_deposition(p, restore(s), sigma)
                acc = acc + (inc * dt_step).astype(acc.dtype)
            return (s, acc), None

        (s, acc), _ = jax.lax.scan(body, (s, power_acc), xs)
        return s, acc

    return run


def _state_sigma(p: Params, s, sigma_np):
    """Cell sigma for the stripped power path: the state-embedded slab when
    present (no HLO constant), else the host-precomputed array."""
    from .ops.pallas_fused import D as _D

    if getattr(s, "sigma_c", None) is not None:
        return s.sigma_c[_D : _D + p.maxk, : p.maxj]
    return sigma_np


def zero_power_acc(p: Params):
    return jnp.zeros((p.maxk, p.maxj, p.maxi), dtype=jnp.float32)


def backend_adapters(p: Params, backend: str, materials: Materials | None = None):
    """(prepare, restore) between the canonical FieldState layout and the
    backend's hot-path layout.

    For lossy media on the fast path, the embedded coefficient arrays ride
    in the prepared state (pass ``materials`` so prepare can build them)."""
    if backend == "pallas":
        from .ops.pallas_step import pad_state_k

        K1 = p.padded_shape[0]
        return (lambda s: pad_state_k(p, s)), (
            lambda s: jax.tree.map(lambda a: a[:K1], s)
        )
    if backend in ("pallas_fused", "pallas_temporal", "pallas_stream"):
        from .ops.pallas_fused import to_full, to_stripped

        coefs = update_coefs(p, materials) if materials is not None else None
        return (lambda s: to_stripped(p, s, coefs=coefs)), (lambda s: to_full(p, s))
    return (lambda s: s), (lambda s: s)
