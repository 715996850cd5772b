"""Simulation orchestration: snapshot cadence, diagnostics, checkpoints.

Replicates the reference driver's observable behavior (reference:
propagate_fields, main.c:755-799): an initial snapshot at iteration 1
*before* the loop, then one snapshot after every step whose 1-based index is
a multiple of ``sampling_rate`` — with params.txt's rate=2 that yields files
0001, 0002, 0004, ... (SURVEY section 2.4 item 8).  Steps between snapshots
run as one jitted ``lax.scan`` chunk; snapshot encoding is asynchronous
(:mod:`fdtd_tpu.io.snapshots`).

Extensions over the reference: JSONL energy/diagnostic logging, optional
SAR/power-deposition accumulation, checkpoint/resume.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp

from . import diagnostics
from .io.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .io.snapshots import SnapshotWriter, aggregate_all, validation_extras
from .params import Mode, Params, time_values
from .state import FieldState, Materials, init_validation, zeros
from .step import backend_adapters, make_chunk_runner, scan_inputs, zero_power_acc


@dataclasses.dataclass
class RunResult:
    state: FieldState
    iterations: int
    wall_seconds: float
    mcells_per_s: float
    power_j: jax.Array | None = None


def initial_state(p: Params) -> FieldState:
    return init_validation(p) if p.mode == Mode.VALIDATION else zeros(p)


def resolve_backend(
    p: Params,
    backend: str,
    materials: Materials | None,
    accumulate_power: bool,
    log: Callable[[str], None] = print,
) -> str:
    """Fall back from unsupported backend/feature combinations with a notice.

    pallas_temporal is vacuum-only (fp32 or bf16) and cannot accumulate
    per-step power (it advances several steps per HBM sweep); such runs use
    pallas_fused, which supports lossy media and SAR.  Heterogeneous mu_r
    needs the per-component H factors only the xla backend applies.
    """
    if (
        backend != "xla"
        and materials is not None
        and getattr(materials, "mu_r", None) is not None
    ):
        log(
            "notice: heterogeneous mu_r is only supported on the xla "
            "backend; falling back from "
            f"{backend}"
        )
        return "xla"
    if backend == "pallas_temporal":
        from .ops.pallas_temporal import supported
        from .state import update_coefs as _uc

        if accumulate_power:
            log(
                "notice: pallas_temporal cannot accumulate per-step power "
                "(--sar); falling back to pallas_fused"
            )
            return "pallas_fused"
        if not supported(p, _uc(p, materials)):
            log(
                "notice: temporal blocking unsupported for this config "
                "(needs vacuum and a VMEM-feasible tiling); falling back to "
                "pallas_fused"
            )
            return "pallas_fused"
    return backend


def parse_shard_spec(spec: str) -> tuple[int, int]:
    """'4' -> (4, 1) z-slabs; '4x2' -> (4, 2) z*y decomposition.

    The CLI analogue of the reference's ``mpirun -np N ./microwave``
    (description.pdf section 2.2): the grid shards over devices instead of
    ranks.  i-axis (third factor) sharding is API-only
    (``parallel.sharded_step``); the Pallas fast paths shard (z, y).
    """
    parts = str(spec).lower().split("x")
    try:
        dims_ = [int(x) for x in parts]
    except ValueError:
        raise ValueError(f"bad --shard spec {spec!r}: use e.g. 4 or 4x2")
    if not 1 <= len(dims_) <= 2 or any(d < 1 for d in dims_):
        raise ValueError(f"bad --shard spec {spec!r}: use e.g. 4 or 4x2")
    nz = dims_[0]
    ny = dims_[1] if len(dims_) > 1 else 1
    return nz, ny


def _sharded_chunk_runner(p: Params, shard, materials: Materials | None,
                          accumulate_power: bool = False):
    """(prep, restore, run_chunk) running chunks on a (nz, ny) device mesh
    through the Pallas-in-shard_map fast paths.

    With ``accumulate_power`` (1-D z meshes): the SAR accumulator is kept
    sharded across chunks' scan, converted to/from the runner's canonical
    (maxk, maxj, maxi) layout at chunk boundaries (checkpoint-compatible
    with single-chip runs)."""
    from .parallel import sharded_fast as sf
    from .parallel.mesh import make_mesh
    from .state import update_coefs

    nz, ny = parse_shard_spec(shard)
    n = nz * ny
    devs = jax.devices()
    if len(devs) < n:
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(
            f"--shard {shard} needs {n} devices; {len(devs)} available"
        )
    mesh = make_mesh(n, (nz, ny, 1), devices=devs[:n])
    coefs = update_coefs(p, materials) if materials is not None else None
    if ny == 1:
        prep = lambda s: sf.to_sharded_fast(p, s, mesh, coefs=coefs)
        restore = lambda st: sf.from_sharded_fast(p, st, mesh)
        run_sh = sf.make_sharded_fast_runner(
            p, mesh, materials=materials, accumulate_power=accumulate_power
        )
    else:
        prep = lambda s: sf.to_sharded_fast_2d(p, s, mesh, coefs=coefs)
        restore = lambda st: sf.from_sharded_fast_2d(p, st, mesh)
        run_sh = sf.make_sharded_fast_2d_runner(
            p, mesh, materials=materials, accumulate_power=accumulate_power
        )

    if accumulate_power:
        from jax.sharding import NamedSharding, PartitionSpec as P

        K, J = p.maxk, p.maxj
        if ny == 1:
            _, _, _, _, Klp, _ = sf._geometry(p, nz)
            Jlp = J
        else:
            _, _, _, _, _, Klp, _, Jlp, _ = sf._geometry2d(p, nz, ny)
        acc_sh = NamedSharding(mesh, P("z", "y" if ny > 1 else None, None))

        def run_chunk(st, chunk, power):
            acc = jax.device_put(
                jnp.pad(
                    jnp.asarray(power),
                    ((0, nz * Klp - K), (0, ny * Jlp - J), (0, 0)),
                ),
                acc_sh,
            )
            st, acc = run_sh(st, chunk, acc)
            return st, acc[:K, :J]

        return prep, restore, run_chunk

    def run_chunk(st, chunk, power):
        return run_sh(st, chunk), power

    return prep, restore, run_chunk


def run_simulation(
    p: Params,
    out_dir: str = "r",
    materials: Materials | None = None,
    backend: str = "xla",
    write_snapshots: bool = True,
    accumulate_power: bool = False,
    checkpoint_every: int = 0,
    resume: bool = False,
    quirk_compat: bool = True,
    log: Callable[[str], None] = print,
    diagnostics_log: str | None = None,
    shard: str | None = None,
) -> RunResult:
    p.validate()
    ts = time_values(p)
    xs_t, xs_a = scan_inputs(p, ts)
    if shard is not None:
        # multi-device spatial decomposition (the reference MPI branch's
        # CLI story, description.pdf section 2.2); see parse_shard_spec
        if accumulate_power and materials is None:
            raise ValueError("--sar needs lossy materials (e.g. --water-block)")
        if materials is not None and getattr(materials, "mu_r", None) is not None:
            raise ValueError(
                "heterogeneous mu_r is xla-backend-only and cannot shard"
            )
        if backend not in ("xla", "pallas_fused"):
            log(f"notice: --shard uses the sharded fast path; --backend "
                f"{backend} ignored")
        sh_prep, sh_restore, run_chunk = _sharded_chunk_runner(
            p, shard, materials, accumulate_power
        )
    else:
        backend = resolve_backend(p, backend, materials, accumulate_power, log)
        run_chunk = make_chunk_runner(p, materials, backend, accumulate_power)

    state = initial_state(p)
    power = zero_power_acc(p) if accumulate_power else None
    start_step = 0

    if resume:
        ck = latest_checkpoint(out_dir)
        if ck:
            state, it_done, _t, ck_power = load_checkpoint(ck, p)
            start_step = it_done
            if accumulate_power:
                if ck_power is not None:
                    power = ck_power
                else:
                    log(
                        "WARNING: checkpoint has no power accumulator; "
                        "--sar totals restart from zero at this point"
                    )
            log(f"Resuming from {ck} (after step {it_done})")

    # hot-path layout conversion (identity for the xla backend)
    if shard is not None:
        prep, restore = sh_prep, sh_restore
    else:
        prep, restore = backend_adapters(p, backend, materials)
    state = prep(state)

    if checkpoint_every:
        os.makedirs(out_dir, exist_ok=True)
    writer = SnapshotWriter(p, out_dir) if write_snapshots else None
    diag_f = open(diagnostics_log, "a") if diagnostics_log else None

    def snapshot(s: FieldState, iteration: int, t: float):
        if writer is None:
            return
        variables = aggregate_all(p, s)
        if p.mode == Mode.VALIDATION:
            variables.update(validation_extras(p, s, t, quirk_compat=quirk_compat))
        writer.submit(variables, iteration, t)

    def log_diag(s: FieldState, iteration: int, t: float):
        if diag_f is None:
            return
        e = float(diagnostics.e_energy(p, s))
        h = float(diagnostics.h_energy(p, s))
        diag_f.write(
            json.dumps(
                {"iteration": iteration, "t": t, "E_energy": e, "H_energy": h, "total": e + h}
            )
            + "\n"
        )
        # failure detection: a CFL-unstable or NaN run is caught at the next
        # sample instead of burning the remaining schedule (the reference
        # required killing runs by hand, description.pdf section 3.1)
        if not math.isfinite(e + h):
            diag_f.flush()
            raise RuntimeError(
                f"simulation diverged (non-finite energy) at iteration {iteration}; "
                f"last state checkpointed snapshots are in {out_dir!r}"
            )

    n = len(ts)
    rate = max(1, p.sampling_rate)

    if start_step == 0:
        # Initial snapshot at iteration 1 (reference: main.c:758-764).
        snapshot(restore(state), 1, 0.0)
        log_diag(restore(state), 0, 0.0)

    t0 = time.perf_counter()
    pos = start_step
    next_mult = lambda x, m: ((x // m) + 1) * m
    while pos < n:
        # next snapshot boundary: smallest multiple of rate > pos (1-based
        # steps); checkpoint boundaries are independent of the snapshot
        # cadence, so e.g. --checkpoint-every 15 with rate 10 checkpoints at
        # 15, 30, 45, ... (not only at common multiples)
        boundary = next_mult(pos, rate)
        if checkpoint_every:
            boundary = min(boundary, next_mult(pos, checkpoint_every))
        end = min(boundary, n)
        chunk = (xs_t[pos:end], xs_a[pos:end])
        state, power = run_chunk(state, chunk, power)
        pos = end
        t_now = float(ts[pos - 1])
        if pos % rate == 0 or (checkpoint_every and pos % checkpoint_every == 0):
            full = restore(state)
        if pos % rate == 0:
            snapshot(full, pos, t_now)
            log_diag(full, pos, t_now)
        if checkpoint_every and pos % checkpoint_every == 0:
            jax.block_until_ready(full.ex)
            save_checkpoint(
                os.path.join(out_dir, f"ckpt{pos:06d}.npz"), full, pos, t_now,
                power=power,
            )

    state = restore(state)
    jax.block_until_ready(state.ex)
    wall = time.perf_counter() - t0

    if writer is not None:
        writer.close()
    if diag_f is not None:
        diag_f.close()

    steps_done = n - start_step
    mcells = p.cell_count * steps_done / wall / 1e6 if wall > 0 else float("inf")
    return RunResult(state, n, wall, mcells, power)
