#!/usr/bin/env python
"""Measure the --pml fast-path tax and attribute it (VERDICT r3 #7).

Rows (256^3 fp32, computation mode, 10-cell CPML, device-only timing —
single-element materialization, bench.py methodology):

1. ``twopass``: the closed-cavity two-pass kernels alone (the rate the
   PML composition is built from — DESIGN.md row: ~8 G).
2. ``pml``: the shipped composition (two Pallas passes + 12 psi slab
   corrections as XLA updates between them, `ops/cpml_fast.py`).
3. ``xla_pml``: the reference jnp CPML scan (`ops/cpml.py`) for scale.

The gap between 1 and 2 is the psi-correction tax; if it is >> the
correction's slab-volume traffic share (~22% at 256^3/10 cells), the
at[].add slab updates are lowering badly (scatter instead of fused
dynamic-update-slice) and a rewrite is warranted.

Usage: python tools/probe_pml.py [n] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from fdtd_tpu.ops.cpml import PMLConfig, init_psi, make_pml_chunk_runner
from fdtd_tpu.ops.cpml_fast import make_pml_fast_chunk_runner
from fdtd_tpu.ops.pallas_fused import stripped_zeros
from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.state import zeros
from fdtd_tpu.step import backend_adapters, make_chunk_runner, scan_inputs


def _params(n, steps, dtype="float32"):
    dx = 0.001
    return Params(
        length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
        time_step=1e-12, simulation_time=(steps - 0.5) * 1e-12,
        sampling_rate=10**9, mode=Mode.COMPUTATION, dtype=dtype,
        source=SourceConfig(),
    )


def _time(n, steps, make_state, run_once, reps=3):
    out = run_once(make_state(), 0.0)
    _ = float(np.asarray(out.ravel()[12345]))
    best = float("inf")
    for rep in range(reps):
        st = make_state()
        t0 = time.perf_counter()
        out = run_once(st, 1e-7 * (rep + 1))
        _ = float(np.asarray(out.ravel()[12345]))
        best = min(best, time.perf_counter() - t0)
    return n**3 * steps / best / 1e9, best * 1000 / steps


def row_twopass(n, steps):
    p = _params(n, steps)
    run = make_chunk_runner(p, backend="pallas_fused")
    xs = scan_inputs(p, np.arange(steps) * p.time_step)
    build = jax.jit(lambda: stripped_zeros(p))

    def run_once(st, eps):
        st, _ = run(st, (xs[0], xs[1] + eps), None)
        return st.ex

    return _time(n, steps, lambda: jax.block_until_ready(build()), run_once)


def row_pml(n, steps):
    p = _params(n, steps)
    cfg = PMLConfig(cells=10)
    run = make_pml_fast_chunk_runner(p, cfg, None, False)
    prep, _ = backend_adapters(p, "pallas_fused")
    xs = scan_inputs(p, np.arange(steps) * p.time_step)

    def make_state():
        return jax.block_until_ready((prep(zeros(p)), init_psi(p, cfg)))

    def run_once(carry, eps):
        carry, _ = run(carry, (xs[0], xs[1] + eps), None)
        return carry[0].ex

    return _time(n, steps, make_state, run_once)


def row_kernel(n, steps):
    from fdtd_tpu.ops.cpml_kernel import (
        make_pml_kernel_chunk_runner,
        pack_psi,
    )

    p = _params(n, steps)
    cfg = PMLConfig(cells=10)
    run = make_pml_kernel_chunk_runner(p, cfg, None, False)
    prep, _ = backend_adapters(p, "pallas_fused")
    xs = scan_inputs(p, np.arange(steps) * p.time_step)

    def make_state():
        return jax.block_until_ready(
            (prep(zeros(p)), pack_psi(p, cfg, None)))

    def run_once(carry, eps):
        carry, _ = run(carry, (xs[0], xs[1] + eps), None)
        return carry[0].ex

    return _time(n, steps, make_state, run_once)


def row_stream(n, steps):
    from fdtd_tpu.ops.pallas_stream_pml import (
        make_stream_pml_chunk_runner,
        pack_psi_stream,
        pick_pml_stream_s,
    )

    p = _params(n, steps)
    cfg = PMLConfig(cells=10)
    s = pick_pml_stream_s(p, cfg)
    if os.environ.get("FDTD_STREAM_PML_S"):
        s = int(os.environ["FDTD_STREAM_PML_S"])
    print(f"  (stream plan s={s})", flush=True)
    run = make_stream_pml_chunk_runner(p, cfg, None, s=s)
    prep, _ = backend_adapters(p, "pallas_fused")
    xs = scan_inputs(p, np.arange(steps) * p.time_step)

    def make_state():
        return jax.block_until_ready(
            (prep(zeros(p)), pack_psi_stream(p, cfg, None)))

    def run_once(carry, eps):
        carry, _ = run(carry, (xs[0], xs[1] + eps), None)
        return carry[0].ex

    return _time(n, steps, make_state, run_once)


def row_xla_pml(n, steps):
    p = _params(n, steps)
    cfg = PMLConfig(cells=10)
    run = make_pml_chunk_runner(p, cfg, None, False)
    xs = scan_inputs(p, np.arange(steps) * p.time_step)

    def make_state():
        return jax.block_until_ready((zeros(p), init_psi(p, cfg)))

    def run_once(carry, eps):
        carry, _ = run(carry, (xs[0], xs[1] + eps), None)
        return carry[0].ex

    return _time(n, steps, make_state, run_once)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    sel = sys.argv[3] if len(sys.argv) > 3 else None
    for name, fn in (("twopass", row_twopass), ("pml", row_pml),
                     ("kernel", row_kernel), ("stream", row_stream),
                     ("xla_pml", row_xla_pml)):
        if sel is not None and sel not in name:
            continue
        try:
            g, ms = fn(n, steps)
            print(f"{name:10s} {g:6.2f} Gcells/s  ({ms:.3f} ms/step)",
                  flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
