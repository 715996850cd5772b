#!/usr/bin/env python
"""Heating-workload benchmark: 256^3 water load, lossy E-update (+SAR).

The reference can't run this scene at all (vacuum-only scalar MU/EPSILON,
main.c:441,479); this measures the framework's namesake workload
(BASELINE configs #2/#3) on the real chip.

Usage: python tools/bench_heating.py [n] [steps]
Env: FDTD_HEAT_BACKEND (default auto), FDTD_HEAT_DTYPE (default bfloat16 —
the documented heating/serving dtype), FDTD_HEAT_SAR=1 for in-kernel
sigma*|E|^2*dt accumulation, FDTD_HEAT_FERRITE=1 to add a mu_r=4 shelf
(heterogeneous mu on the streaming kernel, r3).

Prints one line per config: backend, Gcells/s, ms/step.
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

from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.runner import resolve_backend
from fdtd_tpu.state import ferrite_slab, water_block, zeros
from fdtd_tpu.step import (
    backend_adapters,
    make_chunk_runner,
    scan_inputs,
    zero_power_acc,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 240
dtype = os.environ.get("FDTD_HEAT_DTYPE", "bfloat16")
sar = bool(os.environ.get("FDTD_HEAT_SAR"))
backend = os.environ.get("FDTD_HEAT_BACKEND", "auto")

dx = 0.001
p = Params(length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
           time_step=1e-12, simulation_time=steps * 1e-12,
           sampling_rate=10**9, mode=Mode.COMPUTATION, dtype=dtype,
           source=SourceConfig())
mats = water_block(p)
ferrite = bool(os.environ.get("FDTD_HEAT_FERRITE"))
if ferrite:
    mats = ferrite_slab(p, base=mats)
backend = resolve_backend(p, backend, mats, sar)
run = make_chunk_runner(p, mats, backend=backend, accumulate_power=sar)
prep, _ = backend_adapters(p, backend, mats)

ts = np.arange(steps, dtype=np.float64) * p.time_step
xs = scan_inputs(p, ts)


def make_state():
    return jax.block_until_ready(prep(zeros(p)))


acc0 = (lambda: zero_power_acc(p)) if sar else (lambda: None)
out, _ = run(make_state(), xs, acc0())
_ = float(np.asarray(out.ex.ravel()[12345]))  # force through the tunnel

best = float("inf")
for rep in range(3):
    xs_u = (xs[0], xs[1] + 1e-7 * (rep + 1))
    st = make_state()
    t0 = time.perf_counter()
    out, acc = run(st, xs_u, acc0())
    _ = float(np.asarray(out.ex.ravel()[12345]))
    best = min(best, time.perf_counter() - t0)

g = n**3 * steps / best / 1e9
tag = ("+SAR" if sar else "") + ("+ferrite" if ferrite else "")
print(f"heating{tag} {n}^3 {dtype} [{backend}]: {g:6.2f} Gcells/s "
      f"({best * 1000 / steps:.4f} ms/step)", flush=True)
