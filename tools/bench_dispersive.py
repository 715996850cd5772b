#!/usr/bin/env python
"""Dispersive (ADE Debye) heating benchmark: 256^3 water load (+SAR).

The physically correct heating chain (--dispersive --sar) on the Pallas
tier (r4, VERDICT r3 #1): streaming ADE sweep when the VMEM plan closes,
else the two-pass ADE kernels.  The r3 baseline for this workload was
the ~2.4 G-class xla ADE scan.

Usage: python tools/bench_dispersive.py [n] [steps]
Env: FDTD_DISP_DTYPE (default bfloat16), FDTD_DISP_SAR=1,
FDTD_DISP_BACKEND (default auto: stream when feasible).
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
from fdtd_tpu.ops.dispersive import water_debye_load
from fdtd_tpu.ops.pallas_dispersive import (
    make_ade_state,
    make_dispersive_chunk_runner_fast,
    pick_ade_plan,
)
from fdtd_tpu.ops.pallas_fused import stripped_zeros
from fdtd_tpu.step import scan_inputs, zero_power_acc

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 240
dtype = os.environ.get("FDTD_DISP_DTYPE", "bfloat16")
sar = bool(os.environ.get("FDTD_DISP_SAR"))
backend = os.environ.get("FDTD_DISP_BACKEND", "auto")

dx = 0.001
p = Params(length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
           time_step=1e-12, simulation_time=steps * 1e-12,
           sampling_rate=10**9, mode=Mode.COMPUTATION, dtype=dtype,
           source=SourceConfig())
dm = water_debye_load(p, sigma_ion25=0.3)
plan = pick_ade_plan(p, sar=sar)
print(f"plan: {plan}", flush=True)
run = make_dispersive_chunk_runner_fast(p, dm, accumulate_power=sar,
                                        backend=backend)

ts = np.arange(steps, dtype=np.float64) * p.time_step
xs = scan_inputs(p, ts)

# The 18+ embedded coefficient maps are ~GBs of host->device transfer
# (minutes through the axon tunnel), so build the AdeState ONCE; the
# donating runner passes the constant maps through unchanged, and each
# rep rebuilds only the (tiny to build) zero fields/P from the RETURNED
# AdeState's live coefficient buffers.
import dataclasses


def fresh_carry(prev_ade):
    st = jax.jit(lambda: stripped_zeros(p))()
    z = jax.jit(lambda a: a * 0)(prev_ade.px)
    ade = dataclasses.replace(
        prev_ade, px=z,
        py=jax.jit(lambda a: a * 0)(prev_ade.py),
        pz=jax.jit(lambda a: a * 0)(prev_ade.pz),
    )
    return jax.block_until_ready((st, ade))


acc0 = (lambda: zero_power_acc(p)) if sar else (lambda: None)
carry0 = (jax.jit(lambda: stripped_zeros(p))(), make_ade_state(p, dm, sar))
jax.block_until_ready(carry0[0])
out, _ = run(carry0, xs, acc0())
_ = float(np.asarray(out[0].ex.ravel()[12345]))

best = float("inf")
for rep in range(3):
    xs_u = (xs[0], xs[1] + 1e-7 * (rep + 1))
    carry = fresh_carry(out[1])
    t0 = time.perf_counter()
    out, acc = run(carry, xs_u, acc0())
    _ = float(np.asarray(out[0].ex.ravel()[12345]))
    best = min(best, time.perf_counter() - t0)

g = n**3 * steps / best / 1e9
tag = "+SAR" if sar else ""
print(f"dispersive{tag} {n}^3 {dtype} [plan {plan}]: {g:6.2f} Gcells/s "
      f"({best * 1000 / steps:.4f} ms/step)", flush=True)
