#!/usr/bin/env python
"""On-device spot check: lossy (+SAR) fast kernel vs two-pass at n^3.

Usage: python tools/spot_lossy.py [n] [steps] [s]
Env: FDTD_SPOT_BACKEND=pallas_temporal|pallas_stream (default temporal)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from fdtd_tpu.params import Mode, Params, SourceConfig, time_values
from fdtd_tpu.state import water_block, zeros
from fdtd_tpu.step import (
    backend_adapters,
    make_chunk_runner,
    scan_inputs,
    zero_power_acc,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 13
if len(sys.argv) > 3:
    os.environ["FDTD_TEMPORAL_STEPS"] = sys.argv[3]

dx = 0.001
p = Params(length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
           time_step=1e-12, simulation_time=steps * 1e-12,
           sampling_rate=10**9, mode=Mode.COMPUTATION, dtype="float32",
           source=SourceConfig())
blk = os.environ.get("FDTD_SPOT_BLOCK")  # "lo,hi" fractions
if blk:
    lo_f, hi_f = (float(x) for x in blk.split(","))
    mats = water_block(p, lo=(lo_f,) * 3, hi=(hi_f,) * 3)
else:
    mats = water_block(p)
xs = scan_inputs(p, time_values(p)[:steps])
prep, rest = backend_adapters(p, "pallas_fused", mats)

cases = (True,) if os.environ.get("FDTD_SPOT_SAR_ONLY") else (False, True)
for sar in cases:
    acc0 = zero_power_acc(p) if sar else None
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused", accumulate_power=sar)
    want, acc_w = run_ref(jax.block_until_ready(prep(zeros(p))), xs, acc0)
    spot_backend = os.environ.get("FDTD_SPOT_BACKEND", "pallas_temporal")
    run_tmp = make_chunk_runner(p, mats, backend=spot_backend, accumulate_power=sar)
    got, acc_g = run_tmp(jax.block_until_ready(prep(zeros(p))), xs, acc0)
    wantf, gotf = rest(want), rest(got)
    worst = 0.0
    for c in ("ex", "ey", "ez", "hx", "hy", "hz"):
        d = float(np.abs(np.asarray(getattr(gotf, c)) - np.asarray(getattr(wantf, c))).max())
        worst = max(worst, d)
    line = f"sar={sar}: worst field |diff| = {worst:.3e}"
    if sar:
        aw, ag = np.asarray(acc_w), np.asarray(acc_g)
        rel = float(np.abs(ag - aw).max() / max(np.abs(aw).max(), 1e-300))
        line += f"  acc max rel diff = {rel:.3e}  acc max = {aw.max():.3e}"
    print(line, flush=True)
