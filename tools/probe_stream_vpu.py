#!/usr/bin/env python
"""Attribute the bf16 streaming kernel's ~346 GB/s ceiling (VERDICT r3 #4).

DESIGN.md's in-place streaming row measures 256^3 bf16 at 57.7 G (346
GB/s effective, ~42% of the ~820 GB/s peak and well under the two-pass
kernels' demonstrated ~600 GB/s DMA rate) while fp32 sits at 556 GB/s —
so the bf16 residual is VPU, and the question is *which* VPU work:

1. ``base``: the shipped in-place streaming kernel, bf16 + fp32 at s=8 —
   reproduces the DESIGN.md row on this chip/day.
2. ``unmasked``: the same kernel with ``_PROBE_UNMASKED`` set — every
   update mask (broadcast AND + select per component per level) removed.
   WRONG numerics (padding/PEC rows corrupt), identical DMA pattern and
   stencil arithmetic: the rate gap is the mask share of the VPU budget,
   i.e. the ceiling for any mask-hoisting/folding rework.
3. ``s4``: bf16 forced to the s=4 full-plane plan — per-step HBM traffic
   DOUBLES vs s=8.  If the s=8 rate is ~the s=4 rate, DMA is not the
   binding resource at s=8 (VPU is); if s=8 is ~2x s=4, it's DMA-bound.

Usage: python tools/probe_stream_vpu.py [n] [row-substring] (default
256, all rows; vacuum computation mode, the aux-bf16 headline config).
Pass a row-substring to run a single row — shared tunnel clients
degrade multi-row processes (see bench.py), so clean absolute numbers
come from one row per process:

    for r in "base bf16 s=8" "unmasked bf16 s=8" "base bf16 s=4"; do
        python tools/probe_stream_vpu.py 256 "$r"; done
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

from fdtd_tpu.ops import pallas_stream
from fdtd_tpu.ops.pallas_fused import stripped_zeros
from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.step import make_chunk_runner, scan_inputs


def rate(n, steps, dtype, s=None, unmasked=False):
    dx = 0.001
    p = Params(
        length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
        time_step=1e-12, simulation_time=steps * 1e-12,
        sampling_rate=10**9, mode=Mode.COMPUTATION, dtype=dtype,
        source=SourceConfig(),
    )
    pallas_stream._PROBE_UNMASKED = unmasked
    if s is not None:
        os.environ["FDTD_STREAM_S"] = str(s)
    else:
        os.environ.pop("FDTD_STREAM_S", None)
    try:
        run = make_chunk_runner(p, backend="pallas_stream")
        xs = scan_inputs(p, np.arange(steps, dtype=np.float64) * p.time_step)
        build = jax.jit(lambda: stripped_zeros(p))
        out, _ = run(jax.block_until_ready(build()), xs, None)
        _ = float(np.asarray(out.ex.ravel()[12345]))
        best = float("inf")
        for rep in range(3):
            st = jax.block_until_ready(build())
            xs_u = (xs[0], xs[1] + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            out, _ = run(st, xs_u, None)
            _ = float(np.asarray(out.ex.ravel()[12345]))
            best = min(best, time.perf_counter() - t0)
        return n**3 * steps / best / 1e9
    finally:
        pallas_stream._PROBE_UNMASKED = False
        os.environ.pop("FDTD_STREAM_S", None)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sel = sys.argv[2] if len(sys.argv) > 2 else None
    steps = 240
    bpc = {"bfloat16": 6, "float32": 12}  # in-place B/cell/step at s=8
    for name, kw in (
        ("base bf16 s=8", dict(dtype="bfloat16")),
        ("unmasked bf16 s=8", dict(dtype="bfloat16", unmasked=True)),
        ("base bf16 s=4", dict(dtype="bfloat16", s=4)),
        ("unmasked bf16 s=4", dict(dtype="bfloat16", s=4, unmasked=True)),
        ("base fp32 s=8", dict(dtype="float32")),
        ("unmasked fp32 s=8", dict(dtype="float32", unmasked=True)),
    ):
        if sel is not None and sel not in name:
            continue
        try:
            g = rate(n, steps, **kw)
            scale = 2 if kw.get("s") == 4 else 1
            eff = g * bpc[kw["dtype"]] * scale
            print(f"{name:22s} {g:6.1f} Gcells/s  (~{eff:5.0f} GB/s eff)",
                  flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
