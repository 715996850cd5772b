#!/usr/bin/env python
"""Attribute the temporal kernel's ~340 GB/s plateau (VERDICT r2 next #3).

Runs three experiments on the real TPU at 256^3:

1. ``temporal``: the shipped s-step kernel at s in {4, 5, 6} (fp32) and
   s=4 (bf16) — reproduces the plateau with one number per config.
2. ``copyonly``: a kernel with the *identical* overlapped Element-window
   BlockSpecs and output pattern, whose body just copies window rows to the
   outputs (minimal VPU).  Its rate is the DMA/pipeline ceiling for this
   fetch pattern: if it also plateaus near 340 GB/s, the windows themselves
   (overlapped deep-halo refetch) are the bound, not the VPU math.
3. ``blocked``: a copy kernel with non-overlapped Blocked windows (the
   two-pass kernels' pattern, known to sustain ~600 GB/s) on the same
   arrays — the machine ceiling reference point.

Usage: python tools/probe_temporal.py [n]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fdtd_tpu.ops.pallas_fused import D
from fdtd_tpu.ops.pallas_temporal import TKT, VMEM_BUDGET


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[1234])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[1234])
        best = min(best, time.perf_counter() - t0)
    return best


def copy_probe(S, J1, Ib, s, dtype, overlapped=True, n_in=6, reps=20):
    """One sweep of the temporal window pattern, body = copy."""
    tk = TKT
    ofs = D // tk
    nk = (S - D) // tk

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        for i, o in enumerate(outs):
            w = ins[i][:]
            o[:] = w[s : s + tk] if overlapped else w

    if overlapped:
        e_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s, (0, s)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [e_win] * n_in
    else:
        blk_in = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0),
                              memory_space=pltpu.VMEM)
        in_specs = [blk_in] * n_in
    out_spec = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    call = pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=in_specs,
        out_specs=[out_spec] * n_in,
        out_shape=(shape,) * n_in,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
    )
    f = jax.jit(lambda *a: call(*a))
    item = jnp.dtype(dtype).itemsize
    key = jax.random.key(0)
    arrs = [jax.random.normal(jax.random.fold_in(key, i), (S, J1, Ib)).astype(dtype)
            for i in range(n_in)]
    wall = timeit(f, *arrs, reps=reps)
    rows_in = n_in * (tk + 2 * s if overlapped else tk) * nk
    rows_out = n_in * tk * nk
    gb = (rows_in + rows_out) * J1 * Ib * item / 1e9
    return wall, gb / wall


def temporal_rate(n, s, dtype, steps=240):
    from fdtd_tpu.params import Mode, Params, SourceConfig
    from fdtd_tpu.step import make_chunk_runner, scan_inputs

    dx = 0.001
    p = Params(length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
               time_step=1e-12, simulation_time=steps * 1e-12,
               sampling_rate=10**9, mode=Mode.COMPUTATION, dtype=dtype,
               source=SourceConfig())
    os.environ["FDTD_TEMPORAL_STEPS"] = str(s)
    try:
        run = make_chunk_runner(p, backend="pallas_temporal")
    finally:
        del os.environ["FDTD_TEMPORAL_STEPS"]
    from fdtd_tpu.ops.pallas_fused import stripped_zeros

    build = jax.jit(lambda: stripped_zeros(p))
    ts = np.arange(steps, dtype=np.float64) * p.time_step
    xs = scan_inputs(p, ts)
    out, _ = run(jax.block_until_ready(build()), xs, None)
    _ = float(np.asarray(out.ex.ravel()[12345]))
    best = float("inf")
    for rep in range(3):
        xs_u = (xs[0], xs[1] + 1e-7 * (rep + 1))
        st = jax.block_until_ready(build())
        t0 = time.perf_counter()
        out, _ = run(st, xs_u, None)
        _ = float(np.asarray(out.ex.ravel()[12345]))
        best = min(best, time.perf_counter() - t0)
    gcells = n**3 * steps / best / 1e9
    # effective traffic: in windows 3(tk+2s)+3(tk+2s-1), out 6*tk per tile
    item = jnp.dtype(dtype).itemsize
    bpc = (6 * TKT + 6 * TKT + 12 * s - 3) / (TKT * s) * item  # per cell-step
    return gcells, gcells * bpc

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S, J1, Ib = n + 2 * D, n, n
    print(f"device: {jax.devices()[0]}", flush=True)
    for dtype in ("float32", "bfloat16"):
        for s in (4, 6):
            wall, bw = copy_probe(S, J1, Ib, s, dtype, overlapped=True)
            print(f"copy-ovl  {dtype} s={s}: {wall*1e3:6.2f} ms/sweep  {bw:5.0f} GB/s",
                  flush=True)
        wall, bw = copy_probe(S, J1, Ib, 0, dtype, overlapped=False)
        print(f"copy-blk  {dtype}:      {wall*1e3:6.2f} ms/sweep  {bw:5.0f} GB/s",
              flush=True)
    for dtype, ss in (("float32", (4, 6)), ("bfloat16", (4,))):
        for s in ss:
            g, bw = temporal_rate(n, s, dtype, steps=120)
            print(f"temporal  {dtype} s={s}: {g:6.1f} Gcells/s  ~{bw:5.0f} GB/s eff",
                  flush=True)
