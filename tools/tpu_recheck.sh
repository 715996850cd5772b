#!/bin/bash
# One-shot TPU re-verification after the axon outage: CLI smoke, on-device
# kernel parity (stream vs xla incl. s=2), PML on device, then bench.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /tmp && mkdir -p vtest3 && cd vtest3
printf "0.02\n0.02\n0.02\n0.001\n0.000000000001\n0.00000000002\n5\n0\n" > small.txt

echo "=== CLI smoke (validation mode) ==="
timeout 900 python -m fdtd_tpu small.txt --out rv --diag-log diag.jsonl || exit 1
head -2 diag.jsonl

echo "=== on-device stream vs xla parity at 128^3 (s=8 and s=2) ==="
timeout 1200 python - <<'EOF' || exit 1
import os, sys, numpy as np
import jax, jax.numpy as jnp
from fdtd_tpu.params import Mode, Params, SourceConfig, time_values
from fdtd_tpu.state import zeros
from fdtd_tpu.step import make_chunk_runner, scan_inputs, backend_adapters

def parity(n, steps, s_env=None):
    if s_env: os.environ["FDTD_STREAM_S"] = str(s_env)
    else: os.environ.pop("FDTD_STREAM_S", None)
    dx = 0.001
    p = Params(length=n*dx, width=n*dx, height=n*dx, spatial_step=dx,
               time_step=1e-12, simulation_time=steps*1e-12,
               sampling_rate=10**9, mode=Mode.COMPUTATION, dtype="float32",
               source=SourceConfig())
    xs = scan_inputs(p, time_values(p)[:steps])
    run_x = make_chunk_runner(p, backend="xla")
    want, _ = run_x(zeros(p), xs, None)
    prep, rest = backend_adapters(p, "pallas_stream")
    run_s = make_chunk_runner(p, backend="pallas_stream")
    got_st, _ = run_s(prep(zeros(p)), xs, None)
    got = jax.jit(rest)(got_st)
    for c in ("ex","ey","ez","hx","hy","hz"):
        g = np.asarray(getattr(got,c)); w = np.asarray(getattr(want,c))
        d = float(np.abs(g[:, :, :p.maxi] - w[:, :, :p.maxi]).max())
        print(f"n={n} s_env={s_env} {c}: maxdiff={d:.3e}")
        assert d == 0.0, (c, d)
parity(128, 24)
parity(128, 24, s_env=2)
print("STREAM_PARITY_OK")
EOF

echo "=== PML on device (xla path, 64^3, 100 steps) ==="
timeout 900 python - <<'EOF' || exit 1
import numpy as np, jax, jax.numpy as jnp, dataclasses
from fdtd_tpu.params import Mode, Params, time_values
from fdtd_tpu.state import zeros
from fdtd_tpu.step import scan_inputs
from fdtd_tpu.ops.cpml import PMLConfig, init_psi, make_pml_chunk_runner
from fdtd_tpu import diagnostics
n, steps = 64, 100
dx = 1e-3
p = Params(length=n*dx, width=n*dx, height=n*dx, spatial_step=dx,
           time_step=1e-12, simulation_time=steps*1e-12, sampling_rate=10**9,
           mode=Mode.VALIDATION, dtype="float32")
s = zeros(p)
K1,J1,I1 = p.padded_shape
k = np.arange(K1)[:,None,None]; j = np.arange(J1)[None,:,None]; i = np.arange(I1)[None,None,:]
r2 = (k-n/2)**2 + (j-n/2)**2 + (i-n/2)**2
g = np.exp(-r2/18.0)
ex = np.zeros((K1,J1,I1)); ey = np.zeros((K1,J1,I1))
ex[:,1:,:] = g[:,1:,:]-g[:,:-1,:]; ey[:,:,1:] = -(g[:,:,1:]-g[:,:,:-1])
s = dataclasses.replace(s, ex=jnp.asarray(ex,s.ex.dtype), ey=jnp.asarray(ey,s.ey.dtype))
e0 = float(diagnostics.e_energy(p,s)) + float(diagnostics.h_energy(p,s))
run = make_pml_chunk_runner(p, PMLConfig(cells=10))
xs = scan_inputs(p, time_values(p)[:steps])
(s1,_),_ = run((s, init_psi(p, PMLConfig(cells=10))), xs, None)
e1 = float(diagnostics.e_energy(p,s1)) + float(diagnostics.h_energy(p,s1))
print(f"PML on TPU: e1/e0 = {e1/e0:.3e}")
assert np.isfinite(e1) and e1 < e0
print("PML_TPU_OK")
EOF

echo "=== multiphysics/diagnostic surfaces on device (r3) ==="
cd /tmp/vtest3
printf "0.02\n0.02\n0.02\n0.001\n0.000000000001\n0.00000000002\n1000000000\n1\n" > comp.txt
timeout 900 python -m fdtd_tpu comp.txt --water-block --sar --thermal 30 \
  --thermal-power 900 --out rth | grep -E "rise|Peak" || exit 1
timeout 900 python -m fdtd_tpu comp.txt --water-block --coupled 2 --thermal 8 \
  --thermal-power 2e3 --out rco | grep "drifted" || exit 1
timeout 900 python -m fdtd_tpu comp.txt --pml 3 --dft 2.45e10 --dft-fields eh \
  --probe 10,10,10 --out rdf | grep -E "DFT|Probe" || exit 1

echo "=== r5 surfaces on device ==="
# in-kernel PML tier (the --pml default; FDTD_PML_KERNEL=0 is the r3 A/B)
timeout 900 python -m fdtd_tpu comp.txt --pml 3 --out rpk --no-output || exit 1
# dispersive x PML (ADE + CPML on the xla tier)
timeout 900 python -m fdtd_tpu comp.txt --water-block --dispersive --pml 3 \
  --sar --no-output || exit 1
# steady-state phasor inside the Debye load (streaming ADE + in-kernel DFT)
timeout 900 python -m fdtd_tpu comp.txt --water-block --dispersive \
  --dft 2.45e10 --out rdd | grep "DFT" || exit 1
# per-interval phasors during a cook (coupled x DFT)
timeout 900 python -m fdtd_tpu comp.txt --water-block --coupled 2 --thermal 8 \
  --thermal-power 2e3 --dft 2.45e10 --out rcd | grep "drifted" || exit 1
ls rcd/dft_i00_00.vtr rcd/dft_i01_00.vtr || exit 1

echo "=== bench (fp32 headline + bf16 aux) ==="
cd /root/repo && timeout 1800 python bench.py
