"""VMEM plan-space pins for the flagship streaming kernels (VERDICT r3 #8).

The headline throughput numbers live or die by ``pick_plan`` admitting
specific (steps-per-sweep, j-tiles) plans — e.g. the 256^3 bf16
lossy+SAR plan sits at 125.8 MB of the 126 MB VMEM budget, so any
allocator/shape/estimate drift can silently demote the flagship kernel
to a slower tier without any functional test failing.  These pins are
host-side planner checks (no device work): if one fails after an
intentional kernel change, re-measure the affected configuration and
update both the pin and docs/DESIGN.md's kernel table.
"""

import numpy as np
import pytest

from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.state import UpdateCoefs
from fdtd_tpu.ops.pallas_stream import (
    VMEM_BUDGET,
    pick_plan,
    stream_vmem_estimate,
)


def _params(n, dtype):
    dx = 0.001
    return Params(
        length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
        time_step=1e-12, simulation_time=1e-9, sampling_rate=10**9,
        mode=Mode.COMPUTATION, dtype=dtype, source=SourceConfig(),
    )


def _coefs(lossy: bool) -> UpdateCoefs:
    """pick_plan only inspects scalar-vs-array ca and heterogeneous_mu;
    tiny dummy arrays keep this test free of 512^3 edge-averaging."""
    a = np.ones((2, 2, 2))
    if lossy:
        return UpdateCoefs(a, a, a, a, a, a, 1.0, sigma_cells=a)
    return UpdateCoefs(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 1.0)


# (n, dtype, lossy, sar) -> the measured-and-shipped plan (s, nj).
# docs/DESIGN.md's kernel table carries the throughput measured at each.
FLAGSHIP_PLANS = {
    (256, "float32", False, False): (8, 1),   # 46.3 G headline
    (256, "bfloat16", False, False): (8, 1),  # 57.7 G aux headline
    (256, "float32", True, False): (8, 2),    # 14.8 G heating
    (256, "float32", True, True): (8, 2),     # 13.3 G heating+SAR
    (256, "bfloat16", True, False): (8, 1),   # 38.8 G heating
    (256, "bfloat16", True, True): (8, 1),    # 24.4 G heating+SAR (125.8 MB!)
    (512, "float32", False, False): (8, 6),   # 44.3 G big-grid
    (512, "bfloat16", False, False): (8, 3),  # 47.2 G big-grid
    (384, "float32", False, False): (8, 3),   # 30.7 G
}


@pytest.mark.parametrize("key", sorted(FLAGSHIP_PLANS))
def test_flagship_plan_admitted(key):
    n, dtype, lossy, sar = key
    p = _params(n, dtype)
    plan = pick_plan(p, _coefs(lossy), sar=sar)
    assert plan is not None, (
        f"{n}^3 {dtype} lossy={lossy} sar={sar}: no streaming plan fits "
        "VMEM — the flagship kernel silently demoted to a slower tier"
    )
    s, nj = plan
    assert s == 8, (
        f"{key}: plan depth regressed to s={s} (the measured numbers "
        "assume the full 8-step sweep)"
    )
    assert plan == FLAGSHIP_PLANS[key], (
        f"{key}: plan changed {FLAGSHIP_PLANS[key]} -> {plan}; if "
        "intentional, re-measure on device and update this pin and "
        "docs/DESIGN.md"
    )


def test_bf16_sar_plan_headroom_is_thin_and_feasible():
    """The 256^3 bf16 lossy+SAR flagship plan sits within 2% of the VMEM
    budget — the exact regression this file exists to catch."""
    p = _params(256, "bfloat16")
    plan = pick_plan(p, _coefs(True), sar=True)
    assert plan == (8, 1)
    need = stream_vmem_estimate(p, s=8, lossy=True, sar=True, nj=1)
    assert need <= VMEM_BUDGET, (need, VMEM_BUDGET)
    # if the estimate drops far below budget the estimator itself changed —
    # re-validate it against a real Mosaic compile before trusting pins
    assert need >= 0.9 * VMEM_BUDGET, (need, VMEM_BUDGET)


# ---------------------------------------------------------------------------
# Open-boundary admission pins (VERDICT r4 #8): the default --pml
# composition must keep riding the fast tiers.  These are host-side gate
# checks — if one fails, run_simulation has silently demoted --pml to the
# xla scan (a ~6x cliff at 256^3, DESIGN.md "PML tax attribution").


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("n", [256, 512])
def test_pml_default_composition_admitted(n, dtype):
    """The bench/default configs (10-cell CPML, vacuum and an interior
    water load at 256^3 — the 512^3 load pin stays at vacuum: the
    512^3 edge-averaging alone costs minutes on a CPU) are admitted by
    BOTH fast tiers: the r3 slab-correction composition and the r5
    in-kernel psi tier run_simulation dispatches."""
    from fdtd_tpu.ops.cpml import PMLConfig
    from fdtd_tpu.ops.cpml_fast import fast_pml_supported
    from fdtd_tpu.ops.cpml_kernel import kernel_pml_supported
    from fdtd_tpu.state import water_block

    cfg = PMLConfig(cells=10)
    p = _params(n, dtype)
    cases = [("vacuum", None)]
    if n == 256:
        cases.append(
            ("water", water_block(p, lo=(0.35,) * 3, hi=(0.65,) * 3)))
    for label, m in cases:
        assert fast_pml_supported(p, cfg, m), (n, dtype, label)
        assert kernel_pml_supported(p, cfg, m), (n, dtype, label)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pml_stream_tier_admitted_256(dtype):
    """The r5b streaming-PML tier admits the headline vacuum config
    (256^3, 10-cell CPML, computation mode) at s>=4 — the bench row's
    plan — and the interior water load (v2 lossy: the six ca/cb
    windows cost a sweep depth at fp32).  512^3-class grids
    intentionally fall back to the in-kernel two-pass tier (the kp
    tiles + tails bust VMEM)."""
    from fdtd_tpu.ops.cpml import PMLConfig
    from fdtd_tpu.ops.pallas_stream_pml import (
        pick_pml_stream_s,
        stream_pml_supported,
    )
    from fdtd_tpu.state import water_block

    cfg = PMLConfig(cells=10)
    p = _params(256, dtype)
    assert stream_pml_supported(p, cfg)
    assert pick_pml_stream_s(p, cfg) >= 4
    mats = water_block(p, lo=(0.35,) * 3, hi=(0.65,) * 3)
    assert stream_pml_supported(p, cfg, mats)
    assert pick_pml_stream_s(p, cfg, lossy=True) >= (
        2 if dtype == "float32" else 4)
    assert not stream_pml_supported(_params(512, dtype), cfg)


@pytest.mark.parametrize("nshard", [2, 4, 8])
def test_pml_sharded_composition_admitted(nshard):
    """--pml --shard N keeps the per-shard two-pass tier for the default
    10-cell absorber at 256^3 over 1-D z meshes up to 8 shards."""
    from fdtd_tpu.ops.cpml import PMLConfig
    from fdtd_tpu.parallel.sharded_pml_fast import sharded_pml_fast_supported

    p = _params(256, "float32")
    assert sharded_pml_fast_supported(p, PMLConfig(cells=10), nshard)


def test_dispersive_plan_space_pins():
    """The dispersive streaming tier's plan space (r5, VERDICT r4 #5):
    256^3 streams in BOTH dtypes (fp32 via the new j-tiled variant —
    s=4 x nj=2 halves the HBM sweeps vs r4's s=2 full-plane), 512^3
    bf16 streams j-tiled instead of silently falling to two-pass, and
    512^3 fp32 is HBM-infeasible BY DESIGN (the 15 fp32 coefficient
    maps alone are ~8.5 GB; 1.15x headroom over the 14 GB budget fails
    outright) — if that admission ever flips, the HBM model changed and
    the kernels must be re-validated on device."""
    from fdtd_tpu.ops.pallas_dispersive import pick_ade_plan

    cases = {
        (256, "float32"): (4, 2),
        (256, "bfloat16"): (4, 1),
        (512, "bfloat16"): (4, 8),
        (512, "float32"): None,
    }
    for (n, dtype), want in cases.items():
        p = _params(n, dtype)
        assert pick_ade_plan(p, sar=True) == want, (n, dtype)
    # the in-kernel DFT rides full-plane plans only (the phasor tiles
    # would need j-window band splices of their own — dft x jtile is
    # gated off, not silently wrong)
    p = _params(256, "float32")
    assert pick_ade_plan(p, sar=False, dft_nf=2) == (2, 1)
