"""Temporally-blocked kernel parity (interpret mode)."""

import dataclasses

import numpy as np
import pytest

from fdtd_tpu.params import Mode, time_values
from fdtd_tpu.state import init_validation, zeros
from fdtd_tpu.step import backend_adapters, make_chunk_runner, scan_inputs

COMPONENTS = ["ex", "ey", "ez", "hx", "hy", "hz"]


@pytest.mark.parametrize("sgrp", [2, 3, 4, 5])
@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_temporal_matches_xla(tiny_params, monkeypatch, sgrp, mode):
    monkeypatch.setenv("FDTD_TEMPORAL_STEPS", str(sgrp))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=mode)
    s0 = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    run_ref = make_chunk_runner(p)
    run_tmp = make_chunk_runner(p, backend="pallas_temporal")
    prep, rest = backend_adapters(p, "pallas_temporal")
    xs = scan_inputs(p, time_values(p)[:9])  # odd count exercises the tail
    want, _ = run_ref(s0, xs, None)
    got = rest(run_tmp(prep(s0), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c))[:, :, : p.maxi]
        w = np.asarray(getattr(want, c))[:, :, : p.maxi]
        # s=2 is bit-exact even on XLA:CPU interpret; deeper unrolls let the
        # CPU backend pick shape-dependent FMA groupings (1-ulp); on real
        # TPU Mosaic the kernels are pinned bit-exact vs pallas_fused by
        # the on-device spot checks (docs/DESIGN.md parity strategy)
        atol = 0.0 if sgrp <= 2 else 1e-6
        np.testing.assert_allclose(g, w, atol=atol, rtol=0, err_msg=f"s={sgrp}/{c}")


@pytest.mark.parametrize("nj", [2, 3])
@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_temporal_jtiled_matches_untiled(tiny_params, mode, nj):
    """j-tiled windows (VMEM fallback for 512^3-class grids) are bit-exact
    vs full-plane windows: same unroll, same arithmetic, tile interiors
    only are written."""
    import jax
    import jax.lax as lax

    from fdtd_tpu.ops import pallas_temporal as pt
    from fdtd_tpu.state import update_coefs

    s = 4
    p = dataclasses.replace(tiny_params, dtype="float32", mode=mode)
    coefs = update_coefs(p)
    s0 = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    prep, rest = backend_adapters(p, "pallas_temporal")
    ts = time_values(p)[:8]
    xs = scan_inputs(p, ts)
    gts = (xs[0].reshape(2, s), xs[1].reshape(2, s))

    def run_with(nj_):
        group = pt.make_temporal_pair_step(p, coefs, s=s, nj=nj_)

        @jax.jit
        def run(st):
            st = pt.jextend(p, st, nj_)
            st, _ = lax.scan(lambda st, x: (group(st, x), None), st, gts)
            return pt.jrestore(p, st, nj_)

        return rest(run(prep(s0)))

    want = run_with(1)
    got = run_with(nj)
    for c in COMPONENTS:
        # bit-exact on real TPU (Mosaic emits the same vector ops for both
        # window shapes); interpret mode lets XLA:CPU pick shape-dependent
        # FMA groupings, leaving 1-ulp cancellation residue at s >= 4
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=1e-6, rtol=0, err_msg=f"nj={nj}/{c}",
        )


def test_temporal_bf16_matches_xla(tiny_params):
    """bf16 temporal (fp32 in-kernel compute) tracks the bf16 xla path to
    storage-rounding tolerance; the round-1 Mosaic fault gate is lifted."""
    p = dataclasses.replace(
        tiny_params, dtype="bfloat16", mode=Mode.COMPUTATION,
        simulation_time=8e-12,
    )
    s0 = zeros(p)
    run_ref = make_chunk_runner(p)
    run_tmp = make_chunk_runner(p, backend="pallas_temporal")
    prep, rest = backend_adapters(p, "pallas_temporal")
    xs = scan_inputs(p, time_values(p)[:8])
    want, _ = run_ref(s0, xs, None)
    got = rest(run_tmp(prep(s0), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c), np.float32)[:, :, : p.maxi]
        w = np.asarray(getattr(want, c), np.float32)[:, :, : p.maxi]
        scale = max(np.max(np.abs(w)), 1e-30)
        # bf16 storage rounds each step on the xla path; the temporal sweep
        # keeps fp32 between its s steps, so agreement is at bf16 eps level
        assert np.max(np.abs(g - w)) <= 2e-2 * scale, c


def test_temporal_full_validation_physics(default_params, monkeypatch):
    """The headline backend must pass the physics bar end-to-end on the
    reference's shipped scene (50^3, 200 steps)."""
    import dataclasses

    from fdtd_tpu import analytic
    from fdtd_tpu.params import time_values as tv

    monkeypatch.setenv("FDTD_TEMPORAL_STEPS", "4")
    p = dataclasses.replace(default_params, dtype="float32")
    s0 = init_validation(p)
    run = make_chunk_runner(p, backend="pallas_temporal")
    prep, rest = backend_adapters(p, "pallas_temporal")
    ts = tv(p)
    xs = scan_inputs(p, ts)
    got = rest(run(prep(s0), xs, None)[0])
    perrs = analytic.peak_normalized_error(p, got, float(ts[-1]))
    assert perrs["ey"] < 0.01 and perrs["hx"] < 0.01 and perrs["hz"] < 0.01, perrs


def test_vmem_planner_lane_padding_and_margin(tiny_params):
    """Pin the VMEM planner to its hardware-verified decisions.

    The model counts lane-padded window widths, plans with a safety
    margin (doubled for lane-unaligned 250-class grids, where validation
    s=5 at est 120 MB still faulted on device), and accounts the
    mode-dependent window slimming: computation mode drops the corr
    streams (identically zero) and slims the drive arrays to a patch
    band, which unlocks full-plane s=6 at 256^3 (TPU-verified bit-exact
    vs pallas_fused, incl. the formerly faulting 250^3 s=5)."""
    from fdtd_tpu.ops.pallas_temporal import plan_nj

    def grid(n, mode):
        return dataclasses.replace(
            tiny_params, dtype="float32", mode=mode,
            length=n * 0.001, width=n * 0.001, height=n * 0.001,
        )

    comp, vali = Mode.COMPUTATION, Mode.VALIDATION
    assert plan_nj(grid(256, comp), 5) == 1
    assert plan_nj(grid(256, comp), 6) == 1   # unlocked by slimming
    assert plan_nj(grid(250, comp), 5) == 1   # unlocked by slimming
    assert plan_nj(grid(250, vali), 5) == 2   # faulted at nj=1 on device
    assert plan_nj(grid(256, vali), 6) == 2
    assert plan_nj(grid(512, comp), 4) == 4


@pytest.mark.parametrize("sar", [False, True])
@pytest.mark.parametrize("sgrp", [2, 3])
def test_temporal_lossy_matches_twopass(tiny_params, monkeypatch, sgrp, sar):
    """Lossy (+SAR) temporal blocking vs the two-pass lossy path (VERDICT
    r2 next #1): fields match to FMA tolerance, and the in-kernel SAR
    accumulator matches the per-step jnp accumulation."""
    from fdtd_tpu.state import water_block
    from fdtd_tpu.step import zero_power_acc

    monkeypatch.setenv("FDTD_TEMPORAL_STEPS", str(sgrp))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused",
                                accumulate_power=sar)
    run_tmp = make_chunk_runner(p, mats, backend="pallas_temporal",
                                accumulate_power=sar)
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    xs = scan_inputs(p, time_values(p)[:7])  # sweeps + an odd tail
    acc0 = zero_power_acc(p) if sar else None
    want, acc_w = run_ref(prep(zeros(p)), xs, acc0)
    got, acc_g = run_tmp(prep(zeros(p)), xs, acc0)
    wantf, gotf = rest(want), rest(got)
    for c in COMPONENTS:
        g = np.asarray(getattr(gotf, c))[:, :, : p.maxi]
        w = np.asarray(getattr(wantf, c))[:, :, : p.maxi]
        # the two-multiply lossy update (ca*E + cb*curl) lets XLA:CPU pick
        # FMA groupings per window shape even at s=2 (1 ulp); the real-TPU
        # spot check pins bit-exactness on device
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0,
                                   err_msg=f"s={sgrp}/sar={sar}/{c}")
    if sar:
        np.testing.assert_allclose(
            np.asarray(acc_g), np.asarray(acc_w), rtol=2e-5, atol=1e-30,
            err_msg="SAR accumulator",
        )
        assert float(np.asarray(acc_g).max()) > 0


@pytest.mark.parametrize("sar", [False, True])
def test_temporal_lossy_jtiled_matches_untiled(tiny_params, sar):
    """The lossy kernel's j-tiled windows match full-plane windows."""
    import jax
    import jax.lax as lax

    from fdtd_tpu.ops import pallas_temporal as pt
    from fdtd_tpu.state import update_coefs, water_block
    from fdtd_tpu.step import zero_power_acc

    s = 3
    nj = 2
    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    coefs = update_coefs(p, mats)
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    ts = time_values(p)[:6]
    xs = scan_inputs(p, ts)
    gts = (xs[0].reshape(2, s), xs[1].reshape(2, s))

    def run_with(nj_):
        group = pt.make_temporal_lossy_pair_step(
            p, coefs, s=s, nj=nj_, accumulate_power=sar
        )

        @jax.jit
        def run(st, acc):
            st = pt.jextend(p, st, nj_)
            if sar:
                acc = pt.embed_power_acc(p, acc, nj_)
                (st, acc), _ = lax.scan(lambda c, x: (group(c, x), None),
                                        (st, acc), gts)
                acc = pt.crop_power_acc(p, acc, nj_)
            else:
                st, _ = lax.scan(lambda st, x: (group(st, x), None), st, gts)
            return pt.jrestore(p, st, nj_), acc

        st, acc = run(prep(zeros(p)), zero_power_acc(p))
        return rest(st), acc

    want, acc_w = run_with(1)
    got, acc_g = run_with(nj)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=1e-6, rtol=0, err_msg=f"lossy nj={nj}/{c}",
        )
    if sar:
        np.testing.assert_allclose(
            np.asarray(acc_g), np.asarray(acc_w), rtol=2e-5, atol=1e-30
        )


@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_stream_matches_xla(tiny_params, mode):
    """Streaming wavefront kernel (ops/pallas_stream.py, r3) vs the jnp
    ground truth: same updates carried through persistent VMEM tails."""
    p = dataclasses.replace(tiny_params, dtype="float32", mode=mode)
    s0 = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    run_ref = make_chunk_runner(p)
    run_st = make_chunk_runner(p, backend="pallas_stream")
    prep, rest = backend_adapters(p, "pallas_stream")
    xs = scan_inputs(p, time_values(p)[:19])  # 2 sweeps + 3 odd steps
    want, _ = run_ref(s0, xs, None)
    got = rest(run_st(prep(s0), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c))[:, :, : p.maxi]
        w = np.asarray(getattr(want, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)
    # the dead slab stays zero after pure stream sweeps (other backends'
    # windows read it as zeros); sweep-multiple step count — the two-pass
    # odd-step kernels legitimately leave it NaN-filled in interpret mode
    # (no aliasing there), which on real TPU is zero-preserving aliasing
    from fdtd_tpu.ops.pallas_fused import D as _D

    st = prep(s0)
    run2 = make_chunk_runner(p, backend="pallas_stream")
    xs16 = scan_inputs(p, time_values(p)[:16])
    out, _ = run2(st, xs16, None)
    assert float(np.abs(np.asarray(out.ez[:_D])).max()) == 0.0


def test_stream_lossy_matches_twopass(tiny_params):
    """Lossy streaming kernel (r3): ca/cb Element windows in the skewed
    pipeline match the two-pass lossy path."""
    from fdtd_tpu.state import water_block

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused")
    run_st = make_chunk_runner(p, mats, backend="pallas_stream")
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    xs = scan_inputs(p, time_values(p)[:19])  # 2 sweeps + 3 odd steps
    want = rest(run_ref(prep(zeros(p)), xs, None)[0])
    got = rest(run_st(prep(zeros(p)), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c))[:, :, : p.maxi]
        w = np.asarray(getattr(want, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)


def test_stream_bf16_matches_xla(tiny_params):
    """bf16 streaming kernel tracks the bf16 xla path (fp32 VMEM tails,
    one storage rounding per sweep — same contract as temporal bf16)."""
    p = dataclasses.replace(
        tiny_params, dtype="bfloat16", mode=Mode.COMPUTATION,
        simulation_time=8e-12,
    )
    s0 = zeros(p)
    run_ref = make_chunk_runner(p)
    run_st = make_chunk_runner(p, backend="pallas_stream")
    prep, rest = backend_adapters(p, "pallas_stream")
    xs = scan_inputs(p, time_values(p)[:8])
    want, _ = run_ref(s0, xs, None)
    got = rest(run_st(prep(s0), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c), np.float32)[:, :, : p.maxi]
        w = np.asarray(getattr(want, c), np.float32)[:, :, : p.maxi]
        scale = max(np.max(np.abs(w)), 1e-30)
        assert np.max(np.abs(g - w)) <= 2e-2 * scale, c


def test_stream_lossy_sar_matches_twopass(tiny_params):
    """SAR in the streaming kernel (rolling accumulator band) matches the
    per-step jnp accumulation of the two-pass path."""
    from fdtd_tpu.state import water_block
    from fdtd_tpu.step import zero_power_acc

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused",
                                accumulate_power=True)
    run_st = make_chunk_runner(p, mats, backend="pallas_stream",
                               accumulate_power=True)
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    xs = scan_inputs(p, time_values(p)[:19])  # 2 sweeps + 3 odd steps
    want, acc_w = run_ref(prep(zeros(p)), xs, zero_power_acc(p))
    got, acc_g = run_st(prep(zeros(p)), xs, zero_power_acc(p))
    wantf, gotf = rest(want), rest(got)
    for c in COMPONENTS:
        g = np.asarray(getattr(gotf, c))[:, :, : p.maxi]
        w = np.asarray(getattr(wantf, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)
    np.testing.assert_allclose(
        np.asarray(acc_g), np.asarray(acc_w), rtol=2e-5, atol=1e-30,
        err_msg="SAR accumulator",
    )
    assert float(np.asarray(acc_g).max()) > 0


@pytest.mark.parametrize("sdepth", [4, 2])
@pytest.mark.parametrize("workload", ["vacuum", "lossy", "lossy_sar"])
def test_stream_s4_matches_ref(tiny_params, workload, monkeypatch, sdepth):
    """s=4 and s=2 streaming plans (pick_plan's VMEM fallbacks; ofs=D/s
    extra drain steps re-zero the dead-slab blocks).  tiny grid: nk=4,
    ofs=2 at s=4 / nk=8, ofs=4 at s=2 (the 2048^3-class lane-extent
    fallback)."""
    from fdtd_tpu.state import water_block
    from fdtd_tpu.step import zero_power_acc

    monkeypatch.setenv("FDTD_STREAM_S", str(sdepth))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = None
    sar = False
    if workload != "vacuum":
        mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
        sar = workload == "lossy_sar"
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused",
                                accumulate_power=sar)
    run_st = make_chunk_runner(p, mats, backend="pallas_stream",
                               accumulate_power=sar)
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    acc0 = (lambda: zero_power_acc(p)) if sar else (lambda: None)
    xs = scan_inputs(p, time_values(p)[:19])  # 4 sweeps + 3 odd steps
    want, acc_w = run_ref(prep(zeros(p)), xs, acc0())
    got, acc_g = run_st(prep(zeros(p)), xs, acc0())
    wantf, gotf = rest(want), rest(got)
    for c in COMPONENTS:
        g = np.asarray(getattr(gotf, c))[:, :, : p.maxi]
        w = np.asarray(getattr(wantf, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)
    # the dead slab stays zero after pure sweeps (16 steps = 4 sweeps)
    from fdtd_tpu.ops.pallas_fused import D as _D

    xs16 = scan_inputs(p, time_values(p)[:16])
    out = run_st(prep(zeros(p)), xs16, acc0())[0]
    assert float(np.abs(np.asarray(out.ez[:_D])).max()) == 0.0
    if sar:
        np.testing.assert_allclose(
            np.asarray(acc_g), np.asarray(acc_w), rtol=2e-5, atol=1e-30,
            err_msg="SAR accumulator",
        )
        assert float(np.asarray(acc_g).max()) > 0


@pytest.mark.parametrize("nj", [2])
@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_stream_jtiled_matches_untiled(tiny_params, mode, nj):
    """j-tiled streaming windows (the r3 512^3-class extension) are
    bit-exact vs the full-plane streaming kernel: same skewed pipeline
    and arithmetic; the HJ-column halo wedge is recomputed per tile and
    only tile interiors are written."""
    from fdtd_tpu.ops import pallas_stream as ps
    from fdtd_tpu.ops.pallas_temporal import jextend, jrestore
    from fdtd_tpu.state import update_coefs

    p = dataclasses.replace(tiny_params, dtype="float32", mode=mode)
    coefs = update_coefs(p)
    s0 = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    prep, rest = backend_adapters(p, "pallas_stream")
    xs = scan_inputs(p, time_values(p)[:16])
    gts = (xs[0].reshape(2, 8), xs[1].reshape(2, 8))

    def run_with(nj_):
        group = ps.make_stream_pair_step(p, coefs, s=8, nj=nj_)
        st = jextend(p, prep(s0), nj_)
        for i in range(2):
            st = group(st, (gts[0][i], gts[1][i]))
        return rest(jrestore(p, st, nj_))

    want = run_with(1)
    got = run_with(nj)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=0.0, rtol=0, err_msg=f"stream nj={nj}/{c}",
        )


def test_stream_jtiled_lossy_matches_untiled(tiny_params):
    """Lossy j-tiled streaming: the ca/cb Element windows pick up the
    j-tile offsets; halo rows advance under the true coefficient rows."""
    from fdtd_tpu.ops import pallas_stream as ps
    from fdtd_tpu.ops.pallas_temporal import jextend, jrestore
    from fdtd_tpu.state import update_coefs, water_block

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    coefs = update_coefs(p, mats)
    prep, rest = backend_adapters(p, "pallas_stream", mats)
    xs = scan_inputs(p, time_values(p)[:16])
    gts = (xs[0].reshape(2, 8), xs[1].reshape(2, 8))

    def run_with(nj_):
        group = ps.make_stream_pair_step(p, coefs, s=8, nj=nj_)
        st = jextend(p, prep(zeros(p)), nj_)
        for i in range(2):
            st = group(st, (gts[0][i], gts[1][i]))
        return rest(jrestore(p, st, nj_))

    want = run_with(1)
    got = run_with(2)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=0.0, rtol=0, err_msg=f"lossy stream nj=2/{c}",
        )


@pytest.mark.parametrize("nj", [2, 4])
def test_stream_jtiled_sar_matches_twopass(tiny_params, monkeypatch, nj):
    """SAR x j-tiling (r3): the rolling accumulator band rides the
    tjw-row tile geometry and acc emits are tile interiors — fields and
    accumulator match the two-pass path's per-step jnp accumulation."""
    from fdtd_tpu.state import water_block
    from fdtd_tpu.step import zero_power_acc

    monkeypatch.setenv("FDTD_STREAM_NJ", str(nj))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    run_ref = make_chunk_runner(p, mats, backend="pallas_fused",
                                accumulate_power=True)
    run_st = make_chunk_runner(p, mats, backend="pallas_stream",
                               accumulate_power=True)
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    xs = scan_inputs(p, time_values(p)[:19])  # 2 sweeps + 3 odd steps
    want, acc_w = run_ref(prep(zeros(p)), xs, zero_power_acc(p))
    got, acc_g = run_st(prep(zeros(p)), xs, zero_power_acc(p))
    wantf, gotf = rest(want), rest(got)
    for c in COMPONENTS:
        g = np.asarray(getattr(gotf, c))[:, :, : p.maxi]
        w = np.asarray(getattr(wantf, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)
    np.testing.assert_allclose(
        np.asarray(acc_g), np.asarray(acc_w), rtol=2e-5, atol=1e-30,
        err_msg="SAR accumulator",
    )
    assert float(np.asarray(acc_g).max()) > 0


def test_stream_pick_plan_orders_by_traffic():
    """pick_plan prefers deep sweeps over j-tiles to shallow full-plane
    ones (s=8 nj>1 models less HBM traffic than s=4 nj=1) and refuses
    ping-pong footprints beyond HBM."""
    from fdtd_tpu.ops.pallas_stream import pick_plan, stream_vmem_estimate
    from fdtd_tpu.params import Mode as M, Params, SourceConfig
    from fdtd_tpu.state import update_coefs

    def mkp(n, dtype):
        return Params(
            length=n * 0.001, width=n * 0.001, height=n * 0.001,
            spatial_step=0.001, time_step=1e-12, simulation_time=1e-9,
            sampling_rate=10**9, mode=M.COMPUTATION, dtype=dtype,
            source=SourceConfig(),
        )

    p = mkp(512, "float32")
    plan = pick_plan(p, update_coefs(p))
    assert plan is not None and plan[0] == 8 and plan[1] > 1, plan
    # the chosen plan actually fits the VMEM model
    from fdtd_tpu.ops.pallas_temporal import VMEM_BUDGET

    assert stream_vmem_estimate(p, s=plan[0], nj=plan[1]) <= VMEM_BUDGET
    # 1024^3 fp32 ping-pong (2x 27 GB) can never stream single-chip
    p = mkp(1024, "float32")
    assert pick_plan(p, update_coefs(p)) is None
