"""Heterogeneous-material (lossy dielectric) update tests — capability
extension over the vacuum-only reference (BASELINE config #2)."""

import dataclasses

import jax
import numpy as np
import pytest

from fdtd_tpu import diagnostics
from fdtd_tpu.params import Mode, time_values
from fdtd_tpu.state import Materials, init_validation, water_block, zeros
from fdtd_tpu.step import make_chunk_runner, make_step, scan_inputs


def test_uniform_vacuum_materials_match_scalar_path(tiny_params):
    p = tiny_params
    K, J, I = p.maxk, p.maxj, p.maxi
    mats = Materials(eps_r=np.ones((K, J, I)), sigma=np.zeros((K, J, I)))
    s0 = init_validation(p)
    step_scalar = jax.jit(make_step(p))
    step_mats = jax.jit(make_step(p, materials=mats))
    s_a, s_b = s0, s0
    ts, amps = scan_inputs(p, time_values(p)[:8])
    for t, a in zip(ts, amps):
        s_a = step_scalar(s_a, (t, a))
        s_b = step_mats(s_b, (t, a))
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_allclose(
            np.asarray(getattr(s_a, c)), np.asarray(getattr(s_b, c)), atol=1e-15, rtol=1e-10, err_msg=c
        )


def test_lossy_block_dissipates_energy(tiny_params):
    """Pure conductivity (eps_r=1) so the vacuum energy functional is the
    right Lyapunov quantity: sigma>0 must drain it monotonically (modulo the
    staggered-time oscillation, which a 50% bar dwarfs)."""
    p = tiny_params
    mats = water_block(p, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0), eps_r=1.0, sigma=5.0)
    s = init_validation(p)
    step = jax.jit(make_step(p, materials=mats))
    e0 = float(diagnostics.total_energy(p, s))
    ts, amps = scan_inputs(p, time_values(p))
    for t, a in zip(ts, amps):
        s = step(s, (t, a))
    e1 = float(diagnostics.total_energy(p, s))
    assert np.isfinite(e1)
    assert e1 < e0 * 0.5


def test_power_deposition_accumulates(tiny_params):
    p = dataclasses.replace(tiny_params, dtype="float32")
    mats = water_block(p, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0), eps_r=5.0, sigma=1.0)
    run = make_chunk_runner(p, materials=mats, accumulate_power=True)
    from fdtd_tpu.step import zero_power_acc

    s = init_validation(p)
    xs = scan_inputs(p, time_values(p)[:20])
    s, acc = run(s, xs, zero_power_acc(p))
    acc = np.asarray(acc)
    assert acc.shape == (p.maxk, p.maxj, p.maxi)
    assert acc.min() >= 0.0 and acc.max() > 0.0


def test_higher_eps_slows_wave(tiny_params):
    """Sanity: a high-eps fill lowers the resonant dynamics (fields differ)."""
    p = tiny_params
    mats = water_block(p, lo=(0, 0, 0), hi=(1, 1, 1), eps_r=4.0, sigma=0.0)
    s_v, s_m = init_validation(p), init_validation(p)
    step_v = jax.jit(make_step(p))
    step_m = jax.jit(make_step(p, materials=mats))
    ts, amps = scan_inputs(p, time_values(p)[:15])
    for t, a in zip(ts, amps):
        s_v = step_v(s_v, (t, a))
        s_m = step_m(s_m, (t, a))
    dif = float(np.abs(np.asarray(s_v.ey) - np.asarray(s_m.ey)).max())
    assert dif > 1e-3


def test_uniform_mu_arrays_match_scalar_path(tiny_params):
    """mu_r == 1 arrays must reproduce the vacuum evolution exactly."""
    from fdtd_tpu.state import Materials

    p = tiny_params
    K, J, I = p.maxk, p.maxj, p.maxi
    mats = Materials(mu_r=np.ones((K, J, I)))
    s_a = init_validation(p)
    s_b = init_validation(p)
    step_v = jax.jit(make_step(p))
    step_m = jax.jit(make_step(p, materials=mats))
    xs = scan_inputs(p, time_values(p)[:10])
    for t, a in zip(*xs):
        s_a = step_v(s_a, (t, a))
        s_b = step_m(s_b, (t, a))
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_allclose(
            np.asarray(getattr(s_a, c)), np.asarray(getattr(s_b, c)),
            atol=1e-15, rtol=1e-12, err_msg=c,
        )


def test_higher_mu_slows_wave(tiny_params):
    """A high-permeability block changes the evolution (mu_r is live)."""
    from fdtd_tpu.state import Materials

    p = dataclasses.replace(tiny_params, mode=Mode.COMPUTATION)
    K, J, I = p.maxk, p.maxj, p.maxi
    mu = np.ones((K, J, I))
    mu[:, :, :] = 1.0
    mu[K // 4 : 3 * K // 4, J // 4 : 3 * J // 4, I // 4 : 3 * I // 4] = 9.0
    s_v = zeros(p)
    s_m = zeros(p)
    step_v = jax.jit(make_step(p))
    step_m = jax.jit(make_step(p, materials=Materials(mu_r=mu)))
    xs = scan_inputs(p, time_values(p))
    for t, a in zip(*xs):
        s_v = step_v(s_v, (t, a))
        s_m = step_m(s_m, (t, a))
    dif = float(np.abs(np.asarray(s_v.hx) - np.asarray(s_m.hx)).max())
    assert dif > 1e-12
    assert np.isfinite(np.asarray(s_m.hx)).all()


def test_power_deposition_stripped_matches_canonical(tiny_params):
    """The stripped-layout SAR read is bit-identical to the canonical one."""
    from fdtd_tpu import diagnostics
    from fdtd_tpu.ops.pallas_fused import to_stripped
    from fdtd_tpu.state import update_coefs, water_block

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0), sigma=1.3)
    coefs = update_coefs(p, mats)
    # evolve a few steps so fields are nontrivial
    s = zeros(p)
    step = jax.jit(make_step(p, materials=mats))
    xs = scan_inputs(p, time_values(p)[:6])
    for t, a in zip(*xs):
        s = step(s, (t, a))
    want = np.asarray(diagnostics.power_deposition(p, s, coefs.sigma_cells))
    st = to_stripped(p, s)
    got = np.asarray(diagnostics.power_deposition_stripped(p, st, coefs.sigma_cells))
    np.testing.assert_array_equal(got, want)


def test_sar_fast_backend_matches_xla(tiny_params):
    """--sar on pallas_fused (no per-step restore) == --sar on xla."""
    from fdtd_tpu.step import backend_adapters, zero_power_acc

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8))
    xs = scan_inputs(p, time_values(p)[:10])

    run_x = make_chunk_runner(p, materials=mats, accumulate_power=True)
    _, acc_x = run_x(zeros(p), xs, zero_power_acc(p))

    prep, _ = backend_adapters(p, "pallas_fused", mats)
    run_f = make_chunk_runner(p, materials=mats, backend="pallas_fused",
                              accumulate_power=True)
    _, acc_f = run_f(prep(zeros(p)), xs, zero_power_acc(p))
    np.testing.assert_allclose(
        np.asarray(acc_f), np.asarray(acc_x), atol=1e-12, rtol=1e-5
    )
    assert float(np.asarray(acc_f).max()) > 0


def _ferrite_water_scene(p):
    """Heterogeneous eps, sigma AND mu: a water block plus a ferrite slab."""
    import numpy as np

    from fdtd_tpu.state import Materials

    K, J, I = p.maxk, p.maxj, p.maxi
    er = np.ones((K, J, I))
    sg = np.zeros((K, J, I))
    mu = np.ones((K, J, I))
    er[2 : K - 2, 2 : J - 2, 2 : I - 2] = 20.0
    sg[2 : K - 2, 2 : J - 2, 2 : I - 2] = 0.8
    mu[K // 2 :, : J // 2, :] = 4.0  # ferrite slab
    return Materials(eps_r=er, sigma=sg, mu_r=mu)


def test_het_mu_fast_backend_matches_xla(tiny_params):
    """Heterogeneous mu_r on the two-pass fast path (VERDICT r2 next #4):
    per-component face-averaged H factors streamed in the H pass match the
    xla ground truth."""
    import dataclasses

    import jax

    from fdtd_tpu.params import Mode, time_values
    from fdtd_tpu.step import backend_adapters, make_chunk_runner, scan_inputs
    from fdtd_tpu.state import zeros

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = _ferrite_water_scene(p)
    xs = scan_inputs(p, time_values(p)[:9])
    run_x = make_chunk_runner(p, mats, backend="xla")
    want, _ = run_x(zeros(p), xs, None)
    run_f = make_chunk_runner(p, mats, backend="pallas_fused")
    prep, rest = backend_adapters(p, "pallas_fused", mats)
    got = rest(run_f(prep(zeros(p)), xs, None)[0])
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=2e-7, rtol=0, err_msg=c,
        )


@pytest.mark.parametrize("nj", [None, 2])
def test_het_mu_stream_backend_matches_xla(tiny_params, nj, monkeypatch):
    """Heterogeneous mu_r on the streaming wavefront (r3): hf_x/y/z ride
    three extra coefficient windows, every level's H rows sliced per
    level; the strip column uses hfx_s.  nj=2 forces the j-tiled plan."""
    import dataclasses

    import jax

    from fdtd_tpu.params import Mode, time_values
    from fdtd_tpu.step import backend_adapters, make_chunk_runner, scan_inputs
    from fdtd_tpu.state import zeros

    if nj is not None:
        monkeypatch.setenv("FDTD_STREAM_NJ", str(nj))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = _ferrite_water_scene(p)
    xs = scan_inputs(p, time_values(p)[:19])  # 2 sweeps + 3 odd steps
    run_x = make_chunk_runner(p, mats, backend="xla")
    want, _ = run_x(zeros(p), xs, None)
    run_s = make_chunk_runner(p, mats, backend="pallas_stream")
    prep, rest = backend_adapters(p, "pallas_stream", mats)
    got = rest(run_s(prep(zeros(p)), xs, None)[0])
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_allclose(
            np.asarray(getattr(got, c)), np.asarray(getattr(want, c)),
            atol=2e-7, rtol=0, err_msg=c,
        )


def test_het_mu_sharded_stream_matches_single(tiny_params):
    """Heterogeneous mu_r on the sharded streaming composition: hf slabs
    baked with neighbor halo rows advance halo H rows exactly."""
    import dataclasses

    import jax

    from fdtd_tpu.params import Mode, time_values
    from fdtd_tpu.parallel.mesh import make_mesh
    from fdtd_tpu.parallel.sharded_fast import (from_sharded_fast,
                                                make_sharded_stream_runner,
                                                to_sharded_fast)
    from fdtd_tpu.state import update_coefs, zeros
    from fdtd_tpu.step import make_chunk_runner, scan_inputs

    p = dataclasses.replace(tiny_params, dtype="float32", mode=Mode.COMPUTATION)
    mats = _ferrite_water_scene(p)
    coefs = update_coefs(p, mats)
    xs = scan_inputs(p, time_values(p)[:19])
    run_x = make_chunk_runner(p, mats, backend="xla")
    want, _ = run_x(zeros(p), xs, None)

    mesh = make_mesh(2, (2, 1, 1), devices=jax.devices("cpu"))
    st = to_sharded_fast(p, zeros(p), mesh, coefs=coefs)
    run = make_sharded_stream_runner(p, mesh, interpret=True, materials=mats)
    st = run(st, xs)
    got = from_sharded_fast(p, st, mesh)
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        g = np.asarray(getattr(got, c))[:, :, : p.maxi]
        w = np.asarray(getattr(want, c))[:, :, : p.maxi]
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=0, err_msg=c)


def test_het_mu_sharded_fast_matches_single(tiny_params, tmp_path):
    """Heterogeneous mu_r through run_simulation --shard (1-D and 2x2):
    the sharded fast path carries the hf slabs per shard."""
    import dataclasses

    from fdtd_tpu.io.vtr import read_vtr_cell_arrays
    from fdtd_tpu.params import Mode
    from fdtd_tpu.runner import run_simulation

    p = dataclasses.replace(tiny_params, dtype="float32",
                            mode=Mode.COMPUTATION, sampling_rate=10)
    mats = _ferrite_water_scene(p)
    run_simulation(p, out_dir=str(tmp_path / "one"), materials=mats,
                   backend="pallas_fused", log=lambda s: None)
    for spec, sub in [("4", "z4"), ("2x2", "zy")]:
        notices = []
        run_simulation(p, out_dir=str(tmp_path / sub), materials=mats,
                       shard=spec, backend="pallas_fused", log=notices.append)
        assert not any("mu_r" in m for m in notices), notices
        a = read_vtr_cell_arrays(str(tmp_path / "one" / "result0020.vtr"))
        b = read_vtr_cell_arrays(str(tmp_path / sub / "result0020.vtr"))
        for k in ["ex", "ey", "ez", "hx", "hy", "hz"]:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{spec}/{k}")


def test_load_shape_masks_geometry():
    """Sphere/cylinder cell masks: volumes match the analytic shapes to
    the staircase tolerance and respect the expected symmetries."""
    from fdtd_tpu.params import Mode, Params
    from fdtd_tpu.state import cylinder_mask, sphere_mask

    n = 20
    p = Params(length=n * 1e-3, width=n * 1e-3, height=n * 1e-3,
               spatial_step=1e-3, time_step=1e-12, simulation_time=1e-12,
               sampling_rate=10**9, mode=Mode.VALIDATION)
    sm = sphere_mask(p, radius=0.3)
    want = 4.0 / 3.0 * np.pi * (0.3 * n) ** 3
    np.testing.assert_allclose(sm.sum(), want, rtol=0.05)
    # centered: symmetric under each axis flip
    for ax in range(3):
        np.testing.assert_array_equal(sm, np.flip(sm, axis=ax))

    cm = cylinder_mask(p, radius=0.25, lo=0.2, hi=0.8)
    height = int(0.8 * n) - int(0.2 * n)
    want_c = np.pi * (0.25 * n) ** 2 * height
    np.testing.assert_allclose(cm.sum(), want_c, rtol=0.05)
    # every z slab inside [lo, hi) carries the same disk
    disk = cm[int(0.2 * n)]
    for k in range(int(0.2 * n), int(0.8 * n)):
        np.testing.assert_array_equal(cm[k], disk)
    assert not cm[: int(0.2 * n)].any() and not cm[int(0.8 * n):].any()


def test_load_shape_cli_end_to_end(tmp_path):
    """--load-shape sphere: SAR deposits inside the sphere only, and the
    thermal hot spot sits inside it; --load-shape without --water-block
    errors cleanly."""
    from fdtd_tpu.cli import main
    from fdtd_tpu.io.vtr import read_vtr_cell_arrays
    from fdtd_tpu.params import parse_params_text
    from fdtd_tpu.state import sphere_mask

    params = tmp_path / "p.txt"
    params.write_text("0.02\n0.02\n0.02\n0.001\n1e-12\n2e-11\n1000000000\n1\n")
    out = tmp_path / "o"
    rc = main([str(params), "--water-block", "--load-shape", "sphere",
               "--sar", "--thermal", "10", "--out", str(out),
               "--backend", "xla"])
    assert rc == 0
    # the CLI's grid derivation applies the C %f float32 rounding
    # (QUIRKS #7), so build the mask from the SAME parsed params
    p = parse_params_text(params.read_text())
    mask = sphere_mask(p)
    sar = read_vtr_cell_arrays(str(out / "sar.vtr"))["power_j_m3"]
    assert float(sar[~mask].max()) == 0.0
    assert float(sar[mask].max()) > 0.0
    T = read_vtr_cell_arrays(str(out / "temperature.vtr"))["temperature_c"]
    hot = np.unravel_index(int(T.argmax()), T.shape)
    assert mask[hot]

    assert main([str(params), "--load-shape", "sphere"]) == 1
