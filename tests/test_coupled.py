"""Two-way EM <-> thermal coupling (fdtd_tpu/coupled.py).

Pins the Debye water-dielectric model against literature anchor values,
the power normalization, and the coupling mechanism itself: a hot load
must present different eps_r/sigma to the next EM interval.
"""

import json

import numpy as np
import pytest

from fdtd_tpu.constants import EPSILON
from fdtd_tpu.coupled import (
    materials_at_temperature,
    normalize_power,
    run_coupled,
    water_debye,
    water_eps_static,
)
from fdtd_tpu.params import Mode, Params
from fdtd_tpu.state import block_mask


def _box_params(n, steps=20, mode=Mode.COMPUTATION):
    return Params(
        length=n * 1e-3, width=n * 1e-3, height=n * 1e-3,
        spatial_step=1e-3, time_step=1e-12,
        simulation_time=steps * 1e-12,
        sampling_rate=10**9, mode=mode, dtype="float32",
    )


def test_water_debye_literature_anchors():
    """25 C: eps' ~ 77-78 and Debye-loss sigma ~ 1.25 S/m at 2.45 GHz;
    90 C: both fall strongly (pure water heats self-limitingly)."""
    eps25, sig25 = water_debye(25.0)
    assert 76.0 < float(eps25) < 79.0
    assert 1.0 < float(sig25) < 1.6
    eps90, sig90 = water_debye(90.0)
    assert 55.0 < float(eps90) < 61.0
    assert float(sig90) < 0.5 * float(sig25)
    # static permittivity: Malmberg-Maryott at the two classic anchors
    np.testing.assert_allclose(water_eps_static(25.0), 78.30, atol=0.1)
    np.testing.assert_allclose(water_eps_static(0.0), 87.74, atol=0.01)
    # monotone decreasing over the liquid range
    T = np.linspace(0.0, 100.0, 21)
    eps, _ = water_debye(T)
    assert np.all(np.diff(eps) < 0)
    # clamped outside the fit range
    np.testing.assert_allclose(water_debye(-40.0)[0], water_debye(0.0)[0])
    np.testing.assert_allclose(water_debye(150.0)[0], water_debye(100.0)[0])


def test_water_debye_salt_runaway_regime():
    """Ionic conductivity flips the sign of dsigma/dT: salty loads absorb
    harder as they heat (the thermal-runaway regime)."""
    _, s25 = water_debye(25.0, sigma_ion25=2.0)
    _, s90 = water_debye(90.0, sigma_ion25=2.0)
    assert float(s90) > float(s25)
    # and the Debye term alone still decreases
    _, p25 = water_debye(25.0)
    _, p90 = water_debye(90.0)
    assert float(p90) < float(p25)
    # the ionic part scales by the +2%/K coefficient exactly
    np.testing.assert_allclose(
        float(s90) - float(p90) - (float(s25) - float(p25)),
        2.0 * 0.02 * 65.0, rtol=1e-12,
    )


def test_materials_at_temperature_masked():
    p = _box_params(10)
    mask = block_mask(p)
    T = np.full((p.maxk, p.maxj, p.maxi), 40.0)
    m = materials_at_temperature(p, T, mask)
    eps, sig = water_debye(40.0)
    np.testing.assert_allclose(m.eps_r[mask], float(eps))
    np.testing.assert_allclose(m.sigma[mask], float(sig))
    np.testing.assert_allclose(m.eps_r[~mask], 1.0)
    np.testing.assert_allclose(m.sigma[~mask], 0.0)


def test_normalize_power():
    p = _box_params(8)
    q = np.zeros((p.maxk, p.maxj, p.maxi))
    q[2:4, 2:4, 2:4] = 3.0
    qn = normalize_power(p, q, 700.0)
    np.testing.assert_allclose(qn.sum() * p.spatial_step**3, 700.0,
                               rtol=1e-12)
    # the pattern is preserved, only the level moves
    np.testing.assert_allclose(qn / qn.max(), q / q.max())
    with pytest.raises(ValueError):
        normalize_power(p, np.zeros_like(q), 700.0)


def test_run_coupled_feedback_changes_materials():
    """The mechanism itself: with the power normalized high enough to
    heat the load tens of kelvin per interval, interval 2's EM solve
    must see different (lower-eps, for pure water lower-sigma)
    dielectrics than interval 1."""
    p = _box_params(10, steps=20)
    res = run_coupled(
        p, cook_time=8.0, intervals=2, power_watts=5e3,
        ambient=20.0, backend="xla", log=lambda s: None,
    )
    assert len(res.intervals) == 2
    first, second = res.intervals
    # interval 1 ran at ambient dielectrics
    eps20, sig20 = water_debye(20.0)
    np.testing.assert_allclose(first["eps_r_range"], [eps20, eps20])
    np.testing.assert_allclose(first["sigma_range"], [sig20, sig20])
    # the load genuinely heated, so interval 2 saw shifted dielectrics
    assert first["peak_t_c"] > 25.0
    assert second["eps_r_range"][1] < eps20
    assert second["sigma_range"][0] < sig20
    # power normalization held each interval
    np.testing.assert_allclose(first["absorbed_w"], 5e3, rtol=1e-6)
    np.testing.assert_allclose(second["absorbed_w"], 5e3, rtol=1e-6)
    # temperatures are physical: peak >= mean >= ambient, rise matches
    assert second["peak_t_c"] >= second["mean_t_c"] >= 20.0
    mask = block_mask(p)
    assert res.temperature[mask].max() == pytest.approx(second["peak_t_c"])
    np.testing.assert_allclose(res.rise, res.temperature - 20.0)
    # air far from the load stays cool-ish (diffusion only)
    assert res.temperature[0, 0, 0] < second["peak_t_c"]


def test_run_coupled_validations():
    p = _box_params(8, mode=Mode.VALIDATION)
    with pytest.raises(ValueError, match="computation mode"):
        run_coupled(p, cook_time=1.0, intervals=1)
    p = _box_params(8)
    with pytest.raises(ValueError, match="at least 1"):
        run_coupled(p, cook_time=1.0, intervals=0)
    with pytest.raises(ValueError, match="mask is empty"):
        run_coupled(p, cook_time=1.0, intervals=1,
                    mask=np.zeros((p.maxk, p.maxj, p.maxi), bool))


def test_coupled_cli_end_to_end(tmp_path):
    from fdtd_tpu.cli import main
    from fdtd_tpu.io.vtr import read_vtr_cell_arrays

    params = tmp_path / "p.txt"
    params.write_text("0.01\n0.01\n0.01\n0.001\n1e-12\n2e-11\n1000000000\n1\n")
    out = tmp_path / "o"
    rc = main([str(params), "--water-block", "--coupled", "2",
               "--thermal", "8", "--thermal-power", "2e3",
               "--out", str(out), "--backend", "xla"])
    assert rc == 0
    T = read_vtr_cell_arrays(str(out / "temperature.vtr"))["temperature_c"]
    assert float(T.max()) > 20.0
    lines = [json.loads(l) for l in
             (out / "coupled.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and lines[1]["interval"] == 1
    # per-interval maps for animation; the final one equals temperature.vtr
    t0 = read_vtr_cell_arrays(str(out / "temperature_00.vtr"))
    t1 = read_vtr_cell_arrays(str(out / "temperature_01.vtr"))
    np.testing.assert_array_equal(t1["temperature_c"], T)
    assert float(t0["temperature_c"].max()) <= float(T.max())

    # error paths are clean exits, not tracebacks
    assert main([str(params), "--water-block", "--coupled", "2"]) == 1
    assert main([str(params), "--coupled", "2", "--thermal", "5"]) == 1
    vparams = tmp_path / "v.txt"
    vparams.write_text("0.01\n0.01\n0.01\n0.001\n1e-12\n2e-11\n1000000000\n0\n")
    assert main([str(vparams), "--water-block", "--coupled", "2",
                 "--thermal", "5"]) == 1


def test_run_coupled_custom_mask_gets_water_thermal_properties():
    """Review fix (r3): a custom load mask must carry WATER thermal
    properties in exactly the masked cells — with the old default-box
    water_thermal, a custom load heated with air rho_c (~3500x the
    rise)."""
    from fdtd_tpu.thermal import WATER_RHO_C

    p = _box_params(10, steps=20)
    mask = block_mask(p, lo=(0.1, 0.1, 0.1), hi=(0.4, 0.4, 0.4))
    watts = 100.0
    cook = 2.0
    res = run_coupled(p, cook_time=cook, intervals=1, mask=mask,
                      power_watts=watts, backend="xla",
                      log=lambda s: None)
    # adiabatic bound with water rho_c: total absorbed energy spread
    # over the load; the hottest cell concentrates it but stays within
    # ~100x of the mean (field pattern), while air rho_c would be 3486x
    dv = p.spatial_step**3
    n_load = int(mask.sum())
    mean_adiabatic = watts * cook / (WATER_RHO_C * n_load * dv)
    rise = res.rise
    assert rise[mask].max() > 0
    assert rise[mask].max() < 200 * mean_adiabatic
    # and the heating is inside the custom box, not the default one
    hot = np.unravel_index(int(rise.argmax()), rise.shape)
    assert mask[hot]


def test_coupled_checkpoint_resume_bit_exact(tmp_path):
    """Interval-level checkpoint/resume (r4): kill a cook after interval
    2 of 4, resume, and the final temperature map is bit-exact vs the
    uninterrupted cook (the fp64 rise map is the cook's entire
    cross-interval state — each EM interval restarts from a zero field)."""
    p = _box_params(10, steps=20)
    kw = dict(cook_time=4.0, intervals=4, power_watts=500.0,
              sigma_ion25=0.5, backend="xla", log=lambda s: None)
    full = run_coupled(p, out_dir=str(tmp_path / "full"), **kw)

    class Kill(Exception):
        pass

    def die_after(it, T, theta):
        if it == 1:  # intervals 0 and 1 done (and checkpointed)
            raise Kill()

    out = str(tmp_path / "ck")
    with pytest.raises(Kill):
        run_coupled(p, out_dir=out, checkpoint=True,
                    on_interval=die_after, **kw)
    resumed = run_coupled(p, out_dir=out, checkpoint=True, resume=True,
                          **kw)
    assert len(resumed.intervals) == 4
    assert [s["interval"] for s in resumed.intervals] == [0, 1, 2, 3]
    np.testing.assert_array_equal(resumed.rise, full.rise)
    np.testing.assert_array_equal(resumed.temperature, full.temperature)
    # summaries survive the restart (persisted in the checkpoint)
    for a, b in zip(resumed.intervals, full.intervals):
        assert a == b, (a, b)


def test_coupled_checkpoint_cli(tmp_path):
    """--coupled now composes with --checkpoint-every/--resume: the r3
    CLI error is gone and a resumed cook completes."""
    from fdtd_tpu.cli import main

    params = tmp_path / "p.txt"
    params.write_text("0.01\n0.01\n0.01\n0.001\n1e-12\n2e-11\n1000000000\n1\n")
    out = tmp_path / "o"
    rc = main([str(params), "--water-block", "--coupled", "2",
               "--thermal", "4", "--checkpoint-every", "1",
               "--out", str(out)])
    assert rc == 0
    assert (out / "coupled_ckpt.npz").exists()
    rc = main([str(params), "--water-block", "--coupled", "2",
               "--thermal", "4", "--checkpoint-every", "1", "--resume",
               "--out", str(out)])
    assert rc == 0


def test_coupled_resume_grid_mismatch_is_clean(tmp_path):
    from fdtd_tpu.coupled import _save_coupled_ckpt

    p = _box_params(10, steps=20)
    out = str(tmp_path / "o")
    _save_coupled_ckpt(out, np.zeros((3, 3, 3)), 1, [])
    with pytest.raises(ValueError, match="does not match"):
        run_coupled(p, cook_time=1.0, intervals=2, resume=True,
                    out_dir=out, backend="xla", log=lambda s: None)


def test_coupled_dft_per_interval(tmp_path):
    """--coupled x --dft (r5, VERDICT r4 #7): per-interval phasor
    extraction during a cook.  Accumulators reset per interval (the
    dielectrics change), each summary gains cw_absorbed_w, and the
    energy-consistency pin holds: the CW power the phasors predict,
    sum(1/2 sigma|E_hat|^2) dx^3, tracks raw_absorbed_w (the SAR rate)
    — the turn-on transient excites off-frequency cavity modes whose
    dissipation the drive-frequency phasor cannot see, so cw/raw sits
    below 1 but stays stable across intervals as the dielectrics
    drift."""
    from fdtd_tpu.dft import DftConfig

    p = _box_params(10, steps=164)  # ~4 source periods at 2.45e10 Hz
    dftc = DftConfig((p.source.frequency,))
    seen = []
    res = run_coupled(
        p, cook_time=8.0, intervals=2, power_watts=5e3, ambient=20.0,
        backend="xla", dft=dftc, log=lambda s: None,
        on_interval_dft=lambda it, d, sg, th: seen.append((it, d, sg)),
    )
    assert len(seen) == 2
    ratios = []
    for it, s in enumerate(res.intervals):
        assert len(s["cw_absorbed_w"]) == 1
        r = s["cw_absorbed_w"][0] / s["raw_absorbed_w"]
        assert 0.4 < r < 1.05, (it, r)
        ratios.append(r)
        # the callback got the same physics the summary recorded
        _it, d, sg = seen[it]
        assert _it == it
        cw = float(d.cw_power(sg, 0).sum()) * p.spatial_step**3
        np.testing.assert_allclose(cw, s["cw_absorbed_w"][0], rtol=1e-12)
        assert float(d.magnitude(0).max()) > 0
    # consistency across intervals: the transient fraction is a property
    # of the drive/cavity, not of the (slightly drifted) dielectrics
    assert abs(ratios[0] - ratios[1]) < 0.15 * ratios[0]
    # phasor patterns genuinely differ across intervals (the load heated,
    # interval 2 solved a different dielectric problem)
    m0, m1 = seen[0][1].magnitude(0), seen[1][1].magnitude(0)
    assert float(np.abs(m0 - m1).max()) > 0


def test_coupled_dft_cli_writes_interval_maps(tmp_path):
    """--coupled N --dft f writes dft_iNN_MM.vtr per interval (|E|, CW
    power, re/im phasor components) next to temperature_NN.vtr; --probe
    under --coupled stays a clean error."""
    from fdtd_tpu.cli import main
    from fdtd_tpu.io.vtr import read_vtr_cell_arrays

    params = tmp_path / "p.txt"
    params.write_text("0.01\n0.01\n0.01\n0.001\n1e-12\n1.64e-10\n"
                      "1000000000\n1\n")
    out = tmp_path / "o"
    rc = main([str(params), "--water-block", "--coupled", "2",
               "--thermal", "8", "--thermal-power", "2e3",
               "--dft", "2.45e10", "--out", str(out), "--backend", "xla"])
    assert rc == 0
    for it in (0, 1):
        m = read_vtr_cell_arrays(str(out / f"dft_i{it:02d}_00.vtr"))
        assert float(m["e_mag"].max()) > 0
        assert float(m["cw_power_w_m3"].max()) > 0
        assert "ez_re" in m and "ez_im" in m
    lines = [json.loads(l) for l in
             (out / "coupled.jsonl").read_text().splitlines()]
    assert all("cw_absorbed_w" in s for s in lines)
    # probes stay rejected with a clean exit
    assert main([str(params), "--water-block", "--coupled", "2",
                 "--thermal", "8", "--probe", "5,5,5"]) == 1
