import numpy as np
import pytest

from fdtd_tpu.params import Mode, num_steps, parse_params_text, time_values

REF_PARAMS_TEXT = "0.05\n0.05\n0.05\n0.001\n0.0000000000006\n0.00000000012\n2\n0"


def test_parse_reference_params():
    p = parse_params_text(REF_PARAMS_TEXT)
    assert p.maxi == p.maxj == p.maxk == 50
    assert p.spatial_step == 0.001
    assert p.time_step == 6e-13
    assert p.sampling_rate == 2
    assert p.mode == Mode.VALIDATION
    # box dims are float32-rounded like C's %f parse
    assert p.length == float(np.float32("0.05"))


def test_mode_hex_quirk():
    # %x parse: "1" -> computation; also e.g. "0x1"-less hex like "a" = 10
    p = parse_params_text("0.05 0.05 0.05 0.001 6e-13 1.2e-10 2 1")
    assert p.mode == Mode.COMPUTATION


def test_grid_size_float32_promotion():
    # 0.4f / 0.001 must floor to 400 (float32 0.4 is slightly above 0.4)
    p = parse_params_text("0.4 0.4 0.4 0.001 6e-13 1.2e-10 2 0")
    assert p.maxi == 400


def test_time_values_match_c_accumulation():
    p = parse_params_text(REF_PARAMS_TEXT)
    ts = time_values(p)
    # C loop: t=0; while t <= sim_time: t += 6e-13.  Emulate independently.
    t, n = 0.0, 0
    while t <= p.simulation_time:
        n += 1
        t += 6e-13
    assert len(ts) == n == num_steps(p)
    assert ts[0] == 0.0
    assert ts[1] == 6e-13


def test_validate_rejects_bad_time_step():
    p = parse_params_text("0.05 0.05 0.05 0.001 1.0 1.2e-10 2 0")
    with pytest.raises(ValueError):
        p.validate()


def test_cfl():
    p = parse_params_text(REF_PARAMS_TEXT)
    # dt=6e-13, dx=1e-3: c*dt*sqrt(3) = 3.1e-4 < 1e-3 -> stable
    assert p.is_cfl_stable()
    bad = parse_params_text("0.05 0.05 0.05 0.001 6e-11 1.2e-10 2 0")
    assert not bad.is_cfl_stable()
