"""Turntable rotation: geometry re-rasterization, field resampling, and
the rotating coupled cook (fdtd_tpu/turntable.py + coupled.run_coupled).

The reference never models a load, let alone a moving one; these pins
establish the rotation machinery's exactness properties (identity at
theta=0, permutation at 90-degree multiples, volume invariance) and the
physics of the rotating cook (angle-dependent deposition for an
off-center load, global energy balance through the frame changes).
"""

import dataclasses

import numpy as np
import pytest

from fdtd_tpu.coupled import run_coupled
from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.turntable import LoadGeometry, geometry_mask, rotate_field


def _square_params(n=24, steps=40, dtype="float32"):
    """A square-floor-plan oven (length == width) so 90-degree rotations
    about the center map cell centers onto cell centers exactly.  1 mm
    spacing: the default 2.45e10 Hz TE10 profile degenerates to its sine
    nodes on coarser grids (zero drive, nothing to deposit)."""
    dx = 0.001
    return Params(
        length=n * dx,
        width=n * dx,
        height=n * dx,
        spatial_step=dx,
        time_step=1e-12,
        simulation_time=steps * 1e-12,
        sampling_rate=10**9,
        mode=Mode.COMPUTATION,
        dtype=dtype,
        source=SourceConfig(),
    )


# ---------------------------------------------------------------- geometry


def test_geometry_mask_identity_and_full_turn():
    p = _square_params()
    g = LoadGeometry(shape="cylinder", center=(0.7, 0.5), radius=0.12)
    m0 = geometry_mask(p, g, 0.0)
    assert m0.any()
    # a full revolution is the analytic identity (the shape is
    # re-rasterized, not resampled, so no erosion is possible)
    np.testing.assert_array_equal(m0, geometry_mask(p, g, 2.0 * np.pi))


@pytest.mark.parametrize("shape", ["box", "sphere", "cylinder"])
def test_geometry_mask_quarter_turn_matches_moved_center(shape):
    """Rotating an off-center load 90 degrees about the cavity center
    equals placing the same load at the rotated center directly — the
    rasterize-at-angle path against an independent construction."""
    p = _square_params()
    g = LoadGeometry(shape=shape, center=(0.75, 0.5), radius=0.1,
                     half_x=0.08, half_y=0.08)
    rot = geometry_mask(p, g, np.pi / 2.0)
    # CCW quarter turn about (0.5, 0.5) sends (0.75, 0.5) -> (0.5, 0.75)
    moved = geometry_mask(
        p, dataclasses.replace(g, center=(0.5, 0.75)), 0.0
    )
    np.testing.assert_array_equal(rot, moved)


def test_geometry_mask_volume_invariance():
    """The staircase volume stays within a boundary-layer tolerance at
    arbitrary (non-grid-aligned) angles."""
    p = _square_params(n=32)
    g = LoadGeometry(shape="cylinder", center=(0.68, 0.5), radius=0.15)
    v0 = geometry_mask(p, g, 0.0).sum()
    for theta in (0.37, 1.1, 2.6, 4.0, 5.5):
        v = geometry_mask(p, g, theta).sum()
        assert abs(v - v0) / v0 < 0.08, (theta, v, v0)


def test_geometry_mask_box_rotates_its_orientation():
    """A rotated box is a rotated box, not a translated one: at 45
    degrees a center-anchored square box must differ from its own
    theta=0 rasterization (corners move off-axis)."""
    p = _square_params(n=32)
    g = LoadGeometry(shape="box", center=(0.5, 0.5), half_x=0.2, half_y=0.1)
    m0 = geometry_mask(p, g, 0.0)
    m45 = geometry_mask(p, g, np.pi / 4.0)
    assert (m0 != m45).sum() > 0
    # ... while a quarter turn of that rectangle swaps its axes
    swapped = geometry_mask(
        p, dataclasses.replace(g, half_x=0.1, half_y=0.2), 0.0
    )
    np.testing.assert_array_equal(geometry_mask(p, g, np.pi / 2.0), swapped)


def test_bad_shape_rejected():
    with pytest.raises(ValueError, match="unknown load shape"):
        LoadGeometry(shape="torus")


# ------------------------------------------------------------ rotate_field


def test_rotate_field_identity():
    p = _square_params()
    rng = np.random.default_rng(7)
    a = rng.standard_normal((p.maxk, p.maxj, p.maxi))
    np.testing.assert_array_equal(rotate_field(p, a, 0.0), a)


def test_rotate_field_quarter_turn_is_exact_permutation():
    """On a square floor plan, a 90-degree rotation about the center
    maps cell centers to cell centers: bilinear weights collapse and the
    result is the exact index permutation (up to cos(pi/2) ~ 1e-16)."""
    p = _square_params()
    rng = np.random.default_rng(3)
    a = rng.standard_normal((p.maxk, p.maxj, p.maxi))
    got = rotate_field(p, a, np.pi / 2.0)
    # CCW rotation of the FIELD: the value at output (j, i) comes from
    # the source point rotated back by -90deg: out[j, i] = in[I-1-i, j]
    want = a[:, ::-1, :].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_rotate_field_quarter_turn_exact_on_truncating_grid():
    """ADVICE r3: params derives maxi = int(length/dx) from a
    float32-parsed length, so length is generally NOT maxi*dx —
    float32(0.06) = 0.0599999987 gives maxi = 59 with a cell pitch
    length/59 that is ~1.7% off dx.  rotate_field must convert physical
    positions back to indices with the SAME pitch it built the
    coordinates with, or the resample carries a systematic radial scale
    error; on this square 59x59 floor plan the 90-degree rotation about
    the center is then still an exact permutation."""
    dx = 0.001
    p = Params(
        length=float(np.float32(0.06)),
        width=float(np.float32(0.06)),
        height=float(np.float32(0.012)),
        spatial_step=dx,
        time_step=1e-12,
        simulation_time=1e-11,
        sampling_rate=10**9,
        mode=Mode.COMPUTATION,
    )
    assert p.maxi == 59 and p.maxj == 59  # the truncating regime
    assert abs(p.length / p.maxi - dx) / dx > 0.01  # pitch != dx
    rng = np.random.default_rng(11)
    a = rng.standard_normal((p.maxk, p.maxj, p.maxi))
    got = rotate_field(p, a, np.pi / 2.0)
    want = a[:, ::-1, :].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_rotate_field_round_trip_preserves_smooth_fields():
    """theta then -theta through bilinear resampling reproduces a smooth
    field away from the boundary (interpolation error only)."""
    p = _square_params(n=32)
    K, J, I = p.maxk, p.maxj, p.maxi
    j, i = np.meshgrid(np.arange(J), np.arange(I), indexing="ij")
    smooth = np.sin(2 * np.pi * i / I) * np.cos(2 * np.pi * j / J)
    a = np.broadcast_to(smooth, (K, J, I)).copy()
    back = rotate_field(p, rotate_field(p, a, 0.7), -0.7)
    interior = (slice(None), slice(8, J - 8), slice(8, I - 8))
    np.testing.assert_allclose(back[interior], a[interior], atol=0.05)


def test_rotate_field_moves_a_blob_to_the_rotated_position():
    p = _square_params(n=32)
    K, J, I = p.maxk, p.maxj, p.maxi
    a = np.zeros((K, J, I))
    a[:, J // 2, 3 * I // 4] = 1.0  # on the +x axis from the center
    out = rotate_field(p, a, np.pi / 2.0)
    # CCW: +x -> +y; the mass lands on the +y axis
    peak = np.unravel_index(np.argmax(out[0]), out[0].shape)
    # the rotation center sits BETWEEN cells on an even grid, so the
    # image of cell center i = 3I/4 (x-offset +(I/4 + 1/2)dx) lands at
    # y-offset +(I/4 + 1/2)dx, x-offset -dx/2: cell (3J/4, I/2 - 1)
    assert peak == (3 * J // 4, I // 2 - 1), peak


# ------------------------------------------------------------ coupled cook


def _cook(p, **kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("log", lambda s: None)
    kw.setdefault("out_dir", "/tmp/tt_unused")
    return run_coupled(p, cook_time=2.0, intervals=4, **kw)


def test_geometry_static_cook_matches_mask_cook():
    """rpm=0 with a geometry is the plain static coupled run over that
    geometry's own mask — the rotation plumbing adds nothing."""
    p = _square_params(steps=30)
    g = LoadGeometry(shape="cylinder", center=(0.65, 0.5), radius=0.15)
    ra = _cook(p, geometry=g, rpm=0.0)
    rb = _cook(p, mask=geometry_mask(p, g, 0.0))
    np.testing.assert_array_equal(ra.temperature, rb.temperature)


def test_rotating_cook_off_center_load():
    """The physics headline: an off-center load rotated through the
    cavity's fixed standing-wave pattern absorbs a DIFFERENT power at
    different angles (the deposition the turntable exists to average),
    and the whole chain conserves energy: total deposited heat equals
    the domain's integrated temperature rise (insulated walls)."""
    p = _square_params(n=24, steps=60, dtype="float64")  # fp64: the
    # balance check is then limited only by the frame-rotation algebra
    g = LoadGeometry(shape="cylinder", center=(0.7, 0.5), radius=0.12)
    # one full revolution over the cook: 4 intervals at 45/135/225/315 deg
    rpm = 60.0 / 2.0  # 1 rev per the 2 s cook
    res = _cook(p, geometry=g, rpm=rpm)
    assert [round(s["theta_deg"], 6) for s in res.intervals] == [
        45.0, 135.0, 225.0, 315.0,
    ]
    absorbed = [s["absorbed_w"] for s in res.intervals]
    assert max(absorbed) > 1.02 * min(absorbed), absorbed
    # energy balance through both frame rotations
    from fdtd_tpu.thermal import thermal_from_mask

    tm = thermal_from_mask(p, geometry_mask(p, g, 0.0))
    dv = p.spatial_step**3
    heat = float((np.asarray(tm.rho_c) * res.rise).sum()) * dv
    deposited = sum(absorbed) * (2.0 / 4.0)
    np.testing.assert_allclose(heat, deposited, rtol=1e-6)


def test_rotating_cook_centered_load_is_angle_insensitive():
    """A load that is rotationally symmetric about the turntable axis
    presents the same staircase geometry at every angle (quarter-turn
    symmetric grid), so per-interval deposition varies only through the
    temperature feedback — tiny over a short cook."""
    p = _square_params(n=24, steps=60)
    g = LoadGeometry(shape="cylinder", center=(0.5, 0.5), radius=0.2)
    res = _cook(p, geometry=g, rpm=60.0 / 2.0 / 2.0)  # half rev: 45..180-ish
    absorbed = [s["absorbed_w"] for s in res.intervals]
    assert max(absorbed) < 1.01 * min(absorbed), absorbed


def test_rotation_requires_geometry():
    p = _square_params()
    with pytest.raises(ValueError, match="LoadGeometry"):
        run_coupled(p, cook_time=1.0, intervals=2, rpm=3.0,
                    log=lambda s: None)


def test_mask_and_geometry_are_exclusive():
    p = _square_params()
    g = LoadGeometry()
    with pytest.raises(ValueError, match="not both"):
        run_coupled(p, cook_time=1.0, intervals=1, mask=geometry_mask(p, g),
                    geometry=g, log=lambda s: None)


def test_cli_rotating_cook(tmp_path):
    """--rotate end-to-end: runs, writes the temperature map, logs the
    per-interval angles."""
    import json

    from fdtd_tpu.cli import main

    params = tmp_path / "params.txt"
    n, dx = 20, 0.001
    params.write_text(
        f"{n * dx} {n * dx} {n * dx} {dx} 1e-12 3e-11 1000000000 1\n"
    )
    out = tmp_path / "r"
    rc = main([
        str(params), "--out", str(out), "--water-block",
        "--load-shape", "cylinder", "--load-center", "0.7,0.5",
        "--coupled", "2", "--thermal", "1.0", "--rotate", "15",
        "--backend", "xla",
    ])
    assert rc == 0
    assert (out / "temperature.vtr").exists()
    lines = [json.loads(ln) for ln in
             (out / "coupled.jsonl").read_text().splitlines()]
    assert [round(ln["theta_deg"], 6) for ln in lines] == [22.5, 67.5]


def test_cli_rotate_needs_coupled(tmp_path, capsys):
    from fdtd_tpu.cli import main

    params = tmp_path / "params.txt"
    params.write_text("0.02 0.02 0.02 0.001 1e-12 1e-11 1000000000 1\n")
    rc = main([str(params), "--water-block", "--rotate", "5",
               "--no-output"])
    assert rc == 1
    assert "--rotate needs --coupled" in capsys.readouterr().err
