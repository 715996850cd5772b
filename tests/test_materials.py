"""Heterogeneous-material (lossy dielectric) update tests — capability
extension over the vacuum-only reference (BASELINE config #2)."""

import dataclasses

import jax
import numpy as np

from fdtd_tpu import diagnostics
from fdtd_tpu.params import time_values
from fdtd_tpu.state import Materials, init_validation, water_block
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
