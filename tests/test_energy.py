import dataclasses

import jax
import numpy as np

from fdtd_tpu import diagnostics
from fdtd_tpu.params import time_values
from fdtd_tpu.state import init_validation
from fdtd_tpu.step import make_step, scan_inputs

from .oracle import OracleSim


def test_energy_matches_oracle(tiny_params):
    p = tiny_params
    state = init_validation(p)
    oracle = OracleSim(p)
    oracle.set_initial_te101()
    # perturb Ez (zero in TE101) so the quirk-compat Ez gather is observable;
    # keep padding regions zero like a real evolved state
    rng = np.random.default_rng(0)
    ez = np.zeros(p.padded_shape)
    ez[: p.maxk, : p.maxj + 1, : p.maxi + 1] = rng.normal(size=(p.maxk, p.maxj + 1, p.maxi + 1))
    state = dataclasses.replace(state, ez=jax.numpy.asarray(ez))
    oracle.ez = ez.copy()
    step = jax.jit(make_step(p))
    ts, amps = scan_inputs(p, time_values(p)[:6])
    for t, a in zip(ts, amps):
        state = step(state, (t, a))
        oracle.step(t, computation=False)

    e = float(diagnostics.e_energy(p, state))
    h = float(diagnostics.h_energy(p, state))
    np.testing.assert_allclose(e, oracle.e_energy(), rtol=1e-10)
    np.testing.assert_allclose(h, oracle.h_energy(), rtol=1e-10)

    # quirk-compat path reproduces the reference's buggy Ez gather
    eq = float(diagnostics.e_energy(p, state, quirk_compat=True))
    np.testing.assert_allclose(eq, oracle.e_energy(quirk_compat=True), rtol=1e-10)
    assert eq != e  # the bug is observable


def test_energy_conservation_validation_mode(tiny_params):
    """Closed PEC cavity, no source: energy bounded, no secular drift.

    The instantaneous E+H sum oscillates at 2*omega with amplitude
    O(omega*dt) because E and H live at staggered half-steps; the conserved
    quantity is its mean.  For this tiny box omega*dt ~ 0.13, so we allow a
    ~10% bounded oscillation and require the run-mean to stay put.
    """
    p = tiny_params
    state = init_validation(p)
    step = jax.jit(make_step(p))
    e0 = float(diagnostics.total_energy(p, state))
    ts, amps = scan_inputs(p, time_values(p))
    es = []
    for t, a in zip(ts, amps):
        state = step(state, (t, a))
        es.append(float(diagnostics.total_energy(p, state)))
    es = np.asarray(es)
    assert np.all(np.abs(es - e0) / e0 < 0.15)
    assert abs(es.mean() - e0) / e0 < 0.05


def test_theoretical_energy(default_params):
    p = default_params
    w = diagnostics.theoretical_te101_energy(p)
    np.testing.assert_allclose(w, 8.854e-12 * p.length * p.width * p.height / 8.0)
    # initial TE101 state energy approaches eps0*a*b*d/8 as the grid refines
    state = init_validation(p)
    e0 = float(diagnostics.total_energy(p, state))
    assert abs(e0 - w) / w < 0.05


def test_cfl_instability_detected(tiny_params):
    """Above the Taflove bound the scheme must blow up (description.pdf 3.1)."""
    p = dataclasses.replace(tiny_params, time_step=4e-12)  # limit ~1.9e-12
    assert not p.is_cfl_stable()
    state = init_validation(p)
    step = jax.jit(make_step(p))
    ts, amps = scan_inputs(p, np.arange(60) * p.time_step)
    for t, a in zip(ts, amps):
        state = step(state, (t, a))
    e = float(diagnostics.total_energy(p, state))
    e0 = float(diagnostics.total_energy(p, init_validation(p)))
    assert not np.isfinite(e) or e > 100 * e0
