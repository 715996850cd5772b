"""Point probes (fdtd_tpu/monitors.py) + mode spectra (utils/spectrum.py).

Physics pins: a validation-mode run is a free TE101 oscillation, so a
probe's spectrum must peak at (numerically-dispersed) f101; the pulsed
computation-mode run must ring the same resonance through the full
product path (gaussian burst -> probe -> spectrum -> peak).
"""

import dataclasses

import numpy as np
import pytest

from fdtd_tpu import diagnostics
from fdtd_tpu.analytic import mode_constants
from fdtd_tpu.monitors import COMPONENTS, ProbeResult, ProbeSet
from fdtd_tpu.params import Mode, Params, SourceConfig
from fdtd_tpu.runner import run_simulation
from fdtd_tpu.utils.spectrum import (
    amplitude_spectrum,
    find_peaks,
    probe_mode_spectrum,
)


def _box(n, dt, steps, mode=Mode.VALIDATION, source=None):
    kw = {"source": source} if source is not None else {}
    return Params(
        length=n * 1e-3, width=n * 1e-3, height=n * 1e-3,
        spatial_step=1e-3, time_step=dt,
        simulation_time=(steps - 0.5) * dt, sampling_rate=10**9,
        mode=mode, dtype="float32", **kw,
    )


def test_probe_set_validation():
    with pytest.raises(ValueError):
        ProbeSet(())
    with pytest.raises(ValueError):
        ProbeSet(((1, 2),))
    ps = ProbeSet(((1, 2, 3),))
    p = _box(10, 1e-12, 4)
    ps.validate(p)
    with pytest.raises(ValueError, match="outside"):
        ProbeSet(((10, 0, 0),)).validate(p)
    with pytest.raises(ValueError, match="outside"):
        ProbeSet(((0, 0, -1),)).validate(p)


def test_probe_series_matches_state_evolution():
    """Probe row k equals the cell means of the state after step k+1:
    run 10 steps plain and 20 with probes, compare at the overlap."""
    cell = (5, 4, 6)
    p10 = _box(10, 1.5e-12, 10)
    p20 = _box(10, 1.5e-12, 20)
    plain = run_simulation(p10, write_snapshots=False, backend="xla",
                           log=lambda s: None)
    probed = run_simulation(p20, write_snapshots=False, backend="xla",
                            probes=ProbeSet((cell,)), log=lambda s: None)
    pr = probed.probes
    assert pr.values.shape == (20, 1, 6)
    k, j, i = cell
    kk, jj, ii = slice(k, k + 1), slice(j, j + 1), slice(i, i + 1)
    es = diagnostics._e_cell_means(p10, plain.state, kk, jj, ii)
    hs = diagnostics._h_cell_means(p10, plain.state, kk, jj, ii)
    want = np.array([float(m[0, 0, 0]) for m in (*es, *hs)], np.float32)
    np.testing.assert_allclose(pr.values[9, 0], want, rtol=2e-6, atol=1e-30)
    # the series genuinely oscillates (validation mode rings TE101)
    assert pr.series(0, "ey").std() > 0.01
    assert list(COMPONENTS) == ["ex", "ey", "ez", "hx", "hy", "hz"]


def test_find_peaks_two_tone():
    """Parabolic refinement resolves two synthetic tones to ~0.2% even
    off-bin."""
    fs = 1.0e9
    n = 512
    t = np.arange(n) / fs
    f1, f2 = 0.1037e9, 0.2731e9  # deliberately off-bin
    x = 1.0 * np.cos(2 * np.pi * f1 * t) + 0.6 * np.cos(2 * np.pi * f2 * t)
    freqs, amp = amplitude_spectrum(t, x)
    peaks = find_peaks(freqs, amp, n_peaks=2)
    got = sorted(f for f, _ in peaks)
    np.testing.assert_allclose(got, [f1, f2], rtol=2e-3)


def test_validation_ringdown_spectrum_peaks_at_f101():
    """Free TE101 oscillation: the probe spectrum's dominant peak sits at
    the (numerically dispersed) TE101 frequency."""
    n = 10
    base = _box(n, 1e-12, 4)
    f101, _ = mode_constants(base)
    per_period = 32
    dt = 1.0 / (f101 * per_period)
    p = _box(n, dt, 64 * per_period)
    res = run_simulation(p, write_snapshots=False, backend="xla",
                         probes=ProbeSet(((5, 5, 5),)),
                         log=lambda s: None)
    freqs, amp, peaks = probe_mode_spectrum(res, component="ey")
    assert peaks, "no peaks found"
    f_peak = peaks[0][0]
    # numerical dispersion at 10 cells/half-wave shifts f by < ~1.5%
    assert abs(f_peak - f101) / f101 < 0.015, (f_peak, f101)


def test_pulsed_burst_rings_the_cavity_mode():
    """The product path: gaussian burst -> probe -> ring-down spectrum
    recovers the TE101 resonance in a driven (computation-mode) run."""
    n = 10
    base = _box(n, 1e-12, 4)
    f101, _ = mode_constants(base)
    per_period = 32
    dt = 1.0 / (f101 * per_period)
    # a small source patch: the reference's hard source *clamps* its
    # cells every step, and a large clamped region on the z=0 wall
    # measurably shifts the cavity's eigenfrequencies
    src = SourceConfig(frequency=f101, envelope="gaussian",
                       aprime=0.002, bprime=0.002)
    p = _box(n, dt, 64 * per_period, mode=Mode.COMPUTATION, source=src)
    res = run_simulation(p, write_snapshots=False, backend="xla",
                         probes=ProbeSet(((5, 5, 5), (3, 3, 3))),
                         log=lambda s: None)
    # drop the driven transient, analyze the ring-down
    freqs, amp, peaks = probe_mode_spectrum(res, probe=0, component="ey",
                                            skip_transient=0.25)
    assert peaks, "no peaks found"
    rel = [abs(f - f101) / f101 for f, _ in peaks[:4]]
    assert min(rel) < 0.03, (peaks[:4], f101)


def test_probe_cli_end_to_end(tmp_path):
    from fdtd_tpu.cli import main

    params = tmp_path / "p.txt"
    params.write_text("0.01\n0.01\n0.01\n0.001\n1e-12\n2e-11\n1000000000\n1\n")
    out = tmp_path / "o"
    rc = main([str(params), "--probe", "5,5,5", "--probe", "2,3,4",
               "--out", str(out), "--backend", "xla"])
    assert rc == 0
    lines = (out / "probes.csv").read_text().splitlines()
    assert lines[0].startswith("# probe cells")
    header = lines[1].split(",")
    assert header[0] == "t" and len(header) == 1 + 2 * 6
    assert len(lines) == 2 + 20  # comment + header + one row per step
    row = np.array([float(v) for v in lines[2].split(",")])
    assert row.shape == (13,)

    assert main([str(params), "--probe", "99,0,0"]) == 1  # out of bounds
    assert main([str(params), "--probe", "a,b,c"]) == 1
    # r4: monitors compose with checkpointing (the rows/sums ride as aux)
    assert main([str(params), "--probe", "5,5,5", "--out", str(out),
                 "--checkpoint-every", "4", "--backend", "xla"]) == 0


def test_probe_ringdown_decays_through_pml():
    """Open boundary physics: the same TE101 oscillation that rings
    forever in the closed cavity decays when CPML absorbers line the
    walls — the probe envelope must fall, and the DFT stays finite."""
    from fdtd_tpu.dft import DftConfig
    from fdtd_tpu.ops.cpml import PMLConfig

    n = 10
    base = _box(n, 1e-12, 4)
    f101, _ = mode_constants(base)
    per_period = 32
    dt = 1.0 / (f101 * per_period)
    p = _box(n, dt, 24 * per_period)
    cfg = PMLConfig(cells=3)
    probes = ProbeSet(((5, 5, 5),))
    closed = run_simulation(p, write_snapshots=False, backend="xla",
                            probes=probes, log=lambda s: None)
    opened = run_simulation(p, write_snapshots=False, backend="xla",
                            probes=probes, pml=cfg,
                            dft=DftConfig((f101,)), log=lambda s: None)
    ey_c = closed.probes.series(0, "ey")
    ey_o = opened.probes.series(0, "ey")
    half = len(ey_c) // 2

    def rms(x):
        return float(np.sqrt(np.mean(np.square(np.asarray(x, np.float64)))))

    # closed cavity: conservative (late RMS comparable to early)
    assert rms(ey_c[half:]) > 0.5 * rms(ey_c[:half])
    # open boundary: the oscillation genuinely leaks into the absorber.
    # A small STATIC residual survives (CPML with alpha=0 does not absorb
    # the DC/evanescent part of the initial condition), so compare the
    # oscillatory part about the late-time plateau.
    osc = np.asarray(ey_o, np.float64) - np.mean(ey_o[-len(ey_o) // 8:])
    assert rms(osc[half:]) < 0.3 * rms(osc[:half])
    assert np.isfinite(opened.dft.phasors).all()


def test_ring_down_q_synthetic():
    """Q extraction recovers a synthetic damped cosine to a few percent."""
    from fdtd_tpu.utils.spectrum import ring_down_q

    f = 2.0e9
    gamma = 2.0e8
    fs = 64 * f
    t = np.arange(4096) / fs
    x = np.exp(-gamma * t) * np.cos(2 * np.pi * f * t) + 0.05  # DC offset
    q, g, fr = ring_down_q(t, x)
    np.testing.assert_allclose(g, gamma, rtol=0.03)
    np.testing.assert_allclose(fr, f, rtol=0.01)
    np.testing.assert_allclose(q, 2 * np.pi * f / (2 * gamma), rtol=0.05)

    with pytest.raises(ValueError, match="16 samples"):
        ring_down_q(t[:8], x[:8])


def test_ring_down_q_from_pml_run():
    """The product path: probe a TE101 ring-down through CPML walls and
    read a finite positive Q; the closed cavity's fitted decay rate is
    tiny by comparison."""
    from fdtd_tpu.dft import DftConfig
    from fdtd_tpu.ops.cpml import PMLConfig
    from fdtd_tpu.utils.spectrum import ring_down_q

    n = 10
    base = _box(n, 1e-12, 4)
    f101, _ = mode_constants(base)
    per_period = 32
    dt = 1.0 / (f101 * per_period)
    p = _box(n, dt, 24 * per_period)
    probes = ProbeSet(((5, 5, 5),))
    opened = run_simulation(p, write_snapshots=False, backend="xla",
                            probes=probes, pml=PMLConfig(cells=3),
                            log=lambda s: None)
    closed = run_simulation(p, write_snapshots=False, backend="xla",
                            probes=probes, log=lambda s: None)
    q_o, g_o, f_o = ring_down_q(opened.probes.times,
                                opened.probes.series(0, "ey"),
                                frequency=f101)
    assert g_o > 0 and 0 < q_o < 1e4
    # 3-cell CPML is a leaky wall: the mode should die within tens of
    # periods, i.e. Q of order 10-1000
    _, g_c, _ = ring_down_q(closed.probes.times,
                            closed.probes.series(0, "ey"),
                            frequency=f101)
    assert abs(g_c) < 0.2 * g_o


def test_probes_sharded_match_single_chip():
    """--probe under --shard: the probe series (and with --water-block
    --sar, the SAR map) bit-match the single-chip run on a 2-way mesh."""
    from fdtd_tpu.state import water_block

    dx = 1e-3
    n = 8
    p = Params(
        length=n * dx, width=n * dx, height=n * dx, spatial_step=dx,
        time_step=1e-12, simulation_time=2e-11, sampling_rate=10**9,
        mode=Mode.COMPUTATION, dtype="float32",
    )
    mats = water_block(p)
    probes = ProbeSet(((4, 4, 4), (1, 6, 2)))
    single = run_simulation(p, materials=mats, accumulate_power=True,
                            probes=probes, write_snapshots=False,
                            backend="xla", log=lambda s: None)
    sharded = run_simulation(p, materials=mats, accumulate_power=True,
                             probes=probes, shard="2",
                             write_snapshots=False, backend="xla",
                             log=lambda s: None)
    # the lossy sharded E update reassociates at fp32 ulp level (the
    # vacuum DFT parity in test_dft is bit-exact); pin to ulp class
    np.testing.assert_allclose(sharded.probes.values,
                               single.probes.values,
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sharded.power_j),
                               np.asarray(single.power_j),
                               rtol=1e-5, atol=1e-30)


def test_find_peaks_survives_dc_offset():
    """Review repro (r3): a static offset (the CPML alpha=0 residual
    pattern) must not suppress real resonances — the spectrum strips
    the mean before windowing."""
    from fdtd_tpu.utils.spectrum import amplitude_spectrum, find_peaks

    fs = 64 * 2.45e9
    t = np.arange(4096) / fs
    x = 100.0 + np.exp(-t / 2e-9) * np.cos(2 * np.pi * 2.45e9 * t)
    freqs, amp = amplitude_spectrum(t, x)
    peaks = find_peaks(freqs, amp, n_peaks=1)
    assert peaks, "DC offset swallowed the resonance"
    np.testing.assert_allclose(peaks[0][0], 2.45e9, rtol=5e-3)


def test_monitors_pml_shard_triple():
    """r4 (VERDICT r3 #3): --dft/--probe x --pml x --shard composes —
    the sharded monitored scan carries psi12 and matches the single-chip
    xla PML monitored run."""
    from fdtd_tpu.dft import DftConfig
    from fdtd_tpu.ops.cpml import PMLConfig

    import dataclasses as _dc

    p = _dc.replace(_box(10, 1e-12, 14, mode=Mode.COMPUTATION),
                    dtype="float64")
    pml = PMLConfig(cells=2)
    dftc = DftConfig((p.source.frequency,))
    probes = ProbeSet(((5, 5, 5),))
    single = run_simulation(p, pml=pml, dft=dftc, probes=probes,
                            write_snapshots=False, backend="xla",
                            log=lambda s: None)
    sharded = run_simulation(p, pml=pml, dft=dftc, probes=probes,
                             shard="2", write_snapshots=False,
                             backend="xla", log=lambda s: None)
    np.testing.assert_allclose(sharded.probes.values,
                               single.probes.values, rtol=0, atol=1e-12)
    scale = np.abs(single.dft.phasors).max()
    np.testing.assert_allclose(sharded.dft.phasors, single.dft.phasors,
                               rtol=0, atol=1e-7 * scale)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(sharded.state, c)),
            np.asarray(getattr(single.state, c)),
            rtol=0, atol=1e-12,
        )


@pytest.mark.parametrize("shard", [None, "2"])
def test_monitor_accumulators_ride_checkpoints(tmp_path, shard):
    """r4 (VERDICT r3 #3): a monitored run killed mid-way resumes with
    its DFT running sums and probe rows intact — phasors and the probe
    series equal the uninterrupted run's (incl. under --pml --shard)."""
    import glob
    import os

    from fdtd_tpu.dft import DftConfig
    from fdtd_tpu.ops.cpml import PMLConfig

    import dataclasses as _dc

    p = _dc.replace(_box(10, 1e-12, 16, mode=Mode.COMPUTATION),
                    dtype="float64")
    pml = PMLConfig(cells=2)
    dftc = DftConfig((p.source.frequency,))
    probes = ProbeSet(((5, 5, 5),))
    kw = dict(pml=pml, dft=dftc, probes=probes, shard=shard,
              write_snapshots=False, backend="xla", log=lambda s: None)
    full = run_simulation(p, **kw)
    out = str(tmp_path / "ck")
    run_simulation(p, out_dir=out, checkpoint_every=8, **kw)
    for f in glob.glob(out + "/ckpt*.npz"):
        if int(os.path.basename(f)[4:-4]) > 8:
            os.remove(f)
    resumed = run_simulation(p, out_dir=out, resume=True, **kw)
    assert resumed.probes.values.shape == full.probes.values.shape
    np.testing.assert_allclose(resumed.probes.values,
                               full.probes.values, rtol=0, atol=1e-12)
    np.testing.assert_allclose(resumed.dft.phasors, full.dft.phasors,
                               rtol=0, atol=1e-7 * np.abs(
                                   full.dft.phasors).max())
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(resumed.state, c)),
            np.asarray(getattr(full.state, c)),
            rtol=0, atol=1e-12,
        )


def test_monitor_resume_without_stored_acc_warns(tmp_path):
    """Resuming a monitored run from an OLD (pre-r4, no-aux) checkpoint
    warns and covers only the resumed steps instead of silently mixing
    normalizations."""
    import glob
    import os

    from fdtd_tpu.dft import DftConfig

    p = _box(10, 1e-12, 16, mode=Mode.COMPUTATION)
    out = str(tmp_path / "ck")
    # checkpoint WITHOUT monitors -> no dft aux in the file
    run_simulation(p, out_dir=out, checkpoint_every=8,
                   write_snapshots=False, backend="xla",
                   log=lambda s: None)
    for f in glob.glob(out + "/ckpt*.npz"):
        if int(os.path.basename(f)[4:-4]) > 8:
            os.remove(f)
    warns = []
    res = run_simulation(p, out_dir=out, resume=True,
                         dft=DftConfig((p.source.frequency,)),
                         probes=ProbeSet(((5, 5, 5),)),
                         write_snapshots=False, backend="xla",
                         log=warns.append)
    assert any("no DFT accumulators" in w for w in warns)
    assert any("no probe rows" in w for w in warns)
    # probe series covers only the resumed tail, times aligned
    assert res.probes.values.shape[0] == res.probes.times.shape[0]
    assert res.probes.values.shape[0] < res.iterations
