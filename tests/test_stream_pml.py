"""Streaming-PML tier (ops/pallas_stream_pml.py, r5).

The CPML psi recursion rides the multi-step streaming wavefront: the
j/i packs pipeline like fields (per-level retained tails), the four
k-axis terms ride a full-k embed whose middle blocks redirect to the
dead block, and per-row (b, c) profiles stream as an Element window.
Pinned here (fp64, interpret mode — CPU-hermetic): parity vs the xla
CPML scan at every sweep depth, through odd trailing steps and chunk
boundaries (the stream<->packed conversions), at reassociation
tolerance (bit-exact in a single-device CPU env; the 8-virtual-device
test env compiles the two programs differently); the layout round
trips exactly; and the support gate admits/rejects the right
configs.  On-device reassociation-level parity and the measured
rate live in tools/probe_pml.py + docs/DESIGN.md.

Reference anchor: the open boundary extends the closed PEC cavity of
main.c:469-500 / description.pdf section 2.1.
"""

import dataclasses

import jax
import numpy as np
import pytest

from fdtd_tpu.params import Mode, Params, time_values
from fdtd_tpu.state import zeros
from fdtd_tpu.step import backend_adapters, scan_inputs
from fdtd_tpu.ops.cpml import PMLConfig, init_psi, make_pml_chunk_runner


def _comp_params(n, steps, dtype="float64"):
    return Params(
        length=n * 1e-3, width=n * 1e-3, height=n * 1e-3,
        spatial_step=1e-3, time_step=1e-12,
        simulation_time=steps * 1e-12, sampling_rate=10**9,
        mode=Mode.COMPUTATION, dtype=dtype,
    )


def _run_xla(p, cfg, xs):
    run_x = make_pml_chunk_runner(p, cfg, None)
    (want, psi_w), _ = run_x((zeros(p), init_psi(p, cfg)), xs, None)
    return want, psi_w


def _assert_equal(p, cfg, carry, want, psi_w, tag):
    # same-arithmetic parity: reassociation-level at fp64 (the xla scan
    # and the interpret-mode kernel are separately compiled programs;
    # measured max rel ~6e-13 over 40 steps under the 8-virtual-device
    # test env, bit-exact in a single-device CPU env) — the kernel-tier
    # test's tolerances
    from fdtd_tpu.ops.pallas_stream_pml import unpack_psi_stream

    _, restore = backend_adapters(p, "pallas_fused", None)
    got = restore(carry[0])
    psi_g = unpack_psi_stream(p, cfg, carry[1])
    kw = {"atol": 1e-14, "rtol": 1e-12}
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        a, b = np.asarray(getattr(got, c)), np.asarray(getattr(want, c))
        np.testing.assert_allclose(a, b, err_msg=f"{tag}/{c}", **kw)
    engaged = 0
    for name in type(psi_w).__dataclass_fields__:
        a = np.asarray(getattr(psi_g, name))
        b = np.asarray(getattr(psi_w, name))
        np.testing.assert_allclose(a, b, err_msg=f"{tag}/psi/{name}", **kw)
        engaged += float(np.abs(b).max()) > 0
    assert engaged == 12, tag  # every psi term genuinely engaged


@pytest.mark.slow
@pytest.mark.parametrize("s", [8, 4, 2])
def test_stream_pml_matches_xla(s):
    """Fields AND all 12 psi (through unpack) match the xla CPML scan
    over 40 steps at every sweep depth, to fp64 reassociation accuracy
    — the recursion rides the pipeline with the same arithmetic."""
    from fdtd_tpu.ops.pallas_stream_pml import (
        make_stream_pml_chunk_runner,
        pack_psi_stream,
    )

    n, steps = 24, 40
    p = _comp_params(n, steps)
    cfg = PMLConfig(cells=5)
    xs = scan_inputs(p, time_values(p)[:steps])
    want, psi_w = _run_xla(p, cfg, xs)

    prep, _ = backend_adapters(p, "pallas_fused", None)
    run_s = make_stream_pml_chunk_runner(p, cfg, None, interpret=True, s=s)
    carry, _ = run_s((prep(zeros(p)), pack_psi_stream(p, cfg, None)),
                     xs, None)
    _assert_equal(p, cfg, carry, want, psi_w, f"s={s}")


@pytest.mark.slow
@pytest.mark.parametrize("s", [4, 2])
def test_stream_pml_lossy_matches_xla(s):
    """r5b v2: lossy media (interior water block, homogeneous mu_r)
    stream the six ca/cb coefficient windows — fields, psi, all at the
    same reassociation tolerance vs the xla CPML scan."""
    from fdtd_tpu.state import water_block
    from fdtd_tpu.ops.pallas_stream_pml import (
        make_stream_pml_chunk_runner,
        pack_psi_stream,
    )

    n, steps = 24, 24
    p = _comp_params(n, steps)
    cfg = PMLConfig(cells=5)
    mats = water_block(p, lo=(0.35,) * 3, hi=(0.65,) * 3)
    xs = scan_inputs(p, time_values(p)[:steps])
    run_x = make_pml_chunk_runner(p, cfg, mats)
    (want, psi_w), _ = run_x((zeros(p), init_psi(p, cfg)), xs, None)

    prep, _ = backend_adapters(p, "pallas_fused", mats)
    run_s = make_stream_pml_chunk_runner(p, cfg, mats, interpret=True, s=s)
    carry, _ = run_s((prep(zeros(p)), pack_psi_stream(p, cfg, None)),
                     xs, None)
    _assert_equal(p, cfg, carry, want, psi_w, f"lossy/s={s}")


@pytest.mark.slow
def test_stream_pml_odd_tail_and_chunks():
    """Odd trailing steps (the per-step in-kernel tier through the
    exact stream<->packed round trip) and chunk boundaries (engaged psi
    re-entering a fresh sweep) match the uninterrupted xla run:
    43 = 5*8 + 3 in one call, then the same steps as 20 + 23."""
    from fdtd_tpu.ops.pallas_stream_pml import (
        make_stream_pml_chunk_runner,
        pack_psi_stream,
    )

    n, steps = 24, 43
    p = _comp_params(n, steps)
    cfg = PMLConfig(cells=5)
    tv = time_values(p)[:steps]
    want, psi_w = _run_xla(p, cfg, scan_inputs(p, tv))

    prep, _ = backend_adapters(p, "pallas_fused", None)
    run_s = make_stream_pml_chunk_runner(p, cfg, None, interpret=True, s=8)
    carry, _ = run_s((prep(zeros(p)), pack_psi_stream(p, cfg, None)),
                     scan_inputs(p, tv), None)
    _assert_equal(p, cfg, carry, want, psi_w, "odd-tail")

    carry = (prep(zeros(p)), pack_psi_stream(p, cfg, None))
    carry, _ = run_s(carry, scan_inputs(p, tv[:20]), None)
    carry, _ = run_s(carry, scan_inputs(p, tv[20:]), None)
    _assert_equal(p, cfg, carry, want, psi_w, "chunked")


def test_stream_psi_roundtrip_and_conversions():
    """pack_psi_stream/unpack_psi_stream is a bit-exact round trip on
    an engaged computation-mode psi state, and the odd-step conversions
    (stream<->packed) round trip exactly too."""
    from fdtd_tpu.ops.cpml_kernel import pack_psi
    from fdtd_tpu.ops.pallas_stream_pml import (
        pack_psi_stream,
        packed_to_stream,
        stream_to_packed,
        unpack_psi_stream,
    )

    n, steps = 20, 24
    p = _comp_params(n, steps)
    cfg = PMLConfig(cells=5)
    xs = scan_inputs(p, time_values(p)[:steps])
    _, psi = _run_xla(p, cfg, xs)

    ps = pack_psi_stream(p, cfg, psi)
    back = unpack_psi_stream(p, cfg, ps)
    for name in type(psi).__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(back, name)), np.asarray(getattr(psi, name)),
            err_msg=name)

    pp = stream_to_packed(p, cfg, ps)
    want_pp = pack_psi(p, cfg, psi)
    for f in ("h_j", "h_i", "e_j", "e_i", "hxy_s",
              "hx_z", "hy_z", "ex_z", "ey_z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pp, f)), np.asarray(getattr(want_pp, f)),
            err_msg=f)
    ps2 = packed_to_stream(p, cfg, pp)
    for f in ("kp", "h_j", "h_i", "e_j", "e_i"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ps2, f)), np.asarray(getattr(ps, f)),
            err_msg=f)


def test_stream_pml_supported_gates():
    """The admission gate: computation-mode vacuum AND an interior
    lossy load pass; validation mode, heterogeneous mu_r, a load
    overlapping the absorber, fp64, and slab-overlapping patches are
    all rejected."""
    import numpy as np

    from fdtd_tpu.state import Materials, water_block
    from fdtd_tpu.ops.pallas_stream_pml import stream_pml_supported

    p = _comp_params(32, 10, dtype="float32")
    assert stream_pml_supported(p, PMLConfig(cells=5))
    # lossy media stream the ca/cb windows (r5b v2)
    mats = water_block(p, lo=(0.4,) * 3, hi=(0.6,) * 3)
    assert stream_pml_supported(p, PMLConfig(cells=5), mats)
    # validation mode: strips are nonzero — gated out
    pv = dataclasses.replace(p, mode=Mode.VALIDATION)
    assert not stream_pml_supported(pv, PMLConfig(cells=5))
    # heterogeneous mu_r keeps the per-step tier
    K, J, I = p.maxk, p.maxj, p.maxi
    mu = np.ones((K, J, I))
    mu[14:18, 14:18, 14:18] = 3.0
    assert not stream_pml_supported(
        p, PMLConfig(cells=5),
        Materials(eps_r=np.ones((K, J, I)), sigma=None, mu_r=mu))
    # a load overlapping the absorber loses slab-constant factors
    sg = np.zeros((K, J, I))
    sg[0:3, :, :] = 0.1
    assert not stream_pml_supported(
        p, PMLConfig(cells=5),
        Materials(eps_r=np.ones((K, J, I)), sigma=sg, mu_r=None))
    # fp64 stays on the xla path (fast_pml_supported)
    assert not stream_pml_supported(_comp_params(32, 10), PMLConfig(cells=5))
    # a slab deep enough to reach the source patch is rejected
    assert not stream_pml_supported(p, PMLConfig(cells=13))


@pytest.mark.slow
def test_stream_pml_runner_dispatch(tmp_path, monkeypatch):
    """run_simulation(pml=..., backend="pallas_fused") now dispatches
    the streaming tier for computation-mode vacuum (matches xla to fp32
    reassociation accuracy); FDTD_PML_STREAM=0 forces the per-step
    in-kernel tier, which agrees at the same tolerance; checkpoint/
    resume through the streaming tier reproduces the uninterrupted run
    bit-exactly (canonical psi in the checkpoint — cross-tier layout)."""
    from fdtd_tpu.runner import run_simulation

    n = 20
    p = dataclasses.replace(_comp_params(n, 30, dtype="float32"),
                            sampling_rate=10)
    cfg = PMLConfig(cells=4)
    ra = run_simulation(p, out_dir=str(tmp_path / "x"), pml=cfg,
                        backend="xla", write_snapshots=False,
                        log=lambda s: None)
    msgs: list[str] = []
    rb = run_simulation(p, out_dir=str(tmp_path / "s"), pml=cfg,
                        backend="pallas_fused", write_snapshots=False,
                        log=msgs.append)
    assert not msgs
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_allclose(
            np.asarray(getattr(rb.state, c)), np.asarray(getattr(ra.state, c)),
            atol=1e-6, rtol=1e-4, err_msg=c)

    monkeypatch.setenv("FDTD_PML_STREAM", "0")
    rk = run_simulation(p, out_dir=str(tmp_path / "k"), pml=cfg,
                        backend="pallas_fused", write_snapshots=False,
                        log=lambda s: None)
    monkeypatch.delenv("FDTD_PML_STREAM")
    np.testing.assert_allclose(np.asarray(rk.state.ey),
                               np.asarray(rb.state.ey),
                               atol=1e-6, rtol=1e-4)

    # checkpoint/resume within the streaming tier: bit-exact
    p_half = dataclasses.replace(p, simulation_time=15e-12)
    run_simulation(p_half, out_dir=str(tmp_path / "part"), pml=cfg,
                   backend="pallas_fused", checkpoint_every=10,
                   write_snapshots=False, log=lambda s: None)
    rr = run_simulation(p, out_dir=str(tmp_path / "part"), pml=cfg,
                        backend="pallas_fused", resume=True,
                        checkpoint_every=10, write_snapshots=False,
                        log=lambda s: None)
    for c in ["ex", "ey", "ez", "hx", "hy", "hz"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(rr.state, c)), np.asarray(getattr(rb.state, c)),
            err_msg=f"resume/{c}")


@pytest.mark.slow
@pytest.mark.parametrize("steps", [20, 22])
def test_stream_pml_dft_matches_xla(steps):
    """The open-boundary in-kernel DFT rides the streaming-PML sweep:
    fields/psi at fp64 reassociation accuracy and phasors at the fp32-
    accumulator tolerance of the in-kernel DFT tier (<=2e-7, the r4
    pin) vs the xla monitored PML scan — incl. odd trailing steps
    (the per-step tier + blocked accumulation pass)."""
    from fdtd_tpu.dft import DftConfig, dft_weights, zero_dft_acc
    from fdtd_tpu.ops.pallas_stream_pml import (
        make_stream_pml_dft_chunk_runner,
        pack_psi_stream,
    )

    n = 24
    p = _comp_params(n, steps)
    cfg = PMLConfig(cells=5)
    dftc = DftConfig((2.45e10,))
    tv = time_values(p)[:steps]
    ts, amps = scan_inputs(p, tv)
    cw, sw = dft_weights(dftc, np.asarray(tv))
    xs = (ts, amps, cw, sw)
    run_x = make_pml_chunk_runner(p, cfg, None, dft=dftc)
    (want, psi_w), _pw, dacc_w, _ = run_x(
        (zeros(p), init_psi(p, cfg)), xs, None, zero_dft_acc(p, dftc))

    prep, _ = backend_adapters(p, "pallas_fused", None)
    run_s = make_stream_pml_dft_chunk_runner(p, cfg, None, dftc,
                                             interpret=True, s=4)
    carry, _pw, dacc_g, _ = run_s(
        (prep(zeros(p)), pack_psi_stream(p, cfg, None)), xs, None,
        zero_dft_acc(p, dftc))
    _assert_equal(p, cfg, carry, want, psi_w, f"dft/{steps}")
    for i, name in enumerate(("re", "im")):
        a, b = np.asarray(dacc_g[i]), np.asarray(dacc_w[i])
        sc = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / sc < 2e-7, (steps, name)
    assert float(np.abs(np.asarray(dacc_w[0])).max()) > 0
