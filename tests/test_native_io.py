"""Native (C++) IO component tests."""

import numpy as np
import pytest

from fdtd_tpu.io.native import native_available, write_vtr_native
from fdtd_tpu.io.vtr import read_vtr_cell_arrays, write_vtr

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no toolchain)"
)


def test_native_writer_byte_identical_to_python(tmp_path):
    rng = np.random.default_rng(7)
    x, y, z = np.arange(9.0), np.arange(6.0), np.arange(4.0)
    arrays = {
        "ex": rng.normal(size=(3, 5, 8)),
        "hy": rng.normal(size=(3, 5, 8)).astype(np.float32),
        "aEy": rng.normal(size=(3, 5, 8)),
    }
    pn = str(tmp_path / "n.vtr")
    pp = str(tmp_path / "p.vtr")
    assert write_vtr_native(pn, (x, y, z), arrays)
    write_vtr(pp, (x, y, z), arrays)
    assert open(pn, "rb").read() == open(pp, "rb").read()

    got = read_vtr_cell_arrays(pn)
    np.testing.assert_allclose(got["ex"], arrays["ex"])
    np.testing.assert_allclose(got["hy"], arrays["hy"], rtol=1e-6)


def test_native_writer_shape_check(tmp_path):
    x, y, z = np.arange(3.0), np.arange(3.0), np.arange(3.0)
    with pytest.raises(ValueError):
        write_vtr_native(str(tmp_path / "bad.vtr"), (x, y, z), {"ex": np.zeros((5, 5, 5))})


def test_native_raw_round_trip(tmp_path):
    from fdtd_tpu.io.native import read_raw, write_raw_native

    rng = np.random.default_rng(11)
    arrays = {
        "ex": rng.normal(size=(4, 5, 6)).astype(np.float32),
        "t": np.asarray([1.5e-11]),
    }
    path = str(tmp_path / "c.fdtdraw")
    assert write_raw_native(path, arrays)
    got = read_raw(path)
    np.testing.assert_array_equal(got["ex"], arrays["ex"].ravel())
    np.testing.assert_array_equal(got["t"], arrays["t"])
