"""Temporally-blocked kernel parity (interpret mode)."""

import dataclasses

import numpy as np
import pytest

from fdtd_tpu.params import Mode, time_values
from fdtd_tpu.state import init_validation, zeros
from fdtd_tpu.step import backend_adapters, make_chunk_runner, scan_inputs

COMPONENTS = ["ex", "ey", "ez", "hx", "hy", "hz"]


@pytest.mark.parametrize("sgrp", [2, 3, 4, 5])
@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_temporal_matches_xla(tiny_params, monkeypatch, sgrp, mode):
    monkeypatch.setenv("FDTD_TEMPORAL_STEPS", str(sgrp))
    p = dataclasses.replace(tiny_params, dtype="float32", mode=mode)
    s0 = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    run_ref = make_chunk_runner(p)
    run_tmp = make_chunk_runner(p, backend="pallas_temporal")
    prep, rest = backend_adapters(p, "pallas_temporal")
    xs = scan_inputs(p, time_values(p)[:9])  # odd count exercises the tail
    want, _ = run_ref(s0, xs, None)
    got = rest(run_tmp(prep(s0), xs, None)[0])
    for c in COMPONENTS:
        g = np.asarray(getattr(got, c))[:, :, : p.maxi]
        w = np.asarray(getattr(want, c))[:, :, : p.maxi]
        # s<=3 is bit-exact; deeper unrolls reassociate at the 1-ulp level
        atol = 0.0 if sgrp <= 3 else 1e-6
        np.testing.assert_allclose(g, w, atol=atol, rtol=0, err_msg=f"s={sgrp}/{c}")


def test_temporal_rejects_bf16(tiny_params):
    p = dataclasses.replace(tiny_params, dtype="bfloat16")
    with pytest.raises(Exception):
        make_chunk_runner(p, backend="pallas_temporal")


def test_temporal_full_validation_physics(default_params, monkeypatch):
    """The headline backend must pass the physics bar end-to-end on the
    reference's shipped scene (50^3, 200 steps)."""
    import dataclasses

    from fdtd_tpu import analytic
    from fdtd_tpu.params import time_values as tv

    monkeypatch.setenv("FDTD_TEMPORAL_STEPS", "4")
    p = dataclasses.replace(default_params, dtype="float32")
    s0 = init_validation(p)
    run = make_chunk_runner(p, backend="pallas_temporal")
    prep, rest = backend_adapters(p, "pallas_temporal")
    ts = tv(p)
    xs = scan_inputs(p, ts)
    got = rest(run(prep(s0), xs, None)[0])
    perrs = analytic.peak_normalized_error(p, got, float(ts[-1]))
    assert perrs["ey"] < 0.01 and perrs["hx"] < 0.01 and perrs["hz"] < 0.01, perrs
