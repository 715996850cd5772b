"""CPML absorbing boundaries on the two-pass Pallas fast path.

:mod:`fdtd_tpu.ops.cpml` implements CPML as a pure additive correction
over the unchanged curl updates (kappa = 1): after the H half-step the
six H-pass memory variables advance and add ``+-f * psi`` over the slab
rows; after the E half-step the six E-pass variables do the same with
``+-cb * psi``.  Nothing about that formulation needs the *curl updates*
to run in jnp — so this module runs them as the two-pass Pallas kernels
(:func:`fdtd_tpu.ops.pallas_fused.build_twopass_calls`, the same kernels
behind ``--backend pallas_fused``) and applies the corrections as XLA
slab updates between the passes, directly on the stripped hot-path
layout.  The correction traffic scales with the PML volume
(~12 * cells / N of the state), so the step stays kernel-bound.

Step order (identical numerics to :func:`fdtd_tpu.ops.cpml.make_pml_step`):

    [inject source] -> H kernel -> Hx-strip advance -> h_correct
    -> [inject source again] -> E kernel -> e_correct

The second injection restores the source-patch H values the psi add
touched, exactly like the xla path's second ``apply_source`` overwriting
``update_h + h_correct`` on the patch (reference double application:
main.c:770-778).

Scope: the correction factors must be CONSTANT over the slab rows —
always true in vacuum, and true with materials whenever the load keeps
clear of the absorber (the standard setup; :func:`fast_pml_supported`
checks it host-side).  A load overlapping the slabs falls back to the
xla path.

Temporal-blocked and streaming kernels advance multiple steps inside one
kernel sweep, so the per-half-step psi recursion cannot interleave; the
two-pass composition is the designed PML fast path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..params import Mode, Params
from ..state import Materials, UpdateCoefs, update_coefs
from .cpml import (
    PMLConfig,
    PsiState,
    _TERMS,
    _check_cfg,
    _shifted,
    _slab_slices,
    _update_regions,
    build_plan,
)
from .pallas_fused import (
    D,
    StrippedState,
    advance_hx_strip,
    build_twopass_calls,
    dims,
    make_inject_source,
    tile_k,
)

_STRIPS = {"ey": "ey_s", "ez": "ez_s", "hx": "hx_s"}


def slab_factor_constants(p: Params, cfg: PMLConfig, coefs: UpdateCoefs):
    """Per-term correction factor constants, or None when unsupported.

    The xla path multiplies each psi by the target component's update
    factor *at the slab cells* (``cb_*`` arrays for the E pass, ``hf_*``
    for heterogeneous mu_r).  When those arrays are constant over every
    slab sub-region the multiply is a scalar and the fast path applies
    bit-identically; a material overlapping the absorber makes them
    non-constant and returns None (xla fallback)."""
    regions = _update_regions(p)
    het = coefs.heterogeneous_mu
    out = {}
    host = {}
    for name, target, _sign, axis, _src, e_pass in _TERMS:
        lo_sl, hi_sl = _slab_slices(regions[target], axis, cfg.cells)
        if e_pass:
            coef = getattr(coefs, f"cb_{target[1]}")
        elif het:
            coef = getattr(coefs, f"hf_{target[1]}")
        else:
            coef = coefs.h_factor
        if isinstance(coef, (int, float)):
            out[name] = float(coef)
            continue
        key = f"cb_{target[1]}" if e_pass else f"hf_{target[1]}"
        if key not in host:
            host[key] = np.asarray(coef)
        arr = host[key]
        vals = np.concatenate([arr[lo_sl].ravel(), arr[hi_sl].ravel()])
        if vals.size == 0 or not (vals == vals[0]).all():
            return None
        out[name] = float(vals[0])
    return out


def fast_pml_supported(p: Params, cfg: PMLConfig,
                       materials: Materials | None = None,
                       coefs: UpdateCoefs | None = None) -> bool:
    """True when the Pallas-fast CPML composition applies (see
    :func:`slab_factor_constants`; fp64 stays on the xla path — the TPU
    kernels are fp32/bf16)."""
    if jnp.dtype(p.dtype) == jnp.float64:
        return False
    try:
        _check_cfg(p, cfg)
    except ValueError:
        return False
    if coefs is None:
        coefs = update_coefs(p, materials)
    return slab_factor_constants(p, cfg, coefs) is not None


def _slab_add(arr, ks, js, is_, val, dt):
    """``arr[ks, js, is_] += val`` via slice + add + dynamic_update_slice.

    A static-slice ``.at[].add`` lowers to an XLA *scatter* at the HLO
    level; the explicit slice/add/DUS form keeps the identical
    per-element arithmetic (same values, same dtype, same add order —
    bit-equal) and lowers to copies.  Measured on v5e at 256^3: this
    rewrite did NOT move the composition rate (1.31 G before and after)
    — the real tax is tile-granularity RMW on the minor-axis slabs (a
    10-lane i-slab slice touches full (8, 128) tiles, ~13x traffic
    inflation, and the first update per target copies the whole field)
    — so the shipped fast path applies the corrections *inside* the
    two-pass kernels (:mod:`fdtd_tpu.ops.cpml_kernel`) where the field
    tiles are already in VMEM.  This XLA form remains the fallback
    composition for the sharded path and the correctness oracle."""
    cur = lax.slice(arr, (ks.start, js.start, is_.start),
                    (ks.stop, js.stop, is_.stop))
    return lax.dynamic_update_slice(
        arr, (cur + val).astype(dt), (ks.start, js.start, is_.start))


def _sget(p: Params, bulks: dict, st: StrippedState, name, sl):
    """Read the canonical slice ``sl`` from the stripped layout.

    k maps to storage row k + D; the i = maxi column comes from the
    strip arrays (Ey/Ez/Hx) or is an exact zero (Ex/Hy/Hz pad column)."""
    ks, js, is_ = sl
    I = p.maxi
    ksl = slice(ks.start + D, ks.stop + D)
    bulk = bulks[name]
    if is_.stop <= I:
        return bulk[ksl, js, is_]
    if name in _STRIPS:
        col = getattr(st, _STRIPS[name])[ksl, js, :]
    else:
        col = jnp.zeros(
            (ks.stop - ks.start, js.stop - js.start, 1), bulk.dtype
        )
    if is_.start >= I:
        return col
    return jnp.concatenate([bulk[ksl, js, is_.start : I], col], axis=2)


def make_stripped_cpml_corrections(p: Params, cfg: PMLConfig,
                                   coefs: UpdateCoefs, dtype=None,
                                   terms: tuple[str, ...] | None = None):
    """(h_correct, e_correct) on ``(StrippedState, psi)``.

    Same per-element arithmetic, term order, and add order as
    :func:`fdtd_tpu.ops.cpml.make_cpml_corrections` — only the array
    layout differs — so the composition bit-matches the xla PML path
    wherever the kernels bit-match the jnp curl path.

    ``terms`` restricts the correction to a subset of the 12 _TERMS
    names (default all); the in-kernel tier (:mod:`fdtd_tpu.ops.
    cpml_kernel`) uses this for the four k-axis terms it applies
    *after* its passes — ``psi`` then only needs attributes for the
    filtered names (any dataclass works)."""
    _check_cfg(p, cfg)
    dt = jnp.dtype(dtype or p.dtype)
    npml = cfg.cells
    plan = build_plan(p, cfg, dt)
    fac = slab_factor_constants(p, cfg, coefs)
    if fac is None:
        raise ValueError(
            "CPML fast path needs slab-constant correction factors "
            "(materials overlap the absorber); use the xla path"
        )
    fac = {n: dt.type(v) for n, v in fac.items()}
    I = p.maxi

    def _apply(st: StrippedState, psi, e_pass: bool):
        # sources are never targets within a pass (H pass reads E, E pass
        # reads the just-updated H), so entry-time source reads are exact
        bulks = {n: getattr(st, n) for n in ("ex", "ey", "ez", "hx", "hy", "hz")}
        fields = dict(bulks)
        hx_s = st.hx_s
        ups = {}
        for name, target, sign, axis, src, _e in [
            t for t in _TERMS
            if t[5] == e_pass and (terms is None or t[0] in terms)
        ]:
            lo_sl, hi_sl, _sign, _axis, _src, _tg, b, c = plan[name]
            if e_pass:
                d_lo = _sget(p, bulks, st, src, lo_sl) - _sget(
                    p, bulks, st, src, _shifted(lo_sl, axis, -1))
                d_hi = _sget(p, bulks, st, src, hi_sl) - _sget(
                    p, bulks, st, src, _shifted(hi_sl, axis, -1))
            else:
                d_lo = _sget(p, bulks, st, src, _shifted(lo_sl, axis, 1)) - _sget(
                    p, bulks, st, src, lo_sl)
                d_hi = _sget(p, bulks, st, src, _shifted(hi_sl, axis, 1)) - _sget(
                    p, bulks, st, src, hi_sl)
            diff = jnp.concatenate([d_lo, d_hi], axis=axis)
            pnew = b * getattr(psi, name) + c * diff
            ups[name] = pnew
            lo_p = lax.slice_in_dim(pnew, 0, npml, axis=axis)
            hi_p = lax.slice_in_dim(pnew, npml, 2 * npml, axis=axis)
            f = fac[name]
            for sl, part in ((lo_sl, lo_p), (hi_sl, hi_p)):
                ks, js, is_ = sl
                ksl = slice(ks.start + D, ks.stop + D)
                val = (sign * f * part).astype(dt)
                if is_.stop <= I:
                    fields[target] = _slab_add(
                        fields[target], ksl, js, is_, val, dt)
                else:
                    # the target slab spans the i = maxi strip column (Hx)
                    w = I - is_.start
                    fields[target] = _slab_add(
                        fields[target], ksl, js, slice(is_.start, I),
                        val[:, :, :w], dt)
                    hx_s = _slab_add(hx_s, ksl, js,
                                     slice(0, hx_s.shape[2]),
                                     val[:, :, w:], dt)
        return (
            dataclasses.replace(st, hx_s=hx_s, **fields),
            dataclasses.replace(psi, **ups),
        )

    def h_correct(st: StrippedState, psi):
        return _apply(st, psi, e_pass=False)

    def e_correct(st: StrippedState, psi):
        return _apply(st, psi, e_pass=True)

    return h_correct, e_correct


def make_pml_fast_step(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                       interpret: bool | None = None):
    """One CPML leapfrog step on the stripped layout:
    ``step((st, psi), (t, amp)) -> (st, psi)``; curls by the two-pass
    Pallas kernels, psi corrections as XLA slab updates between them."""
    from ..source import make_source_plan

    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    S, _J1p, _Ib = dims(p)
    tk = tile_k(p, lossy)
    nk = (S - D) // tk
    h_call, e_call, _ = build_twopass_calls(p, coefs, S, nk, interpret, tk=tk)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    inject = p.mode == Mode.COMPUTATION
    inj = (
        make_inject_source(p, make_source_plan(p), dtype) if inject else None
    )
    h_correct, e_correct = make_stripped_cpml_corrections(p, cfg, coefs)
    zoff = np.zeros((1, 2), np.int32)  # host constant (axon lowering hazard)

    def step(carry, x):
        st, psi = carry
        _t, amp = x
        if inject:
            st = inj(st, amp)
        hextra = (st.hf_x, st.hf_y, st.hf_z) if het else ()
        hx, hy, hz = h_call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, *hextra,
        )
        st = dataclasses.replace(st, hx=hx, hy=hy, hz=hz)
        # strip curl-add before the psi add: matches the xla path's
        # update_h-then-correct float ordering on the i=maxi column
        st = dataclasses.replace(st, hx_s=advance_hx_strip(p, st, f_h, het))
        st, psi = h_correct(st, psi)
        if inject:
            st = inj(st, amp)  # restore the patch (second application)
        eextra = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy else ()
        )
        ex, ey, ez = e_call(
            jnp.asarray(zoff), st.hx, st.hy, st.hz, st.ex, st.ey, st.ez,
            *eextra,
        )
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez)
        st, psi = e_correct(st, psi)
        return (st, psi)

    return step


def make_pml_fast_chunk_runner(p: Params, cfg: PMLConfig,
                               materials: Materials | None = None,
                               accumulate_power: bool = False,
                               interpret: bool | None = None):
    """Jitted ``run((st, psi), xs, power) -> ((st, psi), power)``.

    The fast-path analogue of :func:`fdtd_tpu.ops.cpml.make_pml_chunk_runner`
    with the Pallas donation contract (the carry is consumed; pass a
    prep-fresh (stripped state, psi) per run).  SAR accumulation reads
    the state-embedded sigma slab per step, as on the closed-cavity fast
    path."""
    from .. import diagnostics
    from ..step import _huge_state

    coefs = update_coefs(p, materials)
    step = make_pml_fast_step(p, cfg, coefs, interpret)
    dt_step = p.time_step
    K, J = p.maxk, p.maxj

    def _power_inc(st, acc):
        sg = st.sigma_c[D : D + K, :J]
        inc = diagnostics.power_deposition_stripped(p, st, sg)
        return acc + (inc * dt_step).astype(acc.dtype)

    if _huge_state(p):
        # scan double-buffers the donated carry (see step.make_chunk_runner);
        # at 1024^3-class sizes drive single donated steps from the host
        @functools.partial(
            jax.jit, donate_argnums=(0, 1) if accumulate_power else (0,)
        )
        def one(carry, acc, t, amp):
            carry = step(carry, (t, amp))
            if accumulate_power:
                acc = _power_inc(carry[0], acc)
            return carry, acc

        def run_host(carry, xs, power_acc=None):
            ts, amps = np.asarray(xs[0]), np.asarray(xs[1])
            for i in range(ts.shape[0]):
                carry, power_acc = one(carry, power_acc, ts[i], amps[i])
            return carry, power_acc

        return run_host

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc=None):
        def body(c, x):
            carry, acc = c
            carry = step(carry, x)
            if accumulate_power:
                acc = _power_inc(carry[0], acc)
            return (carry, acc), None

        (carry, acc), _ = jax.lax.scan(body, (carry, power_acc), xs)
        return carry, acc

    return run
