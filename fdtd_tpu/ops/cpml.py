"""Convolutional PML (CPML) absorbing boundaries — capability extension.

The reference is a CLOSED PEC cavity: its E-update loop bounds leave
tangential E on all six faces untouched (reference: main.c:469-500,
description.pdf section 2.1), so waves reflect forever.  This module adds
the standard CPML outer absorber (Roden & Gedney, "Convolutional PML
(CPML): an efficient FDTD implementation of the CFS-PML for arbitrary
media", 2000; Taflove & Hagness ch. 7) so open-boundary problems —
radiation, ports, scattering — can run.  The PML is *backed by* the
existing implicit PEC wall, as is standard.

Formulation (kappa = 1, documented simplification): every spatial
difference Delta_w(u) feeding a curl gains a memory variable

    psi^{n+1} = b_w psi^n + c_w Delta_w(u)
    b_w = exp(-(sigma_w + alpha_w) dt / EPSILON)
    c_w = sigma_w / (sigma_w + alpha_w) * (b_w - 1)

and the field update adds f * psi (H pass) or cb * psi (E pass) on top of
the unchanged curl term.  sigma_w is graded polynomially over the
``cells``-deep slab at each face, sampled at each component's own
staggered position along the PML axis (integer for E, half-integer for
H); with kappa = 1 the interior update needs no 1/kappa scaling, so the
existing :mod:`fdtd_tpu.ops.curl` updates stay bit-identical and CPML is
a pure additive correction.  b = 1, c = 0 outside the slabs, so psi is
identically zero there and XLA's fused elementwise pass is the only
cost.

This is the ground-truth (xla-backend) implementation; the Pallas kernel
families keep the reference's closed-cavity production scope.  psi
arrays are update-region sized (12 arrays ~ 2x the field state); a
slab-restricted layout is the documented future optimization.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON, MU
from ..params import Params
from ..state import FieldState, UpdateCoefs
from .curl import _c

ETA0 = float(np.sqrt(MU / EPSILON))  # free-space impedance (~376.73 ohm)


@dataclasses.dataclass(frozen=True)
class PMLConfig:
    """CPML absorber configuration.

    ``cells``: slab depth at each of the six faces (10 is the standard
    sweet spot).  ``m``: polynomial grading order.  ``sigma_scale``:
    multiplies the textbook optimum sigma_max = 0.8 (m+1) / (eta0 dx).
    ``alpha``: CFS alpha (S/m), constant across the slab; 0 disables the
    complex-frequency shift (fine for propagating waves).
    """

    cells: int = 10
    m: float = 3.0
    sigma_scale: float = 1.0
    alpha: float = 0.0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "hx_z", "hx_y", "hy_x", "hy_z", "hz_y", "hz_x",
        "ex_y", "ex_z", "ey_z", "ey_x", "ez_x", "ez_y",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class PsiState:
    """The 12 CPML memory variables, one per curl difference term.

    ``<comp>_<axis>`` is the psi for component ``comp``'s difference
    along ``axis``; each has the exact shape of that component's update
    region (see :mod:`fdtd_tpu.ops.curl` loop bounds).
    """

    hx_z: jax.Array
    hx_y: jax.Array
    hy_x: jax.Array
    hy_z: jax.Array
    hz_y: jax.Array
    hz_x: jax.Array
    ex_y: jax.Array
    ex_z: jax.Array
    ey_z: jax.Array
    ey_x: jax.Array
    ez_x: jax.Array
    ez_y: jax.Array


def _profile(pos: np.ndarray, extent: int, p: Params, cfg: PMLConfig):
    """(b, c) fp64 1-D CPML recursion coefficients at positions ``pos``.

    ``pos``: the component's coordinates along the PML axis in cell
    units (integer for E, half-integer for H).  ``extent``: the domain
    size along the axis (walls at 0 and extent).  Outside the two
    ``cfg.cells``-deep slabs sigma = 0 gives (b, c) = (1, 0).
    """
    d = np.maximum(cfg.cells - pos, pos - (extent - cfg.cells)) / cfg.cells
    d = np.clip(d, 0.0, 1.0)
    sigma_max = cfg.sigma_scale * 0.8 * (cfg.m + 1) / (ETA0 * p.spatial_step)
    sigma = sigma_max * d**cfg.m
    tot = sigma + cfg.alpha
    b = np.exp(-tot * p.time_step / EPSILON)
    with np.errstate(invalid="ignore", divide="ignore"):
        c = np.where(tot > 0.0, sigma / np.where(tot > 0, tot, 1.0) * (b - 1.0), 0.0)
    return b, c


def _bc(pos, extent, p, cfg, axis, dtype):
    """Broadcastable (b, c) pair along ``axis`` of a 3-D array."""
    b, c = _profile(np.asarray(pos, np.float64), extent, p, cfg)
    shape = [1, 1, 1]
    shape[axis] = len(b)
    return (jnp.asarray(b, dtype).reshape(shape),
            jnp.asarray(c, dtype).reshape(shape))


def init_psi(p: Params, dtype=None) -> PsiState:
    """Zero memory variables (region shapes from the curl loop bounds)."""
    K, J, I = p.maxk, p.maxj, p.maxi
    dt = jnp.dtype(dtype or p.dtype)
    z = lambda *s: jnp.zeros(s, dt)
    return PsiState(
        hx_z=z(K, J, I + 1), hx_y=z(K, J, I + 1),
        hy_x=z(K, J + 1, I), hy_z=z(K, J + 1, I),
        hz_y=z(K + 1, J, I), hz_x=z(K + 1, J, I),
        ex_y=z(K - 1, J - 1, I), ex_z=z(K - 1, J - 1, I),
        ey_z=z(K - 1, J, I - 1), ey_x=z(K - 1, J, I - 1),
        ez_x=z(K, J - 1, I - 1), ez_y=z(K, J - 1, I - 1),
    )


def make_cpml_corrections(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                          dtype=None):
    """Build ``(h_correct, e_correct)`` closures.

    ``h_correct(state_after_update_h, psi) -> (state, psi)`` updates the
    six H-pass memory variables from the (unchanged) E fields and adds
    ``f * psi`` over each H component's update region;``e_correct`` is
    the E-pass analogue adding ``cb * psi``.  Correction-after-update is
    algebraically identical to the fused textbook form because the curl
    terms are untouched (kappa = 1).
    """
    K, J, I = p.maxk, p.maxj, p.maxi
    dt = jnp.dtype(dtype or p.dtype)
    if cfg.cells < 1:
        raise ValueError("PML needs cells >= 1")
    if 2 * cfg.cells >= min(K, J, I):
        raise ValueError(
            f"PML slabs ({cfg.cells} cells/face) overlap: grid is "
            f"({K}, {J}, {I}) cells"
        )

    half = lambda n: np.arange(n, dtype=np.float64) + 0.5
    inner = lambda n: np.arange(1, n, dtype=np.float64)

    # H-pass profiles (half-integer positions along the PML axis)
    bz_h, cz_h = _bc(half(K), K, p, cfg, 0, dt)
    by_h, cy_h = _bc(half(J), J, p, cfg, 1, dt)
    bx_h, cx_h = _bc(half(I), I, p, cfg, 2, dt)
    # E-pass profiles (integer positions 1..n-1; the walls are PEC)
    bz_e, cz_e = _bc(inner(K), K, p, cfg, 0, dt)
    by_e, cy_e = _bc(inner(J), J, p, cfg, 1, dt)
    bx_e, cx_e = _bc(inner(I), I, p, cfg, 2, dt)

    f_scalar = dt.type(coefs.h_factor)
    shx = (slice(0, K), slice(0, J), slice(0, I + 1))
    shy = (slice(0, K), slice(0, J + 1), slice(0, I))
    shz = (slice(0, K + 1), slice(0, J), slice(0, I))
    sx = (slice(1, K), slice(1, J), slice(0, I))
    sy = (slice(1, K), slice(0, J), slice(1, I))
    sz = (slice(0, K), slice(1, J), slice(1, I))
    fx = coefs.hf_x[shx] if coefs.heterogeneous_mu else f_scalar
    fy = coefs.hf_y[shy] if coefs.heterogeneous_mu else f_scalar
    fz = coefs.hf_z[shz] if coefs.heterogeneous_mu else f_scalar

    def h_correct(s: FieldState, psi: PsiState):
        ex, ey, ez = s.ex, s.ey, s.ez
        # the same differences curl.update_h consumed (E is untouched)
        dz_ey = ey[1 : K + 1, :J, : I + 1] - ey[:K, :J, : I + 1]
        dy_ez = ez[:K, 1 : J + 1, : I + 1] - ez[:K, :J, : I + 1]
        dx_ez = ez[:K, : J + 1, 1 : I + 1] - ez[:K, : J + 1, :I]
        dz_ex = ex[1 : K + 1, : J + 1, :I] - ex[:K, : J + 1, :I]
        dy_ex = ex[: K + 1, 1 : J + 1, :I] - ex[: K + 1, :J, :I]
        dx_ey = ey[: K + 1, :J, 1 : I + 1] - ey[: K + 1, :J, :I]
        psi = PsiState(
            hx_z=bz_h * psi.hx_z + cz_h * dz_ey,
            hx_y=by_h * psi.hx_y + cy_h * dy_ez,
            hy_x=bx_h * psi.hy_x + cx_h * dx_ez,
            hy_z=bz_h * psi.hy_z + cz_h * dz_ex,
            hz_y=by_h * psi.hz_y + cy_h * dy_ex,
            hz_x=bx_h * psi.hz_x + cx_h * dx_ey,
            ex_y=psi.ex_y, ex_z=psi.ex_z, ey_z=psi.ey_z,
            ey_x=psi.ey_x, ez_x=psi.ez_x, ez_y=psi.ez_y,
        )
        hx = s.hx.at[shx].add((fx * (psi.hx_z - psi.hx_y)).astype(dt))
        hy = s.hy.at[shy].add((fy * (psi.hy_x - psi.hy_z)).astype(dt))
        hz = s.hz.at[shz].add((fz * (psi.hz_y - psi.hz_x)).astype(dt))
        return FieldState(s.ex, s.ey, s.ez, hx, hy, hz), psi

    def e_correct(s: FieldState, psi: PsiState):
        hx, hy, hz = s.hx, s.hy, s.hz
        dy_hz = hz[1:K, 1:J, :I] - hz[1:K, 0 : J - 1, :I]
        dz_hy = hy[1:K, 1:J, :I] - hy[0 : K - 1, 1:J, :I]
        dz_hx = hx[1:K, :J, 1:I] - hx[0 : K - 1, :J, 1:I]
        dx_hz = hz[1:K, :J, 1:I] - hz[1:K, :J, 0 : I - 1]
        dx_hy = hy[:K, 1:J, 1:I] - hy[:K, 1:J, 0 : I - 1]
        dy_hx = hx[:K, 1:J, 1:I] - hx[:K, 0 : J - 1, 1:I]
        psi = PsiState(
            hx_z=psi.hx_z, hx_y=psi.hx_y, hy_x=psi.hy_x,
            hy_z=psi.hy_z, hz_y=psi.hz_y, hz_x=psi.hz_x,
            ex_y=by_e * psi.ex_y + cy_e * dy_hz,
            ex_z=bz_e * psi.ex_z + cz_e * dz_hy,
            ey_z=bz_e * psi.ey_z + cz_e * dz_hx,
            ey_x=bx_e * psi.ey_x + cx_e * dx_hz,
            ez_x=bx_e * psi.ez_x + cx_e * dx_hy,
            ez_y=by_e * psi.ez_y + cy_e * dy_hx,
        )
        ex = s.ex.at[sx].add((_c(coefs.cb_x, sx) * (psi.ex_y - psi.ex_z)).astype(dt))
        ey = s.ey.at[sy].add((_c(coefs.cb_y, sy) * (psi.ey_z - psi.ey_x)).astype(dt))
        ez = s.ez.at[sz].add((_c(coefs.cb_z, sz) * (psi.ez_x - psi.ez_y)).astype(dt))
        return FieldState(ex, ey, ez, s.hx, s.hy, s.hz), psi

    return h_correct, e_correct


def make_pml_step(p: Params, cfg: PMLConfig, coefs: UpdateCoefs):
    """One leapfrog step with CPML: ``step((state, psi), x) -> (state, psi)``.

    Same body order as :func:`fdtd_tpu.step.make_step` ([source] ->
    update_H [+ psi correction] -> [source] -> update_E [+ psi
    correction]), xla backend only.
    """
    from ..params import Mode
    from ..source import apply_source, make_source_plan
    from . import curl

    plan = make_source_plan(p) if p.mode == Mode.COMPUTATION else None
    h_correct, e_correct = make_cpml_corrections(p, cfg, coefs)

    def step(carry, x):
        s, psi = carry
        _t, amp = x
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = curl.update_h(p, s, coefs)
        s, psi = h_correct(s, psi)
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = curl.update_e(p, s, coefs)
        s, psi = e_correct(s, psi)
        return s, psi

    return step


def make_pml_chunk_runner(p: Params, cfg: PMLConfig, materials=None,
                          accumulate_power: bool = False):
    """Jitted ``run((state, psi), xs, power) -> ((state, psi), power)``.

    The PML analogue of :func:`fdtd_tpu.step.make_chunk_runner` (xla
    semantics: no donation, canonical layout); SAR accumulation uses the
    per-step jnp increment.
    """
    import functools

    from ..state import update_coefs
    from .. import diagnostics

    coefs = update_coefs(p, materials)
    step = make_pml_step(p, cfg, coefs)
    sigma = (
        np.asarray(coefs.sigma_cells) if coefs.sigma_cells is not None else 0.0
    )
    dt_step = p.time_step

    @functools.partial(jax.jit)
    def run(carry, xs, power_acc=None):
        def body(c, x):
            (s, psi), acc = c
            s, psi = step((s, psi), x)
            if accumulate_power:
                inc = diagnostics.power_deposition(p, s, sigma)
                acc = acc + (inc * dt_step).astype(acc.dtype)
            return ((s, psi), acc), None

        (carry, acc), _ = jax.lax.scan(body, (carry, power_acc), xs)
        return carry, acc

    return run
