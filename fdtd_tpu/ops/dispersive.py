"""ADE single-pole Debye dispersion: frequency-dependent materials.

The real physics of microwave heating: water's permittivity is not a
constant but a relaxation, eps(w) = eps_inf + d_eps / (1 + i w tau)
(+ sigma_dc/(i w eps0)).  The quasi-static paths approximate it by
evaluating eps'/sigma_eff at one drive frequency
(:mod:`fdtd_tpu.coupled`); this module solves the dispersion *in the
time domain* with the standard auxiliary-differential-equation (ADE)
method, so one broadband (pulsed) run carries the correct
frequency-dependent response at every frequency at once.

Formulation (per E component, on its Yee edge):

    D = eps0 eps_inf E + P,      tau dP/dt + P = eps0 d_eps E
    curl H = eps0 eps_inf dE/dt + dP/dt + sigma E

Trapezoidal (semi-implicit) discretization of the P ODE,

    P' = k1 P + k2 (E' + E),   k1 = (2 tau - dt)/(2 tau + dt),
                               k2 = eps0 d_eps dt / (2 tau + dt),

substituted into Ampere's law gives the explicit E update

    E' = ca E + cb (dH/dx-differences) + cp P
    ca = (eps - k2 - sigma dt/2) / D
    cb = (dt/dx) / D
    cp = (1 - k1) / D            with  D = eps + k2 + sigma dt/2,
                                       eps = eps0 eps_inf (edge-avg)

which reduces *algebraically exactly* to the non-dispersive lossy
update of :func:`fdtd_tpu.state.update_coefs` when d_eps = 0 (k2 = 0,
P stays 0).  The three polarization arrays P live on the same padded
E grids and ride the scan carry.  All coefficient maps are
edge-averaged from cell maps with the same 4-cell stencil as
eps/sigma; outside the physical extents (ca, cb, cp, k1, k2) =
(1, 0, 0, 1, 0) so pads and PEC faces stay inert.

This module is the xla/ground-truth tier (pure-jnp slice ops) and the
coefficient factory; the Pallas kernel tiers (r4: streaming ADE sweep +
two-pass ADE kernels) live in :mod:`fdtd_tpu.ops.pallas_dispersive`,
and the sharded shard_map tier in
:mod:`fdtd_tpu.parallel.sharded_step.make_sharded_dispersive_step`.
Dielectric (Debye) loss is E.dP/dt work,
NOT sigma|E|^2 — so the --sar accumulator on dispersive runs uses the
true trapezoidal work densities (see :func:`update_e_ade` with_work),
making --dispersive --sar --thermal the physically correct heating
chain.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON
from ..params import Params
from ..state import FieldState, Materials, _edge_average

COMP_AXES = {"x": (0, 1), "y": (0, 2), "z": (1, 2)}


@dataclasses.dataclass(frozen=True)
class DebyeMaterials:
    """Cell-centered Debye medium maps of shape (maxk, maxj, maxi).

    ``base``: the instantaneous response — ``eps_r`` is eps_inf,
    ``sigma`` the DC (ionic) conductivity.  ``d_eps``: relaxation
    strength eps_s - eps_inf (0 = no dispersion).  ``tau``: relaxation
    time in seconds (must be > 0 wherever d_eps > 0).
    """

    base: Materials
    d_eps: np.ndarray
    tau: np.ndarray

    def __post_init__(self):
        d = np.asarray(self.d_eps)
        t = np.asarray(self.tau)
        if np.any(d < 0):
            raise ValueError("Debye d_eps must be >= 0")
        if np.any((d > 0) & (t <= 0)):
            raise ValueError("Debye tau must be > 0 wherever d_eps > 0")


def water_debye_load(p: Params, lo=(0.3, 0.3, 0.3), hi=(0.7, 0.7, 0.7),
                     temperature: float = 20.0,
                     sigma_ion25: float = 0.0,
                     mask: np.ndarray | None = None) -> DebyeMaterials:
    """A water load as a *true* Debye medium: eps_inf + relaxation from
    the same Malmberg-Maryott / Kaatze fits the quasi-static coupled
    model uses (:mod:`fdtd_tpu.coupled`), so the two descriptions agree
    at any single frequency by construction.  ``mask`` overrides the
    default [lo, hi) box with an arbitrary cell geometry."""
    from ..coupled import EPS_INF, _TAU_PS, _TAU_T_C, water_eps_static
    from ..state import block_mask

    if mask is None:
        mask = block_mask(p, lo, hi)
    T = float(np.clip(temperature, 0.0, 100.0))
    eps_s = float(water_eps_static(T))
    tau = float(np.interp(T, _TAU_T_C, _TAU_PS)) * 1e-12
    sigma_ion = sigma_ion25 * (1.0 + 0.02 * (T - 25.0))
    base = Materials(
        eps_r=np.where(mask, EPS_INF, 1.0),
        sigma=np.where(mask, sigma_ion, 0.0),
    )
    return DebyeMaterials(
        base=base,
        d_eps=np.where(mask, eps_s - EPS_INF, 0.0),
        tau=np.where(mask, tau, 0.0),
    )


def effective_sigma(dm: DebyeMaterials, frequency: float) -> np.ndarray:
    """Cell-centered effective conductivity at ``frequency``:
    sigma_eff(w) = w eps0 eps''_debye(w) + sigma_dc — the map that makes
    the CW power density 1/2 sigma_eff |E|^2 *correct* for a Debye
    medium (plain sigma|E|^2 misses the dielectric loss entirely)."""
    w = 2.0 * np.pi * float(frequency)
    wt = w * np.asarray(dm.tau, np.float64)
    eps_pp = np.asarray(dm.d_eps, np.float64) * wt / (1.0 + wt * wt)
    sigma_dc = (np.asarray(dm.base.sigma, np.float64)
                if dm.base.sigma is not None else 0.0)
    return w * EPSILON * eps_pp + sigma_dc


@dataclasses.dataclass(frozen=True)
class DebyeCoefs:
    """Per-E-component padded coefficient maps (see module docstring)."""

    ca: dict  # comp -> (K1, J1, I1) array
    cb: dict
    cp: dict
    k1: dict
    k2: dict
    sig: dict  # edge-averaged sigma_dc (for the dissipation accumulator)
    h_factor: float


def debye_coefs(p: Params, dm: DebyeMaterials, dtype=None) -> DebyeCoefs:
    """Edge-average the cell maps and form the ADE update coefficients."""
    from ..constants import MU
    from ..state import field_dtype

    dt_ = p.time_step
    dx = p.spatial_step
    dty = dtype or field_dtype(p)
    K, J, I = p.maxk, p.maxj, p.maxi
    er = (dm.base.eps_r if dm.base.eps_r is not None
          else np.ones((K, J, I)))
    sg = (dm.base.sigma if dm.base.sigma is not None
          else np.zeros((K, J, I)))
    if dm.base.mu_r is not None:
        raise NotImplementedError(
            "dispersive media with heterogeneous mu_r is not supported"
        )

    ca, cb, cp, k1m, k2m, sgm = {}, {}, {}, {}, {}, {}
    K1, J1, I1 = p.padded_shape
    for comp, axes in COMP_AXES.items():
        eps_e = _edge_average(er, axes) * EPSILON
        sig_e = _edge_average(sg, axes)
        de_e = _edge_average(np.asarray(dm.d_eps, np.float64), axes)
        tau_e = _edge_average(np.asarray(dm.tau, np.float64), axes)
        two_tau = 2.0 * tau_e + dt_
        k1 = (2.0 * tau_e - dt_) / two_tau
        k2 = EPSILON * de_e * dt_ / two_tau
        D = eps_e + k2 + 0.5 * sig_e * dt_
        ca_e = (eps_e - k2 - 0.5 * sig_e * dt_) / D
        cb_e = (dt_ / dx) / D
        cp_e = (1.0 - k1) / D

        def embed(arr, fill):
            out = np.full((K1, J1, I1), fill, np.float64)
            ek, ej, ei = arr.shape
            out[:ek, :ej, :ei] = arr
            return jnp.asarray(out, dtype=dty)

        ca[comp] = embed(ca_e, 1.0)
        cb[comp] = embed(cb_e, 0.0)
        cp[comp] = embed(cp_e, 0.0)
        k1m[comp] = embed(k1, 1.0)
        k2m[comp] = embed(k2, 0.0)
        sgm[comp] = embed(sig_e, 0.0)
    return DebyeCoefs(ca=ca, cb=cb, cp=cp, k1=k1m, k2=k2m, sig=sgm,
                      h_factor=dt_ / (MU * dx))


def zero_polarization(p: Params):
    """(px, py, pz) on the padded E grids, zero-initialized."""
    from ..state import field_dtype

    K1, J1, I1 = p.padded_shape
    z = lambda: jnp.zeros((K1, J1, I1), field_dtype(p))
    return z(), z(), z()


def update_e_ade(p: Params, s: FieldState, P, dc: DebyeCoefs,
                 with_work: bool = False):
    """The dispersive E half-step: E' = ca E + cb curlH + cp P, then
    P' = k1 P + k2 (E' + E) — same interior-only PEC slice bounds as
    :func:`fdtd_tpu.ops.curl.update_e`.

    With ``with_work``: also return the edge-located dissipation rate
    arrays (wx, wy, wz) in W/m^3,

        w = E_mid (dP/dt) + sigma E_mid^2,     E_mid = (E' + E)/2,

    the trapezoidal-midpoint work densities consistent with the update's
    own discretization — so their volume integral closes the discrete
    energy balance of a ring-down (field energy lost == work
    accumulated), which sigma|E'|^2 alone cannot do for a Debye medium.
    """
    K, J, I = p.maxk, p.maxj, p.maxi
    hx, hy, hz = s.hx, s.hy, s.hz
    dt = s.ex.dtype
    dt_s = p.time_step
    px, py, pz = P
    work = []

    def advance(comp, e_old, p_old, sl, curl):
        en = (dc.ca[comp][sl] * e_old[sl] + dc.cb[comp][sl] * curl
              + dc.cp[comp][sl] * p_old[sl]).astype(dt)
        pn = (dc.k1[comp][sl] * p_old[sl]
              + dc.k2[comp][sl] * (en + e_old[sl])).astype(dt)
        if with_work:
            e_mid = 0.5 * (en + e_old[sl])
            w = e_mid * ((pn - p_old[sl]) / dt_s
                         + dc.sig[comp][sl] * e_mid)
            work.append(jnp.zeros_like(e_old).at[sl].set(w))
        return e_old.at[sl].set(en), p_old.at[sl].set(pn)

    sx = (slice(1, K), slice(1, J), slice(0, I))
    curl_x = (hz[1:K, 1:J, :I] - hz[1:K, 0:J - 1, :I]) - (
        hy[1:K, 1:J, :I] - hy[0:K - 1, 1:J, :I]
    )
    ex, px = advance("x", s.ex, px, sx, curl_x)

    sy = (slice(1, K), slice(0, J), slice(1, I))
    curl_y = (hx[1:K, :J, 1:I] - hx[0:K - 1, :J, 1:I]) - (
        hz[1:K, :J, 1:I] - hz[1:K, :J, 0:I - 1]
    )
    ey, py = advance("y", s.ey, py, sy, curl_y)

    sz = (slice(0, K), slice(1, J), slice(1, I))
    curl_z = (hy[:K, 1:J, 1:I] - hy[:K, 1:J, 0:I - 1]) - (
        hx[:K, 1:J, 1:I] - hx[:K, 0:J - 1, 1:I]
    )
    ez, pz = advance("z", s.ez, pz, sz, curl_z)

    out = FieldState(ex, ey, ez, s.hx, s.hy, s.hz), (px, py, pz)
    if with_work:
        return (*out, tuple(work))
    return out


def work_cell_means(p: Params, wx, wy, wz):
    """Cell-centered total dissipation rate from the three edge work
    arrays — the same 4-edge-per-cell association as
    :func:`fdtd_tpu.diagnostics._e_cell_means`."""
    K, J, I = p.maxk, p.maxj, p.maxi
    kk, jj, ii = slice(0, K), slice(0, J), slice(0, I)
    k1s, j1s, i1s = slice(1, K + 1), slice(1, J + 1), slice(1, I + 1)
    mx = 0.25 * (wx[kk, jj, ii] + wx[k1s, jj, ii]
                 + wx[kk, j1s, ii] + wx[k1s, j1s, ii])
    my = 0.25 * (wy[kk, jj, ii] + wy[kk, jj, i1s]
                 + wy[k1s, jj, ii] + wy[k1s, jj, i1s])
    mz = 0.25 * (wz[kk, jj, ii] + wz[kk, j1s, ii]
                 + wz[kk, jj, i1s] + wz[kk, j1s, i1s])
    return mx + my + mz


def make_dispersive_pml_step(p: Params, dm: DebyeMaterials, cfg,
                             accumulate_power: bool = False):
    """One ADE leapfrog step with CPML open boundaries (r5, VERDICT r4
    #4): ``step(s, P, psi, amp) -> (s, P, psi[, (wx, wy, wz)])``.

    The composition is *algebraically exact* for any Debye load, not
    just loads clear of the absorber: CPML with kappa = 1 adds
    ``psi`` to the curl, and the ADE E update is linear in the curl
    with coefficient ``cb``, so correction-after-update gives E the
    exact ``cb psi`` increment (the same argument as the lossy
    composition, :mod:`fdtd_tpu.ops.cpml`) — *plus* the trapezoidal P
    recursion P' = k1 P + k2 (E' + E) must see the corrected E', so P
    gains ``k2 (cb psi)`` after ``e_correct`` (an exact no-op wherever
    k2 = 0, i.e. everywhere when the load keeps clear of the slabs).
    The E-pass correction factors are the ADE ``cb`` maps themselves
    (:func:`debye_coefs`), sliced per slab edge by
    :func:`fdtd_tpu.ops.cpml.make_cpml_corrections`.

    One caveat worth pinning: with ``accumulate_power`` the work
    densities are computed inside :func:`update_e_ade` from the
    pre-correction E' — exact whenever the lossy/dispersive cells keep
    clear of the absorber (sigma = k2 = 0 on slab rows), the physically
    meaningful configuration.
    """
    from ..params import Mode
    from ..source import apply_source, make_source_plan
    from ..state import UpdateCoefs
    from . import curl
    from .cpml import make_cpml_corrections

    dc = debye_coefs(p, dm)
    hcoefs = UpdateCoefs(1.0, 1.0, 1.0, 0.0, 0.0, 0.0, dc.h_factor, None)
    corr_coefs = UpdateCoefs(1.0, 1.0, 1.0,
                             dc.cb["x"], dc.cb["y"], dc.cb["z"],
                             dc.h_factor, None)
    h_correct, e_correct = make_cpml_corrections(p, cfg, corr_coefs)
    plan = make_source_plan(p) if p.mode == Mode.COMPUTATION else None

    def step(s, P, psi, amp):
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = curl.update_h(p, s, hcoefs)
        s, psi = h_correct(s, psi)
        if plan is not None:
            s = apply_source(plan, s, amp)
        out = update_e_ade(p, s, P, dc, with_work=accumulate_power)
        s, P = out[0], out[1]
        pre = (s.ex, s.ey, s.ez)
        s, psi = e_correct(s, psi)
        P = tuple(
            (pc + dc.k2[c] * (getattr(s, "e" + c) - ec)).astype(pc.dtype)
            for pc, c, ec in zip(P, ("x", "y", "z"), pre)
        )
        if accumulate_power:
            return s, P, psi, out[2]
        return s, P, psi

    return step


def make_dispersive_pml_chunk_runner(p: Params, dm: DebyeMaterials, cfg,
                                     dft=None, probes=None,
                                     accumulate_power: bool = False):
    """``run((s, P, psi), xs, power, dft_acc) -> ((s, P, psi), power,
    dft_acc, probe_ys)`` — the open-boundary dispersive runner (xla
    tier; same monitored-chunk contract as
    :func:`make_dispersive_chunk_runner`, psi joins the carry).  This
    unlocks the antenna/applicator class of problems: a Debye load
    radiating through the absorber, with the true-dissipation --sar
    and the full monitor set available."""
    import jax

    from ..monitors import apply_monitors, split_monitor_inputs

    step = make_dispersive_pml_step(p, dm, cfg, accumulate_power)
    if probes is not None:
        probes.validate(p)
    cells = probes.cells if probes is not None else None
    dt_step = p.time_step

    @jax.jit
    def run(carry, xs, power_acc, dft_acc):
        def body(c, x):
            (s, P, psi), acc, dacc = c
            (_t, amp), weights = split_monitor_inputs(x, dft)
            if accumulate_power:
                s, P, psi, (wx, wy, wz) = step(s, P, psi, amp)
                inc = work_cell_means(p, wx, wy, wz)
                acc = acc + (inc * dt_step).astype(acc.dtype)
            else:
                s, P, psi = step(s, P, psi, amp)
            dacc, ys = apply_monitors(p, s, weights, dft, cells, dacc)
            return ((s, P, psi), acc, dacc), ys

        ((s, P, psi), acc, dacc), ys = jax.lax.scan(
            body, (carry, power_acc, dft_acc), xs
        )
        return (s, P, psi), acc, dacc, ys

    return run


def make_dispersive_chunk_runner(p: Params, dm: DebyeMaterials,
                                 dft=None, probes=None,
                                 accumulate_power: bool = False):
    """``run((state, P), xs, power, dft_acc) -> ((state, P), power,
    dft_acc, probe_ys)`` — the dispersive analogue of the monitored
    chunk runners.  With ``accumulate_power`` the per-step dissipation
    is the *true* Debye work E.dP/dt + sigma E_mid^2 (cell-centered,
    J/m^3 — see :func:`update_e_ade`), so ``--sar``/``--thermal`` are
    physically correct for dispersive loads."""
    import jax

    from ..monitors import apply_monitors, split_monitor_inputs
    from ..params import Mode
    from ..source import apply_source, make_source_plan
    from ..state import UpdateCoefs
    from . import curl

    dc = debye_coefs(p, dm)
    hcoefs = UpdateCoefs(1.0, 1.0, 1.0, 0.0, 0.0, 0.0, dc.h_factor, None)
    plan = make_source_plan(p) if p.mode == Mode.COMPUTATION else None
    if probes is not None:
        probes.validate(p)
    cells = probes.cells if probes is not None else None

    def one_step(s, P, amp):
        if plan is not None:
            s = apply_source(plan, s, amp)
        s = curl.update_h(p, s, hcoefs)
        if plan is not None:
            s = apply_source(plan, s, amp)
        return update_e_ade(p, s, P, dc, with_work=accumulate_power)

    dt_step = p.time_step

    @jax.jit
    def run(carry, xs, power_acc, dft_acc):
        def body(c, x):
            (s, P), acc, dacc = c
            (_t, amp), weights = split_monitor_inputs(x, dft)
            if accumulate_power:
                s, P, (wx, wy, wz) = one_step(s, P, amp)
                inc = work_cell_means(p, wx, wy, wz)
                acc = acc + (inc * dt_step).astype(acc.dtype)
            else:
                s, P = one_step(s, P, amp)
            dacc, ys = apply_monitors(p, s, weights, dft, cells, dacc)
            return ((s, P), acc, dacc), ys

        ((s, P), acc, dacc), ys = jax.lax.scan(
            body, (carry, power_acc, dft_acc), xs
        )
        return (s, P), acc, dacc, ys

    return run
