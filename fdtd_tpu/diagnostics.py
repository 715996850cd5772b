"""On-device diagnostics: cavity energies and power deposition (SAR).

Energy replicates the reference's cell-centered means (reference:
main.c:602-668).  The reference has an indexing bug in the Ez term of the
electric energy — Ez is read through the *Hz* index map (main.c:627); the
default here is the physics-correct form, with ``quirk_compat=True``
replicating the buggy gather exactly for diagnostic parity (SURVEY
section 2.4 item 1).

All reductions run on device in fp32-or-better accumulation; results are tiny
scalars so host transfer is negligible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import EPSILON, MU
from .params import Params
from .state import FieldState


def _acc_dtype(x):
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def e_energy(p: Params, s: FieldState, quirk_compat: bool = False):
    """Total electric energy (reference: main.c:602-634)."""
    K, J, I = p.maxk, p.maxj, p.maxi
    dv = p.spatial_step**3
    at = _acc_dtype(s.ex)
    ex, ey, ez = s.ex.astype(at), s.ey.astype(at), s.ez.astype(at)

    # mean over the 4 edges bordering each cell, per reference index pattern
    mean_ex = 0.25 * (ex[:K, :J, :I] + ex[1 : K + 1, :J, :I] + ex[:K, 1 : J + 1, :I] + ex[1 : K + 1, 1 : J + 1, :I])
    mean_ey = 0.25 * (ey[:K, :J, :I] + ey[:K, :J, 1 : I + 1] + ey[1 : K + 1, :J, :I] + ey[1 : K + 1, :J, 1 : I + 1])
    if quirk_compat:
        mean_ez = _quirk_mean_ez(p, ez)
    else:
        mean_ez = 0.25 * (ez[:K, :J, :I] + ez[:K, 1 : J + 1, :I] + ez[:K, :J, 1 : I + 1] + ez[:K, 1 : J + 1, 1 : I + 1])

    total = (mean_ex**2).sum() + (mean_ey**2).sum() + (mean_ez**2).sum()
    return total * dv * (EPSILON / 2.0)


def _quirk_mean_ez(p: Params, ez):
    """Replicate main.c:627: Ez gathered through the kHz index map.

    kHz(i,j,k) = i + j*maxi + k*maxi*maxj, applied to the flat Ez buffer whose
    true strides are (maxi+1) and (maxi+1)*(maxj+1).  We flatten Ez's physical
    region in C order (identical memory layout to the reference buffer) and
    gather with the wrong strides, exactly as the C code does.
    """
    K, J, I = p.maxk, p.maxj, p.maxi
    flat = ez[:K, : J + 1, : I + 1].reshape(-1)
    i = np.arange(I)[None, None, :]
    j = np.arange(J)[None, :, None]
    k = np.arange(K)[:, None, None]

    def khz(ii, jj, kk):
        return ii + jj * I + kk * I * J

    idx0 = khz(i, j, k)
    idx1 = khz(i, j + 1, k)
    idx2 = khz(i + 1, j, k)
    idx3 = khz(i + 1, j + 1, k)
    g = lambda idx: flat[jnp.asarray(np.broadcast_to(idx, (K, J, I)).ravel())]
    return (0.25 * (g(idx0) + g(idx1) + g(idx2) + g(idx3))).reshape(K, J, I)


def h_energy(p: Params, s: FieldState):
    """Total magnetic energy (reference: main.c:636-668)."""
    K, J, I = p.maxk, p.maxj, p.maxi
    dv = p.spatial_step**3
    at = _acc_dtype(s.hx)
    hx, hy, hz = s.hx.astype(at), s.hy.astype(at), s.hz.astype(at)

    mean_hx = 0.5 * (hx[:K, :J, :I] + hx[:K, :J, 1 : I + 1])
    mean_hy = 0.5 * (hy[:K, :J, :I] + hy[:K, 1 : J + 1, :I])
    mean_hz = 0.5 * (hz[:K, :J, :I] + hz[1 : K + 1, :J, :I])

    total = (mean_hx**2).sum() + (mean_hy**2).sum() + (mean_hz**2).sum()
    return total * dv * (MU / 2.0)


def total_energy(p: Params, s: FieldState, quirk_compat: bool = False):
    return e_energy(p, s, quirk_compat) + h_energy(p, s)


def theoretical_te101_energy(p: Params) -> float:
    """W = eps0 * a*b*d / 8 (description.pdf section 3 Eq. 4)."""
    return EPSILON * p.length * p.width * p.height / 8.0


def e_center_sq(p: Params, s: FieldState):
    """|E|^2 at cell centers: sum of squared 4-edge means per component."""
    K, J, I = p.maxk, p.maxj, p.maxi
    at = _acc_dtype(s.ex)
    ex, ey, ez = s.ex.astype(at), s.ey.astype(at), s.ez.astype(at)
    mean_ex = 0.25 * (ex[:K, :J, :I] + ex[1 : K + 1, :J, :I] + ex[:K, 1 : J + 1, :I] + ex[1 : K + 1, 1 : J + 1, :I])
    mean_ey = 0.25 * (ey[:K, :J, :I] + ey[:K, :J, 1 : I + 1] + ey[1 : K + 1, :J, :I] + ey[1 : K + 1, :J, 1 : I + 1])
    mean_ez = 0.25 * (ez[:K, :J, :I] + ez[:K, 1 : J + 1, :I] + ez[:K, :J, 1 : I + 1] + ez[:K, 1 : J + 1, 1 : I + 1])
    return mean_ex**2 + mean_ey**2 + mean_ez**2


def poynting_flux(p: Params, s: FieldState, margin: int = 0):
    """Net outward Poynting flux (W) through an interior box.

    Capability extension for open-boundary (``--pml``) runs: the
    radiated power leaving the axis-aligned box whose faces lie
    ``margin`` cells inside the real grid on every side.  Uses the same
    cell-centered field means as the energy diagnostics (S = E x H at
    cell centers, summed over the box's outermost cell layer with
    outward normals); for a pulse fully inside the box the time
    integral matches the energy it radiates to a few percent (the
    leapfrog E/H half-step offset and the cell-centered S are both
    O(dx, dt) diagnostics, not conserved quantities).
    """
    K, J, I = p.maxk, p.maxj, p.maxi
    m = int(margin)
    if not 0 <= m < min(K, J, I) // 2:
        raise ValueError(f"margin {margin} leaves no box in a ({K},{J},{I}) grid")
    at = _acc_dtype(s.ex)
    ex, ey, ez = s.ex.astype(at), s.ey.astype(at), s.ez.astype(at)
    hx, hy, hz = s.hx.astype(at), s.hy.astype(at), s.hz.astype(at)
    mex = 0.25 * (ex[:K, :J, :I] + ex[1 : K + 1, :J, :I] + ex[:K, 1 : J + 1, :I] + ex[1 : K + 1, 1 : J + 1, :I])
    mey = 0.25 * (ey[:K, :J, :I] + ey[:K, :J, 1 : I + 1] + ey[1 : K + 1, :J, :I] + ey[1 : K + 1, :J, 1 : I + 1])
    mez = 0.25 * (ez[:K, :J, :I] + ez[:K, 1 : J + 1, :I] + ez[:K, :J, 1 : I + 1] + ez[:K, 1 : J + 1, 1 : I + 1])
    mhx = 0.5 * (hx[:K, :J, :I] + hx[:K, :J, 1 : I + 1])
    mhy = 0.5 * (hy[:K, :J, :I] + hy[:K, 1 : J + 1, :I])
    mhz = 0.5 * (hz[:K, :J, :I] + hz[1 : K + 1, :J, :I])
    sx = mey * mhz - mez * mhy
    sy = mez * mhx - mex * mhz
    sz = mex * mhy - mey * mhx
    kk = slice(m, K - m)
    jj = slice(m, J - m)
    ii = slice(m, I - m)
    da = p.spatial_step**2
    flux = (
        sz[K - 1 - m, jj, ii].sum() - sz[m, jj, ii].sum()
        + sy[kk, J - 1 - m, ii].sum() - sy[kk, m, ii].sum()
        + sx[kk, jj, I - 1 - m].sum() - sx[kk, jj, m].sum()
    )
    return flux * da


def power_deposition(p: Params, s: FieldState, sigma_cells):
    """Instantaneous dissipated power density sigma*|E|^2 (W/m^3) per cell.

    Capability extension (BASELINE config #3): the reference has no lossy
    media, so no SAR.  Accumulate this over steps (x dt) for heating maps;
    SAR = sigma*|E|^2 / rho for a density map rho.
    """
    return sigma_cells * e_center_sq(p, s)


def power_deposition_stripped(p: Params, st, sigma_cells):
    """``power_deposition`` reading the fast-path StrippedState directly.

    Bit-identical to ``power_deposition(p, to_full(p, st), sigma)`` — same
    values, same arithmetic order — but reads only the three E bulks (+ the
    two tiny boundary strips) instead of materializing all six fields in the
    canonical layout each step (the per-step layout restore the round-1
    review flagged).
    """
    from .ops.pallas_fused import D

    K, J, I = p.maxk, p.maxj, p.maxi
    at = _acc_dtype(st.ex)
    ex = st.ex[D : D + K + 1, : J + 1, :I].astype(at)
    ey = jnp.concatenate(
        [st.ey[D : D + K + 1, :J, :], st.ey_s[D : D + K + 1, :J]], axis=2
    ).astype(at)
    ez = jnp.concatenate(
        [st.ez[D : D + K, : J + 1, :], st.ez_s[D : D + K, : J + 1]], axis=2
    ).astype(at)

    mean_ex = 0.25 * (ex[:K, :J, :I] + ex[1 : K + 1, :J, :I] + ex[:K, 1 : J + 1, :I] + ex[1 : K + 1, 1 : J + 1, :I])
    mean_ey = 0.25 * (ey[:K, :J, :I] + ey[:K, :J, 1 : I + 1] + ey[1 : K + 1, :J, :I] + ey[1 : K + 1, :J, 1 : I + 1])
    mean_ez = 0.25 * (ez[:K, :J, :I] + ez[:K, 1 : J + 1, :I] + ez[:K, :J, 1 : I + 1] + ez[:K, 1 : J + 1, 1 : I + 1])
    return sigma_cells * (mean_ex**2 + mean_ey**2 + mean_ez**2)
