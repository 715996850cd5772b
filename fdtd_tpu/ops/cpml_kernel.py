"""CPML with the j/i-axis psi recursion INSIDE the two-pass kernels.

The r3 fast composition (:mod:`fdtd_tpu.ops.cpml_fast`) applies all 12
psi corrections as XLA slab updates between the two Pallas passes.
`tools/probe_pml.py` (r5, recorded in docs/DESIGN.md "PML tax
attribution") measured that composition at **1.31 Gcells/s vs the
7.82 G two-pass kernels it is built from**: the minor-axis slab
updates cost ~83% of the wall against a ~22% traffic share, because a
10-lane i-slab RMW touches full (8, 128) lane tiles (~12.8x traffic
inflation) and the first update per target copies the whole field.

This module moves the 8 j/i-axis terms into the kernels, where the
field tiles are already in VMEM and the curl code already computes
every difference the psi recursion needs.  The psi state is packed so
its HBM traffic is the slab volume, not tile-inflated fields:

- **j-axis packs** ``h_j``/``e_j``: ``(S, Pj, Ib)`` with the two
  terms' 2n slab rows stacked on the sublane axis (rows [0, 2n) =
  hx_y / ex_y, [2n, 4n) = hz_y / ez_y at their natural lanes);
  Pj = 4n padded to a sublane multiple.
- **i-axis packs** ``h_i``/``e_i``: ``(S, J1, 128)`` with the two
  terms' 2n slab lanes stacked on the lane axis (lanes [0, 2n) =
  hy_x / ey_x, [2n, 4n) = hz_x / ez_x) — one 128-lane tile regardless
  of slab depth (gate: 4n <= 128).
- per-term (b, c) recursion profiles ride as tiny constant operands
  (``(1, Pj, 1)`` / ``(1, 1, 128)``), bit-identical to
  :func:`fdtd_tpu.ops.cpml.build_plan`'s fp64-derived tables.

The 4 k-axis terms (hx_z, hy_z, ex_z, ey_z) stay XLA slab updates
after each pass — k is the MAJOR axis, so a k-slab slice is layout-
tile-aligned and lowers to dense copies (the cheap 4/12 of the old
composition) — via :func:`fdtd_tpu.ops.cpml_fast.
make_stripped_cpml_corrections(terms=...)`.  This split matches the
`_TERMS` ordering contract (fdtd_tpu/ops/cpml.py): per target the j/i
adds precede the k add, so corner cells round identically to the xla
path.  The psi recursion for hx_y's i = maxi strip column (the only
j/i term that spans a strip) applies as a tiny (S, 2n) XLA update on
``hx_s`` between the H pass and the k corrections.

Scope: everything :func:`fdtd_tpu.ops.cpml_fast.fast_pml_supported`
admits, plus 4*cells <= 128 (cells <= 32; 10 is standard).  Reference
anchor: the curls this correction must not dominate are main.c:431-500;
the open boundary itself is a capability extension (description.pdf
section 2.1 documents the closed PEC cavity).

Measured bandwidth ceiling (DESIGN.md): the psi packs add ~11 B/cell
per step on the two-pass 76 B/cell — the composition tops out in the
~6 G class on v5e; >= 8 G needs the psi recursion riding a multi-step
(streaming) kernel.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Mode, Params
from ..state import Materials, UpdateCoefs, update_coefs
from .cpml import PMLConfig, PsiState, _check_cfg, build_plan, psi_shapes
from .cpml_fast import (
    fast_pml_supported,
    make_stripped_cpml_corrections,
    slab_factor_constants,
)
from .pallas_fused import (
    D,
    StrippedState,
    advance_hx_strip,
    build_twopass_calls,  # noqa: F401  (re-exported convenience)
    corr_width,
    dims,
    make_inject_source,
    tile_k,
)

# k-axis terms applied as XLA slab updates after each pass (tile-aligned)
_H_K_TERMS = ("hx_z", "hy_z")
_E_K_TERMS = ("ex_z", "ey_z")


def _pad8(x: int) -> int:
    return ((x + 7) // 8) * 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["h_j", "h_i", "e_j", "e_i", "hxy_s",
                 "hx_z", "hy_z", "ex_z", "ey_z"],
    meta_fields=[],
)
@dataclasses.dataclass
class PsiPacked:
    """In-kernel CPML memory state.

    ``h_j``/``e_j``: (S, Pj, Ib) j-axis packs; ``h_i``/``e_i``:
    (S, J1, 128) i-axis packs; ``hxy_s``: (S, Ps, 1) hx_y's i = maxi
    strip column; ``hx_z``/``hy_z``/``ex_z``/``ey_z``: the four k-axis
    psi in the canonical slab-restricted layout (:class:`fdtd_tpu.ops.
    cpml.PsiState` shapes), consumed by the filtered XLA corrections.
    """

    h_j: jax.Array
    h_i: jax.Array
    e_j: jax.Array
    e_i: jax.Array
    hxy_s: jax.Array
    hx_z: jax.Array
    hy_z: jax.Array
    ex_z: jax.Array
    ey_z: jax.Array


def kernel_pml_supported(p: Params, cfg: PMLConfig,
                         materials: Materials | None = None,
                         coefs: UpdateCoefs | None = None) -> bool:
    """True when the in-kernel CPML tier applies: everything the r3
    fast composition admits, plus the i-axis lane pack must fit one
    128-lane tile (4 * cells <= 128)."""
    if not fast_pml_supported(p, cfg, materials, coefs):
        return False
    return 4 * cfg.cells <= 128


def pack_psi(p: Params, cfg: PMLConfig, psi: PsiState | None,
             dtype=None) -> PsiPacked:
    """Embed a canonical :class:`PsiState` (or zeros) into the packed
    in-kernel layout.  Inverse of :func:`unpack_psi` (bit-exact round
    trip); checkpoints stay canonical either way."""
    _check_cfg(p, cfg)
    dt = jnp.dtype(dtype or p.dtype)
    n = cfg.cells
    S, J1, Ib = dims(p)
    K, J, I = p.maxk, p.maxj, p.maxi
    Pj, Ps = _pad8(4 * n), _pad8(2 * n)

    h_j = jnp.zeros((S, Pj, Ib), dt)
    e_j = jnp.zeros((S, Pj, Ib), dt)
    h_i = jnp.zeros((S, J1, 128), dt)
    e_i = jnp.zeros((S, J1, 128), dt)
    hxy_s = jnp.zeros((S, Ps, 1), dt)
    if psi is None:
        sh = psi_shapes(p, cfg)
        kz = {m: jnp.zeros(sh[m], dt)
              for m in ("hx_z", "hy_z", "ex_z", "ey_z")}
        return PsiPacked(h_j, h_i, e_j, e_i, hxy_s, **kz)

    a = lambda x: jnp.asarray(x, dt)
    h_j = h_j.at[D : D + K, 0 : 2 * n, :].set(a(psi.hx_y)[:, :, :I])
    h_j = h_j.at[D : D + K + 1, 2 * n : 4 * n, :].set(a(psi.hz_y))
    hxy_s = hxy_s.at[D : D + K, 0 : 2 * n, 0].set(a(psi.hx_y)[:, :, I])
    h_i = h_i.at[D : D + K, 0 : J + 1, 0 : 2 * n].set(a(psi.hy_x))
    h_i = h_i.at[D : D + K + 1, 0:J, 2 * n : 4 * n].set(a(psi.hz_x))
    e_j = e_j.at[D + 1 : D + K, 0 : 2 * n, :].set(a(psi.ex_y))
    e_j = e_j.at[D : D + K, 2 * n : 4 * n, 1:I].set(a(psi.ez_y))
    e_i = e_i.at[D + 1 : D + K, 0:J, 0 : 2 * n].set(a(psi.ey_x))
    e_i = e_i.at[D : D + K, 1:J, 2 * n : 4 * n].set(a(psi.ez_x))
    return PsiPacked(
        h_j, h_i, e_j, e_i, hxy_s,
        hx_z=a(psi.hx_z), hy_z=a(psi.hy_z),
        ex_z=a(psi.ex_z), ey_z=a(psi.ey_z),
    )


def unpack_psi(p: Params, cfg: PMLConfig, pp: PsiPacked) -> PsiState:
    """Extract the canonical slab-restricted :class:`PsiState` from the
    packed layout (checkpoints, parity tests, topology interop)."""
    n = cfg.cells
    K, J, I = p.maxk, p.maxj, p.maxi
    hx_y = jnp.concatenate(
        [pp.h_j[D : D + K, 0 : 2 * n, :],
         pp.hxy_s[D : D + K, 0 : 2 * n, :]], axis=2)
    return PsiState(
        hx_y=hx_y,
        hz_y=pp.h_j[D : D + K + 1, 2 * n : 4 * n, :],
        hy_x=pp.h_i[D : D + K, 0 : J + 1, 0 : 2 * n],
        hz_x=pp.h_i[D : D + K + 1, 0:J, 2 * n : 4 * n],
        ex_y=pp.e_j[D + 1 : D + K, 0 : 2 * n, :],
        ez_y=pp.e_j[D : D + K, 2 * n : 4 * n, 1:I],
        ey_x=pp.e_i[D + 1 : D + K, 0:J, 0 : 2 * n],
        ez_x=pp.e_i[D : D + K, 1:J, 2 * n : 4 * n],
        hx_z=pp.hx_z, hy_z=pp.hy_z, ex_z=pp.ex_z, ey_z=pp.ey_z,
    )


def _bc_vectors(p: Params, cfg: PMLConfig, dt):
    """Host (b, c) recursion-profile constants for the four packs.

    Returns ``(bj_h, cj_h, bi_h, ci_h, bj_e, cj_e, bi_e, ci_e)`` numpy
    arrays — (1, Pj, 1) for j-packs, (1, 1, 128) for i-packs — sliced
    straight from :func:`build_plan`'s tables so recursion constants
    are bit-identical to the xla path."""
    n = cfg.cells
    Pj = _pad8(4 * n)
    plan = build_plan(p, cfg, dt)

    def jvec(t1, t2):
        b = np.zeros((1, Pj, 1), dt)
        c = np.zeros((1, Pj, 1), dt)
        b[0, 0 : 2 * n, 0] = np.asarray(plan[t1][6]).ravel()
        c[0, 0 : 2 * n, 0] = np.asarray(plan[t1][7]).ravel()
        b[0, 2 * n : 4 * n, 0] = np.asarray(plan[t2][6]).ravel()
        c[0, 2 * n : 4 * n, 0] = np.asarray(plan[t2][7]).ravel()
        return b, c

    def ivec(t1, t2):
        b = np.zeros((1, 1, 128), dt)
        c = np.zeros((1, 1, 128), dt)
        b[0, 0, 0 : 2 * n] = np.asarray(plan[t1][6]).ravel()
        c[0, 0, 0 : 2 * n] = np.asarray(plan[t1][7]).ravel()
        b[0, 0, 2 * n : 4 * n] = np.asarray(plan[t2][6]).ravel()
        c[0, 0, 2 * n : 4 * n] = np.asarray(plan[t2][7]).ravel()
        return b, c

    bj_h, cj_h = jvec("hx_y", "hz_y")
    bi_h, ci_h = ivec("hy_x", "hz_x")
    bj_e, cj_e = jvec("ex_y", "ez_y")
    bi_e, ci_e = ivec("ey_x", "ez_x")
    return bj_h, cj_h, bi_h, ci_h, bj_e, cj_e, bi_e, ci_e


def _h_kernel_pml(p: Params, f_h, patch, Ib, W, tk, het, n, Pj, sf,
                  koff_ref, ex_ref, ey_ref, ez_ref,
                  hx_ref, hy_ref, hz_ref, chy_ref, chz_ref, *rest):
    """H half-step + in-kernel hx_y/hz_y (j) and hy_x/hz_x (i) CPML.

    The curl body is kept line-identical to
    :func:`fdtd_tpu.ops.pallas_fused._h_kernel2` (single-chip jwin=None
    form) — the composition's bit parity with the xla PML path rests on
    it.  ``sf`` = (sf_hxy, sf_hzy, sf_hyx, sf_hzx): the per-term
    sign * slab-constant correction factors, host-folded exactly like
    the xla path's ``sign * f`` scalar.
    """
    if het:
        hfx_r, hfy_r, hfz_r = rest[0:3]
        rest = rest[3:]
    (pj_ref, pi_ref, bj_ref, cj_ref, bi_ref, ci_ref,
     ohx, ohy, ohz, opj, opi) = rest
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    I = Ib
    L = g * tk + koff_ref[0, 0]
    joff = koff_ref[0, 1]

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    exw, eyw, ezw = ex_ref[:].astype(cd), ey_ref[:].astype(cd), ez_ref[:].astype(cd)
    hxw, hyw, hzw = hx_ref[:].astype(cd), hy_ref[:].astype(cd), hz_ref[:].astype(cd)
    dt = cd

    ex0, ex1 = exw[:tk], exw[1:]
    ey0, ey1 = eyw[:tk], eyw[1:]
    ez0 = ezw[:tk]

    shape = ex0.shape
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + L
    jloc = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    jj = jloc + joff
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    zf = jnp.zeros((), dt)

    ey_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ey0, -1, axis=2))
    ez_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ez0, -1, axis=2))
    ez_py = jnp.roll(ez0, -1, axis=1)
    ex_py = jnp.roll(ex0, -1, axis=1)

    inc_hy = (ez_px - ez0) - (ex1 - ex0)
    inc_hz = (ex_py - ex0) - (ey_px - ey0)
    chy = chy_ref[:]
    chz = chz_ref[:]
    if W == Ib:
        inc_hy = inc_hy + chy
        inc_hz = inc_hz + chz
    else:
        inc_hy = jnp.concatenate([inc_hy[:, :, : Ib - W], inc_hy[:, :, Ib - W :] + chy], axis=2)
        inc_hz = jnp.concatenate([inc_hz[:, :, : Ib - W], inc_hz[:, :, Ib - W :] + chz], axis=2)

    m_hx = (gk < K) & (jj < J)
    m_hy = gk < K
    m_hz = (gk < K + 1) & (jj < J)
    if patch is not None:
        j0, j1, i0, i1 = patch
        m_patch = (gk == 0) & (jj >= j0) & (jj < j1) & (lane >= i0) & (lane < i1)
        m_hx = m_hx & ~m_patch
        m_hz = m_hz & ~m_patch
    if het:
        fhx = hfx_r[:].astype(dt)
        fhy = hfy_r[:].astype(dt)
        fhz = hfz_r[:].astype(dt)
    else:
        fhx = fhy = fhz = f_h
    hxp = jnp.where(m_hx, hxw + fhx * ((ey1 - ey0) - (ez_py - ez0)), hxw)
    hyp = jnp.where(m_hy, hyw + fhy * inc_hy, hyw)
    hzp = jnp.where(m_hz, hzw + fhz * inc_hz, hzw)

    # ---- in-kernel CPML: psi recursion (j- and i-axis H terms) ----
    sf_hxy, sf_hzy, sf_hyx, sf_hzx = (jnp.dtype(dt).type(v) for v in sf)
    pjw = pj_ref[:].astype(cd)           # (tk, Pj, Ib)
    piw = pi_ref[:].astype(cd)           # (tk, J1, 128)
    bj = bj_ref[:].astype(cd)
    cj = cj_ref[:].astype(cd)
    bi = bi_ref[:].astype(cd)
    ci = ci_ref[:].astype(cd)

    # H j-terms difference the source at +1 along j; the diffs below are
    # exactly the curl's intermediates, so values match the xla path.
    d_hxy = ez_py - ez0
    d_hzy = ex_py - ex0

    def gather_j(d, j0):
        return jnp.concatenate([d[:, j0 : j0 + n, :], d[:, J - n : J, :]],
                               axis=1)

    def gather_i(d, i0):
        return jnp.concatenate([d[:, :, i0 : i0 + n], d[:, :, I - n : I]],
                               axis=2)

    gslab = jax.lax.broadcasted_iota(jnp.int32, (tk, 2 * n, Ib), 0) + L
    p_hxy = pjw[:, 0 : 2 * n, :]
    r_hxy = jnp.where(gslab < K,
                      bj[:, 0 : 2 * n] * p_hxy
                      + cj[:, 0 : 2 * n] * gather_j(d_hxy, 0),
                      p_hxy)
    p_hzy = pjw[:, 2 * n : 4 * n, :]
    r_hzy = jnp.where(gslab < K + 1,
                      bj[:, 2 * n : 4 * n] * p_hzy
                      + cj[:, 2 * n : 4 * n] * gather_j(d_hzy, 0),
                      p_hzy)

    # i-terms: fold the frozen-strip coupling back into the last lane of
    # the hi gather (chy = +Ez_s, chz = -Ey_s at the last corr lane), so
    # the diff at i = maxi-1 reads the true strip neighbor like _sget.
    # Only pack lane 2n-1 (physical i = maxi-1) takes the adjustment —
    # a where keeps every other lane's bits (incl. -0.0) untouched.
    g_hyx = gather_i(ez_px - ez0, 0)
    g_hzx = gather_i(ey_px - ey0, 0)
    if W == Ib:
        adj_y = gather_i(chy, 0)
        adj_z = gather_i(chz, 0)
    else:
        # chy/chz carry only the last W lanes; the hi slab [I-n, I) maps
        # to corr lanes [W-n, W).  The lo half of the pack is never read
        # (the where below selects lane 2n-1 only).
        adj_y = jnp.concatenate(
            [chy[:, :, W - 2 * n : W - n], chy[:, :, W - n : W]], axis=2)
        adj_z = jnp.concatenate(
            [chz[:, :, W - 2 * n : W - n], chz[:, :, W - n : W]], axis=2)
    lslab = jax.lax.broadcasted_iota(jnp.int32, g_hyx.shape, 2)
    g_hyx = jnp.where(lslab == 2 * n - 1, g_hyx + adj_y, g_hyx)
    g_hzx = jnp.where(lslab == 2 * n - 1, g_hzx - adj_z, g_hzx)
    gki = jax.lax.broadcasted_iota(jnp.int32, g_hyx.shape, 0) + L
    jji = jax.lax.broadcasted_iota(jnp.int32, g_hyx.shape, 1) + joff
    p_hyx = piw[:, :, 0 : 2 * n]
    r_hyx = jnp.where((gki < K) & (jji < J + 1),
                      bi[:, :, 0 : 2 * n] * p_hyx
                      + ci[:, :, 0 : 2 * n] * g_hyx,
                      p_hyx)
    p_hzx = piw[:, :, 2 * n : 4 * n]
    r_hzx = jnp.where((gki < K + 1) & (jji < J),
                      bi[:, :, 2 * n : 4 * n] * p_hzx
                      + ci[:, :, 2 * n : 4 * n] * g_hzx,
                      p_hzx)

    def scatter_j(v, j0, J1):
        parts = []
        if j0:
            parts.append(jnp.zeros((tk, j0, Ib), dt))
        parts.append(v[:, :n, :])
        mid = J - 2 * n - j0
        if mid:
            parts.append(jnp.zeros((tk, mid, Ib), dt))
        parts.append(v[:, n:, :])
        if J1 > J:
            parts.append(jnp.zeros((tk, J1 - J, Ib), dt))
        return jnp.concatenate(parts, axis=1)

    def scatter_i(v, i0):
        parts = []
        if i0:
            parts.append(jnp.zeros((tk, v.shape[1], i0), dt))
        parts.append(v[:, :, :n])
        mid = I - 2 * n - i0
        if mid:
            parts.append(jnp.zeros((tk, v.shape[1], mid), dt))
        parts.append(v[:, :, n:])
        return jnp.concatenate(parts, axis=2)

    J1 = shape[1]
    in_j0 = (jj < n) | ((jj >= J - n) & (jj < J))
    in_i0 = (lane < n) | ((lane >= I - n) & (lane < I))
    # per-target add order matches _TERMS: hx <- y; hy <- x; hz <- y then x
    hxp = jnp.where(in_j0 & (gk < K),
                    hxp + scatter_j(sf_hxy * r_hxy, 0, J1), hxp)
    hyp = jnp.where(in_i0 & (gk < K) & (jj < J + 1),
                    hyp + scatter_i(sf_hyx * r_hyx, 0), hyp)
    hzp = jnp.where(in_j0 & (gk < K + 1),
                    hzp + scatter_j(sf_hzy * r_hzy, 0, J1), hzp)
    hzp = jnp.where(in_i0 & (gk < K + 1) & (jj < J),
                    hzp + scatter_i(sf_hzx * r_hzx, 0), hzp)

    ohx[:] = hxp.astype(st)
    ohy[:] = hyp.astype(st)
    ohz[:] = hzp.astype(st)
    pj_tail = [pjw[:, 4 * n :, :]] if Pj > 4 * n else []
    opj[:] = jnp.concatenate([r_hxy, r_hzy] + pj_tail, axis=1).astype(st)
    pi_tail = [piw[:, :, 4 * n :]] if 4 * n < 128 else []
    opi[:] = jnp.concatenate([r_hyx, r_hzx] + pi_tail, axis=2).astype(st)


def _e_kernel_pml(p: Params, f_e, Ib, lossy, tk, n, Pj, sf,
                  koff_ref, hx_ref, hy_ref, hz_ref,
                  ex_ref, ey_ref, ez_ref, *rest):
    """E half-step + in-kernel ex_y/ez_y (j) and ey_x/ez_x (i) CPML.

    Curl body line-identical to :func:`fdtd_tpu.ops.pallas_fused.
    _e_kernel2`; ``sf`` = (sf_exy, sf_ezy, sf_eyx, sf_ezx) with the
    slab-constant cb factors folded.  Per-target add order matches
    _TERMS: ex <- y; ey <- x; ez <- x then y.
    """
    if lossy:
        cax_r, cay_r, caz_r, cbx_r, cby_r, cbz_r = rest[0:6]
        rest = rest[6:]
    (pj_ref, pi_ref, bj_ref, cj_ref, bi_ref, ci_ref,
     oex, oey, oez, opj, opi) = rest
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    I = Ib
    L = g * tk + koff_ref[0, 0]
    joff = koff_ref[0, 1]

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    hxw, hyw, hzw = hx_ref[:].astype(cd), hy_ref[:].astype(cd), hz_ref[:].astype(cd)
    exb, eyb, ezb = ex_ref[:].astype(cd), ey_ref[:].astype(cd), ez_ref[:].astype(cd)
    dt = cd

    hx0, hx_m1 = hxw[1:], hxw[:tk]
    hy0, hy_m1 = hyw[1:], hyw[:tk]
    hz0 = hzw[1:]

    shape = exb.shape
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + L
    jloc = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    jj = jloc + joff
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

    hz_my = jnp.roll(hz0, 1, axis=1)
    hz_mx = jnp.roll(hz0, 1, axis=2)
    hy_mx = jnp.roll(hy0, 1, axis=2)
    hx_my = jnp.roll(hx0, 1, axis=1)

    m_ex = (gk >= 1) & (gk < K) & (jj >= 1) & (jj < J)
    m_ey = (gk >= 1) & (gk < K) & (jj < J) & (ii >= 1)
    m_ez = (gk < K) & (jj >= 1) & (jj < J) & (ii >= 1)
    curl_x = (hz0 - hz_my) - (hy0 - hy_m1)
    curl_y = (hx0 - hx_m1) - (hz0 - hz_mx)
    curl_z = (hy0 - hy_mx) - (hx0 - hx_my)
    if lossy:
        new_x = cax_r[:].astype(cd) * exb + cbx_r[:].astype(cd) * curl_x
        new_y = cay_r[:].astype(cd) * eyb + cby_r[:].astype(cd) * curl_y
        new_z = caz_r[:].astype(cd) * ezb + cbz_r[:].astype(cd) * curl_z
    else:
        new_x = exb + f_e * curl_x
        new_y = eyb + f_e * curl_y
        new_z = ezb + f_e * curl_z
    exn = jnp.where(m_ex, new_x, exb)
    eyn = jnp.where(m_ey, new_y, eyb)
    ezn = jnp.where(m_ez, new_z, ezb)

    # ---- in-kernel CPML: psi recursion (j- and i-axis E terms) ----
    sf_exy, sf_ezy, sf_eyx, sf_ezx = (jnp.dtype(dt).type(v) for v in sf)
    pjw = pj_ref[:].astype(cd)
    piw = pi_ref[:].astype(cd)
    bj = bj_ref[:].astype(cd)
    cj = cj_ref[:].astype(cd)
    bi = bi_ref[:].astype(cd)
    ci = ci_ref[:].astype(cd)

    # E terms difference the source at -1 along the axis — exactly the
    # curl's backward differences.
    d_exy = hz0 - hz_my
    d_ezy = hx0 - hx_my
    d_eyx = hz0 - hz_mx
    d_ezx = hy0 - hy_mx

    def gather_j(d, j0):
        return jnp.concatenate([d[:, j0 : j0 + n, :], d[:, J - n : J, :]],
                               axis=1)

    def gather_i(d, i0):
        return jnp.concatenate([d[:, :, i0 : i0 + n], d[:, :, I - n : I]],
                               axis=2)

    gslab = jax.lax.broadcasted_iota(jnp.int32, (tk, 2 * n, Ib), 0) + L
    lslabj = jax.lax.broadcasted_iota(jnp.int32, (tk, 2 * n, Ib), 2)
    p_exy = pjw[:, 0 : 2 * n, :]
    r_exy = jnp.where((gslab >= 1) & (gslab < K),
                      bj[:, 0 : 2 * n] * p_exy
                      + cj[:, 0 : 2 * n] * gather_j(d_exy, 1),
                      p_exy)
    p_ezy = pjw[:, 2 * n : 4 * n, :]
    r_ezy = jnp.where((gslab < K) & (lslabj >= 1),
                      bj[:, 2 * n : 4 * n] * p_ezy
                      + cj[:, 2 * n : 4 * n] * gather_j(d_ezy, 1),
                      p_ezy)

    g_eyx = gather_i(d_eyx, 1)
    g_ezx = gather_i(d_ezx, 1)
    gki = jax.lax.broadcasted_iota(jnp.int32, g_eyx.shape, 0) + L
    jji = jax.lax.broadcasted_iota(jnp.int32, g_eyx.shape, 1) + joff
    p_eyx = piw[:, :, 0 : 2 * n]
    r_eyx = jnp.where((gki >= 1) & (gki < K) & (jji < J),
                      bi[:, :, 0 : 2 * n] * p_eyx
                      + ci[:, :, 0 : 2 * n] * g_eyx,
                      p_eyx)
    p_ezx = piw[:, :, 2 * n : 4 * n]
    r_ezx = jnp.where((gki < K) & (jji >= 1) & (jji < J),
                      bi[:, :, 2 * n : 4 * n] * p_ezx
                      + ci[:, :, 2 * n : 4 * n] * g_ezx,
                      p_ezx)

    def scatter_j(v, j0, J1):
        parts = []
        if j0:
            parts.append(jnp.zeros((tk, j0, Ib), dt))
        parts.append(v[:, :n, :])
        mid = J - 2 * n - j0
        if mid:
            parts.append(jnp.zeros((tk, mid, Ib), dt))
        parts.append(v[:, n:, :])
        if J1 > J:
            parts.append(jnp.zeros((tk, J1 - J, Ib), dt))
        return jnp.concatenate(parts, axis=1)

    def scatter_i(v, i0):
        parts = []
        if i0:
            parts.append(jnp.zeros((tk, v.shape[1], i0), dt))
        parts.append(v[:, :, :n])
        mid = I - 2 * n - i0
        if mid:
            parts.append(jnp.zeros((tk, v.shape[1], mid), dt))
        parts.append(v[:, :, n:])
        return jnp.concatenate(parts, axis=2)

    J1 = shape[1]
    in_j1 = ((jj >= 1) & (jj < 1 + n)) | ((jj >= J - n) & (jj < J))
    in_i1 = ((ii >= 1) & (ii < 1 + n)) | ((ii >= I - n) & (ii < I))
    exn = jnp.where(in_j1 & (gk >= 1) & (gk < K),
                    exn + scatter_j(sf_exy * r_exy, 1, J1), exn)
    eyn = jnp.where(in_i1 & (gk >= 1) & (gk < K) & (jj < J),
                    eyn + scatter_i(sf_eyx * r_eyx, 1), eyn)
    ezn = jnp.where(in_i1 & (gk < K) & (jj >= 1) & (jj < J),
                    ezn + scatter_i(sf_ezx * r_ezx, 1), ezn)
    ezn = jnp.where(in_j1 & (gk < K) & (ii >= 1),
                    ezn + scatter_j(sf_ezy * r_ezy, 1, J1), ezn)

    oex[:] = exn.astype(st)
    oey[:] = eyn.astype(st)
    oez[:] = ezn.astype(st)
    pj_tail = [pjw[:, 4 * n :, :]] if Pj > 4 * n else []
    opj[:] = jnp.concatenate([r_exy, r_ezy] + pj_tail, axis=1).astype(st)
    pi_tail = [piw[:, :, 4 * n :]] if 4 * n < 128 else []
    opi[:] = jnp.concatenate([r_eyx, r_ezx] + pi_tail, axis=2).astype(st)


def build_pml_twopass_calls(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                            interpret: bool, tk: int | None = None):
    """(h_call, e_call, tk) with the j/i psi packs as aliased operands.

    ``h_call(koff, ex, ey, ez, hx, hy, hz, chy, chz, [hf x3], h_j, h_i,
    bj, cj, bi, ci) -> (hx, hy, hz, h_j, h_i)``; ``e_call`` analogous
    with the E pack and (with lossy coefs) the six ca/cb slabs.
    """
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    n = cfg.cells
    Pj = _pad8(4 * n)
    S, J1, Ib = dims(p)
    W = corr_width(Ib)
    if tk is None:
        tk = tile_k(p, lossy)
    ofs = D // tk
    nk = (S - D) // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    f_e = compute_dtype.type(0.0) if lossy else compute_dtype.type(coefs.cb_x)
    inject = p.mode == Mode.COMPUTATION
    patch = None
    if inject:
        from ..source import make_source_plan

        plan = make_source_plan(p)
        patch = (plan.j0, plan.j1, plan.i0, plan.i1)

    fac = slab_factor_constants(p, cfg, coefs)
    if fac is None:
        raise ValueError(
            "in-kernel CPML needs slab-constant correction factors "
            "(materials overlap the absorber); use the xla path"
        )
    sf_h = (-fac["hx_y"], +fac["hz_y"], +fac["hy_x"], -fac["hz_x"])
    sf_e = (+fac["ex_y"], -fac["ez_y"], -fac["ey_x"], +fac["ez_x"])

    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    pj_shape = jax.ShapeDtypeStruct((S, Pj, Ib), dtype)
    pi_shape = jax.ShapeDtypeStruct((S, J1, 128), dtype)
    blk = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((tk, J1, W), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    pjb = pl.BlockSpec((tk, Pj, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    pib = pl.BlockSpec((tk, J1, 128), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    bcj = pl.BlockSpec((1, Pj, 1), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    bci = pl.BlockSpec((1, 1, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    e_up = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 1)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + ofs) * tk, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_dn = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 0)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + ofs) * tk - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    nhet = 3 if het else 0
    h_aliases = {} if interpret else {
        4: 0, 5: 1, 6: 2, 9 + nhet: 3, 10 + nhet: 4,
    }
    h_call = pl.pallas_call(
        functools.partial(_h_kernel_pml, p, f_h, patch, Ib, W, tk, het,
                          n, Pj, sf_h),
        grid=(nk,),
        in_specs=[smem] + [e_up] * 3 + [blk] * 3 + [cblk] * 2
        + ([blk] * 3 if het else [])
        + [pjb, pib, bcj, bcj, bci, bci],
        out_specs=[blk] * 3 + [pjb, pib],
        out_shape=(bulk_shape,) * 3 + (pj_shape, pi_shape),
        input_output_aliases=h_aliases,
        compiler_params=cp,
        interpret=interpret,
    )
    nlossy = 6 if lossy else 0
    e_aliases = {} if interpret else {
        4: 0, 5: 1, 6: 2, 7 + nlossy: 3, 8 + nlossy: 4,
    }
    e_call = pl.pallas_call(
        functools.partial(_e_kernel_pml, p, f_e, Ib, lossy, tk,
                          n, Pj, sf_e),
        grid=(nk,),
        in_specs=[smem] + [h_dn] * 3 + [blk] * 3
        + ([blk] * 6 if lossy else [])
        + [pjb, pib, bcj, bcj, bci, bci],
        out_specs=[blk] * 3 + [pjb, pib],
        out_shape=(bulk_shape,) * 3 + (pj_shape, pi_shape),
        input_output_aliases=e_aliases,
        compiler_params=cp,
        interpret=interpret,
    )
    return h_call, e_call, tk


def make_strip_hxy_correct(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                           dtype=None):
    """hx_y's psi recursion + correction on the i = maxi strip column.

    The only j/i-axis term whose target spans the strip (Hx bounds
    i < maxi+1, main.c:445-449).  Reads the PEC-frozen ez strip, so
    this is a tiny (S, 2n) XLA update between the H pass and the
    k-axis corrections — same arithmetic and position in the add
    order as the xla path's hx_y strip handling."""
    dt = jnp.dtype(dtype or p.dtype)
    n = cfg.cells
    K, J = p.maxk, p.maxj
    S, J1, _ = dims(p)
    plan = build_plan(p, cfg, dt)
    b = jnp.asarray(np.asarray(plan["hx_y"][6]).ravel()[None, :], dt)
    c = jnp.asarray(np.asarray(plan["hx_y"][7]).ravel()[None, :], dt)
    fac = slab_factor_constants(p, cfg, coefs)
    sf = dt.type(-fac["hx_y"])
    Ps = _pad8(2 * n)

    def correct(st: StrippedState, pp: PsiPacked):
        ez = st.ez_s[:, :, 0]                              # (S, J1)
        d_lo = ez[:, 1 : n + 1] - ez[:, 0:n]
        d_hi = ez[:, J - n + 1 : J + 1] - ez[:, J - n : J]
        diff = jnp.concatenate([d_lo, d_hi], axis=1)        # (S, 2n)
        ps = pp.hxy_s[:, 0 : 2 * n, 0]
        krow = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * n), 0)
        valid = (krow >= D) & (krow < D + K)
        rec = jnp.where(valid, b * ps + c * diff, ps)
        corr = sf * rec
        scat = [corr[:, :n]]
        if J - 2 * n:
            scat.append(jnp.zeros((S, J - 2 * n), dt))
        scat.append(corr[:, n:])
        if J1 > J:
            scat.append(jnp.zeros((S, J1 - J), dt))
        scat = jnp.concatenate(scat, axis=1)                # (S, J1)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (S, J1), 1)
        kro2 = jax.lax.broadcasted_iota(jnp.int32, (S, J1), 0)
        slab = (jrow < n) | ((jrow >= J - n) & (jrow < J))
        kval = (kro2 >= D) & (kro2 < D + K)
        hxs = st.hx_s[:, :, 0]
        hxs = jnp.where(slab & kval, hxs + scat, hxs).astype(dt)
        new_ps = jnp.concatenate(
            [rec.astype(dt)[:, :, None], pp.hxy_s[:, 2 * n :, :]], axis=1)
        return (
            dataclasses.replace(st, hx_s=hxs[:, :, None]),
            dataclasses.replace(pp, hxy_s=new_ps),
        )

    return correct


def make_pml_kernel_step(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                         interpret: bool | None = None):
    """One CPML leapfrog step, psi in-kernel:
    ``step((st, pp), (t, amp)) -> (st, pp)`` on
    ``(StrippedState, PsiPacked)``."""
    from ..source import make_source_plan

    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    h_call, e_call, _tk = build_pml_twopass_calls(p, cfg, coefs, interpret)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    inject = p.mode == Mode.COMPUTATION
    inj = (
        make_inject_source(p, make_source_plan(p), dtype) if inject else None
    )
    strip_correct = make_strip_hxy_correct(p, cfg, coefs)
    h_correct_k, _ = make_stripped_cpml_corrections(
        p, cfg, coefs, terms=_H_K_TERMS)
    _, e_correct_k = make_stripped_cpml_corrections(
        p, cfg, coefs, terms=_E_K_TERMS)
    bc = _bc_vectors(p, cfg, dtype)  # host constants (axon hazard rule)
    zoff = np.zeros((1, 2), np.int32)

    def step(carry, x):
        st, pp = carry
        _t, amp = x
        if inject:
            st = inj(st, amp)
        hextra = (st.hf_x, st.hf_y, st.hf_z) if het else ()
        hx, hy, hz, pj, pi = h_call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, *hextra,
            pp.h_j, pp.h_i,
            jnp.asarray(bc[0]), jnp.asarray(bc[1]),
            jnp.asarray(bc[2]), jnp.asarray(bc[3]),
        )
        st = dataclasses.replace(st, hx=hx, hy=hy, hz=hz)
        pp = dataclasses.replace(pp, h_j=pj, h_i=pi)
        st = dataclasses.replace(st, hx_s=advance_hx_strip(p, st, f_h, het))
        st, pp = strip_correct(st, pp)
        st, pp = h_correct_k(st, pp)
        if inject:
            st = inj(st, amp)  # restore the patch (second application)
        eextra = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy else ()
        )
        ex, ey, ez, pej, pei = e_call(
            jnp.asarray(zoff), st.hx, st.hy, st.hz, st.ex, st.ey, st.ez,
            *eextra,
            pp.e_j, pp.e_i,
            jnp.asarray(bc[4]), jnp.asarray(bc[5]),
            jnp.asarray(bc[6]), jnp.asarray(bc[7]),
        )
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez)
        pp = dataclasses.replace(pp, e_j=pej, e_i=pei)
        st, pp = e_correct_k(st, pp)
        return (st, pp)

    return step


def make_pml_kernel_chunk_runner(p: Params, cfg: PMLConfig,
                                 materials: Materials | None = None,
                                 accumulate_power: bool = False,
                                 interpret: bool | None = None):
    """Jitted ``run((st, pp), xs, power) -> ((st, pp), power)`` —
    the in-kernel analogue of :func:`fdtd_tpu.ops.cpml_fast.
    make_pml_fast_chunk_runner` (same donation contract)."""
    from .. import diagnostics
    from ..step import _huge_state

    coefs = update_coefs(p, materials)
    step = make_pml_kernel_step(p, cfg, coefs, interpret)
    dt_step = p.time_step
    K, J = p.maxk, p.maxj

    def _power_inc(st, acc):
        sg = st.sigma_c[D : D + K, :J]
        inc = diagnostics.power_deposition_stripped(p, st, sg)
        return acc + (inc * dt_step).astype(acc.dtype)

    if _huge_state(p):
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


def make_pml_kernel_dft_chunk_runner(p: Params, cfg: PMLConfig,
                                     materials: Materials | None,
                                     dft,
                                     accumulate_power: bool = False,
                                     interpret: bool | None = None):
    """Monitored in-kernel CPML runner (r5): the OPEN-BOUNDARY
    steady-state phasor rides the kernel tier instead of the xla scan
    (the last monitored composition on the slow path after r4).

    ``run((st, pp), (ts, amps, cw, sw), power, dft_acc) ->
    ((st, pp), power, dft_acc, None)`` — the monitored-chunk contract.
    Each step runs :func:`make_pml_kernel_step` (psi in-kernel, k-axis
    corrections and the hx_y strip applied after the passes — the DFT
    pass reads the FINAL E of the step, so the absorber-slab phasors
    are exact), then the blocked accumulation pass
    (:func:`fdtd_tpu.ops.pallas_stream.build_dft_accum_call`) folds the
    step's cell means into the stacked phasor accumulator in place.
    ``dft_acc`` is canonical (re, im) at chunk boundaries (checkpoint-
    compatible with every other monitored tier).  fields='e',
    computation mode (the accumulation pass's gate)."""
    from .. import diagnostics
    from ..step import _huge_state
    from .pallas_stream import (
        build_dft_accum_call,
        crop_dft_acc,
        embed_dft_acc,
    )

    nf = dft.nf
    assert dft.fields == "e", "in-kernel DFT carries E phasors only"
    assert p.mode == Mode.COMPUTATION
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    coefs = update_coefs(p, materials)
    step = make_pml_kernel_step(p, cfg, coefs, interpret)
    accum = build_dft_accum_call(p, nf, interpret)
    dt_step = p.time_step
    K, J = p.maxk, p.maxj

    def _power_inc(st, acc):
        sg = st.sigma_c[D : D + K, :J]
        inc = diagnostics.power_deposition_stripped(p, st, sg)
        return acc + (inc * dt_step).astype(acc.dtype)

    def _after(carry, acc, dacc, cwv, swv):
        st = carry[0]
        wts = jnp.concatenate([cwv, swv])[None, :]
        dacc = accum(st.ex, st.ey, st.ez, wts, dacc)
        if accumulate_power:
            acc = _power_inc(st, acc)
        return acc, dacc

    if _huge_state(p):
        @functools.partial(
            jax.jit,
            donate_argnums=(0, 1, 2) if accumulate_power else (0, 2),
        )
        def one(carry, acc, dacc, t, amp, cwv, swv):
            carry = step(carry, (t, amp))
            acc, dacc = _after(carry, acc, dacc, cwv, swv)
            return carry, acc, dacc

        def run_host(carry, xs, power_acc, dft_acc):
            ts, amps, cw, sw = (np.asarray(a) for a in xs)
            dacc = embed_dft_acc(p, dft_acc, nf)
            for i in range(ts.shape[0]):
                carry, power_acc, dacc = one(
                    carry, power_acc, dacc, ts[i], amps[i],
                    jnp.asarray(cw[i]), jnp.asarray(sw[i]))
            return carry, power_acc, crop_dft_acc(p, dacc, nf), None

        return run_host

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc, dft_acc):
        ts, amps, cw, sw = xs
        dacc = embed_dft_acc(p, dft_acc, nf)

        def body(c, x):
            carry, acc, dacc = c
            t, amp, cwv, swv = x
            carry = step(carry, (t, amp))
            acc, dacc = _after(carry, acc, dacc, cwv, swv)
            return (carry, acc, dacc), None

        (carry, acc, dacc), _ = jax.lax.scan(
            body, (carry, power_acc, dacc),
            (ts, amps, jnp.asarray(cw), jnp.asarray(sw)))
        return carry, acc, crop_dft_acc(p, dacc, nf), None

    return run
