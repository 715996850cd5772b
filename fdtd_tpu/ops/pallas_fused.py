"""Single-pass fused Pallas kernel: source + H + source + E in one sweep.

The v2 TPU hot path.  Two ideas beyond :mod:`fdtd_tpu.ops.pallas_step`:

1. **Aligned strip layout.**  The padded uniform arrays have a 2^n+1 minor
   (i) extent, and misaligned 257-lane DMA runs at ~55% of HBM peak while
   256-lane runs at ~85% (measured on v5e).  So the hot state stores a
   (S, J+1, Ib=maxi) *bulk* plus tiny (S, J+1, 1) *strips* holding the
   i=maxi column of the only components that have one (Ey, Ez, Hx).
   Ey/Ez strips are PEC-frozen (never updated by the reference's E loops,
   main.c:483-499); their coupling into the last bulk column of Hy/Hz is a
   *constant* field folded into lane-aligned correction arrays carried in
   the state.  The Hx strip evolves but is never read back by any E
   update, so it gets a cheap 2-D jnp update outside the kernel.

2. **Whole-step fusion.**  One kernel computes H' from E (one halo row
   below each output slab, recomputed redundantly) and then E' from H', so
   per step each field is read once and written once (~54 B/cell at TK=8
   vs 75 for the two-pass version).  Both source applications (reference
   main.c:770-778) happen in-kernel on the k=0 rows with drive planes
   precomputed outside to bit-match the jnp path.

Layout bookkeeping: storage row s holds physical row k = s - TK; the
leading TK rows are a dead zero slab so every Element window start
``(g+1)*TK-1`` is nonnegative (Mosaic does not support low padding) and
"k = -1" reads are genuine zeros.  Output slab b = g+1 is Blocked — it
never touches the dead slab, which stays zero via input/output aliasing.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Mode, Params
from ..source import make_source_plan
from ..state import FieldState, UpdateCoefs

TK = 8  # layout dead-slab rows (fixed); also the default tile size
D = 8   # dead slab rows — layout constant, independent of the tile size


def dims(p: Params):
    """(S, J1p, Ib): storage rows, 8-aligned j extent, bulk i extent.

    j is padded to a sublane multiple: Mosaic scratch slicing requires
    8-aligned sublane extents at some sizes, and the padding rows are inert
    (zero-initialized; every update that could touch them is masked or reads
    only zeros)."""
    K1, J1, I1 = p.padded_shape
    Kp = ((K1 + D - 1) // D) * D
    J1p = ((J1 + 7) // 8) * 8
    return Kp + D, J1p, p.maxi


def tile_k(p: Params, lossy: bool = False) -> int:
    """Largest k-tile (divisor of D) whose VMEM footprint fits the budget.

    Estimate: double-buffered in+out windows of both passes; the lossy E
    pass additionally streams six coefficient slabs."""
    _, J1, Ib = dims(p)
    itemsize = jnp.dtype(p.dtype).itemsize
    plane = ((J1 + 7) // 8 * 8) * ((Ib + 127) // 128 * 128) * itemsize
    budget = 100 * 1024 * 1024
    for tk in (8, 4, 2, 1):
        per_pass = 3 * (tk + 1) + (9 * tk if lossy else 3 * tk) + 3 * tk + 2 * tk
        if 2 * per_pass * plane <= budget:
            return tk
    return 1


def corr_width(Ib: int) -> int:
    """Lane-aligned width of the strip-correction arrays."""
    return Ib if Ib % 128 else 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ex", "ey", "ez", "hx", "hy", "hz", "ey_s", "ez_s", "hx_s",
        "corr_hy", "corr_hz", "ca_x", "ca_y", "ca_z", "cb_x", "cb_y", "cb_z",
        "sigma_c", "hf_x", "hf_y", "hf_z", "hfx_s",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class StrippedState:
    """Hot-path layout: six (S, J1, Ib) bulks, three (S, J1, 1) strips, two
    (S, J1, W) constant correction arrays (W = corr_width(Ib)), and — for
    lossy media — six embedded ca/cb coefficient arrays.

    Per-simulation constants ride in the state (scan carries them
    unchanged) rather than as closure captures: closed-over arrays embed as
    HLO constants, which explodes compile time at 256^3."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    ey_s: jax.Array
    ez_s: jax.Array
    hx_s: jax.Array
    corr_hy: jax.Array  # + Ez_s at the last lane (x curl coupling)
    corr_hz: jax.Array  # - Ey_s at the last lane
    ca_x: jax.Array | None = None
    ca_y: jax.Array | None = None
    ca_z: jax.Array | None = None
    cb_x: jax.Array | None = None
    cb_y: jax.Array | None = None
    cb_z: jax.Array | None = None
    sigma_c: jax.Array | None = None  # cell sigma (SAR; embedded layout)
    hf_x: jax.Array | None = None  # heterogeneous-mu H factors (embedded)
    hf_y: jax.Array | None = None
    hf_z: jax.Array | None = None
    hfx_s: jax.Array | None = None  # hf_x at the i=maxi strip column


def stripped_zeros(p: Params) -> StrippedState:
    """All-zero vacuum state directly in the hot-path layout.

    Equivalent to ``to_stripped(p, zeros(p))`` but allocates only the
    stripped buffers: at 1024^3 bf16 the layout-conversion graph's
    intermediates can tip a 16 GB chip over the edge even under jit, while
    six plain zero fills cannot.  (Computation-mode runs start from zeros —
    reference main.c:294-364 — so this is the standard large-grid start.)"""
    S, J1p, Ib = dims(p)
    dtype = jnp.dtype(p.dtype)
    W = corr_width(Ib)
    bulk = lambda: jnp.zeros((S, J1p, Ib), dtype)
    return StrippedState(
        ex=bulk(), ey=bulk(), ez=bulk(), hx=bulk(), hy=bulk(), hz=bulk(),
        ey_s=jnp.zeros((S, J1p, 1), dtype),
        ez_s=jnp.zeros((S, J1p, 1), dtype),
        hx_s=jnp.zeros((S, J1p, 1), dtype),
        corr_hy=jnp.zeros((S, J1p, W), dtype),
        corr_hz=jnp.zeros((S, J1p, W), dtype),
    )


def embed_coef(p: Params, a, fill):
    """Embed a (K1, J1, I1) coefficient array into the stripped bulk box."""
    S, J1p, Ib = dims(p)
    K1, J1, _ = p.padded_shape
    dtype = jnp.dtype(p.dtype)
    out = jnp.full((S, J1p, Ib), fill, dtype)
    return out.at[D : D + K1, :J1].set(jnp.asarray(a, dtype)[:, :, :Ib])


def to_stripped(p: Params, s: FieldState, coefs: UpdateCoefs | None = None) -> StrippedState:
    S, J1p, Ib = dims(p)
    K1, J1, _ = p.padded_shape
    W = corr_width(Ib)

    def emb(a):  # (K1, J1, I1) -> (S, J1p, Ib)
        out = jnp.zeros((S, J1p, Ib), a.dtype)
        return out.at[D : D + K1, :J1].set(a[:, :, :Ib])

    def strip(a):
        out = jnp.zeros((S, J1p, 1), a.dtype)
        return out.at[D : D + K1, :J1].set(a[:, :, Ib : Ib + 1])

    ey_s = strip(s.ey)
    ez_s = strip(s.ez)
    corr_hy = jnp.zeros((S, J1p, W), s.ey.dtype).at[:, :, W - 1 :].set(ez_s)
    corr_hz = jnp.zeros((S, J1p, W), s.ey.dtype).at[:, :, W - 1 :].set(-ey_s)

    st = StrippedState(
        emb(s.ex), emb(s.ey), emb(s.ez), emb(s.hx), emb(s.hy), emb(s.hz),
        ey_s, ez_s, strip(s.hx), corr_hy, corr_hz,
    )
    if coefs is not None and not isinstance(coefs.ca_x, (int, float)):
        st = dataclasses.replace(
            st,
            ca_x=embed_coef(p, coefs.ca_x, 1.0),
            ca_y=embed_coef(p, coefs.ca_y, 1.0),
            ca_z=embed_coef(p, coefs.ca_z, 1.0),
            cb_x=embed_coef(p, coefs.cb_x, 0.0),
            cb_y=embed_coef(p, coefs.cb_y, 0.0),
            cb_z=embed_coef(p, coefs.cb_z, 0.0),
        )
        if coefs.heterogeneous_mu:
            fh = float(np.asarray(coefs.h_factor))
            hfx_s = jnp.full((S, J1p, 1), fh, jnp.dtype(p.dtype))
            hfx_s = hfx_s.at[D : D + K1, :J1].set(
                jnp.asarray(coefs.hf_x, jnp.dtype(p.dtype))[:, :, Ib : Ib + 1]
            )
            st = dataclasses.replace(
                st,
                hf_x=embed_coef(p, coefs.hf_x, fh),
                hf_y=embed_coef(p, coefs.hf_y, fh),
                hf_z=embed_coef(p, coefs.hf_z, fh),
                hfx_s=hfx_s,
            )
        if coefs.sigma_cells is not None:
            # cell-centered sigma rides in the state too (the SAR kernels
            # read it in the storage layout; a closure array would embed as
            # an HLO constant — compile bloat + axon-tunnel hazards)
            dty = jnp.dtype(p.dtype)
            full = jnp.zeros((S, J1p, Ib), dty)
            st = dataclasses.replace(
                st,
                sigma_c=full.at[D : D + p.maxk, : p.maxj].set(
                    jnp.asarray(coefs.sigma_cells, dty)[:, :, :Ib]
                ),
            )
    return st


def to_full(p: Params, st: StrippedState) -> FieldState:
    K1, J1, _ = p.padded_shape
    z = lambda b: jnp.zeros((K1, J1, 1), b.dtype)

    def comb(bulk, strip_col):
        return jnp.concatenate([bulk[D : D + K1, :J1], strip_col], axis=2)

    return FieldState(
        ex=comb(st.ex, z(st.ex)),
        ey=comb(st.ey, st.ey_s[D : D + K1, :J1]),
        ez=comb(st.ez, st.ez_s[D : D + K1, :J1]),
        hx=comb(st.hx, st.hx_s[D : D + K1, :J1]),
        hy=comb(st.hy, z(st.hy)),
        hz=comb(st.hz, z(st.hz)),
    )


def _kernel(p: Params, f_h, f_e, patch, Ib, W, tk,
            ex_ref, ey_ref, ez_ref, hx_ref, hy_ref, hz_ref,
            chy_ref, chz_ref,
            oex, oey, oez, ohx, ohy, ohz):
    """One whole leapfrog step on output slab g+1.

    Source semantics: injection happens *outside* the kernel (a tiny
    dynamic-update-slice on the k=0 plane before the call), and ``patch``
    (a static rectangle (j0, j1, i0, i1) or None) excludes the patch cells
    from the Hx/Hz update — leaving them at their injected base, which is
    exactly the reference's set_source -> update_H -> set_source sequence
    (main.c:770-778): the second hard-set overwrites whatever update_H
    accumulated on the patch.
    """
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g * tk  # first output k row

    # E window: k rows L-1 .. L+tk+1 (tk+3 rows); H window: L-1 .. H (tk+1)
    exw, eyw, ezw = ex_ref[:], ey_ref[:], ez_ref[:]
    hxw, hyw, hzw = hx_ref[:], hy_ref[:], hz_ref[:]

    dt = exw.dtype
    gk_h = jax.lax.broadcasted_iota(jnp.int32, hxw.shape, 0) + (L - 1)
    jj_h = jax.lax.broadcasted_iota(jnp.int32, hxw.shape, 1)

    # --- H half-step on k rows L-1 .. H ---
    ex0, ex1 = exw[: tk + 1], exw[1 : tk + 2]
    ey0, ey1 = eyw[: tk + 1], eyw[1 : tk + 2]
    ez0 = ezw[: tk + 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, ex0.shape, 2)
    zf = jnp.zeros((), dt)
    # i+1 shifts, zero beyond the bulk; the frozen strip coupling enters via
    # the constant correction arrays on the last lane group below.
    ey_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ey0, -1, axis=2))
    ez_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ez0, -1, axis=2))
    ez_py = jnp.roll(ez0, -1, axis=1)
    ex_py = jnp.roll(ex0, -1, axis=1)

    inc_hy = (ez_px - ez0) - (ex1 - ex0)
    inc_hz = (ex_py - ex0) - (ey_px - ey0)
    chy = chy_ref[:]  # (TK+1, J1, W)
    chz = chz_ref[:]
    if W == Ib:
        inc_hy = inc_hy + chy
        inc_hz = inc_hz + chz
    else:
        inc_hy = jnp.concatenate([inc_hy[:, :, : Ib - W], inc_hy[:, :, Ib - W :] + chy], axis=2)
        inc_hz = jnp.concatenate([inc_hz[:, :, : Ib - W], inc_hz[:, :, Ib - W :] + chz], axis=2)

    m_hx = (gk_h < K) & (jj_h < J)
    m_hy = gk_h < K
    m_hz = (gk_h < K + 1) & (jj_h < J)
    if patch is not None:
        j0, j1, i0, i1 = patch
        ii_hh = lane[:, :, :]  # same shape as the H window
        m_patch = (
            (gk_h == 0)
            & (jj_h >= j0) & (jj_h < j1)
            & (ii_hh >= i0) & (ii_hh < i1)
        )
        m_hx = m_hx & ~m_patch
        m_hz = m_hz & ~m_patch
    hxp = jnp.where(m_hx, hxw + f_h * ((ey1 - ey0) - (ez_py - ez0)), hxw)
    hyp = jnp.where(m_hy, hyw + f_h * inc_hy, hyw)
    hzp = jnp.where(m_hz, hzw + f_h * inc_hz, hzw)

    # --- E half-step on k rows L .. H ---
    hx0, hx_m1 = hxp[1:], hxp[:-1]
    hy0, hy_m1 = hyp[1:], hyp[:-1]
    hz0 = hzp[1:]
    exb = exw[1 : tk + 1]
    eyb = eyw[1 : tk + 1]
    ezb = ezw[1 : tk + 1]

    # fresh iotas (slicing a broadcast iota crashes Mosaic's layout pass)
    eshape = hx0.shape
    gk = jax.lax.broadcasted_iota(jnp.int32, eshape, 0) + L
    jj = jax.lax.broadcasted_iota(jnp.int32, eshape, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, eshape, 2)
    hz_my = jnp.roll(hz0, 1, axis=1)
    hz_mx = jnp.roll(hz0, 1, axis=2)
    hy_mx = jnp.roll(hy0, 1, axis=2)
    hx_my = jnp.roll(hx0, 1, axis=1)

    m_ex = (gk >= 1) & (gk < K) & (jj >= 1) & (jj < J)
    m_ey = (gk >= 1) & (gk < K) & (jj < J) & (ii >= 1)
    m_ez = (gk < K) & (jj >= 1) & (jj < J) & (ii >= 1)
    oex[:] = jnp.where(m_ex, exb + f_e * ((hz0 - hz_my) - (hy0 - hy_m1)), exb)
    oey[:] = jnp.where(m_ey, eyb + f_e * ((hx0 - hx_m1) - (hz0 - hz_mx)), eyb)
    oez[:] = jnp.where(m_ez, ezb + f_e * ((hy0 - hy_mx) - (hx0 - hx_my)), ezb)
    ohx[:] = hxp[1:]
    ohy[:] = hyp[1:]
    ohz[:] = hzp[1:]


def _h_kernel2(p: Params, f_h, patch, Ib, W, tk, jwin, het,
               koff_ref, ex_ref, ey_ref, ez_ref, hx_ref, hy_ref, hz_ref, chy_ref, chz_ref,
               *rest):
    """H half-step on slab g+1 (k rows L..H); E windows carry one halo row up.

    Alias-safe: writes only H, whose blocks are read without cross-block
    halos in this pass.  ``koff_ref`` holds the shard's global (k, j)
    offsets ((0, 0) single-device) so the staggered/PEC masks and the
    source-patch exclusion see *global* indices under spatial sharding.
    ``jwin``: (lo, hi) storage-row bounds of the locally-owned j rows under
    2-D decomposition (None = own the whole extent); writes outside stay at
    their input value so the j halo/pad rows hold exactly what the exchange
    put there.  With ``het`` (heterogeneous mu_r), three extra blocked
    inputs carry the per-component face-averaged H factors and replace the
    scalar ``f_h``.
    """
    if het:
        hfx_r, hfy_r, hfz_r, ohx, ohy, ohz = rest
    else:
        ohx, ohy, ohz = rest
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g * tk + koff_ref[0, 0]
    joff = koff_ref[0, 1]

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st  # fp32 compute on bf16 storage
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
    if jwin is not None:
        own = (jloc >= jwin[0]) & (jloc < jwin[1])
        m_hx, m_hy, m_hz = m_hx & own, m_hy & own, m_hz & own
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
    ohx[:] = jnp.where(m_hx, hxw + fhx * ((ey1 - ey0) - (ez_py - ez0)), hxw).astype(st)
    ohy[:] = jnp.where(m_hy, hyw + fhy * inc_hy, hyw).astype(st)
    ohz[:] = jnp.where(m_hz, hzw + fhz * inc_hz, hzw).astype(st)


def _e_kernel2(p: Params, f_e, Ib, lossy, tk, jwin,
               koff_ref, hx_ref, hy_ref, hz_ref, ex_ref, ey_ref, ez_ref,
               *rest):
    """E half-step on slab g+1; H windows carry one halo row down.

    Alias-safe: writes only E; the H halo rows were finalized by the H pass.
    With ``lossy``, six extra blocked inputs carry the per-component ca/cb
    coefficient slabs and the update is E' = ca*E + cb*curl(H) (vacuum:
    ca == 1, cb == f_e, no extra inputs).  ``koff_ref``/``jwin`` as in
    :func:`_h_kernel2`.
    """
    if lossy:
        cax_r, cay_r, caz_r, cbx_r, cby_r, cbz_r, oex, oey, oez = rest
    else:
        oex, oey, oez = rest
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g * tk + koff_ref[0, 0]
    joff = koff_ref[0, 1]

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    hxw, hyw, hzw = hx_ref[:].astype(cd), hy_ref[:].astype(cd), hz_ref[:].astype(cd)  # rows L-1..H
    exb, eyb, ezb = ex_ref[:].astype(cd), ey_ref[:].astype(cd), ez_ref[:].astype(cd)  # rows L..H

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
    if jwin is not None:
        own = (jloc >= jwin[0]) & (jloc < jwin[1])
        m_ex, m_ey, m_ez = m_ex & own, m_ey & own, m_ez & own
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
    oex[:] = jnp.where(m_ex, new_x, exb).astype(st)
    oey[:] = jnp.where(m_ey, new_y, eyb).astype(st)
    oez[:] = jnp.where(m_ez, new_z, ezb).astype(st)


def make_inject_source(p: Params, plan, dtype):
    """Build the stripped-layout source hard-set (k=0 plane, storage row
    ``D``), computed exactly like :func:`fdtd_tpu.source.apply_source`
    for bit-parity.  Shared by :func:`make_fused_step` and the CPML fast
    composition (:mod:`fdtd_tpu.ops.cpml_fast`)."""

    def inject_source(st: StrippedState, amp) -> StrippedState:
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        nj, ni = plan.j1 - plan.j0, len(plan.profile)
        pv = jnp.broadcast_to(row[None, :], (nj, ni))
        zero = jnp.zeros((nj, ni), dtype)
        sl = (D, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
        return dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
        )

    return inject_source


def advance_hx_strip(p: Params, st: StrippedState, f_h, het: bool):
    """One H-update of the Hx i=maxi strip column; returns the new hx_s.

    Write-only boundary column (reference Hx bounds i < maxi+1,
    main.c:445-449); its E neighbors are the PEC-frozen Ey/Ez strips, so
    this is a 2-D jnp update of ~K1*J1 cells outside the kernels."""
    K, J = p.maxk, p.maxj
    ey_s2 = st.ey_s[:, :, 0]
    ez_s2 = st.ez_s[:, :, 0]
    sl = (slice(D, D + K), slice(0, J))
    curl = (ey_s2[D + 1 : D + K + 1, :J] - ey_s2[sl]) - (
        ez_s2[D : D + K, 1 : J + 1] - ez_s2[sl]
    )
    fh_s = st.hfx_s[sl[0], sl[1], 0] if het else f_h
    return st.hx_s.at[sl[0], sl[1], 0].add((fh_s * curl).astype(st.hx_s.dtype))


def make_fused_step(p: Params, coefs: UpdateCoefs, interpret: bool | None = None,
                    two_pass: bool = True):
    """Build ``step(state: StrippedState, (t, amp)) -> StrippedState``.

    ``two_pass=True`` (default) runs H and E as separate aliased in-place
    kernels — alias-safe and measurably faster on v5e; ``False`` uses the
    single fused whole-step kernel (lower theoretical traffic but must
    ping-pong buffers because the one-row-down halo recompute would race
    with in-place writes).
    """
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    if not lossy and coefs.ca_x != 1.0:
        raise NotImplementedError("scalar non-vacuum ca is not expected")
    if (lossy or het) and not two_pass:
        raise NotImplementedError("materials require the two_pass fast path")
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")

    S, J1, Ib = dims(p)
    W = corr_width(Ib)
    tk = tile_k(p, lossy)
    ofs = D // tk  # output block offset: dead slab = ofs tiles
    nk = (S - D) // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    f_e = compute_dtype.type(coefs.cb_x) if not lossy else compute_dtype.type(0.0)
    inject = p.mode == Mode.COMPUTATION
    plan = make_source_plan(p) if inject else None
    patch = (plan.j0, plan.j1, plan.i0, plan.i1) if inject else None

    inject_source = make_inject_source(p, plan, dtype) if inject else None

    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)

    e_win = pl.BlockSpec(
        (pl.Element(tk + 3, (0, 2)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + ofs) * tk - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_win = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 0)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + ofs) * tk - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    c_win = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 0)), pl.Element(J1), pl.Element(W)),
        lambda g: ((g + ofs) * tk - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    if two_pass:
        blk = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
        cblk = pl.BlockSpec((tk, J1, W), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
        e_up = pl.BlockSpec(  # E rows L..H+1
            (pl.Element(tk + 1, (0, 1)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk, 0, 0),
            memory_space=pltpu.VMEM,
        )
        h_dn = pl.BlockSpec(  # H rows L-1..H
            (pl.Element(tk + 1, (0, 0)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - 1, 0, 0),
            memory_space=pltpu.VMEM,
        )
        smem = pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM)
        # aliases shift by one for the leading koff scalar input
        aliases = {} if interpret else {4: 0, 5: 1, 6: 2}
        h_call = pl.pallas_call(
            functools.partial(_h_kernel2, p, f_h, patch, Ib, W, tk, None, het),
            grid=(nk,),
            in_specs=[smem] + [e_up] * 3 + [blk] * 3 + [cblk] * 2
            + ([blk] * 3 if het else []),
            out_specs=[blk] * 3,
            out_shape=(bulk_shape,) * 3,
            input_output_aliases=aliases,
            compiler_params=cp,
            interpret=interpret,
        )
        e_call = pl.pallas_call(
            functools.partial(_e_kernel2, p, f_e, Ib, lossy, tk, None),
            grid=(nk,),
            in_specs=[smem] + [h_dn] * 3 + [blk] * 3 + ([blk] * 6 if lossy else []),
            out_specs=[blk] * 3,
            out_shape=(bulk_shape,) * 3,
            input_output_aliases=aliases,
            compiler_params=cp,
            interpret=interpret,
        )
        # HOST numpy constant, not a closed-over jax.Array: device-array
        # closures embed as HLO constants whose lowering fetches
        # device->host — intermittently deadlocks through the remote axon
        # tunnel (r3)
        zoff = np.zeros((1, 2), np.int32)

        def call(st, ex, ey, ez, hx, hy, hz, chy, chz):
            hextra = (st.hf_x, st.hf_y, st.hf_z) if het else ()
            hx, hy, hz = h_call(jnp.asarray(zoff), ex, ey, ez, hx, hy, hz, chy, chz, *hextra)
            extra = (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z) if lossy else ()
            ex, ey, ez = e_call(jnp.asarray(zoff), hx, hy, hz, ex, ey, ez, *extra)
            return ex, ey, ez, hx, hy, hz

        # exported for the sharded fast path (parallel/sharded_fast.py)
        call.h_call = h_call
        call.e_call = e_call

    else:
        # Single fused whole-step kernel.  NO aliasing: iteration g+1
        # re-reads row g*TK+TK-1 (the one-row-below halo recompute), which
        # iteration g already wrote — aliased buffers would observe the NEW
        # value.  Outputs ping-pong to fresh buffers; the dead slab of a
        # fresh output is uninitialized but provably never read.
        _call1 = pl.pallas_call(
            functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, tk),
            grid=(nk,),
            in_specs=[e_win] * 3 + [h_win] * 3 + [c_win] * 2,
            out_specs=[out_spec] * 6,
            out_shape=(bulk_shape,) * 6,
            compiler_params=cp,
            interpret=interpret,
        )

        def call(st, ex, ey, ez, hx, hy, hz, chy, chz):
            return _call1(ex, ey, ez, hx, hy, hz, chy, chz)

    def step(st: StrippedState, x) -> StrippedState:
        _t, amp = x
        if inject:
            st = inject_source(st, amp)
        ex, ey, ez, hx, hy, hz = call(
            st, st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz,
        )
        hx_s = advance_hx_strip(p, st, f_h, het)
        return dataclasses.replace(
            st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s
        )

    return step


def build_twopass_calls(p: Params, coefs: UpdateCoefs, S: int, nk: int,
                        interpret: bool, tk: int | None = None,
                        J_rows: int | None = None,
                        jwin: tuple[int, int] | None = None):
    """Two-pass (h_call, e_call, tk) for an arbitrary storage layout.

    Used by the sharded fast paths (fdtd_tpu.parallel.sharded_fast), whose
    per-shard arrays have ``S`` storage rows (dead slab + local physical
    rows + top halo/pad) and ``nk`` output tiles.  Calls take a leading
    (1, 2) int32 (global-k, global-j) offset.  With lossy ``coefs``,
    ``e_call`` takes six extra blocked coefficient slabs (per-shard layout,
    same as the field bulks) after the E inputs.

    ``J_rows``/``jwin``: per-shard j storage rows and owned-row bounds for
    2-D (z x y) decomposition; default = the full canonical j extent.
    """
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    _, J1, Ib = dims(p)
    if J_rows is not None:
        J1 = J_rows
    W = corr_width(Ib)
    if tk is None:
        tk = tile_k(p, lossy)
    ofs = D // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    f_e = compute_dtype.type(0.0) if lossy else compute_dtype.type(coefs.cb_x)
    inject = p.mode == Mode.COMPUTATION
    patch = None
    if inject:
        plan = make_source_plan(p)
        patch = (plan.j0, plan.j1, plan.i0, plan.i1)

    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    blk = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((tk, J1, W), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
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
    aliases = {} if interpret else {4: 0, 5: 1, 6: 2}
    h_call = pl.pallas_call(
        functools.partial(_h_kernel2, p, f_h, patch, Ib, W, tk, jwin, het),
        grid=(nk,),
        in_specs=[smem] + [e_up] * 3 + [blk] * 3 + [cblk] * 2
        + ([blk] * 3 if het else []),
        out_specs=[blk] * 3,
        out_shape=(bulk_shape,) * 3,
        input_output_aliases=aliases,
        compiler_params=cp,
        interpret=interpret,
    )
    e_call = pl.pallas_call(
        functools.partial(_e_kernel2, p, f_e, Ib, lossy, tk, jwin),
        grid=(nk,),
        in_specs=[smem] + [h_dn] * 3 + [blk] * 3 + ([blk] * 6 if lossy else []),
        out_specs=[blk] * 3,
        out_shape=(bulk_shape,) * 3,
        input_output_aliases=aliases,
        compiler_params=cp,
        interpret=interpret,
    )
    return h_call, e_call, tk
