"""Temporally-blocked kernel: s leapfrog steps per HBM sweep (default 4).

The two-pass kernels are HBM-bound at ~75 B/cell/step; the information
floor for one step is 48 B/cell (read+write all six fields once).  Temporal
blocking goes *below* that floor per step: each sweep reads E/H once (with
an s-row halo), advances the block s steps entirely in VMEM, and writes
only the step-s results: ~20 B/cell/step at s=4/tk=8 (halo rows are
recomputed redundantly; compute is free, the stencil is memory-bound).
Measured on v5e at 256^3 fp32: s=2 10.7, s=3 14.9, s=4 17.8 Gcells/s.
This is the classic wavefront/temporal-blocking optimization (cf. the
multicore wavefront-diamond literature), shaped for Mosaic's block
pipeline.

No aliasing: the deep halo reads rows two blocks below the write frontier,
which an in-place update would have already overwritten.  Outputs ping-pong
(2x HBM for the state; race-free by construction).

Source semantics are exact: the state arrives with the step-1 injection
already applied (outside, as in pallas_fused); injections for steps 2..s
use drive rows computed outside exactly like fdtd_tpu.source.apply_source,
mask-applied to the k=0 row of the intermediates, plus the static patch
exclusion on every H update (QUIRKS #4 semantics each step).

j-tiling (``nj`` > 1): when full-plane windows overflow VMEM (s >= 6 at
256^3 fp32; any s at 512^3), the j axis is split into ``nj`` tiles with an
8-row j halo on each side (the same wavefront argument as k: corruption
from a window edge travels one j row per leapfrog pair, so an 8-row halo
covers s <= 8).  Mosaic requires sublane-dim window starts to be 8-aligned,
so the j-tiled layout carries an 8-row dead band below j=0 (mirroring the
k dead slab) and >=8 inert rows above; :func:`jextend`/:func:`jrestore`
convert to/from the standard stripped layout once per scan chunk.  The
halo rows are refetched (~(tj+16)/tj read amplification) — the price of
fitting VMEM.

VMEM feasibility (``plan_nj``): the model 2*(windows + corr + drive + out)
+ one fp32 window set (compute intermediates / bf16 upcasts) reproduces
Mosaic's measured allocations within ~3% (256^3 fp32 s=6 -> 136 est vs
134 measured; 512^3 bf16 s=4 -> 264 est vs 285 measured MB); ``supported``
admits any config with a feasible nj.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Mode, Params
from ..source import make_source_plan
from ..state import UpdateCoefs
from .pallas_fused import D, StrippedState, corr_width, dims, tile_k

TKT = 8   # temporal blocking only pays at the full tile
HJ = 8    # j halo rows per side when j-tiled (sublane-aligned; covers s <= 8)
DJ = 8    # j dead band below j=0 in the j-tiled layout
VMEM_BUDGET = 126 * 1024 * 1024  # matches the kernel's vmem_limit_bytes


def jt_extents(p: Params, nj: int) -> tuple[int, int]:
    """(tj, Jt) for an ``nj``-way j-tiling: tile rows and total storage rows.

    Content rows live at storage j in [DJ, DJ + J1); the DJ dead band below
    and the 8 inert rows above make every window start ``jb*tj + DJ - HJ``
    nonnegative and 8-aligned (Mosaic requires sublane-dim window starts
    divisible by 8; arbitrary starts fail "couldn't prove tiling divides").
    """
    _, J1, _ = dims(p)
    if nj == 1:
        return J1, J1
    tj = ((J1 + nj - 1) // nj + 7) // 8 * 8
    return tj, DJ + nj * tj + HJ


def vmem_estimate(p: Params, s: int, nj: int, rows: int | None = None,
                  lossy: bool = False, sar: bool = False) -> int:
    """Bytes of VMEM the s-step kernel needs at ``nj``-way j-tiling.

    Calibrated against Mosaic's own allocator (see module docstring):
    double-buffered input windows + outputs, plus one fp32-sized window set
    for compute intermediates (which are also the bf16 upcast copies).
    ``rows``: full-plane window j rows override (per-shard layouts under
    2-D spatial sharding pass their local storage rows).
    ``lossy``/``sar``: the lossy kernel's windows are one row taller and
    add six coefficient windows (E geometry); SAR adds the sigma tile and
    the fp32 accumulator tile pair.
    """
    _, J1, Ib = dims(p)
    if rows is not None:
        tj = tjw = rows
    else:
        tj, _ = jt_extents(p, nj)
        tjw = tj + (2 * HJ if nj > 1 else 0)
    item = jnp.dtype(p.dtype).itemsize
    W = corr_width(Ib)
    nd = max(s - 1, 1)
    # VMEM rows are lane-padded to 128: a 250-wide bulk occupies 256 lanes
    # (the round-1 "250^3 s=5 overruns by 1.7MB" finding, now modeled)
    Ibp = -(-Ib // 128) * 128
    Wp = -(-W // 128) * 128
    ext = 1 if lossy else 0
    win_rows = 3 * (TKT + 2 * s + ext) + 3 * (TKT + 2 * s - 1 + ext)
    if lossy:
        win_rows += 6 * (TKT + 2 * s + 1)  # ca/cb windows, E geometry
    windows = win_rows * tjw * Ibp * item
    # window slimming (build_temporal_call): computation mode carries no
    # corr windows, and full-plane single-chip layouts slim the two drive
    # arrays to an 8-aligned band around the source patch; validation
    # carries corr but no drive at all
    if p.mode == Mode.COMPUTATION:
        corr = 0
        if nj == 1 and rows is None:
            from ..source import make_source_plan

            plan = make_source_plan(p)
            row0 = plan.j0 // 8 * 8
            dw = min(-(-(plan.j1 - row0) // 8) * 8, J1 - row0)
        else:
            dw = tjw
        drive = 2 * nd * dw * Ibp * item
    else:
        corr = 2 * (TKT + 2 * s - 1) * tjw * Wp * item
        drive = 0
    out = 6 * TKT * tj * Ibp * item
    if sar:
        out += TKT * tj * Ibp * item          # sigma tile
        out += 2 * TKT * tj * Ibp * 4         # fp32 acc in + out tiles
    return 2 * (windows + corr + drive + out) + win_rows * tjw * Ibp * 4


PLAN_MARGIN = 4 * 1024 * 1024  # model slack: 250^3 s=5 estimates 123.7 MB
# but measurably overruns the 126 MB budget, while 256^3 s=5 (118.9 MB)
# runs; plan against budget-margin so borderline configs j-tile instead
# of faulting at run time.


def plan_nj(p: Params, s: int, lossy: bool = False, sar: bool = False) -> int | None:
    """Smallest j-tiling for which the s-step kernel fits VMEM (None if none).

    Read amplification grows as (tj + 16)/tj, so tilings below 32-row tiles
    are rejected — past that the halo refetch eats the temporal win.
    """
    _, J1, Ib = dims(p)
    # lane-unaligned grids (250-class) measurably cost more than the model
    # counts (validation 250^3 s=5 est 120 MB still faulted on device) —
    # plan them with double the slack
    margin = PLAN_MARGIN * (2 if Ib % 128 else 1)
    nj = 1
    while True:
        tj, _ = jt_extents(p, nj)
        if nj > 1 and tj < 32:
            return None
        if vmem_estimate(p, s, nj, lossy=lossy, sar=sar) <= VMEM_BUDGET - margin:
            return nj
        nj = nj + 1 if nj == 1 else nj * 2


HBM_BUDGET = int(float(os.environ.get("FDTD_HBM_BYTES", 15e9)))


def state_bytes(p: Params) -> int:
    """HBM footprint of one stripped state (bulks + corr; strips are tiny)."""
    S, J1, Ib = dims(p)
    item = jnp.dtype(p.dtype).itemsize
    return S * J1 * (6 * Ib + 2 * corr_width(Ib)) * item


def supported(p: Params, coefs: UpdateCoefs, s: int = 4, n_shards: int = 1,
              sar: bool = False) -> bool:
    """Temporal-blocking feasibility: >=2 k-tiles, a VMEM-feasible tiling,
    and HBM headroom.  Vacuum in both modes; lossy media (per-cell ca/cb,
    homogeneous mu) in computation mode — with optional in-kernel SAR
    (``sar``) — via the lossy kernel family (r3).

    bf16 is supported (fp32 in-kernel compute): the round-1 Mosaic runtime
    fault at 256^3 windows no longer reproduces on current libtpu and the
    bf16 path is pinned by tests/test_temporal.py.

    The HBM gate: temporal sweeps must ping-pong the state (docs/DESIGN.md
    alias-safety calculus), so ~2.2x the state must fit; a 1024^3 bf16
    state (12.8 GB) is single-chip feasible only on the in-place two-pass
    path, and ``resolve_backend`` falls back there with a notice.
    ``n_shards``: device count a sharded temporal path will spread the state
    over — each shard holds only ~state/n, so the gate scales down (a
    1024^3 bf16 state over 8 chips is 1.6 GB/shard and perfectly feasible).
    """
    lossy = not isinstance(coefs.ca_x, (int, float))
    if coefs.heterogeneous_mu:
        return False
    if lossy:
        if p.mode != Mode.COMPUTATION or n_shards > 1:
            return False  # lossy temporal is single-chip for now
    else:
        if coefs.ca_x != 1.0:
            return False
        if sar:
            return False  # vacuum has no dissipation; nothing to accumulate
    # HBM: ping-pong needs ~2.2x the field state; lossy adds the embedded
    # ca/cb + sigma slabs (7/6 of a field set) and SAR an fp32 accumulator
    need = 2.2 * state_bytes(p)
    if lossy:
        need += state_bytes(p) * 7 // 6
        if sar:
            need += state_bytes(p) * 4 // (6 * jnp.dtype(p.dtype).itemsize)
    return (
        (dims(p)[0] - D) // TKT >= 2
        and plan_nj(p, s, lossy=lossy, sar=sar) is not None
        and need / max(1, n_shards) < HBM_BUDGET
    )


def _curl_h(tk_rows, f_h, Ib, W, lane, gk, jj, K, J, patch,
            ex, ex1, ey, ey1, ez, chy, chz):
    """H update on ``tk_rows`` rows given same-row E and E at k+1.

    ``chy``/``chz`` may be None: the corr streams carry the frozen
    Ey/Ez boundary strips' coupling, which is identically zero in
    computation mode (strips start zero and are PEC-frozen/interior-
    source), so the windows are dropped entirely to save VMEM."""
    zf = jnp.zeros((), ex.dtype)
    ey_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ey, -1, axis=2))
    ez_px = jnp.where(lane == Ib - 1, zf, jnp.roll(ez, -1, axis=2))
    ez_py = jnp.roll(ez, -1, axis=1)
    ex_py = jnp.roll(ex, -1, axis=1)

    inc_hx = (ey1 - ey) - (ez_py - ez)
    inc_hy = (ez_px - ez) - (ex1 - ex)
    inc_hz = (ex_py - ex) - (ey_px - ey)
    if chy is None:
        pass
    elif W == Ib:
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
        m_p = (gk == 0) & (jj >= j0) & (jj < j1) & (lane >= i0) & (lane < i1)
        m_hx = m_hx & ~m_p
        m_hz = m_hz & ~m_p
    return m_hx, m_hy, m_hz, f_h * inc_hx, f_h * inc_hy, f_h * inc_hz


def _curl_e(f_e, gk, jj, lane, K, J,
            hx, hx_m1, hy, hy_m1, hz):
    hz_my = jnp.roll(hz, 1, axis=1)
    hz_mx = jnp.roll(hz, 1, axis=2)
    hy_mx = jnp.roll(hy, 1, axis=2)
    hx_my = jnp.roll(hx, 1, axis=1)
    m_ex = (gk >= 1) & (gk < K) & (jj >= 1) & (jj < J)
    m_ey = (gk >= 1) & (gk < K) & (jj < J) & (lane >= 1)
    m_ez = (gk < K) & (jj >= 1) & (jj < J) & (lane >= 1)
    inc_x = f_e * ((hz - hz_my) - (hy - hy_m1))
    inc_y = f_e * ((hx - hx_m1) - (hz - hz_mx))
    inc_z = f_e * ((hy - hy_mx) - (hx - hx_my))
    return m_ex, m_ey, m_ez, inc_x, inc_y, inc_z


def _iotas(shape, L0, J0=0):
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + L0
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + J0
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return gk, jj, lane


def _kernel(p: Params, f_h, f_e, patch, Ib, W, tk, s, jt, use_corr, dwin,
            *refs):
    """s leapfrog steps per sweep, statically unrolled (tight spans).

    Invariant entering pair m (1-based): E spans k rows [g, g+n_e-1] with
    n_e = tk + 2(s-m+1), H spans [g, g+n_e-2], g = L-s+m-1.  The H update
    covers H's full span (needs E at k+1: exactly E's top row); the E update
    then drops one row at each... bottom (needs H' at k-1), and H is trimmed
    one row at both ends for the next pair.  After s pairs E covers [L, H]
    and H' covers [L-1, H] whose top tk rows are the output block.

    ``jt``: j-tile rows, or None for full-plane windows.  When tiled, the
    window carries HJ halo rows per j side; the same wavefront argument
    bounds edge corruption to one j row per pair, and the final write keeps
    only the tile interior.  All j iotas are global (offset by the tile
    start), so the staggered/PEC masks and the source patch are unchanged.

    ``refs`` (window slimming — the input set is mode-dependent):
    koff, the six field windows, [chy, chz when use_corr], [de2, dh2 when
    a source patch exists; ``dwin`` = (row0, rows) when they are slimmed
    to an 8-aligned row band around the patch instead of full planes —
    values are host-built either way, so source cells stay bit-exact vs
    the xla path], then the six outputs.
    """
    koff_ref = refs[0]
    ex_ref, ey_ref, ez_ref, hx_ref, hy_ref, hz_ref = refs[1:7]
    idx = 7
    if use_corr:
        chy_ref, chz_ref = refs[idx : idx + 2]
        idx += 2
    else:
        chy_ref = chz_ref = None
    if patch is not None:
        de2_ref, dh2_ref = refs[idx : idx + 2]
        idx += 2
    else:
        de2_ref = dh2_ref = None
    oex, oey, oez, ohx, ohy, ohz = refs[idx : idx + 6]

    g_id = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g_id * tk + koff_ref[0, 0]
    if jt == "smem":
        # 2-D spatial sharding: full-plane per-shard windows whose global-j
        # origin rides in the SMEM offset pair (storage row 0 = this j)
        j_off = koff_ref[0, 1]
    elif jt is None:
        j_off = 0
    else:
        j_off = pl.program_id(1) * jt - HJ

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    ex = ex_ref[:].astype(cd)   # rows L-s .. H+s-1+1  (tk+2s)
    ey = ey_ref[:].astype(cd)
    ez = ez_ref[:].astype(cd)
    hx = hx_ref[:].astype(cd)   # rows L-s .. H+s-1    (tk+2s-1)
    hy = hy_ref[:].astype(cd)
    hz = hz_ref[:].astype(cd)
    if use_corr:
        chy_w = chy_ref[:].astype(cd)  # rows L-s .. H+s-1
        chz_w = chz_ref[:].astype(cd)
    else:
        chy_w = chz_w = None

    if patch is not None:
        de2 = de2_ref[:].astype(cd)  # (s-1 or 1, J_rows_or_band, Ib)
        dh2 = dh2_ref[:].astype(cd)
        if dwin is not None:
            # slimmed band -> full-plane rows (static pad; values land at
            # the same global j rows the full-plane arrays carried)
            row0, rows_w = dwin
            full = ex.shape[1]
            padj = ((0, 0), (row0, full - row0 - rows_w), (0, 0))
            de2 = jnp.pad(de2, padj)
            dh2 = jnp.pad(dh2, padj)
        j0, j1, i0, i1 = patch
        jrow = jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 0) + j_off
        mrow = (
            (jrow >= j0)
            & (jrow < j1)
            & (jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 1) >= i0)
            & (jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 1) < i1)
        )

    zr = jnp.zeros((), cd)
    g_lo = L - s  # global k of the current bottom row (traced)

    for m in range(1, s + 1):
        n_h = hx.shape[0]
        # ---- H update on H's full span ----
        gkh, jjh, lnh = _iotas((n_h,) + ex.shape[1:], g_lo, j_off)
        coff = m - 1
        m_hx, m_hy, m_hz, ix, iy, iz = _curl_h(
            n_h, f_h, Ib, W, lnh, gkh, jjh, K, J, patch,
            ex[:n_h], ex[1 : n_h + 1], ey[:n_h], ey[1 : n_h + 1], ez[:n_h],
            chy_w[coff : coff + n_h] if use_corr else None,
            chz_w[coff : coff + n_h] if use_corr else None,
        )
        hx = jnp.where(m_hx, hx + ix, hx)
        hy = jnp.where(m_hy, hy + iy, hy)
        hz = jnp.where(m_hz, hz + iz, hz)

        # ---- E update on rows [g_lo+1 .. g_lo+n_h-1] ----
        n_e = n_h - 1
        gke, jje, lne = _iotas((n_e,) + ex.shape[1:], g_lo + 1, j_off)
        m_ex, m_ey, m_ez, jx, jy, jz = _curl_e(
            f_e, gke, jje, lne, K, J,
            hx[1:], hx[:-1], hy[1:], hy[:-1], hz[1:],
        )
        e0x = ex[1 : n_e + 1]
        e0y = ey[1 : n_e + 1]
        e0z = ez[1 : n_e + 1]
        ex = jnp.where(m_ex, e0x + jx, e0x)
        ey = jnp.where(m_ey, e0y + jy, e0y)
        ez = jnp.where(m_ez, e0z + jz, e0z)

        if m < s:
            # trim H to [g_lo+1 .. g_lo+n_h-2] for the next pair
            hx = hx[1 : n_h - 1]
            hy = hy[1 : n_h - 1]
            hz = hz[1 : n_h - 1]
            g_lo = g_lo + 1
            if patch is not None:
                # source application for t + m*dt on the k==0 rows
                m0e = (gke == 0) & mrow[None, :, :]
                ez = jnp.where(m0e, de2[m - 1][None, :, :], ez)
                ex = jnp.where(m0e, zr, ex)
                gkh2, _, _ = _iotas((hx.shape[0],) + ex.shape[1:], g_lo, j_off)
                m0h = (gkh2 == 0) & mrow[None, :, :]
                hx = jnp.where(m0h, dh2[m - 1][None, :, :], hx)
                hz = jnp.where(m0h, zr, hz)
        else:
            hx = hx[1:]
            hy = hy[1:]
            hz = hz[1:]

    if isinstance(jt, int):
        ji = slice(HJ, HJ + jt)  # keep the tile interior; halo rows are stale
        ex, ey, ez = ex[:, ji], ey[:, ji], ez[:, ji]
        hx, hy, hz = hx[:, ji], hy[:, ji], hz[:, ji]
    oex[:] = ex.astype(st)
    oey[:] = ey.astype(st)
    oez[:] = ez.astype(st)
    ohx[:] = hx.astype(st)
    ohy[:] = hy.astype(st)
    ohz[:] = hz.astype(st)


def build_temporal_call(p: Params, coefs: UpdateCoefs, S: int, nk: int,
                        s: int, interpret: bool, nj: int = 1,
                        J_rows: int | None = None):
    """The s-step pallas_call for a storage layout with ``S`` rows and ``nk``
    output tiles (used by the single-chip step and the sharded fast paths).

    Signature: call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2) -> 6
    output fields.  ``koff`` is the (1,1) int32 global-k offset.  With
    ``nj`` > 1 all arrays must be in the j-extended layout (see
    :func:`jextend`) and the grid adds a j-tile dimension.  ``J_rows``
    (mutually exclusive with nj > 1): per-shard storage j rows under 2-D
    spatial sharding — full-plane windows of that many rows, with the
    global (k, j) origin in a (1, 2) SMEM ``koff``."""
    _, J1, Ib = dims(p)
    W = corr_width(Ib)
    tk = TKT
    ofs = D // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    f_e = compute_dtype.type(coefs.cb_x)
    patch = None
    dwin = None
    if p.mode == Mode.COMPUTATION:
        plan = make_source_plan(p)
        patch = (plan.j0, plan.j1, plan.i0, plan.i1)
        if nj == 1 and J_rows is None:
            # slim the drive inputs to an 8-aligned row band around the
            # patch (full planes in the j-tiled / per-shard layouts, whose
            # windows are already narrow)
            row0 = plan.j0 // 8 * 8
            dwin = (row0, -(-(plan.j1 - row0) // 8) * 8)
    # window slimming: computation mode has identically-zero corr streams
    # (frozen boundary strips start and stay zero) and validation mode has
    # no drive — drop the unused windows to buy back VMEM for larger s
    use_corr = p.mode != Mode.COMPUTATION

    tj, Jt = jt_extents(p, nj)
    if J_rows is not None:
        assert nj == 1, (nj, J_rows)
        J1 = tj = Jt = J_rows
    nd = max(s - 1, 1)
    bulk_shape = jax.ShapeDtypeStruct((S, Jt, Ib), dtype)
    if nj == 1:
        jt_arg = None if J_rows is None else "smem"
        grid = (nk,)
        e_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s, (0, s)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        h_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s - 1, (0, s - 1)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        c_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s - 1, (0, s - 1)), pl.Element(J1), pl.Element(W)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if dwin is not None:
            dwin = (dwin[0], min(dwin[1], J1 - dwin[0]))
            drv_rows = dwin[1]
        else:
            drv_rows = J1
        drv_spec = pl.BlockSpec((nd, drv_rows, Ib), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 1 if J_rows is None else 2),
                            lambda g: (0, 0), memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0), memory_space=pltpu.VMEM)
    else:
        assert s <= HJ, (s, HJ)
        jt_arg = tj
        grid = (nk, nj)
        tjw = tj + 2 * HJ

        def jstart(jb):
            return pl.multiple_of(jb * tj + DJ - HJ, 8)

        def jwin(rows, pad, width):
            return pl.BlockSpec(
                (pl.Element(rows, (0, pad)), pl.Element(tjw), pl.Element(width)),
                lambda g, jb: ((g + ofs) * tk - s, jstart(jb), 0),
                memory_space=pltpu.VMEM,
            )

        e_win = jwin(tk + 2 * s, s, Ib)
        h_win = jwin(tk + 2 * s - 1, s - 1, Ib)
        c_win = jwin(tk + 2 * s - 1, s - 1, W)
        drv_spec = pl.BlockSpec(
            (pl.Element(nd), pl.Element(tjw), pl.Element(Ib)),
            lambda g, jb: (0, jstart(jb), 0),
            memory_space=pltpu.VMEM,
        )
        smem = pl.BlockSpec((1, 1), lambda g, jb: (0, 0), memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec(
            (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
            lambda g, jb: (pl.multiple_of((g + ofs) * tk, 8),
                           pl.multiple_of(jb * tj + DJ, 8), 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [smem] + [e_win] * 3 + [h_win] * 3
        + ([c_win] * 2 if use_corr else [])
        + ([drv_spec] * 2 if patch is not None else [])
    )
    inner = pl.pallas_call(
        functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, tk, s, jt_arg,
                          use_corr, dwin),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 6,
        out_shape=(bulk_shape,) * 6,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2):
        # stable caller signature; unused operands (zero corr in computation
        # mode, zero drive in validation) are dropped, and full-plane drive
        # arrays are sliced to the band the kernel re-pads
        args = [koff, ex, ey, ez, hx, hy, hz]
        if use_corr:
            args += [chy, chz]
        if patch is not None:
            if dwin is not None:
                row0, rows_w = dwin
                de2 = de2[:, row0 : row0 + rows_w]
                dh2 = dh2[:, row0 : row0 + rows_w]
            args += [de2, dh2]
        return inner(*args)

    return call, nd


def _chained_map(fn, st):
    """tree.map(fn, st) with a barrier chain forcing one-leaf-at-a-time
    scheduling.  Without an explicit order XLA may run every per-field
    copy before freeing any donated source, transiently holding ~2x the
    state — the difference between fitting and OOMing a 768^3-class
    layout conversion on a 16 GB chip.  Values are unchanged."""
    leaves, treedef = jax.tree.flatten(st)
    out = []
    gate = None
    for a in leaves:
        if gate is not None:
            a = jax.lax.optimization_barrier((a, gate))[0]
        gate = fn(a)
        out.append(gate)
    return jax.tree.unflatten(treedef, out)


def jextend(p: Params, st, nj: int):
    """Pad every (S, J1, *) array of a StrippedState into the j-extended
    layout: DJ dead rows below j=0, inert rows above (all zeros)."""
    if nj == 1:
        return st
    _, J1, _ = dims(p)
    _, Jt = jt_extents(p, nj)
    pad = lambda a: jnp.pad(a, ((0, 0), (DJ, Jt - DJ - J1), (0, 0)))
    return _chained_map(pad, st)


def jrestore(p: Params, st, nj: int):
    """Inverse of :func:`jextend` (drop the dead band and top pad rows)."""
    if nj == 1:
        return st
    _, J1, _ = dims(p)
    unpad = lambda a: a[:, DJ : DJ + J1]
    return _chained_map(unpad, st)


def make_temporal_pair_step(p: Params, coefs: UpdateCoefs, interpret: bool | None = None,
                            s: int = 2, nj: int | None = None):
    """Build ``group_step(state, xs_group) -> state`` advancing ``s`` steps.

    ``xs_group`` = (t_vec, amp_vec) with s entries each (from lax.scan over
    reshaped inputs).  ``nj``: j-tiling (None = smallest that fits VMEM);
    with nj > 1 the state must be converted with :func:`jextend` before the
    scan and :func:`jrestore` after.  The chosen tiling is exposed as
    ``group_step.nj``."""
    if not isinstance(coefs.ca_x, (int, float)):
        # lossy media route to the coefficient-window kernel family
        return make_temporal_lossy_pair_step(p, coefs, interpret, s, nj)
    if not supported(p, coefs, s):
        raise NotImplementedError("temporal blocking unsupported for this config")
    assert 2 <= s <= TKT, s
    if nj is None:
        nj = plan_nj(p, s)
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")

    S, J1, Ib = dims(p)
    _, Jt = jt_extents(p, nj)
    dj = DJ if nj > 1 else 0
    nk = (S - D) // TKT
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    plan = make_source_plan(p) if inject else None
    call, nd = build_temporal_call(p, coefs, S, nk, s, interpret, nj=nj)

    K, J = p.maxk, p.maxj
    # NOTE: zoff/zero_drv are HOST numpy constants, never closed-over
    # jax.Arrays: device-array closures embed as HLO constants whose
    # lowering does a device->host fetch — measured to deadlock
    # intermittently through the remote axon tunnel (r3).  numpy closures
    # embed directly (and keep the exact same HLO as r2, preserving the
    # bit-exact s=2 interpret parity the tests pin).
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, Jt, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        nj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (nj, ni))

    def inject_state(st: StrippedState, pv) -> StrippedState:
        zero = jnp.zeros_like(pv).astype(dtype)
        sl = (D, slice(dj + plan.j0, dj + plan.j1), slice(plan.i0, plan.i1))
        return dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
        )

    def group_step(st: StrippedState, xs_group) -> StrippedState:
        ts_g, amps_g = xs_group  # each of length s
        if inject:
            st = inject_state(st, drive_patch(amps_g[0]))
            de2 = jnp.asarray(zero_drv)
            dh2 = jnp.asarray(zero_drv)
            sl = (slice(0, nd), slice(dj + plan.j0, dj + plan.j1), slice(plan.i0, plan.i1))
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])  # (s-1, nj, ni)
            de2 = de2.at[sl].set(pvs.astype(dtype))
            dh2 = dh2.at[sl].set((-plan.inv_z_te * pvs).astype(dtype))
        else:
            de2 = dh2 = jnp.asarray(zero_drv)
        ex, ey, ez, hx, hy, hz = call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, de2, dh2,
        )
        # Hx strip: s steps' worth (frozen Ey/Ez strips -> same curl each step)
        ey_s2 = st.ey_s[:, :, 0]
        ez_s2 = st.ez_s[:, :, 0]
        sl2 = (slice(D, D + K), slice(dj, dj + J))
        curl = (ey_s2[D + 1 : D + K + 1, dj : dj + J] - ey_s2[sl2]) - (
            ez_s2[D : D + K, dj + 1 : dj + J + 1] - ez_s2[sl2]
        )
        hx_s = st.hx_s
        for _ in range(s):
            hx_s = hx_s.at[sl2[0], sl2[1], 0].add((f_h * curl).astype(st.hx_s.dtype))
        return dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)

    group_step.nj = nj
    return group_step


# ---------------------------------------------------------------------------
# Lossy-media temporal blocking (+ in-kernel SAR) — VERDICT r2 next #1.
#
# The heating workload (dielectric load, BASELINE configs #2/#3) previously
# ran the two-pass path at ~6 Gcells/s (3.4 with --sar) while empty-cavity
# temporal did 22.7.  This kernel family extends temporal blocking to the
# lossy E update E' = ca*E + cb*curl(H) by streaming the six ca/cb
# coefficient windows (the same embedded arrays the two-pass lossy kernel
# blocks, ops/pallas_fused.py), and accumulates sigma*|E_cell|^2*dt
# *in-kernel* across the s intermediate steps into an aliased fp32
# accumulator — eliminating the separate per-step jnp SAR pass
# (step.py power path).  Reference analogue: the vacuum scalar factors at
# main.c:441,479 are what the coefficient windows generalize.
#
# Geometry: one row taller than the vacuum kernel.  The cell-centered SAR
# means need E at k+1 for the top output cell row, so E windows carry
# tk+2s+1 rows and H windows tk+2s: entering pair m, H spans n_h =
# tk+2(s-m+1) rows [g, g+n_h-1] and E spans [g, g+n_h]; the H update
# covers H's full span, the E update covers [g+1, g+n_h-1], and H trims a
# row at both ends for the next pair.  After pair m the valid E span is
# [L-s+m, L+tk+s-m] — so rows [L, L+tk] (everything the cell means for
# output rows [L, L+tk) touch) are valid at every m, and after pair s the
# bottom tk E rows and H rows [L, L+tk-1] are the outputs.
#
# SAR exactness: the means/squares/accumulation reproduce
# diagnostics.power_deposition_stripped term-for-term in fp32 (same
# association order), evaluated after each pair's E update and before the
# next step's source injection — exactly where the two-pass runner samples
# power.  The i=maxi boundary terms use the Ey/Ez strips, which are
# identically zero in computation mode (PEC-frozen, interior source), the
# only mode this kernel serves.
# ---------------------------------------------------------------------------


def _curl_e_raw(gk, jj, lane, K, J, hx, hx_m1, hy, hy_m1, hz):
    """Masks and raw curls for the E update (no vacuum factor applied)."""
    hz_my = jnp.roll(hz, 1, axis=1)
    hz_mx = jnp.roll(hz, 1, axis=2)
    hy_mx = jnp.roll(hy, 1, axis=2)
    hx_my = jnp.roll(hx, 1, axis=1)
    m_ex = (gk >= 1) & (gk < K) & (jj >= 1) & (jj < J)
    m_ey = (gk >= 1) & (gk < K) & (jj < J) & (lane >= 1)
    m_ez = (gk < K) & (jj >= 1) & (jj < J) & (lane >= 1)
    curl_x = (hz - hz_my) - (hy - hy_m1)
    curl_y = (hx - hx_m1) - (hz - hz_mx)
    curl_z = (hy - hy_mx) - (hx - hx_my)
    return m_ex, m_ey, m_ez, curl_x, curl_y, curl_z


def _kernel_lossy(p: Params, f_h, patch, Ib, tk, s, jt, sar, dt_step, dwin,
                  *refs):
    """s lossy leapfrog steps per sweep (+ optional SAR accumulation).

    ``refs``: koff, six field windows, six coefficient windows
    (ca_x, ca_y, ca_z, cb_x, cb_y, cb_z), [de2, dh2 when a source patch
    exists], [sigma, acc_in when ``sar``], then six field outputs
    [+ acc_out when ``sar``]."""
    koff_ref = refs[0]
    ex_ref, ey_ref, ez_ref, hx_ref, hy_ref, hz_ref = refs[1:7]
    cax_r, cay_r, caz_r, cbx_r, cby_r, cbz_r = refs[7:13]
    idx = 13
    if patch is not None:
        de2_ref, dh2_ref = refs[idx : idx + 2]
        idx += 2
    else:
        de2_ref = dh2_ref = None
    if sar:
        sg_ref, acc_ref = refs[idx : idx + 2]
        idx += 2
    outs = refs[idx : idx + 6]
    oex, oey, oez, ohx, ohy, ohz = outs
    if sar:
        oacc = refs[idx + 6]

    g_id = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g_id * tk + koff_ref[0, 0]
    if jt is None:
        j_off = 0
    else:
        j_off = pl.program_id(1) * jt - HJ

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    ex = ex_ref[:].astype(cd)   # rows L-s .. L+tk+s   (tk+2s+1)
    ey = ey_ref[:].astype(cd)
    ez = ez_ref[:].astype(cd)
    hx = hx_ref[:].astype(cd)   # rows L-s .. L+tk+s-1 (tk+2s)
    hy = hy_ref[:].astype(cd)
    hz = hz_ref[:].astype(cd)
    caxw = cax_r[:].astype(cd)  # same rows as E
    cayw = cay_r[:].astype(cd)
    cazw = caz_r[:].astype(cd)
    cbxw = cbx_r[:].astype(cd)
    cbyw = cby_r[:].astype(cd)
    cbzw = cbz_r[:].astype(cd)

    if patch is not None:
        de2 = de2_ref[:].astype(cd)
        dh2 = dh2_ref[:].astype(cd)
        if dwin is not None:
            row0, rows_w = dwin
            full = ex.shape[1]
            padj = ((0, 0), (row0, full - row0 - rows_w), (0, 0))
            de2 = jnp.pad(de2, padj)
            dh2 = jnp.pad(dh2, padj)
        j0, j1, i0, i1 = patch
        jrow = jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 0) + j_off
        mrow = (
            (jrow >= j0)
            & (jrow < j1)
            & (jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 1) >= i0)
            & (jax.lax.broadcasted_iota(jnp.int32, ex.shape[1:], 1) < i1)
        )
    if sar:
        # sigma/acc windows are j-tile INTERIOR only (halo rows belong to
        # the neighboring tiles' aliased accumulator writes)
        sg = sg_ref[:].astype(jnp.float32)       # (tk, tj, Ib) cell sigma
        acc = acc_ref[:]                          # (tk, tj, Ib) fp32
        dt_f = jnp.float32(dt_step)
        splane = (tk,) + sg.shape[1:]
        j_int = 0 if jt is None else pl.program_id(1) * jt
        gks = jax.lax.broadcasted_iota(jnp.int32, splane, 0) + L
        jjs = jax.lax.broadcasted_iota(jnp.int32, splane, 1) + j_int
        m_sar = (gks < K) & (jjs < J)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (tk,) + ex.shape[1:], 2)

    zr = jnp.zeros((), cd)
    g_lo = L - s

    for m in range(1, s + 1):
        n_h = hx.shape[0]
        # ---- H update on H's full span (homogeneous mu) ----
        gkh, jjh, lnh = _iotas((n_h,) + ex.shape[1:], g_lo, j_off)
        m_hx, m_hy, m_hz, ix, iy, iz = _curl_h(
            n_h, f_h, Ib, Ib, lnh, gkh, jjh, K, J, patch,
            ex[:n_h], ex[1 : n_h + 1], ey[:n_h], ey[1 : n_h + 1], ez[:n_h],
            None, None,
        )
        hx = jnp.where(m_hx, hx + ix, hx)
        hy = jnp.where(m_hy, hy + iy, hy)
        hz = jnp.where(m_hz, hz + iz, hz)

        # ---- lossy E update on rows [g_lo+1 .. g_lo+n_h-1] ----
        n_e = n_h - 1
        gke, jje, lne = _iotas((n_e,) + ex.shape[1:], g_lo + 1, j_off)
        m_ex, m_ey, m_ez, cx, cy, cz = _curl_e_raw(
            gke, jje, lne, K, J,
            hx[1:n_h], hx[: n_h - 1], hy[1:n_h], hy[: n_h - 1], hz[1:n_h],
        )
        e0x = ex[1 : n_e + 1]
        e0y = ey[1 : n_e + 1]
        e0z = ez[1 : n_e + 1]
        co = slice(m, m + n_e)  # coefficient rows for this pair's E rows
        ex = jnp.where(m_ex, caxw[co] * e0x + cbxw[co] * cx, e0x)
        ey = jnp.where(m_ey, cayw[co] * e0y + cbyw[co] * cy, e0y)
        ez = jnp.where(m_ez, cazw[co] * e0z + cbzw[co] * cz, e0z)

        # H trim: valid span shrinks one row at each end
        hx = hx[1 : n_h - 1]
        hy = hy[1 : n_h - 1]
        hz = hz[1 : n_h - 1]
        g_lo = g_lo + 1

        if sar:
            # sigma*|E_cell|^2*dt for output cell rows [L, L+tk), evaluated
            # after this pair's E update, before the next injection — the
            # exact sampling point of the two-pass SAR path.  Term order
            # mirrors diagnostics.power_deposition_stripped.
            off = s - m  # row L's offset in the current (updated) E arrays
            exs = ex[off : off + tk + 1]
            eys = ey[off : off + tk + 1]
            ezs = ez[off : off + tk + 1]
            a = exs[:tk]
            b = exs[1 : tk + 1]
            mex = 0.25 * (a + b + jnp.roll(a, -1, axis=1) + jnp.roll(b, -1, axis=1))
            a = eys[:tk]
            b = eys[1 : tk + 1]
            a_i = jnp.where(lane_s == Ib - 1, zr, jnp.roll(a, -1, axis=2))
            b_i = jnp.where(lane_s == Ib - 1, zr, jnp.roll(b, -1, axis=2))
            mey = 0.25 * (a + a_i + b + b_i)
            a = ezs[:tk]
            a_j = jnp.roll(a, -1, axis=1)
            a_i = jnp.where(lane_s == Ib - 1, zr, jnp.roll(a, -1, axis=2))
            a_ji = jnp.where(lane_s == Ib - 1, zr, jnp.roll(a_j, -1, axis=2))
            mez = 0.25 * (a + a_j + a_i + a_ji)
            if isinstance(jt, int):  # keep the tile interior only
                ji_s = slice(HJ, HJ + jt)
                mex, mey, mez = mex[:, ji_s], mey[:, ji_s], mez[:, ji_s]
            inc = sg * (
                (mex * mex).astype(jnp.float32)
                + (mey * mey).astype(jnp.float32)
                + (mez * mez).astype(jnp.float32)
            )
            acc = acc + jnp.where(m_sar, inc * dt_f, jnp.float32(0.0))

        if m < s and patch is not None:
            # source application for t + m*dt on the k==0 rows
            m0e = (gke == 0) & mrow[None, :, :]
            ez = jnp.where(m0e, de2[m - 1][None, :, :], ez)
            ex = jnp.where(m0e, zr, ex)
            gkh2, _, _ = _iotas((hx.shape[0],) + ex.shape[1:], g_lo, j_off)
            m0h = (gkh2 == 0) & mrow[None, :, :]
            hx = jnp.where(m0h, dh2[m - 1][None, :, :], hx)
            hz = jnp.where(m0h, zr, hz)

    # after s pairs: E spans [L, L+tk] (tk+1 rows), H spans [L, L+tk-1]
    ex, ey, ez = ex[:tk], ey[:tk], ez[:tk]
    if isinstance(jt, int):
        ji = slice(HJ, HJ + jt)
        ex, ey, ez = ex[:, ji], ey[:, ji], ez[:, ji]
        hx, hy, hz = hx[:, ji], hy[:, ji], hz[:, ji]
    oex[:] = ex.astype(st)
    oey[:] = ey.astype(st)
    oez[:] = ez.astype(st)
    ohx[:] = hx.astype(st)
    ohy[:] = hy.astype(st)
    ohz[:] = hz.astype(st)
    if sar:
        oacc[:] = acc  # already tile-interior width


def build_temporal_lossy_call(p: Params, coefs: UpdateCoefs, S: int, nk: int,
                              s: int, interpret: bool, nj: int = 1,
                              sar: bool = False):
    """The s-step lossy pallas_call (single-chip layouts).

    Signature: call(koff, ex, ey, ez, hx, hy, hz, cax, cay, caz, cbx, cby,
    cbz, de2, dh2, sigma, acc) -> (ex, ey, ez, hx, hy, hz[, acc]).
    ``sigma``/``acc`` are required only when ``sar`` (pass None otherwise);
    acc is fp32 in the same storage layout and aliases its output."""
    _, J1, Ib = dims(p)
    tk = TKT
    ofs = D // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    assert p.mode == Mode.COMPUTATION, "lossy temporal serves computation mode"
    plan = make_source_plan(p)
    patch = (plan.j0, plan.j1, plan.i0, plan.i1)
    dwin = None
    if nj == 1:
        row0 = plan.j0 // 8 * 8
        dwin = (row0, min(-(-(plan.j1 - row0) // 8) * 8, J1 - row0))

    tj, Jt = jt_extents(p, nj)
    nd = max(s - 1, 1)
    bulk_shape = jax.ShapeDtypeStruct((S, Jt, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S, Jt, Ib), jnp.float32)

    if nj == 1:
        jt_arg = None
        grid = (nk,)
        e_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s + 1, (0, s + 1)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        h_win = pl.BlockSpec(
            (pl.Element(tk + 2 * s, (0, s)), pl.Element(J1), pl.Element(Ib)),
            lambda g: ((g + ofs) * tk - s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        drv_rows = dwin[1] if dwin is not None else J1
        drv_spec = pl.BlockSpec((nd, drv_rows, Ib), lambda g: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0),
                                memory_space=pltpu.VMEM)
        cell_spec = out_spec  # sigma / acc tiles
    else:
        assert s <= HJ, (s, HJ)
        jt_arg = tj
        grid = (nk, nj)
        tjw = tj + 2 * HJ

        def jstart(jb):
            return pl.multiple_of(jb * tj + DJ - HJ, 8)

        def jwin(rows, pad, width):
            return pl.BlockSpec(
                (pl.Element(rows, (0, pad)), pl.Element(tjw), pl.Element(width)),
                lambda g, jb: ((g + ofs) * tk - s, jstart(jb), 0),
                memory_space=pltpu.VMEM,
            )

        e_win = jwin(tk + 2 * s + 1, s + 1, Ib)
        h_win = jwin(tk + 2 * s, s, Ib)
        drv_spec = pl.BlockSpec(
            (pl.Element(nd), pl.Element(tjw), pl.Element(Ib)),
            lambda g, jb: (0, jstart(jb), 0),
            memory_space=pltpu.VMEM,
        )
        smem = pl.BlockSpec((1, 1), lambda g, jb: (0, 0), memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec(
            (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
            lambda g, jb: (pl.multiple_of((g + ofs) * tk, 8),
                           pl.multiple_of(jb * tj + DJ, 8), 0),
            memory_space=pltpu.VMEM,
        )
        cell_spec = out_spec

    in_specs = (
        [smem] + [e_win] * 3 + [h_win] * 3
        + [e_win] * 6            # ca/cb coefficient windows (E geometry)
        + [drv_spec] * 2
        + ([cell_spec] * 2 if sar else [])
    )
    out_specs = [out_spec] * 6 + ([cell_spec] if sar else [])
    out_shape = (bulk_shape,) * 6 + ((acc_shape,) if sar else ())
    # acc aliases its output (the only operand whose windows are disjoint
    # per grid step in BOTH passes of the ping-pong; fields must ping-pong)
    aliases = {} if (interpret or not sar) else {16: 6}
    inner = pl.pallas_call(
        functools.partial(_kernel_lossy, p, f_h, patch, Ib, tk, s, jt_arg,
                          sar, p.time_step, dwin),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, cax, cay, caz, cbx, cby, cbz,
             de2, dh2, sigma=None, acc=None):
        if dwin is not None:
            row0, rows_w = dwin
            de2 = de2[:, row0 : row0 + rows_w]
            dh2 = dh2[:, row0 : row0 + rows_w]
        args = [koff, ex, ey, ez, hx, hy, hz,
                cax, cay, caz, cbx, cby, cbz, de2, dh2]
        if sar:
            args += [sigma, acc]
        return inner(*args)

    return call, nd


def make_temporal_lossy_pair_step(p: Params, coefs: UpdateCoefs,
                                  interpret: bool | None = None, s: int = 2,
                                  nj: int | None = None,
                                  accumulate_power: bool = False):
    """Build the lossy s-step group advance (heating workload fast path).

    Returns ``group_step``: ``(state, xs_group) -> state`` without SAR, or
    ``((state, acc), xs_group) -> (state, acc)`` with ``accumulate_power``
    (acc: fp32 in the same storage layout; convert with
    :func:`embed_power_acc` / :func:`crop_power_acc`).  The state must be
    built with coefficients embedded (``to_stripped(p, s, coefs=coefs)``,
    which also embeds ``sigma_c`` for SAR).  Chosen j-tiling on
    ``group_step.nj``."""
    if not supported(p, coefs, s, sar=accumulate_power):
        raise NotImplementedError("lossy temporal blocking unsupported here")
    assert 2 <= s <= TKT, s
    if nj is None:
        nj = plan_nj(p, s, lossy=True, sar=accumulate_power)
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")

    S, J1, Ib = dims(p)
    _, Jt = jt_extents(p, nj)
    dj = DJ if nj > 1 else 0
    nk = (S - D) // TKT
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    plan = make_source_plan(p)
    call, nd = build_temporal_lossy_call(
        p, coefs, S, nk, s, interpret, nj=nj, sar=accumulate_power
    )

    K, J = p.maxk, p.maxj
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, Jt, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        npj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (npj, ni))

    def inject_state(st: StrippedState, pv) -> StrippedState:
        zero = jnp.zeros_like(pv).astype(dtype)
        sl = (D, slice(dj + plan.j0, dj + plan.j1), slice(plan.i0, plan.i1))
        return dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
        )

    def advance(st: StrippedState, acc, xs_group):
        ts_g, amps_g = xs_group
        st = inject_state(st, drive_patch(amps_g[0]))
        sl = (slice(0, nd), slice(dj + plan.j0, dj + plan.j1), slice(plan.i0, plan.i1))
        pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
        de2 = jnp.asarray(zero_drv).at[sl].set(pvs.astype(dtype))
        dh2 = jnp.asarray(zero_drv).at[sl].set((-plan.inv_z_te * pvs).astype(dtype))
        outs = call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z,
            de2, dh2,
            st.sigma_c if accumulate_power else None,
            acc,
        )
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc = outs
        else:
            ex, ey, ez, hx, hy, hz = outs
        # Hx strip: s steps' worth (frozen Ey/Ez strips -> same curl each step)
        ey_s2 = st.ey_s[:, :, 0]
        ez_s2 = st.ez_s[:, :, 0]
        sl2 = (slice(D, D + K), slice(dj, dj + J))
        curl = (ey_s2[D + 1 : D + K + 1, dj : dj + J] - ey_s2[sl2]) - (
            ez_s2[D : D + K, dj + 1 : dj + J + 1] - ez_s2[sl2]
        )
        hx_s = st.hx_s
        for _ in range(s):
            hx_s = hx_s.at[sl2[0], sl2[1], 0].add((f_h * curl).astype(st.hx_s.dtype))
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)
        return st, acc

    if accumulate_power:
        def group_step(carry, xs_group):
            st, acc = carry
            return advance(st, acc, xs_group)
    else:
        def group_step(st, xs_group):
            return advance(st, None, xs_group)[0]

    group_step.nj = nj
    return group_step


def embed_power_acc(p: Params, acc, nj: int):
    """(maxk, maxj, maxi) fp32 accumulator -> storage layout (S, Jt, Ib)."""
    S, J1, Ib = dims(p)
    _, Jt = jt_extents(p, nj)
    dj = DJ if nj > 1 else 0
    out = jnp.zeros((S, Jt, Ib), jnp.float32)
    return out.at[D : D + p.maxk, dj : dj + p.maxj].set(
        jnp.asarray(acc, jnp.float32)[:, :, :Ib]
    )


def crop_power_acc(p: Params, acc_st, nj: int):
    """Inverse of :func:`embed_power_acc`."""
    dj = DJ if nj > 1 else 0
    return acc_st[D : D + p.maxk, dj : dj + p.maxj, : p.maxi]
