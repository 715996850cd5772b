"""Streaming wavefront kernel: s=tk steps/sweep with ZERO recompute/refetch.

Generation 5 of the temporal family (docs/DESIGN.md).  The r2 temporal
kernel plateaus at ~340 GB/s effective because its deep Element windows
overlap: each sweep refetches (tk+2s)/tk of every field and recomputes the
s-row halo wedge.  This kernel keeps the *skewed pipeline* state in VMEM
scratch instead:

- inputs/outputs are plain Blocked tk-row tiles — the access pattern the
  two-pass kernels drive at ~600 GB/s;
- each grid step advances every intermediate level m = 1..s by tk rows,
  consuming level m-1's tk fresh rows plus ONE retained row (its previous
  top row).  The retained rows — (s+1) levels x 6 fields x 1 row — are the
  only cross-step state, held in persistent fp32 VMEM scratch (~14 MB at
  256^3; grid iterations are sequential on TPU, so scratch carries);
- with s == tk the level-s rows of grid step g are exactly output block
  g-1, so outputs are Blocked too (index g+ofs-1; step 0 writes zeros into
  the last dead-slab block, preserving the dead-slab-is-zero invariant);
- one drain step (grid = nk+1) finishes the top wedge, feeding the levels
  from a dead-slab block — genuine zeros, exactly the k-padding semantics.

Per-sweep traffic is the information floor: 6 reads + 6 writes = 48+48 B
per cell per s steps (12 B/cell/step fp32 at s=8, 6 B bf16) with *no*
window overlap, and per-cell compute is the s-step minimum (no halo
recompute).  Source semantics, masks, and arithmetic are identical to
ops/pallas_temporal (same _curl helpers) — bit-class parity with the
two-pass and xla paths.

Plan space (pick_plan): s = tk in {8, 4, 2} x nj in {1..16} j-tiles,
ranked by modeled HBM traffic — j-tiling (the r3 big-grid extension)
replaces the full plane with tj + 2*HJ-row Element windows and a per-tile
halo-recompute wedge, which is what lets 512^3-class grids stream (the
k pipeline stays zero-recompute; see _build_stream_call_jt).  Validation
mode carries the corr streams as a small (tk+s)-row Element window.
Lossy media (homogeneous mu, computation mode) stream the six ca/cb
coefficient arrays as (tk+s)-row Element windows — the heating workload;
SAR rides a rolling 3*tk-row fp32 accumulator band in scratch (a cell
row's s per-step contributions straddle two grid steps in the skewed
schedule); it composes with j-tiling (r3) — the band spans the tjw-row
window and acc emits are tile interiors, disjoint across tiles.
Single-chip layouts here; the sharded composition is below
(build_stream_shard_call).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Mode, Params
from ..source import make_source_plan
from ..state import UpdateCoefs
from .pallas_fused import D, StrippedState, corr_width, dims
from .pallas_temporal import (
    DJ,
    HBM_BUDGET,
    HJ,
    VMEM_BUDGET,
    jt_extents,
    state_bytes,
)

TS = 8  # steps per sweep == tile rows (output lands exactly one block back)

# perf-probe ONLY (tools/probe_stream_vpu.py): skip every update mask in
# the vacuum level body to measure the mask share of the VPU budget.
# WRONG numerics (padding/PEC rows corrupt) — never set outside the probe.
_PROBE_UNMASKED = False


def stream_vmem_estimate(p: Params, s: int = TS, lossy: bool = False,
                         sar: bool = False, nj: int = 1,
                         het: bool = False, rows: int | None = None,
                         dft_nf: int = 0) -> int:
    """In/out tile pairs (double-buffered) + tails scratch + live levels.

    ``nj`` > 1: j-tiled windows of tj + 2*HJ rows replace the full plane
    (the r3 big-grid extension — 512^3-class grids whose full-plane
    plans exceed VMEM)."""
    _, J1, Ib = dims(p)
    if rows is not None:
        J1 = rows
    elif nj > 1:
        tj, _ = jt_extents(p, nj)
        J1 = tj + 2 * HJ
    item = jnp.dtype(p.dtype).itemsize
    Ibp = -(-Ib // 128) * 128
    io = 2 * 2 * 6 * s * J1 * Ibp * item          # in + out, double-buffered
    if lossy:
        io += 2 * 6 * (2 * s) * J1 * Ibp * item   # ca/cb Element windows
    if het:
        io += 2 * 3 * (2 * s) * J1 * Ibp * item   # hf_x/y/z Element windows
    if sar:
        io += 2 * (3 * s) * J1 * Ibp * item       # sigma Element window
        io += 2 * 2 * s * J1 * Ibp * 4            # acc in/out fp32 tiles
    if dft_nf:
        # 6*nf phasor accumulators: 4-D in/out tiles + the rolling bands
        io += 2 * 2 * 6 * dft_nf * s * J1 * Ibp * 4
    tails = (s + 1) * 6 * J1 * Ibp * 4            # persistent fp32 scratch
    if sar:
        tails += 3 * s * J1 * Ibp * 4             # rolling accumulator band
    if dft_nf:
        tails += 6 * dft_nf * 3 * s * J1 * Ibp * 4  # rolling phasor bands
    live = 3 * 6 * (s + 1) * J1 * Ibp * 4         # ~3 levels of fp32 values
    return io + tails + live


def pick_plan(p: Params, coefs: UpdateCoefs,
              sar: bool = False, dft_nf: int = 0) -> tuple[int, int] | None:
    """Feasible (steps-per-sweep, j-tiles) minimizing HBM traffic, or None.

    Candidates are s in {8, 4, 2} x nj in {1, 2, 3, 4, 6, 8, 12, 16}, ranked by modeled
    per-step bytes ~ (reads + writes)/(2s) where j-tiling amplifies reads
    by (tj + 2*HJ)/tj — so a deep sweep over j-tiles (s=8, nj=4) beats a
    shallow full-plane one (s=4, nj=1).  Smaller s halves every window
    and tail; j-tiling shrinks them by ~nj at an s-row halo *recompute*
    wedge per tile side (the k pipeline itself stays zero-recompute).
    nj>1 is what admits 512^3 (any dtype), 384^3 fp32 at s=8, and the
    deep (8, 2) plan for 256^3 fp32 lossy+SAR (r3; was the s=4
    full-plane fallback).

    Vacuum in both modes; lossy media (homogeneous mu) in computation
    mode stream the six ca/cb windows.  SAR composes with lossy on any
    plan (r3: the rolling accumulator band rides the tjw-row tile
    geometry; acc emits are tile interiors, disjoint across tiles) —
    when no plan fits, resolve_backend falls back to lossy temporal.

    Heterogeneous mu_r (r3) streams three extra hf_x/y/z factor windows
    (same geometry as ca/cb) — every material class now runs the
    flagship kernel."""
    het = coefs.heterogeneous_mu
    lossy = not isinstance(coefs.ca_x, (int, float))
    if lossy:
        if p.mode != Mode.COMPUTATION:
            return None
    elif coefs.ca_x != 1.0:
        return None
    if sar and not lossy:
        return None  # vacuum has no dissipation
    if dft_nf:
        # in-kernel DFT (r4, VERDICT r3 #2): per-frequency phasor bands
        # ride like the SAR band; computation mode (the frozen boundary
        # strips are identically zero there, so the in-kernel cell means
        # equal the canonical ones) and full-plane only (the 4-D phasor
        # tiles don't carry the j-tiled band splice)
        if p.mode != Mode.COMPUTATION:
            return None
    S, J1, Ib = dims(p)
    # HBM footprint: every plan runs in-place (field in/outs alias — 1x
    # the j-extended state; j-tiled plans add the small read-only
    # lower-halo bands), plus the read-only coefficient bulks and the
    # fp32 SAR accumulator (aliased), with a 15% working margin.
    item = jnp.dtype(p.dtype).itemsize
    fields = state_bytes(p)
    extras = (6 * S * J1 * Ib * item if lossy else 0) \
        + (3 * S * J1 * Ib * item if het else 0) \
        + (S * J1 * Ib * 4 if sar else 0) \
        + 6 * dft_nf * S * J1 * Ib * 4
    cands = []
    for s in (TS, TS // 2, TS // 4):
        if D % s or (S - D) % s or (S - D) // s < 2:
            continue
        for nj in (1, 2, 3, 4, 6, 8, 12, 16):
            if nj > 1:
                if s > HJ or dft_nf:
                    continue
                tj, Jt = jt_extents(p, nj)
                if tj <= 2 * HJ or (nj - 1) * tj >= J1:
                    continue  # degenerate tiling (tiny grids / over-split)
                amp = 1 + (tj + 2 * HJ) / tj
                ext = Jt / J1
                bands = 6 * (nj - 1) * S * HJ * Ib * item
            else:
                amp = 2.0
                ext = 1.0
                bands = 0
            if 1.15 * ((fields + extras) * ext + bands) >= HBM_BUDGET:
                continue
            cands.append((amp / (2 * s), -s, nj, s))
    for _, _, nj, s in sorted(cands):
        if (
            stream_vmem_estimate(p, s=s, lossy=lossy, sar=sar, nj=nj,
                                 het=het, dft_nf=dft_nf)
            <= VMEM_BUDGET - (0 if sar or dft_nf else 6 * 1024 * 1024)
        ):
            return s, nj
    return None


def pick_s(p: Params, coefs: UpdateCoefs, sar: bool = False) -> int | None:
    """Steps-per-sweep of the best plan (see pick_plan), or None."""
    plan = pick_plan(p, coefs, sar=sar)
    return plan[0] if plan else None


def supported(p: Params, coefs: UpdateCoefs, sar: bool = False) -> bool:
    """True when some streaming plan fits — see pick_plan."""
    return pick_plan(p, coefs, sar=sar) is not None


def _kernel(p: Params, f_h, f_e, patch, Ib, W, s, use_corr, lossy, sar,
            dt_step, dwin, nk, shard, jt, band, het, joff2, dft_nf,
            *refs):
    """One sweep step: advance all s levels by tk=s rows.

    ``jt``: j-tile rows when j-tiled (grid (nj, nk+ofs), k inner so the
    tails scratch carries within each tile's sweep; windows span
    tj + 2*HJ rows and level m's j-validity shrinks one row per side per
    level — HJ >= s makes level s exact on the tile interior, the same
    triangular argument as the sharded-z composition but with halo
    *recompute* instead of exchange).  None = full-plane (j masks use
    local rows; joff = 0).

    ``band``: in-place j-tiled mode.  Input/output field arrays alias,
    so tile jb's lower-halo rows were already overwritten by tile jb-1's
    interior emit; the CALLER pre-copied every tile's pre-sweep lower
    halo (rows [jb*tj + DJ - HJ, jb*tj + DJ), all k) into read-only
    (S, (nj-1)*HJ, Ib) band operands with plain XLA slicing before the
    sweep, and this tile splices band slot jb-1 over window rows
    [0, HJ).  At jb=0 the slot index clamps to 0 and the splice lands on
    the dead band — harmless by the mask calculus.  Within a tile
    in-place is safe unconditionally: the write frontier (block g+ofs-1)
    trails the read frontier (block g+ofs) by one block, and drain
    re-reads of dead block 0 see zeros before and after their re-zeroing
    write.

    refs: koff, 6 input tiles, [chy, chz], [de2, dh2],
    [cax, cay, caz, cbx, cby, cbz when lossy — Element windows covering
    every level's E rows], [sigma, acc_in when sar], [6 band inputs],
    6 outputs [+ acc_out],
    then scratch: tex, tey, tez, thx, thy, thz — each (s+1, J, Ib) holding
    every level's retained top row from the previous grid step
    [+ accb, the rolling 3*tk-row SAR band].

    SAR in the skewed schedule: level m's per-step contribution for cell
    row r (needs E^m rows r, r+1) lands at the grid step where those rows
    materialize — different steps for different m.  The band accumulates
    sigma*|E_cell|^2*dt at band row r - (g-2)*tk; cell block g-2 is
    complete at step g (level s's bottom row is its last contribution) and
    is emitted as acc_in + band[:tk]; the band then shifts down one block.
    One extra drain step (grid nk+2) emits the final block.
    """
    tk = s
    koff_ref = refs[0]
    ins = refs[1:7]
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
    if lossy:
        coef_refs = refs[idx : idx + 6]
        idx += 6
    if het:
        hf_refs = refs[idx : idx + 3]
        idx += 3
    if sar:
        sg_ref, accin_ref = refs[idx : idx + 2]
        idx += 2
    if dft_nf:
        # in-kernel DFT (r4): per-sweep (s, 2*nf) cos/sin weights in SMEM
        # + the stacked (6*nf, S, J, Ib) phasor accumulator tiles
        wts_ref, daccin_ref = refs[idx : idx + 2]
        idx += 2
    if band:
        band_ins = refs[idx : idx + 6]
        idx += 6
    outs = refs[idx : idx + 6]
    idx += 6
    if sar:
        oacc = refs[idx]
        idx += 1
    if dft_nf:
        odacc = refs[idx]
        idx += 1
    tex, tey, tez, thx, thy, thz = refs[idx : idx + 6]
    idx += 6
    if sar:
        accb = refs[idx]
        sring = refs[idx + 1]
        idx += 2
    if dft_nf:
        dbandr = refs[idx]
        idx += 1

    if jt is None:
        g = pl.program_id(0)
        joff = 0
    else:
        jb = pl.program_id(0)
        g = pl.program_id(1)
        joff = jb * jt - HJ  # content-global j of window row 0
    if joff2:
        # 2-D sharding: the shard's content-global j offset rides the
        # second SMEM slot (ry*Jlp - DJ2 — local row 0 is a halo slot)
        joff = joff + koff_ref[0, 1]
    K, J = p.maxk, p.maxj
    L0 = g * tk + koff_ref[0, 0]  # global k of the input block's first row

    @pl.when(g == 0)
    def _init():
        z = jnp.zeros(tex.shape, tex.dtype)
        tex[:] = z
        tey[:] = z
        tez[:] = z
        thx[:] = z
        thy[:] = z
        thz[:] = z
        if sar:
            accb[:] = jnp.zeros(accb.shape, jnp.float32)
            sring[:] = jnp.zeros(sring.shape, jnp.float32)
        if dft_nf:
            dbandr[:] = jnp.zeros(dbandr.shape, jnp.float32)

    st_dt = ins[0].dtype
    cd = jnp.float32 if st_dt == jnp.bfloat16 else st_dt
    if band:
        # splice the pre-copied band (this tile's pre-sweep lower halo)
        # over the aliasing-corrupted window rows [0, HJ)
        cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz = (
            jnp.concatenate([bi[:], r[:][:, HJ:]], axis=1).astype(cd)
            for bi, r in zip(band_ins, ins)
        )
    else:
        cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz = (
            r[:].astype(cd) for r in ins
        )
    if use_corr:
        chy_w = chy_ref[:].astype(cd)  # rows [L0-s, L0+tk) of the corr bands
        chz_w = chz_ref[:].astype(cd)
    if lossy:
        # ca/cb rows [L0-s, L0+tk): every level's E rows live in here
        caxw, cayw, cazw, cbxw, cbyw, cbzw = (
            r[:].astype(cd) for r in coef_refs
        )
    if het:
        # per-component face-averaged H factors, same window geometry as
        # the ca/cb streams (every level's H rows live in [L0-s, L0+tk))
        hfxw, hfyw, hfzw = (r[:].astype(cd) for r in hf_refs)
    if sar:
        sg_blk = sg_ref[:].astype(jnp.float32)  # cells [g*tk, (g+1)*tk)
        # full band-aligned sigma: cells [(g-2)tk, (g+1)tk)
        sg_w = jnp.concatenate([sring[:], sg_blk], axis=0)
        accband = accb[:]                       # same rows, fp32
        dt_f = jnp.float32(dt_step)
    if dft_nf:
        # per-accumulator rolling bands as VALUES through the level loop
        # (the SAR accband pattern), written back once per grid step
        dbands = [dbandr[i] for i in range(6 * dft_nf)]
    if patch is not None:
        de2 = de2_ref[:].astype(cd)
        dh2 = dh2_ref[:].astype(cd)
        if dwin is not None:
            row0, rows_w = dwin
            full = cur_ex.shape[1]
            padj = ((0, 0), (row0, full - row0 - rows_w), (0, 0))
            de2 = jnp.pad(de2, padj)
            dh2 = jnp.pad(dh2, padj)
        j0, j1, i0, i1 = patch
        jrow = jax.lax.broadcasted_iota(jnp.int32, cur_ex.shape[1:], 0)
        if jt is not None or joff2:
            jrow = jrow + joff
        mrow = (
            (jrow >= j0)
            & (jrow < j1)
            & (jax.lax.broadcasted_iota(jnp.int32, cur_ex.shape[1:], 1) >= i0)
            & (jax.lax.broadcasted_iota(jnp.int32, cur_ex.shape[1:], 1) < i1)
        )

    # snapshot ALL retained tails before any level overwrites them: level
    # m+1 reads level m's PREVIOUS-step tail within this same grid step.
    t_ex = [tex[m] for m in range(s + 1)]
    t_ey = [tey[m] for m in range(s + 1)]
    t_ez = [tez[m] for m in range(s + 1)]
    t_hx = [thx[m] for m in range(s + 1)]
    t_hy = [thy[m] for m in range(s + 1)]
    t_hz = [thz[m] for m in range(s + 1)]

    zr = jnp.zeros((), cd)

    # --- hoisted 2-D masks (identical for every level and grid step) ---
    # the per-level masks then cost one broadcast AND instead of fresh 3-D
    # iotas + compares 2*s times per grid step (VPU is the limiter here)
    plane = cur_ex.shape[1:]
    jj2 = jax.lax.broadcasted_iota(jnp.int32, plane, 0)
    if jt is not None or joff2:
        jj2 = jj2 + joff
    ln2 = jax.lax.broadcasted_iota(jnp.int32, plane, 1)
    jm_j = (jj2 < J)[None]                      # Hx/Hz row bound
    jm_ex = ((jj2 >= 1) & (jj2 < J))[None]
    jm_ey = ((jj2 < J) & (ln2 >= 1))[None]
    jm_ez = ((jj2 >= 1) & (jj2 < J) & (ln2 >= 1))[None]
    last_lane = (ln2 == Ib - 1)[None]

    def krow(lo, n):
        return (jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) + lo)

    for m in range(1, s + 1):
        o_m = L0 - m  # global k of this level's first updated row
        # level m-1 extended rows [o_m, o_m + tk]: retained tail + tk fresh
        ex_e = jnp.concatenate([t_ex[m - 1][None], cur_ex], axis=0)
        ey_e = jnp.concatenate([t_ey[m - 1][None], cur_ey], axis=0)
        ez_e = jnp.concatenate([t_ez[m - 1][None], cur_ez], axis=0)
        hx_p = jnp.concatenate([t_hx[m - 1][None], cur_hx[: tk - 1]], axis=0)
        hy_p = jnp.concatenate([t_hy[m - 1][None], cur_hy[: tk - 1]], axis=0)
        hz_p = jnp.concatenate([t_hz[m - 1][None], cur_hz[: tk - 1]], axis=0)

        if patch is not None and m >= 2:
            # Source hard-set for step m, substituted into this level's
            # INPUT VIEWS only.  The skewed schedule materializes a level's
            # rows across several grid steps, so writing the drive into the
            # stored level-(m-1) state would leak it into that level's own
            # later-row updates (the reference injects at the *start of
            # step m*, main.c:770-778; state m-1 itself never carries it).
            # m == 1 reads the real state, injected outside the kernel.
            m0e = (krow(o_m, tk + 1) == 0) & mrow[None, :, :]
            ez_e = jnp.where(m0e, de2[m - 2][None, :, :], ez_e)
            ex_e = jnp.where(m0e, zr, ex_e)
            m0h = m0e[:tk]
            hx_p = jnp.where(m0h, dh2[m - 2][None, :, :], hx_p)
            hz_p = jnp.where(m0h, zr, hz_p)

        # save level m-1's new tails (post-injection values from last level)
        tex[m - 1] = cur_ex[tk - 1]
        tey[m - 1] = cur_ey[tk - 1]
        tez[m - 1] = cur_ez[tk - 1]
        thx[m - 1] = cur_hx[tk - 1]
        thy[m - 1] = cur_hy[tk - 1]
        thz[m - 1] = cur_hz[tk - 1]

        # ---- H^m on rows [o_m, o_m + tk) ----
        kv = krow(o_m, tk)
        k_lt_K = kv < K
        ex0, ex1 = ex_e[:tk], ex_e[1:]
        ey0, ey1 = ey_e[:tk], ey_e[1:]
        ez0 = ez_e[:tk]
        ey_px = jnp.where(last_lane, zr, jnp.roll(ey0, -1, axis=2))
        ez_px = jnp.where(last_lane, zr, jnp.roll(ez0, -1, axis=2))
        ez_py = jnp.roll(ez0, -1, axis=1)
        ex_py = jnp.roll(ex0, -1, axis=1)
        inc_hx = (ey1 - ey0) - (ez_py - ez0)
        inc_hy = (ez_px - ez0) - (ex1 - ex0)
        inc_hz = (ex_py - ex0) - (ey_px - ey0)
        if use_corr:
            # corr window rows are [L0 - s, L0 + tk): row o_m at offset s - m
            c0 = s - m
            if W == Ib:
                inc_hy = inc_hy + chy_w[c0 : c0 + tk]
                inc_hz = inc_hz + chz_w[c0 : c0 + tk]
            else:
                inc_hy = jnp.concatenate(
                    [inc_hy[:, :, : Ib - W],
                     inc_hy[:, :, Ib - W :] + chy_w[c0 : c0 + tk]], axis=2)
                inc_hz = jnp.concatenate(
                    [inc_hz[:, :, : Ib - W],
                     inc_hz[:, :, Ib - W :] + chz_w[c0 : c0 + tk]], axis=2)
        if het:
            co2 = slice(s - m, s - m + tk)  # this level's H rows
            fhx, fhy, fhz = hfxw[co2], hfyw[co2], hfzw[co2]
        else:
            fhx = fhy = fhz = f_h
        if _PROBE_UNMASKED and not lossy and not sar and not dft_nf:
            hx_n = hx_p + fhx * inc_hx
            hy_n = hy_p + fhy * inc_hy
            hz_n = hz_p + fhz * inc_hz
        else:
            if patch is not None:
                # exclusion only on the k == 0 plane (QUIRKS #4 semantics)
                not_p = ~((kv == 0) & mrow[None])
                m_hx = k_lt_K & jm_j & not_p
                m_hz = (kv < K + 1) & jm_j & not_p
            else:
                m_hx = k_lt_K & jm_j
                m_hz = (kv < K + 1) & jm_j
            m_hy = jnp.broadcast_to(k_lt_K, hx_p.shape)
            hx_n = jnp.where(m_hx, hx_p + fhx * inc_hx, hx_p)
            hy_n = jnp.where(m_hy, hy_p + fhy * inc_hy, hy_p)
            hz_n = jnp.where(m_hz, hz_p + fhz * inc_hz, hz_p)

        # ---- E^m on the same rows (needs own-level H tail at o_m - 1) ----
        hx_x = jnp.concatenate([t_hx[m][None], hx_n], axis=0)
        hy_x = jnp.concatenate([t_hy[m][None], hy_n], axis=0)
        hz_x = jnp.concatenate([t_hz[m][None], hz_n], axis=0)
        hx0, hx_m1 = hx_x[1:], hx_x[:tk]
        hy0, hy_m1 = hy_x[1:], hy_x[:tk]
        hz0 = hz_x[1:]
        hz_my = jnp.roll(hz0, 1, axis=1)
        hz_mx = jnp.roll(hz0, 1, axis=2)
        hy_mx = jnp.roll(hy0, 1, axis=2)
        hx_my = jnp.roll(hx0, 1, axis=1)
        curl_x = (hz0 - hz_my) - (hy0 - hy_m1)
        curl_y = (hx0 - hx_m1) - (hz0 - hz_mx)
        curl_z = (hy0 - hy_mx) - (hx0 - hx_my)
        if _PROBE_UNMASKED and not lossy and not sar and not dft_nf:
            ex_n = ex_e[:tk] + f_e * curl_x
            ey_n = ey_e[:tk] + f_e * curl_y
            ez_n = ez_e[:tk] + f_e * curl_z
            cur_ex, cur_ey, cur_ez = ex_n, ey_n, ez_n
            cur_hx, cur_hy, cur_hz = hx_n, hy_n, hz_n
            continue
        k_in = (kv >= 1) & k_lt_K
        m_ex = k_in & jm_ex
        m_ey = k_in & jm_ey
        m_ez = k_lt_K & jm_ez
        if lossy:
            co = slice(s - m, s - m + tk)  # this level's rows in the window
            ex_n = jnp.where(m_ex, caxw[co] * ex_e[:tk] + cbxw[co] * curl_x,
                             ex_e[:tk])
            ey_n = jnp.where(m_ey, cayw[co] * ey_e[:tk] + cbyw[co] * curl_y,
                             ey_e[:tk])
            ez_n = jnp.where(m_ez, cazw[co] * ez_e[:tk] + cbzw[co] * curl_z,
                             ez_e[:tk])
        else:
            ex_n = jnp.where(m_ex, ex_e[:tk] + f_e * curl_x, ex_e[:tk])
            ey_n = jnp.where(m_ey, ey_e[:tk] + f_e * curl_y, ey_e[:tk])
            ez_n = jnp.where(m_ez, ez_e[:tk] + f_e * curl_z, ez_e[:tk])

        if sar or dft_nf:
            # cell rows [o_m - 1, o_m + tk - 1): E^m = own old tail + fresh
            exs = jnp.concatenate([t_ex[m][None], ex_n], axis=0)
            eys = jnp.concatenate([t_ey[m][None], ey_n], axis=0)
            ezs = jnp.concatenate([t_ez[m][None], ez_n], axis=0)
            a, b = exs[:tk], exs[1:]
            mex = 0.25 * (a + b + jnp.roll(a, -1, axis=1) + jnp.roll(b, -1, axis=1))
            a, b = eys[:tk], eys[1:]
            a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
            b_i = jnp.where(last_lane, zr, jnp.roll(b, -1, axis=2))
            mey = 0.25 * (a + a_i + b + b_i)
            a = ezs[:tk]
            a_j = jnp.roll(a, -1, axis=1)
            a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
            a_ji = jnp.where(last_lane, zr, jnp.roll(a_j, -1, axis=2))
            mez = 0.25 * (a + a_j + a_i + a_ji)
            kv_c = krow(o_m - 1, tk)
            m_sar = (kv_c >= 0) & (kv_c < K) & jm_j
            b0 = 2 * tk - m - 1  # band row of cell row o_m - 1

            def band_add(bandv, inc):
                # static-offset add (Mosaic has no scatter-add): pad to
                # the band rows
                tail_sh = (3 * tk - b0 - tk,) + inc.shape[1:]
                return bandv + jnp.concatenate(
                    [jnp.zeros((b0,) + inc.shape[1:], jnp.float32), inc,
                     jnp.zeros(tail_sh, jnp.float32)],
                    axis=0,
                )

        if sar:
            inc = sg_w[b0 : b0 + tk] * (
                (mex * mex).astype(jnp.float32)
                + (mey * mey).astype(jnp.float32)
                + (mez * mez).astype(jnp.float32)
            )
            inc = jnp.where(m_sar, inc * dt_f, jnp.float32(0.0))
            accband = band_add(accband, inc)
        if dft_nf:
            # acc_re += cos * E_cell, acc_im -= sin * E_cell per
            # frequency and component (fdtd_tpu.dft.accumulate), with
            # the per-level scalar weights from SMEM
            zf32 = jnp.float32(0.0)
            for fi in range(dft_nf):
                cw = wts_ref[m - 1, fi]
                sw = wts_ref[m - 1, dft_nf + fi]
                for ci, me in enumerate((mex, mey, mez)):
                    mef = me.astype(jnp.float32)
                    base = (fi * 3 + ci) * 2
                    dbands[base] = band_add(
                        dbands[base],
                        jnp.where(m_sar, cw * mef, zf32))
                    dbands[base + 1] = band_add(
                        dbands[base + 1],
                        jnp.where(m_sar, (-sw) * mef, zf32))

        cur_ex, cur_ey, cur_ez = ex_n, ey_n, ez_n
        cur_hx, cur_hy, cur_hz = hx_n, hy_n, hz_n

    # save level s's tails for the next step
    tex[s] = cur_ex[tk - 1]
    tey[s] = cur_ey[tk - 1]
    tez[s] = cur_ez[tk - 1]
    thx[s] = cur_hx[tk - 1]
    thy[s] = cur_hy[tk - 1]
    thz[s] = cur_hz[tk - 1]

    vals = (cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz)

    if shard:
        # sharded sweep: the first two steps ramp through the bottom halo
        # block (zeroed — the exchange refreshes it before the next sweep
        # reads it); every later step emits a fully-valid own block.  The
        # SAR drain step (grid nb+1, g = nk+1) maps its field output to
        # the top halo block — zeroed here (deterministic; the next
        # exchange refreshes it before any read)
        dead_cond = (g < 2) | (g > nk)
        emit_cond = (g >= 2) & (g <= nk)
    else:
        dead_cond = (g == 0) | (g > nk)
        emit_cond = (g > 0) & (g <= nk)

    @pl.when(dead_cond)
    def _dead():
        # single-chip: g=0 lands in the last dead-slab block; the ofs-1
        # extra steps (tk < D) re-zero the remaining dead blocks
        for o in outs:
            o[:] = jnp.zeros(o.shape, st_dt)

    @pl.when(emit_cond)
    def _emit():
        for o, v in zip(outs, vals):
            # j-tiled: emit the tile interior; halo columns are the
            # recompute wedge (stale beyond their level's validity)
            o[:] = (v if jt is None else v[:, HJ : HJ + jt]).astype(st_dt)

    if sar:
        # emit cell block g-2 (complete at step g), shift the band down;
        # j-tiled: emit the tile interior (acc interiors are disjoint
        # across tiles, so the aliased read-before-write stays race-free).
        # Sharded: g=2's cell block is the NEIGHBOR's top cells — its
        # halo-ramp contributions are invalid, so the first own emit is
        # g=3 and g<3 zeroes the (cropped-away) bottom halo acc block
        acc_emit = (accband[:tk] if jt is None
                    else accband[:tk, HJ : HJ + jt])
        g_acc0 = 3 if shard else 2

        @pl.when((g >= g_acc0) & (g <= nk + 1))
        def _emit_acc():
            oacc[:] = accin_ref[:] + acc_emit

        @pl.when(g < g_acc0)
        def _emit_acc_dead():
            oacc[:] = jnp.zeros(oacc.shape, jnp.float32)

        accb[:] = jnp.concatenate(
            [accband[tk:], jnp.zeros((tk,) + accband.shape[1:], jnp.float32)],
            axis=0,
        )
        sring[:] = sg_w[tk:]  # ring shifts one block per step

    if dft_nf:
        # phasor-accumulator emit: same schedule as the SAR band (cell
        # block g-2 completes at step g).  Sharded (r5): g=2's cell block
        # is the NEIGHBOR's top cells — halo-ramp contributions are
        # invalid, so the first own emit is g=3 and g<3 zeroes the
        # (cropped-away) bottom halo dacc block, exactly the SAR calculus
        demit = jnp.stack([bnd[:tk] for bnd in dbands])
        dg0 = 3 if shard else 2

        @pl.when((g >= dg0) & (g <= nk + 1))
        def _emit_dacc():
            odacc[:] = daccin_ref[:] + demit

        @pl.when(g < dg0)
        def _emit_dacc_dead():
            odacc[:] = jnp.zeros(odacc.shape, jnp.float32)

        for i, bnd in enumerate(dbands):
            dbandr[i] = jnp.concatenate(
                [bnd[tk:], jnp.zeros((tk,) + bnd.shape[1:], jnp.float32)],
                axis=0,
            )


def build_stream_call(p: Params, coefs: UpdateCoefs, interpret: bool,
                      s: int = TS, sar: bool = False, nj: int = 1,
                      inplace: bool = True, dft_nf: int = 0):
    """The streaming sweep pallas_call (single-chip stripped layout).

    Signature: call(koff, ex..hz, chy, chz, de2, dh2) -> 6 fields — the
    same caller contract as pallas_temporal.build_temporal_call, so the
    group-step driver is shared.  ``nj`` > 1: operands in the j-extended
    layout (pallas_temporal.jextend); the grid becomes (nj, nk+ofs) with
    k INNER so the tails scratch carries within each j-tile's sweep (the
    opposite nesting to the temporal kernel, whose (k, j) windows are
    independent)."""
    S, J1, Ib = dims(p)
    W = corr_width(Ib)
    tk = s
    ofs = D // tk
    assert D % tk == 0 and (S - D) % tk == 0, (S, D, tk)
    nk = (S - D) // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    f_h = compute_dtype.type(coefs.h_factor)
    f_e = compute_dtype.type(0.0) if lossy else compute_dtype.type(coefs.cb_x)
    patch = None
    dwin = None
    if p.mode == Mode.COMPUTATION:
        plan = make_source_plan(p)
        patch = (plan.j0, plan.j1, plan.i0, plan.i1)
        if nj == 1:
            row0 = plan.j0 // 8 * 8
            dwin = (row0, min(-(-(plan.j1 - row0) // 8) * 8, J1 - row0))
    use_corr = p.mode != Mode.COMPUTATION
    nd = max(s - 1, 1)

    if nj > 1:
        assert dft_nf == 0, "in-kernel DFT is full-plane only (pick_plan)"
        return _build_stream_call_jt(
            p, coefs, interpret, s, sar, nj, S, J1, Ib, W, tk, ofs, nk,
            dtype, compute_dtype, lossy, f_h, f_e, patch, use_corr, nd,
            inplace, het)
    if dft_nf:
        assert p.mode == Mode.COMPUTATION, "in-kernel DFT: computation mode"

    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S, J1, Ib), jnp.float32)
    dacc_shape = jax.ShapeDtypeStruct((6 * dft_nf, S, J1, Ib), jnp.float32)
    # drain steps: one per level-wedge, plus ofs-1 extra to re-zero the
    # remaining dead-slab output blocks (ofs > 1 when tk < D), plus one
    # more for the final SAR/DFT accumulator block (see _kernel docstring)
    grid = (nk + ofs + (1 if sar or dft_nf else 0),)

    in_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (jnp.where(g < nk, g + ofs, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    # wedge writes blocks ofs-1..nk+ofs-1 at g=0..nk; extra steps g > nk
    # re-zero dead blocks 0..ofs-2 (ofs=1: rewrite block 0's zeros)
    out_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (
            jnp.where(g <= nk, g + ofs - 1,
                      jnp.minimum(g - nk - 1, ofs - 1)),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    # cell block c completes at step c+2 -> array block c+ofs = g+ofs-2;
    # g<2 covers the dead blocks (zeroed), the top clamp is a no-store
    # revisit on the ofs>1 extra steps
    acc_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1), g + ofs - 2),
                     0, nk + ofs - 1),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    # sigma arrives one Blocked tile per step; the previous two blocks ride
    # in a scratch ring so the 3*tk-row band alignment needs no negative
    # window starts (cells below 0 are genuine ring zeros)
    sg_win = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (jnp.minimum(g, nk - 1) + ofs, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # corr rows track the LEVELS (not the input block), so no drain clamp:
    # the g=nk window overruns the array top by s rows, covered by padding
    c_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(W)),
        lambda g: ((jnp.minimum(g, nk) + ofs) * tk - s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    drv_rows = dwin[1] if dwin is not None else J1
    drv_spec = pl.BlockSpec((nd, drv_rows, Ib), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)

    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((jnp.minimum(g, nk) + ofs) * tk - s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wts_smem = pl.BlockSpec((s, 2 * dft_nf), lambda g: (0, 0),
                            memory_space=pltpu.SMEM)
    dacc_blk = pl.BlockSpec(
        (6 * dft_nf, tk, J1, Ib),
        lambda g: (
            0,
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1), g + ofs - 2),
                     0, nk + ofs - 1),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    in_specs = (
        [smem] + [in_blk] * 6
        + ([c_win] * 2 if use_corr else [])
        + ([drv_spec] * 2 if patch is not None else [])
        + ([coef_win] * 6 if lossy else [])
        + ([coef_win] * 3 if het else [])
        + ([sg_win, acc_blk] if sar else [])
        + ([wts_smem, dacc_blk] if dft_nf else [])
    )
    n_in = len(in_specs)
    out_specs = [out_blk] * 6 + ([acc_blk] if sar else []) \
        + ([dacc_blk] if dft_nf else [])
    out_shape = (bulk_shape,) * 6 + ((acc_shape,) if sar else ()) \
        + ((dacc_shape,) if dft_nf else ())
    # the accumulator tile aliases its output (each block written once per
    # sweep; read-before-write within a grid step).  Fields alias in/out
    # too (r3 in-place): the write frontier (block g+ofs-1) trails the
    # read frontier (block g+ofs) by one block, so the sweep is race-free
    # without ping-pong — HBM at ~1x the state
    aliases = {}
    if not interpret:
        if inplace:
            aliases.update({i + 1: i for i in range(6)})
        if sar:
            aliases[n_in - (3 if dft_nf else 1)] = 6
        if dft_nf:
            aliases[n_in - 1] = 6 + (1 if sar else 0)
    tail = pltpu.VMEM((s + 1, J1, Ib), compute_dtype)
    scratch = [tail] * 6 + (
        [pltpu.VMEM((3 * tk, J1, Ib), jnp.float32),   # accumulator band
         pltpu.VMEM((2 * tk, J1, Ib), jnp.float32)]   # sigma ring (2 blocks)
        if sar else []
    ) + (
        [pltpu.VMEM((6 * dft_nf, 3 * tk, J1, Ib), jnp.float32)]
        if dft_nf else []
    )
    inner = pl.pallas_call(
        functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, s, use_corr,
                          lossy, sar, p.time_step, dwin, nk, False, None,
                          False, het, False, dft_nf),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *coef6,
             hf=(), sigma=None, acc=None, wts=None, dacc=None):
        args = [koff, ex, ey, ez, hx, hy, hz]
        if use_corr:
            args += [chy, chz]
        if patch is not None:
            if dwin is not None:
                row0, rows_w = dwin
                de2 = de2[:, row0 : row0 + rows_w]
                dh2 = dh2[:, row0 : row0 + rows_w]
            args += [de2, dh2]
        if lossy:
            args += list(coef6)
        if het:
            args += list(hf)
        if sar:
            args += [sigma, acc]
        if dft_nf:
            args += [wts, dacc]
        return inner(*args)

    return call, nd


def _build_stream_call_jt(p, coefs, interpret, s, sar, nj, S, J1, Ib, W,
                          tk, ofs, nk, dtype, compute_dtype, lossy, f_h,
                          f_e, patch, use_corr, nd, inplace=False,
                          het=False):
    """j-tiled streaming sweep: grid (nj, nk+ofs), k inner (see
    build_stream_call).  Operands are (S, Jt, Ib) j-extended arrays;
    every window is an Element spec of tj + 2*HJ rows starting at
    jb*tj + DJ - HJ = jb*tj (8-aligned for Mosaic's sublane rule).
    Rows outside tile coverage ([0, DJ) and the top pad) are never
    written and may hold stale values — harmless: the global-j masks
    exclude every read across the content edges (Ex/Ez need j >= 1; H
    reads j+1 only below J), so stale pad rows feed only masked
    copy-through lanes that jrestore drops."""
    assert s <= HJ, (s, HJ)
    tj, Jt = jt_extents(p, nj)
    tjw = tj + 2 * HJ

    bulk_shape = jax.ShapeDtypeStruct((S, Jt, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S, Jt, Ib), jnp.float32)
    grid = (nj, nk + ofs + (1 if sar else 0))

    def jstart(jb):
        return pl.multiple_of(jb * tj + DJ - HJ, 8)

    in_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: (jnp.where(g < nk, g + ofs, 0) * tk, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    out_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
        lambda jb, g: (
            jnp.where(g <= nk, g + ofs - 1,
                      jnp.minimum(g - nk - 1, ofs - 1)) * tk,
            pl.multiple_of(jb * tj + DJ, 8),
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    c_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(tjw), pl.Element(W)),
        lambda jb, g: ((jnp.minimum(g, nk) + ofs) * tk - s, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nk) + ofs) * tk - s, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    drv_spec = pl.BlockSpec(
        (pl.Element(nd), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: (0, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda jb, g: (0, 0),
                        memory_space=pltpu.SMEM)

    # in-place (r3): field in/outs alias (1x-state HBM).  Tile jb's
    # lower-halo rows (window rows [0, HJ)) sit inside tile jb-1's
    # interior, already overwritten by the time tile jb runs — their
    # pre-sweep values ride in 6 READ-ONLY (S, (nj-1)*HJ, Ib) band
    # operands the caller pre-copies with plain XLA slicing before the
    # sweep (slot jb-1 at j offset (jb-1)*HJ; slot index clamps to 0 at
    # jb=0 where the splice lands on the dead band).  A read-only band
    # avoids the earlier aliased-stash design, whose per-tile writes to
    # jb-independent output blocks were elided on real TPUs (Pallas
    # revisit semantics only guarantee the LAST visit of an output block
    # lands in HBM — with nj tiles revisiting every stash block, tiles
    # 0..nj-2's writes never became visible to the next tile's reads).
    band_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(HJ), pl.Element(Ib)),
        lambda jb, g: (
            jnp.where(g < nk, g + ofs, 0) * tk,
            jnp.maximum(jb - 1, 0) * HJ,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    # SAR composes with j-tiling (r3): the sigma window rides the tjw-row
    # Element geometry; the acc in/out windows are TILE INTERIORS at the
    # full-plane acc block's clipped k map — interiors are disjoint across
    # tiles, so the aliased read-before-write per block races nothing
    sg_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nk - 1) + ofs) * tk, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    acc_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
        lambda jb, g: (
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1), g + ofs - 2),
                     0, nk + ofs - 1) * tk,
            pl.multiple_of(jb * tj + DJ, 8),
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    in_specs = (
        [smem] + [in_win] * 6
        + ([c_win] * 2 if use_corr else [])
        + ([drv_spec] * 2 if patch is not None else [])
        + ([coef_win] * 6 if lossy else [])
        + ([coef_win] * 3 if het else [])
        + ([sg_win, acc_win] if sar else [])
        + ([band_win] * 6 if inplace else [])
    )
    n_in = len(in_specs)
    aliases = {}
    if not interpret:
        if inplace:
            aliases.update({i + 1: i for i in range(6)})
        if sar:
            aliases[n_in - 7 if inplace else n_in - 1] = 6
    tail = pltpu.VMEM((s + 1, tjw, Ib), compute_dtype)
    scratch = [tail] * 6 + (
        [pltpu.VMEM((3 * tk, tjw, Ib), jnp.float32),   # accumulator band
         pltpu.VMEM((2 * tk, tjw, Ib), jnp.float32)]   # sigma ring
        if sar else []
    )
    inner = pl.pallas_call(
        functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, s, use_corr,
                          lossy, sar, p.time_step, None, nk, False, tj,
                          inplace, het, False, 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_win] * 6 + ([acc_win] if sar else []),
        out_shape=(bulk_shape,) * 6 + ((acc_shape,) if sar else ()),
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *coef6,
             hf=(), sigma=None, acc=None):
        args = [koff, ex, ey, ez, hx, hy, hz]
        if use_corr:
            args += [chy, chz]
        if patch is not None:
            args += [de2, dh2]
        if lossy:
            args += list(coef6)
        if het:
            args += list(hf)
        if sar:
            args += [sigma, acc]
        if inplace:
            args += [
                jnp.concatenate(
                    [jax.lax.slice_in_dim(f, b * tj + DJ - HJ, b * tj + DJ,
                                          axis=1)
                     for b in range(1, nj)],
                    axis=1,
                )
                for f in (ex, ey, ez, hx, hy, hz)
            ]
        return inner(*args)

    return call, nd


def make_stream_pair_step(p: Params, coefs: UpdateCoefs,
                          interpret: bool | None = None, s: int | None = None,
                          accumulate_power: bool = False,
                          nj: int | None = None):
    """``group_step(state, xs_group) -> state`` advancing s steps/sweep
    (``group_step.s``; pick_plan chooses (s, nj) unless forced via
    ``s=``/``nj=`` or ``FDTD_STREAM_S``/``FDTD_STREAM_NJ``); with
    ``accumulate_power``: ``((state, acc), xs) -> (state, acc)`` where
    acc is fp32 in the storage layout (pallas_temporal.embed_power_acc
    at the plan's nj — the accumulator rides the same j-extension as
    the fields).

    Same contract as pallas_temporal.make_temporal_pair_step: with
    ``group_step.nj`` > 1 the state must round-trip through
    pallas_temporal.jextend/jrestore per scan chunk."""
    import os

    if s is None:
        env = os.environ.get("FDTD_STREAM_S")
        if env:
            s = int(env)
    if nj is None:
        env = os.environ.get("FDTD_STREAM_NJ")
        if env:
            nj = int(env)
    plan_ = pick_plan(p, coefs, sar=accumulate_power)
    if plan_ is None:
        raise NotImplementedError("streaming kernel unsupported for this config")
    if s is None and nj is None:
        s, nj = plan_
    elif nj is None:
        nj = 1  # forced s keeps the full-plane behavior
    elif s is None:
        s = plan_[0]
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    assert s in (TS, TS // 2, TS // 4) and D % s == 0, s
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")

    S, J1, Ib = dims(p)
    _, Jt = jt_extents(p, nj)
    dj = DJ if nj > 1 else 0
    dtype = jnp.dtype(p.dtype)
    f_h32 = jnp.float32(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    plan = make_source_plan(p) if inject else None
    # Sweeps run in-place (field in/outs alias, 1x-state HBM): full-plane
    # directly; j-tiled via pre-copied read-only halo bands (see
    # _build_stream_call_jt).  Both verified bit-exact on device.
    inplace = os.environ.get("FDTD_STREAM_INPLACE", "1") != "0"
    call, nd = build_stream_call(p, coefs, interpret, s=s,
                                 sar=accumulate_power, nj=nj,
                                 inplace=inplace)

    K, J = p.maxk, p.maxj
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, Jt if nj > 1 else J1, Ib), dtype)

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
        if inject:
            st = inject_state(st, drive_patch(amps_g[0]))
            sl = (slice(0, nd), slice(dj + plan.j0, dj + plan.j1),
                  slice(plan.i0, plan.i1))
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
            de2 = jnp.asarray(zero_drv).at[sl].set(pvs.astype(dtype))
            dh2 = jnp.asarray(zero_drv).at[sl].set((-plan.inv_z_te * pvs).astype(dtype))
        else:
            de2 = dh2 = jnp.asarray(zero_drv)
        coef6 = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy else ()
        )
        outs = call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, de2, dh2, *coef6,
            hf=(st.hf_x, st.hf_y, st.hf_z) if het else (),
            sigma=st.sigma_c if accumulate_power else None,
            acc=acc,
        )
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc = outs
        else:
            ex, ey, ez, hx, hy, hz = outs
        ey_s2 = st.ey_s[:, :, 0]
        ez_s2 = st.ez_s[:, :, 0]
        sl2 = (slice(D, D + K), slice(dj, dj + J))
        curl = (ey_s2[D + 1 : D + K + 1, dj : dj + J] - ey_s2[sl2]) - (
            ez_s2[D : D + K, dj + 1 : dj + J + 1] - ez_s2[sl2]
        )
        fh_s = st.hfx_s[sl2[0], sl2[1], 0] if het else f_h32
        hx_s = st.hx_s
        for _ in range(s):
            hx_s = hx_s.at[sl2[0], sl2[1], 0].add((fh_s * curl).astype(st.hx_s.dtype))
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
    group_step.s = s
    return group_step


def embed_dft_acc(p: Params, acc, nf: int):
    """Canonical (re, im) phasor accumulators, each (nf, 3, K, J, I)
    fp32, -> the stacked storage layout (6*nf, S, J1, Ib) the streaming
    kernel's 4-D accumulator tiles ride (slot (fi*3+ci)*2 + {0: re,
    1: im})."""
    re, im = acc
    S, J1, Ib = dims(p)
    K, J = p.maxk, p.maxj
    nf3 = re.shape[0] * re.shape[1]
    inter = jnp.stack([jnp.asarray(re, jnp.float32),
                       jnp.asarray(im, jnp.float32)], axis=2)
    inter = inter.reshape(2 * nf3, K, J, p.maxi)
    out = jnp.zeros((6 * nf, S, J1, Ib), jnp.float32)
    return out.at[:, D : D + K, :J, :].set(inter)


def crop_dft_acc(p: Params, dacc, nf: int):
    """Inverse of :func:`embed_dft_acc`."""
    K, J, I = p.maxk, p.maxj, p.maxi
    inter = dacc[:, D : D + K, :J, :I].reshape(nf, 3, 2, K, J, I)
    return inter[:, :, 0], inter[:, :, 1]


def build_dft_accum_call(p: Params, nf: int, interpret: bool):
    """Per-step in-kernel DFT accumulation over a FINAL stripped E state
    (r5): ``call(ex, ey, ez, wts, dacc) -> dacc`` with the phasor
    accumulators aliased in place.

    The streaming in-kernel DFT needs group-stepped sweeps; per-step
    backends (the in-kernel CPML tier, pallas_fused) have complete
    states after every step, so the accumulation is its own blocked
    pass: Element windows of tk+1 E rows (the cell mean at row r reads
    rows r and r+1), the 4-edge mean association of dft.accumulate's
    `_e_cell_means`, per-step (cos, sin) weights in SMEM, and the
    stacked (6nf, S, J1, Ib) accumulator in the embed_dft_acc layout.
    Computation mode only (frozen strips are zero, so the
    ``last_lane -> 0`` reads equal canonical means).  This is what lets
    the OPEN-BOUNDARY steady-state phasor ride the kernel tier instead
    of the xla scan (VERDICT r4 missing #1's last leg)."""
    S, J1, Ib = dims(p)
    K, J = p.maxk, p.maxj
    # tk must divide D (the dacc Blocked tiles start at the content
    # offset) and K; double-buffered 3 E windows + 2*6nf fp32 acc tiles
    budget = 100 * 1024 * 1024
    row = J1 * (-(-Ib // 128) * 128) * 4
    tk = 1
    for cand in (8, 4, 2):
        if D % cand == 0 and K % cand == 0 and (
                2 * (3 * (cand + 1) + 12 * nf * cand) * row <= budget):
            tk = cand
            break
    nb = K // tk
    dacc_shape = jax.ShapeDtypeStruct((6 * nf, S, J1, Ib), jnp.float32)

    e_win = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 1)), pl.Element(J1), pl.Element(Ib)),
        lambda g: (D + g * tk, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dacc_blk = pl.BlockSpec(
        (6 * nf, tk, J1, Ib),
        lambda g: (0, (D + g * tk) // tk, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wts_smem = pl.BlockSpec((1, 2 * nf), lambda g: (0, 0),
                            memory_space=pltpu.SMEM)
    assert D % tk == 0, (D, tk)  # dacc blocks must tile the D offset

    def kernel(ex_ref, ey_ref, ez_ref, wts_ref, dacc_ref, odacc):
        g = pl.program_id(0)
        cd = jnp.float32
        exw = ex_ref[:].astype(cd)
        eyw = ey_ref[:].astype(cd)
        ezw = ez_ref[:].astype(cd)
        plane = exw.shape[1:]
        jrow = jax.lax.broadcasted_iota(jnp.int32, plane, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, plane, 1)
        jm_j = (jrow < J)[None]
        last_lane = (lane == Ib - 1)[None]
        zr = jnp.float32(0.0)
        a, b = exw[:tk], exw[1:]
        mex = 0.25 * (a + b + jnp.roll(a, -1, axis=1)
                      + jnp.roll(b, -1, axis=1))
        a, b = eyw[:tk], eyw[1:]
        a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
        b_i = jnp.where(last_lane, zr, jnp.roll(b, -1, axis=2))
        mey = 0.25 * (a + a_i + b + b_i)
        a = ezw[:tk]
        a_j = jnp.roll(a, -1, axis=1)
        a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
        a_ji = jnp.where(last_lane, zr, jnp.roll(a_j, -1, axis=2))
        mez = 0.25 * (a + a_j + a_i + a_ji)
        kv = jax.lax.broadcasted_iota(jnp.int32, (tk, 1, 1), 0) + g * tk
        m = (kv < K) & jm_j
        incs = []
        for fi in range(nf):
            cw = wts_ref[0, fi]
            sw = wts_ref[0, nf + fi]
            for me in (mex, mey, mez):
                mm = jnp.where(m, me, zr)
                incs.append(cw * mm)
                incs.append((-sw) * mm)
        odacc[:] = dacc_ref[:] + jnp.stack(incs)

    inner = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[e_win] * 3 + [wts_smem, dacc_blk],
        out_specs=[dacc_blk],
        out_shape=(dacc_shape,),
        input_output_aliases={} if interpret else {4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(ex, ey, ez, wts, dacc):
        return inner(ex, ey, ez, wts, dacc)[0]

    return call


def make_stream_dft_chunk_runner(p: Params, coefs: UpdateCoefs, dft,
                                 accumulate_power: bool = False,
                                 interpret: bool | None = None):
    """Monitored streaming chunk runner (r4, VERDICT r3 #2): in-kernel
    DFT phasor accumulation at streaming speed instead of the ~20x xla
    scan every monitored run paid in r3.

    ``run(st, (ts, amps, cw, sw), power, dft_acc) ->
    (st, power, dft_acc, None)`` — the monitored-chunk contract of
    monitors.make_monitored_chunk_runner, so the runner wires both
    identically.  ``dft_acc`` is the canonical (re, im) pair
    (dft.zero_dft_acc); it rides the sweep in the stacked storage
    layout and is cropped back at the chunk boundary.  Odd trailing
    steps run the two-pass kernel with the canonical jnp accumulation
    (bit-identical cell means via diagnostics.e_cell_means_stripped).
    fields='e', computation mode, full-plane plans only (pick_plan)."""
    import os as _os

    from .. import diagnostics
    from ..dft import accumulate as dft_accumulate
    from ..step import make_step
    from .pallas_temporal import D as _D

    nf = dft.nf
    assert dft.fields == "e", "in-kernel DFT carries E phasors only"
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None \
            else (jax.default_backend() != "tpu")
    plan_ = pick_plan(p, coefs, sar=accumulate_power, dft_nf=nf)
    if plan_ is None:
        raise NotImplementedError(
            "no VMEM-feasible streaming DFT plan for this config"
        )
    s, nj = plan_
    assert nj == 1
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    inplace = _os.environ.get("FDTD_STREAM_INPLACE", "1") != "0"
    call, nd = build_stream_call(p, coefs, interpret, s=s,
                                 sar=accumulate_power, nj=1,
                                 inplace=inplace, dft_nf=nf)
    odd_step = make_step(p, coefs=coefs, backend="pallas_fused")
    S, J1, Ib = dims(p)
    K, J = p.maxk, p.maxj
    dtype = jnp.dtype(p.dtype)
    plan = make_source_plan(p)
    f_h32 = jnp.float32(coefs.h_factor)
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, J1, Ib), dtype)
    dt_step = p.time_step

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        npj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (npj, ni))

    def inject_state(st: StrippedState, pv) -> StrippedState:
        zero = jnp.zeros_like(pv).astype(dtype)
        sl = (D, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
        return dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
        )

    def group_step(st, acc, dacc, xs_group):
        ts_g, amps_g, cw_g, sw_g = xs_group
        st = inject_state(st, drive_patch(amps_g[0]))
        sl = (slice(0, nd), slice(plan.j0, plan.j1),
              slice(plan.i0, plan.i1))
        pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
        de2 = jnp.asarray(zero_drv).at[sl].set(pvs.astype(dtype))
        dh2 = jnp.asarray(zero_drv).at[sl].set(
            (-plan.inv_z_te * pvs).astype(dtype))
        wts = jnp.concatenate([cw_g, sw_g], axis=1)  # (s, 2*nf)
        coef6 = ((st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
                 if lossy else ())
        outs = call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, de2, dh2, *coef6,
            hf=(st.hf_x, st.hf_y, st.hf_z) if het else (),
            sigma=st.sigma_c if accumulate_power else None,
            acc=acc, wts=wts, dacc=dacc,
        )
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc, dacc = outs
        else:
            ex, ey, ez, hx, hy, hz, dacc = outs
        ey_s2 = st.ey_s[:, :, 0]
        ez_s2 = st.ez_s[:, :, 0]
        sl2 = (slice(D, D + K), slice(0, J))
        curl = (ey_s2[D + 1 : D + K + 1, :J] - ey_s2[sl2]) - (
            ez_s2[D : D + K, 1 : J + 1] - ez_s2[sl2]
        )
        hx_s = st.hx_s
        for _ in range(s):
            hx_s = hx_s.at[sl2[0], sl2[1], 0].add(
                (f_h32 * curl).astype(st.hx_s.dtype))
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy,
                                 hz=hz, hx_s=hx_s)
        return st, acc, dacc

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(st, xs, power_acc, dft_acc):
        ts, amps, cw, sw = xs
        n = ts.shape[0]
        n_grp = n // s
        dacc_st = embed_dft_acc(p, dft_acc, nf)
        acc_st = None
        if accumulate_power:
            from .pallas_temporal import embed_power_acc

            acc_st = embed_power_acc(p, power_acc, 1)
        if n_grp:
            gxs = (ts[: s * n_grp].reshape(n_grp, s),
                   amps[: s * n_grp].reshape(n_grp, s),
                   cw[: s * n_grp].reshape(n_grp, s, nf),
                   sw[: s * n_grp].reshape(n_grp, s, nf))

            def body(c, x):
                st, acc, dacc = c
                return group_step(st, acc, dacc, x), None

            (st, acc_st, dacc_st), _ = jax.lax.scan(
                body, (st, acc_st, dacc_st), gxs
            )
        dft_acc = crop_dft_acc(p, dacc_st, nf)
        if accumulate_power:
            from .pallas_temporal import crop_power_acc

            power_acc = crop_power_acc(p, acc_st, 1)
        for r in range(n % s):
            idx = s * n_grp + r
            st = odd_step(st, (ts[idx], amps[idx]))
            means = diagnostics.e_cell_means_stripped(p, st)
            dft_acc = dft_accumulate(p, means, cw[idx], sw[idx], dft_acc)
            if accumulate_power:
                sg = st.sigma_c[_D : _D + K, :J]
                inc = diagnostics.power_deposition_stripped(p, st, sg)
                power_acc = power_acc + (inc * dt_step).astype(
                    power_acc.dtype)
        return st, power_acc, dft_acc, None

    return run


def pick_shard_plan(p: Params, coefs: UpdateCoefs, Klp: int,
                    sar: bool = False,
                    dft_nf: int = 0) -> tuple[int, int] | None:
    """(steps-per-sweep, j-tiles) for the SHARDED streaming pipeline.

    The per-shard sweep runs over [D - s, D + Klp + s): the dead slab and
    top pad host s-row halo bands (imported by ppermute before each sweep)
    and the skewed pipeline's triangular validity — level m correct from
    halo row -s + m — makes level s exactly cover the shard's own rows,
    with zero recompute.  Corr/coef Element windows start at array row
    D - 2s, so configs that carry them (validation corr; lossy ca/cb)
    need s <= D/2 = 4; computation-mode vacuum has no windows and runs
    s = 8.  SAR composes (r3): sigma rides a per-shard slab (neighbor
    halo rows baked), the accumulator's own blocks trail the fields by
    one more step (one extra drain step), and the bottom-halo acc block
    collects the invalid halo-ramp contributions and is cropped away.

    ``nj`` > 1 j-tiles each shard's sweep exactly like the single-chip
    j-tiled plan (grid (nj, nb), k inner, HJ-column halo recompute per
    tile side) — 1-D z sharding shrinks k only, so a 512^3-class J still
    busts full-plane VMEM per shard; without this the multi-chip default
    silently fell back to the slower temporal/two-pass sharded paths at
    exactly the grid sizes sharding exists for.  A deep j-tiled sweep
    beats a shallow full-plane one (measured single-chip, DESIGN.md), so
    candidates are ranked s-major."""
    gates = _shard_config_gates(p, coefs, sar)
    if gates is None:
        return None
    lossy, het, windows = gates
    _, J1, _ = dims(p)
    for s in ((TS // 2, TS // 4) if windows else (TS, TS // 2, TS // 4)):
        if D % s or Klp % s or Klp // s < 1:
            continue
        for nj in (1, 2, 3, 4, 6, 8, 12, 16):
            if nj > 1:
                if s > HJ or dft_nf:
                    continue  # in-kernel DFT is full-plane only
                tj, _ = jt_extents(p, nj)
                if tj <= 2 * HJ or (nj - 1) * tj >= J1:
                    continue  # degenerate tiling (tiny grids / over-split)
            if (
                stream_vmem_estimate(p, s=s, lossy=lossy, sar=sar, nj=nj,
                                     het=het, dft_nf=dft_nf)
                <= VMEM_BUDGET
                - (0 if sar or dft_nf else 6 * 1024 * 1024)
            ):
                return s, nj
    return None


def pick_shard_s(p: Params, coefs: UpdateCoefs, Klp: int) -> int | None:
    """Steps-per-sweep of the best sharded plan (see pick_shard_plan)."""
    plan = pick_shard_plan(p, coefs, Klp)
    return plan[0] if plan else None


def _shard_config_gates(p: Params, coefs: UpdateCoefs, sar: bool):
    """Shared material-class gates of the sharded stream pickers.

    Returns ``(lossy, het, windows)`` or None when the config can't run
    a sharded streaming sweep at any depth: lossy media serve
    computation mode only, a non-vacuum scalar ca has no kernel, and
    SAR without dissipation is meaningless.  Both pick_shard_plan and
    pick_shard_2d_s consume this — a new gate added here covers 1-D and
    2-D routing at once."""
    het = coefs.heterogeneous_mu
    lossy = not isinstance(coefs.ca_x, (int, float))
    if lossy:
        if p.mode != Mode.COMPUTATION:
            return None
    elif coefs.ca_x != 1.0:
        return None
    if sar and not lossy:
        return None  # vacuum has no dissipation
    windows = lossy or het or p.mode != Mode.COMPUTATION
    return lossy, het, windows


def pick_shard_2d_s(p: Params, coefs: UpdateCoefs, Klp: int,
                    Jt_sh: int, sar: bool = False) -> int | None:
    """Steps-per-sweep for the 2-D (z x y) sharded streaming sweep.

    Same config gates as pick_shard_plan; additionally s <= the DJ2 = 8
    j halo slots per side (the j bands are exchanged like the k bands and
    the same triangular validity covers the shard's own rows).  No
    j-tiling — per-shard j is already ~J/ny.  SAR needs one extra halo
    row per side (s + 1 <= DJ2): the level-m cell-center mean reads E^m
    at j+1, so the row just above the shard's own rows must stay exact
    through level s."""
    from ..parallel.sharded_fast import DJ2

    gates = _shard_config_gates(p, coefs, sar)
    if gates is None:
        return None
    lossy, het, windows = gates
    bj_extra = 1 if sar else 0
    for s in ((TS // 2, TS // 4) if windows else (TS, TS // 2, TS // 4)):
        if D % s or Klp % s or Klp // s < 1 or s + bj_extra > DJ2:
            continue
        if (
            stream_vmem_estimate(p, s=s, lossy=lossy, het=het, sar=sar,
                                 rows=Jt_sh)
            <= VMEM_BUDGET - (0 if sar else 6 * 1024 * 1024)
        ):
            return s
    return None


def build_stream_shard_call(p: Params, coefs: UpdateCoefs, S_sh: int,
                            Klp: int, s: int, interpret: bool, nj: int = 1,
                            sar: bool = False, J_rows: int | None = None,
                            joff2: bool = False, dft_nf: int = 0):
    """Streaming sweep pallas_call on a per-shard slab (see pick_shard_plan).

    Same caller contract as build_stream_call (koff carries the shard's
    global-k offset r*Klp - s); operands are (S_sh, J1, Ib) local slabs
    whose halo bands the caller refreshed via ppermute.  ``nj`` > 1:
    operands in the j-extended layout (pallas_temporal.jextend applied to
    the per-shard slabs — j is unsharded, so the extension is uniform
    across shards); grid (nj, nb), k INNER, same window calculus as the
    single-chip j-tiled sweep.

    ``J_rows``/``joff2`` (2-D z x y sharding): operands carry J_rows
    local j rows (DJ2 halo slots each side, exchanged like the k bands)
    and koff becomes a (1, 2) (k, j) global-offset pair — the j validity
    is the same triangular argument as k, with s <= DJ2 halo rows making
    level s exact on the shard's own j rows."""
    _, J1, Ib = dims(p)
    if J_rows is not None:
        J1 = J_rows
    W = corr_width(Ib)
    tk = s
    b0 = (D - s) // tk          # pipeline base block (halo bottom)
    assert D % tk == 0 and Klp % tk == 0 and S_sh % tk == 0
    nb = Klp // tk + 2          # own blocks + both halo blocks
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    f_h = compute_dtype.type(coefs.h_factor)
    f_e = compute_dtype.type(0.0) if lossy else compute_dtype.type(coefs.cb_x)
    patch = None
    dwin = None
    if p.mode == Mode.COMPUTATION:
        plan = make_source_plan(p)
        patch = (plan.j0, plan.j1, plan.i0, plan.i1)
        if nj == 1 and not joff2:
            row0 = plan.j0 // 8 * 8
            dwin = (row0, min(-(-(plan.j1 - row0) // 8) * 8, J1 - row0))
    use_corr = p.mode != Mode.COMPUTATION
    if (use_corr or lossy or het) and D - 2 * s < 0:
        raise NotImplementedError("corr/coef/hf windows need s <= D/2")
    nd = max(s - 1, 1)

    if nj > 1:
        assert not joff2, "j-tiling and 2-D j sharding are exclusive"
        assert dft_nf == 0, "sharded in-kernel DFT is full-plane only"
        return _build_stream_shard_call_jt(
            p, S_sh, s, interpret, nj, J1, Ib, W, tk, b0, nb, dtype,
            compute_dtype, lossy, f_h, f_e, patch, use_corr, nd, sar, het)
    if dft_nf:
        assert not joff2, "sharded in-kernel DFT needs a 1-D z mesh"
        assert p.mode == Mode.COMPUTATION, "in-kernel DFT: computation mode"

    bulk_shape = jax.ShapeDtypeStruct((S_sh, J1, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S_sh, J1, Ib), jnp.float32)
    dacc_shape = jax.ShapeDtypeStruct((6 * dft_nf, S_sh, J1, Ib),
                                      jnp.float32)
    # SAR/DFT: one extra drain step emits the final own acc block (the
    # accumulators trail the fields by one more block in the schedule)
    grid = (nb + (1 if sar or dft_nf else 0),)

    in_blk = pl.BlockSpec(
        (tk, J1, Ib), lambda g: (jnp.minimum(g, nb - 1) + b0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # level-s output of step g is input block g-1; blocks below validity
    # (g < 2) zero the bottom halo block, refreshed by the next exchange
    out_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (jnp.maximum(g - 1, 0) + b0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # corr/coef windows cover every level's rows [L0-s, L0+tk); with
    # s <= D/2 the g=0 start D-2s >= 0 and the g=nb-1 end lands exactly
    # at S_sh (real pad rows)
    c_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(W)),
        lambda g: ((g + b0 + 1) * tk - 2 * s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + b0 + 1) * tk - 2 * s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    drv_rows = dwin[1] if dwin is not None else J1
    drv_spec = pl.BlockSpec((nd, drv_rows, Ib), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 2 if joff2 else 1), lambda g: (0, 0),
                        memory_space=pltpu.SMEM)

    # SAR (r3): sigma tiles follow the input blocks; the acc in/out tiles
    # trail by two (cell block g-2 completes at step g) — g < 3 visits
    # clamp to the bottom halo acc block, which collects the invalid
    # halo-ramp contributions, is zeroed, and is cropped by the caller
    sg_blk = pl.BlockSpec(
        (tk, J1, Ib), lambda g: (jnp.minimum(g, nb - 1) + b0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    acc_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (jnp.clip(g - 2, 0, nb - 1) + b0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # in-kernel DFT (r5, sharded): per-sweep weights in SMEM + the
    # stacked 4-D phasor accumulator tiles on the SAR acc schedule
    wts_smem = pl.BlockSpec((s, 2 * dft_nf), lambda g: (0, 0),
                            memory_space=pltpu.SMEM)
    dacc_blk = pl.BlockSpec(
        (6 * dft_nf, tk, J1, Ib),
        lambda g: (0, jnp.clip(g - 2, 0, nb - 1) + b0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = (
        [smem] + [in_blk] * 6
        + ([c_win] * 2 if use_corr else [])
        + ([drv_spec] * 2 if patch is not None else [])
        + ([coef_win] * 6 if lossy else [])
        + ([coef_win] * 3 if het else [])
        + ([sg_blk, acc_blk] if sar else [])
        + ([wts_smem, dacc_blk] if dft_nf else [])
    )
    n_in = len(in_specs)
    # in-place (r3): same race-free argument as the single-chip sweep —
    # the write frontier (block g-1+b0) trails the read frontier (g+b0)
    # by one block; at g=0 in and out are the SAME bottom-halo block,
    # the read-before-write-within-a-step aliased pattern (and its value
    # is dead anyway: the next exchange refreshes it before any read).
    # Halves per-shard HBM and measured ~1.4x faster single-chip.
    import os as _os

    inplace = (not interpret
               and _os.environ.get("FDTD_STREAM_INPLACE", "1") != "0")
    aliases = {i + 1: i for i in range(6)} if inplace else {}
    if sar and not interpret:
        aliases[n_in - (3 if dft_nf else 1)] = 6
    if dft_nf and not interpret:
        aliases[n_in - 1] = 6 + (1 if sar else 0)
    tail = pltpu.VMEM((s + 1, J1, Ib), compute_dtype)
    scratch = [tail] * 6 + (
        [pltpu.VMEM((3 * tk, J1, Ib), jnp.float32),
         pltpu.VMEM((2 * tk, J1, Ib), jnp.float32)]
        if sar else []
    ) + (
        [pltpu.VMEM((6 * dft_nf, 3 * tk, J1, Ib), jnp.float32)]
        if dft_nf else []
    )
    inner = pl.pallas_call(
        functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, s, use_corr,
                          lossy, sar, p.time_step, dwin, nb - 1, True, None,
                          False, het, joff2, dft_nf),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_blk] * 6 + ([acc_blk] if sar else [])
        + ([dacc_blk] if dft_nf else []),
        out_shape=(bulk_shape,) * 6 + ((acc_shape,) if sar else ())
        + ((dacc_shape,) if dft_nf else ()),
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *coef6,
             hf=(), sigma=None, acc=None, wts=None, dacc=None):
        args = [koff, ex, ey, ez, hx, hy, hz]
        if use_corr:
            args += [chy, chz]
        if patch is not None:
            if dwin is not None:
                row0, rows_w = dwin
                de2 = de2[:, row0 : row0 + rows_w]
                dh2 = dh2[:, row0 : row0 + rows_w]
            args += [de2, dh2]
        if lossy:
            args += list(coef6)
        if het:
            args += list(hf)
        if sar:
            args += [sigma, acc]
        if dft_nf:
            args += [wts, dacc]
        return inner(*args)

    return call, nd


def _build_stream_shard_call_jt(p, S_sh, s, interpret, nj, J1, Ib, W, tk,
                                b0, nb, dtype, compute_dtype, lossy, f_h,
                                f_e, patch, use_corr, nd, sar=False,
                                het=False):
    """j-tiled sharded streaming sweep: grid (nj, nb), k inner.

    The k calculus is the sharded full-plane sweep's (block g + b0 in,
    max(g-1, 0) + b0 out, two steps of bottom-halo ramp); the j calculus
    is the single-chip j-tiled sweep's (tjw-row Element windows at
    jb*tj + DJ - HJ, interior-only emits, HJ-column halo recompute,
    global-j masks via joff).  In-place aliasing composes with the same
    pre-copied read-only lower-halo band operands as single-chip
    (_build_stream_call_jt): tile jb-1 finishes its whole k sweep before
    tile jb starts, so every k block's lower-halo rows are overwritten by
    the time tile jb reads them — the caller's pre-sweep band copies are
    the pristine values."""
    tj, Jt = jt_extents(p, nj)
    tjw = tj + 2 * HJ
    bulk_shape = jax.ShapeDtypeStruct((S_sh, Jt, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S_sh, Jt, Ib), jnp.float32)
    grid = (nj, nb + (1 if sar else 0))

    def jstart(jb):
        return pl.multiple_of(jb * tj + DJ - HJ, 8)

    in_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nb - 1) + b0) * tk, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    out_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
        lambda jb, g: (
            (jnp.maximum(g - 1, 0) + b0) * tk,
            pl.multiple_of(jb * tj + DJ, 8),
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    c_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(tjw), pl.Element(W)),
        lambda jb, g: ((g + b0 + 1) * tk - 2 * s, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((g + b0 + 1) * tk - 2 * s, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    drv_spec = pl.BlockSpec(
        (pl.Element(nd), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: (0, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda jb, g: (0, 0),
                        memory_space=pltpu.SMEM)
    band_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(HJ), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nb - 1) + b0) * tk,
                       jnp.maximum(jb - 1, 0) * HJ, 0),
        memory_space=pltpu.VMEM,
    )
    # SAR x jt x sharding (r3): sigma windows follow the input tiles, acc
    # in/out tiles are tile interiors trailing by two k blocks (see the
    # full-plane sharded variant for the k schedule, the single-chip jt
    # variant for the tile-interior argument)
    sg_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nb - 1) + b0) * tk, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    acc_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
        lambda jb, g: (
            (jnp.clip(g - 2, 0, nb - 1) + b0) * tk,
            pl.multiple_of(jb * tj + DJ, 8),
            0,
        ),
        memory_space=pltpu.VMEM,
    )

    import os as _os

    # band splice exercised everywhere (interpret included); the aliasing
    # itself is real-hardware-only — same gating as _build_stream_call_jt
    inplace = _os.environ.get("FDTD_STREAM_INPLACE", "1") != "0"
    in_specs = (
        [smem] + [in_win] * 6
        + ([c_win] * 2 if use_corr else [])
        + ([drv_spec] * 2 if patch is not None else [])
        + ([coef_win] * 6 if lossy else [])
        + ([coef_win] * 3 if het else [])
        + ([sg_win, acc_win] if sar else [])
        + ([band_win] * 6 if inplace else [])
    )
    n_in = len(in_specs)
    aliases = {i + 1: i for i in range(6)} if inplace and not interpret else {}
    if sar and not interpret:
        aliases[n_in - 7 if inplace else n_in - 1] = 6
    tail = pltpu.VMEM((s + 1, tjw, Ib), compute_dtype)
    scratch = [tail] * 6 + (
        [pltpu.VMEM((3 * tk, tjw, Ib), jnp.float32),
         pltpu.VMEM((2 * tk, tjw, Ib), jnp.float32)]
        if sar else []
    )
    inner = pl.pallas_call(
        functools.partial(_kernel, p, f_h, f_e, patch, Ib, W, s, use_corr,
                          lossy, sar, p.time_step, None, nb - 1, True, tj,
                          inplace, het, False, 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_win] * 6 + ([acc_win] if sar else []),
        out_shape=(bulk_shape,) * 6 + ((acc_shape,) if sar else ()),
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *coef6,
             hf=(), sigma=None, acc=None):
        args = [koff, ex, ey, ez, hx, hy, hz]
        if use_corr:
            args += [chy, chz]
        if patch is not None:
            args += [de2, dh2]
        if lossy:
            args += list(coef6)
        if het:
            args += list(hf)
        if sar:
            args += [sigma, acc]
        if inplace:
            args += [
                jnp.concatenate(
                    [jax.lax.slice_in_dim(f, b * tj + DJ - HJ, b * tj + DJ,
                                          axis=1)
                     for b in range(1, nj)],
                    axis=1,
                )
                for f in (ex, ey, ez, hx, hy, hz)
            ]
        return inner(*args)

    return call, nd
