"""ADE Debye dispersion on the Pallas kernel tier (r4, VERDICT r3 #1).

Round 3 left the *physically correct* heating chain (``--dispersive
--sar``) on the pure-jnp ADE scan (~2.4 G-class) while the approximate
quasi-static chain streamed at 24-39 G.  This module closes that cliff:
the ADE E-update is the same stencil as the lossy update plus three
polarization arrays and extra coefficient streams —

    E' = ca E + cb curlH + cp P
    P' = k1 P + k2 (E' + E)

(:mod:`fdtd_tpu.ops.dispersive`, which reduces exactly to the lossy
update at d_eps = 0, reference main.c:469-500) — so it rides the exact
mechanisms round 3 built for lossy media:

- **two-pass tier** (this file, ``make_dispersive_fused_chunk_runner``):
  the H pass is the unchanged vacuum ``_h_kernel2``; the ADE E pass is a
  Blocked in-place kernel over E, P, and the five coefficient maps per
  component, aliased like the lossy E pass.  With SAR, the kernel also
  emits the three edge-located trapezoidal work arrays
  w = E_mid (dP/dt + sigma E_mid) (the TRUE Debye dissipation), which
  the caller cell-centers and accumulates in XLA with the exact slice
  association of :func:`fdtd_tpu.ops.dispersive.work_cell_means`.
- **streaming tier** (``pallas_stream_ade``): see
  :func:`make_dispersive_stream_step` below — P joins the skewed
  pipeline with its own per-level tails, the 15 coefficient maps stream
  as (tk+s)-row Element windows like r3's lossy ca/cb, and the SAR work
  accumulates into the rolling band like r3's sigma|E|^2 band.

Parity: bit-exact vs the xla ADE scan in fp32 (same expressions, same
association); bf16 storage computes in fp32 in-kernel (bit-class).
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
from ..state import UpdateCoefs
from .dispersive import DebyeMaterials, debye_coefs
from .pallas_fused import (
    D,
    StrippedState,
    advance_hx_strip,
    build_twopass_calls,
    dims,
    embed_coef,
    make_inject_source,
    to_stripped,
)
from .pallas_temporal import DJ, HJ, jt_extents

COMPS = ("x", "y", "z")
COEF_NAMES = ("ca", "cb", "cp", "k1", "k2")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "px", "py", "pz",
        "ca_x", "ca_y", "ca_z", "cb_x", "cb_y", "cb_z",
        "cp_x", "cp_y", "cp_z", "k1_x", "k1_y", "k1_z",
        "k2_x", "k2_y", "k2_z", "sg_x", "sg_y", "sg_z",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class AdeState:
    """Dispersive extras riding the scan carry next to the StrippedState:
    three polarization bulks (storage layout, field dtype; P at the
    PEC-frozen strip/boundary edges is identically zero and is not
    stored) plus the 15 embedded ADE coefficient maps and — for SAR —
    the three edge-averaged DC-sigma maps.  Constants ride in the carry,
    not as closure captures (HLO-constant compile bloat, r3)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    ca_x: jax.Array
    ca_y: jax.Array
    ca_z: jax.Array
    cb_x: jax.Array
    cb_y: jax.Array
    cb_z: jax.Array
    cp_x: jax.Array
    cp_y: jax.Array
    cp_z: jax.Array
    k1_x: jax.Array
    k1_y: jax.Array
    k1_z: jax.Array
    k2_x: jax.Array
    k2_y: jax.Array
    k2_z: jax.Array
    sg_x: jax.Array | None = None
    sg_y: jax.Array | None = None
    sg_z: jax.Array | None = None

    def coef18(self, sar: bool):
        out = [getattr(self, f"{n}_{c}") for n in COEF_NAMES for c in COMPS]
        if sar:
            out += [self.sg_x, self.sg_y, self.sg_z]
        return tuple(out)


_FILL = {"ca": 1.0, "cb": 0.0, "cp": 0.0, "k1": 1.0, "k2": 0.0, "sig": 0.0}


def make_ade_state(p: Params, dm: DebyeMaterials, sar: bool,
                   pol=None) -> AdeState:
    """Embed the :func:`fdtd_tpu.ops.dispersive.debye_coefs` maps and the
    (resumed or zero) canonical polarization into the storage layout."""
    dc = debye_coefs(p, dm)
    S, J1p, Ib = dims(p)
    K1, J1, _ = p.padded_shape
    dtype = jnp.dtype(p.dtype)

    def embp(a):
        out = jnp.zeros((S, J1p, Ib), dtype)
        return out.at[D : D + K1, :J1].set(jnp.asarray(a, dtype)[:, :, :Ib])

    kw = {}
    for name, fill_key in (("ca", "ca"), ("cb", "cb"), ("cp", "cp"),
                           ("k1", "k1"), ("k2", "k2")):
        for c in COMPS:
            kw[f"{name}_{c}"] = embed_coef(p, getattr(dc, name)[c],
                                           _FILL[fill_key])
    if sar:
        for c in COMPS:
            kw[f"sg_{c}"] = embed_coef(p, dc.sig[c], 0.0)
    if pol is None:
        # three distinct buffers: the chunk runner donates the carry, and
        # three leaves aliasing ONE buffer cannot all be donated
        kw["px"] = jnp.zeros((S, J1p, Ib), dtype)
        kw["py"] = jnp.zeros((S, J1p, Ib), dtype)
        kw["pz"] = jnp.zeros((S, J1p, Ib), dtype)
    else:
        kw["px"], kw["py"], kw["pz"] = (embp(a) for a in pol)
    return AdeState(**kw)


def extract_pol(p: Params, ade: AdeState):
    """Storage-layout P -> the canonical (K1, J1, I1) checkpoint layout
    (the xla path's zero_polarization shapes; the i = maxi column and
    pads are identically zero — P only ever updates where E does)."""
    S, J1p, Ib = dims(p)
    K1, J1, I1 = p.padded_shape

    def ext(a):
        out = jnp.zeros((K1, J1, I1), a.dtype)
        return out.at[:, :, :Ib].set(a[D : D + K1, :J1])

    return ext(ade.px), ext(ade.py), ext(ade.pz)


def tile_k_ade(p: Params, sar: bool) -> int:
    """Largest k-tile whose ADE E-pass VMEM footprint fits: per tile the
    pass streams 3 H windows (tk+1 rows), 6 E/P blocks, 15 coefficient
    blocks [+3 sigma blocks and 3 fp32 work outputs], double-buffered."""
    _, J1, Ib = dims(p)
    item = jnp.dtype(p.dtype).itemsize
    row = ((J1 + 7) // 8 * 8) * ((Ib + 127) // 128 * 128)
    budget = 100 * 1024 * 1024
    for tk in (8, 4, 2, 1):
        rows = 3 * (tk + 1) + (6 + 15 + (3 if sar else 0)) * tk
        need = 2 * rows * row * item
        if sar:
            need += 2 * 3 * tk * row * 4  # fp32 work outputs
        if need <= budget:
            return tk
    return 1


def _e_kernel_ade(p: Params, Ib, tk, sar, dt_step,
                  koff_ref, hx_ref, hy_ref, hz_ref,
                  ex_ref, ey_ref, ez_ref, px_ref, py_ref, pz_ref,
                  *rest):
    """ADE E half-step on slab g+1 (same window calculus and masks as
    pallas_fused._e_kernel2; cites reference main.c:469-500 through
    ops/dispersive.update_e_ade).  Writes E and P in place; with ``sar``
    additionally writes the three edge work arrays (fp32)."""
    ncoef = 18 if sar else 15
    coef = rest[:ncoef]
    outs = rest[ncoef:]
    oex, oey, oez, opx, opy, opz = outs[:6]
    if sar:
        owx, owy, owz = outs[6:9]
    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    L = g * tk + koff_ref[0, 0]
    joff = koff_ref[0, 1]

    st = ex_ref.dtype
    cd = jnp.float32 if st == jnp.bfloat16 else st
    hxw, hyw, hzw = hx_ref[:].astype(cd), hy_ref[:].astype(cd), hz_ref[:].astype(cd)
    exb, eyb, ezb = ex_ref[:].astype(cd), ey_ref[:].astype(cd), ez_ref[:].astype(cd)
    pxb, pyb, pzb = px_ref[:].astype(cd), py_ref[:].astype(cd), pz_ref[:].astype(cd)

    hx0, hx_m1 = hxw[1:], hxw[:tk]
    hy0, hy_m1 = hyw[1:], hyw[:tk]
    hz0 = hzw[1:]

    shape = exb.shape
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + L
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + joff
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

    hz_my = jnp.roll(hz0, 1, axis=1)
    hz_mx = jnp.roll(hz0, 1, axis=2)
    hy_mx = jnp.roll(hy0, 1, axis=2)
    hx_my = jnp.roll(hx0, 1, axis=1)

    m_ex = (gk >= 1) & (gk < K) & (jj >= 1) & (jj < J)
    m_ey = (gk >= 1) & (gk < K) & (jj < J) & (ii >= 1)
    m_ez = (gk < K) & (jj >= 1) & (jj < J) & (ii >= 1)
    curls = (
        (hz0 - hz_my) - (hy0 - hy_m1),
        (hx0 - hx_m1) - (hz0 - hz_mx),
        (hy0 - hy_mx) - (hx0 - hx_my),
    )
    cfs = [r[:].astype(cd) for r in coef]
    ca = cfs[0:3]
    cb = cfs[3:6]
    cp = cfs[6:9]
    k1 = cfs[9:12]
    k2 = cfs[12:15]
    if sar:
        sg = cfs[15:18]
        dt_f = jnp.asarray(dt_step, cd)

    for ci, (m, e_old, p_old, oe, op) in enumerate((
        (m_ex, exb, pxb, oex, opx),
        (m_ey, eyb, pyb, oey, opy),
        (m_ez, ezb, pzb, oez, opz),
    )):
        en = ca[ci] * e_old + cb[ci] * curls[ci] + cp[ci] * p_old
        pn = k1[ci] * p_old + k2[ci] * (en + e_old)
        if sar:
            e_mid = 0.5 * (en + e_old)
            w = e_mid * ((pn - p_old) / dt_f + sg[ci] * e_mid)
            (owx, owy, owz)[ci][:] = jnp.where(
                m, w, jnp.zeros((), cd)
            ).astype(jnp.float32)
        oe[:] = jnp.where(m, en, e_old).astype(st)
        op[:] = jnp.where(m, pn, p_old).astype(st)


def build_ade_e_call(p: Params, S: int, nk: int, interpret: bool,
                     sar: bool, tk: int | None = None,
                     J_rows: int | None = None):
    """The ADE E-pass pallas_call for an arbitrary storage layout (the
    sharded composition reuses it with per-shard S/nk, like
    pallas_fused.build_twopass_calls)."""
    _, J1, Ib = dims(p)
    if J_rows is not None:
        J1 = J_rows
    if tk is None:
        tk = tile_k_ade(p, sar)
    ofs = D // tk
    dtype = jnp.dtype(p.dtype)
    bulk = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    wshape = jax.ShapeDtypeStruct((S, J1, Ib), jnp.float32)

    blk = pl.BlockSpec((tk, J1, Ib), lambda g: (g + ofs, 0, 0),
                       memory_space=pltpu.VMEM)
    h_dn = pl.BlockSpec(
        (pl.Element(tk + 1, (0, 0)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((g + ofs) * tk - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM)
    cp_ = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    ncoef = 18 if sar else 15
    # E and P alias their outputs (in-place); work outputs are fresh
    aliases = {} if interpret else {i + 4: i for i in range(6)}
    call = pl.pallas_call(
        functools.partial(_e_kernel_ade, p, Ib, tk, sar, p.time_step),
        grid=(nk,),
        in_specs=[smem] + [h_dn] * 3 + [blk] * 6 + [blk] * ncoef,
        out_specs=[blk] * 6 + ([blk] * 3 if sar else []),
        out_shape=(bulk,) * 6 + ((wshape,) * 3 if sar else ()),
        input_output_aliases=aliases,
        compiler_params=cp_,
        interpret=interpret,
    )
    return call, tk


def work_cell_means_stripped(p: Params, wx, wy, wz):
    """Storage-layout work arrays -> the canonical (K, J, I) cell-centered
    dissipation rate, with the exact slice association of
    :func:`fdtd_tpu.ops.dispersive.work_cell_means` (work at the frozen
    strip / i = maxi edges is identically zero — those edges never
    update, so the missing column contributes exact zeros)."""
    K, J, I = p.maxk, p.maxj, p.maxi

    def col0(a):  # append one zero i-column (the strip edge, w == 0)
        return jnp.pad(a[D : D + K + 1, : J + 1], ((0, 0), (0, 0), (0, 1)))

    wxs, wys, wzs = col0(wx), col0(wy), col0(wz)
    kk, jj, ii = slice(0, K), slice(0, J), slice(0, I)
    k1s, j1s, i1s = slice(1, K + 1), slice(1, J + 1), slice(1, I + 1)
    mx = 0.25 * (wxs[kk, jj, ii] + wxs[k1s, jj, ii]
                 + wxs[kk, j1s, ii] + wxs[k1s, j1s, ii])
    my = 0.25 * (wys[kk, jj, ii] + wys[kk, jj, i1s]
                 + wys[k1s, jj, ii] + wys[k1s, jj, i1s])
    mz = 0.25 * (wzs[kk, jj, ii] + wzs[kk, j1s, ii]
                 + wzs[kk, jj, i1s] + wzs[kk, j1s, i1s])
    return mx + my + mz


def dispersive_fused_supported(p: Params) -> bool:
    """The dispersive Pallas tier serves computation mode in fp32/bf16
    (validation mode and fp64 stay on the xla ADE scan — same gating
    rationale as the lossy tiers, docs/DESIGN.md)."""
    return (p.mode == Mode.COMPUTATION
            and jnp.dtype(p.dtype) != jnp.float64)


def make_dispersive_fused_step(p: Params, dm: DebyeMaterials,
                               accumulate_power: bool = False,
                               interpret: bool | None = None):
    """``step((st, ade), (t, amp)) -> (st, ade)`` — one leapfrog step on
    the two-pass dispersive tier; with ``accumulate_power``
    ``step((st, ade), x, acc) -> (st, ade, acc)`` where acc is the
    canonical (K, J, I) fp32 accumulator of the TRUE Debye work."""
    if not dispersive_fused_supported(p):
        raise NotImplementedError(
            "dispersive Pallas tier needs computation mode and fp32/bf16"
        )
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None \
            else (jax.default_backend() != "tpu")
    S, J1, Ib = dims(p)
    dc = debye_coefs(p, dm)
    from ..constants import EPSILON

    f_e = p.time_step / (EPSILON * p.spatial_step)  # H-pass builder only
    hcoefs = UpdateCoefs(1.0, 1.0, 1.0, f_e, f_e, f_e,
                         float(np.asarray(dc.h_factor)))
    tk = tile_k_ade(p, accumulate_power)
    nk = (S - D) // tk
    h_call, _, _ = build_twopass_calls(p, hcoefs, S, nk, interpret, tk=tk)
    e_call, _ = build_ade_e_call(p, S, nk, interpret, accumulate_power,
                                 tk=tk)
    plan = make_source_plan(p)
    inject = make_inject_source(p, plan, jnp.dtype(p.dtype))
    f_h32 = jnp.float32(float(np.asarray(dc.h_factor)))
    zoff = np.zeros((1, 2), np.int32)
    dt_step = p.time_step

    def step(carry, x, acc=None):
        st, ade = carry
        _t, amp = x
        st = inject(st, amp)
        hx, hy, hz = h_call(jnp.asarray(zoff), st.ex, st.ey, st.ez,
                            st.hx, st.hy, st.hz, st.corr_hy, st.corr_hz)
        outs = e_call(jnp.asarray(zoff), hx, hy, hz,
                      st.ex, st.ey, st.ez, ade.px, ade.py, ade.pz,
                      *ade.coef18(accumulate_power))
        ex, ey, ez, px, py, pz = outs[:6]
        hx_s = advance_hx_strip(p, st, f_h32, het=False)
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez,
                                 hx=hx, hy=hy, hz=hz, hx_s=hx_s)
        ade = dataclasses.replace(ade, px=px, py=py, pz=pz)
        if accumulate_power:
            wx, wy, wz = outs[6:9]
            inc = work_cell_means_stripped(p, wx, wy, wz)
            acc = acc + (inc * dt_step).astype(acc.dtype)
            return (st, ade), acc
        return (st, ade)

    return step


def ade_stream_vmem_estimate(p: Params, s: int, sar: bool,
                             dft_nf: int = 0, nj: int = 1) -> int:
    """VMEM model of the streaming ADE sweep: double-buffered field + P
    in/out tiles, 15 coefficient Element windows of (tk+s) rows
    [+3 sigma windows, acc tiles] [+6*nf phasor tiles, r5], persistent
    fp32 tails for fields, P [and work], the rolling work band [and the
    6*nf rolling phasor bands], and ~3 levels of live fp32 values.
    Same modeling style as pallas_stream.stream_vmem_estimate (which
    reproduces Mosaic's allocations within a few percent)."""
    _, J1, Ib = dims(p)
    item = jnp.dtype(p.dtype).itemsize
    Ibp = -(-Ib // 128) * 128
    if nj > 1:
        tj, _ = jt_extents(p, nj)
        rows_w, rows_o = tj + 2 * HJ, tj  # window vs interior rows
    else:
        rows_w = rows_o = J1
    row = rows_w * Ibp
    row_o = rows_o * Ibp
    io = 2 * 9 * s * (row + row_o) * item        # 6 fields + 3 P, in+out
    io += 2 * 15 * (2 * s) * row * item          # coef Element windows
    if nj > 1:
        io += 2 * 9 * s * HJ * Ibp * item        # halo band windows
    if sar:
        io += 2 * 3 * (2 * s) * row * item       # sigma Element windows
        io += 2 * s * (row + row_o) * 4          # acc in/out fp32 tiles
    if dft_nf:
        io += 2 * 2 * 6 * dft_nf * s * row * 4   # phasor in/out tiles
    tails = (s + 1) * 9 * row * 4                # field + P fp32 tails
    if sar:
        tails += (s + 1) * 3 * row * 4           # work tails
        tails += 3 * s * row * 4                 # rolling work band
    if dft_nf:
        tails += 6 * dft_nf * 3 * s * row * 4    # rolling phasor bands
    live = 3 * 9 * (s + 1) * row * 4
    return io + tails + live


def pick_ade_plan(p: Params, sar: bool = False, dft_nf: int = 0):
    """Feasible (steps-per-sweep, j-tiles) for the streaming ADE sweep,
    or None (the two-pass tier then serves).  The 15 coefficient windows
    need s <= D/2 = 4 (window start D - 2s >= 0, the same bound as r3's
    lossy windows); candidates are s in {4, 2} at nj in {1, 2, 4, 8}
    (r5: the 9-band j-tiled in-place variant — 512^3-class bf16 grids
    whose full-plane planes bust VMEM now stream instead of silently
    falling to two-pass; the in-kernel DFT stays full-plane, like
    pallas_stream's).  256^3 bf16 closes full-plane at s=4, fp32 at
    s=2; 512^3 fp32 is HBM-infeasible outright (the 15 fp32
    coefficient maps alone are ~8 GB — see DESIGN.md)."""
    from .pallas_temporal import HBM_BUDGET, VMEM_BUDGET, state_bytes

    if not dispersive_fused_supported(p):
        return None
    S, J1, Ib = dims(p)
    item = jnp.dtype(p.dtype).itemsize
    # HBM: fields (in-place) + 3 P + 15 coef + [3 sig + fp32 acc]
    # [+ 6*nf fp32 phasor accumulators, r5]
    need = state_bytes(p) + (3 + 15 + (3 if sar else 0)) * S * J1 * Ib * item
    if sar:
        need += S * J1 * Ib * 4
    need += 6 * dft_nf * S * J1 * Ib * 4
    if 1.15 * need >= HBM_BUDGET:
        return None
    for s in (D // 2, D // 4):
        if D % s or (S - D) % s or (S - D) // s < 2:
            continue
        for nj in (1, 2, 4, 8):
            if nj > 1:
                if dft_nf or s > HJ:
                    continue  # in-kernel DFT is full-plane only
                tj, _ = jt_extents(p, nj)
                if tj <= 2 * HJ or (nj - 1) * tj >= J1:
                    continue  # degenerate tiling (tiny grids/over-split)
            if (ade_stream_vmem_estimate(p, s, sar, dft_nf, nj)
                    <= VMEM_BUDGET):
                return s, nj
    return None


def _kernel_ade_stream(p: Params, f_h, patch, Ib, s, sar, dt_step, nk,
                       dft_nf, jt, *refs):
    """Streaming ADE sweep step: advance all s levels by tk = s rows.

    The skewed pipeline of pallas_stream._kernel with the polarization
    joining it: P^m rides its own per-level tails (P is pointwise — the
    only non-local operand is curl H^m, whose rows the E half-step
    already stages), the 15 ADE coefficient maps stream as (tk+s)-row
    Element windows covering every level's E rows (like r3's lossy
    ca/cb), and with ``sar`` the TRUE Debye work
    w = E_mid (dP/dt + sigma E_mid) accumulates into the rolling
    3*tk-row band with the exact cell association of
    ops/dispersive.work_cell_means (w needs its own per-level tails:
    the cell mean at row r reads w rows r and r+1, which materialize at
    different grid steps).

    refs: koff, 6 field ins, de2, dh2, 3 P ins, 15 coef windows,
    [3 sigma windows, acc_in], [wts, dacc_in], [9 halo bands (jt)],
    6 field outs, 3 P outs, [acc out], [dacc out],
    scratch: 6 field tails, 3 P tails [+ 3 work tails, work band]
    [+ dft bands].

    Computation mode only (no corr windows), single-chip.  ``jt``
    (r5): j-tiled mode — grid (nj, nk + ofs), tile interior of jt rows;
    in-place aliasing corrupts each tile's lower j-halo before it runs,
    so the 9 pre-copied read-only band operands splice the pre-sweep
    halo rows (pallas_stream._build_stream_call_jt's mechanism, with P
    joining the fields — the "9 band operands" variant).
    """
    tk = s
    koff_ref = refs[0]
    ins = refs[1:7]
    de2_ref, dh2_ref = refs[7:9]
    pins = refs[9:12]
    idx = 12
    coef_refs = refs[idx : idx + 15]
    idx += 15
    if sar:
        sg_refs = refs[idx : idx + 3]
        accin_ref = refs[idx + 3]
        idx += 4
    if dft_nf:
        # in-kernel DFT (r5, VERDICT r4 #6): per-sweep (s, 2*nf) cos/sin
        # weights in SMEM + the stacked 4-D phasor accumulator tiles,
        # the exact mechanism of pallas_stream._kernel's dft_nf path
        wts_ref, daccin_ref = refs[idx : idx + 2]
        idx += 2
    if jt is not None:
        band_ins = refs[idx : idx + 9]
        idx += 9
    outs = refs[idx : idx + 6]
    pouts = refs[idx + 6 : idx + 9]
    idx += 9
    if sar:
        oacc = refs[idx]
        idx += 1
    if dft_nf:
        odacc = refs[idx]
        idx += 1
    tex, tey, tez, thx, thy, thz, tpx, tpy, tpz = refs[idx : idx + 9]
    idx += 9
    if sar:
        twx, twy, twz, accb = refs[idx : idx + 4]
        idx += 4
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
    K, J = p.maxk, p.maxj
    L0 = g * tk + koff_ref[0, 0]

    @pl.when(g == 0)
    def _init():
        z = jnp.zeros(tex.shape, tex.dtype)
        for t in (tex, tey, tez, thx, thy, thz, tpx, tpy, tpz):
            t[:] = z
        if sar:
            zf = jnp.zeros(twx.shape, jnp.float32)
            twx[:] = zf
            twy[:] = zf
            twz[:] = zf
            accb[:] = jnp.zeros(accb.shape, jnp.float32)
        if dft_nf:
            dbandr[:] = jnp.zeros(dbandr.shape, jnp.float32)

    st_dt = ins[0].dtype
    cd = jnp.float32 if st_dt == jnp.bfloat16 else st_dt
    if jt is not None:
        # splice the pre-copied halo band (this tile's pre-sweep lower
        # halo, overwritten in place by tile jb-1 by the time we run)
        # over the aliasing-corrupted window rows [0, HJ) — fields AND P
        cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz, \
            cur_px, cur_py, cur_pz = (
                jnp.concatenate([bi[:], r[:][:, HJ:]], axis=1).astype(cd)
                for bi, r in zip(band_ins, tuple(ins) + tuple(pins))
            )
    else:
        cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz = (
            r[:].astype(cd) for r in ins
        )
        cur_px, cur_py, cur_pz = (r[:].astype(cd) for r in pins)
    caw = [r[:].astype(cd) for r in coef_refs[0:3]]
    cbw = [r[:].astype(cd) for r in coef_refs[3:6]]
    cpw = [r[:].astype(cd) for r in coef_refs[6:9]]
    k1w = [r[:].astype(cd) for r in coef_refs[9:12]]
    k2w = [r[:].astype(cd) for r in coef_refs[12:15]]
    if sar:
        sgw = [r[:].astype(cd) for r in sg_refs]
        dt_f = jnp.asarray(dt_step, jnp.float32)

    de2 = de2_ref[:].astype(cd)
    dh2 = dh2_ref[:].astype(cd)
    j0, j1, i0, i1 = patch
    plane = cur_ex.shape[1:]
    jrow = jax.lax.broadcasted_iota(jnp.int32, plane, 0)
    if jt is not None:
        jrow = jrow + joff  # content-global j (window row 0 = joff)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, plane, 1)
    mrow = (jrow >= j0) & (jrow < j1) & (lane2 >= i0) & (lane2 < i1)

    # hoisted 2-D masks (identical for every level and grid step)
    jm_j = (jrow < J)[None]
    jm_ex = ((jrow >= 1) & (jrow < J))[None]
    jm_ey = ((jrow < J) & (lane2 >= 1))[None]
    jm_ez = ((jrow >= 1) & (jrow < J) & (lane2 >= 1))[None]
    last_lane = (lane2 == Ib - 1)[None]
    zr = jnp.zeros((), cd)

    t_ex = [tex[m] for m in range(s + 1)]
    t_ey = [tey[m] for m in range(s + 1)]
    t_ez = [tez[m] for m in range(s + 1)]
    t_hx = [thx[m] for m in range(s + 1)]
    t_hy = [thy[m] for m in range(s + 1)]
    t_hz = [thz[m] for m in range(s + 1)]
    t_px = [tpx[m] for m in range(s + 1)]
    t_py = [tpy[m] for m in range(s + 1)]
    t_pz = [tpz[m] for m in range(s + 1)]
    if sar:
        t_wx = [twx[m] for m in range(s + 1)]
        t_wy = [twy[m] for m in range(s + 1)]
        t_wz = [twz[m] for m in range(s + 1)]
        accband = accb[:]
    if dft_nf:
        # per-accumulator rolling bands as VALUES through the level loop
        # (the SAR accband pattern), written back once per grid step
        dbands = [dbandr[i] for i in range(6 * dft_nf)]

    def krow(lo, n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) + lo

    for m in range(1, s + 1):
        o_m = L0 - m
        ex_e = jnp.concatenate([t_ex[m - 1][None], cur_ex], axis=0)
        ey_e = jnp.concatenate([t_ey[m - 1][None], cur_ey], axis=0)
        ez_e = jnp.concatenate([t_ez[m - 1][None], cur_ez], axis=0)
        hx_p = jnp.concatenate([t_hx[m - 1][None], cur_hx[: tk - 1]], axis=0)
        hy_p = jnp.concatenate([t_hy[m - 1][None], cur_hy[: tk - 1]], axis=0)
        hz_p = jnp.concatenate([t_hz[m - 1][None], cur_hz[: tk - 1]], axis=0)
        px_o = jnp.concatenate([t_px[m - 1][None], cur_px[: tk - 1]], axis=0)
        py_o = jnp.concatenate([t_py[m - 1][None], cur_py[: tk - 1]], axis=0)
        pz_o = jnp.concatenate([t_pz[m - 1][None], cur_pz[: tk - 1]], axis=0)

        if m >= 2:
            # source hard-set for step m, substituted into the INPUT
            # views only (pallas_stream._kernel's injection calculus)
            m0e = (krow(o_m, tk + 1) == 0) & mrow[None, :, :]
            ez_e = jnp.where(m0e, de2[m - 2][None, :, :], ez_e)
            ex_e = jnp.where(m0e, zr, ex_e)
            m0h = m0e[:tk]
            hx_p = jnp.where(m0h, dh2[m - 2][None, :, :], hx_p)
            hz_p = jnp.where(m0h, zr, hz_p)

        # save level m-1's new tails (post-injection values)
        tex[m - 1] = cur_ex[tk - 1]
        tey[m - 1] = cur_ey[tk - 1]
        tez[m - 1] = cur_ez[tk - 1]
        thx[m - 1] = cur_hx[tk - 1]
        thy[m - 1] = cur_hy[tk - 1]
        thz[m - 1] = cur_hz[tk - 1]
        tpx[m - 1] = cur_px[tk - 1]
        tpy[m - 1] = cur_py[tk - 1]
        tpz[m - 1] = cur_pz[tk - 1]

        # ---- H^m on rows [o_m, o_m + tk) (vacuum factor) ----
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
        not_p = ~((kv == 0) & mrow[None])
        m_hx = k_lt_K & jm_j & not_p
        m_hz = (kv < K + 1) & jm_j & not_p
        m_hy = jnp.broadcast_to(k_lt_K, hx_p.shape)
        hx_n = jnp.where(m_hx, hx_p + f_h * inc_hx, hx_p)
        hy_n = jnp.where(m_hy, hy_p + f_h * inc_hy, hy_p)
        hz_n = jnp.where(m_hz, hz_p + f_h * inc_hz, hz_p)

        # ---- ADE E^m + P^m on the same rows ----
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
        k_in = (kv >= 1) & k_lt_K
        m_ex = k_in & jm_ex
        m_ey = k_in & jm_ey
        m_ez = k_lt_K & jm_ez
        curls = (
            (hz0 - hz_my) - (hy0 - hy_m1),
            (hx0 - hx_m1) - (hz0 - hz_mx),
            (hy0 - hy_mx) - (hx0 - hx_my),
        )
        co = slice(s - m, s - m + tk)  # this level's rows in the windows
        e_olds = (ex_e[:tk], ey_e[:tk], ez_e[:tk])
        p_olds = (px_o, py_o, pz_o)
        masks = (m_ex, m_ey, m_ez)
        e_news, p_news, w_news = [], [], []
        for ci in range(3):
            en = (caw[ci][co] * e_olds[ci] + cbw[ci][co] * curls[ci]
                  + cpw[ci][co] * p_olds[ci])
            pn = k1w[ci][co] * p_olds[ci] + k2w[ci][co] * (en + e_olds[ci])
            if sar:
                e_mid = 0.5 * (en + e_olds[ci])
                w = e_mid * ((pn - p_olds[ci]) / jnp.asarray(dt_step, cd)
                             + sgw[ci][co] * e_mid)
                w_news.append(jnp.where(masks[ci], w, zr)
                              .astype(jnp.float32))
            e_news.append(jnp.where(masks[ci], en, e_olds[ci]))
            p_news.append(jnp.where(masks[ci], pn, p_olds[ci]))
        ex_n, ey_n, ez_n = e_news
        px_n, py_n, pz_n = p_news

        if sar:
            wx_n, wy_n, wz_n = w_news
            # cell rows [o_m - 1, o_m + tk - 1): own work tails carry
            # row o_m - 1 from the previous grid step; association of
            # ops/dispersive.work_cell_means exactly
            wxs = jnp.concatenate([t_wx[m][None], wx_n], axis=0)
            wys = jnp.concatenate([t_wy[m][None], wy_n], axis=0)
            wzs = jnp.concatenate([t_wz[m][None], wz_n], axis=0)
            a, b = wxs[:tk], wxs[1:]
            mx = 0.25 * (a + b + jnp.roll(a, -1, axis=1)
                         + jnp.roll(b, -1, axis=1))
            a, b = wys[:tk], wys[1:]
            a_i = jnp.where(last_lane, jnp.float32(0.0),
                            jnp.roll(a, -1, axis=2))
            b_i = jnp.where(last_lane, jnp.float32(0.0),
                            jnp.roll(b, -1, axis=2))
            my = 0.25 * (a + a_i + b + b_i)
            a = wzs[:tk]
            a_j = jnp.roll(a, -1, axis=1)
            a_i = jnp.where(last_lane, jnp.float32(0.0),
                            jnp.roll(a, -1, axis=2))
            a_ji = jnp.where(last_lane, jnp.float32(0.0),
                             jnp.roll(a_j, -1, axis=2))
            mz = 0.25 * (a + a_j + a_i + a_ji)
            kv_c = krow(o_m - 1, tk)
            m_sar = (kv_c >= 0) & (kv_c < K) & jm_j
            inc = jnp.where(m_sar, (mx + my + mz) * dt_f, jnp.float32(0.0))
            b0 = 2 * tk - m - 1
            tail_sh = (3 * tk - b0 - tk,) + inc.shape[1:]
            accband = accband + jnp.concatenate(
                [jnp.zeros((b0,) + inc.shape[1:], jnp.float32), inc,
                 jnp.zeros(tail_sh, jnp.float32)],
                axis=0,
            )
            twx[m] = wx_n[tk - 1]
            twy[m] = wy_n[tk - 1]
            twz[m] = wz_n[tk - 1]

        if dft_nf:
            # E cell means on rows [o_m - 1, o_m + tk - 1): own E tails
            # (t_ex[m] = level m's new-E last row from the previous grid
            # step) + fresh rows — the exact mean association of
            # pallas_stream._kernel's sar/dft block and dft.accumulate
            exs = jnp.concatenate([t_ex[m][None], ex_n], axis=0)
            eys = jnp.concatenate([t_ey[m][None], ey_n], axis=0)
            ezs = jnp.concatenate([t_ez[m][None], ez_n], axis=0)
            a, b = exs[:tk], exs[1:]
            dmex = 0.25 * (a + b + jnp.roll(a, -1, axis=1)
                           + jnp.roll(b, -1, axis=1))
            a, b = eys[:tk], eys[1:]
            a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
            b_i = jnp.where(last_lane, zr, jnp.roll(b, -1, axis=2))
            dmey = 0.25 * (a + a_i + b + b_i)
            a = ezs[:tk]
            a_j = jnp.roll(a, -1, axis=1)
            a_i = jnp.where(last_lane, zr, jnp.roll(a, -1, axis=2))
            a_ji = jnp.where(last_lane, zr, jnp.roll(a_j, -1, axis=2))
            dmez = 0.25 * (a + a_j + a_i + a_ji)
            kv_d = krow(o_m - 1, tk)
            m_dft = (kv_d >= 0) & (kv_d < K) & jm_j
            b0d = 2 * tk - m - 1  # band row of cell row o_m - 1
            zf32 = jnp.float32(0.0)

            def dband_add(bandv, incv):
                # static-offset add (Mosaic has no scatter-add)
                tail_sh = (3 * tk - b0d - tk,) + incv.shape[1:]
                return bandv + jnp.concatenate(
                    [jnp.zeros((b0d,) + incv.shape[1:], jnp.float32),
                     incv, jnp.zeros(tail_sh, jnp.float32)],
                    axis=0,
                )

            for fi in range(dft_nf):
                cwt = wts_ref[m - 1, fi]
                swt = wts_ref[m - 1, dft_nf + fi]
                for ci, me in enumerate((dmex, dmey, dmez)):
                    mef = me.astype(jnp.float32)
                    base = (fi * 3 + ci) * 2
                    dbands[base] = dband_add(
                        dbands[base],
                        jnp.where(m_dft, cwt * mef, zf32))
                    dbands[base + 1] = dband_add(
                        dbands[base + 1],
                        jnp.where(m_dft, (-swt) * mef, zf32))

        cur_ex, cur_ey, cur_ez = ex_n, ey_n, ez_n
        cur_hx, cur_hy, cur_hz = hx_n, hy_n, hz_n
        cur_px, cur_py, cur_pz = px_n, py_n, pz_n

    tex[s] = cur_ex[tk - 1]
    tey[s] = cur_ey[tk - 1]
    tez[s] = cur_ez[tk - 1]
    thx[s] = cur_hx[tk - 1]
    thy[s] = cur_hy[tk - 1]
    thz[s] = cur_hz[tk - 1]
    tpx[s] = cur_px[tk - 1]
    tpy[s] = cur_py[tk - 1]
    tpz[s] = cur_pz[tk - 1]

    vals = (cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz)
    pvals = (cur_px, cur_py, cur_pz)
    dead_cond = (g == 0) | (g > nk)
    emit_cond = (g > 0) & (g <= nk)

    @pl.when(dead_cond)
    def _dead():
        for o in outs:
            o[:] = jnp.zeros(o.shape, st_dt)
        for o in pouts:
            o[:] = jnp.zeros(o.shape, st_dt)

    @pl.when(emit_cond)
    def _emit():
        # j-tiled: emit the tile interior; halo columns are the
        # recompute wedge (stale beyond their level's validity)
        for o, v in zip(outs, vals):
            o[:] = (v if jt is None else v[:, HJ : HJ + jt]).astype(st_dt)
        for o, v in zip(pouts, pvals):
            o[:] = (v if jt is None else v[:, HJ : HJ + jt]).astype(st_dt)

    if sar:
        acc_emit = (accband[:tk] if jt is None
                    else accband[:tk, HJ : HJ + jt])

        @pl.when((g >= 2) & (g <= nk + 1))
        def _emit_acc():
            oacc[:] = accin_ref[:] + acc_emit

        @pl.when(g < 2)
        def _emit_acc_dead():
            oacc[:] = jnp.zeros(oacc.shape, jnp.float32)

        accb[:] = jnp.concatenate(
            [accband[tk:],
             jnp.zeros((tk,) + accband.shape[1:], jnp.float32)],
            axis=0,
        )

    if dft_nf:
        # phasor-accumulator emit: same schedule as the SAR band (cell
        # block g-2 completes at grid step g, one extra drain step);
        # full-plane only (pick_ade_plan gates dft_nf to nj == 1)
        demit = jnp.stack([bnd[:tk] for bnd in dbands])

        @pl.when((g >= 2) & (g <= nk + 1))
        def _emit_dacc():
            odacc[:] = daccin_ref[:] + demit

        @pl.when(g < 2)
        def _emit_dacc_dead():
            odacc[:] = jnp.zeros(odacc.shape, jnp.float32)

        for i, bnd in enumerate(dbands):
            dbandr[i] = jnp.concatenate(
                [bnd[tk:],
                 jnp.zeros((tk,) + bnd.shape[1:], jnp.float32)],
                axis=0,
            )


def _build_ade_stream_call_jt(p, f_h, interpret, s, sar, nj, S, J1, Ib,
                              tk, ofs, nk, dtype, compute_dtype, patch,
                              nd):
    """j-tiled streaming ADE sweep (r5, VERDICT r4 #5): grid (nj,
    nk + ofs), k inner — the "9 band operands" in-place variant.

    Operands are (S, Jt, Ib) j-extended arrays (pallas_temporal.
    jextend); every window is an Element spec of tj + 2*HJ rows
    starting at jb*tj + DJ - HJ (8-aligned).  Fields AND P alias
    in-place, so each tile's lower j-halo rows — inside tile jb-1's
    interior, already overwritten — ride in NINE pre-copied read-only
    (S, (nj-1)*HJ, Ib) band operands (pallas_stream.
    _build_stream_call_jt's band mechanism extended to the
    polarization).  This is what lets 512^3-class dispersive grids
    stream instead of silently falling to the two-pass tier."""
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
    band_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(HJ), pl.Element(Ib)),
        lambda jb, g: (
            jnp.where(g < nk, g + ofs, 0) * tk,
            jnp.maximum(jb - 1, 0) * HJ,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    sg_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(tjw), pl.Element(Ib)),
        lambda jb, g: ((jnp.minimum(g, nk) + ofs) * tk - s, jstart(jb), 0),
        memory_space=pltpu.VMEM,
    )
    acc_win = pl.BlockSpec(
        (pl.Element(tk), pl.Element(tj), pl.Element(Ib)),
        lambda jb, g: (
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1),
                               g + ofs - 2),
                     0, nk + ofs - 1) * tk,
            pl.multiple_of(jb * tj + DJ, 8),
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    in_specs = (
        [smem] + [in_win] * 6 + [drv_spec] * 2 + [in_win] * 3
        + [coef_win] * 15
        + ([sg_win] * 3 + [acc_win] if sar else [])
        + [band_win] * 9
    )
    n_in = len(in_specs)
    out_specs = [out_win] * 9 + ([acc_win] if sar else [])
    out_shape = (bulk_shape,) * 9 + ((acc_shape,) if sar else ())
    aliases = {}
    if not interpret:
        aliases.update({i + 1: i for i in range(6)})      # fields
        aliases.update({i + 9: i + 6 for i in range(3)})  # P
        if sar:
            aliases[n_in - 10] = 9
    tail = pltpu.VMEM((s + 1, tjw, Ib), compute_dtype)
    scratch = [tail] * 9 + (
        [pltpu.VMEM((s + 1, tjw, Ib), jnp.float32)] * 3
        + [pltpu.VMEM((3 * tk, tjw, Ib), jnp.float32)]
        if sar else []
    )
    from .pallas_temporal import VMEM_BUDGET

    inner = pl.pallas_call(
        functools.partial(_kernel_ade_stream, p, f_h, patch, Ib, s, sar,
                          p.time_step, nk, 0, tj),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(*args):
        # args: koff, 6 fields, de2, dh2, 3 P, 15 coefs [, 3 sg, acc];
        # append the 9 pre-copied halo bands (fields then P)
        nine = args[1:7] + args[9:12]
        bands = [
            jnp.concatenate(
                [jax.lax.slice_in_dim(f, b * tj + DJ - HJ, b * tj + DJ,
                                      axis=1)
                 for b in range(1, nj)],
                axis=1,
            )
            for f in nine
        ]
        return inner(*args, *bands)

    return call, nd


def build_ade_stream_call(p: Params, f_h, interpret: bool, s: int,
                          sar: bool, dft_nf: int = 0, nj: int = 1):
    """The streaming ADE sweep pallas_call (single-chip, full-plane).

    Same block calculus as pallas_stream.build_stream_call: Blocked
    in/out tiles one block apart (in-place aliased — the write frontier
    trails the read frontier by one block, so fields AND P run at 1x
    HBM), (tk+s)-row coefficient Element windows tracking the levels,
    and the SAR accumulator tiles trailing by two blocks with one extra
    drain step.  ``dft_nf`` (r5, VERDICT r4 #6) adds the in-kernel DFT
    phasor tiles on the SAR accumulator schedule — the steady-state
    phasor inside a Debye load rides the streaming sweep."""
    S, J1, Ib = dims(p)
    tk = s
    ofs = D // tk
    assert D % tk == 0 and (S - D) % tk == 0
    nk = (S - D) // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    plan = make_source_plan(p)
    patch = (plan.j0, plan.j1, plan.i0, plan.i1)
    nd = max(s - 1, 1)
    if nj > 1:
        assert dft_nf == 0, "j-tiled in-kernel DFT is full-plane only"
        return _build_ade_stream_call_jt(
            p, f_h, interpret, s, sar, nj, S, J1, Ib, tk, ofs, nk,
            dtype, compute_dtype, patch, nd)
    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    acc_shape = jax.ShapeDtypeStruct((S, J1, Ib), jnp.float32)
    dacc_shape = jax.ShapeDtypeStruct((6 * dft_nf, S, J1, Ib), jnp.float32)
    grid = (nk + ofs + (1 if sar or dft_nf else 0),)

    in_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (jnp.where(g < nk, g + ofs, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (
            jnp.where(g <= nk, g + ofs - 1,
                      jnp.minimum(g - nk - 1, ofs - 1)),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    acc_blk = pl.BlockSpec(
        (tk, J1, Ib),
        lambda g: (
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1), g + ofs - 2),
                     0, nk + ofs - 1),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((jnp.minimum(g, nk) + ofs) * tk - s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    drv_spec = pl.BlockSpec((nd, J1, Ib), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    # in-kernel DFT (r5): per-sweep weights in SMEM + the stacked 4-D
    # phasor accumulator tiles on the SAR acc schedule
    wts_smem = pl.BlockSpec((s, 2 * dft_nf), lambda g: (0, 0),
                            memory_space=pltpu.SMEM)
    dacc_blk = pl.BlockSpec(
        (6 * dft_nf, tk, J1, Ib),
        lambda g: (
            0,
            jnp.clip(jnp.where(g < 2, jnp.minimum(g, ofs - 1),
                               g + ofs - 2),
                     0, nk + ofs - 1),
            0, 0,
        ),
        memory_space=pltpu.VMEM,
    )

    in_specs = (
        [smem] + [in_blk] * 6 + [drv_spec] * 2 + [in_blk] * 3
        + [coef_win] * 15
        + ([coef_win] * 3 + [acc_blk] if sar else [])
        + ([wts_smem, dacc_blk] if dft_nf else [])
    )
    n_in = len(in_specs)
    out_specs = [out_blk] * 9 + ([acc_blk] if sar else []) \
        + ([dacc_blk] if dft_nf else [])
    out_shape = (bulk_shape,) * 9 + ((acc_shape,) if sar else ()) \
        + ((dacc_shape,) if dft_nf else ())
    aliases = {}
    if not interpret:
        aliases.update({i + 1: i for i in range(6)})      # fields
        aliases.update({i + 9: i + 6 for i in range(3)})  # P
        if sar:
            aliases[n_in - (3 if dft_nf else 1)] = 9
        if dft_nf:
            aliases[n_in - 1] = 9 + (1 if sar else 0)
    tail = pltpu.VMEM((s + 1, J1, Ib), compute_dtype)
    scratch = [tail] * 9 + (
        [pltpu.VMEM((s + 1, J1, Ib), jnp.float32)] * 3
        + [pltpu.VMEM((3 * tk, J1, Ib), jnp.float32)]
        if sar else []
    ) + (
        [pltpu.VMEM((6 * dft_nf, 3 * tk, J1, Ib), jnp.float32)]
        if dft_nf else []
    )
    from .pallas_temporal import VMEM_BUDGET

    inner = pl.pallas_call(
        functools.partial(_kernel_ade_stream, p, f_h, patch, Ib, s, sar,
                          p.time_step, nk, dft_nf, None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )
    return inner, nd


def make_dispersive_stream_step(p: Params, dm: DebyeMaterials,
                                accumulate_power: bool,
                                interpret: bool, s: int,
                                dft_nf: int = 0, nj: int = 1):
    """``group_step((st, ade)[, acc_st], xs_group) -> same`` advancing s
    steps per sweep; acc_st is the storage-layout fp32 accumulator
    (pallas_temporal.embed_power_acc at the plan's nj).  With ``dft_nf``
    the signature extends to ``group_step(st, ade, acc, xs_group, dacc,
    wts) -> (st, ade, acc, dacc)`` — the phasor tiles ride the sweep
    (r5, VERDICT r4 #6).  With ``nj`` > 1 (r5) the state AND AdeState
    must be j-extended (jextend_ade) before the scan and restored
    after."""
    dc = debye_coefs(p, dm)
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(float(np.asarray(dc.h_factor)))
    call, nd = build_ade_stream_call(p, f_h, interpret, s,
                                     accumulate_power, dft_nf, nj)
    plan = make_source_plan(p)
    f_h32 = jnp.float32(float(np.asarray(dc.h_factor)))
    S, J1, Ib = dims(p)
    _, Jt = jt_extents(p, nj)
    dj = DJ if nj > 1 else 0
    K, J = p.maxk, p.maxj
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, Jt if nj > 1 else J1, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        npj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (npj, ni))

    def inject(st: StrippedState, amp) -> StrippedState:
        pv = drive_patch(amp)
        zero = jnp.zeros_like(pv).astype(dtype)
        sl = (D, slice(dj + plan.j0, dj + plan.j1),
              slice(plan.i0, plan.i1))
        return dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
        )

    def group_step(st: StrippedState, ade: AdeState, acc, xs_group,
                   dacc=None, wts=None):
        ts_g, amps_g = xs_group
        st = inject(st, amps_g[0])
        sl = (slice(0, nd), slice(dj + plan.j0, dj + plan.j1),
              slice(plan.i0, plan.i1))
        pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)]) \
            if s > 1 else jnp.zeros((nd, plan.j1 - plan.j0,
                                     len(plan.profile)), dtype)
        de2 = jnp.asarray(zero_drv).at[sl].set(pvs.astype(dtype))
        dh2 = jnp.asarray(zero_drv).at[sl].set(
            (-plan.inv_z_te * pvs).astype(dtype))
        args = [jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy,
                st.hz, de2, dh2, ade.px, ade.py, ade.pz,
                *ade.coef18(False)]
        if accumulate_power:
            args += [ade.sg_x, ade.sg_y, ade.sg_z, acc]
        if dft_nf:
            args += [wts, dacc]
        outs = call(*args)
        ex, ey, ez, hx, hy, hz, px, py, pz = outs[:9]
        oi = 9
        if accumulate_power:
            acc = outs[oi]
            oi += 1
        if dft_nf:
            dacc = outs[oi]
        # Hx strip: s cheap 2-D updates (frozen-strip curl is constant)
        ey_s2 = st.ey_s[:, :, 0]
        ez_s2 = st.ez_s[:, :, 0]
        sl2 = (slice(D, D + K), slice(dj, dj + J))
        curl = (ey_s2[D + 1 : D + K + 1, dj : dj + J] - ey_s2[sl2]) - (
            ez_s2[D : D + K, dj + 1 : dj + J + 1] - ez_s2[sl2]
        )
        hx_s = st.hx_s
        for _ in range(s):
            hx_s = hx_s.at[sl2[0], sl2[1], 0].add(
                (f_h32 * curl).astype(st.hx_s.dtype))
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy,
                                 hz=hz, hx_s=hx_s)
        ade = dataclasses.replace(ade, px=px, py=py, pz=pz)
        if dft_nf:
            return st, ade, acc, dacc
        return st, ade, acc

    group_step.s = s
    group_step.nj = nj
    return group_step


def jextend_ade(p: Params, ade: AdeState, nj: int) -> AdeState:
    """Pad every AdeState array into the j-extended layout (the
    polarization and coefficient maps ride the same j-tiling as the
    fields — pallas_temporal.jextend's geometry)."""
    from .pallas_temporal import jextend

    return jextend(p, ade, nj)


def jrestore_ade(p: Params, ade: AdeState, nj: int) -> AdeState:
    from .pallas_temporal import jrestore

    return jrestore(p, ade, nj)


def make_dispersive_stream_chunk_runner(p: Params, dm: DebyeMaterials,
                                        accumulate_power: bool = False,
                                        interpret: bool | None = None):
    """Jitted ``run((st, ade), (ts, amps), power) -> ((st, ade), power)``
    on the streaming ADE tier: s steps per HBM sweep, odd trailing steps
    on the two-pass ADE kernels (the same driver shape as
    step.make_chunk_runner's pallas_stream path).  With a j-tiled plan
    (r5) the state + AdeState round-trip through jextend/jrestore per
    chunk — chunk boundaries stay canonical full-plane layouts, so
    checkpoints and snapshots are tiling-agnostic."""
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None \
            else (jax.default_backend() != "tpu")
    plan = pick_ade_plan(p, sar=accumulate_power)
    if plan is None:
        raise NotImplementedError(
            "no VMEM-feasible dispersive streaming plan for this config"
        )
    s, nj = plan
    import os as _os

    s = int(_os.environ.get("FDTD_ADE_S", "0")) or s
    nj = int(_os.environ.get("FDTD_ADE_NJ", "0")) or nj
    group_step = make_dispersive_stream_step(
        p, dm, accumulate_power, interpret, s, nj=nj
    )
    odd_step = make_dispersive_fused_step(
        p, dm, accumulate_power=accumulate_power, interpret=interpret
    )
    from .pallas_temporal import (
        crop_power_acc,
        embed_power_acc,
        jextend,
        jrestore,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc=None):
        st, ade = carry
        ts, amps = xs
        n = ts.shape[0]
        n_grp = n // s
        acc_st = (embed_power_acc(p, power_acc, nj)
                  if accumulate_power else None)
        if n_grp:
            if nj > 1:
                st = jextend(p, st, nj)
                ade = jextend_ade(p, ade, nj)
            gts = (ts[: s * n_grp].reshape(n_grp, s),
                   amps[: s * n_grp].reshape(n_grp, s))

            def body(c, x):
                st, ade, acc = c
                return group_step(st, ade, acc, x), None

            (st, ade, acc_st), _ = jax.lax.scan(
                body, (st, ade, acc_st), gts
            )
            if nj > 1:
                st = jrestore(p, st, nj)
                ade = jrestore_ade(p, ade, nj)
        if accumulate_power:
            power_acc = crop_power_acc(p, acc_st, nj)
        for r in range(n % s):
            idx = s * n_grp + r
            x = (ts[idx], amps[idx])
            if accumulate_power:
                (st, ade), power_acc = odd_step((st, ade), x, power_acc)
            else:
                st, ade = odd_step((st, ade), x)
        return (st, ade), power_acc

    return run


def dispersive_stream_dft_supported(p: Params, dft,
                                    sar: bool = False) -> bool:
    """True when the in-kernel DFT rides the dispersive streaming sweep
    (r5, VERDICT r4 #6): fields='e', computation mode, and a full-plane
    ADE plan that fits VMEM with the phasor bands."""
    if dft is None or dft.fields != "e":
        return False
    return pick_ade_plan(p, sar=sar, dft_nf=dft.nf) is not None


def make_dispersive_stream_dft_chunk_runner(p: Params, dm: DebyeMaterials,
                                            dft,
                                            accumulate_power: bool = False,
                                            interpret: bool | None = None):
    """Monitored dispersive streaming runner (r5, VERDICT r4 #6): the
    steady-state phasor INSIDE a Debye load — the most physically
    meaningful DFT — rides the streaming ADE sweep instead of the xla
    ADE scan (in r4 the in-kernel DFT bands and the dispersive
    streaming kernel existed separately but were never composed).

    ``run((st, ade), (ts, amps, cw, sw), power, dft_acc) ->
    ((st, ade), power, dft_acc, None)`` — the monitored-chunk contract,
    with the carry shape of make_dispersive_stream_chunk_runner.
    ``dft_acc`` is the canonical (re, im) pair (dft.zero_dft_acc); it
    rides the sweeps in the stacked storage layout
    (pallas_stream.embed_dft_acc) and is cropped at chunk boundaries
    (checkpoint-compatible with every other monitored tier).  Odd
    trailing steps run the two-pass ADE kernel with the canonical jnp
    accumulation.  fields='e', computation mode, full-plane plans."""
    from .. import diagnostics
    from ..dft import accumulate as dft_accumulate
    from .pallas_stream import crop_dft_acc, embed_dft_acc
    from .pallas_temporal import D as _D

    nf = dft.nf
    assert dft.fields == "e", "in-kernel DFT carries E phasors only"
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None \
            else (jax.default_backend() != "tpu")
    plan_ = pick_ade_plan(p, sar=accumulate_power, dft_nf=nf)
    if plan_ is None:
        raise NotImplementedError(
            "no VMEM-feasible dispersive streaming DFT plan"
        )
    s = plan_[0]
    group_step = make_dispersive_stream_step(
        p, dm, accumulate_power, interpret, s, dft_nf=nf
    )
    odd_step = make_dispersive_fused_step(
        p, dm, accumulate_power=accumulate_power, interpret=interpret
    )
    from .pallas_temporal import crop_power_acc, embed_power_acc

    K, J = p.maxk, p.maxj
    dt_step = p.time_step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc, dft_acc):
        st, ade = carry
        ts, amps, cw, sw = xs
        n = ts.shape[0]
        n_grp = n // s
        dacc_st = embed_dft_acc(p, dft_acc, nf)
        acc_st = (embed_power_acc(p, power_acc, 1)
                  if accumulate_power else None)
        if n_grp:
            gxs = (ts[: s * n_grp].reshape(n_grp, s),
                   amps[: s * n_grp].reshape(n_grp, s),
                   cw[: s * n_grp].reshape(n_grp, s, nf),
                   sw[: s * n_grp].reshape(n_grp, s, nf))

            def body(c, x):
                st, ade, acc, dacc = c
                ts_g, amps_g, cw_g, sw_g = x
                wts = jnp.concatenate([cw_g, sw_g], axis=1)  # (s, 2*nf)
                return group_step(st, ade, acc, (ts_g, amps_g),
                                  dacc, wts), None

            (st, ade, acc_st, dacc_st), _ = jax.lax.scan(
                body, (st, ade, acc_st, dacc_st), gxs
            )
        dft_acc = crop_dft_acc(p, dacc_st, nf)
        if accumulate_power:
            power_acc = crop_power_acc(p, acc_st, 1)
        for r in range(n % s):
            idx = s * n_grp + r
            x = (ts[idx], amps[idx])
            if accumulate_power:
                (st, ade), power_acc = odd_step((st, ade), x, power_acc)
            else:
                st, ade = odd_step((st, ade), x)
            means = diagnostics.e_cell_means_stripped(p, st)
            dft_acc = dft_accumulate(p, means, cw[idx], sw[idx], dft_acc)
        return (st, ade), power_acc, dft_acc, None

    return run


def make_dispersive_chunk_runner_fast(p: Params, dm: DebyeMaterials,
                                      accumulate_power: bool = False,
                                      backend: str = "auto",
                                      log=print,
                                      interpret: bool | None = None):
    """The dispersive fast tier the runner wires: the streaming ADE
    sweep when a VMEM plan fits (and the backend allows it), else the
    two-pass ADE kernels.  Same contract as
    :func:`make_dispersive_fused_chunk_runner`."""
    if backend in ("auto", "pallas_stream"):
        plan = pick_ade_plan(p, sar=accumulate_power)
        if plan is not None:
            return make_dispersive_stream_chunk_runner(
                p, dm, accumulate_power=accumulate_power,
                interpret=interpret)
        if backend == "pallas_stream":
            log(
                "notice: no VMEM-feasible dispersive streaming plan; "
                "using the two-pass ADE kernels"
            )
    return make_dispersive_fused_chunk_runner(
        p, dm, accumulate_power=accumulate_power, interpret=interpret
    )


def make_dispersive_fused_chunk_runner(p: Params, dm: DebyeMaterials,
                                       accumulate_power: bool = False,
                                       interpret: bool | None = None):
    """Jitted ``run((st, ade), (ts, amps), power) -> ((st, ade), power)``
    — the fast-path chunk runner the runner wires when no per-step
    monitors are on (monitors keep the xla ADE scan).  Donating, like
    every stripped-layout runner (the aliased kernels then run in place
    at the HBM level)."""
    step = make_dispersive_fused_step(
        p, dm, accumulate_power=accumulate_power, interpret=interpret
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc=None):
        if accumulate_power:
            def body(c, x):
                carry, acc = c
                carry, acc = step(carry, x, acc)
                return (carry, acc), None

            (carry, power_acc), _ = jax.lax.scan(
                body, (carry, power_acc), xs
            )
        else:
            def body(carry, x):
                return step(carry, x), None

            carry, _ = jax.lax.scan(body, carry, xs)
        return carry, power_acc

    return run
