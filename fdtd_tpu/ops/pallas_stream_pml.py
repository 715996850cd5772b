"""Streaming-PML: the CPML psi recursion riding the multi-step wavefront.

The r5 in-kernel two-pass tier (:mod:`fdtd_tpu.ops.cpml_kernel`)
measured 5.88 Gcells/s at 256^3 fp32 — 92% of the two-pass
composition's ~6.4 G roofline ceiling (docs/DESIGN.md "PML tax
attribution"), because a two-pass composition pays the full 76 B/cell
field traffic every step.  Going past that ceiling requires the psi
recursion to ride a multi-step kernel: this module puts ALL 12 CPML
terms inside the streaming wavefront sweep (:mod:`fdtd_tpu.ops.
pallas_stream`), so the fields pay 12 B/cell/step at s=8 (24 at s=4)
and the psi state adds only its own (small) traffic on top.

How each psi family rides the skewed pipeline:

- **j/i-axis packs** (8 terms; the exact packed layouts of
  :class:`fdtd_tpu.ops.cpml_kernel.PsiPacked`): the recursion is
  POINTWISE in psi — psi^{m} = b psi^{m-1} + c d^{m} — so a pack
  advances through levels exactly like a field: level m consumes the
  pack rows [o_m, o_m + tk) = one retained tail row (previous grid
  step's top row, per level, in VMEM scratch) plus tk-1 fresh rows,
  and with s == tk the level-s rows land exactly one block back.
  Blocked in/out tiles, aliased in place, same dead/emit calculus as
  the fields.
- **k-axis terms** (hx_z, hy_z, ex_z, ey_z) live at ALL (j, i) but
  only ~2n k-rows per slab; they ride as ONE stacked (4, S, J1, Ib)
  operand in the same pipeline — but its blocks are identically zero
  outside the two k-slabs, so the in/out index maps REDIRECT every
  middle block to dead block 0 (zeros in, zeros out): Pallas fetches a
  block only when its index changes, so the k-psi HBM traffic
  collapses to the ~2x(slab blocks) that actually hold state.  The
  in-place alias on the redirected block 0 is benign: every value
  read from or written to it is exactly 0.0.
- **per-row (b, c) recursion profiles** for the k-terms stream as a
  tiny (S, 8, 128) Element window tracking the levels (rows
  [L0 - s, L0 + tk), the coef-window geometry); j/i pack profiles are
  the same constant (1, Pj, 1)/(1, 1, 128) operands as the two-pass
  tier (:func:`fdtd_tpu.ops.cpml_kernel._bc_vectors` — bit-identical
  to :func:`fdtd_tpu.ops.cpml.build_plan`'s fp64 tables).

Scope (see :func:`stream_pml_supported`): computation mode (the
frozen boundary strips are identically zero, so every strip-coupled
psi — hx_y's i = maxi column, the k-terms' strip columns — is
identically zero and drops out; the hx_s strip advance itself is an
exact no-op), vacuum or lossy media with homogeneous mu_r (lossy
streams six ca/cb coefficient windows; slab-constant correction
factors require materials clear of the absorber, the
slab_factor_constants gate), full-plane plans, source patch clear of
the j/i slabs
(always true for a centered port), grids whose plan fits VMEM
(256^3-class; 512^3 falls back to the two-pass in-kernel tier).

Source semantics: level 1 is injected into the state by the caller;
levels m >= 2 substitute the drive into the level's INPUT VIEWS (the
:mod:`fdtd_tpu.ops.pallas_stream` discipline).  The psi recursions
read their differences from those same views, which is exactly the
xla ordering (source -> update_H -> psi from sourced E).  The only
patch subtlety is hx_z: its k-slab contains the k = 0 source plane
and the xla path OVERWRITES Hx at the patch with the second source
application after h-corrections, so the hx_z ADD (recursion still
runs) is masked off the patch — the same net state.

Reference anchors: the curls this must not dominate are
main.c:431-500; the open boundary is a capability extension
(description.pdf section 2.1 documents the closed PEC cavity), and
the reference's own roofline analysis (description.pdf section 6) is
why the psi state had to leave the per-step tier.
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
from ..state import Materials, UpdateCoefs, update_coefs
from .cpml import PMLConfig, PsiState, _check_cfg, build_plan, psi_shapes
from .cpml_fast import slab_factor_constants
from .cpml_kernel import (
    PsiPacked,
    _bc_vectors,
    _pad8,
    kernel_pml_supported,
    make_pml_kernel_step,
)
from .pallas_fused import D, StrippedState, dims
from .pallas_temporal import VMEM_BUDGET

TS = 8

# kp slot order: (name, sf sign, lo-slab start row (content k), region)
_K_TERMS = ("hx_z", "hy_z", "ex_z", "ey_z")


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["kp", "h_j", "h_i", "e_j", "e_i"],
    meta_fields=[],
)
@dataclasses.dataclass
class PsiStream:
    """Streaming-PML memory state.

    ``kp``: (4, S, J1, Ib) — the four k-axis psi embedded at their
    full-k array rows (slot order ``_K_TERMS``; zero outside the two
    k-slabs by construction).  ``h_j``/``h_i``/``e_j``/``e_i``: the
    j/i-axis packs, bit-identical layouts to :class:`fdtd_tpu.ops.
    cpml_kernel.PsiPacked` (rows/lanes stacked per term pair).
    """

    kp: jax.Array
    h_j: jax.Array
    h_i: jax.Array
    e_j: jax.Array
    e_i: jax.Array


def _k_embed_slices(p: Params, cfg: PMLConfig):
    """Per-slot (lo_rows, hi_rows, jslice, islice) of the canonical
    k-term arrays inside the (S, J1, Ib) embed."""
    n = cfg.cells
    K, J, I = p.maxk, p.maxj, p.maxi
    return {
        # hx_z: region k [0,K) j [0,J) i [0,I+1) — strip col dropped
        "hx_z": (slice(D, D + n), slice(D + K - n, D + K),
                 slice(0, J), slice(0, I)),
        "hy_z": (slice(D, D + n), slice(D + K - n, D + K),
                 slice(0, J + 1), slice(0, I)),
        "ex_z": (slice(D + 1, D + 1 + n), slice(D + K - n, D + K),
                 slice(1, J), slice(0, I)),
        "ey_z": (slice(D + 1, D + 1 + n), slice(D + K - n, D + K),
                 slice(0, J), slice(1, I)),
    }


def pack_psi_stream(p: Params, cfg: PMLConfig, psi: PsiState | None,
                    dtype=None) -> PsiStream:
    """Canonical :class:`PsiState` (or zeros) -> streaming layout.

    Bit-exact round trip with :func:`unpack_psi_stream` for any psi a
    computation-mode run can produce (the dropped strip columns —
    hx_y's i = maxi, hx_z's i = maxi — are identically zero there:
    their source strips are PEC-frozen at zero)."""
    from .cpml_kernel import pack_psi as _pack

    _check_cfg(p, cfg)
    dt = jnp.dtype(dtype or p.dtype)
    n = cfg.cells
    S, J1, Ib = dims(p)
    kp = jnp.zeros((4, S, J1, Ib), dt)
    if psi is not None:
        sl = _k_embed_slices(p, cfg)
        for t, name in enumerate(_K_TERMS):
            lo, hi, js, isl = sl[name]
            arr = jnp.asarray(getattr(psi, name), dt)
            if name == "hx_z":
                arr = arr[:, :, : p.maxi]  # drop the frozen strip column
            kp = kp.at[t, lo, js, isl].set(arr[:n])
            kp = kp.at[t, hi, js, isl].set(arr[n:])
    pp = _pack(p, cfg, psi, dtype=dt)
    return PsiStream(kp=kp, h_j=pp.h_j, h_i=pp.h_i, e_j=pp.e_j, e_i=pp.e_i)


def unpack_psi_stream(p: Params, cfg: PMLConfig, ps: PsiStream) -> PsiState:
    """Streaming layout -> canonical slab-restricted :class:`PsiState`
    (checkpoints, parity tests, cross-tier interop)."""
    from .cpml_kernel import unpack_psi as _unpack

    n = cfg.cells
    sh = psi_shapes(p, cfg)
    sl = _k_embed_slices(p, cfg)
    kz = {}
    for t, name in enumerate(_K_TERMS):
        lo, hi, js, isl = sl[name]
        arr = jnp.concatenate([ps.kp[t, lo, js, isl],
                               ps.kp[t, hi, js, isl]], axis=0)
        if name == "hx_z":
            arr = jnp.concatenate(
                [arr, jnp.zeros(sh[name][:2] + (1,), arr.dtype)], axis=2)
        kz[name] = arr
    pp = _to_packed_aux(p, cfg, ps, kz)
    return _unpack(p, cfg, pp)


def _to_packed_aux(p: Params, cfg: PMLConfig, ps: PsiStream, kz) -> PsiPacked:
    S, _J1, _Ib = dims(p)
    Ps = _pad8(2 * cfg.cells)
    return PsiPacked(
        h_j=ps.h_j, h_i=ps.h_i, e_j=ps.e_j, e_i=ps.e_i,
        hxy_s=jnp.zeros((S, Ps, 1), ps.h_j.dtype),
        hx_z=kz["hx_z"], hy_z=kz["hy_z"], ex_z=kz["ex_z"], ey_z=kz["ey_z"],
    )


def stream_to_packed(p: Params, cfg: PMLConfig, ps: PsiStream) -> PsiPacked:
    """PsiStream -> PsiPacked (for odd trailing per-step kernel steps).
    Exact: the k-slices copy the only nonzero rows; hxy_s is zero in
    computation mode (frozen strips)."""
    n = cfg.cells
    sh = psi_shapes(p, cfg)
    sl = _k_embed_slices(p, cfg)
    kz = {}
    for t, name in enumerate(_K_TERMS):
        lo, hi, js, isl = sl[name]
        arr = jnp.concatenate([ps.kp[t, lo, js, isl],
                               ps.kp[t, hi, js, isl]], axis=0)
        if name == "hx_z":
            arr = jnp.concatenate(
                [arr, jnp.zeros(sh[name][:2] + (1,), arr.dtype)], axis=2)
        kz[name] = arr
    return _to_packed_aux(p, cfg, ps, kz)


def packed_to_stream(p: Params, cfg: PMLConfig, pp: PsiPacked) -> PsiStream:
    """Inverse of :func:`stream_to_packed` (drops the zero strip cols)."""
    n = cfg.cells
    S, J1, Ib = dims(p)
    dt = pp.h_j.dtype
    kp = jnp.zeros((4, S, J1, Ib), dt)
    sl = _k_embed_slices(p, cfg)
    for t, name in enumerate(_K_TERMS):
        lo, hi, js, isl = sl[name]
        arr = getattr(pp, name)
        if name == "hx_z":
            arr = arr[:, :, : p.maxi]
        kp = kp.at[t, lo, js, isl].set(arr[:n].astype(dt))
        kp = kp.at[t, hi, js, isl].set(arr[n:].astype(dt))
    return PsiStream(kp=kp, h_j=pp.h_j, h_i=pp.h_i, e_j=pp.e_j, e_i=pp.e_i)


def _bck_rows(p: Params, cfg: PMLConfig, dt) -> np.ndarray:
    """(S, 8, Ib) per-array-row (b, c) for the four k-terms (sublane
    2t = b, 2t+1 = c), sliced from :func:`build_plan`'s fp64-derived
    tables so recursion constants are bit-identical to the xla path.
    Rows outside the slabs (and dead/pad rows) are (1, 0) — psi stays
    exactly zero through the uniform recursion.  Values are REPLICATED
    across the Ib lanes: the kernel slices (tk, 1, Ib) per term and
    broadcasts along sublanes only — a memory-derived (tk, 1, 1)
    double-minor broadcast crashes this libtpu's Mosaic compiler
    (isolated by tools-era probe constructs3.py c8 vs c9)."""
    S, _J1, Ib = dims(p)
    n = cfg.cells
    plan = build_plan(p, cfg, dt)
    out = np.zeros((S, 8, Ib), dt)
    out[:, 0::2, :] = 1.0  # b = 1 outside slabs
    starts = {"hx_z": 0, "hy_z": 0, "ex_z": 1, "ey_z": 1}
    K = p.maxk
    for t, name in enumerate(_K_TERMS):
        b = np.asarray(plan[name][6]).ravel()
        c = np.asarray(plan[name][7]).ravel()
        lo0 = starts[name]
        out[D + lo0 : D + lo0 + n, 2 * t, :] = b[:n, None]
        out[D + lo0 : D + lo0 + n, 2 * t + 1, :] = c[:n, None]
        out[D + K - n : D + K, 2 * t, :] = b[n:, None]
        out[D + K - n : D + K, 2 * t + 1, :] = c[n:, None]
    return out


def stream_pml_vmem_estimate(p: Params, cfg: PMLConfig, s: int,
                             lossy: bool = False,
                             dft_nf: int = 0) -> int:
    """VMEM model: field io + psi pack io + kp tiles + tails + live."""
    S, J1, Ib = dims(p)
    item = jnp.dtype(p.dtype).itemsize
    Pj = _pad8(4 * cfg.cells)
    io = 2 * 2 * 6 * s * J1 * Ib * item              # fields in+out dblbuf
    io += 2 * 2 * 4 * s * J1 * Ib * item             # kp 4-D tiles
    io += 2 * 2 * s * (Pj + Pj) * Ib * item          # h_j + e_j
    io += 2 * 2 * s * (J1 + J1) * 128 * item         # h_i + e_i
    io += 2 * (s + s) * 8 * Ib * item                # bck window
    io += 2 * 2 * max(s - 1, 1) * J1 * Ib * item     # de2/dh2
    if lossy:
        io += 2 * 6 * (2 * s) * J1 * Ib * item       # ca/cb Element windows
    if dft_nf:
        io += 2 * 2 * 6 * dft_nf * s * J1 * Ib * 4   # dacc 4-D tiles
    tails = (s + 1) * (6 + 4) * J1 * Ib * 4          # fields + kp
    tails += (s + 1) * 2 * (Pj * Ib + J1 * 128) * 4  # pack tails
    if dft_nf:
        tails += 6 * dft_nf * 3 * s * J1 * Ib * 4    # rolling phasor bands
    live = 3 * (6 + 4 + 1) * (s + 1) * J1 * Ib * 4
    return io + tails + live


def pick_pml_stream_s(p: Params, cfg: PMLConfig,
                      lossy: bool = False,
                      dft_nf: int = 0) -> int | None:
    """Largest feasible steps-per-sweep (full-plane only), or None."""
    S, _J1, _Ib = dims(p)
    for s in (TS, TS // 2, TS // 4):
        if D % s or (S - D) % s or (S - D) // s < 2:
            continue
        if stream_pml_vmem_estimate(p, cfg, s, lossy, dft_nf) <= VMEM_BUDGET:
            return s
    return None


def stream_pml_supported(p: Params, cfg: PMLConfig,
                         materials: Materials | None = None,
                         coefs: UpdateCoefs | None = None) -> bool:
    """True when the streaming-PML tier applies: everything the
    in-kernel two-pass tier admits, plus computation mode, homogeneous
    mu_r, a source patch clear of the j/i slabs, and a VMEM-feasible
    full-plane plan (lossy media stream six more coefficient windows,
    which costs a sweep depth at 256^3-class grids)."""
    if coefs is None:
        coefs = update_coefs(p, materials)
    if not kernel_pml_supported(p, cfg, materials, coefs):
        return False
    if p.mode != Mode.COMPUTATION:
        return False
    if coefs.heterogeneous_mu:
        return False  # het mu_r: 3 more windows — per-step tier for now
    lossy = not isinstance(coefs.ca_x, (int, float))
    n = cfg.cells
    plan = make_source_plan(p)
    if plan.j0 <= n or plan.j1 >= p.maxj - n:
        return False
    if plan.i0 <= n or plan.i1 >= p.maxi - n:
        return False
    return pick_pml_stream_s(p, cfg, lossy) is not None


def _kernel_pml(p: Params, f_h, f_e, patch, Ib, s, nk, n, Pj,
                sf_h, sf_e, sf_k, lossy, dft_nf, *refs):
    """One streaming-PML sweep step: s leapfrog steps + all 12 psi.

    The vacuum level body is line-equivalent to
    :func:`fdtd_tpu.ops.pallas_stream._kernel` (computation-mode,
    full-plane form); the psi machinery ports
    :func:`fdtd_tpu.ops.cpml_kernel._h_kernel_pml`/``_e_kernel_pml``
    into per-level windows.  ``sf_h`` = (hx_y, hz_y, hy_x, hz_x),
    ``sf_e`` = (ex_y, ez_y, ey_x, ez_x), ``sf_k`` = (hx_z, hy_z, ex_z,
    ey_z): host-folded sign * slab-constant factors.
    """
    tk = s
    (koff_ref, iex, iey, iez, ihx, ihy, ihz,
     ikp, ihj, ihi, iej, iei,
     de2_ref, dh2_ref, bck_ref,
     bjh_ref, cjh_ref, bih_ref, cih_ref,
     bje_ref, cje_ref, bie_ref, cie_ref) = refs[:23]
    refs = refs[23:]
    if lossy:
        coef_refs = refs[:6]
        refs = refs[6:]
    if dft_nf:
        wts_ref, daccin_ref = refs[:2]
        refs = refs[2:]
    (oex, oey, oez, ohx, ohy, ohz,
     okp, ohj, ohi, oej, oei) = refs[:11]
    refs = refs[11:]
    if dft_nf:
        odacc = refs[0]
        refs = refs[1:]
    (tex, tey, tez, thx, thy, thz,
     tkp, thj, thi, tej, tei) = refs[:11]
    if dft_nf:
        dbandr = refs[11]

    g = pl.program_id(0)
    K, J = p.maxk, p.maxj
    I = Ib
    L0 = g * tk + koff_ref[0, 0]

    @pl.when(g == 0)
    def _init():
        z = jnp.zeros(tex.shape, tex.dtype)
        for t in (tex, tey, tez, thx, thy, thz):
            t[:] = z
        tkp[:] = jnp.zeros(tkp.shape, tkp.dtype)
        thj[:] = jnp.zeros(thj.shape, thj.dtype)
        tej[:] = jnp.zeros(tej.shape, tej.dtype)
        thi[:] = jnp.zeros(thi.shape, thi.dtype)
        tei[:] = jnp.zeros(tei.shape, tei.dtype)
        if dft_nf:
            dbandr[:] = jnp.zeros(dbandr.shape, jnp.float32)

    st_dt = iex.dtype
    cd = jnp.float32 if st_dt == jnp.bfloat16 else st_dt
    cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz = (
        r[:].astype(cd) for r in (iex, iey, iez, ihx, ihy, ihz)
    )
    cur_kp = ikp[:].astype(cd)                        # (4, tk, J1, Ib)
    cur_hj = ihj[:].astype(cd)                        # (tk, Pj, Ib)
    cur_hi = ihi[:].astype(cd)                        # (tk, J1, 128)
    cur_ej = iej[:].astype(cd)
    cur_ei = iei[:].astype(cd)
    bckw = bck_ref[:].astype(cd)                      # (tk+s, 8, Ib)
    bjh = bjh_ref[:].astype(cd)
    cjh = cjh_ref[:].astype(cd)
    bih = bih_ref[:].astype(cd)
    cih = cih_ref[:].astype(cd)
    bje = bje_ref[:].astype(cd)
    cje = cje_ref[:].astype(cd)
    bie = bie_ref[:].astype(cd)
    cie = cie_ref[:].astype(cd)
    de2 = de2_ref[:].astype(cd)
    dh2 = dh2_ref[:].astype(cd)
    if lossy:
        # ca/cb rows [L0 - s, L0 + tk): every level's E rows live here
        # (the pallas_stream lossy-window discipline)
        caxw, cayw, cazw, cbxw, cbyw, cbzw = (
            r[:].astype(cd) for r in coef_refs
        )
    if dft_nf:
        # per-frequency rolling phasor bands as VALUES through the level
        # loop (the pallas_stream dft mechanism), written back per step
        dbands = [dbandr[i] for i in range(6 * dft_nf)]

    sfh = tuple(jnp.dtype(cd).type(v) for v in sf_h)
    sfe = tuple(jnp.dtype(cd).type(v) for v in sf_e)
    sfk = tuple(jnp.dtype(cd).type(v) for v in sf_k)

    j0p, j1p, i0p, i1p = patch
    plane = cur_ex.shape[1:]
    jj2 = jax.lax.broadcasted_iota(jnp.int32, plane, 0)
    ln2 = jax.lax.broadcasted_iota(jnp.int32, plane, 1)
    mrow = ((jj2 >= j0p) & (jj2 < j1p) & (ln2 >= i0p) & (ln2 < i1p))
    jm_j = (jj2 < J)[None]
    jm_j1 = (jj2 < J + 1)[None]
    jm_ex = ((jj2 >= 1) & (jj2 < J))[None]
    jm_ey = ((jj2 < J) & (ln2 >= 1))[None]
    jm_ez = ((jj2 >= 1) & (jj2 < J) & (ln2 >= 1))[None]
    ln_ge1 = (ln2 >= 1)[None]
    last_lane = (ln2 == Ib - 1)[None]
    in_j0 = ((jj2 < n) | ((jj2 >= J - n) & (jj2 < J)))[None]
    in_i0 = ((ln2 < n) | ((ln2 >= I - n) & (ln2 < I)))[None]
    in_j1 = (((jj2 >= 1) & (jj2 < 1 + n))
             | ((jj2 >= J - n) & (jj2 < J)))[None]
    in_i1 = (((ln2 >= 1) & (ln2 < 1 + n))
             | ((ln2 >= I - n) & (ln2 < I)))[None]

    zr = jnp.zeros((), cd)

    def krow(lo, m_):
        return jax.lax.broadcasted_iota(jnp.int32, (m_, 1, 1), 0) + lo

    def gather_j(d, js):
        return jnp.concatenate(
            [d[:, js : js + n, :], d[:, J - n : J, :]], axis=1)

    def gather_i(d, is_):
        return jnp.concatenate(
            [d[:, :, is_ : is_ + n], d[:, :, I - n : I]], axis=2)

    def scatter_j(v, js, J1):
        parts = []
        if js:
            parts.append(jnp.zeros((tk, js, Ib), cd))
        parts.append(v[:, :n, :])
        mid = J - 2 * n - js
        if mid:
            parts.append(jnp.zeros((tk, mid, Ib), cd))
        parts.append(v[:, n:, :])
        if J1 > J:
            parts.append(jnp.zeros((tk, J1 - J, Ib), cd))
        return jnp.concatenate(parts, axis=1)

    def scatter_i(v, is_):
        parts = []
        if is_:
            parts.append(jnp.zeros((tk, v.shape[1], is_), cd))
        parts.append(v[:, :, :n])
        mid = I - 2 * n - is_
        if mid:
            parts.append(jnp.zeros((tk, v.shape[1], mid), cd))
        parts.append(v[:, :, n:])
        return jnp.concatenate(parts, axis=2)

    # snapshot ALL retained tails before any level overwrites them
    t_ex = [tex[m] for m in range(s + 1)]
    t_ey = [tey[m] for m in range(s + 1)]
    t_ez = [tez[m] for m in range(s + 1)]
    t_hx = [thx[m] for m in range(s + 1)]
    t_hy = [thy[m] for m in range(s + 1)]
    t_hz = [thz[m] for m in range(s + 1)]
    t_kp = [tkp[m] for m in range(s + 1)]
    t_hj = [thj[m] for m in range(s + 1)]
    t_hi = [thi[m] for m in range(s + 1)]
    t_ej = [tej[m] for m in range(s + 1)]
    t_ei = [tei[m] for m in range(s + 1)]

    J1 = plane[0]

    for m in range(1, s + 1):
        o_m = L0 - m
        co = slice(s - m, s - m + tk)  # bck rows of this level
        ex_e = jnp.concatenate([t_ex[m - 1][None], cur_ex], axis=0)
        ey_e = jnp.concatenate([t_ey[m - 1][None], cur_ey], axis=0)
        ez_e = jnp.concatenate([t_ez[m - 1][None], cur_ez], axis=0)
        hx_p = jnp.concatenate([t_hx[m - 1][None], cur_hx[: tk - 1]], axis=0)
        hy_p = jnp.concatenate([t_hy[m - 1][None], cur_hy[: tk - 1]], axis=0)
        hz_p = jnp.concatenate([t_hz[m - 1][None], cur_hz[: tk - 1]], axis=0)
        kp_w = jnp.concatenate(
            [t_kp[m - 1][:, None], cur_kp[:, : tk - 1]], axis=1)
        hj_w = jnp.concatenate([t_hj[m - 1][None], cur_hj[: tk - 1]], axis=0)
        hi_w = jnp.concatenate([t_hi[m - 1][None], cur_hi[: tk - 1]], axis=0)
        ej_w = jnp.concatenate([t_ej[m - 1][None], cur_ej[: tk - 1]], axis=0)
        ei_w = jnp.concatenate([t_ei[m - 1][None], cur_ei[: tk - 1]], axis=0)

        if m >= 2:
            # source substitution into this level's INPUT VIEWS only
            # (main.c:770-778 injects at the start of step m; the psi
            # recursions below read these substituted views — the xla
            # source -> update -> correct ordering)
            m0e = (krow(o_m, tk + 1) == 0) & mrow[None, :, :]
            ez_e = jnp.where(m0e, de2[m - 2][None, :, :], ez_e)
            ex_e = jnp.where(m0e, zr, ex_e)
            m0h = m0e[:tk]
            hx_p = jnp.where(m0h, dh2[m - 2][None, :, :], hx_p)
            hz_p = jnp.where(m0h, zr, hz_p)

        # save level m-1's new tails
        tex[m - 1] = cur_ex[tk - 1]
        tey[m - 1] = cur_ey[tk - 1]
        tez[m - 1] = cur_ez[tk - 1]
        thx[m - 1] = cur_hx[tk - 1]
        thy[m - 1] = cur_hy[tk - 1]
        thz[m - 1] = cur_hz[tk - 1]
        tkp[m - 1] = cur_kp[:, tk - 1]
        thj[m - 1] = cur_hj[tk - 1]
        thi[m - 1] = cur_hi[tk - 1]
        tej[m - 1] = cur_ej[tk - 1]
        tei[m - 1] = cur_ei[tk - 1]

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
        not_p = ~((kv == 0) & mrow[None])
        m_hx = k_lt_K & jm_j & not_p
        m_hz = (kv < K + 1) & jm_j & not_p
        m_hy = jnp.broadcast_to(k_lt_K, hx_p.shape)
        hx_n = jnp.where(m_hx, hx_p + f_h * inc_hx, hx_p)
        hy_n = jnp.where(m_hy, hy_p + f_h * inc_hy, hy_p)
        hz_n = jnp.where(m_hz, hz_p + f_h * inc_hz, hz_p)

        # ---- H psi: j/i packs (cpml_kernel calculus, level windows) ----
        d_hxy = ez_py - ez0
        d_hzy = ex_py - ex0
        gslab = jax.lax.broadcasted_iota(jnp.int32, (tk, 2 * n, Ib), 0) + o_m
        p_hxy = hj_w[:, 0 : 2 * n, :]
        r_hxy = jnp.where(gslab < K,
                          bjh[:, 0 : 2 * n] * p_hxy
                          + cjh[:, 0 : 2 * n] * gather_j(d_hxy, 0),
                          p_hxy)
        p_hzy = hj_w[:, 2 * n : 4 * n, :]
        r_hzy = jnp.where(gslab < K + 1,
                          bjh[:, 2 * n : 4 * n] * p_hzy
                          + cjh[:, 2 * n : 4 * n] * gather_j(d_hzy, 0),
                          p_hzy)
        # i-terms: strips are frozen zero in computation mode, so the
        # last-lane strip coupling (cpml_kernel's adj_y/adj_z) is 0 —
        # ez_px/ey_px already read 0 there via the last_lane where.
        g_hyx = gather_i(ez_px - ez0, 0)
        g_hzx = gather_i(ey_px - ey0, 0)
        gki = jax.lax.broadcasted_iota(jnp.int32, g_hyx.shape, 0) + o_m
        jji = jax.lax.broadcasted_iota(jnp.int32, g_hyx.shape, 1)
        p_hyx = hi_w[:, :, 0 : 2 * n]
        r_hyx = jnp.where((gki < K) & (jji < J + 1),
                          bih[:, :, 0 : 2 * n] * p_hyx
                          + cih[:, :, 0 : 2 * n] * g_hyx,
                          p_hyx)
        p_hzx = hi_w[:, :, 2 * n : 4 * n]
        r_hzx = jnp.where((gki < K + 1) & (jji < J),
                          bih[:, :, 2 * n : 4 * n] * p_hzx
                          + cih[:, :, 2 * n : 4 * n] * g_hzx,
                          p_hzx)
        # per-target add order matches _TERMS: j/i adds, then k adds
        hx_n = jnp.where(in_j0 & k_lt_K,
                         hx_n + scatter_j(sfh[0] * r_hxy, 0, J1), hx_n)
        hy_n = jnp.where(in_i0 & k_lt_K & jm_j1,
                         hy_n + scatter_i(sfh[2] * r_hyx, 0), hy_n)
        hz_n = jnp.where(in_j0 & (kv < K + 1),
                         hz_n + scatter_j(sfh[1] * r_hzy, 0, J1), hz_n)
        hz_n = jnp.where(in_i0 & (kv < K + 1) & jm_j,
                         hz_n + scatter_i(sfh[3] * r_hzx, 0), hz_n)

        # ---- H psi: k-terms (full-k embed; b=1, c=0 keeps zeros) ----
        def bc_k(t):
            # (tk, 1, Ib): sublane-only broadcast (see _bck_rows)
            b = bckw[co, 2 * t : 2 * t + 1, :]
            c = bckw[co, 2 * t + 1 : 2 * t + 2, :]
            return b, c

        b0, c0 = bc_k(0)  # hx_z, d = ey1 - ey0
        m_hxz = k_lt_K & jm_j
        r_hxz = jnp.where(m_hxz, b0 * kp_w[0] + c0 * (ey1 - ey0), kp_w[0])
        # xla overwrites patch Hx with the second source application
        # right after the H corrections — mask the ADD (not the
        # recursion) off the k = 0 patch cells for the same net state
        hx_n = jnp.where(m_hxz & not_p, hx_n + sfk[0] * r_hxz, hx_n)
        b1, c1 = bc_k(1)  # hy_z, d = ex1 - ex0
        m_hyz = k_lt_K & jm_j1
        r_hyz = jnp.where(m_hyz, b1 * kp_w[1] + c1 * (ex1 - ex0), kp_w[1])
        hy_n = jnp.where(m_hyz, hy_n + sfk[1] * r_hyz, hy_n)

        # ---- E^m (reads own-level H tails at o_m - 1, post-correction) ----
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
        k_in = (kv >= 1) & k_lt_K
        m_ex = k_in & jm_ex
        m_ey = k_in & jm_ey
        m_ez = k_lt_K & jm_ez
        if lossy:
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

        # ---- E psi: j/i packs ----
        d_exy = hz0 - hz_my
        d_ezy = hx0 - hx_my
        d_eyx = hz0 - hz_mx
        d_ezx = hy0 - hy_mx
        gslab_e = gslab  # same iota + o_m
        lslabj = jax.lax.broadcasted_iota(jnp.int32, (tk, 2 * n, Ib), 2)
        p_exy = ej_w[:, 0 : 2 * n, :]
        r_exy = jnp.where((gslab_e >= 1) & (gslab_e < K),
                          bje[:, 0 : 2 * n] * p_exy
                          + cje[:, 0 : 2 * n] * gather_j(d_exy, 1),
                          p_exy)
        p_ezy = ej_w[:, 2 * n : 4 * n, :]
        r_ezy = jnp.where((gslab_e < K) & (lslabj >= 1),
                          bje[:, 2 * n : 4 * n] * p_ezy
                          + cje[:, 2 * n : 4 * n] * gather_j(d_ezy, 1),
                          p_ezy)
        g_eyx = gather_i(d_eyx, 1)
        g_ezx = gather_i(d_ezx, 1)
        p_eyx = ei_w[:, :, 0 : 2 * n]
        r_eyx = jnp.where((gki >= 1) & (gki < K) & (jji < J),
                          bie[:, :, 0 : 2 * n] * p_eyx
                          + cie[:, :, 0 : 2 * n] * g_eyx,
                          p_eyx)
        p_ezx = ei_w[:, :, 2 * n : 4 * n]
        r_ezx = jnp.where((gki < K) & (jji >= 1) & (jji < J),
                          bie[:, :, 2 * n : 4 * n] * p_ezx
                          + cie[:, :, 2 * n : 4 * n] * g_ezx,
                          p_ezx)
        ex_n = jnp.where(in_j1 & k_in,
                         ex_n + scatter_j(sfe[0] * r_exy, 1, J1), ex_n)
        ey_n = jnp.where(in_i1 & k_in & jm_j,
                         ey_n + scatter_i(sfe[2] * r_eyx, 1), ey_n)
        ez_n = jnp.where(in_i1 & k_lt_K & jm_ex,
                         ez_n + scatter_i(sfe[3] * r_ezx, 1), ez_n)
        ez_n = jnp.where(in_j1 & k_lt_K & ln_ge1,
                         ez_n + scatter_j(sfe[1] * r_ezy, 1, J1), ez_n)

        # ---- E psi: k-terms ----
        b2, c2 = bc_k(2)  # ex_z, d = hy0 - hy_m1
        m_exz = k_in & jm_ex
        r_exz = jnp.where(m_exz, b2 * kp_w[2] + c2 * (hy0 - hy_m1), kp_w[2])
        ex_n = jnp.where(m_exz, ex_n + sfk[2] * r_exz, ex_n)
        b3, c3 = bc_k(3)  # ey_z, d = hx0 - hx_m1
        # lane 0 is outside ey's i >= 1 region: keep it zero so kp
        # stays exactly its canonical embed (pack/unpack invariant)
        m_eyz = k_in & jm_j & ln_ge1
        r_eyz = jnp.where(m_eyz, b3 * kp_w[3] + c3 * (hx0 - hx_m1), kp_w[3])
        ey_n = jnp.where(m_eyz, ey_n + sfk[3] * r_eyz, ey_n)

        if dft_nf:
            # cell rows [o_m - 1, o_m + tk - 1): E^m = own old tail +
            # fresh (post-ALL-corrections, matching the xla step's final
            # E; frozen strips are zero in computation mode, so these
            # in-kernel cell means equal the canonical ones)
            exs = jnp.concatenate([t_ex[m][None], ex_n], axis=0)
            eys = jnp.concatenate([t_ey[m][None], ey_n], axis=0)
            ezs = jnp.concatenate([t_ez[m][None], ez_n], axis=0)
            a, b = exs[:tk], exs[1:]
            mex = 0.25 * (a + b + jnp.roll(a, -1, axis=1)
                          + jnp.roll(b, -1, axis=1))
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
            m_cell = (kv_c >= 0) & (kv_c < K) & jm_j
            b0 = 2 * tk - m - 1  # band row of cell row o_m - 1

            def band_add(bandv, inc):
                tail_sh = (3 * tk - b0 - tk,) + inc.shape[1:]
                return bandv + jnp.concatenate(
                    [jnp.zeros((b0,) + inc.shape[1:], jnp.float32), inc,
                     jnp.zeros(tail_sh, jnp.float32)],
                    axis=0,
                )

            zf32 = jnp.float32(0.0)
            for fi in range(dft_nf):
                cw = wts_ref[m - 1, fi]
                sw = wts_ref[m - 1, dft_nf + fi]
                for ci, me in enumerate((mex, mey, mez)):
                    mef = me.astype(jnp.float32)
                    base = (fi * 3 + ci) * 2
                    dbands[base] = band_add(
                        dbands[base], jnp.where(m_cell, cw * mef, zf32))
                    dbands[base + 1] = band_add(
                        dbands[base + 1],
                        jnp.where(m_cell, (-sw) * mef, zf32))

        cur_ex, cur_ey, cur_ez = ex_n, ey_n, ez_n
        cur_hx, cur_hy, cur_hz = hx_n, hy_n, hz_n
        cur_kp = jnp.stack([r_hxz, r_hyz, r_exz, r_eyz])
        cur_hj = jnp.concatenate(
            [r_hxy, r_hzy] + ([hj_w[:, 4 * n :, :]] if Pj > 4 * n else []),
            axis=1)
        cur_hi = jnp.concatenate(
            [r_hyx, r_hzx] + ([hi_w[:, :, 4 * n :]] if 4 * n < 128 else []),
            axis=2)
        cur_ej = jnp.concatenate(
            [r_exy, r_ezy] + ([ej_w[:, 4 * n :, :]] if Pj > 4 * n else []),
            axis=1)
        cur_ei = jnp.concatenate(
            [r_eyx, r_ezx] + ([ei_w[:, :, 4 * n :]] if 4 * n < 128 else []),
            axis=2)

    # save level s's tails
    tex[s] = cur_ex[tk - 1]
    tey[s] = cur_ey[tk - 1]
    tez[s] = cur_ez[tk - 1]
    thx[s] = cur_hx[tk - 1]
    thy[s] = cur_hy[tk - 1]
    thz[s] = cur_hz[tk - 1]
    tkp[s] = cur_kp[:, tk - 1]
    thj[s] = cur_hj[tk - 1]
    thi[s] = cur_hi[tk - 1]
    tej[s] = cur_ej[tk - 1]
    tei[s] = cur_ei[tk - 1]

    outs = (oex, oey, oez, ohx, ohy, ohz, ohj, ohi, oej, oei)
    vals = (cur_ex, cur_ey, cur_ez, cur_hx, cur_hy, cur_hz,
            cur_hj, cur_hi, cur_ej, cur_ei)

    @pl.when((g == 0) | (g > nk))
    def _dead():
        for o in outs:
            o[:] = jnp.zeros(o.shape, st_dt)
        okp[:] = jnp.zeros(okp.shape, st_dt)

    @pl.when((g > 0) & (g <= nk))
    def _emit():
        for o, v in zip(outs, vals):
            o[:] = v.astype(st_dt)
        okp[:] = cur_kp.astype(st_dt)

    if dft_nf:
        # cell block g-2 completes at step g (level s's bottom row is
        # its last contribution); one extra drain step (grid nk+ofs+1)
        # emits the final block — the pallas_stream dft schedule
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


def build_stream_pml_call(p: Params, cfg: PMLConfig, coefs: UpdateCoefs,
                          interpret: bool, s: int, dft_nf: int = 0):
    """The streaming-PML sweep pallas_call.

    ``call(koff, ex..hz, kp, h_j, h_i, e_j, e_i, de2, dh2[, coef6]
    [, wts, dacc]) -> (ex..hz, kp, h_j, h_i, e_j, e_i[, dacc])`` — 11
    aliased in/out pairs (12 with the in-kernel DFT accumulator).
    """
    S, J1, Ib = dims(p)
    n = cfg.cells
    Pj = _pad8(4 * n)
    tk = s
    ofs = D // tk
    assert D % tk == 0 and (S - D) % tk == 0, (S, D, tk)
    nk = (S - D) // tk
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    lossy = not isinstance(coefs.ca_x, (int, float))
    assert not coefs.heterogeneous_mu, "het mu keeps the per-step tier"
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    f_e = compute_dtype.type(0.0) if lossy else compute_dtype.type(coefs.cb_x)
    assert p.mode == Mode.COMPUTATION
    plan = make_source_plan(p)
    patch = (plan.j0, plan.j1, plan.i0, plan.i1)
    nd = max(s - 1, 1)

    fac = slab_factor_constants(p, cfg, coefs)
    if fac is None:
        raise ValueError("streaming CPML needs slab-constant factors")
    sf_h = (-fac["hx_y"], +fac["hz_y"], +fac["hy_x"], -fac["hz_x"])
    sf_e = (+fac["ex_y"], -fac["ez_y"], -fac["ey_x"], +fac["ez_x"])
    sf_k = (+fac["hx_z"], -fac["hy_z"], -fac["ex_z"], +fac["ey_z"])
    bc = _bc_vectors(p, cfg, dtype)
    bck = _bck_rows(p, cfg, dtype)

    # k-slab block range: blocks of the (4, S, J1, Ib) embed that can
    # hold nonzero psi (E-term lo slabs start one row later — the
    # union starts at D and needs no distinction at block granularity)
    lo_b0, lo_b1 = D // tk, (D + n) // tk
    hi_b0, hi_b1 = (D + p.maxk - n) // tk, (D + p.maxk - 1) // tk

    def in_slab(kb):
        return ((kb >= lo_b0) & (kb <= lo_b1)) | ((kb >= hi_b0) & (kb <= hi_b1))

    bulk_shape = jax.ShapeDtypeStruct((S, J1, Ib), dtype)
    kp_shape = jax.ShapeDtypeStruct((4, S, J1, Ib), dtype)
    hj_shape = jax.ShapeDtypeStruct((S, Pj, Ib), dtype)
    hi_shape = jax.ShapeDtypeStruct((S, J1, 128), dtype)
    dacc_shape = jax.ShapeDtypeStruct((6 * dft_nf, S, J1, Ib), jnp.float32)
    grid = (nk + ofs + (1 if dft_nf else 0),)

    def in_k(g):
        return jnp.where(g < nk, g + ofs, 0)

    def out_k(g):
        return jnp.where(g <= nk, g + ofs - 1,
                         jnp.minimum(g - nk - 1, ofs - 1))

    in_blk = pl.BlockSpec((tk, J1, Ib), lambda g: (in_k(g), 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((tk, J1, Ib), lambda g: (out_k(g), 0, 0),
                           memory_space=pltpu.VMEM)
    # kp: middle blocks are identically zero — redirect them to dead
    # block 0 (zeros in, zeros out; a fetch happens only on index
    # change, so kp traffic ~ the slab blocks).  The in-place alias on
    # the redirected block is benign: every value involved is 0.0.
    kp_in = pl.BlockSpec(
        (4, tk, J1, Ib),
        lambda g: (0, jnp.where(in_slab(in_k(g)), in_k(g), 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kp_out = pl.BlockSpec(
        (4, tk, J1, Ib),
        lambda g: (0, jnp.where(in_slab(out_k(g)), out_k(g), 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    hj_blk_i = pl.BlockSpec((tk, Pj, Ib), lambda g: (in_k(g), 0, 0),
                            memory_space=pltpu.VMEM)
    hj_blk_o = pl.BlockSpec((tk, Pj, Ib), lambda g: (out_k(g), 0, 0),
                            memory_space=pltpu.VMEM)
    hi_blk_i = pl.BlockSpec((tk, J1, 128), lambda g: (in_k(g), 0, 0),
                            memory_space=pltpu.VMEM)
    hi_blk_o = pl.BlockSpec((tk, J1, 128), lambda g: (out_k(g), 0, 0),
                            memory_space=pltpu.VMEM)
    drv_spec = pl.BlockSpec((nd, J1, Ib), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    bck_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(8), pl.Element(Ib)),
        lambda g: ((jnp.minimum(g, nk) + ofs) * tk - s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bcj = pl.BlockSpec((1, Pj, 1), lambda g: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    bci = pl.BlockSpec((1, 1, 128), lambda g: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    wts_smem = pl.BlockSpec((s, 2 * dft_nf), lambda g: (0, 0),
                            memory_space=pltpu.SMEM)
    # phasor blocks trail the fields by two (pallas_stream's schedule)
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
    coef_win = pl.BlockSpec(
        (pl.Element(tk + s, (0, 2 * s)), pl.Element(J1), pl.Element(Ib)),
        lambda g: ((jnp.minimum(g, nk) + ofs) * tk - s, 0, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = (
        [smem] + [in_blk] * 6 + [kp_in, hj_blk_i, hi_blk_i, hj_blk_i,
                                 hi_blk_i]
        + [drv_spec] * 2 + [bck_win]
        + [bcj, bcj, bci, bci, bcj, bcj, bci, bci]
        + ([coef_win] * 6 if lossy else [])
        + ([wts_smem, dacc_blk] if dft_nf else [])
    )
    n_in = len(in_specs)
    out_specs = [out_blk] * 6 + [kp_out, hj_blk_o, hi_blk_o, hj_blk_o,
                                 hi_blk_o] + ([dacc_blk] if dft_nf else [])
    out_shape = (bulk_shape,) * 6 + (kp_shape, hj_shape, hi_shape,
                                     hj_shape, hi_shape) \
        + ((dacc_shape,) if dft_nf else ())
    aliases = {} if interpret else {i + 1: i for i in range(11)}
    if dft_nf and not interpret:
        aliases[n_in - 1] = 11
    tail = pltpu.VMEM((s + 1, J1, Ib), compute_dtype)
    scratch = [tail] * 6 + [
        pltpu.VMEM((s + 1, 4, J1, Ib), compute_dtype),   # kp tails
        pltpu.VMEM((s + 1, Pj, Ib), compute_dtype),      # h_j tails
        pltpu.VMEM((s + 1, J1, 128), compute_dtype),     # h_i tails
        pltpu.VMEM((s + 1, Pj, Ib), compute_dtype),      # e_j tails
        pltpu.VMEM((s + 1, J1, 128), compute_dtype),     # e_i tails
    ] + ([pltpu.VMEM((6 * dft_nf, 3 * tk, J1, Ib), jnp.float32)]
         if dft_nf else [])
    inner = pl.pallas_call(
        functools.partial(_kernel_pml, p, f_h, f_e, patch, Ib, s, nk,
                          n, Pj, sf_h, sf_e, sf_k, lossy, dft_nf),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        interpret=interpret,
    )

    def call(koff, ex, ey, ez, hx, hy, hz, kp, h_j, h_i, e_j, e_i,
             de2, dh2, *coef6, wts=None, dacc=None):
        args = [koff, ex, ey, ez, hx, hy, hz, kp, h_j, h_i, e_j, e_i,
                de2, dh2, jnp.asarray(bck),
                jnp.asarray(bc[0]), jnp.asarray(bc[1]),
                jnp.asarray(bc[2]), jnp.asarray(bc[3]),
                jnp.asarray(bc[4]), jnp.asarray(bc[5]),
                jnp.asarray(bc[6]), jnp.asarray(bc[7])] + list(coef6)
        if dft_nf:
            args += [wts, dacc]
        return inner(*args)

    return call, nd


def make_stream_pml_group_step(p: Params, cfg: PMLConfig,
                               coefs: UpdateCoefs,
                               interpret: bool | None = None,
                               s: int | None = None,
                               dft_nf: int = 0):
    """``group_step((st, ps), (ts, amps)) -> (st, ps)`` advancing
    ``group_step.s`` steps per sweep on ``(StrippedState, PsiStream)``.
    With ``dft_nf``: ``group_step(carry, xs, wts_rows=(cw, sw),
    dacc=...) -> (carry, dacc)`` — the stacked-layout phasor
    accumulator rides the sweep."""
    import os

    if s is None:
        env = os.environ.get("FDTD_STREAM_PML_S")
        s = int(env) if env else pick_pml_stream_s(
            p, cfg, not isinstance(coefs.ca_x, (int, float)))
    if s is None:
        raise NotImplementedError("no VMEM-feasible streaming-PML plan")
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    call, nd = build_stream_pml_call(p, cfg, coefs, interpret, s, dft_nf)
    lossy = not isinstance(coefs.ca_x, (int, float))
    S, J1, Ib = dims(p)
    dtype = jnp.dtype(p.dtype)
    plan = make_source_plan(p)
    zoff = np.zeros((1, 1), np.int32)
    zero_drv = np.zeros((nd, J1, Ib), dtype)

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

    def group_step(carry, xs_group, wts_rows=None, dacc=None):
        st, ps = carry
        _ts_g, amps_g = xs_group
        st = inject_state(st, drive_patch(amps_g[0]))
        sl = (slice(0, nd), slice(plan.j0, plan.j1),
              slice(plan.i0, plan.i1))
        pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
        de2 = jnp.asarray(zero_drv).at[sl].set(pvs.astype(dtype))
        dh2 = jnp.asarray(zero_drv).at[sl].set(
            (-plan.inv_z_te * pvs).astype(dtype))
        coef6 = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy else ()
        )
        kw = {}
        if dft_nf:
            cw_g, sw_g = wts_rows
            kw = dict(wts=jnp.concatenate([cw_g, sw_g], axis=1),
                      dacc=dacc)
        outs = call(
            jnp.asarray(zoff), st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            ps.kp, ps.h_j, ps.h_i, ps.e_j, ps.e_i, de2, dh2, *coef6,
            **kw)
        ex, ey, ez, hx, hy, hz, kp, hj, hi, ej, ei = outs[:11]
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez,
                                 hx=hx, hy=hy, hz=hz)
        # the hx_s strip advance is an exact no-op in computation mode
        # (ey_s/ez_s are PEC-frozen at zero, so its curl and its hx_y
        # strip psi are identically zero) — skipped by design
        carry = (st, PsiStream(kp=kp, h_j=hj, h_i=hi, e_j=ej, e_i=ei))
        if dft_nf:
            return carry, outs[11]
        return carry

    group_step.s = s
    return group_step


def make_stream_pml_chunk_runner(p: Params, cfg: PMLConfig,
                                 materials: Materials | None = None,
                                 interpret: bool | None = None,
                                 s: int | None = None):
    """Jitted ``run((st, ps), xs, power) -> ((st, ps), power)`` — the
    streaming analogue of :func:`fdtd_tpu.ops.cpml_kernel.
    make_pml_kernel_chunk_runner` (same donation contract; power is a
    pass-through — the tier is vacuum-only).  Odd trailing steps run
    the per-step in-kernel two-pass tier through the exact
    :func:`stream_to_packed`/:func:`packed_to_stream` round trip."""
    coefs = update_coefs(p, materials)
    group_step = make_stream_pml_group_step(p, cfg, coefs, interpret, s)
    sgrp = group_step.s
    odd_step = make_pml_kernel_step(p, cfg, coefs, interpret)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs, power_acc=None):
        ts, amps = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // sgrp
        if n_grp:
            gts = (ts[: sgrp * n_grp].reshape(n_grp, sgrp),
                   amps[: sgrp * n_grp].reshape(n_grp, sgrp))

            def body(c, x):
                return group_step(c, x), None

            carry, _ = jax.lax.scan(body, carry, gts)
        for r in range(nsteps % sgrp):
            idx = sgrp * n_grp + r
            st, ps = carry
            st, pp = odd_step((st, stream_to_packed(p, cfg, ps)),
                              (ts[idx], amps[idx]))
            carry = (st, packed_to_stream(p, cfg, pp))
        return carry, power_acc

    return run


def stream_pml_dft_supported(p: Params, cfg: PMLConfig, dft,
                             materials: Materials | None = None) -> bool:
    """True when the OPEN-BOUNDARY in-kernel DFT rides the streaming
    tier: everything :func:`stream_pml_supported` admits, E phasors
    only, and a plan that still fits with the 6*nf phasor tiles."""
    if dft is None or dft.fields != "e":
        return False
    coefs = update_coefs(p, materials)
    if not stream_pml_supported(p, cfg, materials, coefs):
        return False
    lossy = not isinstance(coefs.ca_x, (int, float))
    return pick_pml_stream_s(p, cfg, lossy, dft.nf) is not None


def make_stream_pml_dft_chunk_runner(p: Params, cfg: PMLConfig,
                                     materials: Materials | None,
                                     dft,
                                     accumulate_power: bool = False,
                                     interpret: bool | None = None,
                                     s: int | None = None):
    """Monitored streaming-PML runner: the open-boundary steady-state
    phasor rides the WAVEFRONT tier (the per-frequency rolling bands of
    :mod:`fdtd_tpu.ops.pallas_stream`, fed by the in-level cell means).

    ``run((st, ps), (ts, amps, cw, sw), power, dft_acc) ->
    ((st, ps), power, dft_acc, None)`` — the monitored-chunk contract.
    ``dft_acc`` is canonical (re, im) at chunk boundaries (checkpoint-
    compatible with every monitored tier).  Odd trailing steps run the
    per-step in-kernel tier + the blocked accumulation pass
    (:func:`fdtd_tpu.ops.pallas_stream.build_dft_accum_call`), through
    the exact stream<->packed conversions.  fields='e', computation
    mode, SAR off (per-step states)."""
    import os

    from .pallas_stream import (
        build_dft_accum_call,
        crop_dft_acc,
        embed_dft_acc,
    )

    nf = dft.nf
    assert dft.fields == "e", "in-kernel DFT carries E phasors only"
    assert not accumulate_power, "SAR needs per-step states"
    coefs = update_coefs(p, materials)
    lossy = not isinstance(coefs.ca_x, (int, float))
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    if s is None:
        env = os.environ.get("FDTD_STREAM_PML_S")
        s = int(env) if env else pick_pml_stream_s(p, cfg, lossy, nf)
    if s is None:
        raise NotImplementedError("no VMEM-feasible streaming-PML DFT plan")
    group_step = make_stream_pml_group_step(p, cfg, coefs, interpret, s,
                                            dft_nf=nf)
    sgrp = group_step.s
    odd_step = make_pml_kernel_step(p, cfg, coefs, interpret)
    accum = build_dft_accum_call(p, nf, interpret)

    @functools.partial(jax.jit, donate_argnums=(0, 3))
    def run(carry, xs, power_acc, dft_acc):
        ts, amps, cw, sw = xs
        dacc = embed_dft_acc(p, dft_acc, nf)
        nsteps = ts.shape[0]
        n_grp = nsteps // sgrp
        if n_grp:
            g = lambda a: a[: sgrp * n_grp].reshape((n_grp, sgrp)
                                                    + a.shape[1:])
            gts = (g(ts), g(amps), g(jnp.asarray(cw)), g(jnp.asarray(sw)))

            def body(c, x):
                carry, dacc = c
                carry, dacc = group_step(carry, x[:2], wts_rows=x[2:],
                                         dacc=dacc)
                return (carry, dacc), None

            (carry, dacc), _ = jax.lax.scan(body, (carry, dacc), gts)
        for r in range(nsteps % sgrp):
            idx = sgrp * n_grp + r
            st, ps = carry
            st, pp = odd_step((st, stream_to_packed(p, cfg, ps)),
                              (ts[idx], amps[idx]))
            carry = (st, packed_to_stream(p, cfg, pp))
            wrow = jnp.concatenate(
                [jnp.asarray(cw)[idx], jnp.asarray(sw)[idx]])[None, :]
            dacc = accum(st.ex, st.ey, st.ez, wrow, dacc)
        return carry, power_acc, crop_dft_acc(p, dacc, nf), None

    return run
