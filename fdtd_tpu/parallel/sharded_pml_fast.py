"""CPML on the 1-D z-sharded two-pass Pallas fast path.

The multi-chip analogue of :mod:`fdtd_tpu.ops.cpml_fast`: each shard
runs the two-pass Pallas kernels for the curls
(:func:`fdtd_tpu.ops.pallas_fused.build_twopass_calls`, exactly as the
closed-cavity sharded fast path does) and the kappa=1 CPML psi
recursion applies as XLA slab updates between the passes.  Step order
matches the single-chip fast composition:

    [inject] -> { E top-halo exchange ; H kernel ; bulk h_correct }
    -> Hx-strip advance -> strip h_correct -> [inject]
    -> { H bottom-halo exchange ; E kernel ; bulk e_correct }

Two design points make the traced code mask-free and SPMD-uniform:

- **j/i-axis slab terms** (slabs along the unsharded axes, spanning all
  k rows): psi lives over every per-shard storage row and the (b, c)
  recursion coefficients are HOST-PRECOMPUTED per-shard constants with
  the physical-row and region-k masks folded in — off-region rows get
  (b, c) = (1, 0), so psi stays identically zero there and the field
  add of ``f * 0`` is an exact no-op.
- **k-axis slab terms** (slabs at the global k ends, owned by boundary
  shards — or straddling two shards on small grids): each rank applies
  two ``cells``-row windows at host-precomputed, rank-clamped offsets
  (``lax.dynamic_slice``); the per-window (b, c) constants are zero
  wherever the window row is not a true slab row of that rank, so
  non-owner ranks run the identical program on dead data.

The i=maxi Hx strip column (reference Hx bounds i < maxi+1,
main.c:445-449) is corrected on the replicated canonical strips outside
the shard_map — its sources (Ey/Ez strips) are replicated and frozen,
so every rank computes bit-identical strip psi.

Correction factors must be slab-constant
(:func:`fdtd_tpu.ops.cpml_fast.slab_factor_constants`): vacuum, or
materials clear of the absorber.  Supported meshes: 1-D z with
``Klp >= cfg.cells`` (the window clamp needs one window per slab per
rank); otherwise the jnp shard_map PML path is the fallback.

Parity vs the single-chip fast composition: BIT-equal where pinned
(2-way computation mode; 4-way validation mode, fields and psi), and
ulp-level (~1e-16 rel fp64) in deeper source-driven decompositions —
isolated to compiler fusion context around the kernels (e.g. FMA
contraction of ``e + f*curl``), not the correction machinery: with the
psi profiles forced to (b, c) = (1, 0) the same last-ulp deltas remain,
and every psi value matches bit-exactly.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import Mode, Params
from ..state import Materials, update_coefs
from ..ops.cpml import (
    PMLConfig,
    _TERMS,
    _check_cfg,
    _profile,
    _slab_slices,
    _update_regions,
    build_plan,
)
from ..ops.cpml_fast import slab_factor_constants
from ..ops.pallas_fused import (
    D,
    build_twopass_calls,
    make_inject_source,
    tile_k,
)
from .sharded_fast import (
    ShardedFastState,
    _advance_hx_strip,
    _geometry,
    make_sharded_power_inc,
)

# terms whose target slab spans the i = maxi strip column (target hx)
_STRIP_TERMS = ("hx_z", "hx_y")


def sharded_pml_fast_supported(p: Params, cfg: PMLConfig, n: int,
                               materials: Materials | None = None) -> bool:
    """True when the sharded CPML fast composition applies: 1-D z mesh
    geometry with local slabs at least ``cells`` rows deep, and
    slab-constant correction factors (materials clear of the absorber).
    """
    try:
        _check_cfg(p, cfg)
    except ValueError:
        return False
    _, _, _, _, Klp, _ = _geometry(p, n)
    if Klp < cfg.cells:
        return False
    coefs = update_coefs(p, materials)
    return slab_factor_constants(p, cfg, coefs) is not None


def _host_plan(p: Params, cfg: PMLConfig, n: int, dt):
    """Per-term sharded-layout correction plans (host-precomputed).

    Returns ``(k_terms, ji_terms, strip_terms)``:

    - ``k_terms[name] = (sign, src, target, jsl, isl, w_off, b, c)`` —
      per-rank window offsets ``w_off`` (n, 2) int32 in local storage
      rows, and (n*2*cells, 1, 1) recursion constants, zero off-slab.
    - ``ji_terms[name] = (sign, axis, src, target, lo_sl, hi_sl, jsl,
      isl, b, c)`` — (n*S_sh, ...)-shaped constants with the physical /
      region-k masks folded in.
    - ``strip_terms[name] = (sign, axis, lo_sl, hi_sl, b, c)`` — the
      canonical single-chip plan rows for the i = maxi Hx strip column.
    """
    npml = cfg.cells
    regions = _update_regions(p)
    extents = {0: p.maxk, 1: p.maxj, 2: p.maxi}
    _, _, _, _, Klp, S_sh = _geometry(p, n)
    I = p.maxi

    k_terms, ji_terms = {}, {}
    for name, target, sign, axis, src, e_pass in _TERMS:
        reg = regions[target]
        off = 0.0 if e_pass else 0.5
        # bulk spans on the non-k axes (the strip column is separate)
        jsl = (reg[1].start, reg[1].stop)
        isl = (reg[2].start, min(reg[2].stop, I))
        if axis == 0:
            lo_start, hi_start = reg[0].start, reg[0].stop - npml
            w_off = np.zeros((n, 2), np.int32)
            b = np.ones((n * 2 * npml, 1, 1), np.float64)
            c = np.zeros((n * 2 * npml, 1, 1), np.float64)
            for r in range(n):
                for w, start in enumerate((lo_start, hi_start)):
                    wl = int(np.clip(start - r * Klp, 0, Klp - npml)) + D
                    w_off[r, w] = wl
                    g = r * Klp + (wl - D) + np.arange(npml)
                    in_slab = (g >= start) & (g < start + npml)
                    bw, cw = _profile(g.astype(np.float64) + off,
                                      extents[axis], p, cfg)
                    rows = slice(r * 2 * npml + w * npml,
                                 r * 2 * npml + (w + 1) * npml)
                    b[rows, 0, 0] = np.where(in_slab, bw, 1.0)
                    c[rows, 0, 0] = np.where(in_slab, cw, 0.0)
            k_terms[name] = (sign, src, target, jsl, isl,
                             jnp.asarray(w_off),
                             jnp.asarray(b, dt), jnp.asarray(c, dt))
        else:
            lo_sl, hi_sl = _slab_slices(reg, axis, npml)
            pos = np.concatenate([
                np.arange(lo_sl[axis].start, lo_sl[axis].stop,
                          dtype=np.float64),
                np.arange(hi_sl[axis].start, hi_sl[axis].stop,
                          dtype=np.float64),
            ]) + off
            b1, c1 = _profile(pos, extents[axis], p, cfg)
            shape = [1, 1, 1]
            shape[axis] = 2 * npml
            b1 = b1.reshape(shape)
            c1 = c1.reshape(shape)
            # physical-row + region-k mask, folded into (b, c)
            t = np.arange(n * S_sh)
            g = (t // S_sh) * Klp + (t % S_sh) - D
            valid = (
                (t % S_sh >= D) & (t % S_sh < D + Klp)
                & (g >= reg[0].start) & (g < reg[0].stop)
            )[:, None, None]
            b = np.where(valid, np.broadcast_to(b1, (n * S_sh, *shape[1:])),
                         1.0)
            c = np.where(valid, np.broadcast_to(c1, (n * S_sh, *shape[1:])),
                         0.0)
            ji_terms[name] = (sign, axis, src, target, lo_sl, hi_sl, jsl,
                              isl, jnp.asarray(b, dt), jnp.asarray(c, dt))

    strip_terms = {}
    plan = build_plan(p, cfg, dt)
    for name in _STRIP_TERMS:
        lo_sl, hi_sl, sign, axis, _src, _tg, b, c = plan[name]
        strip_terms[name] = (sign, axis, lo_sl, hi_sl, b, c)
    return k_terms, ji_terms, strip_terms


def _psi_shapes(p: Params, cfg: PMLConfig, n: int):
    """{name: global shape} for the sharded psi arrays (``_TERMS`` order;
    bulk terms sharded over 'z') plus the two replicated strip columns."""
    npml = cfg.cells
    regions = _update_regions(p)
    _, _, _, _, Klp, S_sh = _geometry(p, n)
    I = p.maxi
    shapes = {}
    for name, target, _sign, axis, _src, _e in _TERMS:
        reg = regions[target]
        jlen = reg[1].stop - reg[1].start
        ilen = min(reg[2].stop, I) - reg[2].start
        if axis == 0:
            shapes[name] = (n * 2 * npml, jlen, ilen)
        elif axis == 1:
            shapes[name] = (n * S_sh, 2 * npml, ilen)
        else:
            shapes[name] = (n * S_sh, jlen, 2 * npml)
    K, J = p.maxk, p.maxj
    shapes["strip_hx_z"] = (2 * npml, J, 1)
    shapes["strip_hx_y"] = (K, 2 * npml, 1)
    return shapes


def init_psi_sharded(p: Params, cfg: PMLConfig, mesh: Mesh, dtype=None):
    """Zero psi pack: tuple in ``_TERMS`` order + the two strip columns."""
    n = mesh.shape["z"]
    dt = jnp.dtype(dtype or p.dtype)
    shapes = _psi_shapes(p, cfg, n)
    bulk_sh = NamedSharding(mesh, P("z", None, None))
    rep = NamedSharding(mesh, P(None, None, None))
    out = [
        jax.device_put(jnp.zeros(shapes[name], dt), bulk_sh)
        for name, *_ in _TERMS
    ]
    out.append(jax.device_put(jnp.zeros(shapes["strip_hx_z"], dt), rep))
    out.append(jax.device_put(jnp.zeros(shapes["strip_hx_y"], dt), rep))
    return tuple(out)


def _k_window_start(start: int, r: int, Klp: int, npml: int) -> int:
    """Global first row of rank ``r``'s clamped k-slab window (the same
    clamp :func:`_host_plan` bakes into ``w_off``)."""
    return r * Klp + int(np.clip(start - r * Klp, 0, Klp - npml))


def extract_psi_pack(p: Params, cfg: PMLConfig, n: int, pack):
    """Sharded psi pack -> the canonical slab-restricted
    :class:`fdtd_tpu.ops.cpml.PsiState` (the checkpoint format).

    Host-side (numpy): every valid pack element holds the very same psi
    value the single-chip recursion computes (off-slab pack rows are
    identically zero by the (b, c) = (1, 0) masking), so this is a pure
    re-indexing.  The i = maxi Hx strip columns come from the two
    replicated strip arrays.
    """
    from ..ops.cpml import PsiState

    npml = cfg.cells
    regions = _update_regions(p)
    _, _, _, _, Klp, S_sh = _geometry(p, n)
    I = p.maxi
    arrs = {name: np.asarray(a) for (name, *_), a in zip(_TERMS, pack)}
    strip = {"hx_z": np.asarray(pack[12]), "hx_y": np.asarray(pack[13])}

    out = {}
    for name, target, _sign, axis, _src, _e in _TERMS:
        reg = regions[target]
        shape = [s.stop - s.start for s in reg]
        shape[axis] = 2 * npml
        a = arrs[name]
        can = np.zeros(tuple(shape), a.dtype)
        if axis == 0:
            lo_start, hi_start = reg[0].start, reg[0].stop - npml
            for w, start in enumerate((lo_start, hi_start)):
                for d in range(npml):
                    g = start + d
                    r = g // Klp
                    idx = g - _k_window_start(start, r, Klp, npml)
                    can[w * npml + d, :, : a.shape[2]] = a[
                        r * 2 * npml + w * npml + idx
                    ]
        else:
            for g in range(reg[0].start, reg[0].stop):
                r = g // Klp
                t = r * S_sh + (g - r * Klp) + D
                can[g - reg[0].start, :, : a.shape[2]] = a[t]
        if target == "hx":
            s = strip[name]
            if axis == 0:
                can[:, :, I - reg[2].start] = s[:, :, 0]
            else:
                can[: reg[0].stop, :, I - reg[2].start] = s[
                    reg[0].start : reg[0].stop, :, 0
                ]
        out[name] = jnp.asarray(can)
    return PsiState(**out)


def embed_psi_pack(p: Params, cfg: PMLConfig, mesh: Mesh, psi):
    """Canonical slab-restricted PsiState -> sharded psi pack (the
    resume inverse of :func:`extract_psi_pack`).

    Pack slots no canonical element maps to restart at zero — they are
    exactly the slots the (b, c) masking keeps at zero anyway, so a
    resumed run stays bit-equal to an uninterrupted one.
    """
    n = mesh.shape["z"]
    npml = cfg.cells
    regions = _update_regions(p)
    _, _, _, _, Klp, S_sh = _geometry(p, n)
    I = p.maxi
    shapes = _psi_shapes(p, cfg, n)
    bulk_sh = NamedSharding(mesh, P("z", None, None))
    rep = NamedSharding(mesh, P(None, None, None))

    out = []
    strips = {}
    for name, target, _sign, axis, _src, _e in _TERMS:
        can = np.asarray(getattr(psi, name))
        reg = regions[target]
        a = np.zeros(shapes[name], can.dtype)
        ncols = a.shape[2]
        if axis == 0:
            lo_start, hi_start = reg[0].start, reg[0].stop - npml
            for w, start in enumerate((lo_start, hi_start)):
                for d in range(npml):
                    g = start + d
                    r = g // Klp
                    idx = g - _k_window_start(start, r, Klp, npml)
                    a[r * 2 * npml + w * npml + idx] = can[
                        w * npml + d, :, :ncols
                    ]
        else:
            for g in range(reg[0].start, reg[0].stop):
                r = g // Klp
                t = r * S_sh + (g - r * Klp) + D
                a[t] = can[g - reg[0].start, :, :ncols]
        if target == "hx":
            s = np.zeros(shapes[f"strip_{name}"], can.dtype)
            if axis == 0:
                s[:, :, 0] = can[:, :, I - reg[2].start]
            else:
                s[reg[0].start : reg[0].stop, :, 0] = can[
                    : reg[0].stop, :, I - reg[2].start
                ]
            strips[name] = s
        out.append(jax.device_put(jnp.asarray(a), bulk_sh))
    out.append(jax.device_put(jnp.asarray(strips["hx_z"]), rep))
    out.append(jax.device_put(jnp.asarray(strips["hx_y"]), rep))
    return tuple(out)


def make_sharded_pml_fast_step(p: Params, mesh: Mesh, cfg: PMLConfig,
                               coefs, interpret: bool | None = None):
    """``step((ShardedFastState, psi_pack), (t, amp)) -> (state, psi)``.

    Curls by the per-shard two-pass Pallas kernels, psi corrections as
    XLA slab updates between the passes (see module docstring)."""
    from ..source import make_source_plan

    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (
            (dd.platform != "tpu") if dd is not None
            else (jax.default_backend() != "tpu")
        )
    n = mesh.shape["z"]
    _check_cfg(p, cfg)
    npml = cfg.cells
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    if Klp < npml:
        raise ValueError(
            f"sharded CPML fast path needs Klp >= cells "
            f"({Klp} < {npml}); use the jnp shard_map path"
        )
    tk = tile_k(p, lossy)
    nk_local = Klp // tk
    h_call, e_call, tk = build_twopass_calls(p, coefs, S_sh, nk_local,
                                             interpret, tk=tk)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = (
        jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    )
    f_h = compute_dtype.type(float(np.asarray(coefs.h_factor)))
    fac = slab_factor_constants(p, cfg, coefs)
    if fac is None:
        raise ValueError(
            "sharded CPML fast path needs slab-constant correction "
            "factors (materials overlap the absorber); use the jnp path"
        )
    fac = {nm: dtype.type(v) for nm, v in fac.items()}
    k_terms, ji_terms, strip_terms = _host_plan(p, cfg, n, dtype)

    inject = p.mode == Mode.COMPUTATION
    inj = (
        make_inject_source(p, make_source_plan(p), dtype) if inject else None
    )

    n_e_cf = 6 if lossy else 0
    up = [(i, i - 1) for i in range(1, n)]
    down = [(i, i + 1) for i in range(n - 1)]
    K, J, I = p.maxk, p.maxj, p.maxi
    h_names = [t[0] for t in _TERMS if not t[5]]
    e_names = [t[0] for t in _TERMS if t[5]]
    # frozen strips padded so each rank's Klp-row slice is in bounds
    strip_pad = max(0, n * Klp + 2 * D - S_c)

    def _bulk_correct(name, fields, psi, r, e_pass):
        """One term's psi recursion + field add on the per-shard rows."""
        if name in k_terms:
            sign, src, target, jsl, isl, w_off, b, c = k_terms[name]
            jlen, ilen = jsl[1] - jsl[0], isl[1] - isl[0]
            z = jnp.int32(0)
            j0, i0 = jnp.int32(jsl[0]), jnp.int32(isl[0])
            w = lax.dynamic_slice(w_off, (r.astype(jnp.int32), z), (1, 2))
            src_a = fields[src]
            parts = []
            for s in range(2):
                w0 = w[0, s]
                d = 1 if e_pass else 0  # E diff: src(k) - src(k-1)
                hi = lax.dynamic_slice(
                    src_a, (w0 + (1 - d), j0, i0), (npml, jlen, ilen))
                lo = lax.dynamic_slice(
                    src_a, (w0 - d, j0, i0), (npml, jlen, ilen))
                parts.append(hi - lo)
            diff = jnp.concatenate(parts, axis=0)
            r0 = (r * 2 * npml).astype(jnp.int32)
            bw = lax.dynamic_slice(b, (r0, z, z), (2 * npml, 1, 1))
            cw = lax.dynamic_slice(c, (r0, z, z), (2 * npml, 1, 1))
            pnew = bw * psi + cw * diff
            f = fac[name]
            for s in range(2):
                w0 = w[0, s]
                part = pnew[s * npml:(s + 1) * npml]
                cur = lax.dynamic_slice(
                    fields[target], (w0, j0, i0), (npml, jlen, ilen))
                fields[target] = lax.dynamic_update_slice(
                    fields[target], cur + (sign * f * part).astype(dtype),
                    (w0, j0, i0))
            return pnew
        sign, axis, src, target, lo_sl, hi_sl, jsl, isl, b, c = ji_terms[name]
        src_a = fields[src]
        d = 1 if e_pass else 0

        def win(sl, shift):
            a0, a1 = sl[axis].start + shift, sl[axis].stop + shift
            if axis == 1:
                return src_a[:, a0:a1, isl[0]:isl[1]]
            return src_a[:, jsl[0]:jsl[1], a0:a1]

        diff = jnp.concatenate(
            [win(lo_sl, 1 - d) - win(lo_sl, -d),
             win(hi_sl, 1 - d) - win(hi_sl, -d)], axis=axis)
        b_l = lax.dynamic_slice_in_dim(b, r * S_sh, S_sh, axis=0)
        c_l = lax.dynamic_slice_in_dim(c, r * S_sh, S_sh, axis=0)
        pnew = b_l * psi + c_l * diff
        f = fac[name]
        half = [lax.slice_in_dim(pnew, 0, npml, axis=axis),
                lax.slice_in_dim(pnew, npml, 2 * npml, axis=axis)]
        for sl, part in zip((lo_sl, hi_sl), half):
            val = (sign * f * part).astype(dtype)
            if axis == 1:
                fields[target] = fields[target].at[
                    :, sl[1], isl[0]:isl[1]].add(val)
            else:
                fields[target] = fields[target].at[
                    :, jsl[0]:jsl[1], sl[2]].add(val)
        return pnew

    def h_body(ex, ey, ez, hx, hy, hz, chy, chz, eys, ezs, *rest):
        cf = rest[:len(rest) - 6]
        psis = rest[len(rest) - 6:]
        r = lax.axis_index("z")
        koff2 = jnp.stack(
            [(r * Klp).astype(jnp.int32), jnp.zeros((), jnp.int32)]
        ).reshape(1, 2)
        # top E halo: next shard's first physical Ex/Ey rows -> slot D+Klp
        ex_first = lax.slice_in_dim(ex, D, D + 1, axis=0)
        ey_first = lax.slice_in_dim(ey, D, D + 1, axis=0)
        ex_h = (lax.ppermute(ex_first, "z", up) if n > 1
                else jnp.zeros_like(ex_first))
        ey_h = (lax.ppermute(ey_first, "z", up) if n > 1
                else jnp.zeros_like(ey_first))
        ex = lax.dynamic_update_slice_in_dim(ex, ex_h, D + Klp, axis=0)
        ey = lax.dynamic_update_slice_in_dim(ey, ey_h, D + Klp, axis=0)

        hx, hy, hz = h_call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, *cf)

        # i-hi slab H-pass diffs read the src at i = maxi -> the frozen
        # replicated Ey/Ez strips, spliced in as column I (the bulk's
        # columns >= I are pad), sliced at this rank's global rows
        eys_l = lax.dynamic_slice_in_dim(eys, r * Klp, S_sh, axis=0)
        ezs_l = lax.dynamic_slice_in_dim(ezs, r * Klp, S_sh, axis=0)
        fields = {
            "ex": ex, "ey": jnp.concatenate([ey[:, :, :I], eys_l], axis=2),
            "ez": jnp.concatenate([ez[:, :, :I], ezs_l], axis=2),
            "hx": hx, "hy": hy, "hz": hz,
        }
        pouts = []
        for name, psi in zip(h_names, psis):
            pouts.append(_bulk_correct(name, fields, psi, r, e_pass=False))
        return (fields["hx"], fields["hy"], fields["hz"], *pouts)

    def e_body(hx, hy, hz, ex, ey, ez, *rest):
        cf = rest[:len(rest) - 6]
        psis = rest[len(rest) - 6:]
        r = lax.axis_index("z")
        koff2 = jnp.stack(
            [(r * Klp).astype(jnp.int32), jnp.zeros((), jnp.int32)]
        ).reshape(1, 2)
        # bottom H halo: previous shard's last physical (corrected)
        # Hx/Hy rows -> row D-1
        hx_last = lax.slice_in_dim(hx, D + Klp - 1, D + Klp, axis=0)
        hy_last = lax.slice_in_dim(hy, D + Klp - 1, D + Klp, axis=0)
        hx_h = (lax.ppermute(hx_last, "z", down) if n > 1
                else jnp.zeros_like(hx_last))
        hy_h = (lax.ppermute(hy_last, "z", down) if n > 1
                else jnp.zeros_like(hy_last))
        hx = lax.dynamic_update_slice_in_dim(hx, hx_h, D - 1, axis=0)
        hy = lax.dynamic_update_slice_in_dim(hy, hy_h, D - 1, axis=0)

        exn, eyn, ezn = e_call(koff2, hx, hy, hz, ex, ey, ez, *cf)

        fields = {"ex": exn, "ey": eyn, "ez": ezn,
                  "hx": hx, "hy": hy, "hz": hz}
        pouts = []
        for name, psi in zip(e_names, psis):
            pouts.append(_bulk_correct(name, fields, psi, r, e_pass=True))
        return (fields["ex"], fields["ey"], fields["ez"], *pouts)

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    h_extra = 3 if het else 0
    smap_h = jax.shard_map(
        h_body, mesh=mesh,
        in_specs=(bspec,) * 8 + (rspec,) * 2 + (bspec,) * (h_extra + 6),
        out_specs=(bspec,) * 9,
        check_vma=False,
    )
    smap_e = jax.shard_map(
        e_body, mesh=mesh,
        in_specs=(bspec,) * 6 + (bspec,) * (n_e_cf + 6),
        out_specs=(bspec,) * 9,
        check_vma=False,
    )

    def strip_correct(st, psi_sz, psi_sy):
        """hx_y then hx_z on the i=maxi Hx strip (replicated canonical) —
        the per-target ``_TERMS`` add order (j/i term before the k term)."""
        hx_s = st.hx_s
        # hx_y: diff along j from the frozen Ez strip
        sign, _axis, lo_sl, hi_sl, b, c = strip_terms["hx_y"]
        ez2 = st.ez_s[:, :, :1]

        def jwin(sl, d):
            j0, j1 = sl[1].start + d, sl[1].stop + d
            return ez2[D : D + K, j0:j1]

        diff = jnp.concatenate(
            [jwin(lo_sl, 1) - jwin(lo_sl, 0),
             jwin(hi_sl, 1) - jwin(hi_sl, 0)], axis=1)
        psi_sy = b * psi_sy + c * diff
        f = fac["hx_y"]
        for sl, part in zip(
            (lo_sl, hi_sl),
            (psi_sy[:, :npml], psi_sy[:, npml:]),
        ):
            hx_s = hx_s.at[D : D + K, sl[1]].add(
                (sign * f * part).astype(dtype))
        # hx_z: diff along k from the frozen Ey strip
        sign, _axis, lo_sl, hi_sl, b, c = strip_terms["hx_z"]
        ey2 = st.ey_s[:, :, :1]

        def kwin(sl, d):
            k0, k1 = sl[0].start + d + D, sl[0].stop + d + D
            return ey2[k0:k1, :J]

        diff = jnp.concatenate(
            [kwin(lo_sl, 1) - kwin(lo_sl, 0),
             kwin(hi_sl, 1) - kwin(hi_sl, 0)], axis=0)
        psi_sz = b * psi_sz + c * diff
        f = fac["hx_z"]
        for sl, part in zip(
            (lo_sl, hi_sl),
            (psi_sz[:npml], psi_sz[npml:]),
        ):
            hx_s = hx_s.at[
                sl[0].start + D : sl[0].stop + D, :J
            ].add((sign * f * part).astype(dtype))
        return hx_s, psi_sz, psi_sy

    def step(carry, x):
        st, psis = carry
        _t, amp = x
        if inject:
            st = inj(st, amp)
        h_psis = psis[:6]
        e_psis = psis[6:12]
        psi_sz, psi_sy = psis[12], psis[13]
        hextra = (st.hf_x, st.hf_y, st.hf_z) if het else ()
        eys = jnp.pad(st.ey_s, ((0, strip_pad), (0, 0), (0, 0)))
        ezs = jnp.pad(st.ez_s, ((0, strip_pad), (0, 0), (0, 0)))
        hx, hy, hz, *h_new = smap_h(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, eys, ezs, *hextra, *h_psis,
        )
        st = dataclasses.replace(st, hx=hx, hy=hy, hz=hz)
        hx_s = _advance_hx_strip(p, st, f_h, het)
        st = dataclasses.replace(st, hx_s=hx_s)
        hx_s, psi_sz, psi_sy = strip_correct(st, psi_sz, psi_sy)
        st = dataclasses.replace(st, hx_s=hx_s)
        if inject:
            st = inj(st, amp)  # restore the patch (second application)
        eextra = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy else ()
        )
        ex, ey, ez, *e_new = smap_e(
            st.hx, st.hy, st.hz, st.ex, st.ey, st.ez, *eextra, *e_psis,
        )
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez)
        return (st, (*h_new, *e_new, psi_sz, psi_sy))

    return step


def make_sharded_pml_fast_runner(p: Params, mesh: Mesh, cfg: PMLConfig,
                                 materials: Materials | None = None,
                                 accumulate_power: bool = False,
                                 interpret: bool | None = None):
    """Jitted ``run((state, psi_pack), xs[, acc])`` scanning the sharded
    CPML fast step; with SAR the sharded (n*Klp, J, I) fp32 accumulator
    joins the signature (``run(carry, xs, acc) -> (carry, acc)``)."""
    coefs = update_coefs(p, materials)
    step = make_sharded_pml_fast_step(p, mesh, cfg, coefs, interpret)

    if accumulate_power:
        inc_fn = make_sharded_power_inc(p, mesh, materials)
        dt = p.time_step

        @jax.jit
        def run_acc(carry, xs, acc):
            def body(c, x):
                carry, acc = c
                carry = step(carry, x)
                acc = acc + (inc_fn(carry[0]) * dt).astype(acc.dtype)
                return (carry, acc), None

            (carry, acc), _ = lax.scan(body, (carry, acc), xs)
            return carry, acc

        run_acc.zero_psi = functools.partial(init_psi_sharded, p, cfg, mesh)
        return run_acc

    @jax.jit
    def run(carry, xs):
        def body(carry, x):
            return step(carry, x), None

        carry, _ = lax.scan(body, carry, xs)
        return carry

    run.zero_psi = functools.partial(init_psi_sharded, p, cfg, mesh)
    return run


def make_sharded_pml_fast_dft_runner(p: Params, mesh: Mesh, cfg: PMLConfig,
                                     dft,
                                     materials: Materials | None = None,
                                     accumulate_power: bool = False,
                                     interpret: bool | None = None):
    """Monitored sharded CPML runner (r5): the `--dft --pml --shard`
    TRIPLE keeps the per-shard two-pass kernels — only the monitor
    itself runs in jnp (a sharded 4-edge cell-mean map + phasor axpy
    per step), instead of demoting the whole update to the monitored
    xla shard_map scan.

    ``run(carry, (ts, amps, cw, sw), power, dft_acc) ->
    (carry, power, dft_acc, None)`` — the monitored-chunk contract with
    the (ShardedFastState, psi_pack) carry of
    :func:`make_sharded_pml_fast_runner`.  ``dft_acc`` is canonical
    (nf, 3, K, J, I) (re, im) at chunk boundaries (checkpoint interop
    with every other monitored tier); it rides the scan z-sharded.
    fields='e' only (no sharded H means)."""
    from .sharded_fast import make_sharded_e_means, make_sharded_power_inc

    nf = dft.nf
    assert dft.fields == "e", "sharded in-kernel DFT carries E phasors"
    coefs = update_coefs(p, materials)
    step = make_sharded_pml_fast_step(p, mesh, cfg, coefs, interpret)
    e_means = make_sharded_e_means(p, mesh)
    inc_fn = (make_sharded_power_inc(p, mesh, materials)
              if accumulate_power else None)
    n = mesh.shape["z"]
    Klp = _geometry(p, n)[4]
    K, J, I = p.maxk, p.maxj, p.maxi
    dt = p.time_step
    dacc_sh = NamedSharding(mesh, P(None, None, "z", None, None))
    acc_sh = NamedSharding(mesh, P("z", None, None))
    wsc = jax.lax.with_sharding_constraint
    pad_k = ((0, 0), (0, 0), (0, n * Klp - K), (0, 0), (0, 0))

    @jax.jit
    def run(carry, xs, power_acc, dft_acc):
        ts, amps, cw, sw = xs
        re0, im0 = dft_acc
        re = wsc(jnp.pad(jnp.asarray(re0, jnp.float32), pad_k), dacc_sh)
        im = wsc(jnp.pad(jnp.asarray(im0, jnp.float32), pad_k), dacc_sh)
        acc = None
        if accumulate_power:
            acc = jax.device_put(
                jnp.pad(jnp.asarray(power_acc),
                        ((0, n * Klp - K), (0, 0), (0, 0))),
                acc_sh,
            )

        def body(c, x):
            carry, acc, re, im = c
            t, amp, cwv, swv = x
            carry = step(carry, (t, amp))
            me = e_means(carry[0]).astype(jnp.float32)  # (3, n*Klp, J, I)
            re = re + cwv[:, None, None, None, None] * me[None]
            im = im - swv[:, None, None, None, None] * me[None]
            if accumulate_power:
                acc = acc + (inc_fn(carry[0]) * dt).astype(acc.dtype)
            return (carry, acc, re, im), None

        (carry, acc, re, im), _ = lax.scan(
            body, (carry, acc, re, im),
            (ts, amps, jnp.asarray(cw), jnp.asarray(sw)))
        dft_acc = (re[:, :, :K], im[:, :, :K])
        if accumulate_power:
            power_acc = acc[:K]
        return carry, power_acc, dft_acc, None

    run.zero_psi = functools.partial(init_psi_sharded, p, cfg, mesh)
    return run
