"""Multi-chip fast path: the Pallas two-pass kernels inside shard_map.

Combines the single-chip stripped-layout kernels (fdtd_tpu.ops.pallas_fused)
with 1-D spatial decomposition along k over a ``Mesh`` 'z' axis — the
production analogue of the reference's MPI slab branch, but with the hot
loop still running as hand-built TPU kernels on every shard:

- each shard owns ``Klp`` physical k rows stored with its own dead slab
  below (D rows, so the kernels' window math is unchanged) and a D-row pad
  above whose first row is the *top E halo slot*;
- per step, exactly four one-row planes cross shard boundaries over ICI as
  ``lax.ppermute`` shifts: Ex/Ey move toward -z before the H pass (the H
  update reads E at k+1) and Hx'/Hy' move toward +z before the E pass (the
  E update reads H at k-1) — precisely the reference MPI branch's exchange
  pattern (description.pdf section 2.2, Figs. 2-3);
- the staggered/PEC masks see *global* k via a per-shard scalar offset fed
  to the kernels through SMEM, so boundary handling and the source-patch
  exclusion stay exact under any shard count.

Strips (the i=maxi boundary columns) stay replicated in the canonical
stripped layout: they are tiny, frozen (Ey/Ez) or write-only (Hx), and
their update is a 2-D jnp op outside shard_map.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import Mode, Params
from ..state import FieldState, update_coefs
from ..ops.pallas_fused import (
    D,
    StrippedState,
    build_twopass_calls,
    corr_width,
    dims,
    tile_k,
    to_full,
    to_stripped,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ex", "ey", "ez", "hx", "hy", "hz", "corr_hy", "corr_hz",
        "ey_s", "ez_s", "hx_s",
        "ca_x", "ca_y", "ca_z", "cb_x", "cb_y", "cb_z",
        "hf_x", "hf_y", "hf_z", "hfx_s", "sigma_c",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class ShardedFastState:
    """Bulks/corr in the per-shard layout (n*S_sh rows, sharded over 'z');
    strips in the canonical stripped layout, replicated; for lossy media,
    six per-shard ca/cb coefficient slabs (constant through the run)."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    corr_hy: jax.Array
    corr_hz: jax.Array
    ey_s: jax.Array
    ez_s: jax.Array
    hx_s: jax.Array
    ca_x: jax.Array | None = None
    ca_y: jax.Array | None = None
    ca_z: jax.Array | None = None
    cb_x: jax.Array | None = None
    cb_y: jax.Array | None = None
    cb_z: jax.Array | None = None
    hf_x: jax.Array | None = None  # heterogeneous-mu H factors (per-shard)
    hf_y: jax.Array | None = None
    hf_z: jax.Array | None = None
    hfx_s: jax.Array | None = None  # replicated strip-column factor
    sigma_c: jax.Array | None = None  # cell sigma slab (streaming SAR, r3)


def _geometry(p: Params, n: int):
    S_c, J1p, Ib = dims(p)
    K1 = p.padded_shape[0]
    Klp = -(-K1 // n)  # ceil
    Klp = ((Klp + D - 1) // D) * D  # tile-aligned local rows
    S_sh = D + Klp + D
    return S_c, J1p, Ib, K1, Klp, S_sh


def _reshard(a, n, src_rows, Klp, S_sh, lead_pad=D, halo=False):
    """(src_rows, J, X) canonical-physical -> (n*S_sh, J, X) per-shard.

    With ``halo=True`` the pad rows are filled with the true neighbor rows
    (zero outside the physical range) instead of zeros — used for the
    constant corr arrays, whose temporal-kernel windows read into the halo
    band."""
    total = n * Klp
    if halo:
        import numpy as _np

        idx = _np.zeros(n * S_sh, dtype=_np.int64)
        valid = _np.zeros(n * S_sh, dtype=bool)
        for r in range(n):
            for t in range(S_sh):
                k = r * Klp + (t - lead_pad)
                if 0 <= k < a.shape[0]:
                    idx[r * S_sh + t] = k
                    valid[r * S_sh + t] = True
        out = jnp.take(a, jnp.asarray(idx), axis=0)
        return jnp.where(jnp.asarray(valid)[:, None, None], out, jnp.zeros_like(out))
    a = jnp.pad(a, ((0, total - a.shape[0]), (0, 0), (0, 0)))
    a = a.reshape(n, Klp, *a.shape[1:])
    a = jnp.pad(a, ((0, 0), (lead_pad, S_sh - Klp - lead_pad), (0, 0), (0, 0)))
    return a.reshape(n * S_sh, *a.shape[2:])


def to_sharded_fast(
    p: Params, s: FieldState, mesh: Mesh, coefs=None
) -> ShardedFastState:
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    st = to_stripped(p, s, coefs=coefs)

    def phys(a):  # canonical stripped -> physical rows only
        return a[D : D + K1]

    bulk_sh = NamedSharding(mesh, P("z", None, None))
    rep = NamedSharding(mesh, P(None, None, None))

    def emb(a, halo=False):
        return jax.device_put(_reshard(phys(a), n, K1, Klp, S_sh, halo=halo), bulk_sh)

    out = ShardedFastState(
        ex=emb(st.ex), ey=emb(st.ey), ez=emb(st.ez),
        hx=emb(st.hx), hy=emb(st.hy), hz=emb(st.hz),
        corr_hy=emb(st.corr_hy, halo=True), corr_hz=emb(st.corr_hz, halo=True),
        ey_s=jax.device_put(st.ey_s, rep),
        ez_s=jax.device_put(st.ez_s, rep),
        hx_s=jax.device_put(st.hx_s, rep),
    )
    if st.ca_x is not None:
        # halo=True: the streaming composition advances halo E rows with
        # the NEIGHBOR's coefficients (constant, baked once); the single-
        # step kernel only applies coef rows to its own (or masked) rows,
        # so true neighbor values vs zeros are behavior-identical there
        out = dataclasses.replace(
            out,
            ca_x=emb(st.ca_x, halo=True), ca_y=emb(st.ca_y, halo=True),
            ca_z=emb(st.ca_z, halo=True),
            cb_x=emb(st.cb_x, halo=True), cb_y=emb(st.cb_y, halo=True),
            cb_z=emb(st.cb_z, halo=True),
        )
    if st.sigma_c is not None:
        out = dataclasses.replace(out, sigma_c=emb(st.sigma_c, halo=True))
    if st.hf_x is not None:
        # halo=True (r3): the streaming composition advances halo H rows
        # with the NEIGHBOR's mu factors; the single-step kernel masks
        # its writes to own rows, so true neighbor values vs zeros are
        # behavior-identical there
        out = dataclasses.replace(
            out,
            hf_x=emb(st.hf_x, halo=True), hf_y=emb(st.hf_y, halo=True),
            hf_z=emb(st.hf_z, halo=True),
            hfx_s=jax.device_put(st.hfx_s, rep),
        )
    return out


def from_sharded_fast(p: Params, st: ShardedFastState, mesh: Mesh) -> FieldState:
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)

    def unshard(a):
        a = a.reshape(n, S_sh, *a.shape[1:])[:, D : D + Klp]
        return a.reshape(n * Klp, *a.shape[2:])[:K1]

    canon = StrippedState(
        ex=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.ex)),
        ey=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.ey)),
        ez=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.ez)),
        hx=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.hx)),
        hy=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.hy)),
        hz=jnp.zeros((S_c, J1p, Ib), st.ex.dtype).at[D : D + K1].set(unshard(st.hz)),
        ey_s=st.ey_s, ez_s=st.ez_s, hx_s=st.hx_s,
        corr_hy=jnp.zeros((S_c, J1p, corr_width(Ib)), st.ex.dtype),
        corr_hz=jnp.zeros((S_c, J1p, corr_width(Ib)), st.ex.dtype),
    )
    return to_full(p, canon)


def make_sharded_fast_step(p: Params, mesh: Mesh, interpret: bool | None = None,
                           materials=None):
    """``step(state: ShardedFastState, (t, amp)) -> ShardedFastState``.

    With ``materials``, the E pass runs the lossy update with per-shard
    ca/cb coefficient slabs carried in the state (build the state with
    ``to_sharded_fast(p, s, mesh, coefs=update_coefs(p, materials))``)."""
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    n = mesh.shape["z"]
    coefs = update_coefs(p, materials)
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    n_e_cf = 6 if lossy else 0
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    tk = tile_k(p, lossy)
    nk_local = Klp // tk
    h_call, e_call, tk = build_twopass_calls(p, coefs, S_sh, nk_local, interpret, tk=tk)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        from ..source import make_source_plan

        plan = make_source_plan(p)

    up = [(i, i - 1) for i in range(1, n)]    # receive next shard's plane
    down = [(i, i + 1) for i in range(n - 1)]  # receive previous shard's plane

    def local_step(koff2, ex, ey, ez, hx, hy, hz, chy, chz, *cf):
        # top E halo: next shard's first physical Ex/Ey rows -> slot D+Klp
        ex_first = lax.slice_in_dim(ex, D, D + 1, axis=0)
        ey_first = lax.slice_in_dim(ey, D, D + 1, axis=0)
        ex_h = lax.ppermute(ex_first, "z", up) if n > 1 else jnp.zeros_like(ex_first)
        ey_h = lax.ppermute(ey_first, "z", up) if n > 1 else jnp.zeros_like(ey_first)
        ex = lax.dynamic_update_slice_in_dim(ex, ex_h, D + Klp, axis=0)
        ey = lax.dynamic_update_slice_in_dim(ey, ey_h, D + Klp, axis=0)

        hx, hy, hz = h_call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, *cf[n_e_cf:])

        # bottom H halo: previous shard's last physical Hx/Hy rows -> row D-1
        hx_last = lax.slice_in_dim(hx, D + Klp - 1, D + Klp, axis=0)
        hy_last = lax.slice_in_dim(hy, D + Klp - 1, D + Klp, axis=0)
        hx_h = lax.ppermute(hx_last, "z", down) if n > 1 else jnp.zeros_like(hx_last)
        hy_h = lax.ppermute(hy_last, "z", down) if n > 1 else jnp.zeros_like(hy_last)
        hx = lax.dynamic_update_slice_in_dim(hx, hx_h, D - 1, axis=0)
        hy = lax.dynamic_update_slice_in_dim(hy, hy_h, D - 1, axis=0)

        ex, ey, ez = e_call(koff2, hx, hy, hz, ex, ey, ez, *cf[:n_e_cf])
        return ex, ey, ez, hx, hy, hz

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, *cf):
        r = lax.axis_index("z")
        koff2 = jnp.stack(
            [(r * Klp).astype(jnp.int32), jnp.zeros((), jnp.int32)]
        ).reshape(1, 2)
        return local_step(koff2, ex, ey, ez, hx, hy, hz, chy, chz, *cf)

    bspec = P("z", None, None)
    n_in = 8 + n_e_cf + (3 if het else 0)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * n_in,
        out_specs=(bspec,) * 6,
        check_vma=False,  # pallas_call outputs don't carry vma metadata
    )

    K, J = p.maxk, p.maxj

    def step(st: ShardedFastState, x) -> ShardedFastState:
        _t, amp = x
        if inject:
            amp_j = jnp.asarray(amp)
            prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
            row = amp_j * prof_row
            nj, ni = plan.j1 - plan.j0, len(plan.profile)
            pv = jnp.broadcast_to(row[None, :], (nj, ni))
            zero = jnp.zeros((nj, ni), dtype)
            sl = (D, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
            )
        cf = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy
            else ()
        ) + ((st.hf_x, st.hf_y, st.hf_z) if het else ())
        ex, ey, ez, hx, hy, hz = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz, st.corr_hy, st.corr_hz, *cf
        )
        # Hx strip update on the replicated canonical strips
        hx_s = _advance_hx_strip(p, st, f_h, het)
        return dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)

    return step



def _advance_hx_strip(p: Params, st: "ShardedFastState", f_h, het: bool,
                      n_steps: int = 1):
    """Advance the replicated canonical Hx i=maxi strip by ``n_steps``
    H-updates.  The strip's E neighbors are PEC-frozen, so its curl is
    constant across a multi-step group and the update is ``n_steps``
    identical adds (bit-matching the single-chip per-step sequence)."""
    K, J = p.maxk, p.maxj
    ey_s2 = st.ey_s[:, :, 0]
    ez_s2 = st.ez_s[:, :, 0]
    sl = (slice(D, D + K), slice(0, J))
    curl = (ey_s2[D + 1 : D + K + 1, :J] - ey_s2[sl]) - (
        ez_s2[D : D + K, 1 : J + 1] - ez_s2[sl]
    )
    fh = st.hfx_s[sl[0], sl[1], 0] if het else f_h
    hx_s = st.hx_s
    for _ in range(n_steps):
        hx_s = hx_s.at[sl[0], sl[1], 0].add((fh * curl).astype(st.hx_s.dtype))
    return hx_s

def make_sharded_power_inc(p: Params, mesh: Mesh, materials):
    """``inc(st) -> (n*Klp, J, I) sharded instantaneous power`` for SAR
    accumulation under 1-D z sharding.

    Mirrors ``diagnostics.power_deposition_stripped`` cell by cell (same
    operands, same arithmetic order -> bit-equal to the single-chip
    accumulator), with one extra post-E-pass halo exchange: the cell-center
    means at a shard's top row read Ex/Ey at k+1, which live on the next
    shard (the state's halo slot holds pre-update values at that point).
    Rows past maxk carry sigma = 0, so no masking is needed.
    """
    from ..state import update_coefs

    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    K, J, I = p.maxk, p.maxj, p.maxi
    coefs = update_coefs(p, materials)
    if coefs.sigma_cells is None:
        raise NotImplementedError("power accumulation needs lossy materials")

    sig = jnp.asarray(coefs.sigma_cells)  # (K, J, I); dtype as single-chip
    sig = jnp.pad(sig, ((0, n * Klp - K), (0, 0), (0, 0)))
    sig = jax.device_put(sig, NamedSharding(mesh, P("z", None, None)))
    # frozen Ey/Ez strips, padded so every shard's (Klp+1)-row slice is in
    # bounds (n*Klp can exceed the canonical padded k extent)
    strip_pad = max(0, D + n * Klp + 1 - S_c)

    up = [(i, i - 1) for i in range(1, n)]

    def body(ex, ey, ez, eys, ezs, sg):
        r = lax.axis_index("z")
        for name in ("ex", "ey"):
            a = ex if name == "ex" else ey
            first = lax.slice_in_dim(a, D, D + 1, axis=0)
            h = lax.ppermute(first, "z", up) if n > 1 else jnp.zeros_like(first)
            a = lax.dynamic_update_slice_in_dim(a, h, D + Klp, axis=0)
            ex, ey = (a, ey) if name == "ex" else (ex, a)
        at = jnp.float64 if ex.dtype == jnp.float64 else jnp.float32
        k0 = D + r * Klp
        exl = ex[D : D + Klp + 1, : J + 1, :I].astype(at)
        eyl = jnp.concatenate(
            [ey[D : D + Klp + 1, :J, :], lax.dynamic_slice_in_dim(eys, k0, Klp + 1, axis=0)[:, :J]],
            axis=2,
        ).astype(at)
        ezl = jnp.concatenate(
            [ez[D : D + Klp, : J + 1, :], lax.dynamic_slice_in_dim(ezs, k0, Klp, axis=0)[:, : J + 1]],
            axis=2,
        ).astype(at)
        Kl = Klp
        mean_ex = 0.25 * (exl[:Kl, :J, :I] + exl[1 : Kl + 1, :J, :I] + exl[:Kl, 1 : J + 1, :I] + exl[1 : Kl + 1, 1 : J + 1, :I])
        mean_ey = 0.25 * (eyl[:Kl, :J, :I] + eyl[:Kl, :J, 1 : I + 1] + eyl[1 : Kl + 1, :J, :I] + eyl[1 : Kl + 1, :J, 1 : I + 1])
        mean_ez = 0.25 * (ezl[:Kl, :J, :I] + ezl[:Kl, 1 : J + 1, :I] + ezl[:Kl, :J, 1 : I + 1] + ezl[:Kl, 1 : J + 1, 1 : I + 1])
        return sg * (mean_ex**2 + mean_ey**2 + mean_ez**2)

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    smap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(bspec,) * 3 + (rspec,) * 2 + (bspec,),
        out_specs=bspec,
        check_vma=False,
    )

    def inc(st: ShardedFastState):
        eys = jnp.pad(st.ey_s, ((0, strip_pad), (0, 0), (0, 0)))
        ezs = jnp.pad(st.ez_s, ((0, strip_pad), (0, 0), (0, 0)))
        return smap(st.ex, st.ey, st.ez, eys, ezs, sig)

    return inc


def make_sharded_fast_runner(p: Params, mesh: Mesh, interpret: bool | None = None,
                             materials=None, accumulate_power: bool = False):
    """Jitted runner scanning the sharded fast step.

    Without SAR: ``run(state, xs) -> state``.  With ``accumulate_power``:
    ``run(state, xs, acc) -> (state, acc)`` where ``acc`` is the sharded
    (n*Klp, J, I) fp32 accumulator of sigma*|E|^2*dt (J/m^3); rows [:maxk]
    are the canonical heating map.
    """
    step = make_sharded_fast_step(p, mesh, interpret, materials=materials)
    if accumulate_power:
        inc_fn = make_sharded_power_inc(p, mesh, materials)
        dt = p.time_step

        @jax.jit
        def run_acc(st, xs, acc):
            def body(carry, x):
                st, acc = carry
                st = step(st, x)
                acc = acc + (inc_fn(st) * dt).astype(acc.dtype)
                return (st, acc), None

            (st, acc), _ = lax.scan(body, (st, acc), xs)
            return st, acc

        return run_acc

    @jax.jit
    def run(st, xs):
        def body(st, x):
            return step(st, x), None

        st, _ = lax.scan(body, st, xs)
        return st

    return run


DJ2 = 8  # j-side pad rows per shard under 2-D decomposition (halo slots)


def _geometry2d(p: Params, nz: int, ny: int):
    S_c, J1p, Ib = dims(p)
    K1, J1, _ = p.padded_shape
    Klp = ((-(-K1 // nz)) + D - 1) // D * D   # tile-aligned local k rows
    S_sh = D + Klp + D
    Jlp = ((-(-J1 // ny)) + 7) // 8 * 8       # sublane-aligned local j rows
    Jt_sh = DJ2 + Jlp + DJ2
    return S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh


def _reshard_j(a, ny, Jlp, Jt_sh, halo: bool = False):
    """(K, J1, X) -> (K, ny*Jt_sh, X): split j into ny chunks, pad each with
    DJ2 halo-slot rows below and above.  ``halo=False``: zero-filled slots
    (fields; refreshed by exchange every step/sweep).  ``halo=True``: slots
    pre-filled with the neighbor chunks' edge rows (constant arrays like the
    corr streams, whose halos the temporal sweeps read but never refresh)."""
    J1 = a.shape[1]
    a = jnp.pad(a, ((0, 0), (0, ny * Jlp - J1), (0, 0)))
    ch = a.reshape(a.shape[0], ny, Jlp, *a.shape[2:])
    if not halo:
        ch = jnp.pad(ch, ((0, 0), (0, 0), (DJ2, DJ2), (0, 0)))
    else:
        zch = jnp.zeros_like(ch[:, :1])
        below = jnp.concatenate([zch, ch[:, :-1]], axis=1)[:, :, Jlp - DJ2:]
        above = jnp.concatenate([ch[:, 1:], zch], axis=1)[:, :, :DJ2]
        ch = jnp.concatenate([below, ch, above], axis=2)
    return ch.reshape(ch.shape[0], ny * Jt_sh, *ch.shape[3:])


def to_sharded_fast_2d(p: Params, s: FieldState, mesh: Mesh, coefs=None) -> ShardedFastState:
    """Build the 2-D (z x y) sharded fast state.  ``mesh`` axes: ("z", "y")."""
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)
    st = to_stripped(p, s, coefs=coefs)

    bulk_sh = NamedSharding(mesh, P("z", "y", None))
    rep = NamedSharding(mesh, P(None, None, None))

    def emb(a, halo=False):
        a = _reshard_j(a[D : D + K1], ny, Jlp, Jt_sh, halo=halo)
        return jax.device_put(_reshard(a, nz, K1, Klp, S_sh, halo=halo), bulk_sh)

    out = ShardedFastState(
        ex=emb(st.ex), ey=emb(st.ey), ez=emb(st.ez),
        hx=emb(st.hx), hy=emb(st.hy), hz=emb(st.hz),
        corr_hy=emb(st.corr_hy, halo=True), corr_hz=emb(st.corr_hz, halo=True),
        ey_s=jax.device_put(st.ey_s, rep),
        ez_s=jax.device_put(st.ez_s, rep),
        hx_s=jax.device_put(st.hx_s, rep),
    )
    if st.ca_x is not None:
        # halo=True (r3): the streaming composition advances halo E/H rows
        # with the NEIGHBOR's coefficients; the single-step kernel masks
        # its writes to own rows, so true neighbor values vs zeros are
        # behavior-identical there
        out = dataclasses.replace(
            out,
            ca_x=emb(st.ca_x, halo=True), ca_y=emb(st.ca_y, halo=True),
            ca_z=emb(st.ca_z, halo=True),
            cb_x=emb(st.cb_x, halo=True), cb_y=emb(st.cb_y, halo=True),
            cb_z=emb(st.cb_z, halo=True),
        )
    if st.hf_x is not None:
        out = dataclasses.replace(
            out,
            hf_x=emb(st.hf_x, halo=True), hf_y=emb(st.hf_y, halo=True),
            hf_z=emb(st.hf_z, halo=True),
            hfx_s=jax.device_put(st.hfx_s, rep),
        )
    if st.sigma_c is not None:
        out = dataclasses.replace(out, sigma_c=emb(st.sigma_c, halo=True))
    return out


def from_sharded_fast_2d(p: Params, st: ShardedFastState, mesh: Mesh) -> FieldState:
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)

    def unshard(a):
        a = a.reshape(nz, S_sh, *a.shape[1:])[:, D : D + Klp]
        a = a.reshape(nz * Klp, *a.shape[2:])[:K1]
        a = a.reshape(a.shape[0], ny, Jt_sh, *a.shape[2:])[:, :, DJ2 : DJ2 + Jlp]
        return a.reshape(a.shape[0], ny * Jlp, *a.shape[3:])[:, :J1]

    def canon(a):
        out = jnp.zeros((S_c, J1p, a.shape[-1]), a.dtype)
        return out.at[D : D + K1, :J1].set(unshard(a))

    st2 = StrippedState(
        ex=canon(st.ex), ey=canon(st.ey), ez=canon(st.ez),
        hx=canon(st.hx), hy=canon(st.hy), hz=canon(st.hz),
        ey_s=st.ey_s, ez_s=st.ez_s, hx_s=st.hx_s,
        corr_hy=jnp.zeros((S_c, J1p, corr_width(Ib)), st.ex.dtype),
        corr_hz=jnp.zeros((S_c, J1p, corr_width(Ib)), st.ex.dtype),
    )
    return to_full(p, st2)


def make_sharded_fast_2d_step(p: Params, mesh: Mesh, interpret: bool | None = None,
                              materials=None):
    """2-D (z x y) spatial decomposition with the Pallas two-pass kernels.

    Extends the 1-D slab exchange (the reference MPI branch's pattern,
    description.pdf section 2.2) with j-axis halo planes, mirroring the k
    pattern along the second grid axis:

    - before the H pass: Ex/Ey one-row k-planes move toward -z AND Ez/Ex
      one-row j-planes move toward -y (the H update reads E at k+1 and j+1);
    - before the E pass: Hx'/Hy' k-planes move toward +z AND Hz'/Hx'
      j-planes move toward +y (the E update reads H at k-1 and j-1).

    The kernels see global (k, j) via the SMEM offset pair and write only
    locally-owned j rows (``jwin``), so halo slots keep exchanged values.
    """
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    if mesh.shape.get("x", 1) != 1:
        raise NotImplementedError(
            "the fast path shards (z, y); i-axis sharding is on the jnp path "
            "(parallel.sharded_step)"
        )
    coefs = update_coefs(p, materials)
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    n_e_cf = 6 if lossy else 0
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)
    tk = tile_k(p, lossy)
    nk_local = Klp // tk
    h_call, e_call, tk = build_twopass_calls(
        p, coefs, S_sh, nk_local, interpret, tk=tk,
        J_rows=Jt_sh, jwin=(DJ2, DJ2 + Jlp),
    )

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        import numpy as _np

        from ..source import make_source_plan

        plan = make_source_plan(p)
        # physical j -> per-shard storage row (j rows may straddle y shards)
        jrows = _np.arange(plan.j0, plan.j1)
        jstore = (jrows // Jlp) * Jt_sh + DJ2 + (jrows % Jlp)
        jstore = jnp.asarray(jstore)

    def permute(a, axis_name, perm):
        return lax.ppermute(a, axis_name, perm) if perm else jnp.zeros_like(a)

    up_z = [(i, i - 1) for i in range(1, nz)]
    down_z = [(i, i + 1) for i in range(nz - 1)]
    up_y = [(i, i - 1) for i in range(1, ny)]
    down_y = [(i, i + 1) for i in range(ny - 1)]

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, *cf):
        rz = lax.axis_index("z")
        ry = lax.axis_index("y")
        koff2 = jnp.stack(
            [(rz * Klp).astype(jnp.int32), (ry * Jlp - DJ2).astype(jnp.int32)]
        ).reshape(1, 2)

        # k halos: next shard's first physical Ex/Ey rows -> slot D+Klp
        for name, arr in (("ex", ex), ("ey", ey)):
            first = lax.slice_in_dim(arr, D, D + 1, axis=0)
            h = permute(first, "z", up_z)
            arr = lax.dynamic_update_slice_in_dim(arr, h, D + Klp, axis=0)
            ex, ey = (arr, ey) if name == "ex" else (ex, arr)
        # j halos: next y shard's first physical Ez/Ex rows -> slot DJ2+Jlp
        for name, arr in (("ez", ez), ("ex", ex)):
            first = lax.slice_in_dim(arr, DJ2, DJ2 + 1, axis=1)
            h = permute(first, "y", up_y)
            arr = lax.dynamic_update_slice_in_dim(arr, h, DJ2 + Jlp, axis=1)
            ez, ex = (arr, ex) if name == "ez" else (ez, arr)

        hx, hy, hz = h_call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, *cf[n_e_cf:])

        # k halos: previous shard's last physical Hx/Hy rows -> row D-1
        for name, arr in (("hx", hx), ("hy", hy)):
            last = lax.slice_in_dim(arr, D + Klp - 1, D + Klp, axis=0)
            h = permute(last, "z", down_z)
            arr = lax.dynamic_update_slice_in_dim(arr, h, D - 1, axis=0)
            hx, hy = (arr, hy) if name == "hx" else (hx, arr)
        # j halos: previous y shard's last physical Hz/Hx rows -> row DJ2-1
        for name, arr in (("hz", hz), ("hx", hx)):
            last = lax.slice_in_dim(arr, DJ2 + Jlp - 1, DJ2 + Jlp, axis=1)
            h = permute(last, "y", down_y)
            arr = lax.dynamic_update_slice_in_dim(arr, h, DJ2 - 1, axis=1)
            hz, hx = (arr, hx) if name == "hz" else (hz, arr)

        ex, ey, ez = e_call(koff2, hx, hy, hz, ex, ey, ez, *cf[:n_e_cf])
        return ex, ey, ez, hx, hy, hz

    bspec = P("z", "y", None)
    n_in = 8 + n_e_cf + (3 if het else 0)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * n_in,
        out_specs=(bspec,) * 6,
        check_vma=False,
    )

    K, J = p.maxk, p.maxj

    def step(st: ShardedFastState, x) -> ShardedFastState:
        _t, amp = x
        if inject:
            amp_j = jnp.asarray(amp)
            prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
            row = amp_j * prof_row
            npj, ni = plan.j1 - plan.j0, len(plan.profile)
            pv = jnp.broadcast_to(row[None, :], (npj, ni))
            zero = jnp.zeros((npj, ni), dtype)
            sl = (D, jstore, slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv).astype(dtype)),
            )
        cf = (
            (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
            if lossy
            else ()
        ) + ((st.hf_x, st.hf_y, st.hf_z) if het else ())
        ex, ey, ez, hx, hy, hz = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz, st.corr_hy, st.corr_hz, *cf
        )
        hx_s = _advance_hx_strip(p, st, f_h, het)
        return dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)

    return step


def make_sharded_power_inc_2d(p: Params, mesh: Mesh, materials):
    """``inc(st) -> (nz*Klp, ny*Jlp, I) sharded instantaneous power`` under
    2-D (z x y) sharding; see :func:`make_sharded_power_inc`.

    Two extra post-E-pass halo planes: Ex/Ey one k-plane up (cell-center
    means read k+1) and Ex/Ez one j-plane up (they read j+1); j planes move
    first so the k planes carry fresh corner values (the mean's diagonal
    ex[k+1, j+1] term).
    """
    from ..state import update_coefs

    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)
    K, J, I = p.maxk, p.maxj, p.maxi
    coefs = update_coefs(p, materials)
    if coefs.sigma_cells is None:
        raise NotImplementedError("power accumulation needs lossy materials")

    sig = jnp.asarray(coefs.sigma_cells)
    sig = jnp.pad(sig, ((0, nz * Klp - K), (0, ny * Jlp - J), (0, 0)))
    sig = jax.device_put(sig, NamedSharding(mesh, P("z", "y", None)))
    strip_pad_k = max(0, D + nz * Klp + 1 - S_c)
    strip_pad_j = max(0, ny * Jlp + 1 - J1p)

    up_z = [(i, i - 1) for i in range(1, nz)]
    up_y = [(i, i - 1) for i in range(1, ny)]

    def body(ex, ey, ez, eys, ezs, sg):
        rz = lax.axis_index("z")
        ry = lax.axis_index("y")
        # j halos first (ex, ez), then k halos (ex, ey) whose full-j-width
        # band includes the fresh j halo slot -> corners propagate
        for name in ("ex", "ez"):
            a = ex if name == "ex" else ez
            first = lax.slice_in_dim(a, DJ2, DJ2 + 1, axis=1)
            h = lax.ppermute(first, "y", up_y) if ny > 1 else jnp.zeros_like(first)
            a = lax.dynamic_update_slice_in_dim(a, h, DJ2 + Jlp, axis=1)
            ex, ez = (a, ez) if name == "ex" else (ex, a)
        for name in ("ex", "ey"):
            a = ex if name == "ex" else ey
            first = lax.slice_in_dim(a, D, D + 1, axis=0)
            h = lax.ppermute(first, "z", up_z) if nz > 1 else jnp.zeros_like(first)
            a = lax.dynamic_update_slice_in_dim(a, h, D + Klp, axis=0)
            ex, ey = (a, ey) if name == "ex" else (ex, a)
        at = jnp.float64 if ex.dtype == jnp.float64 else jnp.float32
        k0 = (D + rz * Klp).astype(jnp.int32)
        j0 = (ry * Jlp).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        Kl, Jl = Klp, Jlp
        exl = ex[D : D + Kl + 1, DJ2 : DJ2 + Jl + 1, :I].astype(at)
        eyl = jnp.concatenate(
            [
                ey[D : D + Kl + 1, DJ2 : DJ2 + Jl, :],
                lax.dynamic_slice(eys, (k0, j0, zero), (Kl + 1, Jl, 1)),
            ],
            axis=2,
        ).astype(at)
        ezl = jnp.concatenate(
            [
                ez[D : D + Kl, DJ2 : DJ2 + Jl + 1, :],
                lax.dynamic_slice(ezs, (k0, j0, zero), (Kl, Jl + 1, 1)),
            ],
            axis=2,
        ).astype(at)
        mean_ex = 0.25 * (exl[:Kl, :Jl, :I] + exl[1 : Kl + 1, :Jl, :I] + exl[:Kl, 1 : Jl + 1, :I] + exl[1 : Kl + 1, 1 : Jl + 1, :I])
        mean_ey = 0.25 * (eyl[:Kl, :Jl, :I] + eyl[:Kl, :Jl, 1 : I + 1] + eyl[1 : Kl + 1, :Jl, :I] + eyl[1 : Kl + 1, :Jl, 1 : I + 1])
        mean_ez = 0.25 * (ezl[:Kl, :Jl, :I] + ezl[:Kl, 1 : Jl + 1, :I] + ezl[:Kl, :Jl, 1 : I + 1] + ezl[:Kl, 1 : Jl + 1, 1 : I + 1])
        return sg * (mean_ex**2 + mean_ey**2 + mean_ez**2)

    bspec = P("z", "y", None)
    rspec = P(None, None, None)
    smap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(bspec,) * 3 + (rspec,) * 2 + (bspec,),
        out_specs=bspec,
        check_vma=False,
    )

    def inc(st: ShardedFastState):
        eys = jnp.pad(st.ey_s, ((0, strip_pad_k), (0, strip_pad_j), (0, 0)))
        ezs = jnp.pad(st.ez_s, ((0, strip_pad_k), (0, strip_pad_j), (0, 0)))
        return smap(st.ex, st.ey, st.ez, eys, ezs, sig)

    return inc


def make_sharded_fast_2d_runner(p: Params, mesh: Mesh, interpret: bool | None = None,
                                materials=None, accumulate_power: bool = False):
    """Jitted runner scanning the 2-D sharded fast step.

    Without SAR: ``run(state, xs) -> state``.  With ``accumulate_power``:
    ``run(state, xs, acc) -> (state, acc)`` with ``acc`` the sharded
    (nz*Klp, ny*Jlp, I) fp32 sigma*|E|^2*dt accumulator; rows [:maxk] x
    cols [:maxj] are the canonical heating map.
    """
    step = make_sharded_fast_2d_step(p, mesh, interpret, materials=materials)
    if accumulate_power:
        inc_fn = make_sharded_power_inc_2d(p, mesh, materials)
        dt = p.time_step

        @jax.jit
        def run_acc(st, xs, acc):
            def body(carry, x):
                st, acc = carry
                st = step(st, x)
                acc = acc + (inc_fn(st) * dt).astype(acc.dtype)
                return (st, acc), None

            (st, acc), _ = lax.scan(body, (st, acc), xs)
            return st, acc

        return run_acc

    @jax.jit
    def run(st, xs):
        def body(st, x):
            return step(st, x), None

        st, _ = lax.scan(body, st, xs)
        return st

    return run


def make_sharded_temporal_step(p: Params, mesh: Mesh, s: int = 4,
                               interpret: bool | None = None):
    """Temporal blocking composed with 1-D spatial sharding.

    Per s-step sweep, each shard imports an s-row halo band on both sides of
    every field (12 ppermute planes of s rows — same per-step halo traffic
    as single-step exchange, batched) into the dead-slab/top-pad rows, then
    runs the s-step kernel locally with the global-k offset.  Corr halo rows
    are constant and baked at prep time (``to_sharded_fast`` embeds them
    with neighbor rows included).

    Returns ``group_step(state, xs_group) -> state`` advancing s steps.
    """
    from ..ops.pallas_temporal import TKT, build_temporal_call, plan_nj, supported

    coefs = update_coefs(p, None)
    # the sharded composition uses full-plane windows (nj=1): the per-shard
    # layout shrinks k, not the (j, i) window planes that drive VMEM
    if not (supported(p, coefs, s, n_shards=mesh.devices.size) and plan_nj(p, s) == 1):
        raise NotImplementedError("temporal blocking unsupported for this config")
    assert 2 <= s <= D
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    nk_local = Klp // TKT
    call, nd = build_temporal_call(p, coefs, S_sh, nk_local, s, interpret)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        from ..source import make_source_plan

        plan = make_source_plan(p)

    up = [(i, i - 1) for i in range(1, n)]
    down = [(i, i + 1) for i in range(n - 1)]

    def exchange(a):
        """Fill s halo rows below (from prev shard's top band) and above
        (from next shard's bottom band)."""
        if n == 1:
            return a
        top_band = lax.slice_in_dim(a, D, D + s, axis=0)          # my first s rows
        bot_band = lax.slice_in_dim(a, D + Klp - s, D + Klp, axis=0)  # my last s rows
        from_next = lax.ppermute(top_band, "z", up)
        from_prev = lax.ppermute(bot_band, "z", down)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, D - s, axis=0)
        a = lax.dynamic_update_slice_in_dim(a, from_next, D + Klp, axis=0)
        return a

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2):
        r = lax.axis_index("z")
        koff2 = (r * Klp).astype(jnp.int32).reshape(1, 1)
        ex, ey, ez = exchange(ex), exchange(ey), exchange(ez)
        hx, hy, hz = exchange(hx), exchange(hy), exchange(hz)
        return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2)

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * 8 + (rspec, rspec),
        out_specs=(bspec,) * 6,
        check_vma=False,
    )

    K, J = p.maxk, p.maxj
    import numpy as _np

    # host numpy, never a closed-over jax.Array (axon lowering deadlock, r3)
    zero_drv = _np.zeros((nd, J1p, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        nj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (nj, ni))

    def group_step(st: ShardedFastState, xs_group) -> ShardedFastState:
        ts_g, amps_g = xs_group
        zero_drv_t = jnp.asarray(zero_drv)
        if inject:
            pv1 = drive_patch(amps_g[0])
            zero = jnp.zeros_like(pv1).astype(dtype)
            sl = (D, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv1.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv1).astype(dtype)),
            )
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
            sl2 = (slice(0, nd), slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
            de2 = zero_drv_t.at[sl2].set(pvs.astype(dtype))
            dh2 = zero_drv_t.at[sl2].set((-plan.inv_z_te * pvs).astype(dtype))
        else:
            de2 = dh2 = zero_drv_t
        ex, ey, ez, hx, hy, hz = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz, st.corr_hy, st.corr_hz, de2, dh2
        )
        hx_s = _advance_hx_strip(p, st, f_h, het=False, n_steps=s)
        return dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)

    return group_step


def make_sharded_temporal_runner(p: Params, mesh: Mesh, s: int = 4,
                                 interpret: bool | None = None):
    """Jitted ``run(state, xs) -> state``; trailing steps (n % s) use the
    single-step sharded fast path."""
    group_step = make_sharded_temporal_step(p, mesh, s, interpret)
    single_step = make_sharded_fast_step(p, mesh, interpret)

    @jax.jit
    def run(st, xs):
        ts, amps = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // s
        if n_grp:
            g = (ts[: s * n_grp].reshape(n_grp, s), amps[: s * n_grp].reshape(n_grp, s))

            def body(st, x):
                return group_step(st, x), None

            st, _ = lax.scan(body, st, g)
        for r in range(nsteps % s):
            idx = s * n_grp + r
            st = single_step(st, (ts[idx], amps[idx]))
        return st

    return run


def make_sharded_temporal_2d_step(p: Params, mesh: Mesh, s: int = 4,
                                  interpret: bool | None = None):
    """Temporal blocking composed with 2-D (z x y) spatial sharding.

    Per s-step sweep each shard imports s-row halo bands along BOTH grid
    axes (j bands first, then k bands, so the k bands carry fresh corner
    rows), then runs the s-step kernel on full-plane per-shard windows
    whose global (k, j) origin rides in the SMEM offset pair.  The per-
    shard j extent is what makes this fit VMEM at 512^3+ — full planes
    shrink by ~ny — checked against the calibrated model.  Corr streams
    are constant: their j/k halo rows are baked at prep
    (``to_sharded_fast_2d`` embeds them with neighbor rows).

    Returns ``group_step(state, xs_group) -> state`` advancing s steps.
    """
    from ..ops.pallas_temporal import (
        PLAN_MARGIN,
        TKT,
        VMEM_BUDGET,
        build_temporal_call,
        vmem_estimate,
    )
    from ..state import update_coefs

    coefs = update_coefs(p, None)
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)
    lossy = not isinstance(coefs.ca_x, (int, float))
    if (
        lossy
        or coefs.ca_x != 1.0
        or (dims(p)[0] - D) // TKT < 2
        or s > DJ2
        or vmem_estimate(p, s, 1, rows=Jt_sh) > VMEM_BUDGET - PLAN_MARGIN
    ):
        raise NotImplementedError("sharded temporal 2-D unsupported for this config")
    assert 2 <= s <= D
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    nk_local = Klp // TKT
    call, nd = build_temporal_call(p, coefs, S_sh, nk_local, s, interpret,
                                   J_rows=Jt_sh)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        import numpy as _np

        from ..source import make_source_plan

        plan = make_source_plan(p)
        jrows = _np.arange(plan.j0, plan.j1)
        jstore = jnp.asarray((jrows // Jlp) * Jt_sh + DJ2 + (jrows % Jlp))

    up_z = [(i, i - 1) for i in range(1, nz)]
    down_z = [(i, i + 1) for i in range(nz - 1)]
    up_y = [(i, i - 1) for i in range(1, ny)]
    down_y = [(i, i + 1) for i in range(ny - 1)]

    def exchange_j(a):
        if ny == 1:
            return a
        first = lax.slice_in_dim(a, DJ2, DJ2 + s, axis=1)
        last = lax.slice_in_dim(a, DJ2 + Jlp - s, DJ2 + Jlp, axis=1)
        from_next = lax.ppermute(first, "y", up_y)
        from_prev = lax.ppermute(last, "y", down_y)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, DJ2 - s, axis=1)
        a = lax.dynamic_update_slice_in_dim(a, from_next, DJ2 + Jlp, axis=1)
        return a

    def exchange_k(a):
        if nz == 1:
            return a
        first = lax.slice_in_dim(a, D, D + s, axis=0)
        last = lax.slice_in_dim(a, D + Klp - s, D + Klp, axis=0)
        from_next = lax.ppermute(first, "z", up_z)
        from_prev = lax.ppermute(last, "z", down_z)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, D - s, axis=0)
        a = lax.dynamic_update_slice_in_dim(a, from_next, D + Klp, axis=0)
        return a

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2):
        rz = lax.axis_index("z")
        ry = lax.axis_index("y")
        koff2 = jnp.stack(
            [(rz * Klp).astype(jnp.int32), (ry * Jlp - DJ2).astype(jnp.int32)]
        ).reshape(1, 2)
        # j bands first, then k bands: the k bands span the full local j
        # extent including just-filled j halos, so corner rows propagate
        ex, ey, ez = exchange_j(ex), exchange_j(ey), exchange_j(ez)
        hx, hy, hz = exchange_j(hx), exchange_j(hy), exchange_j(hz)
        ex, ey, ez = exchange_k(ex), exchange_k(ey), exchange_k(ez)
        hx, hy, hz = exchange_k(hx), exchange_k(hy), exchange_k(hz)
        return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2)

    bspec = P("z", "y", None)
    dspec = P(None, "y", None)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * 8 + (dspec, dspec),
        out_specs=(bspec,) * 6,
        check_vma=False,
    )

    K, J = p.maxk, p.maxj
    import numpy as _np

    # host numpy, never a closed-over jax.Array (axon lowering deadlock, r3)
    zero_drv = _np.zeros((nd, ny * Jt_sh, Ib), dtype)
    zero_drv_canon = _np.zeros((nd, J1p, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        npj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (npj, ni))

    def drive_extended(pvs):
        """(nd, npj, ni) patch values -> per-shard extended layout WITH the
        halo rows duplicated: the kernel applies the k=0 drive inside the
        sweep on halo copies of patch rows too, and a zero there would
        corrupt the halo band (these arrays are never re-exchanged)."""
        c = jnp.asarray(zero_drv_canon).at[
            :, plan.j0 : plan.j1, plan.i0 : plan.i1
        ].set(pvs.astype(dtype))
        return _reshard_j(c, ny, Jlp, Jt_sh, halo=True)

    def group_step(st: ShardedFastState, xs_group) -> ShardedFastState:
        ts_g, amps_g = xs_group
        if inject:
            pv1 = drive_patch(amps_g[0])
            zero = jnp.zeros_like(pv1).astype(dtype)
            sl = (D, jstore, slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv1.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv1).astype(dtype)),
            )
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
            de2 = drive_extended(pvs)
            dh2 = drive_extended(-plan.inv_z_te * pvs)
        else:
            de2 = dh2 = jnp.asarray(zero_drv)
        ex, ey, ez, hx, hy, hz = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz, st.corr_hy, st.corr_hz, de2, dh2
        )
        hx_s = _advance_hx_strip(p, st, f_h, het=False, n_steps=s)
        return dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)

    return group_step


def make_sharded_temporal_2d_runner(p: Params, mesh: Mesh, s: int = 4,
                                    interpret: bool | None = None):
    """Jitted ``run(state, xs) -> state``; trailing steps (n % s) use the
    single-step 2-D sharded fast path."""
    group_step = make_sharded_temporal_2d_step(p, mesh, s, interpret)
    single_step = make_sharded_fast_2d_step(p, mesh, interpret)

    @jax.jit
    def run(st, xs):
        ts, amps = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // s
        if n_grp:
            g = (ts[: s * n_grp].reshape(n_grp, s), amps[: s * n_grp].reshape(n_grp, s))

            def body(st, x):
                return group_step(st, x), None

            st, _ = lax.scan(body, st, g)
        for r in range(nsteps % s):
            idx = s * n_grp + r
            st = single_step(st, (ts[idx], amps[idx]))
        return st

    return run


def sharded_stream_2d_supported(p: Params, nz: int, ny: int,
                                materials=None, sar: bool = False) -> bool:
    """True when the streaming wavefront composes with 2-D z x y sharding."""
    from ..ops.pallas_stream import pick_shard_2d_s

    coefs = update_coefs(p, materials)
    g = _geometry2d(p, nz, ny)
    return pick_shard_2d_s(p, coefs, g[5], g[8], sar=sar) is not None


def make_sharded_stream_2d_step(p: Params, mesh: Mesh,
                                interpret: bool | None = None,
                                materials=None,
                                accumulate_power: bool = False):
    """Streaming wavefront composed with 2-D (z x y) spatial sharding.

    The k axis runs the 1-D sharded stream schedule (s-row halo bands,
    triangular validity, zero recompute); the j axis is handled the same
    way — per sweep each shard imports s-row j bands into the DJ2 halo
    slots first, then the k bands (which then carry fresh corner rows),
    and level m's j validity shrinks one row per side per level, making
    level s exact on the shard's own j rows (s <= DJ2 = 8).  The kernel
    sees the local (S_sh, Jt_sh, Ib) slab as one full-plane sweep with a
    global (k, j) offset pair in SMEM; halo-row updates that wrap the
    local j edge only corrupt the halo wedge, refreshed by the next
    exchange.  Constant slabs (corr, ca/cb, hf, sigma) are baked with
    neighbor halo rows at prep.

    With ``accumulate_power`` (r3): the in-kernel rolling accumulator
    band runs per shard; the j bands widen to s + 1 rows (the level-m
    cell-center mean reads E^m at j+1, so the row above the shard's own
    rows must stay exact through level s — needs s + 1 <= DJ2) and the
    caller crops the halo rows of the per-shard acc slab (their
    contributions are the neighbor's, accumulated there too).  Returns
    ``group_step((state, acc), xs_group) -> (state, acc)``.
    """
    from ..ops.pallas_stream import build_stream_shard_call, pick_shard_2d_s

    coefs = update_coefs(p, materials)
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)
    s = pick_shard_2d_s(p, coefs, Klp, Jt_sh, sar=accumulate_power)
    if s is None:
        raise NotImplementedError("2-D sharded streaming unsupported for this config")
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    call, nd = build_stream_shard_call(p, coefs, S_sh, Klp, s, interpret,
                                       sar=accumulate_power,
                                       J_rows=Jt_sh, joff2=True)
    bj = s + 1 if accumulate_power else s  # j-band rows (see docstring)

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        import numpy as _np

        from ..source import make_source_plan

        plan = make_source_plan(p)
        jrows = _np.arange(plan.j0, plan.j1)
        jstore = jnp.asarray((jrows // Jlp) * Jt_sh + DJ2 + (jrows % Jlp))

    up_z = [(i, i - 1) for i in range(1, nz)]
    down_z = [(i, i + 1) for i in range(nz - 1)]
    up_y = [(i, i - 1) for i in range(1, ny)]
    down_y = [(i, i + 1) for i in range(ny - 1)]

    jrow_col = jnp.arange(Jt_sh)[None, :, None]

    def exchange_j(a, ry):
        if ny > 1:
            first = lax.slice_in_dim(a, DJ2, DJ2 + bj, axis=1)
            last = lax.slice_in_dim(a, DJ2 + Jlp - bj, DJ2 + Jlp, axis=1)
            from_next = lax.ppermute(first, "y", up_y)
            from_prev = lax.ppermute(last, "y", down_y)
            a = lax.dynamic_update_slice_in_dim(a, from_prev, DJ2 - bj, axis=1)
            a = lax.dynamic_update_slice_in_dim(a, from_next, DJ2 + Jlp, axis=1)
        # re-zero the GLOBAL-edge pad slots: the sweep writes its invalid
        # wedge into the halo rows, but the canonical layout guarantees
        # zeros beyond the grid (j=0's E update reads j-1 via an unmasked
        # roll — zero there is the physics, not a don't-care)
        edge = ((ry == 0) & (jrow_col < DJ2)) | (
            (ry == ny - 1) & (jrow_col >= DJ2 + Jlp))
        return jnp.where(edge, jnp.zeros((), a.dtype), a)

    def exchange_k(a):
        if nz == 1:
            return a
        first = lax.slice_in_dim(a, D, D + s, axis=0)
        last = lax.slice_in_dim(a, D + Klp - s, D + Klp, axis=0)
        from_next = lax.ppermute(first, "z", up_z)
        from_prev = lax.ppermute(last, "z", down_z)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, D - s, axis=0)
        a = lax.dynamic_update_slice_in_dim(a, from_next, D + Klp, axis=0)
        return a

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *rest):
        rz = lax.axis_index("z")
        ry = lax.axis_index("y")
        koff2 = jnp.stack(
            [(rz * Klp - s).astype(jnp.int32),
             (ry * Jlp - DJ2).astype(jnp.int32)]
        ).reshape(1, 2)
        # j bands first, then k bands: the k bands span the full local j
        # extent including just-filled j halos, so corner rows propagate
        ex, ey, ez = exchange_j(ex, ry), exchange_j(ey, ry), exchange_j(ez, ry)
        hx, hy, hz = exchange_j(hx, ry), exchange_j(hy, ry), exchange_j(hz, ry)
        ex, ey, ez = exchange_k(ex), exchange_k(ey), exchange_k(ez)
        hx, hy, hz = exchange_k(hx), exchange_k(hy), exchange_k(hz)
        if accumulate_power:
            sg, acc = rest[-2:]
            rest = rest[:-2]
        if het:
            hf3 = rest[-3:]
            rest = rest[:-3]
        else:
            hf3 = ()
        if accumulate_power:
            return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                        *rest, hf=hf3, sigma=sg, acc=acc)
        return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                    *rest, hf=hf3)

    bspec = P("z", "y", None)
    dspec = P(None, "y", None)
    ncf = (6 if lossy else 0) + (3 if het else 0) + (2 if accumulate_power else 0)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * 8 + (dspec, dspec) + (bspec,) * ncf,
        out_specs=(bspec,) * (6 + (1 if accumulate_power else 0)),
        check_vma=False,
    )

    K, J = p.maxk, p.maxj
    import numpy as _np

    # host numpy, never a closed-over jax.Array (axon lowering deadlock, r3)
    zero_drv = _np.zeros((nd, ny * Jt_sh, Ib), dtype)
    zero_drv_canon = _np.zeros((nd, J1p, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        npj, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (npj, ni))

    def drive_extended(pvs):
        """Patch values in the per-shard extended layout WITH the halo
        rows duplicated (see make_sharded_temporal_2d_step)."""
        c = jnp.asarray(zero_drv_canon).at[
            :, plan.j0 : plan.j1, plan.i0 : plan.i1
        ].set(pvs.astype(dtype))
        return _reshard_j(c, ny, Jlp, Jt_sh, halo=True)

    def advance(st: ShardedFastState, acc, xs_group):
        ts_g, amps_g = xs_group
        if inject:
            pv1 = drive_patch(amps_g[0])
            zero = jnp.zeros_like(pv1).astype(dtype)
            sl = (D, jstore, slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv1.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv1).astype(dtype)),
            )
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
            de2 = drive_extended(pvs)
            dh2 = drive_extended(-plan.inv_z_te * pvs)
        else:
            de2 = dh2 = jnp.asarray(zero_drv)
        cf = (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z) if lossy else ()
        if het:
            cf = cf + (st.hf_x, st.hf_y, st.hf_z)
        if accumulate_power:
            cf = cf + (st.sigma_c, acc)
        outs = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, de2, dh2, *cf
        )
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc = outs
        else:
            ex, ey, ez, hx, hy, hz = outs
        hx_s = _advance_hx_strip(p, st, f_h, het, n_steps=s)
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)
        return st, acc

    if accumulate_power:
        def group_step(carry, xs_group):
            st, acc = carry
            return advance(st, acc, xs_group)
    else:
        def group_step(st, xs_group):
            return advance(st, None, xs_group)[0]

    group_step.s = s
    return group_step


def make_sharded_stream_2d_runner(p: Params, mesh: Mesh,
                                  interpret: bool | None = None,
                                  materials=None,
                                  accumulate_power: bool = False):
    """Jitted runner; trailing steps (n % s) use the single-step 2-D
    sharded fast path.

    Without SAR: ``run(state, xs) -> state``.  With ``accumulate_power``:
    ``run(state, xs, acc) -> (state, acc)`` — acc is the sharded
    (nz*Klp, jrows, icols) fp32 sigma*|E|^2*dt accumulator (jrows <=
    ny*Jlp, the 2-D single-step contract); the sweeps accumulate
    in-kernel into a per-shard slab embedding whose halo rows are
    cropped back out (their contributions belong to — and are also
    accumulated by — the neighbor)."""
    group_step = make_sharded_stream_2d_step(p, mesh, interpret, materials,
                                             accumulate_power=accumulate_power)
    s = group_step.s
    single_step = make_sharded_fast_2d_step(p, mesh, interpret,
                                            materials=materials)
    nz, ny = mesh.shape["z"], mesh.shape["y"]
    S_c, J1p, Ib, K1, J1, Klp, S_sh, Jlp, Jt_sh = _geometry2d(p, nz, ny)

    if accumulate_power:
        inc_fn = make_sharded_power_inc_2d(p, mesh, materials)
        dt = p.time_step

        def embed_acc(acc):
            jrows, icols = acc.shape[1], acc.shape[2]
            a = jnp.pad(acc, ((0, 0), (0, ny * Jlp - jrows), (0, Ib - icols)))
            a = a.reshape(nz, Klp, ny, Jlp, Ib)
            out = jnp.zeros((nz, S_sh, ny, Jt_sh, Ib), jnp.float32)
            out = out.at[:, D : D + Klp, :, DJ2 : DJ2 + Jlp].set(a)
            return out.reshape(nz * S_sh, ny * Jt_sh, Ib)

        def crop_acc(acc_sl, jrows, icols):
            a = acc_sl.reshape(nz, S_sh, ny, Jt_sh, Ib)
            a = a[:, D : D + Klp, :, DJ2 : DJ2 + Jlp]
            return a.reshape(nz * Klp, ny * Jlp, Ib)[:, :jrows, :icols]

        @jax.jit
        def run_acc(st, xs, acc):
            ts, amps = xs
            nsteps = ts.shape[0]
            n_grp = nsteps // s
            if n_grp:
                g = (ts[: s * n_grp].reshape(n_grp, s),
                     amps[: s * n_grp].reshape(n_grp, s))

                def body(carry, x):
                    return group_step(carry, x), None

                jrows, icols = acc.shape[1], acc.shape[2]
                acc_sl = embed_acc(acc)
                (st, acc_sl), _ = lax.scan(body, (st, acc_sl), g)
                acc = crop_acc(acc_sl, jrows, icols)
            for r in range(nsteps % s):
                idx = s * n_grp + r
                st = single_step(st, (ts[idx], amps[idx]))
                inc = inc_fn(st)[:, : acc.shape[1], : acc.shape[2]]
                acc = acc + (inc * dt).astype(acc.dtype)
            return st, acc

        return run_acc

    @jax.jit
    def run(st, xs):
        ts, amps = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // s
        if n_grp:
            g = (ts[: s * n_grp].reshape(n_grp, s), amps[: s * n_grp].reshape(n_grp, s))

            def body(st, x):
                return group_step(st, x), None

            st, _ = lax.scan(body, st, g)
        for r in range(nsteps % s):
            idx = s * n_grp + r
            st = single_step(st, (ts[idx], amps[idx]))
        return st

    return run


def sharded_temporal_supported(p: Params, nz: int, ny: int, s: int) -> bool:
    """True when the (nz, ny) mesh can run the s-step temporal composition.

    Mirrors the gates of :func:`make_sharded_temporal_step` (1-D: vacuum,
    full-plane windows, per-shard HBM headroom) and
    :func:`make_sharded_temporal_2d_step` (2-D: per-shard j-plane windows
    within the calibrated VMEM model)."""
    from ..ops.pallas_temporal import (
        PLAN_MARGIN,
        TKT,
        VMEM_BUDGET,
        plan_nj,
        supported,
        vmem_estimate,
    )

    coefs = update_coefs(p, None)
    if not isinstance(coefs.ca_x, (int, float)) or coefs.ca_x != 1.0:
        return False
    if not 2 <= s <= (D if ny == 1 else DJ2):
        return False
    if (dims(p)[0] - D) // TKT < 2:
        return False
    if ny == 1:
        return supported(p, coefs, s, n_shards=nz) and plan_nj(p, s) == 1
    Jt_sh = _geometry2d(p, nz, ny)[8]
    return vmem_estimate(p, s, 1, rows=Jt_sh) <= VMEM_BUDGET - PLAN_MARGIN


def pick_sharded_temporal_s(p: Params, nz: int, ny: int) -> int | None:
    """Largest supported steps-per-sweep for this mesh (None: unsupported).

    Follows the measured single-chip sweet spots (step.default_temporal_s):
    bf16 peaks at s=4, fp32 at the largest full-plane-feasible s <= 6."""
    prefer = (4, 3, 2) if jnp.dtype(p.dtype) == jnp.bfloat16 else (6, 5, 4, 3, 2)
    for s in prefer:
        if sharded_temporal_supported(p, nz, ny, s):
            return s
    return None


def sharded_stream_supported(p: Params, n: int, materials=None,
                             sar: bool = False) -> bool:
    """True when the streaming wavefront composes with 1-D z sharding."""
    from ..ops.pallas_stream import pick_shard_plan

    coefs = update_coefs(p, materials)
    Klp = _geometry(p, n)[4]
    return pick_shard_plan(p, coefs, Klp, sar=sar) is not None


def make_sharded_stream_step(p: Params, mesh: Mesh,
                             interpret: bool | None = None, materials=None,
                             nj: int | None = None,
                             accumulate_power: bool = False):
    """Streaming wavefront kernel composed with 1-D spatial sharding.

    Per s-step sweep each shard imports an s-row halo band on both sides
    of every field (12 ppermute planes, batched — the same per-step halo
    traffic as single-step exchange) into the dead-slab/top-pad rows, then
    runs the skewed pipeline over [D-s, D+Klp+s): triangular validity
    (level m correct from halo row -s+m) makes level s exactly cover the
    shard's own rows with ZERO recompute — the wavefront analogue of the
    reference MPI branch running its best sequential kernel per rank
    (description.pdf section 2.2).  Lossy media ride the halo-baked ca/cb
    slabs (``to_sharded_fast`` embeds neighbor coefficient rows).

    Returns ``group_step(state, xs_group) -> state`` advancing
    ``group_step.s`` steps (8 for computation-mode vacuum, else 4 —
    corr/coef windows need s <= D/2; see pick_shard_plan).  When
    ``group_step.nj`` > 1 (big-J grids whose full-plane windows bust
    per-shard VMEM — 1-D z sharding shrinks k only) the state's
    kernel-windowed arrays must be j-extended for the sweep; the runner
    round-trips them per chunk.  Force the tiling via ``nj=`` or
    ``FDTD_SSTREAM_NJ``."""
    import os

    from ..ops.pallas_stream import build_stream_shard_call, pick_shard_plan

    coefs = update_coefs(p, materials)
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None else (jax.default_backend() != "tpu")
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    if nj is None:
        env = os.environ.get("FDTD_SSTREAM_NJ")
        if env:
            nj = int(env)
    plan_ = pick_shard_plan(p, coefs, Klp, sar=accumulate_power)
    if plan_ is None:
        raise NotImplementedError("sharded streaming unsupported for this config")
    s = plan_[0]
    if nj is None:
        nj = plan_[1]
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    call, nd = build_stream_shard_call(p, coefs, S_sh, Klp, s, interpret,
                                       nj=nj, sar=accumulate_power)
    from ..ops.pallas_temporal import DJ, jt_extents

    djo = DJ if nj > 1 else 0        # content-j offset in the sweep layout
    Jd = jt_extents(p, nj)[1] if nj > 1 else J1p  # drive-array j rows

    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    inject = p.mode == Mode.COMPUTATION
    if inject:
        from ..source import make_source_plan

        plan = make_source_plan(p)

    up = [(i, i - 1) for i in range(1, n)]
    down = [(i, i + 1) for i in range(n - 1)]

    def exchange(a):
        if n == 1:
            return a
        top_band = lax.slice_in_dim(a, D, D + s, axis=0)
        bot_band = lax.slice_in_dim(a, D + Klp - s, D + Klp, axis=0)
        from_next = lax.ppermute(top_band, "z", up)
        from_prev = lax.ppermute(bot_band, "z", down)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, D - s, axis=0)
        a = lax.dynamic_update_slice_in_dim(a, from_next, D + Klp, axis=0)
        return a

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, *rest):
        r = lax.axis_index("z")
        koff2 = (r * Klp - s).astype(jnp.int32).reshape(1, 1)
        ex, ey, ez = exchange(ex), exchange(ey), exchange(ez)
        hx, hy, hz = exchange(hx), exchange(hy), exchange(hz)
        if accumulate_power:
            sg, acc = rest[-2:]
            rest = rest[:-2]
        if het:
            hf3 = rest[-3:]
            rest = rest[:-3]
        else:
            hf3 = ()
        if accumulate_power:
            return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                        *rest, hf=hf3, sigma=sg, acc=acc)
        return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                    *rest, hf=hf3)

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    ncf = 6 if lossy else 0
    nhf = 3 if het else 0
    nsar = 2 if accumulate_power else 0
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * 8 + (rspec, rspec) + (bspec,) * (ncf + nhf + nsar),
        out_specs=(bspec,) * (6 + (1 if accumulate_power else 0)),
        check_vma=False,
    )

    K, J = p.maxk, p.maxj
    import numpy as _np

    # host numpy, never a closed-over jax.Array (axon lowering deadlock, r3)
    zero_drv = _np.zeros((nd, Jd, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        rows, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (rows, ni))

    def advance(st: ShardedFastState, acc, xs_group):
        ts_g, amps_g = xs_group
        zero_drv_t = jnp.asarray(zero_drv)
        if inject:
            pv1 = drive_patch(amps_g[0])
            zero = jnp.zeros_like(pv1).astype(dtype)
            sl = (D, slice(djo + plan.j0, djo + plan.j1),
                  slice(plan.i0, plan.i1))
            st = dataclasses.replace(
                st,
                ez=st.ez.at[sl].set(pv1.astype(dtype)),
                ex=st.ex.at[sl].set(zero),
                hz=st.hz.at[sl].set(zero),
                hx=st.hx.at[sl].set((-plan.inv_z_te * pv1).astype(dtype)),
            )
            pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
            sl2 = (slice(0, nd), slice(djo + plan.j0, djo + plan.j1),
                   slice(plan.i0, plan.i1))
            de2 = zero_drv_t.at[sl2].set(pvs.astype(dtype))
            dh2 = zero_drv_t.at[sl2].set((-plan.inv_z_te * pvs).astype(dtype))
        else:
            de2 = dh2 = zero_drv_t
        cf = (st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z) if lossy else ()
        if het:
            cf = cf + (st.hf_x, st.hf_y, st.hf_z)
        if accumulate_power:
            cf = cf + (st.sigma_c, acc)
        outs = smap(
            st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
            st.corr_hy, st.corr_hz, de2, dh2, *cf
        )
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc = outs
        else:
            ex, ey, ez, hx, hy, hz = outs
        hx_s = _advance_hx_strip(p, st, f_h, het, n_steps=s)
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy, hz=hz, hx_s=hx_s)
        return st, acc

    if accumulate_power:
        def group_step(carry, xs_group):
            st, acc = carry
            return advance(st, acc, xs_group)
    else:
        def group_step(st, xs_group):
            return advance(st, None, xs_group)[0]

    group_step.s = s
    group_step.nj = nj
    return group_step


def _jt_windowed_fields(st: ShardedFastState, lossy: bool, use_corr: bool):
    """State fields the j-tiled sharded sweep windows (and so must be
    j-extended): the six bulks, plus the corr slabs (validation), the
    ca/cb coefficient slabs (lossy media), and the sigma slab (SAR)."""
    names = ["ex", "ey", "ez", "hx", "hy", "hz"]
    if use_corr:
        names += ["corr_hy", "corr_hz"]
    if lossy:
        names += ["ca_x", "ca_y", "ca_z", "cb_x", "cb_y", "cb_z"]
    if st.hf_x is not None:
        names += ["hf_x", "hf_y", "hf_z"]
    if st.sigma_c is not None:
        names += ["sigma_c"]
    return names


def jt_extend_sharded(p: Params, st: ShardedFastState, nj: int,
                      lossy: bool, use_corr: bool) -> ShardedFastState:
    """j-extend a ShardedFastState's kernel-windowed arrays (j is
    unsharded, so the padding is uniform across z shards); strips and
    het-mu factors stay in the canonical layout."""
    from ..ops.pallas_temporal import DJ, jt_extents

    _, J1, _ = dims(p)
    _, Jt = jt_extents(p, nj)
    pad = lambda a: jnp.pad(a, ((0, 0), (DJ, Jt - DJ - J1), (0, 0)))
    ups = {n: pad(getattr(st, n))
           for n in _jt_windowed_fields(st, lossy, use_corr)}
    return dataclasses.replace(st, **ups)


def jt_restore_sharded(p: Params, st: ShardedFastState, nj: int,
                       lossy: bool, use_corr: bool) -> ShardedFastState:
    """Inverse of jt_extend_sharded."""
    from ..ops.pallas_temporal import DJ

    _, J1, _ = dims(p)
    unpad = lambda a: a[:, DJ : DJ + J1]
    ups = {n: unpad(getattr(st, n))
           for n in _jt_windowed_fields(st, lossy, use_corr)}
    return dataclasses.replace(st, **ups)


def make_sharded_stream_runner(p: Params, mesh: Mesh,
                               interpret: bool | None = None, materials=None,
                               nj: int | None = None,
                               accumulate_power: bool = False):
    """Jitted runner; trailing steps (n % s) use the single-step sharded
    fast path.  j-tiled plans round-trip the kernel-windowed arrays
    through the j-extended layout per call.

    Without SAR: ``run(state, xs) -> state``.  With ``accumulate_power``:
    ``run(state, xs, acc) -> (state, acc)`` — same acc contract as
    make_sharded_fast_runner ((n*Klp, J, I) fp32 sigma*|E|^2*dt rows);
    the sweeps accumulate in-kernel into a slab-layout embedding, the
    trailing steps through the per-step jnp increment."""
    group_step = make_sharded_stream_step(p, mesh, interpret, materials,
                                          nj=nj,
                                          accumulate_power=accumulate_power)
    s = group_step.s
    njg = group_step.nj
    single_step = make_sharded_fast_step(p, mesh, interpret, materials)
    coefs = update_coefs(p, materials)
    lossy = not isinstance(coefs.ca_x, (int, float))
    use_corr = p.mode != Mode.COMPUTATION
    n = mesh.shape["z"]
    _, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)[:6]
    K, J, I = p.maxk, p.maxj, p.maxi

    if accumulate_power:
        from ..ops.pallas_temporal import DJ, jt_extents

        inc_fn = make_sharded_power_inc(p, mesh, materials)
        dt = p.time_step
        dj = DJ if njg > 1 else 0
        Jd = jt_extents(p, njg)[1] if njg > 1 else J1p

        def embed_acc(acc):
            a = acc.reshape(n, Klp, *acc.shape[1:])
            out = jnp.zeros((n, S_sh, Jd, Ib), jnp.float32)
            out = out.at[:, D : D + Klp, dj : dj + acc.shape[1],
                         : acc.shape[2]].set(a)
            return out.reshape(n * S_sh, Jd, Ib)

        def crop_acc(acc_sl, jrows, icols):
            a = acc_sl.reshape(n, S_sh, Jd, Ib)
            a = a[:, D : D + Klp, dj : dj + jrows, :icols]
            return a.reshape(n * Klp, jrows, icols)

        @jax.jit
        def run_acc(st, xs, acc):
            ts, amps = xs
            nsteps = ts.shape[0]
            n_grp = nsteps // s
            if n_grp:
                g = (ts[: s * n_grp].reshape(n_grp, s),
                     amps[: s * n_grp].reshape(n_grp, s))

                def body(carry, x):
                    return group_step(carry, x), None

                jrows, icols = acc.shape[1], acc.shape[2]
                acc_sl = embed_acc(acc)
                if njg > 1:
                    st = jt_extend_sharded(p, st, njg, lossy, use_corr)
                (st, acc_sl), _ = lax.scan(body, (st, acc_sl), g)
                if njg > 1:
                    st = jt_restore_sharded(p, st, njg, lossy, use_corr)
                acc = crop_acc(acc_sl, jrows, icols)
            for r in range(nsteps % s):
                idx = s * n_grp + r
                st = single_step(st, (ts[idx], amps[idx]))
                acc = acc + (inc_fn(st) * dt).astype(acc.dtype)
            return st, acc

        return run_acc

    @jax.jit
    def run(st, xs):
        ts, amps = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // s
        if n_grp:
            g = (ts[: s * n_grp].reshape(n_grp, s), amps[: s * n_grp].reshape(n_grp, s))

            def body(st, x):
                return group_step(st, x), None

            if njg > 1:
                st = jt_extend_sharded(p, st, njg, lossy, use_corr)
            st, _ = lax.scan(body, st, g)
            if njg > 1:
                st = jt_restore_sharded(p, st, njg, lossy, use_corr)
        for r in range(nsteps % s):
            idx = s * n_grp + r
            st = single_step(st, (ts[idx], amps[idx]))
        return st

    return run


def make_sharded_e_means(p: Params, mesh: Mesh):
    """``means(st) -> (3, n*Klp, J, I) sharded E cell means`` (component
    order Ex, Ey, Ez) for the odd-trailing-step DFT accumulation under
    1-D z sharding — the same 4-edge stencil, halo exchange, and
    strip-column splicing as :func:`make_sharded_power_inc`, without the
    sigma weighting (generalizing `main.c:550-560`'s cell aggregation)."""
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    K, J, I = p.maxk, p.maxj, p.maxi
    strip_pad = max(0, D + n * Klp + 1 - S_c)
    up = [(i, i - 1) for i in range(1, n)]

    def body(ex, ey, ez, eys, ezs):
        r = lax.axis_index("z")
        for name in ("ex", "ey"):
            a = ex if name == "ex" else ey
            first = lax.slice_in_dim(a, D, D + 1, axis=0)
            h = lax.ppermute(first, "z", up) if n > 1 else jnp.zeros_like(first)
            a = lax.dynamic_update_slice_in_dim(a, h, D + Klp, axis=0)
            ex, ey = (a, ey) if name == "ex" else (ex, a)
        at = jnp.float64 if ex.dtype == jnp.float64 else jnp.float32
        k0 = D + r * Klp
        exl = ex[D : D + Klp + 1, : J + 1, :I].astype(at)
        eyl = jnp.concatenate(
            [ey[D : D + Klp + 1, :J, :],
             lax.dynamic_slice_in_dim(eys, k0, Klp + 1, axis=0)[:, :J]],
            axis=2,
        ).astype(at)
        ezl = jnp.concatenate(
            [ez[D : D + Klp, : J + 1, :],
             lax.dynamic_slice_in_dim(ezs, k0, Klp, axis=0)[:, : J + 1]],
            axis=2,
        ).astype(at)
        Kl = Klp
        mean_ex = 0.25 * (exl[:Kl, :J, :I] + exl[1 : Kl + 1, :J, :I]
                          + exl[:Kl, 1 : J + 1, :I]
                          + exl[1 : Kl + 1, 1 : J + 1, :I])
        mean_ey = 0.25 * (eyl[:Kl, :J, :I] + eyl[:Kl, :J, 1 : I + 1]
                          + eyl[1 : Kl + 1, :J, :I]
                          + eyl[1 : Kl + 1, :J, 1 : I + 1])
        mean_ez = 0.25 * (ezl[:Kl, :J, :I] + ezl[:Kl, 1 : J + 1, :I]
                          + ezl[:Kl, :J, 1 : I + 1]
                          + ezl[:Kl, 1 : J + 1, 1 : I + 1])
        return jnp.stack([mean_ex, mean_ey, mean_ez])

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    smap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(bspec,) * 3 + (rspec,) * 2,
        out_specs=P(None, "z", None, None),
        check_vma=False,
    )

    def means(st: ShardedFastState):
        eys = jnp.pad(st.ey_s, ((0, strip_pad), (0, 0), (0, 0)))
        ezs = jnp.pad(st.ez_s, ((0, strip_pad), (0, 0), (0, 0)))
        return smap(st.ex, st.ey, st.ez, eys, ezs)

    return means


def sharded_stream_dft_supported(p: Params, n: int, dft, materials=None,
                                 sar: bool = False) -> bool:
    """True when the in-kernel DFT rides the sharded streaming wavefront
    (r5, VERDICT r4 #3): fields='e', computation mode, 1-D z mesh, and a
    full-plane per-shard plan that fits VMEM with the phasor bands."""
    from ..ops.pallas_stream import pick_shard_plan

    if dft is None or dft.fields != "e" or p.mode != Mode.COMPUTATION:
        return False
    coefs = update_coefs(p, materials)
    Klp = _geometry(p, n)[4]
    plan = pick_shard_plan(p, coefs, Klp, sar=sar, dft_nf=dft.nf)
    return plan is not None and plan[1] == 1


def make_sharded_stream_dft_runner(p: Params, mesh: Mesh, dft,
                                   interpret: bool | None = None,
                                   materials=None,
                                   accumulate_power: bool = False):
    """Monitored sharded streaming runner (r5, VERDICT r4 #3):
    ``run(st, (ts, amps, cw, sw), power, dft_acc) ->
    (st, power, dft_acc, None)`` — the monitored-chunk contract, with
    the per-frequency phasor bands accumulating IN-KERNEL per shard and
    per-shard output (no rank-0 gather; the bottleneck description.pdf
    section 5 names).  ``dft_acc``/``power`` are canonical at chunk
    boundaries (checkpoint-compatible with single-chip runs); they ride
    the sweeps in sharded slab layouts.  Odd trailing steps run the
    single-step sharded kernel with the canonical accumulation via
    :func:`make_sharded_e_means`."""
    from jax.sharding import NamedSharding
    from ..ops.pallas_stream import build_stream_shard_call, pick_shard_plan
    from ..source import make_source_plan

    nf = dft.nf
    assert dft.fields == "e", "in-kernel DFT carries E phasors only"
    coefs = update_coefs(p, materials)
    if interpret is None:
        dd = jax.config.jax_default_device
        interpret = (dd.platform != "tpu") if dd is not None \
            else (jax.default_backend() != "tpu")
    n = mesh.shape["z"]
    S_c, J1p, Ib, K1, Klp, S_sh = _geometry(p, n)
    plan_ = pick_shard_plan(p, coefs, Klp, sar=accumulate_power, dft_nf=nf)
    if plan_ is None or plan_[1] != 1:
        raise NotImplementedError(
            "no VMEM-feasible sharded streaming DFT plan for this config"
        )
    s = plan_[0]
    lossy = not isinstance(coefs.ca_x, (int, float))
    het = coefs.heterogeneous_mu
    call, nd = build_stream_shard_call(p, coefs, S_sh, Klp, s, interpret,
                                       nj=1, sar=accumulate_power,
                                       dft_nf=nf)
    single_step = make_sharded_fast_step(p, mesh, interpret, materials)
    e_means = make_sharded_e_means(p, mesh)
    inc_fn = (make_sharded_power_inc(p, mesh, materials)
              if accumulate_power else None)

    K, J, I = p.maxk, p.maxj, p.maxi
    dtype = jnp.dtype(p.dtype)
    compute_dtype = jnp.dtype(jnp.float32) if dtype == jnp.bfloat16 else dtype
    f_h = compute_dtype.type(coefs.h_factor)
    dt_step = p.time_step
    plan = make_source_plan(p)  # computation mode (asserted by the call)

    up = [(i, i - 1) for i in range(1, n)]
    down = [(i, i + 1) for i in range(n - 1)]

    def exchange(a):
        if n == 1:
            return a
        top_band = lax.slice_in_dim(a, D, D + s, axis=0)
        bot_band = lax.slice_in_dim(a, D + Klp - s, D + Klp, axis=0)
        from_next = lax.ppermute(top_band, "z", up)
        from_prev = lax.ppermute(bot_band, "z", down)
        a = lax.dynamic_update_slice_in_dim(a, from_prev, D - s, axis=0)
        a = lax.dynamic_update_slice_in_dim(a, from_next, D + Klp, axis=0)
        return a

    def shard_body(ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2, wts, dacc,
                   *rest):
        r = lax.axis_index("z")
        koff2 = (r * Klp - s).astype(jnp.int32).reshape(1, 1)
        ex, ey, ez = exchange(ex), exchange(ey), exchange(ez)
        hx, hy, hz = exchange(hx), exchange(hy), exchange(hz)
        if accumulate_power:
            sg, acc = rest[-2:]
            rest = rest[:-2]
        if het:
            hf3 = rest[-3:]
            rest = rest[:-3]
        else:
            hf3 = ()
        if accumulate_power:
            return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                        *rest, hf=hf3, sigma=sg, acc=acc, wts=wts,
                        dacc=dacc)
        return call(koff2, ex, ey, ez, hx, hy, hz, chy, chz, de2, dh2,
                    *rest, hf=hf3, wts=wts, dacc=dacc)

    bspec = P("z", None, None)
    rspec = P(None, None, None)
    dspec = P(None, "z", None, None)
    ncf = 6 if lossy else 0
    nhf = 3 if het else 0
    nsar = 2 if accumulate_power else 0
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(bspec,) * 8 + (rspec, rspec, P(None, None), dspec)
        + (bspec,) * (ncf + nhf + nsar),
        out_specs=(bspec,) * (6 + (1 if accumulate_power else 0))
        + (dspec,),
        check_vma=False,
    )

    import numpy as _np

    zero_drv = _np.zeros((nd, J1p, Ib), dtype)

    def drive_patch(amp):
        amp_j = jnp.asarray(amp)
        prof_row = jnp.asarray(plan.profile, dtype=jnp.result_type(amp_j))
        row = amp_j * prof_row
        rows, ni = plan.j1 - plan.j0, len(plan.profile)
        return jnp.broadcast_to(row[None, :], (rows, ni))

    dacc_csh = NamedSharding(mesh, dspec)
    acc_csh = NamedSharding(mesh, bspec)
    wsc = jax.lax.with_sharding_constraint

    def embed_dacc(acc):
        """Canonical (re, im) (nf, 3, K, J, I) -> (6nf, n*S_sh, J1p, Ib)
        sharded slab layout (slot (fi*3+ci)*2 + {0: re, 1: im})."""
        re, im = acc
        inter = jnp.stack([jnp.asarray(re, jnp.float32),
                           jnp.asarray(im, jnp.float32)], axis=2)
        inter = inter.reshape(6 * nf, K, J, I)
        a = jnp.zeros((6 * nf, n * Klp, J1p, Ib), jnp.float32)
        a = a.at[:, :K, :J, :I].set(inter)
        a = a.reshape(6 * nf, n, Klp, J1p, Ib)
        out = jnp.zeros((6 * nf, n, S_sh, J1p, Ib), jnp.float32)
        out = out.at[:, :, D : D + Klp].set(a)
        return wsc(out.reshape(6 * nf, n * S_sh, J1p, Ib), dacc_csh)

    def crop_dacc(dacc_sl):
        a = dacc_sl.reshape(6 * nf, n, S_sh, J1p, Ib)[:, :, D : D + Klp,
                                                      :J, :I]
        a = a.reshape(6 * nf, n * Klp, J, I)[:, :K]
        a = a.reshape(nf, 3, 2, K, J, I)
        return a[:, :, 0], a[:, :, 1]

    def embed_pw(acc):
        a = jnp.pad(jnp.asarray(acc, jnp.float32),
                    ((0, n * Klp - K), (0, 0), (0, 0)))
        a = a.reshape(n, Klp, J, I)
        out = jnp.zeros((n, S_sh, J1p, Ib), jnp.float32)
        out = out.at[:, D : D + Klp, :J, :I].set(a)
        return wsc(out.reshape(n * S_sh, J1p, Ib), acc_csh)

    def crop_pw(sl):
        a = sl.reshape(n, S_sh, J1p, Ib)[:, D : D + Klp, :J, :I]
        return a.reshape(n * Klp, J, I)[:K]

    def advance(st, acc, dacc, xs_group):
        ts_g, amps_g, cw_g, sw_g = xs_group
        zero_drv_t = jnp.asarray(zero_drv)
        pv1 = drive_patch(amps_g[0])
        zero = jnp.zeros_like(pv1).astype(dtype)
        sl = (D, slice(plan.j0, plan.j1), slice(plan.i0, plan.i1))
        st = dataclasses.replace(
            st,
            ez=st.ez.at[sl].set(pv1.astype(dtype)),
            ex=st.ex.at[sl].set(zero),
            hz=st.hz.at[sl].set(zero),
            hx=st.hx.at[sl].set((-plan.inv_z_te * pv1).astype(dtype)),
        )
        pvs = jnp.stack([drive_patch(amps_g[m]) for m in range(1, s)])
        sl2 = (slice(0, nd), slice(plan.j0, plan.j1),
               slice(plan.i0, plan.i1))
        de2 = zero_drv_t.at[sl2].set(pvs.astype(dtype))
        dh2 = zero_drv_t.at[sl2].set((-plan.inv_z_te * pvs).astype(dtype))
        wts = jnp.concatenate([cw_g, sw_g], axis=1)  # (s, 2*nf)
        cf = ((st.ca_x, st.ca_y, st.ca_z, st.cb_x, st.cb_y, st.cb_z)
              if lossy else ())
        if het:
            cf = cf + (st.hf_x, st.hf_y, st.hf_z)
        if accumulate_power:
            cf = cf + (st.sigma_c, acc)
        outs = smap(st.ex, st.ey, st.ez, st.hx, st.hy, st.hz,
                    st.corr_hy, st.corr_hz, de2, dh2, wts, dacc, *cf)
        if accumulate_power:
            ex, ey, ez, hx, hy, hz, acc, dacc = outs
        else:
            ex, ey, ez, hx, hy, hz, dacc = outs
        hx_s = _advance_hx_strip(p, st, f_h, het, n_steps=s)
        st = dataclasses.replace(st, ex=ex, ey=ey, ez=ez, hx=hx, hy=hy,
                                 hz=hz, hx_s=hx_s)
        return st, acc, dacc

    @jax.jit
    def run(st, xs, power_acc, dft_acc):
        ts, amps, cw, sw = xs
        nsteps = ts.shape[0]
        n_grp = nsteps // s
        dacc_sl = embed_dacc(dft_acc)
        acc_sl = embed_pw(power_acc) if accumulate_power else None
        if n_grp:
            gxs = (ts[: s * n_grp].reshape(n_grp, s),
                   amps[: s * n_grp].reshape(n_grp, s),
                   cw[: s * n_grp].reshape(n_grp, s, nf),
                   sw[: s * n_grp].reshape(n_grp, s, nf))

            def body(c, x):
                st, acc, dacc = c
                return advance(st, acc, dacc, x), None

            (st, acc_sl, dacc_sl), _ = lax.scan(
                body, (st, acc_sl, dacc_sl), gxs)
        dft_acc = crop_dacc(dacc_sl)
        if accumulate_power:
            power_acc = crop_pw(acc_sl)
        for r in range(nsteps % s):
            idx = s * n_grp + r
            st = single_step(st, (ts[idx], amps[idx]))
            me = e_means(st)[:, :K].astype(jnp.float32)  # (3, K, J, I)
            re, im = dft_acc
            re = re + cw[idx][:, None, None, None, None] * me[None]
            im = im - sw[idx][:, None, None, None, None] * me[None]
            dft_acc = (re, im)
            if accumulate_power:
                power_acc = power_acc + (
                    inc_fn(st)[:K] * dt_step).astype(power_acc.dtype)
        return st, power_acc, dft_acc, None

    return run
