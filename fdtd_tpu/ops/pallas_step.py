"""Fused Pallas TPU kernels for the leapfrog curl updates.

Two kernels per step (H-pass, E-pass), each a single fused sweep over
k-slabs: all three components of a half-step update in one pass, so each
field array is read once and written once per pass — the HBM-bandwidth-bound
regime the reference's own analysis identifies as the ceiling
(description.pdf section 6: ~0.5 flop/byte).

Design notes (TPU):
- axis order (k, j, i): i on the 128-lane axis, j on sublanes, k tiled.
- k-slabs via ``pl.Element`` halo blocks: the H-pass reads E rows
  [g*TK .. g*TK+TK] (one halo row into the next slab), the E-pass reads H
  rows [g*TK-1 .. g*TK+TK-1].  Out-of-range halo rows contain garbage and
  are neutralized by the update masks (exact staggered loop bounds of
  reference main.c:445-499, expressed as iota masks).
- +-1 shifts along j/i are lane/sublane rolls; the wrapped column is always
  masked.
- The k dimension of the arrays must be padded to a multiple of TK
  (``k_padding``); the dead rows are zero and masked.

Vacuum path (scalar coefficients).  Heterogeneous materials currently take
the XLA path (coefficient arrays would simply become three extra blocked
inputs here; planned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Params
from ..state import FieldState, UpdateCoefs

TK = 8  # k-slab rows per grid step


def k_padding(p: Params) -> int:
    """k-extent the field arrays must have for the pallas backend."""
    K1 = p.maxk + 1
    return ((K1 + TK - 1) // TK) * TK


def _masks_h(p: Params, shape, g):
    K, J, I = p.maxk, p.maxj, p.maxi
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + g * TK
    ji = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    m_hx = (gk < K) & (ji < J) & (ii < I + 1)
    m_hy = (gk < K) & (ji < J + 1) & (ii < I)
    m_hz = (gk < K + 1) & (ji < J) & (ii < I)
    return m_hx, m_hy, m_hz


def _masks_e(p: Params, shape, g):
    K, J, I = p.maxk, p.maxj, p.maxi
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + g * TK
    ji = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    m_ex = (gk >= 1) & (gk < K) & (ji >= 1) & (ji < J) & (ii < I)
    m_ey = (gk >= 1) & (gk < K) & (ji < J) & (ii >= 1) & (ii < I)
    m_ez = (gk < K) & (ji >= 1) & (ji < J) & (ii >= 1) & (ii < I)
    return m_ex, m_ey, m_ez


def _h_kernel(p: Params, f_h, ex_ref, ey_ref, ez_ref, hx_ref, hy_ref, hz_ref, ohx, ohy, ohz):
    g = pl.program_id(0)
    exb = ex_ref[:]  # (TK+1, J1, I1): rows g*TK .. g*TK+TK
    eyb = ey_ref[:]
    ezb = ez_ref[:]
    ex0, ex1 = exb[:-1], exb[1:]
    ey0, ey1 = eyb[:-1], eyb[1:]
    ez0 = ezb[:-1]

    ez_py = jnp.roll(ez0, -1, axis=1)  # Ez[j+1]
    ez_px = jnp.roll(ez0, -1, axis=2)  # Ez[i+1]
    ex_py = jnp.roll(ex0, -1, axis=1)  # Ex[j+1]
    ey_px = jnp.roll(ey0, -1, axis=2)  # Ey[i+1]

    m_hx, m_hy, m_hz = _masks_h(p, ex0.shape, g)
    hx = hx_ref[:]
    hy = hy_ref[:]
    hz = hz_ref[:]
    ohx[:] = jnp.where(m_hx, hx + f_h * ((ey1 - ey0) - (ez_py - ez0)), hx)
    ohy[:] = jnp.where(m_hy, hy + f_h * ((ez_px - ez0) - (ex1 - ex0)), hy)
    ohz[:] = jnp.where(m_hz, hz + f_h * ((ex_py - ex0) - (ey_px - ey0)), hz)


def _e_kernel(p: Params, f_e, hx_ref, hy_ref, hz_ref, ex_ref, ey_ref, ez_ref, oex, oey, oez):
    """E half-step.

    The H halo block starts at max(g*TK-1, 0) because Mosaic does not
    support low Element padding: for g>0 the block holds rows
    [g*TK-1 .. g*TK+TK-1] and for g==0 rows [0 .. TK] (shifted by one).
    Both alignments are handled; the k=-1 row a row-0 E-update would need is
    masked anyway (Ex/Ey start at k=1, Ez reads no k-1).
    """
    g = pl.program_id(0)
    hxb = hx_ref[:]  # (TK+1, J1, I1)
    hyb = hy_ref[:]
    hzb = hz_ref[:]

    def compute(hx0, hx_m1, hy0, hy_m1, hz0):
        hz_my = jnp.roll(hz0, 1, axis=1)  # Hz[j-1]
        hz_mx = jnp.roll(hz0, 1, axis=2)  # Hz[i-1]
        hy_mx = jnp.roll(hy0, 1, axis=2)  # Hy[i-1]
        hx_my = jnp.roll(hx0, 1, axis=1)  # Hx[j-1]
        m_ex, m_ey, m_ez = _masks_e(p, hx0.shape, g)
        ex = ex_ref[:]
        ey = ey_ref[:]
        ez = ez_ref[:]
        oex[:] = jnp.where(m_ex, ex + f_e * ((hz0 - hz_my) - (hy0 - hy_m1)), ex)
        oey[:] = jnp.where(m_ey, ey + f_e * ((hx0 - hx_m1) - (hz0 - hz_mx)), ey)
        oez[:] = jnp.where(m_ez, ez + f_e * ((hy0 - hy_mx) - (hx0 - hx_my)), ez)

    @pl.when(g == 0)
    def _():
        # block rows are [0 .. TK]: row r is at index r; k-1 rows are garbage
        # (rolled wrap) but masked (no k=0 update reads k-1).
        compute(
            hxb[:-1],
            jnp.roll(hxb, 1, axis=0)[:-1],
            hyb[:-1],
            jnp.roll(hyb, 1, axis=0)[:-1],
            hzb[:-1],
        )

    @pl.when(g > 0)
    def _():
        # block rows are [g*TK-1 .. g*TK+TK-1]: row r at index r+1.
        compute(hxb[1:], hxb[:-1], hyb[1:], hyb[:-1], hzb[1:])


def make_updates(p: Params, coefs: UpdateCoefs, interpret: bool | None = None):
    """Build (update_h, update_e) on the pallas backend (vacuum only)."""
    if not isinstance(coefs.ca_x, (int, float)) or coefs.ca_x != 1.0:
        raise NotImplementedError(
            "pallas backend currently supports vacuum only; use backend='xla' for materials"
        )
    if interpret is None:
        dd = jax.config.jax_default_device
        if dd is not None:
            interpret = dd.platform != "tpu"
        else:
            interpret = jax.default_backend() != "tpu"

    dtype = jnp.dtype(p.dtype)
    f_h = dtype.type(coefs.h_factor)
    f_e = dtype.type(coefs.cb_x)
    K1, J1, I1 = p.padded_shape
    Kp = k_padding(p)
    nk = Kp // TK
    shape = jax.ShapeDtypeStruct((Kp, J1, I1), dtype)

    halo_spec_up = pl.BlockSpec(  # rows g*TK .. g*TK+TK (halo into next slab)
        (pl.Element(TK + 1, (0, 1)), pl.Element(J1), pl.Element(I1)),
        lambda g: (g * TK, 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec_down = pl.BlockSpec(  # rows max(g*TK-1, 0) .. +TK (no low padding)
        (pl.Element(TK + 1, (0, 1)), pl.Element(J1), pl.Element(I1)),
        lambda g: (jnp.maximum(g * TK - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    block_spec = pl.BlockSpec((TK, J1, I1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    # HBM in-place buffer reuse (not supported by the interpreter's padding path)
    aliases = {} if interpret else {3: 0, 4: 1, 5: 2}
    # v5e has 128MB VMEM; the default 16MB scoped limit is far too small for
    # double-buffered (TK+1)-row slabs of six fields.
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    h_call = pl.pallas_call(
        functools.partial(_h_kernel, p, f_h),
        grid=(nk,),
        in_specs=[halo_spec_up] * 3 + [block_spec] * 3,
        out_specs=[block_spec] * 3,
        out_shape=(shape, shape, shape),
        input_output_aliases=aliases,
        compiler_params=compiler_params,
        interpret=interpret,
    )
    e_call = pl.pallas_call(
        functools.partial(_e_kernel, p, f_e),
        grid=(nk,),
        in_specs=[halo_spec_down] * 3 + [block_spec] * 3,
        out_specs=[block_spec] * 3,
        out_shape=(shape, shape, shape),
        input_output_aliases=aliases,
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def update_h(s: FieldState) -> FieldState:
        hx, hy, hz = h_call(s.ex, s.ey, s.ez, s.hx, s.hy, s.hz)
        return FieldState(s.ex, s.ey, s.ez, hx, hy, hz)

    def update_e(s: FieldState) -> FieldState:
        ex, ey, ez = e_call(s.hx, s.hy, s.hz, s.ex, s.ey, s.ez)
        return FieldState(ex, ey, ez, s.hx, s.hy, s.hz)

    return update_h, update_e


def pad_state_k(p: Params, s: FieldState) -> FieldState:
    """Pad fields' k-extent to the pallas slab multiple (dead zero rows)."""
    Kp = k_padding(p)
    K1 = p.padded_shape[0]
    if Kp == K1:
        return s
    return jax.tree.map(lambda a: jnp.pad(a, ((0, Kp - a.shape[0]), (0, 0), (0, 0))), s)
