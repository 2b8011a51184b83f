"""Pallas DIA matvec: D statically-shifted FMAs reading each byte once.

The XLA form of the DIA multiply (ops/dia.py serial chain) lowers to D
separate passes — each diagonal re-reads x and read-modify-writes y, so
the measured traffic is ~D*(vtab_row + x + 2*y) instead of vtab + x + y
(round-4 chip numbers: 0.269 ms on grid3d100's 6-diagonal table = 358
GB/s of actual traffic where the minimal model is ~47 us at the
measured stream rate).  The fusion XLA declines is trivial for a kernel
because the shifts are STATIC:

  * x (padded) is staged whole into VMEM once at t == 0 — DIA is only
    chosen for stencil/banded matrices, whose x fits comfortably
    (ops/dia.py declines on scatter);
  * the (D, m_pad) value table streams through the pallas pipeline in
    (D, R) tiles — the only per-tile HBM traffic;
  * for each (8, 128) output group and diagonal d, x[r + off_d] is two
    dynamic-SUBLANE reads of the staged table (the sublane offset is
    grid-affine + a static per-diagonal part) glued by a static
    lane-width concat — no gather, no roll, ~6 regops per 1024 outputs
    per diagonal.

Reference anchor: this plays the role of cuSPARSE HybMV's ELL kernel
(gpu_spmv.cu:106-251) — the dense-structure fast path the format split
buys — built diagonal-first because the TPU win condition is contiguous
vector streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_matvec_pallas", "dia_working_set_bytes"]

LANES = 128
BLOCK = 1024
# compiler slack on top of the accounted buffers (pipeline bookkeeping,
# spills); budget = 16 MiB VMEM (plan.VMEM_BYTES_PER_CORE) minus this
_VMEM_BUDGET = 14 * 1024 * 1024


def _pick_R(m, offsets):
    """Vtab tile rows: 64K default, shrunk for small m AND to keep the
    full working set (staged x + double-buffered (D, R) vtab tiles +
    double-buffered output tiles) inside the VMEM budget.  The round-4
    gate budgeted only the staged x, so a wide table (D near 16) on a
    ~2M-column matrix passed the gate and failed at Mosaic compile time
    with VMEM exhaustion (ADVICE r4, medium)."""
    R = 65536
    while R > BLOCK and R >= 4 * (m + BLOCK):
        R //= 2
    while R > BLOCK and dia_working_set_bytes(m, offsets, R) > _VMEM_BUDGET:
        R //= 2
    return R


def dia_working_set_bytes(m, offsets, R=None):
    """VMEM bytes the DIA kernel needs for an m-row matrix with the given
    diagonal offsets (at tile size R, or the adaptive choice when None).
    ops/dia.py gates the pallas path on this <= the VMEM budget."""
    if R is None:
        R = _pick_R(m, offsets)
    D = len(offsets)
    lpad = max(0, -min(offsets))
    rel_max = max(offsets) + lpad
    m_pad = -(-m // R) * R
    need = m_pad + rel_max + 2 * LANES
    NS = -(-need // LANES)
    NS = -(-NS // 8) * 8 + 8
    return NS * LANES * 4 + 2 * D * R * 4 + 2 * R * 4


def dia_pallas_fits(m, offsets):
    """Whether the full DIA kernel working set fits the VMEM budget."""
    return dia_working_set_bytes(m, offsets) <= _VMEM_BUDGET


def _dia_kernel(x2d_ref, vtab_ref, y_ref, xs_s, xsem, *,
                rel128, lanes, R, NS):
    """One grid step computes R output rows.

    rel128[d] = static sublane part of diagonal d's shift, lanes[d] =
    static lane part; the dynamic part of the read offset is
    t * (R // 128), provably sublane-aligned (R is a multiple of 1024).
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dma = pltpu.make_async_copy(x2d_ref, xs_s, xsem)
        dma.start()
        dma.wait()

    trow = t * (R // LANES)
    for i in range(R // BLOCK):
        acc = jnp.zeros((8, LANES), jnp.float32)
        for d, (q, l) in enumerate(zip(rel128, lanes)):
            base = trow + i * 8 + q
            a = xs_s[pl.ds(base, 8), :]
            if l:
                b = xs_s[pl.ds(base + 1, 8), :]
                shifted = jnp.concatenate([a[:, l:], b[:, :l]], axis=1)
            else:
                shifted = a
            vt = vtab_ref[d, pl.ds(i * BLOCK, BLOCK)].reshape(8, LANES)
            acc = acc + vt * shifted
        y_ref[pl.ds(i * BLOCK, BLOCK)] = acc.reshape(BLOCK)


@functools.partial(jax.jit, static_argnames=("offsets", "m", "n",
                                             "interpret"))
def dia_matvec_pallas(vtab, x, offsets, m, n, interpret=False):
    """y[r] = sum_d vtab[d, r] * x[r + offsets[d]]  (zero outside [0, n)).

    ``vtab`` is the (D, m) fp32 diagonal table from ops/dia.py;
    ``offsets`` a static ascending tuple of signed ints.  Returns (m,)
    fp32.  The caller guarantees x fits VMEM alongside the working set
    (ops/dia.py gates this; ~<= 2M columns fp32).
    """
    with jax.enable_x64(False):
        return _dia_matvec_pallas_x32(vtab, x, offsets, m, n, interpret)


def _dia_matvec_pallas_x32(vtab, x, offsets, m, n, interpret):
    D = len(offsets)
    assert vtab.shape[0] == D
    R = _pick_R(m, offsets)
    m_pad = -(-m // R) * R
    lpad = max(0, -min(offsets))
    # staged-x layout: xs[k] = x[k - lpad]; diagonal d reads start at
    # rel_d = off_d + lpad >= 0 and reach m_pad - 1 + rel_d + 128 (lane
    # concat reads one row past), all within NS * 128
    rel = [int(o) + lpad for o in offsets]
    need = m_pad + max(rel) + 2 * LANES
    NS = -(-need // LANES)
    NS = -(-NS // 8) * 8 + 8
    xp = jnp.zeros((NS * LANES,), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32)[:n],
                                      (lpad,))
    x2d = xp.reshape(NS, LANES)
    vt = vtab.astype(jnp.float32)
    if m_pad != vt.shape[1]:
        vt = jnp.pad(vt, ((0, 0), (0, m_pad - vt.shape[1])))

    rel128 = tuple(r // LANES for r in rel)
    lanes = tuple(r % LANES for r in rel)
    kernel = functools.partial(_dia_kernel, rel128=rel128, lanes=lanes,
                               R=R, NS=NS)
    y = pl.pallas_call(
        kernel,
        grid=(m_pad // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x2d staged once
            pl.BlockSpec((D, R), lambda t: (0, t)),        # vtab tiles
        ],
        out_specs=pl.BlockSpec((R,), lambda t: (t,)),
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=bool(interpret),
    )(x2d, vt)
    return y[:m]
