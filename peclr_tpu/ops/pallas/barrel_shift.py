"""Pallas fused barrel-shift kernel: per-row fractional shifts in one VMEM
pass.

The XLA barrel shifter (ops/warp_mxu._shift_rows) runs each of the ~7 fine
roll stages as a separate HBM round trip.  This kernel keeps an (8, P) row
block in VMEM through all stages + the fractional lerp, cutting the traffic
to one read + one write.  Only static rolls, broadcast selects and scalar
SMEM reads are used — the subset this TPU toolchain's Mosaic compiler
accepts (traced dynamic slices crash it; see BENCHLOG.md).

Layout contract: rows are processed as a flat (N, P) array (batch/height
folded into N, channels folded into P or pre-separated by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8


def _kernel(s_ref, f_ref, x_ref, o_ref, *, num_bits: int, out_w: int):
    j = pl.program_id(0)
    x = x_ref[:]  # (8, P)
    base = j * BLOCK_ROWS
    # per-row shift amounts as an (8, 1) vector built from SMEM scalars
    shifts = jnp.stack(
        [s_ref[base + r] for r in range(BLOCK_ROWS)]
    ).reshape(BLOCK_ROWS, 1)
    fracs = jnp.stack(
        [f_ref[base + r] for r in range(BLOCK_ROWS)]
    ).reshape(BLOCK_ROWS, 1)
    p = x.shape[1]
    for bit in range(num_bits):
        amount = 1 << bit
        take = ((shifts >> bit) & 1) == 1  # (8, 1) bool
        # left-roll by `amount` == pltpu.roll (non-negative) by p - amount
        x = jnp.where(take, pltpu.roll(x, p - amount, axis=1), x)
    window = x[:, : out_w + 1]
    o_ref[:] = (
        window[:, :-1] * (1.0 - fracs) + window[:, 1:] * fracs
    ).astype(o_ref.dtype)


def barrel_shift_rows_pallas(rows, shifts, fracs, out_w: int,
                             interpret: bool = False):
    """rows: (N, P) float32/bf16; shifts: (N,) int32 in [0, 2^bits);
    fracs: (N,) same float dtype.  Returns (N, out_w):
    out[n, u] = lerp(rows[n, u + s], rows[n, u + s + 1], f).

    Status: compiles and is bit-exact on this TPU toolchain, but the XLA
    barrel shifter in ops/warp_mxu.py currently schedules better (the Mosaic
    lane-rotate is slow for large amounts here) — kept as the fused-kernel
    path for toolchains where it wins, and exercised in interpret mode by
    the test suite."""
    n, p = rows.shape
    assert n % BLOCK_ROWS == 0, n
    assert p % 128 == 0, p
    max_shift = p - out_w - 1
    num_bits = int(max_shift).bit_length()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, p), lambda j, s, f: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, out_w), lambda j, s, f: (j, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, num_bits=num_bits, out_w=out_w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_w), rows.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(shifts, fracs.astype(rows.dtype), rows)
