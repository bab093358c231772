"""Pallas fused barrel-shift kernel: per-row fractional shifts in one VMEM
pass.

The XLA barrel shifter (ops/warp_mxu._shift_rows) runs each roll stage as a
separate HBM round trip, and its progressive window shrink materializes
copies (round-2 trace: ~32 ms/step of roll/select fusions + 53 ms/step of
copy-done/slice).  This kernel keeps a row block in VMEM through ALL stages
plus the fractional lerp: one HBM read of the raw rows, one write of the
lerped window.

Design notes (why this one is fast where the round-1 kernel was not):

* Roll amounts are SMALL.  The r1 kernel expressed a left-roll by `a` as
  `pltpu.roll(x, p - a)` — a near-full-width lane rotate for every stage,
  which Mosaic lowers to its most expensive cross-vreg shuffle.  Here the
  row content is placed RIGHT-ALIGNED in the padded lane axis and the shift
  is re-parameterized as t = (elems - k_elems) >= 0, so stage `bit` rolls by
  exactly 2^bit: amounts >= 128 are whole-vreg renames, amounts < 128 are
  cheap funnel shifts.
* Channels fold into lanes.  Rows are (W*C) element vectors (the array's
  native memory order), shifts scale by C, and the 2-tap lerp uses a +C
  element offset — no transpose, no per-channel passes.
* Zero borders come from WRAPAROUND, not padding reads.  P is sized so any
  out-of-source tap rolls into the zero region; rows whose shift was
  clamped read all-zeros automatically, so the XLA path's validity mask
  disappears.
* Per-row shift/fraction ride in as (N, 1) VMEM vectors, NOT scalar
  prefetch: they only drive `jnp.where` data selection (never an index
  map), and the SMEM formulation needed a per-grid-step stack of
  block_rows scalar loads + vector inserts — measured 2.7x slower than
  the vector operand (BENCHLOG round 3) and it capped blocks at 128 rows
  (Mosaic's vector concat width).

Semantics (matches ops/warp_mxu._shift_rows, which cites the reference's
per-sample cv2 chain sample_augmenter.py:166-245):
  out[n, u*C + c] = rows[n, (u + k_n)*C + c] * (1 - f_n)
                  + rows[n, (u + k_n + 1)*C + c] * f_n
with zeros outside the source and for clamped rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

#: rows per grid step — the largest divisor of N from this list is used.
#: 256 measured fastest on v5e with VMEM shift vectors (the old SMEM
#: scalar-stack formulation failed to compile past 128 rows).
BLOCK_ROWS_CHOICES = (256, 128, 64, 32)
BLOCK_ROWS = 32  # minimum granularity (geometry gate)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lane_roll(x, amount: int):
    """Right-roll along lanes.  Mosaic's native lane rotate is 32-bit-only;
    packed dtypes (uint8/bf16) express the roll as a static slice pair +
    concat, which keeps the barrel in the narrow dtype — 4x (uint8) / 2x
    (bf16) less VPU work per stage than promoting to f32 first."""
    if x.dtype.itemsize >= 4:
        return pltpu.roll(x, amount, axis=1)
    return jnp.concatenate([x[:, -amount:], x[:, :-amount]], axis=1)


def _barrel(x, t, *, p: int, num_bits: int):
    """Per-row right-roll by t via a power-of-2 barrel, in x's dtype.
    x: (rows, in_elems) right-aligned into a p-wide zero-padded buffer;
    wraparound is load-bearing — out-of-source taps wrap into the zero
    margin, and for in-range taps the wrap IS the data path, so the buffer
    cannot be shrunk mid-flight without re-deriving the layout."""
    rows, in_elems = x.shape
    if p > in_elems:
        pad = jnp.zeros((rows, p - in_elems), x.dtype)
        x = jnp.concatenate([pad, x], axis=1)
    for bit in range(num_bits):
        amount = 1 << bit
        take = ((t >> bit) & 1) == 1  # (rows, 1) bool
        x = jnp.where(take, _lane_roll(x, amount), x)
    return x


def _window_f32(x, n: int):
    """First n lanes of the rolled buffer, promoted to f32 for the lerp
    (uint8 hops through int32 — Mosaic has no direct uint8->float cast)."""
    window = x[:, :n]
    if window.dtype == jnp.uint8:
        window = window.astype(jnp.int32)
    return window.astype(jnp.float32)


def _kernel(t_ref, f_ref, x_ref, o_ref, *, num_bits: int, p: int,
            out_elems: int, c: int, in_elems: int, block_rows: int,
            grouped: bool = False):
    t = t_ref[...]  # (block_rows, 1) int32
    f = f_ref[...]  # (block_rows, 1) f32

    x = x_ref[0] if grouped else x_ref[:]  # (block_rows, in_elems)
    x = _barrel(x, t, p=p, num_bits=num_bits)
    window = _window_f32(x, out_elems + c)
    result = (
        window[:, :-c] * (1.0 - f) + window[:, c:] * f
    ).astype(o_ref.dtype)
    if grouped:
        o_ref[0] = result
    else:
        o_ref[:] = result


def _kernel_raw(t_ref, x_ref, o_ref, *, num_bits: int, p: int,
                out_elems: int):
    """Barrel-only variant: emits the rolled window UNLERPED in the input
    dtype.  The caller applies the 2-tap fractional lerp in XLA, where it
    fuses into the banded-tap einsum's input chain (lerp-then-matmul ==
    matmul-then-lerp by linearity) — the kernel sheds the int32/f32
    conversion and the lerp vector ops, and a uint8 source writes a uint8
    window (quarter the HBM traffic of the bf16 lerped output)."""
    t = t_ref[...]  # (block_rows, 1) int32
    x = _barrel(x_ref[0], t, p=p, num_bits=num_bits)
    o_ref[0] = x[:, :out_elems]


def _flat_invoke(t, f, rows, *, out_elems: int, c: int, p: int,
                 num_bits: int, out_dtype, interpret: bool):
    """Run the flat kernel on (possibly per-shard) operands: t/f (N, 1),
    rows (N, in_elems).  Called directly (no mesh) or as the per-shard
    lowering of the custom-partitioned wrapper, where N is the SHARD's
    row count — the block size adapts to it."""
    n, in_elems = rows.shape
    if n % BLOCK_ROWS:
        raise ValueError(
            f"per-shard row count {n} is not a multiple of BLOCK_ROWS "
            f"({BLOCK_ROWS}); shard the batch so each device keeps "
            f"BLOCK_ROWS-aligned rows, or set PECLR_SHIFT=xla"
        )
    block_rows = next(b for b in BLOCK_ROWS_CHOICES if n % b == 0)
    grid_spec = pl.GridSpec(
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, in_elems), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, out_elems),
                               lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _kernel, num_bits=num_bits, p=p, out_elems=out_elems, c=c,
        in_elems=in_elems, block_rows=block_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_elems), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(t, f, rows)


def _spec_dim(sharding, i):
    """Mesh-axis name partitioning dim i, or None (replicated/unknown)."""
    try:
        spec = sharding.spec
    except AttributeError:
        return None
    return spec[i] if i < len(spec) else None


def _use_partitioned() -> bool:
    """Wrap the kernels in custom_partitioning so a GSPMD-sharded program
    splits them along the rows/batch dim?  Without the wrapper XLA treats
    the pallas custom call as unpartitionable and REPLICATES it (all-gather
    of the full canvas batch onto every chip — measured on the 8-device
    test mesh).  PECLR_SHIFT_PARTITION=off reverts to the bare call."""
    return os.environ.get("PECLR_SHIFT_PARTITION", "on") != "off"


@functools.lru_cache(maxsize=None)
def _flat_cp(out_elems: int, c: int, p: int, num_bits: int, out_dtype,
             interpret: bool):
    invoke = functools.partial(
        _flat_invoke, out_elems=out_elems, c=c, p=p, num_bits=num_bits,
        out_dtype=out_dtype, interpret=interpret,
    )

    @custom_partitioning
    def call(t, f, rows):
        return invoke(t, f, rows)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(
            mesh, PartitionSpec(_spec_dim(arg_shapes[2].sharding, 0), None)
        )

    def partition(mesh, arg_shapes, result_shape):
        ndim = _spec_dim(arg_shapes[2].sharding, 0)
        vec_sh = NamedSharding(mesh, PartitionSpec(ndim, None))
        rows_sh = NamedSharding(mesh, PartitionSpec(ndim, None))
        return mesh, invoke, rows_sh, (vec_sh, vec_sh, rows_sh)

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        # rows may shard along n only; the element axes stay whole (the
        # barrel mixes elements within a row)
        sharding_rule="n u, n u, n e -> n o",
    )
    return call


def fused_shift_lerp(rows, k, f, out_elems: int, c: int,
                     out_dtype=jnp.bfloat16, interpret: bool = False):
    """rows: (N, in_elems) uint8/bf16/f32 — flattened (W*C) pixel rows.
    k: (N,) int32 integer pixel shifts (may be negative); f: (N,) float
    fractions in [0, 1).  Returns (N, out_elems) out_dtype with
    out[n, u*C+c] = lerp(rows[n, (u+k)*C+c], rows[n, (u+k+1)*C+c], f[n]),
    zero outside the source.  N % BLOCK_ROWS == 0, in_elems/out_elems
    multiples of 128; out_elems/c + 2 taps of headroom are sized into the
    padded width."""
    n, in_elems = rows.shape
    assert n % BLOCK_ROWS == 0, n
    assert in_elems % 128 == 0 and out_elems % 128 == 0, (in_elems, out_elems)
    # clamp exactly like the XLA shifter: k in [-(out_w+2), w]
    out_w = out_elems // c
    w_px = in_elems // c
    k = jnp.clip(k, -(out_w + 2), w_px)
    # padded width: any tap u + k outside [0, w) must roll into the zero
    # region [0, p - in_elems): need p >= in_elems + out_elems + 2*c
    p = _round_up(in_elems + out_elems + 2 * c, 128)
    # right-roll amount: content sits at [p - in_elems, p); out[u] wants
    # rows[u + k] i.e. x[u + k + p - in_elems] -> roll right by
    # t = in_elems - k_elems  (t >= 0 because k <= w_px)
    t = (in_elems - k * c).astype(jnp.int32)
    num_bits = int(in_elems + (out_w + 2) * c).bit_length()

    fn = (
        _flat_cp(out_elems, c, p, num_bits, out_dtype, interpret)
        if _use_partitioned()
        else functools.partial(
            _flat_invoke, out_elems=out_elems, c=c, p=p, num_bits=num_bits,
            out_dtype=out_dtype, interpret=interpret,
        )
    )
    return fn(t.reshape(n, 1), f.astype(jnp.float32).reshape(n, 1), rows)


def _grouped_invoke(*operands, out_elems: int, p: int, num_bits: int,
                    out_dtype, interpret: bool, lerp: bool):
    """Run the grouped kernel on (possibly per-shard) operands:
    (t (N,1), f (N,1), rows3 (G,N,E)) with lerp, (t, rows3) without."""
    rows3 = operands[-1]
    g, n, in_elems = rows3.shape
    if n % BLOCK_ROWS:
        raise ValueError(
            f"per-shard row count {n} is not a multiple of BLOCK_ROWS "
            f"({BLOCK_ROWS}); shard the batch so each device keeps "
            f"BLOCK_ROWS-aligned rows, or set PECLR_SHIFT=xla"
        )
    block_rows = next(b for b in BLOCK_ROWS_CHOICES if n % b == 0)
    tf_specs = [
        pl.BlockSpec((block_rows, 1), lambda gi, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, 1), lambda gi, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pl.GridSpec(
        grid=(g, n // block_rows),
        in_specs=(tf_specs if lerp else tf_specs[:1]) + [
            pl.BlockSpec((1, block_rows, in_elems),
                         lambda gi, j: (gi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, out_elems),
                               lambda gi, j: (gi, j, 0),
                               memory_space=pltpu.VMEM),
    )
    if lerp:
        kernel = functools.partial(
            _kernel, num_bits=num_bits, p=p, out_elems=out_elems, c=1,
            in_elems=in_elems, block_rows=block_rows, grouped=True,
        )
    else:
        kernel = functools.partial(
            _kernel_raw, num_bits=num_bits, p=p, out_elems=out_elems,
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, n, out_elems), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)


@functools.lru_cache(maxsize=None)
def _grouped_cp(out_elems: int, p: int, num_bits: int, out_dtype,
                interpret: bool, lerp: bool):
    invoke = functools.partial(
        _grouped_invoke, out_elems=out_elems, p=p, num_bits=num_bits,
        out_dtype=out_dtype, interpret=interpret, lerp=lerp,
    )

    @custom_partitioning
    def call(*operands):
        return invoke(*operands)

    def infer(mesh, arg_shapes, result_shape):
        rows_sh = arg_shapes[-1].sharding
        return NamedSharding(
            mesh,
            PartitionSpec(_spec_dim(rows_sh, 0), _spec_dim(rows_sh, 1), None),
        )

    def partition(mesh, arg_shapes, result_shape):
        rows_sharding = arg_shapes[-1].sharding
        gdim = _spec_dim(rows_sharding, 0)
        ndim = _spec_dim(rows_sharding, 1)
        rows_sh = NamedSharding(mesh, PartitionSpec(gdim, ndim, None))
        vec_sh = NamedSharding(mesh, PartitionSpec(ndim, None))
        args_sh = ((vec_sh, vec_sh, rows_sh) if lerp else (vec_sh, rows_sh))
        return mesh, invoke, rows_sh, args_sh

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        # channel planes (g) and rows (n) both shard; element axes stay
        # whole — the barrel mixes elements within a row
        sharding_rule=("n u, n v, g n e -> g n o" if lerp
                       else "n u, g n e -> g n o"),
    )
    return call


def fused_shift_lerp_grouped(rows3, k, f, out_elems: int,
                             out_dtype=jnp.bfloat16,
                             interpret: bool = False,
                             lerp: bool = True):
    """rows3: (G, N, in_elems) — G planes (e.g. channels) sharing the SAME
    per-row shifts k/f of length N.  Single-channel semantics (c=1):
    out[g, n, u] = lerp(rows3[g, n, u + k_n], rows3[g, n, u + k_n + 1], f_n).

    The 2D grid keeps the per-row shift vectors at length N (not G*N): all
    channel planes of one row set share a single (N, 1) VMEM operand.

    lerp=False runs the barrel-only kernel: returns the UNLERPED integer-
    shifted window in rows3's own dtype (f is ignored, may be None); the
    caller owns the fractional 2-tap lerp.  out[g, n, u] = rows3[g, n, u+k_n]
    with zeros outside the source.  out_dtype must be left at its default —
    the raw window's dtype IS the input dtype (that is the point of the
    mode), so a caller-supplied out_dtype would be silently ignored."""
    if not lerp and jnp.dtype(out_dtype) != jnp.dtype(jnp.bfloat16):
        raise ValueError(
            "lerp=False emits the window in rows3.dtype; out_dtype is not "
            "honored — leave it at its default"
        )
    g, n, in_elems = rows3.shape
    assert n % BLOCK_ROWS == 0, n
    assert in_elems % 128 == 0 and out_elems % 128 == 0, (in_elems, out_elems)
    out_w = out_elems
    w_px = in_elems
    k = jnp.clip(k, -(out_w + 2), w_px)
    p = _round_up(in_elems + out_elems + 2, 128)
    t = (in_elems - k).astype(jnp.int32)
    num_bits = int(in_elems + out_w + 2).bit_length()

    if lerp:
        operands = (t.reshape(n, 1), f.astype(jnp.float32).reshape(n, 1),
                    rows3)
    else:
        out_dtype = rows3.dtype
        operands = (t.reshape(n, 1), rows3)
    if _use_partitioned():
        fn = _grouped_cp(out_elems, p, num_bits, out_dtype, interpret, lerp)
    else:
        fn = functools.partial(
            _grouped_invoke, out_elems=out_elems, p=p, num_bits=num_bits,
            out_dtype=out_dtype, interpret=interpret, lerp=lerp,
        )
    return fn(*operands)


def _matmul_kernel(t_ref, f_ref, x_ref, w_ref, o_ref, *, num_bits: int,
                   p: int, out_elems: int, in_elems: int):
    t = t_ref[...]  # (rows, 1) int32
    f = f_ref[...]  # (rows, 1) f32
    x = x_ref[0, 0]  # (rows, in_elems)
    x = _barrel(x, t, p=p, num_bits=num_bits)
    window = _window_f32(x, out_elems + 1)
    lerped = window[:, :-1] * (1.0 - f) + window[:, 1:] * f  # (rows, out)
    w = w_ref[0]  # (m, out_elems) — tap matrix pre-transposed by the caller
    acc = jax.lax.dot_general(
        w, lerped.astype(w.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),  # NT: contract u
        preferred_element_type=jnp.float32,
    )  # (m, rows) — MXU
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def fused_shift_lerp_matmul(rows4, k, f, w_t, out_dtype=jnp.float32,
                            interpret: bool = False):
    """Fused shift + lerp + per-image tap matmul: one warp PASS per call.

    rows4: (G, B, R, in_elems) uint8/bf16/f32 — G channel planes of B
      images, R single-channel rows each (pass 1: R = padded H; pass 2:
      R = out_w).
    k/f: (B*R,) int32 / float row shifts+fractions (R-major per image).
    w_t: (B, M, out_elems) — the banded tap matrix, TRANSPOSED (taps along
      the minor axis) so the in-kernel matmul is the NT dgemm Mosaic
      lowers natively.

    Returns (G, B, M, R) out_dtype:
      out[g, b, m, r] = sum_u lerp_window[g, b, r, u] * w_t[b, m, u]

    vs fused_shift_lerp_grouped + einsum, this keeps the lerped window in
    VMEM and feeds the MXU directly: the (G, B, R, out) window intermediate
    never exists in HBM (~4 GB/step at recipe shape), and the output comes
    out already transposed for the next pass (the inter-pass swapaxes
    disappears).  Block = one (channel, image) plane, so the tap matrix
    block is per-image shared, reused across the G inner grid steps.

    MEASURED (v5e, RN50 recipe): 3,750 img/s vs 3,784 for grouped+einsum —
    the in-kernel dot serializes with the barrel inside each block while
    XLA overlaps the standalone einsum with neighboring HLO, and pass 1
    pays 14% extra shift rows for the h-pad sentinels.  Off by default;
    enable with PECLR_SHIFT_FUSE=matmul (BENCHLOG round 3).

    NOT custom-partitioned: under a GSPMD mesh this call REPLICATES (XLA
    all-gathers its inputs to every chip).  The default grouped kernels
    carry the sharding rule; this losing A/B variant stays single-chip.
    """
    g, b, r, in_elems = rows4.shape
    _, m, out_elems = w_t.shape
    assert in_elems % 128 == 0 and out_elems % 128 == 0, (in_elems, out_elems)
    assert m % 8 == 0 and r % 8 == 0, (m, r)
    assert k.shape == (b * r,) and f.shape == (b * r,), (k.shape, b, r)
    k = jnp.clip(k, -(out_elems + 2), in_elems)
    p = _round_up(in_elems + out_elems + 2, 128)
    t = (in_elems - k).astype(jnp.int32)
    num_bits = int(in_elems + out_elems + 2).bit_length()

    grid_spec = pl.GridSpec(
        grid=(b, g),  # b outer: the w_t block is revisited across g
        in_specs=[
            pl.BlockSpec((r, 1), lambda bi, gi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda bi, gi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r, in_elems), lambda bi, gi: (gi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, out_elems), lambda bi, gi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m, r), lambda bi, gi: (gi, bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _matmul_kernel, num_bits=num_bits, p=p, out_elems=out_elems,
        in_elems=in_elems,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, b, m, r), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(t.reshape(b * r, 1), f.astype(jnp.float32).reshape(b * r, 1), rows4,
      w_t)


def shift_rows_pallas(images, offsets, out_w: int, lerp_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """Drop-in twin of ops.warp_mxu._shift_rows on TPU:
    images (B, H, W, C), offsets (B, H) real -> (B, H, out_w, C) lerp_dtype.

    out_w*C and W*C must be 128-aligned (ops/warp_mxu rounds its window
    sizes accordingly); B*H must be a multiple of BLOCK_ROWS."""
    b, h, w, c = images.shape
    assert (w * c) % 128 == 0 and (out_w * c) % 128 == 0, (w, out_w, c)
    n = b * h
    rows = images.reshape(n, w * c)
    k_true = jnp.floor(offsets)
    f = (offsets - k_true).reshape(n)
    k = k_true.reshape(n).astype(jnp.int32)
    out = fused_shift_lerp(
        rows, k, f, out_w * c, c, out_dtype=lerp_dtype, interpret=interpret
    )
    return out.reshape(b, h, out_w, c)
