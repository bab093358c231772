"""MXU-native affine warp: two-pass (Catmull-Smith) decomposition that turns
the bilinear warp into two banded matmuls + row/column shifts.

The direct gather warp (ops/warp.py) is exact but gather-bound on TPU
(~12 ns/tap — the VPU has no fast arbitrary gather).  This version routes
the heavy lifting through the MXU:

  inverse map (out -> src):  x_s = A·i + B·j + TX ;  y_s = C·i + D·j + TY

  pass 1 (horizontal, per source row y):
      positions p(y, i) = α·i + β·y + γ   with α = A − BC/D, β = B/D,
      γ = TX − B·TY/D  (valid for D ≠ 0, i.e. |rotation| < 90°)
      = per-row shift by k(y)+f(y) (integer + fractional, a 2-tap lerp of
        contiguous dynamic slices) followed by a per-image banded matmul
        W1[u, i] = tent(α·i − u)                        [MXU]

  pass 2 (vertical, per column i):
      positions q(i, j) = D·j + (C·i + TY) = per-column shift by the
      integer+fractional part of (C·i + TY), then a per-image banded matmul
      W2[j, y] = tent(D·j − y)                          [MXU]

Interpolation: linear taps in each pass (a lerp-of-lerp — equal to direct
bilinear up to second-order terms; keypoint/affine math is unchanged).
Border: zero outside the source, enforced by an exact validity mask from the
direct inverse map.

Cost per 224->128 image: ~2·224·224·128·3 MACs ≈ 77 MFLOP — ~100x less wall
time than the gather at TPU matmul rates.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _inv3_affine(m):
    """Closed-form inverse of a batch of 2D homogeneous affines (..., 3, 3)."""
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    ia = d / det
    ib = -b / det
    ic = -c / det
    id_ = a / det
    itx = (b * ty - d * tx) / det
    ity = (c * tx - a * ty) / det
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([ia, ib, itx], axis=-1),
            jnp.stack([ic, id_, ity], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_rows(images, offsets, pad: int, lerp_dtype=None):
    """Shift every row y of every image by a real offset o[b, y]:
    out[b, y, u] = img(b, y, u + o), u in [0, W+pad), zero outside the
    source, fractional part via a 2-tap lerp.

    Gather-free: the integer shift is a barrel shifter — log2(range) stages
    of static jnp.roll selected per row by the shift's bits.  Static rolls
    are cheap lane permutes on TPU, and per-row bit masks are vectorized
    selects, so the whole thing is VPU/bandwidth work with no gathers or
    dynamic slices (both of which are slow or unsupported on the TPU
    toolchain).

    The integer barrel stages run in the INPUT dtype — pass uint8 sources
    through unconverted to quarter the shift traffic; only the final 2-tap
    lerp promotes to `lerp_dtype`.
    """
    b, h, w, c = images.shape
    out_w = w + pad
    if lerp_dtype is None:
        lerp_dtype = (
            images.dtype
            if images.dtype in (jnp.float32, jnp.bfloat16)
            else jnp.float32
        )
    dtype = lerp_dtype
    k_true = jnp.floor(offsets)
    f = (offsets - k_true)[..., None, None].astype(lerp_dtype)
    k_min = -(out_w + 2)
    k = jnp.clip(k_true, k_min, w).astype(jnp.int32)
    s = k - k_min  # >= 0, <= w - k_min
    max_s = w - k_min

    # content placed at column -k_min of the padded row; u-th output reads
    # padded[u + s]; width covers u+s without wraparound.  Barrel stages run
    # in the source dtype (uint8 stays 1 byte/px).
    total = _round_up(w - k_min + out_w + 2, 128)
    x = jnp.pad(images, ((0, 0), (0, 0), (-k_min, total - w + k_min), (0, 0)))

    # barrel stages high -> low with PROGRESSIVE window shrinking: after the
    # bit-b stage the residual shift is < 2^b, so before each stage the
    # buffer can be sliced to out_w+1 + (2^(b+1) - 1) columns — each stage
    # moves a strictly narrower buffer.  Per-stage slicing measured fastest
    # (3357 img/s on the RN50 recipe) even though some slices materialize as
    # copies; slicing only on >=128-column drops measured 3150, no slicing
    # (fixed coarse/fine split) 3085 — the copies overlap, the shift traffic
    # does not.
    for bit in range(max_s.bit_length() - 1, -1, -1):
        need = out_w + 1 + (1 << (bit + 1)) - 1
        if need < x.shape[2]:
            x = x[:, :, : _round_up(need, 8), :]
        amount = 1 << bit
        take = ((s >> bit) & 1).astype(bool)[..., None, None]
        x = jnp.where(take, jnp.roll(x, -amount, axis=2), x)

    window = x[:, :, : out_w + 1, :].astype(lerp_dtype)
    out = window[:, :, :-1, :] * (1.0 - f) + window[:, :, 1:, :] * f

    # rows whose shift had to be clamped are entirely outside the source;
    # in-range rows get exact zero borders from the padding itself
    valid_row = (k_true >= k_min) & (k_true <= w)
    return jnp.where(valid_row[..., None, None], out, jnp.asarray(0.0, dtype))


def _tap_iotas(n_in: int, n_out: int, transposed: bool):
    """Broadcast iotas for the banded tap matrices: (B, n_in, n_out) in
    standard form, (B, n_out, n_in) when transposed (taps minor — the
    layout the fused Pallas matmul kernel's NT dgemm wants)."""
    if transposed:
        i = jnp.arange(n_out, dtype=jnp.float32)[None, :, None]
        u = jnp.arange(n_in, dtype=jnp.float32)[None, None, :]
    else:
        i = jnp.arange(n_out, dtype=jnp.float32)[None, None, :]
        u = jnp.arange(n_in, dtype=jnp.float32)[None, :, None]
    return i, u


def _tent_matrix(slopes, n_in: int, n_out: int, transposed: bool = False):
    """(B, n_in, n_out) banded bilinear-tap matrix:
    M[b, u, i] = max(0, 1 − |slope_b·i − u|)."""
    i, u = _tap_iotas(n_in, n_out, transposed)
    pos = slopes[:, None, None] * i
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - u))


def _area_matrix(slopes, n_in: int, n_out: int, transposed: bool = False):
    """(B, n_in, n_out) box-filter (cv2 INTER_AREA) matrix for downscaling:
    output pixel i averages source [s·i, s·(i+1)); falls back to the tent
    taps per image when s <= 1 (cv2's INTER_AREA == bilinear on upscale)."""
    i, u = _tap_iotas(n_in, n_out, transposed)
    s = slopes[:, None, None]
    overlap = jnp.clip(
        jnp.minimum(s * (i + 1.0), u + 1.0) - jnp.maximum(s * i, u), 0.0, 1.0
    )
    area = overlap / jnp.maximum(s, 1e-6)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(s * i - u))
    return jnp.where(s > 1.0, area, tent)


def _use_pallas_shift() -> bool:
    """Route the row shifts through the fused Pallas kernel?

    PECLR_SHIFT=pallas forces it, =xla forces the XLA barrel shifter,
    default (auto) picks Pallas on TPU backends — the fused kernel holds
    every roll stage in VMEM (one HBM read + one write vs one round trip
    per stage; see ops/pallas/barrel_shift.py for the measured A/B)."""
    mode = os.environ.get("PECLR_SHIFT", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() in ("tpu", "axon")


def _pallas_geometry_ok(b: int, h: int, w: int, c: int, window: int) -> bool:
    """The kernel wants 128-aligned element rows and full row blocks."""
    from peclr_tpu.ops.pallas.barrel_shift import BLOCK_ROWS

    return (
        (b * h) % BLOCK_ROWS == 0
        and (window * c) % 128 == 0
    )


def _shift_rows_any(images, offsets, window: int, lerp_dtype, use_pallas):
    """Dispatch one shift pass: fused Pallas kernel when the geometry
    allows, the XLA barrel shifter otherwise (identical semantics)."""
    b, h, w, c = images.shape
    if use_pallas and _pallas_geometry_ok(b, h, w, c, window):
        from peclr_tpu.ops.pallas.barrel_shift import shift_rows_pallas

        # zero-pad W so rows are 128-aligned in elements; the pad region
        # reads as out-of-source zeros, preserving border semantics
        w_aligned = _round_up(w * c, 128) // c
        if w_aligned * c % 128 != 0:  # c does not divide cleanly
            return _shift_rows(images, offsets, pad=window - w,
                               lerp_dtype=lerp_dtype)
        if w_aligned != w:
            images = jnp.pad(
                images, ((0, 0), (0, 0), (0, w_aligned - w), (0, 0))
            )
        return shift_rows_pallas(
            images, offsets, window, lerp_dtype=lerp_dtype
        )
    return _shift_rows(images, offsets, pad=window - w, lerp_dtype=lerp_dtype)


def _shift_pass_cfirst(xc, offsets, window: int, lerp_dtype,
                       xla_lerp: bool = False):
    """One shift pass on channel-leading data: xc (C, B, H, W) -> shifted
    (C, B, H, window).  Rows are single-channel pixel vectors, so the
    (C*B*H, W) <-> (C, B, H, W) flatten/unflatten only merges LEADING dims
    — layout-free, unlike the NHWC path whose (W, C)->(W*C) merge retiles
    (round-3 trace: ~15 ms/step of reshape/copy around the kernel).

    xla_lerp=True routes only the integer barrel through the kernel and
    applies the fractional 2-tap lerp here in XLA, where it fuses into the
    downstream banded-tap einsum (lerp-then-matmul == matmul-then-lerp by
    linearity).  The kernel then reads AND writes the input dtype — a uint8
    pass keeps uint8 through HBM — and sheds its conversion/lerp vector
    ops, the measured kernel floor (BENCHLOG round 3).  The top tap
    window[u + 1] at u = window - 1 is replaced by zero; callers must size
    `window` so the last tent-matrix row is all-zero (affine_warp_mxu adds
    one slack tap before 128-rounding)."""
    from peclr_tpu.ops.pallas import barrel_shift as bs

    c, b, h, w = xc.shape
    rows3 = xc.reshape(c, b * h, w)
    k_true = jnp.floor(offsets)  # (B, H)
    k = k_true.astype(jnp.int32).reshape(-1)
    f = (offsets - k_true).reshape(-1)
    if xla_lerp:
        raw = bs.fused_shift_lerp_grouped(rows3, k, None, window, lerp=False)
        # lerp in f32 to match the in-kernel path bit-for-bit (the kernel
        # lerps in f32 before casting); lerping in lerp_dtype directly
        # measured the same speed but diverges <1 LSB on uint8 sources
        win = raw.reshape(c, b, h, window).astype(jnp.float32)
        hi = jnp.concatenate(
            [win[..., 1:], jnp.zeros_like(win[..., :1])], axis=-1
        )
        f4 = f.reshape(1, b, h, 1).astype(jnp.float32)
        return (win * (1.0 - f4) + hi * f4).astype(lerp_dtype)
    out = bs.fused_shift_lerp_grouped(rows3, k, f, window,
                                      out_dtype=lerp_dtype)
    return out.reshape(c, b, h, window)


def _pallas_cfirst_ok(b, src_h, out_w, c, u_size, v_size) -> bool:
    """Channel-leading fast-path gate.  The grouped kernel's row count is
    b*h PER PLANE (the c planes ride the grid's leading axis), so the
    BLOCK_ROWS divisibility is on b*src_h / b*out_w — NOT c*b*h, which for
    even c could pass while the kernel's own assert fails."""
    from peclr_tpu.ops.pallas.barrel_shift import BLOCK_ROWS

    return (
        u_size % 128 == 0 and v_size % 128 == 0
        and (b * src_h) % BLOCK_ROWS == 0
        and (b * out_w) % BLOCK_ROWS == 0
    )


def pallas_window_sizes(out_hw, max_scale_x: float, max_scale_y: float,
                        xla_lerp: bool = False):
    """The static (u_size, v_size) sampling windows the Pallas fast path
    uses for a given output size and slope bounds — the exact arithmetic
    of affine_warp_mxu, exposed so tests can assert the sharded-recipe
    geometry keeps the fast path on (VERDICT r3 #7)."""
    out_h, out_w = out_hw
    u_size = int(max_scale_x * out_w) + 2
    v_size = int(max_scale_y * out_h) + 2
    slack = 1 if xla_lerp else 0
    return _round_up(u_size + slack, 128), _round_up(v_size + slack, 128)


def _pallas_matmul_ok(h_pad, w_pad, out_hw, u_size, v_size) -> bool:
    """Geometry gate for the fused shift+lerp+matmul kernel (both passes).

    Pass 1: rows4 (C,B,h_pad,w_pad), window u_size, taps (B,out_w,u_size);
    pass 2 consumes pass 1's (C,B,out_w,h_pad) output directly, so h_pad
    is pass 2's in_elems and must itself be 128-aligned."""
    out_h, out_w = out_hw
    return (
        w_pad % 128 == 0 and h_pad % 128 == 0
        and u_size % 128 == 0 and v_size % 128 == 0
        and out_w % 8 == 0 and out_h % 8 == 0
        and h_pad <= 512 and out_w <= 512
    )


def _default_compute_dtype():
    """bf16 on TPU (MXU-native, uint8 inputs exact); f32 elsewhere (the CPU
    backend cannot execute bf16 dots)."""
    import jax

    return jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32


def affine_warp_mxu(
    images, matrices, out_hw, fill_value: float = 0.0, max_scale: float = 1.96,
    compute_dtype=None, interp: str = "linear",
    max_scale_x: float | None = None, max_scale_y: float | None = None,
):
    """Drop-in replacement for ops.warp.affine_warp (same signature).

    Constraints (must be guaranteed by the caller; use the gather warp
    otherwise):
      * rotations within ±90° (the vertical component D stays positive);
      * the horizontal sampling slope |alpha| = |det/D| is at most
        `max_scale_x` (NOTE: for a rotation+downscale map this is
        downscale/cos(angle), NOT just the downscale factor) and the
        vertical slope |D| at most `max_scale_y`, both in units of
        out-size; positions beyond the static window contribute zero.
        Callers with known angle/scale bounds must size the windows
        accordingly (ops/augment.py derives them from the config).
    """
    if compute_dtype is None:
        compute_dtype = _default_compute_dtype()
    if max_scale_x is None:
        max_scale_x = max_scale
    if max_scale_y is None:
        max_scale_y = max_scale
    bsz, src_h, src_w, c = images.shape
    out_h, out_w = out_hw
    # bf16 pipeline: uint8-valued inputs are exactly representable; the two
    # lerps lose < 1 intensity LSB — below JPEG noise.  uint8 sources stay
    # uint8 through the pass-1 barrel shifter (quarter traffic).
    x = images if images.dtype == jnp.uint8 else images.astype(compute_dtype)
    inv = _inv3_affine(matrices.astype(jnp.float32))
    A, B, TX = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    C, D, TY = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    D_safe = jnp.where(jnp.abs(D) < 1e-6, 1e-6, D)

    alpha = A - B * C / D_safe
    beta = B / D_safe
    gamma = TX - B * TY / D_safe

    # static widths covering the sampling positions alpha*i / D*j (the
    # shifts bring the needed window to the origin, so the source extent is
    # irrelevant — only the position range matters)
    u_size = int(max_scale_x * out_w) + 2
    v_size = int(max_scale_y * out_h) + 2
    use_pallas = _use_pallas_shift()
    # barrel-only kernel + XLA-side lerp (fuses into the tap einsum); the
    # +1 slack tap guarantees the last tent row is all-zero, which the
    # XLA lerp's zero-filled top tap relies on (_shift_pass_cfirst).
    # NOTE: PECLR_SHIFT_FUSE=matmul OVERRIDES this — the matmul kernel
    # always lerps in-kernel; when it wins the dispatch below, the only
    # xla_lerp effect left is the (harmless) +1 slack tap in u/v_size.
    xla_lerp = os.environ.get("PECLR_SHIFT_LERP", "kernel") == "xla"
    if use_pallas:
        # the fused kernel wants 128-aligned pixel windows (channel-leading
        # rows are single-channel); the extra taps sit past every sampling
        # position and contribute exact zeros
        u_size, v_size = pallas_window_sizes(
            out_hw, max_scale_x, max_scale_y, xla_lerp
        )

    rows_off = beta[:, None] * jnp.arange(src_h, dtype=jnp.float32)[None, :] + gamma[:, None]
    cols_off = C[:, None] * jnp.arange(out_w, dtype=jnp.float32)[None, :] + TY[:, None]
    tap_matrix = _area_matrix if interp == "area" else _tent_matrix
    w1 = tap_matrix(alpha, u_size, out_w).astype(compute_dtype)
    w2 = tap_matrix(D, v_size, out_h).astype(compute_dtype)

    h_pad = _round_up(src_h, 128)
    w_pad = _round_up(src_w, 128)
    fuse_matmul = os.environ.get("PECLR_SHIFT_FUSE", "grouped") == "matmul"
    if (use_pallas and fuse_matmul
            and _pallas_matmul_ok(h_pad, w_pad, out_hw, u_size, v_size)):
        # ---- fused shift+lerp+matmul pipeline (one kernel per pass) -----
        # Measured SLOWER than grouped kernels + XLA einsum on v5e (3,750
        # vs 3,784 img/s recipe): the in-kernel dot serializes with the
        # barrel on the VPU/MXU while XLA overlaps the separate einsum, and
        # the sentinel h-pad rows add 14% shift work.  Kept behind
        # PECLR_SHIFT_FUSE=matmul (BENCHLOG round 3).
        from peclr_tpu.ops.pallas.barrel_shift import fused_shift_lerp_matmul

        xc = jnp.moveaxis(x, 3, 0)  # (C, B, H, W)
        xc = jnp.pad(
            xc,
            ((0, 0), (0, 0), (0, h_pad - src_h), (0, w_pad - src_w)),
        )
        # padded rows get the clamp sentinel (k = w_pad -> all-zero window,
        # f = 0), so pass 2's taps into h >= src_h read exact zeros
        off1 = jnp.pad(
            rows_off, ((0, 0), (0, h_pad - src_h)),
            constant_values=float(w_pad),
        )
        k1 = jnp.floor(off1)
        f1 = (off1 - k1).reshape(-1)
        w1_t = tap_matrix(alpha, u_size, out_w, transposed=True)
        tmp = fused_shift_lerp_matmul(
            xc, k1.reshape(-1).astype(jnp.int32), f1,
            w1_t.astype(compute_dtype), out_dtype=compute_dtype,
        )  # (C, B, out_w, h_pad) — already transposed for pass 2
        k2 = jnp.floor(cols_off)
        f2 = (cols_off - k2).reshape(-1)
        w2_t = tap_matrix(D, v_size, out_h, transposed=True)
        out_cf = fused_shift_lerp_matmul(
            tmp, k2.reshape(-1).astype(jnp.int32), f2,
            w2_t.astype(compute_dtype), out_dtype=jnp.float32,
        )  # (C, B, out_h, out_w)
        out = jnp.moveaxis(out_cf, 0, -1)  # (B, out_h, out_w, C)
    elif use_pallas and _pallas_cfirst_ok(bsz, src_h, out_w, c, u_size,
                                          v_size):
        # ---- channel-leading fused-kernel pipeline ----------------------
        w_pad = _round_up(src_w, 128)
        xc = jnp.moveaxis(x, 3, 0)  # (C, B, H, W)
        if w_pad != src_w:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (0, 0), (0, w_pad - src_w)))
        shifted = _shift_pass_cfirst(xc, rows_off, u_size, compute_dtype,
                                     xla_lerp=xla_lerp)
        tmp = jnp.einsum(
            "cbhu,bui->cbhi", shifted, w1,
            preferred_element_type=compute_dtype,
        )  # (C, B, H, out_w)
        tmp_t = jnp.swapaxes(tmp, 2, 3)  # (C, B, out_w, H)
        h_pad = _round_up(src_h, 128)
        if h_pad != src_h:
            tmp_t = jnp.pad(
                tmp_t, ((0, 0), (0, 0), (0, 0), (0, h_pad - src_h))
            )
        shifted_v = _shift_pass_cfirst(tmp_t, cols_off, v_size, compute_dtype,
                                       xla_lerp=xla_lerp)
        out = jnp.einsum(
            "cbiv,bvj->bjic", shifted_v, w2,
            preferred_element_type=jnp.float32,
        )  # (B, out_h, out_w, C)
    else:
        # ---- pass 1: horizontal -----------------------------------------
        shifted = _shift_rows_any(
            x, rows_off, u_size, compute_dtype, use_pallas
        )  # (B, H, U, C)
        tmp = jnp.einsum(
            "bhuc,bui->bhic", shifted, w1, preferred_element_type=compute_dtype
        )  # (B, H, out_w, C)

        # ---- pass 2: vertical -------------------------------------------
        tmp_t = jnp.swapaxes(tmp, 1, 2)  # (B, out_w, H, C)
        shifted_v = _shift_rows_any(
            tmp_t, cols_off, v_size, compute_dtype, use_pallas
        )  # (B, out_w, V, C)
        out = jnp.einsum(
            "bivc,bvj->bjic", shifted_v, w2, preferred_element_type=jnp.float32
        )  # (B, out_h, out_w, C)

    # ---- exact border mask from the direct inverse map ------------------
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = A[:, None, None] * gx + B[:, None, None] * gy + TX[:, None, None]
    sy = C[:, None, None] * gx + D[:, None, None] * gy + TY[:, None, None]
    valid = (sx > -1.0) & (sx < src_w) & (sy > -1.0) & (sy < src_h)
    return jnp.where(valid[..., None], out, fill_value)
