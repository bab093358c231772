"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.ops.pallas.barrel_shift import (
    BLOCK_ROWS,
    fused_shift_lerp,
    shift_rows_pallas,
)
from peclr_tpu.ops.warp_mxu import _shift_rows


def test_fused_shift_lerp_exact(rng):
    """Single-channel rows against a direct numpy oracle, including
    negative and over-range (clamped) shifts."""
    n, in_elems, out_elems = 64, 512, 256
    rows = jnp.asarray(rng.uniform(0, 255, (n, in_elems)).astype(np.float32))
    k = jnp.asarray(
        rng.integers(-(out_elems + 10), in_elems + 10, (n,)).astype(np.int32)
    )
    f = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    out = np.asarray(
        fused_shift_lerp(rows, k, f, out_elems, c=1,
                         out_dtype=jnp.float32, interpret=True)
    )
    r = np.asarray(rows)
    padded = np.pad(r, ((0, 0), (out_elems + 4, out_elems + 4)))
    kk = np.clip(np.asarray(k), -(out_elems + 2), in_elems)
    fv = np.asarray(f)
    ref = np.stack([
        padded[i, out_elems + 4 + kk[i]: out_elems + 4 + kk[i] + out_elems]
        * (1 - fv[i])
        + padded[i, out_elems + 5 + kk[i]: out_elems + 5 + kk[i] + out_elems]
        * fv[i]
        for i in range(n)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_grouped_matches_flat(rng):
    """The grouped (shared-scalar, 2D-grid) kernel must equal the flat one
    on replicated planes — it exists only to keep SMEM at N, not G*N."""
    from peclr_tpu.ops.pallas.barrel_shift import fused_shift_lerp_grouped

    g, n, in_elems, out_elems = 3, 64, 256, 128
    rows = rng.uniform(0, 255, (g, n, in_elems)).astype(np.float32)
    k = rng.integers(-(out_elems + 5), in_elems + 5, (n,)).astype(np.int32)
    f = rng.uniform(0, 1, (n,)).astype(np.float32)
    grouped = np.asarray(fused_shift_lerp_grouped(
        jnp.asarray(rows), jnp.asarray(k), jnp.asarray(f), out_elems,
        out_dtype=jnp.float32, interpret=True,
    ))
    for gi in range(g):
        flat = np.asarray(fused_shift_lerp(
            jnp.asarray(rows[gi]), jnp.asarray(k), jnp.asarray(f),
            out_elems, c=1, out_dtype=jnp.float32, interpret=True,
        ))
        np.testing.assert_allclose(grouped[gi], flat, atol=1e-4)


def test_matmul_kernel_matches_grouped_plus_einsum(rng):
    """fused_shift_lerp_matmul == fused_shift_lerp_grouped followed by the
    banded-tap einsum (the fusion must be a pure refactor of the math)."""
    from peclr_tpu.ops.pallas.barrel_shift import (
        fused_shift_lerp_grouped,
        fused_shift_lerp_matmul,
    )

    g, b, r, in_elems, out_elems, m = 3, 2, 16, 256, 128, 8
    rows4 = rng.uniform(0, 255, (g, b, r, in_elems)).astype(np.float32)
    k = rng.integers(-(out_elems + 5), in_elems + 5, (b * r,)).astype(
        np.int32
    )
    f = rng.uniform(0, 1, (b * r,)).astype(np.float32)
    w_t = rng.uniform(-1, 1, (b, m, out_elems)).astype(np.float32)

    fused = np.asarray(fused_shift_lerp_matmul(
        jnp.asarray(rows4), jnp.asarray(k), jnp.asarray(f),
        jnp.asarray(w_t), out_dtype=jnp.float32, interpret=True,
    ))
    window = np.asarray(fused_shift_lerp_grouped(
        jnp.asarray(rows4.reshape(g, b * r, in_elems)), jnp.asarray(k),
        jnp.asarray(f), out_elems, out_dtype=jnp.float32, interpret=True,
    )).reshape(g, b, r, out_elems)
    ref = np.einsum("gbru,bmu->gbmr", window, w_t)
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-2)


def test_grouped_raw_mode_matches_integer_shift(rng):
    """lerp=False must emit the UNLERPED integer-shifted window in the
    input dtype (uint8 stays uint8), equal to a direct numpy shift oracle;
    applying the 2-tap lerp outside must then reproduce the lerp=True
    kernel everywhere except the top tap (whose win[out] neighbor the XLA
    path zero-fills — callers guarantee a zero tent row there)."""
    from peclr_tpu.ops.pallas.barrel_shift import fused_shift_lerp_grouped

    g, n, in_elems, out_elems = 3, 64, 256, 128
    rows = rng.uniform(0, 255, (g, n, in_elems)).astype(np.float32)
    k = rng.integers(-(out_elems + 5), in_elems + 5, (n,)).astype(np.int32)
    f = rng.uniform(0, 1, (n,)).astype(np.float32)

    raw = np.asarray(fused_shift_lerp_grouped(
        jnp.asarray(rows), jnp.asarray(k), None, out_elems,
        interpret=True, lerp=False,
    ))
    assert raw.dtype == np.float32
    padded = np.pad(rows, ((0, 0), (0, 0), (out_elems + 4, out_elems + 4)))
    kk = np.clip(k, -(out_elems + 2), in_elems)
    ref = np.stack(
        [padded[:, i, out_elems + 4 + kk[i]: out_elems + 4 + kk[i]
                + out_elems] for i in range(n)],
        axis=1,
    )
    np.testing.assert_array_equal(raw, ref)

    lerped = np.asarray(fused_shift_lerp_grouped(
        jnp.asarray(rows), jnp.asarray(k), jnp.asarray(f), out_elems,
        out_dtype=jnp.float32, interpret=True,
    ))
    hi = np.concatenate([raw[..., 1:], np.zeros_like(raw[..., :1])], -1)
    manual = raw * (1 - f[None, :, None]) + hi * f[None, :, None]
    np.testing.assert_allclose(
        manual[..., :-1], lerped[..., :-1], atol=1e-4
    )

    rows_u8 = rng.integers(0, 255, (g, n, in_elems)).astype(np.uint8)
    raw8 = np.asarray(fused_shift_lerp_grouped(
        jnp.asarray(rows_u8), jnp.asarray(k), None, out_elems,
        interpret=True, lerp=False,
    ))
    assert raw8.dtype == np.uint8
    # values, not just dtype: the uint8 barrel runs a different roll
    # lowering (slice+concat _lane_roll), so regressions there are
    # uint8-specific and invisible to the f32 oracle above
    padded8 = np.pad(
        rows_u8, ((0, 0), (0, 0), (out_elems + 4, out_elems + 4))
    )
    ref8 = np.stack(
        [padded8[:, i, out_elems + 4 + kk[i]: out_elems + 4 + kk[i]
                 + out_elems] for i in range(n)],
        axis=1,
    )
    np.testing.assert_array_equal(raw8, ref8)

    # a caller-supplied out_dtype with lerp=False must be rejected, not
    # silently overridden (ADVICE r3)
    with pytest.raises(ValueError):
        fused_shift_lerp_grouped(
            jnp.asarray(rows_u8), jnp.asarray(k), None, out_elems,
            out_dtype=jnp.float32, interpret=True, lerp=False,
        )


def test_shift_rows_pallas_matches_xla_shifter(rng):
    """The fused kernel must reproduce ops/warp_mxu._shift_rows bit-for-
    bit semantics (zero borders, clamped-row zeroing, 2-tap lerp) on
    multi-channel image rows — the exact configuration the warp uses."""
    b, h, w, c = 4, 16, 40, 3
    window = 128  # window * c = 384, 128-aligned
    # pad w so rows are 128-aligned in elements (the integration's step)
    w_pad = 128  # 128 * 3 = 384 aligned
    images = rng.uniform(0, 255, (b, h, w, c)).astype(np.float32)
    images_padded = np.pad(images, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    offsets = rng.uniform(-100, 160, (b, h)).astype(np.float32)

    out_pallas = np.asarray(
        shift_rows_pallas(
            jnp.asarray(images_padded), jnp.asarray(offsets), window,
            lerp_dtype=jnp.float32, interpret=True,
        )
    )
    out_xla = np.asarray(
        _shift_rows(
            jnp.asarray(images_padded), jnp.asarray(offsets),
            pad=window - w_pad, lerp_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out_pallas, out_xla, atol=1e-3)


def test_warp_pallas_path_matches_xla_path(rng, monkeypatch):
    """affine_warp_mxu with PECLR_SHIFT=pallas (interpret-mode kernel) must
    equal the PECLR_SHIFT=xla result for realistic warp matrices."""
    import peclr_tpu.ops.pallas.barrel_shift as bs
    from peclr_tpu.ops import warp_mxu

    # route the kernels through interpret mode on CPU
    for name in ("fused_shift_lerp", "fused_shift_lerp_grouped",
                 "fused_shift_lerp_matmul"):
        orig = getattr(bs, name)

        def interp_kernel(*args, orig=orig, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(bs, name, interp_kernel)

    b, src, out = 2, 64, 32
    images = rng.uniform(0, 255, (b, src, src, 3)).astype(np.float32)
    theta = np.deg2rad(rng.uniform(-40, 40, b)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, b).astype(np.float32)
    mats = []
    for i in range(b):
        c_, s_ = np.cos(theta[i]) * scale[i], np.sin(theta[i]) * scale[i]
        tx, ty = rng.uniform(-10, 10, 2)
        mats.append([[c_, -s_, tx], [s_, c_, ty], [0, 0, 1]])
    mats = np.asarray(mats, np.float32)

    monkeypatch.setenv("PECLR_SHIFT", "xla")
    ref = np.asarray(warp_mxu.affine_warp_mxu(
        jnp.asarray(images), jnp.asarray(mats), (out, out),
        compute_dtype=jnp.float32,
    ))
    monkeypatch.setenv("PECLR_SHIFT", "pallas")
    for fuse in ("grouped", "matmul"):
        monkeypatch.setenv("PECLR_SHIFT_FUSE", fuse)
        got = np.asarray(warp_mxu.affine_warp_mxu(
            jnp.asarray(images), jnp.asarray(mats), (out, out),
            compute_dtype=jnp.float32,
        ))
        np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=fuse)

    # barrel-only kernel + XLA-side lerp (the zero top tap is exact
    # because affine_warp_mxu sizes one slack tap into the window)
    monkeypatch.setenv("PECLR_SHIFT_FUSE", "grouped")
    monkeypatch.setenv("PECLR_SHIFT_LERP", "xla")
    got = np.asarray(warp_mxu.affine_warp_mxu(
        jnp.asarray(images), jnp.asarray(mats), (out, out),
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, ref, atol=1e-2, err_msg="xla_lerp")


def test_pallas_geometry_fallback(monkeypatch):
    """Misaligned shapes must silently fall back to the XLA shifter, not
    crash (e.g. tiny test canvases)."""
    from peclr_tpu.ops import warp_mxu

    monkeypatch.setenv("PECLR_SHIFT", "pallas")
    images = jnp.ones((1, 9, 17, 3), jnp.float32)  # 9 rows: not BLOCK_ROWS
    offsets = jnp.zeros((1, 9), jnp.float32)
    out = warp_mxu._shift_rows_any(images, offsets, 30, jnp.float32, True)
    assert out.shape == (1, 9, 30, 3)
    assert np.isfinite(np.asarray(out)).all()
