"""On-chip Pallas <-> XLA numeric parity harness (VERDICT r3 #2).

Every kernel test in tests/test_pallas_kernels.py runs interpret=True on
CPU; this script runs the REAL Mosaic compilations on the TPU and compares
them against the pure-XLA barrel shifter, converting "the kernel is fast"
into "the kernel is fast AND computes the same thing" under the quirk-heavy
remote Mosaic toolchain (32-bit-only rotates, uint8 cast hops,
wraparound-as-datapath).

Covered, at recipe geometry (canvas 224 -> view 128, ±45°, the exact window
sizes the train step uses — warp semantics of the reference's
sample_augmenter.py:166-245):

  1. shift_rows_pallas vs _shift_rows (flat kernel, bf16 + uint8 sources,
     randomized fractional shifts incl. out-of-range clamps);
  2. fused_shift_lerp_grouped raw mode (uint8): integer-shift window must
     be EXACTLY equal to the XLA barrel's integer taps;
  3. full affine_warp_mxu: every enableable variant (grouped kernel,
     PECLR_SHIFT_FUSE=matmul, PECLR_SHIFT_LERP=xla) vs PECLR_SHIFT=xla on
     the same random rotate+crop+resize matrices, bf16 compute.

Writes bench_artifacts/pallas_parity.json; tests/test_bench_artifacts.py
asserts ok=true and the recorded error bounds.

Run (real chip, serialized with other TPU work):
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/pallas_parity.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _summary(a, b, scale=1.0):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)) / scale
    return {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "p999": float(np.quantile(d, 0.999)),
    }


def main():
    import jax
    import jax.numpy as jnp

    from peclr_tpu.ops import warp_mxu
    from peclr_tpu.ops.pallas.barrel_shift import (
        fused_shift_lerp_grouped,
        shift_rows_pallas,
    )

    backend = jax.default_backend()
    rng = np.random.default_rng(11)
    results = {"backend": backend, "cases": {}, "ok": True}

    def record(name, summary, max_abs_bound):
        summary["bound"] = max_abs_bound
        summary["pass"] = summary["max_abs"] <= max_abs_bound
        results["cases"][name] = summary
        results["ok"] = results["ok"] and summary["pass"]
        flag = "OK " if summary["pass"] else "FAIL"
        print(f"{flag} {name:42s} max {summary['max_abs']:.4g} "
              f"mean {summary['mean_abs']:.3g} (bound {max_abs_bound})")

    # ---- 1. flat kernel vs XLA shifter, recipe row geometry -------------
    # pass-1 shape: rows = canvas rows padded to 128-aligned elements
    b, h, w, c = 32, 224, 224, 3
    w_pad = 256  # 256*3 = 768, 128-aligned
    window = 128  # window*c = 384
    images = rng.integers(0, 256, (b, h, w, c)).astype(np.uint8)
    images = np.pad(images, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    offsets = rng.uniform(-180, 260, (b, h)).astype(np.float32)

    for dtype_name, x in (("uint8", jnp.asarray(images)),
                          ("bf16", jnp.asarray(images, jnp.bfloat16))):
        pal = jax.jit(lambda im, off: shift_rows_pallas(
            im, off, window, lerp_dtype=jnp.bfloat16))(x, jnp.asarray(offsets))
        ref = jax.jit(lambda im, off: warp_mxu._shift_rows(
            im, off, pad=window - w_pad, lerp_dtype=jnp.bfloat16))(
                x, jnp.asarray(offsets))
        # identical math: kernel lerps f32->bf16, XLA lerps bf16 — <=1
        # intensity LSB apart on uint8-valued data (bf16 ulp at 255 = 1.0)
        record(f"shift_rows[{dtype_name}] vs xla", _summary(pal, ref), 1.0)

    # ---- 2. grouped raw mode: integer taps EXACT on uint8 ---------------
    g, n, in_elems, out_elems = 3, 32 * 224, 256, 384
    rows = rng.integers(0, 256, (g, n, in_elems)).astype(np.uint8)
    k = rng.integers(-(out_elems + 10), in_elems + 10, (n,)).astype(np.int32)
    raw = jax.jit(lambda r, kk: fused_shift_lerp_grouped(
        r, kk, None, out_elems, lerp=False))(jnp.asarray(rows),
                                             jnp.asarray(k))
    padded = np.pad(rows, ((0, 0), (0, 0), (out_elems + 4, out_elems + 4)))
    kk = np.clip(k, -(out_elems + 2), in_elems)
    oracle = np.stack(
        [padded[:, i, out_elems + 4 + kk[i]: out_elems + 4 + kk[i]
                + out_elems] for i in range(n)], axis=1)
    record("grouped_raw[uint8] vs numpy oracle",
           _summary(raw, oracle), 0.0)

    # ---- 3. full warp, every variant vs the XLA path --------------------
    bw, src, out = 32, 224, 128
    imgs = rng.integers(0, 256, (bw, src, src, 3)).astype(np.uint8)
    theta = np.deg2rad(rng.uniform(-45, 45, bw)).astype(np.float32)
    scale = (src / out) / rng.uniform(0.9, 1.5, bw).astype(np.float32)
    mats = []
    for i in range(bw):
        c_, s_ = np.cos(theta[i]) * scale[i], np.sin(theta[i]) * scale[i]
        tx, ty = rng.uniform(-20, 20, 2)
        mats.append([[c_, -s_, tx], [s_, c_, ty], [0, 0, 1]])
    mats = np.asarray(mats, np.float32)
    # window bounds: recipe's rotate-aware sizing (augment._warp_window_bounds)
    bound = (src / out) / np.cos(np.deg2rad(45.0)) + 0.05

    def run_variant(shift, fuse, lerp):
        os.environ["PECLR_SHIFT"] = shift
        os.environ["PECLR_SHIFT_FUSE"] = fuse
        os.environ["PECLR_SHIFT_LERP"] = lerp
        fn = jax.jit(lambda im, m: warp_mxu.affine_warp_mxu(
            im, m, (out, out), max_scale_x=float(bound),
            max_scale_y=float(src / out + 0.05),
        ))
        try:
            return np.asarray(fn(jnp.asarray(imgs), jnp.asarray(mats)))
        finally:
            for v in ("PECLR_SHIFT", "PECLR_SHIFT_FUSE", "PECLR_SHIFT_LERP"):
                os.environ.pop(v, None)

    ref = run_variant("xla", "grouped", "kernel")
    # Bound derivation (uint8-valued data, |x| <= 255 where bf16 ulp = 1.0
    # and at x ~ 256 the ulp is 2.0): the two-pass warp rounds to bf16 once
    # per pass, and the kernel lerps f32->bf16 while the XLA path's lerp
    # rides the banded-tap einsum — two independent 1-ulp roundings at
    # magnitude ~255 (2.0) plus tent-weight rounding (<= 0.5).  Measured on
    # the real chip: max 2.0039, p999 1.58, mean 0.178.
    first = None
    for fuse, lerp in (("grouped", "kernel"), ("matmul", "kernel"),
                       ("grouped", "xla")):
        got = run_variant("pallas", fuse, lerp)
        record(f"warp[fuse={fuse},lerp={lerp}] vs xla",
               _summary(got, ref), 2.5)
        # the kernel variants must agree with EACH OTHER far more tightly
        # than with XLA: same barrel, same window — only the lerp location
        # differs (a single bf16 rounding of the same f32 value)
        if first is None:
            first = got
        else:
            record(f"warp[fuse={fuse},lerp={lerp}] vs pallas-first",
                   _summary(got, first), 1.0)

    out_path = "bench_artifacts/pallas_parity.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(("ALL OK" if results["ok"] else "FAILURES") + " -> " + out_path)
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
