"""MXU (two-pass matmul) warp vs the direct gather warp."""

import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.ops.warp import affine_warp
from peclr_tpu.ops.warp_mxu import affine_warp_mxu


def smooth_images(b=4, h=96, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = np.stack(
        [128 + 100 * np.sin(xx / 11.0 + i) * np.cos(yy / 13.0 - 0.5 * i)
         for i in range(b)]
    ).astype(np.float32)
    return imgs[..., None].repeat(3, -1)


def rotation_crop_mats(rng, b, angle_range=40.0):
    mats = []
    for t in rng.uniform(-angle_range, angle_range, b):
        c, s = np.cos(np.deg2rad(t)), np.sin(np.deg2rad(t))
        R = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        center = np.array([[1, 0, 48], [0, 1, 48], [0, 0, 1.0]])
        M = (
            np.diag([64 / 80.0, 64 / 85.0, 1.0])
            @ np.array([[1, 0, -40], [0, 1, -45], [0, 0, 1.0]])
            @ center @ R @ np.linalg.inv(center)
        )
        mats.append(M)
    return jnp.asarray(np.stack(mats).astype(np.float32))


class TestWarpMXU:
    def test_identity_and_translation_exact(self):
        imgs = jnp.asarray(smooth_images())
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        # f32 compute: exact; bf16 (default training path): ~1 intensity LSB
        np.testing.assert_allclose(
            np.asarray(affine_warp_mxu(imgs, eye, (64, 64),
                                       compute_dtype=jnp.float32)),
            np.asarray(affine_warp(imgs, eye, (64, 64))),
            atol=1e-3,
        )
        np.testing.assert_allclose(  # default dtype (f32 on CPU tests)
            np.asarray(affine_warp_mxu(imgs, eye, (64, 64))),
            np.asarray(affine_warp(imgs, eye, (64, 64))),
            atol=1.5,
        )
        T = np.eye(3, dtype=np.float32)
        T[0, 2], T[1, 2] = 5.5, -3.25
        Tb = jnp.broadcast_to(jnp.asarray(T), (4, 3, 3))
        np.testing.assert_allclose(
            np.asarray(affine_warp_mxu(imgs, Tb, (64, 64),
                                       compute_dtype=jnp.float32)),
            np.asarray(affine_warp(imgs, Tb, (64, 64))),
            atol=1e-2,
        )

    def test_close_to_gather_on_rotations(self, rng):
        imgs = jnp.asarray(smooth_images())
        mats = rotation_crop_mats(rng, 4)
        a = np.asarray(affine_warp(imgs, mats, (64, 64)))
        b = np.asarray(affine_warp_mxu(imgs, mats, (64, 64)))
        d = np.abs(a - b)
        # lerp-of-lerp vs direct bilinear: tight in-bounds, looser at the
        # source-border ring
        assert d.mean() < 1.0
        assert np.percentile(d, 95) < 5.0

    def test_zero_outside_source(self, rng):
        imgs = jnp.asarray(smooth_images())
        # large translation pushes most samples outside
        T = np.eye(3, dtype=np.float32)
        T[0, 2] = -300.0
        Tb = jnp.broadcast_to(jnp.asarray(T), (4, 3, 3))
        out = np.asarray(affine_warp_mxu(imgs, Tb, (64, 64)))
        assert np.abs(out).max() == 0.0


class TestAreaInterp:
    def test_area_matches_cv2_inter_area_pure_downscale(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.uniform(0, 255, (96, 96, 3)).astype(np.float32)
        ref = cv2.resize(img, (48, 48), interpolation=cv2.INTER_AREA)
        M = jnp.broadcast_to(
            jnp.asarray(np.diag([0.5, 0.5, 1.0]).astype(np.float32)), (1, 3, 3)
        )
        got = np.asarray(
            affine_warp_mxu(jnp.asarray(img[None]), M, (48, 48), interp="area",
                            compute_dtype=jnp.float32)
        )[0]
        assert np.abs(got - ref).max() < 1.0

    def test_area_preserves_constant(self):
        img = jnp.full((1, 96, 96, 3), 100.0)
        M = jnp.broadcast_to(
            jnp.asarray(np.diag([0.6, 0.6, 1.0]).astype(np.float32)), (1, 3, 3)
        )
        out = np.asarray(
            affine_warp_mxu(img, M, (48, 48), interp="area",
                            compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(out[0, 10:38, 10:38], 100.0, atol=0.1)
