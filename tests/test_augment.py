"""Augmentation pipeline tests against OpenCV oracles + property tests.

The cv2 oracle code here independently re-derives the reference augmenter's
observable behavior (crop-box geometry, rotation convention, HSV jitter) to
validate the fused device pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams
from peclr_tpu.ops import image as im
from peclr_tpu.ops.augment import _crop_box, augment_batch, augment_pair
from peclr_tpu.ops.warp import affine_warp

cv2 = pytest.importorskip("cv2")


def rand_image(rng, h=96, w=96):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def rand_joints(rng, h=96, w=96, b=1):
    j = np.zeros((b, 21, 3), np.float32)
    j[..., 0] = rng.uniform(w * 0.3, w * 0.7, size=(b, 21))
    j[..., 1] = rng.uniform(h * 0.3, h * 0.7, size=(b, 21))
    j[..., 2] = rng.normal(size=(b, 21))
    return j


class TestAffineWarp:
    def test_identity(self, rng):
        img = rand_image(rng).astype(np.float32)[None]
        eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        out = np.asarray(affine_warp(jnp.asarray(img), eye, (96, 96)))
        np.testing.assert_allclose(out, img, atol=1e-3)

    def test_matches_cv2_rotation(self, rng):
        img = rand_image(rng).astype(np.float32)
        angle, cx, cy = 27.0, 48.0, 40.0
        M = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
        ref = cv2.warpAffine(img, M, (96, 96), flags=cv2.INTER_LINEAR)
        mat = np.eye(3, dtype=np.float32)
        mat[:2] = M
        ours = np.asarray(
            affine_warp(jnp.asarray(img[None]), jnp.asarray(mat[None]), (96, 96))
        )[0]
        # interiors match bilinearly; borders differ slightly (cv2 rounds)
        diff = np.abs(ours - ref)[4:-4, 4:-4]
        assert np.percentile(diff, 99) < 2.0

    def test_scale_translate_matches_cv2(self, rng):
        img = rand_image(rng).astype(np.float32)
        mat = np.array([[1.5, 0, -10], [0, 2.0, -5], [0, 0, 1]], np.float32)
        ref = cv2.warpAffine(img, mat[:2], (96, 96), flags=cv2.INTER_LINEAR)
        ours = np.asarray(
            affine_warp(jnp.asarray(img[None]), jnp.asarray(mat[None]), (96, 96))
        )[0]
        diff = np.abs(ours - ref)[4:-4, 4:-4]
        assert np.percentile(diff, 99) < 2.0


def crop_box_oracle(joints_xy, jitter, crop_margin):
    """Reference get_crop_size semantics (sample_augmenter.py:418-468),
    re-derived in plain python."""
    cx = int(np.mean(joints_xy[:, 0]))
    cy = int(np.mean(joints_xy[:, 1]))
    side = int(
        np.sqrt(np.max((joints_xy[:, 1] - cy) ** 2 + (joints_xy[:, 0] - cx) ** 2))
        * crop_margin
    )
    ox = max(cx - side + jitter[0], 0)
    oy = max(cy - side + jitter[1], 0)
    return (ox, oy), side, (cx - side - ox, cy - side - oy)


class TestCropBox:
    def test_matches_oracle(self, rng):
        for _ in range(10):
            j = rand_joints(rng, 128, 128)[0, :, :2]
            jit = rng.integers(0, 15, size=2).astype(np.float32)
            margin = 1.25
            (ox, oy), side, (rx, ry) = crop_box_oracle(j, jit, margin)
            origin, side_j, reported = _crop_box(
                jnp.asarray(j[None]), jnp.asarray(jit[None]), jnp.full((1,), margin)
            )
            assert float(origin[0, 0]) == ox and float(origin[0, 1]) == oy
            assert float(side_j[0]) == side
            assert float(reported[0, 0]) == rx and float(reported[0, 1]) == ry


def make_flags(**kw):
    return AugmentationFlags(**kw)


class TestAugmentBatch:
    def test_keypoint_image_consistency(self, rng):
        """Bright dots painted at keypoint locations must land at the
        transformed keypoint coordinates after the fused warp."""
        h = w = 128
        img = np.zeros((h, w, 3), np.uint8)
        joints = rand_joints(rng, h, w)[0]
        for x, y, _ in joints:
            xi, yi = int(x), int(y)
            img[max(yi - 2, 0): yi + 3, max(xi - 2, 0): xi + 3] = 255

        flags = make_flags(crop=True, rotate=True, resize=True)
        out = augment_batch(
            jax.random.PRNGKey(3),
            jnp.asarray(img[None]),
            jnp.asarray(joints[None]),
            flags,
            AugmentationParams(),
        )
        warped = np.asarray(out.images[0])
        tj = np.asarray(out.joints[0])
        hits = total = 0
        for x, y, _ in tj:
            xi, yi = int(round(x)), int(round(y))
            if 2 <= xi < 126 and 2 <= yi < 126:
                total += 1
                if warped[yi - 2: yi + 3, xi - 2: xi + 3].max() > 0.25:
                    hits += 1
        assert total >= 10 and hits / total > 0.9

    def test_matrix_consistency(self, rng):
        img = rand_image(rng, 128, 128)
        joints = rand_joints(rng, 128, 128)
        flags = make_flags(crop=True, rotate=True, resize=True)
        out = augment_batch(
            jax.random.PRNGKey(7),
            jnp.asarray(img[None]),
            jnp.asarray(joints),
            flags,
            AugmentationParams(),
        )
        hom = np.concatenate(
            [joints[0, :, :2], np.ones((21, 1), np.float32)], axis=1
        )
        expected = (np.asarray(out.matrix[0]) @ hom.T).T[:, :2]
        np.testing.assert_allclose(
            np.asarray(out.joints[0, :, :2]), expected, atol=1e-2
        )

    def test_param_ranges_and_determinism(self, rng):
        img = jnp.asarray(
            np.stack([rand_image(rng, 128, 128) for _ in range(8)])
        )
        joints = jnp.asarray(rand_joints(rng, 128, 128, 8))
        flags = make_flags(crop=True, rotate=True, resize=True, color_jitter=True)
        key = jax.random.PRNGKey(11)
        out1 = augment_batch(key, img, joints, flags, AugmentationParams())
        out2 = augment_batch(key, img, joints, flags, AugmentationParams())
        np.testing.assert_array_equal(
            np.asarray(out1.images), np.asarray(out2.images)
        )
        p = {k: np.asarray(v) for k, v in out1.params.items()}
        assert np.all(p["angle"] >= -45) and np.all(p["angle"] <= 45)
        assert np.all(p["angle"] == np.floor(p["angle"]))
        # reported jitter is center−side−origin ∈ [−jitter_max, 0] pre-clamp
        assert np.all(p["jitter_x"] <= 0) and np.all(p["jitter_x"] >= -15)
        assert np.all(p["crop_margin_scale"] == 1.25)
        assert np.all((p["h"] >= 0.01) & (p["h"] <= 1.0))
        assert np.all((p["a"] >= 0.5) & (p["a"] <= 1.0))
        assert np.all((p["b"] >= 5.0) & (p["b"] <= 20.0))

    def test_zero_jitter_when_crop_flag_off(self, rng):
        img = jnp.asarray(rand_image(rng, 128, 128)[None])
        joints = jnp.asarray(rand_joints(rng, 128, 128))
        flags = make_flags(rotate=True, resize=True)  # crop off
        v1, v2 = augment_pair(
            jax.random.PRNGKey(0), img, joints, flags, AugmentationParams(),
            normalize=False,
        )
        # jitter pinned to 0 => reported jitter is 0 (no boundary clamping
        # for centered hands)
        assert float(jnp.abs(v1.params["jitter_x"]).max()) == 0.0
        assert float(jnp.abs(v2.params["jitter_y"]).max()) == 0.0

    def test_pair_views_differ(self, rng):
        img = jnp.asarray(rand_image(rng, 128, 128)[None])
        joints = jnp.asarray(rand_joints(rng, 128, 128))
        flags = make_flags(crop=True, rotate=True, resize=True)
        v1, v2 = augment_pair(
            jax.random.PRNGKey(0), img, joints, flags, AugmentationParams()
        )
        assert float(jnp.abs(v1.images - v2.images).max()) > 0.01
        assert v1.images.shape == (1, 128, 128, 3)


class TestColorOps:
    def test_grayscale_matches_cv2(self, rng):
        img = rand_image(rng).astype(np.float32)
        ref = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2GRAY)
        ours = np.asarray(im.grayscale(jnp.asarray(img[None])))[0, :, :, 0]
        assert np.abs(ours - ref).max() <= 1.0

    def test_hsv_matches_cv2(self, rng):
        img = rand_image(rng)
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
        h, s, v = im.rgb_to_hsv_cv2(jnp.asarray(img[None], jnp.float32))
        np.testing.assert_allclose(np.asarray(v)[0], ref[..., 2], atol=1.0)
        np.testing.assert_allclose(np.asarray(s)[0], ref[..., 1], atol=1.5)
        # hue is circular; compare modulo 180
        dh = np.abs(np.asarray(h)[0] - ref[..., 0]) % 180.0
        dh = np.minimum(dh, 180.0 - dh)
        assert np.percentile(dh, 99) <= 1.5

    def test_hsv_roundtrip(self, rng):
        img = jnp.asarray(rand_image(rng)[None], jnp.float32)
        h, s, v = im.rgb_to_hsv_cv2(img)
        back = im.hsv_to_rgb_cv2(h, s, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1.0)

    def test_color_jitter_matches_cv2_oracle(self, rng):
        img = rand_image(rng)
        hf, sf, af, bf = 0.7, 0.5, 0.8, 10.0
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hue, sat, val = cv2.split(hsv)
        hue = np.clip(hue * hf, 0, 255)
        sat = np.clip(sat * sf, 0, 255)
        val = np.clip(val * af + bf, 0, 255)
        ref = cv2.cvtColor(
            cv2.merge([hue, sat, val]).astype(np.uint8), cv2.COLOR_HSV2BGR
        ).astype(np.float32)
        ours = np.asarray(
            im.color_jitter(
                jnp.asarray(img[None], jnp.float32),
                jnp.full((1,), hf), jnp.full((1,), sf),
                jnp.full((1,), af), jnp.full((1,), bf),
            )
        )[0]
        assert np.percentile(np.abs(ours - ref), 95) <= 3.0

    def test_blur_matches_cv2(self, rng):
        img = rand_image(rng, 100, 100).astype(np.float32)
        sigma = 1.3
        k = int(100 * 0.1)
        k = k + 1 if k % 2 == 0 else k
        ref = cv2.GaussianBlur(img, (k, k), sigma)
        ours = np.asarray(
            im.gaussian_blur(jnp.asarray(img[None]), jnp.full((1,), sigma))
        )[0]
        assert np.abs(ours - ref).max() < 1.0

    def test_cutout_centers_box_on_joint(self, rng):
        img = jnp.ones((1, 64, 64, 3), jnp.float32) * 200.0
        center = jnp.asarray([[32.0, 32.0]])
        out = np.asarray(
            im.cutout(img, center, jnp.full((1,), 0.25), jnp.zeros((1,)))
        )[0]
        assert out[32, 32, 0] == 0.0
        assert out[5, 5, 0] == 200.0
