"""Geometry-core tests: joint permutations, 2.5D<->3D round trip, closed-form
z-root, affine helpers, procrustes alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.geometry import (
    affine,
    camera,
    joints as J,
    procrustes,
)


def random_hand(rng, batch=()):
    """Plausible metric hand: ~8 cm spread, 40-60 cm from camera."""
    base = rng.uniform(-0.04, 0.04, size=batch + (21, 3)).astype(np.float32)
    base[..., 2] += rng.uniform(0.4, 0.6, size=batch + (1,)).astype(np.float32)[..., 0][..., None]
    return base


def fh_intrinsics(batch=()):
    K = np.array(
        [[388.9, 0.0, 112.0], [0.0, 388.7, 112.0], [0.0, 0.0, 1.0]], np.float32
    )
    return np.broadcast_to(K, batch + (3, 3)).copy()


class TestJoints:
    def test_permutation_roundtrip(self, rng):
        x = rng.normal(size=(21, 3)).astype(np.float32)
        back = J.ait_to_freihand(J.freihand_to_ait(x))
        np.testing.assert_array_equal(back, x)

    def test_named_correspondence(self):
        # freihand order: wrist, thumb mcp/pip/dip/tip, index mcp...
        fh = np.arange(21)[:, None].repeat(3, 1)
        ait = J.freihand_to_ait(fh)
        assert ait[J.JOINT_ORDERS["ait"]["wrist"], 0] == 0
        assert ait[J.JOINT_ORDERS["ait"]["thumb_tip"], 0] == 4
        assert ait[J.JOINT_ORDERS["ait"]["index_mcp"], 0] == 5
        assert ait[J.JOINT_ORDERS["ait"]["pinky_tip"], 0] == 20

    def test_all_orders_are_permutations(self):
        for name, order in J.JOINT_ORDERS.items():
            assert sorted(order.values()) == list(range(21)), name


class TestCamera:
    @pytest.mark.parametrize("batch", [(), (4,)])
    def test_25d_3d_roundtrip(self, rng, batch):
        j3d = random_hand(rng, batch)
        K = fh_intrinsics(batch)
        j25d, scale = camera.convert_to_2_5d(K, j3d)
        # relative depth of the wrist must be exactly 0
        np.testing.assert_allclose(np.asarray(j25d[..., J.WRIST, 2]), 0.0, atol=1e-7)
        j3d_rec = camera.convert_2_5d_to_3d(j25d, scale, K)
        np.testing.assert_allclose(np.asarray(j3d_rec), j3d, atol=2e-4)

    def test_root_depth_matches_truth(self, rng):
        j3d = random_hand(rng, (8,))
        K = fh_intrinsics((8,))
        j25d, scale = camera.convert_to_2_5d(K, j3d)
        z_root, _ = camera.root_depth(j25d, K)
        true_root = j3d[..., J.WRIST, 2] / np.asarray(scale)
        np.testing.assert_allclose(np.asarray(z_root), true_root, rtol=1e-3)

    def test_scale_is_bone_length(self, rng):
        j3d = random_hand(rng)
        _, scale = camera.convert_to_2_5d(fh_intrinsics(), j3d)
        expected = np.linalg.norm(j3d[J.INDEX_MCP] - j3d[J.WRIST])
        np.testing.assert_allclose(float(scale), expected, rtol=1e-5)

    def test_palm_wrist_roundtrip(self, rng):
        j3d = jnp.asarray(random_hand(rng, (2,)))
        palm = camera.move_wrist_to_palm(j3d)
        # palm = (wrist + index_mcp)/2; reference inverse uses middle_mcp, so
        # check the palm definition directly
        np.testing.assert_allclose(
            np.asarray(palm[..., J.WRIST, :]),
            np.asarray((j3d[..., 0, :] + j3d[..., 2, :]) / 2),
            atol=1e-6,
        )


class TestAffine:
    def test_rotation_matches_cv2_convention(self):
        cv2 = pytest.importorskip("cv2")
        angle, cx, cy = 33.0, 50.0, 70.0
        ours = np.asarray(affine.rotation_about_center(angle, cx, cy))
        ref = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
        np.testing.assert_allclose(ours[:2], ref, atol=1e-5)

    def test_compose_and_apply(self, rng):
        pts = rng.normal(size=(5, 2)).astype(np.float32) * 10
        A = affine.rotation_about_center(45.0, 0.0, 0.0)
        B = affine.translation(3.0, -2.0)
        AB = affine.compose(A, B)  # apply A then B
        out1 = affine.apply_affine(AB, pts)
        out2 = affine.apply_affine(B, affine.apply_affine(A, pts))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)

    def test_invert(self, rng):
        A = affine.compose(
            affine.rotation_about_center(20.0, 5.0, 5.0), affine.scaling(2.0, 2.0)
        )
        pts = rng.normal(size=(7, 2)).astype(np.float32)
        back = affine.apply_affine(
            affine.invert_affine(A), affine.apply_affine(A, pts)
        )
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)

    def test_affine_from_bbox_centers(self):
        bbox = np.array([10.0, 20.0, 110.0, 120.0], np.float32)
        T = affine.affine_from_bbox(bbox, 224, target_dist=0.7)
        center = affine.apply_affine(T, np.array([[60.0, 70.0]], np.float32))
        np.testing.assert_allclose(np.asarray(center)[0], [112.0, 112.0], atol=1e-4)
        corner = affine.apply_affine(T, np.array([[10.0, 20.0]], np.float32))
        # box occupies 0.7 of the crop: corner at center - 0.7*224/2
        np.testing.assert_allclose(
            np.asarray(corner)[0], [112 - 78.4, 112 - 78.4], atol=1e-3
        )


class TestProcrustes:
    def test_recovers_similarity_transform(self, rng):
        X = rng.normal(size=(3, 21, 3)).astype(np.float32)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3, 3)))
        det = np.linalg.det(q)
        q[:, :, 0] *= det[:, None]  # make proper rotations
        scale = rng.uniform(0.5, 2.0, size=(3, 1, 1)).astype(np.float32)
        t = rng.normal(size=(3, 1, 3)).astype(np.float32)
        Y = scale * np.einsum("bni,bij->bnj", X, q) + t
        Y_aligned, _, _, _ = procrustes.procrustes_align(
            jnp.asarray(X), jnp.asarray(Y)
        )
        np.testing.assert_allclose(np.asarray(Y_aligned), X, atol=1e-3)
