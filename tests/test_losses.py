"""Loss tests: NT-Xent against a naive O(N^2) oracle, sharded==unsharded
global-batch semantics, equivariant transform properties, supervised losses."""

import jax
import jax.numpy as jnp
import numpy as np


from peclr_tpu.losses import (
    epe_metrics,
    l1_loss_25d,
    loss_3d,
    ntxent_loss,
    peclr_projections,
    rotate_projections,
    translate_projections,
)


def naive_ntxent(z1, z2, temperature=0.5):
    """Direct transcription of the published NT-Xent formula with explicit
    python loops — the independent oracle."""
    z = np.concatenate([z1, z2], axis=0)
    n = len(z)
    losses = []
    for i in range(n):
        j = (i + len(z1)) % n  # positive partner
        pos = np.exp(np.dot(z[i], z[j]) / temperature)
        neg = sum(
            np.exp(np.dot(z[i], z[k]) / temperature) for k in range(n) if k != i
        )
        losses.append(-np.log(pos / neg))
    return np.mean(losses)


def normalized(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestNTXent:
    def test_matches_naive_oracle(self, rng):
        z1 = normalized(rng, (6, 16))
        z2 = normalized(rng, (6, 16))
        ours = float(ntxent_loss(jnp.asarray(z1), jnp.asarray(z2)))
        ref = naive_ntxent(z1, z2)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_identical_views_minimize(self, rng):
        z = normalized(rng, (8, 16))
        same = float(ntxent_loss(jnp.asarray(z), jnp.asarray(z)))
        diff = float(ntxent_loss(jnp.asarray(z), jnp.asarray(normalized(rng, (8, 16)))))
        assert same < diff

    def test_sharded_equals_single_device(self, rng, mesh8):
        """Batch-sharded NT-Xent must equal the single-device global-batch
        computation — the negatives span the global batch."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        z1 = normalized(rng, (16, 32))
        z2 = normalized(rng, (16, 32))
        expected = float(ntxent_loss(jnp.asarray(z1), jnp.asarray(z2)))

        sharding = NamedSharding(mesh8, P("data"))
        z1_s = jax.device_put(jnp.asarray(z1), sharding)
        z2_s = jax.device_put(jnp.asarray(z2), sharding)
        got = float(jax.jit(ntxent_loss)(z1_s, z2_s))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestEquivariance:
    def test_rotation_matches_reference_formula(self, rng):
        """Oracle: rotate about the detached centroid with the OpenCV matrix
        built explicitly in numpy."""
        pts = rng.normal(size=(3, 64, 2)).astype(np.float32)
        angles = np.array([10.0, -33.0, 90.0], np.float32)
        ours = np.asarray(rotate_projections(jnp.asarray(pts), jnp.asarray(angles)))
        for b in range(3):
            c = pts[b].mean(0)
            rad = np.deg2rad(angles[b])
            al, be = np.cos(rad), np.sin(rad)
            M = np.array(
                [
                    [al, be, (1 - al) * c[0] - be * c[1]],
                    [-be, al, be * c[0] + (1 - al) * c[1]],
                ]
            )
            hom = np.concatenate([pts[b], np.ones((64, 1))], axis=1)
            np.testing.assert_allclose(ours[b], hom @ M.T, atol=1e-4)

    def test_rotation_inverse_property(self, rng):
        pts = rng.normal(size=(2, 64, 2)).astype(np.float32)
        angles = jnp.asarray(np.array([25.0, -70.0], np.float32))
        fwd = rotate_projections(jnp.asarray(pts), angles)
        back = rotate_projections(fwd, -angles)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_translation_extent_scaling(self, rng):
        pts = rng.normal(size=(2, 64, 2)).astype(np.float32)
        tx = jnp.asarray(np.array([0.5, -0.25], np.float32))
        ty = jnp.asarray(np.array([0.0, 1.0], np.float32))
        out = np.asarray(translate_projections(jnp.asarray(pts), tx, ty))
        for b in range(2):
            ext = pts[b].max(0) - pts[b].min(0)
            np.testing.assert_allclose(
                out[b, :, 0], pts[b, :, 0] + float(tx[b]) * ext[0], atol=1e-5
            )
            np.testing.assert_allclose(
                out[b, :, 1], pts[b, :, 1] + float(ty[b]) * ext[1], atol=1e-5
            )

    def test_peclr_equivariance_recovers_alignment(self, rng):
        """If view 2's projection is view 1's rotated by the recorded angle,
        the inverse transform must align them (zero-centroid clouds so flat
        normalization commutes with rotation)."""
        pts = rng.normal(size=(4, 64, 2)).astype(np.float32)
        pts -= pts.mean(axis=1, keepdims=True)
        angles = np.array([15.0, -40.0, 5.0, 80.0], np.float32)
        rot = np.asarray(rotate_projections(jnp.asarray(pts), jnp.asarray(angles)))

        proj1 = pts.reshape(4, -1)
        proj2 = rot.reshape(4, -1)
        zeros = np.zeros(4, np.float32)
        z1, z2 = peclr_projections(
            jnp.asarray(proj1),
            jnp.asarray(proj2),
            {"angle": jnp.asarray(zeros), "jitter_x": jnp.asarray(zeros),
             "jitter_y": jnp.asarray(zeros)},
            {"angle": jnp.asarray(angles), "jitter_x": jnp.asarray(zeros),
             "jitter_y": jnp.asarray(zeros)},
            augmentations=("crop", "rotate"),
        )
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)
        # and without the inverse transform they would NOT align
        z1_no, z2_no = peclr_projections(
            jnp.asarray(proj1), jnp.asarray(proj2),
            {"angle": jnp.asarray(zeros), "jitter_x": jnp.asarray(zeros),
             "jitter_y": jnp.asarray(zeros)},
            {"angle": jnp.asarray(zeros), "jitter_x": jnp.asarray(zeros),
             "jitter_y": jnp.asarray(zeros)},
            augmentations=(),
        )
        assert np.abs(np.asarray(z1_no) - np.asarray(z2_no)).max() > 1e-2


class TestSupervised:
    def test_zero_error(self, rng):
        j = jnp.asarray(rng.normal(size=(2, 21, 3)).astype(np.float32))
        l2d, lz, lzu = l1_loss_25d(j, j, jnp.ones(2))
        assert float(l2d) == 0.0 and float(lz) == 0.0 and float(lzu) == 0.0

    def test_weighting_and_separation(self, rng):
        true = jnp.zeros((1, 21, 3))
        pred = jnp.ones((1, 21, 3))
        valid = jnp.ones((1, 21, 1))
        l2d, lz, lzu = l1_loss_25d(pred, true, jnp.full((1,), 2.0), valid)
        # per-joint weight 1/21; uv: sum(2*1/21)/2 = 1; z: sum(1/21) = 1
        np.testing.assert_allclose(float(l2d), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(lz), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(lzu), 2.0, rtol=1e-6)

    def test_loss_3d_zero_for_perfect_prediction(self, rng):
        from peclr_tpu.geometry.camera import convert_to_2_5d

        j3d = rng.uniform(-0.04, 0.04, size=(2, 21, 3)).astype(np.float32)
        j3d[..., 2] += 0.5
        K = np.broadcast_to(
            np.array([[388.9, 0, 112], [0, 388.7, 112], [0, 0, 1]], np.float32),
            (2, 3, 3),
        )
        j25d, scale = convert_to_2_5d(jnp.asarray(K), jnp.asarray(j3d))
        loss = loss_3d(j25d, jnp.asarray(j3d), scale, jnp.asarray(K))
        assert float(loss) < 1e-4

    def test_epe_metrics(self, rng):
        a = jnp.zeros((2, 21, 3))
        b = jnp.ones((2, 21, 3))
        m = epe_metrics(a, b, prefix="val")
        np.testing.assert_allclose(float(m["EPE_mean_val"]), np.sqrt(3.0), rtol=1e-6)
