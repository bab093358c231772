"""Tests for the remaining inventory components: YT3DH source (condense +
validity scan + flip), pairwise relative params, denoiser head,
visualization figures, SimCLR (invariant) variant."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.config.defaults import AugmentationFlags, AugmentationParams


@pytest.fixture(scope="module")
def ytb_root(tmp_path_factory, ):
    """Miniature YT3DH layout: raw COCO-style json + frame jpgs."""
    rng = np.random.default_rng(0)
    root = str(tmp_path_factory.mktemp("ytb"))
    frames_dir = os.path.join(root, "youtube", "vid0", "video", "frames")
    os.makedirs(frames_dir, exist_ok=True)
    import cv2

    images, annotations = [], []
    for i in range(3):
        name = f"youtube/vid0/video/frames/{i:04d}.png"
        if i < 2:  # frame 2 intentionally missing -> validity scan filters it
            img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
            cv2.imwrite(
                os.path.join(root, name.replace(".png", ".jpg")), img
            )
        images.append({"id": 100 + i, "name": name, "width": 320, "height": 240})
        verts = rng.uniform(40, 200, size=(778, 3)).astype(float)
        annotations.append(
            {
                "id": i,
                "image_id": 100 + i,
                "is_left": 1 if i == 1 else 0,
                "vertices": verts.tolist(),
            }
        )
    with open(os.path.join(root, "youtube_train.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return root


class TestYoutubeSource:
    def test_condense_scan_and_records(self, ytb_root):
        from peclr_tpu.data.youtube import YoutubeSource

        src = YoutubeSource(ytb_root, "train")
        # caches written
        assert os.path.exists(os.path.join(ytb_root, "youtube_train_joints.json"))
        assert os.path.exists(
            os.path.join(ytb_root, "youtube_train_invalid_index.csv")
        )
        # frame 2 missing -> only 2 valid annotations
        assert len(src) == 2
        rec = src.record(0)
        assert rec["joints3d"].shape == (21, 3)
        np.testing.assert_allclose(rec["joints3d"][:, 2], 1.0)  # depth pinned
        np.testing.assert_array_equal(rec["K"], np.eye(3))
        assert rec["joints_valid"].sum() == 0  # pseudo labels only

    def test_left_hand_flip(self, ytb_root):
        from peclr_tpu.data.youtube import YoutubeSource

        src = YoutubeSource(ytb_root, "train")
        rec = src.record(1)  # annotation 1 is left
        assert rec["flip"]
        # x mirrored about the image width; raw keeps flipped coords too
        assert rec["joints3d"][:, 0].max() <= 320.0

    def test_second_init_uses_cache(self, ytb_root):
        from peclr_tpu.data.youtube import YoutubeSource

        src = YoutubeSource(ytb_root, "train")
        assert len(src) == 2


class TestRelativeParams:
    def test_relative_params(self):
        from peclr_tpu.ops.augment import relative_params

        p1 = {"jitter_x": jnp.asarray([2.0]), "jitter_y": jnp.asarray([1.0]),
              "h": jnp.asarray([0.5]), "s": jnp.asarray([0.6]),
              "a": jnp.asarray([0.7]), "b": jnp.asarray([10.0]),
              "blur_flag": jnp.asarray([1.0]), "angle": jnp.asarray([30.0])}
        p2 = {"jitter_x": jnp.asarray([5.0]), "jitter_y": jnp.asarray([4.0]),
              "h": jnp.asarray([0.1]), "s": jnp.asarray([0.2]),
              "a": jnp.asarray([0.9]), "b": jnp.asarray([5.0]),
              "blur_flag": jnp.asarray([0.0]), "angle": jnp.asarray([-40.0])}
        flags = AugmentationFlags(
            crop=True, color_jitter=True, gaussian_blur=True, rotate=True
        )
        rel = relative_params(p1, p2, flags)
        np.testing.assert_allclose(np.asarray(rel["jitter"])[0], [-3.0, -3.0])
        np.testing.assert_allclose(
            np.asarray(rel["color_jitter"])[0], [0.4, 0.4, -0.2, 5.0],
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(rel["blur"])[0], [1.0])
        np.testing.assert_allclose(np.asarray(rel["rotation"])[0], [70.0])


class TestDenoiser:
    def test_forward(self):
        from peclr_tpu.models.heads import Denoiser

        model = Denoiser()
        x = jnp.ones((4, 64))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (4, 1)


class TestVisualization:
    def test_figures_render(self, tmp_path, rng):
        matplotlib = pytest.importorskip("matplotlib")
        matplotlib.use("Agg")
        from peclr_tpu.utils.visualize import (
            plot_peclr_pair,
            plot_simclr_pair,
            plot_truth_vs_prediction,
        )

        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        joints = rng.uniform(5, 59, (21, 3)).astype(np.float32)
        p1 = plot_truth_vs_prediction(
            joints, joints + 1, img, out_dir=str(tmp_path)
        )
        p2 = plot_simclr_pair(img, img[::-1], out_dir=str(tmp_path))
        p3 = plot_peclr_pair(
            img, img,
            {"angle_1": np.asarray([10.0]), "angle_2": np.asarray([-5.0]),
             "jitter_x_1": np.asarray([2.0]), "jitter_y_1": np.asarray([3.0]),
             "jitter_x_2": np.asarray([0.0]), "jitter_y_2": np.asarray([1.0])},
            out_dir=str(tmp_path),
        )
        for p in (p1, p2, p3):
            assert p is not None and os.path.getsize(p) > 1000


class TestSimCLRVariant:
    def test_invariant_loss_path(self, rng):
        """augmentations=() reduces peclr_projections to plain SimCLR
        normalization."""
        from peclr_tpu.losses.equivariance import peclr_projections

        proj1 = rng.normal(size=(4, 128)).astype(np.float32)
        proj2 = rng.normal(size=(4, 128)).astype(np.float32)
        dummy = {"angle": jnp.zeros(4), "jitter_x": jnp.zeros(4),
                 "jitter_y": jnp.zeros(4)}
        z1, z2 = peclr_projections(
            jnp.asarray(proj1), jnp.asarray(proj2), dummy, dummy,
            augmentations=(),
        )
        np.testing.assert_allclose(
            np.asarray(z1),
            proj1 / np.linalg.norm(proj1, axis=1, keepdims=True),
            atol=1e-5,
        )
