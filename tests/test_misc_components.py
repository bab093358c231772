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


class TestLeftHandPipelineFlip:
    """The pipeline must mirror left-hand IMAGES, not just their joints
    (youtube_loader.py:151-155) — round-1 bug: crops landed on the wrong
    side of the frame for every left-hand YT3DH sample."""

    @pytest.fixture(scope="class")
    def lefty_root(self, tmp_path_factory):
        """One valid left-hand frame: black 240x320 with a white 'hand'
        blob at x~[60,100], joints (from a tight vertex cluster) on it."""
        root = str(tmp_path_factory.mktemp("ytb_left"))
        frames_dir = os.path.join(root, "youtube", "vidL", "video", "frames")
        os.makedirs(frames_dir, exist_ok=True)
        import cv2

        name = "youtube/vidL/video/frames/0000.png"
        img = np.zeros((240, 320, 3), np.uint8)
        img[100:140, 60:100] = 255
        cv2.imwrite(os.path.join(root, name.replace(".png", ".jpg")), img)
        rng = np.random.default_rng(3)
        verts = np.stack(
            [rng.uniform(70, 90, 778), rng.uniform(110, 130, 778),
             np.full(778, 7.0)], axis=1,
        )
        meta = {
            "images": [{"id": 7, "name": name, "width": 320, "height": 240}],
            "annotations": [
                {"id": 0, "image_id": 7, "is_left": 1,
                 "vertices": verts.tolist()}
            ],
        }
        with open(os.path.join(root, "youtube_train.json"), "w") as f:
            json.dump(meta, f)
        return root

    def test_crop_lands_on_the_hand(self, lefty_root):
        from peclr_tpu.data.pipeline import HostPipeline
        from peclr_tpu.data.youtube import YoutubeSource

        pipe = HostPipeline(
            [YoutubeSource(lefty_root, "train")], batch_size=1,
            canvas=224, shuffle=False,
        )
        batch = next(pipe.batches(1))
        img = batch["image"][0].astype(np.float32)
        # joints were mirrored to x~240; if the image were NOT mirrored the
        # crop would frame empty black pixels.  With the fix, the crop is
        # centered on the (mirrored) blob.
        c = img[92:132, 92:132].mean()
        border = np.concatenate(
            [img[:8].ravel(), img[-8:].ravel()]
        ).mean()
        assert c > 120.0, f"crop center is dark ({c:.1f}): image not flipped"
        assert border < 40.0, f"crop border unexpectedly bright ({border:.1f})"
        # joints25d sit near the canvas center, on the blob
        assert np.all(np.abs(batch["joints25d"][0, :, :2] - 112.0) < 60.0)

    def test_joints_raw_propagates(self, lefty_root):
        """joints_raw must reach the batch in original-frame (mirrored)
        coordinates with true depth — not the depth-pinned crop joints
        (evaluation_utils.py:354-382 consumes it for procrustes)."""
        from peclr_tpu.data.pipeline import HostPipeline
        from peclr_tpu.data.youtube import YoutubeSource

        pipe = HostPipeline(
            [YoutubeSource(lefty_root, "train")], batch_size=1,
            canvas=224, shuffle=False,
        )
        batch = next(pipe.batches(1))
        raw = batch["joints_raw"][0]
        assert raw.shape == (21, 3)
        # x mirrored about width=320: cluster at ~80 -> ~240
        assert 220.0 < raw[:, 0].mean() < 260.0
        # true depth preserved (joints3d is pinned to 1.0 for the crop path)
        np.testing.assert_allclose(raw[:, 2], 7.0, atol=1e-4)
        np.testing.assert_allclose(batch["joints3d"][0][:, 2], 1.0)

    def test_native_batch_path_flips(self, lefty_root, tmp_path):
        """The C++ canvas-native fast path must apply the same mirror."""
        from peclr_tpu.data import native_loader
        from peclr_tpu.data.pipeline import HostPipeline

        if not native_loader.available():
            pytest.skip("native loader not built")
        import cv2

        img = np.zeros((224, 224, 3), np.uint8)
        img[92:132, 40:80] = 255  # blob left of center
        path = os.path.join(str(tmp_path), "f.jpg")
        cv2.imwrite(path, img)

        class CanvasSource:
            image_size = (224, 224)

            def __len__(self):
                return 2

            def image_path(self, i):
                return path

            def record(self, i):
                j = np.zeros((21, 3), np.float32)
                j[:, 0] = np.linspace(100.0, 124.0, 21)
                j[:, 1], j[:, 2] = 112.0, 1.0
                return {
                    "K": np.eye(3, dtype=np.float32),
                    "joints3d": j,
                    "joints_valid": np.zeros((21, 1), np.float32),
                    "joints_raw": j,
                    "flip": bool(i == 1),
                }

        pipe = HostPipeline([CanvasSource()], batch_size=2, canvas=224,
                            shuffle=False)
        batch = next(pipe.batches(1))
        assert "joints_raw" in batch
        unflipped, flipped = batch["image"][0], batch["image"][1]
        assert unflipped[92:132, 40:80].mean() > 150.0
        assert flipped[92:132, 144:184].mean() > 150.0  # mirrored blob
        assert flipped[92:132, 40:80].mean() < 50.0
