"""Multi-source pipeline test: FreiHAND + YT3DH mixed with balanced
sampling and canvas standardization of variable-size frames."""

import json
import os

import numpy as np
import pytest

from peclr_tpu.data.freihand import FreihandSource
from peclr_tpu.data.pipeline import HostPipeline
from peclr_tpu.data.synthetic import generate_freihand_like
from peclr_tpu.data.youtube import YoutubeSource


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    fh = str(tmp_path_factory.mktemp("fh"))
    generate_freihand_like(fh, num_unique=8, seed=0)

    yt = str(tmp_path_factory.mktemp("yt"))
    rng = np.random.default_rng(1)
    frames = os.path.join(yt, "youtube", "v", "video", "frames")
    os.makedirs(frames)
    import cv2

    images, annotations = [], []
    for i in range(4):
        name = f"youtube/v/video/frames/{i:04d}.png"
        # variable frame sizes to exercise canvas standardization
        h, w = 360 + 40 * i, 640
        cv2.imwrite(
            os.path.join(yt, name.replace(".png", ".jpg")),
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        )
        images.append({"id": i, "name": name, "width": w, "height": h})
        verts = rng.uniform(100, 400, size=(778, 3))
        annotations.append(
            {"id": i, "image_id": i, "is_left": 0, "vertices": verts.tolist()}
        )
    with open(os.path.join(yt, "youtube_train.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return fh, yt


def test_mixed_pipeline(roots):
    fh_root, yt_root = roots
    fh = FreihandSource(fh_root, "train", train_ratio=0.75)
    yt = YoutubeSource(yt_root, "train")
    pipe = HostPipeline([fh, yt], batch_size=16, canvas=224, seed=3,
                        num_threads=2)
    assert pipe.balanced
    batch = next(pipe.batches(1))
    assert batch["image"].shape == (16, 224, 224, 3)
    assert batch["joints25d"].shape == (16, 21, 3)
    # both sources present (joints_valid=1 for freihand, 0 for youtube)
    valid_sums = batch["joints_valid"].sum(axis=(1, 2))
    assert (valid_sums == 21).any() and (valid_sums == 0).any()
    # joints of YT samples were remapped onto the canvas
    assert np.isfinite(batch["joints25d"]).all()
