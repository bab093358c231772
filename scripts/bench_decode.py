"""Host JPEG-decode throughput: native C++ pool vs cv2 (per-core rates)."""

import os
import tempfile
import time

import numpy as np

from peclr_tpu.data.freihand import FreihandSource
from peclr_tpu.data.synthetic import generate_freihand_like
from peclr_tpu.data import native_loader


def main():
    root = tempfile.mkdtemp()
    generate_freihand_like(root, num_unique=64, seed=0)
    src = FreihandSource(root, "train", train_ratio=0.99)
    paths = [src.image_path(i) for i in range(min(192, len(src)))]

    if native_loader.available():
        for threads in (1, 4, 8):
            t0 = time.perf_counter()
            out = native_loader.decode_batch_to_canvas(paths, 224, threads=threads)
            dt = time.perf_counter() - t0
            assert out is not None
            print(f"native decode ({threads} threads): "
                  f"{len(paths) / dt:7.0f} img/s")
    else:
        print("native loader not built (make -C native)")

    import cv2

    t0 = time.perf_counter()
    for p in paths:
        cv2.imread(p)
    dt = time.perf_counter() - t0
    print(f"cv2 single-thread:          {len(paths) / dt:7.0f} img/s")


if __name__ == "__main__":
    main()
