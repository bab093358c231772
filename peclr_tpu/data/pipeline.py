"""Host-side input pipeline: decode -> canvas-standardize -> batch ->
prefetch to device.

The reference's hot loop is per-sample Python/OpenCV inside DataLoader worker
processes (SURVEY §3.2) — the throughput bottleneck.  Here the host only
decodes JPEGs (threaded; a C++ decoder backs this when built — see native/)
and standardizes each frame onto a fixed uint8 canvas; ALL augmentation math
runs batched on device (ops/augment.py).  Batches are double-buffered onto
the device so decode overlaps the train step.

Canvas standardization: frames whose size differs from the canvas (YT3DH)
are cropped around the hand (side = 3.2x the max keypoint radius, clamped to
the frame) and resized; joints and K are updated by the same affine
(K' = T @ K, the reference's supervised-path convention, data_set.py:305).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from peclr_tpu.data.sampler import BalancedSampler, EpochSampler


def decode_image(path: str) -> np.ndarray:
    """JPEG -> RGB uint8 (native decoder if built, else cv2/PIL)."""
    from peclr_tpu.data import native_loader

    if native_loader.available():
        img = native_loader.decode(path)
        if img is not None:
            return img
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            # cv2.imread signals missing/corrupt files by returning None
            raise FileNotFoundError(
                f"could not decode image {path!r} (missing or corrupt file)"
            )
        return img[:, :, ::-1].copy()  # BGR -> RGB
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def project_to_25d_np(K: np.ndarray, joints3d: np.ndarray):
    """Host-side numpy twin of geometry.camera.convert_to_2_5d."""
    scale = np.linalg.norm(joints3d[2] - joints3d[0])
    uvw = (K @ joints3d.T).T / joints3d[:, 2:3]
    z_rel = (joints3d[:, 2] - joints3d[0, 2]) / scale
    out = np.concatenate([uvw[:, :2], z_rel[:, None]], axis=1)
    return out.astype(np.float32), np.float32(scale)


def standardize_canvas(
    img: np.ndarray, joints25d: np.ndarray, K: np.ndarray, canvas: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit a frame onto a (canvas, canvas) uint8 image, updating joints and
    K by the applied affine."""
    h, w = img.shape[:2]
    if h == canvas and w == canvas:
        return img, joints25d, K
    import cv2

    cx, cy = joints25d[:, 0].mean(), joints25d[:, 1].mean()
    rad = np.sqrt(
        ((joints25d[:, 0] - cx) ** 2 + (joints25d[:, 1] - cy) ** 2)
    ).max()
    side = float(np.clip(3.2 * rad, canvas / 4, min(h, w)))
    ox = float(np.clip(cx - side / 2, 0, max(w - side, 0)))
    oy = float(np.clip(cy - side / 2, 0, max(h - side, 0)))
    s = canvas / side
    T = np.array([[s, 0, -ox * s], [0, s, -oy * s], [0, 0, 1]], np.float32)
    out = cv2.warpAffine(img, T[:2], (canvas, canvas), flags=cv2.INTER_AREA)
    j = joints25d.copy()
    j[:, 0] = joints25d[:, 0] * s - ox * s
    j[:, 1] = joints25d[:, 1] * s - oy * s
    return out, j, (T @ K).astype(np.float32)


class HostPipeline:
    """Assembles fixed-shape numpy batches from one or more sources.

    sources: list of objects exposing __len__, image_path(i), record(i)
    (data/freihand.py, data/youtube.py).  Batches contain:
      images (B, canvas, canvas, 3) uint8, joints25d (B, 21, 3),
      K (B, 3, 3), scale (B,), joints_valid (B, 21, 1), joints3d (B, 21, 3),
      joints_raw (B, 21, 3) original-frame coords for procrustes,
      metric_scale (B,)
    """

    def __init__(
        self,
        sources: Sequence,
        batch_size: int,
        canvas: int = 224,
        seed: int = 5,
        num_threads: int = 8,
        balanced: Optional[bool] = None,
        shuffle: bool = True,
    ):
        self.sources = list(sources)
        self.batch_size = batch_size
        self.canvas = canvas
        self.num_threads = num_threads
        if balanced is None:
            balanced = len(self.sources) > 1
        self.balanced = balanced
        self.shuffle = shuffle
        self.seed = seed
        if balanced:
            self.sampler = BalancedSampler([len(s) for s in self.sources], seed)
        else:
            self.sampler = EpochSampler(len(self.sources[0]), seed, shuffle)

    def __len__(self):
        return sum(len(s) for s in self.sources)

    def steps_per_epoch(self) -> int:
        return len(self) // self.batch_size

    @staticmethod
    def _labels_from_record(rec) -> Dict[str, np.ndarray]:
        """The label fields every batch carries, derived once from a source
        record — shared by the threaded path and the native fast path so a
        new field cannot be added to only one of them (the round-1
        left-hand-flip bug came from exactly that divergence)."""
        j25d, scale = project_to_25d_np(rec["K"], rec["joints3d"])
        return {
            "joints25d": j25d,
            "K": rec["K"],
            "scale": scale,
            "joints_valid": rec["joints_valid"],
            "joints3d": rec["joints3d"],
            # Original-frame coordinates for procrustes eval
            # (evaluation_utils.py:354-382); never canvas-transformed.
            "joints_raw": rec.get("joints_raw", rec["joints3d"]),
            "metric_scale": rec.get("metric_scale", np.float32(1.0)),
        }

    def _load_one(self, src_id: int, idx: int) -> Dict[str, np.ndarray]:
        source = self.sources[src_id]
        rec = source.record(idx)
        img = decode_image(source.image_path(idx))
        if rec.get("flip"):
            # Left hands are mirrored to right (image AND joints; the
            # source already mirrored the joints — youtube_loader.py:151-155).
            img = img[:, ::-1]
        labels = self._labels_from_record(rec)
        img, j25d, K = standardize_canvas(
            img, labels["joints25d"], rec["K"], self.canvas
        )
        labels.update({"joints25d": j25d, "K": K})
        return {"image": np.ascontiguousarray(img), **labels}

    def _collate(self, samples: List[Dict[str, np.ndarray]]):
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0].keys()
        }

    def _native_batch(self, chunk) -> Optional[dict]:
        """Fast path: decode the whole batch straight into the canvas buffer
        with the C++ pool (canvas-native sources only, e.g. FreiHAND 224)."""
        from peclr_tpu.data import native_loader

        if not native_loader.available():
            return None
        paths = [self.sources[s].image_path(i) for s, i in chunk]
        images = native_loader.decode_batch_to_canvas(
            paths, self.canvas, threads=self.num_threads
        )
        if images is None:
            return None
        out = {"image": images}
        labels = []
        for n, (s, i) in enumerate(chunk):
            rec = self.sources[s].record(i)
            if rec.get("flip"):
                # canvas-native sources: frame == canvas, so the mirror can
                # be applied post-decode in place
                images[n] = images[n, :, ::-1]
            labels.append(self._labels_from_record(rec))
        out.update({k: np.stack([l[k] for l in labels]) for k in labels[0]})
        return out

    def _canvas_native(self) -> bool:
        """True when every source serves canvas-sized frames (no per-frame
        standardization needed) — FreiHAND's 224x224 layout."""
        for src in self.sources:
            probe = getattr(src, "image_size", None)
            if probe != (self.canvas, self.canvas):
                return False
        return True

    def batches(self, num_batches: int, epoch: int = 0) -> Iterator[dict]:
        """Yield `num_batches` batches (threaded decode; the C++ pool decodes
        whole batches directly into the canvas when sources are
        canvas-native)."""
        from concurrent.futures import ThreadPoolExecutor

        if self.balanced:
            draws = self.sampler.draw(num_batches * self.batch_size)
        else:
            order = self.sampler.epoch(epoch)
            reps = int(np.ceil(num_batches * self.batch_size / len(order)))
            order = np.tile(order, max(reps, 1))[: num_batches * self.batch_size]
            draws = [(0, int(i)) for i in order]

        use_native = self._canvas_native()
        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            for b in range(num_batches):
                chunk = draws[b * self.batch_size: (b + 1) * self.batch_size]
                if use_native:
                    batch = self._native_batch(chunk)
                    if batch is not None:
                        yield batch
                        continue
                samples = list(pool.map(lambda d: self._load_one(*d), chunk))
                yield self._collate(samples)


def _make_put_fn(mesh=None):
    """Build the host->device put strategy for device_prefetch.

    Default: one device_put per tree leaf.  PECLR_PUT_CHUNKS=N splits every
    array along axis 0 into N per-chunk puts, and PECLR_PUT_THREADS=M>1
    issues them from a thread pool.  Whether threading helps is a property
    of the host->device LINK, not of the pipeline: on this rig's tunnel a
    healthy link serializes RPCs (threads lose 0.74x) while a degraded link
    pipelines per-chunk RPCs (8 threads win 1.46x) — both regimes measured
    in bench_artifacts/transfer_overlap.json.  A PCIe-attached host DMAs
    and needs neither; the knobs default off.
    """
    import os

    import jax

    if mesh is not None:
        from peclr_tpu.parallel.multihost import global_batch_from_host_local

        return lambda tree: global_batch_from_host_local(mesh, tree)

    chunks = int(os.environ.get("PECLR_PUT_CHUNKS", "0"))
    threads = int(os.environ.get("PECLR_PUT_THREADS", "1"))
    if chunks <= 1:
        return lambda tree: jax.tree_util.tree_map(jax.device_put, tree)

    import jax.numpy as jnp

    # one pool for the put fn's lifetime (ADVICE r4: per-leaf pool
    # construction/teardown sat on the prefetch hot path); idle workers are
    # reaped by concurrent.futures' interpreter-exit hook
    pool = None
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(threads)

    def put_leaf(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] < chunks:
            return jax.device_put(x)
        parts = np.array_split(x, chunks, axis=0)
        if pool is not None:
            moved = list(pool.map(jax.device_put, parts))
        else:
            moved = [jax.device_put(p) for p in parts]
        return jnp.concatenate(moved, axis=0)

    return lambda tree: jax.tree_util.tree_map(put_leaf, tree)


def device_prefetch(batch_iter, mesh=None, buffer_size: int = 2):
    """Move host batches to device ahead of consumption (double-buffered).

    With a mesh, batches route through parallel/multihost.py: each process
    contributes its host-local rows and the assembled jax.Array is globally
    batch-sharded over the mesh's data axis (a plain sharded device_put at
    process_count()==1, `make_array_from_process_local_data` on pods).
    Single-device put strategy (chunking/threading) is env-tunable — see
    _make_put_fn.
    """
    put = _make_put_fn(mesh)

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in batch_iter:
                q.put(put(batch))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
