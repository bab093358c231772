"""Balanced multi-source sampling.

The reference balances multiple datasets with a WeightedRandomSampler whose
per-sample weight is 1/len(source) — i.e. each *source* is drawn with equal
probability and samples are uniform-with-replacement within a source
(data_loader/utils.py:239-267).  This module reproduces those semantics with
a seeded numpy generator; single-source mode is a plain shuffled epoch.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np


class BalancedSampler:
    """Infinite stream of (source_index, sample_index) draws."""

    def __init__(self, source_sizes: Sequence[int], seed: int = 0):
        assert all(s > 0 for s in source_sizes)
        self.sizes = list(source_sizes)
        self.rng = np.random.default_rng(seed)

    def draw(self, n: int) -> List[Tuple[int, int]]:
        src = self.rng.integers(0, len(self.sizes), size=n)
        out = []
        for s in src:
            out.append((int(s), int(self.rng.integers(0, self.sizes[s]))))
        return out

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        while True:
            yield from self.draw(1024)


class EpochSampler:
    """Shuffled single-source epoch order (val uses sequential order)."""

    def __init__(self, size: int, seed: int = 0, shuffle: bool = True):
        self.size = size
        self.seed = seed
        self.shuffle = shuffle

    def epoch(self, epoch_idx: int) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.size)
        rng = np.random.default_rng((self.seed, epoch_idx))
        return rng.permutation(self.size)
