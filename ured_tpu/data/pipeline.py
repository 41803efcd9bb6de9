"""Host input pipeline (Grain) feeding the jitted train step.

The reference used torch DataLoader workers doing per-sample numpy occlusion
plus per-step pickle reads (``engine/train.py:169-176`` + the ``get_labels``
I/O, SURVEY.md §3.1).  Here the host pipeline only gathers fixed-shape
arrays (points / labels / pseudo-labeled source tensors); occlusion and
rotation run on device (``data.occlusion``).  Uses Google Grain when
available, with a plain python fallback that has the same interface.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class _Source:
    """Random-access record source over a dataset (optionally + source DB).

    ``dataset`` is anything with ``__len__`` and ``make_batch(idx[, db])`` —
    a ``PartNetDataset`` (pass its ``SourceDB``) or a ``data.corpus.Corpus``
    / ``SyntheticData``-shaped object that gathers sources itself.
    """

    def __init__(self, dataset, source_db=None, light: bool = False):
        self.dataset = dataset
        self.source_db = source_db
        self.light = light

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        idx = np.asarray([i])
        if self.light:
            batch = self.dataset.make_light_batch(idx)
        elif self.source_db is not None:
            batch = self.dataset.make_batch(idx, self.source_db)
        else:
            batch = self.dataset.make_batch(idx)
        return {k: v[0] for k, v in batch.items()}


def make_input_pipeline(dataset, source_db, batch_size: int,
                        seed: int = 0, shuffle: bool = True,
                        num_epochs: Optional[int] = None,
                        worker_count: int = 0,
                        light: bool = False
                        ) -> Iterator[Dict[str, np.ndarray]]:
    """Batched iterator over (target, pseudo-labeled source) records.

    Grain path: MapDataset source -> shuffle -> batch -> (optional workers).
    Fallback: in-process numpy batching with identical semantics.
    """
    src = _Source(dataset, source_db, light=light)
    try:
        import grain.python as grain

        ds = grain.MapDataset.source(src)
        if shuffle:
            ds = ds.shuffle(seed=seed)
        if num_epochs is not None and num_epochs > 1:
            ds = ds.repeat(num_epochs)
        ds = ds.batch(batch_size, drop_remainder=True)
        it = ds.to_iter_dataset()
        if worker_count:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=worker_count))
        return iter(it)
    except ImportError:
        def gen():
            rng = np.random.default_rng(seed)
            epochs = num_epochs or 1
            for _ in range(epochs):
                order = rng.permutation(len(src)) if shuffle \
                    else np.arange(len(src))
                for i in range(0, len(order) - batch_size + 1, batch_size):
                    idx = order[i:i + batch_size]
                    recs = [src[j] for j in idx]
                    yield {k: np.stack([r[k] for r in recs])
                           for k in recs[0]}
        return gen()
