"""Input pipeline: threaded host decode -> fixed-shape NHWC batches -> device.

The reference feeds training through torch DataLoader worker *processes*
(3 workers, ``train_multiclass.py:374-376``).  The TPU-native shape of the
same capability:

* host threads decode/rasterize with cv2 (which releases the GIL) into a
  bounded prefetch queue — no process forks, no tensor pickling,
* batches are dense float32 NHWC with static shapes; all raggedness was
  removed at index-build time (see :mod:`.loaders`),
* the *augmentation* lives on device (:mod:`.augment`), so the host only
  decodes and stacks,
* batches whose size would be 1 are dropped — the reference instead asserts
  ``batch > 1`` mid-epoch (``train_multiclass.py:131``); with globally-synced
  BatchNorm under GSPMD the real constraint is per-*global*-batch, which
  drop-last-1 preserves,
* an optional ``device_put`` double-buffer overlaps H2D with compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import numpy as np


class Batcher:
    """Shuffling, prefetching batch iterator over an indexable dataset.

    ``dataset[i]`` must return ``(image_HWC, mask_HWC, path)``.  Yields dicts
    ``{"image": (B,H,W,3) f32, "label": (B,H,W,C) f32, "paths": list[str]}``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last_if_single: bool = True,
        num_threads: int = 4,
        prefetch: int = 2,
        pad_final: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last_if_single = drop_last_if_single
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.epoch = 0
        # pad_final: wrap-around-pad the last batch to the full batch size so
        # every batch has a static, data-axis-divisible shape (required when
        # sharding the batch over a mesh; also avoids a recompile for the
        # ragged tail).  Train loaders enable this; eval loaders keep exact
        # sample counts.
        self.pad_final = pad_final

    def __len__(self) -> int:
        n = len(self.dataset)
        nb, rem = divmod(n, self.batch_size)
        if rem == 1 and self.drop_last_if_single and self.batch_size > 1 and not self.pad_final:
            return nb
        return nb + (1 if rem else 0)

    def _index_batches(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # Seeded per-epoch shuffle (determinism toggle: SURVEY.md §5 race
            # detection row — seeded RNG replaces the reference's
            # worker_init_fn decorrelation).
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        batches = [
            order[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.pad_final and batches and len(batches[-1]) < self.batch_size:
            short = batches[-1]
            fill = order[: self.batch_size - len(short)]
            if len(short) + len(fill) == self.batch_size:
                batches[-1] = np.concatenate([short, fill])
            else:  # dataset smaller than one batch: tile
                reps = int(np.ceil(self.batch_size / n))
                batches[-1] = np.tile(order, reps)[: self.batch_size]
        if (
            batches
            and len(batches[-1]) == 1
            and self.drop_last_if_single
            and self.batch_size > 1
        ):
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self.epoch += 1
        if not batches:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        n = len(self.dataset)
        seen = 0

        def produce():
            nonlocal seen
            with ThreadPoolExecutor(self.num_threads) as pool:
                for idxs in batches:
                    if stop.is_set():
                        break
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    images = np.stack([s[0] for s in samples]).astype(np.float32)
                    labels = np.stack([s[1] for s in samples]).astype(np.float32)
                    paths = [s[2] for s in samples]
                    # n_real: distinct (non-wrap-padded) samples in this batch
                    # — metrics count these, so a padded final batch does not
                    # inflate images/sec or epoch sample counts.
                    n_real = min(len(idxs), n - seen)
                    seen += n_real
                    q.put({"image": images, "label": labels, "paths": paths,
                           "n_real": n_real})
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            t.join(timeout=5)


def device_prefetch(iterator: Iterator[dict], sharding=None) -> Iterator[dict]:
    """Overlap host->device transfer with compute: keep one batch in flight.

    ``sharding`` (e.g. a batch-axis NamedSharding) places each batch directly
    into its data-parallel layout, so per-replica host slices ship straight
    over PCIe without a gather.
    """

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if sharding is not None:
            arrays = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        return {**arrays, **rest}

    pending = None
    for batch in iterator:
        nxt = put(batch)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending
