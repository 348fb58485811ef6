"""Host-side batching and device prefetch.

Replaces the reference's torch ``DataLoader(num_workers=8)``
(/root/reference/main.py:226-227) with a thread-pooled batch assembler
(HDF5 reads release the GIL) plus a small device-prefetch ring that overlaps
host->device transfer with TPU compute. Batches are dicts of stacked numpy
arrays with the reference's key contract; images stay uint8 until the
on-device preprocessing stage.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Iterator, Optional

import numpy as np

_FLOAT_KEYS = (
    "gt_gaze", "gt_gaze_1", "head_pose_0", "head_pose_1",
    # stacked V-view labels (data.multiview.MultiViewGazeDataset)
    "gt_gazes", "head_poses",
)
_INT_KEYS = ("idx_0", "idx_1", "idxs")


def collate(samples: list) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict."""
    batch: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if k in _FLOAT_KEYS:
            batch[k] = np.stack(vals).astype(np.float32)
        elif k in _INT_KEYS:
            batch[k] = np.asarray(vals, dtype=np.int32)
        else:
            batch[k] = np.stack(vals)
    return batch


def sharded_num_samples(n: int, process_shard: "tuple | None") -> int:
    """Samples per epoch on this host under the multi-host shard contract."""
    if process_shard is not None:
        n = n // process_shard[1]
    return n


def epoch_order(
    n: int,
    shuffle: bool,
    seed: int,
    epoch: int,
    process_shard: "tuple | None",
) -> np.ndarray:
    """The ONE definition of per-epoch iteration order (shared by
    BatchLoader and NativeBatchLoader): every host computes the same seeded
    global order, then takes its strided slice truncated to ``n // count``
    — identical batch counts on all hosts, which must step the jitted train
    step in lockstep."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    if process_shard is not None:
        i, p = process_shard
        order = order[i::p][: n // p]
    return order


class BatchLoader:
    """Shuffling, thread-pooled batch iterator over an indexable dataset.

    One pass over the dataset per ``__iter__`` (epoch); shuffling is driven by
    ``seed`` + ``epoch`` so runs are reproducible. ``num_threads`` parallelizes
    per-sample HDF5 reads; ``prefetch`` batches are assembled ahead of the
    consumer on a background thread.

    ``process_shard=(index, count)`` restricts iteration to this host's
    equal-size disjoint shard for multi-host data parallelism: every host
    computes the SAME seeded global order, then takes a strided slice of it
    truncated to ``len(dataset) // count`` — identical batch counts on all
    hosts (a hard requirement: hosts step the jitted train step in lockstep).
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_threads: int = 8,
        prefetch: int = 2,
        process_shard: Optional[tuple] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.process_shard = process_shard
        self.epoch = 0
        # One-shot fast-forward for step-exact mid-epoch resume: the next
        # __iter__ starts at batch ``skip_batches`` of this epoch's
        # permutation (the preceding batches were already consumed by the
        # checkpointed run), then the attribute resets to 0.
        self.skip_batches = 0

    def num_samples(self) -> int:
        """Samples this loader will actually yield per epoch (pre-batching)."""
        return sharded_num_samples(len(self.dataset), self.process_shard)

    def __len__(self) -> int:
        n = self.num_samples()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> Iterator[np.ndarray]:
        order = epoch_order(
            len(self.dataset), self.shuffle, self.seed, self.epoch,
            self.process_shard,
        )
        skip = int(self.skip_batches)
        self.skip_batches = 0  # one-shot: a resumed epoch applies it once
        first = skip * self.batch_size
        # the order THIS iteration actually yields, for consumers that need
        # to map yielded positions back to dataset rows (e.g. the trainer's
        # per-subject eval breakdown) — recomputing it from the loader
        # attributes is fragile because `epoch` has already advanced by the
        # time the iterator is exhausted (incremented in the finally below)
        self.last_epoch_order = order[first:]
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(first, stop, self.batch_size):
            yield order[start : start + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        error: list = []

        def put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # iterator (early break) — prevents a blocked producer thread.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idxs in self._batch_indices():
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, idxs))
                        if not put(collate(samples)):
                            return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe the stop flag
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
            self.epoch += 1
        if error:
            raise error[0]


def device_prefetch(
    iterator: Iterable[Dict[str, np.ndarray]],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    """Move batches to device ``size`` steps ahead of the consumer.

    With ``sharding`` set (e.g. a batch-sharded ``NamedSharding``), arrays land
    directly in their final layout — the per-host shard path for multi-chip
    data parallelism. A ``jax.sharding.Mesh`` is also accepted: each leaf
    then takes its rank-dependent placement from ``parallel.mesh.
    leaf_sharding`` (images shard over 'spatial' too on a 2-D mesh).
    """
    import collections

    import jax

    def put(batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        if isinstance(sharding, jax.sharding.Mesh):
            from rot_mvgaze_tpu.parallel.mesh import shard_batch

            return shard_batch(batch, sharding)
        if sharding is not None:
            from rot_mvgaze_tpu.parallel.mesh import put_sharded

            def one(x):
                x = np.asarray(x)
                if x.ndim == 0:
                    # scalars replicate — same rule as parallel.mesh.
                    # shard_batch; a batch-dim PartitionSpec cannot apply
                    # to rank-0 (pad_batch passes scalars through, so they
                    # do reach this path). put_sharded, not device_put: a
                    # multi-process mesh spans non-addressable devices.
                    mesh = getattr(sharding, "mesh", None)
                    if mesh is not None:
                        return put_sharded(
                            x,
                            jax.sharding.NamedSharding(
                                mesh, jax.sharding.PartitionSpec()
                            ),
                        )
                    # Mesh-less sharding (e.g. SingleDeviceSharding): commit
                    # the scalar to the BATCH's device, not the process
                    # default — a bare device_put left prefetched leaves
                    # inconsistently committed when the batch targets a
                    # non-default device. Rank-0 is compatible with any
                    # single-device sharding; for an exotic mesh-less
                    # multi-device sharding, its first device still keeps
                    # every leaf of the batch on one coherent device set.
                    devices = sorted(sharding.device_set, key=lambda d: d.id)
                    return jax.device_put(x, devices[0])
                return put_sharded(x, sharding)

            return jax.tree.map(one, batch)
        return jax.tree.map(jax.device_put, batch)

    buf: "collections.deque" = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
