"""Static-shape collation and a simple prefetching loader.

The reference pads the ragged lane tensors per-batch with pad_sequence
(data_utils.py:9-25), yielding shape-polymorphic batches that would retrigger
XLA compilation. Here every batch pads lanes to the compile-time constant
``config.max_lanes`` and carries per-sample lane counts — one jitted program
for the whole run. radar_adj is derived at collate time exactly like the
reference's PRE_Data.__getitem__ (dataloader.py:376-385).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from mmfn_tpu.data.batch import Batch
from mmfn_tpu.ops.radar import radar_adjacency_np


def collate_samples(samples: Sequence[Dict[str, np.ndarray]], max_lanes: int) -> Batch:
    n = len(samples)
    first = samples[0]
    lane_nodes, feat = first["lanes"].shape[1:]

    lanes = np.zeros((n, max_lanes, lane_nodes, feat), dtype=np.float32)
    lane_num = np.zeros((n,), dtype=np.int32)
    for i, s in enumerate(samples):
        k = min(s["lanes"].shape[0], max_lanes)
        lanes[i, :k] = s["lanes"][:k]
        lane_num[i] = max(k, 1)

    # astype(copy=False): the rasters are ~50 MB/batch — a second copy after
    # np.stack costs more than the unpickle itself (measured,
    # scripts/_loader_profile.py); stack of already-f32 samples is the copy.
    def stack_f32(key):
        return np.stack([s[key] for s in samples]).astype(np.float32,
                                                          copy=False)

    radar = stack_f32("radar")
    return Batch(
        image=stack_f32("image"),
        lidar_bev=stack_f32("lidar_bev"),
        map_img=stack_f32("map_img"),
        lanes=lanes,
        lane_num=lane_num,
        radar=radar,
        radar_adj=np.stack([radar_adjacency_np(r) for r in radar]),
        target_point=stack_f32("target_point"),
        velocity=np.asarray([s["velocity"] for s in samples], dtype=np.float32),
        waypoints=stack_f32("waypoints"),
        # action/command labels for the CILRS-style baselines (the reference
        # reads them from the same measurement dicts, cilrs/train.py:81-96)
        command=(np.asarray([s["command"] for s in samples], dtype=np.int32)
                 if "command" in first else None),
        action=(np.stack([[s["steer"], s["throttle"], s["brake"]]
                          for s in samples]).astype(np.float32)
                if "steer" in first else None),
    )


def data_loader(dataset, batch_size: int, max_lanes: int, *,
                shuffle: bool = False, seed: int = 0, drop_last: bool = True,
                num_threads: Optional[int] = None, prefetch: int = 4,
                shard_index: int = 0, shard_count: int = 1) -> Iterator[Batch]:
    """Threaded batch iterator.

    ``num_threads=None`` adapts to the host: decode threads only help when
    cores are free to run them (measured on a 1-core host: 1 thread 243
    samples/s, 4 threads 125 — GIL + context thrash make extra threads a
    SLOWDOWN), so the default is ``min(4, cpu_count - 1)`` and the
    single-thread path when that is zero.

    ``shard_index``/``shard_count`` give each host its own slice of the index
    space — the TPU-native replacement for DistributedSampler
    (phase2_train_net.py:265-266).
    """
    if num_threads is None:
        num_threads = min(4, (os.cpu_count() or 1) - 1)
    indices = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(indices)
    indices = indices[shard_index::shard_count]

    n_batches = (len(indices) // batch_size if drop_last
                 else -(-len(indices) // batch_size))
    batches: List[np.ndarray] = [
        indices[i * batch_size:(i + 1) * batch_size] for i in range(n_batches)]

    if num_threads <= 1:
        for idx in batches:
            yield collate_samples([dataset[int(i)] for i in idx], max_lanes)
        return

    # real decode pool: worker w collates batches w, w+N, w+2N, ... into its
    # own bounded queue; the consumer round-robins the queues, preserving
    # batch order. Workers re-check `stop` while blocked on a full queue so
    # an abandoned iterator cannot strand threads (or their decoded batches).
    num_threads = min(num_threads, len(batches)) or 1
    queues = [queue_mod.Queue(maxsize=max(1, prefetch // num_threads))
              for _ in range(num_threads)]
    stop = threading.Event()

    def put_checked(q, item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker(w):
        q = queues[w]
        try:
            for idx in batches[w::num_threads]:
                if stop.is_set():
                    return
                if not put_checked(
                        q, collate_samples([dataset[int(i)] for i in idx],
                                           max_lanes)):
                    return
        except Exception as e:  # surface loader errors to the consumer
            put_checked(q, e)
        finally:
            put_checked(q, None)

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(num_threads)]
    for t in threads:
        t.start()
    try:
        done = 0
        w = 0
        while done < num_threads:
            item = queues[w].get()
            if item is None:
                done += 1
                queues[w] = None
            elif isinstance(item, Exception):
                raise item
            else:
                yield item
            # advance to the next live queue (exhausted workers drop out
            # when batch counts are uneven across workers)
            w = (w + 1) % num_threads
            while queues[w] is None and done < num_threads:
                w = (w + 1) % num_threads
    finally:
        stop.set()
