"""Dataset composition + rank/worker sharding.

Replaces cosyvoice/dataset/dataset.py:26-155: a data-list file of parquet
shards is sharded by (rank, world_size) and optionally by worker, then the
processor chain is applied. Fixed steps-per-epoch sharding (drop-last at the
shard level) removes the reference's uneven-data join problem at the source
(SURVEY §5.8).
"""

import random
from typing import Callable, Iterator, List, Optional, Sequence


class DataList:
    def __init__(self, paths: Sequence[str], shuffle: bool = True, partition: bool = True,
                 rank: int = 0, world_size: int = 1, epoch: int = 0):
        self.paths = list(paths)
        self.shuffle = shuffle
        self.partition = partition
        self.rank = rank
        self.world_size = world_size
        self.epoch = epoch

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        paths = list(self.paths)
        if self.shuffle:
            random.Random(self.epoch).shuffle(paths)
        if self.partition and self.world_size > 1:
            # drop the ragged tail so every rank sees the same shard count
            n = (len(paths) // self.world_size) * self.world_size
            paths = paths[self.rank : n : self.world_size]
        for p in paths:
            yield {"src": p}


def Dataset(
    data_list_file: str,
    pipeline: Sequence[Callable],
    mode: str = "train",
    shuffle: bool = True,
    partition: bool = True,
    rank: int = 0,
    world_size: int = 1,
):
    """Compose the processor chain over the shard list. `pipeline` entries are
    callables taking (iterator, **kwargs) — typically functools.partial-bound
    processors from cosyvoice_tpu.data.processor."""
    with open(data_list_file) as f:
        paths = [line.strip() for line in f if line.strip()]
    source = DataList(paths, shuffle=shuffle and mode == "train", partition=partition,
                      rank=rank, world_size=world_size)

    class _Iterable:
        def __init__(self):
            self.source = source

        def set_epoch(self, epoch: int):
            self.source.set_epoch(epoch)

        def __iter__(self):
            it = iter(self.source)
            for fn in pipeline:
                it = fn(it)
            return it

    return _Iterable()
