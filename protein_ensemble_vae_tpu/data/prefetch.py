"""Host->device prefetch with double buffering (SURVEY §7.1 item 3).

The collate path produces numpy batches on the host; transferring them
inside the jitted step serializes H2D copy with compute. This iterator
keeps ``size`` batches in flight on the device (``jax.device_put`` is
async), so the copy of batch N+1 overlaps the compute of batch N.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yield items with ``size`` of them already transferred to device.

    ``sharding`` optionally places each leaf with a NamedSharding (for
    mesh-sharded batches); default is the backend's default device.
    """
    queue = collections.deque()

    def put(item):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), item)
        return jax.tree.map(jax.device_put, item)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
