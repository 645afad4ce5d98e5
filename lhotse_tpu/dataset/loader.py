"""
Library-owned data loader + double-buffered host→device feed.

The reference relies on ``torch.utils.data.DataLoader`` for worker
parallelism and prefetching; this framework owns that loop (SURVEY.md §7
design stance: "No torch DataLoader"):

- :class:`DataLoader` — drives ``sampler -> dataset[cuts] -> batch dict`` on
  a background thread with a bounded prefetch queue, so host-side batch
  assembly (audio decode, feature extraction, collation) overlaps device
  compute. Checkpointing delegates to the sampler's ``state_dict``
  (save *before* consuming prefetched batches resumes exactly: the queue
  holds batches whose sampler positions were already accounted).
- :func:`device_prefetch` — the host→device double-buffer: ``device_put``\\ s
  each numpy leaf of the batch (optionally with a
  :class:`~jax.sharding.NamedSharding` per leaf) and keeps ``size`` batches
  in flight on device, hiding the PCIe transfer behind the current step.

Both stay framework-neutral on the host side: batches are pytrees of numpy
arrays; only :func:`device_prefetch` touches jax.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

_SENTINEL = object()


class DataLoader:
    """
    Iterates a sampler, maps each sampled ``CutSet`` through ``dataset``
    (map-style: ``dataset[cuts] -> batch``), prefetching up to
    ``prefetch_batches`` results on a background thread.

    One epoch per ``iter()``; call ``sampler.set_epoch`` between epochs as
    usual. Exceptions raised in the worker are re-raised in the consumer.
    """

    def __init__(
        self,
        sampler: Iterable,
        dataset: Any,
        prefetch_batches: int = 2,
        apply_fn: Optional[Callable[[Any], Any]] = None,
    ):
        self.sampler = sampler
        self.dataset = dataset
        self.prefetch_batches = max(int(prefetch_batches), 0)
        self.apply_fn = apply_fn

    def state_dict(self) -> Dict[str, Any]:
        return {"sampler": self.sampler.state_dict()}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.sampler.load_state_dict(state["sampler"])

    def _produce(self, q: "queue.Queue") -> None:
        try:
            for cuts in self.sampler:
                batch = self.dataset[cuts]
                if self.apply_fn is not None:
                    batch = self.apply_fn(batch)
                q.put(batch)
        except BaseException as e:  # noqa: B036 - forwarded to the consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        if self.prefetch_batches == 0:
            for cuts in self.sampler:
                batch = self.dataset[cuts]
                yield self.apply_fn(batch) if self.apply_fn else batch
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        worker = threading.Thread(target=self._produce, args=(q,), daemon=True)
        worker.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        worker.join()


def _tree_device_put(batch, sharding=None):
    import jax

    def put(x):
        try:
            import numpy as np

            if isinstance(x, np.ndarray):
                return jax.device_put(x, sharding)
        except Exception:
            pass
        return x

    return jax.tree_util.tree_map(put, batch)


def device_prefetch(batches: Iterable, size: int = 2, sharding=None) -> Iterator:
    """
    Double-buffered host→device staging: eagerly ``device_put`` up to
    ``size`` upcoming batches (numpy leaves only; str/int leaves pass
    through) so the transfer of batch N+1 overlaps the compute on batch N.

    :param sharding: optional ``jax.sharding.Sharding`` applied to every
        array leaf (e.g. batch-sharded ``NamedSharding(mesh, P("data"))``).
    """
    import collections

    buf = collections.deque()
    it = iter(batches)
    try:
        for _ in range(max(size, 1)):
            buf.append(_tree_device_put(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_tree_device_put(next(it), sharding))
        except StopIteration:
            pass
        yield out
