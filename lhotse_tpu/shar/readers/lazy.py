"""
Streaming Shar reader.

Reference behavior: `/root/reference/lhotse/shar/readers/lazy.py`
(_discover_fields :37-60, LazySharIterator :63-375, _jsonl_tar_adaptor
:378-392).
"""
import random
from pathlib import Path
from typing import (
    Callable,
    Dict,
    Generator,
    List,
    Optional,
    Sequence,
    Tuple,
    Union,
)

from lhotse_tpu.cut import Cut
from lhotse_tpu.dataset.dataloading import resolve_seed
from lhotse_tpu.lazy import (
    IteratorNode,
    LazyIteratorChain,
    LazyJsonlIterator,
    LazyManifestIterator,
    count_newlines_fast,
)
from lhotse_tpu.serialization import extension_contains
from lhotse_tpu.shar.readers.tar import TarIterator
from lhotse_tpu.utils import Pathlike, exactly_one_not_null, ifnone


def _is_local_uncompressed(path) -> bool:
    """True if *path* is a local, uncompressed file (not pipe/URL/gz)."""
    p = str(path)
    if p.startswith("pipe:") or "://" in p:
        return False
    return not extension_contains(".gz", p)


def _discover_fields(in_dir: Path) -> Tuple[set, dict]:
    """
    Discover shard fields in a directory: returns ``(fields, streams)`` where
    *streams* maps each field (plus "cuts") to a sorted shard-path list.
    ``.idx`` sidecars are excluded.
    """
    all_paths = [p for p in in_dir.glob("*") if p.suffix != ".idx"]
    fields = set(p.stem.split(".")[0] for p in all_paths)
    assert "cuts" in fields, f"No cuts JSONL shards found in {in_dir}"
    fields.remove("cuts")

    streams: Dict[str, list] = {
        "cuts": sorted(
            p
            for p in all_paths
            if p.name.split(".")[0] == "cuts" and extension_contains(".jsonl", p)
        )
    }
    for field in fields:
        streams[field] = sorted(p for p in all_paths if p.name.split(".")[0] == field)
    return fields, streams


class LazySharIterator(IteratorNode):
    """
    Streams cuts + data from Shar shards: for the current shard it keeps the
    jsonl manifest and all field tarfiles open, zipping them item-by-item and
    attaching binary data to the cuts (accessible via ``cut.load_audio()``
    etc.).

    Load a SharWriter directory::

        >>> cuts = LazySharIterator(in_dir="some_dir")

    or explicit per-field shard lists (paths, "pipe:" commands, or URLs)::

        >>> cuts = LazySharIterator({
        ...     "cuts": ["some_dir/cuts.000000.jsonl.gz"],
        ...     "recording": ["another_dir/recording.000000.tar"],
        ... })

    :param fields: dict of field → shard list; must include "cuts".
    :param in_dir: SharWriter output directory (alternative to fields).
    :param split_for_dataloading: give each node+worker a unique shard
        subset (mutually exclusive with seed='randomized').
    :param shuffle_shards: shuffle shard order (same on each node per seed).
    :param seed: int / 'randomized' (per node+worker via worker_init_fn) /
        'trng' (non-reproducible).
    :param stateful_shuffle: reshuffle with seed+epoch on each full pass.
    :param cut_map_fns: per-shard cut transform callables.
    :param slice_length: read only a random slice of this many examples from
        each shard (randomness/efficiency tradeoff for large-shard setups).
    """

    is_checkpointable = True

    def __init__(
        self,
        fields: Optional[Dict[str, Sequence[Pathlike]]] = None,
        in_dir: Optional[Pathlike] = None,
        split_for_dataloading: bool = False,
        shuffle_shards: bool = False,
        stateful_shuffle: bool = True,
        seed: Union[int, str] = 42,
        cut_map_fns: Optional[Sequence[Callable[[Cut], Cut]]] = None,
        slice_length: Optional[int] = None,
    ) -> None:
        assert exactly_one_not_null(fields, in_dir), (
            "To read the Shar format, provide either 'in_dir' or 'fields' argument."
        )
        if split_for_dataloading:
            assert seed not in ("randomized", "trng"), (
                "Error: setting seed to 'randomized' or 'trng' and using "
                "split_for_dataloading=True are mutually exclusive options as "
                "they would result in data loss."
            )

        self.split_for_dataloading = split_for_dataloading
        self.shuffle_shards = shuffle_shards
        self.stateful_shuffle = stateful_shuffle
        self.seed = seed
        self.slice_length = slice_length
        self.epoch = 0

        self._len = None
        if in_dir is not None:
            self.in_dir = Path(in_dir)
            self.fields, self.streams = _discover_fields(self.in_dir)
        else:
            self._init_from_inputs(fields)

        self.num_shards = len(self.streams["cuts"])
        for field in self.fields:
            assert len(self.streams[field]) == self.num_shards, (
                f"Expected {self.num_shards} shards available for field "
                f"'{field}' but found {len(self.streams[field])}: "
                f"{self.streams[field]}"
            )

        self.shards = [
            {field: self.streams[field][shard_idx] for field in self.streams}
            for shard_idx in range(self.num_shards)
        ]

        self.cut_map_fns = ifnone(cut_map_fns, [None] * self.num_shards)
        self._restored = False

    def _init_from_inputs(self, fields: Optional[Dict[str, Sequence[str]]] = None):
        assert "cuts" in fields, (
            "To initialize the Shar reader, please provide the value for key "
            "'cuts' in 'fields'."
        )
        self.fields = set(fields.keys())
        self.fields.remove("cuts")
        self.streams = fields

    @property
    def is_indexed(self) -> bool:
        """Always False — this is the streaming reader."""
        return False

    def _maybe_split_for_dataloading(self, shards: List) -> List:
        from lhotse_tpu.shar.readers.utils import split_by_node, split_by_worker

        if self.split_for_dataloading:
            return split_by_worker(split_by_node(shards))
        else:
            return shards

    def _get_rng(self) -> random.Random:
        seed = resolve_seed(self.seed)
        if self.stateful_shuffle:
            seed += self.epoch
        return random.Random(seed)

    def _maybe_shuffle_shards(self, shards: List) -> List:
        if self.shuffle_shards:
            shards = shards.copy()
            self._get_rng().shuffle(shards)
        return shards

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        restored = self._restored
        self._restored = False

        shards = self.shards
        map_fns = self.cut_map_fns
        rng = self._get_rng()

        if restored:
            # Resume: saved shard order and positions.
            shard_order = self._shard_order
            start_shard = self._current_shard_idx
            skip_in_shard = self._position_in_shard
        else:
            indices = list(range(len(shards)))
            indices = self._maybe_shuffle_shards(indices)
            indices = self._maybe_split_for_dataloading(indices)
            shard_order = indices
            start_shard = 0
            skip_in_shard = 0

        self._shard_order = shard_order

        for i in range(start_shard, len(shard_order)):
            orig_idx = shard_order[i]
            shard = shards[orig_idx]
            cut_map_fn = map_fns[orig_idx] if map_fns is not None else None

            self._current_shard_idx = i
            self._position_in_shard = 0

            cuts = LazyManifestIterator(shard["cuts"])
            if self.slice_length is not None:
                # Sampling a slice offset requires knowing the length.
                cuts = list(cuts)

            field_paths = {field: path for field, path in shard.items() if field != "cuts"}

            field_iters = {
                field: TarIterator(path)
                if extension_contains(".tar", path)
                else _jsonl_tar_adaptor(LazyJsonlIterator(path), field=field)
                for field, path in field_paths.items()
            }

            yielded_cntr = 0
            slice_offset = (
                rng.randint(0, len(cuts) - self.slice_length)
                if self.slice_length is not None and self.slice_length < len(cuts)
                else -1
            )
            for idx, (cut, *field_data) in enumerate(zip(cuts, *field_iters.values())):
                if idx < slice_offset:
                    continue
                elif yielded_cntr == self.slice_length:
                    break

                # Skip items consumed before the checkpoint.
                if i == start_shard and yielded_cntr < skip_in_shard:
                    yielded_cntr += 1
                    self._position_in_shard = yielded_cntr
                    continue

                for field, (maybe_manifest, data_path) in zip(
                    field_iters.keys(), field_data
                ):
                    if maybe_manifest is None:
                        continue  # field absent for this cut
                    assert str(data_path.parent / data_path.stem) == cut.id, (
                        f"Mismatched IDs: cut ID is '{cut.id}' but found data "
                        f"with name '{data_path}' for field {field}"
                    )
                    setattr(cut, field, maybe_manifest)

                cut.shard_origin = shard["cuts"]
                cut.shar_epoch = self.epoch
                if cut_map_fn is not None:
                    cut = cut_map_fn(cut)
                yielded_cntr += 1
                self._position_in_shard = yielded_cntr
                yield cut

        self.epoch += 1

    def state_dict(self) -> dict:
        return {
            "epoch": self.epoch,
            "current_shard_idx": getattr(self, "_current_shard_idx", 0),
            "position_in_shard": getattr(self, "_position_in_shard", 0),
            "shard_order": getattr(self, "_shard_order", None),
        }

    def load_state_dict(self, sd: dict) -> None:
        self.epoch = sd["epoch"]
        self._current_shard_idx = sd["current_shard_idx"]
        self._position_in_shard = sd["position_in_shard"]
        self._shard_order = sd["shard_order"]
        self._restored = True

    def __len__(self) -> int:
        if self._len is None:
            self._len = sum(count_newlines_fast(p) for p in self.streams["cuts"])
        return self._len

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)


def _jsonl_tar_adaptor(
    jsonl_iter: LazyJsonlIterator, field: str
) -> Generator[Tuple[Optional[dict], Path], None, None]:
    """Adapt LazyJsonlIterator output to TarIterator's (item, path) shape."""
    for item in jsonl_iter:
        pseudo_path = Path(f"{item['cut_id']}.dummy")
        if field not in item:
            item = None  # placeholder
        else:
            item = item[field]
        yield item, pseudo_path
