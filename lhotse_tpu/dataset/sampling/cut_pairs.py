"""
CutPairsSampler: paired sampling from source/target CutSets by matching IDs.

Reference behavior: `/root/reference/lhotse/dataset/sampling/cut_pairs.py`
(CutPairsSampler :9-260): separate source/target TimeConstraints; a batch
closes when either side exceeds; partial-batch + take-back semantics mirror
SimpleCutSampler.
"""
import warnings
from typing import Any, Dict, Optional, Tuple

from lhotse_tpu.cut import CutSet
from lhotse_tpu.dataset.sampling.base import CutSampler, TimeConstraint
from lhotse_tpu.dataset.sampling.data_source import DataSource
from lhotse_tpu.utils import Seconds


class CutPairsSampler(CutSampler):
    """
    Samples pairs of cuts from a "source" and "target" CutSet that strictly
    consist of cuts with corresponding IDs (same length, same order). The
    batch size is dynamic under ``max_source_duration`` /
    ``max_target_duration`` / ``max_cuts``.
    """

    def __init__(
        self,
        source_cuts: CutSet,
        target_cuts: CutSet,
        max_source_duration: Seconds = None,
        max_target_duration: Seconds = None,
        max_cuts: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        world_size: Optional[int] = None,
        rank: Optional[int] = None,
        seed: int = 0,
    ):
        super().__init__(
            drop_last=drop_last,
            shuffle=shuffle,
            world_size=world_size,
            rank=rank,
            seed=seed,
        )
        self.source_cuts = DataSource(source_cuts)
        self.target_cuts = DataSource(target_cuts)
        self.source_constraints = TimeConstraint(
            max_duration=max_source_duration, max_cuts=max_cuts
        )
        self.target_constraints = TimeConstraint(
            max_duration=max_target_duration, max_cuts=max_cuts
        )

    @property
    def remaining_duration(self) -> Optional[float]:
        """Source-side remaining duration (None for lazy CutSets)."""
        return self.source_cuts.remaining_duration

    @property
    def remaining_cuts(self) -> Optional[int]:
        return self.source_cuts.remaining_cuts

    @property
    def num_cuts(self) -> Optional[int]:
        if self.source_cuts.is_lazy:
            return None
        return len(self.source_cuts)

    def state_dict(self) -> Dict[str, Any]:
        state_dict = super().state_dict()
        state_dict.update(
            {
                "source_constraints": self.source_constraints.state_dict(),
                "target_constraints": self.target_constraints.state_dict(),
            }
        )
        return state_dict

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        source_constraints = TimeConstraint(**state_dict.pop("source_constraints"))
        if self.source_constraints != source_constraints:
            warnings.warn(
                "CutPairsSampler.load_state_dict(): Inconsistent source_constraint:\n"
                f"expected {self.source_constraints}\n"
                f"received {source_constraints}\n"
                "We will overwrite the settings with the received state_dict."
            )
        self.source_constraints = source_constraints

        target_constraints = TimeConstraint(**state_dict.pop("target_constraints"))
        if self.target_constraints != target_constraints:
            warnings.warn(
                "CutPairsSampler.load_state_dict(): Inconsistent target_constraint:\n"
                f"expected {self.target_constraints}\n"
                f"received {target_constraints}\n"
                "We will overwrite the settings with the received state_dict."
            )
        self.target_constraints = target_constraints

        super().load_state_dict(state_dict)

        if self.shuffle:
            self.source_cuts.shuffle(self.seed + self.epoch)
            self.target_cuts.shuffle(self.seed + self.epoch)
        n = self.diagnostics.current_epoch_stats.consumed_cuts
        self.source_cuts.fast_forward(n)
        self.target_cuts.fast_forward(n)

    def __iter__(self) -> "CutPairsSampler":
        if self._just_restored_state:
            return self
        self.diagnostics.reset_current_epoch()
        if self.shuffle:
            self.source_cuts.shuffle(self.seed + self.epoch)
            self.target_cuts.shuffle(self.seed + self.epoch)
        iter(self.source_cuts)
        iter(self.target_cuts)
        return self

    def _next_batch(self) -> Tuple[CutSet, CutSet]:
        # Metadata-only batch collection over both streams in lockstep.
        self.source_constraints.reset()
        self.target_constraints.reset()
        source_cuts = []
        target_cuts = []
        while True:
            try:
                next_source_cut = next(self.source_cuts)
                next_target_cut = next(self.target_cuts)
                assert next_source_cut.id == next_target_cut.id, (
                    "Sampled source and target cuts with differing IDs. "
                    "Ensure that your source and target cuts have the same "
                    "length, the same IDs, and the same order."
                )
            except StopIteration:
                if source_cuts and (
                    not self.drop_last
                    or self.source_constraints.close_to_exceeding()
                    or self.target_constraints.close_to_exceeding()
                ):
                    assert len(source_cuts) == len(target_cuts), (
                        "Unexpected state: some cuts in source / target are "
                        "missing their counterparts..."
                    )
                    return CutSet.from_cuts(source_cuts), CutSet.from_cuts(target_cuts)
                else:
                    self.diagnostics.discard(source_cuts)
                    raise StopIteration()

            if not self._filter_fn(next_source_cut) or not self._filter_fn(
                next_target_cut
            ):
                self.diagnostics.discard_single(next_source_cut)
                continue

            self.source_constraints.add(next_source_cut)
            self.target_constraints.add(next_target_cut)

            if (
                not self.source_constraints.exceeded()
                and not self.target_constraints.exceeded()
            ):
                source_cuts.append(next_source_cut)
                target_cuts.append(next_target_cut)
            else:
                if source_cuts:
                    self.source_cuts.take_back(next_source_cut)
                    self.target_cuts.take_back(next_target_cut)
                    break
                else:
                    warnings.warn(
                        "The first cut drawn in batch collection violates one "
                        "of the max_... constraints; we'll return it anyway. "
                        "Consider increasing max_source_duration/max_cuts/etc."
                    )
                    source_cuts.append(next_source_cut)
                    target_cuts.append(next_target_cut)

        assert len(source_cuts) == len(target_cuts), (
            "Unexpected state: some cuts in source / target are missing their "
            "counterparts..."
        )
        return CutSet.from_cuts(source_cuts), CutSet.from_cuts(target_cuts)
