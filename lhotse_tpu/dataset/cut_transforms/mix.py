"""
Reference behavior: `/root/reference/lhotse/dataset/cut_transforms/mix.py`
(CutMix :11-116).
"""
import random
import warnings
from typing import Optional, Tuple, Union

from lhotse_tpu.cut import CutSet
from lhotse_tpu.dataset.dataloading import resolve_seed
from lhotse_tpu.utils import Decibels, load_rng_state, save_rng_state


class CutMix:
    """
    Stochastic noise augmentation: mixes randomly chosen cuts from a noise
    CutSet into each batch at a constant or uniformly-sampled SNR.
    """

    def __init__(
        self,
        cuts: CutSet,
        snr: Optional[Union[Decibels, Tuple[Decibels, Decibels]]] = (10, 20),
        p: float = 0.5,
        pad_to_longest: bool = True,
        preserve_id: bool = False,
        seed: Union[int, str, random.Random] = 42,
        random_mix_offset: bool = False,
        tag: Optional[str] = None,
    ) -> None:
        """
        :param cuts: CutSet with augmentation data (noise, music, babble).
        :param snr: float (fixed), (low, high) range (uniform sample), or
            None (mix as-is, no level adjustment — different from snr=0).
        :param pad_to_longest: pad each cut with noise up to the longest cut
            in the batch.
        :param preserve_id: keep the original cut IDs after augmentation.
        :param seed: int / "trng" / "randomized" / a random.Random instance.
        :param random_mix_offset: when the mixed-in cut is longer, take a
            random sub-region instead of its beginning.
        :param tag: optional label attached to the mixed-in tracks.
        """
        self.cuts = cuts
        if len(self.cuts) == 0:
            warnings.warn(
                "Empty CutSet in CutMix transform: it'll act as an identity transform."
            )
        self.snr = snr
        self.p = p
        self.pad_to_longest = pad_to_longest
        self.preserve_id = preserve_id
        self.seed = seed
        self.rng = None
        self.random_mix_offset = random_mix_offset
        self.tag = tag

    def __call__(self, cuts: CutSet) -> CutSet:
        if len(self.cuts) == 0:
            return cuts

        self._lazy_rng_init()

        maybe_max_duration = (
            max(c.duration for c in cuts) if self.pad_to_longest else None
        )
        return cuts.mix(
            cuts=self.cuts,
            duration=maybe_max_duration,
            snr=self.snr,
            mix_prob=self.p,
            preserve_id="left" if self.preserve_id else None,
            seed=self.rng,
            random_mix_offset=self.random_mix_offset,
            tag=self.tag,
        ).to_eager()

    def _lazy_rng_init(self):
        if self.rng is not None:
            return
        if isinstance(self.seed, random.Random):
            self.rng = self.seed
        else:
            self.rng = random.Random(resolve_seed(self.seed))

    def state_dict(self) -> dict:
        return {"rng_state": save_rng_state(self.rng)}

    def load_state_dict(self, sd: dict) -> None:
        self.rng = load_rng_state(sd["rng_state"], self.rng)
