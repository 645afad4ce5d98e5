"""Regression pins: feature extraction with augmentation under executors.

Pins `/root/reference/test/known_issues/test_augment_with_executor.py`:
compute_and_store_features with an augment_fn must work under both a thread
pool and a spawn-context process pool (fork used to deadlock with audio
handles open).
"""
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from functools import partial
from tempfile import TemporaryDirectory

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.augmentation import Volume
from lhotse_tpu.testing.fixtures import RandomCutTestCase


class TestAugmentationWithExecutor(RandomCutTestCase):
    @pytest.mark.parametrize(
        "exec_type",
        [
            ThreadPoolExecutor,
            partial(ProcessPoolExecutor, mp_context=multiprocessing.get_context("spawn")),
        ],
    )
    def test_augment_with_executor(self, exec_type):
        cut = self.with_cut(sampling_rate=16000, num_samples=16000, features=False)
        cuts = CutSet.from_cuts([cut.with_id(f"c{i}") for i in range(4)])
        with TemporaryDirectory() as d, exec_type(2) as ex:
            out = cuts.compute_and_store_features(
                extractor=Fbank(),
                storage_path=d,
                augment_fn=Volume(factor=0.5),
                executor=ex,
            )
            for c in out:
                feats = c.load_features()
                assert feats.ndim == 2
                assert np.isfinite(feats).all()
        self.cleanup()
