"""
End-to-end drive of the public library surface (the /verify recipe):
wav synth -> RecordingSet round-trip -> validate/fix -> CutSet ->
compute_and_store_features (fbank+lilcom-chunky) -> partial loads ->
DynamicBucketingSampler batches. Run on CPU; exits non-zero on failure.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("_AXON_REGISTERED", None)
import jax

jax.config.update("jax_platforms", "cpu")

import tempfile
import warnings
from pathlib import Path

import numpy as np


def main():
    ws = Path(tempfile.mkdtemp())
    from lhotse_tpu.audio.wavio import write_wav

    for i in range(4):
        x = (
            np.sin(2 * np.pi * (300 + 50 * i) * np.arange(16000 * 2) / 16000) * 0.4
        ).astype(np.float32)
        write_wav(str(ws / f"rec{i}.wav"), x, 16000)

    from lhotse_tpu import (
        CutSet,
        Fbank,
        RecordingSet,
        SupervisionSegment,
        SupervisionSet,
        fix_manifests,
        validate,
    )

    recs = RecordingSet.from_dir(ws, "*.wav")
    recs.to_file(str(ws / "recordings.jsonl.gz"))
    recs = RecordingSet.from_file(str(ws / "recordings.jsonl.gz"))
    assert len(recs) == 4

    sups = SupervisionSet.from_segments(
        SupervisionSegment(
            id=f"sup{i}",
            recording_id=f"rec{i}",
            start=0.2,
            duration=1.5,
            text="hello",
        )
        for i in range(4)
    )
    validate(recs)
    validate(sups)
    recs, sups = fix_manifests(recs, sups)

    cuts = CutSet.from_manifests(recordings=recs, supervisions=sups)
    cuts = cuts.compute_and_store_features(
        extractor=Fbank(), storage_path=str(ws / "feats"), progress_bar=False
    )
    c = list(cuts)[0]
    f = c.load_features()
    assert f.shape[1] == 80, f.shape
    assert c.load_audio().shape[-1] == 32000

    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicBucketingSampler(
            cuts, max_duration=4.0, num_buckets=2, shuffle=True, seed=0
        )
        batches = list(sampler)
    assert sum(len(b) for b in batches) == 4
    print(f"VERIFY OK: fbank {f.shape}, {len(batches)} batches")


if __name__ == "__main__":
    main()
