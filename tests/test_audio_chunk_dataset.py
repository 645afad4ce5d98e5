"""
RecordingChunkIterableDataset + audio_chunk_collate (whole-recording
chunked inference; reference surface:
test/dataset/test_audio_chunk_dataset.py, lhotse/dataset/unsupervised.py).
"""
import numpy as np
import pytest

from lhotse_tpu import Recording, RecordingSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset.unsupervised import (
    RecordingChunkIterableDataset,
    audio_chunk_collate,
)

SR = 16000


@pytest.fixture
def recordings(tmp_path):
    recs = []
    for i, dur in enumerate([2.5, 1.0]):
        path = tmp_path / f"r{i}.wav"
        sig = (np.arange(int(SR * dur)) % 1000 / 1000.0 - 0.5).astype(np.float32)
        write_wav(str(path), sig, SR)
        recs.append(Recording.from_file(path, recording_id=f"rec{i}"))
    return RecordingSet.from_recordings(recs)


class TestChunkIteration:
    def test_non_overlapping_chunks_cover_recording(self, recordings):
        ds = RecordingChunkIterableDataset(recordings, chunk_size=1.0, chunk_shift=1.0)
        items = list(ds)
        by_rec = {}
        for it in items:
            by_rec.setdefault(it["recording_id"], []).append(it)
        # 2.5s -> chunks of 1.0, 1.0, 0.5; 1.0s -> one chunk.
        assert len(by_rec["rec0"]) == 3
        assert len(by_rec["rec1"]) == 1
        audio0 = np.concatenate([c["audio"] for c in by_rec["rec0"]])
        direct = recordings["rec0"].load_audio()[0]
        np.testing.assert_allclose(audio0, direct, atol=1e-6)
        # Timestamps advance by the shift.
        begins = [float(c["begin_time"]) for c in by_rec["rec0"]]
        assert begins == [0.0, 1.0, 2.0]

    def test_overlapping_chunks(self, recordings):
        ds = RecordingChunkIterableDataset(recordings, chunk_size=1.0, chunk_shift=0.5)
        chunks = [c for c in ds if c["recording_id"] == "rec1"]
        # 1.0s recording with 0.5 shift: chunks at 0.0 and 0.5.
        assert len(chunks) == 2
        assert chunks[0]["audio"].shape[0] == SR
        assert chunks[1]["audio"].shape[0] == SR // 2
        # Overlap region is identical audio.
        np.testing.assert_allclose(
            chunks[0]["audio"][SR // 2 :], chunks[1]["audio"], atol=1e-7
        )

    def test_validation_rejects_multichannel(self, tmp_path, recordings):
        stereo = tmp_path / "st.wav"
        write_wav(str(stereo), np.zeros((2, SR), np.float32), SR)
        bad = RecordingSet.from_recordings(
            list(recordings) + [Recording.from_file(stereo)]
        )
        with pytest.raises(AssertionError, match="single-channel"):
            RecordingChunkIterableDataset(bad, chunk_size=1.0, chunk_shift=1.0)


class TestChunkCollate:
    def test_pads_to_longest(self, recordings):
        ds = RecordingChunkIterableDataset(recordings, chunk_size=1.0, chunk_shift=1.0)
        items = list(ds)
        batch = audio_chunk_collate(items)
        assert batch["audio"].shape == (4, SR)
        assert batch["recording_id"] == ["rec0", "rec0", "rec0", "rec1"]
        np.testing.assert_allclose(batch["begin_time"], [0.0, 1.0, 2.0, 0.0])
        # The short final chunk of rec0 is zero-padded.
        assert np.allclose(batch["audio"][2, SR // 2 :], 0.0)
