"""
Fault-tolerance behaviors (reference: lhotse/audio/utils.py suppress
helpers, dataset/collation.py fault_tolerant): corrupt or missing media
must either raise clearly or be skipped on request — never crash the
training loop when tolerance was asked for.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset.collation import collate_audio

SR = 16000


@pytest.fixture
def cuts_with_one_broken(tmp_path):
    cuts = []
    for i in range(4):
        t = np.arange(SR) / SR
        write_wav(tmp_path / f"r{i}.wav", (0.1 * np.sin(2 * np.pi * (200 + i * 50) * t)).astype(np.float32), SR)
        cuts.append(Recording.from_file(tmp_path / f"r{i}.wav").to_cut())
    # Corrupt one file AFTER the manifest was built.
    (tmp_path / "r2.wav").write_bytes(b"RIFFgarbage")
    return CutSet.from_cuts(cuts)


def test_collate_audio_raises_without_tolerance(cuts_with_one_broken):
    with pytest.raises(Exception):
        collate_audio(cuts_with_one_broken)


def test_collate_audio_skips_broken_with_tolerance(cuts_with_one_broken):
    audio, lens, surviving = collate_audio(cuts_with_one_broken, fault_tolerant=True)
    assert audio.shape[0] == 3
    assert len(lens) == 3
    assert all(l == SR for l in lens)
    assert "r2" not in [c.recording_id for c in surviving]
    assert np.isfinite(audio).all()


def test_missing_file_raises_informative_error(tmp_path):
    t = np.arange(SR) / SR
    write_wav(tmp_path / "gone.wav", (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), SR)
    cut = Recording.from_file(tmp_path / "gone.wav").to_cut()
    (tmp_path / "gone.wav").unlink()
    with pytest.raises(Exception):
        cut.load_audio()
    # Tolerant collation drops it instead.
    audio, lens, surviving = collate_audio(
        CutSet.from_cuts([cut]), fault_tolerant=True)
    assert audio.shape[0] == 0 or len(list(surviving)) == 0


def test_duration_mismatch_within_tolerance_is_fixed(tmp_path):
    """A manifest overstating duration by less than the tolerance gets its
    audio padded/trimmed to the declared sample count instead of raising."""
    t = np.arange(SR) / SR
    write_wav(tmp_path / "r.wav", (0.1 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), SR)
    rec = Recording.from_file(tmp_path / "r.wav")
    # Declare 100 samples more than the file holds (6.25 ms < 25 ms default).
    from lhotse_tpu.utils import fastcopy

    lying = fastcopy(rec, num_samples=SR + 100, duration=(SR + 100) / SR)
    audio = lying.load_audio()
    assert audio.shape[1] == SR + 100  # padded up to the declared length


def test_duration_mismatch_beyond_tolerance_raises(tmp_path):
    t = np.arange(SR) / SR
    write_wav(tmp_path / "r.wav", (0.1 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), SR)
    rec = Recording.from_file(tmp_path / "r.wav")
    from lhotse_tpu.utils import fastcopy

    lying = fastcopy(rec, num_samples=SR * 2, duration=2.0)
    with pytest.raises(Exception):
        lying.load_audio()


def test_ontheflyfeatures_fault_tolerant_batch(cuts_with_one_broken):
    from lhotse_tpu import Fbank
    from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures

    otf = OnTheFlyFeatures(Fbank(), fault_tolerant=True)
    feats, lens, surviving = otf(cuts_with_one_broken)
    assert feats.shape[0] == 3 and feats.shape[2] == 80
    assert len(list(surviving)) == 3
