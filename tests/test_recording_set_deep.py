"""
RecordingSet / multi-source Recording matrix: per-channel file sources,
stereo single files, duration mismatches, chunked reads, set algebra, and
path-prefix remapping.

Behavioral model: /root/reference/test/audio/test_recording_set.py.
"""
import numpy as np
import pytest

from lhotse_tpu import Recording, RecordingSet
from lhotse_tpu.audio import AudioSource
from lhotse_tpu.audio.wavio import write_wav

SR = 8000


def _write(path, data):
    write_wav(str(path), data.astype(np.float32), SR)
    return path


@pytest.fixture
def multi_file_recording(tmp_path):
    """One logical recording whose two channels live in separate files."""
    left = 0.1 * np.sin(2 * np.pi * 100 * np.arange(SR) / SR)
    right = 0.1 * np.sin(2 * np.pi * 300 * np.arange(SR) / SR)
    _write(tmp_path / "left.wav", left)
    _write(tmp_path / "right.wav", right)
    return (
        Recording(
            id="mf",
            sources=[
                AudioSource(type="file", channels=[0], source=str(tmp_path / "left.wav")),
                AudioSource(type="file", channels=[1], source=str(tmp_path / "right.wav")),
            ],
            sampling_rate=SR,
            num_samples=SR,
            duration=1.0,
        ),
        left,
        right,
    )


def test_audio_from_multiple_files(multi_file_recording):
    rec, left, right = multi_file_recording
    audio = rec.load_audio()
    assert audio.shape == (2, SR)
    np.testing.assert_allclose(audio[0], left, atol=2 / 32768)
    np.testing.assert_allclose(audio[1], right, atol=2 / 32768)
    assert rec.channel_ids == [0, 1]


def test_audio_channel_selection_from_multiple_files(multi_file_recording):
    rec, left, right = multi_file_recording
    np.testing.assert_allclose(
        rec.load_audio(channels=1)[0], right, atol=2 / 32768
    )
    np.testing.assert_allclose(
        rec.load_audio(channels=[0])[0], left, atol=2 / 32768
    )


def test_stereo_audio_from_single_file(tmp_path):
    data = np.stack(
        [
            0.1 * np.sin(2 * np.pi * 100 * np.arange(SR) / SR),
            0.1 * np.sin(2 * np.pi * 400 * np.arange(SR) / SR),
        ]
    )
    _write(tmp_path / "st.wav", data)
    rec = Recording.from_file(tmp_path / "st.wav")
    audio = rec.load_audio()
    assert audio.shape == (2, SR)
    np.testing.assert_allclose(audio, data, atol=2 / 32768)


def test_multichannel_offset_and_duration_windows(multi_file_recording):
    rec, left, right = multi_file_recording
    audio = rec.load_audio(offset=0.25, duration=0.5)
    assert audio.shape == (2, SR // 2)
    np.testing.assert_allclose(audio[0], left[SR // 4 : 3 * SR // 4], atol=2 / 32768)


def test_chunked_sequential_reads_tile_the_recording(multi_file_recording):
    rec, left, _ = multi_file_recording
    chunks = [
        rec.load_audio(offset=k * 0.1, duration=0.1) for k in range(10)
    ]
    glued = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(glued, rec.load_audio(), atol=1e-7)


# ---------------------------------------------------------------------------
# Set algebra
# ---------------------------------------------------------------------------
def _simple_set(tmp_path, prefix, n):
    recs = []
    for i in range(n):
        p = _write(tmp_path / f"{prefix}{i}.wav", 0.05 * np.ones(SR // 2))
        recs.append(Recording.from_file(p, recording_id=f"{prefix}{i}"))
    return RecordingSet.from_recordings(recs)


def test_add_recording_sets(tmp_path):
    a = _simple_set(tmp_path, "a", 3)
    b = _simple_set(tmp_path, "b", 2)
    combined = a + b
    assert len(combined) == 5
    assert [r.id for r in combined] == ["a0", "a1", "a2", "b0", "b1"]
    # Lookup by id works across the join.
    assert combined["b1"].id == "b1"


def test_recording_set_getitem_by_index_and_id(tmp_path):
    s = _simple_set(tmp_path, "x", 3)
    assert s[1].id == "x1"
    assert s["x2"].id == "x2"
    with pytest.raises((KeyError, IndexError)):
        s["nope"]


# ---------------------------------------------------------------------------
# Path prefixing
# ---------------------------------------------------------------------------
def test_audio_source_path_prefix_file(tmp_path):
    src = AudioSource(type="file", channels=[0], source="audio/x.wav")
    assert AudioSource.from_dict(src.to_dict()) == src
    prefixed = src.with_path_prefix("/data")
    assert prefixed.source == "/data/audio/x.wav"


def test_audio_source_path_prefix_nonfile_untouched():
    for t, s in (("command", "sox x.wav -t wav -"), ("url", "http://a/x.wav")):
        src = AudioSource(type=t, channels=[0], source=s)
        assert src.with_path_prefix("/data").source == s


def test_recording_set_with_path_prefix_stays_loadable(tmp_path):
    sub = tmp_path / "corpus"
    sub.mkdir()
    _write(sub / "r0.wav", 0.05 * np.ones(SR // 2))
    rec = Recording.from_file(sub / "r0.wav", recording_id="r0")
    # Rewrite to a relative source, then re-anchor with a prefix.
    rel = Recording.from_dict(
        {
            **rec.to_dict(),
            "sources": [
                {"type": "file", "channels": [0], "source": "corpus/r0.wav"}
            ],
        }
    )
    prefixed = RecordingSet.from_recordings([rel]).with_path_prefix(tmp_path)
    audio = prefixed["r0"].load_audio()
    np.testing.assert_allclose(audio, rec.load_audio(), atol=1e-7)
