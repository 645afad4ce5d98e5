"""Audio layer tests: WAV codec, backends, Recording transforms chain."""
from io import BytesIO

import numpy as np
import pytest

from lhotse_tpu.audio import AudioSource, Recording, RecordingSet
from lhotse_tpu.audio.wavio import info_wav, read_wav, write_wav


class TestWavCodec:
    @pytest.mark.parametrize("subtype", ["pcm16", "pcm24", "pcm32", "float32", "float64"])
    def test_roundtrip(self, subtype):
        rng = np.random.RandomState(0)
        x = (rng.randn(2, 8000) * 0.3).clip(-1, 1).astype(np.float32)
        buf = BytesIO()
        write_wav(buf, x, 16000, subtype=subtype)
        buf.seek(0)
        y, sr = read_wav(buf)
        assert sr == 16000
        assert y.shape == (2, 8000)
        tol = {"pcm16": 1e-4, "pcm24": 1e-6, "pcm32": 1e-7, "float32": 0, "float64": 1e-7}[subtype]
        assert np.abs(y - x).max() <= tol + 1e-9

    def test_partial_read(self):
        x = np.arange(16000, dtype=np.float32) / 16000
        buf = BytesIO()
        write_wav(buf, x, 16000, subtype="float32")
        buf.seek(0)
        y, _ = read_wav(buf, frame_offset=100, num_frames=50)
        assert y.shape == (1, 50)
        np.testing.assert_allclose(y[0], x[100:150])

    def test_info(self):
        x = np.zeros(123, dtype=np.float32)
        buf = BytesIO()
        write_wav(buf, x, 8000)
        buf.seek(0)
        hdr = info_wav(buf)
        assert hdr.sampling_rate == 8000
        assert hdr.num_frames == 123
        assert hdr.num_channels == 1


class TestRecording:
    def test_from_file(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        assert r.sampling_rate == 16000
        assert r.num_samples == 16000
        assert r.duration == 1.0
        assert r.load_audio().shape == (1, 16000)

    def test_offset_duration(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        audio = r.load_audio(offset=0.5, duration=0.25)
        assert audio.shape == (1, 4000)
        full = r.load_audio()
        np.testing.assert_allclose(audio[0], full[0, 8000:12000])

    def test_from_bytes(self, tmp_wav):
        data = open(tmp_wav, "rb").read()
        r = Recording.from_bytes(data, recording_id="mem")
        assert r.num_samples == 16000
        assert r.load_audio().shape == (1, 16000)

    def test_move_to_memory(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        r2 = r.move_to_memory()
        assert r2.is_in_memory
        np.testing.assert_allclose(r.load_audio(), r2.load_audio())

    def test_serialization_roundtrip(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        r2 = Recording.from_dict(r.to_dict())
        assert r == r2

    def test_perturb_volume(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        rv = r.perturb_volume(2.0)
        assert rv.id == f"{r.id}_vp2.0"
        np.testing.assert_allclose(rv.load_audio(), 2 * r.load_audio(), atol=1e-6)

    def test_perturb_speed(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        rs = r.perturb_speed(1.1)
        assert rs.num_samples == 14545
        audio = rs.load_audio()
        assert audio.shape == (1, 14545)

    def test_perturb_speed_transform_serialized(self, tmp_wav):
        r = Recording.from_file(tmp_wav).perturb_speed(0.9)
        r2 = Recording.from_dict(r.to_dict())
        np.testing.assert_allclose(r.load_audio(), r2.load_audio(), atol=1e-6)

    def test_resample(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        r8 = r.resample(8000)
        assert r8.sampling_rate == 8000
        assert r8.num_samples == 8000
        audio = r8.load_audio()
        assert audio.shape == (1, 8000)

    def test_reverb_rir_synthetic(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        rr = r.reverb_rir(room_rng_seed=1, source_rng_seed=2)
        audio = rr.load_audio()
        assert audio.shape == (1, 16000)
        assert not np.allclose(audio, r.load_audio())

    def test_tempo_preserves_declared_length(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        rt = r.perturb_tempo(1.1)
        audio = rt.load_audio()
        assert audio.shape[1] == rt.num_samples


class TestRecordingSet:
    def test_roundtrip_jsonl_gz(self, tmp_wav, tmp_path):
        r = Recording.from_file(tmp_wav)
        recs = RecordingSet.from_recordings([r])
        p = tmp_path / "recs.jsonl.gz"
        recs.to_file(p)
        recs2 = RecordingSet.from_file(p).to_eager()
        assert recs2[0] == r

    def test_split_subset_filter(self, tmp_wav):
        r = Recording.from_file(tmp_wav)
        recs = RecordingSet.from_recordings([r.copy_with(id=f"rec-{i}") for i in range(10)])
        splits = recs.split(3)
        assert sum(len(s) for s in splits) == 10
        assert len(recs.subset(first=4)) == 4
        assert len(recs.filter(lambda x: x.id.endswith("1"))) == 1

    def test_from_dir(self, tmp_wav):
        recs = RecordingSet.from_dir(tmp_wav.parent, pattern="*.wav")
        assert len(recs) == 1


class TestAudioSourceTypes:
    def test_command_source(self, tmp_wav):
        src = AudioSource(type="command", channels=[0], source=f"cat {tmp_wav}")
        audio = src.load_audio()
        assert audio.shape == (1, 16000)

    def test_memory_source(self, tmp_wav):
        src = AudioSource(type="memory", channels=[0], source=open(tmp_wav, "rb").read())
        assert src.load_audio().shape == (1, 16000)
        assert src.format == "wav"
