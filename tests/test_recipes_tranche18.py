"""
Recipe fixture tests, tranche 18: the last two recipes without fixture
drives — GigaSpeech (gated speechcolab SDK, stubbed in-process) and
LibriMix (virtual source-separation mixtures over LibriSpeech + WHAM
manifests, including the Hanning-crossfade noise extension path).

Reference layouts: /root/reference/lhotse/recipes/gigaspeech.py:30-173,
/root/reference/lhotse/recipes/librimix.py:117-283.
"""
import sys
import types
from importlib.machinery import ModuleSpec

import numpy as np
import pytest

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


# ---------------------------------------------------------------------------
# GigaSpeech
# ---------------------------------------------------------------------------


def _gigaspeech_entries(root):
    """Two SDK-style audio entries with real WAV payloads on disk."""
    audio_dir = root / "audio" / "podcast"
    audio_dir.mkdir(parents=True, exist_ok=True)
    entries = []
    for k, (aid, dur) in enumerate([("POD0000000001", 3.0), ("POD0000000002", 2.0)]):
        rel = f"audio/podcast/{aid}.wav"
        write_wav(root / rel, _sig(dur, seed=k)[None, :], SR)
        entries.append(
            {
                "aid": aid,
                "path": rel,
                "sample_rate": SR,
                "channels": 1,
                "duration": dur,
                "segments": [
                    {
                        "sid": f"{aid}_S{j:07d}",
                        "begin_time": 0.5 * j,
                        "end_time": 0.5 * j + 0.4,
                        "speaker": f"spk{j}",
                        "text_tn": f"SEGMENT {j} OF {aid}",
                    }
                    for j in range(2)
                ],
            }
        )
    return entries


@pytest.fixture
def stub_speechcolab(tmp_path, monkeypatch):
    """Install a fake ``speechcolab`` SDK into sys.modules."""
    root = tmp_path / "gigaspeech_corpus"
    root.mkdir()
    entries = _gigaspeech_entries(root)

    class FakeGigaSpeech:
        def __init__(self, corpus_dir):
            self.gigaspeech_dataset_dir = root

        def audios(self, subset):
            assert subset == "{DEV}"
            return iter(entries)

        def download(self, password, subset, host=None):
            raise AssertionError("prepare must not download")

    pkg = types.ModuleType("speechcolab")
    pkg.__spec__ = ModuleSpec("speechcolab", loader=None, is_package=True)
    pkg.__path__ = []
    datasets = types.ModuleType("speechcolab.datasets")
    datasets.__spec__ = ModuleSpec("speechcolab.datasets", loader=None, is_package=True)
    datasets.__path__ = []
    giga = types.ModuleType("speechcolab.datasets.gigaspeech")
    giga.__spec__ = ModuleSpec("speechcolab.datasets.gigaspeech", loader=None)
    giga.GigaSpeech = FakeGigaSpeech
    pkg.datasets = datasets
    datasets.gigaspeech = giga
    for name, mod in [
        ("speechcolab", pkg),
        ("speechcolab.datasets", datasets),
        ("speechcolab.datasets.gigaspeech", giga),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    from lhotse_tpu.utils.core import _module_available

    _module_available.cache_clear()
    yield root
    _module_available.cache_clear()


def test_gigaspeech_parse_utterance(tmp_path):
    from lhotse_tpu.recipes.gigaspeech import parse_utterance

    entry = _gigaspeech_entries(tmp_path)[0]
    recording, segments = parse_utterance(entry, tmp_path)
    assert recording.id == "POD0000000001"
    assert recording.duration == 3.0
    assert recording.num_samples == 3 * SR
    assert str(tmp_path) in recording.sources[0].source
    assert [s.text for s in segments] == [
        "SEGMENT 0 OF POD0000000001",
        "SEGMENT 1 OF POD0000000001",
    ]
    assert segments[1].start == 0.5 and abs(segments[1].duration - 0.4) < 1e-8


def test_prepare_gigaspeech_with_stub_sdk(stub_speechcolab, tmp_path):
    from lhotse_tpu.recipes.gigaspeech import prepare_gigaspeech

    out = tmp_path / "out"
    manifests = prepare_gigaspeech(
        stub_speechcolab, output_dir=out, dataset_parts=["DEV"]
    )
    assert set(manifests) == {"DEV"}
    recs = manifests["DEV"]["recordings"].to_eager()
    sups = manifests["DEV"]["supervisions"].to_eager()
    cuts = manifests["DEV"]["cuts"].to_eager()
    assert len(recs) == 2 and len(sups) == 4 and len(cuts) == 2
    validate_recordings_and_supervisions(recs, sups)
    # The cut spans the full recording and carries its supervisions
    # (cut ids follow the '{recording_id}-{idx}' from_manifests convention).
    c = next(c for c in cuts if c.recording_id == "POD0000000001")
    assert c.duration == 3.0 and len(c.supervisions) == 2
    # Audio is actually loadable through the written manifest.
    audio = c.load_audio()
    assert audio.shape == (1, 3 * SR)
    # Second call with the same output_dir must skip without touching the SDK
    # iterator again (manifests_exist caching).
    again = prepare_gigaspeech(stub_speechcolab, output_dir=out, dataset_parts=["DEV"])
    assert len(again["DEV"]["cuts"].to_eager()) == 2


def test_prepare_gigaspeech_without_sdk_raises(tmp_path):
    from lhotse_tpu.utils.core import _module_available

    _module_available.cache_clear()
    if _module_available("speechcolab"):
        pytest.skip("real speechcolab installed")
    from lhotse_tpu.recipes.gigaspeech import prepare_gigaspeech

    with pytest.raises(ImportError, match="speechcolab"):
        prepare_gigaspeech(tmp_path, output_dir=tmp_path)


# ---------------------------------------------------------------------------
# LibriMix
# ---------------------------------------------------------------------------


def _write_recording_manifest(path, recordings):
    from lhotse_tpu.audio import RecordingSet

    RecordingSet.from_recordings(recordings).to_file(path)


def _librimix_env(tmp_path, short_noise=False):
    """Synthesize the three inputs prepare_librimix needs:

    - LibriSpeech cutsets per split (cut ids carry a trailing '-suffix'
      that the recipe strips via modify_ids),
    - WHAM recordings manifests (tr/cv/tt),
    - a Libri2Mix metadata CSV tree.
    """
    from lhotse_tpu.audio import Recording
    from lhotse_tpu.cut import CutSet

    root = tmp_path / "librimix_env"
    wav_dir = root / "wav"
    wav_dir.mkdir(parents=True)

    # LibriSpeech-style source utterances (1.0 s and 0.8 s).
    src_recs = []
    for name, dur, seed in [("1089-134686-0000", 1.0, 1), ("1188-133604-0002", 0.8, 2)]:
        p = wav_dir / f"{name}.wav"
        write_wav(p, _sig(dur, seed=seed)[None, :], SR)
        src_recs.append(Recording.from_file(p, recording_id=name))
    ls_cuts = CutSet.from_manifests(
        recordings=__import__("lhotse_tpu").RecordingSet.from_recordings(src_recs)
    )
    # from_manifests ids are '{recording_id}-{idx}'; the recipe strips the
    # final '-token' to recover the source stem.
    ls_root = root / "librispeech"
    ls_root.mkdir()
    ls_cuts.to_file(ls_root / "librispeech_cutset_train-100.jsonl.gz")

    # WHAM noise: 'train' split manifest; optionally shorter than the mix to
    # exercise the Hanning-crossfade extension path.
    noise_dur = 0.4 if short_noise else 2.0
    noise_path = wav_dir / "40na010x_1.2422_01xo031b_-1.2422.wav"
    write_wav(noise_path, _sig(noise_dur, seed=9)[None, :], SR)
    noise_rec = Recording.from_file(noise_path)
    wham_root = root / "wham"
    wham_root.mkdir()
    _write_recording_manifest(wham_root / "wham_recordings_tr.jsonl.gz", [noise_rec])
    _write_recording_manifest(wham_root / "wham_recordings_cv.jsonl.gz", [noise_rec])
    _write_recording_manifest(wham_root / "wham_recordings_tt.jsonl.gz", [noise_rec])

    # Metadata CSV (JorisCos/LibriMix layout): metadata/Libri2Mix/libri2mix_train-100.csv
    meta_root = root / "metadata"
    csv_dir = meta_root / "Libri2Mix"
    csv_dir.mkdir(parents=True)
    (csv_dir / "libri2mix_train-100.csv").write_text(
        "mixture_ID,source_1_path,source_1_gain,source_2_path,source_2_gain,"
        "noise_path,noise_gain\n"
        "1089-134686-0000_1188-133604-0002,"
        "train-clean-100/1089/134686/1089-134686-0000.wav,1.2,"
        "train-clean-100/1188/133604/1188-133604-0002.wav,0.8,"
        f"tr/{noise_path.stem}.wav,0.5\n"
    )
    # An 'info' file must be ignored by the metadata scan.
    (csv_dir / "libri2mix_train-100_info.csv").write_text("ignored\n")
    return root, meta_root, ls_root, wham_root


@pytest.mark.parametrize("short_noise", [False, True])
def test_prepare_librimix(tmp_path, short_noise):
    from lhotse_tpu.recipes.librimix import prepare_librimix

    root, meta_root, ls_root, wham_root = _librimix_env(
        tmp_path, short_noise=short_noise
    )
    out = tmp_path / "out"
    work = tmp_path / "work"
    manifests = prepare_librimix(
        librispeech_root_path=ls_root,
        wham_recset_root_path=wham_root,
        librimix_metadata_path=meta_root,
        workdir=work,
        output_dir=out,
        n_src=2,
        num_jobs=1,
    )
    assert set(manifests) == {"libri2mix_train-100", "libri2mix_train-100_noisy"}

    clean = manifests["libri2mix_train-100"]["cutset"]
    noisy = manifests["libri2mix_train-100_noisy"]["cutset"]
    assert len(clean) == 1 and len(noisy) == 1
    cmix = list(clean)[0]
    nmix = list(noisy)[0]
    assert cmix.id == "1089-134686-0000_1188-133604-0002"
    # preserve_id='left' keeps the clean mixture id on the noisy cut.
    assert nmix.id == cmix.id

    # Clean mixture = gain-scaled sum of the two sources ('max' mode: the
    # longer source sets the duration).
    audio = cmix.load_audio()
    assert audio.shape == (1, SR)  # 1.0 s source dominates
    s1 = _sig(1.0, seed=1) * 1.2
    s2 = _sig(0.8, seed=2) * 0.8
    expected = s1.copy()
    expected[: len(s2)] += s2
    np.testing.assert_allclose(audio[0], expected, atol=2e-4)

    # Noisy mixture adds the (possibly crossfade-extended) noise.
    naudio = nmix.load_audio()
    assert naudio.shape == (1, SR)
    assert not np.allclose(naudio, audio)
    if short_noise:
        # The extension rendered a wav into the workdir.
        assert any(work.iterdir())

    # Manifests were persisted and a re-run skips via the cache.
    assert (out / "librimix_cutset_libri2mix_train-100.jsonl.gz").is_file()
    assert (out / "librimix_cutset_libri2mix_train-100_noisy.jsonl.gz").is_file()
    again = prepare_librimix(
        librispeech_root_path=ls_root,
        wham_recset_root_path=wham_root,
        librimix_metadata_path=meta_root,
        workdir=work,
        output_dir=out,
        n_src=2,
        num_jobs=1,
    )
    assert len(again["libri2mix_train-100"]["cutset"]) == 1


def test_librimix_extend_noise_crossfade_is_seamless():
    """_extend_noise loops with a half-Hanning crossfade: constant input must
    stay (approximately) constant through every seam."""
    from lhotse_tpu.recipes.librimix import _extend_noise

    noise = np.ones(SR * 2, dtype=np.float32)
    out = _extend_noise(noise, SR * 5)
    assert len(out) == SR * 5
    # Hann fade-in + fade-out sum to ~1 everywhere: no dips or spikes.
    assert float(np.min(out)) > 0.95 and float(np.max(out)) < 1.05


def test_wham_train_speed_variants(tmp_path):
    from lhotse_tpu.recipes.librimix import _load_wham_recordings

    noise_path = tmp_path / "noisefile.wav"
    write_wav(noise_path, _sig(1.0, seed=3)[None, :], SR)
    from lhotse_tpu.audio import Recording

    rec = Recording.from_file(noise_path)
    for name in ("tr", "cv", "tt"):
        _write_recording_manifest(tmp_path / f"wham_recordings_{name}.jsonl.gz", [rec])
    wham = _load_wham_recordings(tmp_path)
    # train carries 0.8 / 1.0 / 1.2 speed variants with 'sp08'-style ids.
    train_ids = sorted(r.id for r in wham["train"])
    assert train_ids == ["noisefile", "noisefilesp08", "noisefilesp12"]
    sp08 = wham["train"]["noisefilesp08"]
    assert abs(sp08.duration - 1.25) < 0.01
    assert len(list(wham["dev"])) == 1 and len(list(wham["test"])) == 1
