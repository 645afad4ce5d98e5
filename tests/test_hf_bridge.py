"""HuggingFace datasets bridge: export + lazy import round trip (the
``datasets`` package is present in this image, so the gated paths run)."""
import numpy as np
import pytest

pytest.importorskip("datasets")

from lhotse_tpu import CutSet, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.hf import LazyHFDatasetIterator, export_cuts_to_hf
from lhotse_tpu.supervision import SupervisionSegment


@pytest.fixture
def cuts(tmp_path):
    base = []
    for i in range(3):
        path = tmp_path / f"rec{i}.wav"
        write_wav(path, (np.random.RandomState(i).randn(1, 16000) * 0.1).astype(np.float32), 16000)
        cut = Recording.from_file(path).to_cut()
        cut.supervisions = [
            SupervisionSegment(
                id=f"sup{i}",
                recording_id=cut.recording_id,
                start=0.0,
                duration=1.0,
                text=f"utterance {i}",
                speaker=f"spk{i % 2}",
                language="English",
            )
        ]
        base.append(cut)
    return CutSet.from_cuts(base)


def test_export_cuts_to_hf(cuts):
    from datasets import Audio

    ds = export_cuts_to_hf(cuts)
    assert len(ds) == 3
    # HF datasets 5.x decodes audio via torchcodec (absent here); read the
    # column undecoded and check it references the original files.
    ds = ds.cast_column("audio", Audio(decode=False))
    row = ds[0]
    assert row["text"] == "utterance 0"
    assert row["speaker"] == "spk0"
    assert row["duration"] == pytest.approx(1.0)
    src = row["audio"]["path"] or row["audio"]["bytes"]
    assert src is not None


def test_lazy_hf_dataset_iterator_roundtrip(cuts):
    ds = export_cuts_to_hf(cuts)
    restored = CutSet(LazyHFDatasetIterator(ds, text_key="text"))
    restored = list(restored)
    assert len(restored) == 3
    for orig, back in zip(cuts, restored):
        assert back.supervisions[0].text == orig.supervisions[0].text
        np.testing.assert_allclose(back.load_audio(), orig.load_audio(), atol=1e-4)


def test_lazy_hf_iterator_from_streaming_dicts(cuts):
    ds = export_cuts_to_hf(cuts)
    # Streaming datasets yield plain dicts; emulate with .to_iterable_dataset.
    it = LazyHFDatasetIterator(ds.to_iterable_dataset(), text_key="text")
    out = list(CutSet(it))
    assert len(out) == 3 and out[0].supervisions[0].text == "utterance 0"
