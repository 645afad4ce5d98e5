"""
QA layer: validators, fix_manifests, and supervision trimming
(reference surface: lhotse/qa.py; reference tests: test/test_qa.py).
"""
import logging

import numpy as np
import pytest

from lhotse_tpu import (
    Recording,
    RecordingSet,
    SupervisionSegment,
    SupervisionSet,
    fix_manifests,
    validate,
)
from lhotse_tpu.qa import (
    remove_missing_recordings_and_supervisions,
    trim_supervisions_to_recordings,
    validate_recordings_and_supervisions,
)
from lhotse_tpu.testing.dummies import (
    DummyManifest,
    dummy_cut,
    dummy_recording,
    dummy_supervision,
)


def _sup(i, rec="rec", start=0.0, duration=1.0, **kw):
    return SupervisionSegment(
        id=f"sup{i}", recording_id=rec, start=start, duration=duration,
        channel=0, **kw)


def test_validate_passes_on_well_formed_manifests():
    recs = DummyManifest(RecordingSet, begin_id=0, end_id=3)
    sups = DummyManifest(SupervisionSet, begin_id=0, end_id=3)
    validate(recs)
    validate(sups)
    validate_recordings_and_supervisions(recs, sups)


def test_validate_cut_with_data():
    cut = dummy_cut(0, with_data=True)
    validate(cut, read_data=True)


def test_validate_rejects_negative_duration_supervision():
    # Bypass dataclass-level guards by mutating after construction.
    s = _sup(0)
    s.duration = -1.0
    with pytest.raises(AssertionError):
        validate(s)


def test_validate_rejects_supervision_beyond_recording_end():
    rec = dummy_recording(0, duration=1.0)
    sup = _sup(0, rec=rec.id, start=0.5, duration=2.0)
    with pytest.raises(AssertionError):
        validate_recordings_and_supervisions(
            RecordingSet([rec]), SupervisionSet([sup]))


def test_validate_rejects_supervision_on_missing_channel():
    rec = dummy_recording(0, duration=1.0)  # mono: channel 0 only
    sup = SupervisionSegment(
        id="s", recording_id=rec.id, start=0.0, duration=0.5, channel=1)
    with pytest.raises(AssertionError):
        validate_recordings_and_supervisions(
            RecordingSet([rec]), SupervisionSet([sup]))


def test_validate_rejects_supervision_for_unknown_recording():
    rec = dummy_recording(0)
    sup = _sup(0, rec="no-such-recording")
    with pytest.raises(AssertionError):
        validate_recordings_and_supervisions(
            RecordingSet([rec]), SupervisionSet([sup]))


def test_remove_missing_drops_both_directions():
    recs = RecordingSet([dummy_recording(0), dummy_recording(1)])
    rec_ids = sorted(r.id for r in recs)
    sups = SupervisionSet([
        _sup(0, rec=rec_ids[0]),          # kept
        _sup(1, rec="orphaned-rec"),      # dropped: no recording
    ])
    recs2, sups2 = remove_missing_recordings_and_supervisions(recs, sups)
    assert sorted(r.id for r in recs2) == [rec_ids[0]]
    assert [s.id for s in sups2] == ["sup0"]


def test_trim_supervisions_trims_overrun_and_drops_late_start():
    rec = dummy_recording(0, duration=2.0)
    sups = [
        _sup(0, rec=rec.id, start=0.0, duration=1.0),   # untouched
        _sup(1, rec=rec.id, start=1.5, duration=1.0),   # trimmed to 0.5
        _sup(2, rec=rec.id, start=2.5, duration=1.0),   # dropped (starts late)
    ]
    out = trim_supervisions_to_recordings(rec, sups)
    assert len(out) == 2
    by_id = {s.id: s for s in out}
    assert by_id["sup0"].duration == 1.0
    assert np.isclose(by_id["sup1"].duration, 0.5)
    assert np.isclose(by_id["sup1"].end, 2.0)


def test_fix_manifests_end_to_end():
    rec = dummy_recording(0, duration=2.0)
    recs = RecordingSet([rec, dummy_recording(1)])  # rec1 has no supervisions
    sups = SupervisionSet([
        _sup(0, rec=rec.id, start=0.0, duration=3.0),  # overruns -> trim
        _sup(1, rec="ghost"),                          # orphan -> drop
    ])
    recs2, sups2 = fix_manifests(recs, sups)
    # Fixed manifests must pass joint validation.
    validate_recordings_and_supervisions(recs2, sups2)
    assert [s.id for s in sups2] == ["sup0"]
    assert np.isclose(next(iter(sups2)).duration, 2.0)


def test_validate_supervision_set_accepts_alignment():
    sups = DummyManifest(SupervisionSet, begin_id=0, end_id=2)
    for s in sups:
        assert s.alignment is not None or True
    validate(sups)


def test_warns_on_unsupervised_recordings(caplog):
    recs = RecordingSet([dummy_recording(0), dummy_recording(1)])
    some_rec = next(iter(recs))
    sups = SupervisionSet([_sup(0, rec=some_rec.id, duration=some_rec.duration)])
    with caplog.at_level(logging.WARNING):
        validate_recordings_and_supervisions(recs, sups)
    assert any("without any" in m for m in caplog.messages)


def test_lazy_manifest_join_warns_on_unsorted_inputs(tmp_path):
    """Regression (found 2026-08-16 via CLI drive): the streaming
    CutSet.from_manifests silently dropped supervisions when the inputs were
    not sorted by recording id; it must warn so the user can fix the sort."""
    from lhotse_tpu import CutSet, RecordingSet
    from lhotse_tpu.testing.dummies import dummy_recording

    recs = [dummy_recording(i) for i in range(4)]
    sups = [
        _sup(i, rec=r.id, duration=min(1.0, r.duration))
        for i, r in enumerate(recs)
    ]
    # Recordings reversed relative to supervisions: violates the sort contract.
    RecordingSet(list(reversed(recs))).to_file(tmp_path / "recs.jsonl.gz")
    SupervisionSet(sups).to_file(tmp_path / "sups.jsonl.gz")
    with pytest.warns(UserWarning, match="not attached"):
        CutSet.from_manifests(
            recordings=RecordingSet.from_jsonl_lazy(tmp_path / "recs.jsonl.gz"),
            supervisions=SupervisionSet.from_jsonl_lazy(tmp_path / "sups.jsonl.gz"),
            output_path=tmp_path / "cuts.jsonl.gz",
            lazy=True,
        )
    # Sorted inputs attach every supervision and stay silent.
    RecordingSet(recs).to_file(tmp_path / "recs2.jsonl.gz")
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error")
        cuts = CutSet.from_manifests(
            recordings=RecordingSet.from_jsonl_lazy(tmp_path / "recs2.jsonl.gz"),
            supervisions=SupervisionSet.from_jsonl_lazy(tmp_path / "sups.jsonl.gz"),
            output_path=tmp_path / "cuts2.jsonl.gz",
            lazy=True,
        )
    assert all(len(c.supervisions) == 1 for c in cuts)


def test_validate_read_data_over_stored_features(tmp_path):
    """read_data=True actually decodes stored features, and rejects
    corrupted storage."""
    import glob
    import warnings

    from lhotse_tpu import CutSet, Fbank
    from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cuts = CutSet.from_cuts(
            dummy_cut(i, with_data=True,
                      supervisions=[dummy_supervision(i, duration=1.0)])
            for i in range(3))
        for c in cuts:
            c.custom = {}
        stored = cuts.compute_and_store_features(
            extractor=Fbank(), storage_path=str(tmp_path / "feats"))
    validate(stored, read_data=True)

    storage_files = glob.glob(str(tmp_path / "feats*")) + glob.glob(
        str(tmp_path / "feats*" / "*"))
    target = next(p for p in storage_files if not p.endswith("feats"))
    import pathlib

    pathlib.Path(target).write_bytes(b"garbage")
    with pytest.raises(Exception):
        validate(stored, read_data=True)


class TestValidateShar:
    @staticmethod
    def _export(tmp_path, with_features=False):
        import numpy as np

        from lhotse_tpu import CutSet, Fbank, Recording
        from lhotse_tpu.audio.wavio import write_wav
        from lhotse_tpu.features.io import LilcomChunkyWriter

        out = []
        for i in range(5):
            p = tmp_path / f"r{i}.wav"
            write_wav(
                str(p), (np.random.RandomState(i).randn(8000) * 0.1).astype(np.float32),
                16000)
            out.append(Recording.from_file(p, recording_id=f"r{i}").to_cut())
        cuts = CutSet.from_cuts(out)
        fields = {"recording": "wav"}
        if with_features:
            with LilcomChunkyWriter(str(tmp_path / "feats")) as st:
                cuts = CutSet.from_cuts(
                    c.compute_and_store_features(Fbank(), st) for c in cuts
                )
            fields["features"] = "lilcom"
        shar_dir = tmp_path / "shar"
        cuts.to_shar(
            shar_dir, fields=fields, shard_size=2, compress_jsonl=False,
            create_index=True, verbose=False)
        return shar_dir

    def test_valid_directory_passes(self, tmp_path):
        from lhotse_tpu.qa import validate_shar

        shar_dir = self._export(tmp_path, with_features=True)
        validate_shar(shar_dir, read_data=True)

    def test_missing_field_shard_detected(self, tmp_path):
        import pytest as _pytest

        from lhotse_tpu.qa import validate_shar

        shar_dir = self._export(tmp_path)
        next(shar_dir.glob("recording.000001.tar")).unlink()
        with _pytest.raises(AssertionError, match="shards"):
            validate_shar(shar_dir)

    def test_corrupt_index_detected(self, tmp_path):
        import numpy as np
        import pytest as _pytest

        from lhotse_tpu.qa import validate_shar

        shar_dir = self._export(tmp_path)
        idx = next(shar_dir.glob("cuts.*.jsonl.idx"))
        raw = np.fromfile(idx, dtype=np.uint64)
        raw[0] = raw[1] + 1  # offsets no longer increasing
        raw.tofile(idx)
        with _pytest.raises(AssertionError, match="increasing"):
            validate_shar(shar_dir)

    def test_id_misalignment_detected(self, tmp_path):
        import json

        import pytest as _pytest

        from lhotse_tpu.qa import validate_shar

        shar_dir = self._export(tmp_path)
        # Rewrite a cuts shard with a wrong id in first position.
        cuts_path = next(shar_dir.glob("cuts.000000.jsonl"))
        lines = [json.loads(l) for l in cuts_path.read_text().splitlines()]
        lines[0]["id"] = "someone-else"
        cuts_path.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
        (cuts_path.parent / (cuts_path.name + ".idx")).unlink()
        with _pytest.raises(AssertionError, match="does not match"):
            validate_shar(shar_dir)

    def test_cli_command(self, tmp_path):
        from click.testing import CliRunner

        from lhotse_tpu.bin.lhotse_tpu import cli

        shar_dir = self._export(tmp_path)
        res = CliRunner().invoke(cli, ["validate-shar", str(shar_dir)])
        assert res.exit_code == 0 and "OK" in res.output


def test_validate_rejects_manifest_as_read_data():
    """validate(recs, sups) used to silently bind the SupervisionSet to the
    read_data flag and validate only the recordings — now a loud TypeError
    points at validate_recordings_and_supervisions."""
    import pytest as _pytest

    from lhotse_tpu import validate
    from lhotse_tpu.testing.dummies import DummyManifest

    from lhotse_tpu import RecordingSet, SupervisionSet

    recs = DummyManifest(RecordingSet, begin_id=0, end_id=2)
    sups = DummyManifest(SupervisionSet, begin_id=0, end_id=2)
    with _pytest.raises(TypeError, match="validate_recordings_and_supervisions"):
        validate(recs, sups)
