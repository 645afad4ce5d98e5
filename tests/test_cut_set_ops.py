"""
CutSet-level operation matrix: sorting, id/supervision rewriting, subsets,
decomposition, heterogeneous membership, and prefix remapping.

Behavioral model: /root/reference/test/cut/test_cut_set.py.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut
from lhotse_tpu.utils import fastcopy

SR = 16000


@pytest.fixture
def cuts(tmp_path):
    out = []
    for i in range(5):
        dur = 0.5 + 0.25 * ((i * 3) % 5)  # non-monotonic durations
        n = int(dur * SR)
        p = tmp_path / f"r{i}.wav"
        write_wav(str(p), (0.1 * np.ones(n)).astype(np.float32), SR)
        rec = Recording.from_file(p, recording_id=f"rec{4 - i}")  # reversed rec ids
        out.append(
            MonoCut(
                id=f"c{i}", start=0.0, duration=dur, channel=0, recording=rec,
                supervisions=[
                    SupervisionSegment(
                        id=f"s{i}", recording_id=rec.id, start=0.0,
                        duration=min(0.4, dur), text=f"word{i} extra")])
        )
    return CutSet.from_cuts(out)


def test_sort_by_duration(cuts):
    asc = cuts.sort_by_duration(ascending=True)
    durs = [c.duration for c in asc]
    assert durs == sorted(durs)
    desc = cuts.sort_by_duration(ascending=False)
    assert [c.duration for c in desc] == sorted(durs, reverse=True)


def test_sort_by_recording_id(cuts):
    s = cuts.sort_by_recording_id()
    rec_ids = [c.recording_id for c in s]
    assert rec_ids == sorted(rec_ids)


def test_modify_ids(cuts):
    out = cuts.modify_ids(lambda cid: cid + "-v2")
    assert [c.id for c in out] == [c.id + "-v2" for c in cuts]
    # Underlying data still loads.
    np.testing.assert_array_equal(
        list(out)[0].load_audio(), list(cuts)[0].load_audio()
    )


def test_map_rejects_non_cut(cuts):
    # Eager input -> eager evaluation -> immediate validation.
    with pytest.raises(AssertionError):
        cuts.map(lambda c: "not a cut")


def test_map_supervisions_and_transform_text(cuts):
    upper = cuts.map_supervisions(lambda s: fastcopy(s, text=s.text.upper()))
    assert [s.text for c in upper for s in c.supervisions] == [
        f"WORD{i} EXTRA" for i in range(5)
    ]
    first_word = cuts.transform_text(lambda t: t.split()[0])
    assert [s.text for c in first_word for s in c.supervisions] == [
        f"word{i}" for i in range(5)
    ]


def test_filter_supervisions(cuts):
    kept = cuts.filter_supervisions(lambda s: s.id in ("s1", "s3"))
    counts = [len(c.supervisions) for c in kept]
    assert counts == [0, 1, 0, 1, 0]
    assert len(kept) == 5  # cuts themselves are kept


def test_trim_to_unsupervised_segments(tmp_path):
    n = int(2.0 * SR)
    p = tmp_path / "u.wav"
    write_wav(str(p), (0.1 * np.ones(n)).astype(np.float32), SR)
    rec = Recording.from_file(p, recording_id="u")
    cut = MonoCut(
        id="u-cut", start=0.0, duration=2.0, channel=0, recording=rec,
        supervisions=[
            SupervisionSegment(id="u1", recording_id="u", start=0.5, duration=0.5),
            SupervisionSegment(id="u2", recording_id="u", start=1.5, duration=0.3),
        ])
    unsup = CutSet.from_cuts([cut]).trim_to_unsupervised_segments()
    spans = sorted((round(c.start, 2), round(c.end, 2)) for c in unsup)
    assert spans == [(0.0, 0.5), (1.0, 1.5), (1.8, 2.0)]
    assert all(not c.supervisions for c in unsup)


def test_subset_cut_ids_preserves_requested_order(cuts, tmp_path):
    want = ["c3", "c0", "c4"]
    sub = cuts.subset(cut_ids=want)
    assert [c.id for c in sub] == want

    # Same over a lazy manifest.
    path = tmp_path / "cuts.jsonl"
    cuts.to_file(path)
    lazy = CutSet.from_file(path)
    assert lazy.is_lazy
    assert [c.id for c in lazy.subset(cut_ids=want)] == want


def test_subset_first_and_last(cuts):
    assert [c.id for c in cuts.subset(first=2)] == ["c0", "c1"]
    assert [c.id for c in cuts.subset(last=2)] == ["c3", "c4"]


def test_holds_both_simple_and_mixed_cuts(cuts):
    items = list(cuts)
    mixed = items[0].mix(items[1], offset_other_by=0.1, allow_padding=True)
    both = CutSet.from_cuts([items[2], mixed])
    kinds = {type(c) for c in both}
    assert MonoCut in kinds and MixedCut in kinds
    # describe() runs over the heterogeneous set.
    both.describe(full=False)


def test_decompose_does_not_duplicate_recordings(tmp_path, cuts):
    items = list(cuts)
    # Two cuts over the SAME recording.
    twin = fastcopy(items[0], id="c0-b")
    cs = CutSet.from_cuts(items + [twin])
    recs, sups, feats = cs.decompose(output_dir=tmp_path / "out")
    assert len(recs) == 5  # not 6: recording shared by c0 and c0-b
    assert len(sups) == 5
    assert (tmp_path / "out" / "recordings.jsonl.gz").is_file()


def test_from_files_combines(tmp_path, cuts):
    a = tmp_path / "a.jsonl.gz"
    b = tmp_path / "b.jsonl.gz"
    cuts.subset(first=2).to_file(a)
    cuts.subset(last=3).to_file(b)
    combined = CutSet.from_files([a, b])
    assert sorted(c.id for c in combined) == [f"c{i}" for i in range(5)]


def test_with_recording_path_prefix(tmp_path, cuts):
    # Strip the tmp dir from sources, then re-anchor with the prefix.
    def relativize(cut):
        rec = cut.recording
        rel_sources = [
            fastcopy(s, source=str(s.source).replace(str(tmp_path) + "/", ""))
            for s in rec.sources
        ]
        return fastcopy(cut, recording=fastcopy(rec, sources=rel_sources))

    rel = cuts.map(relativize)
    prefixed = rel.with_recording_path_prefix(tmp_path)
    np.testing.assert_array_equal(
        list(prefixed)[0].load_audio(), list(cuts)[0].load_audio()
    )


def test_duplicate_ids_are_allowed(cuts):
    items = list(cuts)
    dup = CutSet.from_cuts([items[0], items[0]])
    assert len(dup) == 2
    assert [c.id for c in dup] == ["c0", "c0"]
