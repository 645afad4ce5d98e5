"""
Miscellaneous differential parity vs the ACTUAL reference: Kaldi data-dir
export (file-level), supervision frame masks, balanced windowing, and
duration-bucket estimation.

Reference: lhotse/kaldi.py:297-470, lhotse/cut/set.py:3353,
lhotse/cut/base.py:774 (cut_into_windows_balanced),
lhotse/dataset/sampling/dynamic_bucketing.py:495.
"""
import copy

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import (
        CutSet as RefCutSet,
        RecordingSet as RefRecordingSet,
        SupervisionSet as RefSupervisionSet,
    )
    from lhotse.cut.set import (
        compute_supervisions_frame_mask as ref_frame_mask,
        deserialize_cut as ref_deserialize_cut,
    )
    from lhotse.dataset.sampling.dynamic_bucketing import (
        estimate_duration_buckets as ref_estimate_buckets,
    )
    from lhotse.kaldi import export_to_kaldi as ref_export_to_kaldi

from lhotse_tpu import (
    CutSet as MyCutSet,
    RecordingSet as MyRecordingSet,
    SupervisionSet as MySupervisionSet,
)
from lhotse_tpu.cut.set import (
    compute_supervisions_frame_mask as my_frame_mask,
    deserialize_cut as my_deserialize_cut,
)
from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
    estimate_duration_buckets as my_estimate_buckets,
)
from lhotse_tpu.kaldi import export_to_kaldi as my_export_to_kaldi

SR = 16000


def _rec_dict(i, dur_ms, channels=(0,)):
    n = int(round(dur_ms * SR / 1000))
    return {
        "id": f"rec{i}",
        "sources": [
            {"type": "file", "channels": list(channels), "source": f"/x/rec{i}.wav"}
        ],
        "sampling_rate": SR,
        "num_samples": n,
        "duration": n / SR,
    }


def _sup_dict(i, rec, start_ms, dur_ms, spk="spk0"):
    return {
        "id": f"sup{i}",
        "recording_id": f"rec{rec}",
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": 0,
        "text": f"text {i}",
        "speaker": spk,
    }


# ---------------------------------------------------------------------------
# Kaldi export: file-level comparison
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("map_underscores_to", [None, "-"])
@pytest.mark.parametrize("prefix_spk_id", [False, True])
def test_export_to_kaldi_files_match(tmp_path, map_underscores_to, prefix_spk_id):
    recs = [_rec_dict(i, 2000 + 500 * i) for i in range(3)]
    sups = [
        _sup_dict(0, 0, 0, 900, spk="alice"),
        _sup_dict(1, 0, 900, 800, spk="bob"),
        _sup_dict(2, 1, 100, 1500, spk="alice"),
        _sup_dict(3, 2, 0, 2900, spk="carol"),
    ]
    their_dir, my_dir = tmp_path / "ref", tmp_path / "mine"
    their_dir.mkdir()
    my_dir.mkdir()
    ref_export_to_kaldi(
        RefRecordingSet.from_dicts(copy.deepcopy(recs)),
        RefSupervisionSet.from_dicts(copy.deepcopy(sups)),
        their_dir,
        map_underscores_to=map_underscores_to,
        prefix_spk_id=prefix_spk_id,
    )
    my_export_to_kaldi(
        MyRecordingSet.from_dicts(copy.deepcopy(recs)),
        MySupervisionSet.from_dicts(copy.deepcopy(sups)),
        my_dir,
        map_underscores_to=map_underscores_to,
        prefix_spk_id=prefix_spk_id,
    )
    their_files = sorted(p.name for p in their_dir.iterdir())
    my_files = sorted(p.name for p in my_dir.iterdir())
    assert their_files == my_files
    for name in their_files:
        t = sorted((their_dir / name).read_text().splitlines())
        m = sorted((my_dir / name).read_text().splitlines())
        assert t == m, f"kaldi file {name} differs"


# ---------------------------------------------------------------------------
# Supervision frame masks
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3000), st.integers(10, 3000)),
        min_size=0,
        max_size=4,
    ),
    st.booleans(),
)
def test_frame_mask_matches(sups, use_alignment_if_exists):
    cut_d = {
        "id": "c",
        "start": 0.0,
        "duration": 4.0,
        "channel": 0,
        "recording": _rec_dict(0, 4000),
        "supervisions": [_sup_dict(i, 0, s, d) for i, (s, d) in enumerate(sups)],
        "type": "MonoCut",
    }
    # frame masks need frame geometry: attach a features stub via frame_shift
    rc = ref_deserialize_cut(copy.deepcopy(cut_d))
    mc = my_deserialize_cut(copy.deepcopy(cut_d))
    kw = dict(frame_shift=0.01)
    try:
        exp = ref_frame_mask(rc, **kw)
    except Exception:
        with pytest.raises(Exception):
            my_frame_mask(mc, **kw)
        return
    got = my_frame_mask(mc, **kw)
    np.testing.assert_array_equal(np.asarray(exp), np.asarray(got))


# ---------------------------------------------------------------------------
# Balanced windows
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None)
@given(
    st.integers(3_000, 60_000),
    st.integers(1_000, 8_000),
    st.integers(2_000, 15_000),
)
def test_cut_into_windows_balanced_matches(rec_ms, min_ms, max_ms):
    if min_ms >= max_ms:
        min_ms, max_ms = max_ms, min_ms + 1000
    cut_d = {
        "id": "c",
        "start": 0.0,
        "duration": rec_ms / 1000,
        "channel": 0,
        "recording": _rec_dict(0, rec_ms),
        "supervisions": [],
        "type": "MonoCut",
    }
    rc = ref_deserialize_cut(copy.deepcopy(cut_d))
    mc = my_deserialize_cut(copy.deepcopy(cut_d))
    kw = dict(min_duration=min_ms / 1000, max_duration=max_ms / 1000)
    try:
        exp = [(c.start, c.duration) for c in rc.cut_into_windows_balanced(**kw)]
    except Exception:
        with pytest.raises(Exception):
            mc.cut_into_windows_balanced(**kw)
        return
    got = [(c.start, c.duration) for c in mc.cut_into_windows_balanced(**kw)]
    assert [(round(a, 8), round(b, 8)) for a, b in got] == [
        (round(a, 8), round(b, 8)) for a, b in exp
    ]


# ---------------------------------------------------------------------------
# Duration-bucket estimation
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(100, 30_000), min_size=2, max_size=60),
    st.integers(2, 8),
)
def test_estimate_duration_buckets_matches(durs_ms, num_buckets):
    def cuts(CutSet, deserialize):
        return [
            deserialize(
                {
                    "id": f"c{i}",
                    "start": 0.0,
                    "duration": d / 1000,
                    "channel": 0,
                    "recording": _rec_dict(i, d),
                    "supervisions": [],
                    "type": "MonoCut",
                }
            )
            for i, d in enumerate(durs_ms)
        ]

    try:
        exp = ref_estimate_buckets(
            cuts(RefCutSet, ref_deserialize_cut), num_buckets=num_buckets
        )
    except Exception:
        with pytest.raises(Exception):
            my_estimate_buckets(
                cuts(MyCutSet, my_deserialize_cut), num_buckets=num_buckets
            )
        return
    got = my_estimate_buckets(
        cuts(MyCutSet, my_deserialize_cut), num_buckets=num_buckets
    )
    assert [round(float(x), 8) for x in got] == [round(float(x), 8) for x in exp]


# ---------------------------------------------------------------------------
# Kaldi import: the same data dir through both load_kaldi_data_dir
# ---------------------------------------------------------------------------
def test_load_kaldi_data_dir_matches(tmp_path):
    import numpy as _np

    from lhotse.kaldi import load_kaldi_data_dir as ref_load
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.kaldi import load_kaldi_data_dir as my_load

    audio = tmp_path / "audio"
    audio.mkdir()
    rng = _np.random.RandomState(9)
    for rid, sec in (("rec_a", 2.0), ("rec_b", 1.5)):
        write_wav(
            str(audio / f"{rid}.wav"),
            (rng.randn(1, int(SR * sec)) * 0.1).astype(_np.float32),
            SR,
        )
    d = tmp_path / "data"
    d.mkdir()
    (d / "wav.scp").write_text(
        f"rec_a {audio}/rec_a.wav\nrec_b {audio}/rec_b.wav\n"
    )
    (d / "segments").write_text(
        "utt1 rec_a 0.25 1.00\nutt2 rec_a 1.00 1.90\nutt3 rec_b 0.00 1.50\n"
    )
    (d / "text").write_text("utt1 hello there\nutt2 more words\nutt3 third\n")
    (d / "utt2spk").write_text("utt1 spkA\nutt2 spkA\nutt3 spkB\n")
    (d / "utt2dur").write_text("utt1 0.75\nutt2 0.90\nutt3 1.50\n")
    (d / "reco2dur").write_text("rec_a 2.0\nrec_b 1.5\n")
    (d / "utt2gender").write_text("utt1 m\nutt2 m\nutt3 f\n")

    t_recs, t_sups, t_feats = ref_load(d, sampling_rate=SR)
    m_recs, m_sups, m_feats = my_load(d, sampling_rate=SR)
    assert t_feats is None and m_feats is None

    def canon(manifest):
        return sorted(
            ({k: v for k, v in x.to_dict().items() if v is not None} for x in manifest),
            key=lambda r: r["id"],
        )

    assert canon(t_recs) == canon(m_recs)
    assert canon(t_sups) == canon(m_sups)
