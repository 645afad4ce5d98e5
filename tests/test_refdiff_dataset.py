"""
Dataset-layer batch differential tests vs the ACTUAL reference: the same
on-disk corpus through both complete stacks (manifest -> sampler -> input
strategy -> collated ASR batch), plus collation helpers and GlobalMVN.

Reference: lhotse/dataset/{speech_recognition,collation,input_strategies,
signal_transforms}.py — all runnable in-env through the functional soundfile
stand-in (tests/_reference.py).

Known reference quirk pinned here: its batched OnTheFlyFeatures extraction
pads AUDIO with zeros to the batch max before framing, so the FINAL valid
frame of every shorter cut absorbs zero-padding context and differs from the
reference's own solo ``extract()`` output by >1 in log-fbank units.  Our
batched path equals our solo path exactly, so the comparison below excludes
that one frame per shorter cut (and asserts self-consistency instead).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import torch
    from lhotse import (
        CutSet as RefCutSet,
        Fbank as RefFbank,
        Recording as RefRecording,
        SupervisionSegment as RefSup,
    )
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )
    from lhotse.dataset import (
        K2SpeechRecognitionDataset as RefDS,
        OnTheFlyFeatures as RefOTF,
        SimpleCutSampler as RefSampler,
    )
    from lhotse.dataset.collation import (
        TokenCollater as RefTokenCollater,
        collate_audio as ref_collate_audio,
    )
    from lhotse.dataset.signal_transforms import GlobalMVN as RefGlobalMVN

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import (
    CutSet as MyCutSet,
    Fbank as MyFbank,
    Recording as MyRecording,
    SupervisionSegment as MySup,
)
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset import K2SpeechRecognitionDataset as MyDS
from lhotse_tpu.dataset.collation import (
    TokenCollater as MyTokenCollater,
    collate_audio as my_collate_audio,
)
from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures as MyOTF
from lhotse_tpu.dataset.sampling import SimpleCutSampler as MySampler
from lhotse_tpu.dataset.signal_transforms import GlobalMVN as MyGlobalMVN

SR = 16000
N_CUTS = 5


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(1)
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    for i in range(N_CUTS):
        n = int(SR * (1.0 + 0.3 * i))
        write_wav(str(audio_dir / f"r{i}.wav"), (rng.randn(1, n) * 0.1).astype(np.float32), SR)

    def build(Rec, Sup, CutSet):
        cuts = []
        for i in range(N_CUTS):
            r = Rec.from_file(audio_dir / f"r{i}.wav")
            c = r.to_cut()
            c.supervisions = [
                Sup(
                    f"s{i}",
                    r.id,
                    start=0.1,
                    duration=min(0.8, r.duration - 0.2),
                    channel=0,
                    text=f"hello world {i}",
                )
            ]
            cuts.append(c)
        return CutSet.from_cuts(cuts)

    return (
        build(RefRecording, RefSup, RefCutSet),
        build(MyRecording, MySup, MyCutSet),
    )


def test_asr_dataset_batch_matches(corpus):
    ref_cuts, my_cuts = corpus
    rb = RefDS(input_strategy=RefOTF(RefFbank()))[
        next(iter(RefSampler(ref_cuts, max_cuts=N_CUTS, shuffle=False)))
    ]
    mb = MyDS(input_strategy=MyOTF(MyFbank()))[
        next(iter(MySampler(my_cuts, max_cuts=N_CUTS, shuffle=False)))
    ]
    assert sorted(rb.keys()) == sorted(mb.keys())
    rs, ms = rb["supervisions"], mb["supervisions"]
    for k in ("sequence_idx", "start_frame", "num_frames"):
        assert np.asarray(rs[k]).tolist() == np.asarray(ms[k]).tolist(), k
    assert list(rs["text"]) == list(ms["text"])

    ri, mi = np.asarray(rb["inputs"]), np.asarray(mb["inputs"])
    assert ri.shape == mi.shape
    # per-cut frame counts from the feature lens implied by sorting (desc dur)
    lens = sorted(
        (int(round(c.duration * 100)) for c in my_cuts), reverse=True
    )
    T = ri.shape[1]
    for b, n in enumerate(lens):
        # exclude the reference's zero-pad-contaminated final valid frame for
        # every cut shorter than the batch max (see module docstring)
        valid = n if n == T else n - 1
        d = float(np.abs(ri[b, :valid] - mi[b, :valid]).max())
        assert d < 2e-3, f"cut {b}: valid-region diff {d}"
        if n < T:
            # padding region must still agree exactly (log-eps fill)
            dp = float(np.abs(ri[b, n:] - mi[b, n:]).max())
            assert dp == 0.0, f"cut {b}: pad-region diff {dp}"


def test_our_batched_extraction_is_self_consistent(corpus):
    """The quirk excluded above must NOT exist on our side: batched == solo."""
    _, my_cuts = corpus
    feats, lens = MyOTF(MyFbank())(my_cuts)[:2]
    feats, lens = np.asarray(feats), np.asarray(lens)
    for i, c in enumerate(my_cuts):
        solo = np.asarray(MyFbank().extract(c.load_audio()[0], SR))
        np.testing.assert_array_equal(feats[i, : lens[i]], solo)


def test_collate_audio_matches(corpus):
    ref_cuts, my_cuts = corpus
    ra, rl = ref_collate_audio(ref_cuts)
    ma, ml = my_collate_audio(my_cuts)
    assert np.asarray(rl).tolist() == np.asarray(ml).tolist()
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ma))


def test_token_collater_matches(corpus):
    ref_cuts, my_cuts = corpus
    rc = RefTokenCollater(ref_cuts, add_bos=True, add_eos=True)
    mc = MyTokenCollater(my_cuts, add_bos=True, add_eos=True)
    rt, rlen = rc(ref_cuts)
    mt, mlen = mc(my_cuts)
    assert np.asarray(rt).tolist() == np.asarray(mt).tolist()
    assert np.asarray(rlen).tolist() == np.asarray(mlen).tolist()
    # inverse mapping round-trips identically
    assert list(rc.inverse(rt, rlen)) == list(mc.inverse(mt, mlen))


def test_global_mvn_matches(corpus):
    ref_cuts, my_cuts = corpus
    rng = np.random.RandomState(0)
    feats = (rng.randn(4, 50, 80) * 2 + 3).astype(np.float32)

    r = RefGlobalMVN(feature_dim=80)
    m = MyGlobalMVN(feature_dim=80)
    # both initialize norm stats to zeros/ones and expose norm_means/norm_stds
    r.norm_means.data = torch.from_numpy(feats.mean(axis=(0, 1)))
    r.norm_stds.data = torch.from_numpy(feats.std(axis=(0, 1)) + 1e-5)
    m.norm_means = feats.mean(axis=(0, 1))
    m.norm_stds = feats.std(axis=(0, 1)) + 1e-5
    a = r(torch.from_numpy(feats)).numpy()
    b = np.asarray(m(feats))
    assert float(np.abs(a - b).max()) < 1e-6
