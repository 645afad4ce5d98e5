"""
Recipe fixture tests, tranche 11: librimix_mini — metadata-CSV virtual
recordings (per-channel source files, optional premixed/noise variants,
min-duration filtering) feeding the source-separation datasets.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def test_prepare_librimix_mini(tmp_path):
    from lhotse_tpu.recipes import prepare_librimix_mini

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.RandomState(0)
    rows = ["mixture_ID,mixture_path,source_1_path,source_2_path,noise_path,length"]
    for i, seconds in enumerate((4.0, 5.0, 1.0)):  # the 1.0s row is filtered
        n = int(seconds * SR)
        names = {}
        for role in ("mix", "s1", "s2", "noise"):
            p = wavs / f"{role}_{i}.wav"
            write_wav(str(p), (0.1 * rng.randn(n)).astype(np.float32), SR)
            names[role] = str(p)
        rows.append(
            f"mix{i},{names['mix']},{names['s1']},{names['s2']},{names['noise']},{n}"
        )
    csv_path = tmp_path / "mixture_train_mix_both.csv"
    csv_path.write_text("\n".join(rows) + "\n")

    m = prepare_librimix_mini(
        csv_path, output_dir=tmp_path / "out",
        with_precomputed_mixtures=True, min_segment_seconds=3.0)
    assert {"sources", "premixed"} <= set(m)

    recs = m["sources"]["recordings"]
    sups = m["sources"]["supervisions"]
    assert sorted(r.id for r in recs) == ["mix0", "mix1"]  # short row dropped
    validate_recordings_and_supervisions(recs, sups)
    rec = recs["mix0"]
    # Two per-channel file sources forming one virtual 2-channel recording.
    assert [s.channels for s in rec.sources] == [[0], [1]]
    audio = rec.load_audio()
    assert audio.shape == (2, 4 * SR)
    # One placeholder supervision per channel.
    assert len(list(sups.find("mix0"))) == 2

    pre = m["premixed"]["recordings"]["mix1"]
    assert pre.load_audio().shape == (1, 5 * SR)
    assert (tmp_path / "out" / "librimix_recordings_sources.jsonl.gz").is_file()
