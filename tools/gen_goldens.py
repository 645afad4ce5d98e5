"""
Generate golden feature fixtures from the reference implementation's torch DSP
(`/root/reference/lhotse/features/kaldi/layers.py`) for parity testing.

Run once (requires /root/reference mounted):
    python tools/gen_goldens.py

Outputs tests/golden/kaldi_features.npz with deterministic random inputs and
the reference fbank/mfcc/spectrogram outputs. Only *data* is taken from the
reference — the fixtures pin the numeric parity contract.
"""
import sys
import types
from pathlib import Path

import numpy as np


def install_reference_stubs():
    """Stub optional deps (soundfile/intervaltree/cytoolz) so the reference
    package imports in this environment; we only use its DSP layers."""
    sf = types.ModuleType("soundfile")
    sf.SoundFile = object
    sf.info = lambda *a, **k: None
    sf.write = None
    sf.read = None
    sf.available_formats = lambda: {}
    sys.modules.setdefault("soundfile", sf)

    it = types.ModuleType("intervaltree")

    class Interval:
        def __init__(self, begin, end, data=None):
            self.begin, self.end, self.data = begin, end, data

    class IntervalTree:
        def __init__(self):
            self.ivs = []

        def addi(self, b, e, d=None):
            self.ivs.append(Interval(b, e, d))

        def add(self, iv):
            self.ivs.append(iv)

        def overlaps(self, *a):
            return False

        def __iter__(self):
            return iter(self.ivs)

    it.Interval = Interval
    it.IntervalTree = IntervalTree
    sys.modules.setdefault("intervaltree", it)

    ct = types.ModuleType("cytoolz")

    def compose_left(*fns):
        def inner(x):
            for f in fns:
                x = f(x)
            return x

        return inner

    def groupby(key, seq):
        out = {}
        for item in seq:
            out.setdefault(key(item), []).append(item)
        return out

    def sliding_window(n, seq):
        import itertools

        its = itertools.tee(seq, n)
        for i, it2 in enumerate(its):
            for _ in range(i):
                next(it2, None)
        return zip(*its)

    ct.compose_left = compose_left
    ct.groupby = groupby
    ct.sliding_window = sliding_window
    sys.modules.setdefault("cytoolz", ct)

    sys.path.insert(0, "/root/reference")


def main():
    install_reference_stubs()
    import torch
    from lhotse.features.kaldi.layers import (
        Wav2LogFilterBank,
        Wav2LogSpec,
        Wav2MFCC,
        Wav2Spec,
    )

    rng = np.random.RandomState(0)
    out = {}
    lengths = [3210, 8000, 16000, 16040 * 16]
    for i, n in enumerate(lengths):
        x = (rng.randn(1, n) * 0.1).astype(np.float32)
        out[f"input_{i}"] = x
        out[f"fbank_{i}"] = Wav2LogFilterBank()(torch.from_numpy(x)).numpy()
        out[f"mfcc_{i}"] = Wav2MFCC()(torch.from_numpy(x)).numpy()
        out[f"spec_{i}"] = Wav2Spec(use_energy=False)(torch.from_numpy(x)).numpy()
        out[f"logspec_{i}"] = Wav2LogSpec(use_energy=False)(torch.from_numpy(x)).numpy()
    # Variants: 8 kHz fbank, use_energy, hamming window, snip_edges.
    x8 = (rng.randn(1, 8000) * 0.1).astype(np.float32)
    out["input_8k"] = x8
    out["fbank_8k"] = Wav2LogFilterBank(sampling_rate=8000)(torch.from_numpy(x8)).numpy()
    x = out["input_2"]
    out["fbank_energy"] = Wav2LogFilterBank(use_energy=True)(torch.from_numpy(x)).numpy()
    out["fbank_hamming"] = Wav2LogFilterBank(window_type="hamming")(
        torch.from_numpy(x)
    ).numpy()
    # Note: the reference Wav2MFCC(use_energy=True) crashes (layers.py:722 indexes
    # [:, 0] instead of [..., 0]), so no golden exists for that variant.

    # Real speech (LibriSpeech utterance from the reference test fixtures,
    # decoded with the stdlib so no audio backend is involved): pins parity on
    # actual formant/harmonic structure instead of white noise.
    import wave

    with wave.open(
        "/root/reference/test/fixtures/libri/libri-1088-134315-0000.wav"
    ) as w:
        assert w.getframerate() == 16000 and w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    speech = (pcm[: 16000 * 4].astype(np.float32) / 32768.0)[None, :]
    # Degenerate inputs: digital silence (mel-floor/log-eps path) and a
    # hard-clipped loud sine (full-scale saturation).
    t = np.arange(16000, dtype=np.float32) / 16000.0
    clipped = np.clip(1.5 * np.sin(2 * np.pi * 440.0 * t), -1.0, 1.0)
    clipped = clipped.astype(np.float32)[None, :]
    silence = np.zeros((1, 16000), dtype=np.float32)
    for name, x in [("speech", speech), ("silence", silence), ("clipped", clipped)]:
        xt = torch.from_numpy(x)
        out[f"input_{name}"] = x
        out[f"fbank_{name}"] = Wav2LogFilterBank()(xt).numpy()
        out[f"mfcc_{name}"] = Wav2MFCC()(xt).numpy()
        out[f"spec_{name}"] = Wav2Spec(use_energy=False)(xt).numpy()
        out[f"logspec_{name}"] = Wav2LogSpec(use_energy=False)(xt).numpy()

    dest = Path(__file__).parent.parent / "tests" / "golden"
    dest.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest / "kaldi_features.npz", **out)
    print(f"Wrote {dest / 'kaldi_features.npz'}")


if __name__ == "__main__":
    main()
