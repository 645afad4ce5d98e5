"""
DNSMOS P.835 speech-quality annotation (gated on ``onnxruntime``).

Parity target: `/root/reference/lhotse/workflows/dnsmos.py:13-230` — predict
SIG/BAK/OVRL MOS scores per recording/cut with Microsoft's DNSMOS ONNX
models and attach them to ``cut.custom``. The models are downloaded from the
DNS-Challenge GitHub repository on first use; this workflow therefore
requires both ``onnxruntime`` and network (or pre-cached model files under
``download_root``).
"""
from __future__ import annotations

import logging
import os
import urllib.request
from typing import Generator, Optional, Union

import numpy as np

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.cut import CutSet
from lhotse_tpu.utils import fastcopy, is_module_available

_URL_BASE = ("https://raw.githubusercontent.com/microsoft/DNS-Challenge/master/DNSMOS")
INPUT_LENGTH = 9.01
SAMPLING_RATE = 16000


class ComputeScore:
    """One DNSMOS inference session. Reference: dnsmos.py:13-85."""

    def __init__(self, primary_model_path: str, p808_model_path: str) -> None:
        import onnxruntime as ort

        self.onnx_sess = ort.InferenceSession(primary_model_path)
        self.p808_onnx_sess = ort.InferenceSession(p808_model_path)

    def _audio_melspec(self, audio, n_mels=120, frame_size=320, hop_length=160, sr=SAMPLING_RATE,
                       to_db=True):
        from lhotse_tpu.features.whisper import slaney_mel_filters
        from lhotse_tpu.ops.fbank import raw_dft_matrices

        n_fft = frame_size
        x = np.pad(np.asarray(audio, np.float32), (n_fft // 2,) * 2, "reflect")
        num_frames = 1 + len(audio) // hop_length
        frames = np.lib.stride_tricks.as_strided(
            x, shape=(num_frames, n_fft), strides=(hop_length * x.strides[0], x.strides[0]))
        n = np.arange(n_fft)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * n / n_fft)).astype(np.float32)
        C, S = raw_dft_matrices(n_fft, n_fft)
        re, im = (frames * win) @ C, (frames * win) @ S
        power = re * re + im * im
        mel = power @ slaney_mel_filters(sr, n_fft, n_mels).T
        if not to_db:
            return mel
        return (np.log10(np.maximum(mel, 1e-10)) + 40.0) / 40.0

    def _polyfit(self, sig, bak, ovr, personalized: bool):
        if personalized:
            p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466, -0.11236046])
            p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786, -0.24348726])
            p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611, 0.96883132])
        else:
            p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
            p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
            p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
        return p_sig(sig), p_bak(bak), p_ovr(ovr)

    # Public parity names (reference dnsmos.py exposes these on ComputeScore).
    def audio_melspec(self, audio, n_mels=120, frame_size=320, hop_length=160, sr=16000,
                      to_db=True):
        mel = self._audio_melspec(
            audio, n_mels=n_mels, frame_size=frame_size, hop_length=hop_length, sr=sr,
            to_db=to_db)
        return mel

    def get_polyfit_val(self, sig, bak, ovr, is_personalized_mos: bool):
        return self._polyfit(sig, bak, ovr, is_personalized_mos)

    def __call__(self, audio: np.ndarray, personalized: bool) -> dict:
        fs = SAMPLING_RATE
        len_samples = int(INPUT_LENGTH * fs)
        while len(audio) < len_samples:
            audio = np.append(audio, audio)
        num_hops = int(np.floor(len(audio) / fs) - INPUT_LENGTH) + 1
        sig, bak, ovr, p808 = [], [], [], []
        for i in range(num_hops):
            seg = audio[int(i * fs) : int((i + INPUT_LENGTH) * fs)]
            if len(seg) < len_samples:
                continue
            inp = np.array(seg, np.float32)[None, :]
            p808_inp = self._audio_melspec(seg[:-160])[None, :].astype(np.float32)
            p808.append(float(self.p808_onnx_sess.run(None, {"input_1": p808_inp})[0][0][0]))
            mos = self.onnx_sess.run(None, {"input_1": inp})[0][0]
            s, b, o = self._polyfit(mos[0], mos[1], mos[2], personalized)
            sig.append(s), bak.append(b), ovr.append(o)
        return {
            "OVRL": float(np.mean(ovr)), "SIG": float(np.mean(sig)), "BAK": float(np.mean(bak)),
            "P808_MOS": float(np.mean(p808))}


def download_model(is_personalized_mos: bool = False, download_root: Optional[str] = None):
    """Fetch the two ONNX models; returns their local paths."""
    root = download_root or "/tmp"
    os.makedirs(root, exist_ok=True)
    sub = "pDNSMOS" if is_personalized_mos else "DNSMOS"
    paths = []
    for fname in ("sig_bak_ovr.onnx", "model_v8.onnx"):
        sub_dir = sub if fname == "sig_bak_ovr.onnx" else "DNSMOS"
        url = f"{_URL_BASE}/{sub_dir}/{fname}"
        local = os.path.join(root, f"{sub_dir}_{fname}")
        if not os.path.exists(local):
            logging.info(f"Downloading {url} -> {local}")
            urllib.request.urlretrieve(url, local)
        paths.append(local)
    return paths


def annotate_dnsmos(
    manifest: Union[RecordingSet, CutSet], is_personalized_mos: bool = False,
    download_root: Optional[str] = None) -> Generator:
    """
    Predict DNSMOS P.835 scores (SIG/BAK/OVRL + P.808) for every recording or
    cut and attach them as ``cut.custom["dnsmos"]``. Yields cuts.
    """
    assert is_module_available("onnxruntime"), (
        "This function expects onnxruntime to be installed. "
        "You can install it via 'pip install onnxruntime'."
    )
    primary, p808 = download_model(is_personalized_mos, download_root)
    scorer = ComputeScore(primary, p808)

    if isinstance(manifest, RecordingSet):
        cuts = (r.to_cut() for r in manifest)
    elif isinstance(manifest, CutSet):
        cuts = iter(manifest)
    else:
        raise ValueError("The `manifest` must be either a RecordingSet or a CutSet.")

    for cut in cuts:
        if cut.num_channels > 1:
            logging.warning(f"Skipping '{cut.id}': only mono input is supported.")
            continue
        audio = cut.resample(SAMPLING_RATE).load_audio()[0]
        scores = scorer(audio, is_personalized_mos)
        new_cut = fastcopy(cut, custom=dict(cut.custom or {}))
        new_cut.dnsmos = scores
        yield new_cut
