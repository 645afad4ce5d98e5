"""
Audio-video dataset.

Reference behavior: `/root/reference/lhotse/dataset/video.py`
(UnsupervisedAudioVideoDataset :9-36).
"""
from typing import Any, Dict

from lhotse_tpu.cut import CutSet
from lhotse_tpu.dataset.collation import collate_video


class UnsupervisedAudioVideoDataset:
    """
    Loads, pads, and collates video + audio::

        {
            'video': (B, NumFrames, Color, Height, Width) uint8 array,
            'video_lens': (B,) int32,
            'audio': (B, NumChannels, NumSamples) float32,
            'audio_lens': (B,) int32,
            'cuts': CutSet of length B,
        }
    """

    def __getitem__(self, cuts: CutSet) -> Dict[str, Any]:
        video, video_lens, audio, audio_lens, cuts = collate_video(cuts, fault_tolerant=True)
        return {
            "cuts": cuts, "video": video, "video_lens": video_lens, "audio": audio,
            "audio_lens": audio_lens}
