from lhotse_tpu.workflows.activity_detection import (
    Activity, ActivityDetector, EnergyVAD, SileroVAD, SileroVAD8k, SileroVAD16k,
    detect_activity_energy, detect_activity_energy_single)
from lhotse_tpu.workflows.dnsmos import annotate_dnsmos
from lhotse_tpu.workflows.forced_alignment import (
    FailedToAlign, ForcedAligner, TransformersForcedAligner, align_supervisions,
    align_with_torchaudio)
from lhotse_tpu.workflows.meeting_simulation import (
    BaseMeetingSimulator, ConversationalMeetingSimulator, MeetingSampler,
    SpeakerIndependentMeetingSimulator, reverberate_cuts)
from lhotse_tpu.workflows.whisper import annotate_with_whisper

__all__ = [
    "Activity", "ActivityDetector", "BaseMeetingSimulator", "ConversationalMeetingSimulator",
    "EnergyVAD", "FailedToAlign", "ForcedAligner", "MeetingSampler", "SileroVAD", "SileroVAD8k",
    "SileroVAD16k", "SpeakerIndependentMeetingSimulator", "TransformersForcedAligner",
    "align_supervisions", "align_with_torchaudio", "annotate_dnsmos", "annotate_with_whisper",
    "detect_activity_energy", "detect_activity_energy_single", "reverberate_cuts"]
