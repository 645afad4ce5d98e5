from lhotse_tpu.workflows.activity_detection import (
    detect_activity_energy,
    detect_activity_energy_single,
)
from lhotse_tpu.workflows.meeting_simulation import (
    BaseMeetingSimulator,
    ConversationalMeetingSimulator,
    MeetingSampler,
    SpeakerIndependentMeetingSimulator,
    reverberate_cuts,
)

__all__ = [
    "BaseMeetingSimulator",
    "ConversationalMeetingSimulator",
    "MeetingSampler",
    "SpeakerIndependentMeetingSimulator",
    "detect_activity_energy",
    "detect_activity_energy_single",
    "reverberate_cuts",
]
