from lhotse_tpu.workflows.forced_alignment.base import FailedToAlign, ForcedAligner
from lhotse_tpu.workflows.forced_alignment.ctc import (
    Point, Segment, align_ctc_emission, ctc_forced_align, merge_repeats, merge_words)
from lhotse_tpu.workflows.forced_alignment.asr_aligner import (TransformersForcedAligner,)
from lhotse_tpu.workflows.forced_alignment.mms_aligner import MMSForcedAligner
from lhotse_tpu.workflows.forced_alignment.workflow import (
    align_supervisions, align_with_torchaudio)

__all__ = [
    "FailedToAlign", "ForcedAligner", "Point", "Segment", "TransformersForcedAligner",
    "align_ctc_emission", "align_supervisions", "align_with_torchaudio", "ctc_forced_align",
    "merge_repeats", "merge_words"]
