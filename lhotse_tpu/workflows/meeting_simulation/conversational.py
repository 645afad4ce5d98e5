"""
Conversational meeting simulation (BUT EEND-dataprep style).

Reference behavior:
`/root/reference/lhotse/workflows/meeting_simulation/conversational.py`
(ConversationalMeetingSimulator :22-365, _simulate_worker :368-373).
Method from arXiv:2204.00890: pause/overlap durations are drawn jointly for
all speakers from three learned histograms (same-speaker pause,
different-speaker pause, different-speaker overlap), producing realistic
overlap statistics.
"""
import logging
from collections import defaultdict
from functools import partial
from typing import Any, List, Optional, Union

import numpy as np

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.cut import CutSet, MixedCut, MixTrack
from lhotse_tpu.cut.set import mix
from lhotse_tpu.lazy import dill_enabled
from lhotse_tpu.parallel import parallel_map
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import add_durations, uuid4
from lhotse_tpu.workflows.meeting_simulation.base import (
    MAX_TASKS_WAITING,
    BaseMeetingSimulator,
    MeetingSampler,
    reverberate_cuts,
)


class ConversationalMeetingSimulator(BaseMeetingSimulator):
    """
    Samples pauses/overlaps from three distributions (learned histograms or
    Gamma defaults) so the simulated meetings match real speech/silence/
    overlap characteristics.
    """

    def __init__(
        self,
        same_spk_pause: float = 1.0,
        diff_spk_pause: float = 1.0,
        diff_spk_overlap: float = 2.0,
        prob_diff_spk_overlap: float = 0.5,
    ):
        super().__init__()
        for duration in [same_spk_pause, diff_spk_pause, diff_spk_overlap]:
            assert duration is None or duration > 0, "Durations must be > 0."

        self.same_spk_pause = same_spk_pause
        self.diff_spk_pause = diff_spk_pause
        self.diff_spk_overlap = diff_spk_overlap
        self.prob_diff_spk_overlap = prob_diff_spk_overlap

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__} "
            f"(same_spk_pause={self.same_spk_pause:.2f}, "
            f"diff_spk_pause={self.diff_spk_pause:.2f}, "
            f"diff_spk_overlap={self.diff_spk_overlap:.2f}, "
            f"prob_diff_spk_overlap={self.prob_diff_spk_overlap:.2f})"
        )

    def _init_defaults(self):
        from scipy.stats import gamma

        self.same_spk_pause_dist = gamma(a=1.0, scale=1.0, loc=self.same_spk_pause)
        self.diff_spk_pause_dist = gamma(a=1.0, scale=1.0, loc=self.diff_spk_pause)
        self.diff_spk_overlap_dist = gamma(a=1.0, scale=1.0, loc=self.diff_spk_overlap)

    def _compute_histogram_dist(self, values: np.ndarray) -> Any:
        from scipy.stats import rv_histogram

        hist, bin_edges = np.histogram(values, bins=100, density=True)
        return rv_histogram((hist, bin_edges))

    @dill_enabled(True)
    def fit(self, meetings: Optional[SupervisionSet] = None) -> None:
        """Fit the three pause/overlap histograms to a real corpus."""
        if meetings is None:
            logging.info("No meetings provided, using default parameters.")
            self._init_defaults()
            return

        assert isinstance(meetings, SupervisionSet), (
            "The meetings must be provided as a SupervisionSet."
        )

        same_spk_pause_values = []
        diff_spk_pause_values = []
        diff_spk_overlap_values = []

        recording_segments = defaultdict(list)
        for s in sorted(meetings, key=lambda s: (s.recording_id, s.start)):
            recording_segments[s.recording_id].append(s)

        for segments in recording_segments.values():
            for i in range(1, len(segments)):
                if segments[i].speaker == segments[i - 1].speaker:
                    same_spk_pause_values.append(segments[i].start - segments[i - 1].end)
                    continue
                if segments[i].start > segments[i - 1].end:
                    diff_spk_pause_values.append(segments[i].start - segments[i - 1].end)
                else:
                    diff_spk_overlap_values.append(
                        segments[i - 1].end - segments[i].start
                    )

        self.same_spk_pause_dist = self._compute_histogram_dist(
            np.array(same_spk_pause_values)
        )
        self.diff_spk_pause_dist = self._compute_histogram_dist(
            np.array(diff_spk_pause_values)
        )
        self.diff_spk_overlap_dist = self._compute_histogram_dist(
            np.array(diff_spk_overlap_values)
        )
        self.prob_diff_spk_overlap = (
            len(diff_spk_overlap_values)
            / (len(diff_spk_pause_values) + len(diff_spk_overlap_values))
            if (len(diff_spk_pause_values) + len(diff_spk_overlap_values)) > 0
            else 0.5
        )

        self.same_spk_pause = self.same_spk_pause_dist.mean()
        self.diff_spk_pause = self.diff_spk_pause_dist.mean()
        self.diff_spk_overlap = self.diff_spk_overlap_dist.mean()

        logging.info(f"Learned parameters: {self}")

    def _create_mixture(
        self, utterances: CutSet, allow_3fold_overlap: bool = False
    ) -> MixedCut:
        """
        Chain the sampled utterances with pauses/overlaps drawn from the
        learned distributions, then group per speaker into MixTracks.
        """
        speakers = utterances.speakers

        N = len(utterances)
        same_spk_pauses = [round(x, 2) for x in self.same_spk_pause_dist.rvs(size=N)]
        diff_spk_pauses = [round(x, 2) for x in self.diff_spk_pause_dist.rvs(size=N)]
        diff_spk_overlaps = [round(x, 2) for x in self.diff_spk_overlap_dist.rvs(size=N)]
        diff_spk_bernoulli = self.bernoulli.rvs(p=self.prob_diff_spk_overlap, size=N)

        utterances = list(utterances)
        # Offsets w.r.t. the meeting start: each new utterance starts after a
        # sampled pause (or before the previous one ends, for overlaps).
        offsets = [0.0]
        cur_offset = utterances[0].duration

        first_spk = utterances[0].supervisions[0].speaker
        last_utt_end = {spkr: 0.0 for spkr in speakers}
        last_utt_end[first_spk] = cur_offset
        last_utt_end_times = sorted(list(last_utt_end.values()), reverse=True)
        sr = utterances[0].sampling_rate

        for i in range(1, len(utterances)):
            cur_spk = utterances[i].supervisions[0].speaker
            prev_spk = utterances[i - 1].supervisions[0].speaker
            if cur_spk == prev_spk:
                ot = same_spk_pauses[i]
            else:
                if diff_spk_bernoulli[i] == 0:
                    ot = diff_spk_pauses[i]
                else:
                    ot = diff_spk_overlaps[i]
                    if len(last_utt_end_times) > 1 and not allow_3fold_overlap:
                        # 2nd term: same speaker's utterances must not overlap;
                        # 3rd term: cap simultaneous overlap at two speakers.
                        ot = min(
                            ot,
                            add_durations(cur_offset, -last_utt_end[cur_spk], sampling_rate=sr),
                            add_durations(cur_offset, -last_utt_end_times[1], sampling_rate=sr),
                        )
                    else:
                        ot = min(
                            ot,
                            add_durations(cur_offset, -last_utt_end[cur_spk], sampling_rate=sr),
                        )
                    ot = -ot

            cur_offset = add_durations(cur_offset, ot, sampling_rate=sr)
            offsets.append(cur_offset)
            cur_offset = add_durations(cur_offset, utterances[i].duration, sampling_rate=sr)

            last_utt_end[cur_spk] = cur_offset
            last_utt_end_times = sorted(list(last_utt_end.values()), reverse=True)
            cur_offset = last_utt_end_times[0]

        # Group utterances + offsets per speaker (sorted by offset).
        utterances, offsets = zip(*sorted(zip(utterances, offsets), key=lambda x: x[1]))
        spk_tracks = defaultdict(list)
        for utt, offset in zip(utterances, offsets):
            spk_tracks[utt.supervisions[0].speaker].append((utt, offset))

        tracks = []
        for spk, spk_utts in spk_tracks.items():
            track, start = spk_utts[0]
            for utt, offset in spk_utts[1:]:
                track = mix(
                    track,
                    utt,
                    offset=add_durations(offset, -start, sampling_rate=sr),
                    allow_padding=True,
                )
            track = MixTrack(cut=track, offset=start)
            tracks.append(track)

        tracks = sorted(tracks, key=lambda x: x.offset)
        return MixedCut(id=str(uuid4()), tracks=tracks)

    @dill_enabled(True)
    def simulate(
        self,
        cuts: CutSet,
        num_meetings: Optional[int] = None,
        num_repeats: Optional[int] = None,
        num_speakers_per_meeting: Union[int, List[int]] = 2,
        speaker_count_probs: Optional[List[float]] = None,
        max_duration_per_speaker: Optional[float] = 20.0,
        max_utterances_per_speaker: Optional[int] = 5,
        allow_3fold_overlap: bool = False,
        seed: int = 0,
        num_jobs: int = 1,
    ) -> CutSet:
        """
        Simulate meetings (see SpeakerIndependentMeetingSimulator.simulate
        for parameter semantics; ``allow_3fold_overlap`` permits 3+ speakers
        talking at once).
        """
        from scipy.stats import bernoulli

        if num_meetings is None and num_repeats is None:
            raise ValueError("Either num_meetings or num_repeats must be provided.")

        if num_meetings is not None:
            num_repeats = None

        if isinstance(num_speakers_per_meeting, int):
            num_speakers_per_meeting = [num_speakers_per_meeting]

        if speaker_count_probs is None:
            speaker_count_probs = [1.0 / len(num_speakers_per_meeting)] * len(
                num_speakers_per_meeting
            )

        if getattr(self, "same_spk_pause_dist", None) is None:
            self._init_defaults()

        self.bernoulli = bernoulli

        sampler = MeetingSampler(
            cuts,
            num_repeats=num_repeats,
            num_meetings=num_meetings,
            max_duration_per_speaker=max_duration_per_speaker,
            max_utterances_per_speaker=max_utterances_per_speaker,
            num_speakers_per_meeting=num_speakers_per_meeting,
            speaker_count_probs=speaker_count_probs,
            seed=seed,
        )
        sampler_iter = iter(sampler)

        work = partial(_simulate_worker, simulator=self, allow_3fold_overlap=allow_3fold_overlap)

        mixtures = []
        if num_jobs == 1:
            for mixture in map(work, sampler_iter):
                mixtures.append(mixture)
        else:
            for mixture in parallel_map(
                work,
                sampler_iter,
                num_jobs=num_jobs,
                queue_size=num_jobs * MAX_TASKS_WAITING,
            ):
                mixtures.append(mixture)

        return CutSet.from_cuts(mixtures)

    def reverberate(self, cuts: CutSet, *rirs: RecordingSet) -> CutSet:
        return reverberate_cuts(cuts, *rirs)


def _simulate_worker(
    utterances, allow_3fold_overlap: bool, simulator: ConversationalMeetingSimulator
):
    return simulator._create_mixture(utterances, allow_3fold_overlap=allow_3fold_overlap)
