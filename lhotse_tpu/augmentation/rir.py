"""
Reverberation by convolution with a (possibly synthetic) room impulse response.

Reference behavior: `/root/reference/lhotse/augmentation/rir.py:13-166` —
Kaldi wav-reverberate semantics with forced --shift-output (output length ==
input length, shifted by the RIR peak index), per-channel convolution, energy
normalization, optional early-reflections-only (first 50 ms), and fallback to
the FRA-RIR fast random generator when no RIR is given.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.augmentation.transform import AudioTransform
from lhotse_tpu.augmentation.utils import FastRandomRIRGenerator, convolve1d
from lhotse_tpu.utils import Seconds


@dataclass
class ReverbWithImpulseResponse(AudioTransform):
    """
    Reverberation effect by convolving with a room impulse response; output
    length equals input length (shift-output semantics).
    """

    rir: Optional[dict] = None
    normalize_output: bool = True
    early_only: bool = False
    rir_channels: List[int] = field(default_factory=lambda: [0])
    rir_generator: Optional[Union[dict, Callable]] = None

    RIR_SCALING_FACTOR: float = 0.5**15

    def __post_init__(self):
        if isinstance(self.rir, dict):
            from lhotse_tpu.serialization import deserialize_item

            rir = self.rir.copy()
            if "recording" in self.rir:
                rir["recording"] = rir["recording"].copy()
            self.rir = deserialize_item(rir)

        assert (
            self.rir is not None or self.rir_generator is not None
        ), "Either `rir` or `rir_generator` must be provided."

        if self.rir is not None:
            assert all(
                c < self.rir.num_channels for c in self.rir_channels
            ), "Invalid channel index in `rir_channels`"

        if self.rir_generator is not None and isinstance(self.rir_generator, dict):
            self.rir_generator = FastRandomRIRGenerator(**self.rir_generator)

    def to_dict(self) -> dict:
        from lhotse_tpu import Recording
        from lhotse_tpu.cut import Cut

        return {
            "name": type(self).__name__,
            "kwargs": {
                "rir": self.rir.to_dict()
                if isinstance(self.rir, (Recording, Cut))
                else self.rir,
                "normalize_output": self.normalize_output,
                "early_only": self.early_only,
                "rir_channels": list(self.rir_channels),
                "rir_generator": self.rir_generator
                if self.rir_generator is None or isinstance(self.rir_generator, dict)
                else self.rir_generator.to_dict(),
            },
        }

    def __call__(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        D_in, N_in = samples.shape
        input_is_mono = D_in == 1

        if input_is_mono:
            assert (
                self.rir is not None or len(self.rir_channels) == 1
            ), "For mono input, either provide an RIR explicitly or set rir_channels to [0]."
        else:
            assert len(self.rir_channels) == 1 or len(self.rir_channels) == D_in, (
                "For multi-channel input, only mono RIRs or RIRs with the same "
                "number of channels as the input are supported."
            )

        if self.rir is None:
            rir_ = self.rir_generator(nsource=1)
        else:
            from lhotse_tpu import Recording

            rir = self.rir.to_cut() if isinstance(self.rir, Recording) else self.rir
            rir = rir.with_channels(self.rir_channels)
            if self.early_only:
                rir = rir.truncate(duration=0.05)
            rir_ = rir.load_audio()

        D_rir, N_rir = rir_.shape
        N_out = N_in  # shift-output: keep input length
        D_out = D_rir if input_is_mono else D_in

        rir_ = np.repeat(rir_, D_out, axis=0) if D_rir == 1 else rir_

        augmented = np.zeros((D_out, N_out), dtype=samples.dtype)
        for d in range(D_out):
            d_in = 0 if input_is_mono else d
            augmented[d, :N_in] = samples[d_in]
            power_before_reverb = np.sum(np.abs(samples[d_in]) ** 2) / N_in
            rir_d = rir_[d, :] * self.RIR_SCALING_FACTOR
            aug_d = convolve1d(samples[d_in], rir_d)
            shift_index = int(np.argmax(rir_d))
            piece = aug_d[shift_index : shift_index + N_out]
            augmented[d, : len(piece)] = piece
            if self.normalize_output:
                power_after_reverb = np.sum(np.abs(augmented[d, :]) ** 2) / N_out
                if power_after_reverb > 0:
                    augmented[d, :] *= np.sqrt(power_before_reverb / power_after_reverb)
        return augmented

    def reverse_timestamps(
        self,
        offset: Seconds,
        duration: Optional[Seconds],
        sampling_rate: Optional[int],
    ) -> Tuple[Seconds, Optional[Seconds]]:
        # Shift-output preserves timing.
        return offset, duration
