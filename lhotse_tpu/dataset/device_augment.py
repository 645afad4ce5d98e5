"""
User-facing device-side augmentation stage for TPU training input pipelines.

This is the packaged form of the architecture the benchmarks run: the host
pipeline decodes/collates RAW AUDIO (``AudioSamples`` input strategy), and
the chip runs the whole augmentation chain + fbank as ONE compiled program
per bucket shape:

    speed perturb → volume gain → SNR noise mix → RIR reverb → fbank
    [→ SpecAugment warp + masks]

Compared to the reference's host-side per-cut augmentation
(`/root/reference/lhotse/dataset/cut_transforms/*`), the same math
(ops/augment.py parity tests) runs batched on the MXU, and the host's only
jobs are decode and int16 staging.

Typical use::

    aug = OnDeviceAugmenter(
        buckets=[(6.0, 40), (9.0, 27), (12.0, 20)],
        speed_factor=1.1,
        noise_pool=musan_samples,      # (N, T) float32 host array
        rir=rir_taps,                  # (L,) float32
        snr=(10, 20),
        mix_prob=0.5,
    )
    aug.precompile()                   # optional: outside the hot loop
    for batch in loader:               # dataset = AudioSamples strategy
        feats, feat_lens = aug(batch["inputs"], batch["input_lens"])
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from lhotse_tpu.ops.augment import make_augment_fbank_pipeline
from lhotse_tpu.ops.resample import resampled_num_samples


@dataclass
class StagedBatch:
    """A batch already padded/encoded and (asynchronously) transferred to the
    device, awaiting :meth:`OnDeviceAugmenter.compute`."""

    audio: Any  # device array, bucket shape (B_b, T_b), wire dtype
    lens: np.ndarray  # (B_b,) valid sample counts (0 = padding row)
    kwargs: Dict[str, Any] = field(default_factory=dict)
    # Sample-cache bookkeeping (miss path): scatter these rows into the
    # bucket pool at compute time — zero extra wire bytes.
    bucket_t: Optional[int] = None
    insert_slots: Optional[np.ndarray] = None
    # Staging counter this batch's augmentation randomness was keyed by —
    # pass to OnDeviceAugmenter.state_dict(after=...) for checkpoints that
    # stay consistent while a prefetch thread stages ahead.
    aug_counter: Optional[int] = None


@dataclass
class CachedBatch:
    """A batch whose audio is already resident in the device sample cache —
    :meth:`OnDeviceAugmenter.compute` gathers pool rows by slot; nothing
    crosses the wire."""

    bucket_t: int
    slots: np.ndarray  # (B_b,) int32 pool rows (scratch slot = padding)
    lens: np.ndarray  # (B_b,) valid sample counts (0 = padding row)
    kwargs: Dict[str, Any] = field(default_factory=dict)
    aug_counter: Optional[int] = None  # see StagedBatch.aug_counter


class OnDeviceAugmenter:
    """
    Bucket-shaped device augment→fbank stage.

    :param buckets: shape vocabulary as (max_seconds, batch_size) pairs,
        ascending by duration; every incoming batch is padded up to the
        smallest covering bucket so exactly ``len(buckets)`` programs are
        ever compiled.
    :param sampling_rate: audio sampling rate.
    :param speed_factor: optional sox-speed factor applied on device.
    :param gain_range: per-item volume perturbation range (uniform), or
        None to disable.
    :param noise_pool: optional (N, T_noise) float32 host array of noise
        clips (e.g. decoded MUSAN); staged into HBM once, sliced per batch.
    :param snr: (low, high) SNR dB range for noise mixing.
    :param mix_prob: probability of mixing noise into each item.
    :param rir: optional (L,) float32 impulse response (shared; kept
        concrete so the realignment is a compile-time slice).
    :param wire_format: host->device transfer encoding — "float32"
        (default, lossless), "int16" (~96 dB SNR, half the bytes;
        log-mel shifts up to ~0.04 in near-silent frames), "mulaw"
        (8-bit, LOSSY ~38 dB SNR, quarter the bytes), or "adpcm4"
        (4-bit block ADPCM, LOSSY ~30-35 dB SNR, ~1/7 the bytes, decoded
        on device by a scan fused into the augment program — see
        :mod:`lhotse_tpu.ops.wire`). Use the narrower formats when the
        host->device link, not the chip, caps pipeline throughput.
    :param seed: host RNG seed for gains/SNRs/noise choice.
    :param specaugment: optional
        :class:`~lhotse_tpu.dataset.signal_transforms.SpecAugment` instance;
        its randomness (time warp maps + time/freq masks) is drawn host-side
        per batch over the bucket's frame grid (checkpointable via the
        transform's ``state_dict``), and the apply step is traced into the
        fused device program after the fbank.
    :param sample_cache: optional
        :class:`~lhotse_tpu.dataset.device_cache.DeviceSampleCache` keeping
        wire-format audio resident in HBM across epochs — fully-resident
        batches skip the host→device transfer (and, with
        :class:`~lhotse_tpu.dataset.device_cache.CacheAwareAudioSamples`,
        the host decode as well). Pass the batch's cut ids to
        :meth:`stage`.
    """

    def __init__(
        self,
        buckets: Sequence[Tuple[float, int]],
        sampling_rate: int = 16000,
        speed_factor: Optional[float] = None,
        gain_range: Optional[Tuple[float, float]] = (0.9, 1.1),
        noise_pool: Optional[np.ndarray] = None,
        snr: Tuple[float, float] = (10.0, 20.0),
        mix_prob: float = 0.5,
        rir: Optional[np.ndarray] = None,
        normalize_rir: bool = True,
        fbank=None,
        wire_format: str = "float32",
        seed: int = 0,
        sample_cache=None,
        specaugment=None,
    ) -> None:
        from lhotse_tpu.ops.augment import resolve_fbank_layer
        from lhotse_tpu.ops.wire import WIRE_FORMATS, wire_row_width

        assert len(buckets) > 0
        if wire_format not in WIRE_FORMATS:
            raise ValueError(
                f"wire_format must be one of {WIRE_FORMATS}, got {wire_format!r}"
            )
        self.buckets = sorted((float(s), int(b)) for s, b in buckets)
        for ub, _ in self.buckets:
            # adpcm4 needs block-aligned shapes; raises with guidance if not.
            wire_row_width(int(ub * sampling_rate), wire_format)
        self.sampling_rate = int(sampling_rate)
        self.speed_factor = speed_factor
        self.gain_range = gain_range
        self.snr = snr
        self.mix_prob = float(mix_prob)
        self.rir = None if rir is None else np.asarray(rir, np.float32)
        self.wire_format = wire_format
        self._seed = int(seed)
        # All per-batch randomness is KEYED by (seed, specaugment seed,
        # stage counter) instead of drawn from one sequential stream: a
        # prefetch thread stages batches ahead of the training loop, and a
        # sequential stream would make any state captured between yielded
        # batches reflect the staged-ahead draws — silently changing the
        # data stream on mid-epoch resume. With keyed draws, batch i's
        # randomness depends only on i, so a checkpoint is just the next
        # counter value (see state_dict(after=...)).
        self._stage_counter = 0
        self.specaugment = specaugment
        fbank = resolve_fbank_layer(fbank, self.sampling_rate)
        self._feat_hop = round(fbank.frame_shift * self.sampling_rate)
        self._num_mels = int(getattr(fbank, "num_filters", 80))
        self._pipeline = make_augment_fbank_pipeline(
            sampling_rate=self.sampling_rate,
            speed_factor=speed_factor,
            normalize_rir=normalize_rir,
            fbank=fbank,
            wire_format=wire_format,
            # Build-time RIR: baked into the program as a constant so the
            # peak realignment is a static slice (per-call rir would trace
            # as a dynamic argmax + gather, ~6x slower per bucket).
            rir=self.rir,
        )
        self._noise_host = (
            None if noise_pool is None else np.asarray(noise_pool, np.float32)
        )
        self._noise_device: dict = {}
        self.sample_cache = sample_cache
        self._cached_fn = None
        self._grouped_wire_fns: dict = {}
        if sample_cache is not None:
            sample_cache.configure([ub for ub, _ in self.buckets])

    # -- shapes -----------------------------------------------------------------

    def bucket_shape(self, num_samples: int) -> Tuple[int, int]:
        """(padded_num_samples, batch_size) of the smallest covering bucket
        (the largest bucket when nothing covers)."""
        for ub, bsz in self.buckets:
            if num_samples <= int(ub * self.sampling_rate):
                return int(ub * self.sampling_rate), bsz
        ub, bsz = self.buckets[-1]
        return int(ub * self.sampling_rate), bsz

    def _post_perturb_len(self, t: int) -> int:
        if self.speed_factor is None or self.speed_factor == 1.0:
            return t
        return resampled_num_samples(
            t, round(self.sampling_rate * self.speed_factor), self.sampling_rate
        )

    def _noise_for(self, batch_size: int, t_perturbed: int):
        """A (B, T') noise batch staged in HBM, one per bucket shape. The
        slice assignment is drawn once per shape and reused across batches
        (per-batch SNR/gain/mask still vary) — the same device-resident-pool
        tradeoff the e2e benchmark makes to keep the wire free for speech."""
        import jax.numpy as jnp

        key = (batch_size, t_perturbed)
        staged = self._noise_device.get(key)
        if staged is None:
            pool = self._noise_host
            n, tn = pool.shape
            # Shape-keyed RNG, NOT the sequential per-batch stream: the
            # staging draw happens once per shape at an order-dependent
            # point (first batch of that bucket, or precompile), and pulling
            # it from self._rng would make every later gain/SNR draw depend
            # on bucket-arrival order — breaking bit-exact mid-epoch resume
            # (state_dict restores the stream, not which shapes were staged).
            shape_rng = np.random.RandomState(
                np.array(
                    [self._seed & 0x7FFFFFFF, batch_size, t_perturbed],
                    dtype=np.uint32,
                )
            )
            rows = shape_rng.randint(0, n, size=batch_size)
            if tn >= t_perturbed:
                starts = shape_rng.randint(0, tn - t_perturbed + 1, size=batch_size)
                sel = np.stack(
                    [pool[r, s : s + t_perturbed] for r, s in zip(rows, starts)]
                )
            else:
                reps = -(-t_perturbed // tn)
                sel = np.tile(pool[rows], (1, reps))[:, :t_perturbed]
            staged = jnp.asarray(sel)
            self._noise_device[key] = staged
        return staged

    # -- execution --------------------------------------------------------------

    def precompile(self, group: int = 1) -> None:
        """Compile every bucket program outside the hot loop (with a sample
        cache attached, the cached gather program per bucket too — the
        warmup rows land in ring slots and are evicted naturally).

        ``group > 1`` additionally compiles the :meth:`compute_grouped`
        mega-batch program (``group * B`` rows) per bucket — callers that
        group cache-hit batches MUST warm that shape here, or the first
        grouped dispatch pays a full XLA compile inside their hot loop
        (minutes on a tunneled device).

        RNG-neutral: the warmup dispatches draw (and discard) per-batch
        augmentation randomness, so the stream state is snapshotted and
        restored — two pipelines that precompile with different ``group``
        values still produce identical augmentation for identical data."""
        rng_snapshot = self.state_dict()
        for bi, (ub, bsz) in enumerate(self.buckets):
            t = int(ub * self.sampling_rate)
            zeros = np.zeros((bsz, t), np.float32)
            lens = np.full(bsz, t, np.int64)
            if self.sample_cache is None:
                self(zeros, lens)
                if group > 1:
                    self.compute_grouped(
                        [self.stage(zeros, lens) for _ in range(group)]
                    )
            else:
                ids = [f"__precompile_{bi}_{k}__" for k in range(bsz)]
                self.compute(self.stage(zeros, lens, ids=ids))  # miss+insert
                self.compute(self.stage(zeros, lens, ids=ids))  # cached path
                if group > 1:
                    self.compute_grouped(
                        [self.stage(zeros, lens, ids=ids) for _ in range(group)]
                    )
        self.load_state_dict(rng_snapshot)

    def _merge_kwargs(self, staged_batches, B_total: int, t_bucket: int) -> dict:
        """Concatenate per-batch host RNG draws for a ``k*B`` mega-batch.

        The ``noise`` entry is merged ON DEVICE: it is a device-resident,
        shape-keyed asset (see :meth:`_noise_for`) — every batch of one
        bucket shape carries the SAME array — so the merged noise is ``k``
        HBM-concatenated copies, built once per (k*B, T') and cached.
        Pulling it through ``np.concatenate`` instead would move tens of MB
        device→host→device on EVERY grouped dispatch.  Bit-exactness with
        per-batch :meth:`compute` is preserved: row ``i`` of each grouped
        sub-batch sees exactly the noise row it would have seen alone."""
        keys = staged_batches[0].kwargs.keys()
        kwargs = {
            k: np.concatenate([np.asarray(s.kwargs[k]) for s in staged_batches])
            for k in keys
            if k != "noise"
        }
        if "noise" in keys:
            import jax.numpy as jnp

            key = ("grouped", B_total, self._post_perturb_len(t_bucket))
            staged_noise = self._noise_device.get(key)
            if staged_noise is None:
                staged_noise = jnp.concatenate(
                    [s.kwargs["noise"] for s in staged_batches], axis=0
                )
                self._noise_device[key] = staged_noise
            kwargs["noise"] = staged_noise
        return kwargs

    def _grouped_wire_pipeline(self, k: int):
        """One compiled program per (bucket shapes are captured by jit) group
        size ``k``: concatenates ``k`` already-transferred wire batches in
        HBM and runs the fused pipeline once."""
        fn = self._grouped_wire_fns.get(k)
        if fn is None:
            import jax
            import jax.numpy as jnp

            pipe = self._pipeline

            def run(parts, lens, **kw):
                return pipe(jnp.concatenate(parts, axis=0), lens, **kw)

            fn = jax.jit(run)
            self._grouped_wire_fns[k] = fn
        return fn

    def compute_grouped(self, staged_batches):
        """Run ``k`` staged batches of the SAME bucket as ONE device program
        over a ``k*B`` mega-batch, returning per-batch ``(feats, feat_lens)``
        views.  One dispatch instead of ``k``: on hosts with high dispatch
        latency (remote/tunneled devices) both the cached loop and the
        fresh-decode loop are round-trip-bound, and the larger batch also
        utilizes the MXU better.  Accepts either all-:class:`CachedBatch`
        (pool gather, nothing crosses the wire) or all-:class:`StagedBatch`
        (each batch's wire bytes already transferred via ``jax.device_put``;
        the concat happens in HBM).  Each distinct (bucket, k) costs one
        extra compile — pick one ``k``, warm it via ``precompile(group=k)``,
        and flush leftovers through :meth:`compute`.
        """
        assert staged_batches, "compute_grouped needs at least one batch"
        if len(staged_batches) == 1:
            return [self.compute(staged_batches[0])]
        t0 = staged_batches[0].bucket_t
        if all(isinstance(s, StagedBatch) for s in staged_batches):
            shape0 = staged_batches[0].audio.shape
            assert all(s.audio.shape == shape0 for s in staged_batches), (
                "grouped batches must share one bucket shape"
            )
            assert all(s.insert_slots is None for s in staged_batches), (
                "cache-miss batches carry pool scatters; dispatch them "
                "individually through compute()"
            )
            if t0 is None:
                # Wire width != sample count for sub-byte formats; recover
                # the bucket from the lens capacity instead.
                t0 = int(self.bucket_shape(int(staged_batches[0].lens.max()))[0])
            lens = np.concatenate([s.lens for s in staged_batches])
            kwargs = self._merge_kwargs(staged_batches, len(lens), t0)
            feats, feat_lens = self._grouped_wire_pipeline(len(staged_batches))(
                [s.audio for s in staged_batches], lens, **kwargs
            )
            B = len(staged_batches[0].lens)
            return [
                (feats[i * B : (i + 1) * B], feat_lens[i * B : (i + 1) * B])
                for i in range(len(staged_batches))
            ]
        assert all(isinstance(s, CachedBatch) for s in staged_batches), (
            "compute_grouped needs all-cached or all-transfer batches"
        )
        assert all(s.bucket_t == t0 for s in staged_batches), (
            "grouped batches must share one bucket shape"
        )
        slots = np.concatenate([s.slots for s in staged_batches])
        lens = np.concatenate([s.lens for s in staged_batches])
        merged = CachedBatch(
            t0, slots, lens, self._merge_kwargs(staged_batches, len(lens), t0)
        )
        feats, feat_lens = self.compute(merged)
        B = len(staged_batches[0].slots)
        return [
            (feats[i * B : (i + 1) * B], feat_lens[i * B : (i + 1) * B])
            for i in range(len(staged_batches))
        ]

    def batch_rng(self, counter: int) -> np.random.Generator:
        """The keyed per-batch generator: all of batch ``counter``'s host
        randomness (gains / SNR / mix mask / SpecAugment warp+masks) derives
        from ``(seed, specaugment.seed, counter)`` — independent of how many
        batches a prefetch thread has staged ahead."""
        sa_seed = getattr(self.specaugment, "seed", None)
        return np.random.default_rng(
            (self._seed, 0 if sa_seed is None else int(sa_seed), int(counter))
        )

    def state_dict(self, after=None) -> dict:
        """Checkpoint the augmentation randomness. Because per-batch draws
        are counter-keyed (see :meth:`batch_rng`), the whole state is the
        next staging counter. Together with the sampler's/loader's
        ``state_dict`` this makes a mid-epoch resume reproduce the exact
        batch-and-augmentation stream (the device pipeline itself is
        deterministic given these draws).

        :param after: optional staged batch (the LAST one the training loop
            consumed). With a prefetch thread, the augmenter's live counter
            runs ahead of consumption; passing the consumed batch pins the
            checkpoint to it exactly. Prefer ``DataLoader(...,
            checkpoint_objects=[augmenter])``, which captures this
            automatically and consistently with the sampler state.
        """
        if after is None:
            counter = self._stage_counter
        else:
            counter = self._counter_after(after)
        return {"seed": self._seed, "next_counter": counter}

    def _counter_after(self, after) -> int:
        """Next staging counter implied by a consumed batch: its
        ``aug_counter`` + 1. Accepts a staged/cached batch, or a tuple/list
        of them (grouped dispatch) — the max counter wins."""
        if isinstance(after, (tuple, list)):
            counters = [
                c
                for c in (getattr(el, "aug_counter", None) for el in after)
                if c is not None
            ]
            if not counters:
                raise ValueError(
                    "state_dict(after=...) needs batches staged by this "
                    "augmenter (none of the elements carries aug_counter)."
                )
            return max(int(c) for c in counters) + 1
        c = getattr(after, "aug_counter", None)
        if c is None:
            raise ValueError(
                "state_dict(after=...) needs a batch staged by this "
                "augmenter (no aug_counter on the given object)."
            )
        return int(c) + 1

    def load_state_dict(self, state_dict: dict) -> None:
        if "rng_state" in state_dict:
            raise ValueError(
                "This checkpoint was written by an older OnDeviceAugmenter "
                "whose randomness was a sequential RNG stream; it cannot be "
                "restored into the counter-keyed design (which exists to "
                "keep checkpoints consistent under prefetch)."
            )
        if int(state_dict["seed"]) != self._seed:
            raise ValueError(
                f"Augmenter checkpoint was written with seed "
                f"{state_dict['seed']}, but this augmenter uses seed "
                f"{self._seed} — restoring would change the stream."
            )
        self._stage_counter = int(state_dict["next_counter"])

    def _draw_kwargs(self, B_b: int, T_b: int) -> dict:
        """Per-batch augmentation draws (keyed host RNG) + shared device
        assets. Consumes one staging-counter value per call."""
        counter = self._stage_counter
        self._stage_counter = counter + 1
        rng = self.batch_rng(counter)
        kwargs = {}
        if self.gain_range is not None:
            lo, hi = self.gain_range
            kwargs["gains"] = rng.uniform(lo, hi, B_b).astype(np.float32)
        if self._noise_host is not None:
            t_p = self._post_perturb_len(T_b)
            kwargs["noise"] = self._noise_for(B_b, t_p)
            lo, hi = self.snr
            kwargs["snr"] = rng.uniform(lo, hi, B_b).astype(np.float32)
            kwargs["mix_mask"] = (
                rng.uniform(0, 1, B_b) < self.mix_prob
            ).astype(np.float32)
        if self.specaugment is not None:
            # Host-side randomness over the bucket's (post-perturb) frame
            # grid; the apply step (interp gather + masked fill) runs inside
            # the fused device program.  The pipeline slices these down to
            # the fbank's actual frame count.
            n_frames = (
                self._post_perturb_len(T_b) + self._feat_hop // 2
            ) // self._feat_hop
            warp_src, time_mask, freq_mask = self.specaugment.draw_batch(
                B_b, int(n_frames), self._num_mels, rng=rng
            )
            kwargs["warp_src"] = warp_src.astype(np.float32)
            kwargs["time_mask"] = time_mask
            kwargs["freq_mask"] = freq_mask
        return kwargs

    def stage(
        self,
        audio: np.ndarray,
        audio_lens: Union[np.ndarray, Sequence[int]],
        ids: Optional[Sequence[str]] = None,
        transfer: bool = True,
    ) -> Union[StagedBatch, CachedBatch]:
        """
        Host-side half of :meth:`__call__`: pad ``(B, T)`` float32 (or int16)
        audio up to its bucket shape, encode the wire format, draw the
        per-batch augmentation RNG, and ``jax.device_put`` the speech batch
        (asynchronous — the transfer proceeds in the background).

        Call this from a prefetch thread (e.g. ``DataLoader(apply_fn=...)``)
        so the host→device transfer of batch N+1 overlaps the device compute
        of batch N, then hand the result to :meth:`compute` on the hot loop.

        With a :class:`~lhotse_tpu.dataset.device_cache.DeviceSampleCache`
        attached and ``ids`` given, a fully-resident batch returns a
        :class:`CachedBatch` (slot indices only — no transfer; ``audio`` may
        then be a ``(B, 0)`` placeholder from
        :class:`~lhotse_tpu.dataset.device_cache.CacheAwareAudioSamples`),
        and a miss batch is transferred once and scattered into the pool.
        """
        import jax

        from lhotse_tpu.ops.wire import encode_wire

        audio = np.asarray(audio)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        audio_lens = np.asarray(audio_lens)
        B = audio.shape[0]
        T = audio.shape[1] if audio.shape[1] else int(audio_lens.max())
        T_b, B_b = self.bucket_shape(T)
        if B > B_b:
            raise ValueError(
                f"Batch of {B} items exceeds the covering bucket's batch size "
                f"{B_b} (bucket {T_b / self.sampling_rate:g}s). Silently "
                "dropping items would lose data — align the sampler's "
                "max_cuts/max_duration with the bucket vocabulary, or enlarge "
                "the bucket batch sizes."
            )
        lens = np.zeros(B_b, np.int64)
        lens[:B] = np.minimum(audio_lens, T_b)
        counter = self._stage_counter  # the value _draw_kwargs consumes
        kwargs = self._draw_kwargs(B_b, T_b)

        cache = self.sample_cache
        if cache is not None and ids is not None and cache.has_all(ids, T_b):
            return CachedBatch(
                T_b, cache.slots(ids, T_b, B_b), lens, kwargs,
                aug_counter=counter,
            )

        if audio.shape[1] == 0:
            raise ValueError(
                "Got a zero-width audio placeholder for a batch that is not "
                "fully cache-resident — pass the real samples (is the "
                "sampler's duration_bins vocabulary aligned with the "
                "augmenter buckets?)"
            )
        # np.empty + explicit pad fills: this runs per batch in the prefetch
        # thread of the fresh-decode hot loop — zeroing the full (B_b, T_b)
        # canvas (tens of MB) before overwriting most of it cost real ms.
        n = min(T, T_b)
        padded = np.empty((B_b, T_b), np.float32)
        padded[:B, :n] = audio[:, :T_b]
        if n < T_b:
            padded[:B, n:] = 0.0
        if B < B_b:
            padded[B:] = 0.0
        padded = encode_wire(padded, self.wire_format)
        # transfer=False leaves the wire bytes on host (StagedBatch.audio is
        # then numpy) for a downstream transfer stage: on hosts where
        # jax.device_put blocks the calling thread (e.g. a tunneled device),
        # running the put on the decode thread would serialize transfer with
        # assembly — see transfer_stream() in dataset/loader.py.
        staged = StagedBatch(
            jax.device_put(padded) if transfer else padded, lens, kwargs,
            aug_counter=counter,
        )
        staged.bucket_t = T_b
        if cache is not None and ids is not None:
            staged.insert_slots = cache.reserve(ids, T_b, B_b, self.sampling_rate)
        return staged

    def _cached_pipeline(self):
        if self._cached_fn is None:
            import jax

            pipe = self._pipeline

            def gather_and_run(pool, slots, lens, **kw):
                return pipe(pool[slots], lens, **kw)

            self._cached_fn = jax.jit(gather_and_run)
        return self._cached_fn

    def compute(self, staged: Union[StagedBatch, CachedBatch]):
        """Device-side half: run the fused bucket program on a staged batch.
        Returns device arrays ``(feats (B', T_frames, F), feat_lens (B',))``
        where ``B'`` is the bucket batch size (padding rows have
        ``feat_lens == 0``)."""
        if isinstance(staged, CachedBatch):
            from lhotse_tpu.ops.wire import wire_row_width

            pool = self.sample_cache.pool(
                staged.bucket_t,
                self._wire_np_dtype(),
                row_width=wire_row_width(staged.bucket_t, self.wire_format),
            )
            return self._cached_pipeline()(
                pool, staged.slots, staged.lens, **staged.kwargs
            )
        if staged.insert_slots is not None:
            self.sample_cache.insert(
                staged.bucket_t, staged.audio, staged.insert_slots
            )
        return self._pipeline(staged.audio, staged.lens, **staged.kwargs)

    def _wire_np_dtype(self):
        from lhotse_tpu.ops.wire import wire_np_dtype

        return wire_np_dtype(self.wire_format)

    def __call__(
        self,
        audio: np.ndarray,
        audio_lens: Union[np.ndarray, Sequence[int]],
    ):
        """
        Pad ``(B, T)`` float32 (or int16) audio up to its bucket shape and
        run the fused device program (``compute(stage(...))`` — serial; use
        the split form to overlap transfer with compute). Returns device
        arrays ``(feats (B', T_frames, F), feat_lens (B',))`` where ``B'`` is
        the bucket batch size (extra rows are padding with
        ``feat_lens == 0``).
        """
        return self.compute(self.stage(audio, audio_lens))
