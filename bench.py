"""
Headline benchmark. Four measurements, one JSON line:

1. **Device throughput** (primary metric, ``value``): the FULL BASELINE
   config #3 augmentation chain on one chip — speed perturb -> volume gain
   -> SNR noise mix -> RIR reverb -> GEMM-NDFT fbank -> SpecAugment mask —
   over fixed-shape batches, audio-sec/sec.  This is the north-star 80-dim
   fbank extract+augment number (target: 10k audio-sec/sec/chip,
   BASELINE.md); the chain is listed under ``device_chain``.  A second key,
   ``value_with_wire``, reruns the same chain on FRESH int16 batches with
   a ``jax.device_put`` per batch and no pre-staging — transfer + compute,
   so the headline cannot be mistaken for a pipeline claim.
2. **Host pipeline** (``host_pipeline_*``): a realistic host-only ETL loop
   over freshly synthesized FLAC recordings — decode -> speed perturb ->
   noise mix (MUSAN-style) -> OnTheFlyFeatures(Fbank) ->
   DynamicBucketingSampler -> DataLoader — with a per-stage wall-time
   breakdown from the tracing subsystem (``host_stage_*_s`` keys).
3. **End-to-end TPU pipeline** (``e2e_tpu_*``): host decodes + collates raw
   audio, the prefetch thread pads/encodes/``device_put``\\ s each batch
   (int16 wire), and the chip runs the full augment+fbank chain — assembly,
   transfer, and compute overlapped.  ``e2e_device_busy_frac`` estimates
   the chip's duty cycle from per-bucket program timings.
4. **Precomputed-features pipeline** (``precomputed_*``): BASELINE config
   #1's offline path — fbank already stored as chunked ``.lca``; the hot
   loop is manifest iteration + chunked pread + decode-free collation
   (reference chunked reads: lhotse/features/io.py:936-1060).

Methodology note (device): on the remote-tunneled chip, ``block_until_ready``
does not reliably synchronize, so K pipeline iterations are chained inside a
``lax.fori_loop`` (each iteration depends on the counter, preventing
collapse) and we time dispatch -> scalar-fetch of the accumulated mean.
``value_with_wire`` instead times a loop of per-batch device_put+dispatch
with the scalar fetches at the end (executions serialize on the device
stream, so the total covers every transfer and every execution).

LHOTSE_TPU_BENCH_SMOKE=1 shrinks all sizes so the pre-commit smoke gate can
run this end-to-end on CPU in seconds (numbers are then meaningless).
"""
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np

SMOKE = bool(int(os.environ.get("LHOTSE_TPU_BENCH_SMOKE", "0")))


class _StealMeter:
    """Samples /proc/stat around a timed window and reports the hypervisor
    steal share (%) — this bench runs on a shared 1-vCPU host where same-day
    numbers have drifted 2x with neighbor load, so every repeat records the
    contention it ran under."""

    @staticmethod
    def _snap():
        try:
            with open("/proc/stat") as f:
                vals = list(map(int, f.readline().split()[1:]))
            return vals
        except OSError:
            return None

    def __enter__(self):
        self._a = self._snap()
        return self

    def __exit__(self, *exc):
        b = self._snap()
        self.steal_pct = None
        if self._a is not None and b is not None and len(b) >= 8:
            d = [y - x for x, y in zip(self._a, b)]
            tot = sum(d)
            if tot > 0:
                self.steal_pct = round(100.0 * d[7] / tot, 1)


# ---------------------------------------------------------------------------
# 1) Device compute benchmark: the FULL BASELINE config #3 chain on chip —
#    speed perturb -> volume gain -> SNR noise mix -> RIR reverb -> fbank ->
#    SpecAugment masks, as one compiled program per bucket shape.
# ---------------------------------------------------------------------------
DEVICE_CHAIN = (
    "speed_perturb(1.1)+volume_gain+snr_noise_mix+rir_reverb"
    "+fbank80+specaugment_mask"
)
# The e2e legs run the PUBLIC OnDeviceAugmenter, whose SpecAugment stage
# includes the time warp as well as the masks.
E2E_CHAIN = (
    "speed_perturb(1.1)+volume_gain+snr_noise_mix+rir_reverb"
    "+fbank80+specaugment_warp_masks"
)


def bench_device() -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lhotse_tpu.features.kaldi.layers import Wav2LogFilterBank
    from lhotse_tpu.ops import augment as aug
    from lhotse_tpu.ops.resample import resampled_num_samples, speed_perturb

    BATCH = 8 if SMOKE else 256
    CLIP_SECONDS = 2 if SMOKE else 15
    SR = 16000
    SPEED = 1.1
    NUM_SAMPLES = SR * CLIP_SECONDS
    AUDIO_SEC_PER_BATCH = BATCH * CLIP_SECONDS
    K = 2 if SMOKE else 50  # chained pipeline iterations per measurement

    fbank = Wav2LogFilterBank(sampling_rate=SR)
    rng = np.random.RandomState(0)
    # Post-perturb length and frame count define the noise/mask shapes.
    T_P = resampled_num_samples(NUM_SAMPLES, round(SR * SPEED), SR)
    n_frames = (T_P + 80) // 160
    # Synthetic decaying-noise RIR, 0.5 s (concrete numpy -> static-peak path).
    L = SR // 2
    rir = (
        np.exp(-np.arange(L) / (L / 6.0)) * rng.randn(L) * 0.5
    ).astype(np.float32)
    rir[L // 50] = 1.0

    def pipeline(audio, gains, noise, snr, time_mask, freq_mask):
        x = speed_perturb(audio, SPEED, SR)  # polyphase sinc conv -> MXU
        x = x * gains[:, None]  # volume perturb
        x = aug.mix_noise(x, None, noise, None, snr)  # MUSAN-style SNR mix
        x = aug.reverb_rir(x, rir)  # FFT convolution, shift-output
        feats = fbank(x)  # frame GEMM + mel GEMM -> MXU
        mean = feats.mean()
        return jnp.where(  # SpecAugment-style masking
            time_mask[:, : feats.shape[1], None] | freq_mask[:, None, :], mean, feats
        )

    def many(audio, gains, noise, snr, time_mask, freq_mask):
        def body(i, acc):
            # Tie each iteration to the counter so XLA cannot collapse the
            # loop into a single pipeline execution.
            out = pipeline(
                audio + i.astype(jnp.float32) * 1e-9,
                gains,
                noise,
                snr,
                time_mask,
                freq_mask,
            )
            return acc + out.mean()

        return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    fn = jax.jit(many)
    audio = jnp.asarray(rng.randn(BATCH, NUM_SAMPLES).astype(np.float32) * 0.1)
    gains = jnp.asarray(rng.uniform(0.8, 1.2, BATCH).astype(np.float32))
    noise = jnp.asarray(rng.randn(BATCH, T_P).astype(np.float32) * 0.05)
    snr = jnp.asarray(rng.uniform(10, 20, BATCH).astype(np.float32))
    tm = np.zeros((BATCH, n_frames), dtype=bool)
    fm = np.zeros((BATCH, 80), dtype=bool)
    for i in range(BATCH):
        s = rng.randint(0, n_frames - 100)
        tm[i, s : s + rng.randint(0, 100)] = True
        s = rng.randint(0, 53)
        fm[i, s : s + rng.randint(0, 27)] = True
    time_mask, freq_mask = jnp.asarray(tm), jnp.asarray(fm)

    import sys

    t_w = time.perf_counter()
    float(fn(audio, gains, noise, snr, time_mask, freq_mask))  # warmup/compile
    print(
        f"[bench]   device warmup/compile: {time.perf_counter() - t_w:.1f}s",
        file=sys.stderr,
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(audio, gains, noise, snr, time_mask, freq_mask))
        best = min(best, time.perf_counter() - t0)
    compute_only = AUDIO_SEC_PER_BATCH * K / best

    # ---- wire-inclusive variants: FRESH wire-encoded batch per step,
    # device_put + chain dispatch per batch, scalar fetches at the end.
    # Every transfer and every execution lands inside the timed window
    # (single device stream), so these are honest transfer+compute numbers.
    # int16 is the headline (lossless from int16 sources); mulaw/adpcm4
    # show what the lossy opt-in formats buy on a link-bound setup.
    from lhotse_tpu.ops.wire import decode_wire, encode_wire

    out = {"value": round(compute_only, 1)}
    raw_batches = [
        (rng.randn(BATCH, NUM_SAMPLES) * 0.1).astype(np.float32)
        for _ in range(2 if SMOKE else 6)
    ]
    for fmt, key in [
        ("int16", "value_with_wire"),
        ("mulaw", "value_with_wire_mulaw"),
        ("adpcm4", "value_with_wire_adpcm4"),
    ]:
        def pipeline_wire(audio_wire, gains, noise, snr, time_mask, freq_mask, fmt=fmt):
            return pipeline(
                decode_wire(audio_wire, fmt),
                gains, noise, snr, time_mask, freq_mask,
            ).mean()

        fn_wire = jax.jit(pipeline_wire)
        host_batches = [encode_wire(rb, fmt) for rb in raw_batches]
        # warmup/compile (untimed)
        t_w = time.perf_counter()
        float(fn_wire(jax.device_put(host_batches[0]), gains, noise, snr, time_mask, freq_mask))
        print(
            f"[bench]   wire[{fmt}] warmup/compile: {time.perf_counter() - t_w:.1f}s",
            file=sys.stderr,
        )
        outs = []
        t0 = time.perf_counter()
        for hb in host_batches:
            outs.append(
                fn_wire(jax.device_put(hb), gains, noise, snr, time_mask, freq_mask)
            )
        for o in outs:
            float(o)
        out[key] = round(
            AUDIO_SEC_PER_BATCH * len(host_batches) / (time.perf_counter() - t0), 1
        )
    out["value_with_wire_format"] = "int16"
    return out


# ---------------------------------------------------------------------------
# 2) Host end-to-end pipeline benchmark
# ---------------------------------------------------------------------------
def _synthesize_corpus(root: Path, n_recordings: int, n_noise: int):
    """FLAC speech-like recordings + a small noise pool, with manifests."""
    from lhotse_tpu import CutSet, Recording, SupervisionSegment
    from lhotse_tpu.audio.flacio import write_flac

    rng = np.random.RandomState(1234)
    sr = 16000

    def tone_burst(duration):
        n = int(sr * duration)
        t = np.arange(n) / sr
        f0 = rng.uniform(80, 220)
        wave = sum(
            np.sin(2 * np.pi * f0 * (h + 1) * t) / (h + 1) for h in range(4)
        ) * 0.2
        wave += rng.randn(n) * 0.01
        return wave.astype(np.float32)

    def record(path, duration):
        write_flac(str(path), tone_burst(duration), sr)
        return Recording.from_file(path)

    cuts = []
    for i in range(n_recordings):
        duration = float(rng.uniform(4.0, 14.0))
        cut = record(root / f"utt{i:04d}.flac", duration).to_cut()
        cut.supervisions.append(
            SupervisionSegment(
                id=f"sup{i:04d}",
                recording_id=cut.recording_id,
                start=0.0,
                duration=cut.duration,
                text="synthetic",
            )
        )
        cuts.append(cut)
    cuts_path = root / "cuts.jsonl"
    CutSet.from_cuts(cuts).to_file(cuts_path)

    noise = [record(root / f"noise{i:02d}.flac", 10.0).to_cut() for i in range(n_noise)]
    noise_path = root / "noise.jsonl"
    CutSet.from_cuts(noise).to_file(noise_path)
    return cuts_path, noise_path


def bench_host_pipeline() -> dict:
    from lhotse_tpu import CutSet, Fbank, set_caching_enabled
    from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    # Decoded-audio LRU: the MUSAN-style noise pool is re-read per mixed cut;
    # caching its decoded samples is the library's intended configuration for
    # noise/RIR assets (lhotse_tpu.caching.DecodedAudioCache).
    set_caching_enabled(True)

    n_rec = 12 if SMOKE else 300
    max_duration = 30.0 if SMOKE else 120.0
    # Parallel assembly only pays off with spare cores: on a 1-2 core host,
    # spawned processes are ~3x slower (IPC + contention), and measurement
    # showed thread workers ALSO lose there under realistic cold-cache
    # conditions (context switching + cache thrash beat the GIL-released
    # overlap). Multi-core hosts use processes; thread workers
    # (num_thread_workers) remain available for IPC-averse multi-core
    # setups.
    cores = os.cpu_count() or 4
    num_workers = (2 if SMOKE else min(8, cores - 2)) if cores >= 4 else 0
    num_thread_workers = 0

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        cuts_path, noise_path = _synthesize_corpus(root, n_rec, n_noise=4)

        def build_loader(workers=None, thread_workers=None):
            # Augmentation chain per BASELINE config #3: speed perturb +
            # noise (MUSAN-style) mixing; fbank is computed on the fly.
            cuts = (
                CutSet.from_jsonl_lazy(cuts_path)
                .perturb_speed(1.1)
                .mix(
                    CutSet.from_file(noise_path),
                    snr=(10, 20),
                    mix_prob=0.5,
                    seed=7,
                )
            )
            sampler = DynamicBucketingSampler(
                cuts,
                max_duration=max_duration,
                # Known bins (the corpus draws U(4, 14) s): skips the
                # bin-estimation pre-scan of the whole lazy manifest chain.
                duration_bins=[6.0, 9.0, 12.0],
                buffer_size=max(n_rec, 16),
                shuffle=True,
                seed=0,
                world_size=1,
                rank=0,
            )
            dataset = K2SpeechRecognitionDataset(
                input_strategy=OnTheFlyFeatures(Fbank())
            )
            return DataLoader(
                sampler, dataset,
                num_workers=num_workers if workers is None else workers,
                num_thread_workers=(
                    num_thread_workers if thread_workers is None else thread_workers
                ),
                prefetch_batches=2,
            )

        from lhotse_tpu.tracing import (
            reset_tracing,
            set_tracing_enabled,
            tracing_report,
        )

        def run_pass():
            audio_seconds = 0.0
            n_batches = 0
            with _StealMeter() as sm:
                t0 = time.perf_counter()
                for batch in build_loader():
                    n_batches += 1
                    # 100 fps fbank: frames/100 = audio seconds processed.
                    sup = batch["supervisions"]
                    audio_seconds += float(np.sum(sup["num_frames"])) / 100.0
                elapsed = time.perf_counter() - t0
            return audio_seconds, n_batches, elapsed, sm.steal_pct

        # Warmup passes (imports, kernel caches, page cache), then median of
        # 3 timed passes — single short windows on a shared 1-core host
        # drifted 2x between same-day runs in round 4. Tracing runs in a
        # SEPARATE final pass so span bookkeeping doesn't tax the timings.
        # The warm passes run with the decoded-audio LRUs populated (the
        # steady state of multi-epoch training on a corpus that fits the
        # cache budget); TWO warmups because the post-transform window
        # memoization (caching.DecodedAudioCache) caches a window on its
        # SECOND sighting — epoch 1 marks, epoch 2 fills, epoch 3+ hit. The
        # separately reported COLD pass clears all caches first —
        # production-shaped when the corpus outsizes RAM.
        run_pass()
        run_pass()
        repeats = sorted(
            (run_pass() for _ in range(1 if SMOKE else 3)),
            key=lambda r: r[0] / r[2],
        )
        audio_seconds, n_batches, elapsed, _ = repeats[len(repeats) // 2]

        set_caching_enabled(False)  # clears decoded-audio + byte LRUs
        set_caching_enabled(True)
        cold_a, _, cold_e, cold_steal = run_pass()

        # Re-warm past window-cache probation so the traced spans describe
        # the same steady state the warm medians report.
        run_pass()
        set_tracing_enabled(True)
        reset_tracing()
        run_pass()
        set_tracing_enabled(False)
        spans = tracing_report(reset=True)

        # Parallel-loader legs (one pass each): prove the spawned-process and
        # thread-worker paths run the identical pipeline and record their
        # throughput relative to workers=0 — on this 1-core bench host they
        # are expected to LOSE (IPC/context-switch overhead with no spare
        # core); the number documents that honestly rather than leaving the
        # "scales per core" claim without any measurement.
        def timed_pass(loader):
            audio_seconds = 0.0
            t0 = time.perf_counter()
            for batch in loader:
                audio_seconds += (
                    float(np.sum(batch["supervisions"]["num_frames"])) / 100.0
                )
            return audio_seconds / (time.perf_counter() - t0)

        workers2 = timed_pass(build_loader(workers=2, thread_workers=0))
        threadw2 = timed_pass(build_loader(workers=0, thread_workers=2))

    report = {
        "host_pipeline_audio_sec_per_sec": round(audio_seconds / elapsed, 1),
        "host_pipeline_batches_per_sec": round(n_batches / elapsed, 3),
        "host_pipeline_num_batches": n_batches,
        "host_pipeline_repeats": [round(a / e, 1) for a, _, e, _ in repeats],
        "host_pipeline_host_steal_pct": [s for _, _, _, s in repeats],
        "host_pipeline_cold_audio_sec_per_sec": round(cold_a / cold_e, 1),
        "host_pipeline_cold_host_steal_pct": cold_steal,
        "host_pipeline_workers": num_workers,
        "host_pipeline_thread_workers": num_thread_workers,
        "host_pipeline_workers2_audio_sec_per_sec": round(workers2, 1),
        "host_pipeline_threadworkers2_audio_sec_per_sec": round(threadw2, 1),
        "host_pipeline_methodology": "median of 3 warm epochs after warmup (decoded-audio LRU resident); _cold_ key = one epoch after clearing all caches; stage spans from a separate traced epoch; workers2/threadworkers2 legs are single epochs on this 1-core host; *_host_steal_pct records hypervisor contention",
    }
    # Stage breakdown (seconds per span; nested spans overlap — decode/
    # transforms/fbank happen inside read_audio/assemble). With spawned
    # workers the spans live in the worker processes and stay empty here.
    for span, key in [
        ("sampler.next", "sampler"),
        ("dataset.assemble", "assemble"),
        ("collation.read_audio", "read_audio"),
        ("audio.decode", "decode"),
        ("audio.transforms", "transforms"),
        ("Fbank.extract_batch", "fbank"),
    ]:
        if span in spans:
            report[f"host_stage_{key}_s"] = round(spans[span]["total_s"], 3)
    return report


# ---------------------------------------------------------------------------
# 3) End-to-end TPU-first pipeline: host decodes/collates raw audio, the
#    prefetch thread pads/encodes/device_puts, the chip runs augment+fbank —
#    assembly, transfer, and compute fully overlapped (the architecture this
#    framework is built around: shape-bucketed batches -> one compiled
#    program per bucket).
# ---------------------------------------------------------------------------
def _bucket_device_seconds(aug, reps: int = 6, group: int = 1) -> dict:
    """Per-bucket device seconds per DISPATCH, measured after compilation by
    dispatching ``reps`` executions and fetching their scalars at the end
    (executions serialize on the device stream, so the window covers them
    all). Keyed by the staged (batch, samples) shape; with ``group > 1`` the
    grouped mega-batch program is timed (one dispatch covers ``group``
    batches)."""
    times = {}
    for ub, bsz in aug.buckets:
        t = int(ub * aug.sampling_rate)
        zeros = np.zeros((bsz, t), np.float32)
        lens = np.full(bsz, t, np.int64)
        if group > 1:
            staged = [aug.stage(zeros, lens) for _ in range(group)]
            aug.compute_grouped(staged)  # warm
            t0 = time.perf_counter()
            outs = [
                aug.compute_grouped(staged)[-1][0].mean() for _ in range(reps)
            ]
            for o in outs:
                float(o)
            times[tuple(staged[0].audio.shape)] = (
                time.perf_counter() - t0
            ) / reps
            continue
        staged = aug.stage(zeros, lens)
        float(aug.compute(staged)[0].mean())  # warm
        t0 = time.perf_counter()
        outs = [aug.compute(staged)[0].mean() for _ in range(reps)]
        for o in outs:
            float(o)
        # Key by the STAGED shape (wire bytes, not samples) — the run loop
        # looks shapes up from staged.audio, and for mulaw/adpcm4 the wire
        # width differs from the sample count.
        times[tuple(staged.audio.shape)] = (time.perf_counter() - t0) / reps
    return times


def _native_wire_encoder_available(wire_format: str) -> bool:
    """True when encode_wire(wire_format) takes the C kernel (host_dsp)."""
    try:
        from lhotse_tpu.ops import host_dsp

        lib = host_dsp._get_lib()
        if lib is None:
            return False
        fn = {"adpcm4": "adpcm4_encode_f32", "mulaw": "mulaw_encode_lut_f32"}.get(
            wire_format
        )
        return fn is None or getattr(lib, fn, None) is not None
    except Exception:
        return False


def bench_e2e_tpu(wire_format: str = "int16", key_suffix: str = "") -> dict:
    from lhotse_tpu import CutSet, set_caching_enabled

    set_caching_enabled(True)  # decoded-audio LRU
    from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
    from lhotse_tpu.dataset.input_strategies import AudioSamples
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    n_rec = 12 if SMOKE else 300
    max_duration = 30.0 if SMOKE else 240.0
    SR = 16000
    SPEED = 1.1

    # The static shape vocabulary: bucket upper bounds (seconds) and fixed
    # batch sizes. The sampler runs under FixedBucketBatchSizeConstraint
    # over the SAME vocabulary, so no batch can ever exceed its bucket
    # (round 4 paired these buckets with a duration budget instead, and a
    # long-window run eventually drew an oversized batch) while batches
    # stay tightly packed. Exactly len(BUCKETS) compiled programs serve the
    # entire run.
    if SMOKE:
        BUCKETS = [(8.0, 5), (14.0, 5)]
    else:
        BUCKETS = [(6.0, 41), (9.0, 28), (12.0, 21), (14.0, 19)]
    bin_edges = [ub for ub, _ in BUCKETS[:-1]]

    rng_init = np.random.RandomState(99)
    # Augmentation assets: a MUSAN-style noise pool (staged into HBM by the
    # augmenter — only the speech batch crosses the wire, as int16) and one
    # shared RIR. Config #3's single noise mix runs ON DEVICE (mix_prob=1);
    # the host path carries manifests + decode only.
    L = SR // 2
    rir_np = (
        np.exp(-np.arange(L) / (L / 6.0)) * rng_init.randn(L) * 0.5
    ).astype(np.float32)
    rir_np[L // 50] = 1.0
    noise_host = (rng_init.randn(4, 10 * SR) * 0.05).astype(np.float32)

    # The PUBLIC device-augmentation stage runs the measured chain — the
    # benchmark exercises exactly what a user gets.
    from lhotse_tpu.dataset.signal_transforms import SpecAugment

    aug = OnDeviceAugmenter(
        BUCKETS,
        sampling_rate=SR,
        speed_factor=SPEED,
        gain_range=(0.8, 1.2),
        noise_pool=noise_host,
        snr=(10, 20),
        mix_prob=1.0,
        rir=rir_np,
        wire_format=wire_format,
        seed=0,
        specaugment=SpecAugment(seed=0),
    )

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        cuts_path, _ = _synthesize_corpus(root, n_rec, n_noise=1)
        from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
            FixedBucketBatchSizeConstraint,
        )

        cuts = CutSet.from_jsonl_lazy(cuts_path)
        sampler = DynamicBucketingSampler(
            cuts,
            constraint=FixedBucketBatchSizeConstraint(
                max_seq_len_buckets=[ub for ub, _ in BUCKETS],
                batch_sizes=[bsz for _, bsz in BUCKETS],
            ),
            num_buckets=None,
            duration_bins=bin_edges,
            buffer_size=max(n_rec, 16),
            shuffle=True,
            seed=0,
            world_size=1,
            rank=0,
        )
        dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())

        def stage_batch(batch):
            # Runs in the loader's prefetch thread: pad to the bucket shape
            # and encode the wire format. The device_put happens in a
            # separate transfer stage (transfer_stream below): on the
            # tunneled chip the put BLOCKS its calling thread, and doing it
            # here would serialize the wire with decode/collate.
            ns = np.asarray(batch["supervisions"]["num_samples"])
            staged = aug.stage(np.asarray(batch["inputs"]), ns, transfer=False)
            return staged, float(ns.sum()) / SR

        # prefetch_batches=3: up to three staged batches in flight, so the
        # tunnel transfer of batch N+1/N+2 overlaps both the host decode of
        # batch N+3 and the device compute of batch N.
        loader = DataLoader(
            sampler, dataset, prefetch_batches=3, apply_fn=stage_batch
        )

        # Pre-compile every bucket shape outside the timed region (standard
        # practice; on the tunneled chip each compile costs tens of seconds)
        # and estimate each bucket program's device time for the duty-cycle
        # report. GROUP batches of one bucket share a single device dispatch
        # (compute_grouped): on the tunneled chip the fresh loop is
        # round-trip-bound like the cached one — each dispatch costs
        # ~15-20 ms there regardless of batch size.
        GROUP = 1 if SMOKE else 4
        aug.precompile(group=GROUP)
        per_shape_s = _bucket_device_seconds(aug, group=GROUP)

        from lhotse_tpu.dataset.loader import transfer_stream

        audio_seconds = 0.0
        n_batches = 0
        dispatch_counts: dict = {}
        pending: dict = {}
        feats = flens = None
        t0 = time.perf_counter()
        for staged, asec in transfer_stream(loader, lookahead=2 * GROUP):
            # Dispatch only (no per-batch host-side mean — ~15 ms each on
            # the tunneled chip; a training loop consumes feats on device).
            n_batches += 1
            audio_seconds += asec
            shape = tuple(staged.audio.shape)
            if GROUP > 1:
                q = pending.setdefault(shape, [])
                q.append(staged)
                if len(q) >= GROUP:
                    feats, flens = aug.compute_grouped(q)[-1]
                    q.clear()
                    dispatch_counts[shape] = dispatch_counts.get(shape, 0) + 1
            else:
                feats, flens = aug.compute(staged)
                dispatch_counts[shape] = dispatch_counts.get(shape, 0) + 1
        for q in pending.values():
            # Leftovers reuse the already-compiled single-batch program; the
            # duty estimate books them at one grouped dispatch's cost (an
            # overestimate of busy time for a handful of batches at most).
            for staged in q:
                feats, flens = aug.compute(staged)
            if q:
                shape = tuple(q[0].audio.shape)
                dispatch_counts[shape] = dispatch_counts.get(shape, 0) + 1
        # In-order device stream: the LAST batch's (tiny) feat_lens output
        # being ready proves every prior execution ran to completion.
        assert int(np.asarray(flens).max()) > 0
        assert np.isfinite(float(feats.mean()))
        elapsed = time.perf_counter() - t0

    device_busy_s = sum(
        per_shape_s.get(shape, 0.0) * n for shape, n in dispatch_counts.items()
    )
    if key_suffix:
        # Secondary wire-format pass: throughput + duty cycle.
        return {
            f"e2e_tpu_audio_sec_per_sec{key_suffix}": round(
                audio_seconds / elapsed, 1
            ),
            f"e2e_tpu_batches_per_sec{key_suffix}": round(n_batches / elapsed, 3),
            f"e2e_device_busy_frac{key_suffix}": round(
                min(1.0, device_busy_s / elapsed), 4
            ),
            f"e2e_wire_format{key_suffix}": wire_format,
            # Which encoder actually ran on the staging hot path.
            f"e2e_native_encoder{key_suffix}": _native_wire_encoder_available(
                wire_format
            ),
        }
    return {
        "e2e_tpu_audio_sec_per_sec": round(audio_seconds / elapsed, 1),
        "e2e_tpu_batches_per_sec": round(n_batches / elapsed, 3),
        # Estimated chip duty cycle: per-bucket program seconds (measured
        # post-compile) x batch counts / wall time.
        "e2e_device_busy_frac": round(min(1.0, device_busy_s / elapsed), 4),
        "e2e_device_chain": E2E_CHAIN,
        "e2e_wire_format": wire_format,
        "e2e_staging": (
            "decode_thread(encode)+transfer_stream(device_put)"
            "+grouped_dispatch(4 batches/program)"
        ),
    }


def bench_e2e_tpu_adpcm4() -> dict:
    """The fresh-decode e2e loop again with the 4-bit wire: on a link-bound
    host->chip setup this is the opt-in lossy trade (ops/wire.py)."""
    return bench_e2e_tpu(wire_format="adpcm4", key_suffix="_adpcm4")


# ---------------------------------------------------------------------------
# 3b) Device-cached e2e: same pipeline with a DeviceSampleCache — epoch 1
#     fills HBM pools with the wire-format audio (untimed), epochs 2+ run
#     with ZERO host decode and ZERO host->device audio transfer (the
#     steady state of multi-epoch training; dataset/device_cache.py).
# ---------------------------------------------------------------------------
def bench_e2e_cached() -> dict:
    from lhotse_tpu import CutSet, set_caching_enabled

    set_caching_enabled(True)
    from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
    from lhotse_tpu.dataset.device_cache import (
        CacheAwareAudioSamples,
        DeviceSampleCache,
        batch_cut_info,
    )
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    n_rec = 12 if SMOKE else 300
    max_duration = 30.0 if SMOKE else 240.0
    SR = 16000
    # Two buckets (vs the uncached leg's four) keep this section's tunnel
    # compile bill bounded: each bucket costs three compiles here (wire
    # pipeline + pool-gather pipeline + pool scatter). The sampler runs
    # under FixedBucketBatchSizeConstraint over the same vocabulary, so no
    # batch can exceed its bucket.
    if SMOKE:
        BUCKETS = [(8.0, 5), (14.0, 5)]
    else:
        BUCKETS = [(9.0, 28), (14.0, 19)]
    bin_edges = [ub for ub, _ in BUCKETS[:-1]]

    rng_init = np.random.RandomState(99)
    L = SR // 2
    rir_np = (
        np.exp(-np.arange(L) / (L / 6.0)) * rng_init.randn(L) * 0.5
    ).astype(np.float32)
    rir_np[L // 50] = 1.0
    noise_host = (rng_init.randn(4, 10 * SR) * 0.05).astype(np.float32)

    from lhotse_tpu.dataset.signal_transforms import SpecAugment

    cache = DeviceSampleCache(capacity_seconds=600 if SMOKE else 2 * 3600)
    aug = OnDeviceAugmenter(
        BUCKETS,
        sampling_rate=SR,
        speed_factor=1.1,
        gain_range=(0.8, 1.2),
        noise_pool=noise_host,
        snr=(10, 20),
        mix_prob=1.0,
        rir=rir_np,
        wire_format="int16",
        seed=0,
        sample_cache=cache,
        specaugment=SpecAugment(seed=0),
    )

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        cuts_path, _ = _synthesize_corpus(root, n_rec, n_noise=1)
        dataset = K2SpeechRecognitionDataset(
            return_cuts=True, input_strategy=CacheAwareAudioSamples(aug)
        )

        def stage_fn(batch):
            ids, lens = batch_cut_info(batch)
            staged = aug.stage(batch["inputs"], lens, ids=ids, transfer=False)
            return staged, float(lens.sum()) / SR

        from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
            FixedBucketBatchSizeConstraint,
        )

        from lhotse_tpu.dataset.device_augment import CachedBatch

        # Steps-per-dispatch: group GROUP cache-resident batches of the same
        # bucket into ONE device program (compute_grouped) — the cached loop
        # is dispatch-round-trip-bound on the tunneled chip (host side
        # measures ~3 ms/batch; a dispatch costs ~15-20 ms there).
        GROUP = 1 if SMOKE else 4

        last_out = [None]

        def flush_pending(pending):
            # Leftovers reuse the already-compiled single-batch program.
            for q in pending.values():
                for staged in q:
                    last_out[0] = aug.compute(staged)
            pending.clear()

        def settle():
            # Executions are in-order on the device stream: fetching the LAST
            # batch's (tiny) feat_lens output proves every batch ran; the
            # final mean guards finiteness of the last program's math.
            feats, flens = last_out[0]
            assert int(np.asarray(flens).max()) > 0
            assert np.isfinite(float(feats.mean()))

        # Manifests parse ONCE and live in memory for the whole run — the
        # steady state of any real multi-epoch training loop (per-epoch
        # JSONL re-parse was ~35% of host staging time in profiles).
        cuts_eager = CutSet.from_jsonl_lazy(cuts_path).to_eager()

        def run_epoch(epoch_seed, pending):
            # ``pending`` persists ACROSS epochs: continuous multi-epoch
            # training never drains the stream at an epoch boundary, so
            # partially-filled groups simply top up from the next epoch's
            # batches instead of paying a full dispatch round trip each —
            # with small epochs the per-epoch flush was up to half the
            # dispatch count for a quarter of the work.
            sampler = DynamicBucketingSampler(
                cuts_eager,
                constraint=FixedBucketBatchSizeConstraint(
                    max_seq_len_buckets=[ub for ub, _ in BUCKETS],
                    batch_sizes=[bsz for _, bsz in BUCKETS],
                ),
                num_buckets=None,
                duration_bins=bin_edges,
                buffer_size=max(n_rec, 16),
                shuffle=True,
                seed=epoch_seed,
                world_size=1,
                rank=0,
            )
            loader = DataLoader(
                sampler, dataset, prefetch_batches=3, apply_fn=stage_fn
            )
            from lhotse_tpu.dataset.loader import transfer_stream

            audio_seconds = 0.0
            n_batches = 0
            for staged, asec in transfer_stream(loader, lookahead=2):
                n_batches += 1
                audio_seconds += asec
                if isinstance(staged, CachedBatch) and GROUP > 1:
                    q = pending.setdefault(staged.bucket_t, [])
                    q.append(staged)
                    if len(q) >= GROUP:
                        last_out[0] = aug.compute_grouped(q)[-1]
                        q.clear()
                else:
                    # miss/transfer path (epoch 1, evictions): dispatch as-is
                    last_out[0] = aug.compute(staged)
            return audio_seconds, n_batches

        # group=GROUP also compiles the 4-batch mega-program per bucket —
        # without it the first grouped dispatch compiles INSIDE the timed
        # window (minutes over the tunnel; try4's 179 audio-s/s record was
        # exactly this).
        aug.precompile(group=GROUP)
        pending = {}
        run_epoch(0, pending)  # epoch 1: decode + transfer + pool fill (untimed)
        flush_pending(pending)
        if last_out[0] is not None:
            settle()

        # 3 repeats of a >=8s window each, median reported (same rationale
        # as the precomputed leg: short single windows drift with host
        # state; the official record must reproduce).  Within a window the
        # group queue persists across epochs (continuous-training shape) and
        # is flushed + settled INSIDE the timed window so every counted
        # audio-second was actually dispatched and executed.
        MIN_WINDOW_S = 0.5 if SMOKE else 8.0
        repeats = []
        epochs = 0
        for _ in range(1 if SMOKE else 3):
            audio_seconds = 0.0
            n_batches = 0
            t0 = time.perf_counter()
            while True:
                a, b = run_epoch(epochs + 1, pending)
                audio_seconds += a
                n_batches += b
                epochs += 1
                if time.perf_counter() - t0 > MIN_WINDOW_S or epochs >= 120:
                    break
            flush_pending(pending)
            settle()
            elapsed = time.perf_counter() - t0
            repeats.append((audio_seconds / elapsed, n_batches / elapsed))

    repeats.sort()
    med = repeats[len(repeats) // 2]
    stats = cache.stats()
    return {
        "e2e_cached_audio_sec_per_sec": round(med[0], 1),
        "e2e_cached_batches_per_sec": round(med[1], 3),
        "e2e_cached_repeats": [round(r[0], 1) for r in repeats],
        "e2e_cached_epochs": epochs,
        "e2e_cached_hit_rate": round(stats["hit_rate"], 4),
        "e2e_cached_pool_mb": round(stats["memory_bytes"] / 1e6, 1),
        "e2e_cached_chain": E2E_CHAIN,
        "e2e_cached_methodology": "median of 3 repeats, each >=8s of epochs; cache-hit batches grouped 4-per-dispatch (compute_grouped), group queue carried across epochs and flushed+settled inside the timed window",
    }


# ---------------------------------------------------------------------------
# 4) Precomputed-features pipeline (BASELINE config #1's offline path): fbank
#    stored as chunked .lca once (untimed), then the hot loop is manifest
#    iteration + chunked pread + collate — the standard production mode when
#    features are precomputed. Reference chunked reads:
#    /root/reference/lhotse/features/io.py:936-1060.
# ---------------------------------------------------------------------------
def bench_precomputed() -> dict:
    from lhotse_tpu import CutSet, Fbank
    from lhotse_tpu.dataset.input_strategies import PrecomputedFeatures
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset
    from lhotse_tpu.features.io import LilcomChunkyWriter

    n_rec = 12 if SMOKE else 300
    max_duration = 30.0 if SMOKE else 120.0

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        cuts_path, _ = _synthesize_corpus(root, n_rec, n_noise=1)
        # Offline precompute (untimed): fbank -> chunked .lca archive.
        cuts = CutSet.from_file(cuts_path).compute_and_store_features(
            Fbank(),
            storage_path=root / "feats",
            storage_type=LilcomChunkyWriter,
            progress_bar=False,
        )
        cuts_file = root / "cuts_feats.jsonl"
        cuts.to_file(cuts_file)

        # Parse the manifest once for the whole run (multi-epoch steady
        # state); each epoch builds a fresh sampler over the in-memory set.
        cuts_eager = CutSet.from_jsonl_lazy(cuts_file).to_eager()

        def build_loader():
            sampler = DynamicBucketingSampler(
                cuts_eager,
                max_duration=max_duration,
                duration_bins=[6.0, 9.0, 12.0],
                buffer_size=max(n_rec, 16),
                shuffle=True,
                seed=0,
                world_size=1,
                rank=0,
            )
            dataset = K2SpeechRecognitionDataset(
                input_strategy=PrecomputedFeatures()
            )
            return DataLoader(sampler, dataset, prefetch_batches=2)

        # One warmup pass (page cache, file-handle LRU), then 3 independent
        # repeats, each timed over >= MIN_WINDOW_S and >= MIN_BATCHES; the
        # reported number is the MEDIAN repeat (short windows on a 1-core
        # host swing with machine state — the round-4 record drifted 2x).
        for _ in build_loader():
            pass
        MIN_WINDOW_S = 0.3 if SMOKE else 8.0
        MIN_BATCHES = 5 if SMOKE else 500
        repeats = []
        steals = []
        total_epochs = 0
        for _ in range(1 if SMOKE else 5):
            audio_seconds = 0.0
            n_batches = 0
            with _StealMeter() as sm:
                t0 = time.perf_counter()
                while True:
                    for batch in build_loader():
                        n_batches += 1
                        audio_seconds += (
                            float(np.sum(batch["supervisions"]["num_frames"])) / 100.0
                        )
                    total_epochs += 1
                    if (
                        time.perf_counter() - t0 > MIN_WINDOW_S
                        and n_batches >= MIN_BATCHES
                    ) or total_epochs >= 150:
                        break
                elapsed = time.perf_counter() - t0
            repeats.append((audio_seconds / elapsed, n_batches / elapsed))
            steals.append(sm.steal_pct)

    repeats.sort()
    med = repeats[len(repeats) // 2]
    return {
        "precomputed_audio_sec_per_sec": round(med[0], 1),
        "precomputed_batches_per_sec": round(med[1], 3),
        "precomputed_repeats": [round(r[0], 1) for r in repeats],
        "precomputed_host_steal_pct": steals,
        "precomputed_storage": "lilcom_chunky(.lca, LTC1 chunks)",
        "precomputed_epochs": total_epochs,
        "precomputed_methodology": "median of 5 repeats, each >=8s and >=500 batches; *_host_steal_pct records hypervisor contention per repeat",
    }



# ---------------------------------------------------------------------------
# Harness: every section (INCLUDING the headline device section) runs behind
# retry-with-backoff, the cumulative report is re-emitted after every section
# (stdout JSON line + on-disk partial), and main() exits 0 whenever ANY
# section produced a number.  Rationale: the tunneled chip throws transient
# ``FAILED_PRECONDITION: TPU backend error``s — two of the first four round
# records were lost to a single unprotected crash (driver contract:
# /root/repo/BASELINE.json; the driver parses the LAST JSON line of stdout).
# ---------------------------------------------------------------------------
# CPU-only sections run FIRST: they emit a parseable record within ~2
# minutes and measure the host before the TPU runtime spins up; the device
# sections follow (on the tunneled chip their compiles can take many
# minutes, and 2 of the first 4 round records died before any output).
SECTION_NAMES = (
    "bench_precomputed",
    "bench_host_pipeline",
    "bench_device",
    "bench_e2e_tpu",
    "bench_e2e_tpu_adpcm4",
    "bench_e2e_cached",
)
SECTION_RETRIES = 3
PARTIAL_PATH = Path(__file__).parent / ".bench_partial.json"


def emit(report: dict) -> None:
    """Print the cumulative report as one JSON line and mirror it to disk.

    Called after EVERY section so a mid-run kill (timeout, OOM, tunnel
    death) still leaves the most recent complete snapshot as the last
    parseable line on stdout.
    """
    line = json.dumps(report)
    print(line, flush=True)
    try:
        PARTIAL_PATH.write_text(line + "\n")
    except OSError:
        pass


def run_section(name: str, report: dict, retries: int = SECTION_RETRIES) -> bool:
    """Run one bench section with retry + backoff; never raises.

    The section function is looked up in module globals AT CALL TIME (so
    tests can inject faults), re-invoked from scratch on each retry (fresh
    device arrays), and its result dict merged into ``report``.  Returns
    True iff the section eventually succeeded.
    """
    import gc
    import sys
    import traceback

    # Objects surviving previous sections (compiled executables, caches)
    # are permanent for this process: freeze them out of the collector so
    # gen-2 sweeps don't tax later sections' Python-heavy hot loops.
    gc.collect()
    gc.freeze()

    fn = globals()[name]
    t0 = time.perf_counter()
    ok = False
    for attempt in range(1, retries + 1):
        try:
            report.update(fn())
            report.pop(f"{name}_error", None)
            ok = True
            break
        except Exception as e:  # noqa: BLE001 — the record must survive
            traceback.print_exc(file=sys.stderr)
            report[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            if attempt < retries:
                delay = 2.0 * attempt
                print(
                    f"[bench] {name} attempt {attempt}/{retries} failed; "
                    f"retrying in {delay:.0f}s",
                    file=sys.stderr,
                )
                time.sleep(delay)
    print(
        f"[bench] {name}: {time.perf_counter() - t0:.1f}s "
        f"({'ok' if ok else 'FAILED after retries'})",
        file=sys.stderr,
    )
    return ok


def main() -> int:
    import jax

    if SMOKE:
        # The tunneled TPU's compile latency would dominate the smoke gate.
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: on the tunneled chip, XLA compiles
    # dominate bench wall time (~minutes); cache them across runs.
    try:
        cache_dir = os.environ.get(
            "LHOTSE_TPU_COMPILE_CACHE", str(Path(__file__).parent / ".jax_cache")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags: compile from scratch

    report = {
        "metric": "fbank_extract_augment_throughput",
        "value": 0.0,
        "unit": "audio_sec_per_sec",
        "vs_baseline": 0.0,
        "device_chain": DEVICE_CHAIN,
    }
    # Dev-only selective runs: LHOTSE_TPU_BENCH_SECTIONS="bench_e2e_cached"
    # re-validates one leg without paying the full run. The driver sets
    # nothing, so official records always cover every section.
    only = os.environ.get("LHOTSE_TPU_BENCH_SECTIONS")
    names = (
        [n for n in SECTION_NAMES if n in only.split(",")]
        if only
        else list(SECTION_NAMES)
    )
    any_ok = False
    for i, name in enumerate(names):
        ok = run_section(name, report)
        any_ok = any_ok or ok
        if name == "bench_device" and ok:
            report["vs_baseline"] = round(report["value"] / 10000.0, 3)
        report["status"] = (
            "complete"
            if i + 1 == len(names) and len(names) == len(SECTION_NAMES)
            else f"partial({i + 1}/{len(names)} sections)"
        )
        emit(report)
    # Exit 0 whenever ANY section produced a number: a partial record beats
    # a null one, and the final emit above is the line the driver parses.
    return 0 if any_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
