"""
Headline benchmark: 80-dim fbank extract+augment throughput on one chip.

Pipeline under test (single fused jit program):
  gain perturb (augment) -> GEMM-NDFT fbank (80 mel) -> time/freq masking
  (SpecAugment-style augment), over a fixed-shape batch of 16 kHz audio.

Methodology note: on the remote-tunneled chip, ``block_until_ready`` does
not reliably synchronize, so we chain K pipeline iterations inside one
``lax.fori_loop`` (each iteration depends on the loop counter, preventing
collapse) and time dispatch→scalar-fetch of the accumulated mean. A warmup
call with the same K absorbs compilation.

Batch-size study on chip: B=64 -> 100.0k, B=128 -> 194.5k, B=256 ->
212.9k, B=512 -> 226.8k audio-sec/sec (MXU utilization grows with batch
rows; diminishing past ~256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline target is 10,000 audio-sec/sec/chip (BASELINE.md).
"""
import json
import os
import time

import numpy as np

# LHOTSE_TPU_BENCH_SMOKE=1 shrinks all sizes so the pre-commit smoke gate can
# run this end-to-end on CPU in a few seconds (numbers are meaningless there).
SMOKE = bool(int(os.environ.get("LHOTSE_TPU_BENCH_SMOKE", "0")))


def main():
    import jax

    if SMOKE:
        # Smoke mode runs on host CPU: the tunneled TPU's compile latency would
        # dominate the pre-commit gate (the axon plugin ignores JAX_PLATFORMS
        # env, so force it via config).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from lhotse_tpu.features.kaldi.layers import Wav2LogFilterBank

    BATCH = 8 if SMOKE else 512
    CLIP_SECONDS = 2 if SMOKE else 30
    SR = 16000
    NUM_SAMPLES = SR * CLIP_SECONDS
    AUDIO_SEC_PER_BATCH = BATCH * CLIP_SECONDS
    K = 2 if SMOKE else 50  # pipeline iterations chained on device per measurement

    fbank = Wav2LogFilterBank(sampling_rate=SR)
    n_frames = (NUM_SAMPLES + 80) // 160

    def pipeline(audio, gains, time_mask, freq_mask):
        # Augment 1: per-clip gain perturbation.
        audio = audio * gains[:, None]
        # Extract: 80-dim log-mel fbank (frame GEMM + mel GEMM -> MXU).
        feats = fbank(audio)
        # Augment 2: SpecAugment-style masked fill with the batch mean.
        mean = feats.mean()
        return jnp.where(
            time_mask[:, : feats.shape[1], None] | freq_mask[:, None, :], mean, feats
        )

    def many(audio, gains, time_mask, freq_mask):
        def body(i, acc):
            # Tie each iteration to the loop counter so XLA cannot collapse
            # the loop into a single pipeline execution.
            out = pipeline(audio + i.astype(jnp.float32) * 1e-9, gains, time_mask, freq_mask)
            return acc + out.mean()

        return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    fn = jax.jit(many)

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(BATCH, NUM_SAMPLES).astype(np.float32) * 0.1)
    gains = jnp.asarray(rng.uniform(0.8, 1.2, BATCH).astype(np.float32))
    tm = np.zeros((BATCH, n_frames), dtype=bool)
    fm = np.zeros((BATCH, 80), dtype=bool)
    for i in range(BATCH):
        s = rng.randint(0, n_frames - 100)
        tm[i, s : s + rng.randint(0, 100)] = True
        s = rng.randint(0, 53)
        fm[i, s : s + rng.randint(0, 27)] = True
    time_mask = jnp.asarray(tm)
    freq_mask = jnp.asarray(fm)

    # Warmup (compile) — fetch the scalar to force completion.
    float(fn(audio, gains, time_mask, freq_mask))

    # Best of 3 measurements (scalar fetch = full synchronization).
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(fn(audio, gains, time_mask, freq_mask))
        best = min(best, time.perf_counter() - start)

    audio_sec_per_sec = AUDIO_SEC_PER_BATCH * K / best
    print(
        json.dumps(
            {
                "metric": "fbank_extract_augment_throughput",
                "value": round(audio_sec_per_sec, 1),
                "unit": "audio_sec_per_sec",
                "vs_baseline": round(audio_sec_per_sec / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
