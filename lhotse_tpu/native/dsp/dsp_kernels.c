/*
 * Fused host-side DSP kernels for the data pipeline.
 *
 * frame_prep: framing + DC removal + pre-emphasis + window + f32->f64 widen
 * in a single pass per frame. This feeds the pocketfft rFFT in the numpy
 * extractor path (lhotse_tpu/features/kaldi/extractors.py). Doing these
 * steps separately in numpy costs ~6 read/write passes over a (T, n_fft)
 * float64 buffer — the dominant memory traffic of host featurization; the
 * fused loop touches each output element exactly once.
 *
 * Semantics mirror the reference Kaldi framing contract
 * (lhotse/features/kaldi/layers.py:727-772): mean computed over the raw
 * frame, energy measured after DC removal, pre-emphasis x[i] -= c*x[i-1]
 * with x[0] pre-emphasized against itself, window applied last.
 *
 * scale_i32_to_f32: PCM int32 -> float32 normalization in one pass
 * (decoders hand back int32; numpy's astype-then-divide is two).
 *
 * C ABI (ctypes, see lhotse_tpu/ops/host_dsp.py):
 *   frame_prep(x, n_samples, length, shift, n_frames, window, coeff,
 *              remove_dc, want_energy, energy_floor_log, out, fft_len,
 *              log_energy_or_null)
 *   scale_i32_to_f32(src, n, scale, dst)
 */
#include <math.h>
#include <stddef.h>
#include <stdint.h>

void frame_prep(const float *x, long long n_samples, int length, int shift,
                long long n_frames, const double *window, double coeff,
                int remove_dc, int want_energy, double energy_floor_log,
                double *out, int fft_len, double *log_energy) {
    (void)n_samples;
    for (long long f = 0; f < n_frames; f++) {
        const float *src = x + f * (long long)shift;
        double *dst = out + f * (long long)fft_len;

        double mean = 0.0;
        if (remove_dc || want_energy) {
            double acc = 0.0;
            for (int i = 0; i < length; i++) acc += (double)src[i];
            mean = acc / (double)length;
        }
        if (want_energy) {
            double e = 0.0;
            for (int i = 0; i < length; i++) {
                double v = (double)src[i] - mean;
                e += v * v;
            }
            double le = log(e + 1e-15);
            if (energy_floor_log > -HUGE_VAL && le < energy_floor_log)
                le = energy_floor_log;
            log_energy[f] = le;
        }
        double dc = remove_dc ? mean : 0.0;
        if (coeff != 0.0) {
            double first = (double)src[0] - dc;
            dst[0] = (first - coeff * first) * window[0];
            for (int i = 1; i < length; i++) {
                double cur = (double)src[i] - dc;
                double prev = (double)src[i - 1] - dc;
                dst[i] = (cur - coeff * prev) * window[i];
            }
        } else {
            for (int i = 0; i < length; i++)
                dst[i] = ((double)src[i] - dc) * window[i];
        }
        for (int i = length; i < fft_len; i++) dst[i] = 0.0;
    }
}

/*
 * float32 output variant of frame_prep: same per-frame semantics (mean and
 * energy still accumulate in double), but the windowed frames are emitted as
 * float32 for the f32 pocketfft path — half the memory traffic and a ~2-6x
 * faster FFT; the added noise matches the (float32) reference's own floor.
 */
void frame_prep_f32(const float *x, long long n_samples, int length, int shift,
                    long long n_frames, const float *window, double coeff,
                    int remove_dc, int want_energy, double energy_floor_log,
                    float *out, int fft_len, double *log_energy) {
    (void)n_samples;
    for (long long f = 0; f < n_frames; f++) {
        const float *src = x + f * (long long)shift;
        float *dst = out + f * (long long)fft_len;

        double mean = 0.0;
        if (remove_dc || want_energy) {
            double acc = 0.0;
            for (int i = 0; i < length; i++) acc += (double)src[i];
            mean = acc / (double)length;
        }
        if (want_energy) {
            double e = 0.0;
            for (int i = 0; i < length; i++) {
                double v = (double)src[i] - mean;
                e += v * v;
            }
            double le = log(e + 1e-15);
            if (energy_floor_log > -HUGE_VAL && le < energy_floor_log)
                le = energy_floor_log;
            log_energy[f] = le;
        }
        float dc = remove_dc ? (float)mean : 0.0f;
        float c = (float)coeff;
        if (c != 0.0f) {
            float first = src[0] - dc;
            dst[0] = (first - c * first) * window[0];
            for (int i = 1; i < length; i++) {
                float cur = src[i] - dc;
                float prev = src[i - 1] - dc;
                dst[i] = (cur - c * prev) * window[i];
            }
        } else {
            for (int i = 0; i < length; i++)
                dst[i] = (src[i] - dc) * window[i];
        }
        for (int i = length; i < fft_len; i++) dst[i] = 0.0f;
    }
}

void scale_i32_to_f32(const int32_t *src, long long n, float scale, float *dst) {
    for (long long i = 0; i < n; i++) dst[i] = (float)src[i] * scale;
}

/* |X|^2 over interleaved (re, im) float64 pairs — one pass, no temps. */
void power_spectrum_c128(const double *spec, long long n, double *out) {
    for (long long i = 0; i < n; i++) {
        double re = spec[2 * i], im = spec[2 * i + 1];
        out[i] = re * re + im * im;
    }
}

/* |X| over interleaved (re, im) float64 pairs. */
void magnitude_c128(const double *spec, long long n, double *out) {
    for (long long i = 0; i < n; i++) {
        double re = spec[2 * i], im = spec[2 * i + 1];
        out[i] = sqrt(re * re + im * im);
    }
}

/* complex64 variants for the float32 FFT path. */
void power_spectrum_c64(const float *spec, long long n, float *out) {
    for (long long i = 0; i < n; i++) {
        float re = spec[2 * i], im = spec[2 * i + 1];
        out[i] = re * re + im * im;
    }
}

void magnitude_c64(const float *spec, long long n, float *out) {
    for (long long i = 0; i < n; i++) {
        float re = spec[2 * i], im = spec[2 * i + 1];
        out[i] = sqrtf(re * re + im * im);
    }
}

/*
 * Polyphase windowed-sinc resampling for one waveform
 * (lhotse_tpu/augmentation/resample.py builds the kernel; the math matches
 * the reference's tensor resampler, lhotse/augmentation/resample.py:186-315).
 *
 * x is the already-padded input (width zeros left, width + orig right);
 * block t, phase j computes dot(x[t*orig .. +K], kernel[j]). Output is
 * written interleaved as out[t*phases + j] — the natural output sample
 * order — and the caller trims to the exact target length.
 */
void sinc_resample_f32(const float *x, long long num_blocks, const float *kernel,
                       int phases, int K, int orig, float *out) {
    for (long long t = 0; t < num_blocks; t++) {
        const float *base = x + t * (long long)orig;
        float *dst = out + t * (long long)phases;
        for (int j = 0; j < phases; j++) {
            const float *k = kernel + (size_t)j * K;
            float acc = 0.0f;
            for (int i = 0; i < K; i++) acc += base[i] * k[i];
            dst[j] = acc;
        }
    }
}
