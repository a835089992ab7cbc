// Native host-side audio runtime for sincformer_tpu.
//
// The reference delegates WAV I/O to libsndfile via the soundfile package
// and resampling to librosa (training/pipeline.py:33-94); neither is
// guaranteed present, and the Python fallbacks run sample-by-sample. This
// library is the framework's native data-loader core: RIFF/WAVE decoding
// (PCM 16/24/32 and IEEE float32), mono mixdown, linear resampling and SNR
// mixing — the per-utterance host work that feeds device batches.
//
// C ABI, consumed through ctypes (sincformer_tpu/data/native.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ───────────────────────── WAV decoding ────────────────────────────────

// Parse the RIFF header; returns 0 on success. Outputs: sample rate,
// channel count, frame count (samples per channel), and whether the
// payload is IEEE float.
static int parse_header(FILE* f, uint32_t* sr, uint16_t* channels,
                        uint16_t* bits, uint32_t* data_bytes,
                        long* data_offset, int* is_float) {
    char id[4];
    uint32_t sz;
    if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4) != 0) return -1;
    if (fread(&sz, 4, 1, f) != 1) return -1;
    if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4) != 0) return -1;

    uint16_t fmt_tag = 0;
    *data_bytes = 0;
    *data_offset = -1;
    while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
        if (memcmp(id, "fmt ", 4) == 0) {
            uint8_t buf[40];
            uint32_t take = sz < sizeof(buf) ? sz : (uint32_t)sizeof(buf);
            if (fread(buf, 1, take, f) != take) return -1;
            if (sz > take) fseek(f, sz - take, SEEK_CUR);
            fmt_tag = (uint16_t)(buf[0] | buf[1] << 8);
            *channels = (uint16_t)(buf[2] | buf[3] << 8);
            *sr = (uint32_t)(buf[4] | buf[5] << 8 | buf[6] << 16 |
                             buf[7] << 24);
            *bits = (uint16_t)(buf[14] | buf[15] << 8);
            // WAVE_FORMAT_EXTENSIBLE: real tag in the SubFormat GUID
            if (fmt_tag == 0xFFFE && sz >= 40)
                fmt_tag = (uint16_t)(buf[24] | buf[25] << 8);
        } else if (memcmp(id, "data", 4) == 0) {
            *data_bytes = sz;
            *data_offset = ftell(f);
            fseek(f, sz + (sz & 1), SEEK_CUR);
        } else {
            fseek(f, sz + (sz & 1), SEEK_CUR);
        }
    }
    if (*data_offset < 0 || fmt_tag == 0) return -2;
    *is_float = (fmt_tag == 3);
    if (fmt_tag != 1 && fmt_tag != 3) return -3;  // PCM or IEEE float only
    // Reject bit depths the decoder has no branch for, so callers get an
    // error (and the Python loader falls through to soundfile/scipy)
    // instead of silently decoding to zeros.
    if (*is_float) {
        if (*bits != 32) return -4;
    } else if (*bits != 8 && *bits != 16 && *bits != 24 && *bits != 32) {
        return -4;
    }
    return 0;
}

// Number of mono samples in the file, or <0 on error.
long wav_num_samples(const char* path, int* sample_rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t sr, data_bytes;
    uint16_t channels, bits;
    long off;
    int is_float;
    int rc = parse_header(f, &sr, &channels, &bits, &data_bytes, &off,
                          &is_float);
    fclose(f);
    if (rc != 0 || channels == 0 || bits == 0) return -2;
    if (sample_rate) *sample_rate = (int)sr;
    return (long)(data_bytes / (bits / 8) / channels);
}

// Decode to mono float32 in [-1, 1]; buf must hold wav_num_samples floats.
// Returns samples written, or <0 on error.
long wav_read_mono(const char* path, float* buf, long buf_len) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t sr, data_bytes;
    uint16_t channels, bits;
    long off;
    int is_float;
    int rc = parse_header(f, &sr, &channels, &bits, &data_bytes, &off,
                          &is_float);
    if (rc != 0) { fclose(f); return -2; }
    long frames = (long)(data_bytes / (bits / 8) / channels);
    if (frames > buf_len) frames = buf_len;
    fseek(f, off, SEEK_SET);

    const long CHUNK = 65536;
    std::vector<uint8_t> raw((size_t)CHUNK * channels * (bits / 8));
    long done = 0;
    while (done < frames) {
        long take = frames - done < CHUNK ? frames - done : CHUNK;
        size_t bytes = (size_t)take * channels * (bits / 8);
        if (fread(raw.data(), 1, bytes, f) != bytes) break;
        for (long i = 0; i < take; ++i) {
            double acc = 0.0;
            for (int ch = 0; ch < channels; ++ch) {
                const uint8_t* p =
                    raw.data() + ((size_t)i * channels + ch) * (bits / 8);
                double v = 0.0;
                if (is_float && bits == 32) {
                    float fv;
                    memcpy(&fv, p, 4);
                    v = fv;
                } else if (bits == 8) {
                    // WAV 8-bit PCM is unsigned, biased at 128
                    v = ((int)p[0] - 128) / 128.0;
                } else if (bits == 16) {
                    int16_t s = (int16_t)(p[0] | p[1] << 8);
                    v = s / 32768.0;
                } else if (bits == 24) {
                    int32_t s = (p[0] | p[1] << 8 | p[2] << 16);
                    if (s & 0x800000) s |= ~0xFFFFFF;
                    v = s / 8388608.0;
                } else if (bits == 32) {
                    int32_t s;
                    memcpy(&s, p, 4);
                    v = s / 2147483648.0;
                }
                acc += v;
            }
            buf[done + i] = (float)(acc / channels);
        }
        done += take;
    }
    fclose(f);
    return done;
}

// ───────────────────────── DSP host ops ────────────────────────────────

// Linear-interpolation resampler with the reference's exact index mapping
// (pipeline.py:62-66): out[i] = interp(linspace(0, n_in-1, n_out)).
void resample_linear(const float* in, long n_in, float* out, long n_out) {
    if (n_out <= 1 || n_in <= 1) {
        for (long i = 0; i < n_out; ++i) out[i] = n_in > 0 ? in[0] : 0.0f;
        return;
    }
    double step = (double)(n_in - 1) / (double)(n_out - 1);
    for (long i = 0; i < n_out; ++i) {
        double pos = i * step;
        long j = (long)pos;
        if (j >= n_in - 1) { out[i] = in[n_in - 1]; continue; }
        double frac = pos - j;
        out[i] = (float)(in[j] * (1.0 - frac) + in[j + 1] * frac);
    }
}

// SNR mixing with noise tiling, matching add_noise_at_snr
// (pipeline.py:71-94): scale = sqrt(Pc / (Pn * 10^(snr/10))).
void mix_snr(const float* clean, long n, const float* noise, long n_noise,
             float snr_db, float* out) {
    double pc = 0.0, pn = 0.0;
    for (long i = 0; i < n; ++i) pc += (double)clean[i] * clean[i];
    for (long i = 0; i < n; ++i) {
        double v = noise[i % n_noise];
        pn += v * v;
    }
    pc = pc / n + 1e-10;
    pn = pn / n + 1e-10;
    double scale = sqrt(pc / (pn * pow(10.0, snr_db / 10.0)));
    for (long i = 0; i < n; ++i)
        out[i] = clean[i] + (float)(scale * noise[i % n_noise]);
}

// Assemble a right-zero-padded batch: srcs is a flat concatenation of the
// utterances, lens their lengths; out is (batch, max_len) row-major.
void batch_pad(const float* srcs, const long* lens, long batch,
               long max_len, float* out) {
    long off = 0;
    for (long b = 0; b < batch; ++b) {
        long n = lens[b] < max_len ? lens[b] : max_len;
        memcpy(out + b * max_len, srcs + off, (size_t)n * sizeof(float));
        memset(out + b * max_len + n, 0,
               (size_t)(max_len - n) * sizeof(float));
        off += lens[b];
    }
}

}  // extern "C"
