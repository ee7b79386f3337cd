// tsasr_native: host-side native runtime for the TPU framework.
//
// The reference leans on native code for its host pipeline: torchaudio's
// C++ decoders feed the DataLoader workers and SentencePiece is a C++
// library (SURVEY.md §2 native-code census). This library provides the
// equivalent hot paths for the JAX framework, bound via ctypes:
//
//   - WAV decode (PCM 8/16/24/32 + float32), mono channel-0 extraction
//   - windowed-sinc polyphase resampling (Kaiser window, gcd-reduced),
//     numerically matching tsasr_tpu.data.audio.resample
//   - mixture synthesis: per-interferer gain, delay padding, sum, crop
//     (the recipe's on-the-fly mixing, host hot loop §3.3)
//   - Levenshtein alignment + WER op counts (eval hot loop)
//
// Build: make -C native   (produces libtsasr_native.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

void tsasr_free(void* p) { std::free(p); }

// --------------------------------------------------------------- WAV IO
// Minimal RIFF/WAVE parser; returns 0 on success.
int tsasr_wav_read(const char* path, float** out, int64_t* out_n,
                   int* out_sr) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  auto fail = [&](int code) { std::fclose(f); return code; };

  char riff[4];
  uint32_t riff_size;
  char wave[4];
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4))
    return fail(2);
  if (std::fread(&riff_size, 4, 1, f) != 1) return fail(2);
  if (std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4))
    return fail(2);

  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  long data_pos = -1;
  uint32_t data_size = 0;

  while (true) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4) break;
    if (std::fread(&size, 4, 1, f) != 1) break;
    if (!std::memcmp(id, "fmt ", 4)) {
      uint16_t block_align;
      uint32_t byte_rate;
      if (std::fread(&audio_format, 2, 1, f) != 1) return fail(3);
      if (std::fread(&channels, 2, 1, f) != 1) return fail(3);
      if (std::fread(&sample_rate, 4, 1, f) != 1) return fail(3);
      if (std::fread(&byte_rate, 4, 1, f) != 1) return fail(3);
      if (std::fread(&block_align, 2, 1, f) != 1) return fail(3);
      if (std::fread(&bits, 2, 1, f) != 1) return fail(3);
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
    } else if (!std::memcmp(id, "data", 4)) {
      data_pos = std::ftell(f);
      data_size = size;
      std::fseek(f, size + (size & 1), SEEK_CUR);
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (data_pos >= 0 && bits) break;
  }
  if (data_pos < 0 || !channels || !bits) return fail(4);

  std::fseek(f, data_pos, SEEK_SET);
  int bytes_per = bits / 8;
  int64_t frames = data_size / (bytes_per * channels);
  std::vector<unsigned char> raw(data_size);
  if (std::fread(raw.data(), 1, data_size, f) != data_size)
    return fail(5);
  std::fclose(f);

  float* buf = (float*)std::malloc(sizeof(float) * frames);
  if (!buf) return 6;
  for (int64_t i = 0; i < frames; i++) {
    const unsigned char* p = raw.data() + (size_t)i * bytes_per * channels;
    double v = 0;
    if (audio_format == 3 && bits == 32) {        // IEEE float
      float fv;
      std::memcpy(&fv, p, 4);
      v = fv;
    } else if (bits == 16) {
      int16_t s;
      std::memcpy(&s, p, 2);
      v = s / 32768.0;
    } else if (bits == 32) {
      int32_t s;
      std::memcpy(&s, p, 4);
      v = s / 2147483648.0;
    } else if (bits == 24) {
      int32_t s = p[0] | (p[1] << 8) | (p[2] << 16);
      if (s & 0x800000) s -= 0x1000000;
      v = s / 8388608.0;
    } else if (bits == 8) {
      v = (p[0] - 128) / 128.0;
    } else {
      std::free(buf);
      return 7;
    }
    buf[i] = (float)v;
  }
  *out = buf;
  *out_n = frames;
  *out_sr = (int)sample_rate;
  return 0;
}

// --------------------------------------------------------------- FLAC
// Full-spec FLAC decoder (mirrors tsasr_tpu/data/flac.py, the reference
// implementation): constant/verbatim/fixed/LPC subframes, Rice + Rice2
// residuals with escape partitions, wasted bits, stereo decorrelation.
// LibriSpeech is 16-bit mono FLAC; this is the data-loader hot path the
// reference delegates to torchaudio's C++ backend.

namespace flac {

struct BitReader {
  const unsigned char* data;
  size_t size;
  size_t pos;  // bits
  bool fail = false;

  uint64_t read(int n) {
    if ((pos + n + 7) / 8 > size) { fail = true; return 0; }
    uint64_t v = 0;
    size_t p = pos;
    pos += n;
    while (n > 0) {
      int bit_off = (int)(p & 7);
      int take = 8 - bit_off;
      if (take > n) take = n;
      unsigned byte = data[p >> 3];
      unsigned chunk = (byte >> (8 - bit_off - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      p += take;
      n -= take;
    }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v >> (n - 1))) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  int64_t read_unary() {
    int64_t count = 0;
    while (true) {
      size_t byte_idx = pos >> 3;
      if (byte_idx >= size) { fail = true; return 0; }
      int bit_off = (int)(pos & 7);
      unsigned byte = data[byte_idx] & (0xFFu >> bit_off);
      if (byte) {
        int bit_length = 32 - __builtin_clz(byte);
        int lead = 8 - bit_length;  // index of the top set bit (MSB-first)
        count += lead - bit_off;
        pos = (byte_idx << 3) + lead + 1;
        return count;
      }
      count += 8 - bit_off;
      pos = (byte_idx + 1) << 3;
    }
  }

  void align() { pos = (pos + 7) & ~(size_t)7; }
  bool at_end() const { return pos >= size * 8; }

  uint64_t read_utf8() {
    uint64_t first = read(8);
    if (first < 0x80) return first;
    int n_extra = 0;
    unsigned mask = 0x40;
    while (first & mask) { n_extra++; mask >>= 1; }
    uint64_t value = first & (mask - 1);
    for (int i = 0; i < n_extra; i++) {
      value = (value << 6) | (read(8) & 0x3F);
    }
    return value;
  }
};

static const int kBlockSizeTable[16] = {0, 192, 576, 1152, 2304, 4608, -1,
                                        -2, 256, 512, 1024, 2048, 4096,
                                        8192, 16384, 32768};
static const int kSampleSizeTable[8] = {0, 8, 12, 0, 16, 20, 24, 32};

static bool read_residual(BitReader& br, int block_size, int order,
                          std::vector<int64_t>& out) {
  int method = (int)br.read(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  int escape = method == 0 ? 15 : 31;
  int part_order = (int)br.read(4);
  int n_parts = 1 << part_order;
  out.resize((size_t)(block_size - order));
  size_t filled = 0;
  for (int p = 0; p < n_parts; p++) {
    int n = (block_size >> part_order) - (p == 0 ? order : 0);
    if (n < 0 || filled + n > out.size()) return false;
    int param = (int)br.read(param_bits);
    if (param == escape) {
      int raw_bits = (int)br.read(5);
      for (int i = 0; i < n; i++)
        out[filled + i] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      for (int i = 0; i < n; i++) {
        int64_t q = br.read_unary();
        uint64_t v = ((uint64_t)q << param) | (param ? br.read(param) : 0);
        out[filled + i] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
      }
    }
    filled += n;
    if (br.fail) return false;
  }
  return true;
}

static bool read_subframe(BitReader& br, int block_size, int bps,
                          std::vector<int64_t>& out) {
  if (br.read(1)) return false;  // padding bit must be 0
  int stype = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = (int)br.read_unary() + 1;
  bps -= wasted;
  out.resize((size_t)block_size);
  if (stype == 0) {  // constant
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) out[(size_t)i] = v;
  } else if (stype == 1) {  // verbatim
    for (int i = 0; i < block_size; i++)
      out[(size_t)i] = br.read_signed(bps);
  } else if (stype >= 8 && stype <= 12) {  // fixed
    int order = stype - 8;
    static const int kFixed[5][4] = {{0}, {1}, {2, -1}, {3, -3, 1},
                                     {4, -6, 4, -1}};
    for (int i = 0; i < order; i++) out[(size_t)i] = br.read_signed(bps);
    std::vector<int64_t> resid;
    if (!read_residual(br, block_size, order, resid)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = resid[(size_t)(i - order)];
      for (int j = 0; j < order; j++)
        acc += (int64_t)kFixed[order][j] * out[(size_t)(i - 1 - j)];
      out[(size_t)i] = acc;
    }
  } else if (stype >= 32) {  // LPC
    int order = stype - 31;
    for (int i = 0; i < order; i++) out[(size_t)i] = br.read_signed(bps);
    int precision = (int)br.read(4) + 1;
    int shift = (int)br.read_signed(5);
    std::vector<int64_t> coefs((size_t)order);
    for (int i = 0; i < order; i++) coefs[(size_t)i] = br.read_signed(precision);
    std::vector<int64_t> resid;
    if (!read_residual(br, block_size, order, resid)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++)
        acc += coefs[(size_t)j] * out[(size_t)(i - 1 - j)];
      out[(size_t)i] = resid[(size_t)(i - order)] + (acc >> shift);
    }
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (int i = 0; i < block_size; i++) out[(size_t)i] <<= wasted;
  return !br.fail;
}

}  // namespace flac

// Decode a FLAC file; channel 0 only (mono-ized like the recipe).
// Returns 0 on success; *out is a malloc'd float buffer scaled to [-1,1).
int tsasr_flac_read(const char* path, float** out, int64_t* out_n,
                    int* out_sr) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> data((size_t)fsize);
  if (std::fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);
  if (fsize < 8 || std::memcmp(data.data(), "fLaC", 4)) return 2;

  size_t pos = 4;
  int sample_rate = 0, channels = 0, bps = 0;
  int64_t total = 0;
  bool have_streaminfo = false;
  while (pos + 4 <= (size_t)fsize) {
    int last = data[pos] >> 7;
    int btype = data[pos] & 0x7F;
    uint32_t size = ((uint32_t)data[pos + 1] << 16)
        | ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    if (btype == 0 && size >= 18) {
      flac::BitReader br{data.data() + pos + 4, size, 0};
      br.read(16); br.read(16); br.read(24); br.read(24);
      sample_rate = (int)br.read(20);
      channels = (int)br.read(3) + 1;
      bps = (int)br.read(5) + 1;
      total = (int64_t)br.read(36);
      have_streaminfo = true;
    }
    pos += 4 + size;
    if (last) break;
  }
  if (!have_streaminfo || channels <= 0 || bps <= 0) return 3;

  flac::BitReader br{data.data(), (size_t)fsize, pos * 8};
  std::vector<int64_t> ch0;
  if (total > 0) ch0.reserve((size_t)total);
  std::vector<std::vector<int64_t>> subframes((size_t)channels);
  while (!br.at_end() && (total == 0 || (int64_t)ch0.size() < total)) {
    uint64_t sync = br.read(14);
    if (br.fail) break;
    if (sync != 0x3FFE) return 4;
    br.read(1); br.read(1);
    int bs_code = (int)br.read(4);
    int sr_code = (int)br.read(4);
    int ch_assign = (int)br.read(4);
    int ss_code = (int)br.read(3);
    br.read(1);
    br.read_utf8();
    int block_size;
    if (bs_code == 6) block_size = (int)br.read(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read(16) + 1;
    else if (bs_code == 0) return 4;
    else block_size = flac::kBlockSizeTable[bs_code];
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    int frame_bps = ss_code == 0 ? bps : flac::kSampleSizeTable[ss_code];
    br.read(8);  // crc8

    int n_ch = ch_assign < 8 ? ch_assign + 1 : 2;
    if (n_ch > channels) return 4;
    for (int c = 0; c < n_ch; c++) {
      int extra = 0;
      if (ch_assign == 8 && c == 1) extra = 1;       // left/side
      else if (ch_assign == 9 && c == 0) extra = 1;  // right/side
      else if (ch_assign == 10 && c == 1) extra = 1; // mid/side
      if (!flac::read_subframe(br, block_size, frame_bps + extra,
                               subframes[(size_t)c]))
        return 5;
    }
    br.align();
    br.read(16);  // crc16
    if (br.fail) return 5;

    // channel 0 after decorrelation
    if (ch_assign < 8 || ch_assign == 8) {
      // independent, or left/side (channel 0 = left already)
      for (int i = 0; i < block_size; i++)
        ch0.push_back(subframes[0][(size_t)i]);
    } else if (ch_assign == 9) {  // right/side: left = right + side
      for (int i = 0; i < block_size; i++)
        ch0.push_back(subframes[1][(size_t)i] + subframes[0][(size_t)i]);
    } else {  // mid/side
      for (int i = 0; i < block_size; i++) {
        int64_t mid = subframes[0][(size_t)i];
        int64_t side = subframes[1][(size_t)i];
        mid = (mid << 1) | (side & 1);
        ch0.push_back((mid + side) >> 1);
      }
    }
  }
  int64_t n = total > 0 && (int64_t)ch0.size() > total
      ? total : (int64_t)ch0.size();
  float* buf = (float*)std::malloc(sizeof(float) * (size_t)(n > 0 ? n : 1));
  if (!buf) return 6;
  double scale = 1.0 / (double)((int64_t)1 << (bps - 1));
  for (int64_t i = 0; i < n; i++) buf[i] = (float)(ch0[(size_t)i] * scale);
  *out = buf;
  *out_n = n;
  *out_sr = sample_rate;
  return 0;
}

// ----------------------------------------------------------- resampling
static double bessel_i0(double x) {
  // power series; converges fast for the beta range used
  double sum = 1.0, term = 1.0;
  double half_x = x / 2.0;
  for (int k = 1; k < 64; k++) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) { int64_t t = a % b; a = b; b = t; }
  return a;
}

// Windowed-sinc polyphase resampler; mirrors data/audio.py `resample`.
int tsasr_resample(const float* in, int64_t n, int orig_freq,
                   int new_freq, float** out, int64_t* out_n) {
  if (orig_freq == new_freq) {
    float* buf = (float*)std::malloc(sizeof(float) * n);
    if (!buf) return 1;
    std::memcpy(buf, in, sizeof(float) * n);
    *out = buf;
    *out_n = n;
    return 0;
  }
  const int lowpass_width = 6;
  const double rolloff = 0.99;
  const double beta = 14.769656459379492;

  int64_t g = gcd64(orig_freq, new_freq);
  int64_t of = orig_freq / g, nf = new_freq / g;
  double base_freq = (double)std::min(of, nf) * rolloff;
  int64_t width = (int64_t)std::ceil((double)lowpass_width * of / base_freq);
  int64_t kw = 2 * width + of;

  // kernels[i][j], i in [0, nf)
  std::vector<double> kernels((size_t)(nf * kw));
  double i0b = bessel_i0(beta);
  for (int64_t i = 0; i < nf; i++) {
    for (int64_t j = 0; j < kw; j++) {
      double idx = (double)(j - width);
      double t = (-(double)i / nf + idx / of) * base_freq;
      if (t > lowpass_width) t = lowpass_width;
      if (t < -lowpass_width) t = -lowpass_width;
      double w = bessel_i0(
          beta * std::sqrt(1.0 - (t / lowpass_width) * (t / lowpass_width)))
          / i0b;
      double tp = t * M_PI;
      double sinc = tp == 0.0 ? 1.0 : std::sin(tp) / tp;
      kernels[(size_t)(i * kw + j)] = sinc * w * base_freq / of;
    }
  }

  int64_t target_len = (int64_t)std::ceil((double)nf * n / of);
  int64_t pad_lo = width, pad_hi = width + of;
  int64_t padded_n = n + pad_lo + pad_hi;
  std::vector<double> padded((size_t)padded_n, 0.0);
  for (int64_t i = 0; i < n; i++) padded[(size_t)(i + pad_lo)] = in[i];

  int64_t n_frames = (padded_n - kw) / of + 1;
  float* buf = (float*)std::calloc((size_t)target_len, sizeof(float));
  if (!buf) return 2;
  for (int64_t fr = 0; fr < n_frames; fr++) {
    const double* seg = padded.data() + (size_t)(fr * of);
    for (int64_t ph = 0; ph < nf; ph++) {
      int64_t out_idx = fr * nf + ph;
      if (out_idx >= target_len) break;
      const double* k = kernels.data() + (size_t)(ph * kw);
      double acc = 0.0;
      for (int64_t j = 0; j < kw; j++) acc += seg[j] * k[j];
      buf[out_idx] = (float)acc;
    }
  }
  *out = buf;
  *out_n = target_len;
  return 0;
}

// ------------------------------------------------------------- mixing
// Mix pre-loaded source signals (already at the target rate):
// per-interferer power gain, delay left-pad, sum, crop [start, start+dur).
int tsasr_mix(const float** sigs, const int64_t* lens, int n_sigs,
              const double* delays, int target_idx, double gain_nontarget_db,
              int sample_rate, double start, double duration,
              float** out, int64_t* out_n) {
  if (n_sigs <= 0 || target_idx < 0 || target_idx >= n_sigs) return 1;
  double target_power = 0.0;
  for (int64_t i = 0; i < lens[target_idx]; i++)
    target_power += (double)sigs[target_idx][i] * sigs[target_idx][i];
  target_power /= std::max<int64_t>(lens[target_idx], 1);

  std::vector<int64_t> pads(n_sigs);
  int64_t max_len = 0;
  for (int s = 0; s < n_sigs; s++) {
    pads[s] = (int64_t)std::ceil(delays[s] * sample_rate);
    max_len = std::max(max_len, pads[s] + lens[s]);
  }
  std::vector<double> mixed((size_t)max_len, 0.0);
  for (int s = 0; s < n_sigs; s++) {
    double gain = 1.0;
    if (s != target_idx && gain_nontarget_db != 0.0) {
      double power = 0.0;
      for (int64_t i = 0; i < lens[s]; i++)
        power += (double)sigs[s][i] * sigs[s][i];
      power /= std::max<int64_t>(lens[s], 1);
      if (power > 0) {
        double ratio = std::pow(10.0, gain_nontarget_db / 10.0);
        gain = std::sqrt(ratio * target_power / power);
      }
    }
    for (int64_t i = 0; i < lens[s]; i++)
      mixed[(size_t)(pads[s] + i)] += gain * sigs[s][i];
  }
  int64_t frame_start = (int64_t)std::ceil(start * sample_rate);
  int64_t frame_dur = duration >= 0
      ? (int64_t)std::ceil(duration * sample_rate)
      : max_len - frame_start;
  int64_t lo = std::min(frame_start, max_len);
  int64_t hi = std::min(frame_start + frame_dur, max_len);
  int64_t m = std::max<int64_t>(hi - lo, 0);
  float* buf = (float*)std::malloc(sizeof(float) * std::max<int64_t>(m, 1));
  if (!buf) return 2;
  for (int64_t i = 0; i < m; i++) buf[i] = (float)mixed[(size_t)(lo + i)];
  *out = buf;
  *out_n = m;
  return 0;
}

// --------------------------------------------------------- edit distance
// Levenshtein with backtrace. ops_out (optional, len >= n+m) receives
// op codes 0 '=', 1 'S', 2 'I', 3 'D' in order; counts[4] = {eq,S,I,D}.
void tsasr_edit_ops(const int32_t* ref, int32_t n, const int32_t* hyp,
                    int32_t m, int32_t* counts, int8_t* ops_out,
                    int32_t* ops_len) {
  std::vector<int32_t> cost((size_t)(n + 1) * (m + 1));
  std::vector<int8_t> back((size_t)(n + 1) * (m + 1));
  auto C = [&](int i, int j) -> int32_t& {
    return cost[(size_t)i * (m + 1) + j];
  };
  auto Bk = [&](int i, int j) -> int8_t& {
    return back[(size_t)i * (m + 1) + j];
  };
  for (int i = 1; i <= n; i++) { C(i, 0) = i; Bk(i, 0) = 3; }
  for (int j = 1; j <= m; j++) { C(0, j) = j; Bk(0, j) = 2; }
  for (int i = 1; i <= n; i++) {
    for (int j = 1; j <= m; j++) {
      if (ref[i - 1] == hyp[j - 1]) {
        C(i, j) = C(i - 1, j - 1);
        Bk(i, j) = 0;
      } else {
        int32_t sub = C(i - 1, j - 1), del = C(i - 1, j),
                ins = C(i, j - 1);
        int32_t best = std::min(sub, std::min(del, ins));
        C(i, j) = best + 1;
        Bk(i, j) = best == sub ? 1 : (best == del ? 3 : 2);
      }
    }
  }
  counts[0] = counts[1] = counts[2] = counts[3] = 0;
  std::vector<int8_t> rev;
  rev.reserve((size_t)n + m);
  int i = n, j = m;
  while (i > 0 || j > 0) {
    int8_t op = Bk(i, j);
    rev.push_back(op);
    switch (op) {
      case 0: counts[0]++; i--; j--; break;
      case 1: counts[1]++; i--; j--; break;
      case 2: counts[2]++; j--; break;
      default: counts[3]++; i--; break;
    }
  }
  int32_t L = (int32_t)rev.size();
  if (ops_out) {
    for (int32_t k = 0; k < L; k++) ops_out[k] = rev[(size_t)(L - 1 - k)];
  }
  if (ops_len) *ops_len = L;
}

}  // extern "C"
