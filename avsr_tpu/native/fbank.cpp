// Native log mel-filterbank featurizer (python_speech_features semantics).
//
// Host-side feature extraction sits on the data-plane critical path when
// feeding TPUs (the reference runs 10 Python dataloader workers computing
// logfbank per sample); this C++ implementation of the same math —
// pre-emphasis 0.97, 25 ms rectangular window / 10 ms hop, 512-pt FFT,
// 26 integer-bin mel filters, log, 4-frame stacking, per-frame layer norm —
// is loaded via ctypes (see avsr_tpu/ops/fbank.py) and used when built.
//
// Perf notes: the FFT uses a precomputed twiddle table and processes two
// real frames per complex transform (pack frame pairs as re+i*im, unpack
// via conjugate symmetry), and the mel filters are applied sparsely over
// their support only — together ~4x faster than the naive per-frame
// complex FFT with dense 26x257 filter dots.
//
// Build: avsr_tpu/native/build.sh (g++ -O3 -shared).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int kSampleRate = 16000;
constexpr int kWinLen = 400;
constexpr int kWinStep = 160;
constexpr int kNfft = 512;
constexpr int kNumBins = kNfft / 2 + 1;
constexpr int kNfilt = 26;
constexpr int kStack = 4;
constexpr double kPreemph = 0.97;

double hz2mel(double hz) { return 2595.0 * std::log10(1.0 + hz / 700.0); }
double mel2hz(double mel) { return 700.0 * (std::pow(10.0, mel / 2595.0) - 1.0); }

// sparse mel filterbank: per filter, first bin + contiguous weights
struct Filterbank {
  int start[kNfilt];
  int len[kNfilt];
  std::vector<double> weights;  // concatenated per-filter spans
  int offset[kNfilt + 1];
};

const Filterbank& filterbank() {
  static Filterbank fb = [] {
    Filterbank fb{};
    const double lowmel = hz2mel(0.0);
    const double highmel = hz2mel(kSampleRate / 2.0);
    double bins[kNfilt + 2];
    for (int i = 0; i < kNfilt + 2; ++i) {
      double mel = lowmel + (highmel - lowmel) * i / (kNfilt + 1);
      bins[i] = std::floor((kNfft + 1) * mel2hz(mel) / kSampleRate);
    }
    fb.offset[0] = 0;
    for (int j = 0; j < kNfilt; ++j) {
      const int b0 = (int)bins[j], b1 = (int)bins[j + 1], b2 = (int)bins[j + 2];
      fb.start[j] = b0;
      fb.len[j] = b2 - b0;
      for (int i = b0; i < b1; ++i)
        fb.weights.push_back((i - bins[j]) / (bins[j + 1] - bins[j]));
      for (int i = b1; i < b2; ++i)
        fb.weights.push_back((bins[j + 2] - i) / (bins[j + 2] - bins[j + 1]));
      fb.offset[j + 1] = (int)fb.weights.size();
    }
    return fb;
  }();
  return fb;
}

// twiddle table: w[k] = exp(-2*pi*i*k/512), k < 256
struct Twiddles {
  double re[kNfft / 2];
  double im[kNfft / 2];
};

const Twiddles& twiddles() {
  static Twiddles t = [] {
    Twiddles t{};
    for (int k = 0; k < kNfft / 2; ++k) {
      const double ang = -2.0 * M_PI * k / kNfft;
      t.re[k] = std::cos(ang);
      t.im[k] = std::sin(ang);
    }
    return t;
  }();
  return t;
}

// iterative radix-2 complex FFT, n = 512, table twiddles
void fft512(double* re, double* im) {
  constexpr int n = kNfft;
  const Twiddles& tw = twiddles();
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const int step = n / len;
    for (int i = 0; i < n; i += len) {
      int tidx = 0;
      for (int k = 0; k < len / 2; ++k, tidx += step) {
        const int a = i + k, b = i + k + len / 2;
        const double cr = tw.re[tidx], ci = tw.im[tidx];
        const double tr = re[b] * cr - im[b] * ci;
        const double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
      }
    }
  }
}

}  // namespace

extern "C" {

// Number of stacked 104-d feature rows produced for n_samples of audio.
int fbank_stack_rows(int n_samples) {
  int frames = n_samples <= kWinLen
                   ? 1
                   : 1 + (int)std::ceil((double)(n_samples - kWinLen) / kWinStep);
  return (frames + kStack - 1) / kStack;
}

// wave: n_samples float32 -> out: fbank_stack_rows(n) x 104 float32
// (log-fbank, stack-4, per-frame layer norm). Returns rows written.
int fbank_stack(const float* wave, int n_samples, float* out) {
  if (n_samples <= 0) return 0;
  // pre-emphasis
  std::vector<double> sig(n_samples);
  sig[0] = wave[0];
  for (int i = 1; i < n_samples; ++i) sig[i] = wave[i] - kPreemph * wave[i - 1];

  int frames = n_samples <= kWinLen
                   ? 1
                   : 1 + (int)std::ceil((double)(n_samples - kWinLen) / kWinStep);
  const int padlen = (frames - 1) * kWinStep + kWinLen;
  sig.resize(padlen, 0.0);

  const Filterbank& fb = filterbank();
  const int rows = (frames + kStack - 1) / kStack;
  std::vector<double> feats(frames * kNfilt);

  double re[kNfft], im[kNfft];
  double pspec[2][kNumBins];
  // two real frames per complex FFT: z = frame_f + i * frame_{f+1};
  // X1[k] = (Z[k] + conj(Z[n-k]))/2, X2[k] = (Z[k] - conj(Z[n-k]))/(2i)
  for (int f = 0; f < frames; f += 2) {
    const double* s0 = sig.data() + f * kWinStep;
    for (int i = 0; i < kWinLen; ++i) re[i] = s0[i];
    std::memset(re + kWinLen, 0, (kNfft - kWinLen) * sizeof(double));
    if (f + 1 < frames) {
      const double* s1 = sig.data() + (f + 1) * kWinStep;
      for (int i = 0; i < kWinLen; ++i) im[i] = s1[i];
      std::memset(im + kWinLen, 0, (kNfft - kWinLen) * sizeof(double));
    } else {
      std::memset(im, 0, sizeof(im));
    }
    fft512(re, im);
    for (int k = 0; k < kNumBins; ++k) {
      const int nk = (kNfft - k) & (kNfft - 1);
      const double ar = 0.5 * (re[k] + re[nk]);
      const double ai = 0.5 * (im[k] - im[nk]);
      const double br = 0.5 * (im[k] + im[nk]);
      const double bi = 0.5 * (re[nk] - re[k]);
      pspec[0][k] = (ar * ar + ai * ai) / kNfft;
      pspec[1][k] = (br * br + bi * bi) / kNfft;
    }
    const int pair = (f + 1 < frames) ? 2 : 1;
    for (int p = 0; p < pair; ++p) {
      for (int j = 0; j < kNfilt; ++j) {
        double acc = 0.0;
        const double* w = fb.weights.data() + fb.offset[j];
        const double* ps = pspec[p] + fb.start[j];
        const int m = fb.len[j];
        for (int i = 0; i < m; ++i) acc += ps[i] * w[i];
        feats[(f + p) * kNfilt + j] =
            std::log(acc > 0.0 ? acc : 2.220446049250313e-16);
      }
    }
  }

  // stack 4 frames -> 104-d rows (zero-pad the tail), then layer norm per row
  const int dim = kStack * kNfilt;
  for (int r = 0; r < rows; ++r) {
    double row[kStack * kNfilt];
    for (int s = 0; s < kStack; ++s) {
      const int f = r * kStack + s;
      for (int j = 0; j < kNfilt; ++j)
        row[s * kNfilt + j] = f < frames ? feats[f * kNfilt + j] : 0.0;
    }
    double mean = 0.0;
    for (int i = 0; i < dim; ++i) mean += row[i];
    mean /= dim;
    double var = 0.0;
    for (int i = 0; i < dim; ++i) var += (row[i] - mean) * (row[i] - mean);
    var /= dim;
    const double inv = 1.0 / std::sqrt(var + 1e-5);
    float* dst = out + r * dim;
    for (int i = 0; i < dim; ++i) dst[i] = (float)((row[i] - mean) * inv);
  }
  return rows;
}

}  // extern "C"
