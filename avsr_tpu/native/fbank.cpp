// Native log mel-filterbank featurizer (python_speech_features semantics).
//
// Host-side feature extraction sits on the data-plane critical path when
// feeding TPUs (the reference runs 10 Python dataloader workers computing
// logfbank per sample); this C++ implementation of the same math —
// pre-emphasis 0.97, 25 ms rectangular window / 10 ms hop, 512-pt FFT,
// 26 integer-bin mel filters, log, 4-frame stacking, per-frame layer norm —
// is loaded via ctypes (see avsr_tpu/ops/fbank.py) and used when built.
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

// mel filterbank (kNfilt x kNumBins), built once
const std::vector<double>& filterbank() {
  static std::vector<double> fb = [] {
    std::vector<double> fb(kNfilt * kNumBins, 0.0);
    const double lowmel = hz2mel(0.0);
    const double highmel = hz2mel(kSampleRate / 2.0);
    double bins[kNfilt + 2];
    for (int i = 0; i < kNfilt + 2; ++i) {
      double mel = lowmel + (highmel - lowmel) * i / (kNfilt + 1);
      bins[i] = std::floor((kNfft + 1) * mel2hz(mel) / kSampleRate);
    }
    for (int j = 0; j < kNfilt; ++j) {
      for (int i = (int)bins[j]; i < (int)bins[j + 1]; ++i)
        fb[j * kNumBins + i] = (i - bins[j]) / (bins[j + 1] - bins[j]);
      for (int i = (int)bins[j + 1]; i < (int)bins[j + 2]; ++i)
        fb[j * kNumBins + i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1]);
    }
    return fb;
  }();
  return fb;
}

// iterative radix-2 complex FFT, n = 512
void fft512(double* re, double* im) {
  constexpr int n = kNfft;
  // bit reversal
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
    const double ang = -2.0 * M_PI / len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        const int a = i + k, b = i + k + len / 2;
        const double tr = re[b] * cr - im[b] * ci;
        const double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
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

  const std::vector<double>& fb = filterbank();
  const int rows = (frames + kStack - 1) / kStack;
  std::vector<double> feats(frames * kNfilt);

  double re[kNfft], im[kNfft];
  for (int f = 0; f < frames; ++f) {
    std::memset(im, 0, sizeof(im));
    const double* src = sig.data() + f * kWinStep;
    for (int i = 0; i < kWinLen; ++i) re[i] = src[i];
    std::memset(re + kWinLen, 0, (kNfft - kWinLen) * sizeof(double));
    fft512(re, im);
    double pspec[kNumBins];
    for (int i = 0; i < kNumBins; ++i)
      pspec[i] = (re[i] * re[i] + im[i] * im[i]) / kNfft;
    for (int j = 0; j < kNfilt; ++j) {
      double acc = 0.0;
      const double* w = fb.data() + j * kNumBins;
      for (int i = 0; i < kNumBins; ++i) acc += pspec[i] * w[i];
      feats[f * kNfilt + j] = std::log(acc > 0.0 ? acc : 2.220446049250313e-16);
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
