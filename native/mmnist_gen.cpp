// Native Moving MNIST video generator (GIL-free, threaded).
//
// The reference generates training videos per item in Python
// (/root/reference/data/mmnist.py:106-255); at TPU batch rates the Python
// loop becomes the input-pipeline bottleneck. This implements the identical
// continuous-time bounce physics in C++ with a numpy-RandomState-compatible
// MT19937 (init_genrand seeding + masked-rejection bounded ints), so for the
// same integer seed the output video is BIT-IDENTICAL to the Python path
// (verified in tests/test_native.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread mmnist_gen.cpp -o _srvp_native.so

#include <cmath>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---- numpy-legacy-compatible MT19937 -------------------------------------
struct MT19937 {
  uint32_t mt[624];
  int idx;

  explicit MT19937(uint32_t seed) {
    mt[0] = seed;
    for (int i = 1; i < 624; ++i) {
      mt[i] = 1812433253u * (mt[i - 1] ^ (mt[i - 1] >> 30)) + (uint32_t)i;
    }
    idx = 624;
  }

  uint32_t gen() {
    if (idx >= 624) {
      for (int i = 0; i < 624; ++i) {
        uint32_t y = (mt[i] & 0x80000000u) | (mt[(i + 1) % 624] & 0x7fffffffu);
        mt[i] = mt[(i + 397) % 624] ^ (y >> 1);
        if (y & 1u) mt[i] ^= 2567483615u;
      }
      idx = 0;
    }
    uint32_t y = mt[idx++];
    y ^= y >> 11;
    y ^= (y << 7) & 2636928640u;
    y ^= (y << 15) & 4022730752u;
    y ^= y >> 18;
    return y;
  }

  // numpy RandomState.randint(lo, hi): uniform over [lo, hi), masked rejection.
  // hi <= lo is a caller bug (numpy raises ValueError); clamping to lo keeps
  // the rejection mask from wrapping to 2^32-1 and emitting unbounded values
  // (the Python wrapper validates dimensions before dispatching here).
  long randint(long lo, long hi) {
    if (hi <= lo + 1) return lo;
    uint32_t rng = (uint32_t)(hi - lo - 1);  // inclusive max
    if (rng == 0) return lo;
    uint32_t mask = rng;
    mask |= mask >> 1; mask |= mask >> 2; mask |= mask >> 4;
    mask |= mask >> 8; mask |= mask >> 16;
    uint32_t v;
    do { v = gen() & mask; } while (v > rng);
    return lo + (long)v;
  }
};

constexpr double kEps = 1e-8;

struct TrajPoint { int sx, sy; };

// numpy-float "round half to even" like Python round()
inline int round_half_even(double v) {
  double r = std::nearbyint(v);  // default FE_TONEAREST = half-to-even
  return (int)r;
}

struct Physics {
  int frame_size, seq_len, max_speed;
  bool deterministic;

  void bounce(MT19937& rng, double& sx, double& sy, long& dx, long& dy,
              double x_max, double y_max) const {
    bool left = sx < -kEps, right = sx > x_max + kEps;
    bool upper = sy < -kEps, bottom = sy > y_max + kEps;
    while (left || right || upper || bottom) {
      double cx = 0, cy = 0;
      if (dx == 0) {
        cx = sx; cy = upper ? 0.0 : y_max;
      } else if (dy == 0) {
        cy = sy; cx = left ? 0.0 : x_max;
      } else {
        double a = (double)dy / (double)dx;
        double b = sy - a * sx;
        if (left) {
          double y_int = b;
          left = (y_int >= -kEps) && (y_int <= y_max + kEps);
          if (left) { cx = 0.0; cy = y_int; }
        }
        if (right) {
          double y_int = a * x_max + b;
          right = (y_int >= -kEps) && (y_int <= y_max + kEps);
          if (right) { cx = x_max; cy = y_int; }
        }
        if (upper) {
          double x_int = (0.0 - b) / a;
          upper = (x_int >= -kEps) && (x_int <= x_max + kEps);
          if (upper) { cx = x_int; cy = 0.0; }
        }
        if (bottom) {
          double x_int = (y_max - b) / a;
          bottom = (x_int >= -kEps) && (x_int <= x_max + kEps);
          if (bottom) { cx = x_int; cy = y_max; }
        }
      }
      double p = (dx != 0) ? (sx - cx) / (double)dx : (sy - cy) / (double)dy;
      if (!deterministic) {
        dx = rng.randint(-max_speed, max_speed + 1);
        dy = rng.randint(-max_speed, max_speed + 1);
      }
      if (left) dx = std::labs(dx);
      if (right) dx = -std::labs(dx);
      if (upper) dy = std::labs(dy);
      if (bottom) dy = -std::labs(dy);
      sx = cx + (double)dx * p;
      sy = cy + (double)dy * p;
      left = sx < -kEps; right = sx > x_max + kEps;
      upper = sy < -kEps; bottom = sy > y_max + kEps;
    }
  }

  void trajectory(MT19937& rng, int nx, int ny, std::vector<TrajPoint>& out) const {
    double x_max = frame_size - nx, y_max = frame_size - ny;
    double sx = (double)rng.randint(0, (long)x_max + 1);
    double sy = (double)rng.randint(0, (long)y_max + 1);
    long dx = rng.randint(-max_speed, max_speed + 1);
    long dy = rng.randint(-max_speed, max_speed + 1);
    out.resize(seq_len);
    for (int t = 0; t < seq_len; ++t) {
      bounce(rng, sx, sy, dx, dy, x_max, y_max);
      out[t] = {round_half_even(sx), round_half_even(sy)};
      sx += (double)dx;
      sy += (double)dy;
    }
  }
};

void generate_one(const uint8_t* digit_data, const int64_t* digit_offsets,
                  const int32_t* digit_hw, int n_avail, const Physics& ph,
                  int num_digits, uint32_t seed, uint8_t* out) {
  MT19937 rng(seed);
  const int fs = ph.frame_size;
  std::vector<uint16_t> acc((size_t)ph.seq_len * fs * fs, 0);
  std::vector<TrajPoint> traj;
  for (int n = 0; n < num_digits; ++n) {
    long di = rng.randint(0, n_avail);
    const uint8_t* img = digit_data + digit_offsets[di];
    int h = digit_hw[2 * di], w = digit_hw[2 * di + 1];
    ph.trajectory(rng, h, w, traj);
    for (int t = 0; t < ph.seq_len; ++t) {
      int sx = traj[t].sx, sy = traj[t].sy;
      uint16_t* frame = acc.data() + (size_t)t * fs * fs;
      for (int i = 0; i < h; ++i) {
        uint16_t* row = frame + (size_t)(sx + i) * fs + sy;
        const uint8_t* irow = img + (size_t)i * w;
        for (int j = 0; j < w; ++j) row[j] += irow[j];
      }
    }
  }
  const size_t total = (size_t)ph.seq_len * fs * fs;
  for (size_t i = 0; i < total; ++i) {
    out[i] = (uint8_t)(acc[i] > 255 ? 255 : acc[i]);
  }
}

}  // namespace

namespace {

void parts_one(const uint8_t* digit_data, const int64_t* digit_offsets,
               const int32_t* digit_hw, int n_avail, const Physics& ph,
               int num_digits, uint32_t seed, int dh, int dw,
               uint8_t* digits_out, int32_t* pos_out) {
  // Same draw order as generate_one, but emits digit images + trajectories
  // for on-device compositing instead of composited frames.
  MT19937 rng(seed);
  std::vector<TrajPoint> traj;
  for (int n = 0; n < num_digits; ++n) {
    long di = rng.randint(0, n_avail);
    const uint8_t* img = digit_data + digit_offsets[di];
    int h = digit_hw[2 * di], w = digit_hw[2 * di + 1];
    ph.trajectory(rng, h, w, traj);
    std::memcpy(digits_out + (size_t)n * dh * dw, img, (size_t)h * w);
    int32_t* p = pos_out + (size_t)n * ph.seq_len * 2;
    for (int t = 0; t < ph.seq_len; ++t) {
      p[2 * t] = traj[t].sx;
      p[2 * t + 1] = traj[t].sy;
    }
  }
}

}  // namespace

extern "C" {

// digits_out: (batch, num_digits, dh, dw) uint8 (uniform digit shape)
// pos_out:    (batch, num_digits, seq_len, 2) int32
void mmnist_parts_batch(const uint8_t* digit_data,
                        const int64_t* digit_offsets,
                        const int32_t* digit_hw, int n_avail,
                        int frame_size, int seq_len, int max_speed,
                        int deterministic, int num_digits,
                        const uint32_t* seeds, int batch,
                        int dh, int dw,
                        uint8_t* digits_out, int32_t* pos_out,
                        int n_threads) {
  Physics ph{frame_size, seq_len, max_speed, deterministic != 0};
  const size_t dsz = (size_t)num_digits * dh * dw;
  const size_t psz = (size_t)num_digits * seq_len * 2;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;
  std::vector<std::thread> threads;
  for (int tid = 0; tid < n_threads; ++tid) {
    threads.emplace_back([=]() {
      for (int b = tid; b < batch; b += n_threads) {
        parts_one(digit_data, digit_offsets, digit_hw, n_avail, ph,
                  num_digits, seeds[b], dh, dw,
                  digits_out + dsz * b, pos_out + psz * b);
      }
    });
  }
  for (auto& t : threads) t.join();
}

// out: (batch, seq_len, frame_size, frame_size) uint8
void mmnist_generate_batch(const uint8_t* digit_data,
                           const int64_t* digit_offsets,
                           const int32_t* digit_hw, int n_avail,
                           int frame_size, int seq_len, int max_speed,
                           int deterministic, int num_digits,
                           const uint32_t* seeds, int batch,
                           uint8_t* out, int n_threads) {
  Physics ph{frame_size, seq_len, max_speed, deterministic != 0};
  const size_t item_size = (size_t)seq_len * frame_size * frame_size;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;
  std::vector<std::thread> threads;
  for (int tid = 0; tid < n_threads; ++tid) {
    threads.emplace_back([=]() {
      for (int b = tid; b < batch; b += n_threads) {
        generate_one(digit_data, digit_offsets, digit_hw, n_avail, ph,
                     num_digits, seeds[b], out + item_size * b);
      }
    });
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
