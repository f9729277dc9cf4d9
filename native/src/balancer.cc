// Native balancer core: adaptive / aimd / fixed rate-control algorithms.
//
// C++ implementation of the rate-control contract cloned from the
// reference's pure-C core (reference: src/core/bitrate_control.c:81-222,
// src/core/balancer_aimd.c:103-163, src/core/balancer_fixed.c:61,
// registry src/core/balancer_registry.c). Semantics are kept identical
// to ceracoder_tpu/control/*.py — the Python classes are the executable
// spec, and tests/test_native.py drives both with the same traces and
// requires exact agreement (doubles are IEEE-754 in both, so EMA state
// matches bit for bit).
//
// Exposed as a C ABI for ctypes (ceracoder_tpu/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>

extern "C" {

struct CcBalancerConfig {
  int64_t min_bitrate;
  int64_t max_bitrate;
  int32_t srt_latency;
  int32_t srt_pkt_size;
  int64_t adaptive_incr_step;
  int64_t adaptive_decr_step;
  int32_t adaptive_incr_interval;
  int32_t adaptive_decr_interval;
  int64_t aimd_incr_step;
  double aimd_decr_mult;
  int32_t aimd_incr_interval;
  int32_t aimd_decr_interval;
};

struct CcBalancerInput {
  int32_t buffer_size;
  double rtt;
  double send_rate_mbps;
  int64_t timestamp;
  int64_t pkt_loss_total;
  int64_t pkt_retrans_total;
};

struct CcBalancerOutput {
  int64_t new_bitrate;
  double throughput;
  int32_t rtt;
  int32_t rtt_th_min;
  int32_t rtt_th_max;
  int32_t bs;
  int32_t bs_th1;
  int32_t bs_th2;
  int32_t bs_th3;
};

}  // extern "C"

namespace {

// ---- constants (reference: src/core/bitrate_control.h:29-68) ----
constexpr int64_t kIncrMin = 30 * 1000;
constexpr int64_t kIncrScale = 30;
constexpr int64_t kDecrMin = 100 * 1000;
constexpr int64_t kDecrScale = 10;
constexpr int32_t kIncrInt = 500;
constexpr int32_t kDecrInt = 200;
constexpr int32_t kDecrFastInt = 250;

constexpr double kEmaSlow = 0.99;
constexpr double kEmaFast = 0.01;
constexpr double kEmaRttDelta = 0.8;
constexpr double kEmaRttDeltaNew = 0.2;
constexpr double kEmaThroughput = 0.97;
constexpr double kEmaThroughputNew = 0.03;

constexpr double kRttMinDrift = 1.001;
constexpr int32_t kRttIgnoreValue = 100;
constexpr int32_t kRttInitial = 300;
constexpr double kRttMinInitial = 200.0;

constexpr int32_t kBsTh3Mult = 4;
constexpr double kBsTh2JitterMult = 3.0;
constexpr double kBsTh1JitterMult = 2.5;
constexpr int32_t kBsThMin = 50;
constexpr int32_t kRttJitterMult = 4;
constexpr int32_t kRttAvgPercent = 15;
constexpr double kRttStableDelta = 0.01;
constexpr int32_t kRttMinJitter = 1;

constexpr double kLossRateThreshold = 0.5;
constexpr double kEmaLoss = 0.9;
constexpr double kEmaLossNew = 0.1;

int64_t round_100k(int64_t bps) {
  // round down to 100 Kbps (reference: bitrate_control.c:206)
  return bps / (100 * 1000) * (100 * 1000);
}

class Balancer {
 public:
  virtual ~Balancer() = default;
  virtual void step(const CcBalancerInput& in, CcBalancerOutput* out) = 0;
  virtual void update_bounds(int64_t min_b, int64_t max_b) = 0;
};

// ---- adaptive (reference: bitrate_update, bitrate_control.c:81-222) ----
class Adaptive : public Balancer {
 public:
  explicit Adaptive(const CcBalancerConfig& c) : cfg_(c) { init(); }

  void init() {
    const CcBalancerConfig& c = cfg_;
    incr_step_ = c.adaptive_incr_step > 0 ? c.adaptive_incr_step : kIncrMin;
    decr_step_ = c.adaptive_decr_step > 0 ? c.adaptive_decr_step : kDecrMin;
    incr_interval_ =
        c.adaptive_incr_interval > 0 ? c.adaptive_incr_interval : kIncrInt;
    decr_interval_ =
        c.adaptive_decr_interval > 0 ? c.adaptive_decr_interval : kDecrInt;
    cur_bitrate_ = c.max_bitrate;
    bs_avg_ = 0.0;
    bs_jitter_ = 0.0;
    prev_bs_ = 0;
    rtt_avg_ = 0.0;
    rtt_min_ = kRttMinInitial;
    rtt_jitter_ = 0.0;
    rtt_avg_delta_ = 0.0;
    prev_rtt_ = kRttInitial;
    throughput_ = 0.0;
    prev_pkt_loss_ = 0;
    prev_pkt_retrans_ = 0;
    loss_rate_ = 0.0;
    next_incr_ = 0;
    next_decr_ = 0;
  }

  void update_bounds(int64_t min_b, int64_t max_b) override {
    // SIGHUP bounds update re-inits the algorithm, losing EMA state
    // (reference: balancer_runner.c:80-89)
    cfg_.min_bitrate = min_b;
    cfg_.max_bitrate = max_b;
    init();
  }

  double rtt_to_bs(int32_t rtt_ms) const {
    // (reference: bitrate_control.c:29)
    return (throughput_ / 8) * rtt_ms / cfg_.srt_pkt_size;
  }

  void step(const CcBalancerInput& in, CcBalancerOutput* out) override {
    const int32_t bs = in.buffer_size;
    const double rtt = in.rtt;
    const int32_t rtt_int = static_cast<int32_t>(rtt);
    const int64_t ts = in.timestamp;

    // packet loss tracking (:91-105)
    const int64_t loss_delta = in.pkt_loss_total - prev_pkt_loss_;
    const int64_t retrans_delta = in.pkt_retrans_total - prev_pkt_retrans_;
    prev_pkt_loss_ = in.pkt_loss_total;
    prev_pkt_retrans_ = in.pkt_retrans_total;
    if (loss_delta > 0 || retrans_delta > 0) {
      loss_rate_ = loss_rate_ * kEmaLoss +
                   static_cast<double>(loss_delta + retrans_delta) * kEmaLossNew;
    } else {
      loss_rate_ *= kEmaLoss;
    }
    const bool pkt_loss_congestion = loss_rate_ > kLossRateThreshold;

    // send-buffer stats (:111-119)
    bs_avg_ = bs_avg_ * kEmaSlow + static_cast<double>(bs) * kEmaFast;
    bs_jitter_ = kEmaSlow * bs_jitter_;
    const int32_t delta_bs = bs - prev_bs_;
    if (static_cast<double>(delta_bs) > bs_jitter_)
      bs_jitter_ = static_cast<double>(delta_bs);
    prev_bs_ = bs;

    // RTT stats (:125-146)
    if (rtt_avg_ == 0.0) {
      rtt_avg_ = rtt;
    } else {
      rtt_avg_ = rtt_avg_ * kEmaSlow + kEmaFast * rtt;
    }
    const double delta_rtt = rtt - static_cast<double>(prev_rtt_);
    rtt_avg_delta_ = rtt_avg_delta_ * kEmaRttDelta + delta_rtt * kEmaRttDeltaNew;
    prev_rtt_ = rtt_int;
    rtt_min_ *= kRttMinDrift;
    if (rtt_int != kRttIgnoreValue && rtt < rtt_min_ && rtt_avg_delta_ < 1.0)
      rtt_min_ = rtt;
    rtt_jitter_ *= kEmaSlow;
    if (delta_rtt > rtt_jitter_) rtt_jitter_ = delta_rtt;

    // throughput EMA (:151-152)
    throughput_ *= kEmaThroughput;
    throughput_ += (in.send_rate_mbps * 1000.0 * 1000.0 / 1024.0) *
                   kEmaThroughputNew;

    // thresholds (:157-162)
    const int32_t bs_th3 =
        static_cast<int32_t>((bs_avg_ + bs_jitter_) * kBsTh3Mult);
    int32_t bs_th2 = static_cast<int32_t>(
        std::max(static_cast<double>(kBsThMin),
                 bs_avg_ + std::max(bs_jitter_ * kBsTh2JitterMult, bs_avg_)));
    bs_th2 = std::min(bs_th2,
                      static_cast<int32_t>(rtt_to_bs(cfg_.srt_latency / 2)));
    const int32_t bs_th1 = static_cast<int32_t>(
        std::max(static_cast<double>(kBsThMin),
                 bs_avg_ + bs_jitter_ * kBsTh1JitterMult));
    const int32_t rtt_th_max = static_cast<int32_t>(
        rtt_avg_ + std::max(rtt_jitter_ * kRttJitterMult,
                            rtt_avg_ * kRttAvgPercent / 100));
    const int32_t rtt_th_min = static_cast<int32_t>(
        rtt_min_ + std::max(static_cast<double>(kRttMinJitter),
                            rtt_jitter_ * 2));

    // decision ladder (:174-199)
    int64_t bitrate = cur_bitrate_;
    if (bitrate > cfg_.min_bitrate &&
        (rtt_int >= cfg_.srt_latency / 3 || bs > bs_th3)) {
      bitrate = cfg_.min_bitrate;
      next_decr_ = ts + decr_interval_;
    } else if (ts > next_decr_ &&
               (rtt_int > cfg_.srt_latency / 5 || bs > bs_th2 ||
                pkt_loss_congestion)) {
      bitrate -= decr_step_ + bitrate / kDecrScale;
      next_decr_ = ts + kDecrFastInt;
    } else if (ts > next_decr_ && (rtt_int > rtt_th_max || bs > bs_th1)) {
      bitrate -= decr_step_;
      next_decr_ = ts + decr_interval_;
    } else if (ts > next_incr_ && rtt_int < rtt_th_min &&
               rtt_avg_delta_ < kRttStableDelta && !pkt_loss_congestion) {
      bitrate += incr_step_ + bitrate / kIncrScale;
      next_incr_ = ts + incr_interval_;
    }

    bitrate = std::max(std::min(bitrate, cfg_.max_bitrate), cfg_.min_bitrate);
    cur_bitrate_ = bitrate;

    out->new_bitrate = round_100k(bitrate);
    out->throughput = throughput_;
    out->rtt = rtt_int;
    out->rtt_th_min = rtt_th_min;
    out->rtt_th_max = rtt_th_max;
    out->bs = bs;
    out->bs_th1 = bs_th1;
    out->bs_th2 = bs_th2;
    out->bs_th3 = bs_th3;
  }

 private:
  CcBalancerConfig cfg_;
  int64_t incr_step_ = 0, decr_step_ = 0;
  int32_t incr_interval_ = 0, decr_interval_ = 0;
  int64_t cur_bitrate_ = 0;
  double bs_avg_ = 0, bs_jitter_ = 0;
  int32_t prev_bs_ = 0;
  double rtt_avg_ = 0, rtt_min_ = 0, rtt_jitter_ = 0, rtt_avg_delta_ = 0;
  int32_t prev_rtt_ = 0;
  double throughput_ = 0;
  int64_t prev_pkt_loss_ = 0, prev_pkt_retrans_ = 0;
  double loss_rate_ = 0;
  int64_t next_incr_ = 0, next_decr_ = 0;
};

// ---- aimd (reference: src/core/balancer_aimd.c) ----
class Aimd : public Balancer {
 public:
  explicit Aimd(const CcBalancerConfig& c) : cfg_(c) { init(); }

  void init() {
    const CcBalancerConfig& c = cfg_;
    incr_step_ = c.aimd_incr_step > 0 ? c.aimd_incr_step : 50 * 1000;
    decr_mult_ = c.aimd_decr_mult > 0.0 ? c.aimd_decr_mult : 0.75;
    incr_interval_ = c.aimd_incr_interval > 0 ? c.aimd_incr_interval : 500;
    decr_interval_ = c.aimd_decr_interval > 0 ? c.aimd_decr_interval : 200;
    cur_bitrate_ = c.max_bitrate;
    rtt_baseline_ = 0.0;
    next_incr_ = 0;
    next_decr_ = 0;
  }

  void update_bounds(int64_t min_b, int64_t max_b) override {
    cfg_.min_bitrate = min_b;
    cfg_.max_bitrate = max_b;
    init();
  }

  void step(const CcBalancerInput& in, CcBalancerOutput* out) override {
    const double rtt = in.rtt;
    const int64_t ts = in.timestamp;

    // RTT baseline: fast down, slow EMA drift up (:107-116)
    if (rtt_baseline_ == 0.0) {
      rtt_baseline_ = rtt;
    } else if (rtt < rtt_baseline_) {
      rtt_baseline_ = rtt;
    } else {
      rtt_baseline_ = rtt_baseline_ * 0.95 + rtt * (1.0 - 0.95);
    }

    bool congested = false;
    const int32_t rtt_threshold = static_cast<int32_t>(rtt_baseline_ * 1.5);

    if (rtt >= cfg_.srt_latency / 3) {
      // emergency (:123-127)
      cur_bitrate_ = cfg_.min_bitrate;
      next_decr_ = ts + decr_interval_;
      congested = true;
    } else if (rtt > rtt_threshold || in.buffer_size > 100) {
      congested = true;
    }

    if (congested && ts > next_decr_) {
      cur_bitrate_ = static_cast<int64_t>(
          static_cast<double>(cur_bitrate_) * decr_mult_);
      next_decr_ = ts + decr_interval_;
    } else if (!congested && ts > next_incr_) {
      cur_bitrate_ += incr_step_;
      next_incr_ = ts + incr_interval_;
    }

    cur_bitrate_ =
        std::max(cfg_.min_bitrate, std::min(cfg_.max_bitrate, cur_bitrate_));

    out->new_bitrate = round_100k(cur_bitrate_);
    out->throughput = 0.0;
    out->rtt = static_cast<int32_t>(rtt);
    out->rtt_th_min = static_cast<int32_t>(rtt_baseline_);
    out->rtt_th_max = rtt_threshold;
    out->bs = in.buffer_size;
    out->bs_th1 = 100;
    out->bs_th2 = 100;
    out->bs_th3 = 100;
  }

 private:
  CcBalancerConfig cfg_;
  int64_t incr_step_ = 0;
  double decr_mult_ = 0;
  int32_t incr_interval_ = 0, decr_interval_ = 0;
  int64_t cur_bitrate_ = 0;
  double rtt_baseline_ = 0;
  int64_t next_incr_ = 0, next_decr_ = 0;
};

// ---- fixed (reference: src/core/balancer_fixed.c:44-61) ----
class Fixed : public Balancer {
 public:
  explicit Fixed(const CcBalancerConfig& c)
      : fixed_bitrate_(round_100k(c.max_bitrate)) {}

  void update_bounds(int64_t, int64_t max_b) override {
    fixed_bitrate_ = round_100k(max_b);
  }

  void step(const CcBalancerInput& in, CcBalancerOutput* out) override {
    out->new_bitrate = fixed_bitrate_;
    out->throughput = 0.0;
    out->rtt = static_cast<int32_t>(in.rtt);
    out->rtt_th_min = 0;
    out->rtt_th_max = 0;
    out->bs = in.buffer_size;
    out->bs_th1 = 0;
    out->bs_th2 = 0;
    out->bs_th3 = 0;
  }

 private:
  int64_t fixed_bitrate_;
};

}  // namespace

// ---- C ABI (registry shape: reference src/core/balancer_registry.c) ----
extern "C" {

void* cc_balancer_create(const char* name, const CcBalancerConfig* cfg) {
  std::string n = name ? name : "";
  if (n.empty() || n == "adaptive") return new Adaptive(*cfg);
  if (n == "aimd") return new Aimd(*cfg);
  if (n == "fixed") return new Fixed(*cfg);
  return nullptr;
}

int cc_balancer_step(void* handle, const CcBalancerInput* in,
                     CcBalancerOutput* out) {
  if (!handle) return -1;
  static_cast<Balancer*>(handle)->step(*in, out);
  return 0;
}

void cc_balancer_update_bounds(void* handle, int64_t min_b, int64_t max_b) {
  if (handle) static_cast<Balancer*>(handle)->update_bounds(min_b, max_b);
}

void cc_balancer_destroy(void* handle) {
  delete static_cast<Balancer*>(handle);
}

const char* cc_balancer_list() { return "adaptive,aimd,fixed"; }

}  // extern "C"
