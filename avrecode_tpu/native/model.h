// Adaptive prior model for the recoded stream — the compression win.
//
// Reference parity (SURVEY.md §2.5, reference recode.cpp:615-1059): per-context
// pos/neg estimators with windowed halving; significance-map bins keyed on the
// block's *total* nonzero count (serialized before the map via queueing,
// reference recode.cpp:844-930) plus position class; EOB bins cost zero bits
// (deterministic from nnz_total == observed, reference recode.cpp:802-809,
// 1437-1438); nonzero counts coded bit-by-bit with spatial (left/above) and
// temporal (previous picture) priors (reference recode.cpp:884).
//
// Differences (deliberate, documented):
//  - Context identity is a stable spec ctxIdx (dense tables -> TPU-friendly),
//    not an ffmpeg state pointer (reference recode.cpp:318 uses pointer keys
//    in a std::map — a red-black-tree lookup per bin).
//  - nnz is serialized as (nnz-1) in ceil(log2(maxCoeff)) bits: same widths as
//    the reference's 6/4/2 (reference recode.cpp:858) but cannot overflow at
//    nnz=64 (the reference drops bit 6 for a full 8x8 block).
//  - Probabilities are 15-bit quantized for the rANS lanes (reference uses a
//    64-bit range coder; measured cost of quantization is <0.1%).
#pragma once

#include <cassert>
#include <cstdint>
#include <cstring>
#include <vector>

#include "h264_slice.h"
#include "h264_tables.h"
#include "rans.h"
#include "gen/cabac_tables.h"

namespace artc {

struct Estimator {
  uint16_t pos = 1, neg = 1;
};

// Per-coding-class bit accounting (the reference's "Avrecode Bill",
// recode.cpp:635-655) — information content in millibits.
struct Billing {
  uint64_t mbits[kNumBinKlasses] = {0};
  uint64_t count[kNumBinKlasses] = {0};
  uint64_t nz_mbits = 0, nz_count = 0, eob_count = 0;
};

class PriorModel {
 public:
  static constexpr int kSigPosClasses = 16;
  static constexpr int kSigThird = 2 * kSigPosClasses * 6;  // is_dc + 2*pos_class + 32*cat

  PriorModel() {
    ctx_est_.assign(kNumModelContexts, Estimator());
    sig_est_.assign(size_t(65) * 64 * kSigThird, Estimator());
    nz_est_.assign(size_t(7) * 128 * 2 * 2 * 2 * 6, Estimator());
  }

  // ---- picture / mb / block state ----------------------------------------
  void begin_slice(bool new_picture, int mb_width, int mb_height) {
    if (new_picture || frames_[cur_].w != mb_width || frames_[cur_].h != mb_height) {
      cur_ ^= 1;
      frames_[cur_].reset(mb_width, mb_height);
      if (frames_[cur_ ^ 1].w != mb_width || frames_[cur_ ^ 1].h != mb_height)
        frames_[cur_ ^ 1].reset(mb_width, mb_height);
    }
  }
  void begin_mb(int x, int y) {
    mb_x_ = x;
    mb_y_ = y;
  }
  void begin_block(int slot, int cat, int max_coeff) {
    slot_ = slot;
    cat_ = cat;
    max_coeff_ = max_coeff;
    nnz_total_ = -1;  // unknown until NZ bits are coded/decoded
    observed_ = 0;
    in_sig_ = false;
  }
  void end_block() {
    if (in_sig_) frames_[cur_].set(mb_x_, mb_y_, slot_, uint8_t(observed_));
    in_sig_ = false;
  }
  void note_implicit_last() { ++observed_; }

  // ---- estimator machinery ------------------------------------------------
  static uint32_t prob15(const Estimator& e) {
    uint32_t p = (uint32_t(e.pos) << kProbBits) / (e.pos + e.neg);
    if (p < 1) p = 1;
    if (p > kProbScale - 1) p = kProbScale - 1;
    return p;
  }
  static void update(Estimator& e, int bit, int window) {
    if (bit) ++e.pos; else ++e.neg;
    if (e.pos + e.neg > window) {
      e.pos = (e.pos + 1) >> 1;
      e.neg = (e.neg + 1) >> 1;
    }
  }

  Estimator& ctx_estimator(int ctx) { return ctx_est_[ctx]; }

  Estimator& sig_estimator(int pos) {
    assert(nnz_total_ >= 1);
    int pos_class = (cat_ == kCatLuma8x8) ? kSigCoeffFlagOffset8x8[0][pos]
                                          : (pos < kSigPosClasses ? pos : kSigPosClasses - 1);
    int is_dc = (cat_ == kCatLumaDC || cat_ == kCatChromaDC) ? 1 : 0;
    size_t key = (size_t(nnz_total_) * 64 + observed_) * kSigThird +
                 (is_dc + 2 * pos_class + 2 * kSigPosClasses * cat_);
    return sig_est_[key];
  }

  Estimator& nz_estimator(int bit_i, int bits_so_far) {
    int prev_bit = (frames_[cur_ ^ 1].get(mb_x_, mb_y_, slot_) >> bit_i) & 1;
    int left_bit = (neighbor_count(-1, 0) >> bit_i) & 1;
    int above_bit = (neighbor_count(0, -1) >> bit_i) & 1;
    size_t key = ((((size_t(bit_i) * 128 + bits_so_far) * 2 + prev_bit) * 2 + left_bit) * 2 +
                  above_bit) * 6 + cat_;
    return nz_est_[key];
  }

  // Number of bits used to serialize (nnz-1) for the current block.
  int nz_bits() const {
    if (max_coeff_ > 16) return 6;   // 8x8: nnz-1 in 0..63
    if (max_coeff_ > 4) return 4;    // 16/15-coeff: nnz-1 in 0..15
    return 2;                        // chroma DC 4:2:0: nnz-1 in 0..3
  }

  // Shared NZ-count serialization (reference finished_queueing,
  // recode.cpp:844-930). BitIO: int operator()(Estimator&, int bit_for_put).
  template <class BitIO>
  int code_nz(BitIO&& io, int put_value /*-1 when decoding*/) {
    int bits = nz_bits();
    int val = 0;
    int enc = put_value >= 0 ? put_value - 1 : 0;
    for (int i = 0; i < bits; ++i) {
      Estimator& e = nz_estimator(i, val);
      int b = io(e, put_value >= 0 ? ((enc >> i) & 1) : -1);
      update(e, b, 0x60);
      val |= b << i;
    }
    return val + 1;
  }

  // Deterministic EOB answer (zero bits).
  int eob_answer() const {
    assert(nnz_total_ >= 1);
    return observed_ == nnz_total_ ? 1 : 0;
  }

  // State transitions shared by encode/decode.
  void on_sig_bin(int bit) {
    if (bit) ++observed_;
  }
  void set_nnz_total(int n) {
    nnz_total_ = n;
    in_sig_ = true;
  }
  bool needs_nnz() const { return in_sig_ == false; }
  int nnz_total() const { return nnz_total_; }

  // Estimator windows: sig-map uses 0x50, everything else 0x60 (reference
  // recode.cpp:1041-1042).
  static constexpr int kWindowSig = 0x50;
  static constexpr int kWindowOther = 0x60;

  Billing bill;

 private:
  struct NZFrame {
    int w = 0, h = 0;
    std::vector<uint8_t> cnt;
    void reset(int w_, int h_) {
      w = w_;
      h = h_;
      cnt.assign(size_t(w) * h * kNumBlockSlots, 0);
    }
    uint8_t get(int x, int y, int slot) const {
      if (x < 0 || y < 0 || x >= w || y >= h) return 0;
      return cnt[(size_t(y) * w + x) * kNumBlockSlots + slot];
    }
    void set(int x, int y, int slot, uint8_t v) {
      cnt[(size_t(y) * w + x) * kNumBlockSlots + slot] = v;
      // Cross-replicate so 4x4 and 8x8 slot lookups both work at transform
      // boundaries (our design; any deterministic rule is format-valid).
      if (slot >= kSlotLuma8x8 && slot < kSlotChromaDC) {
        int b8 = slot - kSlotLuma8x8;
        uint8_t q = uint8_t((v + 3) >> 2);
        for (int k = 0; k < 4; ++k) {
          int blk = 4 * b8 + k;
          cnt[(size_t(y) * w + x) * kNumBlockSlots + kSlotLuma4x4 + blk] = q;
        }
      } else if (slot >= kSlotLuma4x4 && slot < kSlotLuma8x8) {
        int blk = slot - kSlotLuma4x4;
        int b8 = blk >> 2;
        size_t base = (size_t(y) * w + x) * kNumBlockSlots;
        int sum = 0;
        for (int k = 0; k < 4; ++k) sum += cnt[base + kSlotLuma4x4 + 4 * b8 + k];
        cnt[base + kSlotLuma8x8 + b8] = uint8_t(sum > 63 ? 63 : sum);
      }
    }
  };

  // Left/above neighbor nonzero-count for the current block's slot (spatial
  // prior; reference recode.cpp:865-872 uses the scan8 grid equivalently).
  uint8_t neighbor_count(int dx, int dy) const {
    const NZFrame& f = frames_[cur_];
    if (slot_ >= kSlotLuma4x4 && slot_ < kSlotLuma8x8) {
      int blk = slot_ - kSlotLuma4x4;
      int gx = kBlk4x4X[blk] + dx, gy = kBlk4x4Y[blk] + dy;
      int mx = mb_x_, my = mb_y_;
      if (gx < 0) { gx = 3; --mx; }
      if (gy < 0) { gy = 3; --my; }
      return f.get(mx, my, kSlotLuma4x4 + kBlk4x4Idx[gx + 4 * gy]);
    }
    if (slot_ >= kSlotLuma8x8 && slot_ < kSlotChromaDC) {
      int b8 = slot_ - kSlotLuma8x8;
      int gx = kBlk8x8X[b8] + dx, gy = kBlk8x8Y[b8] + dy;
      int mx = mb_x_, my = mb_y_;
      if (gx < 0) { gx = 1; --mx; }
      if (gy < 0) { gy = 1; --my; }
      return f.get(mx, my, kSlotLuma8x8 + gx + 2 * gy);
    }
    if (slot_ >= kSlotChromaAC) {
      int idx = slot_ - kSlotChromaAC;
      int c = idx >> 2, blk = idx & 3;
      int gx = (blk & 1) + dx, gy = (blk >> 1) + dy;
      int mx = mb_x_, my = mb_y_;
      if (gx < 0) { gx = 1; --mx; }
      if (gy < 0) { gy = 1; --my; }
      return f.get(mx, my, kSlotChromaAC + 4 * c + gx + 2 * gy);
    }
    // DC slots: same slot of the adjacent MB.
    return f.get(mb_x_ + dx, mb_y_ + dy, slot_);
  }

  std::vector<Estimator> ctx_est_;
  std::vector<Estimator> sig_est_;
  std::vector<Estimator> nz_est_;
  NZFrame frames_[2];
  int cur_ = 0;
  int mb_x_ = 0, mb_y_ = 0;
  int slot_ = 0, cat_ = 0, max_coeff_ = 0;
  int nnz_total_ = -1, observed_ = 0;
  bool in_sig_ = false;
};

}  // namespace artc
