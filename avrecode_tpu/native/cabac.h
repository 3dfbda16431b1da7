// Spec-exact H.264 CABAC arithmetic decoding + encoding engines
// (ITU-T Rec. H.264 clauses 9.3.3.2 decode, 9.3.4 encode, 9.3.1 init).
//
// Reference parity: the reference *decodes* original CABAC via ffmpeg's hooked
// ff_get_cabac (reference recode.cpp:1176) and *re-encodes* via its own
// cabac::encoder built on a generic range coder (reference cabac_code.h:16-86).
// Here both directions are first-class spec implementations, so the framework
// needs no ffmpeg fork: the decoder drives our own syntax engine and the
// encoder regenerates original slice bytes bit-exactly on decompression.
#pragma once

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <vector>

#include "gen/cabac_tables.h"

namespace artc {

constexpr int kNumCabacContexts = 1024;

// Per-slice adaptive context states: 6-bit probability state + MPS bit.
struct CabacContexts {
  uint8_t p_state[kNumCabacContexts];
  uint8_t val_mps[kNumCabacContexts];

  static int clip3(int lo, int hi, int v) { return v < lo ? lo : (v > hi ? hi : v); }

  // Clause 9.3.1.1. slice_type semantics: I/SI -> init table I; P/SP/B -> PB
  // table selected by cabac_init_idc.
  void init(bool intra_slice, int cabac_init_idc, int slice_qp_y) {
    for (int i = 0; i < kNumCabacContexts; ++i) {
      int m = intra_slice ? kCtxInitI[i][0] : kCtxInitPB[cabac_init_idc][i][0];
      int n = intra_slice ? kCtxInitI[i][1] : kCtxInitPB[cabac_init_idc][i][1];
      int pre = clip3(1, 126, ((m * clip3(0, 51, slice_qp_y)) >> 4) + n);
      if (pre <= 63) {
        p_state[i] = uint8_t(63 - pre);
        val_mps[i] = 0;
      } else {
        p_state[i] = uint8_t(pre - 64);
        val_mps[i] = 1;
      }
    }
  }
};

// Arithmetic *decoding* engine (clause 9.3.3.2). Reads bits MSB-first from an
// RBSP buffer starting at a given bit offset. Reads past the buffer end yield
// zero bits (tracked in overread_bits_ for diagnostics) — the final renorms of
// a conformant stream may touch alignment bits only.
class CabacDecoder {
 public:
  CabacDecoder(const uint8_t* rbsp, size_t size_bytes, size_t start_bit)
      : data_(rbsp), size_bits_(size_bytes * 8), pos_(start_bit) {
    cod_i_range_ = 510;
    cod_i_offset_ = read_bits(9);
  }

  // DecodeDecision (9.3.3.2.1) against context state ctx.
  int decode_decision(CabacContexts& c, int ctx_idx) {
    uint32_t q = (cod_i_range_ >> 6) & 3;
    uint32_t lps = kRangeTabLPS[c.p_state[ctx_idx]][q];
    cod_i_range_ -= lps;
    int bin;
    if (cod_i_offset_ >= cod_i_range_) {
      bin = 1 - c.val_mps[ctx_idx];
      cod_i_offset_ -= cod_i_range_;
      cod_i_range_ = lps;
      if (c.p_state[ctx_idx] == 0) c.val_mps[ctx_idx] ^= 1;
      c.p_state[ctx_idx] = kTransIdxLPS[c.p_state[ctx_idx]];
    } else {
      bin = c.val_mps[ctx_idx];
      c.p_state[ctx_idx] = kTransIdxMPS[c.p_state[ctx_idx]];
    }
    renorm();
    return bin;
  }

  // DecodeBypass (9.3.3.2.3).
  int decode_bypass() {
    cod_i_offset_ = (cod_i_offset_ << 1) | read_bit();
    if (cod_i_offset_ >= cod_i_range_) {
      cod_i_offset_ -= cod_i_range_;
      return 1;
    }
    return 0;
  }

  // DecodeTerminate (9.3.3.2.4). bin==1 => end of slice data.
  int decode_terminate() {
    cod_i_range_ -= 2;
    if (cod_i_offset_ >= cod_i_range_) {
      return 1;
    }
    renorm();
    return 0;
  }

  size_t bit_pos() const { return pos_; }
  size_t overread_bits() const { return overread_bits_; }
  uint32_t range() const { return cod_i_range_; }

 private:
  void renorm() {
    // Equivalent to the spec's doubling loop (9.3.3.2.2): the iteration
    // count is 9 - bit_width(range) (range in [2, 255] here), so shift once
    // and pull all the bits in one read.
    if (cod_i_range_ >= 256) return;
    int shift = 9 - (32 - __builtin_clz(cod_i_range_));
    cod_i_range_ <<= shift;
    cod_i_offset_ = (cod_i_offset_ << shift) | read_bits(shift);
  }

  // n in [1, 9]; MSB-first, identical bit order and overread accounting to n
  // successive read_bit() calls.
  uint32_t read_bits(int n) {
    size_t end = pos_ + size_t(n);
    if (end <= size_bits_) {
      size_t byte = pos_ >> 3;
      int off = int(pos_ & 7);
      uint32_t w = uint32_t(data_[byte]) << 16;
      if (off + n > 8) {
        w |= uint32_t(data_[byte + 1]) << 8;
        if (off + n > 16) w |= data_[byte + 2];
      }
      pos_ = end;
      return (w >> (24 - off - n)) & ((1u << n) - 1);
    }
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  uint32_t read_bit() {
    if (pos_ >= size_bits_) {
      ++pos_;
      ++overread_bits_;
      return 0;
    }
    uint32_t bit = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    ++pos_;
    return bit;
  }

  const uint8_t* data_;
  size_t size_bits_;
  size_t pos_;
  size_t overread_bits_ = 0;
  uint32_t cod_i_range_;
  uint32_t cod_i_offset_;
};

// Arithmetic *encoding* engine (clause 9.3.4). Produces the slice-data bits
// (MSB-first) including the flush of 9.3.4.6; the caller byte-aligns with
// zeros afterwards (rbsp_trailing alignment).
class CabacEncoder {
 public:
  CabacEncoder() { reset(); }

  void reset() {
    low_ = 0;
    range_ = 510;
    first_bit_ = true;
    outstanding_ = 0;
    buf_.clear();
    nbits_ = 0;
    acc_ = 0;
    accn_ = 0;
  }

  void encode_decision(CabacContexts& c, int ctx_idx, int bin) {
    uint32_t q = (range_ >> 6) & 3;
    uint32_t lps = kRangeTabLPS[c.p_state[ctx_idx]][q];
    range_ -= lps;
    if (bin != c.val_mps[ctx_idx]) {
      low_ += range_;
      range_ = lps;
      if (c.p_state[ctx_idx] == 0) c.val_mps[ctx_idx] ^= 1;
      c.p_state[ctx_idx] = kTransIdxLPS[c.p_state[ctx_idx]];
    } else {
      c.p_state[ctx_idx] = kTransIdxMPS[c.p_state[ctx_idx]];
    }
    renorm();
  }

  void encode_bypass(int bin) {
    low_ <<= 1;
    if (bin) low_ += range_;
    if (low_ >= 1024) {
      put_bit(1);
      low_ -= 1024;
    } else if (low_ < 512) {
      put_bit(0);
    } else {
      ++outstanding_;
      low_ -= 512;
    }
  }

  // EncodeTerminate (9.3.4.5) + EncodeFlush (9.3.4.6) when bin==1.
  void encode_terminate(int bin) {
    range_ -= 2;
    if (bin) {
      low_ += range_;
      // flush
      range_ = 2;
      renorm();
      put_bit((low_ >> 9) & 1);
      put_bit((low_ >> 8) & 1);
      put_bit(((low_ >> 7) & 1) | 1);
    } else {
      renorm();
    }
  }

  // I_PCM sample passthrough (clauses 7.3.5, 9.3.1): after the terminate-bin
  // flush, padding bits fill to a byte boundary, the raw sample bytes follow
  // outside the arithmetic coder, and the encoding engine is re-initialized
  // (context states persist). The pad bit *values* are caller-supplied,
  // MSB-first in `pad`: the spec calls for pcm_alignment_zero_bit == 0, but
  // x264 stuffs a per-frame pseudo-random bit there, so byte-exact
  // regeneration must replay the original padding verbatim.
  void pcm_bytes(const uint8_t* p, size_t n, uint32_t pad, int npad) {
    for (int b = npad - 1; b >= 0; --b) raw_bit((pad >> b) & 1);
    if (nbits_ & 7) throw std::runtime_error("pcm pad bits do not align");
    flush_acc();  // byte-aligned: the samples append as whole bytes
    buf_.insert(buf_.end(), p, p + n);
    nbits_ += n * 8;
    low_ = 0;
    range_ = 510;
    first_bit_ = true;
    outstanding_ = 0;
  }

  // Pad bits needed to reach the next byte boundary (I_PCM alignment width).
  int pcm_pad_width() const { return int((8 - (nbits_ & 7)) & 7); }

  // Finished bitstream, byte-aligned with zero bits (alignment belongs to
  // rbsp_trailing; the flush above already emitted the stop-one bit).
  std::vector<uint8_t> take_bytes() {
    int pad = int((8 - (accn_ & 7)) & 7);  // zero-pad the partial tail byte
    acc_ <<= pad;
    accn_ += pad;
    flush_acc();
    return std::move(buf_);
  }

  size_t bit_count() const { return nbits_; }

 private:
  void renorm() {
    while (range_ < 256) {
      if (low_ >= 512) {
        put_bit(1);
        low_ -= 512;
      } else if (low_ < 256) {
        put_bit(0);
      } else {
        ++outstanding_;
        low_ -= 256;
      }
      range_ <<= 1;
      low_ <<= 1;
    }
  }

  void put_bit(uint32_t b) {
    if (first_bit_) {
      first_bit_ = false;  // leading bit is discarded (9.3.4.3 firstBitFlag)
    } else {
      raw_bit(b);
    }
    if (outstanding_) put_run(1 - b, outstanding_), outstanding_ = 0;
  }

  // `count` copies of bit b, in accumulator-sized gulps.
  void put_run(uint32_t b, uint64_t count) {
    nbits_ += count;
    while (count > 0) {
      int k = int(count < uint64_t(64 - accn_) ? count : uint64_t(64 - accn_));
      uint64_t mask = b ? (k == 64 ? ~uint64_t(0) : ((uint64_t(1) << k) - 1)) : 0;
      acc_ = (k == 64) ? mask : ((acc_ << k) | mask);
      accn_ += k;
      if (accn_ == 64) flush_acc();
      count -= uint64_t(k);
    }
  }

  void raw_bit(uint32_t b) {
    acc_ = (acc_ << 1) | b;
    ++nbits_;
    if (++accn_ == 64) flush_acc();
  }

  // Emit the accumulator's whole bytes (accn_ must be a multiple of 8).
  void flush_acc() {
    for (int s = accn_ - 8; s >= 0; s -= 8) buf_.push_back(uint8_t(acc_ >> s));
    acc_ = 0;
    accn_ = 0;
  }

  uint32_t low_;
  uint32_t range_;
  bool first_bit_;
  uint64_t outstanding_;
  std::vector<uint8_t> buf_;  // packed whole bytes
  uint64_t acc_ = 0;          // pending bits, MSB-first in the low accn_ bits
  int accn_ = 0;
  size_t nbits_ = 0;
};

}  // namespace artc
