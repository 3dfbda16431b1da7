// Compress / decompress pipeline implementation + C ABI for the Python layer.
// See recode.h for the architecture notes and reference-parity map.
#include "recode.h"

#include <algorithm>
#include <atomic>
#include <unordered_map>
#include <chrono>
#include <condition_variable>
#include <memory>
#include <mutex>
#include <thread>

#include "bytemodel.h"

namespace artc {
namespace {

struct SliceRecord {
  uint32_t chunk_idx = 0;
  uint8_t coding = 0;  // 0 = CABAC, 1 = CAVLC
  std::vector<uint8_t> header_rbsp;  // [nal header byte] + header RBSP bytes
  uint16_t header_bits = 0;          // header length in bits (CAVLC data may
                                     // start unaligned)
  uint32_t cabac_rbsp_len = 0;       // CABAC: payload RBSP bytes after the
                                     // aligned header; CAVLC: total RBSP bytes
  std::vector<uint8_t> tail_patch;
  uint8_t start_code_len = 0;
  bool intra = false, new_picture = false;
  int cabac_init_idc = 0, slice_qp = 26;
  SymbolStream ss;        // CABAC symbol stream
  CavlcStream cstream;    // CAVLC value stream
};

struct Segment {
  int kind;  // 0 literal, 1 slice
  size_t lit_off = 0, lit_len = 0;
  size_t slice_idx = 0;
};

struct ParamSet {
  uint8_t nal_type;
  std::vector<uint8_t> payload;  // EBSP payload incl. NAL header byte
};

constexpr size_t kMaxTailPatch = 16;

}  // namespace

// Env-gated phase timing (ARTC_TIMING=1): stderr lines, no effect on output.
static bool timing_enabled() {
  static bool on = [] {
    const char* e = getenv("ARTC_TIMING");
    return e && *e && *e != '0';
  }();
  return on;
}
static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

namespace {
// Streaming pass-1 progress: run_pass1 assembles the ordered slice list
// incrementally as the parallel walk's contiguous frontier extends, and
// signals consumers (the nz-mode probe and chunk 0's model pass) so they can
// start while later slices are still walking. `slices` points at the final
// Pass1 vector; it is capacity-reserved up front, so elements [0, n_ready)
// are stable while the tail still grows. Purely a scheduling device: every
// decision (sectioning, probes, modes) sees identical inputs, so the output
// container is byte-identical to the phase-sequential formulation.
struct Pass1Progress {
  std::mutex mu;
  std::condition_variable cv;
  const std::vector<SliceRecord>* slices = nullptr;
  size_t n_ready = 0;        // assembled slice count
  uint64_t bins_ready = 0;   // bins across assembled slices
  bool chunk0_final = false; // chunk 0 extent decided early (mode-0 sectioned)
  size_t chunk0_end = 0;     // slice index one past chunk 0 when chunk0_final
  bool done = false;         // pass1 complete (slices/chunking final)
  int n_chunks = 0;          // valid once done
};

struct Pass1 {
  std::vector<SliceRecord> slices;
  std::vector<Segment> segments;
  std::vector<ParamSet> paramsets;
  // MPEG-TS transport (v17): the pipeline codes the reassembled elementary
  // stream `ts_es` (all segment/literal offsets refer to it); `ts_runs` maps
  // ES bytes back to original file extents; everything else (TS/PES headers,
  // PSI, other PIDs) is the "skeleton", stored through the side-byte coder.
  bool ts = false;
  std::vector<uint8_t> ts_es;
  std::vector<TsReader::Run> ts_runs;
};
}  // namespace

// Pass 1: enumerate NALs, walk every slice through its entropy decoder,
// verify byte-exact re-encoding, and build the file's segment structure.
//
// Structure (the reference does all of this strictly serially inside its
// decode hooks, recode.cpp:1102-1297):
//   phase A (serial, cheap)  - NAL scan, paramset registration, slice header
//                              parses; produces independent slice jobs.
//   phase B (parallel)       - per-slice entropy walk + regenerate + verify.
//                              Slices are independent by spec: CABAC/CAVLC
//                              neighbor availability is same-slice only
//                              (clause 6.4.9; each walker gets a private
//                              PictureState), and every walker re-inits its
//                              coder from the slice header.
//   phase C (serial, cheap)  - ordered segment/chunk assembly; failed jobs
//                              fall back to literal runs.
// Output is byte-identical to the serial formulation.
namespace {
struct SliceJob {
  NalUnit nal;
  std::vector<uint8_t> rbsp;
  SPS sps;
  PPS pps;
  SliceHeader sh;
  int slice_id = 0;
  const uint8_t* nal_ptr = nullptr;
  bool ok = false;
  SliceRecord rec;
};
}  // namespace

static void walk_cavlc_job(SliceJob& j) {
  const auto& rbsp = j.rbsp;
  SliceRecord rec;
  rec.coding = 1;
  rec.cstream.mb_width = j.sps.mb_width();
  rec.cstream.mb_height = j.sh.pic_mb_height(j.sps);
  rec.cstream.slice_class = uint8_t(j.sh.is_intra() ? 0 : (j.sh.is_b() ? 2 : 1));
  rec.cstream.new_picture = j.sh.first_mb_in_slice == 0;
  CavlcPicture cpic;
  cpic.reset(j.sps.mb_width(), j.sh.pic_mb_height(j.sps));
  CavlcRecorder crec(rbsp.data(), rbsp.size(), j.sh.header_end_bit, &rec.cstream);
  CavlcWalker<CavlcRecorder> cw(j.sps, j.pps, j.sh, cpic, j.slice_id, crec);
  cw.run();
  BitWriter bw;
  for (size_t b = 0; b < j.sh.header_end_bit; ++b)
    bw.put_bit((rbsp[b >> 3] >> (7 - (b & 7))) & 1);
  RecordedValues rv(rec.cstream);
  CavlcPicture cpic2;
  cpic2.reset(j.sps.mb_width(), j.sh.pic_mb_height(j.sps));
  CavlcReplayer<RecordedValues> rep(rv, bw);
  CavlcWalker<CavlcReplayer<RecordedValues>> cw2(j.sps, j.pps, j.sh, cpic2, j.slice_id, rep);
  cw2.run();
  bw.put_bit(1);
  while (!bw.byte_aligned()) bw.put_bit(0);
  std::vector<uint8_t> regen = bw.bytes();
  if (regen.size() > rbsp.size()) throw UnsupportedStream("cavlc regen longer");
  regen.resize(rbsp.size(), 0);
  size_t fd = 0;
  while (fd < rbsp.size() && regen[fd] == rbsp[fd]) ++fd;
  if (rbsp.size() - fd > kMaxTailPatch) throw UnsupportedStream("cavlc tail too large");
  rec.tail_patch.assign(rbsp.begin() + fd, rbsp.end());
  std::copy(rec.tail_patch.begin(), rec.tail_patch.end(), regen.end() - rec.tail_patch.size());
  std::vector<uint8_t> ebsp2 = rbsp_to_ebsp(regen.data(), regen.size());
  if (ebsp2.size() + 1 != j.nal.size || memcmp(ebsp2.data(), j.nal_ptr + 1, ebsp2.size()) != 0)
    throw UnsupportedStream("cavlc NAL reconstruction mismatch");
  rec.header_rbsp.push_back(j.nal_ptr[0]);
  size_t hdr_bytes = (j.sh.header_end_bit + 7) / 8;
  rec.header_rbsp.insert(rec.header_rbsp.end(), rbsp.begin(), rbsp.begin() + hdr_bytes);
  rec.header_bits = uint16_t(j.sh.header_end_bit);
  rec.cabac_rbsp_len = uint32_t(rbsp.size());
  rec.start_code_len = uint8_t(j.nal.start_code);
  j.rec = std::move(rec);
  j.ok = true;
}

static void walk_cabac_job(SliceJob& j) {
  const auto& rbsp = j.rbsp;
  const SliceHeader& sh = j.sh;
  bool new_picture = sh.first_mb_in_slice == 0;
  SliceRecord rec;
  rec.ss.bins.reserve((rbsp.size() - sh.data_bit_offset / 8) * 12);
  int slice_class = sh.is_intra() ? 0 : (sh.is_b() ? 2 : 1);
  rec.ss.event(kEvBeginSlice,
               (sh.is_intra() ? 1 : 0) | (new_picture ? 2 : 0) | (slice_class << 2) |
                   (j.sps.chroma_format_idc == 2 ? 16 : 0),
               j.sps.mb_width(), sh.pic_mb_height(j.sps),
               (sh.slice_qp & 0xffff) | (sh.cabac_init_idc << 16));
  PictureState pic;  // private: availability is same-slice only (6.4.9)
  pic.reset(j.sps.mb_width(), sh.pic_mb_height(j.sps));
  RecordingSource src(rbsp.data(), rbsp.size(), sh.data_bit_offset, sh.is_intra(),
                      sh.cabac_init_idc, sh.slice_qp, &rec.ss);
  SliceWalker<RecordingSource> walker(j.sps, j.pps, sh, pic, j.slice_id, src);
  walker.run();

  // Regenerate + tail patch + full-NAL verification.
  size_t hb = sh.data_bit_offset / 8;
  size_t cabac_len = rbsp.size() - hb;
  std::vector<uint8_t> regen =
      reencode_symbol_stream(rec.ss, sh.is_intra(), sh.cabac_init_idc, sh.slice_qp);
  if (regen.size() > cabac_len) throw UnsupportedStream("regenerated longer than source");
  regen.resize(cabac_len, 0);
  size_t first_diff = 0;
  while (first_diff < cabac_len && regen[first_diff] == rbsp[hb + first_diff]) ++first_diff;
  size_t patch_len = cabac_len - first_diff;
  if (patch_len > kMaxTailPatch) throw UnsupportedStream("tail patch too large");
  rec.tail_patch.assign(rbsp.begin() + hb + first_diff, rbsp.end());

  std::vector<uint8_t> full_rbsp;
  full_rbsp.push_back(j.nal_ptr[0]);
  full_rbsp.insert(full_rbsp.end(), rbsp.begin(), rbsp.begin() + hb);
  full_rbsp.insert(full_rbsp.end(), regen.begin(), regen.end());
  std::copy(rec.tail_patch.begin(), rec.tail_patch.end(),
            full_rbsp.end() - rec.tail_patch.size());
  std::vector<uint8_t> ebsp = rbsp_to_ebsp(full_rbsp.data() + 1, full_rbsp.size() - 1);
  if (ebsp.size() + 1 != j.nal.size || full_rbsp[0] != j.nal_ptr[0] ||
      memcmp(ebsp.data(), j.nal_ptr + 1, ebsp.size()) != 0)
    throw UnsupportedStream("NAL reconstruction mismatch");

  rec.header_rbsp.push_back(j.nal_ptr[0]);
  rec.header_rbsp.insert(rec.header_rbsp.end(), rbsp.begin(), rbsp.begin() + hb);
  rec.header_bits = uint16_t(hb * 8);
  rec.cabac_rbsp_len = uint32_t(cabac_len);
  rec.start_code_len = uint8_t(j.nal.start_code);
  rec.intra = sh.is_intra();
  rec.new_picture = new_picture;
  rec.cabac_init_idc = sh.cabac_init_idc;
  rec.slice_qp = sh.slice_qp;
  j.rec = std::move(rec);
  j.ok = true;
}

// Fills *outp in place (callers own the Pass1 so `prog` readers keep a stable
// view of the slices vector across the return — no move of the vector object).
static void run_pass1(const uint8_t* data, size_t size, const Options& opt, Stats& st,
                      Pass1* outp, Pass1Progress* prog = nullptr) {
  st.input_bytes = size;

  // MPEG-TS: reassemble the H.264 elementary stream from the packet payloads
  // and run the whole pipeline on it — every offset below then refers to the
  // ES; pack/decompress weave the skeleton bytes back around it (v17).
  bool is_ts = false;
  std::vector<uint8_t> ts_es;
  std::vector<TsReader::Run> ts_runs;
  if (TsReader::looks_like_ts(data, size) &&
      TsReader::extract(data, size, &ts_es, &ts_runs)) {
    is_ts = true;
    data = ts_es.data();
    size = ts_es.size();
  } else if (PsReader::looks_like_ps(data, size) &&
             PsReader::extract(data, size, &ts_es, &ts_runs)) {
    // MPEG-PS rides the identical run-map transport (the map is
    // packetization-agnostic — see ps.h).
    is_ts = true;
    data = ts_es.data();
    size = ts_es.size();
  }

  // ---- enumerate NAL units (file order) ----------------------------------
  std::vector<NalUnit> nals;
  std::vector<ParamSet> paramsets;
  std::map<int, SPS> sps_map;
  std::map<int, PPS> pps_map;

  bool is_mp4 = Mp4Reader::looks_like_mp4(data, size);
  if (is_mp4) {
    auto tracks = Mp4Reader::read_tracks(data, size);
    for (const auto& t : tracks) {
      if (!t.is_avc) continue;
      for (const auto& s : t.sps) {
        paramsets.push_back({7, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          SPS sps = parse_sps(rbsp.data(), rbsp.size());
          sps_map[sps.sps_id] = sps;
        } catch (...) {}
      }
      for (const auto& s : t.pps) {
        paramsets.push_back({8, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          PPS pps = parse_pps(rbsp.data(), rbsp.size());
          pps_map[pps.pps_id] = pps;
        } catch (...) {}
      }
      for (size_t i = 0; i < t.sample_offsets.size(); ++i) {
        uint64_t off = t.sample_offsets[i];
        uint32_t len = t.sample_sizes[i];
        if (off + len > size) continue;
        auto sn = find_nals_avcc(data + off, len, t.nal_length_size);
        for (auto nu : sn) {
          nu.offset += off;
          nals.push_back(nu);
        }
      }
    }
    std::sort(nals.begin(), nals.end(),
              [](const NalUnit& a, const NalUnit& b) { return a.offset < b.offset; });
  } else if (MkvReader::looks_like_mkv(data, size)) {
    // Matroska: avcC config from TrackEntry CodecPrivate, AVCC samples from
    // (un-laced) block payloads — contiguous in-file, same invariants as mp4.
    std::vector<MkvReader::Track> tracks;
    std::vector<MkvReader::Block> mblocks;
    MkvReader::read(data, size, &tracks, &mblocks);
    for (const auto& t : tracks) {
      for (const auto& s : t.cfg.sps) {
        paramsets.push_back({7, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          SPS sps = parse_sps(rbsp.data(), rbsp.size());
          sps_map[sps.sps_id] = sps;
        } catch (...) {}
      }
      for (const auto& s : t.cfg.pps) {
        paramsets.push_back({8, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          PPS pps = parse_pps(rbsp.data(), rbsp.size());
          pps_map[pps.pps_id] = pps;
        } catch (...) {}
      }
      for (const auto& b : mblocks) {
        if (b.track != t.number || b.offset + b.size > size) continue;
        auto sn = find_nals_avcc(data + b.offset, b.size, t.cfg.nal_length_size);
        for (auto nu : sn) {
          nu.offset += b.offset;
          nals.push_back(nu);
        }
      }
    }
    std::sort(nals.begin(), nals.end(),
              [](const NalUnit& a, const NalUnit& b) { return a.offset < b.offset; });
  } else if (AviReader::looks_like_avi(data, size)) {
    // RIFF/AVI: Annex-B access units inside '##dc' movi chunks. Per-chunk
    // NAL scans keep chunk headers/index data out of NAL extents (a
    // whole-file scan glues trailing RIFF bytes to the last NAL of a frame
    // and the re-encode verify rejects the slice).
    std::vector<std::pair<size_t, size_t>> vchunks;
    AviReader::video_chunks(data, size, &vchunks);
    for (auto [off, len] : vchunks) {
      auto sn = find_nals_annexb(data + off, len);
      for (auto nu : sn) {
        nu.offset += off;
        nals.push_back(nu);
      }
    }
  } else if (FlvReader::looks_like_flv(data, size)) {
    // FLV: avcC record from the AVCPacketType-0 video tag, AVCC-framed
    // samples from the AVCPacketType-1 tag payloads (contiguous in-file,
    // same invariants as mp4/mkv).
    FlvReader::Video v;
    if (FlvReader::read(data, size, &v)) {
      Mp4Track t;
      Mp4Reader::parse_avcc(v.avcc.data(), v.avcc.size(), t);
      for (const auto& s : t.sps) {
        paramsets.push_back({7, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          SPS sps = parse_sps(rbsp.data(), rbsp.size());
          sps_map[sps.sps_id] = sps;
        } catch (...) {}
      }
      for (const auto& s : t.pps) {
        paramsets.push_back({8, s});
        try {
          auto rbsp = ebsp_to_rbsp(s.data() + 1, s.size() - 1);
          PPS pps = parse_pps(rbsp.data(), rbsp.size());
          pps_map[pps.pps_id] = pps;
        } catch (...) {}
      }
      for (auto [off, len] : v.samples) {
        auto sn = find_nals_avcc(data + off, len, t.nal_length_size);
        for (auto nu : sn) {
          nu.offset += off;
          nals.push_back(nu);
        }
      }
    }
  } else {
    nals = find_nals_annexb(data, size);
  }

  // ---- phase A: scan, register paramsets, parse headers into jobs --------
  std::vector<SliceJob> jobs;
  int slice_id = 0;
  for (const auto& nal : nals) {
    const uint8_t* p = data + nal.offset;
    if (nal.type == 7 || nal.type == 8) {
      try {
        std::vector<uint8_t> rbsp = ebsp_to_rbsp(p + 1, nal.size - 1);
        if (nal.type == 7) {
          SPS s = parse_sps(rbsp.data(), rbsp.size());
          sps_map[s.sps_id] = s;
        } else {
          PPS q = parse_pps(rbsp.data(), rbsp.size());
          pps_map[q.pps_id] = q;
        }
        paramsets.push_back({uint8_t(nal.type), std::vector<uint8_t>(p, p + nal.size)});
      } catch (...) {}
      continue;
    }
    if (nal.type != 1 && nal.type != 5) continue;
    try {
      SliceJob j;
      j.rbsp = ebsp_to_rbsp(p + 1, nal.size - 1);
      const SPS* sps;
      const PPS* pps;
      j.sh = parse_slice_header(j.rbsp.data(), j.rbsp.size(), nal.type, nal.ref_idc,
                                sps_map, pps_map, &sps, &pps);
      j.sps = *sps;  // deep copies: a re-sent paramset must not mutate a job
      j.pps = *pps;
      j.nal = nal;
      j.nal_ptr = p;
      j.slice_id = ++slice_id;
      jobs.push_back(std::move(j));
    } catch (const std::exception&) {
      ++st.n_fallback;
    }
  }

  // Sectioning policy knobs, read up front: the incremental assembly's early
  // chunk-0 decision and the final sectioning pass must agree.
  uint64_t sec_bins = opt.section_bins ? opt.section_bins : 8'000'000;
  {
    const char* env = getenv("ARTC_SECTION_BINS");
    if (env && *env) sec_bins = strtoull(env, nullptr, 10);
  }
  uint64_t seed_bins = 4'000'000;
  if (const char* se = getenv("ARTC_SEED_BINS")) seed_bins = strtoull(se, nullptr, 10);

  // ---- phase B+C: walk slices in parallel; assemble the ordered segment /
  // chunk structure incrementally as the walked contiguous prefix extends.
  // Identical decisions and output to the walk-everything-then-assemble
  // formulation (assembly consumes jobs strictly in file order); the
  // incremental form exists so `prog` consumers can overlap with the walk.
  Pass1& out = *outp;
  std::vector<SliceRecord>& slices = out.slices;
  std::vector<Segment>& segments = out.segments;
  slices.reserve(jobs.size());  // keeps [0, n_ready) stable for prog readers
  if (prog) {
    std::lock_guard<std::mutex> lock(prog->mu);
    prog->slices = &slices;
  }

  std::mutex asm_mu;  // guards everything below until the walks join
  std::vector<uint8_t> walked(jobs.size(), 0);
  size_t frontier = 0;   // jobs [0, frontier) walked
  size_t assembled = 0;  // jobs [0, assembled) assembled
  uint32_t chunk_idx = 0;
  bool chunk_started = false;
  size_t lit_start = 0;
  uint64_t bins_acc = 0;          // bins across assembled slices
  bool c0_cand = false;           // early chunk-0 boundary candidate found
  size_t c0_end_cand = 0;

  auto flush_literal = [&](size_t upto) {
    if (upto > lit_start) {
      segments.push_back({0, lit_start, upto - lit_start, 0});
      st.literal_bytes += upto - lit_start;
    }
  };

  auto assemble = [&](SliceJob& j) {
    if (j.nal.offset < lit_start) return;  // overlap guard
    if (!j.ok) {
      ++st.n_fallback;  // stays in the literal run
      return;
    }
    bool idr_picture_start = j.sh.is_idr && j.sh.first_mb_in_slice == 0;
    if (opt.chunk_mode == 1 && idr_picture_start && chunk_started) ++chunk_idx;
    chunk_started = true;
    j.rec.chunk_idx = chunk_idx;
    // Early chunk-0 boundary (mode 0): mirrors the final sectioning pass's
    // greedy rule — the first new-picture slice with >= seed_bins assembled
    // before it starts section 1.
    if (opt.chunk_mode == 0 && !c0_cand && j.rec.new_picture && bins_acc >= seed_bins) {
      c0_cand = true;
      c0_end_cand = slices.size();
    }
    flush_literal(j.nal.offset);
    segments.push_back({1, 0, 0, slices.size()});
    size_t hdr_bytes = j.rec.header_rbsp.size() - 1;
    st.cabac_in_bytes += j.rec.coding == 1 ? j.rbsp.size() - hdr_bytes
                                           : j.rec.cabac_rbsp_len;
    bins_acc += j.rec.coding == 1 ? j.rec.cstream.values.size() : j.rec.ss.bins.size();
    slices.push_back(std::move(j.rec));
    lit_start = j.nal.offset + j.nal.size;
    ++st.n_slices;
  };

  unsigned n_workers = std::max(1u, std::thread::hardware_concurrency());
  if (const char* e = getenv("ARTC_PASS1_THREADS")) n_workers = std::max(1, atoi(e));
  n_workers = std::min<size_t>(n_workers, jobs.size() ? jobs.size() : 1);
  std::atomic<size_t> next{0};
  auto worker = [&] {
    for (size_t i = next.fetch_add(1); i < jobs.size(); i = next.fetch_add(1)) {
      try {
        if (!jobs[i].pps.entropy_coding_mode) walk_cavlc_job(jobs[i]);
        else walk_cabac_job(jobs[i]);
      } catch (const std::exception&) {
        jobs[i].ok = false;
      }
      std::lock_guard<std::mutex> lock(asm_mu);
      walked[i] = 1;
      while (frontier < jobs.size() && walked[frontier]) ++frontier;
      while (assembled < frontier) assemble(jobs[assembled++]);
      if (prog) {
        std::lock_guard<std::mutex> pl(prog->mu);
        prog->n_ready = slices.size();
        prog->bins_ready = bins_acc;
        // Sectioning is confirmed (total > sec_bins) as soon as the
        // assembled prefix alone exceeds it; with a boundary candidate in
        // hand, chunk 0's extent is final mid-walk.
        if (!prog->chunk0_final && opt.chunk_mode == 0 && c0_cand &&
            bins_acc > sec_bins) {
          prog->chunk0_final = true;
          prog->chunk0_end = c0_end_cand;
        }
        prog->cv.notify_all();
      }
    }
  };
  if (n_workers <= 1 || jobs.size() <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (unsigned w = 1; w < n_workers; ++w) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();
  }
  while (assembled < jobs.size()) assemble(jobs[assembled++]);  // jobs.empty() case
  flush_literal(size);
  st.n_chunks = chunk_started ? int(chunk_idx) + 1 : 0;

  // chunk_mode 0: section large files into a few independently-modeled
  // chunks split at picture boundaries (~section_bins bins each, balanced).
  // Machine-independent policy — the same input yields the same container
  // everywhere — that parallelizes the model pass, the rANS encode, the
  // decode, and the device-path walk, at a per-section model cold-start cost
  // measured < 0.05pp. (The reference is strictly serial end-to-end,
  // recode.cpp:122.)
  if (opt.chunk_mode == 0 && !slices.empty()) {
    uint64_t total = bins_acc;
    if (total > sec_bins) {
      // Sectioned file: a short "seed" section 0 (its tables warm-start every
      // later section — see pick_warm_slices / WarmCtx) followed by balanced
      // ~sec_bins sections. The short seed both deepens the warm start and
      // shortens the critical path (later sections wait only on the seed).
      uint64_t n_rest =
          std::min<uint64_t>(std::max<uint64_t>((total - seed_bins) / sec_bins + 1, 1), 63);
      std::vector<uint64_t> tb;  // cumulative-bin targets for section starts
      tb.push_back(seed_bins);
      for (uint64_t i = 1; i < n_rest; ++i)
        tb.push_back(seed_bins + (total - seed_bins) * i / n_rest);
      uint64_t acc = 0, sec = 0;
      for (auto& s : slices) {
        if (s.new_picture && sec < tb.size() && acc >= tb[sec]) ++sec;
        s.chunk_idx = uint32_t(sec);
        acc += s.coding == 1 ? s.cstream.values.size() : s.ss.bins.size();
      }
      st.n_chunks = int(sec) + 1;
    }
  }
  out.paramsets = std::move(paramsets);
  out.ts = is_ts;
  out.ts_es = std::move(ts_es);
  out.ts_runs = std::move(ts_runs);
  if (prog) {
    std::lock_guard<std::mutex> lock(prog->mu);
    prog->n_ready = out.slices.size();
    prog->bins_ready = bins_acc;
    prog->n_chunks = st.n_chunks;
    prog->done = true;
    prog->cv.notify_all();
  }
}

// Warm-start rendezvous (container v16): chunk 0's worker publishes a table
// snapshot after `src_slices` slices; later chunks wait on it before
// starting. Shared between compress, decompress, and the analyze export.
struct WarmCtx {
  int src_slices = 0;  // 0 = warm start disabled
  PriorModel::TableSnapshot snap;
  std::mutex mu;
  std::condition_variable cv;
  bool ready = false;
  bool failed = false;
  void publish(const PriorModel& m) {
    std::lock_guard<std::mutex> lock(mu);
    if (ready && !failed) return;
    // A failed publish (pipe's chunk-0 pre-produce died) is replaceable: the
    // analyze fall-through re-runs chunk 0 and its snapshot must win, or
    // every warm chunk >= 1 would keep erroring after a transient failure.
    m.snapshot_tables(snap);
    failed = false;
    ready = true;
    cv.notify_all();
  }
  // Chunk 0's pass died before publishing: wake waiters into an error
  // instead of letting them hang (pipelined compress error path).
  void fail() {
    std::lock_guard<std::mutex> lock(mu);
    if (ready) return;
    failed = true;
    ready = true;
    cv.notify_all();
  }
  const PriorModel::TableSnapshot& wait() {
    std::unique_lock<std::mutex> lock(mu);
    cv.wait(lock, [&] { return ready; });
    if (failed) throw std::runtime_error("warm snapshot unavailable (chunk 0 failed)");
    return snap;
  }
};

// Warm-slice policy (encoder side; the chosen count travels in the
// container): all of chunk 0 up to ~the seed-section size (with the seeded
// section split, chunk 0 IS the seed, so this is the whole chunk and later
// sections wait only on the short seed). Deterministic from pass-1 data.
static int pick_warm_slices_range(const std::vector<SliceRecord>& slices, size_t b,
                                  size_t e) {
  uint64_t target = 4'500'000;
  if (const char* env = getenv("ARTC_WARM_BINS")) target = strtoull(env, nullptr, 10);
  if (target == 0) return 0;
  uint64_t acc = 0;
  for (size_t si = b; si < e; ++si) {
    acc += slices[si].coding == 1 ? slices[si].cstream.values.size()
                                  : slices[si].ss.bins.size();
    if (acc >= target) return int(si - b) + 1;
  }
  return int(e - b);
}

static int pick_warm_slices(const std::vector<SliceRecord>& slices,
                            const std::vector<std::pair<size_t, size_t>>& ranges) {
  if (ranges.size() < 2) return 0;
  return pick_warm_slices_range(slices, ranges[0].first, ranges[0].second);
}

// Runs the model+entropy pass over one chunk's slices. If trace/probs_out are
// given, records the device-path inputs; always returns the rANS blob.
// warm_make (chunk 0) publishes the table snapshot after src_slices slices;
// warm_use (chunks 1+) blocks until it is published, then starts from it.
static std::vector<uint8_t> run_chunk_model(const std::vector<SliceRecord>& slices, size_t begin,
                                            size_t end, const Options& opt, Stats& st,
                                            std::vector<PriorModel::Coded>* trace,
                                            std::vector<uint16_t>* probs_out,
                                            std::vector<Dual>* dual0, uint64_t nz_modes,
                                            bool encode_blob = true,
                                            WarmCtx* warm_make = nullptr,
                                            WarmCtx* warm_use = nullptr,
                                            std::vector<Estimator>* sig0 = nullptr,
                                            uint32_t alpha_off = 0,
                                            bool trace_only = false) {
  PriorModel model;
  model.set_profile(opt.model_profile);
  model.set_batch_size(opt.batch_size);
  model.set_nz_modes(nz_modes);
  if (alpha_off) model.set_alpha_off(alpha_off);
  if (warm_use) model.restore_tables(warm_use->wait());
  if (dual0) {
    // Snapshot the starting tables (device starting state): the warm
    // snapshot if one applies, the CABAC-init seed otherwise.
    if (!warm_use)
      model.seed_from_cabac(slices[begin].cabac_init_idc, slices[begin].slice_qp);
    *dual0 = model.dual_table();
    if (sig0) *sig0 = model.sig_table();
  }
  std::vector<uint8_t> bits;
  std::vector<uint16_t> probs;
  ModelEncoder enc(model, bits, probs);
  if (trace) {
    enc.set_trace(trace);
    model.set_flush_replay(trace);  // flush replays the trace tail (no pending_ dup)
    enc.set_trace_only(trace_only);  // device path: keys only, no prob math
  }
  // Reference-model head-to-head (refmodel.h): price the same CABAC bins
  // under the reference's model in parallel. Measurement-only — the coded
  // output is untouched; run single-chunk (ARTC_SECTION_BINS high) for the
  // reference's continuous single-pass semantics.
  std::unique_ptr<RefModel> ref;
  {
    static const bool want_ref = [] {
      const char* e = getenv("ARTC_REFMODEL");
      return e && atoi(e);
    }();
    if (want_ref) {
      ref = std::make_unique<RefModel>();
      enc.set_ref_model(ref.get());
    }
  }
  static const bool bill_cavlc = [] {
    const char* e = getenv("ARTC_BILL_CAVLC");
    return e && atoi(e);
  }();
  uint64_t role_mb[32] = {0};
  if (bill_cavlc) enc.set_role_bill(role_mb);
  for (size_t si = begin; si < end; ++si) {
    if (slices[si].coding == 1) {
      enc.process_cavlc(slices[si].cstream);
      st.total_bins += slices[si].cstream.values.size();
    } else {
      enc.process(slices[si].ss);
      st.total_bins += slices[si].ss.bins.size();
    }
    if (warm_make && int(si - begin) + 1 == warm_make->src_slices)
      warm_make->publish(model);
  }
  // Never leave waiters hanging (src_slices beyond the chunk cannot happen
  // with the encoder policy, but a container could claim it).
  if (warm_make && !warm_make->ready) warm_make->publish(model);
  for (int k = 0; k < kNumBinKlasses; ++k) {
    st.bill.mbits[k] += model.bill.mbits[k];
    st.bill.count[k] += model.bill.count[k];
    st.bill.cabac_mbits[k] += model.bill.cabac_mbits[k];
  }
  st.bill.eob_cabac_mbits += model.bill.eob_cabac_mbits;
  st.bill.nz_mbits += model.bill.nz_mbits;
  st.bill.nz_count += model.bill.nz_count;
  st.bill.eob_count += model.bill.eob_count;
  if (ref) st.bill.ref_mbits += ref->mbits();
  if (bill_cavlc) {
    fprintf(stderr, "[artc] cavlc role bill (bytes):\n");
    for (int r = 0; r < 32; ++r)
      if (role_mb[r])
        fprintf(stderr, "  role %2d: %8.1f\n", r, double(role_mb[r]) / 8000.0);
  }
  if (probs_out) *probs_out = probs;
  if (!encode_blob) return {};  // analysis-only callers discard the blob
  double tr = timing_enabled() ? now_s() : 0;
  auto blob = RansInterleaved::encode(bits, probs, opt.lanes);
  if (timing_enabled())
    fprintf(stderr, "[artc]   rans encode %.3fs (%zu bins)\n", now_s() - tr, bits.size());
  return blob;
}

// Empirical per-(slice_class, cat) mode choice: run the model pass once with
// NZ-first everywhere and once with adaptive-EOB everywhere, compare the
// accumulated significance-complex cost per cell, take the cheaper mode.
// (The cells are independent in cost: each mode's estimator tables are
// disjoint per cell.) When alpha_out is given (chunk 0), the off probe also
// prices every kSigAlphaCands value and returns the per-file alpha_off
// choice; later chunks pass the chosen alpha_in so their mode costs are
// priced consistently.
static uint64_t pick_nz_modes(const std::vector<SliceRecord>& slices, size_t begin, size_t end,
                              const Options& opt, uint32_t alpha_in = 0,
                              uint32_t* alpha_out = nullptr);

static void chunk_ranges(const std::vector<SliceRecord>& slices, int n_chunks,
                         std::vector<std::pair<size_t, size_t>>* ranges) {
  size_t si = 0;
  for (int c = 0; c < n_chunks; ++c) {
    size_t b = si;
    while (si < slices.size() && slices[si].chunk_idx == uint32_t(c)) ++si;
    ranges->push_back({b, si});
  }
}

static uint64_t pick_nz_modes(const std::vector<SliceRecord>& slices, size_t begin, size_t end,
                              const Options& opt, uint32_t alpha_in, uint32_t* alpha_out) {
  // Probe on a prefix sample of the chunk (cap ~4M bins): mode choice is a
  // coarse statistic; the sample keeps the two probe passes cheap.
  constexpr uint64_t kProbeBinCap = 3'000'000;
  uint64_t on_cost[3][6], off_cost[3][6];
  uint64_t eob_adapt[3][6], eob_parity[3][6];
  uint64_t sig_alpha[4][3][6];
  uint32_t alpha = alpha_in ? alpha_in : PriorModel::kSigMixAlphaOff;
  auto probe = [&](int mode, uint64_t (*cost)[6], bool grab_eob) {
    PriorModel m;
    m.set_profile(opt.model_profile);
    m.set_batch_size(opt.batch_size);
    m.set_nz_modes(mode ? 0 : PriorModel::kAllNzOn);
    m.set_alpha_off(alpha);
    std::vector<uint8_t> bits;
    std::vector<uint16_t> probs;
    ModelEncoder enc(m, bits, probs);
    enc.set_discard_output(true);  // probes only need the billing counters
    enc.set_sig_only(true);        // bit-identical sig statistics, ~60% less work
    uint64_t seen = 0;
    for (size_t si = begin; si < end && seen < kProbeBinCap; ++si) {
      if (slices[si].coding != 0) continue;
      enc.process(slices[si].ss);
      seen += slices[si].ss.bins.size();
    }
    memcpy(cost, m.sigc_mbits, sizeof(on_cost));
    if (grab_eob) {
      memcpy(eob_adapt, m.eobc_adapt_mbits, sizeof(eob_adapt));
      memcpy(eob_parity, m.eobc_parity_mbits, sizeof(eob_parity));
      memcpy(sig_alpha, m.sigc_alpha_mbits, sizeof(sig_alpha));
    }
  };
  std::thread t_on([&] { probe(0, on_cost, false); });
  probe(1, off_cost, true);  // adaptive pass also prices CABAC-parity EOB
  t_on.join();
  int best_a = 0;
  if (alpha_out) {
    // Empirical per-file alpha_off: the probe ran at kSigAlphaCands[0]; its
    // per-cell alternative pricing tells what each candidate would have
    // cost. Adjust the off-mode cell costs to the chosen candidate so the
    // mode decision below is priced consistently.
    uint64_t tot[4] = {};
    for (int c = 0; c < 4; ++c)
      for (int sc = 0; sc < 3; ++sc)
        for (int cat = 0; cat < 6; ++cat) tot[c] += sig_alpha[c][sc][cat];
    for (int c = 1; c < 4; ++c)
      if (tot[c] < tot[best_a]) best_a = c;
    *alpha_out = PriorModel::kSigAlphaCands[best_a];
    if (best_a != 0)
      for (int sc = 0; sc < 3; ++sc)
        for (int cat = 0; cat < 6; ++cat)
          off_cost[sc][cat] +=
              sig_alpha[best_a][sc][cat] - sig_alpha[0][sc][cat];
  }
  uint64_t modes = 0;
  for (int sc = 0; sc < 3; ++sc)
    for (int cat = 0; cat < 6; ++cat) {
      // Sig cost is shared by both off-modes; only the EOB coding differs.
      uint64_t off_par =
          off_cost[sc][cat] - eob_adapt[sc][cat] + eob_parity[sc][cat];
      uint64_t cell;
      if (on_cost[sc][cat] <= off_cost[sc][cat] && on_cost[sc][cat] <= off_par)
        cell = 1;
      else if (off_par <= off_cost[sc][cat])
        cell = 2;
      else
        cell = 0;
      modes |= cell << (2 * (sc * 6 + cat));
    }
  return modes;
}

static std::vector<uint8_t> pack_container(const uint8_t* data, const Pass1& p1,
                                           const std::vector<std::vector<uint8_t>>& blobs,
                                           const std::vector<uint64_t>& nz_modes,
                                           const Options& opt, Stats& st,
                                           int warm_slices = 0,
                                           uint32_t alpha_off = 0) {
  const auto& slices = p1.slices;
  const auto& segments = p1.segments;
  const auto& paramsets = p1.paramsets;
  // Side-byte stream: every byte the container stores verbatim, in the exact
  // order the decoder consumes them (paramset payloads, then per segment the
  // literal run or slice header + tail patch). Coded with the adaptive
  // order-1 byte model, store fallback when it doesn't pay (v13; the
  // reference stored all of this raw, recode.cpp:1608-1618).
  std::vector<uint8_t> side;
  // TS transport: the skeleton (every original byte that is not ES) leads
  // the side stream; the run map in the header tells the decoder how to
  // weave the regenerated ES back between the skeleton bytes.
  const uint8_t* lit_src = p1.ts ? p1.ts_es.data() : data;
  if (p1.ts) {
    size_t pe = 0;
    for (const auto& r : p1.ts_runs) {
      side.insert(side.end(), data + pe, data + r.off);
      pe = r.off + r.len;
    }
    side.insert(side.end(), data + pe, data + st.input_bytes);
  }
  for (const auto& ps : paramsets)
    side.insert(side.end(), ps.payload.begin(), ps.payload.end());
  for (const auto& seg : segments) {
    if (seg.kind == 0) {
      side.insert(side.end(), lit_src + seg.lit_off, lit_src + seg.lit_off + seg.lit_len);
    } else {
      const SliceRecord& r = slices[seg.slice_idx];
      side.insert(side.end(), r.header_rbsp.begin(), r.header_rbsp.end());
      side.insert(side.end(), r.tail_patch.begin(), r.tail_patch.end());
    }
  }
  std::vector<uint8_t> side_blob = bytemodel_encode(side);

  Writer w;
  w.bytes(reinterpret_cast<const uint8_t*>("ATRC"), 4);
  w.u8(kContainerVersion);
  {  // v26 build provenance (recode.h ARTC_BUILD_ID)
    const char* bid = ARTC_BUILD_ID;
    size_t bl = std::min(strlen(bid), size_t(255));
    w.u8(uint8_t(bl));
    w.bytes(reinterpret_cast<const uint8_t*>(bid), bl);
  }
  w.u16(uint16_t(opt.lanes));
  w.u8(uint8_t(opt.chunk_mode));
  w.u32(opt.batch_size);
  w.u8(uint8_t(opt.model_profile));
  // v17 transport: 0 = direct (segments address the file), 1 = MPEG-TS
  // (segments address the reassembled ES; the header run map + skeleton
  // side bytes reproduce the original packetization).
  w.u8(p1.ts ? 1 : 0);
  if (p1.ts) {
    w.vu(st.input_bytes);
    w.vu(p1.ts_runs.size());
    uint64_t pe = 0;
    for (const auto& r : p1.ts_runs) {
      w.vu(r.off - pe);  // skeleton bytes before this run
      w.vu(r.len);
      pe = r.off + r.len;
    }
  }
  w.u32(crc32_ieee(data, st.input_bytes));  // CRC of the original file
  if (side_blob.size() + 2 < side.size()) {
    w.u8(1);
    w.vu(side.size());
    w.vu(side_blob.size());
    w.bytes(side_blob.data(), side_blob.size());
  } else {
    w.u8(0);
    w.vu(side.size());
    w.bytes(side.data(), side.size());
  }
  w.vu(paramsets.size());
  for (const auto& ps : paramsets) {
    w.u8(ps.nal_type);
    w.vu(ps.payload.size());
  }
  w.vu(uint64_t(st.n_chunks));
  for (int c = 0; c < st.n_chunks; ++c) w.vu(nz_modes[c]);
  // v16: chunks 1+ start from chunk 0's table snapshot after this many of
  // chunk 0's slices (0 = cold starts everywhere).
  w.vu(uint64_t(warm_slices));
  // v18: empirical per-file off-mode sig prior weight (probe-chosen).
  w.vu(alpha_off ? alpha_off : PriorModel::kSigMixAlphaOff);
  w.vu(segments.size());
  for (const auto& seg : segments) {
    if (seg.kind == 0) {
      w.u8(0);
      w.vu(seg.lit_len);
    } else {
      const SliceRecord& r = slices[seg.slice_idx];
      w.u8(1);
      w.vu(r.chunk_idx);
      w.u8(r.coding);
      w.vu(r.header_bits);
      w.vu(r.header_rbsp.size());
      w.vu(r.cabac_rbsp_len);
      w.vu(r.cstream.values.size());
      w.u8(uint8_t(r.tail_patch.size()));
      w.u8(r.start_code_len);
    }
  }
  for (const auto& b : blobs) {
    w.vu(b.size());
    w.bytes(b.data(), b.size());
  }
  st.output_bytes = w.buf.size();
  return std::move(w.buf);
}

// Packs the container and applies the store fallback: if recoding didn't pay
// (tiny files — model cold start + per-slice container overhead), emit a
// pure-literal container instead. Caps expansion at the fixed header size
// (~40 bytes) and still carries the CRC-32 integrity gate. (The reference can
// expand tiny inputs unboundedly per slice; SURVEY.md §2.7.)
static std::vector<uint8_t> finalize_container(const uint8_t* data, size_t size, const Pass1& p1,
                                               const std::vector<std::vector<uint8_t>>& blobs,
                                               const std::vector<uint64_t>& nz_modes,
                                               const Options& opt, Stats& st,
                                               int warm_slices = 0,
                                               uint32_t alpha_off = 0) {
  auto out = pack_container(data, p1, blobs, nz_modes, opt, st, warm_slices, alpha_off);
  if (opt.chunk_mode == 0 && out.size() >= size + std::max<size_t>(40, size / 256)) {
    Pass1 lit;
    lit.segments.push_back({0, 0, size, 0});
    Stats st2;
    st2.input_bytes = size;
    st2.literal_bytes = size;
    st2.n_chunks = 0;
    auto v2 = pack_container(data, lit, {}, {}, opt, st2);
    if (v2.size() < out.size()) {
      // The walker ran (stats/billing stand); the container stores literals.
      st.output_bytes = st2.output_bytes;
      st.literal_bytes = size;
      st.recoded_bytes = 0;
      st.n_chunks = 0;
      return v2;
    }
  }
  return out;
}

std::vector<uint8_t> compress(const uint8_t* data, size_t size, const Options& opt,
                              Stats* stats) {
  if (opt.model_profile != 0 && opt.model_profile != 2)
    throw std::runtime_error("unsupported model profile (0 = immediate, 2 = frozen-batch)");
  Stats st;
  double t0 = timing_enabled() ? now_s() : 0;
  // Pipelined chunk 0: the nz-mode probe and chunk 0's model+encode start as
  // soon as pass1's incremental assembly fixes chunk 0's extent (mid-walk on
  // sectioned files), overlapping the remaining slice walks — and the v16
  // warm snapshot publishes correspondingly earlier for the other chunks.
  // Byte-identical output; only the schedule changes. (The reference's
  // single fused pass has nothing to overlap, recode.cpp:1102-1309.)
  Pass1 p1;
  Pass1Progress prog;
  WarmCtx warm;
  uint32_t alpha_off = PriorModel::kSigMixAlphaOff;
  uint64_t modes0 = 0;
  std::vector<uint8_t> blob0;
  Stats st0;
  std::exception_ptr pipe_err;
  std::mutex pm;
  std::condition_variable pcv;
  bool probe_ready = false;  // alpha_off / modes0 / warm.src_slices valid
  size_t pipe_e0 = SIZE_MAX;  // chunk 0 extent the pipe worked on (audited)
  std::thread pipe([&] {
    try {
      size_t e0 = 0;
      bool multi = false, any = false;
      {
        std::unique_lock<std::mutex> l(prog.mu);
        prog.cv.wait(l, [&] { return prog.done || prog.chunk0_final; });
        if (prog.chunk0_final) {
          e0 = prog.chunk0_end;
          multi = any = true;
        } else if (prog.n_chunks > 0) {
          any = true;
          const auto& sl = *prog.slices;
          while (e0 < sl.size() && sl[e0].chunk_idx == 0) ++e0;
          multi = prog.n_chunks > 1;
        }
      }
      if (any) {
        const auto& sl = *prog.slices;
        double tp = timing_enabled() ? now_s() : 0;
        modes0 = pick_nz_modes(sl, 0, e0, opt, 0, &alpha_off);
        if (timing_enabled())
          fprintf(stderr, "[artc]   nz-mode probe %.3fs (chunk 0, alpha_off %u)\n",
                  now_s() - tp, alpha_off);
        warm.src_slices = multi ? pick_warm_slices_range(sl, 0, e0) : 0;
        {
          std::lock_guard<std::mutex> l(pm);
          pipe_e0 = e0;
          probe_ready = true;
          pcv.notify_all();
        }
        blob0 = run_chunk_model(sl, 0, e0, opt, st0, nullptr, nullptr, nullptr,
                                modes0, true, warm.src_slices ? &warm : nullptr,
                                nullptr, nullptr, alpha_off);
      } else {
        std::lock_guard<std::mutex> l(pm);
        probe_ready = true;
        pcv.notify_all();
      }
    } catch (...) {
      // pipe_err is read by the main thread both right after the probe_ready
      // wait and after pipe.join(); publish it under pm so the early read is
      // synchronized (join() covers the late one).
      {
        std::lock_guard<std::mutex> l(pm);
        pipe_err = std::current_exception();
      }
      warm.fail();
      std::lock_guard<std::mutex> l(pm);
      probe_ready = true;
      pcv.notify_all();
    }
  });
  try {
    run_pass1(data, size, opt, st, &p1, &prog);
  } catch (...) {
    // Unblock and reap the pipe thread before propagating.
    {
      std::lock_guard<std::mutex> lock(prog.mu);
      prog.done = true;
      prog.cv.notify_all();
    }
    pipe.join();
    throw;
  }
  if (timing_enabled())
    fprintf(stderr, "[artc] pass1 %.3fs (%zu slices)\n", now_s() - t0, p1.slices.size());
  double t1 = timing_enabled() ? now_s() : 0;
  std::vector<std::pair<size_t, size_t>> ranges;
  chunk_ranges(p1.slices, st.n_chunks, &ranges);
  std::vector<std::vector<uint8_t>> blobs(ranges.size());
  std::vector<uint64_t> nz_modes(ranges.size());
  // chunk_mode 0 sections are statistically homogeneous (balanced splits of
  // one stream): one probe on the first section serves all of them. GOP
  // chunks (mode 1) keep per-chunk probes.
  bool share_modes = opt.chunk_mode == 0 && ranges.size() > 1;
  // alpha_off / modes0 / warm policy (all produced by the pipe's probe) feed
  // every other chunk.
  bool early_err;
  {
    std::unique_lock<std::mutex> l(pm);
    pcv.wait(l, [&] { return probe_ready; });
    early_err = pipe_err != nullptr;  // read under pm: no race with the
                                      // pipe's catch-block write
  }
  if (early_err) {
    pipe.join();
    std::rethrow_exception(pipe_err);
  }
  if (!ranges.empty() && pipe_e0 != ranges[0].second) {
    // Early chunk-0 decision must equal the final sectioning (same greedy
    // rule on the same ordered data) — a divergence means corrupt output.
    pipe.join();
    throw std::logic_error("pipelined chunk-0 extent != final sectioning");
  }
  // Chunks 1..n-1 in parallel with the pipe's chunk 0 (chunks are
  // independent by format design; the reference is strictly single-threaded,
  // recode.cpp:122).
  std::exception_ptr worker_err;
  if (ranges.size() > 1) {
    std::atomic<size_t> next{1};
    std::mutex mu;
    // warm.wait() throws if the pipe's chunk-0 pass failed after probe_ready;
    // catch it (first error wins) instead of letting the exception escape a
    // std::thread and call std::terminate.
    auto worker = [&] {
      try {
        for (size_t c; (c = next.fetch_add(1)) < ranges.size();) {
          auto [b, e] = ranges[c];
          Stats local;
          uint64_t modes = share_modes
                               ? modes0
                               : pick_nz_modes(p1.slices, b, e, opt, alpha_off, nullptr);
          auto blob = run_chunk_model(p1.slices, b, e, opt, local, nullptr, nullptr,
                                      nullptr, modes, true, nullptr,
                                      warm.src_slices ? &warm : nullptr, nullptr,
                                      alpha_off);
          std::lock_guard<std::mutex> lock(mu);
          nz_modes[c] = modes;
          st.recoded_bytes += blob.size();
          st.total_bins += local.total_bins;
          for (int k = 0; k < kNumBinKlasses; ++k) {
            st.bill.mbits[k] += local.bill.mbits[k];
            st.bill.count[k] += local.bill.count[k];
            st.bill.cabac_mbits[k] += local.bill.cabac_mbits[k];
          }
          st.bill.eob_cabac_mbits += local.bill.eob_cabac_mbits;
          st.bill.nz_mbits += local.bill.nz_mbits;
          st.bill.nz_count += local.bill.nz_count;
          st.bill.eob_count += local.bill.eob_count;
          st.bill.ref_mbits += local.bill.ref_mbits;
          blobs[c] = std::move(blob);
        }
      } catch (...) {
        std::lock_guard<std::mutex> lock(mu);
        if (!worker_err) worker_err = std::current_exception();
      }
    };
    unsigned n_workers =
        std::max(1u, std::min<unsigned>(std::thread::hardware_concurrency(),
                                        unsigned(ranges.size() - 1)));
    std::vector<std::thread> workers;
    for (unsigned w = 1; w < n_workers; ++w) workers.emplace_back(worker);
    worker();
    for (auto& t : workers) t.join();
  }
  pipe.join();
  if (pipe_err) std::rethrow_exception(pipe_err);
  if (worker_err) std::rethrow_exception(worker_err);
  if (!ranges.empty()) {
    nz_modes[0] = modes0;
    st.recoded_bytes += blob0.size();
    st.total_bins += st0.total_bins;
    for (int k = 0; k < kNumBinKlasses; ++k) {
      st.bill.mbits[k] += st0.bill.mbits[k];
      st.bill.count[k] += st0.bill.count[k];
      st.bill.cabac_mbits[k] += st0.bill.cabac_mbits[k];
    }
    st.bill.eob_cabac_mbits += st0.bill.eob_cabac_mbits;
    st.bill.nz_mbits += st0.bill.nz_mbits;
    st.bill.nz_count += st0.bill.nz_count;
    st.bill.eob_count += st0.bill.eob_count;
    st.bill.ref_mbits += st0.bill.ref_mbits;
    blobs[0] = std::move(blob0);
  }
  if (timing_enabled())
    fprintf(stderr, "[artc] model+encode %.3fs (%zu chunks)\n", now_s() - t1,
            ranges.size());
  double t2 = timing_enabled() ? now_s() : 0;
  auto out = finalize_container(data, size, p1, blobs, nz_modes, opt, st, warm.src_slices,
                                alpha_off);
  if (timing_enabled()) fprintf(stderr, "[artc] pack %.3fs\n", now_s() - t2);
  if (CtxBillTab::enabled()) CtxBillTab::get().dump(stderr);
  if (stats) *stats = st;
  return out;
}

std::vector<uint8_t> decompress(const uint8_t* data, size_t size, Stats* stats) {
  Stats st;
  st.input_bytes = size;
  Reader r(data, size);
  const uint8_t* magic = r.bytes(4);
  if (memcmp(magic, "ATRC", 4) != 0) throw std::runtime_error("not an ATRC container");
  uint8_t version = r.u8();
  std::string file_build = "pre-v26";
  if (version >= 26) {  // provenance precedes everything version-specific
    uint8_t bl = r.u8();
    const uint8_t* bp = r.bytes(bl);
    file_build.assign(reinterpret_cast<const char*>(bp), bl);
  }
  if (version != kContainerVersion)
    throw std::runtime_error(
        "container version " + std::to_string(version) + " (build " +
        file_build + "); this build (" ARTC_BUILD_ID ") reads version " +
        std::to_string(kContainerVersion));
  r.u16();  // default lane count (informational; blobs self-describe)
  r.u8();  // chunk_mode
  uint32_t batch_size = r.u32();
  int model_profile = r.u8();
  if (model_profile != 0 && model_profile != 2)
    throw std::runtime_error("unsupported model profile");
  // v17 transport (MPEG-TS): run map + original size; the skeleton bytes
  // lead the side stream.
  uint8_t transport = r.u8();
  if (transport > 1) throw std::runtime_error("unsupported transport");
  uint64_t ts_file_size = 0;
  std::vector<std::pair<uint64_t, uint64_t>> ts_runs;  // (skip, take)
  uint64_t ts_es_total = 0;
  if (transport == 1) {
    ts_file_size = r.vu();
    uint64_t nr = r.vu();
    ts_runs.reserve(nr);
    uint64_t skip_total = 0;
    for (uint64_t i = 0; i < nr; ++i) {
      uint64_t skip = r.vu(), take = r.vu();
      ts_es_total += take;
      skip_total += skip;
      ts_runs.emplace_back(skip, take);
    }
    if (ts_es_total > ts_file_size || skip_total > ts_file_size - ts_es_total)
      throw std::runtime_error("bad TS run map");
  }
  uint32_t want_crc = r.u32();

  // Side-byte stream (v13): verbatim bytes, coded or raw per the flag; every
  // consumer below pulls from it sequentially.
  std::vector<uint8_t> side;
  {
    uint8_t coded = r.u8();
    uint64_t raw_len = r.vu();
    if (coded) {
      uint64_t blob_len = r.vu();
      const uint8_t* bp = r.bytes(blob_len);
      side = bytemodel_decode(bp, blob_len, raw_len);
    } else {
      const uint8_t* bp = r.bytes(raw_len);
      side.assign(bp, bp + raw_len);
    }
  }
  size_t side_pos = 0;
  auto side_bytes = [&](size_t n) -> const uint8_t* {
    if (side_pos + n > side.size()) throw std::runtime_error("side stream truncated");
    const uint8_t* p = side.data() + side_pos;
    side_pos += n;
    return p;
  };
  const uint8_t* skel =
      transport == 1 ? side_bytes(size_t(ts_file_size - ts_es_total)) : nullptr;

  std::map<int, SPS> sps_map;
  std::map<int, PPS> pps_map;
  uint32_t n_ps = uint32_t(r.vu());
  for (uint32_t i = 0; i < n_ps; ++i) {
    uint8_t t = r.u8();
    uint32_t len = uint32_t(r.vu());
    const uint8_t* p = side_bytes(len);
    auto rbsp = ebsp_to_rbsp(p + 1, len - 1);
    if (t == 7) {
      SPS s = parse_sps(rbsp.data(), rbsp.size());
      sps_map[s.sps_id] = s;
    } else if (t == 8) {
      PPS q = parse_pps(rbsp.data(), rbsp.size());
      pps_map[q.pps_id] = q;
    }
  }
  uint32_t n_chunks = uint32_t(r.vu());
  std::vector<uint64_t> nz_modes(n_chunks);
  for (uint32_t c = 0; c < n_chunks; ++c) nz_modes[c] = r.vu();
  int warm_slices = int(r.vu());  // v16 warm-started chunks (0 = cold)
  uint32_t alpha_off = uint32_t(r.vu());  // v18 per-file off-sig prior weight
  uint32_t n_segments = uint32_t(r.vu());

  // Segment table first, chunk blobs after — collect segment descriptors.
  struct SegDesc {
    int kind;
    size_t lit_pos = 0, lit_len = 0;
    uint32_t chunk_idx = 0;
    uint8_t coding = 0;
    uint16_t header_bits = 0;
    std::vector<uint8_t> header_rbsp;
    uint32_t cabac_rbsp_len = 0;
    uint32_t n_values = 0;
    std::vector<uint8_t> tail_patch;
  };
  std::vector<SegDesc> segs(n_segments);
  for (auto& s : segs) {
    uint8_t tag = r.u8();
    if (tag == 0) {
      s.kind = 0;
      s.lit_len = size_t(r.vu());
      s.lit_pos = side_pos;
      side_bytes(s.lit_len);
    } else if (tag == 1) {
      s.kind = 1;
      s.chunk_idx = uint32_t(r.vu());
      s.coding = r.u8();
      s.header_bits = uint16_t(r.vu());
      uint16_t hl = uint16_t(r.vu());
      s.cabac_rbsp_len = uint32_t(r.vu());
      s.n_values = uint32_t(r.vu());
      uint8_t pl = r.u8();
      r.u8();  // start_code_len (informational)
      const uint8_t* hp = side_bytes(hl);
      s.header_rbsp.assign(hp, hp + hl);
      const uint8_t* pp = side_bytes(pl);
      s.tail_patch.assign(pp, pp + pl);
    } else {
      throw std::runtime_error("bad segment tag");
    }
  }
  struct ChunkState {
    std::unique_ptr<PriorModel> model;
    std::unique_ptr<RansInterleavedDecoder> rans;
  };
  std::vector<ChunkState> chunks(n_chunks);
  std::vector<std::pair<size_t, size_t>> blob_extents(n_chunks);
  for (uint32_t c = 0; c < n_chunks; ++c) {
    uint64_t bl = r.vu();
    blob_extents[c] = {r.pos, bl};
    r.bytes(bl);
  }

  // Per-slice decode: parses the stored header, replays the syntax walk from
  // the chunk's model + rANS lanes, regenerates the original NAL bytes.
  auto decode_slice = [&](const SegDesc& s, ChunkState& cs, PictureState& pic,
                          int slice_id) -> std::vector<uint8_t> {
    int nal_type = s.header_rbsp[0] & 0x1f;
    int nal_ref_idc = (s.header_rbsp[0] >> 5) & 3;
    if (s.coding == 1) {
      // CAVLC slice: decode values from the model, replay the walker into a
      // bit-exact writer.
      std::vector<uint8_t> hdr_rbsp(s.header_rbsp.begin() + 1, s.header_rbsp.end());
      hdr_rbsp.resize(s.cabac_rbsp_len, 0xff);
      const SPS* sps;
      const PPS* pps;
      SliceHeader sh = parse_slice_header(hdr_rbsp.data(), hdr_rbsp.size(), nal_type,
                                          nal_ref_idc, sps_map, pps_map, &sps, &pps);
      BitWriter bw;
      for (size_t b = 0; b < s.header_bits; ++b)
        bw.put_bit((s.header_rbsp[1 + (b >> 3)] >> (7 - (b & 7))) & 1);
      cs.model->begin_slice(sh.is_intra() ? 0 : (sh.is_b() ? 2 : 1),
                            sh.first_mb_in_slice == 0, sps->mb_width(),
                            sh.pic_mb_height(*sps));
      CavlcModelSource src(*cs.model, *cs.rans, s.n_values);
      CavlcPicture cpic;
      cpic.reset(sps->mb_width(), sh.pic_mb_height(*sps));
      CavlcReplayer<CavlcModelSource> rep(src, bw);
      CavlcWalker<CavlcReplayer<CavlcModelSource>> w(*sps, *pps, sh, cpic, slice_id, rep);
      w.run();
      bw.put_bit(1);
      while (!bw.byte_aligned()) bw.put_bit(0);
      std::vector<uint8_t> regen = bw.bytes();
      if (regen.size() > s.cabac_rbsp_len) throw std::runtime_error("cavlc regen overflow");
      regen.resize(s.cabac_rbsp_len, 0);
      std::copy(s.tail_patch.begin(), s.tail_patch.end(), regen.end() - s.tail_patch.size());
      std::vector<uint8_t> ebsp = rbsp_to_ebsp(regen.data(), regen.size());
      std::vector<uint8_t> nal;
      nal.reserve(1 + ebsp.size());
      nal.push_back(s.header_rbsp[0]);
      nal.insert(nal.end(), ebsp.begin(), ebsp.end());
      return nal;
    }
    // The header parser needs the *full* RBSP to exist, but only reads header
    // bits; pad with the cabac length so bit-bounds checks pass.
    std::vector<uint8_t> hdr_rbsp(s.header_rbsp.begin() + 1, s.header_rbsp.end());
    size_t hb = hdr_rbsp.size();
    hdr_rbsp.resize(hb + s.cabac_rbsp_len, 0xff);
    const SPS* sps;
    const PPS* pps;
    SliceHeader sh = parse_slice_header(hdr_rbsp.data(), hdr_rbsp.size(), nal_type, nal_ref_idc,
                                        sps_map, pps_map, &sps, &pps);
    bool new_picture = sh.first_mb_in_slice == 0;
    if (new_picture) pic.reset(sps->mb_width(), sh.pic_mb_height(*sps));
    cs.model->seed_from_cabac(sh.cabac_init_idc, sh.slice_qp);
    cs.model->set_chroma422(sps->chroma_format_idc == 2);
    cs.model->begin_slice(sh.is_intra() ? 0 : (sh.is_b() ? 2 : 1), new_picture,
                          sps->mb_width(), sh.pic_mb_height(*sps));
    ModelSource src(*cs.model, *cs.rans, sh.is_intra(), sh.cabac_init_idc, sh.slice_qp);
    SliceWalker<ModelSource> walker(*sps, *pps, sh, pic, slice_id, src);
    walker.run();
    std::vector<uint8_t> regen = src.cabac().take_bytes();
    if (regen.size() > s.cabac_rbsp_len) throw std::runtime_error("regen overflow");
    regen.resize(s.cabac_rbsp_len, 0);
    std::copy(s.tail_patch.begin(), s.tail_patch.end(), regen.end() - s.tail_patch.size());
    // Assemble NAL: header byte + escape(header RBSP + cabac section).
    std::vector<uint8_t> rbsp(s.header_rbsp.begin() + 1, s.header_rbsp.end());
    rbsp.insert(rbsp.end(), regen.begin(), regen.end());
    std::vector<uint8_t> ebsp = rbsp_to_ebsp(rbsp.data(), rbsp.size());
    std::vector<uint8_t> nal;
    nal.reserve(1 + ebsp.size());
    nal.push_back(s.header_rbsp[0]);
    nal.insert(nal.end(), ebsp.begin(), ebsp.end());
    return nal;
  };

  // v16 warm-started chunks: chunk 0 publishes its table snapshot after its
  // first warm_slices slices; chunks 1+ restore it before decoding (exactly
  // mirrors the encoder's sequencing in compress()).
  WarmCtx warm;
  warm.src_slices = n_chunks > 1 ? warm_slices : 0;
  auto init_chunk = [&](uint32_t ci) {
    ChunkState& cs = chunks[ci];
    cs.model = std::make_unique<PriorModel>();
    cs.model->set_profile(model_profile);
    cs.model->set_batch_size(batch_size);
    cs.model->set_nz_modes(nz_modes[ci]);
    cs.model->set_alpha_off(alpha_off);
    if (ci > 0 && warm.src_slices) cs.model->restore_tables(warm.wait());
    cs.rans = std::make_unique<RansInterleavedDecoder>(data + blob_extents[ci].first,
                                                       blob_extents[ci].second);
  };

  // Chunk-parallel decode: chunks hold independent model state by format
  // design; a chunk is picture-self-contained iff its first slice starts a
  // picture (always true for per-IDR chunking). Otherwise fall back to the
  // strictly serial order.
  std::vector<std::vector<size_t>> chunk_segs(n_chunks);
  bool parallel_ok = true;
  for (size_t i = 0; i < segs.size(); ++i) {
    if (segs[i].kind != 1) continue;
    auto& cs = chunk_segs[segs[i].chunk_idx];
    if (cs.empty()) {
      // first_mb_in_slice is the first ue(v) after the NAL header byte:
      // starts the picture iff its first bit is 1 (ue==0).
      if (segs[i].header_rbsp.size() < 2 || (segs[i].header_rbsp[1] & 0x80) == 0)
        parallel_ok = false;
    }
    cs.push_back(i);
  }
  std::vector<std::vector<uint8_t>> slice_out(segs.size());
  unsigned n_workers = std::min<size_t>(std::thread::hardware_concurrency(), n_chunks);
  if (parallel_ok && n_workers > 1) {
    std::atomic<size_t> next{0};
    std::vector<std::thread> workers;
    std::atomic<bool> failed{false};
    std::string err;
    std::mutex err_mu;
    for (unsigned w = 0; w < n_workers; ++w)
      workers.emplace_back([&] {
        for (size_t ci; (ci = next.fetch_add(1)) < n_chunks;) {
          try {
            init_chunk(uint32_t(ci));
            PictureState pic;
            int slice_id = 0;
            for (size_t si : chunk_segs[ci]) {
              slice_out[si] = decode_slice(segs[si], chunks[ci], pic, ++slice_id);
              if (ci == 0 && slice_id == warm.src_slices)
                warm.publish(*chunks[0].model);
            }
            if (ci == 0 && warm.src_slices && !warm.ready)
              warm.publish(*chunks[0].model);
          } catch (const std::exception& e) {
            std::lock_guard<std::mutex> lock(err_mu);
            failed = true;
            err = e.what();
            if (ci == 0 && warm.src_slices && !warm.ready) {
              // Release waiters with a structurally valid (cold) snapshot;
              // their output is discarded — the failure throws below.
              PriorModel cold;
              warm.publish(cold);
            }
          }
        }
      });
    for (auto& t : workers) t.join();
    if (failed) throw std::runtime_error(err);
  } else {
    PictureState pic;
    int slice_id = 0;
    int chunk0_done = 0;
    for (size_t i = 0; i < segs.size(); ++i) {
      if (segs[i].kind != 1) continue;
      uint32_t ci = segs[i].chunk_idx;
      if (ci > 0 && warm.src_slices && !warm.ready && chunks[0].model)
        warm.publish(*chunks[0].model);  // src_slices beyond chunk 0's end
      if (!chunks[ci].model) init_chunk(ci);
      slice_out[i] = decode_slice(segs[i], chunks[ci], pic, ++slice_id);
      if (ci == 0 && ++chunk0_done == warm.src_slices)
        warm.publish(*chunks[0].model);
    }
  }

  std::vector<uint8_t> out;
  for (size_t i = 0; i < segs.size(); ++i) {
    if (segs[i].kind == 0) {
      out.insert(out.end(), side.data() + segs[i].lit_pos,
                 side.data() + segs[i].lit_pos + segs[i].lit_len);
    } else {
      out.insert(out.end(), slice_out[i].begin(), slice_out[i].end());
      ++st.n_slices;
    }
  }
  if (transport == 1) {
    // Weave the regenerated ES back between the skeleton bytes.
    if (out.size() != ts_es_total) throw std::runtime_error("TS ES length mismatch");
    std::vector<uint8_t> file;
    file.reserve(ts_file_size);
    size_t sp = 0, ep = 0;
    for (auto [skip, take] : ts_runs) {
      file.insert(file.end(), skel + sp, skel + sp + skip);
      sp += skip;
      file.insert(file.end(), out.data() + ep, out.data() + ep + take);
      ep += take;
    }
    file.insert(file.end(), skel + sp, skel + (ts_file_size - ts_es_total));
    out = std::move(file);
  }
  st.output_bytes = out.size();
  if (crc32_ieee(out.data(), out.size()) != want_crc)
    throw std::runtime_error("integrity check failed: reconstructed file CRC mismatch");
  if (stats) *stats = st;
  return out;
}

}  // namespace artc

// ---------------------------------------------------------------------------
// C ABI for ctypes (the Python layer loads this; no pybind11 in the image).
extern "C" {

struct ArtcStats {
  uint64_t input_bytes, output_bytes, cabac_in_bytes, recoded_bytes, literal_bytes;
  int32_t n_slices, n_fallback, n_chunks;
  uint64_t total_bins;
  uint64_t klass_mbits[artc::kNumBinKlasses];
  uint64_t klass_count[artc::kNumBinKlasses];
  uint64_t klass_cabac_mbits[artc::kNumBinKlasses];
  uint64_t eob_cabac_mbits;
  uint64_t nz_mbits, nz_count, eob_count;
  uint64_t ref_mbits;  // reference-model side-car total (ARTC_REFMODEL=1)
};

static void fill_stats(const artc::Stats& st, ArtcStats* out) {
  if (!out) return;
  out->input_bytes = st.input_bytes;
  out->output_bytes = st.output_bytes;
  out->cabac_in_bytes = st.cabac_in_bytes;
  out->recoded_bytes = st.recoded_bytes;
  out->literal_bytes = st.literal_bytes;
  out->n_slices = st.n_slices;
  out->n_fallback = st.n_fallback;
  out->n_chunks = st.n_chunks;
  out->total_bins = st.total_bins;
  for (int i = 0; i < artc::kNumBinKlasses; ++i) {
    out->klass_mbits[i] = st.bill.mbits[i];
    out->klass_count[i] = st.bill.count[i];
    out->klass_cabac_mbits[i] = st.bill.cabac_mbits[i];
  }
  out->eob_cabac_mbits = st.bill.eob_cabac_mbits;
  out->nz_mbits = st.bill.nz_mbits;
  out->nz_count = st.bill.nz_count;
  out->eob_count = st.bill.eob_count;
  out->ref_mbits = st.bill.ref_mbits;
}

static thread_local std::string g_error;

const char* artc_last_error() { return g_error.c_str(); }

int artc_compress(const uint8_t* data, size_t size, int lanes, int chunk_mode,
                  uint32_t batch_size, int model_profile, uint8_t** out, size_t* out_len,
                  ArtcStats* stats) {
  try {
    artc::Options opt;
    opt.lanes = lanes > 0 ? lanes : 16;
    opt.chunk_mode = chunk_mode;
    opt.batch_size = batch_size;
    opt.model_profile = model_profile;
    artc::Stats st;
    auto v = artc::compress(data, size, opt, &st);
    *out = static_cast<uint8_t*>(malloc(v.size()));
    memcpy(*out, v.data(), v.size());
    *out_len = v.size();
    fill_stats(st, stats);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

int artc_decompress(const uint8_t* data, size_t size, uint8_t** out, size_t* out_len,
                    ArtcStats* stats) {
  try {
    artc::Stats st;
    auto v = artc::decompress(data, size, &st);
    *out = static_cast<uint8_t*>(malloc(v.size()));
    memcpy(*out, v.data(), v.size());
    *out_len = v.size();
    fill_stats(st, stats);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

void artc_free(uint8_t* p) { free(p); }

int artc_container_version() { return artc::kContainerVersion; }

// ---------------------------------------------------------------------------
// Randomized self-test hooks (pytest drives these; the reference property-
// tests its coder the same way, reference test/arithmetic_code.cpp:49-111).

// rANS: encode n (bit, prob) pairs with the production codec.
int artc_rans_encode(const uint8_t* bits, const uint16_t* probs, uint64_t n,
                     int lanes, uint8_t** out, size_t* out_len) {
  using namespace artc;
  try {
    std::vector<uint8_t> b(bits, bits + n);
    std::vector<uint16_t> p(probs, probs + n);
    auto blob = RansInterleaved::encode(b, p, lanes);
    *out = static_cast<uint8_t*>(malloc(blob.size()));
    memcpy(*out, blob.data(), blob.size());
    *out_len = blob.size();
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

// rANS: decode n bins (per-bin probabilities supplied by the caller, exactly
// like the model supplies them in production). Malformed/truncated blobs must
// produce a clean error, never a crash.
int artc_rans_decode(const uint8_t* blob, size_t blob_len, const uint16_t* probs,
                     uint64_t n, uint8_t* bits_out) {
  using namespace artc;
  try {
    RansInterleavedDecoder dec(blob, blob_len);
    for (uint64_t i = 0; i < n; ++i) bits_out[i] = uint8_t(dec.decode(probs[i]));
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

// CABAC encoder<->decoder randomized differential (the reference's debugging
// pattern, test/arithmetic_code.cpp:66-91): encode a random mix of context
// decisions / bypass bins / terminate-0 probes against a mutating context
// bank, decode with an independently initialized bank, compare every bin.
// Exercises flush + renorm edges no x264 stream emits. Returns 0 on success.
static int cabac_fuzz_impl(uint64_t seed, int n, int mps_pct) {
  using namespace artc;
  try {
    auto rng = [s = seed]() mutable {
      s ^= s << 13;
      s ^= s >> 7;
      s ^= s << 17;
      return s;
    };
    bool intra = rng() & 1;
    int idc = int(rng() % 3);
    int qp = int(rng() % 52);
    CabacContexts ectx;
    ectx.init(intra, idc, qp);
    CabacEncoder enc;
    std::vector<uint8_t> ops;   // 0 = decision, 1 = bypass, 2 = terminate(0)
    std::vector<int> ctxs, bins;
    // mps_pct > 0: bias decision bins toward (or away from) the context's
    // MPS. Heavy MPS bias drives contexts to their extreme states, where the
    // encoder emits long deferred-0xff / outstanding runs and carry ripples
    // into held bytes — the byte-wise renorm's delicate paths.
    for (int i = 0; i < n; ++i) {
      int op = int(rng() % 16);
      int bin = int(rng() & 1);
      if (op < 12) {
        int cx = int(rng() % kNumCabacContexts);
        if (mps_pct > 0)
          bin = (int(rng() % 100) < mps_pct) ? ectx.val_mps[cx]
                                             : 1 - ectx.val_mps[cx];
        enc.encode_decision(ectx, cx, bin);
        ops.push_back(0);
        ctxs.push_back(cx);
        bins.push_back(bin);
      } else if (op < 15) {
        enc.encode_bypass(bin);
        ops.push_back(1);
        ctxs.push_back(0);
        bins.push_back(bin);
      } else {
        enc.encode_terminate(0);
        ops.push_back(2);
        ctxs.push_back(0);
        bins.push_back(0);
      }
    }
    enc.encode_terminate(1);
    auto bytes = enc.take_bytes();
    CabacContexts dctx;
    dctx.init(intra, idc, qp);
    CabacDecoder dec(bytes.data(), bytes.size(), 0);
    for (size_t i = 0; i < ops.size(); ++i) {
      int got = ops[i] == 0   ? dec.decode_decision(dctx, ctxs[i])
                : ops[i] == 1 ? dec.decode_bypass()
                              : dec.decode_terminate();
      if (got != bins[i]) {
        g_error = "cabac fuzz mismatch";
        return -1;
      }
    }
    if (dec.decode_terminate() != 1) {
      g_error = "cabac fuzz: missing terminate";
      return -1;
    }
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

int artc_cabac_fuzz(uint64_t seed, int n) { return cabac_fuzz_impl(seed, n, 0); }

// Biased differential fuzz: mps_pct in [1, 100] steers decision bins toward
// the MPS (see cabac_fuzz_impl) to stress the encoder's carry machinery.
int artc_cabac_fuzz_biased(uint64_t seed, int n, int mps_pct) {
  return cabac_fuzz_impl(seed, n, mps_pct);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Device-path C ABI: analysis export + container assembly from external blobs.
extern "C" {

// Serializes per-chunk model-pass inputs (and the host reference probs) for
// the JAX/TPU path:
//   header: u32 magic 'ANLZ', u32 n_chunks, u32 lanes, u32 batch,
//           u32 n_dual_keys, u32 n_sig_keys,
//           u32 fast_window, u32 slow_window, u32 sig_window, u32 sig_alpha
//   per chunk: u64 n_pairs; bit u8[]; kind u8[]; key u32[]; prior u16[];
//              pre_ones u16[]; pre_tot u16[] (within-batch per-key exclusive
//              prefix counts — lets the device pass skip the sort/prefix
//              machinery while keeping immediate-increment semantics);
//              prob u16[] (host-computed, for differential testing);
//              dual0 u16[4 * n_dual_keys] (fp,fn,sp,sn per key);
//              u32 n_sig_nz + sparse sig0 rows (v16 warm-started chunks)
static uint32_t bucket_pow2(uint32_t x) {
  uint32_t b = 1;
  while (b < x) b *= 2;
  return b;
}

// Super-step-count bucketing: pow2 up to 8, then multiples of 2. Pow2 all
// the way wastes up to 2x wire bytes as padding (a 103 MB wire at 3 seeded
// sections vs 73 at 2 plain ones); even steps cap pad waste at ~6% while
// each distinct chunk shape still compiles exactly once on device.
static uint32_t bucket_steps(uint32_t x) {
  if (x <= 8) return bucket_pow2(x);
  return (x + 1) & ~1u;
}

// Streaming analyze state: background workers walk + export chunks as they
// finish; artc_session_analyze_chunk rendezvouses per chunk so the caller can
// upload chunk i to the device while the host still walks chunk i+1 — the
// host/device overlap the reference's single fused pass gets for free by
// being serial (reference recode.cpp:1102-1309).
struct AnalyzeState {
  std::vector<uint8_t> header;
  std::vector<std::vector<uint8_t>> bufs;
  std::vector<uint8_t> status;  // 0 pending, 1 ready, 2 failed (guarded by mu)
  std::string err;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  std::atomic<size_t> next{0};
  ~AnalyzeState() {
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

// Session: one pass1 + nz-mode pick shared between analysis export and
// container packing (the pre-session flow ran both twice).
//
// artc_session_open returns immediately: pass1 runs on a background opener
// thread, with a pipe thread that (as soon as the incremental assembly fixes
// chunk 0's extent, mid-walk) runs the nz-mode probe and then pre-produces
// chunk 0's trace walk + slim export with the product defaults — so by the
// time the caller's analyze loop asks for chunk 0, its export is already
// done or underway, and the v16 warm snapshot published early for the other
// chunks' walks. Every other ABI entry waits for the opener via
// session_ready(). Byte-identical outputs; only the schedule changes.
static void write_slim_chunk(artc::Writer& w,
                             const std::vector<artc::PriorModel::Coded>& trace,
                             const std::vector<uint16_t>& probs, bool has_probs,
                             const std::vector<artc::Dual>& dual0,
                             const std::vector<artc::Estimator>& sig0, uint32_t batch,
                             uint32_t sup_u, bool share_dual0, bool share_sig0);

struct ArtcSession {
  std::vector<uint8_t> data;
  artc::Options opt;
  artc::Stats st;
  artc::Pass1 p1;
  artc::Pass1Progress prog;
  std::vector<std::pair<size_t, size_t>> ranges;
  std::vector<uint64_t> nz_modes;
  int warm_slices = 0;        // v16 warm-started chunks (0 = cold)
  uint32_t alpha_off = 0;     // v18 per-file off-sig prior weight
  artc::WarmCtx warm;         // shared by the pre-analyze and analyze workers
  std::mutex smu;             // guards the open/probe/c0 state below
  std::condition_variable scv;
  bool open_done = false;     // opener finished (ranges/nz_modes/... final)
  std::string open_err;       // nonempty = pass1/probe failed
  bool probe_done = false;    // pipe finished its probe phase
  bool pipe_probed = false;   // probe ran (file has chunks)
  size_t pipe_e0 = SIZE_MAX;  // chunk 0 extent the pipe worked on
  uint64_t pipe_modes0 = 0;
  uint32_t pipe_alpha = 0;
  // Pre-produced chunk 0 analyze products. The trace walk is sup-independent
  // and dominates the chunk's cost; the slim export is additionally
  // pre-rendered at the Python default sup (ARTC_MODEL_SUP, 128 — see
  // ops/model_pass.py::default_sup) and re-rendered from the stored walk on
  // a mismatch.
  int c0_state = 0;           // 0 none, 1 in progress, 2 ready, 3 failed
  uint32_t c0_sup = 0;        // sup the pre-rendered c0_buf was built with
  std::vector<uint8_t> c0_buf;
  std::vector<artc::PriorModel::Coded> c0_trace;
  std::vector<uint16_t> c0_probs;
  std::vector<artc::Dual> c0_dual0;
  std::vector<artc::Estimator> c0_sig0;
  std::unique_ptr<AnalyzeState> astate;  // live streaming analyze, if any
  std::thread pipe;    // probe + chunk-0 pre-analyze (outlives the opener)
  std::thread opener;  // pass1 + session field finalization
  ~ArtcSession() {
    if (opener.joinable()) opener.join();
    if (pipe.joinable()) pipe.join();
  }
};

// Blocks until the background opener finished; false (with g_error set) if
// the session failed to open.
static bool session_ready(ArtcSession* s) {
  std::unique_lock<std::mutex> l(s->smu);
  s->scv.wait(l, [&] { return s->open_done; });
  if (!s->open_err.empty()) {
    g_error = s->open_err;
    return false;
  }
  return true;
}

void* artc_session_open(const uint8_t* data, size_t size, int lanes, int chunk_mode,
                        uint32_t batch_size, int model_profile) {
  using namespace artc;
  try {
    if (model_profile != 0 && model_profile != 2)
      throw std::runtime_error("unsupported model profile (0 = immediate, 2 = frozen-batch)");
    auto* s = new ArtcSession;
    s->data.assign(data, data + size);
    s->opt.lanes = lanes > 0 ? lanes : 16;
    s->opt.chunk_mode = chunk_mode;
    s->opt.batch_size = batch_size;
    s->opt.model_profile = model_profile;
    s->opt.collect_streams = false;
    s->alpha_off = PriorModel::kSigMixAlphaOff;
    // Pipe: probe as soon as chunk 0's extent is known (mid-pass1 on
    // sectioned files), signal probe_done, then keep going with chunk 0's
    // trace walk + slim export in the background (the opener does NOT wait
    // for that part — analyze_begin must not serialize behind it).
    s->pipe = std::thread([s] {
      uint64_t modes0 = 0;
      uint32_t alpha0 = PriorModel::kSigMixAlphaOff;
      size_t e0 = 0;
      bool multi = false, any = false;
      std::string perr;
      try {
        {
          std::unique_lock<std::mutex> l(s->prog.mu);
          s->prog.cv.wait(l, [&] { return s->prog.done || s->prog.chunk0_final; });
          if (s->prog.chunk0_final) {
            e0 = s->prog.chunk0_end;
            multi = any = true;
          } else if (s->prog.n_chunks > 0) {
            any = true;
            const auto& sl = *s->prog.slices;
            while (e0 < sl.size() && sl[e0].chunk_idx == 0) ++e0;
            multi = s->prog.n_chunks > 1;
          }
        }
        if (any) {
          const auto& sl = *s->prog.slices;
          modes0 = pick_nz_modes(sl, 0, e0, s->opt, 0, &alpha0);
          s->warm.src_slices = multi ? pick_warm_slices_range(sl, 0, e0) : 0;
        }
      } catch (const std::exception& e) {
        perr = e.what();
        any = false;
      }
      {
        std::lock_guard<std::mutex> l(s->smu);
        s->pipe_probed = any && perr.empty();
        s->pipe_e0 = e0;
        s->pipe_modes0 = modes0;
        s->pipe_alpha = alpha0;
        if (!perr.empty() && s->open_err.empty()) s->open_err = perr;
        s->probe_done = true;
        if (any && perr.empty() && s->opt.model_profile == 2) {
          s->c0_state = 1;  // pre-produce below
          s->c0_sup = 128;  // Python-side default (ops/model_pass.default_sup)
          if (const char* e = getenv("ARTC_MODEL_SUP"))
            if (*e) s->c0_sup = uint32_t(strtoul(e, nullptr, 10));
          if (!s->c0_sup) s->c0_sup = 128;
        }
        s->scv.notify_all();
      }
      if (!(any && perr.empty() && s->opt.model_profile == 2)) return;
      // Pre-produce chunk 0's analyze export (sup = 128 / ARTC_MODEL_SUP —
      // the Python product default set above; no probs. analyze_begin re-runs
      // chunk 0 itself on a sup/probs mismatch, e.g. a C-ABI caller using the
      // raw default sup=16). Publishes the v16 warm snapshot for the other
      // chunks' walks as a side effect, well before chunk 0's export finishes.
      try {
        const auto& sl = *s->prog.slices;
        std::vector<PriorModel::Coded> trace;
        std::vector<uint16_t> probs;
        std::vector<Dual> dual0;
        std::vector<Estimator> sig0;
        Stats tmp;
        double t0 = timing_enabled() ? now_s() : 0;
        run_chunk_model(sl, 0, e0, s->opt, tmp, &trace, &probs, &dual0, modes0,
                        /*encode_blob=*/false,
                        s->warm.src_slices ? &s->warm : nullptr, nullptr, &sig0,
                        alpha0, /*trace_only=*/true);
        if (timing_enabled())
          fprintf(stderr, "[artc] analyze chunk 0: trace walk %.3fs (%zu bins, pre)\n",
                  now_s() - t0, trace.size());
        t0 = timing_enabled() ? now_s() : 0;
        Writer cw;
        write_slim_chunk(cw, trace, probs, /*has_probs=*/false, dual0, sig0,
                         s->opt.batch_size ? s->opt.batch_size : 1, s->c0_sup,
                         false, false);
        if (timing_enabled())
          fprintf(stderr, "[artc] analyze chunk 0: slim export %.3fs (pre, sup %u)\n",
                  now_s() - t0, s->c0_sup);
        std::lock_guard<std::mutex> l(s->smu);
        s->c0_buf = std::move(cw.buf);
        s->c0_trace = std::move(trace);
        s->c0_probs = std::move(probs);
        s->c0_dual0 = std::move(dual0);
        s->c0_sig0 = std::move(sig0);
        s->c0_state = 2;
        s->scv.notify_all();
      } catch (...) {
        s->warm.fail();
        std::lock_guard<std::mutex> l(s->smu);
        s->c0_state = 3;
        s->scv.notify_all();
      }
    });
    s->opener = std::thread([s] {
      std::string err;
      try {
        run_pass1(s->data.data(), s->data.size(), s->opt, s->st, &s->p1, &s->prog);
      } catch (const std::exception& e) {
        err = e.what();
        std::lock_guard<std::mutex> lock(s->prog.mu);
        s->prog.done = true;
        s->prog.cv.notify_all();
      }
      bool probed = false;
      size_t e0 = SIZE_MAX;
      uint64_t modes0 = 0;
      uint32_t alpha0 = 0;
      {
        std::unique_lock<std::mutex> l(s->smu);
        s->scv.wait(l, [&] { return s->probe_done; });
        probed = s->pipe_probed;
        e0 = s->pipe_e0;
        modes0 = s->pipe_modes0;
        alpha0 = s->pipe_alpha;
        if (err.empty() && !s->open_err.empty()) err = s->open_err;
      }
      if (err.empty()) {
        try {
          chunk_ranges(s->p1.slices, s->st.n_chunks, &s->ranges);
          if (probed && !s->ranges.empty() && e0 != s->ranges[0].second)
            throw std::logic_error("pipelined chunk-0 extent != final sectioning");
          bool share = s->opt.chunk_mode == 0 && s->ranges.size() > 1;
          for (auto [b, e] : s->ranges)
            s->nz_modes.push_back(
                s->nz_modes.empty()
                    ? (probed ? (s->alpha_off = alpha0, modes0)
                              : pick_nz_modes(s->p1.slices, b, e, s->opt, 0,
                                              &s->alpha_off))
                    : (share ? s->nz_modes[0]
                             : pick_nz_modes(s->p1.slices, b, e, s->opt,
                                             s->alpha_off, nullptr)));
          s->warm_slices = pick_warm_slices(s->p1.slices, s->ranges);
          if (probed && s->warm.src_slices != s->warm_slices)
            throw std::logic_error("pipelined warm policy != final warm policy");
        } catch (const std::exception& e) {
          err = e.what();
        }
      }
      std::lock_guard<std::mutex> lock(s->smu);
      if (s->open_err.empty()) s->open_err = std::move(err);
      s->open_done = true;
      s->scv.notify_all();
    });
    return s;
  } catch (const std::exception& e) {
    g_error = e.what();
    return nullptr;
  }
}

void artc_session_close(void* h) { delete static_cast<ArtcSession*>(h); }

// Slim per-chunk analysis export (device wire format 5, magic 'ANL5'):
// designed for the tunnel-attached TPU where transfer bytes are the wall.
// Requires the frozen-batch model profile (2): probabilities within a batch
// read tables as of the last flush, so the per-bin prefix counts vanish.
//
// v4 over v3: the per-bin u16 (bit|kind|slot) word is replaced by a 4-bit
// header nibble plus a rank into the bin's own sub-batch COO run. Every
// non-ext bin's slot appears in its sub-batch's (ones, total) update run by
// construction, and those runs are short (~hundreds of entries vs the 8192-
// wide super-step dict), so the rank needs ~11 bits instead of 13 — and with
// the run frequency-ordered, the hottest 2^wa slots need only wa (~5) bits.
// Two packed substreams (hot/cold, selected by a class bit in the nibble)
// are re-indexed on device with one cumulative sum each. COO slots travel
// bit-packed at ceil(log2(U)) bits; warm-started chunks >= 2 share chunk 1's
// dual0/sig0 tables (all warm chunks start from the same v16 snapshot);
// padding to m is synthesized on device instead of shipped.
//
// Layout per chunk (after the shared header fields):
//   u64 n; u32 ns, ud, us; u64 m
//   u8 flags (bit0 probs present, bit1 dual0 = previous chunk's,
//             bit2 sig0 = previous chunk's)
//   u16 ndict; u16 dict[ndict]            (priors by descending frequency)
//   u32 n_esc; u32 esc_idx[]; u16 esc_val[]  (bins whose prior is not in dict)
//   u8 wa; u8 wb; u8 wcs                  (hot/cold rank widths, COO slot width)
//   u64 nw_hdr; u32 hdr_words[nw_hdr]     (4-bit nibbles: bit<<3|kind<<1|cls)
//   u64 nA; u64 nwA; u32 a_words[nwA]     (wa-bit ranks of class-0 bins)
//   u64 nB; u64 nwB; u32 b_words[nwB]     (wb-bit ranks of class-1 bins)
//   u8  prior_idx[n]   (255 = escape)
//   u32 dk_d[ns*ud]; u32 dk_s[ns*us]
//   [u16 dual0[4*n_dual]]                         unless flags bit1
//   [u32 n_sig_nz; u32 sig_idx[]; u16 sig_pos[]; u16 sig_neg[]]  unless bit2
//     (sparse sig start state — nonzero only for v16 warm-started chunks)
//   u64 n_coo; u16 coo_cnt[ns*sup]
//   u64 nw_cs; u32 cs_words[nw_cs]        (wcs-bit COO slots, each sub-batch
//                                          run ordered by descending total)
//   u8 coo_ones[n_coo]; u8 coo_tot[n_coo]
//   u32 n_cesc; u32 cesc_idx[]; u16 cesc_ones[]; u16 cesc_tot[]  (>255 exact)
//     (per-sub-batch per-touched-slot (ones, total) update deltas, the sparse
//      form of the v2 dd/ds tables — reconstructed on device by one scatter)
//   u16 probs[n] if flags bit0
struct BitPacker {
  // Little-endian bit order within little-endian u32 words: stream bit k
  // lands in word k>>5 at position k&31. Always keeps one tail word so the
  // device's straddle gather (words[wi+1]) stays in bounds.
  std::vector<uint32_t> words;
  uint64_t bits = 0;
  void put(uint32_t v, uint32_t w) {
    const uint64_t word = bits >> 5, off = bits & 31;
    if (words.size() < word + 2) words.resize(word + 2, 0);
    const uint64_t x = uint64_t(v) << off;
    words[word] |= uint32_t(x);
    words[word + 1] |= uint32_t(x >> 32);
    bits += w;
  }
  // No-straddle put: entry j of a w-bit stream lives entirely inside word
  // j / (32/w) (32 mod w tail bits per word stay zero). Costs up to
  // 32/(32/w)/w - 1 extra wire bits per entry; buys the device a SINGLE
  // gather per entry instead of a straddling pair (ops/model_pass
  // unpack_routed) — the rank substream gathers were the largest term of
  // the on-chip wire expand (RESULTS.md r4 gather economics).
  void put_ns(uint32_t v, uint32_t w) {
    if (32 - (bits & 31) < w) bits = (bits + 31) & ~31ull;
    put(v, w);
  }
  void finish() {
    if (words.size() < 2) words.resize(2, 0);
  }
  // Word count a no-straddle stream of `count` w-bit entries occupies.
  static uint64_t ns_words(uint64_t count, uint32_t w) {
    const uint64_t epw = 32 / w;
    return (count + epw - 1) / epw;
  }
};

static uint32_t ceil_log2(uint32_t x) {  // bits to hold values in [0, x)
  uint32_t b = 1;
  while ((1u << b) < x) ++b;
  return b;
}

static void write_sig0_sparse(artc::Writer& w, const std::vector<artc::Estimator>& sig0) {
  // Sparse sig start state (v16 warm-started chunks): nonzero rows only.
  // Cold chunks (and chunk 0) write an empty list.
  std::vector<uint32_t> idx;
  for (uint32_t i = 0; i < sig0.size(); ++i)
    if (sig0[i].pos | sig0[i].neg) idx.push_back(i);
  w.u32(uint32_t(idx.size()));
  for (uint32_t i : idx) w.u32(i);
  for (uint32_t i : idx) w.u16(sig0[i].pos);
  for (uint32_t i : idx) w.u16(sig0[i].neg);
}

static void write_slim_chunk(artc::Writer& w,
                             const std::vector<artc::PriorModel::Coded>& trace,
                             const std::vector<uint16_t>& probs, bool has_probs,
                             const std::vector<artc::Dual>& dual0,
                             const std::vector<artc::Estimator>& sig0, uint32_t batch,
                             uint32_t sup_u, bool share_dual0, bool share_sig0) {
  using namespace artc;
  using Coded = PriorModel::Coded;
  const uint64_t n = trace.size();
  const uint64_t span = uint64_t(sup_u) * batch;
  uint64_t ns = bucket_steps(uint32_t((n + span - 1) / span));
  if (ns == 0) ns = 1;
  const uint64_t m = ns * span;
  const uint32_t n_dual_ext = uint32_t(PriorModel::kNumDualKeys) + 1;

  // Prior dictionary: count u16 frequencies, keep the top 255.
  std::vector<uint32_t> freq(65536, 0);
  for (const Coded& c : trace) freq[c.prior]++;
  std::vector<uint32_t> by_freq(65536);
  for (uint32_t i = 0; i < 65536; ++i) by_freq[i] = i;
  std::partial_sort(by_freq.begin(), by_freq.begin() + 255, by_freq.end(),
                    [&](uint32_t a, uint32_t b) { return freq[a] > freq[b]; });
  std::vector<uint16_t> dict;
  std::vector<uint8_t> pidx_map(65536, 255);
  for (int i = 0; i < 255 && freq[by_freq[i]] > 0; ++i) {
    pidx_map[by_freq[i]] = uint8_t(dict.size());
    dict.push_back(uint16_t(by_freq[i]));
  }

  // Phase 1: per-super-step sorted unique key lists (epoch-marked).
  std::vector<uint32_t> ep_d(PriorModel::kNumDualKeys, ~0u);
  std::vector<uint32_t> ep_s(PriorModel::kNumSigKeys, ~0u);
  std::vector<std::vector<uint32_t>> keys_d(ns), keys_s(ns);
  for (uint64_t i = 0; i < n; ++i) {
    const Coded& c = trace[i];
    if (c.kind == PriorModel::kKindPrior) continue;
    uint32_t stp = uint32_t(i / span);
    if (c.kind == PriorModel::kKindSig) {
      if (ep_s[c.key] != stp) { ep_s[c.key] = stp; keys_s[stp].push_back(c.key); }
    } else {
      if (ep_d[c.key] != stp) { ep_d[c.key] = stp; keys_d[stp].push_back(c.key); }
    }
  }
  uint32_t max_d = 1, max_s = 1;
  for (uint64_t s = 0; s < ns; ++s) {
    std::sort(keys_d[s].begin(), keys_d[s].end());
    std::sort(keys_s[s].begin(), keys_s[s].end());
    max_d = std::max<uint32_t>(max_d, uint32_t(keys_d[s].size()));
    max_s = std::max<uint32_t>(max_s, uint32_t(keys_s[s].size()));
  }
  const uint32_t ud = bucket_pow2(max_d + 1), us = bucket_pow2(max_s + 1);
  const uint32_t U = ud + us;
  if (U > 8192)
    throw std::runtime_error("slim analysis: dict width > 8192 (use fat export)");

  // Phase 2: per-bin (bit, kind) nibbles + prior indices, frequency-ordered
  // per-sub-batch COO delta runs, per-bin ranks into those runs.
  std::vector<uint8_t> prior_idx(n);
  std::vector<uint8_t> bin_kind(n), bin_bit(n);
  std::vector<uint16_t> bin_rank(n, 0);  // entry index within the run (pass 1)
  std::vector<uint32_t> esc_idx;
  std::vector<uint16_t> esc_val;
  std::vector<uint32_t> dk_d(ns * ud), dk_s(ns * us);
  std::vector<uint16_t> coo_cnt(ns * sup_u, 0);
  std::vector<uint16_t> coo_slot, coo_ones, coo_tot;
  coo_slot.reserve(n / 4);
  std::vector<uint32_t> slot_d(PriorModel::kNumDualKeys), slot_s(PriorModel::kNumSigKeys);
  std::vector<uint32_t> cell_ep(U, ~0u);      // last sub-batch touching slot
  std::vector<uint32_t> cell_at(U);           // slot -> index into this sub's COO run
  std::vector<uint32_t> cnt;                  // counting-sort histogram by tot
  std::vector<uint16_t> rank_of, tmp16;
  uint32_t max_run = 1;
  for (uint64_t s = 0; s < ns; ++s) {
    for (uint32_t j = 0; j < ud; ++j)
      dk_d[s * ud + j] = j < keys_d[s].size() ? keys_d[s][j]
                                              : n_dual_ext + (j - uint32_t(keys_d[s].size()));
    for (uint32_t j = 0; j < us; ++j)
      dk_s[s * us + j] = j < keys_s[s].size() ? keys_s[s][j]
                                              : uint32_t(PriorModel::kNumSigKeys) +
                                                    (j - uint32_t(keys_s[s].size()));
    for (uint32_t j = 0; j < keys_d[s].size(); ++j) slot_d[keys_d[s][j]] = j;
    for (uint32_t j = 0; j < keys_s[s].size(); ++j) slot_s[keys_s[s][j]] = j;
    const uint64_t lo = s * span, hi = std::min<uint64_t>((s + 1) * span, n);
    for (uint64_t b0 = lo; b0 < hi; b0 += batch) {
      const uint32_t subg = uint32_t(b0 / batch);  // global sub-batch index
      const size_t run_base = coo_slot.size();
      const uint64_t b1 = std::min<uint64_t>(b0 + batch, hi);
      for (uint64_t i = b0; i < b1; ++i) {
        const Coded& c = trace[i];
        bin_kind[i] = c.kind;
        bin_bit[i] = c.bit;
        uint8_t pi = pidx_map[c.prior];
        prior_idx[i] = pi;
        if (pi == 255) {
          esc_idx.push_back(uint32_t(i));
          esc_val.push_back(c.prior);
        }
        if (c.kind == PriorModel::kKindPrior) continue;  // ext: no slot/update
        const uint32_t slot = c.kind == PriorModel::kKindSig ? ud + slot_s[c.key]
                                                             : slot_d[c.key];
        if (cell_ep[slot] != subg) {
          cell_ep[slot] = subg;
          cell_at[slot] = uint32_t(coo_slot.size());
          coo_slot.push_back(uint16_t(slot));
          coo_ones.push_back(0);
          coo_tot.push_back(0);
        }
        const uint32_t at = cell_at[slot];
        coo_ones[at] = uint16_t(coo_ones[at] + (c.bit ? 1 : 0));
        coo_tot[at] = uint16_t(coo_tot[at] + 1);
        bin_rank[i] = uint16_t(at - run_base);
      }
      // Order the run by descending total (stable: ties keep first-touch
      // order) so hot slots get small ranks; remap bins to ranks. Counting
      // sort: totals are <= batch, so an O(len) histogram pass replaces the
      // comparison sort that dominated the export (measured ~30% of the
      // whole analyze path at batch 4096).
      const uint32_t len = uint32_t(coo_slot.size() - run_base);
      coo_cnt[subg] = uint16_t(len);
      max_run = std::max(max_run, len);
      uint32_t max_tot = 0;
      for (uint32_t j = 0; j < len; ++j)
        max_tot = std::max<uint32_t>(max_tot, coo_tot[run_base + j]);
      cnt.assign(max_tot + 1, 0);
      for (uint32_t j = 0; j < len; ++j) ++cnt[coo_tot[run_base + j]];
      uint32_t acc = 0;  // cnt[t] -> first rank for totals == t (descending)
      for (uint32_t t = max_tot; t > 0; --t) {
        uint32_t c = cnt[t];
        cnt[t] = acc;
        acc += c;
      }
      rank_of.resize(len);
      for (uint32_t j = 0; j < len; ++j)
        rank_of[j] = uint16_t(cnt[coo_tot[run_base + j]]++);
      for (uint64_t i = b0; i < b1; ++i)
        if (trace[i].kind != PriorModel::kKindPrior) bin_rank[i] = rank_of[bin_rank[i]];
      for (uint16_t* arr : {coo_slot.data(), coo_ones.data(), coo_tot.data()}) {
        tmp16.assign(arr + run_base, arr + run_base + len);
        for (uint32_t j = 0; j < len; ++j) arr[run_base + rank_of[j]] = tmp16[j];
      }
    }
  }

  // Hot-rank width: sweep wa for minimum substream bytes (ranks >= 2^wa pay
  // the full wb bits via the cold stream).
  const uint32_t wb = ceil_log2(std::max(max_run, 2u));
  std::vector<uint64_t> rank_hist(max_run, 0);
  uint64_t live_total = 0;
  for (uint64_t i = 0; i < n; ++i)
    if (bin_kind[i] != PriorModel::kKindPrior) { ++live_total; ++rank_hist[bin_rank[i]]; }
  for (size_t i = 1; i < rank_hist.size(); ++i) rank_hist[i] += rank_hist[i - 1];
  uint32_t wa = wb;
  uint64_t best_cost = ~0ull;
  for (uint32_t cand = 1; cand <= wb; ++cand) {
    const uint64_t hot = (1ull << cand) >= max_run ? live_total
                                                   : rank_hist[(1ull << cand) - 1];
    // Cost in no-straddle WORDS (the wire's real unit under put_ns).
    const uint64_t cost =
        BitPacker::ns_words(hot, cand) + BitPacker::ns_words(live_total - hot, wb);
    if (cost < best_cost) { best_cost = cost; wa = cand; }
  }

  // Rank + COO-slot streams pack no-straddle (put_ns): the device unpacks
  // each entry with ONE word gather (ops/model_pass unpack_routed/_unpack_dev).
  BitPacker hp, ap, bp, cp;
  uint64_t nA = 0, nB = 0;
  for (uint64_t i = 0; i < n; ++i) {
    const uint32_t k = bin_kind[i];
    const bool cold = k != PriorModel::kKindPrior && bin_rank[i] >= (1u << wa);
    hp.put((uint32_t(bin_bit[i]) << 3) | (k << 1) | (cold ? 1 : 0), 4);
    if (k == PriorModel::kKindPrior) continue;
    if (cold) { bp.put_ns(bin_rank[i], wb); ++nB; } else { ap.put_ns(bin_rank[i], wa); ++nA; }
  }
  hp.finish(); ap.finish(); bp.finish();
  const uint32_t wcs = ceil_log2(std::max(U, 2u));
  for (uint16_t v : coo_slot) cp.put_ns(v, wcs);
  cp.finish();

  w.u64(n);
  w.u32(uint32_t(ns));
  w.u32(ud);
  w.u32(us);
  w.u64(m);
  w.u8((has_probs ? 1 : 0) | (share_dual0 ? 2 : 0) | (share_sig0 ? 4 : 0));
  w.u16(uint16_t(dict.size()));
  w.bytes(reinterpret_cast<const uint8_t*>(dict.data()), dict.size() * 2);
  w.u32(uint32_t(esc_idx.size()));
  w.bytes(reinterpret_cast<const uint8_t*>(esc_idx.data()), esc_idx.size() * 4);
  w.bytes(reinterpret_cast<const uint8_t*>(esc_val.data()), esc_val.size() * 2);
  w.u8(uint8_t(wa));
  w.u8(uint8_t(wb));
  w.u8(uint8_t(wcs));
  w.u64(hp.words.size());
  w.bytes(reinterpret_cast<const uint8_t*>(hp.words.data()), hp.words.size() * 4);
  w.u64(nA);
  w.u64(ap.words.size());
  w.bytes(reinterpret_cast<const uint8_t*>(ap.words.data()), ap.words.size() * 4);
  w.u64(nB);
  w.u64(bp.words.size());
  w.bytes(reinterpret_cast<const uint8_t*>(bp.words.data()), bp.words.size() * 4);
  w.bytes(prior_idx.data(), prior_idx.size());
  w.bytes(reinterpret_cast<const uint8_t*>(dk_d.data()), dk_d.size() * 4);
  w.bytes(reinterpret_cast<const uint8_t*>(dk_s.data()), dk_s.size() * 4);
  if (!share_dual0) {
    // ANL5: the dual table rows are massively redundant (the CABAC-init seed
    // has ~90 distinct (fp,fn,sp,sn) patterns; even a warm snapshot's top 255
    // rows cover ~99%) — ship a u8 row-dictionary + exact escape rows
    // instead of 8 dense bytes per row (1.42 MB -> ~0.2 MB per table).
    std::vector<uint64_t> rowv(dual0.size());
    for (size_t i = 0; i < dual0.size(); ++i) {
      const Dual& d = dual0[i];
      rowv[i] = uint64_t(d.fp) | (uint64_t(d.fn) << 16) | (uint64_t(d.sp) << 32) |
                (uint64_t(d.sn) << 48);
    }
    std::unordered_map<uint64_t, uint32_t> cnt;
    cnt.reserve(dual0.size() / 16);
    for (uint64_t v : rowv) ++cnt[v];
    std::vector<std::pair<uint32_t, uint64_t>> by_freq;
    by_freq.reserve(cnt.size());
    for (const auto& kv : cnt) by_freq.push_back({kv.second, kv.first});
    size_t nd = std::min<size_t>(by_freq.size(), 255);
    std::partial_sort(by_freq.begin(), by_freq.begin() + nd, by_freq.end(),
                      [](const auto& a, const auto& b) { return a.first > b.first; });
    std::unordered_map<uint64_t, uint8_t> ridx;
    w.u16(uint16_t(nd));
    for (size_t j = 0; j < nd; ++j) {
      ridx[by_freq[j].second] = uint8_t(j);
      uint64_t v = by_freq[j].second;
      w.u16(uint16_t(v));
      w.u16(uint16_t(v >> 16));
      w.u16(uint16_t(v >> 32));
      w.u16(uint16_t(v >> 48));
    }
    std::vector<uint32_t> desc_idx;
    for (size_t i = 0; i < rowv.size(); ++i) {
      auto it = ridx.find(rowv[i]);
      w.u8(it != ridx.end() ? it->second : 255);
      if (it == ridx.end()) desc_idx.push_back(uint32_t(i));
    }
    w.u32(uint32_t(desc_idx.size()));
    for (uint32_t i : desc_idx) w.u32(i);
    for (uint32_t i : desc_idx) {
      w.u16(dual0[i].fp);
      w.u16(dual0[i].fn);
      w.u16(dual0[i].sp);
      w.u16(dual0[i].sn);
    }
  }
  if (!share_sig0) write_sig0_sparse(w, sig0);
  w.u64(coo_slot.size());
  w.bytes(reinterpret_cast<const uint8_t*>(coo_cnt.data()), coo_cnt.size() * 2);
  w.u64(cp.words.size());
  w.bytes(reinterpret_cast<const uint8_t*>(cp.words.data()), cp.words.size() * 4);
  // ANL5: (ones, tot) travel as a 4+4-bit nibble pair (97% of sub-batch cell
  // counts are < 15) plus an exact escape list the device scatter-applies
  // after widening; anything >= 15 in either half escapes.
  {
    std::vector<uint8_t> nib(coo_slot.size());
    std::vector<uint32_t> cesc_idx;
    std::vector<uint16_t> cesc_ones, cesc_tot;
    for (size_t i = 0; i < coo_slot.size(); ++i) {
      uint16_t o = coo_ones[i], t = coo_tot[i];
      nib[i] = uint8_t((o > 15 ? 15 : o) | ((t > 15 ? 15 : t) << 4));
      if (o > 15 || t > 15) {
        cesc_idx.push_back(uint32_t(i));
        cesc_ones.push_back(o);
        cesc_tot.push_back(t);
      }
    }
    w.bytes(nib.data(), nib.size());
    w.u32(uint32_t(cesc_idx.size()));
    w.bytes(reinterpret_cast<const uint8_t*>(cesc_idx.data()), cesc_idx.size() * 4);
    w.bytes(reinterpret_cast<const uint8_t*>(cesc_ones.data()), cesc_ones.size() * 2);
    w.bytes(reinterpret_cast<const uint8_t*>(cesc_tot.data()), cesc_tot.size() * 2);
  }
  if (has_probs)
    w.bytes(reinterpret_cast<const uint8_t*>(probs.data()), probs.size() * 2);
}

static void write_analyze_header(artc::Writer& w, const ArtcSession* se, uint32_t sup_u,
                                 bool slim) {
  using namespace artc;
  w.u32(slim ? 0x354c4e41 : 0x5a4c4e41);  // 'ANL5' : 'ANLZ'
  w.u32(uint32_t(se->st.n_chunks));
  w.u32(uint32_t(se->opt.lanes));
  w.u32(se->opt.batch_size ? se->opt.batch_size : 1);
  w.u32(uint32_t(se->opt.model_profile));
  w.u32(uint32_t(PriorModel::kNumDualKeys));
  w.u32(uint32_t(PriorModel::kNumSigKeys));
  w.u32(uint32_t(PriorModel::kFastWindow));
  w.u32(uint32_t(PriorModel::kSlowWindow));
  w.u32(uint32_t(PriorModel::kWindowSig));
  // low 16 bits: on-mode alpha; high 16: off-mode alpha (prior bit 15
  // selects per bin — see PriorModel::kPriorOffTag). The off weight is the
  // session's probe-chosen per-file value (v18).
  w.u32(uint32_t(PriorModel::kSigMixAlpha) |
        ((se->alpha_off ? se->alpha_off : PriorModel::kSigMixAlphaOff) << 16));
  w.u32(sup_u);
}

// Starts the streaming (slim/ANL5) analyze: spawns background workers that
// walk + export chunks in parallel. Returns the chunk count, or -1.
// flags bit1 = also export host-computed probs (differential testing).
int artc_session_analyze_begin(void* h, int sup, int flags) {
  using namespace artc;
  auto* se = static_cast<ArtcSession*>(h);
  try {
    if (!session_ready(se)) return -1;
    if (se->opt.model_profile != 2)
      throw std::runtime_error("slim analysis requires model_profile=2 (frozen batches)");
    const uint32_t sup_u = sup > 0 ? uint32_t(sup) : 16;
    const bool want_probs = (flags & 2) != 0;
    se->astate.reset(new AnalyzeState);
    AnalyzeState* as = se->astate.get();
    {
      Writer w;
      write_analyze_header(w, se, sup_u, /*slim=*/true);
      as->header = std::move(w.buf);
    }
    const size_t n_chunks = se->ranges.size();
    as->bufs.resize(n_chunks);
    as->status.assign(n_chunks, 0);
    auto work = [se, as, sup_u, want_probs] {
      using namespace artc;
      for (size_t ci; (ci = as->next.fetch_add(1)) < se->ranges.size();) {
        try {
          // Chunk 0's walk is usually pre-produced by the session opener's
          // pipe (started mid-pass1). Consume the pre-rendered export when
          // the request matches it; otherwise re-render the export from the
          // stored (sup-independent) walk products.
          if (ci == 0 && !want_probs) {
            // want_probs cannot consume the pre-produce: its trace-only walk
            // records no probability stream (fall through to a full re-run).
            std::unique_lock<std::mutex> sl(se->smu);
            if (se->c0_state >= 1) {
              se->scv.wait(sl, [&] { return se->c0_state >= 2; });
              if (se->c0_state == 2) {
                std::vector<uint8_t> buf;
                if (se->c0_sup == sup_u) {
                  buf = std::move(se->c0_buf);
                } else {
                  auto trace = std::move(se->c0_trace);
                  auto probs = std::move(se->c0_probs);
                  auto dual0 = std::move(se->c0_dual0);
                  auto sig0 = std::move(se->c0_sig0);
                  sl.unlock();
                  double t0 = timing_enabled() ? now_s() : 0;
                  Writer cw;
                  write_slim_chunk(cw, trace, probs, /*has_probs=*/false, dual0,
                                   sig0, se->opt.batch_size ? se->opt.batch_size : 1,
                                   sup_u, false, false);
                  if (timing_enabled())
                    fprintf(stderr,
                            "[artc] analyze chunk 0: slim export %.3fs (re-render: "
                            "sup %u != pre-produced %u)\n",
                            now_s() - t0, sup_u, se->c0_sup);
                  buf = std::move(cw.buf);
                  sl.lock();
                }
                se->c0_state = 0;  // consumed
                se->c0_buf.clear();
                se->c0_trace.clear();
                se->c0_trace.shrink_to_fit();
                se->c0_probs.clear();
                se->c0_probs.shrink_to_fit();
                se->c0_dual0.clear();
                se->c0_sig0.clear();
                sl.unlock();
                std::lock_guard<std::mutex> lock(as->mu);
                as->bufs[0] = std::move(buf);
                as->status[0] = 1;
                as->cv.notify_all();
                continue;
              }
              // pre-produce failed: fall through and re-run for the error
            }
          }
          auto [b, e] = se->ranges[ci];
          std::vector<PriorModel::Coded> trace;
          std::vector<uint16_t> probs;
          std::vector<Dual> dual0;
          std::vector<Estimator> sig0;
          Stats tmp;
          double t0 = timing_enabled() ? now_s() : 0;
          run_chunk_model(se->p1.slices, b, e, se->opt, tmp, &trace, &probs, &dual0,
                          se->nz_modes[ci], /*encode_blob=*/false,
                          ci == 0 && se->warm_slices ? &se->warm : nullptr,
                          ci > 0 && se->warm_slices ? &se->warm : nullptr, &sig0,
                          se->alpha_off, /*trace_only=*/!want_probs);
          if (timing_enabled())
            fprintf(stderr, "[artc] analyze chunk %zu: trace walk %.3fs (%zu bins)\n",
                    ci, now_s() - t0, trace.size());
          t0 = timing_enabled() ? now_s() : 0;
          // All warm chunks start from the same v16 snapshot: chunks >= 2
          // reference chunk 1's dual0/sig0 instead of re-shipping them.
          const bool share = ci >= 2 && se->warm_slices > 0;
          Writer cw;
          write_slim_chunk(cw, trace, probs, want_probs, dual0, sig0,
                           se->opt.batch_size ? se->opt.batch_size : 1, sup_u,
                           share, share);
          if (timing_enabled())
            fprintf(stderr, "[artc] analyze chunk %zu: slim export %.3fs\n",
                    ci, now_s() - t0);
          std::lock_guard<std::mutex> lock(as->mu);
          as->bufs[ci] = std::move(cw.buf);
          as->status[ci] = 1;
          as->cv.notify_all();
        } catch (const std::exception& e) {
          std::lock_guard<std::mutex> lock(as->mu);
          as->err = e.what();
          as->status[ci] = 2;
          as->cv.notify_all();
        }
      }
    };
    const unsigned n_workers =
        std::max(1u, std::min<unsigned>(std::thread::hardware_concurrency(),
                                        unsigned(n_chunks)));
    for (unsigned t = 0; t < n_workers; ++t) as->workers.emplace_back(work);
    return int(n_chunks);
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

int artc_session_analyze_header(void* h, uint8_t** out, size_t* out_len) {
  auto* se = static_cast<ArtcSession*>(h);
  if (!se->astate) {
    g_error = "artc_session_analyze_begin not called";
    return -1;
  }
  const auto& hdr = se->astate->header;
  *out = static_cast<uint8_t*>(malloc(hdr.size()));
  memcpy(*out, hdr.data(), hdr.size());
  *out_len = hdr.size();
  return 0;
}

// Blocks until chunk idx's export is ready, then hands it over (the internal
// copy is released — each chunk can be fetched once).
int artc_session_analyze_chunk(void* h, uint32_t idx, uint8_t** out, size_t* out_len) {
  auto* se = static_cast<ArtcSession*>(h);
  AnalyzeState* as = se->astate.get();
  if (!as || idx >= as->bufs.size()) {
    g_error = "bad analyze chunk index";
    return -1;
  }
  std::vector<uint8_t> buf;
  {
    std::unique_lock<std::mutex> lock(as->mu);
    as->cv.wait(lock, [&] { return as->status[idx] != 0; });
    if (as->status[idx] == 2) {
      g_error = as->err;
      return -1;
    }
    buf = std::move(as->bufs[idx]);
  }
  *out = static_cast<uint8_t*>(malloc(buf.size()));
  memcpy(*out, buf.data(), buf.size());
  *out_len = buf.size();
  return 0;
}

int artc_session_analyze2(void* h, int sup, int flags, uint8_t** out, size_t* out_len) {
  using namespace artc;
  auto* se = static_cast<ArtcSession*>(h);
  try {
    if (!session_ready(se)) return -1;
    const Options& opt = se->opt;
    const Pass1& p1 = se->p1;
    const auto& ranges = se->ranges;
    const bool slim = (flags & 1) != 0;
    const bool want_probs = (flags & 2) != 0 || !slim;
    uint32_t sup_u = sup > 0 ? uint32_t(sup) : 16;
    if (slim) {
      // One-shot collection over the streaming machinery (same bytes as the
      // per-chunk fetch path: header ++ chunk0 ++ chunk1 ++ ...).
      const int n_chunks = artc_session_analyze_begin(h, sup, want_probs ? 2 : 0);
      if (n_chunks < 0) return -1;
      AnalyzeState* as = se->astate.get();
      Writer w;
      w.bytes(as->header.data(), as->header.size());
      for (int ci = 0; ci < n_chunks; ++ci) {
        std::unique_lock<std::mutex> lock(as->mu);
        as->cv.wait(lock, [&] { return as->status[ci] != 0; });
        if (as->status[ci] == 2) {
          g_error = as->err;
          return -1;
        }
        w.bytes(as->bufs[ci].data(), as->bufs[ci].size());
        std::vector<uint8_t>().swap(as->bufs[ci]);
      }
      *out = static_cast<uint8_t*>(malloc(w.buf.size()));
      memcpy(*out, w.buf.data(), w.buf.size());
      *out_len = w.buf.size();
      return 0;
    }
    Writer w;
    write_analyze_header(w, se, sup_u, /*slim=*/false);
    WarmCtx warm;
    warm.src_slices = se->warm_slices;
    for (size_t ci = 0; ci < ranges.size(); ++ci) {
      auto [b, e] = ranges[ci];
      std::vector<PriorModel::Coded> trace;
      std::vector<uint16_t> probs;
      std::vector<Dual> dual0;
      std::vector<Estimator> sig0;
      Stats tmp;
      uint64_t modes = se->nz_modes[ci];
      double t0 = timing_enabled() ? now_s() : 0;
      run_chunk_model(p1.slices, b, e, opt, tmp, &trace, &probs, &dual0, modes,
                      /*encode_blob=*/false,
                      ci == 0 && warm.src_slices ? &warm : nullptr,
                      ci > 0 && warm.src_slices ? &warm : nullptr, &sig0,
                      se->alpha_off);
      if (timing_enabled())
        fprintf(stderr, "[artc] analyze chunk %zu: trace walk %.3fs (%zu bins)\n",
                ci, now_s() - t0, trace.size());
      t0 = timing_enabled() ? now_s() : 0;
      w.u64(trace.size());
      for (const auto& c : trace) w.u8(c.bit);
      for (const auto& c : trace) w.u8(c.kind);
      for (const auto& c : trace) w.u32(c.key);
      for (const auto& c : trace) w.u16(c.prior);
      // Within-batch per-key exclusive prefix counts (ones, total). One tight
      // pass with epoch-tagged counters; kinds 0/1 share the Dual key space.
      {
        uint32_t batch = opt.batch_size ? opt.batch_size : 1;
        std::vector<uint32_t> ep_d(PriorModel::kNumDualKeys, ~0u);
        std::vector<uint32_t> ep_s(PriorModel::kNumSigKeys, ~0u);
        std::vector<uint16_t> d1(PriorModel::kNumDualKeys), dt(PriorModel::kNumDualKeys);
        std::vector<uint16_t> s1(PriorModel::kNumSigKeys), st2(PriorModel::kNumSigKeys);
        std::vector<uint16_t> pre1(trace.size()), pret(trace.size());
        for (size_t i = 0; i < trace.size(); ++i) {
          const auto& c = trace[i];
          if (c.kind == PriorModel::kKindPrior) continue;  // pre stays 0
          uint32_t bidx = uint32_t(i / batch);
          bool is_sig = c.kind == PriorModel::kKindSig;
          auto& ep = is_sig ? ep_s : ep_d;
          auto& c1 = is_sig ? s1 : d1;
          auto& ct = is_sig ? st2 : dt;
          if (ep[c.key] != bidx) {
            ep[c.key] = bidx;
            c1[c.key] = 0;
            ct[c.key] = 0;
          }
          pre1[i] = c1[c.key];
          pret[i] = ct[c.key];
          c1[c.key] = uint16_t(c1[c.key] + (c.bit ? 1 : 0));
          ct[c.key] = uint16_t(ct[c.key] + 1);
        }
        for (uint16_t v : pre1) w.u16(v);
        for (uint16_t v : pret) w.u16(v);
      }
      if (timing_enabled()) {
        fprintf(stderr, "[artc] analyze chunk %zu: streams+prefix %.3fs\n", ci, now_s() - t0);
        t0 = now_s();
      }
      for (uint16_t p : probs) w.u16(p);
      for (const auto& d : dual0) {
        w.u16(d.fp);
        w.u16(d.fn);
        w.u16(d.sp);
        w.u16(d.sn);
      }
      write_sig0_sparse(w, sig0);
      // ---- model_pass_v2 tables: per-super-step sorted-unique dicts,
      // per-bin dict indices, per-sub-batch per-entry (ones, total) deltas.
      {
        uint32_t batch = opt.batch_size ? opt.batch_size : 1;
        uint64_t span = uint64_t(sup_u) * batch;
        uint64_t ns = bucket_steps(uint32_t((trace.size() + span - 1) / span));
        if (ns == 0) ns = 1;
        uint64_t m = ns * span;
        uint32_t n_dual_ext = uint32_t(PriorModel::kNumDualKeys) + 1;
        // Phase 1: per-step unique key lists (epoch-tagged "seen" arrays).
        std::vector<uint32_t> ep_d(PriorModel::kNumDualKeys, ~0u);
        std::vector<uint32_t> ep_s(PriorModel::kNumSigKeys, ~0u);
        std::vector<std::vector<uint32_t>> keys_d(ns), keys_s(ns);
        for (uint64_t i = 0; i < trace.size(); ++i) {
          const auto& c = trace[i];
          if (c.kind == PriorModel::kKindPrior) continue;
          uint32_t stp = uint32_t(i / span);
          if (c.kind == PriorModel::kKindSig) {
            if (ep_s[c.key] != stp) { ep_s[c.key] = stp; keys_s[stp].push_back(c.key); }
          } else {
            if (ep_d[c.key] != stp) { ep_d[c.key] = stp; keys_d[stp].push_back(c.key); }
          }
        }
        uint32_t max_d = 1, max_s = 1;
        for (uint64_t s = 0; s < ns; ++s) {
          std::sort(keys_d[s].begin(), keys_d[s].end());
          std::sort(keys_s[s].begin(), keys_s[s].end());
          max_d = std::max<uint32_t>(max_d, uint32_t(keys_d[s].size()));
          max_s = std::max<uint32_t>(max_s, uint32_t(keys_s[s].size()));
        }
        uint32_t ud = bucket_pow2(max_d + 1), us = bucket_pow2(max_s + 1);
        // Phase 2: slot maps + per-bin indices + deltas.
        std::vector<uint32_t> slot_d(PriorModel::kNumDualKeys), slot_s(PriorModel::kNumSigKeys);
        std::vector<uint32_t> bin_u(m, ud - 1);  // ext/pad default
        std::vector<uint32_t> dk_d(ns * ud), dk_s(ns * us);
        std::vector<uint16_t> dd(ns * sup_u * uint64_t(ud) * 2, 0);
        std::vector<uint16_t> ds(ns * sup_u * uint64_t(us) * 2, 0);
        for (uint64_t s = 0; s < ns; ++s) {
          for (uint32_t j = 0; j < ud; ++j)
            dk_d[s * ud + j] = j < keys_d[s].size() ? keys_d[s][j]
                                                    : n_dual_ext + (j - uint32_t(keys_d[s].size()));
          for (uint32_t j = 0; j < us; ++j)
            dk_s[s * us + j] = j < keys_s[s].size() ? keys_s[s][j]
                                                    : uint32_t(PriorModel::kNumSigKeys) +
                                                          (j - uint32_t(keys_s[s].size()));
          for (uint32_t j = 0; j < keys_d[s].size(); ++j) slot_d[keys_d[s][j]] = j;
          for (uint32_t j = 0; j < keys_s[s].size(); ++j) slot_s[keys_s[s][j]] = j;
          uint64_t lo = s * span, hi = std::min<uint64_t>((s + 1) * span, trace.size());
          for (uint64_t i = lo; i < hi; ++i) {
            const auto& c = trace[i];
            if (c.kind == PriorModel::kKindPrior) continue;
            uint32_t sub = uint32_t((i - lo) / batch);
            if (c.kind == PriorModel::kKindSig) {
              uint32_t sl = slot_s[c.key];
              bin_u[i] = ud + sl;
              uint16_t* cell = &ds[(((s * sup_u) + sub) * us + sl) * 2];
              cell[0] = uint16_t(cell[0] + (c.bit ? 1 : 0));
              cell[1] = uint16_t(cell[1] + 1);
            } else {
              uint32_t sl = slot_d[c.key];
              bin_u[i] = sl;
              uint16_t* cell = &dd[(((s * sup_u) + sub) * ud + sl) * 2];
              cell[0] = uint16_t(cell[0] + (c.bit ? 1 : 0));
              cell[1] = uint16_t(cell[1] + 1);
            }
          }
        }
        w.u32(uint32_t(ns));
        w.u32(ud);
        w.u32(us);
        w.u64(m);
        for (uint32_t v : bin_u) w.u32(v);
        for (uint32_t v : dk_d) w.u32(v);
        for (uint32_t v : dk_s) w.u32(v);
        for (uint16_t v : dd) w.u16(v);
        for (uint16_t v : ds) w.u16(v);
      }
      if (timing_enabled())
        fprintf(stderr, "[artc] analyze chunk %zu: v2 dicts+serialize %.3fs\n", ci, now_s() - t0);
    }
    *out = static_cast<uint8_t*>(malloc(w.buf.size()));
    memcpy(*out, w.buf.data(), w.buf.size());
    *out_len = w.buf.size();
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

int artc_session_analyze(void* h, int sup, uint8_t** out, size_t* out_len) {
  return artc_session_analyze2(h, sup, 0, out, out_len);
}

// Packs the container from caller-provided chunk blobs using the session's
// pass1/nz-mode state (no recomputation).
int artc_session_pack(void* h, const uint8_t* blob_data, const uint64_t* blob_lens,
                      int n_blobs, uint8_t** out, size_t* out_len, ArtcStats* stats) {
  using namespace artc;
  auto* se = static_cast<ArtcSession*>(h);
  try {
    if (!session_ready(se)) return -1;
    if (n_blobs != se->st.n_chunks) {
      g_error = "blob count != chunk count";
      return -1;
    }
    Stats st = se->st;  // copy: pack may run more than once per session
    std::vector<std::vector<uint8_t>> blobs(n_blobs);
    size_t off = 0;
    for (int i = 0; i < n_blobs; ++i) {
      blobs[i].assign(blob_data + off, blob_data + off + blob_lens[i]);
      off += blob_lens[i];
      st.recoded_bytes += blob_lens[i];
    }
    auto v = finalize_container(se->data.data(), se->data.size(), se->p1, blobs,
                                se->nz_modes, se->opt, st, se->warm_slices,
                                se->alpha_off);
    *out = static_cast<uint8_t*>(malloc(v.size()));
    memcpy(*out, v.data(), v.size());
    *out_len = v.size();
    fill_stats(st, stats);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

// One-shot analysis export (opens and closes a session internally).
int artc_analyze(const uint8_t* data, size_t size, int lanes, int chunk_mode,
                 uint32_t batch_size, int model_profile, int sup, uint8_t** out,
                 size_t* out_len) {
  void* h = artc_session_open(data, size, lanes, chunk_mode, batch_size, model_profile);
  if (!h) return -1;
  int rc = artc_session_analyze2(h, sup, 0, out, out_len);
  artc_session_close(h);
  return rc;
}

// Assembles a full container using caller-provided chunk blobs (the device
// path's rANS output). blob_lens has n_blobs entries into blob_data.
int artc_compress_external(const uint8_t* data, size_t size, int lanes, int chunk_mode,
                           uint32_t batch_size, int model_profile, const uint8_t* blob_data,
                           const uint64_t* blob_lens, int n_blobs, uint8_t** out,
                           size_t* out_len, ArtcStats* stats) {
  using namespace artc;
  try {
    Options opt;
    opt.lanes = lanes > 0 ? lanes : 16;
    opt.chunk_mode = chunk_mode;
    opt.batch_size = batch_size;
    opt.model_profile = model_profile;
    Stats st;
    Pass1 p1;
    run_pass1(data, size, opt, st, &p1);
    if (n_blobs != st.n_chunks) {
      g_error = "blob count != chunk count";
      return -1;
    }
    std::vector<std::vector<uint8_t>> blobs(n_blobs);
    size_t off = 0;
    for (int i = 0; i < n_blobs; ++i) {
      blobs[i].assign(blob_data + off, blob_data + off + blob_lens[i]);
      off += blob_lens[i];
      st.recoded_bytes += blob_lens[i];
    }
    std::vector<std::pair<size_t, size_t>> ranges2;
    chunk_ranges(p1.slices, st.n_chunks, &ranges2);
    std::vector<uint64_t> nz_modes;
    bool share2 = opt.chunk_mode == 0 && ranges2.size() > 1;
    uint32_t alpha2 = PriorModel::kSigMixAlphaOff;
    for (auto [b, e] : ranges2)
      nz_modes.push_back(
          nz_modes.empty()
              ? pick_nz_modes(p1.slices, b, e, opt, 0, &alpha2)
              : (share2 ? nz_modes[0]
                        : pick_nz_modes(p1.slices, b, e, opt, alpha2, nullptr)));
    auto v = finalize_container(data, size, p1, blobs, nz_modes, opt, st,
                                pick_warm_slices(p1.slices, ranges2), alpha2);
    *out = static_cast<uint8_t*>(malloc(v.size()));
    memcpy(*out, v.data(), v.size());
    *out_len = v.size();
    fill_stats(st, stats);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return -1;
  }
}

}  // extern "C"
