// Test-corpus generator: encodes synthetic video with the system libx264 (via
// libavcodec) and muxes to MP4 / raw Annex-B. This stands in for the
// reference's gitignored corpus (reference README.md:47, .gitignore:7) — it
// produces *real* x264 CABAC/CAVLC streams so the recompressor is validated
// against genuine encoder output, not self-generated bitstreams.
//
// Usage: make_corpus <out.mp4|out.264> [key=val ...]
//   keys: w h frames crf qp preset profile bframes slices cabac(0/1) seed noise(0/1)
extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
}

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>

static void fill_frame(AVFrame* f, int idx, unsigned seed, bool noise) {
  const int w = f->width, h = f->height;
  const bool is10 = f->format == AV_PIX_FMT_YUV420P10LE || f->format == AV_PIX_FMT_YUV444P10LE;
  const bool is444 = f->format == AV_PIX_FMT_YUV444P || f->format == AV_PIX_FMT_YUV444P10LE;
  const bool gray = f->format == AV_PIX_FMT_GRAY8;
  auto put = [&](int plane, int x, int y, int v) {
    if (is10) ((uint16_t*)(f->data[plane] + y * f->linesize[plane]))[x] = (uint16_t)(v << 2 | (v & 3));
    else f->data[plane][y * f->linesize[plane] + x] = (uint8_t)v;
  };
  unsigned rng = seed * 2654435761u + idx * 40503u + 1;
  auto rnd = [&rng]() {
    rng = rng * 1664525u + 1013904223u;
    return (rng >> 16) & 0xff;
  };
  const int cw = gray ? 0 : (is444 ? w : w / 2);
  const int chh = gray ? 0 : (is444 ? h : (f->format == AV_PIX_FMT_YUV422P ? h : h / 2));
  if (noise) {
    // Pure random frames: maximal intra cost, forces I_PCM macroblocks at
    // very low QP (x264 picks PCM when coded bits would exceed raw size).
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) put(0, x, y, rnd());
    for (int y = 0; y < chh; ++y)
      for (int x = 0; x < cw; ++x) {
        put(1, x, y, rnd());
        put(2, x, y, rnd());
      }
    return;
  }
  // Moving diagonal gradient + blocky texture + noise band: produces a healthy
  // mix of intra modes, residual energy, and motion for P/B frames.
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int v = ((x + idx * 3) ^ (y + idx)) & 0xff;
      int g = (x * 255 / w + y * 255 / h + idx * 5) & 0xff;
      int px = (v / 3 + g * 2 / 3);
      if (y >= h / 2 && y < h / 2 + 16) px = (px + rnd()) / 2;  // noise band
      if (((x >> 4) + (y >> 4) + (idx >> 2)) % 7 == 0) px = 235;  // moving blocks
      put(0, x, y, px);
    }
  for (int y = 0; y < chh; ++y)
    for (int x = 0; x < cw; ++x) {
      put(1, x, y, (x * 2 + idx * 7) & 0xff);
      put(2, x, y, (y * 2 + idx * 3) & 0xff);
    }
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s out.(mp4|264) [key=val...]\n", argv[0]);
    return 2;
  }
  std::map<std::string, std::string> kv = {
      {"w", "320"},      {"h", "240"},     {"frames", "30"}, {"crf", ""},
      {"qp", "26"},      {"preset", "medium"}, {"profile", "high"},
      {"bframes", "2"},  {"slices", "1"},  {"cabac", "1"},   {"seed", "1"},
      {"gop", "10"},     {"raw", ""},    {"noise", "0"},    {"xparams", ""},  {"pixfmt", "420"},
      {"frag", "0"},  // 1 = fragmented MP4 (DASH/CMAF-style moof/trun runs)
  };
  for (int i = 2; i < argc; ++i) {
    std::string a = argv[i];
    auto eq = a.find('=');
    if (eq == std::string::npos) { fprintf(stderr, "bad arg %s\n", a.c_str()); return 2; }
    kv[a.substr(0, eq)] = a.substr(eq + 1);
  }
  const char* outfile = argv[1];
  bool annexb = strstr(outfile, ".264") != nullptr;

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) { fprintf(stderr, "no libx264\n"); return 1; }
  AVCodecContext* c = avcodec_alloc_context3(codec);
  c->width = atoi(kv["w"].c_str());
  c->height = atoi(kv["h"].c_str());
  c->time_base = {1, 25};
  c->framerate = {25, 1};
  bool is422 = kv["pixfmt"] == "422";
  bool is10 = kv["pixfmt"] == "420p10";
  bool is444 = kv["pixfmt"] == "444";
  bool gray = kv["pixfmt"] == "400";
  bool is44410 = kv["pixfmt"] == "444p10";
  c->pix_fmt = gray ? AV_PIX_FMT_GRAY8
               : is44410 ? AV_PIX_FMT_YUV444P10LE
               : is10 ? AV_PIX_FMT_YUV420P10LE
                      : is444 ? AV_PIX_FMT_YUV444P
                              : is422 ? AV_PIX_FMT_YUV422P : AV_PIX_FMT_YUV420P;
  c->gop_size = atoi(kv["gop"].c_str());
  c->max_b_frames = atoi(kv["bframes"].c_str());
  av_opt_set(c->priv_data, "preset", kv["preset"].c_str(), 0);
  av_opt_set(c->priv_data, "profile", kv["profile"].c_str(), 0);
  if (!kv["crf"].empty()) av_opt_set(c->priv_data, "crf", kv["crf"].c_str(), 0);
  else av_opt_set(c->priv_data, "qp", kv["qp"].c_str(), 0);
  std::string x264params = "slices=" + kv["slices"] + ":cabac=" + kv["cabac"];
  if (!kv["xparams"].empty()) x264params += ":" + kv["xparams"];
  av_opt_set(c->priv_data, "x264-params", x264params.c_str(), 0);

  // Container by extension: .264 = raw Annex-B, .mkv = Matroska,
  // .ts = MPEG-TS, everything else ISO-BMFF.
  const char* ofmt = annexb ? "h264"
                     : strstr(outfile, ".mkv") ? "matroska"
                     : strstr(outfile, ".ts") ? "mpegts"
                     : strstr(outfile, ".avi") ? "avi"
                     : strstr(outfile, ".mov") ? "mov"
                     : strstr(outfile, ".flv") ? "flv"
                     : strstr(outfile, ".mpg") ? "vob"
                                               : "mp4";
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, ofmt, outfile);
  if (!fmt) { fprintf(stderr, "mux alloc failed\n"); return 1; }
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER) c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(c, codec, nullptr) < 0) { fprintf(stderr, "open enc failed\n"); return 1; }

  AVStream* st = avformat_new_stream(fmt, nullptr);
  st->time_base = c->time_base;
  avcodec_parameters_from_context(st->codecpar, c);
  if (avio_open(&fmt->pb, outfile, AVIO_FLAG_WRITE) < 0) { fprintf(stderr, "avio open failed\n"); return 1; }
  AVDictionary* muxopts = nullptr;
  if (kv["frag"] == "1")
    av_dict_set(&muxopts, "movflags", "frag_keyframe+empty_moov+default_base_moof", 0);
  int whr = avformat_write_header(fmt, &muxopts);
  av_dict_free(&muxopts);
  if (whr < 0) { fprintf(stderr, "write header failed\n"); return 1; }

  AVFrame* frame = av_frame_alloc();
  frame->format = c->pix_fmt;
  frame->width = c->width;
  frame->height = c->height;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();
  int nframes = atoi(kv["frames"].c_str());
  unsigned seed = (unsigned)atoi(kv["seed"].c_str());

  auto drain = [&](AVCodecContext* cc) {
    while (true) {
      int r = avcodec_receive_packet(cc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { fprintf(stderr, "recv err\n"); exit(1); }
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  FILE* rawf = kv["raw"].empty() ? nullptr : fopen(kv["raw"].c_str(), "rb");
  for (int i = 0; i < nframes; ++i) {
    av_frame_make_writable(frame);
    if (rawf) {
      for (int y = 0; y < c->height; ++y)
        if (fread(frame->data[0] + y * frame->linesize[0], 1, c->width, rawf) != size_t(c->width)) { nframes = i; break; }
      for (int pl = 1; pl <= 2; ++pl)
        for (int y = 0; y < (is422 ? c->height : c->height / 2); ++y)
          if (fread(frame->data[pl] + y * frame->linesize[pl], 1, c->width / 2, rawf) != size_t(c->width / 2)) { nframes = i; break; }
      if (nframes == i) break;
    } else fill_frame(frame, i, seed, kv["noise"] == "1");
    frame->pts = i;
    if (avcodec_send_frame(c, frame) < 0) { fprintf(stderr, "send err\n"); return 1; }
    drain(c);
  }
  avcodec_send_frame(c, nullptr);
  drain(c);
  av_write_trailer(fmt);
  avio_closep(&fmt->pb);
  avcodec_free_context(&c);
  avformat_free_context(fmt);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  fprintf(stderr, "wrote %s\n", outfile);
  return 0;
}
