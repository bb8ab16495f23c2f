// Host-side video decode for the MiCo-TPU data engine.
//
// Replaces the reference's decord.VideoReader + get_batch
// (reference: model/videoprocessor.py:80-89, data/data/vision_mapper.py:139-149)
// with a native libavformat/libavcodec/libswscale pipeline: demux -> decode
// -> RGB24 scale, batched gather of arbitrary frame indices with
// keyframe-seek acceleration for sparse index sets.
//
// Exposed as a C ABI for ctypes:
//   mico_video_info(path, &n_frames, &width, &height)
//   mico_video_read_frames(path, indices, n, out_rgb24 /* n*h*w*3 */, w, h)
// Both return 0 on success, negative on failure.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;

  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      return -5;
    // One decode thread per context: the data-engine/serving thread pool
    // already parallelizes across items, so intra-item frame threading only
    // oversubscribes cores (measured 2.4x slower with 8 concurrent decodes
    // on a small host when left on auto).
    dec->thread_count = 1;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }
};

// Count frames: prefer the container's declared count; otherwise demux-count
// packets (no decode), the way decord builds its index.
int64_t count_frames(const char* path) {
  Demux d;
  if (d.open(path) != 0) return -1;
  AVStream* st = d.fmt->streams[d.stream];
  if (st->nb_frames > 0) return st->nb_frames;
  int64_t n = 0;
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream) n++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  return n;
}

// Gather state: sorted (frame_index, output_slot) worklist plus the sws
// scaler writing RGB24 into caller-provided memory.
struct Gather {
  std::vector<std::pair<int64_t, int32_t>> order;
  size_t next = 0;
  SwsContext* sws = nullptr;
  uint8_t* out;
  int32_t out_w, out_h;

  ~Gather() {
    if (sws) sws_freeContext(sws);
  }

  bool done() const { return next >= order.size(); }
  int64_t want() const { return order[next].first; }

  // Emit the decoded frame for every pending slot with index <= idx
  // (<= so a post-seek index-estimate overshoot still yields the nearest
  // frame instead of stalling).
  int emit(const AVFrame* f, int64_t idx) {
    if (!sws) {
      sws = sws_getContext(f->width, f->height,
                           static_cast<AVPixelFormat>(f->format), out_w,
                           out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                           nullptr, nullptr);
      if (!sws) return -8;
    }
    while (!done() && order[next].first <= idx) {
      uint8_t* dst =
          out + static_cast<size_t>(order[next].second) * out_h * out_w * 3;
      uint8_t* planes[1] = {dst};
      int strides[1] = {out_w * 3};
      sws_scale(sws, f->data, f->linesize, 0, f->height, planes, strides);
      next++;
    }
    return 0;
  }
};

}  // namespace

extern "C" {

int mico_video_info(const char* path, int64_t* n_frames, int32_t* width,
                    int32_t* height) {
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  *width = d.dec->width;
  *height = d.dec->height;
  AVStream* st = d.fmt->streams[d.stream];
  *n_frames = st->nb_frames > 0 ? st->nb_frames : count_frames(path);
  return *n_frames > 0 ? 0 : -7;
}

int mico_video_read_frames(const char* path, const int64_t* indices,
                           int32_t n_indices, uint8_t* out, int32_t out_w,
                           int32_t out_h) {
  if (n_indices <= 0) return 0;
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  AVStream* st = d.fmt->streams[d.stream];

  Gather g;
  g.out = out;
  g.out_w = out_w;
  g.out_h = out_h;
  g.order.resize(n_indices);
  for (int32_t i = 0; i < n_indices; i++) g.order[i] = {indices[i], i};
  std::sort(g.order.begin(), g.order.end());

  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const double fps = av_q2d(st->avg_frame_rate.num ? st->avg_frame_rate
                                                   : st->r_frame_rate);
  const double tb = av_q2d(st->time_base);
  int64_t decoded = -1;   // index of the last decoded frame; -2 = post-seek
  bool eof = false;
  rc = 0;

  while (!g.done() && rc == 0) {
    // seek when the next wanted frame is behind us or far ahead
    const int64_t want = g.want();
    if (!eof && fps > 0 && tb > 0 &&
        (want < decoded || (decoded >= 0 && want > decoded + 128) ||
         (decoded == -1 && want > 128))) {
      const int64_t ts = static_cast<int64_t>(want / fps / tb);
      if (av_seek_frame(d.fmt, d.stream, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
        avcodec_flush_buffers(d.dec);
        decoded = -2;
      }
    }

    // pull one packet (or flush at EOF) and drain the decoder
    if (!eof) {
      int r = av_read_frame(d.fmt, pkt);
      if (r < 0) {
        eof = true;
        avcodec_send_packet(d.dec, nullptr);
      } else {
        if (pkt->stream_index != d.stream) {
          av_packet_unref(pkt);
          continue;
        }
        int s = avcodec_send_packet(d.dec, pkt);
        av_packet_unref(pkt);
        if (s < 0 && s != AVERROR(EAGAIN)) rc = s;
      }
    }
    while (rc == 0 && avcodec_receive_frame(d.dec, frame) >= 0) {
      if (decoded == -2) {
        const int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                                ? frame->best_effort_timestamp
                                : frame->pts;
        decoded = (pts != AV_NOPTS_VALUE && fps > 0 && tb > 0)
                      ? static_cast<int64_t>(pts * tb * fps + 0.5) - 1
                      : -1;
      }
      decoded++;
      if (!g.done() && decoded >= g.want()) rc = g.emit(frame, decoded);
      if (g.done()) break;
    }
    if (eof && !g.done() && rc == 0) rc = -9;  // ran out of frames
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return g.done() ? 0 : (rc < 0 ? rc : -9);
}

}  // extern "C"
