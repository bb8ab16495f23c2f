// Host-side audio decode for the MiCo-TPU data engine.
//
// Replaces the reference's torchaudio.load + Resample
// (reference: model/audioprocessor.py:34-37) with a native libavformat/
// libavcodec/libswresample pipeline: any container/codec (flac, wav, mp3,
// ogg, aac, ...) -> channel 0 -> float32 mono @ target sample rate.
//
// Channel selection matches Kaldi/torchaudio semantics (fbank consumes
// channel 0, not a downmix). Exposed as a C ABI for ctypes.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

// Append channel-0 samples of one decoded frame as float32.
bool append_channel0(const AVFrame* f, std::vector<float>* out) {
  const int n = f->nb_samples;
  const AVSampleFormat fmt = static_cast<AVSampleFormat>(f->format);
  const int nch = f->ch_layout.nb_channels;
  const bool planar = av_sample_fmt_is_planar(fmt);
  const uint8_t* p = f->data[0];
  const int stride = planar ? 1 : nch;

  auto push = [&](auto read) {
    for (int i = 0; i < n; i++) out->push_back(read(i * stride));
  };

  switch (av_get_packed_sample_fmt(fmt)) {
    case AV_SAMPLE_FMT_FLT:
      push([&](int i) { return reinterpret_cast<const float*>(p)[i]; });
      return true;
    case AV_SAMPLE_FMT_DBL:
      push([&](int i) {
        return static_cast<float>(reinterpret_cast<const double*>(p)[i]);
      });
      return true;
    case AV_SAMPLE_FMT_S16:
      push([&](int i) {
        return reinterpret_cast<const int16_t*>(p)[i] / 32768.0f;
      });
      return true;
    case AV_SAMPLE_FMT_S32:
      push([&](int i) {
        return reinterpret_cast<const int32_t*>(p)[i] / 2147483648.0f;
      });
      return true;
    case AV_SAMPLE_FMT_U8:
      push([&](int i) { return (p[i] - 128) / 128.0f; });
      return true;
    default:
      return false;
  }
}

// Resample mono float32 src_rate -> dst_rate with libswresample.
std::vector<float> resample_mono(const std::vector<float>& in, int src_rate,
                                 int dst_rate) {
  if (src_rate == dst_rate || in.empty()) return in;
  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, dst_rate, &mono,
                          AV_SAMPLE_FMT_FLT, src_rate, 0, nullptr) < 0 ||
      swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    return {};
  }
  const int64_t max_out =
      av_rescale_rnd(static_cast<int64_t>(in.size()) + 256, dst_rate, src_rate,
                     AV_ROUND_UP);
  std::vector<float> out(static_cast<size_t>(max_out));
  const uint8_t* in_ptr = reinterpret_cast<const uint8_t*>(in.data());
  uint8_t* out_ptr = reinterpret_cast<uint8_t*>(out.data());
  int got = swr_convert(swr, &out_ptr, static_cast<int>(max_out), &in_ptr,
                        static_cast<int>(in.size()));
  if (got < 0) got = 0;
  // flush
  uint8_t* tail_ptr = reinterpret_cast<uint8_t*>(out.data() + got);
  int tail = swr_convert(swr, &tail_ptr, static_cast<int>(max_out - got),
                         nullptr, 0);
  if (tail > 0) got += tail;
  swr_free(&swr);
  out.resize(static_cast<size_t>(got));
  return out;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out_data with mico_free().
int mico_decode_audio(const char* path, int target_sr, float** out_data,
                      int64_t* out_n, int* out_src_sr) {
  *out_data = nullptr;
  *out_n = 0;
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const AVCodec* codec = nullptr;
  int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (sidx < 0 || !codec) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, fmt->streams[sidx]->codecpar);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  std::vector<float> samples;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int rc = 0;
  auto drain = [&]() {
    while (avcodec_receive_frame(ctx, frame) == 0) {
      if (!append_channel0(frame, &samples)) rc = -5;
      av_frame_unref(frame);
    }
  };
  while (av_read_frame(fmt, pkt) >= 0 && rc == 0) {
    if (pkt->stream_index == sidx) {
      if (avcodec_send_packet(ctx, pkt) == 0) drain();
    }
    av_packet_unref(pkt);
  }
  if (rc == 0) {
    avcodec_send_packet(ctx, nullptr);  // flush decoder
    drain();
  }

  const int src_sr = ctx->sample_rate;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  if (rc != 0) return rc;

  std::vector<float> final_samples =
      (target_sr > 0) ? resample_mono(samples, src_sr, target_sr) : samples;
  float* buf =
      static_cast<float*>(malloc(final_samples.size() * sizeof(float)));
  if (!buf) return -6;
  memcpy(buf, final_samples.data(), final_samples.size() * sizeof(float));
  *out_data = buf;
  *out_n = static_cast<int64_t>(final_samples.size());
  *out_src_sr = src_sr;
  return 0;
}

void mico_free(float* p) { free(p); }

}  // extern "C"
