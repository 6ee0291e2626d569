// deeplip_tpu native IO: batched WAV decode for the host data pipeline.
//
// The reference delegates wav decode to libsndfile through soundfile
// (models/audio_models/datasets.py:46-50) and hides its cost behind 32
// DataLoader worker processes. Here decode is a small C++ library driven
// from Python via ctypes: RIFF parsing, PCM 8/16/24/32 and float32 payloads,
// channel-0 extraction, sample-offset reads, and a threaded batch entry
// point so one call fills a whole training batch without the GIL.
//
// Build: make -C deeplip_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;     // byte offset of sample data
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;
  // walk chunks
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return false;
    if (memcmp(id, "fmt ", 4) == 0) {
      unsigned char buf[40];
      uint32_t n = size < sizeof(buf) ? size : (uint32_t)sizeof(buf);
      if (fread(buf, 1, n, f) != n) return false;
      if (size > n) fseek(f, size - n, SEEK_CUR);
      info->format = (uint16_t)(buf[0] | buf[1] << 8);
      info->channels = (uint16_t)(buf[2] | buf[3] << 8);
      info->rate = (uint32_t)(buf[4] | buf[5] << 8 | buf[6] << 16 | (uint32_t)buf[7] << 24);
      info->bits = (uint16_t)(buf[14] | buf[15] << 8);
      if (info->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        info->format = (uint16_t)(buf[24] | buf[25] << 8);
      }
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return info->format != 0 && info->channels > 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

inline float decode_sample(const unsigned char* p, uint16_t bits, uint16_t format) {
  if (format == 3) {  // float32
    float v;
    memcpy(&v, p, 4);
    return v;
  }
  switch (bits) {
    case 8:
      return ((int)p[0] - 128) / 128.0f;
    case 16: {
      int16_t v = (int16_t)(p[0] | p[1] << 8);
      return v / 32768.0f;
    }
    case 24: {
      int32_t v = (int32_t)(p[0] | p[1] << 8 | p[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      return v / 8388608.0f;
    }
    case 32: {
      int32_t v;
      memcpy(&v, p, 4);
      return v / 2147483648.0f;
    }
    default:
      return 0.0f;
  }
}

long read_one(const char* path, long start, long stop, float* out,
              long capacity, int* rate_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  const int bytes_per = info.bits / 8;
  const long frame_bytes = (long)bytes_per * info.channels;
  const long total_frames = info.data_bytes / frame_bytes;
  if (stop < 0 || stop > total_frames) stop = total_frames;
  if (start < 0) start = 0;
  if (start > stop) start = stop;
  long n = stop - start;
  if (n > capacity) n = capacity;
  if (rate_out) *rate_out = (int)info.rate;
  if (n <= 0) {
    fclose(f);
    return 0;
  }
  fseek(f, info.data_offset + start * frame_bytes, SEEK_SET);
  std::vector<unsigned char> buf((size_t)n * frame_bytes);
  long got = (long)fread(buf.data(), frame_bytes, (size_t)n, f);
  fclose(f);
  // channel 0 only (reference: y[:, 0])
  for (long i = 0; i < got; ++i) {
    out[i] = decode_sample(buf.data() + (size_t)i * frame_bytes, info.bits, info.format);
  }
  return got;
}

// int16 variant: PCM16 payloads are a straight channel-0 copy (no float
// round-trip), so a batch can ship host->device at half the bytes of f32 —
// the device converts with astype(f32)/32768. Other payload widths are
// scaled into int16.
long read_one_i16(const char* path, long start, long stop, int16_t* out,
                  long capacity, int* rate_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  const int bytes_per = info.bits / 8;
  const long frame_bytes = (long)bytes_per * info.channels;
  const long total_frames = info.data_bytes / frame_bytes;
  if (stop < 0 || stop > total_frames) stop = total_frames;
  if (start < 0) start = 0;
  if (start > stop) start = stop;
  long n = stop - start;
  if (n > capacity) n = capacity;
  if (rate_out) *rate_out = (int)info.rate;
  if (n <= 0) {
    fclose(f);
    return 0;
  }
  fseek(f, info.data_offset + start * frame_bytes, SEEK_SET);
  std::vector<unsigned char> buf((size_t)n * frame_bytes);
  long got = (long)fread(buf.data(), frame_bytes, (size_t)n, f);
  fclose(f);
  if (info.format == 1 && info.bits == 16) {
    if (info.channels == 1) {
      memcpy(out, buf.data(), (size_t)got * 2);
    } else {
      for (long i = 0; i < got; ++i) {
        memcpy(out + i, buf.data() + (size_t)i * frame_bytes, 2);
      }
    }
  } else {
    for (long i = 0; i < got; ++i) {
      float v = decode_sample(buf.data() + (size_t)i * frame_bytes, info.bits,
                              info.format);
      if (v > 0.999969f) v = 0.999969f;
      if (v < -1.0f) v = -1.0f;
      out[i] = (int16_t)(v * 32768.0f);
    }
  }
  return got;
}

}  // namespace

extern "C" {

// Single-file read: returns samples written (or <0 on error).
long dl_read_wav(const char* path, long start, long stop, float* out,
                 long capacity, int* rate_out) {
  return read_one(path, start, stop, out, capacity, rate_out);
}

// File info: frames into *n_frames; returns 0 ok / <0 error.
int dl_wav_info(const char* path, int* rate, int* channels, long* n_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  fclose(f);
  if (rate) *rate = (int)info.rate;
  if (channels) *channels = (int)info.channels;
  if (n_frames) *n_frames = info.data_bytes / ((info.bits / 8) * info.channels);
  return 0;
}

// Threaded batch read: n files into out + offsets[i], each with its own
// start/stop; lengths written into wrote[i]. GIL-free from ctypes.
void dl_read_wav_batch(const char** paths, const long* starts, const long* stops,
                       float* out, const long* offsets, const long* capacities,
                       long* wrote, int* rates, int n, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      wrote[i] = read_one(paths[i], starts[i], stops[i], out + offsets[i],
                          capacities[i], rates ? rates + i : nullptr);
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
}

// Threaded batch read into int16 (see read_one_i16).
void dl_read_wav_batch_i16(const char** paths, const long* starts,
                           const long* stops, int16_t* out,
                           const long* offsets, const long* capacities,
                           long* wrote, int* rates, int n, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      wrote[i] = read_one_i16(paths[i], starts[i], stops[i], out + offsets[i],
                              capacities[i], rates ? rates + i : nullptr);
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
}

}  // extern "C"
