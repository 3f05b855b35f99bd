// avtex native media runtime: frame stitching for texture synthesis.
//
// The reference stitches output frames one PIL image at a time on the Python
// heap, with an optional red position bar burned in per frame
// (reference: contrastive_video_textures/validate.py:613-647,
// baselines/classic_video_textures/video_textures.py:216-221). Here the
// gather + bar-burn + crossfade run as one pass over preallocated buffers.
//
// C ABI only — bound from Python via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Gather frames by id into a contiguous output, optionally burning the
// reference's red position bar (rows [H-25, H-10), 6-px marker at the
// column proportional to frame position).
int avtex_stitch_frames(const uint8_t* video, int64_t num_frames,
                        int64_t height, int64_t width,
                        const int64_t* frame_ids, int64_t n_out,
                        uint8_t* out, int32_t frames_bar,
                        int64_t total_input_frames) {
  const int64_t frame_sz = height * width * 3;
  for (int64_t i = 0; i < n_out; ++i) {
    const int64_t id = frame_ids[i];
    if (id < 0 || id >= num_frames) return -1;
    uint8_t* dst = out + i * frame_sz;
    std::memcpy(dst, video + id * frame_sz, frame_sz);
    if (frames_bar && height > 25) {
      const int64_t col =
          total_input_frames > 0 ? id * width / total_input_frames : 0;
      const int64_t lo = std::max<int64_t>(0, col - 3);
      const int64_t hi = std::min<int64_t>(width, col + 3);
      for (int64_t r = height - 25; r < height - 10; ++r) {
        uint8_t* row = dst + (r * width) * 3;
        std::memset(row, 0, width * 3);
        for (int64_t c = lo; c < hi; ++c) {
          row[c * 3 + 0] = 255;  // red marker on black bar
          row[c * 3 + 1] = 0;
          row[c * 3 + 2] = 0;
        }
      }
    }
  }
  return 0;
}

// Linear crossfade between two frames: n_mid intermediate frames at
// t = k/(n_mid+1), k in [1, n_mid]. Fallback interpolation used when the
// SuperSloMo net is disabled (reference inserts SF-1 net-predicted frames
// at jumps — validate.py:587-613).
int avtex_crossfade(const uint8_t* frame0, const uint8_t* frame1,
                    int64_t height, int64_t width, int32_t n_mid,
                    uint8_t* out) {
  const int64_t n = height * width * 3;
  for (int32_t k = 1; k <= n_mid; ++k) {
    const float t = static_cast<float>(k) / (n_mid + 1);
    uint8_t* dst = out + static_cast<int64_t>(k - 1) * n;
    for (int64_t i = 0; i < n; ++i) {
      dst[i] = static_cast<uint8_t>(
          frame0[i] + t * (static_cast<float>(frame1[i]) - frame0[i]) + 0.5f);
    }
  }
  return 0;
}

}  // extern "C"
