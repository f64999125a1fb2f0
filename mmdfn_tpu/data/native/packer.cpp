// Native host-side batch packer for mmdfn_tpu.
//
// The hot host loop of the input pipeline is assembling statically padded
// (B, L, D) batches out of per-dialogue (len_i, D) float arrays: a zero-fill
// plus B row-block memcpys per modality, 4 modalities per batch.  The
// reference does this through torch's pad_sequence + pandas DataFrame
// shuffling (code/dataloader.py:31-34), which is allocation-heavy python.
// This translation unit provides the raw copy kernels, exposed over a C ABI
// and loaded via ctypes (no pybind11 in this toolchain) — see
// mmdfn_tpu/data/_native.py for the build/load shim and the numpy fallback.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libpacker.so packer.cpp
//
// Threading note: the packer is memory-bandwidth-bound; a simple static
// split of dialogues across a few threads saturates host DRAM.  We use
// plain std::thread to avoid an OpenMP runtime dependency.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Pack n variable-length dialogues into a zeroed (B, L, D) float32 buffer.
//   srcs:  n pointers, srcs[i] -> contiguous (lens[i], D) float32
//   lens:  n dialogue lengths (lens[i] <= L)
//   out:   (B, L, D) float32, fully overwritten (zero padding included)
void pack_f32(const float** srcs, const int32_t* lens, int32_t n,
              int32_t B, int32_t L, int32_t D, float* out) {
  const size_t row = static_cast<size_t>(L) * D;
  std::memset(out, 0, sizeof(float) * static_cast<size_t>(B) * row);
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nthreads = hw > 1 && n > 4 ? (hw < 4 ? hw : 4) : 1;
  auto work = [&](int t) {
    for (int32_t i = t; i < n; i += nthreads) {
      std::memcpy(out + static_cast<size_t>(i) * row, srcs[i],
                  sizeof(float) * static_cast<size_t>(lens[i]) * D);
    }
  };
  if (nthreads == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
}

// Fill umask (B, L) and label (B, L) from per-dialogue lengths and labels.
//   labels: n pointers, labels[i] -> (lens[i],) int32
void pack_masks_labels(const int32_t** labels, const int32_t* lens,
                       int32_t n, int32_t B, int32_t L,
                       float* umask, int32_t* label_out) {
  std::memset(umask, 0, sizeof(float) * static_cast<size_t>(B) * L);
  std::memset(label_out, 0, sizeof(int32_t) * static_cast<size_t>(B) * L);
  for (int32_t i = 0; i < n; ++i) {
    float* um = umask + static_cast<size_t>(i) * L;
    for (int32_t t = 0; t < lens[i]; ++t) um[t] = 1.0f;
    std::memcpy(label_out + static_cast<size_t>(i) * L, labels[i],
                sizeof(int32_t) * lens[i]);
  }
}

}  // extern "C"
