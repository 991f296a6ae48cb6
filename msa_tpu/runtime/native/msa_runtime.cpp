// msa_tpu native runtime — host-side data path.
//
// The reference delegates its host data path to Python loops and per-segment
// subprocesses (ffmpeg per segment, offline_processor.py:140-147; byte-queue
// draining, streaming_processor.py:104-115). This library provides the
// TPU-native equivalents as C++:
//
//  - a lock-free single-producer/single-consumer PCM ring buffer for the
//    real-time capture path (replaces the reference's Python queue between
//    the PortAudio callback thread and the processing loop)
//  - batched segment windowing: waveform + [start,end) sample ranges →
//    fixed-size float32 windows (zero-padded/truncated), the host hot loop
//    that feeds the device pipeline
//  - int16 → float32 PCM conversion
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- pcm utils

void msa_pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

// Slice [start, end) sample ranges out of a waveform into fixed-size
// windows: zero-padded when short, truncated when long. Ranges are clamped
// to the waveform. windows must hold num_segments * window_samples floats.
void msa_slice_windows(const float* waveform, int64_t total_samples,
                       const int64_t* starts, const int64_t* ends,
                       int64_t num_segments, int64_t window_samples,
                       float* windows) {
  for (int64_t s = 0; s < num_segments; ++s) {
    float* dst = windows + s * window_samples;
    int64_t lo = starts[s] < 0 ? 0 : starts[s];
    int64_t hi = ends[s] > total_samples ? total_samples : ends[s];
    int64_t n = hi - lo;
    if (n < 0) n = 0;
    if (n > window_samples) n = window_samples;
    if (n > 0) std::memcpy(dst, waveform + lo, n * sizeof(float));
    if (n < window_samples)
      std::memset(dst + n, 0, (window_samples - n) * sizeof(float));
  }
}

// ------------------------------------------------------------- ring buffer
//
// Lock-free SPSC ring over float32 samples. Capacity is fixed at creation;
// the producer (audio callback thread) pushes, the consumer (processing
// loop) drains. Overflow drops the OLDEST samples (the reference's bounded
// video buffer does the same, streaming_processor.py:406-408).
//
// Drop-oldest makes the producer a second writer of `tail`, so BOTH sides
// move `tail` with compare-exchange on monotonic counters (no lost updates,
// no ABA). The consumer copies first and publishes its claim with a tail-CAS
// afterwards: if the producer evicted past the copied region mid-copy, the
// consumer's CAS fails and it retries with fresh bounds, so an overwritten
// copy is never returned. Slots are relaxed atomics — plain movs on x86 —
// which keeps the eviction overlap well-defined (and TSan-clean) instead of
// a benign-but-UB data race.

struct MsaRing {
  std::atomic<float>* data;
  int64_t capacity;
  std::atomic<int64_t> head;  // next write position (monotonic)
  std::atomic<int64_t> tail;  // next read position (monotonic)
};

void* msa_ring_create(int64_t capacity) {
  if (capacity <= 0) return nullptr;
  MsaRing* r = new MsaRing();
  r->data = new std::atomic<float>[capacity];
  r->capacity = capacity;
  r->head.store(0, std::memory_order_relaxed);
  r->tail.store(0, std::memory_order_relaxed);
  return r;
}

void msa_ring_destroy(void* ring) {
  if (!ring) return;
  MsaRing* r = static_cast<MsaRing*>(ring);
  delete[] r->data;
  delete r;
}

int64_t msa_ring_size(void* ring) {
  MsaRing* r = static_cast<MsaRing*>(ring);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// Push n samples; drops oldest on overflow. Returns samples dropped.
int64_t msa_ring_push(void* ring, const float* samples, int64_t n) {
  MsaRing* r = static_cast<MsaRing*>(ring);
  int64_t dropped = 0;
  if (n > r->capacity) {  // keep only the newest capacity samples
    dropped = n - r->capacity;
    samples += n - r->capacity;
    n = r->capacity;
  }
  int64_t head = r->head.load(std::memory_order_relaxed);  // producer-owned
  int64_t tail = r->tail.load(std::memory_order_acquire);
  while (head - tail + n > r->capacity) {
    int64_t evict = head - tail + n - r->capacity;
    if (r->tail.compare_exchange_weak(tail, tail + evict,
                                      std::memory_order_acq_rel,
                                      std::memory_order_acquire)) {
      dropped += evict;
      break;
    }
    // CAS failure reloaded `tail` (consumer popped, freeing room) — re-check.
  }
  for (int64_t i = 0; i < n; ++i)
    r->data[(head + i) % r->capacity].store(samples[i],
                                            std::memory_order_relaxed);
  r->head.store(head + n, std::memory_order_release);
  return dropped;
}

// Pop up to n samples into out. Returns samples actually popped.
int64_t msa_ring_pop(void* ring, float* out, int64_t n) {
  MsaRing* r = static_cast<MsaRing*>(ring);
  for (;;) {
    int64_t tail = r->tail.load(std::memory_order_acquire);
    int64_t head = r->head.load(std::memory_order_acquire);
    int64_t m = head - tail;
    if (m <= 0) return 0;
    if (m > n) m = n;
    for (int64_t i = 0; i < m; ++i)
      out[i] = r->data[(tail + i) % r->capacity].load(
          std::memory_order_relaxed);
    // Claim [tail, tail+m). Fails iff the producer evicted during the copy
    // (the producer only writes into the copied region AFTER a successful
    // eviction-CAS on tail) — then the copy may be stale, so retry.
    if (r->tail.compare_exchange_strong(tail, tail + m,
                                        std::memory_order_acq_rel,
                                        std::memory_order_acquire))
      return m;
  }
}

}  // extern "C"
