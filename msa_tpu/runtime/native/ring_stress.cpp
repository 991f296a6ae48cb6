// SPSC ring buffer stress harness — built with -fsanitize=thread by the test
// suite (tests/test_native_runtime.py) to data-race-check the lock-free
// capture path. The reference's only concurrency was a Python queue
// (thread-safe by construction, SURVEY §5 "race detection — absent");
// the rebuild's native ring gets an actual sanitizer harness.
//
// Exit code 0 = all samples arrived in order under concurrent producer/
// consumer; TSan reports (if any) go to stderr and fail the run.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {
void* msa_ring_create(int64_t capacity);
void msa_ring_destroy(void* ring);
int64_t msa_ring_push(void* ring, const float* samples, int64_t n);
int64_t msa_ring_pop(void* ring, float* out, int64_t n);
int64_t msa_ring_size(void* ring);
}

// Phase 2: overflow stress. A tiny ring, a producer pushing at full speed
// with NO room check (constantly evicting), a consumer popping concurrently.
// This drives the drop-oldest eviction path — producer-side tail CAS racing
// the consumer's copy+claim — which the in-order phase never reaches.
// Every slot holds its monotonic global index, so a validated pop must
// return a strictly consecutive run starting at or after the previous end;
// anything else means a lost update or a stale (overwritten) copy escaped.
static int overflow_phase() {
  constexpr int64_t kTotal = 1 << 20;
  constexpr int64_t kChunk = 613;
  constexpr int64_t kCap = 1 << 10;  // tiny → guaranteed constant eviction
  void* ring = msa_ring_create(kCap);

  std::atomic<bool> done{false};
  std::atomic<int64_t> dropped_total{0};
  std::thread producer([&] {
    std::vector<float> buf(kChunk);
    int64_t sent = 0;
    while (sent < kTotal) {
      int64_t n = std::min(kChunk, kTotal - sent);
      for (int64_t i = 0; i < n; ++i) buf[i] = static_cast<float>(sent + i);
      dropped_total.fetch_add(msa_ring_push(ring, buf.data(), n),
                              std::memory_order_relaxed);
      sent += n;
    }
    done.store(true, std::memory_order_release);
  });

  std::vector<float> out(kCap);
  int64_t received = 0;
  int64_t next_min = 0;  // popped runs must start at or after this
  bool consistent = true;
  for (;;) {
    int64_t got = msa_ring_pop(ring, out.data(), kCap);
    if (got > 0) {
      int64_t start = static_cast<int64_t>(out[0]);
      if (start < next_min) consistent = false;
      for (int64_t i = 0; i < got; ++i) {
        if (out[i] != static_cast<float>(start + i)) consistent = false;
      }
      next_min = start + got;
      received += got;
    } else if (done.load(std::memory_order_acquire) && msa_ring_size(ring) == 0) {
      break;
    } else {
      std::this_thread::yield();
    }
  }
  producer.join();
  msa_ring_destroy(ring);

  // conservation: everything sent was either received or reported dropped
  int64_t dropped = dropped_total.load(std::memory_order_relaxed);
  if (!consistent || received + dropped != kTotal || dropped == 0) {
    std::fprintf(stderr,
                 "FAIL overflow consistent=%d received=%lld dropped=%lld\n",
                 consistent, static_cast<long long>(received),
                 static_cast<long long>(dropped));
    return 1;
  }
  std::printf("OK overflow: %lld received, %lld dropped, runs consecutive\n",
              static_cast<long long>(received),
              static_cast<long long>(dropped));
  return 0;
}

int main() {
  constexpr int64_t kTotal = 1 << 20;  // 1M samples
  constexpr int64_t kChunk = 997;      // deliberately unaligned
  void* ring = msa_ring_create(1 << 16);

  std::atomic<bool> done{false};
  std::thread producer([&] {
    std::vector<float> buf(kChunk);
    int64_t sent = 0;
    while (sent < kTotal) {
      int64_t n = std::min(kChunk, kTotal - sent);
      for (int64_t i = 0; i < n; ++i) buf[i] = static_cast<float>(sent + i);
      // spin until there is room — the test checks ordering, not drops
      while (msa_ring_size(ring) + n > (1 << 16)) std::this_thread::yield();
      msa_ring_push(ring, buf.data(), n);
      sent += n;
    }
    done.store(true, std::memory_order_release);
  });

  std::vector<float> out(4096);
  int64_t received = 0;
  bool ordered = true;
  while (received < kTotal) {
    int64_t got = msa_ring_pop(ring, out.data(), 4096);
    for (int64_t i = 0; i < got; ++i) {
      if (out[i] != static_cast<float>(received + i)) ordered = false;
    }
    received += got;
    if (got == 0 && done.load(std::memory_order_acquire) &&
        msa_ring_size(ring) == 0 && received < kTotal) {
      break;  // producer finished but data missing → fail below
    }
    if (got == 0) std::this_thread::yield();
  }
  producer.join();
  msa_ring_destroy(ring);

  if (!ordered || received != kTotal) {
    std::fprintf(stderr, "FAIL ordered=%d received=%lld\n", ordered,
                 static_cast<long long>(received));
    return 1;
  }
  std::printf("OK %lld samples in order\n", static_cast<long long>(received));
  return overflow_phase();
}
