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
  return 0;
}
