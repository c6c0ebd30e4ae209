// Accumulating ring buffer — the native runtime's core streaming primitive.
//
// Same semantics as the reference's CircularBuffer.h:13-36: add() sums values
// in place starting at the head WITHOUT advancing (so overlapping convolution
// tails from consecutive blocks stack), get_and_reset() reads n values,
// zeroes them, and advances the head. Single-producer/single-consumer safe
// when producer only calls add() and consumer only calls get_and_reset()
// under the engine's block sequencing (the audio engine serializes access
// with a mutex, as the reference serializes with its audio critical section).
#pragma once

#include <cstddef>
#include <cstdint>
#include <mutex>
#include <vector>

namespace ar2 {

class RingBuffer {
 public:
  explicit RingBuffer(size_t capacity) : data_(capacity, 0.0), head_(0) {}

  // Sum `n` values into the buffer starting at the head (wrapping); the head
  // does not move.
  void Add(const double* values, size_t n) {
    std::lock_guard<std::mutex> lock(mu_);
    const size_t cap = data_.size();
    size_t pos = head_;
    for (size_t i = 0; i < n; ++i) {
      data_[pos] += values[i];
      pos = (pos + 1 == cap) ? 0 : pos + 1;
    }
  }

  // Copy `n` values from the head into `out`, zero them, advance the head.
  void GetAndReset(double* out, size_t n) {
    std::lock_guard<std::mutex> lock(mu_);
    const size_t cap = data_.size();
    size_t pos = head_;
    for (size_t i = 0; i < n; ++i) {
      out[i] = data_[pos];
      data_[pos] = 0.0;
      pos = (pos + 1 == cap) ? 0 : pos + 1;
    }
    head_ = pos;
  }

  size_t capacity() const { return data_.size(); }

 private:
  std::vector<double> data_;
  size_t head_;
  std::mutex mu_;
};

}  // namespace ar2
