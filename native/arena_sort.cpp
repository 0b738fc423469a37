// Native host-side data plane for the IVF arena (SURVEY.md §2.2 incremental
// insert / persistence): building a list-sorted arena from 100M–1B assignment
// ids is a host bottleneck — numpy's argsort is a single-threaded comparison
// sort (O(n log n)); list ids are small ints, so a parallel stable counting
// sort (O(n), multithreaded histogram + scatter) is the right tool.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
//
//   arena_sort(assign, n, nlist, order_out, offsets_out)
//       order_out[i]   = input row of the i-th arena row (stable by list id)
//       offsets_out[l] = first arena row of list l (length nlist+1)
//   gather_rows(src, order, n, row_bytes, dst)
//       dst[i] = src[order[i]]  (parallel row gather for arena payloads)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
    unsigned t = std::thread::hardware_concurrency();
    return t ? static_cast<int>(t) : 4;
}

template <typename F>
void parallel_chunks(int64_t n, F&& fn) {
    int nt = hw_threads();
    if (n < (1 << 16)) nt = 1;
    std::vector<std::thread> threads;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        threads.emplace_back([=, &fn]() { fn(t, lo, hi); });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void arena_sort(const int32_t* assign, int64_t n, int32_t nlist,
                int64_t* order_out, int64_t* offsets_out) {
    int nt = hw_threads();
    if (n < (1 << 16)) nt = 1;
    // per-thread histograms
    std::vector<std::vector<int64_t>> hist(nt, std::vector<int64_t>(nlist, 0));
    int64_t chunk = (n + nt - 1) / nt;
    {
        std::vector<std::thread> threads;
        for (int t = 0; t < nt; ++t) {
            int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
            if (lo >= hi) break;
            threads.emplace_back([&, t, lo, hi]() {
                auto& h = hist[t];
                for (int64_t i = lo; i < hi; ++i) ++h[assign[i]];
            });
        }
        for (auto& th : threads) th.join();
    }
    // global offsets + per-thread scatter cursors (stability: thread t's
    // chunk precedes thread t+1's within every list)
    std::vector<std::vector<int64_t>> cursor(nt, std::vector<int64_t>(nlist, 0));
    int64_t running = 0;
    for (int32_t l = 0; l < nlist; ++l) {
        offsets_out[l] = running;
        for (int t = 0; t < nt; ++t) {
            cursor[t][l] = running;
            running += hist[t][l];
        }
    }
    offsets_out[nlist] = running;
    // parallel stable scatter
    {
        std::vector<std::thread> threads;
        for (int t = 0; t < nt; ++t) {
            int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
            if (lo >= hi) break;
            threads.emplace_back([&, t, lo, hi]() {
                auto& cur = cursor[t];
                for (int64_t i = lo; i < hi; ++i)
                    order_out[cur[assign[i]]++] = i;
            });
        }
        for (auto& th : threads) th.join();
    }
}

void gather_rows(const uint8_t* src, const int64_t* order, int64_t n,
                 int64_t row_bytes, uint8_t* dst) {
    parallel_chunks(n, [&](int, int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            std::memcpy(dst + i * row_bytes, src + order[i] * row_bytes,
                        row_bytes);
    });
}

}  // extern "C"
