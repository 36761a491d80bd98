// Asynchronous binary trajectory writer.
//
// The reference has no persistence at all (SURVEY.md §5 "Checkpoint /
// resume: none"); this is the native half of the framework's trajectory /
// streaming-checkpoint subsystem: frames are enqueued by the simulation
// driver (host copies only) and flushed to disk by a background thread, so
// disk latency never blocks the device step loop.
//
// File format "SPHT0001": header {magic[8], int64 n_particles,
// int64 fields_per_particle}, then frames of
// {int64 step, float payload[n_particles * fields_per_particle]}.
//
// Plain C ABI for ctypes.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Frame {
    int64_t step;
    std::vector<float> payload;
};

struct Writer {
    FILE* f = nullptr;
    int64_t n = 0;
    int64_t fields = 0;
    std::deque<Frame> queue;
    std::mutex mu;
    std::condition_variable cv;
    std::thread worker;
    bool closing = false;
    int64_t frames_written = 0;

    void run() {
        for (;;) {
            Frame fr;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] { return closing || !queue.empty(); });
                if (queue.empty()) {
                    if (closing) return;
                    continue;
                }
                fr = std::move(queue.front());
                queue.pop_front();
            }
            std::fwrite(&fr.step, sizeof(int64_t), 1, f);
            std::fwrite(fr.payload.data(), sizeof(float),
                        fr.payload.size(), f);
            ++frames_written;
        }
    }
};

}  // namespace

extern "C" {

void* sphsm_traj_open(const char* path, int64_t n_particles,
                      int64_t fields_per_particle) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return nullptr;
    auto* w = new Writer();
    w->f = f;
    w->n = n_particles;
    w->fields = fields_per_particle;
    const char magic[8] = {'S', 'P', 'H', 'T', '0', '0', '0', '1'};
    std::fwrite(magic, 1, 8, f);
    std::fwrite(&w->n, sizeof(int64_t), 1, f);
    std::fwrite(&w->fields, sizeof(int64_t), 1, f);
    w->worker = std::thread([w] { w->run(); });
    return w;
}

// Enqueue one frame (copies the payload; returns pending queue depth).
int64_t sphsm_traj_append(void* handle, int64_t step, const float* payload) {
    auto* w = static_cast<Writer*>(handle);
    Frame fr;
    fr.step = step;
    fr.payload.assign(payload, payload + w->n * w->fields);
    std::unique_lock<std::mutex> lk(w->mu);
    w->queue.push_back(std::move(fr));
    int64_t depth = static_cast<int64_t>(w->queue.size());
    lk.unlock();
    w->cv.notify_one();
    return depth;
}

// Flush + close; returns frames written.
int64_t sphsm_traj_close(void* handle) {
    auto* w = static_cast<Writer*>(handle);
    {
        std::unique_lock<std::mutex> lk(w->mu);
        w->closing = true;
    }
    w->cv.notify_one();
    w->worker.join();
    std::fclose(w->f);
    int64_t written = w->frames_written;
    delete w;
    return written;
}

}  // extern "C"
