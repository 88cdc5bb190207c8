// framepipe — native async frame IO for the vid2vid host pipeline.
//
// Role: the native equivalent of the reference's FFMPEGProcessor subprocess
// framing (reference: modules/utils.py:88-113, scripts/vid2vid.py:97-136),
// which does blocking pipe reads/writes on the Python thread. Here a child
// process (ffmpeg or any raw-frame producer/consumer) is spawned and pumped
// by dedicated native threads through a fixed-slot ring buffer, so decode /
// encode IO overlaps TPU compute without touching the GIL.
//
// C ABI (ctypes-friendly):
//   fp_open_reader(argv, argc, frame_bytes, capacity) -> handle
//   fp_read(handle, out_buf)     -> 1 frame, 0 eof, <0 errno
//   fp_open_writer(argv, argc, frame_bytes, capacity) -> handle
//   fp_write(handle, data)       -> 1 ok, <0 errno
//   fp_close(handle)             -> child exit status (flushes + waits)

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <signal.h>
#include <sys/wait.h>
#include <unistd.h>

namespace {

struct Ring {
    std::vector<uint8_t> data;
    size_t frame_bytes = 0;
    size_t capacity = 0;
    size_t head = 0;  // next slot to fill
    size_t tail = 0;  // next slot to drain
    size_t count = 0;
    bool closed = false;     // producer finished
    int error = 0;
    std::mutex mu;
    std::condition_variable not_full;
    std::condition_variable not_empty;

    uint8_t* slot(size_t i) { return data.data() + (i % capacity) * frame_bytes; }
};

struct FramePipe {
    pid_t child = -1;
    int fd = -1;          // pipe endpoint we own
    bool is_reader = false;
    Ring ring;
    std::thread pump;
    bool child_waited = false;
    int exit_status = 0;
};

bool read_exact(int fd, uint8_t* buf, size_t n) {
    size_t got = 0;
    while (got < n) {
        ssize_t r = read(fd, buf + got, n - got);
        if (r == 0) return false;  // eof
        if (r < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        got += static_cast<size_t>(r);
    }
    return true;
}

bool write_exact(int fd, const uint8_t* buf, size_t n) {
    size_t put = 0;
    while (put < n) {
        ssize_t r = write(fd, buf + put, n - put);
        if (r < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        put += static_cast<size_t>(r);
    }
    return true;
}

pid_t spawn(char* const argv[], int* parent_fd, bool reader) {
    int fds[2];
    if (pipe(fds) != 0) return -1;
    pid_t pid = fork();
    if (pid < 0) {
        close(fds[0]);
        close(fds[1]);
        return -1;
    }
    if (pid == 0) {
        if (reader) {
            dup2(fds[1], STDOUT_FILENO);  // child writes frames to stdout
        } else {
            dup2(fds[0], STDIN_FILENO);  // child reads frames from stdin
        }
        close(fds[0]);
        close(fds[1]);
        execvp(argv[0], argv);
        _exit(127);
    }
    if (reader) {
        close(fds[1]);
        *parent_fd = fds[0];
    } else {
        close(fds[0]);
        *parent_fd = fds[1];
    }
    return pid;
}

void reader_pump(FramePipe* fp) {
    Ring& r = fp->ring;
    for (;;) {
        std::unique_lock<std::mutex> lk(r.mu);
        r.not_full.wait(lk, [&] { return r.count < r.capacity || r.closed; });
        if (r.closed) return;
        uint8_t* dst = r.slot(r.head);
        lk.unlock();
        bool ok = read_exact(fp->fd, dst, r.frame_bytes);
        lk.lock();
        if (!ok) {
            r.closed = true;
            r.not_empty.notify_all();
            return;
        }
        r.head++;
        r.count++;
        r.not_empty.notify_one();
    }
}

void writer_pump(FramePipe* fp) {
    Ring& r = fp->ring;
    for (;;) {
        std::unique_lock<std::mutex> lk(r.mu);
        r.not_empty.wait(lk, [&] { return r.count > 0 || r.closed; });
        if (r.count == 0 && r.closed) return;
        uint8_t* src = r.slot(r.tail);
        lk.unlock();
        bool ok = write_exact(fp->fd, src, r.frame_bytes);
        lk.lock();
        if (!ok) {
            r.error = errno ? errno : EPIPE;
            r.closed = true;
            r.not_full.notify_all();
            return;
        }
        r.tail++;
        r.count--;
        r.not_full.notify_one();
    }
}

FramePipe* open_common(const char** argv, int argc, size_t frame_bytes,
                       int capacity, bool reader) {
    if (argc < 1 || frame_bytes == 0 || capacity < 2) return nullptr;
    std::vector<char*> args;
    for (int i = 0; i < argc; i++) args.push_back(const_cast<char*>(argv[i]));
    args.push_back(nullptr);

    auto* fp = new FramePipe();
    fp->is_reader = reader;
    fp->ring.frame_bytes = frame_bytes;
    fp->ring.capacity = static_cast<size_t>(capacity);
    fp->ring.data.resize(frame_bytes * capacity);

    signal(SIGPIPE, SIG_IGN);
    fp->child = spawn(args.data(), &fp->fd, reader);
    if (fp->child < 0) {
        delete fp;
        return nullptr;
    }
    fp->pump = std::thread(reader ? reader_pump : writer_pump, fp);
    return fp;
}

}  // namespace

extern "C" {

FramePipe* fp_open_reader(const char** argv, int argc, size_t frame_bytes, int capacity) {
    return open_common(argv, argc, frame_bytes, capacity, true);
}

FramePipe* fp_open_writer(const char** argv, int argc, size_t frame_bytes, int capacity) {
    return open_common(argv, argc, frame_bytes, capacity, false);
}

// Blocking read of one frame into out. 1 = frame, 0 = eof, <0 = -errno.
int fp_read(FramePipe* fp, uint8_t* out) {
    if (!fp || !fp->is_reader) return -EINVAL;
    Ring& r = fp->ring;
    std::unique_lock<std::mutex> lk(r.mu);
    r.not_empty.wait(lk, [&] { return r.count > 0 || r.closed; });
    if (r.count == 0) return r.error ? -r.error : 0;
    memcpy(out, r.slot(r.tail), r.frame_bytes);
    r.tail++;
    r.count--;
    r.not_full.notify_one();
    return 1;
}

// Blocking write of one frame (enqueues; native thread drains). 1 ok.
int fp_write(FramePipe* fp, const uint8_t* data) {
    if (!fp || fp->is_reader) return -EINVAL;
    Ring& r = fp->ring;
    std::unique_lock<std::mutex> lk(r.mu);
    r.not_full.wait(lk, [&] { return r.count < r.capacity || r.closed; });
    if (r.closed) return r.error ? -r.error : -EPIPE;
    memcpy(r.slot(r.head), data, r.frame_bytes);
    r.head++;
    r.count++;
    r.not_empty.notify_one();
    return 1;
}

// Number of frames currently buffered (diagnostics / backpressure).
int fp_buffered(FramePipe* fp) {
    if (!fp) return -EINVAL;
    std::lock_guard<std::mutex> lk(fp->ring.mu);
    return static_cast<int>(fp->ring.count);
}

// Flush (writer), close the pipe, join the pump, wait for the child.
// Returns the child's exit status (or -errno).
int fp_close(FramePipe* fp) {
    if (!fp) return -EINVAL;
    {
        std::unique_lock<std::mutex> lk(fp->ring.mu);
        if (fp->is_reader) {
            fp->ring.closed = true;
            fp->ring.not_full.notify_all();
            fp->ring.not_empty.notify_all();
        } else {
            // wait for the writer thread to drain the ring
            fp->ring.not_full.wait(lk, [&] { return fp->ring.count == 0 || fp->ring.closed; });
            fp->ring.closed = true;
            fp->ring.not_empty.notify_all();
        }
    }
    if (fp->is_reader) {
        // closing the fd unblocks a reader stuck in read()
        close(fp->fd);
        fp->fd = -1;
        if (fp->child > 0) kill(fp->child, SIGTERM);
    }
    if (fp->pump.joinable()) fp->pump.join();
    if (fp->fd >= 0) {
        close(fp->fd);
        fp->fd = -1;
    }
    int status = 0;
    if (fp->child > 0 && !fp->child_waited) {
        waitpid(fp->child, &status, 0);
        fp->child_waited = true;
        fp->exit_status = WIFEXITED(status) ? WEXITSTATUS(status) : -1;
    }
    int rc = fp->exit_status;
    delete fp;
    return rc;
}

}  // extern "C"
