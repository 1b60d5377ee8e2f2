// orbslam_rt: native runtime for the TPU SLAM pipeline.
//
// TPU-native replacement for the reference's C++ thread/queue runtime:
//   * bounded MPMC byte-message queues   <- LocalMapping/LoopClosing keyframe
//     queues (reference src/LocalMapping.cc:122-134, src/LoopClosing.cc:100-111)
//   * atomic flags                        <- mbAbortBA / mbStopGBA cooperative
//     cancellation (src/LocalMapping.cc:126, src/LoopClosing.cc:424)
//   * worker threads that block on a queue OFF the Python GIL and invoke a
//     callback per message                <- LocalMapping::Run / LoopClosing::Run
//     / SendClassToServer::Run thread mains (src/System.cc:124-143)
//   * length-prefixed TCP message transport <- the ROS TCPROS topic transport
//     behind KEYFRAME_<cid>/MAPPOINT_<cid>/CLIENT_MAP<cid>
//     (src/StreamThread.cc:13-16, src/ros_server.cc:195-206)
//
// Exposed as a C ABI consumed via ctypes (orb_slam2v2_1_tpu/runtime/native.py).

#include <arpa/inet.h>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <string>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Time
// ---------------------------------------------------------------------------
uint64_t rt_now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// ---------------------------------------------------------------------------
// Bounded MPMC byte-message queue
// ---------------------------------------------------------------------------
struct RtQueue {
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<std::vector<uint8_t>> msgs;
  size_t capacity;
  bool closed = false;
};

void* rtq_new(int capacity) {
  auto* q = new RtQueue();
  q->capacity = capacity > 0 ? (size_t)capacity : 1;
  return q;
}

// 0 = ok, -1 = timeout, -2 = closed.
int rtq_push(void* qp, const uint8_t* data, int len, int timeout_ms) {
  auto* q = (RtQueue*)qp;
  std::unique_lock<std::mutex> lk(q->mu);
  auto pred = [&] { return q->closed || q->msgs.size() < q->capacity; };
  if (timeout_ms < 0) {
    q->cv_push.wait(lk, pred);
  } else if (!q->cv_push.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                  pred)) {
    return -1;
  }
  if (q->closed) return -2;
  q->msgs.emplace_back(data, data + len);
  q->cv_pop.notify_one();
  return 0;
}

// >=0 = message length (copied into buf, truncated to buflen), -1 = timeout,
// -2 = closed-and-drained.
int rtq_pop(void* qp, uint8_t* buf, int buflen, int timeout_ms) {
  auto* q = (RtQueue*)qp;
  std::unique_lock<std::mutex> lk(q->mu);
  auto pred = [&] { return q->closed || !q->msgs.empty(); };
  if (timeout_ms < 0) {
    q->cv_pop.wait(lk, pred);
  } else if (!q->cv_pop.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                 pred)) {
    return -1;
  }
  if (q->msgs.empty()) return -2;  // closed and drained
  auto msg = std::move(q->msgs.front());
  q->msgs.pop_front();
  q->cv_push.notify_one();
  lk.unlock();
  int n = (int)msg.size();
  if (buf && buflen > 0) memcpy(buf, msg.data(), std::min(n, buflen));
  return n;
}

int rtq_size(void* qp) {
  auto* q = (RtQueue*)qp;
  std::lock_guard<std::mutex> lk(q->mu);
  return (int)q->msgs.size();
}

void rtq_clear(void* qp) {
  auto* q = (RtQueue*)qp;
  std::lock_guard<std::mutex> lk(q->mu);
  q->msgs.clear();
  q->cv_push.notify_all();
}

void rtq_close(void* qp) {
  auto* q = (RtQueue*)qp;
  std::lock_guard<std::mutex> lk(q->mu);
  q->closed = true;
  q->cv_push.notify_all();
  q->cv_pop.notify_all();
}

void rtq_free(void* qp) { delete (RtQueue*)qp; }

// ---------------------------------------------------------------------------
// Atomic flags (mbAbortBA / mbStopGBA / RequestStop analogs)
// ---------------------------------------------------------------------------
void* rtf_new() { return new std::atomic<int>(0); }
void rtf_set(void* f, int v) { ((std::atomic<int>*)f)->store(v); }
int rtf_get(void* f) { return ((std::atomic<int>*)f)->load(); }
// Atomically exchange; returns the previous value.
int rtf_exchange(void* f, int v) { return ((std::atomic<int>*)f)->exchange(v); }
void rtf_free(void* f) { delete (std::atomic<int>*)f; }

// ---------------------------------------------------------------------------
// Worker thread: pop a queue off-GIL, invoke callback per message.
// Callback returns <0 to stop the worker.
// ---------------------------------------------------------------------------
typedef int (*rt_callback)(void* ctx, const uint8_t* data, int len);

struct RtWorker {
  std::thread th;
  std::atomic<bool> done{false};
};

static void worker_main(RtQueue* q, rt_callback cb, void* ctx,
                        std::atomic<bool>* done, int max_msg) {
  std::vector<uint8_t> buf(max_msg);
  for (;;) {
    int n = rtq_pop(q, buf.data(), (int)buf.size(), /*timeout_ms=*/-1);
    if (n == -2) break;  // closed and drained
    if (n < 0) continue;
    // The callback re-enters Python (ctypes acquires the GIL); JAX device
    // dispatch inside it releases the GIL again, so tracking overlaps.
    if (cb(ctx, buf.data(), std::min(n, max_msg)) < 0) break;
  }
  done->store(true);
}

void* rtw_start(void* qp, rt_callback cb, void* ctx, int max_msg) {
  auto* w = new RtWorker();
  w->th = std::thread(worker_main, (RtQueue*)qp, cb, ctx, &w->done,
                      max_msg > 0 ? max_msg : (1 << 20));
  return w;
}

int rtw_done(void* wp) { return ((RtWorker*)wp)->done.load() ? 1 : 0; }

void rtw_join(void* wp) {
  auto* w = (RtWorker*)wp;
  if (w->th.joinable()) w->th.join();
}

void rtw_free(void* wp) {
  auto* w = (RtWorker*)wp;
  if (w->th.joinable()) w->th.detach();
  delete w;
}

// ---------------------------------------------------------------------------
// TCP message transport (u32-LE length prefix), the TCPROS analog.
// ---------------------------------------------------------------------------
int rt_listen(int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons((uint16_t)port);
  if (bind(fd, (sockaddr*)&addr, sizeof(addr)) < 0 || listen(fd, 8) < 0) {
    close(fd);
    return -1;
  }
  return fd;
}

// Returns the bound port of a listening fd (use port=0 in rt_listen to get an
// ephemeral port).
int rt_port(int fd) {
  sockaddr_in addr{};
  socklen_t len = sizeof(addr);
  if (getsockname(fd, (sockaddr*)&addr, &len) < 0) return -1;
  return ntohs(addr.sin_port);
}

int rt_accept(int lfd, int timeout_ms) {
  pollfd p{lfd, POLLIN, 0};
  int r = poll(&p, 1, timeout_ms);
  if (r <= 0) return -1;
  int fd = accept(lfd, nullptr, nullptr);
  if (fd >= 0) {
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  }
  return fd;
}

int rt_connect(const char* host, int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    hostent* he = gethostbyname(host);
    if (!he) {
      close(fd);
      return -1;
    }
    memcpy(&addr.sin_addr, he->h_addr, he->h_length);
  }
  if (connect(fd, (sockaddr*)&addr, sizeof(addr)) < 0) {
    close(fd);
    return -1;
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

static int write_all(int fd, const uint8_t* p, size_t n) {
  while (n) {
    ssize_t w = write(fd, p, n);
    if (w <= 0) return -1;
    p += w;
    n -= (size_t)w;
  }
  return 0;
}

static int read_all(int fd, uint8_t* p, size_t n, int timeout_ms) {
  while (n) {
    pollfd pf{fd, POLLIN, 0};
    int r = poll(&pf, 1, timeout_ms);
    if (r <= 0) return -1;
    ssize_t got = read(fd, p, n);
    if (got <= 0) return -1;
    p += got;
    n -= (size_t)got;
  }
  return 0;
}

int rt_send_msg(int fd, const uint8_t* data, int len) {
  uint32_t n = (uint32_t)len;
  uint8_t hdr[4] = {(uint8_t)n, (uint8_t)(n >> 8), (uint8_t)(n >> 16),
                    (uint8_t)(n >> 24)};
  if (write_all(fd, hdr, 4) < 0) return -1;
  return write_all(fd, data, (size_t)len);
}

// Returns message length; fills buf up to buflen. -1 = error/timeout,
// -3 = message larger than buflen (message is consumed and truncated).
int rt_recv_msg(int fd, uint8_t* buf, int buflen, int timeout_ms) {
  uint8_t hdr[4];
  if (read_all(fd, hdr, 4, timeout_ms) < 0) return -1;
  uint32_t n = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16) | ((uint32_t)hdr[3] << 24);
  std::vector<uint8_t> tmp;
  uint8_t* dst = buf;
  if ((int)n > buflen) {
    tmp.resize(n);
    dst = tmp.data();
  }
  if (read_all(fd, dst, n, timeout_ms) < 0) return -1;
  if ((int)n > buflen) {
    if (buf && buflen > 0) memcpy(buf, tmp.data(), buflen);
    return -3;
  }
  return (int)n;
}

void rt_close_fd(int fd) { close(fd); }

}  // extern "C"
