"""ctypes bindings for the native runtime (native/runtime.cc).

The shared library is built on demand with the system g++ (the container has
no pybind11; the C ABI + ctypes keeps the binding dependency-free). All
blocking (queue waits, socket polls) happens in native code with the GIL
released, so SLAM worker threads truly overlap the tracking thread — the
reference's std::thread pipeline semantics (src/System.cc:124-143).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_NAME = "liborbslam_rt.so"
_build_lock = threading.Lock()
_lib = None


def _build_so(src_dir: str) -> str:
    so = os.path.join(src_dir, _SO_NAME)
    src = os.path.join(src_dir, "runtime.cc")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-fPIC", "-pthread", "-shared",
         "-o", so, src],
        check=True,
        capture_output=True,
    )
    return so


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        so = _build_so(os.path.abspath(_NATIVE_DIR))
        lib = ctypes.CDLL(so)

        lib.rt_now_ns.restype = ctypes.c_uint64

        lib.rtq_new.restype = ctypes.c_void_p
        lib.rtq_new.argtypes = [ctypes.c_int]
        lib.rtq_push.restype = ctypes.c_int
        lib.rtq_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.rtq_pop.restype = ctypes.c_int
        lib.rtq_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.rtq_size.restype = ctypes.c_int
        lib.rtq_size.argtypes = [ctypes.c_void_p]
        for f in ("rtq_clear", "rtq_close", "rtq_free"):
            getattr(lib, f).argtypes = [ctypes.c_void_p]

        lib.rtf_new.restype = ctypes.c_void_p
        lib.rtf_set.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rtf_get.restype = ctypes.c_int
        lib.rtf_get.argtypes = [ctypes.c_void_p]
        lib.rtf_exchange.restype = ctypes.c_int
        lib.rtf_exchange.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rtf_free.argtypes = [ctypes.c_void_p]

        lib.rtw_start.restype = ctypes.c_void_p
        lib.rtw_start.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.rtw_done.restype = ctypes.c_int
        lib.rtw_done.argtypes = [ctypes.c_void_p]
        lib.rtw_join.argtypes = [ctypes.c_void_p]
        lib.rtw_free.argtypes = [ctypes.c_void_p]

        lib.rt_listen.restype = ctypes.c_int
        lib.rt_listen.argtypes = [ctypes.c_int]
        lib.rt_port.restype = ctypes.c_int
        lib.rt_port.argtypes = [ctypes.c_int]
        lib.rt_accept.restype = ctypes.c_int
        lib.rt_accept.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.rt_connect.restype = ctypes.c_int
        lib.rt_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.rt_send_msg.restype = ctypes.c_int
        lib.rt_send_msg.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.rt_recv_msg.restype = ctypes.c_int
        lib.rt_recv_msg.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.rt_close_fd.argtypes = [ctypes.c_int]

        _lib = lib
    return _lib


class _LazyLib:
    def __getattr__(self, name):
        return getattr(_load(), name)


lib = _LazyLib()


def now_ns() -> int:
    return int(_load().rt_now_ns())


class NativeQueue:
    """Bounded MPMC byte-message queue (the InsertKeyFrame queue analog)."""

    def __init__(self, capacity: int = 64):
        self._lib = _load()
        self._q = self._lib.rtq_new(capacity)

    def push(self, msg: bytes, timeout_ms: int = -1) -> bool:
        r = self._lib.rtq_push(self._q, msg, len(msg), timeout_ms)
        return r == 0

    def pop(self, timeout_ms: int = -1, max_len: int = 1 << 20):
        buf = ctypes.create_string_buffer(max_len)
        n = self._lib.rtq_pop(self._q, buf, max_len, timeout_ms)
        if n == -1:
            return None  # timeout
        if n == -2:
            raise EOFError("queue closed")
        return buf.raw[: min(n, max_len)]

    def __len__(self):
        return self._lib.rtq_size(self._q)

    def clear(self):
        self._lib.rtq_clear(self._q)

    def close(self):
        self._lib.rtq_close(self._q)

    def free(self):
        if self._q:
            self._lib.rtq_free(self._q)
            self._q = None


class NativeFlag:
    """Atomic int flag (mbAbortBA / mbStopGBA analog)."""

    def __init__(self, value: int = 0):
        self._lib = _load()
        self._f = self._lib.rtf_new()
        if value:
            self.set(value)

    def set(self, v: int = 1):
        self._lib.rtf_set(self._f, v)

    def clear(self):
        self._lib.rtf_set(self._f, 0)

    def get(self) -> int:
        return self._lib.rtf_get(self._f)

    def exchange(self, v: int) -> int:
        return self._lib.rtf_exchange(self._f, v)

    def __bool__(self):
        return self.get() != 0

    def free(self):
        if self._f:
            self._lib.rtf_free(self._f)
            self._f = None


_CALLBACK = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
)


class NativeWorker:
    """Native thread draining a NativeQueue into a Python callback.

    The pop wait happens off-GIL in C++; the callback runs under the GIL but
    any JAX dispatch inside it releases the GIL again. Stop by closing the
    queue (drains remaining messages first) or returning False from the
    callback.
    """

    def __init__(self, queue: NativeQueue, fn, max_msg: int = 1 << 20):
        self._lib = _load()
        self.queue = queue
        self.exception = None

        def trampoline(_ctx, data, n):
            try:
                keep = fn(bytes(bytearray(data[:n])))
                return 0 if keep is not False else -1
            except BaseException as e:  # noqa: BLE001 — worker must not unwind into C
                self.exception = e
                return -1

        self._cb = _CALLBACK(trampoline)  # keep a ref: C holds the pointer
        self._w = self._lib.rtw_start(
            queue._q, ctypes.cast(self._cb, ctypes.c_void_p), None, max_msg
        )

    def done(self) -> bool:
        return bool(self._lib.rtw_done(self._w))

    def join(self):
        self._lib.rtw_join(self._w)
        if self.exception is not None:
            raise self.exception

    def free(self):
        if self._w:
            self._lib.rtw_free(self._w)
            self._w = None


class TcpServer:
    """Listening socket with length-prefixed messages (loopback)."""

    def __init__(self, port: int = 0):
        self._lib = _load()
        self._fd = self._lib.rt_listen(port)
        if self._fd < 0:
            raise OSError(f"rt_listen({port}) failed")
        self.port = self._lib.rt_port(self._fd)

    def accept(self, timeout_ms: int = 5000):
        fd = self._lib.rt_accept(self._fd, timeout_ms)
        if fd < 0:
            raise TimeoutError("rt_accept timed out")
        return TcpConn(self._lib, fd)

    def close(self):
        if self._fd >= 0:
            self._lib.rt_close_fd(self._fd)
            self._fd = -1


class TcpConn:
    def __init__(self, lib_, fd: int):
        self._lib = lib_
        self._fd = fd

    def send(self, msg: bytes):
        if self._lib.rt_send_msg(self._fd, msg, len(msg)) < 0:
            raise OSError("rt_send_msg failed")

    def recv(self, timeout_ms: int = 5000, max_len: int = 1 << 24) -> bytes:
        buf = ctypes.create_string_buffer(max_len)
        n = self._lib.rt_recv_msg(self._fd, buf, max_len, timeout_ms)
        if n == -1:
            raise TimeoutError("rt_recv_msg timed out")
        if n == -3:
            raise OSError("message larger than max_len")
        return buf.raw[:n]

    def close(self):
        if self._fd >= 0:
            self._lib.rt_close_fd(self._fd)
            self._fd = -1


class TcpClient(TcpConn):
    def __init__(self, host: str, port: int):
        lib_ = _load()
        fd = lib_.rt_connect(host.encode(), port)
        if fd < 0:
            raise OSError(f"rt_connect({host}, {port}) failed")
        super().__init__(lib_, fd)
