"""Native (C++) runtime bindings: queues, flags, worker threads, transport."""

from .native import (  # noqa: F401
    NativeFlag,
    NativeQueue,
    NativeWorker,
    TcpClient,
    TcpServer,
    lib,
    now_ns,
)
