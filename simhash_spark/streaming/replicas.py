"""N-replica inference serving — the reference's v2-infer mode depth.

  Q1 round-robin  newQueues / newRQueue / readQueue
                  (/root/reference/src/SimHash.hs:27-42): a queue OF
                  replica queues; every dispatch takes the HEAD queue,
                  enqueues the item there, and pushes that queue back at
                  the TAIL — strict round-robin over ``runner-size``
                  model replicas, each a runner thread consuming its own
                  item queue (/root/reference/app/simhash-runner.hs:163-169,
                  ``InferV2 … runnerSize``, default 10).
  EP3 transport   the reference registers the task on a periodic job
                  server over a socket; here a UNIX-DOMAIN socket
                  speaking newline-delimited UTF-8 messages, one JSON
                  reply line (K3 shape: top-10 (label, score) pairs)
                  per request. The directory queue (serving.py) stays as
                  the single-replica infer-learn backend, mirroring the
                  reference's split between InferV2 (N replicas, no
                  learning) and InferLearnV2 (one replica, F2 routing).

Replicas are independent model copies (the reference calls V2.loadModel
once per replica), so concurrent inference never contends on weights.
"""

from __future__ import annotations

import json
import os
import queue
import socket
import threading
from collections import deque
from concurrent.futures import Future
from typing import Callable

from simhash_spark.ml import SimHashClassifier

_STOP = object()


class ReplicaPool:
    """``n_replicas`` model copies, each consuming its own item queue on
    its own thread; ``dispatch`` rotates a deque of replica ids exactly
    like the reference's readQueue (head out, tail back in)."""

    def __init__(self, make_model: Callable[[], SimHashClassifier], n_replicas: int = 10):
        if n_replicas < 1:
            raise ValueError("n_replicas must be >= 1")
        self.replicas = [make_model() for _ in range(n_replicas)]
        self.queues: list[queue.Queue] = [queue.Queue() for _ in range(n_replicas)]
        self.dispatch_counts = [0] * n_replicas
        self._rr = deque(range(n_replicas))
        self._lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._run, args=(i,), daemon=True)
            for i in range(n_replicas)
        ]
        for t in self._threads:
            t.start()

    def _run(self, i: int) -> None:
        model = self.replicas[i]
        q = self.queues[i]
        while True:
            item = q.get()
            if item is _STOP:
                return
            msg, fut = item
            try:
                fut.set_result(model.infer_one(msg))
            except Exception as exc:  # surface to the caller, keep serving
                fut.set_exception(exc)

    def dispatch(self, msg: str) -> Future:
        """readQueue semantics: pick the head replica, rotate it to the
        tail, enqueue. Assignment is strict round-robin regardless of
        how long each replica takes to drain."""
        with self._lock:
            i = self._rr[0]
            self._rr.rotate(-1)
            self.dispatch_counts[i] += 1
        fut: Future = Future()
        self.queues[i].put((msg, fut))
        return fut

    def infer(self, msg: str, timeout: float | None = 30.0):
        return self.dispatch(msg).result(timeout=timeout)

    def stop(self) -> None:
        for q in self.queues:
            q.put(_STOP)
        for t in self._threads:
            t.join(timeout=5.0)


class UnixSocketServer:
    """Unix-domain-socket front end for a ReplicaPool: each connection
    sends newline-delimited UTF-8 messages and receives one JSON reply
    line per message (same K3 shape as the job-queue replies). One
    thread per connection; inference itself is distributed over the
    pool's replicas by dispatch order, not by connection."""

    def __init__(self, pool: ReplicaPool, sock_path: str):
        self.pool = pool
        self.sock_path = sock_path
        self._srv: socket.socket | None = None
        self._accept_thread: threading.Thread | None = None
        self._stopping = threading.Event()

    def start(self) -> "UnixSocketServer":
        if os.path.exists(self.sock_path):
            os.remove(self.sock_path)
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(self.sock_path)
        self._srv.listen(64)
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()
        return self

    def _accept_loop(self) -> None:
        assert self._srv is not None
        while not self._stopping.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return  # socket closed by stop()
            threading.Thread(target=self._serve_conn, args=(conn,), daemon=True).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        with conn:
            buf = b""
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    return
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    msg = line.decode("utf-8")
                    try:
                        ret = self.pool.infer(msg)
                        reply = json.dumps(ret)
                    except Exception as exc:
                        reply = json.dumps({"err": str(exc)})
                    conn.sendall(reply.encode("utf-8") + b"\n")

    def stop(self) -> None:
        self._stopping.set()
        if self._srv is not None:
            try:
                self._srv.close()
            except OSError:
                pass
        if os.path.exists(self.sock_path):
            os.remove(self.sock_path)
