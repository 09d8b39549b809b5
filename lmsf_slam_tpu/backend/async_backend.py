"""Asynchronous backend: loop detection + optimization off the frontend path.

The reference runs its backend as dedicated threads with queue handshakes —
mapping and localization threads (`backend_lifelong.hpp:86-87,211,390`), a
loop-detection thread (`loopDetection.hpp:66,258`), and the `GetNewLoops`
queue exchange (`loopDetection.hpp:193-200`). Round-1 code ran all of it
inline in ``add_keyframe``, stalling the frontend for every optimization.

This wrapper restores the reference's pipeline parallelism: ``submit`` is a
bounded-queue enqueue returning the latest published ``odom2map`` immediately;
one worker thread drains keyframes through the wrapped ``LifelongBackend``
(whose device programs — descriptor search, verify registrations, pose-graph
GN — run concurrently with the frontend's tracker programs; JAX dispatch is
thread-safe). The ``odom2map`` correction is published atomically (reference
semantics: the frontend composes its odometry with the latest correction,
`backend_base.hpp:44`).
"""
from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from ..common.pointcloud import PointBatch
from .lifelong import BackendOutput, LifelongBackend, WorkMode


class AsyncBackend:
    """Thread-decoupled facade over :class:`LifelongBackend`.

    API mirrors the sync backend; ``submit`` never blocks on optimization
    (only on a full queue, which bounds memory like the reference's capped
    deques in `data_manager.hpp`).
    """

    def __init__(
        self,
        backend: LifelongBackend,
        max_queue: int = 8,
        drop_when_full: bool = False,
    ):
        """``drop_when_full``: when the worker falls behind and the queue is
        full, DROP the new keyframe instead of stalling the frontend — the
        reference's capped data-manager deques (`data_manager.hpp`) shed
        load exactly this way. Dropped keyframes are counted in
        ``dropped``; the odometry chain stays consistent because between
        edges link consecutive STORED keyframes. False restores blocking
        (lossless, at the cost of frontend latency spikes)."""
        self.backend = backend
        self.drop_when_full = drop_when_full
        self.dropped = 0
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._outputs: list[BackendOutput] = []
        self._lock = threading.Lock()
        self._odom2map = np.asarray(backend.odom2map).copy()
        self._mode = backend.mode
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- worker ---------------------------------------------------------------

    def _run(self):
        while not self._stop.is_set():
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            stamp, edge, surf, odom_pose, gnss_pos, scan_grid = item
            try:
                out = self.backend.add_keyframe(
                    stamp, edge, surf, odom_pose, gnss_pos=gnss_pos,
                    scan_grid=scan_grid,
                )
                with self._lock:
                    self._outputs.append(out)
                    self._odom2map = np.asarray(self.backend.odom2map).copy()
                    self._mode = self.backend.mode
            except BaseException as exc:  # noqa: BLE001 — surfaced at submit/flush
                # a dead worker must not deadlock the frontend: record the
                # failure, keep draining so Queue.join() terminates, and
                # re-raise from the next submit()/flush() on the caller thread
                with self._lock:
                    if self._error is None:
                        self._error = exc
            finally:
                self._q.task_done()

    def _raise_pending(self):
        with self._lock:
            err, self._error = self._error, None
        if err is not None:
            raise RuntimeError("async backend worker failed") from err

    # -- frontend API -----------------------------------------------------------

    def submit(
        self, stamp: float, edge: PointBatch, surf: PointBatch, odom_pose,
        gnss_pos=None, scan_grid=None,
    ) -> tuple[np.ndarray, WorkMode]:
        """Enqueue a keyframe; returns (latest odom2map, mode) immediately.

        ``gnss_pos``/``scan_grid``: optional GNSS observation and organized
        range image riding with the keyframe — same contract as
        ``LifelongBackend.add_keyframe``."""
        self._raise_pending()
        item = (
            stamp,
            edge,
            surf,
            np.asarray(odom_pose, np.float32),
            None if gnss_pos is None else np.asarray(gnss_pos, np.float32),
            scan_grid,
        )
        if self.drop_when_full:
            try:
                self._q.put_nowait(item)
            except queue.Full:
                self.dropped += 1
        else:
            self._q.put(item)
        with self._lock:
            return self._odom2map.copy(), self._mode

    @property
    def odom2map(self) -> np.ndarray:
        with self._lock:
            return self._odom2map.copy()

    @property
    def mode(self) -> WorkMode:
        with self._lock:
            return self._mode

    def outputs(self) -> list[BackendOutput]:
        with self._lock:
            return list(self._outputs)

    def flush(self, timeout: Optional[float] = None):
        """Block until every submitted keyframe has been processed."""
        self._q.join()
        self._raise_pending()
        with self._lock:
            self._odom2map = np.asarray(self.backend.odom2map).copy()
            self._mode = self.backend.mode

    def close(self):
        self.flush()
        self._stop.set()
        self._worker.join(timeout=5.0)

    # -- passthroughs -------------------------------------------------------------

    @property
    def db(self):
        return self.backend.db

    def force_global_optimize(self):
        self.flush()
        return self.backend.force_global_optimize()

    def save(self, path: str):
        self.flush()
        self.backend.save(path)
