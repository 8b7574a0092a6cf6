"""Server-side session state for the web app.

Replaces the reference's Streamlit session-state service
(reference: app/services/session_manager.py:12-101) with an explicit
in-process store: per-inspection progress event buffers, results, and chat
session bookkeeping, guarded by one lock (single-writer scheduler
discipline, SURVEY.md §5.2).
"""

from __future__ import annotations

import threading
import time
import uuid
from collections import deque
from typing import Any, Deque, Dict, List, Optional

_lock = threading.Lock()


class InspectionJob:
    """Tracks one running/completed inspection."""

    def __init__(self, request_id: str, image_path: str):
        self.request_id = request_id
        self.image_path = image_path
        self.events: Deque[Dict[str, Any]] = deque(maxlen=200)
        self.state: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None
        self.started_at = time.time()
        self.finished_at: Optional[float] = None

    @property
    def status(self) -> str:
        if self.error:
            return "failed"
        if self.state is not None:
            if self.state.get("current_step") == "awaiting_human_review":
                return "awaiting_review"
            return "completed"
        return "running"

    def snapshot(self) -> Dict[str, Any]:
        return {
            "request_id": self.request_id,
            "status": self.status,
            "events": list(self.events),
            "error": self.error,
            "elapsed": round(
                (self.finished_at or time.time()) - self.started_at, 2
            ),
        }


class SessionJob:
    """Tracks one running/completed multi-image session
    (reference: app/components/inspection_progress.py:61 session dashboard)."""

    def __init__(self, session_id: str, image_paths: List[str]):
        self.session_id = session_id
        self.image_paths = list(image_paths)
        self.image_ids = [
            f"{session_id}-img{i:03d}" for i in range(len(image_paths))
        ]
        self.events: Deque[Dict[str, Any]] = deque(maxlen=2000)
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None
        self.started_at = time.time()
        self.finished_at: Optional[float] = None

    @property
    def status(self) -> str:
        if self.error:
            return "failed"
        if self.result is not None:
            return "completed"
        return "running"

    def snapshot(self) -> Dict[str, Any]:
        # Per-image progress: latest node each image has reached.
        progress: Dict[str, Dict[str, Any]] = {
            iid: {"image_path": path, "node": None, "phase": "pending"}
            for iid, path in zip(self.image_ids, self.image_paths)
        }
        for ev in list(self.events):
            iid = ev.get("image_id")
            if iid not in progress:
                continue
            if ev.get("event") in ("node_start", "node_end"):
                progress[iid]["node"] = ev.get("node")
                progress[iid]["phase"] = (
                    "running" if ev["event"] == "node_start" else "processing"
                )
            if ev.get("event") == "complete":
                progress[iid]["phase"] = "completed"
        return {
            "session_id": self.session_id,
            "status": self.status,
            "error": self.error,
            "images": progress,
            "elapsed": round(
                (self.finished_at or time.time()) - self.started_at, 2
            ),
        }


_jobs: Dict[str, InspectionJob] = {}
_sessions: Dict[str, SessionJob] = {}
# Retention bound: jobs hold their full final state (consensus, defects,
# explanation text) — a long-running server would otherwise grow until
# OOM.  Durable results live in SQLite; in-memory jobs only serve live
# progress/result views, so evicting the oldest FINISHED entries is safe.
_MAX_FINISHED = 256


def _evict_finished(store: Dict[str, Any]) -> None:
    finished = [
        (j.started_at, rid) for rid, j in store.items()
        if getattr(j, "finished_at", None)
    ]
    if len(finished) <= _MAX_FINISHED:
        return
    finished.sort()
    for _, rid in finished[: len(finished) - _MAX_FINISHED]:
        store.pop(rid, None)


def create_job(image_path: str, request_id: Optional[str] = None) -> InspectionJob:
    request_id = request_id or str(uuid.uuid4())[:8]
    job = InspectionJob(request_id, image_path)
    with _lock:
        _jobs[request_id] = job
        _evict_finished(_jobs)
    return job


def get_job(request_id: str) -> Optional[InspectionJob]:
    with _lock:
        return _jobs.get(request_id)


def list_jobs(limit: int = 50) -> List[InspectionJob]:
    with _lock:
        jobs = sorted(_jobs.values(), key=lambda j: j.started_at, reverse=True)
    return jobs[:limit]


def create_session_job(image_paths: List[str]) -> SessionJob:
    session_id = str(uuid.uuid4())[:8]
    job = SessionJob(session_id, image_paths)
    with _lock:
        _sessions[session_id] = job
        _evict_finished(_sessions)
    return job


def get_session_job(session_id: str) -> Optional[SessionJob]:
    with _lock:
        return _sessions.get(session_id)


__all__ = [
    "InspectionJob",
    "SessionJob",
    "create_job",
    "get_job",
    "list_jobs",
    "create_session_job",
    "get_session_job",
]
