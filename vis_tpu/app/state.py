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


_jobs: Dict[str, InspectionJob] = {}


def create_job(image_path: str, request_id: Optional[str] = None) -> InspectionJob:
    request_id = request_id or str(uuid.uuid4())[:8]
    job = InspectionJob(request_id, image_path)
    with _lock:
        _jobs[request_id] = job
    return job


def get_job(request_id: str) -> Optional[InspectionJob]:
    with _lock:
        return _jobs.get(request_id)


def list_jobs(limit: int = 50) -> List[InspectionJob]:
    with _lock:
        jobs = sorted(_jobs.values(), key=lambda j: j.started_at, reverse=True)
    return jobs[:limit]


__all__ = ["InspectionJob", "create_job", "get_job", "list_jobs"]
