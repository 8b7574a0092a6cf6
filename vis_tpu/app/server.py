"""Web application server: upload -> live progress -> results -> chat.

Replaces the reference's Streamlit UI (reference: app/ui.py:589-941 and
app/components/*) with a dependency-free stdlib HTTP server + single-page
app (vis_tpu/app/ui.html).  Feature parity: upload & configure, LIVE
per-node progress (wired to the real pipeline event stream — the reference's
progress bar was static, SURVEY.md §2 dormant components), verdict banner,
confidence/gate displays, 3-panel visual evidence, defect & decision-support
tables, sectioned explanation, PDF download, streaming chat with SQLite
memory, analytics dashboard, history, and health status.
"""

from __future__ import annotations

import io
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from vis_tpu.app.state import (
    create_job,
    create_session_job,
    get_job,
    get_session_job,
)
from vis_tpu.utils.config import config
from vis_tpu.utils.logger import setup_logger
from vis_tpu.utils.validators import sanitize_filename

logger = setup_logger(__name__, level="INFO", component="WEBAPP")

_UI_HTML = (Path(__file__).parent / "ui.html").read_bytes()

# Upper bound on images per batch session (and therefore on the multipart
# body size a single request may carry).
MAX_BATCH_IMAGES = 16


def _start_inspection(image_path: str, criticality: str, domain: Optional[str],
                      user_notes: Optional[str],
                      interactive_review: bool = False) -> str:
    from vis_tpu.orchestration import run_inspection

    job = create_job(image_path)

    def worker() -> None:
        try:
            state = run_inspection(
                image_path, criticality=criticality, domain=domain,
                user_notes=user_notes, request_id=job.request_id,
                interactive_review=interactive_review,
                on_event=lambda ev: job.events.append(
                    {k: v for k, v in ev.items() if k != "state"}
                ),
            )
            job.state = state
        except Exception as exc:  # surfaced through /api/progress
            logger.error(f"Inspection {job.request_id} failed: {exc}",
                         exc_info=True)
            job.error = str(exc)
        finally:
            import time

            job.finished_at = time.time()

    threading.Thread(target=worker, daemon=True).start()
    return job.request_id


def _start_batch_inspection(image_paths, criticality: str,
                            domain: Optional[str],
                            user_notes: Optional[str]) -> str:
    """Multi-image session through run_batch_inspection (concurrent per
    config.max_concurrent_calls; reference ran images sequentially)."""
    from vis_tpu.orchestration import run_batch_inspection

    job = create_session_job(image_paths)

    def worker() -> None:
        try:
            job.result = run_batch_inspection(
                image_paths, criticality=criticality, domain=domain,
                user_notes=user_notes, session_id=job.session_id,
                on_event=lambda ev: job.events.append(
                    {k: v for k, v in ev.items() if k != "state"}
                ),
            )
        except Exception as exc:
            logger.error(f"Session {job.session_id} failed: {exc}",
                         exc_info=True)
            job.error = str(exc)
        finally:
            import time

            job.finished_at = time.time()

    threading.Thread(target=worker, daemon=True).start()
    return job.session_id


def _chat_context(state: Dict[str, Any]) -> str:
    """Build the chat context block from inspection results
    (reference: app/components/chat_widget.py:90-131)."""
    verdict = state.get("safety_verdict") or {}
    consensus = state.get("consensus") or {}
    defects = consensus.get("combined_defects", [])
    ds = state.get("decision_support") or {}
    lines = [
        "INSPECTION RESULTS:",
        f"Verdict: {verdict.get('verdict')} "
        f"(confidence: {verdict.get('confidence_level')})",
        f"Reason: {verdict.get('reason')}",
        f"Agreement score: {consensus.get('agreement_score')}",
        f"Defects found: {len(defects)}",
    ]
    for i, d in enumerate(defects, 1):
        lines.append(
            f"  {i}. {d.get('type')} at {d.get('location')} "
            f"[{d.get('safety_impact')}, confidence {d.get('confidence')}]: "
            f"{d.get('reasoning')}"
        )
    if ds.get("recommendation"):
        lines.append(
            f"Decision support: {ds['recommendation']} "
            f"(repair {ds.get('repair_cost')}, replace {ds.get('replace_cost')})"
        )
    explanation = state.get("explanation") or ""
    if explanation:
        lines.append(f"Report excerpt: {explanation[:1000]}")
    return "\n".join(lines)


def _json_safe(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items() if not k.startswith("_")}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if hasattr(obj, "isoformat"):
        return obj.isoformat()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


class AppHandler(BaseHTTPRequestHandler):
    server_version = "vis-tpu/0.1"
    # Chunked transfer framing (the chat stream) is an HTTP/1.1 feature:
    # under the BaseHTTPRequestHandler default of HTTP/1.0, browsers do
    # not de-chunk and the hex size lines render inside the chat bubble.
    # Every non-stream response sends Content-Length (_send), so
    # persistent connections are safe.
    protocol_version = "HTTP/1.1"

    # -- helpers ---------------------------------------------------------
    def _send(self, code: int, body: bytes, content_type: str = "application/json",
              headers: Optional[Dict[str, str]] = None) -> None:
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for key, value in (headers or {}).items():
            self.send_header(key, value)
        self.end_headers()
        self.wfile.write(body)

    def _json(self, payload: Any, code: int = 200) -> None:
        self._send(code, json.dumps(_json_safe(payload)).encode())

    def log_message(self, fmt: str, *args: Any) -> None:
        logger.debug(f"{self.address_string()} {fmt % args}")

    def _parse_multipart(self) -> Dict[str, Any]:
        """Minimal multipart/form-data parser (stdlib cgi is removed in 3.13;
        we only need file + small text fields)."""
        content_type = self.headers.get("Content-Type", "")
        match = re.search(r"boundary=([^;]+)", content_type)
        if not match:
            raise ValueError("missing multipart boundary")
        boundary = match.group(1).strip('"').encode()
        length = int(self.headers.get("Content-Length", 0))
        # The aggregate body must admit a full batch of individually-valid
        # files (per-file size is enforced by validate_image after save);
        # capping the body at ONE file's limit would reject every multi-
        # image session over max_file_size_mb total.
        max_body = (config.max_file_size_mb * MAX_BATCH_IMAGES + 4) * 1024 * 1024
        if length > max_body:
            raise ValueError("payload too large")
        body = self.rfile.read(length)
        fields: Dict[str, Any] = {}
        for part in body.split(b"--" + boundary):
            # Strip exactly the framing CRLFs, not every leading/trailing
            # 0x0D/0x0A byte — file payloads may legitimately end in
            # newline bytes and a blanket strip() would truncate them.
            if part.startswith(b"\r\n"):
                part = part[2:]
            if part.endswith(b"\r\n"):
                part = part[:-2]
            if not part or part in (b"--", b"--\r\n"):
                continue
            header_blob, _, content = part.partition(b"\r\n\r\n")
            headers = header_blob.decode("utf-8", "replace")
            name_match = re.search(r'name="([^"]+)"', headers)
            if not name_match:
                continue
            name = name_match.group(1)
            file_match = re.search(r'filename="([^"]*)"', headers)
            if file_match and file_match.group(1):
                fields[name] = {
                    "filename": file_match.group(1),
                    "data": content,
                }
            else:
                fields[name] = content.decode("utf-8", "replace")
        return fields

    # -- routes ----------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802
        try:
            path = self.path.split("?")[0]
            if path in ("/", "/index.html"):
                self._send(200, _UI_HTML, "text/html; charset=utf-8")
            elif path.startswith("/api/progress/"):
                self._progress(path.rsplit("/", 1)[1])
            elif path.startswith("/api/result/"):
                self._result(path.rsplit("/", 1)[1])
            elif path.startswith("/api/image/"):
                _, _, _, request_id, kind = path.split("/")
                self._image(request_id, kind)
            elif path.startswith("/api/report/"):
                self._report(path.rsplit("/", 1)[1])
            elif path == "/api/analytics":
                self._analytics()
            elif path == "/api/history":
                self._history()
            elif path == "/api/health":
                self._health()
            elif path == "/api/settings":
                self._settings()
            elif path == "/api/reviews":
                self._reviews()
            elif path.startswith("/api/session/"):
                self._session(path.rsplit("/", 1)[1])
            else:
                self._json({"error": "not found"}, 404)
        except Exception as exc:
            logger.error(f"GET {self.path} failed: {exc}", exc_info=True)
            self._json(self._error_payload(exc), 500)

    def do_POST(self) -> None:  # noqa: N802
        # One handler instance serves many requests on an HTTP/1.1
        # keep-alive connection: reset the per-REQUEST stream flag here or
        # a later request's error would be mis-handled as mid-stream.
        self._stream_started = False
        try:
            path = self.path.split("?")[0]
            if path == "/api/inspect":
                self._inspect()
            elif path == "/api/inspect_batch":
                self._inspect_batch()
            elif path == "/api/review":
                self._review()
            elif path == "/api/chat":
                self._chat()
            else:
                self._json({"error": "not found"}, 404)
        except Exception as exc:
            logger.error(f"POST {self.path} failed: {exc}", exc_info=True)
            if getattr(self, "_stream_started", False):
                # A chunked 200 is already on the wire: a second JSON 500
                # would interleave a raw status line into the stream body.
                self.close_connection = True
            else:
                self._json(self._error_payload(exc), 500)

    @staticmethod
    def _error_payload(exc: Exception) -> Dict[str, Any]:
        """VERBOSE_ERRORS=true includes the traceback in API error bodies
        (reference utils/config.py VERBOSE_ERRORS)."""
        payload: Dict[str, Any] = {"error": str(exc)}
        if config.verbose_errors:
            import traceback

            payload["traceback"] = traceback.format_exc()
        return payload

    # -- endpoint implementations ---------------------------------------
    def _save_upload(self, image: Dict[str, Any]) -> Tuple[Optional[Path], Optional[str]]:
        """Validate + persist one uploaded image; returns (path, error)."""
        import hashlib
        import time as _time

        filename = sanitize_filename(image["filename"] or "upload.jpg")
        upload_dir = config.get_upload_dir()
        digest = hashlib.md5(image["data"]).hexdigest()[:8]
        stamp = _time.strftime("%Y%m%d_%H%M%S")
        dest = upload_dir / f"{stamp}_{digest}_{filename}"
        dest.write_bytes(image["data"])

        from vis_tpu.utils.image_utils import validate_image

        ok, err = validate_image(dest)
        if not ok:
            dest.unlink(missing_ok=True)
            return None, err
        return dest, None

    def _inspect(self) -> None:
        fields = self._parse_multipart()
        image = fields.get("image")
        if not isinstance(image, dict) or not image.get("data"):
            self._json({"error": "no image uploaded"}, 400)
            return
        dest, err = self._save_upload(image)
        if dest is None:
            self._json({"error": err}, 400)
            return

        request_id = _start_inspection(
            str(dest),
            criticality=fields.get("criticality", config.default_criticality),
            domain=fields.get("domain") or None,
            user_notes=fields.get("user_notes") or None,
            interactive_review=(
                str(fields.get("interactive_review", "")).lower()
                in ("1", "true", "on", "yes")
            ),
        )
        self._json({"request_id": request_id})

    def _inspect_batch(self) -> None:
        """Multi-image session upload (reference
        app/components/image_upload.py:113 batch config form)."""
        fields = self._parse_multipart()
        def _field_order(item):
            # image0..image10 must process in UPLOAD order: lexicographic
            # sort puts image10 before image2.
            key = item[0]
            digits = re.sub(r"\D", "", key)
            return (int(digits) if digits else 0, key)

        images = [
            v for k, v in sorted(fields.items(), key=_field_order)
            if k.startswith("image") and isinstance(v, dict) and v.get("data")
        ]
        if not images:
            self._json({"error": "no images uploaded"}, 400)
            return
        if len(images) > MAX_BATCH_IMAGES:
            self._json({"error": f"too many images (max {MAX_BATCH_IMAGES})"},
                       400)
            return
        paths = []
        for image in images:
            dest, err = self._save_upload(image)
            if dest is None:
                self._json({"error": err}, 400)
                return
            paths.append(str(dest))
        session_id = _start_batch_inspection(
            paths,
            criticality=fields.get("criticality", config.default_criticality),
            domain=fields.get("domain") or None,
            user_notes=fields.get("user_notes") or None,
        )
        self._json({"session_id": session_id, "image_count": len(paths)})

    def _session(self, session_id: str) -> None:
        job = get_session_job(session_id)
        if job is None:
            self._json({"error": "unknown session"}, 404)
            return
        snapshot = job.snapshot()
        if job.result is not None:
            snapshot["result"] = job.result
        self._json(snapshot)

    def _settings(self) -> None:
        """Config echo (reference app/ui.py:900-941 settings page).
        Secrets never reach the Config object; everything else is shown."""
        self._json({
            "models": {
                "inspector": {
                    "model": config.vlm_inspector_model,
                    "provider": config.vlm_inspector_provider,
                    "temperature": config.vlm_inspector_temperature,
                    "max_tokens": config.vlm_inspector_max_tokens,
                    "max_image_dim": config.max_image_dimension,
                },
                "auditor": {
                    "model": config.vlm_auditor_model,
                    "provider": config.vlm_auditor_provider,
                    "temperature": config.vlm_auditor_temperature,
                    "max_tokens": config.vlm_auditor_max_tokens,
                    "max_image_dim": config.auditor_max_image_dimension,
                },
                "explainer": {
                    "model": config.explainer_model,
                    "provider": config.explainer_provider,
                    "temperature": config.explainer_temperature,
                    "max_tokens": config.explainer_max_tokens,
                },
            },
            "safety": {
                "confidence_threshold": config.confidence_threshold,
                "max_defects_auto": config.max_defects_auto,
                "vlm_agreement_required": config.vlm_agreement_required,
                "high_criticality_requires_review":
                    config.high_criticality_requires_review,
                "low_confidence_threshold": config.low_confidence_threshold,
                "critical_defect_types": config.critical_defect_types,
            },
            "serving": {
                "mesh_shape": config.mesh_shape,
                "quantization": config.quantization,
                "dev_profile": config.dev_profile,
                "kv_cache_max_tokens": config.kv_cache_max_tokens,
                "paged_kv_cache": config.paged_kv_cache,
                "continuous_batching": config.continuous_batching,
                "speculative_decoding": config.speculative_decoding,
                "prefix_caching": config.prefix_caching,
                "constrained_json": config.constrained_json,
                "device_preprocess": config.device_preprocess,
                "checkpoint_dir": config.checkpoint_dir,
                "use_mock_responses": config.use_mock_responses,
            },
            "files": {
                "upload_dir": config.upload_dir,
                "report_dir": config.report_dir,
                "database_path": config.database_path,
                "max_file_size_mb": config.max_file_size_mb,
                "allowed_extensions": config.allowed_extensions,
            },
        })

    def _reviews(self) -> None:
        """Pending human reviews (reference app/components/sidebar.py:84)."""
        from vis_tpu.orchestration import get_pending_reviews

        self._json(get_pending_reviews())

    def _review(self) -> None:
        """Apply a human decision to a parked run and finish its pipeline
        (reference src/orchestration/graph.py:229-266)."""
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length))
        thread_id = str(payload.get("thread_id", ""))
        decision = str(payload.get("decision", ""))
        notes = payload.get("notes")
        if decision not in ("approve", "reject"):
            self._json({"error": "decision must be approve|reject"}, 400)
            return

        from vis_tpu.orchestration import resume_inspection

        job = get_job(thread_id)
        try:
            state = resume_inspection(
                thread_id, decision, notes,
                on_event=(
                    None if job is None else
                    lambda ev: job.events.append(
                        {k: v for k, v in ev.items() if k != "state"}
                    )
                ),
            )
        except KeyError:
            self._json({"error": "no pending review for thread"}, 404)
            return
        if job is not None:
            job.state = state
        self._json({
            "thread_id": thread_id,
            "decision": decision,
            "verdict": (state.get("safety_verdict") or {}).get("verdict"),
            "current_step": state.get("current_step"),
        })

    def _progress(self, request_id: str) -> None:
        job = get_job(request_id)
        if job is None:
            self._json({"error": "unknown request"}, 404)
            return
        self._json(job.snapshot())

    def _result(self, request_id: str) -> None:
        job = get_job(request_id)
        if job is None or job.state is None:
            self._json({"error": "result not ready"}, 404)
            return
        state = dict(job.state)
        if config.show_debug_info:
            # Reference SHOW_DEBUG_INFO: surface the raw per-node event
            # stream alongside the result (reference app/ui.py debug pane).
            state["debug_events"] = list(job.events)
        self._json(state)

    def _image(self, request_id: str, kind: str) -> None:
        job = get_job(request_id)
        if job is None:
            self._json({"error": "unknown request"}, 404)
            return
        from vis_tpu.utils.image_utils import (
            create_heatmap_overlay,
            create_side_by_side_comparison,
            draw_bounding_boxes,
            load_image,
        )

        defects = []
        if job.state:
            defects = (job.state.get("consensus") or {}).get("combined_defects", [])
        if kind == "original":
            img = load_image(job.image_path)
        elif kind == "heatmap":
            img = create_heatmap_overlay(job.image_path, defects)
        elif kind == "annotated":
            img = draw_bounding_boxes(job.image_path, defects)
        elif kind == "comparison":
            # One downloadable original|heatmap|annotated strip (reference
            # utils/image_utils.py:608 exposes the same helper).
            img = create_side_by_side_comparison(job.image_path, defects)
        else:
            self._json({"error": "unknown image kind"}, 404)
            return
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="JPEG", quality=88)
        self._send(200, buf.getvalue(), "image/jpeg")

    def _report(self, request_id: str) -> None:
        job = get_job(request_id)
        if job is None or job.state is None:
            self._json({"error": "report not ready"}, 404)
            return
        report_path = job.state.get("report_path")
        if not report_path or not Path(report_path).exists():
            from vis_tpu.reporting import generate_report

            report_path = str(generate_report(job.state))
            job.state["report_path"] = report_path
        self._send(
            200, Path(report_path).read_bytes(), "application/pdf",
            {"Content-Disposition":
             f'inline; filename="inspection_{request_id}.pdf"'},
        )

    def _analytics(self) -> None:
        if not config.enable_analytics:
            self._json({"error": "analytics disabled (ENABLE_ANALYTICS=false)"},
                       403)
            return
        from vis_tpu.database import InspectionRepository

        self._json(InspectionRepository().get_defect_statistics())

    def _history(self) -> None:
        from vis_tpu.database import InspectionRepository

        rows = [r.to_dict() for r in InspectionRepository().list_inspections(limit=100)]
        self._json(rows)

    def _health(self) -> None:
        from vis_tpu.app.main import run_health_checks

        self._json({name: ok for name, (ok, _) in run_health_checks().items()})

    def _chat(self) -> None:
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length))
        request_id = payload.get("request_id", "")
        question = str(payload.get("question", ""))
        job = get_job(request_id)
        if job is None or job.state is None:
            self._json({"error": "no completed inspection for chat"}, 404)
            return

        from vis_tpu.agents import get_explainer
        from vis_tpu.chat_memory import persist_chat_turn, prepare_chat_turn

        explainer = get_explainer()
        # Shared server/CLI chat-memory flow: truncation, session id,
        # ENABLE_CHAT_MEMORY gating, standalone rewrite, session seed.
        session_id, history, standalone, history_text = prepare_chat_turn(
            request_id, question
        )
        context_block = _chat_context(job.state)

        answer_parts = []
        if config.enable_streaming:
            # Chunked streaming response: tokens flush as they decode.
            # The generator is drained by a PUMP THREAD into a queue:
            # Engine.chat_turn holds the engine lock across its yields, so
            # writing to a slow client between next() calls would keep the
            # lock hostage to the client's TCP window — decoupled, the
            # lock is held only for actual generation time.
            import queue as _queue

            chunk_q: "_queue.Queue" = _queue.Queue()

            def _pump() -> None:
                try:
                    for chunk in explainer.chat_session_stream(
                        session_id, context_block, standalone,
                        history_text=history_text,
                    ):
                        chunk_q.put(chunk)
                    chunk_q.put(None)
                except Exception as exc:  # surfaced on the writer side
                    chunk_q.put(exc)

            threading.Thread(
                target=_pump, daemon=True, name="chat-pump"
            ).start()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("X-Accel-Buffering", "no")
            self.end_headers()
            self._stream_started = True
            generation_failed = False
            try:
                while True:
                    item = chunk_q.get()
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        # Generation died mid-stream: tell the reader in-band
                        # (the 200 is already on the wire) and do NOT persist
                        # the truncated answer below.
                        logger.error(f"Chat generation failed: {item}")
                        generation_failed = True
                        data = b"\n[error: answer generation failed]"
                        self.wfile.write(
                            f"{len(data):X}\r\n".encode() + data + b"\r\n"
                        )
                        break
                    answer_parts.append(item)
                    data = item.encode()
                    self.wfile.write(
                        f"{len(data):X}\r\n".encode() + data + b"\r\n"
                    )
                    self.wfile.flush()
                self.wfile.write(b"0\r\n\r\n")
            except Exception as exc:
                # Client went away mid-stream: the response cannot be
                # completed (or re-attempted) — drop the connection.
                logger.error(f"Chat streaming failed: {exc}")
                self.close_connection = True
                generation_failed = True
        else:
            # ENABLE_STREAMING=false: buffer and send in one response.
            generation_failed = False
            try:
                answer_parts = list(explainer.chat_session_stream(
                    session_id, context_block, standalone,
                    history_text=history_text,
                ))
            except Exception as exc:
                logger.error(f"Chat failed: {exc}", exc_info=True)
                self._json(self._error_payload(exc), 500)
                return
            self._send(200, "".join(answer_parts).encode(),
                       "text/plain; charset=utf-8")
        # Persist only complete turns: an errored/truncated answer in the
        # durable history would pollute rewrite_query_with_history and the
        # history_text seed of every later turn in this conversation.
        if not generation_failed:
            persist_chat_turn(history, question, "".join(answer_parts))


def serve(host: str = "0.0.0.0", port: int = 8501) -> ThreadingHTTPServer:
    """Start the web app (non-blocking); returns the server object."""
    server = ThreadingHTTPServer((host, port), AppHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True,
                              name="vis-tpu-webapp")
    thread.start()
    logger.info(f"Web app listening on http://{host}:{port}")
    return server


__all__ = ["serve", "AppHandler"]
