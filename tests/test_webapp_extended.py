"""Web-app surface added for reference-UI parity: Settings echo, multi-image
batch sessions (session dashboard / summary / comparison grid data), and the
human-review queue E2E (interactive review -> park -> approve/reject ->
pipeline finishes).  Reference: app/ui.py:900 (settings),
app/components/image_upload.py:113 + results_view.py:284-422 (sessions),
app/components/sidebar.py:84 + src/orchestration/graph.py:229-266 (reviews).
"""

import io
import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from vis_tpu.agents import reset_agent_cache


@pytest.fixture
def app_server(monkeypatch, tmp_path):
    monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
    monkeypatch.setenv("DATABASE_PATH", str(tmp_path / "ext.db"))
    monkeypatch.setenv("CHAT_HISTORY_DB", str(tmp_path / "chat.db"))
    monkeypatch.setenv("REPORT_DIR", str(tmp_path / "reports"))
    monkeypatch.setenv("UPLOAD_DIR", str(tmp_path / "uploads"))
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    from vis_tpu.utils.config import get_config

    get_config(reload=True)
    reset_agent_cache()
    from vis_tpu.app.server import serve

    server = serve("127.0.0.1", 0)
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()
    for var in ("USE_MOCK_RESPONSES", "DATABASE_PATH", "CHAT_HISTORY_DB",
                "REPORT_DIR", "UPLOAD_DIR", "LOG_DIR"):
        monkeypatch.delenv(var, raising=False)
    get_config(reload=True)
    reset_agent_cache()


def _multipart(fields):
    boundary = "XextX"
    body = io.BytesIO()
    for name, value in fields.items():
        body.write(f"--{boundary}\r\n".encode())
        if isinstance(value, tuple):
            filename, data = value
            body.write(
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{filename}"\r\n\r\n'.encode()
            )
            body.write(data)
        else:
            body.write(
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode()
            )
            body.write(str(value).encode())
        body.write(b"\r\n")
    body.write(f"--{boundary}--\r\n".encode())
    return body.getvalue(), f"multipart/form-data; boundary={boundary}"


def _get_json(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return json.loads(resp.read())


def _post_json(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def _jpeg(rng, name_seed=0):
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    ).save(buf, format="JPEG")
    return buf.getvalue()


def test_settings_page_echo(app_server):
    s = _get_json(f"{app_server}/api/settings")
    assert s["models"]["inspector"]["model"]
    assert s["models"]["auditor"]["max_tokens"] > 0
    assert "confidence_threshold" in s["safety"]
    assert "mesh_shape" in s["serving"]
    assert "quantization" in s["serving"]
    assert "upload_dir" in s["files"]
    # No secret-looking keys anywhere (reference masked its API keys).
    blob = json.dumps(s).lower()
    assert "api_key" not in blob and "token\":" not in blob


def test_batch_session_end_to_end(app_server):
    rng = np.random.default_rng(7)
    fields = {
        "criticality": "medium",
        "domain": "manufacturing",
        "user_notes": "session test",
        # filename hints drive mock scenarios: one defect, two clean-ish
        "image000": ("crack_part.jpg", _jpeg(rng)),
        "image001": ("widget.jpg", _jpeg(rng)),
        "image002": ("scratch_case.jpg", _jpeg(rng)),
    }
    body, ctype = _multipart(fields)
    req = urllib.request.Request(
        f"{app_server}/api/inspect_batch", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        data = json.loads(resp.read())
    assert data["image_count"] == 3
    session_id = data["session_id"]

    deadline = time.time() + 120
    while time.time() < deadline:
        snap = _get_json(f"{app_server}/api/session/{session_id}")
        if snap["status"] != "running":
            break
        time.sleep(0.3)
    assert snap["status"] == "completed", snap.get("error")
    assert len(snap["images"]) == 3

    result = snap["result"]
    # session summary (reference results_view.py:284)
    assert result["aggregate_verdict"] in (
        "SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW",
    )
    assert result["session_id"] == session_id
    assert len(result["per_image_verdicts"]) == 3
    # crack image must yield an UNSAFE per-image verdict (mock scenario)
    assert "UNSAFE" in set(result["per_image_verdicts"].values())
    # comparison-grid data (reference results_view.py:332)
    for res in result["image_results"].values():
        assert "safety_verdict" in res and "consensus" in res
    # gates pass-rate data (reference results_view.py:373)
    gates = [
        g for res in result["image_results"].values()
        for g in ((res["safety_verdict"].get("defect_summary") or {})
                  .get("all_gate_results") or [])
    ]
    assert gates, "per-image gate audit trail must flow into the session"


def test_interactive_review_approve_flow(app_server):
    rng = np.random.default_rng(11)
    body, ctype = _multipart({
        "criticality": "high",
        "domain": "aerospace",
        "interactive_review": "true",
        "image": ("failparse_blade.jpg", _jpeg(rng)),
    })
    req = urllib.request.Request(
        f"{app_server}/api/inspect", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        request_id = json.loads(resp.read())["request_id"]

    deadline = time.time() + 60
    while time.time() < deadline:
        snap = _get_json(f"{app_server}/api/progress/{request_id}")
        if snap["status"] != "running":
            break
        time.sleep(0.2)
    assert snap["status"] == "awaiting_review", snap

    reviews = _get_json(f"{app_server}/api/reviews")
    assert any(r["thread_id"] == request_id for r in reviews)

    outcome = _post_json(f"{app_server}/api/review", {
        "thread_id": request_id,
        "decision": "approve",
        "notes": "verified visually, accepting",
    })
    assert outcome["thread_id"] == request_id
    assert outcome["verdict"] in ("SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW")
    assert outcome["current_step"] == "completed"

    # Pipeline must have finished: explanation + report now exist.
    state = _get_json(f"{app_server}/api/result/{request_id}")
    assert state.get("explanation")
    assert state.get("report_path")
    assert state["human_decision"] == "approve"
    # Queue drained.
    assert not any(
        r["thread_id"] == request_id
        for r in _get_json(f"{app_server}/api/reviews")
    )


def test_review_reject_forces_unsafe(app_server):
    rng = np.random.default_rng(13)
    body, ctype = _multipart({
        "criticality": "high",
        "interactive_review": "true",
        "image": ("failparse_rotor.jpg", _jpeg(rng)),
    })
    req = urllib.request.Request(
        f"{app_server}/api/inspect", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        request_id = json.loads(resp.read())["request_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        snap = _get_json(f"{app_server}/api/progress/{request_id}")
        if snap["status"] != "running":
            break
        time.sleep(0.2)
    assert snap["status"] == "awaiting_review"

    outcome = _post_json(f"{app_server}/api/review", {
        "thread_id": request_id, "decision": "reject", "notes": "scrap it",
    })
    assert outcome["verdict"] == "UNSAFE"
    state = _get_json(f"{app_server}/api/result/{request_id}")
    assert "rejected" in (state["safety_verdict"].get("reason") or "").lower()


def test_review_endpoint_validation(app_server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post_json(f"{app_server}/api/review", {
            "thread_id": "nope", "decision": "approve",
        })
    assert err.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as err:
        _post_json(f"{app_server}/api/review", {
            "thread_id": "nope", "decision": "maybe",
        })
    assert err.value.code == 400


def test_ui_pages_served(app_server):
    with urllib.request.urlopen(app_server, timeout=30) as resp:
        html = resp.read().decode()
    for anchor in ("page-batch", "page-reviews", "page-settings",
                   "inspect_batch", "api/reviews", "api/settings"):
        assert anchor in html


def test_ui_visual_polish_elements(app_server):
    """The four reference-parity visual elements ship in the UI shell:
    self-drawn SVG analytics charts, graphical confidence bars (85/60/35%
    mapping), the chat typing indicator, and upload preview thumbnails
    (reference app/ui.py:470-582, verdict_display.py:55,
    chat_widget.py:291, image_upload.py:40)."""
    with urllib.request.urlopen(app_server, timeout=30) as resp:
        html = resp.read().decode()
    # SVG chart builders wired into the analytics page render path.
    assert "svgPieChart" in html and "svgBarChart" in html
    assert "d.verdict_counts" in html and "d.severity_counts" in html
    assert "d.defect_counts" in html
    # Confidence bars at the reference's 85/60/35% display mapping.
    assert "CONF_PCT" in html
    assert "high: 85" in html and "medium: 60" in html and "low: 35" in html
    assert "confbar" in html and "confidenceBars(s)" in html
    # Typing indicator markup + animation.
    assert 'class="typing"' in html and "@keyframes blink" in html
    # Upload thumbnails for both the single and the batch form.
    assert "renderThumbs" in html and "inspect-thumbs" in html
    assert "batch-thumbs" in html


def test_analytics_payload_drives_chart_markup(app_server):
    """Every field the chart JS consumes must be in /api/analytics —
    renaming a payload key would silently blank the charts."""
    d = _get_json(f"{app_server}/api/analytics")
    for key in ("verdict_counts", "defect_counts", "severity_counts",
                "total_inspections", "agreement_rate",
                "avg_processing_time"):
        assert key in d, key
    assert isinstance(d["verdict_counts"], dict)
    assert isinstance(d["severity_counts"], dict)


class TestConfigFlagWirings:
    """Reference config-surface flags must actually change behavior (the
    SURVEY flagged declared-but-unread flags as an anti-pattern)."""

    def test_analytics_disabled(self, app_server, monkeypatch):
        from vis_tpu.utils.config import get_config

        monkeypatch.setenv("ENABLE_ANALYTICS", "false")
        get_config(reload=True)
        try:
            with pytest.raises(urllib.error.HTTPError) as err:
                _get_json(f"{app_server}/api/analytics")
            assert err.value.code == 403
        finally:
            monkeypatch.delenv("ENABLE_ANALYTICS")
            get_config(reload=True)
        assert "verdict_counts" in _get_json(f"{app_server}/api/analytics")

    def test_debug_events_in_result(self, app_server, monkeypatch):
        from vis_tpu.utils.config import get_config

        rng = np.random.default_rng(21)
        body, ctype = _multipart({
            "criticality": "low", "image": ("widget_dbg.jpg", _jpeg(rng)),
        })
        req = urllib.request.Request(
            f"{app_server}/api/inspect", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            rid = json.loads(resp.read())["request_id"]
        deadline = time.time() + 60
        while time.time() < deadline:
            if _get_json(f"{app_server}/api/progress/{rid}")["status"] != "running":
                break
            time.sleep(0.2)

        state = _get_json(f"{app_server}/api/result/{rid}")
        assert "debug_events" not in state
        monkeypatch.setenv("SHOW_DEBUG_INFO", "true")
        get_config(reload=True)
        try:
            state = _get_json(f"{app_server}/api/result/{rid}")
            assert any(
                e.get("event") == "node_end" for e in state["debug_events"]
            )
        finally:
            monkeypatch.delenv("SHOW_DEBUG_INFO")
            get_config(reload=True)

    def test_verbose_error_traceback(self, app_server, monkeypatch):
        from vis_tpu.utils.config import get_config

        bad = urllib.request.Request(
            f"{app_server}/api/inspect", data=b"not multipart",
            headers={"Content-Type": "text/plain"}, method="POST",
        )
        monkeypatch.setenv("VERBOSE_ERRORS", "true")
        get_config(reload=True)
        try:
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(bad, timeout=30)
            payload = json.loads(err.value.read())
            assert "traceback" in payload and "Traceback" in payload["traceback"]
        finally:
            monkeypatch.delenv("VERBOSE_ERRORS")
            get_config(reload=True)

    def test_chat_unstreamed_and_memoryless(self, app_server, monkeypatch,
                                            tmp_path):
        from vis_tpu.utils.config import get_config

        rng = np.random.default_rng(23)
        body, ctype = _multipart({
            "criticality": "low", "image": ("widget_chat.jpg", _jpeg(rng)),
        })
        req = urllib.request.Request(
            f"{app_server}/api/inspect", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            rid = json.loads(resp.read())["request_id"]
        deadline = time.time() + 60
        while time.time() < deadline:
            if _get_json(f"{app_server}/api/progress/{rid}")["status"] != "running":
                break
            time.sleep(0.2)

        monkeypatch.setenv("ENABLE_STREAMING", "false")
        monkeypatch.setenv("ENABLE_CHAT_MEMORY", "false")
        get_config(reload=True)
        try:
            chat = urllib.request.Request(
                f"{app_server}/api/chat",
                data=json.dumps({"request_id": rid, "question": "verdict?"}
                                ).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(chat, timeout=60) as resp:
                assert resp.headers.get("Transfer-Encoding") != "chunked"
                assert resp.read().decode()

            from vis_tpu.chat_memory import get_session_history

            assert get_session_history(f"chat-{rid}").get_message_count() == 0
        finally:
            monkeypatch.delenv("ENABLE_STREAMING")
            monkeypatch.delenv("ENABLE_CHAT_MEMORY")
            get_config(reload=True)


def test_quick_questions_and_comparison_endpoint(app_server):
    """VERDICT r4 items: quick-question chat buttons render and the
    reference's canned question streams an answer through the same chat
    path (reference chat_widget.py:456-486); the side-by-side comparison
    image endpoint serves the original|heatmap|annotated strip."""
    with urllib.request.urlopen(app_server, timeout=30) as resp:
        html = resp.read().decode()
    assert 'id="quick-questions"' in html
    assert html.count('class="quickq-btn"') >= 3
    assert "repair vs replacement" in html
    assert "askChat(btn.dataset.q)" in html  # same streaming path

    rng = np.random.default_rng(31)
    body, ctype = _multipart({
        "criticality": "low", "image": ("qq_defect.jpg", _jpeg(rng)),
    })
    req = urllib.request.Request(
        f"{app_server}/api/inspect", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        rid = json.loads(resp.read())["request_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        if _get_json(f"{app_server}/api/progress/{rid}")["status"] != "running":
            break
        time.sleep(0.2)

    # One quick-question click = the same POST the form submits.
    chat = urllib.request.Request(
        f"{app_server}/api/chat",
        data=json.dumps({
            "request_id": rid,
            "question": "What's the detailed cost breakdown for repair "
                        "vs replacement?",
        }).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(chat, timeout=60) as resp:
        answer = resp.read().decode()
    assert answer.strip()

    # Comparison strip: 3 panels + 2 gaps wide.
    with urllib.request.urlopen(
        f"{app_server}/api/image/{rid}/comparison", timeout=60
    ) as resp:
        data = resp.read()
    img = Image.open(io.BytesIO(data))
    with urllib.request.urlopen(
        f"{app_server}/api/image/{rid}/original", timeout=60
    ) as resp:
        orig = Image.open(io.BytesIO(resp.read()))
    assert img.width == orig.width * 3 + 16
    assert img.height == orig.height


def _run_inspection(app_server, seed=41):
    """Submit one mock inspection and wait for it to finish; returns rid."""
    rng = np.random.default_rng(seed)
    body, ctype = _multipart({
        "criticality": "low", "image": (f"rev_{seed}.jpg", _jpeg(rng)),
    })
    req = urllib.request.Request(
        f"{app_server}/api/inspect", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        rid = json.loads(resp.read())["request_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        if _get_json(f"{app_server}/api/progress/{rid}")["status"] != "running":
            break
        time.sleep(0.2)
    return rid


def test_batch_body_admits_full_batch_over_single_file_cap(
        app_server, monkeypatch):
    """Round-4 app review: the multipart body cap must admit a full batch of
    individually-valid files — a cap sized to ONE file rejected every
    multi-image session totalling over max_file_size_mb."""
    from vis_tpu.utils.config import get_config

    monkeypatch.setenv("MAX_FILE_SIZE_MB", "1")
    get_config(reload=True)
    try:
        rng = np.random.default_rng(7)

        def _png():
            # Noise PNG ≈ raw size: 540*540*3 ≈ 0.87 MB, under the 1 MB
            # per-file limit; four of them exceed the old (1+2) MB body cap.
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (540, 540, 3), dtype=np.uint8)
            ).save(buf, format="PNG")
            return buf.getvalue()

        fields = {"criticality": "low"}
        for i in range(4):
            fields[f"image{i:03d}"] = (f"big_{i}.png", _png())
        body, ctype = _multipart(fields)
        assert len(body) > 3 * 1024 * 1024  # over the old aggregate cap
        req = urllib.request.Request(
            f"{app_server}/api/inspect_batch", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            data = json.loads(resp.read())
        assert data["image_count"] == 4
        deadline = time.time() + 120
        while time.time() < deadline:
            d = _get_json(f"{app_server}/api/session/{data['session_id']}")
            if d["status"] != "running":
                break
            time.sleep(0.3)
        assert d["status"] == "completed"
    finally:
        monkeypatch.delenv("MAX_FILE_SIZE_MB")
        get_config(reload=True)


def test_batch_image_count_cap(app_server):
    from vis_tpu.app.server import MAX_BATCH_IMAGES

    rng = np.random.default_rng(11)
    jpeg = _jpeg(rng)
    fields = {"criticality": "low"}
    for i in range(MAX_BATCH_IMAGES + 1):
        fields[f"image{i:03d}"] = (f"n_{i}.jpg", jpeg)
    body, ctype = _multipart(fields)
    req = urllib.request.Request(
        f"{app_server}/api/inspect_batch", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=60)
    assert err.value.code == 400
    assert "too many images" in json.loads(err.value.read())["error"]


def test_ui_escapes_untrusted_fields(app_server):
    """Stored-XSS regression: every model- or user-derived string must pass
    through esc() before innerHTML (VLM free text, reviewer notes resumed
    into verdict.reason, DB filenames)."""
    with urllib.request.urlopen(app_server, timeout=30) as resp:
        html = resp.read().decode()
    assert "const esc =" in html
    for marker in (
        "${esc(v.reason)}", "${esc(d.location)}", "${esc(d.type)}",
        "${esc(g.message)}", "${esc(ds.reasoning)}",
        "${esc(r.image_filename)}", "${esc(r.reason)}",
        "${esc(s.explanation)}",
    ):
        assert marker in html, marker
    # Multibyte-safe streaming decode + poll retry also pinned here.
    assert "decoder.decode(value, { stream: true })" in html
    assert "pollProgress(btn, failures + 1)" in html
    assert "pollSession(sessionId, btn, failures + 1)" in html


class TestChatFailureHandling:
    def test_unstreamed_chat_error_returns_500_and_persists_nothing(
            self, app_server, monkeypatch):
        from vis_tpu.utils.config import get_config

        rid = _run_inspection(app_server, seed=43)
        monkeypatch.setenv("ENABLE_STREAMING", "false")
        get_config(reload=True)

        import vis_tpu.agents as agents_mod

        class _Boom:
            def chat_session_stream(self, *a, **k):
                raise RuntimeError("engine down")

        monkeypatch.setattr(agents_mod, "get_explainer", lambda: _Boom())
        try:
            chat = urllib.request.Request(
                f"{app_server}/api/chat",
                data=json.dumps({"request_id": rid, "question": "verdict?"}
                                ).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(chat, timeout=60)
            assert err.value.code == 500
            assert "error" in json.loads(err.value.read())

            from vis_tpu.chat_memory import get_session_history

            assert get_session_history(f"chat-{rid}").get_message_count() == 0
        finally:
            monkeypatch.delenv("ENABLE_STREAMING")
            get_config(reload=True)

    def test_streamed_chat_error_marks_in_band_and_persists_nothing(
            self, app_server, monkeypatch):
        rid = _run_inspection(app_server, seed=47)

        import vis_tpu.agents as agents_mod

        class _Partial:
            def chat_session_stream(self, *a, **k):
                yield "The verdict was "
                raise RuntimeError("engine died mid-answer")

        monkeypatch.setattr(agents_mod, "get_explainer", lambda: _Partial())
        chat = urllib.request.Request(
            f"{app_server}/api/chat",
            data=json.dumps({"request_id": rid, "question": "verdict?"}
                            ).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(chat, timeout=60) as resp:
            text = resp.read().decode()
        assert "The verdict was " in text
        assert "[error: answer generation failed]" in text

        from vis_tpu.chat_memory import get_session_history

        # The truncated turn must NOT pollute the durable history.
        assert get_session_history(f"chat-{rid}").get_message_count() == 0
