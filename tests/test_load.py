"""Multi-session serving load test (BASELINE config 5): N concurrent
sessions drive the full pipeline + analytics through the web app's HTTP
surface, hermetically on the mock backend."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from vis_tpu.agents import reset_agent_cache


@pytest.fixture
def app_server(monkeypatch, tmp_path):
    monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
    monkeypatch.setenv("DATABASE_PATH", str(tmp_path / "load.db"))
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
    boundary = "XloadtestX"
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


def test_concurrent_sessions_under_load(app_server, tmp_path):
    rng = np.random.default_rng(0)
    n_sessions = 6
    scenarios = ["clean", "crack", "scratch", "clean", "crack", "rust"]

    def run_session(i, results):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        body, ctype = _multipart({
            "image": (f"{scenarios[i]}_{i}.jpg", buf.getvalue()),
            "criticality": "medium",
            "domain": "general",
        })
        req = urllib.request.Request(
            f"{app_server}/api/inspect", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            request_id = json.loads(resp.read())["request_id"]

        deadline = time.time() + 120
        while time.time() < deadline:
            progress = _get_json(f"{app_server}/api/progress/{request_id}")
            if progress["status"] != "running":
                break
            time.sleep(0.2)
        assert progress["status"] == "completed", progress

        result = _get_json(f"{app_server}/api/result/{request_id}")
        verdict = result["safety_verdict"]["verdict"]
        assert verdict in ("SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW")

        # Chat follow-up on the completed inspection.
        chat_req = urllib.request.Request(
            f"{app_server}/api/chat",
            data=json.dumps({
                "request_id": request_id, "question": "what was found?"
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(chat_req, timeout=60) as resp:
            answer = resp.read().decode()
        assert len(answer) > 0
        results[i] = (request_id, verdict, scenarios[i])

    results = [None] * n_sessions
    threads = [
        threading.Thread(target=run_session, args=(i, results))
        for i in range(n_sessions)
    ]
    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    elapsed = time.time() - start
    assert all(r is not None for r in results), results

    # Scenario filenames drive the mock: crack -> UNSAFE, clean -> SAFE.
    for request_id, verdict, scenario in results:
        if scenario == "crack":
            assert verdict == "UNSAFE"
        elif scenario == "clean":
            assert verdict == "SAFE"

    analytics = _get_json(f"{app_server}/api/analytics")
    assert analytics["total_inspections"] == n_sessions
    history = _get_json(f"{app_server}/api/history")
    assert len(history) == n_sessions
    print(f"{n_sessions} concurrent sessions in {elapsed:.1f}s")
