"""CLI surface (vis_tpu/app/cli.py): inspect exit codes keyed to verdicts
and the human-in-the-loop review flow (reference sidebar.py:84, as a CLI
prompt / flags)."""

import numpy as np
import pytest
from PIL import Image

from vis_tpu.agents import reset_agent_cache
from vis_tpu.app.cli import main


@pytest.fixture(autouse=True)
def _mock_env(monkeypatch, tmp_path):
    monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
    monkeypatch.setenv("DATABASE_PATH", str(tmp_path / "cli.db"))
    monkeypatch.setenv("CHAT_HISTORY_DB", str(tmp_path / "chat.db"))
    monkeypatch.setenv("REPORT_DIR", str(tmp_path / "reports"))
    monkeypatch.setenv("UPLOAD_DIR", str(tmp_path / "uploads"))
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    from vis_tpu.utils.config import get_config

    get_config(reload=True)
    reset_agent_cache()
    yield
    for var in ("USE_MOCK_RESPONSES", "DATABASE_PATH", "CHAT_HISTORY_DB",
                "REPORT_DIR", "UPLOAD_DIR", "LOG_DIR"):
        monkeypatch.delenv(var, raising=False)
    get_config(reload=True)
    reset_agent_cache()


def _image(tmp_path, name):
    path = tmp_path / name
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 80, 3), dtype=np.uint8)
    ).save(path)
    return str(path)


def test_inspect_exit_codes(tmp_path):
    cosmetic = _image(tmp_path, "scratch_case.jpg")  # cosmetic-only -> SAFE
    crack = _image(tmp_path, "crack_arm.jpg")
    assert main(["inspect", cosmetic]) == 0    # SAFE
    assert main(["inspect", crack]) == 2       # UNSAFE


def test_interactive_review_noninteractive_flags(tmp_path, capsys):
    img = _image(tmp_path, "failparse_blade.jpg")
    code = main([
        "inspect", img, "--criticality", "high", "--interactive-review",
        "--review-decision", "approve", "--review-notes", "ok by hand",
    ])
    # Gate 0 verdict stays UNSAFE; approval clears requires_human and the
    # pipeline finishes (explanation + report + DB).
    assert code == 2
    err = capsys.readouterr().err
    assert "REVIEW REQUIRED" in err

    from vis_tpu.orchestration import get_pending_reviews

    assert not get_pending_reviews()


def test_interactive_review_reject(tmp_path):
    img = _image(tmp_path, "failparse_rotor.jpg")
    code = main([
        "inspect", img, "--interactive-review",
        "--review-decision", "reject",
    ])
    assert code == 2  # rejected -> UNSAFE
