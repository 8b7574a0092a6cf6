"""Application launcher: startup health checks then web server
(reference: app/main.py:21-252 — same check sequence: config echo,
filesystem, database init+count, agent pings; SKIP_HEALTH_CHECKS honored).

Run: python -m vis_tpu.app.main [--port 8501]
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Dict, Tuple

from vis_tpu.utils.config import get_config
from vis_tpu.utils.logger import (
    print_banner,
    print_health_check_table,
    setup_logger,
)

logger = setup_logger(__name__, level="INFO", component="MAIN")


def run_health_checks() -> Dict[str, Tuple[bool, str]]:
    """All startup checks; each returns (ok, detail)."""
    config = get_config()
    checks: Dict[str, Tuple[bool, str]] = {}

    checks["config"] = (
        True,
        f"env={config.environment} mock={config.use_mock_responses} "
        f"mesh={config.mesh_shape}",
    )

    try:
        dirs = [config.get_upload_dir(), config.get_report_dir(), config.get_log_dir()]
        checks["filesystem"] = (True, ", ".join(str(d) for d in dirs))
    except Exception as exc:
        checks["filesystem"] = (False, str(exc))

    try:
        from vis_tpu.database import InspectionRepository, init_database

        init_database()
        count = InspectionRepository().get_inspection_count()
        checks["database"] = (True, f"{count} inspections recorded")
    except Exception as exc:
        checks["database"] = (False, str(exc))

    try:
        from vis_tpu.agents import health_check_agents

        start = time.perf_counter()
        agent_status = health_check_agents()
        elapsed = time.perf_counter() - start
        for name, ok in agent_status.items():
            checks[f"agent:{name}"] = (ok, f"ping {elapsed * 1000:.0f} ms total")
    except Exception as exc:
        checks["agents"] = (False, str(exc))

    return checks


def main() -> int:
    parser = argparse.ArgumentParser(description="Vision Inspection System (TPU)")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8501)
    args = parser.parse_args()

    config = get_config()
    print_banner(config.app_title, "TPU-native visual inspection")

    if config.skip_health_checks:
        logger.warning("SKIP_HEALTH_CHECKS=true: starting without checks")
    else:
        checks = run_health_checks()
        print_health_check_table(checks)
        critical_failures = [
            name for name, (ok, _) in checks.items()
            if not ok and name in ("filesystem", "database")
        ]
        if critical_failures:
            logger.error(f"Critical startup failures: {critical_failures}")
            return 1

    from vis_tpu.app.server import serve

    server = serve(args.host, args.port)
    print(f"\n  Open http://localhost:{args.port} to start inspecting.\n")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        logger.info("Shutting down")
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
