"""Command-line interface for the inspection framework.

Usage:
  python -m vis_tpu.app.cli inspect IMAGE [--criticality high] [--domain aerospace]
                                          [--notes "..."] [--json]
  python -m vis_tpu.app.cli batch IMG1 IMG2 ... [--criticality ...]
  python -m vis_tpu.app.cli chat REQUEST_ID "question"
  python -m vis_tpu.app.cli analytics
  python -m vis_tpu.app.cli history [--limit 20]
  python -m vis_tpu.app.cli health

The CLI drives the same library surface as the web app; with
USE_MOCK_RESPONSES=true it runs hermetically.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict


def _print_state_summary(state: Dict[str, Any]) -> None:
    from vis_tpu.utils.logger import print_banner, print_table

    verdict = state.get("safety_verdict") or {}
    consensus = state.get("consensus") or {}
    defects = consensus.get("combined_defects", [])
    print_banner(f"VERDICT: {verdict.get('verdict', 'UNKNOWN')}")
    print_table(
        ["Field", "Value"],
        [
            ("Request", state.get("request_id")),
            ("Confidence", verdict.get("confidence_level")),
            ("Agreement", f"{consensus.get('agreement_score', 0):.2%}"),
            ("Defects", len(defects)),
            ("Needs human review", verdict.get("requires_human")),
            ("Triggered gates", ", ".join(verdict.get("triggered_gates", []))),
            ("Processing time", f"{state.get('processing_time', 0):.2f}s"),
            ("PDF report", state.get("report_path")),
        ],
    )
    if defects:
        print_table(
            ["#", "Type", "Location", "Severity", "Confidence"],
            [
                (i + 1, d["type"], d["location"][:40], d["safety_impact"],
                 d["confidence"])
                for i, d in enumerate(defects)
            ],
        )
    print()
    print(verdict.get("reason", ""))


def cmd_inspect(args: argparse.Namespace) -> int:
    from vis_tpu.orchestration import run_inspection, resume_inspection

    def on_event(event):
        if event.get("event") == "node_end" and not args.json:
            print(f"  [{event['index'] + 1}/{event['total']}] {event['node']} "
                  f"({event['elapsed_s']:.2f}s)", file=sys.stderr)

    final_state = run_inspection(
        args.image, criticality=args.criticality, domain=args.domain,
        user_notes=args.notes, on_event=on_event,
        interactive_review=args.interactive_review,
    )
    if final_state.get("current_step") == "awaiting_human_review":
        # Human-in-the-loop (reference sidebar.py:84 review queue, as a CLI
        # prompt): show the verdict, take a decision, finish the pipeline.
        verdict = final_state.get("safety_verdict") or {}
        print(f"\nREVIEW REQUIRED — {verdict.get('verdict')}: "
              f"{verdict.get('reason')}", file=sys.stderr)
        decision = args.review_decision
        notes = args.review_notes
        if decision is None:
            answer = ""
            while answer not in ("approve", "reject"):
                answer = input("decision [approve/reject]: ").strip().lower()
            decision = answer
            notes = input("notes (optional): ").strip() or None
        final_state = resume_inspection(
            final_state["request_id"], decision, notes, on_event=on_event
        )
    if final_state is None:
        return 1
    if args.json:
        print(json.dumps(final_state, default=str, indent=2))
    else:
        _print_state_summary(final_state)
    verdict = (final_state.get("safety_verdict") or {}).get("verdict")
    return 0 if verdict == "SAFE" else 2 if verdict == "UNSAFE" else 3


def cmd_batch(args: argparse.Namespace) -> int:
    from vis_tpu.orchestration import run_batch_inspection

    session = run_batch_inspection(
        args.images, criticality=args.criticality, domain=args.domain,
    )
    if args.json:
        print(json.dumps(session, default=str, indent=2))
        return 0
    from vis_tpu.utils.logger import print_banner, print_table

    print_banner(f"SESSION VERDICT: {session['aggregate_verdict']}")
    print_table(
        ["Image", "Verdict"],
        list(session["per_image_verdicts"].items()),
    )
    print_table(
        ["Metric", "Value"],
        [
            ("Images", session["total_images"]),
            ("Completed", session["completed_images"]),
            ("Total defects", session["total_defects"]),
            ("Critical", session["critical_defects"]),
            ("Duration", f"{session['duration_seconds']:.2f}s"),
        ],
    )
    return 0


def cmd_chat(args: argparse.Namespace) -> int:
    from vis_tpu.agents import get_explainer
    from vis_tpu.chat_memory import persist_chat_turn, prepare_chat_turn
    from vis_tpu.database import InspectionRepository

    repo = InspectionRepository()
    record = repo.get_inspection(args.request_id)
    if record is None:
        print(f"no inspection {args.request_id}", file=sys.stderr)
        return 1
    defects = repo.get_defects(args.request_id)
    context = (
        f"INSPECTION RESULTS:\nVerdict: {record.overall_verdict}\n"
        f"Defects: {len(defects)}\n"
        + "\n".join(
            f"  - {d.defect_type} at {d.location} [{d.safety_impact}]"
            for d in defects
        )
    )
    # Same chat-memory flow as the web server (vis_tpu/chat_memory.py):
    # persisted history rewrites follow-up questions into standalone form
    # and seeds fresh engine sessions; ENABLE_CHAT_MEMORY=false keeps
    # turns stateless and persists nothing.
    session_id, history, standalone, history_text = prepare_chat_turn(
        args.request_id, args.question
    )
    explainer = get_explainer()
    answer_parts = []
    for chunk in explainer.chat_session_stream(
        session_id, context, standalone, history_text=history_text
    ):
        answer_parts.append(chunk)
        print(chunk, end="", flush=True)
    print()
    persist_chat_turn(history, args.question, "".join(answer_parts))
    return 0


def cmd_analytics(args: argparse.Namespace) -> int:
    from vis_tpu.database import InspectionRepository

    print(json.dumps(InspectionRepository().get_defect_statistics(), indent=2))
    return 0


def cmd_history(args: argparse.Namespace) -> int:
    from vis_tpu.database import InspectionRepository
    from vis_tpu.utils.logger import print_table

    rows = InspectionRepository().list_inspections(limit=args.limit)
    print_table(
        ["ID", "Image", "Verdict", "Defects", "Criticality", "When"],
        [
            (r.inspection_id, r.image_filename[:28], r.overall_verdict,
             r.defect_count, r.criticality, r.created_at[:19])
            for r in rows
        ],
    )
    return 0


def cmd_health(args: argparse.Namespace) -> int:
    from vis_tpu.app.main import run_health_checks
    from vis_tpu.utils.logger import print_health_check_table

    checks = run_health_checks()
    print_health_check_table(checks)
    return 0 if all(ok for ok, _ in checks.values()) else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vis_tpu",
                                     description="TPU-native vision inspection")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("inspect", help="inspect one image")
    p.add_argument("image")
    p.add_argument("--criticality", default="medium",
                   choices=["low", "medium", "high"])
    p.add_argument("--domain", default=None)
    p.add_argument("--notes", default=None)
    p.add_argument("--json", action="store_true")
    p.add_argument("--interactive-review", action="store_true",
                   help="pause for a human decision when the verdict "
                        "requires review")
    p.add_argument("--review-decision", choices=["approve", "reject"],
                   default=None,
                   help="non-interactive decision for --interactive-review")
    p.add_argument("--review-notes", default=None)
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("batch", help="inspect a batch of images")
    p.add_argument("images", nargs="+")
    p.add_argument("--criticality", default="medium",
                   choices=["low", "medium", "high"])
    p.add_argument("--domain", default=None)
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("chat", help="ask about a past inspection")
    p.add_argument("request_id")
    p.add_argument("question")
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("analytics", help="defect statistics")
    p.set_defaults(fn=cmd_analytics)

    p = sub.add_parser("history", help="list past inspections")
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_history)

    p = sub.add_parser("health", help="system health checks")
    p.set_defaults(fn=cmd_health)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
