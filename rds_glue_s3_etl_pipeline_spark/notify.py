"""Notification sink (reference op S5).

The reference POSTs to a Slack webhook at every pipeline stage —
errors, successes, and the unmatched-id audit
(``/root/reference/gule_test_job.py:77,102,110,188-191,198,215,220``;
webhook wired via ``configs.json:17`` / ``main.tf:65``).

Here notification is an injectable side-effect interface so the
pipeline stays testable and the webhook client is an optional leaf
dependency, never imported in the data path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol


class Notifier(Protocol):
    def notify(self, message: str) -> None: ...


@dataclass
class CollectingNotifier:
    """Test double: records messages in order."""

    messages: list[str] = field(default_factory=list)

    def notify(self, message: str) -> None:
        self.messages.append(message)


@dataclass
class WebhookNotifier:
    """Slack-compatible webhook POST ({"text": message}), matching the
    reference's payload shape (gule_test_job.py:188-191). Failures are
    swallowed: the reference treats audit-notification failure as
    non-fatal (:195-198)."""

    webhook_url: str
    timeout: float = 5.0

    def notify(self, message: str) -> None:
        try:
            import json
            import urllib.request

            req = urllib.request.Request(
                self.webhook_url,
                data=json.dumps({"text": message}).encode("utf-8"),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=self.timeout)
        except Exception:  # noqa: BLE001 — non-fatal by reference semantics
            pass


class NullNotifier:
    def notify(self, message: str) -> None:  # noqa: D102
        pass


def format_audit_message(summary: dict, show: int = 10) -> str:
    """The reference's audit message shape (gule_test_job.py:176-185):
    first N ids inline, remainder as a count."""
    ids = ", ".join(str(i) for i in summary["displayed_ids"])
    msg = (
        f"Unmatched RDS records: {summary['total_unmatched']} "
        f"(ids: {ids}"
    )
    if summary["remaining_count"] > 0:
        msg += f" and {summary['remaining_count']} more"
    return msg + ")"
