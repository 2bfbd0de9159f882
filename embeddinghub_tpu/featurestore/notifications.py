"""Notifications — task/resource event fan-out.

Rebuild of reference ``integrations/slack_client.go``: pluggable
channels receive resource-status and task-run events.  Ships a log
channel and a JSON-lines file channel (a webhook channel would slot in
identically; this image has no egress).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Protocol

from embeddinghub_tpu.featurestore.logging import LOGGER


class Channel(Protocol):
    def notify(self, event: dict) -> None: ...


class LogChannel:
    def notify(self, event: dict) -> None:
        LOGGER.info("notification", **event)


class FileChannel:
    """JSON-lines event sink (stand-in for a webhook in a no-egress env)."""

    def __init__(self, path: str):
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)

    def notify(self, event: dict) -> None:
        with open(self._path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **event}) + "\n")


class Notifier:
    def __init__(self, channels: list[Channel] | None = None):
        self.channels = channels if channels is not None else [LogChannel()]

    def resource_status(self, rid_key: str, status: str, error: str = "") -> None:
        self._fan_out(
            {"kind": "resource_status", "resource": rid_key, "status": status,
             "error": error}
        )

    def task_run(self, task: str, run_id: int, status: str, error: str = "") -> None:
        self._fan_out(
            {"kind": "task_run", "task": task, "run_id": run_id,
             "status": status, "error": error}
        )

    def _fan_out(self, event: dict) -> None:
        for ch in self.channels:
            try:
                ch.notify(event)
            except Exception:  # noqa: BLE001 — notification failure is non-fatal
                pass


NOTIFIER = Notifier()
