"""Background checkpoint/log sync to remote storage.

Reference: open_clip_train/file_utils.py + main.py:168-189 — a child process
syncs the experiment dir to s3/fsspec every N seconds. Here a daemon thread
mirrors to any destination handled by a copy function: local/NFS paths
directly, s3/gs via the aws/gsutil CLIs when present, or a custom callable.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import threading
import time
from typing import Callable, Optional


def _sync_local(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for root, _dirs, files in os.walk(src):
        # in-flight orbax writes land under *.orbax-checkpoint-tmp* and are
        # atomically renamed when complete; mirroring them would publish
        # partial checkpoints
        _dirs[:] = [d for d in _dirs if ".orbax-checkpoint-tmp" not in d]
        rel = os.path.relpath(root, src)
        target_dir = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(target_dir, exist_ok=True)
        for name in files:
            s = os.path.join(root, name)
            t = os.path.join(target_dir, name)
            if not os.path.exists(t) or os.path.getmtime(s) > os.path.getmtime(t):
                shutil.copy2(s, t)


def _sync_cli(tool: str, src: str, dst: str) -> None:
    subprocess.run([*tool.split(), src, dst], check=True, capture_output=True)


def sync_once(src: str, dst: str) -> bool:
    """One sync pass; True on success (file_utils.remote_sync semantics)."""
    try:
        if dst.startswith("s3://"):
            _sync_cli("aws s3 sync", src, dst)
        elif dst.startswith("gs://"):
            _sync_cli("gsutil -m rsync -r", src, dst)
        else:
            _sync_local(src, dst)
        return True
    except Exception as exc:
        logging.warning("remote sync failed: %s", exc)
        return False


class RemoteSync:
    """Daemon-thread periodic sync (the reference's child process pattern)."""

    def __init__(
        self,
        src: str,
        dst: str,
        every_seconds: float = 300.0,
        sync_fn: Optional[Callable[[str, str], bool]] = None,
    ):
        self.src = src
        self.dst = dst
        self.every_seconds = every_seconds
        self.sync_fn = sync_fn or sync_once
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        def loop():
            while not self._stop.wait(self.every_seconds):
                self.sync_fn(self.src, self.dst)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self, final_sync: bool = True) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if final_sync:
            self.sync_fn(self.src, self.dst)
