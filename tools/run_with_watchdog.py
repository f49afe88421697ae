"""Stall watchdog for long TPU runs on flaky device transports.

This environment's TPU relay can sporadically wedge a training process:
every thread ends up futex-waiting on a device response that never arrives
(observed twice on multi-hour runs, both times right after heavy
host<->device traffic; the repro smoke with saves every 50 steps does NOT
reproduce it, so it is transport flakiness, not a framework deadlock).
Training is preemption-safe (checkpoint.restore_for_resume), so the cheap
fix is supervision: restart the child whenever its progress log stops
advancing.

Usage:
    python tools/run_with_watchdog.py <progress_log> <cmd> [args...]

Policy:
- progress = new lines matching WATCHDOG_PROGRESS_REGEX (default
  ``step: \\d+``, the per-window training line) appended to <progress_log>;
  set it to empty to fall back to any-mtime-change mode. Startup (dataset
  synthesis, checkpoint restore, store upload, compile) writes logs in
  bursts with multi-minute silent gaps, so only real step lines arm the
  stall timer — WATCHDOG_COMPILE_GRACE (default 45 min) applies per child
  launch until the first match; after that, WATCHDOG_STALL_SECS (default
  300 s) without a new match triggers a restart.
- the child is its own process group; stall-kill is SIGTERM on the group
  first (gives the PJRT client WATCHDOG_TERM_GRACE, default 30 s, to
  release its remote device lease — a SIGKILLed client leaves the lease
  held and the successor blocks at init until it expires), then SIGKILL.
- max WATCHDOG_MAX_RESTARTS (default 20) restarts, then give up.
- exits with the child's exit code when the child finishes on its own;
  SIGTERM/SIGINT to the watchdog forwards to the child group and exits.
"""

import os
import re
import signal
import subprocess
import sys
import time

STALL_SECS = int(os.environ.get("WATCHDOG_STALL_SECS", 300))
COMPILE_GRACE = int(os.environ.get("WATCHDOG_COMPILE_GRACE", 2700))
MAX_RESTARTS = int(os.environ.get("WATCHDOG_MAX_RESTARTS", 20))
POLL = int(os.environ.get("WATCHDOG_POLL_SECS", 20))
PROGRESS_REGEX = os.environ.get("WATCHDOG_PROGRESS_REGEX", r"step: \d+")
# Non-finite-loss trip (r4 post-mortem): a diverged run keeps "progressing"
# — step lines advance while the loss is NaN — so the stall watchdog never
# fires. Match the training loss value itself; on a hit, kill the child and
# DO NOT restart (a restart would resume into the same divergence). Set to
# empty to disable.
NAN_REGEX = os.environ.get(
    "WATCHDOG_NAN_REGEX", r"training_loss: *(nan|-?inf)"
)


def _mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


class _ProgressTracker:
    """Progress = a new PROGRESS_REGEX match appended to the log (or, with
    an empty regex, any mtime change). Reads only appended bytes."""

    def __init__(self, path):
        self.path = path
        self.pattern = re.compile(PROGRESS_REGEX) if PROGRESS_REGEX else None
        self.nan_pattern = re.compile(NAN_REGEX) if NAN_REGEX else None
        self.nan_tripped = False
        self.offset = self._size()
        self.mtime = _mtime(path)
        self._carry = b""  # trailing partial line of the previous read

    def _size(self):
        try:
            return os.path.getsize(self.path)
        except OSError:
            return 0

    def advanced(self) -> bool:
        if self.pattern is None:
            m = _mtime(self.path)
            if m is not None and (self.mtime is None or m > self.mtime):
                self.mtime = m
                return True
            return False
        size = self._size()
        if size < self.offset:  # truncated/rotated: start over
            self.offset = 0
            self._carry = b""
        if size == self.offset:
            return False
        try:
            with open(self.path, "rb") as f:
                f.seek(self.offset)
                chunk = f.read(size - self.offset)
            self.offset = size
        except OSError:
            return False
        # Prepend the previous read's trailing partial line: a poll landing
        # mid-write would otherwise split a progress line across two chunks
        # and neither would match — a silently missed heartbeat that can
        # cost a full stall-window restart (r2 review).
        chunk = self._carry + chunk
        nl = chunk.rfind(b"\n")
        self._carry = chunk[nl + 1:] if nl >= 0 else chunk
        text = chunk.decode("utf-8", "replace")
        if self.nan_pattern is not None and self.nan_pattern.search(text):
            self.nan_tripped = True
        return bool(self.pattern.search(text))


TERM_GRACE = int(os.environ.get("WATCHDOG_TERM_GRACE", 30))


def _kill_group(child):
    """SIGTERM the group, escalate to SIGKILL after TERM_GRACE seconds."""
    try:
        os.killpg(child.pid, signal.SIGTERM)
    except ProcessLookupError:
        child.wait()
        return
    deadline = time.time() + TERM_GRACE
    while time.time() < deadline:
        if child.poll() is not None:
            return
        time.sleep(1)
    try:
        os.killpg(child.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    child.wait()


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    progress_log, cmd = sys.argv[1], sys.argv[2:]

    child = None

    def forward(signum, _frame):
        if child is not None and child.poll() is None:
            os.killpg(child.pid, signum)
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, forward)
    signal.signal(signal.SIGINT, forward)

    restarts = 0
    while True:
        start = time.time()
        tracker = _ProgressTracker(progress_log)
        child = subprocess.Popen(cmd, start_new_session=True)
        print(
            f"watchdog: started pid={child.pid} (restart {restarts}/"
            f"{MAX_RESTARTS})",
            flush=True,
        )
        progressed = False
        last_progress = start
        while True:
            time.sleep(POLL)
            # re-check liveness AFTER the sleep so a child that exits during
            # the poll window is never mis-flagged as stalled
            rc = child.poll()
            if rc is not None:
                tracker.advanced()  # drain tail lines written before exit
                if tracker.nan_tripped:
                    print(
                        "watchdog: NON-FINITE loss in log — child exited "
                        f"rc={rc}; NOT restarting (divergence, not a crash)",
                        flush=True,
                    )
                    return 3
                if rc == 0:
                    print("watchdog: child finished cleanly", flush=True)
                    return 0
                print(f"watchdog: child exited rc={rc}", flush=True)
                break  # crashed: restart below
            if tracker.advanced():
                if not progressed:
                    print("watchdog: first progress observed", flush=True)
                progressed = True
                last_progress = time.time()
            if tracker.nan_tripped:
                print(
                    "watchdog: NON-FINITE loss in log — killing pid="
                    f"{child.pid}; NOT restarting (divergence, not a crash)",
                    flush=True,
                )
                _kill_group(child)
                return 3
            limit = STALL_SECS if progressed else COMPILE_GRACE
            ref = last_progress if progressed else start
            if time.time() - ref > limit:
                print(
                    f"watchdog: no progress in {limit}s — killing pid="
                    f"{child.pid}",
                    flush=True,
                )
                _kill_group(child)
                break
        restarts += 1
        if restarts > MAX_RESTARTS:
            print("watchdog: restart budget exhausted", flush=True)
            return 1
        time.sleep(10)


if __name__ == "__main__":
    raise SystemExit(main())
