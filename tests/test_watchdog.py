"""Stall watchdog (tools/run_with_watchdog.py): a child whose progress file
stops advancing is killed and restarted; a clean exit ends supervision."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_restarts_stalled_child_then_exits_clean(tmp_path):
    progress = tmp_path / "progress.log"
    marker = tmp_path / "ran_once"
    child = tmp_path / "child.sh"
    child.write_text(
        "#!/bin/bash\n"
        f"echo tick >> {progress}\n"
        "sleep 1\n"
        f"echo tick >> {progress}\n"
        f"if [ ! -f {marker} ]; then\n"
        f"  touch {marker}\n"
        "  sleep 9999\n"  # first run: stall after progress
        "fi\n"
        "exit 0\n"  # second run: finish cleanly
    )
    child.chmod(0o755)

    env = dict(
        os.environ,
        WATCHDOG_POLL_SECS="1",
        WATCHDOG_STALL_SECS="4",
        WATCHDOG_PROGRESS_REGEX="tick",
        WATCHDOG_COMPILE_GRACE="30",
        WATCHDOG_MAX_RESTARTS="3",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_with_watchdog.py"),
            str(progress),
            str(child),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert "no progress" in out  # the stall was detected
    assert "restart 1/" in out  # exactly one restart happened
    assert "finished cleanly" in out


def test_watchdog_gives_up_after_max_restarts(tmp_path):
    progress = tmp_path / "progress.log"
    child = tmp_path / "child.sh"
    # always stalls (after making progress once)
    child.write_text(
        f"#!/bin/bash\necho tick >> {progress}\nsleep 9999\n"
    )
    child.chmod(0o755)
    env = dict(
        os.environ,
        WATCHDOG_POLL_SECS="1",
        WATCHDOG_STALL_SECS="2",
        WATCHDOG_PROGRESS_REGEX="tick",
        WATCHDOG_COMPILE_GRACE="5",
        WATCHDOG_MAX_RESTARTS="1",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_with_watchdog.py"),
            str(progress),
            str(child),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 1
    assert "restart budget exhausted" in proc.stdout


def test_watchdog_ignores_non_matching_log_lines(tmp_path):
    """Startup chatter (dataset gen, restore logs) must NOT arm or reset the
    stall timer — only PROGRESS_REGEX matches count (the any-mtime mode
    caused spurious kills during multi-minute silent startup gaps)."""
    progress = tmp_path / "progress.log"
    child = tmp_path / "child.sh"
    # writes noise forever, never a matching line
    child.write_text(
        f"#!/bin/bash\nwhile true; do echo setup-noise >> {progress}; "
        "sleep 1; done\n"
    )
    child.chmod(0o755)
    env = dict(
        os.environ,
        WATCHDOG_POLL_SECS="1",
        WATCHDOG_STALL_SECS="60",
        WATCHDOG_PROGRESS_REGEX="tick",
        WATCHDOG_COMPILE_GRACE="4",
        WATCHDOG_MAX_RESTARTS="1",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_with_watchdog.py"),
            str(progress),
            str(child),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    # never sees progress: killed on COMPILE_GRACE both times, budget spent
    assert proc.returncode == 1
    assert "first progress observed" not in proc.stdout


def test_watchdog_nan_trip_kills_without_restart(tmp_path):
    """A diverged run keeps emitting advancing step lines with a NaN loss —
    the stall detector never fires (r4 allspectra post-mortem). The NaN trip
    must kill the child and NOT restart it (rc=3)."""
    progress = tmp_path / "progress.log"
    child = tmp_path / "child.sh"
    child.write_text(
        "#!/bin/bash\n"
        "i=0\n"
        "while true; do\n"
        f"  echo \"step: $i, training_loss: nan, graphs/sec: 1000.0\" >> {progress}\n"
        "  i=$((i+500)); sleep 1\n"
        "done\n"
    )
    child.chmod(0o755)
    env = dict(
        os.environ,
        WATCHDOG_POLL_SECS="1",
        WATCHDOG_STALL_SECS="60",
        WATCHDOG_COMPILE_GRACE="60",
        WATCHDOG_MAX_RESTARTS="5",
        WATCHDOG_TERM_GRACE="2",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_with_watchdog.py"),
            str(progress),
            str(child),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert "NON-FINITE loss" in proc.stdout
    assert "restart 1/" not in proc.stdout  # never restarted


def test_watchdog_nan_trip_on_child_exit(tmp_path):
    """run_lib aborts itself on a non-finite loss (FloatingPointError); the
    watchdog must see the nan line written just before the exit and refuse
    to restart rather than treating it as a crash."""
    progress = tmp_path / "progress.log"
    child = tmp_path / "child.sh"
    child.write_text(
        "#!/bin/bash\n"
        f"echo 'step: 500, training_loss: 1.23000e-02, graphs/sec: 99.0' >> {progress}\n"
        "sleep 1\n"
        f"echo 'step: 1000, training_loss: nan, graphs/sec: 99.0' >> {progress}\n"
        "exit 17\n"
    )
    child.chmod(0o755)
    env = dict(
        os.environ,
        WATCHDOG_POLL_SECS="1",
        WATCHDOG_STALL_SECS="30",
        WATCHDOG_COMPILE_GRACE="30",
        WATCHDOG_MAX_RESTARTS="5",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_with_watchdog.py"),
            str(progress),
            str(child),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert "NOT restarting" in proc.stdout
    assert "restart 1/" not in proc.stdout
