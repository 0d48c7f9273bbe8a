"""Trainer stall watchdog (bin/train._start_stall_watchdog): a training
process hung on a lost remote-device request must exit (rc=17) so the
segment supervisor relaunches it from the newest checkpoint — while healthy
runs (heartbeat advancing) and slow-but-alive runs inside the bound are
never killed (SURVEY.md §5 failure detection)."""

import threading
import time

import pytest

from fastvocoder_tpu.bin.train import _start_stall_watchdog


@pytest.fixture(autouse=True)
def _quiet_thread_excepthook(monkeypatch):
    """The driver helpers below stop the watchdog thread by raising _Stop
    from the injected sleep/exit; keep those intentional exits out of
    stderr."""
    orig = threading.excepthook

    def hook(args):
        if not issubclass(args.exc_type, _Stop):
            orig(args)

    monkeypatch.setattr(threading, "excepthook", hook)


class _Stop(Exception):
    pass


def _drive(heartbeat, stall_exit_s, tmp_path, ticks=4, tick=None):
    """Run the watchdog body inline (not as a thread) with injected
    sleep/exit; `tick(i)` can mutate the heartbeat per iteration.
    -> recorded exit code or None."""
    n = [0]
    exited = []

    def fake_sleep(_):
        if tick:
            tick(n[0])
        n[0] += 1
        if n[0] > ticks:
            raise _Stop

    def fake_exit(code):
        exited.append(code)
        raise _Stop

    th = _start_stall_watchdog(
        heartbeat, stall_exit_s, str(tmp_path),
        exit_fn=fake_exit, sleep_fn=fake_sleep,
    )
    th.join(timeout=10)
    assert not th.is_alive()
    return exited[0] if exited else None


def test_fires_on_stalled_heartbeat(tmp_path):
    hb = [time.monotonic() - 100.0]  # last progress 100s ago
    assert _drive(hb, 10.0, tmp_path) == 17
    # the event is recorded in the run's own log
    assert "stall watchdog" in (tmp_path / "logger.txt").read_text()


def test_holds_while_heartbeat_advances(tmp_path):
    hb = [time.monotonic()]

    def tick(_):
        hb[0] = time.monotonic()  # the train loop keeps making progress

    assert _drive(hb, 10.0, tmp_path, ticks=5, tick=tick) is None


def test_holds_inside_grace(tmp_path):
    # a slow step (or a segment-start compile, which gets 2x grace via the
    # future-dated initial heartbeat) must not be killed inside the bound
    hb = [time.monotonic() - 5.0]
    assert _drive(hb, 10.0, tmp_path) is None


def test_run_defaults_tolerate_missing_arg():
    """run() reads stall_exit_s via getattr so pre-existing callers that
    build argparse.Namespace by hand keep working."""
    from argparse import Namespace

    assert getattr(Namespace(), "stall_exit_s", 900) == 900
