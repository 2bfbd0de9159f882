"""Multi-process FileLocker stress: mutual exclusion under contention
and lease recovery after SIGKILL of the holder (reference analog:
Postgres advisory locks + lease expiry, ffsync/).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from embeddinghub_tpu.featurestore.ffsync import FileLocker

lock_dir, counter, done, n_inc = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
locker = FileLocker(lock_dir, lease_s=30.0)
ok = 0
for _ in range(n_inc):
    key = locker.lock("counter", wait=True)
    try:
        val = int(open(counter).read())
        time.sleep(0.002)  # widen the race window
        open(counter, "w").write(str(val + 1))
        ok += 1
    finally:
        locker.unlock(key)
open(done, "w").write(str(ok))
"""

HOLDER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from embeddinghub_tpu.featurestore.ffsync import FileLocker

locker = FileLocker(sys.argv[1], lease_s=float(sys.argv[2]))
locker.lock("counter", wait=True)
open(sys.argv[3], "w").write("held")
time.sleep(600)
"""


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_mutual_exclusion_across_processes(tmp_path):
    lock_dir = str(tmp_path / "locks")
    counter = str(tmp_path / "counter")
    open(counter, "w").write("0")
    n_workers, n_inc = 4, 12
    procs = []
    for i in range(n_workers):
        done = str(tmp_path / f"done{i}")
        procs.append((subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO),
             lock_dir, counter, done, str(n_inc)],
            env=_env(),
        ), done))
    total = 0
    for p, done in procs:
        assert p.wait(timeout=120) == 0
        total += int(open(done).read())
    assert total == n_workers * n_inc
    # no lost updates => mutual exclusion held
    assert int(open(counter).read()) == total


def test_lease_recovers_after_sigkill(tmp_path):
    lock_dir = str(tmp_path / "locks")
    flag = str(tmp_path / "held")
    lease = 2.0
    holder = subprocess.Popen(
        [sys.executable, "-c", HOLDER.format(repo=REPO),
         lock_dir, str(lease), flag],
        env=_env(),
    )
    deadline = time.time() + 30
    while not os.path.exists(flag):
        assert time.time() < deadline, "holder never acquired"
        time.sleep(0.05)
    holder.kill()  # SIGKILL mid-hold: unlock never runs
    holder.wait()

    from embeddinghub_tpu.featurestore.ffsync import FileLocker

    locker = FileLocker(lock_dir, lease_s=5.0)
    t0 = time.monotonic()
    key = locker.lock("counter", wait=True)  # must acquire via lapse
    waited = time.monotonic() - t0
    locker.unlock(key)
    assert waited <= lease + 3.0, f"lease lapse took {waited:.1f}s"
