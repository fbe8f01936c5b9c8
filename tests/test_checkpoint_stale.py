"""Stale-snapshot ownership detection (`utils/checkpoint._owner_alive`).

A parked `.stale-<step>-<pid>` dir must be reclaimed when its owner died —
including when the pid was recycled by an unrelated process (ADVICE r3): a
bare /proc existence check would park the snapshot forever.
"""

import os
import time

from avsync.utils.checkpoint import _owner_alive


def _make_stale(tmp_path, pid):
    d = tmp_path / f".stale-5-{pid}"
    d.mkdir()
    return str(d)


def test_dead_pid_is_reclaimable(tmp_path):
    # find a pid that does not exist
    pid = 2
    while os.path.exists(f"/proc/{pid}") and pid < 100000:
        pid += 1
    assert not _owner_alive(str(pid), _make_stale(tmp_path, pid))


def test_live_owner_with_fresh_park_is_protected(tmp_path):
    # our own process parked the dir "just now": mtime postdates our start
    stale = _make_stale(tmp_path, os.getpid())
    os.utime(stale)  # the park-time stamp save() applies
    assert _owner_alive(str(os.getpid()), stale)


def test_pid_reuse_is_detected(tmp_path):
    # the dir was parked long before this process started -> the live
    # process with this pid cannot be the owner (pid reuse)
    stale = _make_stale(tmp_path, os.getpid())
    ancient = time.time() - 10 * 365 * 86400
    os.utime(stale, (ancient, ancient))
    assert not _owner_alive(str(os.getpid()), stale)
