"""Pid-keyed scratch directories with stale-owner reaping.

Several driver queries persist side artifacts under /tmp (the LSH
reference layout, the compaction rewrite) keyed by ``os.getpid()`` so
concurrent driver/bench/pytest processes never collide. Without cleanup,
every process leaks its artifacts forever; this module is the single
implementation of the reap rule: a sibling pid-keyed dir whose owner
process is DEAD is removed, a live owner's dir is never touched.
"""

from __future__ import annotations

import os
import shutil


def pid_scratch_dir(root: str, prefix: str) -> str:
    """Return ``{root}/{prefix}{pid}`` (not created), after reaping any
    sibling ``{prefix}{other_pid}`` dirs whose owning process is dead."""
    mine = os.path.join(root, f"{prefix}{os.getpid()}")
    if os.path.isdir(root):
        for stale in os.listdir(root):
            if not stale.startswith(prefix):
                continue
            pid_str = stale[len(prefix):]
            if not pid_str.isdigit() or int(pid_str) == os.getpid():
                continue
            try:
                os.kill(int(pid_str), 0)
            except ProcessLookupError:
                shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
            except PermissionError:
                pass  # pid exists but is not ours — leave it
    return mine
