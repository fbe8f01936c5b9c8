"""Orbax checkpointing with the full config embedded.

Replaces the reference's three ad-hoc torch/Keras schemes (SURVEY §5):
every checkpoint carries {params, opt_state?, step, config-JSON, metrics} so
any tool can self-configure from the checkpoint alone (the one good idea in
`misalignment_detection_train.py:312-318`, generalized). `.pth` interop lives
in avsync/compat.py; this module is the native format.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

from avsync.config import AvsyncConfig


def _owner_alive(pid: str, stale_dir: str) -> bool:
    """Is the process that parked `stale_dir` still running?

    A bare /proc/<pid> existence check is fooled by pid reuse: an unrelated
    process inheriting the pid would keep the parked snapshot unreclaimable
    forever (and a missing step dir then silently loses that step). Guard:
    the owner parked the dir at (about) the dir's mtime, so a live process
    whose start time POSTDATES the mtime cannot be the owner.
    """
    try:
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        # field 22 (1-indexed) is starttime in clock ticks since boot; the
        # comm field (2) may contain spaces/parens, so split after the ')'
        start_ticks = int(stat.rsplit(")", 1)[1].split()[19])
        with open("/proc/stat") as f:
            btime = next(
                int(line.split()[1]) for line in f if line.startswith("btime")
            )
        start_epoch = btime + start_ticks / os.sysconf("SC_CLK_TCK")
        # 5 s slack: the dir is renamed moments after the process starts at
        # the earliest, never before
        return start_epoch <= os.path.getmtime(stale_dir) + 5.0
    except (OSError, ValueError, IndexError, StopIteration):
        return False  # no such pid (or unreadable stat) — owner is gone


class CheckpointManager:
    """Thin Orbax wrapper: save/restore pytrees + config metadata.

    Directory layout: <root>/<step>/  (Orbax composite: 'state' pytree +
    'meta' JSON). The trainer writes the terminal snapshot as step
    final_epoch+1 (the reference's `lipnet_final.pth` analogue,
    `trainer.py:156`).
    """

    def __init__(self, root: str, max_to_keep: Optional[int] = None):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        # Recover crash leftovers from interrupted same-step re-saves: a
        # `.stale-<step>-<pid>` dir is the parked previous snapshot. If the
        # step dir survived (replacement finished), the stale copy is
        # garbage; if not, the stale copy IS the snapshot — restore it.
        # Guards: skip dirs whose owner pid is still alive (a read-only
        # consumer opening a live training run must not race the writer's
        # in-flight re-save), and rsplit so step names that themselves
        # contain '-' parse correctly.
        for name in os.listdir(self.root):
            if not name.startswith(".stale-"):
                continue
            stale = os.path.join(self.root, name)
            try:
                step_name, pid = name[len(".stale-"):].rsplit("-", 1)
                int(step_name)  # must be a step directory name
            except ValueError:
                continue
            if not step_name or _owner_alive(pid, stale):
                continue  # owner still running — not ours to reclaim
            dst = os.path.join(self.root, step_name)
            if os.path.isdir(dst):
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
            else:
                os.rename(stale, dst)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        state: Any,
        config: Optional[AvsyncConfig] = None,
        metrics: Optional[Dict[str, Any]] = None,
    ) -> None:
        meta: Dict[str, Any] = {}
        stale = None
        if step in self._mgr.all_steps():
            # Last-write-wins, crash-safely: park the existing snapshot under
            # a non-step name (atomic rename), write the replacement, and
            # only then remove the old one — a crash mid-save leaves
            # `.stale-<step>` intact (rename it back to `<step>` to recover)
            # instead of destroying the only copy.
            src = self._step_dir(step)
            if src is not None:
                stale = os.path.join(self.root, f".stale-{step}-{os.getpid()}")
                os.rename(src, stale)
                # stamp the park moment (rename preserves the dir's original
                # save-time mtime): _owner_alive compares the owner's start
                # time against THIS timestamp to detect pid reuse
                os.utime(stale)
                self._mgr.reload()
            else:  # step tracked but dir missing: fall back to orbax delete
                self._mgr.delete(step)
        if config is not None:
            meta["config"] = config.to_dict()
        if metrics is not None:
            meta["metrics"] = {
                k: (float(v) if np.isscalar(v) or hasattr(v, "item") else v)
                for k, v in metrics.items()
            }
        try:
            self._mgr.save(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(state),
                    meta=ocp.args.JsonSave(meta),
                ),
            )
            self._mgr.wait_until_finished()
        except BaseException:
            # replacement failed (disk full, interrupt): put the parked
            # snapshot back so the step stays restorable without manual
            # intervention
            if stale is not None and os.path.isdir(stale):
                import shutil

                dst = os.path.join(self.root, str(step))
                shutil.rmtree(dst, ignore_errors=True)  # partial replacement
                os.rename(stale, dst)
                self._mgr.reload()
            raise
        if stale is not None:
            import shutil

            shutil.rmtree(stale, ignore_errors=True)

    def _step_dir(self, step: int) -> Optional[str]:
        """On-disk directory of an existing step snapshot, if present."""
        p = os.path.join(self.root, str(step))
        return p if os.path.isdir(p) else None

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Returns (state, meta). `template` (a pytree of like-shaped arrays)
        restores into matching shardings/dtypes when provided."""
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.root}")
        if template is not None:
            restored = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    meta=ocp.args.JsonRestore(),
                ),
            )
        else:
            restored = self._mgr.restore(step)
        meta = restored.get("meta") or {}
        return restored["state"], meta

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()

    @staticmethod
    def config_from_meta(meta: Dict[str, Any]) -> Optional[AvsyncConfig]:
        if "config" in meta:
            return AvsyncConfig.from_dict(meta["config"])
        return None
