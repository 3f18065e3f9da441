"""Epoch-level training-state checkpointing and resume.

The reference's only failure recovery is per-class filesystem probing
(SURVEY §5 "Failure detection" row): a crash mid-class loses the whole
class's 200-epoch run. This adds the finer-grained layer: periodic orbax
snapshots of (trainable/opt_state/step, epoch) that `resume_or_init`
restores, so any trainer loop continues from the last completed epoch.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax

from polyp_tpu.utils.checkpoint import load_pytree, save_pytree


class EpochCheckpointer:
    """Saves train state every `every` epochs under
    `{dir}/epoch_{n}` + a `latest.json` pointer; prunes older snapshots."""

    def __init__(self, ckpt_dir: str | Path, every: int = 10, keep: int = 2):
        self.dir = Path(ckpt_dir)
        self.every = max(every, 1)
        self.keep = max(keep, 1)

    def _latest_path(self) -> Path:
        return self.dir / "latest.json"

    def save(self, epoch: int, state: Any, force: bool = False,
             aux: dict | None = None) -> bool:
        """`aux`: small JSON-serializable trainer extras (early-stopping
        counters, loss histories) snapshotted beside the pytree so a
        resumed run is byte-equivalent to an uninterrupted one."""
        if not force and (epoch + 1) % self.every != 0:
            return False
        path = self.dir / f"epoch_{epoch}"
        save_pytree(path, jax.device_get(state))
        if aux is not None:
            (self.dir / f"aux_{epoch}.json").write_text(json.dumps(aux))
        self._latest_path().write_text(json.dumps({"epoch": epoch}))
        self._prune(epoch)
        return True

    def _prune(self, current: int) -> None:
        snaps = sorted((int(p.name.split("_")[1]), p)
                       for p in self.dir.glob("epoch_*"))
        for e, p in snaps[: max(0, len(snaps) - self.keep)]:
            import shutil
            shutil.rmtree(p, ignore_errors=True)
            (self.dir / f"aux_{e}.json").unlink(missing_ok=True)

    def latest_epoch(self) -> int | None:
        if not self._latest_path().exists():
            return None
        return int(json.loads(self._latest_path().read_text())["epoch"])

    def restore(self, like: Any) -> tuple[Any, int] | None:
        """(state, next_epoch) from the newest snapshot, or None."""
        epoch = self.latest_epoch()
        if epoch is None:
            return None
        state = load_pytree(self.dir / f"epoch_{epoch}", like=like)
        return state, epoch + 1

    def restore_aux(self) -> dict | None:
        """The trainer-extras dict saved with the newest snapshot."""
        epoch = self.latest_epoch()
        if epoch is None:
            return None
        aux_path = self.dir / f"aux_{epoch}.json"
        return json.loads(aux_path.read_text()) if aux_path.exists() else None


def resume_or_init(ckptr: EpochCheckpointer | None, init_state: Any) -> tuple[Any, int]:
    """Standard trainer entry: restore the latest snapshot when present."""
    if ckptr is not None:
        restored = ckptr.restore(init_state)
        if restored is not None:
            return restored
    return init_state, 0
