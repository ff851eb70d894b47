"""Filesystem abstraction for the store's directory mutations and sweeps.

Everything the engine does to storage outside of Spark itself — swapping a
materialized result, compacting a segment directory, sweeping Parquet
footers for pruning — funnels through a `Storage` object so an
object-store backend can be slotted in without touching engine code.

Why an abstraction is needed at 100 TB (reference parity note: the
reference is a single-node engine writing POSIX segments,
src/engine/core/segment/; a Spark deployment reads from a lake):

- POSIX `os.replace` is atomic. Object stores (S3/GCS/ABFS) have no
  rename at all — "rename" is copy+delete, non-atomic, and directories
  are just key prefixes. So the layer does NOT promise atomic rename.
  `publish_dir`'s portable contract is weaker and sufficient:
    1. there is never a moment with zero readable copies of `dst` — the
       previous live copy is moved aside BEFORE the new one lands and
       removed only AFTER, and
    2. a crash at any step is repaired by `recover_dir`, which is
       idempotent and cheap (metadata-only), called by readers before
       first open.
  An S3-backed implementation satisfies the same two clauses with a
  manifest-pointer convention instead of renames: write the new copy
  under a fresh versioned prefix, flip one small "current" pointer
  object (single-key PUT is atomic on S3/GCS/ABFS), then GC the old
  prefix. `LocalStorage` uses renames because it can.

- `walk_parquet` abstracts the footer sweeps (top-k file pruning,
  context range layout, high-water-mark probes). Local = os.walk;
  object store = one LIST call over the prefix (flat — no recursion
  needed, keys are already enumerable).

Publish protocol (LocalStorage):

    staging = storage.stage_path(dst)      # dst + ".staging"
    <write the new copy under staging>     # e.g. df.write.parquet(...)
    storage.publish_dir(dst)               # old->aside, staging->dst, GC

Crash matrix for `recover_dir(dst)`:
    dst present                -> GC stray .old/.staging (crash after step
                                  2 or before publish started); done.
    dst missing, .old present  -> crash between step 1 and 2: restore
                                  .old (the previous live copy — it is
                                  the one the manifest hwm describes);
                                  the staged copy is discarded, the next
                                  refresh re-derives it idempotently.
    dst missing, only .staging -> first publish crashed mid-flight (there
                                  never was a live copy): promote staging.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator


class Storage:
    """Directory-level storage operations. See module docstring for the
    object-store portability contract each method must honor."""

    _STAGING = ".staging"
    _OLD = ".old"

    # -- primitive ops (override these per backend) -----------------------
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        """Delete a directory tree; silent no-op when absent."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Move a directory. Local: atomic os.replace. Object store:
        implemented as pointer-flip (see module docstring), never called
        on data keys."""
        raise NotImplementedError

    def walk_parquet(self, root: str) -> Iterator[str]:
        """Yield every *.parquet file path under `root` (recursive)."""
        raise NotImplementedError

    # -- derived protocol (backend-independent) ---------------------------
    def stage_path(self, dst: str) -> str:
        return dst + self._STAGING

    def publish_dir(self, dst: str) -> None:
        """Make the staged copy at `stage_path(dst)` the live copy.
        Preconditions: the staged copy is complete (the caller finished
        writing it). Postcondition clauses 1-2 of the module contract."""
        staging, old = self.stage_path(dst), dst + self._OLD
        if not self.exists(staging):
            raise FileNotFoundError(f"no staged copy at {staging}")
        self.remove_tree(old)  # leftover from an already-recovered crash
        if self.exists(dst):
            self.rename(dst, old)  # step 1: previous copy moved aside
        self.rename(staging, dst)  # step 2: staged copy goes live
        self.remove_tree(old)  # step 3: GC

    def recover_dir(self, dst: str) -> None:
        """Repair a crashed publish; idempotent, cheap when clean."""
        staging, old = self.stage_path(dst), dst + self._OLD
        if not self.exists(dst):
            if self.exists(old):
                self.rename(old, dst)
            elif self.exists(staging):
                self.rename(staging, dst)
        self.remove_tree(old)
        self.remove_tree(staging)


class LocalStorage(Storage):
    """POSIX filesystem backend (the only one runnable in this repo's
    environment; the class boundary is what a cloud deployment swaps)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def walk_parquet(self, root: str) -> Iterator[str]:
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                if f.endswith(".parquet"):
                    yield os.path.join(dirpath, f)


#: process-wide default; engine components take a `storage=` override.
LOCAL = LocalStorage()
