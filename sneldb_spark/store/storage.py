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
  `ObjectStoreStorage` (below) satisfies the same two clauses with a
  pointer convention instead of renames: write the new copy under a
  fresh versioned prefix, flip one small "current" pointer object
  (single-key PUT is atomic on S3/GCS/ABFS), then GC the old prefix.
  `LocalStorage` uses renames because it can. Readers resolve the live
  copy through `resolve()` (identity on POSIX).

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
import re
import shutil
from collections.abc import Iterator


class Storage:
    """Directory-level storage operations. See module docstring for the
    object-store portability contract each method must honor."""

    _STAGING = ".staging"
    _OLD = ".old"

    def resolve(self, path: str) -> str:
        """Physical location of the live copy of a publish-managed
        directory. Local = the path itself (renames keep the live copy AT
        `path`); object store = the pointer's current versioned prefix.
        Readers and live-dir appenders pass managed paths through this
        before opening; identity for unmanaged paths on every backend."""
        return path

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


class ObjectClient:
    """Minimal object-store client surface — the four operations every
    real object store (S3/GCS/ABFS) offers and the ONLY ones
    :class:`ObjectStoreStorage` uses. Notably absent: rename/move (object
    stores have none) and any directory concept (keys are flat strings;
    "directories" are key prefixes)."""

    def put(self, key: str, data: bytes) -> None:
        """Create or replace one object. Single-key put is atomic —
        readers see the old bytes or the new bytes, never a mix (true on
        S3/GCS/ABFS; the pointer-flip protocol rests on this)."""
        raise NotImplementedError

    def get(self, key: str) -> bytes:
        """Read one object; KeyError when absent."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All object keys that start with `prefix` (raw string-prefix
        match, no delimiter semantics — S3 ListObjectsV2 without a
        Delimiter)."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Delete one object; silent no-op when absent."""
        raise NotImplementedError


class DirObjectClient(ObjectClient):
    """Directory-backed object-store fake: keys are absolute file paths
    under a bucket root, objects are the files themselves. This is the
    test double for the protocol AND the shape a real deployment takes —
    Spark writes parquet straight into the versioned prefixes (exactly as
    it writes `s3a://` prefixes in production) while every directory
    MUTATION goes through the four-op client API above. The fake never
    renames on behalf of the storage layer."""

    def __init__(self, bucket_root: str):
        self.bucket_root = os.path.abspath(bucket_root)
        os.makedirs(self.bucket_root, exist_ok=True)

    def _check(self, key: str) -> str:
        key = os.path.abspath(key)
        if not key.startswith(self.bucket_root + os.sep):
            raise ValueError(f"key {key!r} outside bucket {self.bucket_root!r}")
        return key

    def put(self, key: str, data: bytes) -> None:
        key = self._check(key)
        os.makedirs(os.path.dirname(key), exist_ok=True)
        # atomic single-key put: write-temp + os.replace of ONE file (this
        # is the fake's stand-in for S3's atomic object PUT; the storage
        # layer itself never renames)
        tmp = key + ".__put_tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)

    def get(self, key: str) -> bytes:
        key = self._check(key)
        try:
            with open(key, "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            raise KeyError(key) from None

    def list(self, prefix: str) -> list[str]:
        # raw string-prefix semantics: abspath would drop a trailing
        # separator and make "data/" match "data.v1/..." — keep it
        trailing = prefix.endswith(("/", os.sep))
        prefix = os.path.abspath(prefix) + (os.sep if trailing else "")
        # every matching key lives under the prefix's parent directory:
        # walk from there (or the prefix itself when it IS a directory)
        # instead of the whole bucket, so a LIST over one type's prefix
        # does not pay for every other object in the store
        base = prefix.rstrip(os.sep)
        start = base if os.path.isdir(base) else os.path.dirname(base)
        if not (start + os.sep).startswith(self.bucket_root + os.sep) and (
            start != self.bucket_root
        ):
            start = self.bucket_root
        if not os.path.isdir(start):
            return []
        out = []
        for dirpath, _dirs, files in os.walk(start):
            for fn in files:
                p = os.path.join(dirpath, fn)
                if p.startswith(prefix):
                    out.append(p)
        return sorted(out)

    def delete(self, key: str) -> None:
        key = self._check(key)
        try:
            os.remove(key)
        except (FileNotFoundError, IsADirectoryError):
            return
        # prune now-empty parent dirs so Spark/os listings don't see
        # phantom empty directories (real object stores have no dirs)
        d = os.path.dirname(key)
        while d != self.bucket_root:
            try:
                os.rmdir(d)
            except OSError:
                break
            d = os.path.dirname(d)


class ObjectStoreStorage(Storage):
    """Object-store backend: the module docstring's versioned-prefix +
    pointer-flip mapping, concretely.

    Layout for a managed logical directory `dst`:

    - data lives under versioned prefixes ``dst.v1/``, ``dst.v2/``, ...
      (or under the raw ``dst/`` prefix before the first publish — a dir
      populated by direct writes, e.g. a state dir at REMEMBER time);
    - one small pointer object at key ``dst + ".ptr"`` holds the prefix
      of the current live copy. ``resolve`` reads it (identity fallback).

    Protocol mapping (same two contract clauses as LocalStorage):

    - ``stage_path(dst)``  -> a FRESH prefix ``dst.v{max+1}`` (a crashed
      partial staging is never reused — its number is burned);
    - ``publish_dir(dst)`` -> atomic single-key pointer put to the newest
      staged prefix, THEN GC of every other copy (old versions + raw
      prefix). Clause 1 holds because the flip precedes all deletes;
    - ``recover_dir(dst)`` -> pointer present: GC non-target prefixes.
      Pointer absent with a live raw prefix: staged scratch discarded
      (the local matrix's "dst present -> GC strays"). Pointer absent,
      no raw copy, staged prefix(es) present: promote the newest (the
      local matrix's first-publish-crash row — staging completeness is
      the same caller precondition LocalStorage documents). There is NO
      "previous copy moved aside" window at all: the flip is atomic, so
      the `.old`-restore row of the local matrix is unreachable here.

    ``rename`` raises: nothing in the engine calls it on this backend —
    the protocol methods above are overridden wholesale, which is the
    point (object stores cannot rename).

    Naming: the ``.v<n>`` / ``.ptr`` suffixes are reserved namespace for
    managed dirs; sibling keys that collide with them are a caller bug.
    """

    _PTR = ".ptr"
    _VER = re.compile(r"\.v(\d+)(?:/|$)")

    def __init__(self, client: ObjectClient):
        self.client = client

    # -- pointer helpers ---------------------------------------------------
    def _ptr_key(self, path: str) -> str:
        return path.rstrip("/") + self._PTR

    def _target(self, path: str) -> str | None:
        try:
            return self.client.get(self._ptr_key(path)).decode("utf-8")
        except KeyError:
            return None

    def _versions(self, dst: str) -> list[int]:
        vs = set()
        plen = len(dst) + 2  # past ".v"
        for k in self.client.list(dst + ".v"):
            m = self._VER.match(k[plen - 2:])
            if m:
                vs.add(int(m.group(1)))
        return sorted(vs)

    def _gc_prefix(self, prefix: str) -> None:
        for k in self.client.list(prefix.rstrip("/") + "/"):
            self.client.delete(k)

    # -- Storage API -------------------------------------------------------
    def resolve(self, path: str) -> str:
        t = self._target(path)
        return t if t is not None else path

    def exists(self, path: str) -> bool:
        if self._target(path) is not None:
            return True
        if self.client.list(path.rstrip("/") + "/"):
            return True
        try:
            self.client.get(path)
            return True
        except KeyError:
            return False

    def is_dir(self, path: str) -> bool:
        return bool(self.client.list(self.resolve(path).rstrip("/") + "/"))

    def makedirs(self, path: str) -> None:
        # object stores have no directories; nothing to create
        return

    def remove_tree(self, path: str) -> None:
        t = self._target(path)
        if t is not None:
            self._gc_prefix(t)
            self.client.delete(self._ptr_key(path))
        self._gc_prefix(path)
        # reserved version namespace + any nested pointers ride under the
        # same string prefix (`path.v3/...`, `path/sub.ptr`) — sweep them
        for k in self.client.list(path.rstrip("/") + ".v"):
            self.client.delete(k)

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError(
            "object stores cannot rename; ObjectStoreStorage overrides the "
            "publish/recover protocol with pointer flips instead"
        )

    def walk_parquet(self, root: str) -> Iterator[str]:
        for k in self.client.list(self.resolve(root).rstrip("/") + "/"):
            if k.endswith(".parquet"):
                yield k

    # -- publish protocol (pointer-flip; no renames anywhere) --------------
    def stage_path(self, dst: str) -> str:
        vs = self._versions(dst)
        return f"{dst}.v{(vs[-1] + 1) if vs else 1}"

    def publish_dir(self, dst: str) -> None:
        cur = self._target(dst)
        vs = self._versions(dst)
        staged = f"{dst}.v{vs[-1]}" if vs else None
        if staged is None or staged == cur:
            raise FileNotFoundError(f"no staged copy at {dst}.v*")
        # the flip: one atomic single-key put — before it the old copy is
        # live, after it the new one is; there is never a zero-copy moment
        self.client.put(self._ptr_key(dst), staged.encode("utf-8"))
        for v in vs[:-1]:
            self._gc_prefix(f"{dst}.v{v}")
        if cur is not None and cur != staged:
            self._gc_prefix(cur)
        self._gc_prefix(dst)  # pre-pointer raw copy, if that was live

    def recover_dir(self, dst: str) -> None:
        cur = self._target(dst)
        vs = self._versions(dst)
        if cur is not None:
            for v in vs:
                if f"{dst}.v{v}" != cur:
                    self._gc_prefix(f"{dst}.v{v}")
            self._gc_prefix(dst)
            return
        if self.client.list(dst.rstrip("/") + "/"):
            # live copy is the raw prefix; staged scratch is discarded and
            # re-derived by the next refresh (matrix: dst present)
            for v in vs:
                self._gc_prefix(f"{dst}.v{v}")
            return
        if vs:
            # first publish crashed after staging, before the flip
            self.client.put(
                self._ptr_key(dst), f"{dst}.v{vs[-1]}".encode("utf-8")
            )
            for v in vs[:-1]:
                self._gc_prefix(f"{dst}.v{v}")


#: process-wide default; engine components take a `storage=` override.
LOCAL = LocalStorage()
