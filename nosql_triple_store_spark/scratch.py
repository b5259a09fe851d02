"""Collision-safe scratch directories for materialized derived relations.

Several operators write a derived table once per ``sf_dir`` (co-purchase
edges, XML/binary-file fixtures, compaction layouts) and reread it across
queries. The path must be unique per *absolute* source dir — keying by
``basename(sf_dir)`` lets two dirs that share a basename (``/a/sf0.01``
and ``/b/sf0.01``) silently overwrite each other's parquet — and unique
per process, so concurrent drivers (pytest + bench + driver_check) never
overwrite a directory another plan is lazily reading.

At 100 TB the analog is a per-job staging prefix under the warehouse
(e.g. ``s3://warehouse/_staging/<job-id>/``) — same rule: derived-layout
paths are keyed by source identity + writer identity, never by a
human-readable shard name alone.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

# Every scratch path this process hands out is removed at interpreter
# exit (retention policy: scratch lives exactly as long as the process
# that created it — lazily-returned DataFrames are always collected
# before exit, and a long-lived host never accumulates dead per-pid
# dirs). ignore_errors: a half-written dir on crash must not mask the
# original exception.
_CREATED: list[str] = []


def _cleanup() -> None:  # pragma: no cover - exit hook
    for p in _CREATED:
        shutil.rmtree(p, ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(kind: str, sf_dir: str) -> str:
    """A per-(source-dir, process) scratch path for ``kind``.

    ``basename-hash`` keeps the path debuggable while the sha1 of the
    absolute path guarantees distinct sources never collide; the pid
    suffix isolates concurrent processes. Removed at process exit.
    """
    absdir = os.path.abspath(os.path.normpath(sf_dir))
    digest = hashlib.sha1(absdir.encode("utf-8")).hexdigest()[:10]
    tag = f"{os.path.basename(absdir)}-{digest}-{os.getpid()}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_{kind}", tag)
    _CREATED.append(path)
    return path


def scratch_tmp(prefix: str) -> str:
    """mkdtemp that is removed at process exit — use for streaming
    checkpoints / versioned view dirs instead of bare tempfile.mkdtemp
    (which leaks on a long-lived host)."""
    path = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(path)
    return path
