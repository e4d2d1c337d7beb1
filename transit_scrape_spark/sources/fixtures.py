"""Content-fingerprinted, atomically-created /tmp fixture directories.

The r1 pattern — cache dirs keyed only on the sf_dir *path* with a
_DONE marker — had two failure modes: (1) fixture contents changing at
the same path serve stale data forever, and (2) two concurrent sessions
can interleave a partial build with a read. Fixes here:

- the cache key includes a fingerprint of the fixture parquet set
  (file name, size, mtime_ns), so changed content yields a fresh dir;
- builds go into a temp sibling and are os.rename()d into place —
  readers either see nothing (and build their own) or a complete dir,
  never a partial one. A lost rename race just discards the duplicate.

Streaming sink/checkpoint dirs can NOT use the rename step (Spark's
FileStreamSink _spark_metadata and checkpoints record absolute paths),
so they use fingerprinted paths with in-place builds — staleness is
solved; concurrent first-builds of the same content remain the caller's
(documented) limitation.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import uuid
from typing import Callable


def content_tag(sf_dir: str) -> str:
    """Path tag + short content fingerprint of the sf_dir parquet set.

    Safe for file names and SQL identifiers (alnum + underscore only).
    """
    h = hashlib.sha256()
    for name in sorted(os.listdir(sf_dir)):
        if name.endswith(".parquet"):
            st = os.stat(os.path.join(sf_dir, name))
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    # anything non-identifier (hyphens in pytest tmp dirs, etc.) -> _
    tag = re.sub(r"[^0-9A-Za-z_]", "_", sf_dir.strip("/"))
    return f"{tag}_{h.hexdigest()[:10]}"


def fixture_dir(prefix: str, sf_dir: str, build: Callable[[str], None]) -> str:
    """Return a build-once /tmp dir for (prefix, sf_dir content).

    ``build(tmp_path)`` must populate the passed (empty, existing)
    directory; it is renamed into place atomically on success.
    """
    final = f"/tmp/{prefix}_{content_tag(sf_dir)}"
    if os.path.isdir(final):
        return final
    tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp)
    try:
        build(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            pass  # concurrent builder won the rename; ours is discarded
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final
