"""Process-scoped scratch directories for write-path queries.

Registry queries that exercise sinks (sized sharding, versioned time
travel, artifact sinks) must write somewhere, and the DataFrame they
return is evaluated LAZILY by the caller — so per-call cleanup would
delete the files before the driver collects.  Instead every scratch
dir lives under one per-process root that is removed atexit, so
repeated invocations across a ~170-query driver/pytest session don't
accumulate orphaned temp dirs (they did before this module existed).

On a real cluster, point SPARK_GRAFT_SCRATCH at a shared filesystem
(HDFS/S3A fuse mount or NFS) — everything here is plain paths handed
to Hadoop-FS writers, nothing assumes driver-local disk except the
default /tmp root used for local[] testing.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        base = os.environ.get("SPARK_GRAFT_SCRATCH")
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_", dir=base)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the process scratch root; removed (with
    everything else) at interpreter exit, never mid-query."""
    return tempfile.mkdtemp(prefix=prefix, dir=_root())
