"""Pluggable shared-storage layer for the chunk handoff.

The reference's deployment story uploads partition files to a blob store
between phases (reference README.md:60-67,78-84: mappers upload their
partition files to S3, reducers download them). The cluster-real analog in
this engine: executor tasks write chunk files straight to shared storage
through the ``mr_chunks`` writer, each task reports (partition, file, rows)
in its ``WriterCommitMessage``, and the driver's commit publishes a
``_MANIFEST.json`` built from those messages. The partition->path map is
then read from the manifest — never from a directory listing — so the
handoff works against any storage a backend can reach (the previous
driver-side ``os.listdir`` only worked for locally-mounted paths).

A backend is any object with five small operations::

    makedirs(dir_uri)                  # idempotent
    exists(uri) -> bool
    read_text(uri) -> str
    write_text_atomic(uri, text)       # readers never see a partial file
    put_file_atomic(local_path, uri)   # publish a finished local file

plus an optional ``delete(uri)`` used by the writer's abort cleanup
(backends without it simply skip unpublishing on job failure).

The local backend (plain paths and ``file://`` URIs; NFS mounts count — a
mounted path IS shared storage) ships here. An object-store deployment
registers its client at session start::

    register_storage_backend("s3", MyS3Backend())   # e.g. boto3-based

``put_file_atomic`` maps naturally onto object stores: a single PUT (or
completed multipart upload) is atomic — the object is invisible until
complete — which is exactly the publish semantics the local backend gets
from write-hidden-then-rename.
"""

from __future__ import annotations

import os
import re
import shutil

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def uri_scheme(uri: str) -> str:
    """'' for plain local paths; 's3' for s3://..., 'dbfs' for dbfs:/..."""
    m = _SCHEME_RE.match(uri)
    return m.group(1).lower() if m else ""


def join_uri(base: str, name: str) -> str:
    return base.rstrip("/") + "/" + name


class LocalStorage:
    """Plain paths and file:// URIs on a locally-mounted filesystem."""

    @staticmethod
    def _p(uri: str) -> str:
        return uri[len("file://"):] if uri.startswith("file://") else uri

    def makedirs(self, uri: str) -> None:
        os.makedirs(self._p(uri), exist_ok=True)

    def exists(self, uri: str) -> bool:
        return os.path.exists(self._p(uri))

    def read_text(self, uri: str) -> str:
        with open(self._p(uri), encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, uri: str, text: str) -> None:
        path = self._p(uri)
        tmp = os.path.join(
            os.path.dirname(path) or ".", "." + os.path.basename(path) + ".tmp"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)

    def delete(self, uri: str) -> None:
        """Optional operation (used by the writer's abort cleanup)."""
        p = self._p(uri)
        if os.path.exists(p):
            os.unlink(p)

    def put_file_atomic(self, local_path: str, uri: str) -> None:
        # land under a '.'-prefixed temp name (invisible to the chunk
        # readers' listing filters), then rename: a concurrent tailer can
        # never observe a half-copied file
        dst = self._p(uri)
        tmp = os.path.join(
            os.path.dirname(dst) or ".", "." + os.path.basename(dst) + ".tmp"
        )
        shutil.move(local_path, tmp)  # rename when same fs, copy+unlink across
        os.replace(tmp, dst)


class PrefixMappedStorage(LocalStorage):
    """A backend that maps ``scheme://rest`` onto ``<root>/rest`` on a
    locally-reachable filesystem, exercising the FULL object-store dispatch
    path (scheme resolution, driver-side registration, pickling into the
    executor-side writer, atomic publish) without a real object store —
    the test double for an s3/gcs backend, and a usable backend in its own
    right for a mounted bucket (s3fs/goofys-style mounts)."""

    def __init__(self, scheme: str, root: str):
        self.scheme = scheme.lower()
        self.root = root

    def _p(self, uri: str) -> str:  # type: ignore[override]
        prefix = f"{self.scheme}://"
        if not uri.lower().startswith(prefix):
            raise ValueError(f"{uri!r} is not a {prefix} URI")
        return os.path.join(self.root, uri[len(prefix):])


_BACKENDS: dict[str, object] = {"": LocalStorage(), "file": LocalStorage()}


def register_storage_backend(scheme: str, backend: object) -> None:
    """Make ``scheme://`` URIs usable by the chunk handoff. The backend
    object must provide the five operations in the module docstring and be
    PICKLABLE: registration happens on the driver only —
    ``Job.shuffle_to_files`` resolves the backend here and ships it to the
    writer's worker processes as a cloudpickle option (pickle_backend), so
    no other process ever needs registry setup (an s3 client wrapper
    implements ``__reduce__`` to reconnect lazily on the worker)."""
    _BACKENDS[scheme.lower()] = backend


def pickle_backend(backend: object) -> str:
    """Serialize a backend for transport inside DataSource options (which
    are string-only). PySpark 4 initializes Python data source writers in
    a SEPARATE Python worker process, so a driver-side registry is not
    visible there — the resolved backend rides along as a cloudpickle
    blob instead, and no process beyond the driver ever needs
    register_storage_backend to have run."""
    import base64

    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(backend)).decode("ascii")


def unpickle_backend(blob: str) -> object:
    import base64

    from pyspark import cloudpickle

    return cloudpickle.loads(base64.b64decode(blob.encode("ascii")))


def storage_for(uri: str):
    scheme = uri_scheme(uri)
    backend = _BACKENDS.get(scheme)
    if backend is None:
        raise ValueError(
            f"no storage backend registered for scheme {scheme!r} "
            f"(path {uri!r}); register one with "
            "map_reduce_ruby_spark.sources.storage.register_storage_backend"
            "(scheme, backend) — any object with makedirs/exists/read_text/"
            "write_text_atomic/put_file_atomic (e.g. a boto3 wrapper for s3)"
        )
    return backend
