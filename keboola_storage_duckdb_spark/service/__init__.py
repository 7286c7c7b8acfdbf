"""HTTP/wire service surface over the StorageEngine.

The reference is usable only through its FastAPI routes + gRPC handlers
(reference src/main.py, src/unified_server.py); this package provides the
same workflow surface on the engine:

  * ``app.create_app``     — REST API (Flask; same paths/JSON shapes as the
                             reference routers, with X-Idempotency-Key
                             replay and optional X-API-Key auth)
  * ``files.FileStore``    — 3-stage file staging (prepare/upload/register)

Planned (reference parity not yet built): the S3-compatible object API with
SigV4 (src/routers/s3_compat.py) and the PG-wire SQL endpoint
(src/pgwire_server.py).
"""

from .files import FileStore  # noqa: F401
