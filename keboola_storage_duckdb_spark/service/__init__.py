"""HTTP/wire service surface over the StorageEngine.

The reference is usable only through its FastAPI routes + gRPC handlers
(reference src/main.py, src/unified_server.py); this package provides the
same workflow surface on the engine:

  * ``app.create_app``     — REST API (Flask; same paths/JSON shapes as the
                             reference routers, with X-Idempotency-Key
                             replay, optional X-API-Key auth, /metrics)
  * ``files.FileStore``    — 3-stage file staging (prepare/upload/register)
  * ``s3.S3Api``           — S3-compatible object API (SigV4 + presigned
                             URLs + ListObjectsV2), mounted under /s3
  * ``pgwire.PgWireServer``— PostgreSQL wire-protocol SQL endpoint over
                             the engine's project views
  * ``metrics.Metrics``    — Prometheus text-format counters
  * ``driver.driver_blueprint`` — the driver command bridge: the
                             reference's 35 JSON protocol commands
                             dispatched onto the engine (/driver/execute)
"""

from .files import FileStore  # noqa: F401
