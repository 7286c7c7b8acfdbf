"""S3-compatible object API (SURVEY S10) — Flask blueprint.

Re-expresses the reference's S3 compatibility layer
(src/routers/s3_compat.py:621-1057, SigV4 verification :169-521): S3
clients (boto3 / aws-cli / rclone) address a project's file area as a
bucket:

    bucket            "project_<id>" or bare "<id>"  → project
    object key        path under the project's object dir
    GET/PUT/DELETE/HEAD /s3/<bucket>/<key>
    GET /s3/<bucket>?list-type=2&prefix=…            → ListObjectsV2 XML
    POST /s3/<bucket>/presign                        → pre-signed URL

Authentication, checked in order (reference `_check_presign_or_auth`):
  1. AWS Signature V4 — full canonical-request verification per the public
     AWS spec (method, URI, query, SignedHeaders, payload hash; signing key
     derived AWS4-HMAC-SHA256 over date/region/service), constant-time
     compare, x-amz-date replay window.
  2. Pre-signed URL — HMAC-SHA256 over "METHOD\nbucket\nkey\nexpires
     [\ncontent_type]", url-safe base64, ?signature=…&expires=….
  3. X-API-Key — the engine's sha256-stored API keys.

ETag = md5 of content (S3 semantics for non-multipart uploads). Errors are
S3-shaped XML (NoSuchBucket / NoSuchKey / AccessDenied /
SignatureDoesNotMatch).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import secrets
import shutil
import time
import urllib.parse
import uuid
from datetime import datetime, timezone
from xml.sax.saxutils import escape

from flask import Blueprint, Response, jsonify, request


class S3Config:
    def __init__(self, access_key_id: str = "storage-s3",
                 secret_access_key: str | None = None,
                 presign_secret: str | None = None,
                 max_age_seconds: int = 15 * 60) -> None:
        self.access_key_id = access_key_id
        # random per-process defaults mirror the reference's generated key
        # (presigned URLs then don't survive restarts — documented there too)
        self.secret_access_key = secret_access_key or secrets.token_hex(20)
        self.presign_secret = (presign_secret
                               or secrets.token_bytes(32).hex())
        self.max_age = max_age_seconds


def _xml_error(code: str, message: str, status: int) -> Response:
    body = (f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f"<Error><Code>{escape(code)}</Code>"
            f"<Message>{escape(message)}</Message></Error>")
    return Response(body, status=status, mimetype="application/xml")


def _uri_encode(s: str, encode_slash: bool = True) -> str:
    """AWS SigV4 URI encoding: unreserved chars pass through, space→%20."""
    safe = "-._~" + ("" if encode_slash else "/")
    return urllib.parse.quote(s, safe=safe)


def _canonical_query(qs: str) -> str:
    pairs = urllib.parse.parse_qsl(qs, keep_blank_values=True)
    enc = sorted((_uri_encode(k), _uri_encode(v)) for k, v in pairs)
    return "&".join(f"{k}={v}" for k, v in enc)


def _derive_signing_key(secret: str, date: str, region: str,
                        service: str) -> bytes:
    def h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k_date = h(("AWS4" + secret).encode(), date)
    k_region = h(k_date, region)
    k_service = h(k_region, service)
    return h(k_service, "aws4_request")


def _parse_auth_header(header: str) -> dict | None:
    # AWS4-HMAC-SHA256 Credential=AK/date/region/service/aws4_request,
    #                  SignedHeaders=a;b;c, Signature=hex
    if not header.startswith("AWS4-HMAC-SHA256"):
        return None
    try:
        parts = dict(
            p.strip().split("=", 1)
            for p in header[len("AWS4-HMAC-SHA256"):].split(","))
        cred = parts["Credential"].split("/")
        return {"access_key": cred[0], "date": cred[1], "region": cred[2],
                "service": cred[3],
                "signed_headers": parts["SignedHeaders"].split(";"),
                "signature": parts["Signature"]}
    except (KeyError, IndexError, ValueError):
        return None


class S3Api:
    def __init__(self, engine, config: S3Config | None = None) -> None:
        self.engine = engine
        self.config = config or S3Config()

    # ------------------------------------------------------------- layout
    def _project(self, bucket: str) -> str:
        pid = bucket[8:] if bucket.startswith("project_") else bucket
        if pid not in self.engine.catalog.list_projects():
            raise LookupError(pid)
        return pid

    def _objects_dir(self, project: str) -> str:
        return os.path.join(self.engine.files.root, project, "objects")

    def _multipart_dir(self, project: str, upload_id: str) -> str:
        if not upload_id.isalnum():
            raise PermissionError(upload_id)
        return os.path.join(self.engine.files.root, project, ".multipart",
                            upload_id)

    def _object_path(self, project: str, key: str) -> str:
        """Join + containment check: a key may contain '/' but must resolve
        inside the project's object dir (reference validates every path)."""
        root = os.path.realpath(self._objects_dir(project))
        path = os.path.realpath(os.path.join(root, key))
        if os.path.commonpath([root, path]) != root or path == root:
            raise PermissionError(key)
        return path

    # --------------------------------------------------------------- auth
    def _verify_sigv4(self) -> bool:
        parsed = _parse_auth_header(request.headers.get("Authorization", ""))
        if not parsed or parsed["access_key"] != self.config.access_key_id:
            return False
        x_date = request.headers.get("x-amz-date", "")
        try:
            t = datetime.strptime(x_date, "%Y%m%dT%H%M%SZ") \
                        .replace(tzinfo=timezone.utc)
        except ValueError:
            return False
        if abs((datetime.now(timezone.utc) - t).total_seconds()) \
                > self.config.max_age:
            return False
        payload_hash = request.headers.get("x-amz-content-sha256",
                                           "UNSIGNED-PAYLOAD")
        headers = {k.lower(): v.strip() for k, v in request.headers.items()}
        canonical_headers = "".join(
            f"{h}:{headers.get(h, '')}\n" for h in parsed["signed_headers"])
        canonical = "\n".join([
            request.method,
            _uri_encode(request.path, encode_slash=False),
            _canonical_query(request.query_string.decode()),
            canonical_headers,
            ";".join(parsed["signed_headers"]),
            payload_hash,
        ])
        scope = (f"{parsed['date']}/{parsed['region']}/"
                 f"{parsed['service']}/aws4_request")
        sts = "\n".join(["AWS4-HMAC-SHA256", x_date, scope,
                         hashlib.sha256(canonical.encode()).hexdigest()])
        key = _derive_signing_key(self.config.secret_access_key,
                                  parsed["date"], parsed["region"],
                                  parsed["service"])
        expected = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
        return hmac.compare_digest(expected, parsed["signature"])

    def _presign_signature(self, method: str, bucket: str, key: str,
                           expires_at: int,
                           content_type: str | None = None) -> str:
        sts = f"{method}\n{bucket}\n{key}\n{expires_at}"
        if content_type:
            sts += f"\n{content_type}"
        sig = hmac.new(self.config.presign_secret.encode(), sts.encode(),
                       hashlib.sha256).digest()
        return base64.urlsafe_b64encode(sig).decode().rstrip("=")

    def _verify_presign(self, bucket: str, key: str) -> bool:
        sig = request.args.get("signature")
        expires = request.args.get("expires")
        if not sig or not expires:
            return False
        try:
            expires_at = int(expires)
        except ValueError:
            return False
        if time.time() > expires_at:
            return False
        expected = self._presign_signature(
            request.method, bucket, key, expires_at,
            request.headers.get("Content-Type")
            if request.method == "PUT" else None)
        return hmac.compare_digest(expected, sig)

    def _authorized(self, bucket: str, key: str) -> bool:
        auth = request.headers.get("Authorization", "")
        if auth.startswith("AWS4-HMAC-SHA256"):
            return self._verify_sigv4()
        if "signature" in request.args:
            return self._verify_presign(bucket, key)
        api_key = request.headers.get("X-API-Key")
        if api_key:
            return self.engine.verify_api_key(api_key) is not None
        return False

    # ------------------------------------------------------------- routes
    def blueprint(self) -> Blueprint:
        bp = Blueprint("s3", __name__, url_prefix="/s3")
        api = self

        def guarded(bucket, key, fn):
            if not api._authorized(bucket, key):
                return _xml_error("AccessDenied", "Access Denied", 403)
            try:
                project = api._project(bucket)
            except LookupError:
                return _xml_error("NoSuchBucket",
                                  "The specified bucket does not exist", 404)
            try:
                return fn(project)
            except PermissionError:
                return _xml_error("AccessDenied", "Invalid key", 403)

        @bp.get("/<bucket>")
        def list_objects(bucket):
            def run(project):
                if "uploads" in request.args:   # ListMultipartUploads
                    mp_root = os.path.join(api.engine.files.root, project,
                                           ".multipart")
                    ups = []
                    if os.path.isdir(mp_root):
                        for uid in sorted(os.listdir(mp_root)):
                            d = os.path.join(mp_root, uid)
                            if not os.path.isdir(d):
                                continue
                            try:
                                with open(d + ".key") as f:
                                    k = f.read()
                            except OSError:
                                k = ""
                            ups.append(
                                "<Upload>"
                                f"<Key>{escape(k)}</Key>"
                                f"<UploadId>{uid}</UploadId>"
                                "</Upload>")
                    body = ('<?xml version="1.0" encoding="UTF-8"?>'
                            "<ListMultipartUploadsResult>"
                            f"<Bucket>{escape(bucket)}</Bucket>"
                            + "".join(ups)
                            + "</ListMultipartUploadsResult>")
                    return Response(body, mimetype="application/xml")
                prefix = request.args.get("prefix", "")
                max_keys = min(int(request.args.get("max-keys", 1000)), 1000)
                root = api._objects_dir(project)
                entries = []
                if os.path.isdir(root):
                    for dirpath, _dirs, files in os.walk(root):
                        for f in files:
                            full = os.path.join(dirpath, f)
                            k = os.path.relpath(full, root).replace(os.sep, "/")
                            if k.startswith(prefix):
                                st = os.stat(full)
                                entries.append((k, st.st_size, st.st_mtime))
                entries.sort()
                truncated = len(entries) > max_keys
                entries = entries[:max_keys]
                items = "".join(
                    "<Contents>"
                    f"<Key>{escape(k)}</Key>"
                    f"<Size>{size}</Size>"
                    "<LastModified>"
                    + datetime.fromtimestamp(mt, tz=timezone.utc)
                    .strftime("%Y-%m-%dT%H:%M:%S.000Z")
                    + "</LastModified>"
                    "<StorageClass>STANDARD</StorageClass>"
                    "</Contents>" for k, size, mt in entries)
                body = (
                    '<?xml version="1.0" encoding="UTF-8"?>\n'
                    "<ListBucketResult>"
                    f"<Name>{escape(bucket)}</Name>"
                    f"<Prefix>{escape(prefix)}</Prefix>"
                    f"<KeyCount>{len(entries)}</KeyCount>"
                    f"<MaxKeys>{max_keys}</MaxKeys>"
                    f"<IsTruncated>{str(truncated).lower()}</IsTruncated>"
                    f"{items}</ListBucketResult>")
                return Response(body, mimetype="application/xml")
            return guarded(bucket, "", run)

        @bp.get("/<bucket>/<path:key>")
        def get_object(bucket, key):
            def run(project):
                if "uploadId" in request.args:  # ListParts
                    d = api._multipart_dir(project,
                                           request.args["uploadId"])
                    if not os.path.isdir(d):
                        return _xml_error("NoSuchUpload",
                                          "Upload ID does not exist", 404)
                    parts = []
                    for p in sorted(os.listdir(d)):
                        full = os.path.join(d, p)
                        with open(full, "rb") as f:
                            etag = hashlib.md5(f.read()).hexdigest()
                        parts.append(
                            "<Part>"
                            f"<PartNumber>{int(p)}</PartNumber>"
                            f'<ETag>"{etag}"</ETag>'
                            f"<Size>{os.path.getsize(full)}</Size>"
                            "</Part>")
                    body = ('<?xml version="1.0" encoding="UTF-8"?>'
                            "<ListPartsResult>"
                            f"<Key>{escape(key)}</Key>"
                            f"<UploadId>{request.args['uploadId']}</UploadId>"
                            + "".join(parts) + "</ListPartsResult>")
                    return Response(body, mimetype="application/xml")
                path = api._object_path(project, key)
                if not os.path.isfile(path):
                    return _xml_error("NoSuchKey",
                                      "The specified key does not exist", 404)
                with open(path, "rb") as f:
                    data = f.read()
                return Response(
                    data, mimetype="application/octet-stream",
                    headers={"ETag": f'"{hashlib.md5(data).hexdigest()}"',
                             "Content-Length": str(len(data))})
            return guarded(bucket, key, run)

        @bp.route("/<bucket>/<path:key>", methods=["HEAD"])
        def head_object(bucket, key):
            def run(project):
                path = api._object_path(project, key)
                if not os.path.isfile(path):
                    return _xml_error("NoSuchKey",
                                      "The specified key does not exist", 404)
                st = os.stat(path)
                with open(path, "rb") as f:
                    etag = hashlib.md5(f.read()).hexdigest()
                return Response(
                    b"", headers={"ETag": f'"{etag}"',
                                  "Content-Length": str(st.st_size)})
            return guarded(bucket, key, run)

        @bp.put("/<bucket>/<path:key>")
        def put_object(bucket, key):
            def run(project):
                data = request.get_data()
                # multipart part upload: ?partNumber=N&uploadId=U
                if "uploadId" in request.args:
                    part_no = int(request.args["partNumber"])
                    d = api._multipart_dir(project, request.args["uploadId"])
                    if not os.path.isdir(d):
                        return _xml_error("NoSuchUpload",
                                          "Upload ID does not exist", 404)
                    with open(os.path.join(d, f"{part_no:05d}"), "wb") as f:
                        f.write(data)
                    return Response(
                        b"", headers={"ETag":
                                      f'"{hashlib.md5(data).hexdigest()}"'})
                path = api._object_path(project, key)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as f:
                    f.write(data)
                return Response(
                    b"", headers={"ETag":
                                  f'"{hashlib.md5(data).hexdigest()}"'})
            return guarded(bucket, key, run)

        @bp.post("/<bucket>/<path:key>")
        def multipart(bucket, key):
            """S3 multipart lifecycle: POST ?uploads initiates, POST
            ?uploadId=U completes (body lists parts; final ETag is the S3
            md5-of-part-md5s '-N' form)."""
            def run(project):
                if "uploads" in request.args:
                    upload_id = uuid.uuid4().hex
                    d = api._multipart_dir(project, upload_id)
                    os.makedirs(d)
                    with open(d + ".key", "w") as f:
                        f.write(key)
                    body = ('<?xml version="1.0" encoding="UTF-8"?>'
                            "<InitiateMultipartUploadResult>"
                            f"<Bucket>{escape(bucket)}</Bucket>"
                            f"<Key>{escape(key)}</Key>"
                            f"<UploadId>{upload_id}</UploadId>"
                            "</InitiateMultipartUploadResult>")
                    return Response(body, mimetype="application/xml")
                if "uploadId" in request.args:
                    d = api._multipart_dir(project, request.args["uploadId"])
                    if not os.path.isdir(d):
                        return _xml_error("NoSuchUpload",
                                          "Upload ID does not exist", 404)
                    parts = sorted(os.listdir(d))
                    if not parts:
                        return _xml_error("InvalidRequest", "no parts", 400)
                    path = api._object_path(project, key)
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    digests = b""
                    with open(path, "wb") as out:
                        for p in parts:
                            with open(os.path.join(d, p), "rb") as f:
                                data = f.read()
                            digests += hashlib.md5(data).digest()
                            out.write(data)
                    shutil.rmtree(d, ignore_errors=True)
                    try:
                        os.remove(d + ".key")
                    except OSError:
                        pass
                    etag = (f"{hashlib.md5(digests).hexdigest()}"
                            f"-{len(parts)}")
                    body = ('<?xml version="1.0" encoding="UTF-8"?>'
                            "<CompleteMultipartUploadResult>"
                            f"<Key>{escape(key)}</Key>"
                            f'<ETag>"{etag}"</ETag>'
                            "</CompleteMultipartUploadResult>")
                    return Response(body, mimetype="application/xml")
                return _xml_error("InvalidRequest",
                                  "expected ?uploads or ?uploadId", 400)
            return guarded(bucket, key, run)

        @bp.delete("/<bucket>/<path:key>")
        def delete_object(bucket, key):
            def run(project):
                if "uploadId" in request.args:      # AbortMultipartUpload
                    d = api._multipart_dir(project, request.args["uploadId"])
                    shutil.rmtree(d, ignore_errors=True)
                    try:
                        os.remove(d + ".key")
                    except OSError:
                        pass
                    return Response(b"", status=204)
                path = api._object_path(project, key)
                if os.path.isfile(path):
                    os.remove(path)
                return Response(b"", status=204)
            return guarded(bucket, key, run)

        @bp.post("/<bucket>/presign")
        def presign(bucket):
            def run(project):
                body = request.get_json(force=True)
                method = body.get("method", "GET").upper()
                if method not in ("GET", "PUT", "DELETE", "HEAD"):
                    return _xml_error("InvalidRequest",
                                      f"cannot presign {method}", 400)
                expires_in = max(1, min(int(body.get("expires_in", 3600)),
                                        604800))
                expires_at = int(time.time()) + expires_in
                sig = api._presign_signature(method, bucket, body["key"],
                                             expires_at,
                                             body.get("content_type"))
                url = (f"/s3/{bucket}/{body['key']}"
                       f"?signature={sig}&expires={expires_at}")
                return jsonify({
                    "url": url, "method": method,
                    "expires_at": datetime.fromtimestamp(
                        expires_at, tz=timezone.utc).isoformat()})
            return guarded(bucket, "", run)

        return bp
