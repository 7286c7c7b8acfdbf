"""S3-compatible object API (service/s3.py) — SigV4 auth, presigned URLs,
object CRUD + ListObjectsV2, traversal safety. The test-side signer follows
the public AWS Signature V4 spec independently of the server code; a
wrong-secret case proves verification actually checks the signature."""

import hashlib
import hmac
import urllib.parse
from datetime import datetime, timezone

import pytest

from keboola_storage_duckdb_spark.engine import StorageEngine
from keboola_storage_duckdb_spark.service.app import create_app
from keboola_storage_duckdb_spark.service.s3 import S3Config

ACCESS = "test-access"
SECRET = "test-secret"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_s3")))
    eng.create_project("p9")
    app = create_app(eng, s3_config=S3Config(access_key_id=ACCESS,
                                             secret_access_key=SECRET))
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield eng, c


def _sign(method, path, query="", body=b"", secret=SECRET,
          host="localhost"):
    """Independent AWS SigV4 signer (public spec)."""
    t = datetime.now(timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    date = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    headers = {"host": host, "x-amz-date": amz_date,
               "x-amz-content-sha256": payload_hash}
    signed = ";".join(sorted(headers))
    canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    cq = "&".join(f"{urllib.parse.quote(k, safe='-._~')}="
                  f"{urllib.parse.quote(v, safe='-._~')}"
                  for k, v in sorted(pairs))
    canonical = "\n".join([method, path, cq, canonical_headers, signed,
                           payload_hash])
    scope = f"{date}/us-east-1/s3/aws4_request"
    sts = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                     hashlib.sha256(canonical.encode()).hexdigest()])

    def h(key, msg):
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    key = h(h(h(h(("AWS4" + secret).encode(), date), "us-east-1"), "s3"),
            "aws4_request")
    sig = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    headers["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={ACCESS}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return headers


def test_put_get_head_list_delete_sigv4(setup):
    _eng, c = setup
    data = b"hello,s3\n1,2\n"
    etag = hashlib.md5(data).hexdigest()
    p = "/s3/project_p9/raw/in.csv"
    r = c.put(p, data=data, headers=_sign("PUT", p, body=data))
    assert r.status_code == 200 and r.headers["ETag"] == f'"{etag}"'
    r = c.get(p, headers=_sign("GET", p))
    assert r.status_code == 200 and r.data == data
    r = c.head(p, headers=_sign("HEAD", p))
    assert r.status_code == 200
    assert r.headers["Content-Length"] == str(len(data))
    q = "list-type=2&prefix=raw/"
    r = c.get("/s3/project_p9?" + q,
              headers=_sign("GET", "/s3/project_p9", query=q))
    assert r.status_code == 200
    assert b"<Key>raw/in.csv</Key>" in r.data
    assert f"<Size>{len(data)}</Size>".encode() in r.data
    r = c.delete(p, headers=_sign("DELETE", p))
    assert r.status_code == 204
    r = c.get(p, headers=_sign("GET", p))
    assert r.status_code == 404 and b"NoSuchKey" in r.data


def test_wrong_secret_and_missing_auth_denied(setup):
    _eng, c = setup
    p = "/s3/project_p9/raw/x.bin"
    r = c.put(p, data=b"x", headers=_sign("PUT", p, body=b"x",
                                          secret="not-the-secret"))
    assert r.status_code == 403 and b"AccessDenied" in r.data
    assert c.get(p).status_code == 403          # no auth at all
    r = c.get("/s3/project_nope/k", headers=_sign("GET", "/s3/project_nope/k"))
    assert r.status_code == 404 and b"NoSuchBucket" in r.data


def test_presigned_url_flow(setup):
    _eng, c = setup
    data = b"presigned bytes"
    p = "/s3/p9/stage/obj.bin"
    c.put(p, data=data, headers=_sign("PUT", p, body=data))
    pre = c.post("/s3/p9/presign",
                 json={"key": "stage/obj.bin", "method": "GET"},
                 headers=_sign("POST", "/s3/p9/presign"))
    assert pre.status_code == 200
    url = pre.get_json()["url"]
    r = c.get(url)                               # no headers: query auth only
    assert r.status_code == 200 and r.data == data
    # tampered signature
    assert c.get(url.replace("signature=", "signature=AAAA")).status_code == 403
    # expired URL
    import re
    expired = re.sub(r"expires=\d+", "expires=1", url)
    assert c.get(expired).status_code == 403
    # method mismatch: a GET-presigned URL must not authorize DELETE
    assert c.delete(url).status_code == 403


def test_key_traversal_rejected(setup):
    _eng, c = setup
    p = "/s3/p9/a/../../../etc/passwd"
    # flask normalizes ../ in URL paths; hit the handler directly with an
    # encoded traversal to prove the containment check holds
    enc = "/s3/p9/" + urllib.parse.quote("../../outside", safe="")
    r = c.put(enc, data=b"x", headers=_sign("PUT", enc, body=b"x"))
    assert r.status_code in (403, 404)


def test_multipart_upload_lifecycle(setup):
    _eng, c = setup
    key = "big/multi.bin"
    p = f"/s3/p9/{key}"
    # initiate
    r = c.post(p + "?uploads", headers=_sign("POST", p, query="uploads="))
    assert r.status_code == 200
    import re
    upload_id = re.search(rb"<UploadId>([0-9a-f]+)</UploadId>", r.data).group(1).decode()
    # upload 3 parts (out of order — completion must order by part number)
    parts = {1: b"A" * 10, 2: b"B" * 10, 3: b"C" * 5}
    for n in (2, 1, 3):
        q = f"partNumber={n}&uploadId={upload_id}"
        r = c.put(f"{p}?{q}", data=parts[n],
                  headers=_sign("PUT", p, query=q, body=parts[n]))
        assert r.status_code == 200
        assert r.headers["ETag"] == f'"{hashlib.md5(parts[n]).hexdigest()}"'
    # complete → object equals ordered concatenation; ETag is md5-of-md5s-N
    q = f"uploadId={upload_id}"
    r = c.post(f"{p}?{q}", headers=_sign("POST", p, query=q))
    assert r.status_code == 200
    digests = b"".join(hashlib.md5(parts[n]).digest() for n in (1, 2, 3))
    assert f'"{hashlib.md5(digests).hexdigest()}-3"'.encode() in r.data
    got = c.get(p, headers=_sign("GET", p))
    assert got.data == b"A" * 10 + b"B" * 10 + b"C" * 5
    # completed upload id is gone
    r = c.post(f"{p}?{q}", headers=_sign("POST", p, query=q))
    assert r.status_code == 404 and b"NoSuchUpload" in r.data
    # abort path removes a fresh upload's parts
    r = c.post(p + "?uploads", headers=_sign("POST", p, query="uploads="))
    uid2 = re.search(rb"<UploadId>([0-9a-f]+)</UploadId>", r.data).group(1).decode()
    q2 = f"partNumber=1&uploadId={uid2}"
    c.put(f"{p}?{q2}", data=b"x", headers=_sign("PUT", p, query=q2, body=b"x"))
    q3 = f"uploadId={uid2}"
    assert c.delete(f"{p}?{q3}",
                    headers=_sign("DELETE", p, query=q3)).status_code == 204
    assert c.post(f"{p}?{q3}",
                  headers=_sign("POST", p, query=q3)).status_code == 404


def test_multipart_listings(setup):
    _eng, c = setup
    key = "big/listed.bin"
    p = f"/s3/p9/{key}"
    r = c.post(p + "?uploads", headers=_sign("POST", p, query="uploads="))
    import re
    uid = re.search(rb"<UploadId>([0-9a-f]+)</UploadId>", r.data).group(1).decode()
    q = f"partNumber=2&uploadId={uid}"
    c.put(f"{p}?{q}", data=b"xyz", headers=_sign("PUT", p, query=q, body=b"xyz"))
    # ListMultipartUploads shows the in-flight upload with its key
    r = c.get("/s3/p9?uploads", headers=_sign("GET", "/s3/p9", query="uploads="))
    assert r.status_code == 200
    assert f"<UploadId>{uid}</UploadId>".encode() in r.data
    assert b"<Key>big/listed.bin</Key>" in r.data
    # ListParts reports number/etag/size
    q2 = f"uploadId={uid}"
    r = c.get(f"{p}?{q2}", headers=_sign("GET", p, query=q2))
    assert b"<PartNumber>2</PartNumber>" in r.data
    assert hashlib.md5(b"xyz").hexdigest().encode() in r.data
    assert b"<Size>3</Size>" in r.data
    # abort clears it from the listing
    c.delete(f"{p}?{q2}", headers=_sign("DELETE", p, query=q2))
    r = c.get("/s3/p9?uploads", headers=_sign("GET", "/s3/p9", query="uploads="))
    assert uid.encode() not in r.data


def test_api_key_fallback(setup):
    eng, c = setup
    key = eng.create_api_key("s3-test")
    r = c.put("/s3/p9/viakey/k.txt", data=b"k", headers={"X-API-Key": key})
    assert r.status_code == 200
    r = c.get("/s3/p9/viakey/k.txt", headers={"X-API-Key": key})
    assert r.data == b"k"
    assert c.get("/s3/p9/viakey/k.txt",
                 headers={"X-API-Key": "bogus"}).status_code == 403
