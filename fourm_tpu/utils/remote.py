"""Remote shard I/O (reference fourm/utils/s3_utils.py:24-111).

The reference monkey-patches webdataset's url_opener with a boto3 client so
s3:// tar shards stream straight into the data pipeline, plus upload/download
helpers for checkpoints. Here the equivalent surface:

  * open_url(path) -> binary file-like for local paths, s3:// (boto3, gated on
    availability) and http(s):// URLs — consumed by the tar-shard reader.
  * s3_upload / s3_download for checkpoint sync (reference :24-63).

boto3 is not installed in this build environment; every s3:// code path raises
a clear error message until it is, while local and http paths work everywhere.
"""

from __future__ import annotations

import io
import os
import re
from typing import Optional, Tuple

_S3_RE = re.compile(r"^s3://([^/]+)/(.+)$")


def _require_boto3():
    try:
        import boto3  # type: ignore

        return boto3
    except ImportError as e:
        raise ImportError(
            "s3:// paths require boto3 (reference s3_utils.py uses it for "
            "shard streaming and checkpoint sync); install boto3 or use "
            "local/http paths"
        ) from e


def split_s3_path(path: str) -> Tuple[str, str]:
    m = _S3_RE.match(path)
    if not m:
        raise ValueError(f"not an s3 path: {path}")
    return m.group(1), m.group(2)


def make_s3_client(endpoint_url: Optional[str] = None):
    boto3 = _require_boto3()
    endpoint_url = endpoint_url or os.environ.get("S3_ENDPOINT")
    return boto3.client("s3", endpoint_url=endpoint_url)


def open_url(path: str, endpoint_url: Optional[str] = None):
    """Open a shard for streaming reads: local file, s3:// object body, or
    http(s):// response. Returned object supports .read() (what tarfile's
    streaming mode needs)."""
    if path.startswith("s3://"):
        bucket, key = split_s3_path(path)
        client = make_s3_client(endpoint_url)
        return client.get_object(Bucket=bucket, Key=key)["Body"]
    if path.startswith(("http://", "https://")):
        import urllib.request

        return urllib.request.urlopen(path)
    return open(path, "rb")


def is_remote(path: str) -> bool:
    return path.startswith(("s3://", "http://", "https://"))


def s3_upload(local_path: str, s3_path: str, endpoint_url: Optional[str] = None):
    """Upload a file (reference save_on_s3, s3_utils.py:24-40)."""
    bucket, key = split_s3_path(s3_path)
    make_s3_client(endpoint_url).upload_file(local_path, bucket, key)


def s3_download(s3_path: str, local_path: str, endpoint_url: Optional[str] = None):
    """Download a file (reference download_from_s3, s3_utils.py:42-63)."""
    bucket, key = split_s3_path(s3_path)
    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    make_s3_client(endpoint_url).download_file(bucket, key, local_path)
