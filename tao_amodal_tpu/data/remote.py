"""Remote data acquisition interfaces (S3 / video fetch / Scale API).

The reference ships full implementations
(``visualization/tao/utils/{s3,ytdl,scale}.py``) against external
services; this build documents and stubs the same interfaces
(zero-egress environment — survey §7 "do NOT port" list), keeping the
retry/backoff and caching *capabilities* local so a deployment can
drop in real clients.
"""

from __future__ import annotations

import functools
import logging
import os
import time

logger = logging.getLogger(__name__)


def retry_with_backoff(attempts=5, base_delay=0.5, max_delay=30.0,
                       retryable=(OSError,)):
    """Exponential-backoff retry decorator (capability of reference
    ``s3.py:206-268``)."""

    def decorate(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            delay = base_delay
            for attempt in range(attempts):
                try:
                    return fn(*args, **kwargs)
                except retryable as e:
                    if attempt == attempts - 1:
                        raise
                    logger.warning(
                        "%s failed (%s); retrying in %.1fs",
                        fn.__name__, e, delay)
                    time.sleep(delay)
                    delay = min(delay * 2, max_delay)
        return wrapper

    return decorate


class CachedStore:
    """Content-addressed local cache in front of a remote fetcher
    (capability of reference ``s3.py`` download caching)."""

    def __init__(self, cache_dir, fetcher=None):
        self.cache_dir = cache_dir
        self.fetcher = fetcher
        os.makedirs(cache_dir, exist_ok=True)

    def path_for(self, key):
        return os.path.join(self.cache_dir, key.replace("/", "_"))

    @retry_with_backoff()
    def get(self, key):
        path = self.path_for(key)
        if os.path.exists(path):
            return path
        if self.fetcher is None:
            raise FileNotFoundError(
                f"{key} not cached and no remote fetcher configured "
                f"(zero-egress build; provide fetcher=... to enable)")
        data = self.fetcher(key)
        with open(path, "wb") as f:
            f.write(data)
        return path


class S3Store(CachedStore):
    """S3 interface; needs boto3 (not in this image) -> raises with a
    clear message unless a client is injected."""

    def __init__(self, bucket, cache_dir, client=None):
        self.bucket = bucket
        self.client = client

        def fetch(key):
            if self.client is None:
                raise RuntimeError(
                    "S3 access requires a boto3-like client; inject "
                    "one via S3Store(client=...)")
            return self.client.get_object(
                Bucket=self.bucket, Key=key)["Body"].read()

        super().__init__(cache_dir, fetch)


PERMANENTLY_UNAVAILABLE = "permanently_unavailable"


def fetch_video(video_id, output_dir, downloader=None):
    """Video fetch with unavailability bookkeeping (capability of
    reference ``ytdl.py:18-48,108-230``): records permanently
    unavailable videos so re-runs skip them."""
    marker = os.path.join(output_dir, f"{video_id}.unavailable")
    if os.path.exists(marker):
        return None
    out = os.path.join(output_dir, f"{video_id}.mp4")
    if os.path.exists(out):
        return out
    if downloader is None:
        raise RuntimeError(
            "video download requires a downloader callable "
            "(zero-egress build)")
    try:
        downloader(video_id, out)
        return out
    except PermanentUnavailableError:
        with open(marker, "w") as f:
            f.write(PERMANENTLY_UNAVAILABLE)
        return None


class PermanentUnavailableError(Exception):
    pass


def list_scale_tasks(project, api_key=None, client=None):
    """Scale-API task listing interface (capability of reference
    ``scale.py``)."""
    if client is None:
        raise RuntimeError(
            "Scale API access requires an injected client "
            "(zero-egress build)")
    return client.tasks(project=project)
