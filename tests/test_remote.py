"""The working acquisition layer: FileTransport + RemoteStore.

Covers the reference S3Wrapper semantics
(visualization/tao/utils/s3.py:487-609) over the live file://
transport: retry backoff with injected failures, cache hit/miss, the
modification-time freshness check, parallel multi-get, upload_dir, and
the video unavailability marker.
"""

import os
import time

import pytest

from tao_amodal_tpu.data.remote import (
    FileTransport,
    PermanentUnavailableError,
    RemoteStore,
    TransportError,
    fetch_video,
    open_store,
    retry_with_backoff,
)

pytestmark = pytest.mark.fast


def make_root(tmp_path):
    root = tmp_path / "bucket"
    (root / "videos/val").mkdir(parents=True)
    (root / "videos/val/a.mp4").write_bytes(b"AAAA")
    (root / "videos/val/b.mp4").write_bytes(b"BB")
    (root / "ann.json").write_bytes(b"{}")
    return root


def test_file_transport_roundtrip_and_listing(tmp_path):
    root = make_root(tmp_path)
    t = FileTransport(f"file://{root}")
    assert t.get_bytes("videos/val/a.mp4") == b"AAAA"
    assert t.exists("ann.json") and not t.exists("nope")
    assert t.list_keys("videos/") == ["videos/val/a.mp4",
                                      "videos/val/b.mp4"]
    assert t.list_keys(max_keys=2) == ["ann.json", "videos/val/a.mp4"]
    t.put_bytes("out/c.bin", b"C")
    assert (root / "out/c.bin").read_bytes() == b"C"
    with pytest.raises(KeyError):
        t.get_bytes("missing")
    with pytest.raises(ValueError):
        t.get_bytes("../escape")


class FlakyTransport(FileTransport):
    """Fails the first N calls of every operation — the injected
    transient-failure harness for the backoff logic."""

    def __init__(self, root, fail_times=2):
        super().__init__(root)
        self.fail_times = fail_times
        self.calls = 0

    def get_bytes(self, key):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransportError(f"transient #{self.calls}")
        return super().get_bytes(key)


def test_backoff_retries_then_succeeds(tmp_path):
    root = make_root(tmp_path)
    sleeps = []
    store = RemoteStore(FlakyTransport(root, fail_times=2),
                        initial_delay=0.5, sleep=sleeps.append)
    assert store.get("ann.json") == b"{}"
    # Two failures -> two sleeps at sqrt(2) growth.
    assert sleeps == [0.5, pytest.approx(0.5 * 2 ** 0.5)]


def test_backoff_exhaustion_raises(tmp_path):
    root = make_root(tmp_path)
    sleeps = []
    store = RemoteStore(FlakyTransport(root, fail_times=99),
                        num_tries=3, sleep=sleeps.append)
    with pytest.raises(TransportError):
        store.get("ann.json")
    assert len(sleeps) == 2  # num_tries - 1


def test_nonretryable_errors_surface_immediately(tmp_path):
    root = make_root(tmp_path)
    sleeps = []
    store = RemoteStore(FileTransport(root), sleep=sleeps.append)
    with pytest.raises(KeyError):
        store.get("missing")
    assert sleeps == []  # KeyError is not transient: no retry


class CountingTransport(FileTransport):
    def __init__(self, root):
        super().__init__(root)
        self.gets = 0

    def get_bytes(self, key):
        self.gets += 1
        return super().get_bytes(key)


def test_cache_serves_second_read(tmp_path):
    root = make_root(tmp_path)
    t = CountingTransport(root)
    store = RemoteStore(t, cache_dir=str(tmp_path / "cache"))
    assert store.get("videos/val/a.mp4") == b"AAAA"
    assert store.get("videos/val/a.mp4") == b"AAAA"
    assert t.gets == 1  # second read came from the cache


def test_cache_mtime_invalidation(tmp_path):
    """Reference semantics: a cached file older than the source is
    re-fetched; skip_modification_time_check serves it anyway."""
    root = make_root(tmp_path)
    t = CountingTransport(root)
    cache = str(tmp_path / "cache")
    store = RemoteStore(t, cache_dir=cache)
    assert store.get("ann.json") == b"{}"
    # Source updated after the cache was written.
    src = root / "ann.json"
    src.write_bytes(b'{"v":2}')
    future = time.time() + 60
    os.utime(src, (future, future))
    assert store.get("ann.json") == b'{"v":2}'
    assert t.gets == 2
    # With the check skipped, a STALE cache would have been served; the
    # refreshed cache also serves without a transport get.
    store2 = RemoteStore(t, cache_dir=cache,
                         skip_modification_time_check=True)
    assert store2.get("ann.json") == b'{"v":2}'
    assert t.gets == 2


def test_get_multiple_parallel(tmp_path):
    root = make_root(tmp_path)
    store = open_store(str(root), cache_dir=str(tmp_path / "c"))
    out = store.get_multiple(["videos/val/a.mp4", "videos/val/b.mp4"])
    assert out == {"videos/val/a.mp4": b"AAAA",
                   "videos/val/b.mp4": b"BB"}


def test_upload_dir_and_exists_and_download(tmp_path):
    root = tmp_path / "store"
    root.mkdir()
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "x.txt").write_bytes(b"x")
    (src / "sub/y.txt").write_bytes(b"y")
    store = open_store(f"file://{root}")
    store.upload_dir(str(src), "runs/r1")
    assert store.list_keys("runs/") == ["runs/r1/sub/y.txt",
                                        "runs/r1/x.txt"]  # lexicographic
    assert store.exists("runs/r1/x.txt")
    dest = tmp_path / "dl" / "x.txt"
    store.download_file("runs/r1/x.txt", str(dest))
    assert dest.read_bytes() == b"x"


def test_open_store_s3_requires_injection():
    with pytest.raises(RuntimeError):
        open_store("s3://bucket/prefix")


def test_retry_decorator_and_video_marker(tmp_path):
    calls = []

    @retry_with_backoff(attempts=3, base_delay=0.0)
    def sometimes(key):
        calls.append(key)
        if len(calls) < 2:
            raise OSError("flaky")
        return "ok"

    assert sometimes("k") == "ok"
    assert len(calls) == 2

    # fetch_video: a PermanentUnavailableError writes the marker and
    # subsequent calls skip the downloader entirely.
    out_dir = str(tmp_path)
    attempts = []

    def downloader(video_id, out):
        attempts.append(video_id)
        raise PermanentUnavailableError(video_id)

    assert fetch_video("v1", out_dir, downloader) is None
    assert fetch_video("v1", out_dir, downloader) is None
    assert attempts == ["v1"]
