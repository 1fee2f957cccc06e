"""The S3 conditional-write lease (``s3_lock_provider``) against the
mini-S3 wire: mutual exclusion, TTL steal, renewal, fencing tokens.

These run the REAL protocol — SigV4-signed PUT ``If-None-Match:*`` /
``If-Match`` CAS requests over HTTP — against tests/mini_s3.py, which
implements S3's public conditional-write semantics (412 on failed
precondition, 404 on If-Match over a missing key). No Spark session
needed; the provider is pure stdlib.
"""

from __future__ import annotations

import json
import threading
import time

import pytest

from icedb_spark.locks import _SigV4S3, s3_lock_provider
from tests.mini_s3 import MiniS3Server


@pytest.fixture()
def s3():
    with MiniS3Server() as server:
        _SigV4S3(server.endpoint, "locks", "k", "s").request(
            "PUT", ""
        )  # create bucket (PUT with empty key hits the bucket route)
        yield server


def _provider(s3, **kw):
    kw.setdefault("ttl_s", 2.0)
    kw.setdefault("timeout_s", 10.0)
    kw.setdefault("poll_s", 0.05)
    return s3_lock_provider(
        "locks",
        "tbl/.maintenance.lock",
        endpoint_override=s3.endpoint,
        access_key="test",
        secret_key="test",
        **kw,
    )


def test_conditional_put_semantics(s3):
    """The wire primitives themselves: If-None-Match:* creates exactly
    once; If-Match succeeds only on the current etag; 404 on a missing
    key."""
    c = _SigV4S3(s3.endpoint, "locks", "k", "s")
    st, etag, _ = c.request("PUT", "obj", b"v1", {"If-None-Match": "*"})
    assert st == 200 and etag
    st2, _, _ = c.request("PUT", "obj", b"v2", {"If-None-Match": "*"})
    assert st2 == 412
    st3, etag3, _ = c.request("PUT", "obj", b"v2", {"If-Match": etag})
    assert st3 == 200 and etag3 != etag
    st4, _, _ = c.request("PUT", "obj", b"v3", {"If-Match": etag})
    assert st4 == 412  # stale etag loses the CAS
    st5, _, _ = c.request("PUT", "missing", b"x", {"If-Match": etag})
    assert st5 == 404
    st6, _, body = c.request("GET", "obj")
    assert st6 == 200 and body == b"v2"


def test_mutual_exclusion_across_threads(s3):
    """Two contenders, one critical section at a time — the unlocked
    failure mode (overlapping sections) must be impossible."""
    provider = _provider(s3)
    active = []
    overlaps = []
    order = []

    def worker(name):
        with provider("merge"):
            active.append(name)
            if len(active) > 1:
                overlaps.append(tuple(active))
            order.append(name)
            time.sleep(0.3)
            active.remove(name)

    threads = [
        threading.Thread(target=worker, args=(f"w{i}",)) for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not overlaps
    assert sorted(order) == ["w0", "w1", "w2"]


def test_timeout_when_held(s3):
    provider = _provider(s3, ttl_s=60.0)
    fast = _provider(s3, ttl_s=60.0, timeout_s=0.5)
    with provider("merge"):
        with pytest.raises(TimeoutError):
            with fast("merge"):
                pass


def test_steal_after_ttl_expiry(s3):
    """A crashed holder (lease object left behind, no renewals) is
    stolen after TTL; the stealer's token is strictly greater."""
    c = _SigV4S3(s3.endpoint, "locks", "k", "s")
    stale = json.dumps(
        {"holder": "dead", "op": "merge", "token": 7,
         "expires_at": time.time() - 1}
    ).encode()
    st, _, _ = c.request(
        "PUT", "tbl/.maintenance.lock", stale, {"If-None-Match": "*"}
    )
    assert st == 200
    provider = _provider(s3)
    t0 = time.monotonic()
    with provider("merge") as token:
        assert token == 8
    assert time.monotonic() - t0 < 5


def test_renewal_outlives_ttl(s3):
    """A LIVE holder keeps the lock well past the TTL (renewal thread),
    so a second contender still times out after 2x TTL."""
    provider = _provider(s3, ttl_s=0.4)
    fast = _provider(s3, ttl_s=0.4, timeout_s=1.2)
    with provider("merge"):
        time.sleep(1.0)  # > 2x ttl: only renewals keep the lease alive
        with pytest.raises(TimeoutError):
            with fast("merge"):
                pass


def test_steal_cas_admits_exactly_one_winner(s3):
    """The property the whole protocol leans on: N racers PUT
    ``If-Match`` on the SAME stale etag — the store must admit exactly
    one (the others 412), no matter the interleaving."""
    c = _SigV4S3(s3.endpoint, "locks", "k", "s")
    stale = json.dumps(
        {"holder": "dead", "op": "merge", "token": 3,
         "expires_at": time.time() - 5}
    ).encode()
    st, etag, _ = c.request(
        "PUT", "race.lock", stale, {"If-None-Match": "*"}
    )
    assert st == 200
    results = []

    def steal(n):
        body = json.dumps({"holder": f"w{n}", "token": 4,
                           "expires_at": time.time() + 60}).encode()
        st2, _, _ = _SigV4S3(s3.endpoint, "locks", "k", "s").request(
            "PUT", "race.lock", body, {"If-Match": etag}
        )
        results.append(st2)

    threads = [
        threading.Thread(target=steal, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(10)
    assert sorted(results) == [200, 412, 412, 412], results


def test_fencing_tokens_monotonic_across_release(s3):
    """Tokens never repeat across clean release/re-acquire cycles (the
    high-water marker object carries them past lease deletion)."""
    provider = _provider(s3)
    seen = []
    for _ in range(3):
        with provider("merge") as token:
            seen.append(token)
    assert seen == sorted(seen) and len(set(seen)) == 3
